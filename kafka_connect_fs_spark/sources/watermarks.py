"""Per-file offset watermark store — the engine's resumability state.

Plays the role of Kafka Connect's offset storage in the reference
(FsSourceTask.java:80-91 reads ``{offset, file-size, eof}`` keyed by
``{path}``; AbstractPolicy.java:233-248 seeks readers to the committed
offset and skips finished files). Here it is an explicit versioned parquet
snapshot so that (a) resume state is queryable lineage (Spark can read it
directly), (b) commits are atomic (O_EXCL marker file — same primitive as
the lake log), and (c) recovery after a crash between lake-MERGE and
watermark-commit can replay the watermark delta recorded inside the lake
commit (exactly-once).

Implementation note: snapshots are read/merged/written DRIVER-SIDE with
pyarrow — the table is O(live files), keyed metadata, not row data; going
through Spark jobs for it added seconds of fixed latency to every
micro-batch (the reference equally keeps offsets in the driver-side Connect
framework). The parquet layout is unchanged, so `spark.read.parquet` still
works for lineage queries. Beyond ~10^7 tracked files, shard the snapshot
or move it into the lake table itself.
"""

from __future__ import annotations

import json
import os
import re
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WATERMARK_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("committed_offset", T.LongType(), False),
        T.StructField("file_size", T.LongType(), False),
        T.StructField("eof", T.BooleanType(), False),
        T.StructField("batch_seq", T.LongType(), False),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

_ARROW_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("committed_offset", pa.int64()),
        ("file_size", pa.int64()),
        ("eof", pa.bool_()),
        ("batch_seq", pa.int64()),
        ("updated_at", pa.timestamp("us")),
    ]
)


class WatermarkStore:
    _keep_versions = 2  # latest + crash fallback; older snapshots are dead

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._cache: tuple[int, dict] | None = None  # (version, rows)

    def _versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            m = re.fullmatch(r"v(\d{12})\.json", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def last_seq(self) -> int:
        """Highest committed batch sequence number (-1 if none)."""
        vs = self._versions()
        if not vs:
            return -1
        with open(os.path.join(self.root, f"v{vs[-1]:012d}.json")) as f:
            return json.load(f)["batch_seq"]

    def _data_file(self, seq: int) -> str:
        return os.path.join(self.root, f"v{seq:012d}", "snapshot.parquet")

    def _load_rows(self) -> dict[str, dict]:
        vs = self._versions()
        if not vs:
            return {}
        snap_dir = os.path.dirname(self._data_file(vs[-1]))
        single = self._data_file(vs[-1])
        if os.path.exists(single):
            table = pq.read_table(single)
        else:
            # layout written by an older Spark-based commit: a directory of
            # part-*.parquet files
            parts = sorted(
                os.path.join(snap_dir, n)
                for n in os.listdir(snap_dir)
                if n.endswith(".parquet")
            )
            table = pa.concat_tables([pq.read_table(p) for p in parts])
        return {r["path"]: r for r in table.to_pylist()}

    def load_dict(self) -> dict[str, dict]:
        """Driver-side snapshot: {path: {committed_offset, file_size, eof, …}}.
        Cached in-process per version — a daemon pays one parquet read at
        startup, then zero per batch (commit() refreshes the cache)."""
        vs = self._versions()
        latest = vs[-1] if vs else -1
        if self._cache is not None and self._cache[0] == latest:
            return self._cache[1]
        rows = self._load_rows()
        self._cache = (latest, rows)
        return rows

    def load(self) -> DataFrame:
        """Spark view of the snapshot (for lineage/monitoring queries)."""
        vs = self._versions()
        if not vs:
            return self.spark.createDataFrame([], WATERMARK_SCHEMA)
        return self.spark.read.parquet(os.path.dirname(self._data_file(vs[-1])))

    def commit(
        self,
        updates: list[dict],
        batch_seq: int,
        removed_paths: list[str] | None = None,
    ) -> None:
        """Merge per-file updates into the snapshot; keep-latest per path.

        Driver-side: bounded by files-touched + live files, mirroring the
        reference's one-offsets()-call-per-poll batching
        (FsSourceTask.java:83-86). Atomic via O_EXCL marker create.
        """
        import datetime as dt

        # start from the version-validated in-process cache (load_dict) —
        # re-reading the full snapshot parquet every batch is exactly the
        # per-batch cost the cache exists to remove (O(live files) at 10^6
        # tracked files); disk is only touched on version mismatch/cold start
        rows = dict(self.load_dict())
        for p in removed_paths or []:
            rows.pop(p, None)
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        for u in updates:
            rows[u["path"]] = {
                "path": u["path"],
                "committed_offset": int(u["committed_offset"]),
                "file_size": int(u["file_size"]),
                "eof": bool(u["eof"]),
                "batch_seq": int(batch_seq),
                "updated_at": now,
            }
        data_file = self._data_file(batch_seq)
        os.makedirs(os.path.dirname(data_file), exist_ok=True)
        ordered = sorted(rows.values(), key=lambda r: r["path"])
        table = pa.Table.from_pylist(list(ordered), schema=_ARROW_SCHEMA)
        pq.write_table(table, data_file)
        # fsync the DATA and its directory entries before the marker: the
        # marker's fsync alone orders nothing — a power loss could leave a
        # durable marker pointing at a truncated/absent snapshot, making
        # watermark state unrecoverable
        fd = os.open(data_file, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        for d in (os.path.dirname(data_file), self.root):
            dfd = os.open(d, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        marker = os.path.join(self.root, f"v{batch_seq:012d}.json")
        tmp = marker + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"batch_seq": batch_seq, "n_updates": len(updates)}, f)
            f.flush()
            os.fsync(f.fileno())
        # atomic create-with-content: link fails with EEXIST if another
        # writer won; no window where the marker exists empty
        os.link(tmp, marker)
        os.unlink(tmp)
        self._cache = (batch_seq, rows)
        # retention: a long-running daemon writes one snapshot per batch —
        # drop everything older than the last _keep_versions (recovery only
        # ever reads the newest complete snapshot; the watermark delta of a
        # crashed batch is recovered from the lake commit's app_metadata)
        import shutil as _shutil

        for v in self._versions()[: -self._keep_versions]:
            try:
                os.unlink(os.path.join(self.root, f"v{v:012d}.json"))
                _shutil.rmtree(
                    os.path.join(self.root, f"v{v:012d}"), ignore_errors=True
                )
            except OSError:
                pass
