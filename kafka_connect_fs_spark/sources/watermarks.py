"""Per-file offset watermark store — the engine's resumability state.

Plays the role of Kafka Connect's offset storage in the reference
(FsSourceTask.java:80-91 reads ``{offset, file-size, eof}`` keyed by
``{path}``; AbstractPolicy.java:233-248 seeks readers to the committed
offset and skips finished files). Here it is an explicit versioned parquet
snapshot so that (a) resume state is queryable lineage, (b) commits are
atomic (O_EXCL marker file — same primitive as the lake log), and
(c) recovery after a crash between lake-MERGE and watermark-commit can
replay the watermark delta recorded inside the lake commit (exactly-once).

Scale: the snapshot is O(live files). Snapshots are full rewrites per batch
— correct first; an LSM-style delta-log compaction is the scale follow-up
and does not change the API.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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


class WatermarkStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

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

    def load(self) -> DataFrame:
        vs = self._versions()
        if not vs:
            return self.spark.createDataFrame([], WATERMARK_SCHEMA)
        data_dir = os.path.join(self.root, f"v{vs[-1]:012d}")
        return self.spark.read.parquet(data_dir)

    def commit(
        self,
        updates: list[dict],
        batch_seq: int,
        removed_paths: list[str] | None = None,
    ) -> None:
        """Merge per-file updates into the snapshot; keep-latest per path.

        ``updates`` rows: {path, committed_offset, file_size, eof}. Driver-
        side list — bounded by files-touched-per-batch, mirroring the
        reference's one-offsets()-call-per-poll batching
        (FsSourceTask.java:83-86).
        """
        prev = self.load()
        if removed_paths:
            prev = prev.filter(~F.col("path").isin(removed_paths))
        upd_rows = [
            (
                u["path"],
                int(u["committed_offset"]),
                int(u["file_size"]),
                bool(u["eof"]),
                int(batch_seq),
                None,
            )
            for u in updates
        ]
        upd = self.spark.createDataFrame(upd_rows, WATERMARK_SCHEMA).withColumn(
            "updated_at", F.current_timestamp()
        )
        merged = (
            prev.unionByName(upd)
            .groupBy("path")
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in WATERMARK_SCHEMA.fieldNames()]),
                    F.struct(F.col("batch_seq"), F.col("committed_offset")),
                ).alias("_w")
            )
            .select("_w.*")
        )
        data_dir = os.path.join(self.root, f"v{batch_seq:012d}")
        merged.coalesce(1).write.mode("overwrite").parquet(data_dir)
        marker = os.path.join(self.root, f"v{batch_seq:012d}.json")
        tmp = marker + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"batch_seq": batch_seq, "n_updates": len(updates)}, f)
        fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
        os.replace(tmp, marker)
