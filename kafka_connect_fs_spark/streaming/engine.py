"""IngestEngine — the micro-batch driver replacing FsSourceTask.poll().

One micro-batch (reference hot loop FsSourceTask.java:77-121, re-expressed
as a Spark plan):

1. discover:   list URIs, regex-filter names, drop empty files
               (AbstractPolicy.listFiles + FsSourceTask.java:126)
2. resume:     compare listing against the watermark table; new or grown
               files become work items starting at their committed offset
               (the reference's batched offsets() fetch + seek,
               FsSourceTask.java:83-91, AbstractPolicy.java:233-248)
3. read:       distributed vectorized parse (sources/readers.py) into the
               change-event DataFrame with per-record lineage
               (_src_file, _src_offset)
4. resolve:    last-writer-wins per (key, ts) inside the MERGE
5. commit:     idempotent MERGE into the lake table (batch_id guard), then
               watermark commit; a crash between the two replays the batch,
               the MERGE no-ops, and the watermark delta is recovered from
               the lake commit's app_metadata — exactly-once end to end
               (upgrades the reference's documented at-least-once,
               docs/source/faq.rst:7-17)
6. cleanup:    fully-consumed files get NONE/MOVE/DELETE side-effects
               (AbstractPolicy.java:281-331), applied post-commit and
               idempotent under replay
7. metrics:    per-batch lineage (files, splits, events, per-bucket rows,
               durations) appended to <checkpoint>/metrics.jsonl

Scale: discovery is O(listing); everything row-shaped is a distributed
DataFrame; per-batch driver state is bounded by files-per-trigger, and the
MERGE shuffle is bucket-pruned + partial-aggregated (see plans/lake.py).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_fs_spark.operators.schema_evolution import diff_schemas
from kafka_connect_fs_spark.plans.lake import LakeTable
from kafka_connect_fs_spark.sources.discovery import FileMeta, list_files
from kafka_connect_fs_spark.sources.readers import (
    CUSTOM_READERS,
    LINE_NO_RANGE_FAILED,
    LINE_NO_RANGE_PARTIAL,
    WorkItem,
    format_for,
    parse_csv,
    parse_fixed_width,
    parse_jsonl,
    parse_text,
    parse_xml_lines,
    parse_whole_file_records,
    read_binary,
    read_columnar,
    read_line_format_native,
    read_lines,
    read_whole_files,
)
from kafka_connect_fs_spark.sources.watermarks import WatermarkStore

LINE_FORMATS = {"text", "csv", "tsv", "jsonl", "fixedwidth", "xml_lines"}
NATIVE_LINE_FORMATS = {"text", "csv", "tsv", "jsonl"}  # JVM fast path (offset-0 files)
WHOLE_FILE_FORMATS = {"yaml", "xml", "json_whole", "text_whole"}
COLUMNAR_FORMATS = {"parquet", "avro", "orc"}


@dataclass
class IngestConfig:
    uris: list[str]
    table_root: str
    checkpoint_root: str
    fmt: str = "jsonl"  # or "agnostic" for by-extension dispatch
    regexp: str = ".*"
    recursive: bool = True
    # alternative discovery source (e.g. sources/s3_events.py's
    # S3EventNotificationsPolicy.poll): when set, it replaces the
    # list_files() sweep — push-based O(events) discovery instead of
    # O(objects) listing; uris/regexp/recursive are then the policy's
    # business. The watermark anti-join downstream makes any
    # at-least-once discovery source safe.
    discovery_fn: Callable[[], list] | None = None
    # called after each batch's watermark commit with the set of paths
    # whose discovery is now durable (watermark committed, already
    # finished, or vanished) — the exactly-once ack hook for deferred-ack
    # discovery sources (e.g.
    # S3EventNotificationsPolicy(ack_mode="after_commit").ack_pending):
    # a crash before the commit leaves the queue messages undeleted, so
    # the events redeliver and the watermark anti-join absorbs them.
    # Messages for files the per-trigger caps dropped from the batch are
    # NOT in the durable set — they stay pending (the engine re-offers
    # those files itself next trigger and acks once their watermark lands)
    discovery_ack_fn: Callable[[set], object] | None = None
    schema: T.StructType | None = None
    reader_options: dict = field(default_factory=dict)
    keys: tuple = ("conv_id", "turn_idx")
    ts_col: str = "ts"
    n_buckets: int = 16
    # "mor" (default): each batch appends a bucket-partitioned delta —
    # write amplification O(batch); readers LWW-resolve and compact_every
    # folds deltas down. "cow" rewrites affected buckets per batch (only
    # sane for low-frequency batch loads touching few buckets).
    merge_mode: str = "mor"
    # >1 spreads each bucket's delta WRITE over N tasks (deterministic
    # key salt) — for hot conv_id batches; compaction folds the extra files.
    # "auto" = adaptive: the engine sizes the NEXT batch's salt from the
    # per-bucket row counts the previous commit already recorded (zero
    # extra jobs) — a sustained hot conv_id heats the same bucket batch
    # after batch, so a one-batch-lagged feedback controller converges
    # immediately; it decays one step per calm batch so a transient spike
    # doesn't leave permanent extra files for compaction to fold
    write_salt: int | str = 1
    # auto-salt controller targets: salt = ceil(hottest bucket's rows /
    # target_rows_per_write_task), capped at max_write_salt
    target_rows_per_write_task: int = 2_000_000
    max_write_salt: int = 16
    files_per_trigger: int = 0  # 0 = unlimited (policy.batch_size analog)
    bytes_per_trigger: int = 0  # 0 = unlimited (file_reader.batch_size /
    # maxBytesPerTrigger analog: caps the tail bytes admitted per batch)
    # record-level parity with file_reader.batch_size
    # (AbstractFileReader.java:76-86): at most N lines admitted per FILE
    # per trigger; the scanner's PARTIAL marker pins the committed offset
    # at the last admitted line so the file drains across triggers with no
    # loss or duplication. Implies the offset-aware scanner (no JVM
    # whole-file fast path) for line formats.
    records_per_file_per_trigger: int = 0
    cleanup: str = "none"  # none | move | delete (AbstractPolicy.java:45-47)
    cleanup_move_dir: str | None = None
    # filename prefix applied to moved files (policy.cleanup.move.prefix,
    # AbstractPolicy.java:288: target = cleanupDir / prefix + name)
    cleanup_move_prefix: str = ""
    emit_unterminated_final_line: bool = True
    max_split_bytes: int = 128 * 1024 * 1024
    batch_id_prefix: str = "ingest-"
    # maps parsed records → change events; must preserve _src_file/_src_offset
    transform: Callable[[DataFrame], DataFrame] | None = None
    # old→new column-rename hints: a batch arriving with `new` while the
    # table has `old` triggers a metadata-only table rename (M4)
    rename_hints: dict = field(default_factory=dict)
    # lakehouse hygiene: every N batches, compact fragmented buckets and
    # vacuum unreferenced files (0 = never; a maintenance job can own this
    # instead on a real deployment)
    compact_every: int = 0
    compact_min_files_per_bucket: int = 4
    # 0 = fold every fragmented bucket in one maintenance pause; N > 0 =
    # incremental compaction, at most the N most fragmented buckets per
    # compaction trigger (bounded pause for steady-state ingest loops)
    compact_max_buckets_per_trigger: int = 0


@dataclass
class BatchResult:
    batch_id: str
    seq: int
    n_files: int
    n_events: int
    rows_written: int
    recovered: bool = False
    cleaned: list[str] = field(default_factory=list)
    duration_s: float = 0.0
    schema_diff: dict | None = None


class IngestEngine:
    def __init__(self, spark: SparkSession, config: IngestConfig):
        self.spark = spark
        self.config = config
        # deterministic config errors fail HERE, not as endlessly-retried
        # per-batch warnings deep in the run loop
        if config.cleanup not in ("none", "move", "delete"):
            raise ValueError(f"unknown cleanup mode: {config.cleanup!r}")
        if config.cleanup == "move" and not config.cleanup_move_dir:
            raise ValueError("cleanup='move' requires cleanup_move_dir")
        if config.write_salt != "auto" and (
            not isinstance(config.write_salt, int) or config.write_salt < 1
        ):
            raise ValueError(
                f"write_salt must be a positive int or 'auto', got "
                f"{config.write_salt!r}"
            )
        # adaptive-salt controller state (write_salt="auto"): the salt the
        # NEXT merge will use, updated from each commit's bucket stats
        self._auto_salt: int = 1
        # reference parity (data_type_mapping_error=false,
        # UnivocityFileReader.java:273-305): unparseable cells become NULL
        # and the record is quarantined — under ANSI (the Spark 4 default)
        # the same cast would fail the whole batch instead. The engine owns
        # its session in deployment (spark-submit driver loop), so pin both
        # runtime-settable confs its semantics depend on.
        spark.conf.set("spark.sql.ansi.enabled", "false")
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        self.lake = (
            LakeTable(spark, config.table_root)
            if LakeTable.exists(config.table_root)
            else LakeTable.create(
                spark,
                config.table_root,
                keys=list(config.keys),
                ts_col=config.ts_col,
                n_buckets=config.n_buckets,
                merge_mode=config.merge_mode,
            )
        )
        # an EXISTING table's frozen spec wins over the config — but a
        # silently-drifted config would still drive the quarantine filter
        # and planning, so mismatches are an error, not a shrug. Replay
        # the log first: n_buckets may have EVOLVED via set_n_buckets —
        # the config must match the table's CURRENT scheme, not the
        # create-time one
        self.lake._state_full()
        drift = {
            name: (got, want)
            for name, got, want in (
                ("keys", tuple(self.lake.keys), tuple(config.keys)),
                ("ts_col", self.lake.ts_col, config.ts_col),
                ("n_buckets", self.lake.n_buckets, config.n_buckets),
                ("merge_mode", self.lake.merge_mode, config.merge_mode),
            )
            if got != want
        }
        if drift:
            raise ValueError(
                f"IngestConfig disagrees with the existing table at "
                f"{config.table_root}: "
                + ", ".join(
                    f"{k}: table={a!r} config={b!r}" for k, (a, b) in drift.items()
                )
            )
        self.watermarks = WatermarkStore(
            spark, os.path.join(config.checkpoint_root, "watermarks")
        )
        os.makedirs(config.checkpoint_root, exist_ok=True)
        self._metrics_path = os.path.join(config.checkpoint_root, "metrics.jsonl")
        # event-based discovery never re-lists, so files the per-trigger
        # caps dropped from a batch are re-offered from here next trigger
        # (crash-safe: their queue messages stay un-acked until the
        # watermark commits, so redelivery covers a lost process)
        self._carryover: dict[str, FileMeta] = {}
        # paths whose files vanished after discovery: nothing will ever be
        # owed for them, so their messages are ack-able
        self._vanished: set[str] = set()

    # ------------------------------------------------------------- planning
    def _plan(
        self, listing: list[FileMeta], wm_rows: dict[str, dict]
    ) -> tuple[list[WorkItem], list[str]]:
        work: list[WorkItem] = []
        finished: list[str] = []
        for f in listing:
            w = wm_rows.get(f.path)
            if w is None:
                work.append(WorkItem(f.path, 0, f.length))
                continue
            # shrank file = truncated or rotated IN PLACE: the committed
            # offset points past the new content, so it is a brand-new file
            # — re-ingest from 0 (idempotent LWW absorbs any overlap).
            # Without this branch it would stall untracked forever, or
            # worse: an eof=True watermark would treat the replacement as
            # finished and cleanup=delete would remove it unread.
            shrank = (
                f.length < w["file_size"]
                if _compressed(f.path)
                else f.length < w["committed_offset"]
            )
            if shrank:
                work.append(WorkItem(f.path, 0, f.length))
                continue
            # compressed offsets are decompressed-bytes, so growth is judged
            # on the recorded compressed file_size instead
            grown = (
                f.length > w["file_size"]
                if _compressed(f.path)
                else f.length > w["committed_offset"]
            )
            if grown:
                # grown file → tail from the committed offset
                # (HdfsFileWatcherPolicy append semantics, :144-170)
                work.append(WorkItem(f.path, w["committed_offset"], f.length))
            elif _compressed(f.path) and not w["eof"]:
                # compressed file whose read failed (offsets can't signal
                # progress): retry every trigger, like the reference's
                # warn-and-reoffer loop
                work.append(WorkItem(f.path, w["committed_offset"], f.length))
            elif w["eof"]:
                # already fully consumed → cleanup candidate, never re-read
                # (AbstractPolicy.java:233-241; FsSourceTaskTest.java:260-271)
                finished.append(f.path)
            elif not _compressed(f.path) and f.length == w["committed_offset"]:
                # size landed EXACTLY on the committed offset without eof:
                # only possible when a held-back torn tail was truncated
                # away (a normal append-in-progress keeps size > committed;
                # a clean end-of-file committed eof=True). Nothing is owed
                # from this file — treat as consumed, or it would sit in
                # the listing untracked forever and never be cleaned.
                finished.append(f.path)
        cap = self.config.files_per_trigger
        if cap and len(work) > cap:
            work = work[:cap]  # listing is path-sorted → deterministic batching
        bcap = self.config.bytes_per_trigger
        if bcap:
            out, total = [], 0
            for w in work:
                # compressed offsets are decompressed-bytes while snap_length
                # is compressed: count the full compressed re-read cost there
                size = (
                    w.snap_length
                    if _compressed(w.path)
                    else max(0, w.snap_length - w.start_offset)
                )
                if out and total + size > bcap:
                    break
                out.append(w)
                total += size
            work = out  # remainder picked up next trigger (offsets unchanged)
        return work, finished

    def _fmt_of(self, path: str) -> str:
        cfg = self.config
        fmt = (
            format_for(path, cfg.reader_options.get("format_overrides"))
            if cfg.fmt == "agnostic"
            else cfg.fmt
        )
        if fmt == "xml" and cfg.reader_options.get("record_per_line"):
            # the reference's XML default is record-per-line
            # (XmlFileReader.java record_per_line via JacksonFileReader);
            # whole-file is this engine's default, the option flips it
            fmt = "xml_lines"
        return fmt

    # --------------------------------------------------------------- reading
    def _read(
        self, work: list[WorkItem]
    ) -> tuple[DataFrame | None, DataFrame | None, set[str], list[DataFrame]]:
        """Returns (lines_union_or_None, events_df, native_paths,
        persisted_lines_parts).

        ``native_paths`` are whole files read via the JVM-native fast path —
        they have no byte-offset line stats; their watermark commits the
        full snapshot length (a native read failure fails the batch, so no
        false progress is possible)."""
        cfg = self.config
        groups: dict[str, list[WorkItem]] = {}
        for w in work:
            groups.setdefault(self._fmt_of(w.path), []).append(w)

        lines_parts: list[DataFrame] = []
        event_parts: list[DataFrame] = []
        native_paths: set[str] = set()
        rows_to_skip = int(cfg.reader_options.get("rows_to_skip", 0))
        # preamble skipping needs the offset-aware scanner (Spark's native
        # csv/json sources cannot skip N leading lines)
        jvm_fast = (
            cfg.reader_options.get("jvm_fast_path", True)
            and not rows_to_skip
            # a record cap needs the offset-aware scanner: the native
            # reader always consumes whole files
            and not cfg.records_per_file_per_trigger
            # strict final-line handling needs the scanner's hold-back:
            # the native reader would emit a torn trailing record and the
            # committed offset would jump past it
            and cfg.emit_unterminated_final_line
        )
        for fmt, items in groups.items():
            if fmt in LINE_FORMATS:
                if jvm_fast and fmt in NATIVE_LINE_FORMATS:
                    whole = [
                        w
                        for w in items
                        if w.start_offset == 0 and not _compressed(w.path)
                    ]
                    if whole:
                        # a file can vanish between listing and read; the
                        # native reader fails PLANNING on a missing path.
                        # Stat only on that failure (the listing already
                        # stat'ed every file — a happy-path pre-check would
                        # be a second full listing at 10^5 files/trigger),
                        # drop the vanished ones, and let them fall through
                        # to the Python scanner, which emits a FAILED
                        # marker (offset not advanced; the file simply
                        # isn't listed next trigger). A file vanishing
                        # AFTER planning still fails the batch — retried.
                        try:
                            ev = read_line_format_native(
                                self.spark, whole, fmt, cfg.schema, cfg.reader_options
                            )
                        except Exception as e:
                            if "PATH_NOT_FOUND" not in str(e):
                                raise
                            whole = [w for w in whole if _still_exists(w.path)]
                            ev = (
                                read_line_format_native(
                                    self.spark, whole, fmt, cfg.schema,
                                    cfg.reader_options,
                                )
                                if whole
                                else None
                            )
                        if ev is not None:
                            if cfg.schema is None and fmt == "jsonl":
                                # PIN the natively-inferred schema: later
                                # triggers that tail this file (or any
                                # grown/compressed file) go through the
                                # offset-aware scanner, which requires an
                                # explicit schema — without pinning, the
                                # first append after a schemaless start
                                # would stall the pipeline forever
                                cfg.schema = T.StructType(
                                    [
                                        f
                                        for f in ev.schema.fields
                                        if not f.name.startswith("_src")
                                        and f.name != "_line_no"
                                    ]
                                )
                            event_parts.append(ev)
                            native_paths.update(w.path for w in whole)
                            items = [w for w in items if w.path not in native_paths]
                            if not items:
                                continue
                # preamble + header: the header must be consumed by the
                # scanner itself (split-independent anchor; see read_lines)
                skip_hdr = bool(
                    rows_to_skip
                    and fmt in ("csv", "tsv")
                    and cfg.reader_options.get("header", True)
                )
                lines = read_lines(
                    self.spark,
                    items,
                    encoding=cfg.reader_options.get("encoding", "utf-8"),
                    emit_unterminated_final_line=cfg.emit_unterminated_final_line,
                    max_split_bytes=cfg.max_split_bytes,
                    with_markers=True,
                    rows_to_skip=rows_to_skip,
                    max_records_per_file=cfg.records_per_file_per_trigger,
                    skip_header_line=skip_hdr,
                    comment_prefix=(cfg.reader_options.get("csv_options") or {}).get(
                        "comment"
                    ),
                )
                lines = lines.persist()
                lines_parts.append(lines)
                # range-outcome markers (_line_no < 0) are bookkeeping, not records
                event_parts.append(
                    self._parse_lines(fmt, lines.filter(F.col("_line_no") >= 0))
                )
            elif fmt in WHOLE_FILE_FORMATS:
                files_df = read_whole_files(self.spark, items)
                if fmt == "text_whole":
                    ev = files_df.select(
                        "_src_file",
                        "_src_offset",
                        "_src_end",
                        F.lit(0).cast("long").alias("_line_no"),
                        F.decode(F.col("content"), cfg.reader_options.get("encoding", "utf-8")).alias(
                            cfg.reader_options.get("field_name", "value")
                        ),
                    )
                else:
                    wf_fmt = "json" if fmt == "json_whole" else fmt
                    ev = parse_whole_file_records(
                        files_df, wf_fmt, self._require_schema(), cfg.reader_options
                    )
                event_parts.append(ev)
            elif fmt in COLUMNAR_FORMATS:
                event_parts.append(
                    read_columnar(
                        self.spark,
                        items,
                        fmt,
                        schema=cfg.schema,
                        columns=cfg.reader_options.get("columns"),
                        options=cfg.reader_options.get("spark_options"),
                    )
                )
            elif fmt == "binary":
                event_parts.append(read_binary(self.spark, items))
            elif fmt in CUSTOM_READERS:
                # plugin parser (reference: file_reader.class reflection)
                event_parts.append(
                    CUSTOM_READERS[fmt](self.spark, items, cfg.reader_options)
                )
            else:
                raise ValueError(f"unknown format: {fmt}")

        lines_df = None
        if lines_parts:
            lines_df = lines_parts[0]
            for p in lines_parts[1:]:
                lines_df = lines_df.unionByName(p)
        events = None
        if event_parts:
            events = event_parts[0]
            for p in event_parts[1:]:
                events = events.unionByName(p, allowMissingColumns=True)
        # lines_parts returned too: each part is persisted individually and
        # must be unpersisted individually (unpersisting the union is a no-op)
        return lines_df, events, native_paths, lines_parts

    def _parse_lines(self, fmt: str, lines: DataFrame) -> DataFrame:
        cfg = self.config
        o = cfg.reader_options
        if fmt == "text":
            return parse_text(lines, o.get("field_name", "value"))
        if fmt == "jsonl":
            return parse_jsonl(lines, self._require_schema(), o.get("json_options"))
        if fmt in ("csv", "tsv"):
            return parse_csv(
                lines,
                self._require_schema(),
                sep=o.get("sep", "\t" if fmt == "tsv" else ","),
                header=o.get("header", True),
                options=o.get("csv_options"),
                rows_to_skip=int(o.get("rows_to_skip", 0)),
            )
        if fmt == "xml_lines":
            return parse_xml_lines(lines, self._require_schema(), o)
        if fmt == "fixedwidth":
            return parse_fixed_width(
                lines,
                o["field_lengths"],
                o.get("field_names"),
                o.get("field_types"),
                trim=o.get("trim", True),
            )
        raise ValueError(fmt)

    def _require_schema(self) -> T.StructType:
        if self.config.schema is None:
            raise ValueError(f"format {self.config.fmt!r} requires an explicit schema")
        return self.config.schema

    # ---------------------------------------------------------------- batch
    def run_once(self) -> BatchResult:
        t0 = time.monotonic()
        cfg = self.config
        seq = self.watermarks.last_seq() + 1
        batch_id = f"{cfg.batch_id_prefix}{seq:012d}"

        # crash recovery: MERGE already committed for this seq → finish the
        # watermark/cleanup half from the lake commit's metadata and move on
        recovered = self.lake.get_commit_by_batch_id(batch_id)
        if recovered is not None:
            md = recovered.app_metadata or {}
            cleaned = self._cleanup(md.get("cleanup", []))
            self.watermarks.commit(md.get("watermarks", []), seq, removed_paths=cleaned)
            if cfg.discovery_ack_fn is not None:
                cfg.discovery_ack_fn(
                    {w["path"] for w in md.get("watermarks", [])}
                    | set(md.get("cleanup", []))
                    | self._vanished
                )
                self._vanished = set()
            res = BatchResult(
                batch_id, seq, len(md.get("watermarks", [])), 0,
                recovered.metrics.get("rows_written", 0), recovered=True,
                cleaned=cleaned, duration_s=time.monotonic() - t0,
            )
            self._log_metrics(res, recovered.metrics, version=recovered.version)
            return res

        raw_listing = list(
            cfg.discovery_fn()
            if cfg.discovery_fn is not None
            else list_files(cfg.uris, cfg.regexp, cfg.recursive)
        )
        wm_rows = self.watermarks.load_dict()
        wm_purge: list[str] = []
        if cfg.discovery_fn is not None:
            # an event source announces each file ONCE — the engine itself
            # must re-offer (a) files the per-trigger caps dropped last
            # batch and (b) non-eof watermark rows (failed ranges, partial
            # record-cap drains, held-back torn tails) or they stall
            # forever waiting for an event that never comes. Listing
            # policies re-list, so they skip this. Stats are bounded by
            # the re-offer set (files we are about to read anyway), never
            # O(all objects).
            reoffer = dict(self._carryover)
            for p, w in wm_rows.items():
                if not w["eof"] and p not in reoffer:
                    reoffer[p] = FileMeta(p, w["file_size"], 0.0)
            for p, fm in reoffer.items():
                if _still_exists(p):
                    raw_listing.append(fm)
                else:
                    # vanished after discovery: nothing owed — ack its
                    # message and purge any stale watermark row so the
                    # re-offer loop terminates
                    self._vanished.add(p)
                    if p in wm_rows:
                        wm_purge.append(p)
            self._carryover = {}
        # dedup by path keeping the largest size (an event queue can
        # announce the same growing object twice in one poll), then
        # path-sort for deterministic files_per_trigger batching
        by_path: dict[str, FileMeta] = {}
        for f in raw_listing:
            if f.length > 0 and (f.path not in by_path or f.length > by_path[f.path].length):
                by_path[f.path] = f
        if cfg.discovery_fn is not None:
            # zero-byte objects (empty uploads, 'folder' marker keys) are
            # filtered above and owe nothing — their event messages must
            # still ack or they redeliver forever; if the object later
            # grows, that write emits its own event
            self._vanished.update(
                f.path for f in raw_listing
                if f.length <= 0 and f.path not in by_path
            )
        listing = [by_path[p] for p in sorted(by_path)]
        work, finished = self._plan(listing, wm_rows)
        snap = {w.path: w.snap_length for w in work}
        if cfg.discovery_fn is not None:
            planned = {w.path for w in work} | set(finished)
            self._carryover = {
                f.path: f for f in listing if f.path not in planned
            }

        if not work:
            cleaned = self._cleanup(finished)
            if cleaned or wm_purge:
                self.watermarks.commit([], seq, removed_paths=cleaned + wm_purge)
            if cfg.discovery_ack_fn is not None:
                # redelivered events for already-finished files must still
                # ack or they redeliver forever
                cfg.discovery_ack_fn(set(finished) | self._vanished)
                self._vanished = set()
            res = BatchResult(batch_id, seq, 0, 0, 0, cleaned=cleaned,
                              duration_s=time.monotonic() - t0)
            self._log_metrics(res, {})
            return res

        lines_df, events, native_paths, lines_parts = self._read(work)
        try:
            if cfg.transform is not None:
                events = cfg.transform(events)

            # one stats pass over the cached raw lines yields the per-file
            # consumed offsets, the per-range failure flags, AND the record
            # count (no separate count() job on the fast path)
            fmts = {self._fmt_of(w.path) for w in work}
            line_stats = []
            if lines_df is not None:
                line_stats = (
                    lines_df.groupBy("_src_file")
                    .agg(
                        F.max("_src_end").alias("end"),
                        # real records only (markers have _line_no < 0)
                        F.count(F.when(F.col("_line_no") >= 0, 1)).alias("cnt"),
                        F.count(
                            F.when(F.col("_line_no") == LINE_NO_RANGE_FAILED, 1)
                        ).alias("n_failed_ranges"),
                        F.count(
                            F.when(F.col("_line_no") == LINE_NO_RANGE_PARTIAL, 1)
                        ).alias("n_partial_ranges"),
                    )
                    .collect()
                )
            # fast count only where 1 raw line == 1 record and no transform
            # drops rows (csv/tsv headers and custom transforms change the
            # record count)
            fast_count = (
                cfg.transform is None
                and lines_df is not None
                and not native_paths
                and fmts <= {"jsonl", "text"}
            )
            obs = None
            if fast_count:
                n_events = sum(r["cnt"] for r in line_stats)
            else:
                # NEVER a separate count() job: on the native path that
                # would re-scan and re-parse every file once more before
                # the merge scans them again. Observed metrics ride the
                # merge write's own action for free.
                from pyspark.sql import Observation

                obs = Observation()
                events = events.observe(obs, F.count(F.lit(1)).alias("n"))
                n_events = -1  # filled from obs after the merge action runs
            # error tolerance: unparseable records (null keys/ts after the
            # typed parse) are quarantined, not fatal — the reference warns
            # and continues on bad files (FsSourceTask.java:101-105)
            key_cols = [c for c in (*cfg.keys, cfg.ts_col) if c in events.columns]
            if key_cols:
                cond = " AND ".join(f"`{c}` IS NOT NULL" for c in key_cols)
                events = events.filter(cond)

            # schema evolution (M4): detect adds/renames vs the table schema;
            # renames apply as metadata-only commits, adds flow through the
            # union-by-name merge; the diff lands in batch metrics/lineage
            schema_diff = None
            tbl_schema = self.lake.current_schema()
            if tbl_schema is not None:
                tbl_clean = T.StructType(
                    [
                        f
                        for f in tbl_schema.fields
                        if f.name != "op" and not f.name.startswith("_")
                    ]
                )
                incoming = T.StructType(
                    [
                        f
                        for f in events.schema.fields
                        if f.name != "op" and not f.name.startswith("_")
                    ]
                )
                d = diff_schemas(tbl_clean, incoming, cfg.rename_hints)
                for old, new in d.renamed.items():
                    self.lake.rename_column(old, new)
                if not d.is_noop:
                    schema_diff = d.to_dict()

            # per-file consumed offsets + failure flags from the stats pass;
            # whole-file and columnar formats commit the full snapshot length
            consumed: dict[str, int] = {r["_src_file"]: r["end"] for r in line_stats}
            failed: set[str] = {
                r["_src_file"] for r in line_stats if r["n_failed_ranges"] > 0
            }
            partial: set[str] = {
                r["_src_file"] for r in line_stats if r["n_partial_ranges"] > 0
            }
            wm_updates = []
            for w in work:
                fmt = self._fmt_of(w.path)
                if w.path in native_paths:
                    # whole file consumed via the JVM-native scan
                    end = w.snap_length
                elif fmt in LINE_FORMATS:
                    if w.path in failed:
                        # ANY failed range ⇒ no progress for the whole file:
                        # it is re-read from the committed offset next
                        # trigger (reference semantics: warn + continue; the
                        # idempotent MERGE absorbs the partial emit)
                        end = w.start_offset
                    else:
                        end = consumed.get(w.path, w.start_offset)
                else:
                    end = w.snap_length
                end = max(end, w.start_offset)
                # compressed offsets are decompressed-bytes, so eof can NEVER
                # be end>=size (decompressed end typically exceeds compressed
                # size even when records were held back — e.g. by the
                # records-per-file cap's PARTIAL marker); for compressed
                # files eof means "stream fully consumed this trigger":
                # every range read successfully, nothing held back
                if _compressed(w.path):
                    eof = w.path not in failed and w.path not in partial
                else:
                    eof = bool(end >= snap[w.path])
                wm_updates.append(
                    {
                        "path": w.path,
                        "committed_offset": int(end),
                        "file_size": int(snap[w.path]),
                        "eof": eof,
                    }
                )

            # scanner bookkeeping never reaches the table: _src_end/_line_no
            # exist only for offset stats (LWW ties break on
            # _src_file/_src_offset, which ARE lineage) — merging them would
            # store two dead int64 columns in every data file and leak them
            # through read()
            events = events.drop("_src_end", "_line_no")

            def _stats_still_hold() -> None:
                # persist() is a cache, not a barrier: if an executor lost
                # cached scan partitions DURING the merge write and the
                # recompute saw different bytes (a source file vanished
                # mid-batch), the write is short while the already-collected
                # offsets would still commit — silent loss. Scan ranges are
                # pinned at planning (growth cannot change them), so
                # re-running the cheap cached stats pass and comparing is an
                # exact consistency check; a mismatch aborts BEFORE the
                # commit and the batch replays cleanly.
                if lines_df is None:
                    return
                again = {
                    r["_src_file"]: (r["end"], r["cnt"], r["n_failed_ranges"])
                    for r in lines_df.groupBy("_src_file")
                    .agg(
                        F.max("_src_end").alias("end"),
                        F.count(F.when(F.col("_line_no") >= 0, 1)).alias("cnt"),
                        F.count(
                            F.when(F.col("_line_no") == LINE_NO_RANGE_FAILED, 1)
                        ).alias("n_failed_ranges"),
                    )
                    .collect()
                }
                before = {
                    r["_src_file"]: (r["end"], r["cnt"], r["n_failed_ranges"])
                    for r in line_stats
                }
                if again != before:
                    raise RuntimeError(
                        "scan results changed between offset stats and the "
                        "merge write (cached partitions recomputed over "
                        "changed files) — aborting before commit; the batch "
                        "will replay"
                    )

            commit = self.lake.merge(
                events,
                batch_id=batch_id,
                app_metadata={"watermarks": wm_updates, "cleanup": finished},
                write_salt=(
                    self._auto_salt if cfg.write_salt == "auto" else cfg.write_salt
                ),
                precommit_check=_stats_still_hold,
            )
            if cfg.write_salt == "auto":
                self._update_auto_salt(commit)
            if obs is not None:
                # the merge's write action has run, so the metric is ready
                # (no blocking wait, no extra job)
                n_events = int(obs.get["n"])
        finally:
            for p in lines_parts:
                p.unpersist()

        cleaned = self._cleanup(finished)
        self.watermarks.commit(wm_updates, seq, removed_paths=cleaned + wm_purge)
        if cfg.discovery_ack_fn is not None:
            # safe point: these paths' offsets are durable, so
            # acknowledging their queue messages can no longer lose a
            # discovery; capped-out paths are excluded — their messages
            # stay pending until their own watermark lands
            cfg.discovery_ack_fn(
                {u["path"] for u in wm_updates}
                | set(finished)
                | self._vanished
            )
            self._vanished = set()

        if cfg.compact_every and seq > 0 and seq % cfg.compact_every == 0:
            self.lake.compact(
                min_files_per_bucket=cfg.compact_min_files_per_bucket,
                max_buckets=cfg.compact_max_buckets_per_trigger or None,
            )
            self.lake.vacuum()

        res = BatchResult(
            batch_id, seq, len(work), n_events,
            commit.metrics.get("rows_written", 0), cleaned=cleaned,
            duration_s=time.monotonic() - t0, schema_diff=schema_diff,
        )
        self._log_metrics(res, commit.metrics, added=commit.added, version=commit.version)
        return res

    def run(self, policy, stop_on_error: bool = False) -> list[BatchResult]:
        """Drain a trigger policy (streaming/triggers.py).

        By default a failed batch is logged and the loop continues with the
        next trigger — the reference's poll loop warns and returns an empty
        batch on policy errors (FsSourceTask.java:127-133). Nothing is
        half-committed: the exactly-once protocol replays the failed batch
        on the next trigger (same batch_seq until the watermark commit
        lands). ``stop_on_error=True`` propagates instead.
        """
        results: list[BatchResult] = []
        for _ in policy.triggers():
            try:
                results.append(self.run_once())
            except Exception as e:
                if stop_on_error:
                    raise
                import sys
                import traceback

                print(f"kcfs: batch failed, will retry next trigger: {e}", file=sys.stderr)
                traceback.print_exc()
        return results

    # ---------------------------------------------------------- auto salt
    def _update_auto_salt(self, commit) -> None:
        """Feedback controller for the hot-conv_id write salt
        (write_salt="auto"): size the NEXT batch's salt from the
        per-bucket row counts this commit's manifest already carries —
        zero extra Spark jobs. Per-bucket rows are salt-independent (the
        salt splits a bucket's rows across files WITHIN the bucket), so
        the measurement is unbiased whatever salt this batch used. Rise
        is immediate (the hot bucket would otherwise serialize its write
        into one task next batch too); decay is one step per calm batch
        (a transient spike shouldn't keep fragmenting files that
        compaction then has to fold)."""
        by_bucket: dict[int, int] = {}
        for a in commit.added:
            b = a.get("bucket")
            by_bucket[b] = by_bucket.get(b, 0) + int(a.get("rows", 0))
        hot = max(by_bucket.values(), default=0)
        target = max(1, int(self.config.target_rows_per_write_task))
        desired = min(int(self.config.max_write_salt), -(-hot // target))
        self._auto_salt = (
            desired if desired >= self._auto_salt else max(1, self._auto_salt - 1)
        )

    # -------------------------------------------------------------- cleanup
    def _cleanup(self, paths: list[str]) -> list[str]:
        """Apply NONE/MOVE/DELETE to fully-consumed files
        (AbstractPolicy.java:281-331, which routes through Hadoop FS for
        ANY scheme — here pyarrow.fs plays that role for URI paths).

        Returns only the paths whose side-effect actually applied (or was
        verifiably already applied — NotFound under replay). A failed path
        is warned and SKIPPED: its watermark row survives, so the file is
        retried next trigger instead of being silently re-ingested forever."""
        mode = self.config.cleanup
        if mode == "none" or not paths:
            return []
        done = []
        for p in paths:
            try:
                self._cleanup_one(p, mode)
                done.append(p)
            except OSError as e:
                # transient I/O only — deterministic config errors
                # (unknown mode, missing move dir, cross-FS move) raise at
                # __init__ or propagate here instead of retrying forever
                import sys

                print(f"kcfs: cleanup failed for {p}, will retry: {e}", file=sys.stderr)
        return done

    def _cleanup_one(self, p: str, mode: str) -> None:
        if "://" in p:
            # pyarrow.fs for every URI scheme (file:// exercises the same
            # code path the remote schemes take)
            import pyarrow.fs as pafs

            fs, sub = _fs_for_uri(p)
            if fs.get_file_info(sub).type == pafs.FileType.NotFound:
                return  # already cleaned (replay) — the ONLY idempotent case
            if mode == "delete":
                fs.delete_file(sub)
            elif mode == "move":
                dest_dir = self._require_move_dir()
                if "://" in dest_dir:
                    dfs, dsub = _fs_for_uri(dest_dir)
                    if type(dfs) is not type(fs):
                        raise ValueError(
                            f"cleanup_move_dir {dest_dir!r} is on a different "
                            f"filesystem than {p!r}"
                        )
                else:
                    dfs, dsub = fs, dest_dir
                dfs.create_dir(dsub, recursive=True)
                name = self.config.cleanup_move_prefix + os.path.basename(sub)
                fs.move(sub, f"{dsub.rstrip('/')}/{name}")
            else:
                raise ValueError(f"unknown cleanup mode: {mode}")
            return
        if not os.path.exists(p):
            return  # already cleaned (replay)
        if mode == "delete":
            os.unlink(p)
        elif mode == "move":
            dest_dir = self._require_move_dir()
            os.makedirs(dest_dir, exist_ok=True)
            name = self.config.cleanup_move_prefix + os.path.basename(p)
            shutil.move(p, os.path.join(dest_dir, name))
        else:
            raise ValueError(f"unknown cleanup mode: {mode}")

    def _require_move_dir(self) -> str:
        dest = self.config.cleanup_move_dir
        if not dest:
            raise ValueError("cleanup=move requires cleanup_move_dir")
        return dest

    # -------------------------------------------------------------- metrics
    def _log_metrics(
        self, res: BatchResult, merge_metrics: dict, added=None, version=None
    ) -> None:
        rec = {
            "batch_id": res.batch_id,
            "lake_version": version,
            "seq": res.seq,
            "n_files": res.n_files,
            "n_events": res.n_events,
            "rows_written": res.rows_written,
            "recovered": res.recovered,
            "cleaned": len(res.cleaned),
            "duration_s": round(res.duration_s, 4),
            "merge": merge_metrics,
        }
        if res.schema_diff:
            rec["schema_diff"] = res.schema_diff
        if added:
            per_bucket: dict[int, int] = {}
            for a in added:
                per_bucket[a["bucket"]] = per_bucket.get(a["bucket"], 0) + a["rows"]
            rec["rows_per_bucket"] = {str(k): v for k, v in sorted(per_bucket.items())}
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def _fs_for_uri(uri: str):
    """pyarrow FileSystem + in-FS path for a URI (indirection point: tests
    substitute a fake remote FS here, since the pyarrow class is immutable)."""
    import pyarrow.fs as pafs

    return pafs.FileSystem.from_uri(uri)


def _compressed(path: str) -> bool:
    # single source of truth with the scanner: a new codec extension added
    # there (e.g. .zst) must change planning semantics here too
    from kafka_connect_fs_spark.sources.readers import _compression_of

    return _compression_of(path) is not None


def _still_exists(path: str) -> bool:
    if "://" in path and not path.startswith("file://"):
        try:
            import pyarrow.fs as pafs

            # through the same indirection point cleanup uses, so tests
            # substituting a fake remote FS exercise this fallback too
            fs, p = _fs_for_uri(path)
            return fs.get_file_info(p).type != pafs.FileType.NotFound
        except Exception:
            return False
    local = path[len("file://"):] if path.startswith("file://") else path
    return os.path.exists(local)
