"""Extra benchmarks for the optimization rounds (bench.py is FROZEN).

Modes (first CLI arg):
  sweep   — per-query timings in bench order (same methodology: fn + count),
            plus a SECOND timed run of each query (lake caches warm) so the
            build-cost vs steady-cost split is visible. Writes one JSON line.
  plans   — capture .explain("formatted") for every query into
            plans/r06/<name>_<suffix>.txt (suffix = 2nd CLI arg, default
            "before"). Lake-building queries run their builds first (cached).
  micro   — stage-level breakdown of the expensive non-relational queries
            (avro/cobol synthesis vs scan, MV build vs refresh).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)


def _spark():
    from kafka_connect_fs_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark("kcfs-bench-extra", cores=cpus, shuffle_partitions=cpus)


def _sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sweep() -> None:
    from bench import _warm_session
    from kafka_connect_fs_spark.queries import QUERIES

    spark = _spark()
    sf_dir = _sf_dir()
    _warm_session(spark)
    run1, run2 = {}, {}
    for name, fn in QUERIES.items():
        spark.sparkContext.setJobDescription(f"{name} (run1)")
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        run1[name] = round(time.monotonic() - t0, 3)
        spark.sparkContext.setJobDescription(f"{name} (run2)")
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        run2[name] = round(time.monotonic() - t0, 3)
        spark.sparkContext.setJobDescription(None)
    total1 = round(sum(run1.values()), 3)
    total2 = round(sum(run2.values()), 3)
    print(json.dumps({
        "metric": "per-query seconds (run1 = bench-identical order/cold, "
                  "run2 = warm caches)",
        "sf_dir": sf_dir, "run1": run1, "run2": run2,
        "total_run1": total1, "total_run2": total2,
    }))
    spark.stop()


def plans(suffix: str = "before") -> None:
    from kafka_connect_fs_spark.queries import QUERIES

    spark = _spark()
    sf_dir = _sf_dir()
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"plan captured: {name}", file=sys.stderr)
        except Exception as e:  # capture everything we can, report the rest
            print(f"plan FAILED: {name}: {type(e).__name__}: {e}",
                  file=sys.stderr)
    spark.stop()


def micro() -> None:
    """Stage-level breakdown of the expensive composite queries."""
    from pyspark.sql import functions as F

    from bench import _warm_session
    from kafka_connect_fs_spark.queries import (
        _build_split_lake, _transcript_events, t, TS_FMT_SPARK,
    )

    spark = _spark()
    sf_dir = _sf_dir()
    _warm_session(spark)
    out: dict = {}

    # ---- avro_ingest_roundtrip breakdown
    import shutil
    import tempfile

    from kafka_connect_fs_spark.sources.avro_io import write_container
    from kafka_connect_fs_spark.sources.readers import WorkItem, read_columnar

    t0 = time.monotonic()
    e = (
        t(spark, sf_dir, "events")
        .where(F.col("event_id") < 2000)
        .select(
            "event_id", "user_id", "event_type", "value",
            F.date_format(F.col("ts").cast("timestamp"), TS_FMT_SPARK).alias("ts_s"),
        )
        .collect()
    )
    out["avro_collect_s"] = round(time.monotonic() - t0, 3)
    schema = {
        "type": "record", "name": "Ev",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "user_id", "type": "long"},
            {"name": "event_type", "type": ["null", "string"]},
            {"name": "value", "type": "double"},
            {"name": "ts_s", "type": "string"},
        ],
    }
    base = tempfile.mkdtemp(prefix="kcfs_micro_avro_")
    try:
        path = os.path.join(base, "events.avro")
        t0 = time.monotonic()
        write_container(path, schema, [r.asDict() for r in e], codec="deflate")
        out["avro_write_s"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        df = read_columnar(spark, [WorkItem(path, 0, os.path.getsize(path))], "avro")
        out["avro_plan_s"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        df.count()
        out["avro_count_s"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        df.count()
        out["avro_count2_s"] = round(time.monotonic() - t0, 3)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    # ---- split-lake build vs the queries that reuse it
    t0 = time.monotonic()
    lake = _build_split_lake(spark, sf_dir)
    out["split_lake_build_s"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    lake.read().count()
    out["lake_resolved_read_s"] = round(time.monotonic() - t0, 3)

    # ---- MV breakdown (mv_conv_rollup shape)
    from kafka_connect_fs_spark.plans.materialized import IncrementalRollup

    v1 = lake.get_commit_by_batch_id("b1").version
    base = tempfile.mkdtemp(prefix="kcfs_micro_mv_")
    try:
        mv = IncrementalRollup(
            lake, os.path.join(base, "mv"), group_cols=["conv_id"],
            aggs={
                "n_turns": F.count(F.lit(1)),
                "total_chars": F.sum(F.length("text")),
                "last_ts": F.max("ts"),
            },
            n_buckets=8,
        )
        t0 = time.monotonic()
        mv.refresh(to_version=v1)
        out["mv_initial_build_s"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        mv.refresh()
        out["mv_incremental_s"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        mv.read().count()
        out["mv_read_s"] = round(time.monotonic() - t0, 3)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    # ---- ingest_e2e breakdown: file synthesis vs engine run
    from kafka_connect_fs_spark.streaming.engine import IngestConfig, IngestEngine
    from kafka_connect_fs_spark.testing.generator import CHANGE_EVENT_SCHEMA

    base = tempfile.mkdtemp(prefix="kcfs_micro_e2e_")
    try:
        src = os.path.join(base, "src")
        os.makedirs(src)
        ev = _transcript_events(t(spark, sf_dir, "events"))
        jsonl = ev.select(
            F.lit("upsert").alias("op"), "conv_id", "turn_idx", "role", "text",
            F.lit(None).cast("string").alias("tool"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
            "event_id",
        )
        t0 = time.monotonic()
        (
            jsonl.repartitionByRange(4, "event_id")
            .sortWithinPartitions("event_id")
            .drop("event_id")
            .write.mode("overwrite").json(src)
        )
        out["e2e_file_synth_s"] = round(time.monotonic() - t0, 3)
        engine = IngestEngine(
            spark,
            IngestConfig(
                uris=[src], table_root=os.path.join(base, "table"),
                checkpoint_root=os.path.join(base, "ckpt"), fmt="jsonl",
                schema=CHANGE_EVENT_SCHEMA, n_buckets=16,
            ),
        )
        t0 = time.monotonic()
        engine.run_once()
        out["e2e_engine_s"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        engine.lake.read().count()
        out["e2e_read_s"] = round(time.monotonic() - t0, 3)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    if mode == "sweep":
        sweep()
    elif mode == "plans":
        plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    elif mode == "micro":
        micro()
    else:
        raise SystemExit(f"unknown mode {mode!r}")
