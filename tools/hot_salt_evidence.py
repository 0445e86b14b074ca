"""Hot-key write-salt evidence: what the adaptive salt buys on a skewed batch.

The north rule calls for "salting hot conv_id partitions to control
shuffle skew at 10^10-event scale". LWW itself is skew-immune (map-side
partial `max_by` reduces the hot key before the exchange — BENCH.md
"Hot-key skew"), so the residual skew is the WRITE: every surviving row
of one conv_id lands in one bucket, and a bucket writes in one task, so
a 30%-hot batch serializes ~30% of the write into a single task.
`write_salt` spreads each bucket's write across `salt` tasks;
`write_salt="auto"` sizes it from the previous commit's per-bucket
manifest rows (streaming/engine.py:_update_auto_salt).

Two measurements over the SAME skewed input (events ×mult, ~30% of rows
remapped to one conv_id, 64 json files):

1. fixed matrix — interleaved best-of-N single-batch full-engine ingest
   at write_salt ∈ {1, 8}: the value of the salt itself.
2. auto trace — ONE engine with write_salt="auto" over consecutive
   batches of the same size (fresh hardlinked copies of the source
   files): per-batch applied salt + duration from the engine's metrics
   log, showing the controller converging after one batch.

target_rows_per_write_task is set to 250k here: production batches at
10^10-event scale are 10^8+ events (hot bucket ≫ the 2M default target);
the sandbox batch is 6M, so the target scales down proportionally to put
the controller in the same operating regime.

Usage:
    python tools/hot_salt_evidence.py
    env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
         SPARK_GRAFT_MULT (default 60 -> ~6M events),
         SPARK_GRAFT_ROUNDS (default 3)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_CONV = "conv_hot_0"
N_FILES = 64
TARGET_ROWS = 250_000


def _write_skewed_src(spark, sf_dir: str, mult: int, src: str) -> int:
    """events ×mult as change events, ~30% remapped to one conv_id.

    Hot rows get a unique turn_idx (derived from event_id) so the hot
    conversation is one giant multi-turn transcript — rows survive LWW
    and the write really carries ~30% of the batch into one bucket.
    """
    from pyspark.sql import functions as F

    from kafka_connect_fs_spark.queries import _transcript_events, t

    ev = _transcript_events(t(spark, sf_dir, "events"))
    v = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("v")
    ev = ev.select("*", v).select(
        "conv_id",
        "turn_idx",
        "role",
        F.concat_ws(":", "text", F.col("v").cast("string")).alias("text"),
        (F.col("ts") + F.make_interval(secs=F.col("v") * 1_000_000)).alias("ts"),
        (F.col("event_id") + F.col("v") * 10_000_000).alias("event_id"),
    )
    hot = F.pmod(F.col("event_id"), F.lit(10)) < 3  # deterministic ~30%
    ev = ev.select(
        F.lit("upsert").alias("op"),
        F.when(hot, F.lit(HOT_CONV)).otherwise(F.col("conv_id")).alias("conv_id"),
        F.when(hot, F.pmod(F.col("event_id"), F.lit(2_000_000_000)).cast("int"))
        .otherwise(F.col("turn_idx"))
        .alias("turn_idx"),
        "role",
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
    )
    n = ev.count()
    ev.repartition(N_FILES).write.mode("overwrite").json(src)
    return n


def _make_engine(spark, base: str, src: str, tag: str, **cfg_overrides):
    from kafka_connect_fs_spark.streaming.engine import IngestConfig, IngestEngine
    from kafka_connect_fs_spark.testing.generator import CHANGE_EVENT_SCHEMA

    return IngestEngine(
        spark,
        IngestConfig(
            uris=[src],
            regexp=r".*\.json$",
            table_root=os.path.join(base, f"table_{tag}"),
            checkpoint_root=os.path.join(base, f"ckpt_{tag}"),
            fmt="jsonl",
            schema=CHANGE_EVENT_SCHEMA,
            n_buckets=32,
            **cfg_overrides,
        ),
    )


def fixed_matrix(spark, base: str, src: str, n_events: int, rounds: int) -> dict:
    salts = [1, 8]
    runs: dict[int, list[float]] = {s: [] for s in salts}
    for r in range(rounds):
        for s in salts:
            os.sync()
            t0 = time.monotonic()
            res = _make_engine(
                spark, base, src, f"s{s}_r{r}", write_salt=s
            ).run_once()
            dt = time.monotonic() - t0
            assert res.n_events == n_events, (res.n_events, n_events)
            runs[s].append(round(dt, 3))
            print(f"[round {r}] salt={s} {dt:.2f}s", file=sys.stderr)
    out = {}
    for s in salts:
        best = min(runs[s])
        out[f"salt_{s}"] = {
            "best_seconds": best,
            "best_events_per_sec": round(n_events / best, 1),
            "all_runs_seconds": runs[s],
        }
    out["speedup_salt8_vs_salt1"] = round(
        out["salt_1"]["best_seconds"] / out["salt_8"]["best_seconds"], 3
    )
    return out


def auto_trace(spark, base: str, src: str, n_events: int, n_batches: int = 4) -> dict:
    # one engine, consecutive same-size batches: hardlink the source files
    # under new names per batch so discovery sees fresh work each trigger
    eng = _make_engine(
        spark, base, src, "auto",
        write_salt="auto", target_rows_per_write_task=TARGET_ROWS,
    )
    batches = []
    names = sorted(os.listdir(src))
    part_files = [f for f in names if f.endswith(".json")]
    for b in range(n_batches):
        if b > 0:  # batch 0 consumes the original files
            for f in part_files:
                os.link(os.path.join(src, f), os.path.join(src, f"b{b}_{f}"))
        os.sync()
        t0 = time.monotonic()
        res = eng.run_once()
        dt = time.monotonic() - t0
        assert res.n_events == n_events, (res.n_events, n_events)
        batches.append(round(dt, 3))
        print(f"[auto] batch {b}: {dt:.2f}s", file=sys.stderr)
    # applied salt per batch from the engine's own metrics log
    mpath = eng._metrics_path
    salts, hot_rows = [], []
    with open(mpath) as f:
        for line in f:
            rec = json.loads(line)
            salts.append(rec["merge"].get("write_salt"))
            rpb = rec.get("rows_per_bucket", {})
            hot_rows.append(max((int(x) for x in rpb.values()), default=0))
    return {
        "target_rows_per_write_task": TARGET_ROWS,
        "batch_seconds": batches,
        "applied_write_salt_per_batch": salts,
        "hot_bucket_rows_per_batch": hot_rows,
        "steady_state_seconds": min(batches[1:]) if len(batches) > 1 else None,
    }


def main() -> None:
    from kafka_connect_fs_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = int(os.environ.get("SPARK_GRAFT_MULT", "60"))
    rounds = int(os.environ.get("SPARK_GRAFT_ROUNDS", "3"))
    spark = get_spark("kcfs-hot-salt", cores=32, shuffle_partitions=32)
    base = tempfile.mkdtemp(prefix="kcfs_hotsalt_")
    try:
        src = os.path.join(base, "src")
        os.makedirs(src)
        n_events = _write_skewed_src(spark, sf_dir, mult, src)
        print(f"input: {n_events} events, ~30% on {HOT_CONV}", file=sys.stderr)
        # warm-up: one untimed full pass (sustained-throughput protocol)
        _make_engine(spark, base, src, "warmup").run_once()
        out = {
            "n_events": n_events,
            "hot_fraction": 0.3,
            "n_files": N_FILES,
            "fixed": fixed_matrix(spark, base, src, n_events, rounds),
            "auto": auto_trace(spark, base, src, n_events),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
