#!/usr/bin/env python
"""Two-process MV soak: a live ingest loop with a real CDF tailer beside it.

The deployment shape plans/materialized.py is built for: THIS process
runs an IngestEngine committing change batches into the base lake while
``jobs/mv_job.py`` polls ``read_changes`` from genuinely SEPARATE
spark-submit JVMs, refreshing a per-conversation rollup by partial
recompute. Asserted at the end:

- the tailer observed ≥1 INCREMENTAL refresh that read fewer files than
  were live (bucket pruning worked against a moving table),
- refreshes interleaved with ingest commits (real concurrency, not a
  final batch catch-up),
- after a last catch-up cycle, the MV equals a pure-Python rollup oracle
  over every generated event (LWW + deletes), group by conversation:
  n_turns, total_chars, last_ts.

    PYTHONPATH=/root/repo python tools/mv_soak.py \
        --batches 20 --out bench_artifacts/r05_mv_soak.json
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.concurrency_soak import SPARK_SUBMIT, batch_rows  # noqa: E402

from kafka_connect_fs_spark.testing.generator import (  # noqa: E402
    expected_final_state,
    write_jsonl,
)


def narrow_batch(b: int, n_convs: int, turns: int) -> list[dict]:
    """A CDC-realistic batch: only a rotating 1/8th of the conversations
    change (plus the stock late-duplicates and tombstones) — this is what
    makes bucket pruning OBSERVABLE in the tailer's refresh stats; a
    batch touching every key touches every bucket and prunes nothing."""
    rows = batch_rows(b, n_convs, turns)
    keep = {f"conv_{c:06d}" for c in range(n_convs) if c % 8 == b % 8}
    return [r for r in rows if r["conv_id"] in keep or r["op"] == "delete"]


def rollup_oracle(rows: list[dict]) -> dict[str, tuple[int, int, dt.datetime]]:
    state = expected_final_state(rows)
    out: dict[str, list] = {}
    for (conv, _turn), r in state.items():
        cur = out.setdefault(conv, [0, 0, None])
        cur[0] += 1
        cur[1] += len(r["text"])
        # generator timestamps are tz-aware UTC; Spark collects naive
        # UTC (session TZ) — normalize for the comparison
        ts = r["ts"].replace(tzinfo=None) if r["ts"].tzinfo else r["ts"]
        cur[2] = ts if cur[2] is None else max(cur[2], ts)
    return {c: tuple(v) for c, v in out.items()}


def run_soak(
    batches: int = 20,
    n_convs: int = 40,
    turns: int = 6,
    cores: int = 8,
    ingest_interval: float = 1.5,
    work_dir: str | None = None,
) -> dict:
    from kafka_connect_fs_spark.plans.lake import LakeTable
    from kafka_connect_fs_spark.plans.materialized import IncrementalRollup
    from kafka_connect_fs_spark.session import get_spark
    from kafka_connect_fs_spark.streaming.engine import IngestConfig, IngestEngine
    from kafka_connect_fs_spark.testing.generator import CHANGE_EVENT_SCHEMA
    from pyspark.sql import functions as F

    base = work_dir or tempfile.mkdtemp(prefix="kcfs_mvsoak_")
    src = os.path.join(base, "src")
    table = os.path.join(base, "table")
    mv_root = os.path.join(base, "mv")
    os.makedirs(src, exist_ok=True)
    stop_flag = os.path.join(base, "STOP")
    tlog = os.path.join(base, "tailer.jsonl")
    terr = os.path.join(base, "tailer.err")

    spark = get_spark("mv_soak_ingest", cores=cores, shuffle_partitions=cores)
    engine = IngestEngine(
        spark,
        IngestConfig(
            uris=[src],
            table_root=table,
            checkpoint_root=os.path.join(base, "ckpt"),
            fmt="jsonl",
            schema=CHANGE_EVENT_SCHEMA,
            n_buckets=16,
        ),
    )
    # batch 0 before the tailer starts: the base table must exist
    all_rows = batch_rows(0, n_convs, turns)
    write_jsonl(all_rows, os.path.join(src, "batch_00000.jsonl"))
    engine.run_once()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mv_cmd = (
        f"{SPARK_SUBMIT} --master local[4] --conf spark.ui.enabled=false "
        f"--conf spark.sql.shuffle.partitions=8 "
        f"{repo}/jobs/mv_job.py --base {table} --mv {mv_root} "
        f"--group-cols conv_id --n-buckets 16 "
        f"--agg n_turns:count --agg total_chars:sum_length:text "
        f"--agg last_ts:max:ts "
    )
    loop = (
        f"while [ ! -f {stop_flag} ]; do "
        f"{mv_cmd} --triggers 3 --interval 1 >> {tlog} 2>> {terr}; done"
    )
    env = {**os.environ, "PYTHONPATH": repo}
    tailer = subprocess.Popen(["bash", "-c", loop], env=env)

    t0 = time.monotonic()
    try:
        for b in range(1, batches):
            rows = narrow_batch(b, n_convs, turns)
            all_rows += rows
            write_jsonl(rows, os.path.join(src, f"batch_{b:05d}.jsonl"))
            res = engine.run_once()
            assert res.n_events == len(rows), (b, res.n_events, len(rows))
            # pace the stream so the tailer's poll loop interleaves with
            # live commits instead of racing a burst that ends before its
            # cold spark-submit JVM is even up
            time.sleep(ingest_interval)
    finally:
        open(stop_flag, "w").close()
        try:
            tailer.wait(timeout=120)
        except subprocess.TimeoutExpired:
            tailer.terminate()
            try:
                tailer.wait(timeout=15)
            except subprocess.TimeoutExpired:
                tailer.kill()
                tailer.wait()
    wall = time.monotonic() - t0

    refreshes = []
    for ln in open(tlog).read().splitlines() if os.path.exists(tlog) else []:
        try:
            rec = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if "from" in rec:
            refreshes.append(rec)
    incremental = [
        r for r in refreshes if r["from"] >= 0 and r["files_read"] < r["files_live"]
    ]

    # final catch-up in-process (fresh handle on the same MV roots —
    # exercises restart-from-state just like a restarted tailer would)
    lake = LakeTable(spark, table)
    mv = IncrementalRollup(
        lake, mv_root, group_cols=["conv_id"],
        aggs={
            "n_turns": F.count(F.lit(1)),
            "total_chars": F.sum(F.length("text")),
            "last_ts": F.max("ts"),
        },
        n_buckets=16,
    )
    final = mv.refresh()
    got = {
        r.conv_id: (r.n_turns, r.total_chars, r.last_ts)
        for r in mv.read().select(
            "conv_id", "n_turns", "total_chars", "last_ts"
        ).collect()
    }
    exp = rollup_oracle(all_rows)
    state_match = got == exp

    out = {
        "batches": batches,
        "ingest_commits": batches,
        "tailer_refreshes": len(refreshes),
        "incremental_refreshes": len(incremental),
        "sample_incremental": incremental[:3],
        "final_catchup": {
            "from": final.from_version, "to": final.to_version,
            "noop": final.noop,
        },
        "mv_groups": len(got),
        "state_match": state_match,
        "wall_s": round(wall, 1),
    }
    if work_dir is None:
        shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", type=int, default=20)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    res = run_soak(batches=args.batches)
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    ok = (
        res["state_match"]
        and res["incremental_refreshes"] >= 1
        and res["tailer_refreshes"] >= 2
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
