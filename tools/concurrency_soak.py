#!/usr/bin/env python
"""Two-process concurrency soak: live ingest racing a real compactor.

Proves the deployment shape BENCH.md advertises — an IngestEngine loop in
THIS process committing batches while ``jobs/maintenance_job.py compact``
runs in genuinely SEPARATE spark-submit JVMs against the same table —
under the commit protocol's put-if-absent race rules:

- every ingest batch commits (zero lost batches),
- at least one compaction commit RETRIES through ConcurrentCommitError
  (the race actually happened; compaction reads the head version before
  its multi-second rewrite, so a live ingest loop almost always steals
  the version — the soak keeps ingesting past ``--batches`` until one
  retry is observed, bounded by ``--max-batches``),
- the final table state equals the Python LWW oracle over every
  generated event (including deletes) — byte-for-byte per-turn text.

    PYTHONPATH=/root/repo python tools/concurrency_soak.py \
        --batches 50 --out bench_artifacts/r05_concurrency_soak.json
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

from kafka_connect_fs_spark.testing.generator import (  # noqa: E402
    BASE_TS,
    ROLES,
    _payload,
    expected_final_state,
    write_jsonl,
)

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def batch_rows(b: int, n_convs: int, turns: int) -> list[dict]:
    """Batch b upserts version b of every key (monotone ts), replays a
    handful of stale batch b-1 events (late data the LWW must reject),
    and deletes two keys with a fresh tombstone."""
    rows: list[dict] = []

    def ev(c: int, t: int, v: int, sec: int, op: str = "upsert") -> dict:
        conv = f"conv_{c:06d}"
        role = ROLES[t % len(ROLES)]
        return {
            "op": op,
            "conv_id": conv,
            "turn_idx": t,
            "role": role,
            "text": f"{conv}:{t}:v{v}:{_payload(conv, t, v)}",
            "tool": f"tool_{t % 5}" if role == "tool" else None,
            "ts": BASE_TS + dt.timedelta(seconds=sec),
        }

    for c in range(n_convs):
        for t in range(turns):
            rows.append(ev(c, t, b, b * 100_000 + c * turns + t))
    if b > 0:
        for i in range(5):  # late duplicates of the previous version
            c, t = (b + i) % n_convs, i % turns
            rows.append(ev(c, t, b - 1, (b - 1) * 100_000 + c * turns + t))
        for i in range(2):  # tombstones newer than every upsert this batch
            c, t = (b * 3 + i) % n_convs, (b + i) % turns
            rows.append(ev(c, t, b, b * 100_000 + 90_000 + i, op="delete"))
    return rows


def run_soak(
    batches: int = 50,
    max_batches: int = 120,
    n_convs: int = 40,
    turns: int = 6,
    cores: int = 8,
    work_dir: str | None = None,
    require_retry: bool = True,
) -> dict:
    from kafka_connect_fs_spark.plans.lake import LakeTable
    from kafka_connect_fs_spark.session import get_spark
    from kafka_connect_fs_spark.streaming.engine import IngestConfig, IngestEngine
    from kafka_connect_fs_spark.testing.generator import CHANGE_EVENT_SCHEMA

    base = work_dir or tempfile.mkdtemp(prefix="kcfs_soak2p_")
    src = os.path.join(base, "src")
    table = os.path.join(base, "table")
    os.makedirs(src, exist_ok=True)
    stop_flag = os.path.join(base, "STOP")
    mlog = os.path.join(base, "maintenance.jsonl")
    merr = os.path.join(base, "maintenance.err")

    from pyspark.sql import SparkSession

    # getOrCreate() REUSES a caller's active session (e.g. the pytest
    # fixture) — stopping a session we didn't create would kill every
    # later test in that process
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("soak_ingest", cores=cores, shuffle_partitions=cores)
    engine = IngestEngine(
        spark,
        IngestConfig(
            uris=[src],
            table_root=table,
            checkpoint_root=os.path.join(base, "ckpt"),
            fmt="jsonl",
            schema=CHANGE_EVENT_SCHEMA,
            n_buckets=8,
        ),
    )
    # first batch BEFORE the compactor starts: the table must exist
    all_rows = batch_rows(0, n_convs, turns)
    write_jsonl(all_rows, os.path.join(src, "batch_00000.jsonl"))
    engine.run_once()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    loop = (
        f"while [ ! -f {stop_flag} ]; do "
        f"{SPARK_SUBMIT} --master local[4] --conf spark.ui.enabled=false "
        f"--conf spark.sql.shuffle.partitions=8 "
        f"{repo}/jobs/maintenance_job.py --table {table} "
        f"compact --min-files-per-bucket 2 >> {mlog} 2>> {merr}; "
        f"done"
    )
    env = {**os.environ, "PYTHONPATH": repo}
    compactor = subprocess.Popen(["bash", "-c", loop], env=env)

    def retries_seen() -> int:
        try:
            lines = open(mlog).read().splitlines()
        except OSError:
            return 0
        n = 0
        for ln in lines:
            try:
                c = json.loads(ln).get("commit") or {}
            except json.JSONDecodeError:
                continue
            n += int(c.get("commit_retries", 0))
        return n

    t0 = time.monotonic()
    ingest_commits = 1
    b = 1
    try:
        while b < max_batches:
            rows = batch_rows(b, n_convs, turns)
            all_rows += rows
            write_jsonl(rows, os.path.join(src, f"batch_{b:05d}.jsonl"))
            res = engine.run_once()
            assert res.n_events == len(rows), (b, res.n_events, len(rows))
            ingest_commits += 1
            b += 1
            if b >= batches and (not require_retry or retries_seen() >= 1):
                break
    finally:
        open(stop_flag, "w").close()
        # don't let a slow final compaction run (cold spark-submit JVM +
        # multi-bucket rewrite) raise TimeoutExpired out of the finally
        # block — that would mask the soak body's real failure and leave
        # the loop spawning JVMs against a dir we're about to tear down
        try:
            compactor.wait(timeout=120)
        except subprocess.TimeoutExpired:
            compactor.terminate()
            try:
                compactor.wait(timeout=15)
            except subprocess.TimeoutExpired:
                compactor.kill()
                compactor.wait()
    wall = time.monotonic() - t0

    # fresh handle: include every commit either process landed
    lake = LakeTable(spark, table)
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in lake.read().select("conv_id", "turn_idx", "text").collect()
    }
    exp = {k: v["text"] for k, v in expected_final_state(all_rows).items()}
    state_match = got == exp

    history = lake.history()
    ingest_in_log = sum(1 for c in history if c.get("batch_id"))
    compactions = [
        c for c in history if (c.get("metrics") or {}).get("compaction")
    ]
    ingest_retries = sum(
        int((c.get("metrics") or {}).get("commit_retries", 0))
        for c in history
        if c.get("batch_id")
    )
    total_retries = retries_seen()
    maintenance_runs = sum(
        1 for ln in open(mlog).read().splitlines() if ln.strip().startswith("{")
    ) if os.path.exists(mlog) else 0

    result = {
        "batches_ingested": b,
        "ingest_commits_in_log": ingest_in_log,
        "zero_lost_batches": ingest_in_log == ingest_commits,
        "compaction_commits": len(compactions),
        "maintenance_runs": maintenance_runs,
        "compaction_commit_retries": total_retries,
        "ingest_commit_retries": ingest_retries,
        "race_exercised": total_retries >= 1,
        "final_state_keys": len(got),
        "state_matches_oracle": state_match,
        "wall_seconds": round(wall, 1),
        "work_dir": base,
    }
    if owns_session:
        spark.stop()
    if work_dir is None and state_match:
        shutil.rmtree(base, ignore_errors=True)
        result["work_dir"] = "(removed)"
    return result


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", type=int, default=50)
    p.add_argument("--max-batches", type=int, default=120)
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    result = run_soak(
        batches=args.batches, max_batches=args.max_batches, cores=args.cores
    )
    line = json.dumps(result, indent=2)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    ok = (
        result["zero_lost_batches"]
        and result["state_matches_oracle"]
        and result["race_exercised"]
        and result["compaction_commits"] >= 1
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
