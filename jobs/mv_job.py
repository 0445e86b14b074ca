#!/usr/bin/env python
"""Materialized-view tailer: keep an IncrementalRollup fresh beside a
live ingest daemon.

    spark-submit --py-files kcfs.zip jobs/mv_job.py \
        --base s3://bucket/lake/transcripts \
        --mv   s3://bucket/lake/conv_rollup \
        --group-cols conv_id \
        --agg n_turns:count --agg total_chars:sum_length:text \
        --agg last_ts:max:ts \
        --triggers 0 --interval 5

This is the CDC downstream deployment shape: a SEPARATE process tails
the base table's change feed (plans/lake.py read_changes) the same way
the ingest engine tails files, refreshing the MV by partial recompute of
touched groups (plans/materialized.py). Safe beside the live ingest
loop by construction: each refresh pins its live-file view at the head
version it absorbs, and the MV merge carries a window-derived batch_id,
so a crashed-and-restarted tailer replays as a no-op.

--triggers 0 = run forever (SIGTERM to stop); N = run N refresh cycles.
Aggregate specs are name:fn[:col] with fn in {count, sum, sum_length,
max, min, count_distinct} — count takes no column.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_agg(spec: str):
    from pyspark.sql import functions as F

    parts = spec.split(":")
    if len(parts) == 2:
        name, fn = parts
        col = None
    elif len(parts) == 3:
        name, fn, col = parts
    else:
        raise SystemExit(f"bad --agg spec {spec!r} (want name:fn[:col])")
    fns = {
        "count": lambda c: F.count(F.lit(1)),
        "sum": lambda c: F.sum(c),
        "sum_length": lambda c: F.sum(F.length(c)),
        "max": lambda c: F.max(c),
        "min": lambda c: F.min(c),
        "count_distinct": lambda c: F.countDistinct(c),
    }
    if fn not in fns:
        raise SystemExit(f"unknown agg fn {fn!r} (have {sorted(fns)})")
    if fn != "count" and col is None:
        raise SystemExit(f"agg fn {fn!r} needs a column: {spec!r}")
    return name, fns[fn](col)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", required=True, help="base LakeTable root")
    p.add_argument("--mv", required=True, help="MV LakeTable root")
    p.add_argument("--group-cols", required=True,
                   help="comma-separated; must start with the base bucket key")
    p.add_argument("--agg", action="append", required=True,
                   help="name:fn[:col], repeatable")
    p.add_argument("--n-buckets", type=int, default=16)
    p.add_argument("--triggers", type=int, default=0,
                   help="refresh cycles to run; 0 = forever")
    p.add_argument("--interval", type=float, default=5.0,
                   help="seconds between refresh polls")
    p.add_argument("--compact-every", type=int, default=32,
                   help="fold the MV's own delta files down every N "
                        "non-noop refreshes (each refresh appends one "
                        "delta set per touched MV bucket); 0 = never")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from kafka_connect_fs_spark.plans.lake import LakeTable
    from kafka_connect_fs_spark.plans.materialized import IncrementalRollup

    spark = SparkSession.builder.appName("kcfs-mv-tailer").getOrCreate()
    base = LakeTable(spark, args.base)
    mv = IncrementalRollup(
        base,
        args.mv,
        group_cols=args.group_cols.split(","),
        aggs=dict(parse_agg(s) for s in args.agg),
        n_buckets=args.n_buckets,
    )
    n = 0
    applied = 0
    while True:
        st = mv.refresh()
        if not st.noop:
            applied += 1
            print(json.dumps({
                "from": st.from_version, "to": st.to_version,
                "groups": st.n_groups_refreshed, "deleted": st.n_groups_deleted,
                "files_read": st.n_files_read, "files_live": st.n_live_files,
            }), flush=True)
            if args.compact_every and applied % args.compact_every == 0:
                # the MV is itself a lake table: fold its per-refresh
                # delta files down and drop unreferenced ones
                mv.table.compact(min_files_per_bucket=2)
                mv.table.vacuum()
        n += 1
        if args.triggers and n >= args.triggers:
            break
        time.sleep(args.interval)
    print(json.dumps({"done": True, "cycles": n, "lag": mv.lag()}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
