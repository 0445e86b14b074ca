#!/usr/bin/env python
"""Lake maintenance entry point: compaction / tombstone expiry / vacuum.

    spark-submit --py-files kcfs.zip jobs/maintenance_job.py \
        --table s3://bucket/lake/transcripts \
        compact --min-files-per-bucket 4
        | expire --older-than "2024-01-01 00:00:00"
        | vacuum --retain-versions 10

Separating maintenance from ingest is the deployment shape that keeps the
ingest daemon's latency flat: the MoR write path never pays for fold-downs
(a second, lower-priority job owns them), and vacuum retention is an
explicit operator decision (it bounds both time travel and the
read_changes changelog window).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table", required=True)
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("compact")
    c.add_argument("--min-files-per-bucket", type=int, default=4)
    c.add_argument("--max-buckets", type=int, default=None,
                   help="bound one run to the N most fragmented buckets "
                        "(incremental compaction; default: all)")
    e = sub.add_parser("expire")
    e.add_argument("--older-than", required=True,
                   help="timestamp 'YYYY-MM-DD HH:MM:SS'; tombstones with "
                        "older ts are dropped (safe past the replay horizon)")
    v = sub.add_parser("vacuum")
    v.add_argument("--retain-versions", type=int, default=2)
    v.add_argument("--min-age-seconds", type=float, default=3600.0,
                   help="skip unreferenced files younger than this — "
                        "guards concurrent writers mid-commit")
    d = sub.add_parser("delete-where",
                       help="predicate delete (retention / compliance): "
                            "tombstone keys whose current row matches")
    d.add_argument("--condition", required=True,
                   help="SQL boolean over the table's user-facing "
                        "columns, e.g. \"ts < TIMESTAMP '2023-01-01'\" "
                        "or \"conv_id = 'conv_000123'\"")
    d.add_argument("--batch-id", default=None,
                   help="idempotency key: re-running with the same id "
                        "is a no-op")
    d.add_argument("--needed-columns", default=None,
                   help="comma-separated columns the condition reads — "
                        "prunes the matching scan")
    args = p.parse_args(argv)

    import datetime as dt

    from pyspark.sql import SparkSession

    from kafka_connect_fs_spark.plans.lake import LakeTable

    spark = SparkSession.builder.appName("kcfs-maintenance").getOrCreate()
    table = LakeTable(spark, args.table)
    out: dict = {"table": args.table, "cmd": args.cmd}
    if args.cmd == "compact":
        # safe beside a live ingest loop: compact() retries through
        # ConcurrentCommitError at the new head version
        commit = table.compact(
            min_files_per_bucket=args.min_files_per_bucket,
            max_buckets=args.max_buckets,
        )
        out["commit"] = commit.metrics if commit else None
    elif args.cmd == "expire":
        when = dt.datetime.strptime(args.older_than, "%Y-%m-%d %H:%M:%S")
        commit = table.expire_tombstones(when)
        out["commit"] = commit.metrics if commit else None
    elif args.cmd == "vacuum":
        out["files_removed"] = table.vacuum(
            retain_versions=args.retain_versions,
            min_age_seconds=args.min_age_seconds,
        )
    elif args.cmd == "delete-where":
        commit = table.delete_where(
            args.condition,
            batch_id=args.batch_id,
            needed_columns=(
                args.needed_columns.split(",") if args.needed_columns else None
            ),
        )
        out["commit"] = commit.metrics if commit else None
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
