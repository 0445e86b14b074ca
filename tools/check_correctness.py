#!/usr/bin/env python
"""Run every __spark_entry__.queries() entry against its oracle_sql() via
DuckDB at an arbitrary sf dir (the driver does this at sf0.01; this tool
exists to evidence the same equality at LARGER scale, e.g. the synthetic
/tmp/sf1 from tools/make_sf.py).

    python tools/check_correctness.py --sf-dir /tmp/sf1 [--queries a,b,c]

Prints one JSON line per query {name, rows_match, schema_match,
value_match, spark_rows, oracle_rows, seconds} and a final summary line;
exit 1 if anything mismatches.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def compare(sdf, odf) -> tuple[bool, bool, bool]:
    import numpy as np
    import pandas as pd

    cols = sorted(sdf.columns)
    schema_match = sorted(odf.columns) == cols
    rows_match = len(sdf) == len(odf)
    if not (schema_match and rows_match):
        return rows_match, schema_match, False
    s = sdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    o = odf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = sv.astype(float).to_numpy()
            b = ov.astype(float).to_numpy()
            ok = np.allclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)
        else:
            ok = (sv.astype(str).to_numpy() == ov.astype(str).to_numpy()).all()
        if not ok:
            return rows_match, schema_match, False
    return rows_match, schema_match, True


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--queries", help="comma-separated subset")
    p.add_argument("--cores", type=int, default=16)
    args = p.parse_args()

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from kafka_connect_fs_spark.session import get_spark

    spark = get_spark("kcfs-correctness", cores=args.cores,
                      shuffle_partitions=args.cores)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    subset = set(args.queries.split(",")) if args.queries else None
    failures, no_oracle = [], []
    for name, fn in qs.items():
        if subset and name not in subset:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, args.sf_dir).toPandas()
            if name not in oracles:
                no_oracle.append(name)
                print(json.dumps({"name": name, "spark_rows": len(sdf),
                                  "no_oracle": True}))
                continue
            odf = con.execute(oracles[name]).df()
            rm, sm, vm = compare(sdf, odf)
        except Exception as e:
            failures.append(name)
            print(json.dumps({"name": name, "error": str(e)[:500]}))
            continue
        rec = {
            "name": name, "rows_match": rm, "schema_match": sm,
            "value_match": vm, "spark_rows": len(sdf), "oracle_rows": len(odf),
            "seconds": round(time.monotonic() - t0, 2),
        }
        print(json.dumps(rec), flush=True)
        if not (rm and sm and vm):
            failures.append(name)
    print(json.dumps({
        "summary": True, "sf_dir": args.sf_dir,
        "n_queries": len(qs if not subset else subset),
        "failures": failures, "no_oracle": no_oracle,
    }))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
