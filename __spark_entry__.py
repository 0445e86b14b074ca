"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end CDC pipeline (synthesize
transcript change-event files from sf0.001 events → IngestEngine discovery/
watermarks/vectorized parse → LWW MERGE into the lake table → final state).
``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
training-pipeline ops; ``oracle_sql()`` gives the DuckDB twin for EVERY
query (34/34 as of r02: CDC/LWW, full-engine ingest E2E, lake temporal
pruning + schema evolution, TPC-H-ish relational anchors, windows/set ops,
4 dedup families, brute/LSH/IVF ANN, text analysis incl. BPE-ish token
counts and rolling fingerprints, multimodal decode/resize/frame-sample, a jar-free Avro round-trip).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_connect_fs_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ingest pipeline over /root/testdata/sf0.001."""
    return QUERIES["ingest_e2e_final_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
