"""kafka_connect_fs_spark — a PySpark-native incremental file-ingest / CDC engine.

A brand-new engine with the *capabilities* of mmolimar/kafka-connect-fs
(incremental file discovery, multi-format record extraction, per-file
offset / exactly-once delivery, schema inference & evolution) re-expressed
Spark-first:

- discovery is a DataFrame anti-joined against a per-file watermark table
  (reference: ``policy/AbstractPolicy.java`` + Kafka Connect offset storage);
- record extraction is vectorized — native ``spark.read`` for self-describing
  formats, Arrow-batched ``mapInPandas`` byte-range readers + JVM-side
  ``from_json``/``from_csv`` for tailable line formats (reference: the
  row-at-a-time ``FileReader`` iterator hierarchy);
- delivery is an idempotent key-partitioned MERGE (last-writer-wins on ``ts``)
  into a transactional bucketed parquet lake table (Iceberg-style commit log;
  reference: ``SourceRecord`` emission into Kafka, at-least-once).

Nothing here is a port: the reference is a single-threaded-per-task Java
connector; this engine is a distributed Spark plan.
"""

__version__ = "0.1.0"

TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")
TRANSCRIPT_KEYS = ("conv_id", "turn_idx")
TRANSCRIPT_TS = "ts"


def __getattr__(name):
    # convenience top-level API without import-time pyspark dependency cost
    if name in ("IngestEngine", "IngestConfig"):
        from kafka_connect_fs_spark.streaming.engine import IngestConfig, IngestEngine

        return {"IngestEngine": IngestEngine, "IngestConfig": IngestConfig}[name]
    if name == "LakeTable":
        from kafka_connect_fs_spark.plans.lake import LakeTable

        return LakeTable
    if name == "get_spark":
        from kafka_connect_fs_spark.session import get_spark

        return get_spark
    raise AttributeError(name)
