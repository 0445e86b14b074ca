"""Structured Streaming ingest path, salting operators, and engine-level
schema evolution (M4)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_fs_spark.operators.salting import (
    explode_dim_with_salt,
    salted_agg,
    with_salt,
)
from kafka_connect_fs_spark.operators.schema_evolution import diff_schemas
from kafka_connect_fs_spark.plans.lake import LakeTable
from kafka_connect_fs_spark.streaming.engine import IngestConfig, IngestEngine
from kafka_connect_fs_spark.streaming.structured import start_rotating_ingest
from kafka_connect_fs_spark.testing.generator import (
    CHANGE_EVENT_SCHEMA,
    expected_final_state,
    transcript_change_events,
    write_jsonl,
)
from pyspark.sql import types as T


def test_structured_streaming_rotating_ingest(spark, tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    rows = transcript_change_events(10, 3, n_versions=2)
    half = len(rows) // 2
    write_jsonl(rows[:half], str(src / "f1.jsonl"))
    write_jsonl(rows[half:], str(src / "f2.jsonl"))
    table = LakeTable.create(
        spark, str(tmp_path / "t"), keys=["conv_id", "turn_idx"], ts_col="ts", n_buckets=4
    )
    q = start_rotating_ingest(
        spark,
        str(src),
        table,
        CHANGE_EVENT_SCHEMA,
        str(tmp_path / "ckpt"),
        fmt="json",
        max_files_per_trigger=1,
        available_now=True,
    )
    assert q.awaitTermination(600), "streaming query still running after 600s"
    exp = {k: v["text"] for k, v in expected_final_state(rows).items()}
    got = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
    assert got == exp
    # restart over the same checkpoint: no new data → no new lake commits
    v_before = table.latest_version()
    q2 = start_rotating_ingest(
        spark, str(src), table, CHANGE_EVENT_SCHEMA, str(tmp_path / "ckpt"),
        fmt="json", available_now=True,
    )
    assert q2.awaitTermination(600), "streaming query still running after 600s"
    assert table.latest_version() == v_before


def test_salted_agg_matches_plain_agg(spark):
    df = spark.createDataFrame(
        [("hot", i % 7) for i in range(1000)] + [("cold", 1)], "k string, v int"
    )
    plain = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    out = salted_agg(
        df,
        ["k"],
        partial=lambda d: d.groupBy("k", "_salt").agg(F.sum("v").alias("ps")),
        final=lambda d: d.groupBy("k").agg(F.sum("ps").alias("s")),
        n_salts=8,
    )
    assert {r.k: r.s for r in out.collect()} == plain


def test_salted_join_matches_plain_join(spark):
    fact = spark.createDataFrame([("k1", i) for i in range(500)] + [("k2", 1)], "k string, v int")
    dim = spark.createDataFrame([("k1", "a"), ("k2", "b")], "k string, attr string")
    n_salts = 4
    f_s = with_salt(fact, n_salts)
    d_s = explode_dim_with_salt(dim, n_salts)
    out = f_s.join(d_s, ["k", "_salt"]).groupBy("k", "attr").count()
    plain = fact.join(dim, "k").groupBy("k", "attr").count()
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in plain.collect()}


def test_diff_schemas():
    old = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])
    new = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("c", T.StringType()),
            T.StructField("d", T.DoubleType()),
        ]
    )
    d = diff_schemas(old, new, rename_hints={"b": "c"})
    assert d.renamed == {"b": "c"}
    assert d.added == ["d"]
    assert d.type_changed == [("a", "int", "bigint")]
    assert d.removed == []


def test_engine_schema_evolution_add_and_rename(spark, tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    rows = transcript_change_events(4, 2)
    write_jsonl(rows, str(src / "a.jsonl"))

    schema_v2 = T.StructType(
        CHANGE_EVENT_SCHEMA.fields[:]
    ).add("quality", T.DoubleType())

    cfg = IngestConfig(
        uris=[str(src)],
        table_root=str(tmp_path / "t"),
        checkpoint_root=str(tmp_path / "ckpt"),
        fmt="jsonl",
        schema=CHANGE_EVENT_SCHEMA,
        n_buckets=4,
        rename_hints={"tool": "tool_name"},
    )
    engine = IngestEngine(spark, cfg)
    engine.run_once()

    # batch 2 arrives with an added column AND the renamed column
    ev2 = []
    base = max(r["ts"] for r in rows)
    import datetime as dt

    for i, r in enumerate(rows[:3]):
        ev2.append(
            {
                "op": "upsert",
                "conv_id": r["conv_id"],
                "turn_idx": r["turn_idx"],
                "role": r["role"],
                "text": r["text"] + ":evolved",
                "tool_name": "new_tool",
                "ts": (base + dt.timedelta(seconds=i + 1)).strftime("%Y-%m-%dT%H:%M:%S.%f"),
                "quality": 0.5 + i,
            }
        )
    with open(src / "b.jsonl", "w") as f:
        for e in ev2:
            f.write(json.dumps(e) + "\n")

    schema_v2 = T.StructType(
        [f for f in CHANGE_EVENT_SCHEMA.fields if f.name != "tool"]
    ).add("tool_name", T.StringType()).add("quality", T.DoubleType())
    engine.config.schema = schema_v2
    engine.run_once()

    df = engine.lake.read()
    assert "quality" in df.columns and "tool_name" in df.columns and "tool" not in df.columns
    evolved = {r.text for r in df.where(F.col("quality").isNotNull()).collect()}
    assert len(evolved) == 3 and all(t.endswith(":evolved") for t in evolved)
    # untouched rows survive with null quality
    assert df.where(F.col("quality").isNull()).count() == 8 - 3


def test_rename_hint_skipped_when_table_already_has_new_column():
    """A stale rename hint must not fire once the table holds BOTH names —
    renaming would create a duplicate-named field."""
    old = T.StructType([
        T.StructField("b", T.StringType()), T.StructField("c", T.StringType()),
    ])
    new = T.StructType([T.StructField("c", T.StringType())])
    d = diff_schemas(old, new, rename_hints={"b": "c"})
    assert d.renamed == {}
    assert d.removed == ["b"]


def test_salted_agg_with_map_payload_column(spark):
    """The advertised non-algebraic use case: a MAP payload column must
    not crash the salt hash (xxhash64 rejects MAP inputs)."""
    df = spark.createDataFrame(
        [("hot", {"a": i}) for i in range(100)], "k string, payload map<string,int>"
    )
    out = salted_agg(
        df,
        ["k"],
        partial=lambda d: d.groupBy("k", "_salt").agg(
            F.count("*").alias("pc")
        ),
        final=lambda d: d.groupBy("k").agg(F.sum("pc").alias("n")),
        n_salts=4,
    )
    assert {r.k: r.n for r in out.collect()} == {"hot": 100}


def test_lww_explicit_missing_tiebreak_raises(spark):
    from kafka_connect_fs_spark.operators.lww import lww_dedup

    df = spark.createDataFrame([("k", 1, "x")], "k string, ts long, v string")
    with pytest.raises(ValueError, match="tiebreak columns not in frame"):
        lww_dedup(df, ["k"], "ts", tiebreak=("no_such_col",))
    # default tiebreak still adapts silently for lineage-less frames
    assert lww_dedup(df, ["k"], "ts").count() == 1
