"""LakeTable: transactional MERGE, LWW, deletes, idempotent replay, evolution.

Mirrors the exactly-once-resume contract of the reference task suite
(FsSourceTaskTest.java:260-271 — files whose committed offset equals size are
never re-emitted) at the *table* level: re-merging an already-committed
batch_id is a no-op.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_fs_spark.operators.lww import lww_dedup
from kafka_connect_fs_spark.plans.lake import LakeTable

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("op", T.StringType()),
        T.StructField("_src_file", T.StringType()),
        T.StructField("_src_offset", T.LongType()),
    ]
)


def ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def ev(conv, turn, text, t, op="upsert", src="f0", off=0):
    return Row(
        conv_id=conv, turn_idx=turn, role="user", text=text, tool=None,
        ts=ts(t), op=op, _src_file=src, _src_offset=off,
    )


def edf(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), keys=["conv_id", "turn_idx"], ts_col="ts",
        n_buckets=4,
    )


def test_lww_dedup_keeps_max_ts_with_deterministic_tiebreak(spark):
    df = edf(
        spark,
        [
            ev("c1", 0, "old", 1),
            ev("c1", 0, "new", 5),
            ev("c1", 0, "tie-a", 7, src="a", off=1),
            ev("c1", 0, "tie-b", 7, src="b", off=2),
            ev("c2", 3, "only", 2),
        ]
    )
    out = {
        (r.conv_id, r.turn_idx): r.text
        for r in lww_dedup(df, ["conv_id", "turn_idx"]).collect()
    }
    assert out == {("c1", 0): "tie-b", ("c2", 3): "only"}


def test_lww_plan_has_partial_aggregation(spark):
    """Skew guard: the physical plan must partial-aggregate map-side."""
    df = edf(spark, [ev("c1", 0, "x", 1)])
    plan = lww_dedup(df, ["conv_id", "turn_idx"])._jdf.queryExecution().executedPlan().toString()
    # partial_max_by before the Exchange = map-side combine (skew-resistant)
    assert "partial_max_by" in plan and "Exchange" in plan
    assert plan.index("partial_max_by") > plan.index("Exchange")  # plan prints top-down


def test_merge_upsert_and_read(spark, table):
    table.merge(edf(spark, [ev("c1", 0, "hello", 1), ev("c1", 1, "world", 2)]), "b1")
    table.merge(edf(spark, [ev("c1", 1, "world-v2", 9), ev("c2", 0, "new", 3)]), "b2")
    rows = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
    assert rows == {("c1", 0): "hello", ("c1", 1): "world-v2", ("c2", 0): "new"}


def test_merge_stale_update_loses(spark, table):
    table.merge(edf(spark, [ev("c1", 0, "current", 10)]), "b1")
    table.merge(edf(spark, [ev("c1", 0, "stale", 5)]), "b2")
    assert table.read().collect()[0].text == "current"


def test_merge_replay_same_batch_id_is_noop(spark, table):
    c1 = table.merge(edf(spark, [ev("c1", 0, "v1", 1)]), "batch-1")
    c2 = table.merge(edf(spark, [ev("c1", 0, "SHOULD-NOT-APPLY", 99)]), "batch-1")
    assert c1.version == c2.version
    assert table.read().collect()[0].text == "v1"


def test_merge_delete(spark, table):
    table.merge(edf(spark, [ev("c1", 0, "a", 1), ev("c1", 1, "b", 1)]), "b1")
    table.merge(edf(spark, [ev("c1", 0, "", 5, op="delete")]), "b2")
    rows = table.read().collect()
    assert [(r.conv_id, r.turn_idx) for r in rows] == [("c1", 1)]


def test_merge_only_rewrites_affected_buckets(spark, table):
    table.merge(
        edf(spark, [ev(f"c{i}", 0, f"t{i}", 1) for i in range(50)]), "b1"
    )
    c = table.merge(edf(spark, [ev("c1", 0, "upd", 9)]), "b2")
    assert c.metrics["affected_buckets"] == 1
    assert c.metrics["files_removed"] <= 1
    live_rows = {r.conv_id: r.text for r in table.read().collect()}
    assert live_rows["c1"] == "upd" and live_rows["c7"] == "t7" and len(live_rows) == 50


def test_schema_evolution_add_column(spark, table):
    table.merge(edf(spark, [ev("c1", 0, "a", 1)]), "b1")
    with_extra = edf(spark, [ev("c2", 0, "b", 2)]).withColumn(
        "quality", F.lit(0.9)
    )
    table.merge(with_extra, "b2")
    df = table.read()
    assert "quality" in df.columns
    got = {r.conv_id: r.quality for r in df.collect()}
    assert got["c1"] is None and got["c2"] == pytest.approx(0.9)


def test_schema_evolution_rename_column(spark, table):
    table.merge(edf(spark, [ev("c1", 0, "a", 1)]), "b1")
    table.rename_column("tool", "tool_name")
    df = table.read()
    assert "tool_name" in df.columns and "tool" not in df.columns
    # merge after rename still works (new batches use the new name)
    src = edf(spark, [ev("c2", 0, "b", 2)]).withColumnRenamed("tool", "tool_name")
    table.merge(src, "b2")
    assert table.read().count() == 2


def test_vacuum_removes_dead_files(spark, table):
    table.merge(edf(spark, [ev("c1", 0, "a", 1)]), "b1")
    table.merge(edf(spark, [ev("c1", 0, "b", 2)]), "b2")
    assert table.vacuum() >= 1
    assert table.read().collect()[0].text == "b"


def test_delete_tombstone_blocks_older_upsert_resurrection(spark, table):
    """An upsert REPLAYED AFTER a delete but carrying an OLDER ts must not
    resurrect the key — deletes persist as tombstones that keep winning LWW."""
    table.merge(edf(spark, [ev("c1", 0, "killed", 10, op="delete")]), "b1")
    table.merge(edf(spark, [ev("c1", 0, "zombie", 5)]), "b2")  # older ts
    assert table.read().where("conv_id = 'c1'").count() == 0
    # but a genuinely NEWER upsert does revive the key
    table.merge(edf(spark, [ev("c1", 0, "reborn", 20)]), "b3")
    assert table.read().collect()[0].text == "reborn"


def test_compact_rewrites_buckets(spark, table):
    # copy-on-write keeps one file per bucket per commit; different convs
    # land in different buckets across commits
    for i in range(6):
        table.merge(edf(spark, [ev(f"c{i}", 0, f"t{i}", i + 1)]), f"b{i}")
    before = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
    c = table.compact(min_files_per_bucket=1)
    assert c is not None and c.metrics["compaction"]
    after = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
    assert after == before  # logical content unchanged
    live, _, _ = table._state()
    buckets = {}
    for a in live.values():
        buckets[a["bucket"]] = buckets.get(a["bucket"], 0) + 1
    assert all(n == 1 for n in buckets.values())
    # idempotent-ish: nothing left above the threshold afterwards
    assert table.compact(min_files_per_bucket=2) is None


def test_expire_tombstones(spark, table):
    table.merge(edf(spark, [ev("c1", 0, "x", 1, op="delete"), ev("c2", 0, "keep", 2)]), "b1")
    assert table.snapshot().filter("op = 'delete'").count() == 1
    c = table.expire_tombstones(ts(100))
    assert c is not None
    assert table.snapshot().filter("op = 'delete'").count() == 0
    assert {r.conv_id for r in table.read().collect()} == {"c2"}


def test_concurrent_commit_conflict_detected(spark, table):
    """Two writers racing to the same log version: exactly one wins the
    O_EXCL create; the loser gets ConcurrentCommitError (single-writer
    engine; the primitive is what Delta/Iceberg use on object stores)."""
    from kafka_connect_fs_spark.plans.lake import Commit, ConcurrentCommitError

    table.merge(edf(spark, [ev("c1", 0, "a", 1)]), "b1")
    v = table.latest_version() + 1
    c = Commit(version=v, batch_id="race-1", added=[], removed=[], schema_json=None)
    table._write_commit(c)
    dup = Commit(version=v, batch_id="race-2", added=[], removed=[], schema_json=None)
    with pytest.raises(ConcurrentCommitError):
        table._write_commit(dup)


def test_time_travel_reads_past_versions(spark, table):
    c1 = table.merge(edf(spark, [ev("c1", 0, "v1", 1)]), "b1")
    c2 = table.merge(edf(spark, [ev("c1", 0, "v2", 2), ev("c2", 0, "x", 2)]), "b2")
    assert table.read(at_version=c1.version).collect()[0].text == "v1"
    now = {(r.conv_id, r.turn_idx): r.text for r in table.read(at_version=c2.version).collect()}
    assert now == {("c1", 0): "v2", ("c2", 0): "x"}
    assert table.read().count() == 2  # latest unchanged


def test_read_key_bucket_pruned_point_lookup(spark, table):
    table.merge(edf(spark, [ev(f"c{i}", t, f"{i}:{t}", 1) for i in range(20) for t in range(2)]), "b1")
    out = table.read_key("c7").orderBy("turn_idx").collect()
    assert [(r.conv_id, r.turn_idx, r.text) for r in out] == [
        ("c7", 0, "7:0"), ("c7", 1, "7:1"),
    ]
    assert table.read_key("no_such_conv").count() == 0


def test_xxhash64_parity(spark):
    """Driver-side xxhash64 twin must equal Spark's F.xxhash64 (seed 42)
    for strings and longs — read_key's bucket pruning depends on it."""
    from kafka_connect_fs_spark.functions.hashing import spark_xxhash64

    strs = ["", "a", "conv-000123", "x" * 31, "y" * 32, "z" * 100, "héllo ✓"]
    ints = [0, 1, -1, 42, 2**62, -(2**62)]
    got_s = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s", F.xxhash64("s").alias("h")
    ).collect()
    assert all(spark_xxhash64(r.s) == r.h for r in got_s)
    got_i = spark.createDataFrame([(i,) for i in ints], "i long").select(
        "i", F.xxhash64("i").alias("h")
    ).collect()
    assert all(spark_xxhash64(r.i) == r.h for r in got_i)
