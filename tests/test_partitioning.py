"""Exact bucket→task placement (operators/partitioning.py).

Hashing k distinct bucket ids into a k-way exchange leaves ~0.63k
non-empty tasks (birthday collisions); the rekey makes the exchange a
permutation. These tests pin (a) the pure-Python Murmur3 against Spark's
``F.hash`` so an upstream seed/algorithm change fails loudly instead of
silently degrading placement, and (b) the end-to-end placement property
on a real shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_fs_spark.operators.partitioning import (
    dense_slot,
    exact_slot_rekey,
    murmur3_int32,
    rekey_table,
)


def _pmod(a: int, n: int) -> int:
    return ((a % n) + n) % n


def test_murmur3_matches_spark_hash(spark):
    vals = list(range(-17, 200)) + [2**31 - 1, -(2**31), 987654321]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    got = {r.x: r.h for r in df.select("x", F.hash("x").alias("h")).collect()}
    assert all(murmur3_int32(v) == got[v] for v in vals)


def test_rekey_table_is_exact_inverse():
    for n in (1, 2, 7, 16, 32, 200):
        t = rekey_table(n)
        assert len(t) == n
        assert all(_pmod(murmur3_int32(t[s]), n) == s for s in range(n))


def test_repartition_places_one_bucket_per_task(spark):
    n = 32
    df = spark.range(0, 6400).withColumn("b", (F.col("id") % n).cast("int"))
    parts = (
        df.repartition(n, exact_slot_rekey(F.col("b"), n))
        .select("b")
        .rdd.mapPartitionsWithIndex(
            lambda i, it: [(i, sorted({r.b for r in it}))]
        )
        .collect()
    )
    nonempty = [(i, bs) for i, bs in parts if bs]
    assert len(nonempty) == n  # zero empties, full parallelism
    assert all(bs == [i] for i, bs in nonempty)  # slot s in partition s


def test_dense_slot_over_sparse_subset(spark):
    # compaction/CoW touch a sparse subset of bucket ids; dense_slot maps
    # them onto [0, k) so the exchange still has zero empties
    touched = [3, 11, 17, 29, 30]
    df = spark.createDataFrame([(b, j) for b in touched for j in range(50)], "b int, j int")
    k = len(touched)
    parts = (
        df.repartition(k, exact_slot_rekey(dense_slot(F.col("b"), touched), k))
        .select("b")
        .rdd.mapPartitionsWithIndex(
            lambda i, it: [(i, sorted({r.b for r in it}))]
        )
        .collect()
    )
    nonempty = [(i, bs) for i, bs in parts if bs]
    assert len(nonempty) == k
    assert all(len(bs) == 1 for _, bs in nonempty)
    assert sorted(b for _, bs in nonempty for b in bs) == sorted(touched)
