"""Unit tests for the training-pipeline function library (dedup /
similarity / text / multimodal plumbing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_fs_spark.functions import dedup as D
from kafka_connect_fs_spark.functions import multimodal as M
from kafka_connect_fs_spark.functions import similarity as S
from kafka_connect_fs_spark.functions import text as TX


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over a lazy dog"),  # near dup
        (3, "completely different text about spark engines and data"),
        (4, "el la de que y palabras en otro idioma distinto aqui"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark, docs):
    out = {r.keep_doc_id: r.n_docs for r in D.exact_dedup_groups(docs).collect()}
    assert out[0] == 2  # docs 0 and 1 collapse
    assert out[2] == 1 and out[3] == 1


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "only two")], "doc_id long, text string")
    assert D.shingles(df, k=3).count() == 0


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in pairs  # exact dups always collide on every band
    assert all(a < b for a, b in pairs)


def test_ngram_jaccard_scores(spark, docs):
    out = {(r.doc_a, r.doc_b): r.jaccard_bp for r in D.ngram_jaccard_pairs(docs, threshold_bp=0).collect()}
    assert out[(0, 1)] == 10000  # identical
    assert 0 < out[(0, 2)] < 10000  # near dup
    assert (0, 3) not in out  # no shared shingles


def test_simhash_similar_docs_close(spark, docs):
    h = {r.doc_id: r.simhash for r in D.simhash64(docs).collect()}
    assert h[0] == h[1]  # identical text → identical simhash
    ham_near = bin(h[0] ^ h[2]).count("1")
    ham_far = bin(h[0] ^ h[3]).count("1")
    assert ham_near < ham_far


def test_cosine_topk_exact(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = emb.where("vec_id = 0").select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv"))
    out = S.cosine_topk(q, c, k=3).orderBy("rank").collect()
    assert [r.n_id for r in out] == [1, 2, 3]
    assert out[0].cos_sim > 0.99


def test_lsh_topk_recovers_obvious_neighbor(spark):
    import math

    rows = [(i, [math.cos(i * 0.7), math.sin(i * 0.7), 0.1 * (i % 3)]) for i in range(40)]
    rows.append((100, rows[5][1]))  # exact duplicate vector of id 5
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.where("vec_id = 100").select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    c = emb.where("vec_id != 100").select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv"))
    out = S.lsh_topk(q, c, k=3, n_tables=4, n_planes=4).collect()
    assert any(r.n_id == 5 and r.cos_sim == 1.0 for r in out)


def test_language_scores_and_quality(spark, docs):
    langs = {r.doc_id: r.predicted_lang for r in TX.language_scores(docs).collect()}
    assert langs[0] == "en" and langs[4] == "es"
    q = {r.doc_id: r for r in TX.quality_score(docs).collect()}
    assert q[0].n_tokens == 9
    assert q[0].distinct_ratio_bp == (8 * 10000) // 9  # 'the' repeats
    assert q[0].keep == 1


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "different")], "doc_id long, text string"
    )
    fps = {r.doc_id: r.fp for r in df.select("doc_id", TX.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[0] == fps[1] != fps[2]


def test_multimodal_feature_extraction_plumbing(spark, docs):
    media = M.documents_as_media(docs, kind="image")
    feats = M.extract_features(media).collect()
    assert len(feats) == docs.count()
    by_id = {r.media_id: r for r in feats}
    assert by_id[0].content_md5 == by_id[1].content_md5  # same bytes
    assert by_id[0].width and by_id[0].height and len(by_id[0].feature) == 8
    # deterministic across runs
    feats2 = {r.media_id: r.feature for r in M.extract_features(media).collect()}
    assert feats2[3] == by_id[3].feature


def test_real_decoder_stub_raises():
    with pytest.raises(NotImplementedError):
        M.real_decoder_stub("image", b"...")


def test_lsh_topk_recall_vs_exact(spark):
    """ANN quality gate: LSH recall@5 vs brute force on real-ish vectors."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 10").select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv"))
    exact = {(r.q_id, r.n_id) for r in S.cosine_topk(q, c, k=5).collect()}
    approx = {(r.q_id, r.n_id) for r in S.lsh_topk(q, c, k=5, n_tables=8, n_planes=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall  # 8 tables × 4 planes on 64-dim random data


def test_ngram_jaccard_hot_shingle_cap_bounds_candidates(spark):
    """One shingle shared by EVERY doc must not explode the pair join:
    with max_shingle_df set, candidate work stays O(docs), and docs whose
    only overlap is the hot shingle produce no pairs at all. A true
    near-dup pair (overlapping rare shingles) still comes through."""
    n = 60
    rows = [(i, f"the quick brown u{i}a u{i}b u{i}c u{i}d") for i in range(n)]
    rows.append((n, f"the quick brown u0a u0b u0c u0d extra"))  # near-dup of doc 0
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = D.ngram_jaccard_pairs(docs, threshold_bp=1000, max_shingle_df=5)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # 'the quick brown' (df=61 > cap) is excluded everywhere: the only
    # surviving pair shares rare u0* shingles
    assert got == {(0, n)}

    # and the intermediate candidate space is bounded: uncapped, the hot
    # shingle alone creates n*(n+1)/2 candidate pairs
    sh = D.shingles(docs)
    rare = (
        sh.groupBy("shingle").count().where(F.col("count") <= 5).select("shingle")
    )
    sh_f = sh.join(rare, "shingle", "left_semi")
    a = sh_f.selectExpr("doc_id doc_a", "shingle")
    b = sh_f.selectExpr("doc_id doc_b", "shingle")
    n_cand = a.join(b, "shingle").where("doc_a < doc_b").count()
    assert n_cand < 2 * n  # vs ~1830 uncapped from the hot shingle alone


def test_ivf_topk_recall_vs_exact(spark):
    """IVF ANN quality gate: recall@5 vs brute force; probing more lists
    must not lower recall."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 10").select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv"))
    exact = {(r.q_id, r.n_id) for r in S.cosine_topk(q, c, k=5).collect()}
    approx = {(r.q_id, r.n_id) for r in S.ivf_topk(q, c, k=5, n_centroids=8, n_probe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall  # 8 selected centroids, half probed
    all_probe = {(r.q_id, r.n_id) for r in S.ivf_topk(q, c, k=5, n_centroids=8, n_probe=8).collect()}
    assert all_probe == exact  # probing every list degenerates to exact


# --------------------------------------------------- sampling / clustering


def test_connected_components_two_components_and_chain(spark):
    from kafka_connect_fs_spark.functions.dedup import connected_components

    # component {1,2,3,4} as a CHAIN (worst-case diameter, exercises
    # multi-round propagation) and component {10,11} as a pair
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_cycle_converges(spark):
    from kafka_connect_fs_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_hash_sample_deterministic_and_partitioning(spark):
    from kafka_connect_fs_spark.functions.sampling import hash_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df, "k", 3000).collect()}
    b = {r.k for r in hash_sample(df, "k", 3000).collect()}
    assert a == b  # pure function of (key, salt): reruns agree
    # threshold is a superset relation: the 30% sample contains the 10% one
    c = {r.k for r in hash_sample(df, "k", 1000).collect()}
    assert c <= a
    # roughly proportional (md5 is uniform; wide tolerance, no flakiness)
    assert 0.2 < len(a) / 2000 < 0.4
    # different salt = a different (near-independent) sample
    d = {r.k for r in hash_sample(df, "k", 3000, salt="other").collect()}
    assert d != a


def test_stratified_hash_sample_thresholds(spark):
    from kafka_connect_fs_spark.functions.sampling import (
        hash_sample,
        stratified_hash_sample,
    )

    df = spark.createDataFrame(
        [(i, "keep_all" if i % 2 else "drop_all") for i in range(1000)],
        "k long, stratum string",
    )
    got = stratified_hash_sample(
        df, "k", "stratum", {"keep_all": 10_000, "drop_all": 0}
    ).collect()
    assert {r.stratum for r in got} == {"keep_all"}
    assert len(got) == 500
    # default_bp applies to unknown strata and equals plain hash_sample
    got2 = stratified_hash_sample(df, "k", "stratum", {}, default_bp=2500)
    plain = hash_sample(df, "k", 2500)
    assert {r.k for r in got2.collect()} == {r.k for r in plain.collect()}


def test_pack_sequences_concat_and_chunk_invariants(spark):
    from kafka_connect_fs_spark.functions.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, 100 + (i * 37) % 300) for i in range(400)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(df, "doc_id", "n_tokens", bin_tokens=1024, n_shards=4)
    rows = out.collect()
    assert len(rows) == 400
    for r in rows:
        assert 0 <= r.shard < 4
        assert 1 <= r.bin_fill <= 1024
    # per shard: cum reconstruction — bin_no*1024 + bin_fill is strictly
    # increasing in doc_id order and equals the running token sum
    import collections

    by_shard = collections.defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r)
    toks = {r.doc_id: r.n_tokens for r in df.collect()}
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            cum += toks[r.doc_id]
            assert r.bin_no * 1024 + r.bin_fill == cum, (shard, r.doc_id)


def test_pack_sequences_long_doc_spans_chunks(spark):
    from kafka_connect_fs_spark.functions.sampling import pack_sequences

    df = spark.createDataFrame([(1, 5000)], "doc_id long, n_tokens long")
    r = pack_sequences(df, "doc_id", "n_tokens", bin_tokens=1024, n_shards=1).collect()[0]
    assert r.bin_no == 4 and r.bin_fill == 5000 - 4 * 1024


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 60-node chain (diameter 59) converges well inside max_iter=25:
    pointer jumping doubles label reach per round (O(log n) rounds)."""
    import warnings as _warnings

    from kafka_connect_fs_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "doc_a long, doc_b long"
    )
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")  # non-convergence would warn -> fail
        got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(60)}


def test_embedding_near_pairs_lsh_recall_and_no_all_pairs(spark):
    """LSH near-dup pairs operate in the HIGH-similarity regime (that is
    what sign-LSH concentrates): plant near-duplicate copies (cos~0.99)
    of corpus vectors and require the bucketer to recover them; the
    exact rescore guarantees no false positives; and the plan must be a
    bucket join, never an all-pairs product."""
    import numpy as np

    from kafka_connect_fs_spark.functions.similarity import (
        embedding_near_pairs_lsh,
    )

    rng = np.random.RandomState(7)
    base = rng.randn(120, 64).astype("float64")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    planted = set()
    for i in range(40):  # ids 1000+i are tiny perturbations of ids i
        dup = base[i] + 0.02 * rng.randn(64)
        rows.append((1000 + i, [float(x) for x in dup]))
        planted.add((i, 1000 + i))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = embedding_near_pairs_lsh(e, threshold=0.9).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    found = planted & pairs
    assert len(found) / len(planted) >= 0.8, (len(found), len(planted))
    # exact rescore -> every returned pair really is above threshold
    assert all(r.cos_sim >= 0.9 for r in got)
    # plan shape: bucket join, not a cartesian product
    plan = embedding_near_pairs_lsh(e, threshold=0.9)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_text_functions_engine_parity_on_vertical_tab(spark):
    """Java's \\s includes \\x0B, RE2's does not — the explicit whitespace
    classes must make fingerprint and BPE counts engine-identical on
    documents containing a vertical tab."""
    import duckdb

    doc = "hello\x0bworld  two"
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    fp = df.select(TX.fingerprint(F.col("text")).alias("f")).first().f
    nb = df.select(TX.token_count_bpe(F.col("text")).alias("n")).first().n
    con = duckdb.connect()
    o_fp = con.execute(
        "SELECT md5(regexp_replace(lower(?), '[ \t\n\r\f\x0B]+', ' ', 'g'))", [doc]
    ).fetchone()[0]
    o_nb = con.execute(
        "SELECT len(regexp_extract_all(?, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f\x0B]'))",
        [doc],
    ).fetchone()[0]
    assert fp == o_fp
    assert nb == o_nb == 3  # hello, world, two — \x0B is whitespace in both


def test_lsh_and_ivf_tolerate_null_vectors_and_string_ids(spark):
    from kafka_connect_fs_spark.functions.similarity import ivf_topk, lsh_topk

    corpus = spark.createDataFrame(
        [(f"doc-{i:03d}", [float((i * 7 + j) % 5) for j in range(8)]) for i in range(30)]
        + [("doc-null", None)],
        "n_id string, nv array<double>",
    )
    queries = spark.createDataFrame(
        [("q-1", [1.0] * 8), ("q-null", None)], "q_id string, qv array<double>"
    )
    for fn in (lsh_topk, ivf_topk):
        got = fn(queries, corpus, k=3)
        rows = got.collect()  # must not crash on nulls or string ids
        assert all(r.q_id == "q-1" for r in rows)  # null query yields nothing
        assert all(isinstance(r.n_id, str) for r in rows)
    # empty corpus: both return empty with the corpus id type
    empty = corpus.limit(0)
    assert lsh_topk(queries, empty, k=3).count() == 0
    assert ivf_topk(queries, empty, k=3).count() == 0


def test_widen_degenerate_inmemory_input_repartitions(spark):
    """ADVICE r4: a non-file-backed input (in-memory/derived plan) with
    1-2 partitions must still widen before the shingle explode — the
    inputFiles() metadata path sees no files, so the plan partition
    count is the fallback signal."""
    from kafka_connect_fs_spark.functions.dedup import _widen_degenerate_scan

    few = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id int, text string"
    ).coalesce(1)
    widened = _widen_degenerate_scan(few)
    assert widened.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # already-parallel in-memory input passes through untouched
    wide = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id int, text string"
    ).repartition(spark.sparkContext.defaultParallelism)
    assert _widen_degenerate_scan(wide) is wide


def test_with_cosine_matches_jvm_fold_exactly(spark):
    """The Arrow-vectorized (dot, norms) cosine must reproduce the
    interpreted zip_with/aggregate fold EXACTLY — np.cumsum is the same
    strictly-sequential left-to-right accumulation, so the values (not
    just the rounded ones) may not drift. Checked over real embedding
    pairs and over the null/length edge cases."""
    from kafka_connect_fs_spark.functions import similarity as S

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = e.selectExpr("vec_id AS id_a", "embedding AS va").where("id_a < 60")
    b = e.selectExpr("vec_id AS id_b", "embedding AS vb").where("id_b < 60")
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    jvm = pairs.select(
        "id_a", "id_b",
        S.cosine(F.col("va"), F.col("vb")).alias("c"),
        F.round(S.cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim"),
    )
    new_df = S.with_cosine(pairs, "va", "vb")
    dn = S._dot_norms_udf()
    new = new_df.withColumn("_dn", dn(F.col("va"), F.col("vb"))).select(
        "id_a", "id_b",
        (F.col("_dn.dot") / (F.col("_dn.na") * F.col("_dn.nb"))).alias("c"),
        "cos_sim",
    )
    assert jvm.count() > 1000
    assert jvm.exceptAll(new).count() == 0
    assert new.exceptAll(jvm).count() == 0

    # edge cases: null vector, empty arrays, mismatched lengths
    edge = spark.createDataFrame(
        [
            ([1.0, 2.0], [3.0, 4.0]),
            (None, [1.0, 2.0]),
            ([1.0, 2.0], None),
            ([], []),
            ([1.0, 2.0, 3.0], [1.0, 2.0]),  # length mismatch -> NULL dot
        ],
        "va array<float>, vb array<float>",
    )
    jvm_e = [
        r.c
        for r in edge.select(
            F.round(S.cosine(F.col("va"), F.col("vb")), 4).alias("c")
        ).collect()
    ]
    new_e = [r.cos_sim for r in S.with_cosine(edge, "va", "vb").collect()]
    assert jvm_e == new_e, (jvm_e, new_e)
