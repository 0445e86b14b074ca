"""Deterministic sampling and sequence packing for training-data curation.

Beyond-reference pipeline surface (the reference moves files; a 100 TB
curation pipeline also has to SELECT and BATCH what it moves):

- hash sampling: keep a row iff an md5-derived bucket of its key falls
  under a threshold — the reproducible, coordination-free way to sample
  at cluster scale (no RNG state, no driver involvement, stable under
  retries/re-runs, composable across tables: the same key always lands in
  the same sample). ``rand()``-based sampling has none of these.
- stratified variant: a different keep-fraction per stratum (e.g. keep 5%
  of web crawl, 100% of curated books) — the "data mixture" primitive.
- sequence packing: assign documents to fixed-token-budget bins for
  training-batch assembly. Documents are sharded by key hash (packing is
  embarrassingly parallel per shard — the window never sees more than one
  shard, so no global sort bottleneck), then greedily packed in key order
  by a running-token-sum window; bin id = (shard, floor(cumsum/budget)).

All md5-derived so the DuckDB oracle reproduces every decision
bit-for-bit (same trick as dedup.simhash64: 15 hex chars → sign-safe
60-bit int).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_bucket(key: Column, salt: str, mod: int) -> Column:
    """Deterministic bucket in [0, mod): 60-bit int from md5(key||'#'||salt).
    DuckDB twin: CAST(('0x' || substr(md5(key || '#' || salt), 1, 15)) AS
    BIGINT) % mod."""
    h = F.conv(F.substring(F.md5(F.concat_ws("#", key, F.lit(salt))), 1, 15), 16, 10)
    return h.cast("long") % mod


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction_bp: int,
    salt: str = "s0",
) -> DataFrame:
    """Keep rows whose key hashes under ``fraction_bp`` basis points
    (fraction_bp=500 ≈ 5%). Pure narrow filter — pushes to the scan,
    no shuffle, no RNG; the sample is a deterministic function of
    (key, salt) so re-runs and different tables agree on membership."""
    return df.where(_hash_bucket(F.col(key_col), salt, 10_000) < fraction_bp)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions_bp: dict[str, int],
    default_bp: int = 0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum keep-fractions (basis points). The fractions table is
    tiny config — folded into the plan as a CASE expression, so this stays
    a narrow scan-side filter (no join, no shuffle)."""
    thr: Column = F.lit(default_bp)
    for value, bp in sorted(fractions_bp.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(bp)).otherwise(thr)
    return df.where(_hash_bucket(F.col(key_col), salt, 10_000) < thr)


def pack_sequences(
    df: DataFrame,
    key_col: str,
    n_tokens_col: str,
    bin_tokens: int,
    n_shards: int = 64,
    salt: str = "p0",
) -> DataFrame:
    """Concat-and-chunk sequence packing: conceptually concatenate each
    shard's documents in key order and cut every ``bin_tokens`` tokens —
    the standard packing used to build fixed-length LLM training batches.
    Output adds ``shard``, ``bin_no`` (the chunk this document's last
    token lands in) and ``bin_fill`` (1..bin_tokens position of that last
    token inside its chunk). A document longer than the budget simply
    spans chunks; bin boundaries are exact token offsets by construction.

    Scale: the sort window is PARTITIONED BY shard — each of n_shards
    windows sorts |docs|/n_shards rows, so there is exactly one shuffle
    (hash on shard) and no global ordering. Raise n_shards with the
    corpus; chunks are independent across shards by construction.
    """
    shard = _hash_bucket(F.col(key_col), salt, n_shards)
    w = Window.partitionBy("shard").orderBy(key_col)
    out = (
        df.withColumn("shard", shard)
        .withColumn("_cum", F.sum(F.col(n_tokens_col).cast("long")).over(w))
        .withColumn("bin_no", F.floor((F.col("_cum") - 1) / bin_tokens))
        .withColumn(
            "bin_fill",
            F.col("_cum") - F.col("bin_no") * bin_tokens,
        )
    )
    return out.drop("_cum")
