"""Hot-key salting for skewed shuffles (BASELINE.json north_rule: salt hot
conv_id partitions at 10^10-event scale).

Where skew actually bites in this engine:
- LWW dedup: already immune — declarative max_by partial-aggregates
  map-side (operators/lww.py), i.e. an implicit combine per upstream
  partition.
- MERGE bucket rewrite: AQE skew-join/partition splitting handles residual
  imbalance.
- Arbitrary user joins/aggs against a hot key: these helpers implement the
  explicit two-phase pattern.

``salted_agg`` = groupBy(keys + salt) partial → groupBy(keys) final, for
aggregations that are NOT algebraic (e.g. collect_list) and therefore get
no map-side combine. ``with_salt``/``explode_dim_with_salt`` implement the
salted broadcast-free join for a skewed fact ⋈ dim.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    n_salts: int,
    col_name: str = "_salt",
    hash_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Deterministic row-level salt (hash of whole row via monotonic id is
    non-deterministic under retries; hash stable payload cols instead).

    Map-typed columns are excluded automatically — ``xxhash64`` rejects
    MAP inputs at analysis time, and the non-algebraic payloads this
    module exists for (maps, sketches) are exactly where that bites. Pass
    ``hash_cols`` to pin the salt basis explicitly."""
    if hash_cols is None:
        hash_cols = [
            f.name for f in df.schema.fields if f.dataType.typeName() != "map"
        ]
        if not hash_cols:
            raise ValueError(
                "with_salt: every column is MAP-typed; pass hash_cols or add "
                "a hashable column to salt on"
            )
    cols = [F.col(c) for c in hash_cols]
    return df.withColumn(col_name, F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int"))


def explode_dim_with_salt(dim: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Replicate the dim side once per salt so a salted fact join still
    matches: fact(key, salt) ⋈ dim(key, salt ∈ 0..n-1)."""
    return dim.withColumn(
        col_name, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial: Callable[[DataFrame], DataFrame],
    final: Callable[[DataFrame], DataFrame],
    n_salts: int = 16,
    salt_col: str = "_salt",
) -> DataFrame:
    """Two-phase aggregation: partial over (keys, salt), final over keys.

    ``partial`` and ``final`` each receive a grouped-ready DataFrame and
    must themselves perform groupBy(keys [+ salt_col]) — kept as callables
    so non-algebraic payloads (maps, lists, sketches) stay expressible.
    ``keys`` pins the salt basis: the salt is hashed from the NON-key
    hashable columns, so a hot key's rows spread across salts (hashing
    the key alone would put the whole hot key in one salt — no spreading).
    """
    non_key = [
        f.name
        for f in df.schema.fields
        if f.name not in keys and f.dataType.typeName() != "map"
    ]
    salted = with_salt(df, n_salts, salt_col, hash_cols=non_key or None)
    return final(partial(salted))
