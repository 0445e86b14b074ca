"""Last-writer-wins deduplication — the MERGE conflict resolver.

The reference's nearest analog is keep-latest file dedup in
``policy/HdfsFileWatcherPolicy.java:88-97``; record-level LWW is new here
(mandated by BASELINE.json: key ``(conv_id, turn_idx)``, LWW on ``ts``).

Skew note (10^10-event scale): implemented as ``groupBy(keys).agg(max_by(...))``
— a declarative aggregate, so Spark performs *partial aggregation map-side*
(each task reduces its own shard of a hot key before the shuffle). A hot
``conv_id`` therefore ships at most one row per upstream partition per
(conv_id, turn_idx), not its full event volume — the effect salting would
buy, built into the physical plan (SortAggregate ``partial_max_by`` →
Exchange → final ``max_by``). Verified in tests by asserting
``partial_max_by`` sits below the Exchange in the physical plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic total order for ties: same ts → highest (src_file, src_offset)
# wins, so replays of the same files resolve identically (idempotent MERGE).
DEFAULT_TIEBREAK = ("_src_file", "_src_offset")


def lww_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    tiebreak: Sequence[str] = DEFAULT_TIEBREAK,
) -> DataFrame:
    """Keep exactly one row per key: the one with the greatest
    ``(ts, *tiebreak)`` tuple (struct comparison is lexicographic).

    Skew-resistant by construction: partial aggregation map-side means hot
    keys never concentrate their raw rows on one reducer.

    Tiebreak columns: the DEFAULT lineage pair silently adapts to frames
    that lack it (e.g. bare analytical tables with no _src_* columns —
    ties then resolve arbitrarily, acceptable when ts is unique per key).
    An EXPLICITLY-passed tiebreak with missing columns is a
    misconfiguration (typo, renamed column) and raises — silently
    degrading a caller's declared determinism contract is worse.
    """
    present_tb = [c for c in tiebreak if c in df.columns]
    if tuple(tiebreak) != tuple(DEFAULT_TIEBREAK) and len(present_tb) != len(
        tuple(tiebreak)
    ):
        missing = [c for c in tiebreak if c not in df.columns]
        raise ValueError(f"lww_dedup: tiebreak columns not in frame: {missing}")
    order = F.struct(F.col(ts_col), *[F.col(c) for c in present_tb])
    payload = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.max_by(payload, order).alias("_w"))
        .select("_w.*")
    )
