"""As-of (point-in-time) join — an operator Spark lacks natively.

For every left row, attach the most recent right row with the same key
whose timestamp is <= the left row's timestamp (``direction="backward"``;
``"forward"`` takes the nearest ts >= instead). The classic CDC/feature-
store primitive: "state as of this event" without a range self-join.

Spark-first plan — union + ordered window, NOT a join:

  tag both sides -> unionByName -> window last(right_col, ignorenulls)
  over (PARTITION BY key ORDER BY ts, side ROWS UNBOUNDED PRECEDING)
  -> keep left rows

One hash shuffle on the key and one per-partition sort; no build-side
explosion, no range-condition BroadcastNestedLoopJoin, no per-left-row
probe. At equal timestamps the right row sorts BEFORE the left row, so a
same-instant state update is visible to the event (matching DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts`` inclusive semantics, used as this
operator's oracle).

Scale: cost is a shuffle of |left|+|right| rows on the key — the same
shape as any keyed aggregation, so AQE skew handling applies. Right rows
must be unique per (key, ts) for a deterministic answer (dedup first —
e.g. keep the max sequence id); the operator does not guess a tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join. Right's non-key, non-ts columns come back as
    ``{prefix}{col}`` (null when no right row qualifies)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_ts = right_ts or left_ts
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    clash = [f"{prefix}{c}" for c in rcols if f"{prefix}{c}" in left.columns]
    if clash:
        raise ValueError(f"asof_join output columns collide with left: {clash}")
    reserved = {"_asof_ts", "_asof_side", "_asof_payload"}
    taken = reserved & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(f"asof_join reserved column names in input: {sorted(taken)}")
    # DuckDB-oracle null semantics: a null right ts satisfies no
    # inequality — such rows must never match (they would otherwise sort
    # first and masquerade as 'earliest state')
    right = right.where(F.col(right_ts).isNotNull())

    # the right row travels as ONE struct: per-column last(ignorenulls)
    # would otherwise stitch fields from DIFFERENT right rows whenever a
    # newer row holds null in some column (a chimera row, silently wrong)
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.struct(*[F.col(c) for c in rcols]).alias("_asof_payload"),
    )
    l = left.withColumn("_asof_ts", F.col(left_ts)).withColumn(
        "_asof_side", F.lit(1)
    )
    u = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # right rows first at ts ties: a same-instant update is visible
        order = [F.col("_asof_ts").asc(), F.col("_asof_side").asc()]
    else:
        order = [F.col("_asof_ts").desc(), F.col("_asof_side").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(
        "_asof_payload",
        # a null LEFT ts also satisfies no inequality: no match, whatever
        # the window ordering put in reach (nulls sort last under the
        # forward desc order and would otherwise see every right row)
        F.when(
            F.col("_asof_ts").isNotNull(),
            F.last("_asof_payload", ignorenulls=True).over(w),
        ),
    )
    out = u.where(F.col("_asof_side") == 1)
    # one projection, not a withColumn per right column
    return out.select(
        "*",
        *[F.col(f"_asof_payload.{c}").alias(f"{prefix}{c}") for c in rcols],
    ).drop("_asof_ts", "_asof_side", "_asof_payload")
