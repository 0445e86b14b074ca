"""Interval (range) join — points joined to intervals without a
nested-loop plan.

Spark evaluates a raw inequality join condition as BroadcastNestedLoop /
cartesian-with-filter: O(|L|·|R|) per key and a driver OOM risk on the
broadcast side. The standard scale pattern is BINNING: chop time into
fixed bins, explode each interval onto the bins it covers, equi-join
points on (key, bin), then refine with the exact predicate and dedup
(an interval spanning k bins meets a matching point once per shared
bin). Cost: one hash shuffle of |L| + |R|·avg_bins rows on (key, bin) —
the equi-join shape Catalyst/AQE already optimizes (skew split,
broadcast small side), with bin granularity as the fanout/selectivity
knob (pick bin ≈ typical interval length → avg_bins ≈ 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_point: str,
    right_start: str,
    right_end: str,
    bin_seconds: int,
) -> DataFrame:
    """Inner-join left rows (point ``left_point``) to right rows whose
    [``right_start``, ``right_end``] interval contains the point
    (inclusive both ends), equal ``on`` keys. Returns left columns plus
    right's non-key columns. Right intervals must have start <= end
    (rows violating it can never match and are dropped by the bin
    arithmetic)."""
    if bin_seconds <= 0:
        raise ValueError("bin_seconds must be positive")
    shared = (set(left.columns) & set(right.columns)) - set(on)
    if shared:
        raise ValueError(
            "interval_join non-key columns exist on both sides "
            f"(rename one): {sorted(shared)}"
        )
    if "_bin" in left.columns or "_bin" in right.columns:
        raise ValueError("interval_join reserved column name '_bin' in input")
    lbin = (F.unix_timestamp(F.col(left_point)) / bin_seconds).cast("long")
    rs = F.unix_timestamp(F.col(right_start))
    re_ = F.unix_timestamp(F.col(right_end))
    # explode the interval onto every bin it covers
    bins = F.sequence(
        (rs / bin_seconds).cast("long"), (re_ / bin_seconds).cast("long")
    )
    rcols = [c for c in right.columns if c not in on]
    r = right.where(rs <= re_).select(
        *on, F.explode(bins).alias("_bin"), *rcols
    )
    l = left.withColumn("_bin", lbin)
    joined = l.join(r, on=[*on, "_bin"], how="inner").where(
        (F.col(left_point) >= F.col(right_start))
        & (F.col(left_point) <= F.col(right_end))
    )
    # a (point, interval) pair meets in exactly ONE bin (the point's), so
    # no dedup is needed — the explode fans out rows, never matches
    return joined.drop("_bin")
