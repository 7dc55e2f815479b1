"""As-of (nearest-predecessor) join — Spark has no native ASOF JOIN;
this is the union+window formulation (SURVEY.md §2.5 note).

Semantics match DuckDB/pandas ``merge_asof`` direction='backward':
for each left row, the right row with the greatest right_ts <=
left_ts within the same key. Equal timestamps match.

Scale: one shuffle on (key) + one sort — same cost as a window over
the combined stream; no range explosion, no broadcast requirement.
This beats the naive range-join formulation (left.ts BETWEEN r.ts AND
r.next_ts) which needs an interval join. Skewed keys behave like any
window partition (salt by time-bucket if one key dominates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: Sequence[str] = ("value",),
    matched_prefix: str = "matched_",
) -> DataFrame:
    """Left as-of join: every left row + the latest right row at or
    before it (per key). Right columns come back as
    ``{matched_prefix}{col}`` plus ``{matched_prefix}ts``; NULL when
    no predecessor exists."""
    on = list(on)
    lcols = [c for c in left.columns if c not in on]
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c != left_ts],
        F.col(left_ts).alias("_lts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_value_cols],
        F.lit(None).cast("timestamp").alias("_r_ts"),
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != left_ts],
        F.lit(None).cast("timestamp").alias("_lts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    u = l.unionByName(r)
    # right rows sort before left rows at equal ts so an exact-ts match
    # is visible to the left row (backward-inclusive semantics)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{matched_prefix}{c}")
        for c in right_value_cols
    ]
    filled_ts = F.last("_r_ts", ignorenulls=True).over(w).alias(f"{matched_prefix}ts")
    out = u.select(
        *on,
        F.col("_lts").alias(left_ts),
        *[F.col(c) for c in lcols if c != left_ts],
        F.col("_is_left"),
        *filled,
        filled_ts,
    )
    return out.filter(F.col("_is_left") == 1).drop("_is_left")
