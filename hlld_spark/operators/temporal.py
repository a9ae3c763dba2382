"""Temporal joins — as-of (nearest-earlier) join, DataFrame-first.

The classic time-series primitive (kdb's ``aj``, pandas
``merge_asof``, DuckDB ``ASOF JOIN``): for every left row, the single
right row with the same key and the greatest timestamp ≤ the left
timestamp. The crawl/analytics uses are everywhere: join events to the
latest preceding snapshot/price/config/fetch.

Spark-first shape — NOT a range join (which Catalyst would execute as
a broadcast-nested-loop or an exploded interval join): both sides are
UNIONED into one stream tagged by side, shuffled ONCE by key, and a
single ``last_value(..., ignorenulls)`` window over (ts, side) order
carries the most recent right payload forward onto each left row. Cost
= one exchange of (key, ts, right-payload) + one sort per partition —
the same shape as any windowed aggregation, linear in input, no
quadratic candidate blowup, skew handled by AQE like any hot key.

Determinism: several right rows can share (key, ts); the operator
pre-collapses them with ``max_by(payload, tie_col)`` so the match is a
pure function of the data (and so an exact oracle is possible — native
ASOF implementations leave the equal-ts winner unspecified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tie_col: str | None = None,
    allow_exact: bool = True,
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the ``right_cols``
    of the right row with equal ``on`` key and the greatest
    ``right_ts`` ≤ (or < when ``allow_exact=False``) its ``left_ts``
    (NULLs when no such row). ``tie_col`` (default: ``right_ts``)
    deterministically resolves several right rows sharing (key, ts) —
    the max-tie row wins."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    tie = tie_col or right_ts
    # deterministic pre-collapse: one right row per (key, ts)
    r = right.groupBy(F.col(on).alias("__k"), F.col(right_ts).alias("__t")).agg(
        F.max_by(F.struct(*[F.col(c) for c in right_cols]), F.col(tie)).alias("__r")
    )
    l = left.withColumn("__k", F.col(on)).withColumn("__t", F.col(left_ts))
    # at equal __t: side 0 sorts first. allow_exact → right first (its
    # payload is visible to the same-ts left row); else left first.
    r_side, l_side = (0, 1) if allow_exact else (1, 0)
    lt = l.select(
        "__k", "__t", F.lit(l_side).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    rt = r.select(
        "__k", "__t", F.lit(r_side).alias("__side"),
        F.lit(None).cast(lt.schema["__l"].dataType).alias("__l"),
        "__r",
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        lt.unionByName(rt)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__l").isNotNull())
    )
    out = matched.select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        *[F.col("__m")[c].alias(c) for c in right_cols],
    )
    return out
