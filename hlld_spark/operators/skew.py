"""Explicit skew handling (north_rule: "partitioning / shuffle / skew
handled explicitly").

Sketch builds don't need salting — the partition-local partial
aggregation collapses any key skew before the shuffle (operators/
sketch.py). These helpers cover the operations that DO row-shuffle on a
skewed key: exact distinct counts, row-level repartitions, and skewed
joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_repartition(df: DataFrame, key: str, salt_buckets: int = 16, salt_col: str = "__salt") -> DataFrame:
    """Repartition on (key, salt) so one hot key spreads over
    ``salt_buckets`` tasks. Salt is derived from the full row's hash —
    deterministic, no RNG in the plan."""
    salted = df.withColumn(salt_col, F.pmod(F.hash(*df.columns), F.lit(salt_buckets)))
    return salted.repartition(F.col(key), F.col(salt_col))


def salted_exact_distinct(
    df: DataFrame, keys: list[str], col: str, salt_buckets: int = 16, out: str = "exact_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT col) GROUP BY keys, two-stage with a salt
    derived from the *counted value* (disjoint value sets per salt ⇒
    partial distinct counts sum exactly):

        stage 1: groupBy(keys, hash(col) % B) → count_distinct
        stage 2: groupBy(keys) → sum

    One hot key becomes B parallel partial aggregations instead of one
    straggler reducer. Same result as plain countDistinct, skew-proof.
    """
    salt = F.pmod(F.hash(F.col(col)), F.lit(salt_buckets)).alias("__salt")
    stage1 = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, salt)
        .agg(F.countDistinct(col).alias("__partial"))
    )
    return stage1.groupBy(*keys).agg(F.sum("__partial").cast("long").alias(out))


def broadcast_threshold_join(big: DataFrame, small: DataFrame, on, how: str = "inner") -> DataFrame:
    """Join with an explicit broadcast hint on the small side — removes
    the shuffle of the big side entirely (the registry-onto-sketches
    join shape from SURVEY.md §2.2)."""
    return big.join(F.broadcast(small), on, how)
