"""Table-format abstraction: Iceberg when available, partitioned parquet
otherwise (identical schema + partitioning either way).

The brief targets "Iceberg tables of Common-Crawl-style web pages"; this
container has no Iceberg runtime jars, so the code feature-detects the
catalog at session time (SURVEY.md §7) and falls back transparently.

TEST STATUS OF THE ICEBERG BRANCH: the parquet fallback is
integration-tested end-to-end; the Iceberg branch is CONTRACT-tested
only (tests/test_tables.py pins the exact DataFrameWriterV2 sequence:
writeTo → using("iceberg") → partitionedBy → createOrReplace/append, and
the path-vs-catalog dispatch rules) because the runtime jars are absent
here. On a real lakehouse, verify once with a smoke write before
trusting overwrite semantics.
Registry/sketch tables get snapshot-style semantics either way: Iceberg
gives real snapshot isolation; the parquet fallback overwrites whole
directories atomically-enough for the test-visible semantics
(SURVEY.md §3.3 — MVCC maps to immutable snapshots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    target: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Write to an Iceberg table (target = catalog.db.name) when the
    runtime is present, else partitioned parquet (target = path).
    Returns 'iceberg' or 'parquet'."""
    spark = df.sparkSession
    if iceberg_available(spark) and not target.startswith("/"):
        w = df.writeTo(target).using("iceberg")
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return "iceberg"
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
    return "parquet"


def read_table(spark: SparkSession, target: str) -> DataFrame:
    if iceberg_available(spark) and not target.startswith("/"):
        return spark.read.table(target)
    return spark.read.parquet(target)
