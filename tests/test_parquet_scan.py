"""Generic worker-side parquet scan primitive (sources/parquet_scan)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hlld_spark.sources.parquet_scan import map_parquet_batches, plan_parquet_splits

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def web_dir(spark, tmp_path_factory):
    from hlld_spark.sources.webpages import generate_web_pages

    d = str(tmp_path_factory.mktemp("ps") / "web")
    generate_web_pages(spark, 30000, partitions=6).write.parquet(d)
    return d


def test_identity_matches_dataframe_read(spark, web_dir):
    def ident(batches):
        yield from batches

    got = map_parquet_batches(spark, web_dir, ident, "url string, lang string", ["url", "lang"])
    a = sorted((r["url"], r["lang"]) for r in got.collect())
    b = sorted((r["url"], r["lang"]) for r in spark.read.parquet(web_dir).select("url", "lang").collect())
    assert a == b


def test_filter_pushdown_both_forms(spark, web_dir):
    import pyarrow.dataset as ds

    def count_rows(batches):
        import pyarrow as pa

        n = 0
        for rb in batches:
            n += rb.num_rows
        yield pa.RecordBatch.from_arrays([pa.array([n], pa.int64())], names=["n"])

    expect = spark.read.parquet(web_dir).filter(F.col("lang") == "en").count()
    for filt in ([("lang", "=", "en")], ds.field("lang") == "en"):
        got = map_parquet_batches(spark, web_dir, count_rows, "n long", ["lang"], filter=filt)
        assert sum(r["n"] for r in got.collect()) == expect


def test_lang_id_rides_worker_side_scan(spark, web_dir):
    """Any Arrow-batch operator composes with the scan primitive: lang-id
    per-lang counts computed entirely worker-side equal the DataFrame-UDF
    path."""
    from hlld_spark.operators.text import _lang_id_batch, with_lang_id

    def lang_counts(batches):
        import pandas as pd
        import pyarrow as pa

        counts: dict = {}
        for rb in batches:
            texts = pd.Series(rb.column(0).to_pylist())
            for v in _lang_id_batch(texts):
                counts[v] = counts.get(v, 0) + 1
        if counts:
            yield pa.RecordBatch.from_arrays(
                [pa.array(list(counts.keys()), pa.string()), pa.array(list(counts.values()), pa.int64())],
                names=["lang_id", "n"],
            )

    got = (
        map_parquet_batches(spark, web_dir, lang_counts, "lang_id string, n long", ["text"])
        .groupBy("lang_id")
        .agg(F.sum("n").alias("n"))
    )
    a = {r["lang_id"]: r["n"] for r in got.collect()}
    b = {
        r["lang_id"]: r["n"]
        for r in with_lang_id(spark.read.parquet(web_dir), "text")
        .groupBy("lang_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert a == b


def test_giant_file_rowgroup_split_planning(spark, web_dir, tmp_path):
    from hlld_spark.sources.webpages import generate_web_pages

    one = str(tmp_path / "one")
    generate_web_pages(spark, 20000, partitions=4).coalesce(1).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(one)
    splits, n_tasks = plan_parquet_splits(spark, one)
    assert len(splits) > 1 and all(lo >= 0 for _, lo, _ in splits)

    def ident(batches):
        yield from batches

    got = map_parquet_batches(spark, one, ident, "url string", ["url"]).count()
    assert got == 20000
