"""Streaming sketch aggregation: file-source micro-batches → stateful
sketch state → estimates match the batch build on the same data."""

import os

import pytest
from pyspark.sql import functions as F

from hlld_spark.core import hll
from hlld_spark.core.accumulator import HllSpec
from hlld_spark.operators.sketch import build_sketches, with_estimate
from hlld_spark.sources.webpages import generate_web_pages
from hlld_spark.streaming.sketch_stream import sketch_stream, windowed_sketch_stream

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream") / "in")
    os.makedirs(d)
    # three "arriving" files
    wp = generate_web_pages(spark, 6000, partitions=3).withColumn(
        "pfile", F.spark_partition_id()
    )
    for i in range(3):
        wp.filter(F.col("pfile") == i).drop("pfile").coalesce(1).write.mode("append").parquet(d)
    return d


def _run_stream(spark, sdf, name, tmp):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp, f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"select * from {name}")


def test_stream_matches_batch(spark, stream_dir, tmp_path):
    batch_df = spark.read.parquet(stream_dir)
    schema = batch_df.schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stream_dir)
    spec = HllSpec(12)
    out = sketch_stream(stream, ["lang"], "url", spec)
    result = _run_stream(spark, out, "stream_by_lang", str(tmp_path))
    # take the LAST emitted row per lang (update mode re-emits)
    import pandas as pd

    pdf = result.toPandas()
    last = pdf.groupby("lang").last()
    direct = {
        r["lang"]: (bytes(r["sketch"]), r["n_rows"])
        for r in build_sketches(batch_df, ["lang"], "url", spec).collect()
    }
    assert set(last.index) == set(direct)
    for lang, (sk, n) in direct.items():
        assert last.loc[lang, "n_rows"] == n
        assert bytes(last.loc[lang, "sketch"]) == sk, f"stream state != batch sketch for {lang}"


def test_windowed_stream(spark, stream_dir, tmp_path):
    batch_df = spark.read.parquet(stream_dir)
    stream = spark.readStream.schema(batch_df.schema).parquet(stream_dir)
    out = windowed_sketch_stream(stream, "warc_ts", [], "url", HllSpec(12), window="1 day")
    result = _run_stream(spark, out, "stream_by_day", str(tmp_path))
    pdf = result.toPandas().groupby("window_start").last()
    exact = {
        r["d"]: r["n"]
        for r in batch_df.groupBy(F.date_trunc("day", "warc_ts").alias("d"))
        .agg(F.count("url").alias("n"))
        .collect()
    }
    assert len(pdf) == len(exact) == 14
    for d, n in exact.items():
        assert pdf.loc[d, "n_rows"] == n
