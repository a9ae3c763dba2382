"""Deterministic synthetic Common-Crawl-style corpus + text extractor.

``web_pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` — the input shape mandated by BASELINE.json input_hint.
Everything is a pure function of (seed, row id): re-generation at any
scale or partitioning is byte-stable, so the per-url byte-identical
extracted-text invariant is testable and ground-truth distinct counts
are reproducible.

Generation runs distributed: ``spark.range(n)`` → ``mapInPandas`` with
vectorized numpy (splitmix64 streams for randomness, no per-row Python
except the final HTML template join). ``lang`` is deliberately Zipfian
(en ≈ 45%) so skew-handling paths are exercised (FIXTURES.md F1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_U64 = np.uint64

_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (Steele/Lea/Flood, public) — the
    deterministic randomness source for the generator."""
    z = x + _SM_GAMMA
    z = (z ^ (z >> _U64(30))) * _SM_M1
    z = (z ^ (z >> _U64(27))) * _SM_M2
    return z ^ (z >> _U64(31))


def _stream(ids: np.ndarray, stream_id: int, seed: int) -> np.ndarray:
    off = _U64((stream_id * 0x632BE59BD9B4E019) & 0xFFFFFFFFFFFFFFFF)
    return splitmix64(splitmix64(ids + off) ^ _U64(seed))


def _uniform(ids, stream_id, seed) -> np.ndarray:
    return _stream(ids, stream_id, seed).astype(np.float64) / float(2**64)


LANGS = ["en", "zh", "es", "de", "fr", "ja", "ru", "pt", "it", "nl"]
_LANG_P = np.array([0.45, 0.12, 0.10, 0.08, 0.07, 0.06, 0.05, 0.04, 0.02, 0.01])
_LANG_CDF = np.cumsum(_LANG_P)

_N_HOSTS = 1000
_HOST_W = 1.0 / np.arange(1, _N_HOSTS + 1) ** 1.1
_HOST_CDF = np.cumsum(_HOST_W) / _HOST_W.sum()

WEB_PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

_EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")
_DUP_FRACTION_MOD = 10  # ~10% of rows duplicate an earlier url


def _urls_for_ids(ids: np.ndarray, seed: int) -> tuple[np.ndarray, pd.Series]:
    """url per row; ~10% of rows reuse the url of a deterministic earlier id."""
    dup = (_stream(ids, 1, seed) % _U64(_DUP_FRACTION_MOD)) == 0
    back = (_stream(ids, 2, seed) % _U64(1000)) + _U64(1)
    src = np.where(dup & (ids >= back), ids - back, ids)
    host_rank = np.searchsorted(_HOST_CDF, _uniform(src, 3, seed), side="left")
    hosts = pd.Series(host_rank).map(lambda r: f"host{r:04d}.example.org")
    urls = "https://" + hosts + "/p" + pd.Series(src).astype(str)
    return src, urls


def _lang_for_ids(ids: np.ndarray, seed: int) -> pd.Series:
    li = np.searchsorted(_LANG_CDF, _uniform(ids, 4, seed), side="left").clip(0, len(LANGS) - 1)
    return pd.Series(li).map(dict(enumerate(LANGS)))


_WORDS = np.array(
    [f"w{chr(97 + i % 26)}{chr(97 + (i * 7) % 26)}{i % 97}" for i in range(512)], dtype=object
)


def _page_for_src(src: np.ndarray, seed: int) -> tuple[pd.Series, pd.Series]:
    """(html, text) derived from the url source id ALONE — duplicate urls
    get byte-identical pages, and extract(html) == text by construction."""
    title = pd.Series(_stream(src, 5, seed) % _U64(100000)).astype(str)
    nw = (_stream(src, 6, seed) % _U64(40) + _U64(10)).astype(np.int64)
    w1 = _WORDS[(_stream(src, 7, seed) % _U64(512)).astype(np.int64)]
    w2 = _WORDS[(_stream(src, 8, seed) % _U64(512)).astype(np.int64)]
    body = pd.Series(
        [" ".join([a, b] * int(k // 2 + 1)) for a, b, k in zip(w1, w2, nw)], dtype=object
    )
    text = "title" + title + "\n" + body
    html = (
        "<html><head><title>title" + title + "</title></head><body><p>" + body + "</p></body></html>"
    )
    return html.map(lambda s: s.encode("utf-8")), text


def extract_text_series(html: pd.Series) -> pd.Series:
    """Deterministic html→text: title and paragraph contents joined by a
    newline, tags stripped. Byte-stable per url (asserted in tests)."""
    s = html.map(lambda b: b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else str(b))
    s = s.str.replace(r"</title>|</p>", "\n", regex=True)
    s = s.str.replace(r"<[^>]*>", "", regex=True)
    s = s.str.replace(r"\n+$", "", regex=True)
    return s


def generate_web_pages(spark: SparkSession, n_rows: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            src, urls = _urls_for_ids(ids, seed)
            html, text = _page_for_src(src, seed)
            day_us = (ids % _U64(14)).astype("timedelta64[D]").astype("timedelta64[us]")
            sec_us = (
                (_stream(ids, 9, seed) % _U64(86400)).astype("timedelta64[s]").astype("timedelta64[us]")
            )
            ts = _EPOCH_2024 + day_us + sec_us
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": pd.Series(ts),
                    "html": html,
                    "text": text,
                    "lang": _lang_for_ids(ids, seed),
                }
            )

    return spark.range(0, n_rows, numPartitions=parts).mapInPandas(gen, schema=WEB_PAGES_SCHEMA)


def extract_text(df: DataFrame, html_col: str = "html", out: str = "extracted_text") -> DataFrame:
    """Spark-level deterministic extraction as an Arrow-batched pandas UDF."""
    from pyspark.sql import functions as F

    @F.pandas_udf(StringType())
    def _extract(h: pd.Series) -> pd.Series:
        return extract_text_series(h)

    return df.withColumn(out, _extract(df[html_col]))
