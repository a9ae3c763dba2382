"""WARC ingestion — read Common-Crawl-style web archives into the
``web_pages`` table shape.

WARC (ISO 28500) is the format real crawls ship in: a stream of
records, each ``WARC/1.0`` + headers + CRLFCRLF + Content-Length bytes
+ CRLFCRLF. Common Crawl compresses each record as its OWN gzip member
so a reader can split work without decompressing the whole file; plain
(uncompressed or single-stream) files are handled too.

Spark-first shape: ``spark.read.format("binaryFile")`` lists and reads
the archive files (one task per file — a CC crawl has tens of
thousands of ~1 GB files, so file-level parallelism saturates any
cluster), and ONE ``mapInPandas`` parses records and emits
``(url, warc_ts, html)`` rows. Only response records survive; HTTP
response headers are stripped so ``html`` is the payload body,
matching the deterministic ``web_pages`` fixture schema
(``sources/webpages.py``) — compose with ``extract_text`` /
``with_lang_id_profiles`` / the cleaning pipeline downstream.

The writer (:func:`write_warc`) produces spec-shaped records (used for
fixtures and round-trip tests; one gzip member per record, CC
convention).

Reference parity note: the reference (hlld) has no file ingestion —
this is a brief-mandated source-format addition for the training-data
pipeline layer.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), False),
    ]
)


class WarcFormatError(ValueError):
    """Malformed WARC payload."""


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; plain bytes
    pass through untouched."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:
            raise WarcFormatError("truncated gzip member in WARC stream")
        data = d.unused_data
    return b"".join(out)


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield {'headers': {...}, 'payload': bytes} per WARC record of an
    UNCOMPRESSED stream. Header names are lower-cased."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if data[pos : pos + 5] != b"WARC/":
            raise WarcFormatError(f"expected WARC/ version line at offset {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise WarcFormatError("unterminated WARC header block")
        lines = data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise WarcFormatError("missing/invalid Content-Length") from None
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise WarcFormatError("truncated WARC record payload")
        yield {"headers": headers, "payload": data[body_start : body_start + clen]}
        pos = body_start + clen


def _strip_http_headers(payload: bytes) -> bytes:
    """An application/http response payload = status line + headers +
    CRLFCRLF + body; anything without that shape passes through."""
    if payload[:5] == b"HTTP/":
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4 :]
    return payload


def _parse_warc_ts(v: str | None):
    if not v:
        return None
    try:
        return datetime.strptime(v, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=None)
    except ValueError:
        return None


def read_warc(
    spark: SparkSession, path: str, record_types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """(url, warc_ts, html) from WARC file(s) at ``path`` (glob ok,
    ``.warc`` or ``.warc.gz``). One task per archive file; only
    ``record_types`` records survive (default HTTP responses, with the
    HTTP envelope stripped from the payload)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, htmls = [], [], []
            for content in pdf["content"]:
                raw = _gunzip_members(bytes(content))
                for rec in parse_warc_records(raw):
                    h = rec["headers"]
                    if h.get("warc-type") not in record_types:
                        continue
                    url = h.get("warc-target-uri")
                    if not url:
                        continue
                    urls.append(url)
                    tss.append(_parse_warc_ts(h.get("warc-date")))
                    htmls.append(_strip_http_headers(rec["payload"]))
            # explicit dtypes: an empty (or all-None-ts) batch must not
            # infer float64 — Arrow can't cast double → timestamp
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype=object),
                    "warc_ts": pd.Series(tss, dtype="datetime64[us]"),
                    "html": pd.Series(htmls, dtype=object),
                }
            )

    return files.mapInPandas(parse, schema=WARC_PAGES_SCHEMA)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """(url, warc_ts, text) from WET file(s) — Common Crawl's
    extracted-text sibling format: the SAME record structure with
    ``WARC-Type: conversion`` and a text/plain payload (no HTTP
    envelope), i.e. the corpus shape LLM pipelines actually consume.
    Feeds the documents-style operators (dedup, decontaminate, lang-id,
    quality) directly."""
    df = read_warc(spark, path, record_types=("conversion",))
    from pyspark.sql import functions as F

    return df.select(
        "url", "warc_ts", F.decode(F.col("html"), "UTF-8").alias("text")
    )


def warc_to_web_pages(spark: SparkSession, path: str) -> DataFrame:
    """Full ``web_pages``-shaped ingestion: :func:`read_warc` + the
    deterministic ``extract_text`` — drop-in input for the cleaning
    pipeline / sketch builds."""
    from .webpages import extract_text

    return extract_text(read_warc(spark, path), "html", out="text")


def write_warc(path: str, records: list[tuple[str, str, bytes]], compress: bool = True) -> str:
    """Write (url, iso_date 'YYYY-MM-DDTHH:MM:SSZ', html_bytes) records
    as a WARC file — one gzip member per record when ``compress`` (the
    Common Crawl convention). Fixture/round-trip writer; the records
    carry an HTTP response envelope like real crawl output."""
    out = io.BytesIO()
    for i, (url, date, html) in enumerate(records):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode()
            + html
        )
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        rec = hdr + http + b"\r\n\r\n"
        out.write(gzip.compress(rec) if compress else rec)
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return path


def utcnow_warc_date() -> str:
    """Current time in WARC-Date format (helper for writers)."""
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
