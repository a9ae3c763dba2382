"""WARC source (r5): Common-Crawl-style archive ingestion into the
web_pages shape — record parsing, per-record gzip members, HTTP header
stripping, response-only filtering, glob reads, and composition with
extract_text + the sketch build."""

import gzip

import pytest

from hlld_spark.sources.warc import (
    WarcFormatError,
    _gunzip_members,
    _strip_http_headers,
    parse_warc_records,
    read_warc,
    warc_to_web_pages,
    write_warc,
)

_RECORDS = [
    ("https://host0.example.org/p1", "2024-01-02T03:04:05Z", b"<html><body><p>alpha beta</p></body></html>"),
    ("https://host1.example.org/p2", "2024-01-03T04:05:06Z", b"<html><body><p>gamma delta</p></body></html>"),
    ("https://host0.example.org/p3", "2024-01-04T05:06:07Z", b"<html><body><p>epsilon</p></body></html>"),
]


def test_parse_round_trip(tmp_path):
    p = str(tmp_path / "a.warc.gz")
    write_warc(p, _RECORDS)
    raw = _gunzip_members(open(p, "rb").read())
    recs = list(parse_warc_records(raw))
    assert len(recs) == 3
    for (url, date, html), rec in zip(_RECORDS, recs):
        assert rec["headers"]["warc-target-uri"] == url
        assert rec["headers"]["warc-date"] == date
        assert _strip_http_headers(rec["payload"]) == html


def test_uncompressed_and_single_stream(tmp_path):
    plain = str(tmp_path / "b.warc")
    write_warc(plain, _RECORDS, compress=False)
    assert len(list(parse_warc_records(_gunzip_members(open(plain, "rb").read())))) == 3
    # a single gzip stream over the whole file (non-CC but legal) parses too
    single = str(tmp_path / "c.warc.gz")
    with open(single, "wb") as f:
        f.write(gzip.compress(open(plain, "rb").read()))
    assert len(list(parse_warc_records(_gunzip_members(open(single, "rb").read())))) == 3


def test_malformed_raises(tmp_path):
    with pytest.raises(WarcFormatError, match="expected WARC/"):
        list(parse_warc_records(b"NOT A WARC"))
    good = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 10\r\n\r\n"
    with pytest.raises(WarcFormatError, match="truncated"):
        list(parse_warc_records(good + b"abc"))  # payload shorter than declared
    with pytest.raises(WarcFormatError, match="Content-Length"):
        list(parse_warc_records(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"))
    with pytest.raises(WarcFormatError, match="gzip"):
        _gunzip_members(gzip.compress(b"x")[:-4])  # truncated member


@pytest.mark.spark
def test_read_warc_spark(spark, tmp_path):
    """Distributed read over a glob of archives; non-response records
    skipped; HTTP headers stripped; timestamps parsed."""
    write_warc(str(tmp_path / "part0.warc.gz"), _RECORDS[:2])
    write_warc(str(tmp_path / "part1.warc.gz"), _RECORDS[2:])
    # hand-add a request record (must be skipped) to a third file
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://x/\r\n"
        b"Content-Length: 4\r\n\r\nGET \r\n\r\n"
    )
    with open(tmp_path / "part2.warc.gz", "wb") as f:
        f.write(gzip.compress(req))
    df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {u for u, _, _ in _RECORDS}
    for url, date, html in _RECORDS:
        assert bytes(rows[url]["html"]) == html
        assert rows[url]["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ") == date


@pytest.mark.spark
def test_read_wet_conversion_records(spark, tmp_path):
    """WET = conversion records with plain-text payloads (no HTTP
    envelope) — lands directly in the documents shape and feeds the
    text operators."""
    from hlld_spark.operators.text import with_token_counts

    recs = [
        ("https://a/x", "2024-02-01T00:00:00Z", "plain extracted text one"),
        ("https://a/y", "2024-02-02T00:00:00Z", "another extracted document"),
    ]
    body = b""
    for i, (url, date, text) in enumerate(recs):
        payload = text.encode()
        hdr = (
            "WARC/1.0\r\nWARC-Type: conversion\r\n"
            f"WARC-Record-ID: <urn:uuid:wet-{i}>\r\n"
            f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        body += gzip.compress(hdr + payload + b"\r\n\r\n")
    p = tmp_path / "seg.warc.wet.gz"
    p.write_bytes(body)
    from hlld_spark.sources.warc import read_wet

    df = read_wet(spark, str(p))
    rows = {r["url"]: r["text"] for r in df.collect()}
    assert rows == {u: t for u, _, t in recs}
    toks = {r["url"]: r["whitespace_tokens"] for r in with_token_counts(df).collect()}
    assert toks == {"https://a/x": 4, "https://a/y": 3}


@pytest.mark.spark
def test_warc_to_web_pages_composes_with_sketches(spark, tmp_path):
    """Ingested WARC rows feed the engine like the fixture table:
    deterministic text extraction + an HLL build over urls."""
    from pyspark.sql import functions as F

    from hlld_spark.core.accumulator import HllSpec
    from hlld_spark.operators.sketch import build_sketches, with_estimate

    p = str(tmp_path / "crawl.warc.gz")
    write_warc(p, _RECORDS)
    pages = warc_to_web_pages(spark, p)
    texts = {r["url"]: r["text"] for r in pages.collect()}
    assert texts["https://host0.example.org/p1"] == "alpha beta"
    est = with_estimate(
        build_sketches(
            pages.withColumn("host", F.regexp_extract("url", r"https://([^/]+)/", 1)),
            ["host"], "url", HllSpec(12),
        )
    ).collect()
    got = {r["host"]: (r["n_rows"], round(r["estimate"])) for r in est}
    assert got == {"host0.example.org": (2, 2), "host1.example.org": (1, 1)}
