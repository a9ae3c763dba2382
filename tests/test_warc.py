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


def test_negative_content_length_raises():
    """ADVICE r5: int() happily parses '-54'; the pre-r6 parser moved
    the cursor BACKWARDS, so a crafted record whose negative length
    points back at its own version line looped forever. Must raise."""
    evil = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://evil/\r\nContent-Length: -54\r\n\r\n"
        b"padding bytes"
    )
    with pytest.raises(WarcFormatError, match="negative Content-Length"):
        list(parse_warc_records(evil))


def test_iter_records_chunked_equals_whole_buffer(tmp_path):
    """The incremental parser must produce byte-identical records no
    matter how the uncompressed stream is chunked (headers and payloads
    split across chunk boundaries)."""
    from hlld_spark.sources.warc import iter_warc_records

    p = str(tmp_path / "c.warc")
    write_warc(p, _RECORDS, compress=False)
    raw = open(p, "rb").read()
    whole = list(parse_warc_records(raw))
    for sz in (1, 3, 7, 64, len(raw)):
        chunks = (raw[i : i + sz] for i in range(0, len(raw), sz))
        got = list(iter_warc_records(chunks))
        assert [(r["headers"], r["payload"]) for r in got] == [
            (r["headers"], r["payload"]) for r in whole
        ]


def test_iter_gunzip_chunked_members(tmp_path):
    """Member-by-member incremental decompression: output joined across
    arbitrary input chunkings equals the whole-buffer decode."""
    from hlld_spark.sources.warc import _iter_gunzip

    data = b"".join(gzip.compress(f"member-{i}-".encode() * 50) for i in range(8))
    want = _gunzip_members(data)
    for sz in (1, 5, 100, len(data)):
        chunks = (data[i : i + sz] for i in range(0, len(data), sz))
        assert b"".join(_iter_gunzip(chunks)) == want
    with pytest.raises(WarcFormatError, match="truncated gzip"):
        list(_iter_gunzip(iter([data[:-6]])))


def test_streaming_bounded_memory(tmp_path):
    """VERDICT r5 #2 gate: parse a multi-hundred-MB archive through the
    streaming path and assert peak traced memory stays bounded by the
    record size, not the archive size (the old path buffered the whole
    decompressed archive — ~6x archive size per task)."""
    import tracemalloc

    from hlld_spark.sources.warc import _iter_file_chunks, _iter_gunzip, iter_warc_records

    rec_payload = (b"<html>" + b"lorem ipsum dolor sit amet " * 160_000 + b"</html>")  # ~4.1 MB
    n_records = 64  # ~264 MB of total payload
    p = str(tmp_path / "big.warc.gz")
    with open(p, "wb") as f:
        for i in range(n_records):
            http = (
                b"HTTP/1.1 200 OK\r\n"
                + f"Content-Length: {len(rec_payload)}\r\n\r\n".encode()
                + rec_payload
            )
            hdr = (
                "WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: https://big.example.org/{i}\r\n"
                "WARC-Date: 2024-01-01T00:00:00Z\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode()
            f.write(gzip.compress(hdr + http + b"\r\n\r\n", 1))
    total_payload = n_records * (len(rec_payload) + 44)  # + http envelope
    tracemalloc.start()
    seen = 0
    count = 0
    with open(p, "rb") as f:
        for rec in iter_warc_records(_iter_gunzip(_iter_file_chunks(f))):
            seen += len(rec["payload"])
            count += 1
    peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()
    assert count == n_records
    assert seen == total_payload
    # bound: a few records + one 4 MB input chunk, NOT the ~264 MB stream
    assert peak < 64 << 20, f"peak {peak / 1e6:.1f} MB — streaming is not bounded"


@pytest.mark.spark
def test_read_warc_batched_and_content_pruned(spark, tmp_path):
    """Tiny batch_bytes forces one output batch per record — results
    must equal the default; and the binaryFile scan must read ONLY the
    path column (content stays out of the JVM entirely)."""
    p = str(tmp_path / "a.warc.gz")
    write_warc(p, _RECORDS)
    default = {r["url"]: bytes(r["html"]) for r in read_warc(spark, p).collect()}
    tiny = read_warc(spark, p, batch_bytes=1)
    got = {r["url"]: bytes(r["html"]) for r in tiny.collect()}
    assert got == default == {u: h for u, _, h in _RECORDS}
    plan = tiny._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<path:string>" in plan, plan


def test_fixture_regeneration_is_byte_deterministic(tmp_path):
    """The committed driver-gate fixture (tests/fixtures/warc_240) must
    be byte-identical to a fresh regeneration — gzip mtime is zeroed and
    content is pure index arithmetic."""
    import os

    from hlld_spark.sources.warc import write_warc_fixture

    out = str(tmp_path / "regen")
    write_warc_fixture(out, 240)
    committed = os.path.join(os.path.dirname(__file__), "fixtures", "warc_240")
    for name in ("part0.warc.gz", "part1.warc.gz", "part2.warc.gz"):
        a = open(os.path.join(out, name), "rb").read()
        b = open(os.path.join(committed, name), "rb").read()
        assert a == b, f"{name} differs from the committed fixture"


@pytest.mark.spark
def test_fixture_ingest_counts_and_noise_skipped(spark, tmp_path):
    """240 response records (239 distinct urls — one refetch) survive;
    the request/conversion/no-URI noise records do not."""
    from pyspark.sql import functions as F

    from hlld_spark.sources.warc import warc_to_web_pages, write_warc_fixture

    d = str(tmp_path / "fx")
    write_warc_fixture(d, 240)
    pages = warc_to_web_pages(spark, d + "/*.warc.gz")
    agg = pages.agg(
        F.count("*").alias("n"), F.countDistinct("url").alias("u")
    ).collect()[0]
    assert (agg["n"], agg["u"]) == (240, 239)
    assert pages.filter(F.col("url").contains("skip.me")).count() == 0


@pytest.mark.spark
def test_read_warc_stream_incremental(spark, tmp_path):
    """Structured Streaming ingestion (r6): archives landing in a
    directory are picked up exactly once per micro-batch; a second
    availableNow round after a new archive arrives appends ONLY the new
    pages (file-source checkpointing)."""
    from pyspark.sql import functions as F

    from hlld_spark.sources.warc import read_warc_stream

    src = tmp_path / "landing"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    write_warc(str(src / "a.warc.gz"), _RECORDS[:2])

    sink = str(tmp_path / "pages_out")

    def run_round():
        stream = read_warc_stream(spark, str(src))
        assert stream.isStreaming
        q = (
            stream.select(
                "url", F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host")
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return {r["url"] for r in spark.read.parquet(sink).collect()}

    got1 = run_round()
    assert got1 == {u for u, _, _ in _RECORDS[:2]}
    write_warc(str(src / "b.warc.gz"), _RECORDS[2:])
    got2 = run_round()
    assert got2 == {u for u, _, _ in _RECORDS}
    # batch and stream reads agree on the same directory
    from hlld_spark.sources.warc import read_warc

    batch = {r["url"] for r in read_warc(spark, str(src / "*.warc.gz")).collect()}
    assert batch == got2
