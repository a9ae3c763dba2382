"""End-to-end cleaning pipeline (scripts/run_clean_corpus.py): the
stages compose, the metrics JSON is coherent, and each stage removes
exactly what its operator semantics promise.

Round 4: the decontaminate stage runs in the TOKEN unit (the published
13-token-gram rule) by default — the planted doc containing a 14-token
eval passage verbatim is removed, while a char-gram near-miss (shares a
long character run but only a 5-token window with the eval set) is
RETAINED, which the old char unit would have over-flagged."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# 14 tokens -> two 13-token grams; any doc containing it verbatim is flagged
_EVAL_PASSAGE = (
    "the secret benchmark passage nobody should ever train on during any run of preparation"
)


@pytest.mark.spark
def test_pipeline_end_to_end(spark, tmp_path):
    # corpus: exact dups, a near-dup pair, a token-contaminated doc, a
    # char-gram near-miss, junk, and a non-English keeper
    # near-dup pair texts are 25 tokens differing in the LAST token only:
    # token 5-gram Jaccard = 20/22 ≈ 0.91 ≥ the 0.8 threshold (r5: the
    # pipeline's near-dup default unit is token)
    _base = (
        "the weather was cold this morning and the streets were quiet while "
        "the old market square stayed empty and the grey river moved slowly"
    )
    rows = [
        (0, f"{_base} today"),
        (1, f"{_base} today"),  # exact dup of 0
        (2, f"{_base} instead"),  # near-dup of 0 (token J ≈ 0.91)
        (3, "she said that they would arrive at the station before noon with the others"),
        (4, f"header words then {_EVAL_PASSAGE} and a trailing bit"),  # planted token-13-gram
        (5, "zz zz zz zz zz zz zz zz zz zz zz zz"),  # repetition junk
        (6, "el tiempo estaba frío esta mañana y las calles estaban tranquilas hoy"),
        # 7: shares a 35-char run ("the secret benchmark passage nobody")
        #    with the eval set but only a 5-token window -> token-clean
        (7, "we mention the secret benchmark passage nobody else would read on a slow afternoon at home"),
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    ev = str(tmp_path / "eval")
    spark.createDataFrame([(0, _EVAL_PASSAGE)], "i long, text string").write.parquet(ev)

    out = str(tmp_path / "clean")
    metrics_path = str(tmp_path / "metrics.json")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_clean_corpus.py"),
            "--input", inp, "--id-col", "doc_id", "--text-col", "text",
            "--near-dup", "--eval-table", ev,
            "--min-quality", "0.0", "--max-dup-word-ratio", "0.5",
            "--langs", "en,es",
            "--output", out, "--metrics", metrics_path, "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.load(open(metrics_path))
    stages = {s["stage"]: s for s in m["stages"]}
    assert stages["input"]["rows"] == 8
    assert stages["exact_dedup"]["rows"] == 7          # doc 1 gone
    assert stages["near_dup_dedup"]["rows"] == 6        # doc 2 gone
    # token unit: planted doc 4 gone, char-near-miss doc 7 RETAINED
    assert stages["decontaminate"]["rows"] == 5
    assert "13-token-gram" in stages["decontaminate"]["note"]
    assert stages["quality_filter"]["rows"] == 4        # doc 5 gone (dup_word_ratio ~0.92)
    assert stages["lang_filter"]["rows"] == 4           # en/es all pass
    kept = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == [0, 3, 6, 7]
    assert m["format"] == "parquet"
    assert 0 < m["kept_frac"] < 1


@pytest.mark.spark
def test_pipeline_ingests_wet_archive(spark, tmp_path):
    """r5: --input-format wet runs the cleaning pipeline straight off a
    Common-Crawl-style extracted-text archive — exact dup removed,
    planted contamination removed, junk removed."""
    import gzip

    recs = [
        ("https://a/1", "the weather was cold this morning and the streets were quiet today"),
        ("https://a/2", "the weather was cold this morning and the streets were quiet today"),  # dup
        ("https://a/3", f"header words then {_EVAL_PASSAGE} and a trailing bit"),  # contaminated
        ("https://a/4", "zz zz zz zz zz zz zz zz zz zz zz zz"),  # junk
        ("https://a/5", "she said that they would arrive at the station before noon with the others"),
    ]
    body = b""
    for i, (url, text) in enumerate(recs):
        payload = text.encode()
        hdr = (
            "WARC/1.0\r\nWARC-Type: conversion\r\n"
            f"WARC-Record-ID: <urn:uuid:wet-{i}>\r\n"
            f"WARC-Target-URI: {url}\r\nWARC-Date: 2024-03-01T00:00:00Z\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        body += gzip.compress(hdr + payload + b"\r\n\r\n")
    wet = tmp_path / "seg.warc.wet.gz"
    wet.write_bytes(body)
    ev = str(tmp_path / "eval")
    spark.createDataFrame([(0, _EVAL_PASSAGE)], "i long, text string").write.parquet(ev)
    out = str(tmp_path / "clean")
    metrics_path = str(tmp_path / "metrics.json")
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "run_clean_corpus.py"),
            "--input", str(wet), "--input-format", "wet",
            "--eval-table", ev, "--min-quality", "0.0",
            "--max-dup-word-ratio", "0.5",
            "--output", out, "--metrics", metrics_path, "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.load(open(metrics_path))
    stages = {s["stage"]: s for s in m["stages"]}
    assert stages["input"]["rows"] == 5
    assert stages["exact_dedup"]["rows"] == 4
    assert stages["decontaminate"]["rows"] == 3
    assert stages["quality_filter"]["rows"] == 2
    kept = sorted(r["url"] for r in spark.read.parquet(out).select("url").collect())
    assert kept == ["https://a/1", "https://a/5"]


@pytest.mark.spark
def test_pipeline_stage_checkpoint_resume(spark, tmp_path):
    """r4: --stage-checkpoint-dir materializes each stage; a re-run
    resumes from the longest completed stage prefix (no recompute), and
    changing a pipeline argument invalidates the checkpoints."""
    rows = [
        (0, "the weather was cold this morning and the streets were quiet today"),
        (1, "the weather was cold this morning and the streets were quiet today"),
        (2, f"header words then {_EVAL_PASSAGE} and a trailing bit"),
        (3, "zz zz zz zz zz zz zz zz zz zz zz zz"),
        (4, "she said that they would arrive at the station before noon with the others"),
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    ev = str(tmp_path / "eval")
    spark.createDataFrame([(0, _EVAL_PASSAGE)], "i long, text string").write.parquet(ev)
    ckpt = str(tmp_path / "ckpt")

    def run(out_name, extra=()):
        out = str(tmp_path / out_name)
        metrics = str(tmp_path / f"{out_name}_metrics.json")
        r = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "scripts", "run_clean_corpus.py"),
                "--input", inp, "--id-col", "doc_id", "--text-col", "text",
                "--eval-table", ev, "--min-quality", "0.0",
                "--max-dup-word-ratio", "0.5",
                "--stage-checkpoint-dir", ckpt,
                "--output", out, "--metrics", metrics, "--cpus", "4",
                *extra,
            ],
            capture_output=True, text=True, timeout=600, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.load(open(metrics))

    m1 = run("clean1")
    assert all(
        os.path.exists(os.path.join(ckpt, s, "_SUCCESS"))
        for s in ("exact_dedup", "decontaminate", "quality_filter")
    )
    assert not any("resumed" in s["note"] for s in m1["stages"])

    # second run: every stage resumes, same per-stage row counts
    m2 = run("clean2")
    resumed = [s["stage"] for s in m2["stages"] if "resumed from checkpoint" in s["note"]]
    assert resumed == ["exact_dedup", "decontaminate", "quality_filter"]
    assert [s["rows"] for s in m2["stages"]] == [s["rows"] for s in m1["stages"]]
    a = sorted(r["doc_id"] for r in spark.read.parquet(str(tmp_path / "clean1")).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in spark.read.parquet(str(tmp_path / "clean2")).select("doc_id").collect())
    assert a == b == [0, 4]  # dup 1 gone, contaminated 2 gone, junk 3 gone

    # orphan-prefix rule: drop the FIRST stage's checkpoint -> everything recomputes
    os.remove(os.path.join(ckpt, "exact_dedup", "_SUCCESS"))
    m3 = run("clean3")
    assert not any("resumed" in s["note"] for s in m3["stages"])

    # changed argument -> signature mismatch -> no resume
    m4 = run("clean4", extra=("--decontaminate-n", "7"))
    assert not any("resumed" in s["note"] for s in m4["stages"])

    # ADVICE r4: the run signature fingerprints the INPUT DATA (listing +
    # sizes + mtimes), so rewriting the data at the same path must NOT
    # silently resume from stale checkpoints
    m5 = run("clean5", extra=("--decontaminate-n", "7"))
    assert any("resumed" in s["note"] for s in m5["stages"])  # warm: resumes
    spark.createDataFrame(
        [(0, _EVAL_PASSAGE), (9, "a brand new document changes the input fingerprint")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(inp)
    m6 = run("clean6", extra=("--decontaminate-n", "7"))
    assert not any("resumed" in s["note"] for s in m6["stages"])
    assert m6["stages"][0]["rows"] == 2


@pytest.mark.spark
def test_pipeline_ppl_filter_pii_redaction_cc_mode(spark, tmp_path):
    """r6: --max-ppl drops the noise doc, --redact-pii scrubs the text
    and records audit totals, --near-dup-mode cc runs the exact-CC
    closure path end-to-end."""
    normal = "the data pipeline runs the data pipeline daily for all teams"
    rows = [(f"https://ex.com/{i}", normal + f" extra{i}") for i in range(6)]
    rows.append(("https://ex.com/noise", "zq xv jk qp wm zx cv bn yt rw"))
    rows.append(("https://ex.com/pii", normal + " mail bob@corp.example.com now"))
    inp = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, text string").write.parquet(inp)
    out = str(tmp_path / "clean")
    metrics_path = str(tmp_path / "metrics.json")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_clean_corpus.py"),
            "--input", inp, "--id-col", "url", "--text-col", "text",
            "--near-dup", "--near-dup-mode", "cc", "--near-dup-threshold", "0.9",
            "--max-ppl", "100", "--redact-pii",
            "--min-quality", "0.0", "--max-dup-word-ratio", "1.0",
            "--output", out, "--metrics", metrics_path, "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.load(open(metrics_path))
    stages = {s["stage"]: s for s in m["stages"]}
    assert "(cc closure)" in stages["near_dup_dedup"]["note"]
    # the gibberish doc has far higher self-perplexity than the repeats
    assert stages["ppl_filter"]["removed"] >= 1
    assert m["pii"]["email"]["total_matches"] == 1
    got = {r["url"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert "https://ex.com/noise" not in got
    assert "<|EMAIL|>" in got["https://ex.com/pii"]
    assert "bob@corp.example.com" not in got["https://ex.com/pii"]


@pytest.mark.spark
def test_pipeline_remove_dup_spans_stage(spark, tmp_path):
    """r6: --remove-dup-spans cuts cross-doc shared passages in place."""
    boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR DAILY UPDATES NOW"
    rows = [
        (f"https://ex.com/{i}",
         f"unique article body number {i} with its own words " + boiler)
        for i in range(5)
    ]
    inp = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, text string").write.parquet(inp)
    out = str(tmp_path / "clean")
    metrics_path = str(tmp_path / "metrics.json")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_clean_corpus.py"),
            "--input", inp, "--id-col", "url", "--text-col", "text",
            "--remove-dup-spans", "30",
            "--min-quality", "0.0", "--max-dup-word-ratio", "1.0",
            "--output", out, "--metrics", metrics_path, "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = {r["url"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert len(got) == 5
    for i in range(5):
        t = got[f"https://ex.com/{i}"]
        assert boiler not in t
        assert f"unique article body number {i}" in t


@pytest.mark.spark
def test_pipeline_blocklist_and_stratified_sample(spark, tmp_path):
    """r6: --blocklist drops bad-term docs; --stratified-sample keeps a
    deterministic md5-threshold subset per lang."""
    import hashlib

    rows = []
    for i in range(40):
        lang = "en" if i % 2 else "de"
        text = f"clean document body number {i} with plain words here"
        if i in (3, 7):
            text += " badword inside"
        rows.append((f"https://ex.com/{i}", text, lang))
    inp = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, text string, lang string").write.parquet(inp)
    out = str(tmp_path / "clean")
    metrics_path = str(tmp_path / "metrics.json")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_clean_corpus.py"),
            "--input", inp, "--id-col", "url", "--text-col", "text",
            "--blocklist", "badword,otherbad",
            "--stratified-sample", "en=0.5", "--strata-col", "lang",
            "--sample-seed", "3",
            "--min-quality", "0.0", "--max-dup-word-ratio", "1.0",
            "--output", out, "--metrics", metrics_path, "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.load(open(metrics_path))
    stages = {s["stage"]: s for s in m["stages"]}
    assert stages["blocklist_filter"]["removed"] == 2
    kept = {(r["url"], r["lang"]) for r in spark.read.parquet(out).collect()}
    # all de rows (minus blocklisted) survive; en rows follow the
    # md5-threshold membership exactly
    from hlld_spark.operators.sampling import sample_threshold_hex

    thr = sample_threshold_hex(0.5)
    for url, text, lang in rows:
        if "badword" in text:
            assert (url, lang) not in kept
        elif lang == "de":
            assert (url, lang) in kept
        else:
            want = hashlib.md5(f"{url}:3".encode()).hexdigest()[:8] < thr
            assert ((url, lang) in kept) == want, url


@pytest.mark.spark
def test_pipeline_extract_main_text_stage(spark, tmp_path):
    """r6: --extract-main-text derives the text column from html via the
    boilerplate classifier before dedup/quality."""
    content = (
        "The quick brown fox jumps over the lazy dog and then it was "
        "seen that all of the animals in the forest were very happy "
        "about this and many of them said so."
    )
    nav = '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>'
    rows = [
        (f"https://ex.com/{i}", f"<html><body>{nav}<p>{content} page {i}</p>"
         f"<footer>Copyright <a href='/t'>Terms</a> <a href='/p'>Priv</a></footer></body></html>")
        for i in range(4)
    ]
    inp = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, html string").write.parquet(inp)
    out = str(tmp_path / "clean")
    metrics_path = str(tmp_path / "metrics.json")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_clean_corpus.py"),
            "--input", inp, "--id-col", "url", "--text-col", "text",
            "--extract-main-text",
            "--min-quality", "0.0", "--max-dup-word-ratio", "1.0",
            "--output", out, "--metrics", metrics_path, "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.load(open(metrics_path))
    assert m["stages"][1]["stage"] == "extract_main_text"
    got = {r["url"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert len(got) == 4
    for i in range(4):
        assert got[f"https://ex.com/{i}"] == f"{content} page {i}"


@pytest.mark.spark
def test_pipeline_canonicalize_urls_collapses_refetches(spark, tmp_path):
    """r6: --canonicalize-urls rewrites the id to canonical form before
    dedup, so the same page fetched with tracking params / fragments /
    default ports collapses to one row."""
    rows = [
        ("https://example.com/page", "identical page content body words here"),
        ("https://EXAMPLE.com:443/page?utm_source=tw", "identical page content body words here"),
        ("https://example.com/page#frag", "identical page content body words here"),
        ("https://example.com/other", "a different page entirely with other words"),
    ]
    inp = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, text string").write.parquet(inp)
    out = str(tmp_path / "clean")
    metrics_path = str(tmp_path / "metrics.json")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_clean_corpus.py"),
            "--input", inp, "--id-col", "url", "--text-col", "text",
            "--canonicalize-urls",
            "--min-quality", "0.0", "--max-dup-word-ratio", "1.0",
            "--output", out, "--metrics", metrics_path, "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.load(open(metrics_path))
    stages = {s["stage"]: s for s in m["stages"]}
    assert stages["canonicalize_urls"]["rows"] == 4
    assert stages["exact_dedup"]["rows"] == 2  # the three refetches collapse
    kept = {r["url"] for r in spark.read.parquet(out).select("url").collect()}
    assert kept == {"https://example.com/page", "https://example.com/other"}


def test_pipeline_fix_encoding_collapses_mojibake_refetch(spark, tmp_path):
    """r6: --fix-encoding inverts utf-8-as-cp1252 mojibake before dedup,
    so a corrupted refetch exact-matches its clean twin and the repaired
    text (not the corrupted bytes) reaches the output."""
    from hlld_spark.operators.encoding import mojibake_corrupt

    clean = "café crème – the “quoted” body words of the résumé page here"
    rows = [
        (0, clean),
        (1, mojibake_corrupt(clean, "cp1252", 1)),  # corrupted refetch
        (2, "a different page entirely with other plain words"),
    ]
    inp = str(tmp_path / "pages")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "clean")
    metrics_path = str(tmp_path / "metrics.json")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_clean_corpus.py"),
            "--input", inp, "--id-col", "doc_id", "--text-col", "text",
            "--fix-encoding",
            "--min-quality", "0.0", "--max-dup-word-ratio", "1.0",
            "--output", out, "--metrics", metrics_path, "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.load(open(metrics_path))
    stages = {s["stage"]: s for s in m["stages"]}
    assert stages["fix_encoding"]["rows"] == 3
    assert stages["exact_dedup"]["rows"] == 2  # mojibake twin collapses
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert got[0] == clean  # repaired/clean text survives byte-exact


def test_pipeline_normalize_and_paragraph_stages(spark, tmp_path):
    """r6: --normalize-unicode NFC makes a decomposed twin collapse in
    exact dedup; --dedup-lines then --dedup-paragraphs scrub within-doc
    repeats and cross-doc boilerplate from the survivors."""
    import unicodedata

    body = "café and the long body words of this page\nboilerplate footer line"
    rows = [
        (0, body),
        (1, unicodedata.normalize("NFD", body)),  # decomposed twin
        (2, "another page body here\nboilerplate footer line\nanother page body here"),
    ]
    inp = str(tmp_path / "pages")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "clean")
    metrics_path = str(tmp_path / "metrics.json")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_clean_corpus.py"),
            "--input", inp, "--id-col", "doc_id", "--text-col", "text",
            "--normalize-unicode", "NFC", "--dedup-lines", "--dedup-paragraphs",
            "--min-quality", "0.0", "--max-dup-word-ratio", "1.0",
            "--output", out, "--metrics", metrics_path, "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.load(open(metrics_path))
    stages = {s["stage"]: s for s in m["stages"]}
    assert stages["normalize_unicode"]["rows"] == 3
    assert stages["exact_dedup"]["rows"] == 2  # NFD twin collapsed
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    # doc 0 keeps the footer (least occurrence); doc 2 lost its
    # within-doc repeat (line dedup) AND the shared footer (paragraph dedup)
    assert got[0] == body
    assert got[2] == "another page body here"


@pytest.mark.spark
def test_pipeline_text_fixing_line_filter_megatron_export(spark, tmp_path):
    """--unescape-html + --filter-lines make an entity-escaped,
    junk-line-padded refetch collapse with its clean twin in exact
    dedup; a mostly-junk page dies on the doc-level escalation; the
    survivors ALSO export as Megatron .bin/.idx shards."""
    rows = [
        (0, "Fish &amp; chips are great\nHOME ABOUT CONTACT US\nand the meal was warm"),
        (1, "Fish & chips are great\nand the meal was warm"),
        (2, "a normal document that stays intact with plenty of ordinary words here"),
        (3, "MENU\n3 likes\nHome"),  # junk-only page
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "clean")
    mega = str(tmp_path / "mega")
    metrics_path = str(tmp_path / "metrics.json")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_clean_corpus.py"),
            "--input", inp, "--id-col", "doc_id", "--text-col", "text",
            "--unescape-html", "--filter-lines", "--max-line-removed-frac", "0.5",
            "--min-quality", "0.0", "--max-dup-word-ratio", "1.0",
            "--write-megatron", mega, "--megatron-shards", "2",
            "--output", out, "--metrics", metrics_path, "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.load(open(metrics_path))
    stages = {s["stage"]: s for s in m["stages"]}
    assert stages["unescape_html"]["rows"] == 4
    assert stages["filter_lines"]["rows"] == 3  # junk-only doc 3 dropped
    assert stages["exact_dedup"]["rows"] == 2   # 0 collapsed with 1
    kept = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert sorted(kept) == [0, 2]
    assert kept[0] == "Fish & chips are great\nand the meal was warm"

    assert m["megatron"]["docs"] == 2
    n_toks = sum(len(t.split()) for t in kept.values())
    assert m["megatron"]["tokens"] == n_toks
    from hlld_spark.sources.indexed_dataset import read_indexed_dataset

    back = read_indexed_dataset(spark, mega).collect()
    assert sum(r["n_tokens"] for r in back) == n_toks


@pytest.mark.spark
def test_pipeline_quality_model_and_dsir_stages(spark, tmp_path):
    """--quality-model drops classifier-flagged junk; --dsir-target
    then resamples k survivors toward the target distribution."""
    from hlld_spark.operators.quality import _synth_doc, write_quality_fixture

    qdir = str(tmp_path / "qf")
    write_quality_fixture(qdir, 200, 40)

    rows = [(i, _synth_doc(1000 + i, i < 6)) for i in range(10)]  # 6 good, 4 junk
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    tgt = str(tmp_path / "target")
    spark.createDataFrame(
        [(i, _synth_doc(5000 + i, True)) for i in range(8)], "doc_id long, text string"
    ).write.parquet(tgt)

    out = str(tmp_path / "clean")
    metrics_path = str(tmp_path / "metrics.json")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_clean_corpus.py"),
            "--input", inp, "--id-col", "doc_id", "--text-col", "text",
            "--min-quality", "0.0", "--max-dup-word-ratio", "1.0",
            "--quality-model", qdir, "--min-model-quality", "0.5",
            "--dsir-target", tgt, "--dsir-k", "3",
            "--output", out, "--metrics", metrics_path, "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.load(open(metrics_path))
    stages = {s["stage"]: s for s in m["stages"]}
    assert stages["quality_model_filter"]["rows"] == 6  # the 4 junk docs die
    assert stages["dsir_resample"]["rows"] == 3
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert len(kept) == 3 and all(i < 6 for i in kept)  # drawn from the good docs
