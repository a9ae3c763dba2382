"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "docs_per_sec": ...}

The flagship number is sketch-build throughput (docs/sec) over a
deterministic web-corpus parquet (generated once to a temp dir, scan
timed, generation not), mirroring the reference's bench.c 1M-key `set`
workload. Run scripts/scaling_bench.py for the N-vs-4N parallelism
evidence (BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WEB_ROWS = int(os.environ.get("BENCH_WEB_ROWS", "4000000"))


def main():
    from pyspark.sql import functions as F

    from hlld_spark.core.accumulator import HllSpec
    from hlld_spark.operators.sketch import build_sketches, distinct_count, with_estimate
    from hlld_spark.session import get_spark
    from hlld_spark.sources.webpages import generate_web_pages

    spark = get_spark(app_name="hlld-spark-bench", cpus=CPUS)
    timings: dict[str, float] = {}
    repeat_times: dict[str, list[float]] = {}
    extras: dict[str, float] = {}

    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    max_repeats = int(os.environ.get("BENCH_MAX_REPEATS", str(repeats + 5)))

    def loadavg() -> list[float]:
        try:
            with open("/proc/loadavg") as f:
                return [float(x) for x in f.read().split()[:3]]
        except OSError:
            return []

    load_start = loadavg()

    def timed(name, fn):
        # best-of-N: this host's virtualized cores are 2x-noisy under
        # load (DEVNOTES.md) — the minimum is the steady-state number.
        # Noise-evidence (VERDICT r4 #2): every repeat's wall time is
        # recorded in the artifact, and when the spread exceeds 2x the
        # query gets extra repeats (up to BENCH_MAX_REPEATS) so a
        # neighbor-load spike can't masquerade as a regression.
        times: list[float] = []
        result = None
        while len(times) < repeats or (
            len(times) < max_repeats and max(times) > 2.0 * min(times)
        ):
            t0 = time.time()
            result = fn()
            times.append(round(time.time() - t0, 3))
        timings[name] = min(times)
        repeat_times[name] = times
        return result

    # materialize the web corpus once (generation excluded from timings)
    web_dir = os.path.join(tempfile.gettempdir(), f"hlld_bench_web_{WEB_ROWS}")
    if not os.path.exists(os.path.join(web_dir, "_SUCCESS")):
        generate_web_pages(spark, WEB_ROWS, partitions=2 * CPUS).write.mode("overwrite").parquet(web_dir)
    web = spark.read.parquet(web_dir)

    # warm-up: spin up Python workers + page cache so timings are steady-state
    from hlld_spark.operators.sketch import build_sketches_parquet as _bsp

    build_sketches(web.limit(50000), ["lang"], "url", HllSpec(12)).collect()
    _bsp(spark, web_dir, [], "lang", HllSpec(10)).collect()
    web.count()
    from hlld_spark.operators.dedup import dedup_exact_keys as _dek

    _dek(web.limit(100000), "url", ["text"]).count()  # JIT the md5-agg pipeline

    # q0: flagship — worker-side parquet scan sketch build (the scale path)
    from hlld_spark.operators.sketch import build_sketches_parquet

    timed(
        "q0_hll_parquet_direct",
        lambda: build_sketches_parquet(spark, web_dir, ["lang"], "url", HllSpec(12)).collect(),
    )
    extras["docs_per_sec"] = round(WEB_ROWS / timings["q0_hll_parquet_direct"], 1)

    # q1: same query through the generic DataFrame path
    timed("q1_hll_urls_by_lang", lambda: distinct_count(web, ["lang"], "url", HllSpec(12)).collect())

    # q2: per-(lang, day) sketches — 140 groups, finest grain
    timed(
        "q2_hll_urls_by_lang_day",
        lambda: build_sketches(
            web.withColumn("day", F.to_date("warc_ts")), ["lang", "day"], "url", HllSpec(12)
        ).collect(),
    )

    # q3: global distinct over TPC-H-ish lineitem keys
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    timed(
        "q3_hll_global_orderkey",
        lambda: with_estimate(build_sketches(li, [], "l_orderkey", HllSpec(14))).collect(),
    )

    # q4: exact relational baseline for comparison (Catalyst path)
    timed(
        "q4_exact_distinct_urls_by_lang",
        lambda: web.groupBy("lang").agg(F.countDistinct("url")).collect(),
    )

    # q5: pricing summary (pure Catalyst agg)
    timed(
        "q5_pricing_summary",
        lambda: li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count("*"))
        .collect(),
    )

    # q6: exact dedup over the web corpus. Counting survivors needs ONE
    # partial-aggregated exchange of (16-byte md5, url) pairs — never a
    # payload shuffle and never the row rejoin (VERDICT r1 task 2: the
    # exchange carries only hash+id; same count as round 1's design).
    # dedup_exact (row-materializing semi-join variant) is plan-asserted
    # separately in tests/test_dedup_similarity_text.py.
    from hlld_spark.operators.dedup import dedup_exact_keys

    timed("q6_dedup_exact_urls", lambda: dedup_exact_keys(web, "url", ["text"]).count())

    # q7: quantile sketch over lineitem prices (t-digest)
    from hlld_spark.core.tdigest import TDigestSpec

    timed(
        "q7_tdigest_prices",
        lambda: with_estimate(build_sketches(li, ["l_returnflag"], "l_extendedprice", TDigestSpec())).collect(),
    )

    # q8: vectorized language-ID throughput (round-2 addition: the lang
    # operator is whole-batch byte-vectorized — this pins its docs/sec
    # in the bench record). Deterministic 1M-row sample keeps the bench
    # wall-time bounded; throughput is normalized by the sampled count.
    from hlld_spark.operators.text import with_lang_id

    sample = web.select("text").filter(F.pmod(F.xxhash64("text"), F.lit(4)) == 0)
    with_lang_id(sample.limit(20000), "text").groupBy("lang_id").count().collect()  # warm
    n_lang = [0]

    def q8():
        n_lang[0] = with_lang_id(sample, "text").groupBy("lang_id").agg(F.count("*").alias("n")).agg(
            F.sum("n")
        ).collect()[0][0]

    timed("q8_lang_id_web", q8)
    extras["lang_docs_per_sec"] = round(n_lang[0] / timings["q8_lang_id_web"], 1)

    # q9: exact heavy hitters over the Zipfian host column (round-2
    # addition: Misra-Gries candidates + broadcast recount, no row
    # shuffle of the 4M-row side). The host column is materialized ONCE
    # (VERDICT r2 #1): the operator's two scans read a 1-column parquet
    # instead of re-running regexp_extract over 4M urls per pass —
    # mirroring the real pipeline, where the derivation runs in the
    # ingest job, not in every downstream analytic.
    from hlld_spark.operators.frequent import heavy_hitters

    hosts_dir = os.path.join(tempfile.gettempdir(), f"hlld_bench_hosts_{WEB_ROWS}")
    if not os.path.exists(os.path.join(hosts_dir, "_SUCCESS")):
        web.select(F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host")).write.mode(
            "overwrite"
        ).parquet(hosts_dir)
    hosts = spark.read.parquet(hosts_dir)
    timed("q9_heavy_hitters_hosts", lambda: heavy_hitters(hosts, "host", phi=0.001).collect())

    # q10: near-dup verify throughput — the hashed n-gram Jaccard kernel
    # (now the DEFAULT verify path, VERDICT r2 #5) over ~200k text pairs.
    # Pairs are selected by a deterministic hash FILTER, not .limit():
    # limit(n) collapses the scan to one task (GlobalLimit), which would
    # measure the kernel single-threaded instead of the operator's real
    # partition-parallel shape.
    from hlld_spark.operators.dedup import ngram_jaccard_pairs

    vp = web.select(
        F.col("text").alias("ta"),
        F.concat(F.col("text"), F.lit(" trailing variant tokens")).alias("tb"),
    ).filter(F.pmod(F.xxhash64("ta"), F.lit(max(WEB_ROWS // 200000, 1))) == 0)
    n_pairs = vp.count()
    ngram_jaccard_pairs(vp.sample(0.02, seed=7), "ta", "tb", n=5).agg(F.sum("jaccard")).collect()  # warm
    timed(
        "q10_jaccard_verify_pairs",
        lambda: ngram_jaccard_pairs(vp, "ta", "tb", n=5).agg(F.sum("jaccard")).collect(),
    )
    extras["verify_pairs_per_sec"] = round(n_pairs / timings["q10_jaccard_verify_pairs"], 1)
    extras["verify_pairs_n"] = int(n_pairs)

    # q11: natural-text language ID (trigram-profile path) over the FULL
    # corpus via the worker-side parquet scan (r4, VERDICT r3 #6 —
    # lang_id_profiles_parquet rides the same splits as q12's
    # decontaminate_parquet, dodging the Arrow-IPC ceiling the r3
    # DataFrame-path bench paid). Renamed from q11_lang_profiles_web:
    # the input is now all WEB_ROWS docs, not the ~1M-doc q8 sample, so
    # seconds aren't comparable across rounds — profile_lang_docs_per_sec
    # is the comparable number.
    from hlld_spark.operators.lang_profiles import (
        lang_id_profiles_parquet,
        with_lang_id_profiles,
    )

    with_lang_id_profiles(sample.limit(20000), "text").groupBy("lang_id").count().collect()  # warm
    n_prof = [0]

    def q11():
        n_prof[0] = (
            lang_id_profiles_parquet(spark, web_dir, "text")
            .groupBy("lang_id")
            .agg(F.count("*").alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )

    timed("q11_lang_profiles_parquet", q11)
    extras["profile_lang_docs_per_sec"] = round(n_prof[0] / timings["q11_lang_profiles_parquet"], 1)

    # q12: benchmark decontamination of the FULL 4M-row corpus against a
    # ~2k-doc eval set (13-gram overlap, broadcast prefiltered-hash
    # probe, zero corpus exchange) — parquet-direct scale path (worker-
    # side pyarrow scan; measured 1.8x the DataFrame path on this
    # corpus, same flags, because the scan dominates and the DataFrame
    # path pays the shared-JVM Arrow-IPC ceiling)
    from hlld_spark.operators.decontaminate import decontaminate_parquet

    ev = web.filter(F.pmod(F.xxhash64("url"), F.lit(2048)) == 0).select("text")
    timed(
        "q12_decontaminate_web",
        lambda: decontaminate_parquet(spark, web_dir, ev, "url", "text", n=13, unit="char").count(),
    )
    extras["decon_docs_per_sec"] = round(WEB_ROWS / timings["q12_decontaminate_web"], 1)

    # q13: same decontamination in the DEFAULT token unit (r4 — the
    # published 13-token rule; adds a tokenize+prefix-scan pass per doc,
    # so it's benched separately from the r3-comparable char q12)
    timed(
        "q13_decontaminate_web_tokens",
        lambda: decontaminate_parquet(spark, web_dir, ev, "url", "text", n=13).count(),
    )
    extras["decon_token_docs_per_sec"] = round(WEB_ROWS / timings["q13_decontaminate_web_tokens"], 1)

    # q14: PII redaction throughput (r6) — pure-Catalyst regex scrub of
    # the full corpus (email+IPv4+phone patterns); forced by a length
    # sum so nothing collects. Measures codegen regex throughput — the
    # scan-dominated shape the operator ships with (no Exchange, no
    # Python; plan-asserted in tests/test_pii.py).
    from hlld_spark.operators.pii import redact_pii

    redact_pii(web.select("text").limit(20000), "text").agg(
        F.sum(F.length("text"))
    ).collect()  # warm
    timed(
        "q14_pii_redact_web",
        lambda: redact_pii(web.select("text"), "text")
        .agg(F.sum(F.length("text")))
        .collect(),
    )
    extras["pii_docs_per_sec"] = round(WEB_ROWS / timings["q14_pii_redact_web"], 1)

    # q15: sequence-packing offsets (r6) — hierarchical global prefix
    # sum over all docs (tokenize + bucket totals + two windows; the
    # only unpartitioned window runs over ~64k bucket aggregates).
    # xxhash64(url) provides the numeric id order; bucket_span 2^48
    # splits the int64 id space into ~65k buckets.
    from hlld_spark.operators.pack import pack_sequences

    pw = web.select(F.xxhash64("url").alias("doc_id"), "text")
    pack_sequences(pw.limit(20000), "doc_id", 2048, text_col="text").agg(
        F.max("last_chunk")
    ).collect()  # warm
    timed(
        "q15_pack_offsets_web",
        lambda: pack_sequences(
            pw, "doc_id", 2048, text_col="text", bucket_span=1 << 48
        )
        .agg(F.max("last_chunk"), F.sum("n_tokens"))
        .collect(),
    )
    extras["pack_docs_per_sec"] = round(WEB_ROWS / timings["q15_pack_offsets_web"], 1)

    # q16: corpus-wide paragraph dedup (r6) — the CCNet boilerplate
    # stage over a 500k-doc multi-paragraph slice (paragraphs derived
    # once by inserting a newline every 8 words — derivation excluded,
    # like q9's host column). Timing covers the full machinery: explode
    # → (id,pos,md5) scalar exchange → keeper groupBy → flag join →
    # id-keyed rebuild; ~3M paragraphs.
    from hlld_spark.operators.dedup import dedup_paragraphs

    paras_dir = os.path.join(tempfile.gettempdir(), f"hlld_bench_paras_{WEB_ROWS}")
    if not os.path.exists(os.path.join(paras_dir, "_SUCCESS")):
        web.filter(F.pmod(F.xxhash64("url"), F.lit(max(WEB_ROWS // 500000, 1))) == 0).select(
            "url",
            F.regexp_replace("text", r"((?:\S+\s+){8})", "$1\n").alias("text"),
        ).write.mode("overwrite").parquet(paras_dir)
    paras = spark.read.parquet(paras_dir)
    n_para_docs = paras.count()
    dedup_paragraphs(paras.limit(20000), "url", "text").agg(
        F.sum(F.length("text"))
    ).collect()  # warm
    timed(
        "q16_paragraph_dedup_web",
        lambda: dedup_paragraphs(paras, "url", "text")
        .agg(F.sum(F.length("text")))
        .collect(),
    )
    extras["para_dedup_docs_per_sec"] = round(n_para_docs / timings["q16_paragraph_dedup_web"], 1)
    extras["para_dedup_docs_n"] = int(n_para_docs)

    # q17: front-of-pipeline text fixers (r6) — mojibake repair + NFC
    # normalization over the full corpus. The corpus is clean ASCII, so
    # this pins the FAST-PATH cost every real crawl pays on ~99% of its
    # rows: the C-speed regex prefilter / is_normalized check plus the
    # Arrow round trip.
    from hlld_spark.operators.encoding import with_encoding_repair
    from hlld_spark.operators.normalize import with_unicode_normalization

    def _fixers(d):
        return with_unicode_normalization(
            with_encoding_repair(d, "text", out_col="t2"), "t2", "NFC", "t3"
        )

    _fixers(web.select("text").limit(20000)).agg(F.sum(F.length("t3"))).collect()  # warm
    timed(
        "q17_encoding_nfc_web",
        lambda: _fixers(web.select("text")).agg(F.sum(F.length("t3"))).collect(),
    )
    extras["normalize_docs_per_sec"] = round(WEB_ROWS / timings["q17_encoding_nfc_web"], 1)

    spark.stop()
    total = round(sum(timings.values()), 3)
    # per-query deltas vs the previous round's recorded bench (VERDICT
    # r1 task 10): negative = faster this round
    deltas = {}
    prev_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "bench_r5_local.json"
    )
    try:
        with open(prev_path) as f:
            prev = json.load(f)["queries"]
        deltas = {q: round(t - prev[q], 3) for q, t in timings.items() if q in prev}
    except Exception:
        pass
    headline = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "loadavg_start": load_start,
        "loadavg_end": loadavg(),
        "sf": SF_DIR,
        "cpus": CPUS,
        "web_rows": WEB_ROWS,
        **extras,
    }
    # Bulky noise-evidence detail (per-repeat arrays, deltas) goes to a
    # sidecar (VERDICT r5 #1): the driver captures only a stdout TAIL
    # window, and round 5's single fat line got truncated mid-string
    # (BENCH_r05.json parsed:null). The binding artifact must be the
    # LAST line and compact; the evidence lives in BENCH/.
    sidecar_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(sidecar_dir, exist_ok=True)
    sidecar = os.path.join(sidecar_dir, "bench_last_run_detail.json")
    try:
        with open(sidecar, "w") as f:
            json.dump(
                {**headline, "repeats": repeat_times, "deltas_vs_r05": deltas}, f, indent=1
            )
        sys.stderr.write(f"[bench] repeats/deltas detail -> {sidecar}\n")
    except OSError as e:
        sys.stderr.write(f"[bench] could not write sidecar: {e}\n")
    sys.stdout.flush()
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
