"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query; ``queries()`` — one callable per
implemented operator (SURVEY.md §2); ``oracle_sql()`` — DuckDB-exact
twins. Sketch *estimates* are not SQL-expressible, so sketch queries are
gated two ways: (a) their row-count/grouping plumbing has an exact
oracle, and (b) a bound-check query returns the (empty) set of groups
whose estimate violates the HLL error bound, with an empty oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ensure_shipped(spark: SparkSession) -> None:
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from hlld_spark.session import ship_package

    try:
        ship_package(spark)
    except Exception:
        pass  # already shipped or running inside our own session builder


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: approximate distinct doc_ids per lang over documents
    (the reference's per-set cardinality query, distributed)."""
    _ensure_shipped(spark)
    from hlld_spark.core.accumulator import HllSpec
    from hlld_spark.operators.sketch import distinct_count

    docs = _load(spark, "/root/testdata/sf0.001", "documents")
    return distinct_count(docs, ["lang"], "doc_id", HllSpec(precision=14)).orderBy("lang")


# ---------------------------------------------------------------------------
# queries: exact relational plumbing (full oracle) + sketch ops (rows-only
# or bound-check oracles)
# ---------------------------------------------------------------------------


def _q_exact_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"), F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


def _q_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group HLL distinct-users — value-exact oracle via the bound
    pattern folded into the query (VERDICT r1 task 1d): every group must
    satisfy |estimate − exact|/exact ≤ 3σ (hll_in_bound TRUE for all),
    and n_rows is the sketch pipeline's exact row accounting."""
    _ensure_shipped(spark)
    from hlld_spark.core import hll as hll_core
    from hlld_spark.core.accumulator import HllSpec
    from hlld_spark.operators.sketch import distinct_count

    p = 14
    ev = _load(spark, sf_dir, "events")
    est = distinct_count(ev, ["event_type"], "user_id", HllSpec(precision=p))
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("__exact"))
    bound = 3 * hll_core.error_for_precision(p)
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            (F.abs(F.col("estimate") - F.col("__exact")) / F.col("__exact") <= bound).alias("hll_in_bound"),
            "n_rows",
        )
        .orderBy("event_type")
    )


def _q_hll_rowcount_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch pipeline's group/row accounting, which IS exact."""
    _ensure_shipped(spark)
    from hlld_spark.operators.sketch import build_sketches

    ev = _load(spark, sf_dir, "events")
    return build_sketches(ev, ["event_type"], "user_id").select("event_type", "n_rows").orderBy("event_type")


def _q_hll_bound_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups whose HLL estimate misses exact by > 3·(1.04/sqrt(2^p)).
    Must be empty — checked exactly by an empty oracle."""
    _ensure_shipped(spark)
    from hlld_spark.core import hll as hll_core
    from hlld_spark.core.accumulator import HllSpec
    from hlld_spark.operators.sketch import distinct_count

    p = 14
    ev = _load(spark, sf_dir, "events")
    est = distinct_count(ev, ["event_type"], "user_id", HllSpec(precision=p))
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact"))
    bound = 3 * hll_core.error_for_precision(p)
    return (
        est.join(exact, "event_type")
        .filter(F.abs(F.col("estimate") - F.col("exact")) / F.col("exact") > bound)
        .select("event_type")
    )


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _load(spark, sf_dir, "orders")
    c = _load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count("*").alias("n_orders"))
        .orderBy("c_mktsegment")
    )


def _q_prefix_list_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `list <prefix>` command shape: prefix filter + name sort."""
    p = _load(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").startswith("s"))
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_name", "p_partkey")
    )


def _q_exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: keeper = min doc_id per md5(text)."""
    d = _load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
        .orderBy("keeper_id")
    )


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.length("text").alias("n_chars_text"),
    ).orderBy("doc_id")


def _q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy("day", "event_type")
    )


def _q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-table join: orders ⋈ customer (broadcast) ⋈ nation (broadcast)."""
    o = _load(spark, sf_dir, "orders")
    c = _load(spark, sf_dir, "customer")
    n = _load(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count("*").alias("n_orders"))
        .orderBy("n_name")
    )


def _q_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: each customer's single highest-value order."""
    from pyspark.sql import Window

    o = _load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("top_price"))
        .orderBy("o_custkey")
    )


def _q_salted_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit skew handling: two-stage salted exact distinct."""
    _ensure_shipped(spark)
    from hlld_spark.operators.skew import salted_exact_distinct

    ev = _load(spark, sf_dir, "events")
    return salted_exact_distinct(ev, ["event_type"], "user_id", salt_buckets=16).orderBy("event_type")


def _q_cms_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS per-group total count — exact by construction (row-0 sum)."""
    _ensure_shipped(spark)
    from hlld_spark.core.cms import CmsSpec
    from hlld_spark.operators.sketch import build_sketches, sketch_estimate

    ev = _load(spark, sf_dir, "events")
    sk = build_sketches(ev, ["event_type"], "user_id", CmsSpec(width=1024, depth=4))
    return (
        sk.select("event_type", sketch_estimate(F.col("sketch")).cast("long").alias("cms_total"))
        .orderBy("event_type")
    )


def _q_cms_undercount_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS point estimates must never undercount: violations (empty)."""
    _ensure_shipped(spark)
    import pandas as pd

    from hlld_spark.core.accumulator import deserialize_any
    from hlld_spark.core.cms import CmsSpec
    from hlld_spark.operators.sketch import build_sketches

    ev = _load(spark, sf_dir, "events")
    sk = build_sketches(ev, [], "event_type", CmsSpec(width=2048, depth=5)).collect()
    acc, state, spec = deserialize_any(bytes(sk[0]["sketch"]))
    exact = ev.groupBy("event_type").count().collect()
    types = [r["event_type"] for r in exact]
    est = acc.point_estimate(state, types, spec)
    bad = [t for t, e, x in zip(types, est, (r["count"] for r in exact)) if int(e) < x]
    return spark.createDataFrame([(t,) for t in bad], "event_type string")


def _q_bloom_membership_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filters have no false negatives: inserted user_ids that fail
    the membership probe (must be empty). The probe itself is
    DISTRIBUTED (VERDICT r1 task 8): the merged filter (a few KB)
    broadcasts as a closure constant and every partition probes its own
    ids via mapInPandas — no driver-side id collection."""
    _ensure_shipped(spark)
    import pandas as pd

    from hlld_spark.core.accumulator import deserialize_any
    from hlld_spark.core.bloom import BloomSpec
    from hlld_spark.operators.sketch import build_sketches

    ev = _load(spark, sf_dir, "events").withColumn("uid", F.col("user_id").cast("string"))
    sk = build_sketches(ev, [], "uid", BloomSpec.for_capacity(20000, 0.01)).collect()
    blob = bytes(sk[0]["sketch"])

    def probe(batches):
        import numpy as np

        acc, state, spec = deserialize_any(blob)
        for pdf in batches:
            ok = np.asarray(acc.contains(state, pdf["uid"].tolist(), spec), dtype=bool)
            if not ok.all():
                yield pdf[~ok]

    return ev.select("uid").distinct().mapInPandas(probe, schema="uid string")


def _q_quantile_bound_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest and KLL medians of events.value within 1% rank error of
    exact — violations (empty)."""
    _ensure_shipped(spark)
    from hlld_spark.core.accumulator import deserialize_any
    from hlld_spark.core.kll import KllSpec
    from hlld_spark.core.tdigest import TDigestSpec
    from hlld_spark.operators.sketch import build_sketches

    ev = _load(spark, sf_dir, "events")
    bad = []
    for name, spec in (("tdigest", TDigestSpec(compression=200)), ("kll", KllSpec(k=256))):
        sk = build_sketches(ev, [], "value", spec).collect()
        acc, state, sp = deserialize_any(bytes(sk[0]["sketch"]))
        for q in (0.1, 0.5, 0.9):
            est = acc.quantile(state, q, sp)
            # rank of the estimate must be within 1% of q
            rank_row = ev.select(
                (F.sum((F.col("value") <= est).cast("long")) / F.count("*")).alias("r")
            ).first()
            if abs(rank_row["r"] - q) > 0.01:
                bad.append((name, float(q)))
    return spark.createDataFrame(bad, "sketch string, q double")


def _q_dedup_exact_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup operator output: surviving doc_ids (min per content group)."""
    _ensure_shipped(spark)
    from hlld_spark.operators.dedup import dedup_exact

    d = _load(spark, sf_dir, "documents")
    return dedup_exact(d, "doc_id", ["text"]).select("doc_id", "lang").orderBy("doc_id")


def _q_minhash_recall_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH recall gate with an exact (empty) oracle: every
    document gets a deterministic near-copy (short suffix ⇒ true Jaccard
    ≥ ~0.85 even for the shortest 48-char docs); the violation set is
    the source docs whose near-copy did NOT land in their cluster after
    LSH + pairwise verify + pointer-jump closure. Empty ⇔ 100% recall on
    the known near-dup pairs (VERDICT r1 task 1b)."""
    _ensure_shipped(spark)
    from hlld_spark.operators.dedup import minhash_lsh_dedup

    d = _load(spark, sf_dir, "documents").select("doc_id", "text")
    pert = d.select((F.col("doc_id") + 100000).alias("doc_id"), F.concat("text", F.lit(" zz")).alias("text"))
    corpus = d.unionAll(pert)
    out = minhash_lsh_dedup(
        corpus, "doc_id", "text", num_perm=128, bands=32, threshold=0.7, closure_rounds=3
    ).cache()
    pairs = out.filter(F.col("id") >= 100000).select(
        (F.col("id") - 100000).alias("doc_id"), F.col("keeper_id").alias("k_pert")
    )
    srcs = out.filter(F.col("id") < 100000).select(
        F.col("id").alias("doc_id"), F.col("keeper_id").alias("k_src")
    )
    return (
        pairs.join(srcs, "doc_id")
        .filter(F.col("k_pert") != F.col("k_src"))
        .select("doc_id")
        .orderBy("doc_id")
    )


def _q_minhash_token_recall_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-unit MinHash-LSH recall gate (r5 — the cleaning pipeline's
    near-dup default is now token shingles): every document gets a
    near-copy with ONE appended token. At the fixture minimum of 10
    whitespace tokens, true 4-token-gram Jaccard is (10−3)/(10−1) ≈
    0.78, so with 64 bands of 2 rows a pair misses LSH with
    probability (1−J²)^64 < 1e-20 and the 0.6 verify threshold sits
    ~5σ below the 128-perm estimate — the violation set is exactly
    empty, like the char-unit gate above."""
    _ensure_shipped(spark)
    from hlld_spark.operators.dedup import minhash_lsh_dedup

    d = _load(spark, sf_dir, "documents").select("doc_id", "text")
    pert = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"), F.concat("text", F.lit(" zz")).alias("text")
    )
    corpus = d.unionAll(pert)
    out = minhash_lsh_dedup(
        corpus, "doc_id", "text", num_perm=128, bands=64, shingle_k=4,
        threshold=0.6, closure_rounds=3, shingle_unit="token",
    ).cache()
    pairs = out.filter(F.col("id") >= 100000).select(
        (F.col("id") - 100000).alias("doc_id"), F.col("keeper_id").alias("k_pert")
    )
    srcs = out.filter(F.col("id") < 100000).select(
        F.col("id").alias("doc_id"), F.col("keeper_id").alias("k_src")
    )
    return (
        pairs.join(srcs, "doc_id")
        .filter(F.col("k_pert") != F.col("k_src"))
        .select("doc_id")
        .orderBy("doc_id")
    )


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 around vec_id=0's embedding; ids only
    (cosine float formatting differs engine-to-engine)."""
    _ensure_shipped(spark)
    from hlld_spark.operators.similarity import cosine_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    top = cosine_topk(emb, "vec_id", "embedding", q, k=10)
    return top.select("vec_id").orderBy("vec_id")


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_shipped(spark)
    from hlld_spark.operators.text import with_token_counts

    d = _load(spark, sf_dir, "documents")
    return (
        with_token_counts(d, "text")
        .select(
            "doc_id",
            "whitespace_tokens",
            F.length("text").alias("n_chars_text"),
            (F.length("text") - F.length(F.regexp_replace(F.col("text"), r"[^\w\s]", ""))).alias("punct_chars"),
        )
        .orderBy("doc_id")
    )


def _lang_corpus(spark: SparkSession, n_per_lang: int = 50, seed: int = 11) -> DataFrame:
    """Deterministic labeled multilingual corpus covering all 10
    supported languages (marker-profile langs from their own function
    words, ru/ja/zh from script characters). The documents fixture's
    `lang` column labels English-like synthetic text, so it cannot
    ground-truth a language identifier; this corpus can."""
    import numpy as np

    from hlld_spark.operators.text import _LANG_MARKERS

    rng = np.random.RandomState(seed)
    script_words = {
        "ru": ["собака", "кошка", "бегут", "полю", "возле", "дома"],
        "ja": ["いぬ", "ねこ", "はしる", "そら", "やま", "かわ"],
        "zh": ["狗", "猫", "奔跑", "田野", "山水", "句子"],
    }
    rows = []
    doc_id = 0
    for lang in list(_LANG_MARKERS):
        words = (
            [m.strip() for m in _LANG_MARKERS[lang]] if _LANG_MARKERS[lang] else script_words[lang]
        )
        for _ in range(n_per_lang):
            k = 8 + int(rng.randint(24))
            toks = [words[int(rng.randint(len(words)))] for _ in range(k)]
            rows.append((doc_id, lang, " ".join(toks)))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _q_lang_id_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID exactness gate with an exact (empty) oracle: docs of
    the labeled corpus where lang_id disagrees with the ground-truth
    label (VERDICT r1 task 1c). Empty ⇔ the identifier nails all 10
    languages on their characteristic text."""
    _ensure_shipped(spark)
    from hlld_spark.operators.text import with_lang_id

    d = _lang_corpus(spark)
    return (
        with_lang_id(d, "text")
        .filter(F.col("lang_id") != F.col("lang"))
        .select("doc_id", "lang", "lang_id")
        .orderBy("doc_id")
    )


def _q_lang_id_natural_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Natural-text language-ID gate (VERDICT r2 #4), exact empty oracle:
    profile-based lang-id (character-trigram log-likelihood over embedded
    function-word profiles — `operators/lang_profiles.py`) must label
    every sentence of the held-out natural corpus (open-class vocabulary
    the profiles never saw; 10 languages incl. script-only zh/ja)
    correctly. The marker-heuristic gate (`lang_id_disagreement`) stays
    as the synthetic fast-path check."""
    _ensure_shipped(spark)
    from hlld_spark.operators.lang_profiles import EVAL_SENTENCES, with_lang_id_profiles

    rows = []
    doc_id = 0
    for lang in EVAL_SENTENCES:
        for s in EVAL_SENTENCES[lang]:
            rows.append((doc_id, lang, s))
            doc_id += 1
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    return (
        with_lang_id_profiles(d, "text")
        .filter(F.col("lang_id") != F.col("lang"))
        .select("doc_id", "lang", "lang_id")
        .orderBy("doc_id")
    )


def _q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals with a FULL exact oracle:
    pure-Catalyst distinct-token counting (array_distinct on the split —
    no explode, no shuffle) vs DuckDB's list_distinct on the same
    regex split. dup_line_ratio omitted from the gate (fixture docs are
    single-line: constant 0)."""
    _ensure_shipped(spark)
    from hlld_spark.operators.text import with_repetition_signals

    d = _load(spark, sf_dir, "documents")
    return (
        with_repetition_signals(d, "text")
        .select("doc_id", "n_words", "n_distinct_words", "dup_word_ratio")
        .orderBy("doc_id")
    )


def _q_decontamination_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (character unit) with a FULL exact
    oracle: every 23rd document plays the held-out benchmark; the
    operator flags corpus docs sharing >=1 character 13-gram with it and
    counts matched positions. Spark side probes a broadcast sorted-hash
    table inside one mapInPandas (no corpus shuffle, no gram rows
    materialized — operators/decontaminate.py); the oracle recomputes
    the same overlap with string-equality joins in DuckDB."""
    _ensure_shipped(spark)
    from hlld_spark.operators.decontaminate import decontaminate

    docs = _load(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 23 == 0)
    return (
        decontaminate(docs, ev, "doc_id", "text", n=13, unit="char")
        .select("doc_id", "n_matched_grams")
        .orderBy("doc_id")
    )


def _q_decontamination_flagged_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination in the DEFAULT token unit — the
    published GPT-3-appendix / Llama 13-TOKEN-gram rule (VERDICT r3 #1)
    — with a FULL exact occurrence-count oracle: the DuckDB side
    materializes every 13-token window (regexp split + list slicing)
    and string-joins it against the eval windows."""
    _ensure_shipped(spark)
    from hlld_spark.operators.decontaminate import decontaminate

    docs = _load(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 23 == 0)
    return (
        decontaminate(docs, ev, "doc_id", "text", n=13, unit="token")
        .select("doc_id", "n_matched_grams")
        .orderBy("doc_id")
    )


def _q_clean_corpus_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning pipeline's flagship composition, driver-gated (r5,
    VERDICT r4 #7): exact dedup (min-id keeper per content group) ∘
    token-unit decontamination (the published 13-token rule, eval =
    every 23rd document) → surviving (doc_id, lang). Composes the SAME
    operators `scripts/run_clean_corpus.py` chains (stages 1 and 3); the
    DuckDB oracle is the min-id-per-text anti-join composed with the
    token-window CTE of `decontamination_flagged_tokens`. Near-dup/
    quality/lang stages have their own gates (minhash_*_recall,
    repetition_signals, lang_id_*)."""
    _ensure_shipped(spark)
    from hlld_spark.operators.decontaminate import decontaminate
    from hlld_spark.operators.dedup import dedup_exact

    docs = _load(spark, sf_dir, "documents")
    kept = dedup_exact(docs, "doc_id", ["text"])
    ev = docs.filter(F.col("doc_id") % 23 == 0)
    flagged = decontaminate(kept, ev, "doc_id", "text", n=13, unit="token")
    return (
        kept.join(flagged.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


_ASSETS_FIXTURE = "/tmp/hlld_spark_fixtures/assets_200.parquet"
_REAL_ASSETS_FIXTURE = "/tmp/hlld_spark_fixtures/real_assets_v6_200.parquet"
_ANIM_ASSETS_FIXTURE = "/tmp/hlld_spark_fixtures/anim_assets_v1_160.parquet"
_WARC_FIXTURE_DIR = "/tmp/hlld_spark_fixtures/warc_240"
_URLS_FIXTURE = "/tmp/hlld_spark_fixtures/urls_400.parquet"
_PHASH_FIXTURE = "/tmp/hlld_spark_fixtures/phash_120.parquet"
_MOJIBAKE_FIXTURE = "/tmp/hlld_spark_fixtures/mojibake_400.parquet"
_PARAS_FIXTURE = "/tmp/hlld_spark_fixtures/paragraphs_300.parquet"
_ENTITIES_FIXTURE = "/tmp/hlld_spark_fixtures/entities_240.parquet"
_WEBLINES_FIXTURE = "/tmp/hlld_spark_fixtures/weblines_300.parquet"
_UNICODE_FIXTURE = "/tmp/hlld_spark_fixtures/unicode_300.parquet"
_BOILERPLATE_FIXTURE_DIR = "/tmp/hlld_spark_fixtures/boilerplate_200"


def _q_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication signal (r6, the Lee et al. substring
    dedup family relationally): per document, the count of character
    positions whose 25-char substring occurs in ≥2 distinct docs. The
    Spark side hashes every position's span-gram (one gram-scale
    exchange, partitioning reused by both aggs and the join); the
    DuckDB oracle materializes the literal substrings — so a kernel
    off-by-one, boundary leak or sentinel slip hash-mismatches."""
    _ensure_shipped(spark)
    from hlld_spark.operators.dedup import duplicated_span_counts

    docs = _load(spark, sf_dir, "documents")
    return duplicated_span_counts(docs, "doc_id", "text", span=25).orderBy("doc_id")


def _q_events_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join gate (r6): every event matched to the same user's
    latest order ON OR BEFORE the event date. Spark side is the
    union-window formulation of ``operators/temporal.py`` (ONE keyed
    exchange, no join node — plan-asserted in pytest); the DuckDB
    oracle uses its NATIVE ``ASOF LEFT JOIN`` over the identically
    tie-collapsed right side. 10k rows, NULLs included — ordering,
    equal-date inclusion and tie handling all hash-checked."""
    _ensure_shipped(spark)
    from hlld_spark.operators.temporal import asof_join

    events = _load(spark, sf_dir, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("event_date")
    )
    orders = _load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("order_date"),
        "o_orderkey",
        "o_totalprice",
    )
    out = asof_join(
        events,
        orders,
        on="user_id",
        left_ts="event_date",
        right_ts="order_date",
        right_cols=["o_orderkey", "o_totalprice"],
        tie_col="o_orderkey",
    )
    return out.select(
        "event_id", "user_id", "event_date", "o_orderkey", "o_totalprice"
    ).orderBy("event_id")


def _q_bpe_roundtrip_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer gate (r6), empty-exact: train 300 merges on the
    documents table (one distributed word-count pass + driver-side
    merge learning — operators/bpe.py), encode EVERY document
    distributed, decode with the pure-Catalyst inverse, and emit every
    doc whose decode differs from its normalized token stream (plus
    docs whose token list leaks a malformed ``</w>`` marker). A merge
    bug, rank-order slip in the encoder, or memoization bug produces
    rows."""
    _ensure_shipped(spark)
    from hlld_spark.operators.bpe import END, bpe_decode_col, bpe_encode, bpe_train
    from hlld_spark.operators.ranking import tokens_col

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    model = bpe_train(docs, "text", n_merges=300)
    enc = bpe_encode(docs, "text", model)
    norm = F.array_join(tokens_col("text"), " ")
    bad_marker = F.exists(
        "bpe_tokens",
        lambda t: t.contains(END) & ~t.endswith(END),
    )
    return (
        enc.withColumn("decoded", bpe_decode_col(F.col("bpe_tokens")))
        .where((F.col("decoded") != norm) | bad_marker)
        .select("doc_id")
        .orderBy("doc_id")
    )


def _q_kmeans_centroid_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means fixpoint gate (r6), empty-exact: fit FULL
    Lloyd (k=8, deterministic bottom-k-by-hash init) on the embeddings
    table, assign every vector, and recompute each cluster's
    per-dimension mean through a PURE-CATALYST posexplode/groupBy path
    — a completely different aggregation machinery than the fit's
    mapInPandas partials. Emit (cluster, dim) wherever the fitted
    centroid disagrees with the recomputed mean beyond 1e-5, plus a
    sentinel if Lloyd failed to converge. A partial-merge bug, an
    empty-cluster slip, or assignment drift produces rows."""
    _ensure_shipped(spark)
    from hlld_spark.operators.embeddings import kmeans_assign, kmeans_fit

    emb = _load(spark, sf_dir, "embeddings")
    model = kmeans_fit(emb, "embedding", k=8)
    bad: list[tuple[int, int, str]] = []
    if not model["converged"]:
        bad.append((-1, -1, "not_converged"))
    assigned = kmeans_assign(emb, model, "embedding")
    means = (
        assigned.select("cluster", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("cluster", "dim")
        .agg(F.avg("val").alias("m"))
        .collect()
    )
    for r in means:
        want = model["centroids"][r["cluster"], r["dim"]]
        if abs(want - r["m"]) > 1e-5:
            bad.append((int(r["cluster"]), int(r["dim"]), "centroid_mean_mismatch"))
    return spark.createDataFrame(
        bad, "cluster long, dim long, reason string"
    ).orderBy("cluster", "dim")


def _q_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup gate (r6): the fixture stores
    real PNG/JPEG payloads (incl. planted re-encoded near-dups and two
    corrupt rows) plus a ground-truth pHash computed by an INDEPENDENT
    spec-literal double-loop reference — for JPEG on the encoder-side
    reconstruction, the exact pixels the decoder must produce. The
    engine re-decodes every payload, hashes with the vectorized kernel
    (operators/imagehash.py), and finds hamming≤3 pairs through the
    SimHash pigeonhole block join; keeper = smallest matching id
    (pigeonhole guarantees every ≤3 pair is found at blocks=4). The
    DuckDB oracle derives the same keeper mapping from the TRUTH
    hashes with bit_count(xor(...)) — a wrong decode, hash bit, block
    split, or verify path hash-mismatches. Per-image bit margin >1e-6
    is asserted at generation so float order can't flip a bit."""
    _ensure_shipped(spark)
    from hlld_spark.operators.imagehash import phash_dedup, write_phash_fixture

    write_phash_fixture(_PHASH_FIXTURE, 120)
    imgs = spark.read.parquet(_PHASH_FIXTURE).select("img_id", "payload")
    return (
        phash_dedup(imgs, "img_id", "payload", hamming_threshold=3, blocks=4)
        .select(F.col("id").alias("img_id"), "keeper_id")
        .orderBy("img_id")
    )


def _q_encoding_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-repair (mojibake) gate: the fixture stores pristine
    unicode sentences alongside variants corrupted by the FORWARD
    transform (utf-8 bytes decoded as cp1252, doubly so, or latin-1 —
    an independent function, never the repair code) plus the expected
    repair round count. The engine inverts the damage with sloppy-
    cp1252 re-encode + strict utf-8 decode (operators/encoding.py);
    the oracle simply reads the stored pristine truth — so the gate is
    FULL exact string equality on every repaired character, and clean
    rows (ascii and genuine non-latin unicode) must pass through
    untouched with rounds=0."""
    _ensure_shipped(spark)
    from hlld_spark.operators.encoding import (
        with_encoding_repair,
        write_mojibake_fixture,
    )

    write_mojibake_fixture(_MOJIBAKE_FIXTURE, 400)
    docs = spark.read.parquet(_MOJIBAKE_FIXTURE).select("doc_id", "text")
    return (
        with_encoding_repair(docs)
        .select(
            "doc_id",
            F.col("text_fixed").alias("fixed"),
            F.col("mojibake_rounds").cast("long").alias("rounds"),
        )
        .orderBy("doc_id")
    )


def _q_html_unescaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML-entity decode gate: the fixture stores pristine sentences
    plus variants escaped by the FORWARD transform (html.escape /
    decimal / hex numeric forms — never the decode code), with planted
    fixpoint rows (bare '&', unknown '&fake;'). The engine decodes
    with the prefiltered html.unescape kernel; the oracle reads the
    stored pristine truth — FULL string equality per row."""
    _ensure_shipped(spark)
    from hlld_spark.operators.encoding import (
        with_html_unescape,
        write_entities_fixture,
    )

    write_entities_fixture(_ENTITIES_FIXTURE, 240)
    docs = spark.read.parquet(_ENTITIES_FIXTURE).select("doc_id", "text")
    return (
        with_html_unescape(docs, "text")
        .select("doc_id", "text")
        .orderBy("doc_id")
    )


def _q_line_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb line-wise filtering gate: caps-nav / counter /
    digit-run / short-crumb lines drop, sentences and empty formatting
    lines survive, and the removed-character fraction is reported. The
    oracle replays every rule in independent DuckDB SQL (list_filter +
    the same ASCII-class regex ratios — int-over-int IEEE divisions,
    so each comparison lands identically in both engines)."""
    _ensure_shipped(spark)
    from hlld_spark.operators.text import (
        filter_quality_lines,
        write_weblines_fixture,
    )

    write_weblines_fixture(_WEBLINES_FIXTURE, 300)
    docs = spark.read.parquet(_WEBLINES_FIXTURE)
    return (
        filter_quality_lines(docs, "text")
        .select("doc_id", "text", "removed_char_frac")
        .orderBy("doc_id")
    )


def _q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule gate (Rae et al. 2021 §A.1.1 — the filter
    Dolma/RefinedWeb/FineWeb inherit): all 8 integer signals + the 7
    per-rule flags + the combined pass over `documents`. Every rule is
    INTEGER arithmetic (mean word length as 3·n ≤ chars ≤ 10·n etc.),
    so DuckDB replays each comparison exactly. The synthetic corpus
    carries at most one stopword per doc, so every third doc gets a
    deterministic stopword tail appended ON BOTH SIDES — making the
    combined pass flag genuinely vary (~110 of 500 pass at sf0.01)."""
    _ensure_shipped(spark)
    from hlld_spark.operators.text import with_gopher_signals

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" that would have come with it")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    sig = with_gopher_signals(docs)
    rule_cols = [
        "r_word_count",
        "r_mean_word_len",
        "r_symbol_ratio",
        "r_bullet_lines",
        "r_ellipsis_lines",
        "r_alpha_words",
        "r_stopwords",
        "gopher_pass",
    ]
    return sig.select(
        "doc_id",
        *[F.col(c).cast("long").alias(c) for c in sig.columns if c.startswith("gopher_") and c != "gopher_pass"],
        *[F.col(c).cast("int").alias(c) for c in rule_cols],
    ).orderBy("doc_id")


def _gopher_oracle_sql() -> str:
    stop_terms = " + ".join(
        f"list_contains(list_transform(gw, w -> lower(w)), '{s}')::INT"
        for s in ("the", "be", "to", "of", "and", "that", "have", "with")
    )
    return rf"""
        WITH docs AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0
                      THEN text || ' that would have come with it'
                      ELSE text END AS text
          FROM documents
        ), sig AS (
          SELECT doc_id,
            list_filter(string_split_regex(trim(text), '\s+'),
                        w -> length(w) > 0) AS gw,
            string_split(text, chr(10)) AS gl,
            (length(text) - length(replace(text, '#', '')))
              + (length(text) - length(replace(text, '...', ''))) // 3
              + (length(text) - length(replace(text, '…', ''))) AS symbols
          FROM docs
        ), agg AS (
          SELECT doc_id,
            len(gw)::BIGINT AS gopher_n_words,
            coalesce(list_sum(list_transform(gw, w -> length(w))), 0)::BIGINT
                AS gopher_word_chars,
            symbols::BIGINT AS gopher_symbols,
            len(gl)::BIGINT AS gopher_n_lines,
            len(list_filter(gl, l -> regexp_matches(l, '^\s*([•‣▪*]|- )')))::BIGINT
                AS gopher_bullet_lines,
            len(list_filter(gl, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))::BIGINT
                AS gopher_ellipsis_lines,
            len(list_filter(gw, w -> regexp_matches(w, '[A-Za-z]')))::BIGINT
                AS gopher_alpha_words,
            ({stop_terms})::BIGINT AS gopher_stop_hits
          FROM sig
        )
        SELECT doc_id, gopher_n_words, gopher_word_chars, gopher_symbols,
          gopher_n_lines, gopher_bullet_lines, gopher_ellipsis_lines,
          gopher_alpha_words, gopher_stop_hits,
          (gopher_n_words BETWEEN 50 AND 100000)::INT AS r_word_count,
          (gopher_word_chars >= 3*gopher_n_words
             AND gopher_word_chars <= 10*gopher_n_words)::INT AS r_mean_word_len,
          (10*gopher_symbols <= gopher_n_words)::INT AS r_symbol_ratio,
          (10*gopher_bullet_lines <= 9*gopher_n_lines)::INT AS r_bullet_lines,
          (10*gopher_ellipsis_lines <= 3*gopher_n_lines)::INT AS r_ellipsis_lines,
          (5*gopher_alpha_words >= 4*gopher_n_words)::INT AS r_alpha_words,
          (gopher_stop_hits >= 2)::INT AS r_stopwords,
          ((gopher_n_words BETWEEN 50 AND 100000)
            AND gopher_word_chars >= 3*gopher_n_words
            AND gopher_word_chars <= 10*gopher_n_words
            AND 10*gopher_symbols <= gopher_n_words
            AND 10*gopher_bullet_lines <= 9*gopher_n_lines
            AND 10*gopher_ellipsis_lines <= 3*gopher_n_lines
            AND 5*gopher_alpha_words >= 4*gopher_n_words
            AND gopher_stop_hits >= 2)::INT AS gopher_pass
        FROM agg ORDER BY doc_id
    """


_C4_EXTRAS = [
    "Extra sentence one ends here.",
    "Extra sentence two follows along.",
    "Extra sentence three keeps going.",
    "Extra sentence four adds weight.",
    "Extra sentence five nearly done.",
    "Extra sentence six wraps it up.",
]


def _q_c4_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning-heuristics gate (Raffel et al. 2020 §2.2): line
    retention (terminal punctuation + ≥3 words + no 'javascript') and
    the three page rules (≥5 sentences in the retained text, no
    'lorem ipsum', no '{'). The synthetic docs have no line structure,
    so BOTH sides build the same deterministic page: the doc text
    terminated with '.', a junk line, `doc_id % 7` constant extra
    sentences, and a `doc_id % 5`-selected tail that exercises each
    rule (lorem page-drop / javascript line-drop / brace page-drop /
    kept closer / too-short line). Every comparison is an integer
    count, and the retained TEXT itself is part of the hash — a
    line-rule bug changes the rebuilt string, not just a flag.
    DuckDB quirk handled: array_to_string([]) is NULL there, '' in
    Spark, hence the coalesce on the oracle side."""
    _ensure_shipped(spark)
    from hlld_spark.operators.text import with_c4_signals

    docs = _load(spark, sf_dir, "documents")
    tail = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("Some lorem ipsum filler text here."))
        .when(F.col("doc_id") % 5 == 1, F.lit("Enable javascript to read this article."))
        .when(F.col("doc_id") % 5 == 2, F.lit("var x = { a: 1 };"))
        .when(F.col("doc_id") % 5 == 3, F.lit("A closing sentence wraps up this page."))
        .otherwise(F.lit("Short fin."))
    )
    extras = F.array_join(
        F.slice(
            F.array(*[F.lit(s) for s in _C4_EXTRAS]),
            F.lit(1),
            (F.col("doc_id") % 7).cast("int"),
        ),
        "\n",
    )
    pages = docs.select(
        "doc_id",
        F.concat_ws(
            "\n", F.concat(F.col("text"), F.lit(".")), F.lit("short junk"), extras, tail
        ).alias("text"),
    )
    sig = with_c4_signals(pages)
    return sig.select(
        "doc_id",
        "c4_text",
        F.col("c4_n_sentences").cast("long").alias("c4_n_sentences"),
        F.col("r_min_sentences").cast("int").alias("r_min_sentences"),
        F.col("r_no_lorem").cast("int").alias("r_no_lorem"),
        F.col("r_no_brace").cast("int").alias("r_no_brace"),
        F.col("c4_keep").cast("int").alias("c4_keep"),
    ).orderBy("doc_id")


def _c4_oracle_sql() -> str:
    extras = ", ".join(f"'{s}'" for s in _C4_EXTRAS)
    return rf"""
        WITH pages AS (
          SELECT doc_id,
            concat_ws(chr(10),
              text || '.',
              'short junk',
              coalesce(array_to_string(
                  list_slice([{extras}], 1, (doc_id % 7)::INT), chr(10)), ''),
              CASE WHEN doc_id % 5 = 0 THEN 'Some lorem ipsum filler text here.'
                   WHEN doc_id % 5 = 1 THEN 'Enable javascript to read this article.'
                   WHEN doc_id % 5 = 2 THEN 'var x = {{ a: 1 }};'
                   WHEN doc_id % 5 = 3 THEN 'A closing sentence wraps up this page.'
                   ELSE 'Short fin.' END) AS text
          FROM documents
        ), sig AS (
          SELECT doc_id, text,
            coalesce(array_to_string(
              list_filter(string_split(text, chr(10)), l ->
                regexp_matches(trim(l), '[.!?"”]$')
                AND len(list_filter(string_split_regex(trim(l), '\s+'),
                                    w -> length(w) > 0)) >= 3
                AND NOT regexp_matches(lower(l), 'javascript')
              ), chr(10)), '') AS c4_text
          FROM pages
        )
        SELECT doc_id, c4_text,
          length(regexp_replace(c4_text, '[^.!?]', '', 'g'))::BIGINT
              AS c4_n_sentences,
          (length(regexp_replace(c4_text, '[^.!?]', '', 'g')) >= 5)::INT
              AS r_min_sentences,
          (NOT contains(lower(text), 'lorem ipsum'))::INT AS r_no_lorem,
          (NOT contains(text, '{{'))::INT AS r_no_brace,
          (length(regexp_replace(c4_text, '[^.!?]', '', 'g')) >= 5
            AND NOT contains(lower(text), 'lorem ipsum')
            AND NOT contains(text, '{{'))::INT AS c4_keep
        FROM sig ORDER BY doc_id
    """


def _q_dsir_selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling gate (Xie et al. 2023): target
    corpus = the English slice of `documents`, raw corpus = all of
    `documents`; hashed unigram+bigram bucket models (md5-hex-prefix
    buckets, additive smoothing), per-doc log-likelihood-ratio
    weights, Gumbel-top-k draw of 120 docs — every stage a pure
    function of the data, so the oracle replays the ENTIRE chain in
    DuckDB (list ops + md5 + ('0x'||hex)::UBIGINT Gumbel) and the
    gate checks EXACT selection membership plus the weight values."""
    _ensure_shipped(spark)
    from hlld_spark.operators.dsir import (
        dsir_logratio_table,
        dsir_resample,
        hashed_ngram_counts,
        with_importance_weights,
    )

    docs = _load(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    tab = dsir_logratio_table(
        hashed_ngram_counts(target), hashed_ngram_counts(docs)
    )
    w = with_importance_weights(docs, tab)
    sel = dsir_resample(docs.select("doc_id", "lang"), w, k=120, seed=13)
    return (
        sel.join(w, "doc_id")
        .select("doc_id", "lang", F.round("dsir_logw", 6).alias("dsir_logw"))
        .orderBy("doc_id")
    )


def _dsir_oracle_sql() -> str:
    """DuckDB twin of _q_dsir_selected: unigram+bigram md5-prefix
    buckets via list ops, smoothed log-ratio, deterministic Gumbel
    from the same md5 hex prefix, top-120 by (score desc, doc_id)."""
    g = (
        "-ln(-ln(((('0x' || substr(md5(doc_id::VARCHAR || ':13'), 1, 12))::UBIGINT"
        ") + 0.5) / 281474976710656.0))"
    )
    return f"""
        WITH l AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> length(x) > 0) AS ts
          FROM documents
        ),
        grams AS (
          SELECT doc_id, lang, unnest(list_transform(ts,
                   t -> substr(md5(t), 1, 4))) AS b FROM l
          UNION ALL
          SELECT doc_id, lang, unnest(list_transform(range(1, len(ts)),
                   i -> substr(md5(ts[i] || ' ' || ts[i+1]), 1, 4))) AS b FROM l
        ),
        tc AS (SELECT b, count(*) AS ct FROM grams WHERE lang = 'en' GROUP BY 1),
        rc AS (SELECT b, count(*) AS cr FROM grams GROUP BY 1),
        tot AS (SELECT (SELECT sum(ct) FROM tc) AS nt,
                       (SELECT sum(cr) FROM rc) AS nr),
        lr AS (
          SELECT rc.b,
                 ln((COALESCE(tc.ct, 0) + 1.0) / (tot.nt + 65536.0))
               - ln((rc.cr + 1.0) / (tot.nr + 65536.0)) AS logratio
          FROM rc LEFT JOIN tc USING (b), tot
        ),
        w AS (
          SELECT g.doc_id, any_value(g.lang) AS lang,
                 sum(lr.logratio) AS logw
          FROM grams g JOIN lr ON g.b = lr.b
          GROUP BY g.doc_id
        ),
        sel AS (
          SELECT doc_id, lang, logw
          FROM w
          ORDER BY logw + {g} DESC, doc_id
          LIMIT 120
        )
        SELECT doc_id, lang, round(logw, 6) AS dsir_logw
        FROM sel ORDER BY doc_id
    """


_QUALITY_FIXTURE_DIR = "/tmp/hlld_spark_fixtures/quality_clf"


def _q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style quality-classifier scoring gate: the fixture
    stores a held-out labeled test set plus a model trained by the
    INDEPENDENT numpy reference trainer (dense matrix GD — the Spark
    trainer is pytest-gated against it separately); the engine scores
    with the pure-Catalyst broadcast-join path and the oracle replays
    the same hashed-feature sigmoid scoring in DuckDB SQL over the
    stored weights."""
    _ensure_shipped(spark)
    from hlld_spark.operators.quality import score_quality, write_quality_fixture

    write_quality_fixture(_QUALITY_FIXTURE_DIR, 200, 120)
    test = spark.read.parquet(f"{_QUALITY_FIXTURE_DIR}/test.parquet")
    model = spark.read.parquet(f"{_QUALITY_FIXTURE_DIR}/model.parquet")
    scores = score_quality(test, model)
    return (
        test.select("doc_id", "label")
        .join(scores, "doc_id")
        .select(
            "doc_id",
            "label",
            F.round("quality_score", 6).alias("quality_score"),
            (F.col("quality_score") >= 0.5).cast("int").alias("pred"),
        )
        .orderBy("doc_id")
    )


def _quality_oracle_sql() -> str:
    d = _QUALITY_FIXTURE_DIR
    return f"""
        WITH m AS (SELECT bucket, w FROM read_parquet('{d}/model.parquet')),
        l AS (
          SELECT doc_id, label,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> length(x) > 0) AS ts
          FROM read_parquet('{d}/test.parquet')
        ),
        g AS (
          SELECT doc_id, len(ts) + greatest(len(ts) - 1, 0) AS n,
                 unnest(list_transform(ts, t -> substr(md5(t), 1, 4))) AS bkt
          FROM l
          UNION ALL
          SELECT doc_id, len(ts) + greatest(len(ts) - 1, 0) AS n,
                 unnest(list_transform(range(1, len(ts)),
                        i -> substr(md5(ts[i] || ' ' || ts[i+1]), 1, 4))) AS bkt
          FROM l
        ),
        s AS (
          SELECT g.doc_id, any_value(g.n) AS n, sum(COALESCE(m.w, 0)) AS dot
          FROM g LEFT JOIN m ON g.bkt = m.bucket
          GROUP BY g.doc_id
        ),
        sc AS (
          SELECT doc_id,
                 1.0 / (1.0 + exp(-(dot / n +
                   (SELECT w FROM m WHERE bucket = '_b__')))) AS score
          FROM s
        )
        SELECT l.doc_id, l.label, round(sc.score, 6) AS quality_score,
               CASE WHEN sc.score >= 0.5 THEN 1 ELSE 0 END AS pred
        FROM l JOIN sc ON l.doc_id = sc.doc_id
        ORDER BY l.doc_id
    """


_MEGATRON_DS_DIR = "/tmp/hlld_spark_fixtures/megatron_ds"
_WEBDATASET_DIR = "/tmp/hlld_spark_fixtures/webdataset"


def _q_indexed_dataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indexed-dataset sink gate: tokenize `documents` with the shared
    whitespace tokenizer, map each token to a 16-bit id via its md5
    hex prefix (cross-engine deterministic), write the Megatron-layout
    .bin/.idx shards + manifest, and return the manifest AS READ BACK
    FROM DISK. The oracle recomputes every manifest column (doc/token
    counts, exact .bin/.idx byte formulas, doc-id ranges) from the
    raw table in DuckDB — so the gate verifies what the sink actually
    committed, not what it intended. Pytest separately verifies the
    binary layout byte-for-byte and the token roundtrip."""
    _ensure_shipped(spark)
    from hlld_spark.operators.dsir import _tokens
    from hlld_spark.sources.indexed_dataset import write_indexed_dataset

    docs = _load(spark, sf_dir, "documents")
    toks = F.transform(
        _tokens(F.col("text")),
        lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int"),
    )
    with_ids = docs.select("doc_id", toks.alias("tokens"))
    man = write_indexed_dataset(with_ids, _MEGATRON_DS_DIR, n_shards=8)
    return man.orderBy("shard_id")


def _indexed_dataset_oracle_sql() -> str:
    return r"""
        WITH l AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(trim(text), '\s+'),
                                 x -> length(x) > 0)) AS n
          FROM documents
        )
        SELECT (doc_id % 8)::INT AS shard_id,
               count(*)::BIGINT AS n_docs,
               sum(n)::BIGINT AS n_tokens,
               (2 * sum(n))::BIGINT AS bin_bytes,
               (42 + 20 * count(*))::BIGINT AS idx_bytes,
               min(doc_id)::BIGINT AS min_doc_id,
               max(doc_id)::BIGINT AS max_doc_id
        FROM l GROUP BY 1 ORDER BY 1
    """


def _q_webdataset_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset sink/source gate (r6): write `documents` as tar
    shards (one .txt + one .cls member per sample, key = doc_id,
    deterministic `doc_id % 8` membership, zeroed tar metadata so the
    bytes are run-independent), then READ THE TARS BACK with the
    distributed reader and aggregate per shard. The oracle recomputes
    sample/file counts, exact utf-8 content bytes and key ranges from
    the raw table — so the gate proves the round trip (a lost member,
    a mis-sharded key, or a truncated tar all hash-mismatch), not just
    the writer's intent."""
    _ensure_shipped(spark)
    from hlld_spark.sources.webdataset import read_webdataset, write_webdataset

    docs = _load(spark, sf_dir, "documents")
    write_webdataset(
        docs, _WEBDATASET_DIR, {"txt": "text", "cls": "lang"}, key_col="doc_id", n_shards=8
    )
    wd = read_webdataset(spark, _WEBDATASET_DIR)
    return (
        wd.groupBy("shard_id")
        .agg(
            F.countDistinct("key").alias("n_samples"),
            F.count("*").alias("n_files"),
            F.sum(F.length("content")).alias("content_bytes"),
            F.min(F.col("key").cast("long")).alias("min_key"),
            F.max(F.col("key").cast("long")).alias("max_key"),
        )
        .orderBy("shard_id")
    )


def _q_mixed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus-mixing gate (the Pile/Dolma source-weighting
    step): the en/de/fr slices of `documents` mix at weights 2.5 /
    0.5 / 1.0 — fractional epochs, so en rows appear 2 or 3 times with
    the extra copy decided by the md5 hash fraction (a pure function
    of key+seed+source; md5 hex is byte-identical across engines).
    The oracle replays the copy-count rule in DuckDB with a lateral
    range() — EXACT membership and epoch indices, not counts."""
    _ensure_shipped(spark)
    from hlld_spark.operators.sampling import mix_corpora

    docs = _load(spark, sf_dir, "documents")
    srcs = {l: docs.filter(F.col("lang") == l) for l in ("en", "de", "fr")}
    out = mix_corpora(srcs, {"en": 2.5, "de": 0.5, "fr": 1.0}, "doc_id", seed=7)
    return (
        out.select("source", "doc_id", F.col("copy").cast("long").alias("copy"))
        .orderBy("source", "doc_id", "copy")
    )


def _mixed_corpus_oracle_sql() -> str:
    """DuckDB twin of _q_mixed_corpus — thresholds from the SAME
    helper (imported, not copied)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from hlld_spark.operators.sampling import sample_threshold_hex

    legs = []
    for name, whole, frac in (("en", 2, 0.5), ("de", 0, 0.5), ("fr", 1, 0.0)):
        thr = sample_threshold_hex(frac)
        legs.append(f"""
            SELECT '{name}' AS source, doc_id, i AS copy
            FROM documents, range(0, {whole + 1}) r(i)
            WHERE lang = '{name}'
              AND i < {whole} + CASE WHEN substr(md5(doc_id || ':7:{name}'), 1, 8)
                                          < '{thr}' THEN 1 ELSE 0 END""")
    return " UNION ALL ".join(legs) + " ORDER BY source, doc_id, copy"


def _q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph dedup gate: the fixture plants cross-doc
    boilerplate paragraphs, within-doc repeats, and empty formatting
    lines; the engine removes every duplicate paragraph except its
    least-(doc_id,pos) occurrence and reassembles the docs (paragraph
    text never crossing an exchange — plan-asserted in pytest). The
    oracle replays the keeper rule in independent DuckDB SQL
    (string_split + window row_number + string_agg reassembly) — FULL
    string equality on every rebuilt document."""
    _ensure_shipped(spark)
    from hlld_spark.operators.dedup import dedup_paragraphs, write_paragraph_fixture

    write_paragraph_fixture(_PARAS_FIXTURE, 300)
    docs = spark.read.parquet(_PARAS_FIXTURE)
    return (
        dedup_paragraphs(docs, "doc_id", "text")
        .select("doc_id", "text")
        .orderBy("doc_id")
    )


def _q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc duplicate-line removal gate (keep first occurrence,
    empty lines pass through): zero-exchange pure-Catalyst higher-order
    functions vs an independent DuckDB list_filter/list_position
    replay — FULL string equality per document."""
    _ensure_shipped(spark)
    from hlld_spark.operators.dedup import (
        dedup_lines_within_doc,
        write_paragraph_fixture,
    )

    write_paragraph_fixture(_PARAS_FIXTURE, 300)
    docs = spark.read.parquet(_PARAS_FIXTURE)
    return (
        dedup_lines_within_doc(docs, "text")
        .select("doc_id", "text")
        .orderBy("doc_id")
    )


def _q_nfc_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization gate — a TRUE cross-engine check: the
    fixture mixes genuinely denormalized text (combining marks, Hangul
    jamo) with compatibility characters NFC must NOT fold; the engine
    normalizes with CPython's unicodedata, the oracle with DuckDB's
    utf8proc `nfc_normalize` — two independent Unicode implementations
    agreeing byte-for-byte on every row."""
    _ensure_shipped(spark)
    from hlld_spark.operators.normalize import (
        with_unicode_normalization,
        write_unicode_fixture,
    )

    write_unicode_fixture(_UNICODE_FIXTURE, 300)
    docs = spark.read.parquet(_UNICODE_FIXTURE).select("doc_id", "text")
    return (
        with_unicode_normalization(docs, "text", "NFC", "norm")
        .select("doc_id", "norm")
        .orderBy("doc_id")
    )


def _q_semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup gate (Abbas et al. 2023): assign every embedding to
    its nearest of 8 FIXED centroids (the vec_id<8 rows — deterministic
    and SQL-expressible, unlike a Lloyd fit), then drop any row with
    cosine ≥ 0.435 to an earlier-id row in the same cluster
    (the paper's upper-triangular rule). The oracle replays assignment
    (list_distance argmin, index-tiebroken like numpy argmin) and the
    pair rule (self-join on cluster, y.vec_id < x.vec_id) in DuckDB —
    EXACT survivor membership, not counts. eps=0.435 was margin-scanned:
    the nearest same-cluster pair sim is ≥5e-4 away at all three SFs,
    so cross-engine float noise cannot flip a drop."""
    _ensure_shipped(spark)
    import numpy as np

    from hlld_spark.operators.embeddings import semdedup

    emb = _load(spark, sf_dir, "embeddings")
    cents_rows = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    cents = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in sorted(cents_rows, key=lambda r: r["vec_id"])]
    )
    flags = semdedup(emb, "vec_id", "embedding", centroids=cents, eps=0.435)
    return (
        flags.filter(~F.col("sem_dup"))
        .select("vec_id", "cluster")
        .orderBy("vec_id")
    )


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling gate (r6): keep 25% of en and
    50% of de documents (everything else whole), membership = one
    md5-prefix threshold per stratum (operators/sampling.py). md5 hex
    is byte-identical across Spark and DuckDB, so the oracle checks
    EXACT MEMBERSHIP, not counts — any hash-input, threshold-rounding
    or stratum-dispatch drift changes the kept set."""
    _ensure_shipped(spark)
    from hlld_spark.operators.sampling import stratified_sample

    docs = _load(spark, sf_dir, "documents")
    return (
        stratified_sample(
            docs, "doc_id", "lang", {"en": 0.25, "de": 0.5}, seed=5
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _q_blocklist_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist (C4 bad-words stage) gate (r6): per-document match
    counts for a 3-term blocklist, pure-Catalyst regexp_count with the
    shared edge-aware-boundary pattern builder; the DuckDB oracle
    counts with RE2 over the SAME pattern string (imported — no
    drift)."""
    _ensure_shipped(spark)
    from hlld_spark.operators.sampling import with_blocklist_hits

    docs = _load(spark, sf_dir, "documents")
    return (
        with_blocklist_hits(docs, "text", ["join", "stream", "window"])
        .select("doc_id", F.col("blocklist_hits").cast("long").alias("blocklist_hits"))
        .orderBy("doc_id")
    )


def _q_latest_fetches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-recency dedup gate (r6): documents become deterministic
    REFETCH FAMILIES of 4 (base url + utm variant + fragment variant +
    explicit :443), each with its own timestamp;
    ``latest_fetch_per_url`` must canonicalize the variants together
    and keep exactly the family's latest row. The DuckDB oracle knows
    the family from doc_id arithmetic (no canonicalization needed),
    so a canonicalization bug that splits a family — or a window
    tie-break drift — changes the kept set and mismatches."""
    _ensure_shipped(spark)
    from hlld_spark.operators.urls import latest_fetch_per_url

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "CASE doc_id % 4 "
            " WHEN 0 THEN format_string('https://h%d.example.com/p%d', (doc_id div 4) % 40, doc_id div 4) "
            " WHEN 1 THEN format_string('https://h%d.example.com/p%d?utm_source=x', (doc_id div 4) % 40, doc_id div 4) "
            " WHEN 2 THEN format_string('https://h%d.example.com/p%d#top', (doc_id div 4) % 40, doc_id div 4) "
            " ELSE format_string('https://h%d.example.com:443/p%d', (doc_id div 4) % 40, doc_id div 4) END"
        ).alias("url"),
        F.expr(
            "format_string('2024-%02d-%02dT00:00:0%d', 1 + doc_id % 12, "
            "1 + (doc_id * 5) % 28, doc_id % 10)"
        ).alias("warc_ts"),
    )
    return latest_fetch_per_url(docs, "url", "warc_ts").select(
        "doc_id", "url", "warc_ts"
    ).orderBy("doc_id")


def _q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA moments gate (r6): the one-pass per-partition
    (n, Σx, ΣxxT) aggregation of ``operators/embeddings.py`` against a
    DuckDB oracle that computes every covariance entry exactly in SQL
    (embeddings × 64×64 position pairs). Both sides accumulate in
    float64 with the same E[xy]−E[x]E[y] formula; entries rounded to 4
    places. A partial-merge bug, float32 truncation, or mean/Gram slip
    mismatches across the 4096 entries."""
    _ensure_shipped(spark)
    from hlld_spark.operators.embeddings import embedding_moments

    emb = _load(spark, sf_dir, "embeddings")
    _n, _mean, cov = embedding_moments(emb, "embedding")
    d = cov.shape[0]
    rows = [
        (i + 1, j + 1, float(round(cov[i, j], 4)))
        for i in range(d)
        for j in range(d)
    ]
    return spark.createDataFrame(rows, "i long, j long, cov double").orderBy("i", "j")


def _q_pca_projection_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA spectral-invariant gate (r6), empty-exact like the sketch
    bound queries: fit k=8 PCA on the embeddings table, project the
    whole table DISTRIBUTED, and return every component whose projected
    variance disagrees with its eigenvalue by >0.1% — plus a sentinel
    row if the reconstruction MSE differs from the dropped-eigenvalue
    total by >0.1% or the basis is not orthonormal to 1e-8. All checks
    recompute through the projection path, so basis/scale/mean bugs
    surface as rows."""
    _ensure_shipped(spark)
    import numpy as np

    from hlld_spark.operators.embeddings import fit_pca, project_embeddings

    emb = _load(spark, sf_dir, "embeddings")
    model = fit_pca(emb, "embedding", k=8)
    proj = project_embeddings(emb, model, "embedding")
    k = len(model["eigvals"])
    # distributed per-component variance of the projection
    comps = proj.select(
        F.posexplode("pca").alias("component", "v")
    )
    stats = (
        comps.groupBy("component")
        .agg(F.avg(F.col("v") * F.col("v")).alias("ex2"), F.avg("v").alias("ex"))
        .withColumn("var", F.col("ex2") - F.col("ex") * F.col("ex"))
        .collect()
    )
    bad: list[tuple[int, str]] = []
    for r in stats:
        want = model["eigvals"][r["component"]]
        if want > 1e-12 and abs(r["var"] - want) / want > 1e-3:
            bad.append((int(r["component"]), "variance_mismatch"))
    gram = model["components"] @ model["components"].T
    if not np.allclose(gram, np.eye(k), atol=1e-8):
        bad.append((-1, "not_orthonormal"))
    # distributed reconstruction MSE == dropped eigenvalue mass
    from hlld_spark.operators.embeddings import with_reconstruction_sq_error

    mse = (
        with_reconstruction_sq_error(proj, model, "embedding", "pca")
        .agg(F.avg("recon_sq_error").alias("m"))
        .collect()[0]["m"]
    )
    dropped = model["total_var"] - model["eigvals"].sum()
    if dropped > 1e-12 and abs(mse - dropped) / dropped > 1e-3:
        bad.append((-2, "reconstruction_mismatch"))
    return spark.createDataFrame(bad, "component long, reason string").orderBy(
        "component"
    )


def _q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking gate (r6): every document split into 32-token
    windows with 8-token overlap (step 24) — pure-Catalyst
    sequence/posexplode/slice (operators/pack.py::chunk_documents,
    plan-asserted no Python/Exchange in pytest); the DuckDB oracle
    recomputes the same windows with range/unnest/list_slice. Full
    chunk-text equality, so an off-by-one in the window start, the
    ceil, or the slice bound mismatches."""
    _ensure_shipped(spark)
    from hlld_spark.operators.pack import chunk_documents

    docs = _load(spark, sf_dir, "documents")
    return chunk_documents(
        docs, "doc_id", "text", chunk_tokens=32, overlap=8
    ).orderBy("doc_id", "chunk_id")


def _q_main_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal gate (r6): jusText-style block classification
    (operators/boilerplate.py) over a deterministic fixture of pages
    whose html was constructed FROM known content paragraphs wrapped in
    nav/sidebar/footer link walls, stopword-free tag clouds, short
    context-rule notes and chrome-only pages. The DuckDB oracle reads
    the generation-time truth — a block-split regression, link-density
    slip, or context-rule bug mismatches full extracted strings."""
    _ensure_shipped(spark)
    from hlld_spark.operators.boilerplate import (
        extract_main_text,
        write_boilerplate_fixture,
    )

    write_boilerplate_fixture(_BOILERPLATE_FIXTURE_DIR, 200)
    pages = spark.read.parquet(f"{_BOILERPLATE_FIXTURE_DIR}/pages.parquet")
    out = extract_main_text(pages, "html")
    return out.select(
        "doc_id", "main_text", F.length("main_text").alias("n_chars")
    ).orderBy("doc_id")


def _q_packed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing gate (r6): every document's span in the
    GPT-style concatenated token stream (offset + 512-token chunk
    range). The Spark side computes the prefix sum HIERARCHICALLY
    (bucket totals → one tiny bucket window → within-bucket windows —
    no single-partition doc-scale window, operators/pack.py); the
    DuckDB oracle uses the naive global running sum — the gate proves
    the decomposition telescopes to the identical stream layout."""
    _ensure_shipped(spark)
    from hlld_spark.operators.pack import pack_sequences

    docs = _load(spark, sf_dir, "documents")
    out = pack_sequences(docs, "doc_id", 512, text_col="text", bucket_span=256)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "token_offset",
        "first_chunk",
        "last_chunk",
        "start_in_first",
    ).orderBy("doc_id")


def _q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram LM self-scored over documents (r6) — the
    CCNet-style perplexity quality signal. Spark trains the count
    tables and scores every token position with the documented backoff
    cascade (operators/lm.py); the DuckDB oracle REIMPLEMENTS the whole
    thing in SQL (list-position grams + count CTEs + the same α-penalty
    CASE) — a gram off-by-one, wrong backoff penalty, or denominator
    swap mismatches on every row. Rounded to 4 places on both sides so
    float summation order cannot flip a digit."""
    _ensure_shipped(spark)
    from hlld_spark.operators.lm import perplexity_scores

    docs = _load(spark, sf_dir, "documents")
    out = perplexity_scores(
        docs, "doc_id", "text", broadcast_counts=True, round_digits=4
    )
    return out.select("doc_id", "n_tokens", "avg_logp", "ppl").orderBy("doc_id")


def _q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub gate (r6): a deterministic PII-laden line (email + IPv4
    + phone synthesized from doc_id, plus a real text prefix) is built
    IDENTICALLY in Spark and DuckDB, then redacted and counted by each
    engine's own regex machinery (Java regex vs RE2) using the shared
    patterns of ``operators/pii.py`` — any pattern outside the engines'
    common subset, ordering bug, or count/replace disagreement
    hash-mismatches on the full redacted strings."""
    _ensure_shipped(spark)
    from hlld_spark.operators.pii import redact_pii, with_pii_counts

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "concat('reach ', format_string('user%d@mail%d.example.com', doc_id, doc_id % 7), "
            "' on host ', format_string('%d.%d.%d.%d', doc_id % 224, (doc_id * 7) % 256, "
            "(doc_id * 13) % 256, doc_id % 250), "
            "' call ', format_string('(%03d) %03d-%04d', 200 + doc_id % 800, "
            "100 + doc_id % 900, doc_id % 10000), ' ', substr(text, 1, 40))"
        ).alias("pii_text"),
    )
    out = redact_pii(
        with_pii_counts(docs, "pii_text"), "pii_text", out_col="redacted"
    )
    return out.select(
        "doc_id", "redacted", "email_count", "ipv4_count", "phone_count"
    ).orderBy("doc_id")


def _q_crawl_delta_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff gate (r6): a second crawl is derived from documents
    by arithmetic (every 11th id dropped, every 7th text mutated, every
    13th id re-added under a new id); ``crawl_delta`` must REDISCOVER
    those statuses purely from the payload-free hash diff. The oracle
    knows the construction, so any hash, join-side or precedence bug
    mismatches."""
    _ensure_shipped(spark)
    from hlld_spark.operators.dedup import crawl_delta

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    new = (
        docs.where(F.col("doc_id") % 11 != 3)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 2, F.concat(F.col("text"), F.lit(" [v2]"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.lit("fresh page "), F.col("doc_id").cast("string")).alias(
                    "text"
                ),
            )
        )
    )
    return crawl_delta(docs, new, "doc_id", ["text"]).orderBy("doc_id")


def _q_span_scrubbed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring REMOVAL gate (r6) — the full Lee et al. dedup
    semantic: every maximal merged run of positions whose 25-char
    substring occurs in ≥2 distinct docs is cut from the text. Spark
    side = position-bearing gram stream → hot-gram join →
    gaps-and-islands interval merge → Catalyst ``aggregate`` string
    surgery (operators/dedup.py::remove_duplicated_spans, zero Python
    past the shared gram kernel); the DuckDB oracle rebuilds the kept
    text from literal substrings with its own islands + STRING_AGG
    reassembly. Full-string equality on every document."""
    _ensure_shipped(spark)
    from hlld_spark.operators.dedup import remove_duplicated_spans

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    out = remove_duplicated_spans(docs, "doc_id", "text", span=25)
    return out.select(
        "doc_id", F.col("text").alias("scrubbed"), F.length("text").alias("n_chars")
    ).orderBy("doc_id")


def _q_dup_span_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate CLUSTERS (r6): docs sharing any 25-char
    substring — transitively, through any chain length — get one
    cluster id (the component's min doc id). Spark side = hub edges
    (doc → min sharer per gram, star per gram ≡ clique connectivity)
    into the alternating large-star/small-star fixpoint of
    ``operators/cluster.py``; the DuckDB oracle recomputes components
    from literal substrings with a recursive reachability CTE — a
    star-round emission bug, premature convergence, or a lost isolated
    doc all hash-mismatch."""
    _ensure_shipped(spark)
    from hlld_spark.operators.cluster import dup_span_clusters

    docs = _load(spark, sf_dir, "documents")
    return dup_span_clusters(docs, "doc_id", "text", span=25).orderBy("doc_id")


def _q_bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (r6) over the documents table for the query
    {hash, join, scan}, k1=1.2 b=0.75 — the Spark side is the filtered-
    explode + broadcast-df plan of ``operators/ranking.py``; the DuckDB
    oracle REIMPLEMENTS the same scoring formula in SQL (unnest + window
    stats). Scores rounded to 4 places on both sides so float summation
    order cannot flip a digit; ties broken by doc_id on both sides."""
    _ensure_shipped(spark)
    from hlld_spark.operators.ranking import bm25_search

    docs = _load(spark, sf_dir, "documents")
    return bm25_search(docs, "doc_id", "text", ["hash", "join", "scan"], k=10)


def _q_audio_spectral_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio spectrogram operator (r6) with an ANALYTIC oracle: the
    fixture's sine audio assets carry a pure tone at an exact FFT-bin
    frequency f = k*sr/256, so the time-averaged power spectrum's
    argmax bin is k by construction — stored at generation, recomputed
    here by the engine's framed Hann/rfft pipeline. Sine assets are
    selected by id arithmetic (every other audio slot), not by peeking
    at truth columns."""
    _ensure_shipped(spark)
    from hlld_spark.operators.multimodal import (
        extract_audio_spectrogram,
        write_real_assets_fixture,
    )

    write_real_assets_fixture(_REAL_ASSETS_FIXTURE, 200)
    assets = spark.read.parquet(_REAL_ASSETS_FIXTURE).select("asset_id", "payload")
    sines = assets.filter(
        (F.col("asset_id") % 4 == 1) & (F.floor(F.col("asset_id") / 4) % 2 == 1)
    )
    out = extract_audio_spectrogram(sines)
    return out.select(
        "asset_id",
        F.col("spectrogram_peak_bin").alias("peak_bin"),
        F.size("spectrogram").alias("n_bins"),
    ).orderBy("asset_id")


def _q_pq_recall_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (r6): encode the embeddings table to
    8-byte PQ codes (32x compression of the 64-float vectors — the way
    a 10^12-vector corpus fits in cluster RAM) and run an asymmetric-
    distance top-10 batch search for 20 probe vectors drawn FROM the
    table. A probe's own vector must appear in its top-10 (measured:
    it is rank 1 at every SF, so the gate has a 9-slot margin);
    violations must be the empty set — exact empty oracle. Codebooks
    train on a deterministic bottom-k-by-hash sample, so the whole
    query is reproducible."""
    _ensure_shipped(spark)
    import numpy as np

    from hlld_spark.operators.similarity import (
        fit_pq_codebooks,
        pq_encode,
        pq_topk_batch,
    )

    emb = _load(spark, sf_dir, "embeddings")
    books = fit_pq_codebooks(emb, "embedding", m=8, sample=2048)
    codes = pq_encode(emb, "vec_id", "embedding", books)
    probes = emb.orderBy("vec_id").limit(20).collect()
    qm = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in probes])
    res = pq_topk_batch(codes, "vec_id", qm, books, k=10).collect()
    found: dict[int, set] = {}
    for r in res:
        found.setdefault(r["query_idx"], set()).add(r["vec_id"])
    bad = [
        (int(p["vec_id"]),)
        for i, p in enumerate(probes)
        if p["vec_id"] not in found.get(i, set())
    ]
    return spark.createDataFrame(bad, "vec_id long")


def _q_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + registrable-domain extraction (r6),
    driver-gated with a TRULY independent oracle: the Spark side is the
    pure-Catalyst column algebra of ``operators/urls.py``; the DuckDB
    side REIMPLEMENTS the same documented rules (lower scheme/host,
    strip userinfo + default ports + fragments + tracking params, sort
    surviving params, '/' for the empty path, multi-part-suffix domain
    cut) in SQL from the raw fixture URLs — two implementations, one
    spec; any divergence hash-mismatches."""
    _ensure_shipped(spark)
    from hlld_spark.operators.urls import (
        canonicalize_urls,
        with_registrable_domain,
        write_urls_fixture,
    )

    write_urls_fixture(_URLS_FIXTURE, 400)
    raw = spark.read.parquet(_URLS_FIXTURE)
    out = with_registrable_domain(
        canonicalize_urls(raw, "raw_url"), "raw_url", out="domain"
    )
    return (
        out.groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("canonical_url").alias("n_canonical"),
            F.min("canonical_url").alias("first_canonical"),
            F.max("canonical_url").alias("last_canonical"),
        )
        .orderBy("domain")
    )


def _q_warc_pages_by_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion, driver-gated (r6, VERDICT r5 #5): a deterministic
    3-archive Common-Crawl-style fixture (240 response records, one url
    refetched on a later date, plus request/conversion/no-URI noise
    records that must be skipped) streams through ``warc_to_web_pages``
    — per-record gzip members decoded incrementally, HTTP envelopes
    stripped, text extracted — and aggregates per host. The DuckDB
    oracle reads the GROUND-TRUTH (url, host, warc_date, text) stored
    at generation (the html was constructed FROM the text), so a wrong
    record parse, header strip, timestamp parse or extraction
    hash-mismatches."""
    _ensure_shipped(spark)
    from hlld_spark.sources.warc import warc_to_web_pages, write_warc_fixture

    write_warc_fixture(_WARC_FIXTURE_DIR, 240)
    pages = warc_to_web_pages(spark, _WARC_FIXTURE_DIR + "/*.warc.gz")
    return (
        pages.select(
            F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"),
            "url",
            F.length("text").alias("chars"),
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("wdate"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct("url").alias("n_urls"),
            F.sum("chars").alias("text_chars"),
            F.min("wdate").alias("first_date"),
            F.max("wdate").alias("last_date"),
        )
        .orderBy("host")
    )


def _q_multimodal_real_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-format codecs for all three modalities, driver-gated (r5):
    the fixture payloads are actual PNG files (gray/RGB/RGBA, row
    filters None/Sub/Up), baseline AND progressive JPEG files (r6: gray/RGB, quality +
    4:4:4/4:2:2/4:2:0 subsampling cycling, restart intervals,
    SOF2 with successive-approximation scans on every other one), RIFF/WAVE
    PCM16 files (mono/stereo) and
    uncompressed AVI videos (DIB frames, stride-padded widths), decoded
    by the engine's pure python/numpy codecs (operators/codecs.py — no
    PIL/ffmpeg). The oracle reads GROUND-TRUTH columns stored at
    generation: header fields (width/height/channels/sample_rate/
    n_samples/n_frames) AND decode-dependent statistics — channel-0
    pixel mean (images), frame-0 mean (video), the exact integer sum of
    the every-4th channel-0 samples (audio) — so a wrong unfilter /
    row-flip / sample decode hash-mismatches, not just a wrong header
    parse."""
    _ensure_shipped(spark)
    from hlld_spark.operators.multimodal import (
        extract_image_features,
        parse_metadata,
        resize_images,
        sample_audio_frames,
        sample_video_frames,
        write_real_assets_fixture,
    )

    write_real_assets_fixture(_REAL_ASSETS_FIXTURE, 200)
    assets = spark.read.parquet(_REAL_ASSETS_FIXTURE).select("asset_id", "kind", "payload")
    out = sample_video_frames(
        sample_audio_frames(extract_image_features(parse_metadata(assets)), every_n=4), every_n=4
    )
    # resize leg: 4x4 nearest-neighbor, PNG re-encoded in-engine, then
    # DECODED AGAIN by extract_image_features — pins the encoder too
    out = extract_image_features(
        resize_images(out, 4, 4), payload_col="resized", out="rfeatures"
    )
    return out.select(
        "asset_id",
        "kind",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.channels").alias("channels"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_samples").alias("n_samples"),
        F.col("meta.n_frames").alias("n_frames"),
        F.coalesce(F.col("features")[0], F.col("frame_features")[0]).alias("chan0_mean"),
        F.expr("aggregate(frame_samples, 0L, (a, x) -> a + CAST(x AS BIGINT))").alias("samp_sum"),
        F.col("rfeatures")[0].alias("resized_mean"),
    ).orderBy("asset_id")


def _q_gif_mjpeg_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF + Motion-JPEG codecs, driver-gated (r6): fixture payloads
    are actual GIF87a/89a files (single-frame with interlace cycling,
    full-frame animations with GCE delays, and a HAND-ASSEMBLED
    two-frame delta animation whose second frame paints a sub-rect with
    a transparent index over unchanged pixels) and MJPG-fourcc AVI
    containers (one baseline JPEG per frame chunk). The oracle reads
    GROUND-TRUTH columns composed at generation with independent numpy
    (truth canvases for the delta GIF; encoder-side dequant+IDCT for
    MJPEG — the JPEG entropy-exactness trick), so a wrong LZW width, a
    mis-placed sub-rect, a dropped transparency bit, or a broken
    per-frame huffman decode all hash-mismatch. Columns: first-frame
    channel-0 mean (image leg), frame-0 and LAST-frame full means
    (video leg, every_n=1), and a 4x4 resize -> GIF re-encode -> second
    decode mean that pins the GIF ENCODER too."""
    _ensure_shipped(spark)
    from hlld_spark.operators.multimodal import (
        extract_image_features,
        parse_metadata,
        resize_images,
        sample_video_frames,
        write_anim_assets_fixture,
    )

    write_anim_assets_fixture(_ANIM_ASSETS_FIXTURE, 160)
    assets = spark.read.parquet(_ANIM_ASSETS_FIXTURE).select("asset_id", "kind", "payload")
    out = sample_video_frames(extract_image_features(parse_metadata(assets)), every_n=1)
    out = extract_image_features(
        resize_images(out, 4, 4), payload_col="resized", out="rfeatures"
    )
    return out.select(
        "asset_id",
        "kind",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
        F.col("features")[0].alias("chan0_mean"),
        F.col("frame_features")[0].alias("frame0_mean"),
        F.element_at(F.col("frame_features"), -1).alias("last_frame_mean"),
        F.col("rfeatures")[0].alias("resized_mean"),
    ).orderBy("asset_id")


def _q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata parsing + feature extraction with a FULL exact
    oracle (VERDICT r1 task 1a): the deterministic asset fixture is
    materialized to parquet including ground-truth metadata columns; the
    engine parses width/height/... from the BINARY HEADER ONLY and the
    oracle reads the stored truth + OCTET_LENGTH — any parsing bug
    hash-mismatches."""
    _ensure_shipped(spark)
    from hlld_spark.operators.multimodal import (
        extract_image_features,
        parse_metadata,
        write_assets_fixture,
    )

    write_assets_fixture(_ASSETS_FIXTURE, 200)
    assets = spark.read.parquet(_ASSETS_FIXTURE).select("asset_id", "kind", "payload")
    feat = extract_image_features(parse_metadata(assets))
    return feat.select(
        "asset_id",
        "kind",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.channels").alias("channels"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_samples").alias("n_samples"),
        F.col("meta.n_frames").alias("n_frames"),
        F.col("meta.payload_bytes").alias("payload_bytes"),
        F.when(F.col("features").isNotNull(), F.size("features")).alias("n_features"),
    ).orderBy("asset_id")


def _q_multimodal_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/sample decimation paths with an exact oracle: every-4th
    frame of FVID payloads and every-4th sample of FAUD payloads —
    sampled counts must equal ceil(truth/4) from the fixture's
    ground-truth columns (the engine derives them from the BINARY
    payload alone)."""
    _ensure_shipped(spark)
    from hlld_spark.operators.multimodal import (
        sample_audio_frames,
        sample_video_frames,
        write_assets_fixture,
    )

    write_assets_fixture(_ASSETS_FIXTURE, 200)
    assets = spark.read.parquet(_ASSETS_FIXTURE).select("asset_id", "kind", "payload")
    out = sample_audio_frames(sample_video_frames(assets, every_n=4), every_n=4)
    return out.select(
        "asset_id",
        "kind",
        F.when(F.col("frame_features").isNotNull(), F.size("frame_features")).alias("n_sampled_frames"),
        F.when(F.col("frame_samples").isNotNull(), F.size("frame_samples")).alias("n_sampled_audio"),
    ).orderBy("asset_id")


def _q_heavy_hitters_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """φ-heavy hitters with EXACT counts (Misra–Gries candidate superset
    → broadcast recount): every event_type with frequency ≥ 10% of
    events. Value-exact oracle: plain GROUP BY ... HAVING."""
    _ensure_shipped(spark)
    from hlld_spark.operators.frequent import heavy_hitters

    ev = _load(spark, sf_dir, "events")
    return heavy_hitters(ev, "event_type", phi=0.1).orderBy("event_type")


def _q_frequent_ngrams_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: token 3-grams with frequency ≥ φ of all
    3-grams, exact counts — computed WITHOUT exploding n-grams into rows
    (Misra–Gries candidates + bounded recount, both n-gram passes stay
    inside the workers). Oracle: the explode-based SQL equivalent."""
    _ensure_shipped(spark)
    from hlld_spark.operators.frequent import frequent_ngrams

    d = _load(spark, sf_dir, "documents")
    return frequent_ngrams(d, "text", n=3, phi=0.0002).orderBy("ngram")


def _q_streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming event-time gate with an exact oracle
    (VERDICT r1 task 9): events replayed as ≥3 file micro-batches
    (maxFilesPerTrigger=1) through windowed_sketch_stream (1-day
    tumbling windows); the final per-(day, event_type) n_rows from the
    stateful operator must equal the batch GROUP BY count."""
    import os
    import tempfile

    _ensure_shipped(spark)
    from hlld_spark.core.accumulator import HllSpec
    from hlld_spark.streaming.sketch_stream import windowed_sketch_stream

    ev = _load(spark, sf_dir, "events")
    src = "/tmp/hlld_spark_fixtures/events_stream_" + os.path.basename(sf_dir.rstrip("/"))
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        # three deterministic chunks = three micro-batches
        b = F.pmod(F.xxhash64("user_id", "ts"), F.lit(3))
        for i in range(3):
            ev.filter(b == i).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        # events.ts is TIMESTAMP_NTZ; watermarks require an instant type
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = windowed_sketch_stream(
        stream, "ts", ["event_type"], "user_id", HllSpec(12), window="1 day", watermark="60 days"
    )
    ckpt = tempfile.mkdtemp(prefix="hlld_stream_ck_")
    qname = f"ev_win_{os.path.basename(ckpt)[-8:]}"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3, f"expected ≥3 micro-batches, got {n_batches}"
    mem = spark.sql(f"select * from {qname}")
    # update mode re-emits per batch; the final (max) n_rows is the total
    return (
        mem.groupBy(F.to_date("window_start").alias("day"), "event_type")
        .agg(F.max("n_rows").alias("n_rows"))
        .orderBy("day", "event_type")
    )


def _q_streaming_windowed_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emit-on-close streaming gate (VERDICT r2 task 8): append-mode
    windowed_sketch_stream emits each (day, event_type) window EXACTLY
    ONCE, finalized, when the watermark closes it — so the raw emitted
    rows (no downstream max()/last() dedup) must equal the batch GROUP
    BY. Two far-future sentinel files advance the watermark past every
    real window and then trigger the timeout batch that fires the final
    emissions; the sentinel's own (still-open) window is filtered out."""
    import os
    import tempfile

    _ensure_shipped(spark)
    from hlld_spark.core.accumulator import HllSpec
    from hlld_spark.streaming.sketch_stream import windowed_sketch_stream

    ev = _load(spark, sf_dir, "events")
    src = "/tmp/hlld_spark_fixtures/events_stream_append_" + os.path.basename(sf_dir.rstrip("/"))
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        # three deterministic chunks = three data micro-batches
        b = F.pmod(F.xxhash64("user_id", "ts"), F.lit(3))
        for i in range(3):
            ev.filter(b == i).coalesce(1).write.mode("append").parquet(src)
        # sentinel 1 advances the watermark past win_end + 60d for every
        # real window; sentinel 2's batch is where the armed timeouts
        # actually fire (timeout processing happens inside a batch)
        last = ev.orderBy(F.desc("ts")).limit(1).withColumn("event_type", F.lit("__sentinel__"))
        for j in (400, 401):
            last.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {j} DAYS")).coalesce(1).write.mode(
                "append"
            ).parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        # events.ts is TIMESTAMP_NTZ; watermarks require an instant type
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = windowed_sketch_stream(
        stream,
        "ts",
        ["event_type"],
        "user_id",
        HllSpec(12),
        window="1 day",
        watermark="60 days",
        output_mode="append",
    )
    ckpt = tempfile.mkdtemp(prefix="hlld_stream_app_ck_")
    qname = f"ev_app_{os.path.basename(ckpt)[-8:]}"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3, f"expected ≥3 micro-batches, got {n_batches}"
    mem = spark.sql(f"select * from {qname}").filter(F.col("event_type") != "__sentinel__")
    # append mode = one finalized row per closed window, used AS IS
    return mem.select(
        F.to_date("window_start").alias("day"), "event_type", "n_rows"
    ).orderBy("day", "event_type")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_distinct_users_by_type": _q_exact_distinct_users_by_type,
        "hll_users_by_type": _q_hll_users_by_type,
        "hll_rowcount_plumbing": _q_hll_rowcount_plumbing,
        "hll_bound_violations": _q_hll_bound_violations,
        "pricing_summary": _q_pricing_summary,
        "revenue_by_segment": _q_revenue_by_segment,
        "prefix_list_parts": _q_prefix_list_parts,
        "exact_dedup_documents": _q_exact_dedup_documents,
        "token_counts": _q_token_counts,
        "events_daily": _q_events_daily,
        "revenue_by_nation": _q_revenue_by_nation,
        "top_order_per_customer": _q_top_order_per_customer,
        "salted_exact_distinct": _q_salted_exact_distinct,
        "cms_totals": _q_cms_totals,
        "cms_undercount_violations": _q_cms_undercount_violations,
        "bloom_membership_violations": _q_bloom_membership_violations,
        "quantile_bound_violations": _q_quantile_bound_violations,
        "dedup_exact_keepers": _q_dedup_exact_keepers,
        "minhash_recall_violations": _q_minhash_recall_violations,
        "minhash_token_recall_violations": _q_minhash_token_recall_violations,
        "cosine_topk": _q_cosine_topk,
        "text_stats": _q_text_stats,
        "lang_id_disagreement": _q_lang_id_disagreement,
        "lang_id_natural_disagreement": _q_lang_id_natural_disagreement,
        "decontamination_flagged": _q_decontamination_flagged,
        "decontamination_flagged_tokens": _q_decontamination_flagged_tokens,
        "clean_corpus_survivors": _q_clean_corpus_survivors,
        "multimodal_real_codecs": _q_multimodal_real_codecs,
        "gif_mjpeg_codecs": _q_gif_mjpeg_codecs,
        "warc_pages_by_host": _q_warc_pages_by_host,
        "url_domain_stats": _q_url_domain_stats,
        "pq_recall_violations": _q_pq_recall_violations,
        "audio_spectral_peaks": _q_audio_spectral_peaks,
        "bm25_top_docs": _q_bm25_top_docs,
        "duplicated_spans": _q_duplicated_spans,
        "dup_span_clusters": _q_dup_span_clusters,
        "span_scrubbed_docs": _q_span_scrubbed_docs,
        "crawl_delta_statuses": _q_crawl_delta_statuses,
        "pii_redaction": _q_pii_redaction,
        "lm_perplexity": _q_lm_perplexity,
        "packed_chunks": _q_packed_chunks,
        "main_text_extraction": _q_main_text_extraction,
        "doc_chunks": _q_doc_chunks,
        "events_asof_orders": _q_events_asof_orders,
        "bpe_roundtrip_violations": _q_bpe_roundtrip_violations,
        "kmeans_centroid_violations": _q_kmeans_centroid_violations,
        "semdedup_survivors": _q_semdedup_survivors,
        "phash_near_dups": _q_phash_near_dups,
        "encoding_repair": _q_encoding_repair,
        "paragraph_dedup_docs": _q_paragraph_dedup,
        "mixed_corpus_docs": _q_mixed_corpus,
        "dsir_selected_docs": _q_dsir_selected,
        "quality_scores": _q_quality_scores,
        "indexed_dataset_manifest": _q_indexed_dataset_manifest,
        "webdataset_shards": _q_webdataset_shards,
        "html_unescaped_docs": _q_html_unescaped,
        "line_filtered_docs": _q_line_filtered,
        "gopher_quality_flags": _q_gopher_quality,
        "c4_quality_flags": _q_c4_quality,
        "line_dedup_docs": _q_line_dedup,
        "nfc_normalized_docs": _q_nfc_normalized,
        "stratified_sample_docs": _q_stratified_sample,
        "blocklist_hits": _q_blocklist_hits,
        "latest_fetches": _q_latest_fetches,
        "embedding_covariance": _q_embedding_covariance,
        "pca_projection_violations": _q_pca_projection_violations,
        "repetition_signals": _q_repetition_signals,
        "multimodal_features": _q_multimodal_features,
        "multimodal_frame_samples": _q_multimodal_frame_samples,
        "heavy_hitters_events": _q_heavy_hitters_events,
        "frequent_ngrams_documents": _q_frequent_ngrams_documents,
        "streaming_windowed_counts": _q_streaming_windowed_counts,
        "streaming_windowed_append": _q_streaming_windowed_append,
    }


def _pii_oracle_sql() -> str:
    """DuckDB twin of _q_pii_redaction: identical deterministic text
    construction, then RE2 redaction/counting with the SAME pattern
    strings (imported, not copied — drift is impossible)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from hlld_spark.operators.pii import PII_PATTERNS

    sql = """
            WITH base AS (
              SELECT doc_id,
                     concat('reach ',
                            printf('user%d@mail%d.example.com', doc_id, doc_id % 7),
                            ' on host ',
                            printf('%d.%d.%d.%d', doc_id % 224, (doc_id * 7) % 256,
                                   (doc_id * 13) % 256, doc_id % 250),
                            ' call ',
                            printf('(%03d) %03d-%04d', 200 + doc_id % 800,
                                   100 + doc_id % 900, doc_id % 10000),
                            ' ', substr(text, 1, 40)) AS pii_text
              FROM documents
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(pii_text,
                       '__EMAIL_RE__', '<|EMAIL|>', 'g'),
                       '__IPV4_RE__', '<|IPV4|>', 'g'),
                       '__PHONE_RE__', '<|PHONE|>', 'g') AS redacted,
                   len(regexp_extract_all(pii_text, '__EMAIL_RE__')) AS email_count,
                   len(regexp_extract_all(pii_text, '__IPV4_RE__')) AS ipv4_count,
                   len(regexp_extract_all(pii_text, '__PHONE_RE__')) AS phone_count
            FROM base ORDER BY doc_id
    """
    return (
        sql.replace("__EMAIL_RE__", PII_PATTERNS["email"])
        .replace("__IPV4_RE__", PII_PATTERNS["ipv4"])
        .replace("__PHONE_RE__", PII_PATTERNS["phone"])
    )


def _stratified_oracle_sql() -> str:
    """DuckDB twin of _q_stratified_sample — thresholds come from the
    SAME helper (imported, not copied)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from hlld_spark.operators.sampling import sample_threshold_hex

    t_en = sample_threshold_hex(0.25)
    t_de = sample_threshold_hex(0.5)
    return f"""
            SELECT doc_id, lang FROM documents
            WHERE CASE
              WHEN lang = 'en' THEN substr(md5(doc_id || ':5'), 1, 8) < '{t_en}'
              WHEN lang = 'de' THEN substr(md5(doc_id || ':5'), 1, 8) < '{t_de}'
              ELSE TRUE END
            ORDER BY doc_id
    """


def _blocklist_oracle_sql() -> str:
    """DuckDB twin of _q_blocklist_hits — the pattern string is built
    by the SAME pattern builder (imported, not copied)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from hlld_spark.operators.sampling import blocklist_pattern

    pat = "(?i)" + blocklist_pattern(["join", "stream", "window"])
    return f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{pat}')) AS blocklist_hits
            FROM documents ORDER BY doc_id
    """


def oracle_sql() -> dict[str, str]:
    return {
        "exact_distinct_users_by_type": """
            SELECT event_type,
                   COUNT(DISTINCT user_id) AS exact_users,
                   COUNT(*) AS n_events
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "hll_users_by_type": """
            SELECT event_type, TRUE AS hll_in_bound, COUNT(user_id) AS n_rows
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "hll_rowcount_plumbing": """
            SELECT event_type, COUNT(user_id) AS n_rows
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "hll_bound_violations": """
            SELECT CAST(NULL AS VARCHAR) AS event_type WHERE 1 = 0
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 6) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_by_segment": """
            SELECT c_mktsegment,
                   ROUND(SUM(o_totalprice), 2) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "prefix_list_parts": """
            SELECT p_partkey, p_name, p_retailprice
            FROM part WHERE p_name LIKE 's%'
            ORDER BY p_name, p_partkey
        """,
        "exact_dedup_documents": """
            SELECT MD5(text) AS content_hash,
                   MIN(doc_id) AS keeper_id,
                   COUNT(*) AS n_copies
            FROM documents GROUP BY MD5(text) ORDER BY keeper_id
        """,
        "token_counts": """
            SELECT doc_id,
                   LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS n_tokens,
                   LENGTH(text) AS n_chars_text
            FROM documents ORDER BY doc_id
        """,
        "events_daily": """
            SELECT CAST(ts AS DATE) AS day, event_type,
                   COUNT(*) AS n,
                   ROUND(SUM(value), 4) AS total_value
            FROM events GROUP BY CAST(ts AS DATE), event_type
            ORDER BY day, event_type
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   ROUND(SUM(o_totalprice), 2) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "top_order_per_customer": """
            SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS top_price
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn = 1 ORDER BY o_custkey
        """,
        "salted_exact_distinct": """
            SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "cms_totals": """
            SELECT event_type, COUNT(user_id) AS cms_total
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "cms_undercount_violations": """
            SELECT CAST(NULL AS VARCHAR) AS event_type WHERE 1 = 0
        """,
        "bloom_membership_violations": """
            SELECT CAST(NULL AS VARCHAR) AS uid WHERE 1 = 0
        """,
        "quantile_bound_violations": """
            SELECT CAST(NULL AS VARCHAR) AS sketch, CAST(NULL AS DOUBLE) AS q WHERE 1 = 0
        """,
        "dedup_exact_keepers": """
            SELECT doc_id, lang FROM documents
            WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY text)
            ORDER BY doc_id
        """,
        "minhash_recall_violations": """
            SELECT CAST(NULL AS BIGINT) AS doc_id WHERE 1 = 0
        """,
        "minhash_token_recall_violations": """
            SELECT CAST(NULL AS BIGINT) AS doc_id WHERE 1 = 0
        """,
        "cosine_topk": """
            SELECT vec_id FROM (
                SELECT e.vec_id,
                       list_cosine_similarity(e.embedding, q.embedding) AS cos
                FROM embeddings e,
                     (SELECT embedding FROM embeddings WHERE vec_id = 0) q
                ORDER BY cos DESC, e.vec_id LIMIT 10
            ) ORDER BY vec_id
        """,
        "text_stats": """
            SELECT doc_id,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) END AS whitespace_tokens,
                   LENGTH(text) AS n_chars_text,
                   LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^\\w\\s]', '', 'g')) AS punct_chars
            FROM documents ORDER BY doc_id
        """,
        "lang_id_disagreement": """
            SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS lang,
                   CAST(NULL AS VARCHAR) AS lang_id WHERE 1 = 0
        """,
        "lang_id_natural_disagreement": """
            SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS lang,
                   CAST(NULL AS VARCHAR) AS lang_id WHERE 1 = 0
        """,
        "repetition_signals": r"""
            SELECT doc_id,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) END AS n_words,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE LEN(LIST_DISTINCT(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'))) END AS n_distinct_words,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0.0
                        ELSE ROUND(1.0 - LEN(LIST_DISTINCT(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'))) * 1.0
                                   / LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')), 6) END AS dup_word_ratio
            FROM documents ORDER BY doc_id
        """,
        "decontamination_flagged": """
            WITH pos AS (SELECT i FROM generate_series(1, 100000) AS t(i)),
            ev AS (SELECT DISTINCT SUBSTRING(d.text, p.i, 13) AS g
                   FROM documents d JOIN pos p ON p.i <= LENGTH(d.text) - 12
                   WHERE d.doc_id % 23 = 0),
            dg AS (SELECT d.doc_id, SUBSTRING(d.text, p.i, 13) AS g
                   FROM documents d JOIN pos p ON p.i <= LENGTH(d.text) - 12)
            SELECT doc_id, COUNT(*) AS n_matched_grams
            FROM dg JOIN ev USING (g)
            GROUP BY doc_id ORDER BY doc_id
        """,
        "decontamination_flagged_tokens": r"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
            ),
            ev AS (
              SELECT DISTINCT array_to_string(t[i:i+12], ' ') AS g
              FROM toks, LATERAL (SELECT UNNEST(range(1, len(t) - 11)) AS i) w
              WHERE doc_id % 23 = 0 AND len(t) >= 13
            ),
            dg AS (
              SELECT doc_id, array_to_string(t[i:i+12], ' ') AS g
              FROM toks, LATERAL (SELECT UNNEST(range(1, len(t) - 11)) AS i) w
              WHERE len(t) >= 13
            )
            SELECT doc_id, COUNT(*) AS n_matched_grams
            FROM dg JOIN ev USING (g)
            GROUP BY doc_id ORDER BY doc_id
        """,
        "clean_corpus_survivors": r"""
            WITH keep AS (
              SELECT doc_id, lang, text FROM documents
              WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY text)
            ),
            toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM keep
            ),
            ev AS (
              SELECT DISTINCT array_to_string(t[i:i+12], ' ') AS g
              FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS t
                    FROM documents WHERE doc_id % 23 = 0) e,
                   LATERAL (SELECT UNNEST(range(1, len(t) - 11)) AS i) w
              WHERE len(t) >= 13
            ),
            dg AS (
              SELECT doc_id, array_to_string(t[i:i+12], ' ') AS g
              FROM toks, LATERAL (SELECT UNNEST(range(1, len(t) - 11)) AS i) w
              WHERE len(t) >= 13
            )
            SELECT doc_id, lang FROM keep
            WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM dg JOIN ev USING (g))
            ORDER BY doc_id
        """,
        "multimodal_real_codecs": f"""
            SELECT asset_id, kind, width, height, channels,
                   sample_rate, n_samples, n_frames, chan0_mean, samp_sum,
                   resized_mean
            FROM read_parquet('{_REAL_ASSETS_FIXTURE}')
            ORDER BY asset_id
        """,
        "gif_mjpeg_codecs": f"""
            SELECT asset_id, kind, width, height, n_frames,
                   chan0_mean, frame0_mean, last_frame_mean, resized_mean
            FROM read_parquet('{_ANIM_ASSETS_FIXTURE}')
            ORDER BY asset_id
        """,
        "pq_recall_violations": """
            SELECT CAST(NULL AS BIGINT) AS vec_id WHERE 1 = 0
        """,
        "duplicated_spans": """
            WITH w AS (
              SELECT doc_id, substr(text, i, 25) AS g
              FROM documents,
                   LATERAL (SELECT UNNEST(range(1, length(text) - 25 + 2)) AS i)
              WHERE length(text) >= 25
            ), dup AS (
              SELECT g FROM w GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
            )
            SELECT doc_id, COUNT(*) AS dup_positions
            FROM w JOIN dup USING (g)
            GROUP BY doc_id ORDER BY doc_id
        """,
        "pii_redaction": _pii_oracle_sql(),
        "events_asof_orders": """
            WITH r AS (
              SELECT o_custkey AS user_id, o_orderdate AS order_date,
                     MAX(o_orderkey) AS o_orderkey,
                     ARG_MAX(o_totalprice, o_orderkey) AS o_totalprice
              FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, CAST(e.ts AS DATE) AS event_date,
                   r.o_orderkey, r.o_totalprice
            FROM events e
            ASOF LEFT JOIN r
              ON e.user_id = r.user_id AND CAST(e.ts AS DATE) >= r.order_date
            ORDER BY event_id
        """,
        "bpe_roundtrip_violations": """
            SELECT CAST(NULL AS BIGINT) AS doc_id WHERE 1 = 0
        """,
        "kmeans_centroid_violations": """
            SELECT CAST(NULL AS BIGINT) AS cluster, CAST(NULL AS BIGINT) AS dim,
                   CAST(NULL AS VARCHAR) AS reason WHERE 1 = 0
        """,
        "phash_near_dups": f"""
            WITH t AS (
              SELECT img_id, phash FROM read_parquet('{_PHASH_FIXTURE}')
            ), m AS (
              SELECT a.img_id AS img_id, MIN(b.img_id) AS k
              FROM t a JOIN t b ON b.img_id < a.img_id
              WHERE a.phash IS NOT NULL AND b.phash IS NOT NULL
                AND bit_count(xor(a.phash, b.phash)) <= 3
              GROUP BY a.img_id
            )
            SELECT t.img_id, COALESCE(m.k, t.img_id) AS keeper_id
            FROM t LEFT JOIN m ON t.img_id = m.img_id
            ORDER BY t.img_id
        """,
        "semdedup_survivors": """
            WITH cent AS (
              SELECT vec_id AS c, embedding AS cv FROM embeddings WHERE vec_id < 8
            ), asg AS (
              SELECT vec_id, embedding, c,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY list_distance(embedding, cv) ASC, c ASC) AS rn
              FROM embeddings CROSS JOIN cent
            ), a AS (
              SELECT vec_id, embedding, c FROM asg WHERE rn = 1
            ), dups AS (
              SELECT DISTINCT x.vec_id
              FROM a x JOIN a y ON x.c = y.c AND y.vec_id < x.vec_id
              WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.435
            )
            SELECT a.vec_id, a.c AS cluster
            FROM a LEFT JOIN dups ON a.vec_id = dups.vec_id
            WHERE dups.vec_id IS NULL
            ORDER BY a.vec_id
        """,
        "encoding_repair": f"""
            SELECT doc_id, clean_text AS fixed, CAST(rounds AS BIGINT) AS rounds
            FROM read_parquet('{_MOJIBAKE_FIXTURE}')
            ORDER BY doc_id
        """,
        "paragraph_dedup_docs": f"""
            WITH t AS (SELECT doc_id, text FROM read_parquet('{_PARAS_FIXTURE}')),
             l AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM t),
             p AS (SELECT doc_id, i-1 AS pos, ls[i] AS para
                   FROM l, unnest(range(1, len(ls)+1)) r(i)),
             e AS (SELECT *, length(trim(para)) >= 1 AS elig FROM p),
             r AS (SELECT doc_id, pos, para, elig,
                          CASE WHEN elig THEN row_number() OVER (
                              PARTITION BY para ORDER BY doc_id, pos) END AS rn
                   FROM e),
             kept AS (SELECT doc_id, pos, para FROM r WHERE NOT elig OR rn = 1)
            SELECT t.doc_id,
                   COALESCE(string_agg(kept.para, chr(10) ORDER BY kept.pos), '') AS text
            FROM t LEFT JOIN kept ON t.doc_id = kept.doc_id
            GROUP BY t.doc_id ORDER BY t.doc_id
        """,
        "line_dedup_docs": f"""
            WITH l AS (SELECT doc_id, string_split(text, chr(10)) AS ls
                       FROM read_parquet('{_PARAS_FIXTURE}'))
            SELECT doc_id,
                   array_to_string(list_filter(ls,
                       (x, i) -> length(trim(x)) < 1 OR list_position(ls, x) = i),
                       chr(10)) AS text
            FROM l ORDER BY doc_id
        """,
        "nfc_normalized_docs": f"""
            SELECT doc_id, nfc_normalize(text) AS norm
            FROM read_parquet('{_UNICODE_FIXTURE}')
            ORDER BY doc_id
        """,
        "mixed_corpus_docs": _mixed_corpus_oracle_sql(),
        "dsir_selected_docs": _dsir_oracle_sql(),
        "quality_scores": _quality_oracle_sql(),
        "indexed_dataset_manifest": _indexed_dataset_oracle_sql(),
        "webdataset_shards": """
            SELECT (doc_id % 8)::INT AS shard_id,
                   count(*)::BIGINT AS n_samples,
                   (2 * count(*))::BIGINT AS n_files,
                   sum(octet_length(encode(text)) + octet_length(encode(lang)))::BIGINT
                       AS content_bytes,
                   min(doc_id)::BIGINT AS min_key,
                   max(doc_id)::BIGINT AS max_key
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "html_unescaped_docs": f"""
            SELECT doc_id, clean_text AS text
            FROM read_parquet('{_ENTITIES_FIXTURE}')
            ORDER BY doc_id
        """,
        "gopher_quality_flags": _gopher_oracle_sql(),
        "c4_quality_flags": _c4_oracle_sql(),
        "line_filtered_docs": rf"""
            WITH l AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls
                       FROM read_parquet('{_WEBLINES_FIXTURE}')),
             k AS (SELECT doc_id, text,
                    COALESCE(array_to_string(list_filter(ls, x ->
                      length(trim(x)) = 0 OR NOT (
                        (length(regexp_replace(x, '[^A-Za-z]', '', 'g')) > 0
                          AND length(regexp_replace(x, '[^A-Z]', '', 'g'))
                              / length(regexp_replace(x, '[^A-Za-z]', '', 'g')) > 0.7)
                        OR length(regexp_replace(x, '[^0-9]', '', 'g'))
                           / length(trim(x)) > 0.5
                        OR regexp_matches(x,
                           '^\s*\d+\s+(likes?|shares?|comments?|views?|points?|votes?)\s*$')
                        OR (len(regexp_split_to_array(trim(x), '\s+')) <= 2
                            AND length(trim(x)) <= 15)
                      )), chr(10)), '') AS kept
                   FROM l)
            SELECT doc_id, kept AS text,
                   CASE WHEN length(text) > 0
                        THEN round(1.0 - length(kept)/length(text), 6)
                        ELSE 0.0 END AS removed_char_frac
            FROM k ORDER BY doc_id
        """,
        "stratified_sample_docs": _stratified_oracle_sql(),
        "blocklist_hits": _blocklist_oracle_sql(),
        "latest_fetches": """
            WITH built AS (
              SELECT doc_id,
                     CASE doc_id % 4
                       WHEN 0 THEN printf('https://h%d.example.com/p%d', (doc_id // 4) % 40, doc_id // 4)
                       WHEN 1 THEN printf('https://h%d.example.com/p%d?utm_source=x', (doc_id // 4) % 40, doc_id // 4)
                       WHEN 2 THEN printf('https://h%d.example.com/p%d#top', (doc_id // 4) % 40, doc_id // 4)
                       ELSE printf('https://h%d.example.com:443/p%d', (doc_id // 4) % 40, doc_id // 4) END AS url,
                     printf('2024-%02d-%02dT00:00:0%d', 1 + doc_id % 12,
                            1 + (doc_id * 5) % 28, doc_id % 10) AS warc_ts,
                     doc_id // 4 AS fam
              FROM documents
            ), ranked AS (
              SELECT doc_id, url, warc_ts,
                     ROW_NUMBER() OVER (PARTITION BY fam
                                        ORDER BY warc_ts DESC, url DESC) AS rk
              FROM built
            )
            SELECT doc_id, url, warc_ts FROM ranked WHERE rk = 1 ORDER BY doc_id
        """,
        "embedding_covariance": """
            WITH pos AS (SELECT UNNEST(range(1, 65)) AS p)
            SELECT p1.p AS i, p2.p AS j,
                   ROUND(SUM(CAST(embedding[p1.p] AS DOUBLE) * embedding[p2.p]) / COUNT(*)
                         - (SUM(CAST(embedding[p1.p] AS DOUBLE)) / COUNT(*))
                           * (SUM(CAST(embedding[p2.p] AS DOUBLE)) / COUNT(*)), 4) AS cov
            FROM embeddings, pos p1, pos p2
            GROUP BY p1.p, p2.p ORDER BY i, j
        """,
        "pca_projection_violations": """
            SELECT CAST(NULL AS BIGINT) AS component,
                   CAST(NULL AS VARCHAR) AS reason WHERE 1 = 0
        """,
        "doc_chunks": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents
            ), sized AS (
              SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
            ), starts AS (
              SELECT doc_id, t, n,
                     UNNEST(range(0,
                       (CASE WHEN n <= 32 THEN 0
                             ELSE CAST(CEIL((n - 32) / 24.0) AS BIGINT) * 24 END) + 1,
                       24)) AS start
              FROM sized
            )
            SELECT doc_id,
                   start // 24 AS chunk_id,
                   len(list_slice(t, start + 1, start + 32)) AS n_chunk_tokens,
                   array_to_string(list_slice(t, start + 1, start + 32), ' ') AS chunk_text
            FROM starts ORDER BY doc_id, chunk_id
        """,
        "main_text_extraction": f"""
            SELECT doc_id, main_text, LENGTH(main_text) AS n_chars
            FROM read_parquet('{_BOILERPLATE_FIXTURE_DIR}/truth.parquet')
            ORDER BY doc_id
        """,
        "packed_chunks": """
            WITH toks AS (
              SELECT doc_id,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
              FROM documents
            ), offs AS (
              SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS token_offset
              FROM toks
            )
            SELECT doc_id, n_tokens, token_offset,
                   CASE WHEN n_tokens > 0 THEN token_offset // 512 END AS first_chunk,
                   CASE WHEN n_tokens > 0 THEN (token_offset + n_tokens - 1) // 512 END AS last_chunk,
                   CASE WHEN n_tokens > 0 THEN token_offset % 512 END AS start_in_first
            FROM offs ORDER BY doc_id
        """,
        "lm_perplexity": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents
            ), pos AS (
              SELECT doc_id, i,
                     t[i] AS w,
                     CASE WHEN i >= 2 THEN t[i-1] || ' ' || t[i] END AS big,
                     CASE WHEN i >= 3 THEN t[i-2] || ' ' || t[i-1] END AS ctx3,
                     CASE WHEN i >= 2 THEN t[i-1] END AS ctx1,
                     CASE WHEN i >= 3 THEN t[i-2] || ' ' || t[i-1] || ' ' || t[i] END AS tri
              FROM toks, LATERAL (SELECT UNNEST(range(1, len(t) + 1)) AS i)
            ), c1 AS (SELECT w AS g, COUNT(*) AS c FROM pos GROUP BY w),
               c2 AS (SELECT big AS g, COUNT(*) AS c FROM pos WHERE big IS NOT NULL GROUP BY big),
               c3 AS (SELECT tri AS g, COUNT(*) AS c FROM pos WHERE tri IS NOT NULL GROUP BY tri),
               tot AS (SELECT SUM(c) AS n FROM c1),
            scored AS (
              SELECT p.doc_id,
                     CASE
                       WHEN c3.c IS NOT NULL THEN c3.c::DOUBLE / cx2.c
                       WHEN c2b.c IS NOT NULL THEN POW(0.4, LEAST(3, p.i) - 2) * c2b.c / cx1.c
                       WHEN c1w.c IS NOT NULL THEN POW(0.4, LEAST(3, p.i) - 1) * c1w.c / tot.n
                       ELSE POW(0.4, LEAST(3, p.i) - 1) * 0.4 / tot.n
                     END AS s
              FROM pos p
              LEFT JOIN c3 ON p.tri = c3.g
              LEFT JOIN c2 cx2 ON p.ctx3 = cx2.g
              LEFT JOIN c2 c2b ON p.big = c2b.g
              LEFT JOIN c1 cx1 ON p.ctx1 = cx1.g
              LEFT JOIN c1 c1w ON p.w = c1w.g
              CROSS JOIN tot
            )
            SELECT doc_id, COUNT(*) AS n_tokens,
                   ROUND(AVG(LOG10(s)), 4) AS avg_logp,
                   ROUND(POW(10.0, -AVG(LOG10(s))), 4) AS ppl
            FROM scored GROUP BY doc_id ORDER BY doc_id
        """,
        "crawl_delta_statuses": """
            SELECT doc_id,
                   CASE WHEN doc_id % 11 = 3 THEN 'removed'
                        WHEN doc_id % 7 = 2 THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, 'added' AS status
            FROM documents WHERE doc_id % 13 = 0
            ORDER BY doc_id
        """,
        "span_scrubbed_docs": """
            WITH w AS (
              SELECT doc_id, i - 1 AS pos, substr(text, i, 25) AS g
              FROM documents,
                   LATERAL (SELECT UNNEST(range(1, length(text) - 25 + 2)) AS i)
              WHERE length(text) >= 25
            ), hot AS (
              SELECT g FROM w GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
            ), flagged AS (
              SELECT doc_id, pos FROM w JOIN hot USING (g)
            ), isl AS (
              SELECT doc_id, pos,
                     CASE WHEN pos > COALESCE(MAX(pos + 25) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                     THEN 1 ELSE 0 END AS ni
              FROM flagged
            ), isl2 AS (
              SELECT doc_id, pos,
                     SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
              FROM isl
            ), iv AS (
              SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 25 AS e
              FROM isl2 GROUP BY doc_id, island
            ), gaps AS (
              SELECT doc_id,
                     COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS gs,
                     s AS ge
              FROM iv
              UNION ALL
              SELECT doc_id, MAX(e) AS gs, NULL AS ge FROM iv GROUP BY doc_id
            ), rebuilt AS (
              SELECT g.doc_id,
                     STRING_AGG(substr(d.text, gs + 1,
                                       COALESCE(ge, length(d.text)) - gs),
                                '' ORDER BY gs) AS kept
              FROM gaps g JOIN documents d USING (doc_id)
              GROUP BY g.doc_id
            )
            SELECT d.doc_id, COALESCE(r.kept, d.text) AS scrubbed,
                   LENGTH(COALESCE(r.kept, d.text)) AS n_chars
            FROM documents d LEFT JOIN rebuilt r USING (doc_id)
            ORDER BY doc_id
        """,
        "dup_span_clusters": """
            WITH RECURSIVE w AS (
              SELECT DISTINCT doc_id, substr(text, i, 25) AS g
              FROM documents,
                   LATERAL (SELECT UNNEST(range(1, length(text) - 25 + 2)) AS i)
              WHERE length(text) >= 25
            ), hubs AS (
              SELECT g, MIN(doc_id) AS hub
              FROM w GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
            ), edges AS (
              SELECT DISTINCT w.doc_id AS a, h.hub AS b
              FROM w JOIN hubs h USING (g) WHERE w.doc_id <> h.hub
            ), sym AS (
              SELECT a, b FROM edges UNION SELECT b, a FROM edges
            ), reach(n, r) AS (
              SELECT a, b FROM sym
              UNION
              SELECT reach.n, sym.b FROM reach JOIN sym ON reach.r = sym.a
            ), comp AS (
              SELECT n, LEAST(n, MIN(r)) AS c FROM reach GROUP BY n
            )
            SELECT d.doc_id, COALESCE(comp.c, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp ON d.doc_id = comp.n
            ORDER BY doc_id
        """,
        "bm25_top_docs": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents
            ), lens AS (
              SELECT doc_id, len(t) AS dl, t FROM toks
            ), stats AS (
              SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens
            ), hits AS (
              SELECT doc_id, dl, unnest(t) AS term FROM lens
            ), tf AS (
              SELECT doc_id, dl, term, COUNT(*) AS tf FROM hits
              WHERE term IN ('hash', 'join', 'scan')
              GROUP BY doc_id, dl, term
            ), dfq AS (
              SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
            )
            SELECT doc_id,
                   ROUND(SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                             * tf * 2.2
                             / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
            FROM tf JOIN dfq USING (term) CROSS JOIN stats
            GROUP BY doc_id
            ORDER BY bm25 DESC, doc_id
            LIMIT 10
        """,
        "audio_spectral_peaks": f"""
            SELECT asset_id, spec_peak_bin AS peak_bin, CAST(129 AS INTEGER) AS n_bins
            FROM read_parquet('{_REAL_ASSETS_FIXTURE}')
            WHERE asset_id % 4 = 1 AND (asset_id // 4) % 2 = 1
            ORDER BY asset_id
        """,
        "url_domain_stats": f"""
            WITH parts AS (
              SELECT raw_url,
                lower(regexp_extract(raw_url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
                regexp_replace(regexp_extract(raw_url, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]+)', 1), '^.*@', '') AS auth,
                regexp_extract(raw_url, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]+([^?#]*)', 1) AS rawpath,
                regexp_extract(raw_url, '\\?([^#]*)', 1) AS query
              FROM read_parquet('{_URLS_FIXTURE}')
            ), norm AS (
              SELECT raw_url, scheme,
                lower(regexp_extract(auth, '^([^:]*)', 1)) AS host,
                regexp_extract(auth, ':(\\d+)$', 1) AS port,
                CASE WHEN rawpath = '' THEN '/' ELSE rawpath END AS path,
                array_to_string(list_sort(list_filter(string_split(query, '&'),
                  p -> p <> '' AND NOT regexp_matches(p,
                    '^(utm_[a-z]+|gclid|dclid|fbclid|msclkid|mc_eid|mc_cid|igshid|ref_src|ref_url|yclid|_ga|_gl|spm|si)='))), '&') AS q
              FROM parts
            ), canon AS (
              SELECT raw_url, host,
                CASE WHEN scheme IN ('http', 'https') THEN
                  scheme || '://' || host ||
                  CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                                             OR (scheme = 'https' AND port = '443'))
                       THEN ':' || port ELSE '' END ||
                  path || CASE WHEN q <> '' THEN '?' || q ELSE '' END
                ELSE raw_url END AS canonical_url
              FROM norm
            ), dom AS (
              SELECT canonical_url,
                CASE
                  WHEN regexp_matches(host, '^\\d+\\.\\d+\\.\\d+\\.\\d+$')
                       OR len(string_split(host, '.')) <= 2 THEN host
                  WHEN (string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]) IN
                       ('co.uk','org.uk','ac.uk','gov.uk','me.uk','com.au','net.au','org.au',
                        'edu.au','gov.au','co.jp','ne.jp','or.jp','ac.jp','go.jp','com.br',
                        'net.br','org.br','com.cn','net.cn','org.cn','gov.cn','com.mx',
                        'com.ar','com.tr','com.sg','com.hk','com.tw','co.in','co.kr','co.za',
                        'co.nz','co.id','co.il','co.th')
                    THEN string_split(host, '.')[-3] || '.' || string_split(host, '.')[-2]
                         || '.' || string_split(host, '.')[-1]
                  ELSE string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
                END AS domain
              FROM canon
            )
            SELECT domain, COUNT(*) AS n_urls,
                   COUNT(DISTINCT canonical_url) AS n_canonical,
                   MIN(canonical_url) AS first_canonical,
                   MAX(canonical_url) AS last_canonical
            FROM dom GROUP BY domain ORDER BY domain
        """,
        "warc_pages_by_host": f"""
            SELECT host, COUNT(*) AS n_pages, COUNT(DISTINCT url) AS n_urls,
                   SUM(LENGTH(text)) AS text_chars,
                   MIN(warc_date) AS first_date, MAX(warc_date) AS last_date
            FROM read_parquet('{_WARC_FIXTURE_DIR}/truth.parquet')
            GROUP BY host ORDER BY host
        """,
        "multimodal_features": f"""
            SELECT asset_id, kind, width, height, channels, sample_rate, n_samples, n_frames,
                   OCTET_LENGTH(payload)
                     - (CASE kind WHEN 'image' THEN 9 WHEN 'audio' THEN 12 ELSE 11 END) AS payload_bytes,
                   CASE WHEN kind = 'image' THEN 6 END AS n_features
            FROM read_parquet('{_ASSETS_FIXTURE}')
            ORDER BY asset_id
        """,
        "multimodal_frame_samples": f"""
            SELECT asset_id, kind,
                   CASE WHEN kind = 'video' THEN CAST(CEIL(n_frames / 4.0) AS INT) END AS n_sampled_frames,
                   CASE WHEN kind = 'audio' THEN CAST(CEIL(n_samples / 4.0) AS INT) END AS n_sampled_audio
            FROM read_parquet('{_ASSETS_FIXTURE}')
            ORDER BY asset_id
        """,
        "heavy_hitters_events": """
            SELECT event_type, COUNT(*) AS exact_count
            FROM events GROUP BY event_type
            HAVING COUNT(*) >= CEIL(0.1 * (SELECT COUNT(event_type) FROM events))
            ORDER BY event_type
        """,
        "frequent_ngrams_documents": """
            WITH toks AS (
              SELECT regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
            ), grams AS (
              SELECT UNNEST(list_transform(range(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS ngram
              FROM toks WHERE len(t) >= 3
            )
            SELECT ngram, COUNT(*) AS exact_count FROM grams
            GROUP BY ngram
            HAVING COUNT(*) >= CEIL(0.0002 * (SELECT COUNT(*) FROM grams))
            ORDER BY ngram
        """,
        "streaming_windowed_counts": """
            SELECT CAST(ts AS DATE) AS day, event_type, COUNT(user_id) AS n_rows
            FROM events GROUP BY CAST(ts AS DATE), event_type
            ORDER BY day, event_type
        """,
        "streaming_windowed_append": """
            SELECT CAST(ts AS DATE) AS day, event_type, COUNT(user_id) AS n_rows
            FROM events GROUP BY CAST(ts AS DATE), event_type
            ORDER BY day, event_type
        """,
    }
