"""End-to-end tour of hlld-spark. Run: python examples/demo.py

Covers the full user journey on a small deterministic corpus:
generate → sketch per group → SQL over sketches → rollup → dedup →
similarity → text analysis → named-set registry + wire protocol →
checkpointed resumable build.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hlld_spark.checkpoint import checkpointed_build, lineage
from hlld_spark.core.accumulator import HllSpec
from hlld_spark.core.tdigest import TDigestSpec
from hlld_spark.functions.sketch_sql import register_sql_functions
from hlld_spark.operators.dedup import dedup_exact, minhash_lsh_dedup
from hlld_spark.operators.sketch import (
    build_sketches,
    build_sketches_parquet,
    distinct_count,
    rollup_sketches,
    with_estimate,
)
from hlld_spark.operators.similarity import cosine_topk
from hlld_spark.operators.text import with_quality_score, with_token_counts
from hlld_spark.registry import SketchRegistry
from hlld_spark.session import get_spark
from hlld_spark.sources.webpages import generate_web_pages

spark = get_spark(app_name="hlld-spark-demo", cpus=8)
register_sql_functions(spark)
work = tempfile.mkdtemp(prefix="hlld_demo")

print("== 1. deterministic web corpus (100k rows, Zipfian lang skew)")
web_dir = os.path.join(work, "web")
generate_web_pages(spark, 100_000).write.parquet(web_dir)
web = spark.read.parquet(web_dir)
web.select("url", "warc_ts", "lang").show(3, truncate=False)

print("== 2. distinct urls per lang (HLL p=12, shuffle carries only sketches)")
distinct_count(web, ["lang"], "url", HllSpec(12)).orderBy(F.desc("n_rows")).show(5)

print("== 3. the same, scanning parquet directly in the workers (scale path)")
with_estimate(build_sketches_parquet(spark, web_dir, ["lang"], "url", HllSpec(12))).orderBy(
    F.desc("n_rows")
).show(3)

print("== 4. SQL over sketch tables")
build_sketches(web, ["lang"], "url", HllSpec(12)).createOrReplaceTempView("sketches")
spark.sql(
    "SELECT lang, CAST(hll_cardinality(sketch) AS LONG) AS distinct_urls, "
    "sketch_bytes(sketch) AS bytes FROM sketches ORDER BY distinct_urls DESC LIMIT 3"
).show()

print("== 5. rollup: (lang, day) → lang → global from ONE scan")
roll = with_estimate(
    rollup_sketches(web.withColumn("day", F.to_date("warc_ts")), ["lang", "day"], "url", HllSpec(12))
)
roll.groupBy("grouping_level").count().orderBy("grouping_level").show()

print("== 6. quantile sketch (t-digest) over text lengths")
with_estimate(
    build_sketches(web.withColumn("len", F.length("text")), ["lang"], "len", TDigestSpec())
).select("lang", F.round("estimate", 1).alias("median_len")).orderBy("lang").show(4)

print("== 7. dedup: exact + MinHash-LSH near-dup")
from hlld_spark.operators.dedup import dedup_exact_keys

print(
    "   rows before:", web.count(),
    " surviving docs (one tiny exchange):", dedup_exact_keys(web, "url", ["text"]).count(),
    " row-materializing variant:", dedup_exact(web, "url", ["text"], unique_ids=False).count(),
)
labels = minhash_lsh_dedup(web.limit(5000).withColumn("doc_id", F.monotonically_increasing_id()), "doc_id", "text")
print("   near-dup labels:", labels.filter("id != keeper_id").count(), "docs mapped to a keeper")

print("== 8. text analysis (pure Catalyst) + vectorized language ID")
from hlld_spark.operators.text import with_lang_id

with_quality_score(with_token_counts(web.limit(1000))).select(
    "whitespace_tokens", "bpe_tokens", F.round("quality_score", 3).alias("quality")
).show(3)
with_lang_id(web.limit(20000), "text").groupBy("lang_id").count().orderBy(F.desc("count")).show(3)

print("== 8a. natural-text language ID (30 languages: trigram profiles + script ratios + char votes)")
from hlld_spark.operators.lang_profiles import EVAL_SENTENCES, with_lang_id_profiles
from hlld_spark.operators.text import with_repetition_signals

nat = spark.createDataFrame(
    [(lang, s) for lang, ss in EVAL_SENTENCES.items() for s in ss], "lang string, text string"
)
with_lang_id_profiles(nat, "text").groupBy("lang", "lang_id").count().filter(
    "lang != lang_id"
).show(3)  # empty: 150/150 held-out natural sentences across 30 languages correct
with_repetition_signals(web.limit(1000)).select(
    "n_words", "n_distinct_words", "dup_word_ratio"
).show(3)

print("== 8c. benchmark decontamination: the published 13-TOKEN-gram rule (unit='char' also available)")
from hlld_spark.operators.decontaminate import decontaminate

eval_docs = web.filter(F.pmod(F.xxhash64("url"), F.lit(512)) == 0).select("text")
flagged = decontaminate(web.limit(50000), eval_docs, "url", "text", n=13)
print("   flagged:", flagged.count(), "of 50000 (eval drawn from the corpus, so hits exist)")

print("== 8b. heavy hitters: hosts with >=1% of pages, exact counts")
from hlld_spark.operators.frequent import heavy_hitters

hosts = web.select(F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"))
heavy_hitters(hosts, "host", phi=0.01).orderBy(F.desc("exact_count")).show(5, truncate=False)

print("== 8d. multimodal: REAL PNG/WAV decode (pure numpy codecs, no PIL/ffmpeg)")
import numpy as np

from hlld_spark.operators.codecs import encode_png, encode_wav
from hlld_spark.operators.multimodal import extract_image_features, parse_metadata

rng = np.random.RandomState(7)
assets = spark.createDataFrame(
    [
        (0, bytearray(encode_png(rng.randint(0, 256, (32, 48, 3)).astype(np.uint8), filter_type=1))),
        (1, bytearray(encode_wav(rng.randint(-2000, 2000, 16000).astype(np.int16), 16000))),
    ],
    "asset_id long, payload binary",
)
extract_image_features(parse_metadata(assets)).select(
    "asset_id", "meta.kind", "meta.width", "meta.height", "meta.sample_rate", "features"
).show(truncate=60)

print("== 8e. r6 pipeline extras: boilerplate removal, PII scrub, trigram-LM perplexity, chunking")
from hlld_spark.operators.boilerplate import extract_main_text
from hlld_spark.operators.lm import perplexity_scores
from hlld_spark.operators.pack import chunk_documents
from hlld_spark.operators.pii import redact_pii

pages = spark.createDataFrame(
    [(1, "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
         "<p>The data pipeline was run by all of the teams and it was seen "
         "that most of them had the same results for the day. "
         "Mail ops@example.com or call 555-123-4567 for more.</p>"
         "<footer>Copyright <a href='/t'>Terms</a></footer>")],
    "doc_id long, html string",
)
cleaned = redact_pii(extract_main_text(pages, "html", out_col="text"), "text")
print("   extracted+redacted:", cleaned.select("text").first()["text"][:110], "...")
ppl = perplexity_scores(web.limit(20000), "url", "text", min_count=2, broadcast_counts=True)
print("   self-scored trigram ppl quartiles:",
      [round(x, 2) for x in ppl.approxQuantile("ppl", [0.25, 0.5, 0.75], 0.01)])
print("   RAG chunks of 3 docs:",
      chunk_documents(web.limit(3), "url", "text", chunk_tokens=32, overlap=8).count())

print("== 8f. r6 graph + linear algebra: exact near-dup clusters, distributed PCA")
from hlld_spark.operators.cluster import connected_components
from hlld_spark.operators.embeddings import fit_pca

edges = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "src bigint, dst bigint")
cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
print("   components of 1-2-3 / 7-8:", cc)
emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
model = fit_pca(emb, "embedding", k=4)
print("   top-4 PCA eigvals over the embeddings table:",
      [round(float(v), 4) for v in model["eigvals"]])

print("== 8g. r6 third wave: span removal, as-of join, BPE, stratified sampling")
from hlld_spark.operators.bpe import bpe_encode, bpe_train
from hlld_spark.operators.dedup import remove_duplicated_spans
from hlld_spark.operators.sampling import stratified_sample
from hlld_spark.operators.temporal import asof_join

shared = "breaking news ticker repeated across every syndicated page today"
spans = spark.createDataFrame(
    [(1, "article one body " + shared), (2, shared + " article two body")],
    "doc_id long, text string",
)
scrubbed = remove_duplicated_spans(spans, "doc_id", "text", span=20).orderBy("doc_id")
print("   span-scrubbed:", [r["text"] for r in scrubbed.collect()])
quotes = spark.createDataFrame(
    [(1, 10, 100.0), (1, 20, 110.0)], "k long, t long, price double"
)
trades = spark.createDataFrame([(1, 15), (1, 25), (1, 5)], "k long, t long")
aj = asof_join(trades, quotes, "k", "t", "t", ["price"]).orderBy("t")
print("   as-of prices at t=5,15,25:", [r["price"] for r in aj.collect()])
bpe_model = bpe_train(web.limit(20000), "text", n_merges=120)
enc = bpe_encode(web.limit(1), "text", bpe_model).first()["bpe_tokens"]
print(f"   BPE: {len(bpe_model['merges'])} merges; first doc -> {len(enc)} tokens")
kept = stratified_sample(web.limit(50000), "url", "lang", {"en": 0.1}, seed=1)
print("   stratified en=0.1 keeps", kept.count(), "of 50000 rows (other langs whole)")

print("== 8h. r6 fourth wave: DSIR selection, quality model, line filter, WebDataset")
from hlld_spark.operators.dsir import (
    dsir_resample, dsir_logratio_table, hashed_ngram_counts, with_importance_weights,
)
from hlld_spark.operators.quality import (
    score_quality, split_model_df, train_quality_classifier, weights_to_df,
)
from hlld_spark.operators.text import filter_quality_lines
from hlld_spark.sources.webdataset import read_webdataset, write_webdataset

# unique ids: the corpus has refetched urls (dsir's contract is one row per id)
raw = web.limit(20000).withColumn("doc_id", F.xxhash64("url")).dropDuplicates(["doc_id"])
target = raw.filter(F.col("lang") == "en")  # "select docs that look English"
lr_table = dsir_logratio_table(hashed_ngram_counts(target), hashed_ngram_counts(raw))
w = with_importance_weights(raw, lr_table)
picked = dsir_resample(raw, w, k=500)
print("   DSIR picked", picked.count(), "of 20000;",
      picked.filter(F.col("lang") == "en").count(), "are en (target dist)")
labeled = raw.limit(400).withColumn("label", (F.col("lang") == "en").cast("int"))
wts, bias = train_quality_classifier(labeled, iters=8)
model = weights_to_df(spark, wts, bias)
wdf, b = split_model_df(model)
scored = score_quality(raw.limit(100), model, id_col="doc_id")
print(f"   quality model: {len(wts)} bucket weights, bias {bias:.3f}; "
      f"mean score over 100 docs {scored.agg(F.avg('quality_score')).first()[0]:.3f}")
lines = spark.createDataFrame(
    [(1, "A real sentence that survives the filter.\nHOME | ABOUT | CONTACT\n42 likes")],
    "doc_id long, text string",
)
print("   line-filtered:", repr(filter_quality_lines(lines).first()["text"]))
wd_dir = os.path.join(work, "wd")
write_webdataset(raw.limit(100), wd_dir, {"txt": "text", "cls": "lang"},
                 key_col="doc_id", n_shards=2)
back = read_webdataset(spark, wd_dir)
print("   WebDataset round trip:", back.count(), "tar members in",
      back.select("shard_id").distinct().count(), "shards")

print("== 9. named sets: registry + wire protocol")
reg = SketchRegistry(os.path.join(work, "sets"))
reg.create("demo_urls", precision=14)
reg.add_dataframe("demo_urls", web, "url")  # distributed build merged in
print("   info:", {k: round(v, 1) if isinstance(v, float) else v for k, v in reg.info("demo_urls").items()})
reg.flush()

print("== 10. checkpointed resumable build (kill after 2 splits, resume)")
ck = os.path.join(work, "ck")
assert checkpointed_build(spark, web_dir, ["lang"], "url", HllSpec(12), ckpt_dir=ck, job_id="demo", max_splits=2) is None
out = checkpointed_build(spark, web_dir, ["lang"], "url", HllSpec(12), ckpt_dir=ck, job_id="demo")
print("   resumed; splits:", len(lineage(ck, "demo")), "rows scanned:", sum(m["rows"] for m in lineage(ck, "demo")))
with_estimate(out).orderBy(F.desc("n_rows")).show(3)

spark.stop()
print("demo complete")
