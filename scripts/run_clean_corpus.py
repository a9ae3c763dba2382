"""spark-submit entrypoint: end-to-end training-corpus cleaning pipeline.

Chains this engine's training-data operators over a web-page table in
the order a real pretraining pipeline runs them — each stage is a
DataFrame transform, so Catalyst fuses what it can and the whole job is
one lineage:

    -1. main-text extraction (jusText-style boilerplate removal from html) [optional]
    0. URL canonicalization (refetch families collapse to one id) [optional]
    1. exact dedup          (content-hash min-id keepers, payload-free shuffle)
    2. near-dup dedup       (MinHash LSH + pairwise bucket verify; closure =
                             pointer jumping or exact connected components) [optional]
    3. decontamination      (n-gram overlap vs an eval/benchmark table) [optional]
    3b. span removal        (cut cross-doc duplicated substrings, Lee et al.) [optional]
    4. quality + repetition (pure-Catalyst scores, thresholds)
    4a. blocklist filter    (C4-style bad-words drop) [optional]
    4b. perplexity filter   (self-scored stupid-backoff trigram LM) [optional]
    5. language filter      (trigram-profile natural-text lang-id) [optional]
    5b. stratified sampling (deterministic per-lang keep fractions) [optional]
    6. PII scrub            (email/IPv4/phone redaction + audit totals) [optional]

Writes the cleaned table (Iceberg when available, partitioned parquet
otherwise) plus a metrics JSON with per-stage row counts and removal
fractions — the numbers a data curator actually reports.

Usage (cluster):
    spark-submit --py-files hlld_spark.zip scripts/run_clean_corpus.py \
        --input s3://bucket/web_pages --id-col url --text-col text \
        --eval-table s3://bucket/benchmarks --near-dup \
        --langs en,es,de --output /out/clean --metrics /out/metrics.json

Usage (local smoke):
    python scripts/run_clean_corpus.py --input /tmp/web --output /tmp/clean --cpus 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="web-page table (path or catalog name)")
    ap.add_argument(
        "--input-format",
        default="table",
        choices=["table", "warc", "wet"],
        help="table = parquet/Iceberg (default); warc = Common-Crawl web "
        "archives (response records -> url/warc_ts/html/text via the "
        "deterministic extractor); wet = CC extracted-text archives "
        "(conversion records -> url/warc_ts/text)",
    )
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument(
        "--extract-main-text",
        action="store_true",
        help="derive the text column from an html column first via "
        "jusText-style boilerplate removal (operators/boilerplate.py): "
        "nav/footer/sidebar link walls and stopword-free blocks drop, "
        "content paragraphs survive",
    )
    ap.add_argument("--html-col", default="html",
                    help="html column for --extract-main-text")
    ap.add_argument(
        "--fix-encoding",
        action="store_true",
        help="repair utf-8-as-cp1252/latin-1 mojibake in the text "
        "column before any content stage (operators/encoding.py) so "
        "corrupted refetches collapse with their clean twins in dedup",
    )
    ap.add_argument(
        "--unescape-html",
        action="store_true",
        help="decode HTML entities (&amp; &#233; &#x27; and the named "
        "table) left in the text layer by extraction "
        "(operators/encoding.py::with_html_unescape); runs after "
        "encoding repair, before unicode normalization",
    )
    ap.add_argument(
        "--filter-lines",
        action="store_true",
        help="RefinedWeb-style line-wise cleanup before dedup "
        "(operators/text.py::filter_quality_lines): caps-nav, digit-run, "
        "social-counter and short-crumb lines drop",
    )
    ap.add_argument(
        "--max-line-removed-frac", type=float, default=None,
        help="with --filter-lines: drop a document entirely when more "
        "than this fraction of its characters were junk lines",
    )
    ap.add_argument(
        "--normalize-unicode",
        default=None,
        choices=["NFC", "NFKC", "NFD", "NFKD"],
        help="unicode-normalize the text column before any content "
        "hash (operators/normalize.py) so mixed normalization forms "
        "of the same text collapse in dedup",
    )
    ap.add_argument(
        "--dedup-lines",
        action="store_true",
        help="remove repeated lines WITHIN each document, keeping the "
        "first occurrence (row-local, zero shuffle)",
    )
    ap.add_argument(
        "--dedup-paragraphs",
        action="store_true",
        help="corpus-wide CCNet-style paragraph dedup: duplicate "
        "paragraphs keep one least-(id,pos) occurrence; empty lines "
        "pass through",
    )
    ap.add_argument(
        "--canonicalize-urls",
        action="store_true",
        help="rewrite the id column to its canonical URL form before "
        "dedup (strip tracking params / fragments / default ports, sort "
        "params — operators/urls.py), collapsing refetch families",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument("--metrics", default=None, help="metrics JSON path (default: <output>_metrics.json)")
    ap.add_argument("--near-dup", action="store_true", help="also MinHash-LSH near-dup dedup")
    ap.add_argument(
        "--near-dup-unit",
        default="token",
        choices=["token", "char"],
        help="minhash shingle unit (token = SlimPajama/RefinedWeb-style "
        "token n-grams, the production web-dedup convention — default r5)",
    )
    ap.add_argument("--near-dup-k", type=int, default=None,
                    help="shingle size (default: 5 chars / 5 tokens)")
    ap.add_argument("--near-dup-threshold", type=float, default=0.8,
                    help="estimated-Jaccard threshold for near-dup clustering")
    ap.add_argument(
        "--near-dup-mode",
        default="pointer",
        choices=["pointer", "cc"],
        help="cluster closure: pointer = 2-round pointer jumping "
        "(cheap, covers chains ≤4 links); cc = exact connected "
        "components (large-star/small-star fixpoint — any chain depth)",
    )
    ap.add_argument("--eval-table", default=None, help="benchmark table to decontaminate against")
    ap.add_argument("--eval-text-col", default=None)
    ap.add_argument("--decontaminate-n", type=int, default=13)
    ap.add_argument(
        "--decontaminate-unit",
        default="token",
        choices=["token", "char"],
        help="n-gram unit: token (the published 13-token rule, default) or char",
    )
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--max-dup-word-ratio", type=float, default=0.7)
    ap.add_argument(
        "--quality-model", default=None,
        help="path to a trained classifier model parquet (or a fixture "
        "dir containing model.parquet) — score docs with the "
        "fastText-style hashed-feature LR (operators/quality.py) and "
        "keep those >= --min-model-quality",
    )
    ap.add_argument("--min-model-quality", type=float, default=0.5)
    ap.add_argument(
        "--dsir-target", default=None,
        help="target-distribution table for DSIR importance resampling "
        "(operators/dsir.py): keep --dsir-k docs drawn ∝ softmax of the "
        "hashed-n-gram log-likelihood ratio vs this corpus",
    )
    ap.add_argument("--dsir-k", type=int, default=None)
    ap.add_argument("--dsir-seed", type=int, default=0)
    ap.add_argument(
        "--write-megatron", default=None, metavar="DIR",
        help="ALSO export the survivors as Megatron-layout .bin/.idx "
        "shards + manifest (sources/indexed_dataset.py); token ids come "
        "from the 16-bit md5 hash tokenizer (swap in learned BPE ids "
        "upstream for production training)",
    )
    ap.add_argument("--megatron-shards", type=int, default=64)
    ap.add_argument(
        "--max-ppl", type=float, default=None,
        help="drop docs whose self-scored stupid-backoff trigram "
        "perplexity (operators/lm.py) exceeds this (noise filter)",
    )
    ap.add_argument(
        "--min-ppl", type=float, default=0.0,
        help="with --max-ppl: also drop docs BELOW this (boilerplate)",
    )
    ap.add_argument(
        "--ppl-min-count", type=int, default=2,
        help="prune bigram/trigram counts below this before scoring "
        "(KenLM/CCNet convention; without pruning, self-scoring is "
        "degenerate — every doc's own singleton trigrams score ~1)",
    )
    ap.add_argument(
        "--redact-pii", action="store_true",
        help="final scrub: replace emails/IPv4/phones in the text "
        "column with placeholder tokens (operators/pii.py); match "
        "totals are recorded in the metrics JSON",
    )
    ap.add_argument(
        "--remove-dup-spans", type=int, default=None, metavar="SPAN",
        help="cut every SPAN-char substring occurring in >=2 docs from "
        "the text (Lee et al. exact-substring dedup with REMOVAL; "
        "operators/dedup.py::remove_duplicated_spans) — runs after "
        "exact/near-dup dedup, before quality scoring",
    )
    ap.add_argument(
        "--blocklist", default=None,
        help="comma-separated blocklist terms (C4 bad-words stage): "
        "drop docs with more than --blocklist-max-hits matches",
    )
    ap.add_argument("--blocklist-max-hits", type=int, default=0)
    ap.add_argument(
        "--stratified-sample", default=None,
        help="per-lang keep fractions 'en=0.1,de=0.5' (unlisted langs "
        "keep everything) — deterministic md5-threshold membership on "
        "the id column; requires --langs' lang_id column or a lang "
        "column named by --strata-col",
    )
    ap.add_argument("--strata-col", default="lang")
    ap.add_argument("--sample-seed", type=int, default=0)
    ap.add_argument("--langs", default=None, help="comma-separated lang allowlist (profile lang-id)")
    ap.add_argument("--partition-by", default=None, help="comma-separated output partition columns")
    ap.add_argument("--cpus", type=int, default=None, help="local mode cores (omit under spark-submit)")
    ap.add_argument(
        "--stage-checkpoint-dir",
        default=None,
        help="materialize each stage to <dir>/<stage> and RESUME a killed "
        "run from the longest completed stage prefix (ignored if the "
        "pipeline arguments changed since the checkpoints were written)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hlld_spark.session import get_spark, ship_package
    from hlld_spark.sources.tables import read_table, write_table

    spark = get_spark(app_name="clean-corpus", cpus=args.cpus)
    ship_package(spark)

    from hlld_spark.operators.dedup import dedup_exact, minhash_lsh_dedup
    from hlld_spark.operators.decontaminate import decontaminate
    from hlld_spark.operators.lang_profiles import with_lang_id_profiles
    from hlld_spark.operators.text import with_quality_score, with_repetition_signals

    t0 = time.time()
    metrics: dict = {"input": args.input, "stages": []}

    # ---- per-stage checkpointing (resume a killed run without redoing
    # completed stages — the cleaning-pipeline counterpart of the sketch
    # job's lineage manifests) -------------------------------------------
    import hashlib

    def _input_fingerprint(path: str) -> list:
        """File listing + sizes + mtimes of a LOCAL input — folded into
        the run signature so checkpoints are invalidated when the data
        at --input changes in place (ADVICE r4: same path, new data must
        not silently resume from stale stages). Non-local URIs (s3:// …)
        fall back to the path string — clear the checkpoint dir manually
        when overwriting a remote input."""
        if os.path.isfile(path):
            st = os.stat(path)
            return [[path, st.st_size, st.st_mtime_ns]]
        if not os.path.isdir(path):
            return [path]
        out = []
        for root, _dirs, files in sorted(os.walk(path)):
            for fn in sorted(files):
                st = os.stat(os.path.join(root, fn))
                out.append([os.path.relpath(os.path.join(root, fn), path), st.st_size, st.st_mtime_ns])
        return out

    sig_fields = [
        args.input, args.input_format, args.id_col, args.text_col, args.near_dup,
        args.near_dup_unit, args.near_dup_k, args.near_dup_threshold,
        args.eval_table, args.eval_text_col, args.decontaminate_n,
        args.decontaminate_unit, args.min_quality, args.max_dup_word_ratio,
        args.langs, args.canonicalize_urls, args.near_dup_mode,
        args.extract_main_text, args.html_col,
        args.max_ppl, args.min_ppl, args.ppl_min_count, args.redact_pii,
        args.blocklist, args.blocklist_max_hits, args.stratified_sample,
        args.strata_col, args.sample_seed, args.remove_dup_spans,
        # every stage-shaping flag must be in the signature, else a
        # toggled flag silently resumes checkpoints computed without it
        args.fix_encoding, args.normalize_unicode, args.dedup_lines,
        args.dedup_paragraphs, args.unescape_html, args.filter_lines,
        args.max_line_removed_frac, args.quality_model,
        args.min_model_quality, args.dsir_target, args.dsir_k,
        args.dsir_seed,
        _input_fingerprint(args.input),
        _input_fingerprint(args.eval_table) if args.eval_table else None,
        _input_fingerprint(args.dsir_target) if args.dsir_target else None,
        _input_fingerprint(args.quality_model) if args.quality_model else None,
    ]
    run_sig = hashlib.sha256(json.dumps(sig_fields, default=str).encode()).hexdigest()[:16]
    ckpt_root = args.stage_checkpoint_dir

    def _ckpt_path(name: str) -> str:
        return os.path.join(ckpt_root, name)

    def _ckpt_complete(name: str) -> bool:
        d = _ckpt_path(name)
        return (
            os.path.exists(os.path.join(d, "_SUCCESS"))
            and os.path.exists(os.path.join(d, "_RUN_SIG"))
            and open(os.path.join(d, "_RUN_SIG")).read().strip() == run_sig
        )

    stage_order = (
        (["extract_main_text"] if args.extract_main_text else [])
        + (["fix_encoding"] if args.fix_encoding else [])
        + (["unescape_html"] if args.unescape_html else [])
        + (["normalize_unicode"] if args.normalize_unicode else [])
        + (["filter_lines"] if args.filter_lines else [])
        + (["canonicalize_urls"] if args.canonicalize_urls else [])
        + ["exact_dedup"]
        + (["dedup_lines"] if args.dedup_lines else [])
        + (["dedup_paragraphs"] if args.dedup_paragraphs else [])
        + (["near_dup_dedup"] if args.near_dup else [])
        + (["decontaminate"] if args.eval_table else [])
        + (["remove_dup_spans"] if args.remove_dup_spans else [])
        + ["quality_filter"]
        + (["quality_model_filter"] if args.quality_model else [])
        + (["blocklist_filter"] if args.blocklist else [])
        + (["ppl_filter"] if args.max_ppl is not None else [])
        + (["lang_filter"] if args.langs else [])
        + (["dsir_resample"] if args.dsir_target else [])
        + (["stratified_sample"] if args.stratified_sample else [])
        + (["redact_pii"] if args.redact_pii else [])
    )
    # resume only a PREFIX of completed stages — an orphan checkpoint of
    # a later stage (earlier one missing/corrupt) is recomputed
    completed_prefix: list = []
    if ckpt_root:
        for s in stage_order:
            if _ckpt_complete(s):
                completed_prefix.append(s)
            else:
                break
        if completed_prefix:
            print(f"[clean-corpus] resuming after completed stages: {completed_prefix}")

    def stage(name: str, df, note: str = ""):
        n = df.count()
        prev = metrics["stages"][-1]["rows"] if metrics["stages"] else None
        entry = {"stage": name, "rows": n, "note": note}
        if prev:
            entry["removed"] = prev - n
            entry["removed_frac"] = round((prev - n) / prev, 6) if prev else 0.0
        metrics["stages"].append(entry)
        print(f"[clean-corpus] {name}: {n} rows" + (f" (-{entry.get('removed', 0)})" if prev else ""))
        return df

    def run_stage(name: str, fn, note: str = ""):
        """Run (or resume) one named stage over the current `docs`."""
        nonlocal docs
        if ckpt_root and name in completed_prefix:
            docs = spark.read.parquet(_ckpt_path(name))
            stage(name, docs, note + " [resumed from checkpoint]")
            return
        out = fn(docs)
        if ckpt_root:
            d = _ckpt_path(name)
            out.write.mode("overwrite").parquet(d)
            with open(os.path.join(d, "_RUN_SIG"), "w") as f:
                f.write(run_sig)
            out = spark.read.parquet(d)  # cut lineage; downstream reads the materialization
        else:
            out = out.cache()
        docs = out
        stage(name, docs, note)

    if args.input_format == "warc":
        from hlld_spark.sources.warc import warc_to_web_pages

        docs = warc_to_web_pages(spark, args.input)
    elif args.input_format == "wet":
        from hlld_spark.sources.warc import read_wet

        docs = read_wet(spark, args.input)
    else:
        docs = read_table(spark, args.input)
    docs = stage("input", docs)

    # -1. main-text extraction (optional): boilerplate-stripped text
    # replaces the text column before any content-based stage
    if args.extract_main_text:
        from hlld_spark.operators.boilerplate import extract_main_text

        run_stage(
            "extract_main_text",
            lambda d: extract_main_text(d, args.html_col, out_col=args.text_col),
            "jusText-style block classification over " + args.html_col,
        )

    # -0.5 encoding repair (optional): invert mojibake so a corrupted
    # refetch exact-matches its clean twin in the dedup stages
    if args.fix_encoding:
        from hlld_spark.operators.encoding import with_encoding_repair

        run_stage(
            "fix_encoding",
            lambda d: with_encoding_repair(d, args.text_col)
            .drop(args.text_col)
            .withColumnRenamed("text_fixed", args.text_col)
            .drop("mojibake_rounds"),
            "sloppy-cp1252 inversion of utf-8 mojibake",
        )

    # -0.45 HTML entity decode (optional): extraction leaves &amp; etc.
    # in the text layer; decode before normalization and hashing
    if args.unescape_html:
        from hlld_spark.operators.encoding import with_html_unescape

        run_stage(
            "unescape_html",
            lambda d: with_html_unescape(d, args.text_col),
            "html.unescape with C-speed '&' prefilter",
        )

    # -0.4 unicode normalization (optional): NFC/NFKC so normalization
    # variants of the same text share a content hash downstream
    if args.normalize_unicode:
        from hlld_spark.operators.normalize import with_unicode_normalization

        run_stage(
            "normalize_unicode",
            lambda d: with_unicode_normalization(
                d, args.text_col, args.normalize_unicode
            ),
            f"{args.normalize_unicode} via unicodedata (is_normalized fast path)",
        )

    # -0.3 line-wise corrections (optional, RefinedWeb §3.3): junk
    # lines drop BEFORE dedup so cleaned texts share content hashes
    if args.filter_lines:
        from hlld_spark.operators.text import filter_quality_lines

        run_stage(
            "filter_lines",
            lambda d: filter_quality_lines(
                d, args.text_col, max_removed_frac=args.max_line_removed_frac
            ).drop("removed_char_frac"),
            "caps-nav/digit-run/counter/crumb lines dropped"
            + (
                f"; docs >{args.max_line_removed_frac} junk dropped"
                if args.max_line_removed_frac is not None
                else ""
            ),
        )

    # 0. URL canonicalization (optional): refetch families
    # (utm params, fragments, default ports, scheme/host case) collapse
    # to one id BEFORE content dedup
    if args.canonicalize_urls:
        from hlld_spark.operators.urls import canonical_url_col

        run_stage(
            "canonicalize_urls",
            lambda d: d.withColumn(args.id_col, canonical_url_col(F.col(args.id_col))),
            "tracking params/fragments/default ports stripped, params sorted",
        )

    # 1. exact dedup — keeper = min id per content hash
    run_stage(
        "exact_dedup",
        # canonicalization makes refetches share an id: unique_ids=False
        # keeps exactly one row per keeper id in that mode
        lambda d: dedup_exact(
            d, args.id_col, [args.text_col], unique_ids=not args.canonicalize_urls
        ),
        "content-hash min-id keepers",
    )

    # 1.3 within-doc line dedup (optional, row-local)
    if args.dedup_lines:
        from hlld_spark.operators.dedup import dedup_lines_within_doc

        run_stage(
            "dedup_lines",
            lambda d: dedup_lines_within_doc(d, args.text_col),
            "repeated lines within a doc dropped (first kept)",
        )

    # 1.6 corpus-wide paragraph dedup (optional, CCNet-style)
    if args.dedup_paragraphs:
        from hlld_spark.operators.dedup import dedup_paragraphs

        run_stage(
            "dedup_paragraphs",
            lambda d: dedup_paragraphs(d, args.id_col, args.text_col),
            "global boilerplate paragraphs keep one least-(id,pos) copy",
        )

    # 2. near-dup dedup (optional)
    if args.near_dup:

        def near_dup(d):
            if args.near_dup_mode == "cc":
                from hlld_spark.operators.cluster import minhash_cluster_dedup

                labels = minhash_cluster_dedup(
                    d,
                    args.id_col,
                    args.text_col,
                    shingle_k=args.near_dup_k or 5,
                    shingle_unit=args.near_dup_unit,
                    threshold=args.near_dup_threshold,
                )
            else:
                labels = minhash_lsh_dedup(
                    d,
                    args.id_col,
                    args.text_col,
                    shingle_k=args.near_dup_k or 5,
                    shingle_unit=args.near_dup_unit,
                    threshold=args.near_dup_threshold,
                )
            keepers = labels.filter(F.col("id") == F.col("keeper_id")).select(
                F.col("id").alias(args.id_col)
            )
            return d.join(keepers, args.id_col, "left_semi")

        run_stage(
            "near_dup_dedup",
            near_dup,
            f"MinHash LSH + pairwise verify ({args.near_dup_mode} closure)",
        )

    # 3. decontamination (optional)
    if args.eval_table:

        def decon(d):
            ev = read_table(spark, args.eval_table)
            flagged = decontaminate(
                d,
                ev,
                args.id_col,
                args.text_col,
                eval_text_col=args.eval_text_col,
                n=args.decontaminate_n,
                unit=args.decontaminate_unit,
            )
            return d.join(flagged.select(args.id_col), args.id_col, "left_anti")

        run_stage(
            "decontaminate",
            decon,
            f"{args.decontaminate_n}-{args.decontaminate_unit}-gram overlap vs {args.eval_table}",
        )

    # 3b. exact-substring span removal (optional, row-preserving):
    # boilerplate passages shared across documents get CUT
    if args.remove_dup_spans:
        from hlld_spark.operators.dedup import remove_duplicated_spans

        run_stage(
            "remove_dup_spans",
            lambda d: remove_duplicated_spans(
                d, args.id_col, args.text_col, span=args.remove_dup_spans
            ),
            f"cut {args.remove_dup_spans}-char spans shared by >=2 docs",
        )

    # 4. quality + repetition thresholds (pure Catalyst — no extra pass)
    run_stage(
        "quality_filter",
        lambda d: with_repetition_signals(with_quality_score(d, args.text_col), args.text_col).filter(
            (F.col("quality_score") >= args.min_quality)
            & (F.col("dup_word_ratio") <= args.max_dup_word_ratio)
        ),
        f"quality>={args.min_quality}, dup_word_ratio<={args.max_dup_word_ratio}",
    )

    # 4a-. model-based quality filter (optional): fastText-style hashed
    # LR classifier scores (broadcast weight join, pure Catalyst)
    if args.quality_model:
        from hlld_spark.operators.quality import filter_by_quality

        mp = args.quality_model
        if os.path.isdir(mp) and os.path.exists(os.path.join(mp, "model.parquet")):
            mp = os.path.join(mp, "model.parquet")
        model = spark.read.parquet(mp)

        run_stage(
            "quality_model_filter",
            lambda d: filter_by_quality(
                d, model, args.min_model_quality,
                id_col=args.id_col, text_col=args.text_col,
            ),
            f"classifier score >= {args.min_model_quality}",
        )

    # 4a. blocklist filter (optional): C4-style bad-words drop
    if args.blocklist:
        from hlld_spark.operators.sampling import filter_blocklist

        terms = [t.strip() for t in args.blocklist.split(",") if t.strip()]
        run_stage(
            "blocklist_filter",
            lambda d: filter_blocklist(
                d, args.text_col, terms, max_hits=args.blocklist_max_hits
            ),
            f"{len(terms)} terms, max_hits={args.blocklist_max_hits}",
        )

    # 4b. perplexity filter (optional): stupid-backoff trigram LM
    # self-trained on the SURVIVORS so far — boilerplate scores too low,
    # noise too high
    if args.max_ppl is not None:
        from hlld_spark.operators.lm import perplexity_filter

        run_stage(
            "ppl_filter",
            lambda d: perplexity_filter(
                d, args.id_col, args.text_col,
                max_ppl=args.max_ppl, min_ppl=args.min_ppl,
                min_count=args.ppl_min_count,
            ),
            f"self-scored trigram ppl in [{args.min_ppl}, {args.max_ppl}] "
            f"(min_count={args.ppl_min_count})",
        )

    # 5. language allowlist (optional)
    if args.langs:
        allow = [x.strip() for x in args.langs.split(",") if x.strip()]
        run_stage(
            "lang_filter",
            lambda d: with_lang_id_profiles(d, args.text_col).filter(F.col("lang_id").isin(allow)),
            f"allow {allow}",
        )

    # 5a. DSIR importance resampling (optional): draw --dsir-k docs
    # ∝ softmax of the hashed-n-gram LLR vs the target distribution
    if args.dsir_target:
        if not args.dsir_k:
            ap.error("--dsir-target requires --dsir-k")
        from hlld_spark.operators.dsir import (
            dsir_logratio_table,
            dsir_resample,
            hashed_ngram_counts,
            with_importance_weights,
        )

        def dsir(d):
            tgt = read_table(spark, args.dsir_target)
            tab = dsir_logratio_table(
                hashed_ngram_counts(tgt, args.text_col),
                hashed_ngram_counts(d, args.text_col),
            )
            w = with_importance_weights(
                d, tab, id_col=args.id_col, text_col=args.text_col
            )
            return dsir_resample(
                d, w, args.dsir_k, id_col=args.id_col, seed=args.dsir_seed
            )

        run_stage(
            "dsir_resample",
            dsir,
            f"Gumbel-top-{args.dsir_k} vs {args.dsir_target} (seed {args.dsir_seed})",
        )

    # 5b. stratified down-sampling (optional): deterministic per-lang
    # keep fractions — md5-threshold membership, rerun-stable
    if args.stratified_sample:
        from hlld_spark.operators.sampling import stratified_sample

        fracs = {}
        for part in args.stratified_sample.split(","):
            lang_v, frac = part.split("=")
            fracs[lang_v.strip()] = float(frac)
        run_stage(
            "stratified_sample",
            lambda d: stratified_sample(
                d, args.id_col, args.strata_col, fracs, seed=args.sample_seed
            ),
            f"{fracs} on {args.strata_col} (seed {args.sample_seed})",
        )

    # 6. PII scrub (optional, row-preserving): redact + audit totals
    if args.redact_pii:
        from hlld_spark.operators.pii import pii_stats, redact_pii

        stats = {
            r["kind"]: {
                "total_matches": r["total_matches"],
                "docs_affected": r["docs_affected"],
            }
            for r in pii_stats(docs, args.text_col).collect()
        }
        metrics["pii"] = stats
        run_stage(
            "redact_pii",
            lambda d: redact_pii(d, args.text_col),
            "emails/IPv4/phones -> placeholder tokens",
        )

    fmt = write_table(
        docs,
        args.output,
        partition_by=args.partition_by.split(",") if args.partition_by else None,
    )
    metrics["output"] = args.output
    metrics["format"] = fmt

    # optional trainer-format export: Megatron-layout .bin/.idx shards
    # (in ADDITION to the table output, which keeps the text columns)
    if args.write_megatron:
        from hlld_spark.operators.dsir import _tokens
        from hlld_spark.sources.indexed_dataset import write_indexed_dataset

        toks = F.transform(
            _tokens(F.col(args.text_col)),
            lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int"),
        )
        ds = docs.select(
            F.pmod(F.xxhash64(F.col(args.id_col)), F.lit(2**62)).alias("doc_id"),
            toks.alias("tokens"),
        )
        man = write_indexed_dataset(
            ds, args.write_megatron, n_shards=args.megatron_shards
        )
        agg = man.agg(
            F.count("*").alias("shards"),
            F.sum("n_docs").alias("docs"),
            F.sum("n_tokens").alias("tokens"),
        ).collect()[0]
        metrics["megatron"] = {
            "dir": args.write_megatron,
            "shards": int(agg["shards"]),
            "docs": int(agg["docs"]),
            "tokens": int(agg["tokens"]),
        }
        print(
            f"[clean-corpus] megatron export: {agg['docs']} docs / "
            f"{agg['tokens']} tokens in {agg['shards']} shards → {args.write_megatron}"
        )
    metrics["wall_sec"] = round(time.time() - t0, 3)
    if metrics["stages"]:
        first, last = metrics["stages"][0]["rows"], metrics["stages"][-1]["rows"]
        metrics["kept_frac"] = round(last / first, 6) if first else 0.0

    mpath = args.metrics or (args.output.rstrip("/") + "_metrics.json")
    with open(mpath, "w") as f:
        json.dump(metrics, f, indent=2)
    print(f"[clean-corpus] done in {metrics['wall_sec']}s; kept {metrics.get('kept_frac')} → {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
