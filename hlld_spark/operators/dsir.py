"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023) over hashed n-gram features, pure Catalyst.

The standard pretraining-mix selection step: given a small TARGET
corpus (the distribution you want, e.g. high-quality English) and a
large RAW corpus, fit bag-of-hashed-n-gram unigram models to both,
weight every raw document by the log-likelihood ratio

    logw(d) = sum over grams g of d  [ ln p_target(b(g)) - ln p_raw(b(g)) ]

and resample k documents via the Gumbel-top-k trick, which draws k
docs WITHOUT replacement with probability proportional to softmax of
their weights.

Every stage is engine-portable by construction, so the driver gate
checks EXACT selection membership, not just counts:

* tokenization is a whitespace split with empties filtered;
* the feature hash is ``substr(md5(gram), 1, prefix_len)`` — the
  bucket KEY stays a hex string (B = 16^prefix_len buckets), so no
  integer conversion is needed and Spark/DuckDB agree byte-for-byte;
* bucket models use additive smoothing
  ``p[b] = (c[b] + alpha) / (N + alpha * B)``;
* the Gumbel noise is a PURE FUNCTION of (id, seed):
  ``u = (0x<first 12 md5 hex> + 0.5) / 16^12`` and
  ``g = -ln(-ln(u))`` — no RNG state, identical across engines and
  reruns (same determinism contract as operators/sampling.py).

Scale shape: both bucket-count tables are bounded by B (65 536 at the
default prefix_len=4) — they broadcast. Scoring explodes grams and
joins the BROADCAST log-ratio table, then partial-aggregates per doc:
the only exchange carries (id, double) scalars, never document text.
Selection is a global top-k (TakeOrderedAndProject, k rows on the
driver) and the final attach is a broadcast LEFT SEMI join — payload
columns never cross an exchange end to end.

Reference scope note: armon/hlld has nothing comparable; this module
belongs to the LLM-data-pipeline layer of the brief.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

_GUMBEL_HEX = 12  # 48 bits of md5 -> exact double, no rounding
_GUMBEL_SPACE = float(16 ** _GUMBEL_HEX)


def _tokens(text_col: Column) -> Column:
    return F.filter(
        F.split(F.trim(text_col), r"\s+"), lambda x: F.length(x) > 0
    )


def _gram_buckets(text_col: Column, prefix_len: int, n: int) -> Column:
    """Array of hashed n-gram bucket keys (hex prefixes of md5) for all
    orders 1..n. Bigrams pair each token with its successor via two
    shifted slices zipped together."""
    toks = _tokens(text_col)
    parts = [toks]
    if n >= 2:
        m = F.greatest(F.size(toks) - 1, F.lit(0))
        bigrams = F.zip_with(
            F.slice(toks, 1, m),
            F.slice(toks, 2, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        parts.append(bigrams)
    if n > 2:
        raise ValueError("only n <= 2 (unigram+bigram) hashed features supported")
    grams = parts[0] if len(parts) == 1 else F.concat(*parts)
    return F.transform(grams, lambda g: F.substring(F.md5(g), 1, prefix_len))


def hashed_ngram_counts(
    df: DataFrame, text_col: str = "text", prefix_len: int = 4, n: int = 2
) -> DataFrame:
    """Bucket-count table ``(bucket, cnt)`` for a corpus — at most
    16^prefix_len rows regardless of corpus size (map-side partial
    aggregation absorbs the explode; the exchange carries (hex4, long)
    pairs only)."""
    ex = df.select(
        F.explode(_gram_buckets(F.col(text_col), prefix_len, n)).alias("bucket")
    )
    return ex.groupBy("bucket").agg(F.count("*").alias("cnt"))


def dsir_logratio_table(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    prefix_len: int = 4,
    alpha: float = 1.0,
) -> DataFrame:
    """Join the two bounded bucket tables into ``(bucket, logratio)``
    with additive smoothing. Missing-on-one-side buckets coalesce to
    count 0; buckets unseen in BOTH corpora carry the constant
    ``ln(alpha/(Nt+aB)) - ln(alpha/(Nr+aB))`` — expose it via
    :func:`dsir_default_logratio` for scoring-time coalescing."""
    b_space = float(16 ** prefix_len)
    t = target_counts.groupBy().agg(F.sum("cnt").alias("nt"))
    r = raw_counts.groupBy().agg(F.sum("cnt").alias("nr"))
    joined = (
        target_counts.withColumnRenamed("cnt", "ct")
        .join(raw_counts.withColumnRenamed("cnt", "cr"), "bucket", "full_outer")
        .crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(r))
    )
    ct = F.coalesce(F.col("ct"), F.lit(0)).cast("double")
    cr = F.coalesce(F.col("cr"), F.lit(0)).cast("double")
    ratio = (
        F.log((ct + F.lit(alpha)) / (F.col("nt") + F.lit(alpha * b_space)))
        - F.log((cr + F.lit(alpha)) / (F.col("nr") + F.lit(alpha * b_space)))
    )
    return joined.select("bucket", ratio.alias("logratio"))


def dsir_default_logratio(nt: int, nr: int, prefix_len: int = 4, alpha: float = 1.0) -> float:
    """Log-ratio of a bucket unseen in both corpora (count 0 each)."""
    b_space = float(16 ** prefix_len)
    return math.log(alpha / (nt + alpha * b_space)) - math.log(
        alpha / (nr + alpha * b_space)
    )


def with_importance_weights(
    df: DataFrame,
    logratio: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_col: str = "dsir_logw",
    prefix_len: int = 4,
    n: int = 2,
    default_logratio: float = 0.0,
) -> DataFrame:
    """Per-document importance weights ``(id, weight)``: explode the
    doc's gram buckets, broadcast-join the bounded log-ratio table,
    sum per doc. Returns the weights table ONLY (ids + a double) — the
    caller attaches or semi-joins, so document payloads never ride
    this exchange (the dedup.py keeper-table convention). Docs with
    zero tokens are absent (their weight is undefined)."""
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.explode(_gram_buckets(F.col(text_col), prefix_len, n)).alias("bucket"),
    )
    joined = ex.join(F.broadcast(logratio), "bucket", "left")
    return (
        joined.groupBy("__id")
        .agg(
            F.sum(
                F.coalesce(F.col("logratio"), F.lit(float(default_logratio)))
            ).alias(weight_col)
        )
        .withColumnRenamed("__id", id_col)
    )


def gumbel_col(id_col: Column, seed: int = 0) -> Column:
    """Deterministic standard-Gumbel noise: a pure function of
    (id, seed) through md5 — identical in Spark and DuckDB
    (``('0x' || substr(md5(...),1,12))::UBIGINT`` on the oracle side).
    u in (0,1) strictly, so both logs are finite."""
    hx = F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}"))), 1, _GUMBEL_HEX)
    x = F.conv(hx, 16, 10).cast("double")
    u = (x + F.lit(0.5)) / F.lit(_GUMBEL_SPACE)
    return -F.log(-F.log(u))


def dsir_resample(
    df: DataFrame,
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "dsir_logw",
    seed: int = 0,
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-k resampling: keep the k docs maximizing
    ``logw/temperature + Gumbel(id, seed)`` — a draw of k WITHOUT
    replacement proportional to softmax(logw/temperature). The top-k
    is a TakeOrderedAndProject (k rows to the driver) and the attach
    is a broadcast LEFT SEMI — no payload exchange. Ties broken by id
    for determinism."""
    scored = weights.select(
        F.col(id_col),
        (F.col(weight_col) / F.lit(float(temperature)) + gumbel_col(F.col(id_col), seed)).alias("__score"),
    )
    sel = scored.orderBy(F.desc("__score"), F.col(id_col)).limit(int(k)).select(id_col)
    return df.join(F.broadcast(sel), id_col, "left_semi")
