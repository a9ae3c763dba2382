"""Distributed n-gram language model with stupid backoff + perplexity.

The CCNet-style quality signal for web corpora: train token-trigram
counts over a (clean) corpus, score every document's tokens with stupid
backoff (Brants et al. 2007, "Large Language Models in Machine
Translation" — the scheme built precisely for distributed trillion-token
counts: no discounting pass, score = relative frequency with a fixed
α-penalty per backoff level), and filter by perplexity. Documents whose
perplexity under the corpus model is extreme are boilerplate (too low)
or noise (too high) — the CCNet head/middle/tail split.

Spark-first shape: tokenization and per-position gram construction are
array expressions inside whole-stage codegen (``transform`` over the
token array — no window shuffle for neighbors); counts are
partial-aggregated groupBys of the gram streams; scoring is 5 equi-joins
of the position stream against the count tables (trigram, bigram ×2
keys, unigram ×2 keys). At web scale the count tables are the small
side after ``min_count`` pruning — broadcast them (``broadcast_counts``)
and the position stream never shuffles until the final per-doc
aggregation.

Scoring semantics (deterministic, oracle-exact):
  m_i = min(order, i+1)           # highest order available at position i
  S_i = c_k(gram_k) / c_{k-1}(context_k) for the LONGEST k ≤ m_i with
        c_k > 0 (k=1 denominator is the corpus token total N)
  penalty = α^(m_i - k); unseen unigram: S = α^(m_i - 1) · α / N
  avg_logp = mean over positions of log10(penalty · S_i)
  ppl = 10^(-avg_logp)

Reference scope note: armon/hlld has no LM; this is the LLM-pipeline
layer (SURVEY §2 companions), sharing the tokenizer with
operators/ranking.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .ranking import tokens_col

DEFAULT_ALPHA = 0.4


def _pos_stream(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per token position with the gram/context strings needed
    for trigram stupid backoff — built array-side (no neighbor window,
    no shuffle): (id, i, w, big, ctx3, ctx1, tri)."""
    return (
        df.select(F.col(id_col), tokens_col(text_col).alias("t"))
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(t, (w, i) -> struct("
                    "  i AS i, w AS w,"
                    "  CASE WHEN i >= 1 THEN concat(t[i-1], ' ', w) END AS big,"
                    "  CASE WHEN i >= 2 THEN concat(t[i-2], ' ', t[i-1]) END AS ctx3,"
                    "  CASE WHEN i >= 1 THEN t[i-1] END AS ctx1,"
                    "  CASE WHEN i >= 2 THEN concat(t[i-2], ' ', t[i-1], ' ', w) END AS tri))"
                )
            ).alias("s"),
        )
        .select(id_col, "s.i", "s.w", "s.big", "s.ctx3", "s.ctx1", "s.tri")
    )


def ngram_counts(
    df: DataFrame, text_col: str, order: int, min_count: int = 1
) -> DataFrame:
    """Corpus counts of space-joined token ``order``-grams → (gram, c).
    Partial-aggregated: the exchange carries distinct grams per task.
    ``min_count`` pruning is the 100-TB knob — it bounds the count
    table to the broadcastable head (backed-off mass covers the tail,
    which is exactly stupid backoff's design point)."""
    toks = df.select(tokens_col(text_col).alias("t"))
    grams = toks.select(
        F.explode(
            F.expr(
                f"filter(transform(t, (w, i) -> CASE WHEN i >= {order - 1} THEN "
                f"array_join(slice(t, i - {order - 2}, {order}), ' ') END), "
                "g -> g IS NOT NULL)"
            )
        ).alias("gram")
    )
    out = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
    if min_count > 1:
        out = out.where(F.col("c") >= min_count)
    return out


def train_stupid_backoff(
    df: DataFrame, text_col: str, min_count: int = 1
) -> dict[int, DataFrame]:
    """Count tables {1: unigrams, 2: bigrams, 3: trigrams} for
    :func:`stupid_backoff_scores`. Unigrams are never pruned (they are
    the backstop distribution); higher orders honor ``min_count``."""
    return {
        1: ngram_counts(df, text_col, 1),
        2: ngram_counts(df, text_col, 2, min_count),
        3: ngram_counts(df, text_col, 3, min_count),
    }


def stupid_backoff_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    counts: dict[int, DataFrame],
    total_tokens: int,
    alpha: float = DEFAULT_ALPHA,
    broadcast_counts: bool = False,
    round_digits: int | None = None,
) -> DataFrame:
    """Per-document stupid-backoff score → (id, n_tokens, avg_logp,
    ppl). ``total_tokens`` is the training corpus token total N (compute
    once: ``counts[1].agg(sum("c"))``). Set ``broadcast_counts`` when
    the pruned count tables fit in executor memory — the position
    stream then never shuffles before the final per-doc aggregation."""
    mark = F.broadcast if broadcast_counts else (lambda d: d)
    c1 = mark(counts[1].select(F.col("gram").alias("w"), F.col("c").alias("c1w")))
    c1x = mark(counts[1].select(F.col("gram").alias("ctx1"), F.col("c").alias("c1x")))
    c2 = mark(counts[2].select(F.col("gram").alias("big"), F.col("c").alias("c2b")))
    c2x = mark(counts[2].select(F.col("gram").alias("ctx3"), F.col("c").alias("c2x")))
    c3 = mark(counts[3].select(F.col("gram").alias("tri"), F.col("c").alias("c3t")))

    pos = _pos_stream(docs, id_col, text_col)
    j = (
        pos.join(c3, "tri", "left")
        .join(c2x, "ctx3", "left")
        .join(c2, "big", "left")
        .join(c1x, "ctx1", "left")
        .join(c1, "w", "left")
    )
    m = F.least(F.lit(3), F.col("i") + 1)
    n_tot = F.lit(float(total_tokens))
    score = (
        F.when(
            F.col("c3t").isNotNull() & F.col("c2x").isNotNull(),
            F.col("c3t") / F.col("c2x"),
        )
        .when(
            F.col("c2b").isNotNull() & F.col("c1x").isNotNull(),
            F.pow(F.lit(alpha), m - 2) * F.col("c2b") / F.col("c1x"),
        )
        .when(
            F.col("c1w").isNotNull(),
            F.pow(F.lit(alpha), m - 1) * F.col("c1w") / n_tot,
        )
        .otherwise(F.pow(F.lit(alpha), m - 1) * F.lit(alpha) / n_tot)
    )
    per_doc = j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg(F.log10(score)).alias("avg_logp"),
    )
    out = per_doc.withColumn("ppl", F.pow(F.lit(10.0), -F.col("avg_logp")))
    if round_digits is not None:
        out = out.withColumn("avg_logp", F.round("avg_logp", round_digits)).withColumn(
            "ppl", F.round("ppl", round_digits)
        )
    return out


def perplexity_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = DEFAULT_ALPHA,
    min_count: int = 1,
    broadcast_counts: bool = False,
    round_digits: int | None = None,
) -> DataFrame:
    """Self-scored corpus perplexity: train on ``df``, score ``df`` —
    the one-corpus form of the CCNet quality signal."""
    counts = train_stupid_backoff(df, text_col, min_count)
    total = counts[1].agg(F.sum("c")).collect()[0][0] or 0
    return stupid_backoff_scores(
        df, id_col, text_col, counts, total, alpha, broadcast_counts, round_digits
    )


def perplexity_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_ppl: float,
    min_ppl: float = 0.0,
    **kwargs,
) -> DataFrame:
    """Keep documents whose self-scored corpus perplexity lies in
    [min_ppl, max_ppl] — drop boilerplate (below) and noise (above)."""
    scores = perplexity_scores(df, id_col, text_col, **kwargs)
    keep = scores.where(
        (F.col("ppl") >= min_ppl) & (F.col("ppl") <= max_ppl)
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# broadcast-kernel scale path (r6): no joins, no position explosion
# ---------------------------------------------------------------------------
#
# The join formulation above is oracle-friendly but at web scale its
# cost is 5 string-keyed joins over a ~50x-exploded position stream —
# measured 35k docs/s on 4M docs. The kernel path is the engine's
# decontaminate-style design: count tables live as SORTED uint64 hash
# arrays broadcast to every worker, and ONE mapInPandas pass scores all
# positions with vectorized searchsorted lookups. Gram hashes come from
# the shared token-shingle kernel (operators/dedup.py), so train and
# score agree by construction; the driver gate still compares against
# the literal-string SQL oracle, which cross-validates the hashing.

import re as _re

from .ranking import TOKEN_PATTERN as _TOKEN_PATTERN

_TOKEN_RE = _re.compile(_TOKEN_PATTERN)


def _normalize_series(texts: "pd.Series") -> "pd.Series":
    import pandas as pd

    return pd.Series(
        [" ".join(_TOKEN_RE.findall((t or "").lower())) for t in texts],
        index=texts.index,
    )


def _gram_hash_counts_kernel(df: DataFrame, text_col: str, order: int) -> DataFrame:
    """(h, c) hashed ``order``-gram counts via the shared token-shingle
    kernel — the hashed twin of :func:`ngram_counts`."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    from .dedup import _token_shingle_hashes

    schema = StructType([StructField("h", LongType(), False)])

    def grams(batches):
        for pdf in batches:
            norm = _normalize_series(pdf[text_col])
            h, offsets, ntoks = _token_shingle_hashes(norm, order)
            if not len(h):
                continue
            # mask the sentinel slot of docs shorter than the order
            keep = np.ones(len(h), dtype=bool)
            short = ntoks < order
            keep[offsets[:-1][short]] = False
            yield pd.DataFrame({"h": h[keep].astype(np.int64)})

    return (
        df.select(text_col)
        .mapInPandas(grams, schema=schema)
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def train_stupid_backoff_hashed(
    df: DataFrame,
    text_col: str,
    min_count: int = 1,
    max_table_rows: int = 50_000_000,
) -> dict:
    """Hashed count tables for the kernel scorer: {order: (sorted
    uint64 hashes, int64 counts)} + ``total_tokens``. The driver
    collect is bounded by the PRUNED distinct-gram count per order
    (``min_count`` is the 100-TB knob; ``max_table_rows`` raises
    instead of silently OOMing — fall back to the join path past it)."""
    import numpy as np

    tables = {}
    total = 0
    for order in (1, 2, 3):
        cdf = _gram_hash_counts_kernel(df, text_col, order)
        if order > 1 and min_count > 1:
            cdf = cdf.where(F.col("c") >= min_count)
        n_rows = cdf.count()
        if n_rows > max_table_rows:
            raise ValueError(
                f"order-{order} table has {n_rows} rows > max_table_rows"
            )
        rows = cdf.collect()
        h = np.array([r["h"] for r in rows], dtype=np.int64).view(np.uint64)
        c = np.array([r["c"] for r in rows], dtype=np.int64)
        o = np.argsort(h)
        tables[order] = (h[o], c[o])
        if order == 1:
            total = int(c.sum())
    return {"tables": tables, "total_tokens": total}


def _lookup(h: "np.ndarray", table) -> "np.ndarray":
    import numpy as np

    th, tc = table
    if not len(th):
        return np.zeros(len(h), dtype=np.int64)
    idx = np.searchsorted(th, h)
    idx_c = np.minimum(idx, len(th) - 1)
    hit = th[idx_c] == h
    return np.where(hit, tc[idx_c], 0)


def stupid_backoff_scores_kernel(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    model: dict,
    alpha: float = DEFAULT_ALPHA,
    round_digits: int | None = None,
) -> DataFrame:
    """Kernel twin of :func:`stupid_backoff_scores`: identical scoring
    semantics, ONE distributed pass, zero joins. Documents with zero
    tokens are omitted (as the join path's explode does)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from .dedup import _token_shingle_hashes

    t1, t2, t3 = model["tables"][1], model["tables"][2], model["tables"][3]
    n_total = float(model["total_tokens"])
    la = float(np.log10(alpha))

    schema = StructType(
        [
            docs.schema[id_col],
            StructField("n_tokens", LongType(), False),
            StructField("avg_logp", DoubleType(), False),
            StructField("ppl", DoubleType(), False),
        ]
    )

    def score(batches):
        for pdf in batches:
            norm = _normalize_series(pdf[text_col])
            h1, o1, ntoks = _token_shingle_hashes(norm, 1)
            h2, o2, _ = _token_shingle_hashes(norm, 2)
            h3, o3, _ = _token_shingle_hashes(norm, 3)
            T = ntoks
            nz = T > 0
            if not nz.any():
                continue
            doc_start = np.concatenate(([0], np.cumsum(T)))[:-1]
            total_pos = int(T.sum())
            pos = np.arange(total_pos) - np.repeat(doc_start[nz], T[nz])
            didx = np.repeat(np.flatnonzero(nz), T[nz])

            def g(h, o, off):
                base = o[didx] + pos - off
                safe = np.maximum(base, 0)
                return h[np.minimum(safe, len(h) - 1)] if len(h) else np.zeros(total_pos, dtype=np.uint64)

            w = g(h1, o1, 0)
            ctx1 = g(h1, o1, 1)
            big = g(h2, o2, 1)
            ctx3 = g(h2, o2, 2)
            tri = g(h3, o3, 2)
            has2 = pos >= 1
            has3 = pos >= 2
            # docs shorter than the order store a sentinel; validity of
            # the window itself needs the doc LONG enough too
            has2 &= np.repeat(T[nz] >= 2, T[nz])
            has3 &= np.repeat(T[nz] >= 3, T[nz])

            c_w = _lookup(w, t1)
            c_x1 = _lookup(ctx1, t1)
            c_b = np.where(has2, _lookup(big, t2), 0)
            c_x3 = np.where(has3, _lookup(ctx3, t2), 0)
            c_t = np.where(has3, _lookup(tri, t3), 0)

            m = np.minimum(pos + 1, 3)
            use3 = (c_t > 0) & (c_x3 > 0)
            use2 = ~use3 & (c_b > 0) & (c_x1 > 0)
            use1 = ~use3 & ~use2 & (c_w > 0)
            lp = np.empty(total_pos)
            with np.errstate(divide="ignore", invalid="ignore"):
                lp[use3] = np.log10(c_t[use3] / c_x3[use3])
                lp[use2] = (m[use2] - 2) * la + np.log10(c_b[use2] / c_x1[use2])
                lp[use1] = (m[use1] - 1) * la + np.log10(c_w[use1] / n_total)
                rest = ~(use3 | use2 | use1)
                lp[rest] = (m[rest] - 1) * la + la - np.log10(n_total)

            bounds = np.concatenate(([0], np.cumsum(T[nz])))[:-1]
            sums = np.add.reduceat(lp, bounds)
            avg = sums / T[nz]
            ppl = np.power(10.0, -avg)
            if round_digits is not None:
                avg = np.round(avg, round_digits)
                ppl = np.round(ppl, round_digits)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[nz],
                    "n_tokens": T[nz],
                    "avg_logp": avg,
                    "ppl": ppl,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(score, schema=schema)
