"""DSIR importance resampling (operators/dsir.py).

Truth direction: a pure-python reference (hashlib + Counter + math,
written from the paper's recipe, sharing no code with the operator)
recomputes bucket models, per-doc log-weights and the Gumbel-top-k
draw; the driver gate replays the whole chain in independent DuckDB
SQL with exact selection membership.
"""

import hashlib
import math
from collections import Counter

import pytest

from hlld_spark.operators.dsir import (
    dsir_default_logratio,
    dsir_logratio_table,
    dsir_resample,
    hashed_ngram_counts,
    with_importance_weights,
)

PREFIX = 4
B = 16 ** PREFIX


def _ref_buckets(text, n=2):
    toks = [t for t in text.strip().split() if t]
    grams = list(toks)
    if n >= 2:
        grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [hashlib.md5(g.encode()).hexdigest()[:PREFIX] for g in grams]


def _ref_counts(texts, n=2):
    c = Counter()
    for t in texts:
        c.update(_ref_buckets(t, n))
    return c


def _ref_logratio(ct, cr, alpha=1.0):
    nt, nr = sum(ct.values()), sum(cr.values())
    out = {}
    for b in set(ct) | set(cr):
        out[b] = math.log((ct[b] + alpha) / (nt + alpha * B)) - math.log(
            (cr[b] + alpha) / (nr + alpha * B)
        )
    default = math.log(alpha / (nt + alpha * B)) - math.log(alpha / (nr + alpha * B))
    return out, default


def _ref_gumbel(doc_id, seed=0):
    hx = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:12]
    u = (int(hx, 16) + 0.5) / 16 ** 12
    return -math.log(-math.log(u))


TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "a quiet morning with fresh coffee and the paper",
    "she walked along the river before the rain began",
]
RAW = [
    (0, "the quick brown fox naps beside the lazy dog"),
    (1, "xs9 zq2 vb7 kk3 mm1 pp0 qq8 rr4"),
    (2, "a fresh morning coffee with the morning paper"),
    (3, "loop unroll vector register cache line miss stall"),
    (4, "the rain began before she walked along the river"),
    (5, "zzz yyy xxx www vvv uuu ttt sss"),
]


@pytest.mark.spark
def test_bucket_counts_match_reference(spark):
    df = spark.createDataFrame([(t,) for t in TARGET], "text string")
    got = {r["bucket"]: r["cnt"] for r in hashed_ngram_counts(df).collect()}
    assert got == dict(_ref_counts(TARGET))


@pytest.mark.spark
def test_logratio_matches_reference(spark):
    tdf = spark.createDataFrame([(t,) for t in TARGET], "text string")
    rdf = spark.createDataFrame([(t,) for _, t in RAW], "text string")
    ct, cr = _ref_counts(TARGET), _ref_counts([t for _, t in RAW])
    ref, default = _ref_logratio(ct, cr)
    tab = dsir_logratio_table(hashed_ngram_counts(tdf), hashed_ngram_counts(rdf))
    got = {r["bucket"]: r["logratio"] for r in tab.collect()}
    assert set(got) == set(ref)
    for b in ref:
        assert got[b] == pytest.approx(ref[b], rel=1e-12)
    assert dsir_default_logratio(sum(ct.values()), sum(cr.values())) == pytest.approx(
        default, rel=1e-12
    )


@pytest.mark.spark
def test_weights_and_resample_match_reference(spark):
    tdf = spark.createDataFrame([(t,) for t in TARGET], "text string")
    rdf = spark.createDataFrame(RAW, "doc_id long, text string")
    ct, cr = _ref_counts(TARGET), _ref_counts([t for _, t in RAW])
    ref, default = _ref_logratio(ct, cr)

    tab = dsir_logratio_table(hashed_ngram_counts(tdf), hashed_ngram_counts(rdf))
    w = with_importance_weights(rdf, tab, default_logratio=default)
    got = {r["doc_id"]: r["dsir_logw"] for r in w.collect()}
    ref_w = {
        i: sum(ref.get(b, default) for b in _ref_buckets(t)) for i, t in RAW
    }
    assert set(got) == set(ref_w)
    for i in ref_w:
        assert got[i] == pytest.approx(ref_w[i], rel=1e-10)
    # target-like docs outweigh gibberish/off-domain docs
    assert min(ref_w[0], ref_w[2], ref_w[4]) > max(ref_w[1], ref_w[3], ref_w[5])

    sel = dsir_resample(rdf, w, k=3, seed=7)
    ref_scores = {i: ref_w[i] + _ref_gumbel(i, 7) for i in ref_w}
    ref_sel = sorted(sorted(ref_scores, key=lambda i: (-ref_scores[i], i))[:3])
    assert sorted(r["doc_id"] for r in sel.collect()) == ref_sel
    assert sel.columns == ["doc_id", "text"]  # payload survives the semi-join


@pytest.mark.spark
def test_zero_token_docs_are_absent_from_weights(spark):
    tdf = spark.createDataFrame([("a b",)], "text string")
    rdf = spark.createDataFrame(
        [(0, "a b c"), (1, "   "), (2, "")], "doc_id long, text string"
    )
    tab = dsir_logratio_table(hashed_ngram_counts(tdf), hashed_ngram_counts(rdf))
    ids = [r["doc_id"] for r in with_importance_weights(rdf, tab).collect()]
    assert ids == [0]


@pytest.mark.spark
def test_resample_plan_broadcasts_and_semijoins(spark):
    tdf = spark.createDataFrame([(t,) for t in TARGET], "text string")
    rdf = spark.createDataFrame(RAW, "doc_id long, text string")
    tab = dsir_logratio_table(hashed_ngram_counts(tdf), hashed_ngram_counts(rdf))
    w = with_importance_weights(rdf, tab)
    spark.catalog.clearCache()
    plan = (
        dsir_resample(rdf, w, k=2)._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
