"""fastText-style quality classifier (operators/quality.py).

Truth direction: the dense numpy reference trainer (hashlib + matrix
GD, no Spark/Catalyst code shared) is the ground truth for training;
scoring is cross-checked against hand sigmoid math and, in the driver
gate, replayed in independent DuckDB SQL over the stored model.
"""

import hashlib
import math

import pytest

from hlld_spark.operators.quality import (
    BIAS_BUCKET,
    filter_by_quality,
    numpy_reference_train,
    score_quality,
    split_model_df,
    train_quality_classifier,
    weights_to_df,
    write_quality_fixture,
    _synth_doc,
)


def _buckets(text, prefix_len=4):
    toks = [t for t in text.strip().split() if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [hashlib.md5(g.encode()).hexdigest()[:prefix_len] for g in grams]


def _labeled(n, base=0):
    return [(base + i, _synth_doc(base + i, i % 2 == 0), 1 if i % 2 == 0 else 0) for i in range(n)]


@pytest.mark.spark
def test_spark_trainer_matches_numpy_reference(spark):
    rows = _labeled(60)
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w_s, b_s = train_quality_classifier(df, iters=12)
    w_n, b_n = numpy_reference_train([(t, y) for _, t, y in rows], iters=12)
    assert set(w_s) == set(w_n)
    for b in w_n:
        assert w_s[b] == pytest.approx(w_n[b], rel=1e-8, abs=1e-10)
    assert b_s == pytest.approx(b_n, rel=1e-8, abs=1e-10)


@pytest.mark.spark
def test_heldout_accuracy_and_scoring_math(spark):
    train = _labeled(200)
    test = _labeled(80, base=100000)
    tdf = spark.createDataFrame(train, "doc_id long, text string, label int")
    w, bias = train_quality_classifier(tdf, iters=30)

    sdf = spark.createDataFrame(test, "doc_id long, text string, label int")
    model = weights_to_df(spark, w, bias)
    got = {r["doc_id"]: r["quality_score"] for r in score_quality(sdf, model).collect()}

    correct = 0
    for i, t, y in test:
        bs = _buckets(t)
        dot = sum(w.get(b, 0.0) for b in bs) / len(bs)
        ref = 1.0 / (1.0 + math.exp(-(dot + bias)))
        assert got[i] == pytest.approx(ref, rel=1e-9)
        correct += (got[i] >= 0.5) == (y == 1)
    assert correct / len(test) >= 0.95


@pytest.mark.spark
def test_filter_by_quality_semijoin_plan(spark):
    rows = _labeled(40)
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w, bias = train_quality_classifier(df, iters=10)
    model = weights_to_df(spark, w, bias)
    kept = filter_by_quality(df, model, threshold=0.5)
    ids = {r["doc_id"] for r in kept.collect()}
    scores = {r["doc_id"]: r["quality_score"] for r in score_quality(df, model).collect()}
    assert ids == {i for i, s in scores.items() if s >= 0.5}
    assert kept.columns == ["doc_id", "text", "label"]
    spark.catalog.clearCache()
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


@pytest.mark.spark
def test_zero_token_docs_absent_and_unseen_buckets_score_prior(spark):
    train = _labeled(40)
    tdf = spark.createDataFrame(train, "doc_id long, text string, label int")
    w, bias = train_quality_classifier(tdf, iters=10)
    model = weights_to_df(spark, w, bias)
    sdf = spark.createDataFrame(
        [(0, "completely unseen vocabulary everywhere"), (1, "   ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["quality_score"] for r in score_quality(sdf, model).collect()}
    assert set(got) == {0}  # zero-token doc absent
    # all-unseen buckets -> dot 0 -> sigmoid(bias) prior exactly
    assert got[0] == pytest.approx(1.0 / (1.0 + math.exp(-bias)), rel=1e-12)


def test_fixture_idempotent_and_model_separates(tmp_path):
    import pandas as pd

    d = str(tmp_path / "qf")
    assert write_quality_fixture(d, 60, 40) == d
    m1 = pd.read_parquet(f"{d}/model.parquet")
    write_quality_fixture(d, 60, 40)  # no-op second call
    m2 = pd.read_parquet(f"{d}/model.parquet")
    assert m1.equals(m2)
    w = dict(zip(m1["bucket"], m1["w"]))
    bias = w.pop(BIAS_BUCKET)
    test = pd.read_parquet(f"{d}/test.parquet")
    correct = 0
    for _, row in test.iterrows():
        bs = _buckets(row["text"])
        s = 1.0 / (1.0 + math.exp(-(sum(w.get(b, 0.0) for b in bs) / len(bs) + bias)))
        correct += (s >= 0.5) == (row["label"] == 1)
    assert correct / len(test) >= 0.95


@pytest.mark.spark
def test_split_model_roundtrip(spark):
    model = weights_to_df(spark, {"00aa": 1.5, "ff01": -2.0}, 0.25)
    wdf, bias = split_model_df(model)
    assert bias == 0.25
    assert {(r["bucket"], r["w"]) for r in wdf.collect()} == {("00aa", 1.5), ("ff01", -2.0)}
