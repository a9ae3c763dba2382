"""Natural-text language ID — trigram-profile path (VERDICT r2 #4).

The marker heuristic (`text.with_lang_id`) is the synthetic fast-path;
`lang_profiles.with_lang_id_profiles` is the natural-text path. These
tests pin: 100% accuracy on the held-out evaluation corpus, batch/single
consistency (no cross-doc leakage in the shared-buffer kernel), honest
"und" on no-evidence inputs, and the Spark column path.
"""

import numpy as np
import pandas as pd
import pytest

from hlld_spark.operators.lang_profiles import (
    EVAL_SENTENCES,
    _build_profile_table,
    _profile_lang_batch,
    with_lang_id_profiles,
)


def _corpus():
    texts, labels = [], []
    for lang, sents in EVAL_SENTENCES.items():
        for s in sents:
            texts.append(s)
            labels.append(lang)
    return texts, labels


def test_eval_corpus_exact():
    """Every held-out natural sentence (10 languages, open-class
    vocabulary the profiles never saw) is labeled correctly."""
    texts, labels = _corpus()
    pred = list(_profile_lang_batch(pd.Series(texts)))
    assert pred == labels


def test_batch_equals_single_doc():
    """The shared concatenated-buffer kernel must not leak trigrams
    across document boundaries: scoring each doc alone gives the same
    label as scoring the whole batch."""
    texts, _ = _corpus()
    whole = list(_profile_lang_batch(pd.Series(texts)))
    single = [_profile_lang_batch(pd.Series([t])).iloc[0] for t in texts]
    assert whole == single


def test_no_evidence_is_und():
    out = list(_profile_lang_batch(pd.Series(["", None, "12345 !!!", "ok", "zzz qqq"])))
    assert out == ["und"] * 5


def test_case_insensitive():
    texts, labels = _corpus()
    shouted = [t.upper() for t in texts]
    assert list(_profile_lang_batch(pd.Series(shouted))) == labels


def test_profile_table_shape():
    hashes, weights = _build_profile_table()
    assert hashes.dtype == np.uint64
    assert np.all(np.diff(hashes.astype(np.int64)) != 0)  # unique
    assert np.all(hashes[:-1] < hashes[1:])  # sorted
    assert weights.shape == (len(hashes), 8)
    assert np.all(weights >= 0)
    # every language contributes some positive-weight trigrams
    assert np.all((weights > 0).sum(axis=0) > 50)


def test_spark_column_path(spark):
    texts, labels = _corpus()
    df = spark.createDataFrame(
        [(i, l, t) for i, (t, l) in enumerate(zip(texts, labels))],
        "doc_id long, lang string, text string",
    )
    bad = (
        with_lang_id_profiles(df, "text")
        .filter("lang_id != lang")
        .count()
    )
    assert bad == 0


def test_mixed_with_marker_path(spark):
    """Profile path and marker path coexist on one DataFrame (different
    output columns) without interference."""
    from pyspark.sql import functions as F

    from hlld_spark.operators.text import with_lang_id

    df = spark.createDataFrame(
        [(0, "the of and to in is that it the and"), (1, "de la que el en los de la")],
        "doc_id long, text string",
    )
    out = with_lang_id_profiles(with_lang_id(df, "text", out="marker_lang"), "text", out="profile_lang")
    rows = {r["doc_id"]: r for r in out.orderBy("doc_id").collect()}
    assert rows[0]["marker_lang"] == rows[0]["profile_lang"] == "en"
    assert rows[1]["marker_lang"] == rows[1]["profile_lang"] == "es"
