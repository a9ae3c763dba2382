"""BPE tokenizer (operators/bpe.py): merge learning vs a hand-traceable
corpus, encode/decode round trip, memoization correctness, and
distributed-vs-local equivalence of the count pass."""

import pytest
from pyspark.sql import functions as F

from hlld_spark.operators.bpe import (
    END,
    _encode_word,
    _learn_merges,
    bpe_decode_col,
    bpe_encode,
    bpe_train,
    word_counts,
)


def test_learn_merges_hand_trace():
    # classic toy: low/lower/newest/widest weighted counts
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = _learn_merges(wc, 4)
    # 'es' appears in newest+widest = 9, 'st' 9 after... first merge:
    # pair counts: (e,s)=9 (s,t)=9 (t,</w>)=9 ... lexicographic min of
    # the 9-count ties wins first
    assert len(merges) == 4
    # every merge must be a pair of existing symbols, applied in order
    syms = set("abcdefghijklmnopqrstuvwxyz") | {END}
    for a, b in merges:
        assert a in syms and b in syms
        syms.add(a + b)


def test_encode_word_follows_rank_order():
    merges = [("e", "s"), ("es", "t"), ("est", END), ("l", "o")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert _encode_word("newest", ranks) == ("n", "e", "w", "est" + END)
    assert _encode_word("lowest", ranks) == ("lo", "w", "est" + END)
    assert _encode_word("zzz", ranks) == ("z", "z", "z", END)


@pytest.mark.spark
def test_train_encode_decode_roundtrip(spark):
    rows = [
        (i, f"the quick brown fox number {i} jumps over the lazy dog again and again")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = bpe_train(df, "text", n_merges=60)
    assert not model["truncated"]
    enc = bpe_encode(df, "text", model)
    out = enc.withColumn("decoded", bpe_decode_col(F.col("bpe_tokens")))
    for r in out.collect():
        norm = " ".join(
            __import__("re").findall("[a-z0-9]+", r["text"].lower())
        )
        assert r["decoded"] == norm
        assert all(t.endswith(END) or END not in t for t in r["bpe_tokens"])


@pytest.mark.spark
def test_common_words_become_single_tokens(spark):
    rows = [(i, "streaming pipeline " * 10) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = bpe_train(df, "text", n_merges=200)
    enc = bpe_encode(df.limit(1), "text", model).collect()[0]["bpe_tokens"]
    # with enough merges the two repeated words fully fuse
    assert set(enc) == {"streaming" + END, "pipeline" + END}


@pytest.mark.spark
def test_word_counts_match_local(spark):
    texts = ["a b a", "b c", "a"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r["word"]: r["c"] for r in word_counts(df, "text").collect()}
    assert got == {"a": 3, "b": 2, "c": 1}


@pytest.mark.spark
def test_truncation_flag_and_determinism(spark):
    rows = [(i, f"unique{i} word{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m1 = bpe_train(df, "text", n_merges=20, max_words=10)
    assert m1["truncated"] and m1["n_words_used"] == 10
    m2 = bpe_train(df.repartition(7), "text", n_merges=20, max_words=10)
    assert m1["merges"] == m2["merges"]
