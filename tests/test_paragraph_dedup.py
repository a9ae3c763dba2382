"""Paragraph-level corpus dedup + within-doc line dedup
(operators/dedup.py::dedup_paragraphs / dedup_lines_within_doc).

Truth direction: pure-python references over the same inputs; the
driver gate replays the keeper rule in independent DuckDB SQL.
"""

import pandas as pd
import pytest

from hlld_spark.operators.dedup import (
    dedup_lines_within_doc,
    dedup_paragraphs,
    write_paragraph_fixture,
)


def _ref_first(rows, min_chars=1, sep="\n"):
    seen = {}
    for doc_id, text in rows:
        for pos, para in enumerate(text.split(sep)):
            if len(para.strip()) >= min_chars and para not in seen:
                seen[para] = (doc_id, pos)
    out = {}
    for doc_id, text in rows:
        kept = [
            p
            for pos, p in enumerate(text.split(sep))
            if len(p.strip()) < min_chars or seen.get(p) == (doc_id, pos)
        ]
        out[doc_id] = sep.join(kept)
    return out


@pytest.mark.spark
def test_keep_first_hand_case(spark):
    rows = [
        (1, "intro one\nboiler\nbody of doc one"),
        (2, "boiler\nbody of doc two\nboiler"),  # cross-doc + within-doc dup
        (3, "boiler"),  # everything removed -> ""
        (4, "a\n\nb\n\na"),  # empty formatting lines always pass
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(df, "doc_id", "text").collect()
    }
    assert got[1] == "intro one\nboiler\nbody of doc one"
    assert got[2] == "body of doc two"
    assert got[3] == ""
    assert got[4] == "a\n\nb\n"  # second 'a' removed, empties kept


@pytest.mark.spark
def test_keep_none_drops_every_occurrence(spark):
    rows = [(1, "x\nonly here"), (2, "x\nalso unique"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(df, "doc_id", "text", keep="none").collect()
    }
    assert got == {1: "only here", 2: "also unique", 3: ""}


@pytest.mark.spark
def test_invalid_keep_mode_raises(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup_paragraphs(df, "doc_id", "text", keep="last")


@pytest.mark.spark
def test_null_text_and_custom_sep(spark):
    rows = [(1, None), (2, "p|q|p"), (3, "q|r")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(df, "doc_id", "text", sep="|").collect()
    }
    assert got[1] is None
    assert got[2] == "p|q"
    assert got[3] == "r"


@pytest.mark.spark
def test_regex_metachar_separator_is_literal(spark):
    # '.' would split every character if the sep reached F.split unquoted
    rows = [(1, "alpha.beta.alpha"), (2, "beta.gamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(df, "doc_id", "text", sep=".").collect()
    }
    assert got == {1: "alpha.beta", 2: "gamma"}


@pytest.mark.spark
def test_fixture_matches_python_reference_and_partition_invariance(spark, tmp_path):
    path = str(tmp_path / "paras.parquet")
    write_paragraph_fixture(path, 200)
    pdf = pd.read_parquet(path)
    rows = sorted(zip(pdf.doc_id, pdf.text))
    exp = _ref_first(rows)
    df = spark.read.parquet(path)
    for parts in (1, 7):
        got = {
            r["doc_id"]: r["text"]
            for r in dedup_paragraphs(
                df.repartition(parts), "doc_id", "text"
            ).collect()
        }
        assert got == exp
    # keep="none" reference
    from collections import Counter

    cnt = Counter(
        p for _, t in rows for p in t.split("\n") if len(p.strip()) >= 1
    )
    exp_none = {
        d: "\n".join(
            p for p in t.split("\n") if len(p.strip()) < 1 or cnt[p] == 1
        )
        for d, t in rows
    }
    got_none = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(df, "doc_id", "text", keep="none").collect()
    }
    assert got_none == exp_none


@pytest.mark.spark
def test_paragraph_text_never_crosses_an_exchange(spark, tmp_path):
    """Scale shape: every Exchange in the plan carries only scalars
    (id/pos/hash/kept-array) — neither the paragraph column nor the
    doc text appears in any exchange input except the final id-keyed
    rebuild join, whose payload is the unavoidable reassembly input."""
    from hlld_spark.plans.explain_tools import exchange_inputs

    path = str(tmp_path / "paras.parquet")
    write_paragraph_fixture(path, 50)
    spark.catalog.clearCache()
    df = spark.read.parquet(path)
    out = dedup_paragraphs(df, "doc_id", "text")
    payload_bearing = [i for i in exchange_inputs(out) if "para#" in i]
    assert payload_bearing == [], payload_bearing
    out.count()


@pytest.mark.spark
def test_line_dedup_within_doc(spark):
    rows = [
        (1, "nav\ncontent a\nnav\ncontent b\nnav"),
        (2, "x\n\n\nx\ny"),
        (3, None),
        (4, "single"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"] for r in dedup_lines_within_doc(df, "text").collect()
    }
    assert got[1] == "nav\ncontent a\ncontent b"
    assert got[2] == "x\n\n\nx\ny"[:0] + "x\n\n\ny"  # empties kept, dup 'x' dropped
    assert got[3] is None
    assert got[4] == "single"


@pytest.mark.spark
def test_line_dedup_is_exchange_free(spark, tmp_path):
    from hlld_spark.plans.explain_tools import executed_plan

    path = str(tmp_path / "paras.parquet")
    write_paragraph_fixture(path, 50)
    spark.catalog.clearCache()
    out = dedup_lines_within_doc(spark.read.parquet(path), "text")
    plan = executed_plan(out)
    assert "Exchange" not in plan, plan
