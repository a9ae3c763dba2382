"""RefinedWeb-style line-wise quality filtering
(operators/text.py::filter_quality_lines).

Truth direction: hand-written expectations per rule plus a pure-python
replay of the rules over the fixture; the driver gate replays the same
rules in independent DuckDB SQL.
"""

import re

import pandas as pd
import pytest

from hlld_spark.operators.text import filter_quality_lines, write_weblines_fixture

COUNTER_RE = re.compile(r"^\s*\d+\s+(likes?|shares?|comments?|views?|points?|votes?)\s*$")


def _ref_keep(line, max_upper=0.7, max_digit=0.5, max_nav_words=2, max_nav_chars=15):
    t = line.strip()
    if len(t) == 0:
        return True
    letters = len(re.sub("[^A-Za-z]", "", line))
    uppers = len(re.sub("[^A-Z]", "", line))
    digits = len(re.sub("[^0-9]", "", line))
    words = len(re.split(r"\s+", t))
    drop = (
        (letters > 0 and uppers / letters > max_upper)
        or digits / len(t) > max_digit
        or bool(COUNTER_RE.match(line))
        or (words <= max_nav_words and len(t) <= max_nav_chars)
    )
    return not drop


def _ref_doc(text):
    kept = "\n".join(l for l in text.split("\n") if _ref_keep(l))
    frac = 0.0 if len(text) == 0 else round(1.0 - len(kept) / len(text), 6)
    return kept, frac


@pytest.mark.spark
def test_each_rule_hand_cases(spark):
    doc = "\n".join(
        [
            "A normal sentence with plenty of mixed case words here.",
            "HOME ABOUT CONTACT US",  # caps nav -> drop
            "123456 7890",  # digit run -> drop
            "3 likes",  # social counter -> drop
            "Read more",  # short crumb -> drop
            "",  # empty formatting line -> keep
            "Another good line that clearly survives the filter pass.",
        ]
    )
    df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
    row = filter_quality_lines(df).collect()[0]
    kept, frac = _ref_doc(doc)
    assert row["text"] == kept
    assert row["text"].split("\n") == [
        "A normal sentence with plenty of mixed case words here.",
        "",
        "Another good line that clearly survives the filter pass.",
    ]
    assert row["removed_char_frac"] == pytest.approx(frac, abs=1e-9)


@pytest.mark.spark
def test_doc_level_escalation_drops_mostly_junk_pages(spark):
    junk_doc = "MENU\n3 likes\n99 shares\nHome"
    good_doc = "A full sentence of real body text lives here.\nAnd another one follows it."
    df = spark.createDataFrame(
        [(0, junk_doc), (1, good_doc)], "doc_id long, text string"
    )
    out = filter_quality_lines(df, max_removed_frac=0.5).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["text"] == good_doc


@pytest.mark.spark
def test_nulls_and_empty_pass_through(spark):
    df = spark.createDataFrame([(0, None), (1, "")], "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["removed_char_frac"]) for r in
           filter_quality_lines(df, max_removed_frac=0.9).collect()}
    assert got[0] == (None, 0.0)
    assert got[1] == ("", 0.0)


@pytest.mark.spark
def test_fixture_matches_python_reference(spark, tmp_path):
    path = str(tmp_path / "weblines.parquet")
    write_weblines_fixture(path, 120)
    pdf = pd.read_parquet(path)
    got = {
        r["doc_id"]: (r["text"], r["removed_char_frac"])
        for r in filter_quality_lines(spark.read.parquet(path)).collect()
    }
    n_changed = 0
    for _, row in pdf.iterrows():
        kept, frac = _ref_doc(row["text"])
        assert got[row["doc_id"]][0] == kept
        assert got[row["doc_id"]][1] == pytest.approx(frac, abs=1e-9)
        n_changed += kept != row["text"]
    assert n_changed > 0  # the fixture genuinely exercises removal


@pytest.mark.spark
def test_line_filter_is_exchange_free(spark, tmp_path):
    path = str(tmp_path / "weblines_plan.parquet")
    write_weblines_fixture(path, 60)
    spark.catalog.clearCache()
    plan = (
        filter_quality_lines(spark.read.parquet(path))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure Catalyst, no UDF
