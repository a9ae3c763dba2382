"""PII redaction (operators/pii.py): hand-expected redactions plus a
Spark(Java-regex) vs DuckDB(RE2) equivalence sweep over adversarial
strings — the patterns are contractually in the engines' common subset,
so any divergence is a bug here, not an engine quirk."""

import duckdb
import pytest
from pyspark.sql import functions as F

from hlld_spark.operators.pii import (
    PII_PATTERNS,
    pii_stats,
    redact_pii,
    with_pii_counts,
)

CASES = [
    # (input, expected redaction)
    ("mail me at bob.smith+spam@sub.example.co.uk now",
     "mail me at <|EMAIL|> now"),
    ("server 192.168.0.1 and 8.8.8.8 up", "server <|IPV4|> and <|IPV4|> up"),
    ("not an ip 999.1.1.1 stays", "not an ip 999.1.1.1 stays"),
    ("call (555) 123-4567 or 555-123-4567 today",
     "call <|PHONE|> or <|PHONE|> today"),
    ("intl +1 555.123.4567 ok", "intl <|PHONE|> ok"),
    ("order 123456789012 is not a phone", "order 123456789012 is not a phone"),
    ("a@b.co 1.2.3.4 555-123-4567", "<|EMAIL|> <|IPV4|> <|PHONE|>"),
    ("no pii here at all", "no pii here at all"),
    ("v1.2.3.4567 version string", "v1.2.3.4567 version string"),
    ("trailing dot 10.0.0.255. end", "trailing dot <|IPV4|>. end"),
]

ADVERSARIAL = [s for s, _ in CASES] + [
    "x" * 5 + "@" + "y" * 5,           # no TLD — not an email
    "double..dot@ex..ample.com",
    "@nouser.com user@ trailing@x.",
    "0.0.0.0 255.255.255.255 256.1.1.1 25.26.27.28",
    "1-555-123-4567 +1 (555) 123-4567 555 123 4567",
    "(555)123-4567 (555) 123 4567",
    "phone inside words555-123-4567here",
    "ип 127.0.0.1 телефон 555-123-4567 почта иван@пример.рф a@b.com",
]


@pytest.mark.spark
def test_redaction_hand_cases(spark):
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(CASES)], "i long, text string")
    got = {
        r["i"]: r["text"]
        for r in redact_pii(df, "text").orderBy("i").collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (CASES[i][0], got[i])


@pytest.mark.spark
def test_java_vs_re2_equivalence(spark):
    """Every pattern must behave identically under Spark's Java regex
    and DuckDB's RE2 on the adversarial sweep (redaction AND count)."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "i long, text string"
    )
    sdf = redact_pii(with_pii_counts(df, "text"), "text", out_col="red").orderBy("i")
    srows = sdf.collect()

    con = duckdb.connect()
    con.execute("create table t(i bigint, text varchar)")
    con.executemany("insert into t values (?, ?)", list(enumerate(ADVERSARIAL)))
    for r in srows:
        i = r["i"]
        red_sql = "text"
        for kind in ("email", "ipv4", "phone"):
            red_sql = (
                f"regexp_replace({red_sql}, ?, '<|{kind.upper()}|>', 'g')"
            )
        duck = con.execute(
            f"select {red_sql} as red, "
            "len(regexp_extract_all(text, ?)) as email_count, "
            "len(regexp_extract_all(text, ?)) as ipv4_count, "
            "len(regexp_extract_all(text, ?)) as phone_count "
            "from t where i = ?",
            [
                PII_PATTERNS["email"], PII_PATTERNS["ipv4"], PII_PATTERNS["phone"],
                PII_PATTERNS["email"], PII_PATTERNS["ipv4"], PII_PATTERNS["phone"],
                i,
            ],
        ).fetchone()
        assert r["red"] == duck[0], (ADVERSARIAL[i], r["red"], duck[0])
        assert (r["email_count"], r["ipv4_count"], r["phone_count"]) == duck[1:], ADVERSARIAL[i]


@pytest.mark.spark
def test_java_vs_re2_fuzz_sweep(spark):
    """500 deterministically-generated adversarial strings (PII-shaped
    fragments glued with mutations: missing octets, doubled dots,
    digits running into words, partial phones) — redaction must agree
    between Spark and DuckDB on every one."""
    import random

    rng = random.Random(0x911)
    frags = [
        "a@b.co", "x@y", "@z.com", "user.name+x@sub.ex-ample.org",
        "1.2.3.4", "255.255.255.255", "256.1.1.1", "01.02.003.4",
        "1.2.3.4.5", "12.34", "(555) 123-4567", "555-123-4567",
        "+1 555.123.4567", "5551234567", "555 123 4567", "123-45-6789",
        "word", "w0rd5", ".", "..", "@", "()", "-", " ", "12345678901234",
        "a.b@c.d.e.fg", "ip:1.2.3.4,phone:555-123-4567;mail:a@b.io",
    ]
    strings = [
        "".join(rng.choice(frags) for _ in range(rng.randrange(1, 6)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(list(enumerate(strings)), "i long, text string")
    srows = {
        r["i"]: r["red"]
        for r in redact_pii(df, "text", out_col="red").collect()
    }
    con = duckdb.connect()
    red_sql = "text"
    for kind in ("email", "ipv4", "phone"):
        red_sql = f"regexp_replace({red_sql}, ?, '<|{kind.upper()}|>', 'g')"
    for i, s in enumerate(strings):
        duck = con.execute(
            f"select {red_sql} from (select ? as text)",
            [PII_PATTERNS["email"], PII_PATTERNS["ipv4"], PII_PATTERNS["phone"], s],
        ).fetchone()[0]
        assert srows[i] == duck, (s, srows[i], duck)


@pytest.mark.spark
def test_pii_stats(spark):
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(CASES)], "i long, text string")
    stats = {r["kind"]: (r["total_matches"], r["docs_affected"]) for r in pii_stats(df, "text").collect()}
    assert stats["email"] == (2, 2)
    assert stats["ipv4"] == (4, 3)
    assert stats["phone"] == (4, 3)


@pytest.mark.spark
def test_redaction_plan_is_codegen_only(spark):
    """The redaction plan must stay inside whole-stage codegen: no
    Exchange, no Python evaluation."""
    df = spark.createDataFrame([(1, "a@b.co")], "i long, text string")
    plan = redact_pii(with_pii_counts(df, "text"), "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


@pytest.mark.spark
def test_guarded_equals_unguarded(spark):
    """The r7 necessary-condition guards must be byte-identical to the
    raw (unguarded) regex expressions — redaction, counts, schema and
    null handling — over the adversarial sweep plus null/empty rows."""
    from hlld_spark.operators.pii import pii_token

    rows = [(i, s) for i, s in enumerate(ADVERSARIAL)] + [
        (1000, None),
        (1001, ""),
        (1002, "@ . 000-0000"),  # guards fire, regexes still don't match
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    guarded = redact_pii(with_pii_counts(df, "text"), "text", out_col="red")

    raw_red = F.col("text")
    for kind in ("email", "ipv4", "phone"):
        raw_red = F.regexp_replace(raw_red, PII_PATTERNS[kind], pii_token(kind))
    raw = df.select(
        "i",
        *[
            F.regexp_count(F.col("text"), F.lit(PII_PATTERNS[k])).alias(f"{k}_count")
            for k in ("email", "ipv4", "phone")
        ],
        raw_red.alias("red"),
    )
    cols = ["red", "email_count", "ipv4_count", "phone_count"]
    g = {r["i"]: tuple(r[c] for c in cols) for r in guarded.collect()}
    u = {r["i"]: tuple(r[c] for c in cols) for r in raw.collect()}
    assert g == u
    gs = {f.name: (f.dataType, f.nullable) for f in guarded.schema.fields if f.name in cols}
    us = {f.name: (f.dataType, f.nullable) for f in raw.schema.fields if f.name in cols}
    assert gs == us
