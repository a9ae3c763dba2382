"""PII detection and redaction — pure Catalyst, zero Python in the path.

The C4/Dolma-style scrub every web-scale training-data pipeline runs
before release: replace emails, IPv4 addresses and phone numbers with
stable placeholder tokens, and count what was removed (the counts are
the audit signal — a corpus whose redaction counts jump between crawls
has a contamination problem upstream).

Spark-first shape: each kind is ONE ``regexp_replace`` /
``regexp_count`` expression evaluated inside whole-stage codegen — no
UDF, no shuffle, scan-dominated at any scale. Patterns are written in
the common subset of Java regex (Spark) and RE2 (DuckDB oracle,
Google's re2 syntax): no lookarounds, no backreferences, ASCII ``\\b``
and ``\\d`` — so the driver's cross-engine gate holds character for
character.

Reference scope note: armon/hlld has no text operators; this module is
part of the LLM-pipeline layer (same motivation as operators/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Order matters and is the module contract: emails first (their local
# parts can contain digit runs a phone pattern would bite), then IPs,
# then phones.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — permissive local part, alnum/dot/dash domain,
    # alpha TLD of 2+ (the practical crawl-scrub shape; RFC-full
    # grammar needs lookarounds neither engine pair shares)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted quad with per-octet 0-255 range enforcement
    "ipv4": (
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b"
    ),
    # optional +1 country code, (NXX) or NXX- exchange, 3-4 tail.
    # No leading \b: a '(' is its own anchor, and RE2 has no lookbehind
    # to guard the bare-digit branch — the digit-run false-positive
    # trade-off is the same one the published scrubs accept.
    "phone": r"(?:\+?1[-. ])?(?:\(\d{3}\) ?|\d{3}[-. ])\d{3}[-. ]\d{4}\b",
}

DEFAULT_TOKEN_FMT = "<|{kind}|>"

# Cheap NECESSARY conditions per pattern (r7 perf): a row where the
# guard is false cannot contain a match, so the expensive backtracking
# regex is skipped entirely for it — ``regexp_replace`` degenerates to
# the identity and ``regexp_count`` to 0. Guards are byte-scans
# (``contains``) or trivially simple regexes, both far cheaper per row
# than the full patterns (the email pattern in particular backtracks
# over every alnum run). Proof of necessity: every email match contains
# '@'; every IPv4 match contains '.'; every phone match ends with the
# mandatory ``\\d{3}[-. ]\\d{4}`` tail (both exchange alternatives are
# followed by it). Equivalence is asserted in tests/test_pii.py against
# the unguarded patterns AND DuckDB's RE2.
def _pii_guard(kind: str, text: Column) -> Column:
    if kind == "email":
        return text.contains("@")
    if kind == "ipv4":
        return text.contains(".")
    if kind == "phone":
        return text.rlike(r"\d{3}[-. ]\d{4}")
    return F.lit(True)


def pii_token(kind: str, token_fmt: str = DEFAULT_TOKEN_FMT) -> str:
    return token_fmt.format(kind=kind.upper())


def redact_pii_col(
    text: Column,
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    token_fmt: str = DEFAULT_TOKEN_FMT,
) -> Column:
    """Column expression: ``text`` with every match of each kind
    replaced by its placeholder token, applied in PII_PATTERNS order.

    Each replace is guarded by its necessary condition (see
    ``_pii_guard``): null text stays null through either branch, and a
    guard-false row is returned untouched — byte-identical to the
    unguarded expression, without paying the full regex on rows that
    cannot match."""
    out = text
    for kind in kinds:
        out = F.when(
            _pii_guard(kind, out),
            F.regexp_replace(out, PII_PATTERNS[kind], pii_token(kind, token_fmt)),
        ).otherwise(out)
    return out


def redact_pii(
    df: DataFrame,
    text_col: str,
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    out_col: str | None = None,
    token_fmt: str = DEFAULT_TOKEN_FMT,
) -> DataFrame:
    """Redact PII kinds in ``text_col`` (in place by default)."""
    return df.withColumn(
        out_col or text_col, redact_pii_col(F.col(text_col), kinds, token_fmt)
    )


def with_pii_counts(
    df: DataFrame,
    text_col: str,
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
) -> DataFrame:
    """Add one ``<kind>_count`` column per kind (matches in the text,
    counted BEFORE any redaction). Counts take the same necessary-
    condition guards as :func:`redact_pii_col` (guard false ⇒ count 0;
    null text ⇒ null count, exactly like the raw ``regexp_count``)."""
    for kind in kinds:
        c = F.col(text_col)
        df = df.withColumn(
            f"{kind}_count",
            F.when(c.isNull(), F.lit(None).cast("int"))
            .when(_pii_guard(kind, c), F.regexp_count(c, F.lit(PII_PATTERNS[kind])))
            .otherwise(F.lit(0)),
        )
    return df


def pii_stats(
    df: DataFrame,
    text_col: str,
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
) -> DataFrame:
    """Corpus-level audit: total matches and affected-document count per
    kind, one row per kind. Partial-aggregated — the only exchange
    carries ``len(kinds)`` scalar triples per task."""
    counted = with_pii_counts(df, text_col, kinds)
    aggs = []
    for kind in kinds:
        aggs.append(
            F.struct(
                F.lit(kind).alias("kind"),
                F.sum(f"{kind}_count").alias("total_matches"),
                F.count_if(F.col(f"{kind}_count") > 0).alias("docs_affected"),
            ).alias(kind)
        )
    row = counted.agg(*aggs)
    stacked = row.select(
        F.explode(F.array(*[F.col(k) for k in kinds])).alias("s")
    )
    return stacked.select(
        F.col("s.kind").alias("kind"),
        F.col("s.total_matches").alias("total_matches"),
        F.col("s.docs_affected").alias("docs_affected"),
    )
