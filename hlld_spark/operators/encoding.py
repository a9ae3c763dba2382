"""Encoding repair — undo UTF-8-as-cp1252/latin-1 mojibake in crawl text.

The classic web-crawl corruption: a page's UTF-8 bytes were decoded
with cp1252 (or latin-1) somewhere upstream, turning every non-ASCII
character into 2-4 junk characters (``é`` → ``Ã©``, ``'`` → ``â€™``),
sometimes twice (double-encoding). The standard fix (what the ftfy
library's core does) is to INVERT that decode: re-encode the text with
"sloppy cp1252" — cp1252 plus identity for the five unmapped bytes —
and if the resulting bytes are valid UTF-8, the text was mojibake;
decode and repeat for double-encodings.

Acceptance rule (deterministic, no scoring model): a repair round is
accepted iff (a) every char re-encodes through sloppy-cp1252, (b) the
bytes decode as strict UTF-8, and (c) the result is SHORTER than the
input (a genuine UTF-8 multi-byte sequence always shrinks, so pure
ASCII and already-clean text are fixpoints by construction).

Scale shape: a vectorized pandas ``str.contains`` prefilter (mojibake
lead bytes C2-F4 as chars) skips the per-row attempt for clean rows —
on a mostly-ASCII corpus the Python loop touches only the suspicious
tail; the attempt itself is two C-speed codec calls. No shuffle, no
driver traffic: pure per-partition map.

Reference scope note: armon/hlld has no text operators; LLM-pipeline
layer addition (cleaning stage companion to operators/text.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

# sloppy cp1252: char -> byte for all 256 byte values (cp1252 where
# defined, identity for the 5 unmapped bytes 81 8D 8F 90 9D) — the
# inverse of the decode that caused the damage, whichever of
# cp1252/latin-1 it was (latin-1's 80-9F controls round-trip via the
# identity entries).
_SLOPPY_ENC: dict[str, int] = {}
for _b in range(256):
    try:
        _SLOPPY_ENC.setdefault(bytes([_b]).decode("cp1252"), _b)
    except UnicodeDecodeError:
        pass
    _SLOPPY_ENC.setdefault(chr(_b), _b)  # latin-1 leg (controls 80-9F)

#: chars a UTF-8 lead byte (C2-F4) becomes under cp1252 OR latin-1
#: decode — both map that byte range to U+00C2-U+00F4 — so a string
#: with none of these cannot be mojibake.
_SUSPECT_RE = "[Â-ô]"


def fix_mojibake(text: str, max_rounds: int = 3) -> tuple[str, int]:
    """Repair one string; returns (fixed, rounds_applied)."""
    rounds = 0
    for _ in range(max_rounds):
        try:
            bs = bytes([_SLOPPY_ENC[c] for c in text])
        except KeyError:  # a char outside latin-1/cp1252 — not mojibake
            break
        try:
            dec = bs.decode("utf-8")
        except UnicodeDecodeError:
            break
        if len(dec) >= len(text):  # no multi-byte sequence consumed
            break
        text = dec
        rounds += 1
    return text, rounds


def repair_text_batch(texts: pd.Series, max_rounds: int = 3) -> pd.DataFrame:
    """Vectorized batch repair: regex prefilter (C-speed) selects the
    suspicious rows; only those run :func:`fix_mojibake`."""
    vals = texts.fillna("")
    suspect = vals.str.contains(_SUSPECT_RE, regex=True, na=False).to_numpy()
    fixed = vals.to_numpy(dtype=object).copy()
    rounds = np.zeros(len(vals), dtype=np.int32)
    for j in np.flatnonzero(suspect):
        fixed[j], rounds[j] = fix_mojibake(fixed[j], max_rounds)
    return pd.DataFrame({"fixed": fixed, "rounds": rounds})


def with_encoding_repair(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_fixed",
    rounds_col: str = "mojibake_rounds",
    max_rounds: int = 3,
) -> DataFrame:
    """Add ``out_col`` (repaired text) + ``rounds_col`` (0 = clean).

    r7: the UDF is an Arrow-native ``arrow_udf`` (Spark 4.1) — the
    suspect prefilter runs as one RE2 ``match_substring_regex`` over
    the Arrow batch, and a batch with no suspects returns its input
    buffer as-is: clean corpora pay ZERO per-row Python and zero string
    materialization (before: every row became a pandas ``str`` twice).
    Batches containing suspects drop to the exact pandas kernel
    (:func:`repair_text_batch`) — byte-identical output either way
    (asserted in tests/test_encoding.py)."""
    from pyspark.sql.functions import arrow_udf

    @arrow_udf(
        StructType(
            [
                StructField("fixed", StringType(), True),
                StructField("rounds", IntegerType(), False),
            ]
        )
    )
    def _fix(texts):
        import pyarrow as pa
        import pyarrow.compute as pc

        fields = [
            pa.field("fixed", pa.string()),
            pa.field("rounds", pa.int32(), nullable=False),
        ]
        col = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        filled = pc.fill_null(col, "") if col.null_count else col
        n_sus = pc.sum(pc.match_substring_regex(filled, _SUSPECT_RE)).as_py() or 0
        if n_sus == 0:
            # clean batch: nulls → "" (the documented fillna semantic),
            # everything else passes through untouched, zero copies
            return pa.StructArray.from_arrays(
                [filled, pa.array(np.zeros(len(filled), dtype=np.int32))],
                fields=fields,
            )
        out = repair_text_batch(col.to_pandas(), max_rounds)
        return pa.StructArray.from_arrays(
            [
                pa.array(out["fixed"], type=pa.string()),
                pa.array(out["rounds"], type=pa.int32()),
            ],
            fields=fields,
        )

    tmp = df.withColumn("__enc", _fix(F.col(text_col)))
    return (
        tmp.withColumn(out_col, F.col("__enc.fixed"))
        .withColumn(rounds_col, F.col("__enc.rounds"))
        .drop("__enc")
    )


def mojibake_corrupt(text: str, mode: str = "cp1252", times: int = 1) -> str:
    """The FORWARD corruption (fixture/test helper): encode UTF-8,
    decode with cp1252 (unmapped bytes keep their codepoint, as real
    sloppy decoders do) or latin-1. Repeated for double-encoding."""
    for _ in range(times):
        bs = text.encode("utf-8")
        if mode == "latin1":
            text = bs.decode("latin-1")
        else:
            text = "".join(
                bytes([b]).decode("cp1252") if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D) else chr(b)
                for b in bs
            )
    return text


def write_mojibake_fixture(path: str, n: int, seed: int = 31) -> str:
    """Deterministic encoding-repair fixture (idempotent): per doc a
    pristine sentence mixing accents / curly punctuation / CJK / an
    emoji, stored alongside a corrupted variant — mode cycling
    clean / cp1252 / double-cp1252 / latin-1 — and the expected
    repair round count. Truth is the PRISTINE text (never derived
    from the repair code; the corruption is the independent forward
    transform)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    frags = [
        "café crème",
        "naïve façade",
        "Zürich–Genève",
        "it’s “quoted”",
        "€99 • ±5%",
        "日本語テキスト",
        "русский текст",
        "smiley 😀 end",
        "plain ascii words",
        "señor João",
    ]
    rows = []
    for i in range(n):
        a = frags[i % len(frags)]
        b = frags[(i * 7 + seed) % len(frags)]
        clean = f"doc {i}: {a} / {b}."
        mode = i % 4
        if mode == 0:  # an UNCORRUPTED doc (often non-ASCII) must survive
            corrupted, rounds = clean, 0
        elif mode == 1:
            corrupted, rounds = mojibake_corrupt(clean, "cp1252", 1), 1
        elif mode == 2:
            corrupted, rounds = mojibake_corrupt(clean, "cp1252", 2), 2
        else:
            corrupted, rounds = mojibake_corrupt(clean, "latin1", 1), 1
        if mode > 0 and clean.isascii():
            rounds = 0  # corruption of pure ASCII is the identity
        rows.append((i, corrupted, clean, rounds))
    cols = {
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "clean_text": pa.array([r[2] for r in rows], pa.string()),
        "rounds": pa.array([r[3] for r in rows], pa.int32()),
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(pa.table(cols), tmp)
    os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# HTML entity decoding
# ---------------------------------------------------------------------------


def unescape_html_batch(texts: pd.Series) -> pd.Series:
    """Decode HTML entities (``&amp;`` ``&#233;`` ``&#x27;`` and the
    full named table) for one Arrow batch. A C-speed literal ``&``
    prefilter skips rows that cannot contain an entity — on extracted
    main text most rows are clean, so the Python call touches only the
    suspicious tail. Bare ampersands that aren't entities pass through
    (``html.unescape`` semantics). Nulls stay null."""
    import html

    out = texts.to_numpy(dtype=object).copy()
    has_amp = texts.str.contains("&", regex=False, na=False).to_numpy()
    for j in np.flatnonzero(has_amp):
        out[j] = html.unescape(out[j])
    return pd.Series(out)


def with_html_unescape(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Add (or replace) ``out_col`` with HTML entities decoded — the
    standard post-extraction cleanup (boilerplate removal leaves
    ``&amp;`` ``&quot;`` etc. in the text layer). Per-partition map,
    no shuffle."""
    out_col = out_col or text_col

    @F.pandas_udf(StringType())
    def _unesc(texts: pd.Series) -> pd.Series:
        return unescape_html_batch(texts)

    return df.withColumn(out_col, _unesc(F.col(text_col)))


def write_entities_fixture(path: str, n: int, seed: int = 41) -> str:
    """Deterministic HTML-entity fixture (idempotent): pristine
    sentences stored alongside variants escaped by the FORWARD
    transform (``html.escape`` plus cycling named / decimal / hex
    numeric forms — never the decode code). Bare-ampersand and
    entity-free rows are planted as fixpoints."""
    import html
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    frags = [
        'he said "fish & chips" <b>loudly</b>',
        "café ’quoted’ & more",
        "a < b && b > c",
        "plain text with no markup at all",
        "x&y is not an entity, nor &fake;",
        "tom & jerry's <i>show</i>",
    ]
    rows = []
    for i in range(n):
        clean = f"doc {i}: {frags[i % len(frags)]} / {frags[(i * 5 + seed) % len(frags)]}."
        mode = i % 4
        if mode == 0:
            escaped = clean  # fixpoint row: decode must not touch it...
            # ...unless the pristine text itself contains an entity-like
            # token (&fake; is not in the named table -> still fixpoint)
        elif mode == 1:
            escaped = html.escape(clean, quote=True)
        elif mode == 2:
            escaped = "".join(
                f"&#{ord(c)};" if ord(c) > 126 or c in '<>&"' else c for c in clean
            )
        else:
            escaped = "".join(
                f"&#x{ord(c):x};" if ord(c) > 126 or c in '<>&"' else c for c in clean
            )
        rows.append((i, escaped, clean))
    cols = {
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "clean_text": pa.array([r[2] for r in rows], pa.string()),
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(pa.table(cols), tmp)
    os.replace(tmp, path)
    return path
