"""Benchmark decontamination — flag training documents that share any
n-gram with an evaluation/benchmark set.

The standard LLM-training hygiene step (the GPT-3 appendix / Llama
"13-gram overlap" rule): any training document containing an n-gram that
also appears in a held-out benchmark is flagged (and usually dropped) so
eval scores aren't contaminated by memorization. The published rule's
unit is 13 TOKENS, and ``unit="token"`` (whitespace tokens) is the
default (VERDICT r3 #1); ``unit="char"`` (character n-grams, ~2.5
English words at n=13 — a much more aggressive sub-word screen) remains
available.

Spark-first shape, designed for the 100-TB corpus / small-eval-set
asymmetry:

* the EVAL side is small (benchmarks are ~10^4..10^7 grams): its
  distinct n-gram hashes are computed distributively, collected ONCE to
  the driver (bounded by ``max_eval_grams`` — same bounded-collect
  pattern as the IVF centroid sample), sorted, and broadcast.
* the CORPUS side never materializes an n-gram row: inside one
  ``mapInPandas`` pass, each Arrow batch is shingle-hashed with the same
  vectorized code-point kernel minhash uses
  (``dedup._char_shingle_hashes``) and probed against the broadcast
  table — a 2^24-slot byte-mask prefilter resolves ~97% of probes with
  one vectorized load, searchsorted runs only on survivors. Only
  ``(id, n_matched)`` leaves the worker: no corpus shuffle at all
  (plan-asserted in tests).
* ``method="bloom"`` swaps the sorted array for this engine's own Bloom
  filter (``core.bloom``) built over the eval hashes: ~10x smaller
  broadcast at a documented false-positive rate. Bloom errors only
  OVER-flag (drop a clean doc), never under-flag — the safe direction
  for decontamination.
* :func:`decontaminate_parquet` is the scan-dominated scale path: the
  same probe riding the worker-side pyarrow scan
  (``sources.parquet_scan.map_parquet_batches``), dodging the measured
  ~5.4M rows/s JVM→Python Arrow-IPC ceiling exactly like
  ``build_sketches_parquet`` does.

Hash-match vs string-match: grams are compared by 64-bit splitmix-
finalized poly hashes, so a collision could over-flag a document
(P ≈ pairs/2^64 — negligible and, like the minhash gates, deterministic).

Reference parity note: the reference (hlld) has no decontamination; this
is a brief-mandated training-data-pipeline companion operator built on
the same shingle kernel as the dedup family.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .dedup import (
    _ascii_text_buffer,
    _char_shingle_hashes_ascii,
    _char_shingle_hashes_with_lens,
    _splitmix,
    _token_shingle_hashes,
    _token_shingle_hashes_ascii,
)

# second hash for the Bloom double-hashing scheme — any odd constant
# xor + splitmix gives an independent-enough h2 from the gram hash
_BLOOM_H2_SALT = np.uint64(0x9E3779B97F4A7C15)


def _bloom_pair(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return h, _splitmix(h ^ _BLOOM_H2_SALT)


def _shingle(texts: pd.Series, n: int, unit: str):
    """(hashes, per-doc offsets, per-doc length in the gram unit).

    unit="token": whitespace-token n-grams (the published 13-gram rule's
    unit). unit="char": character n-grams. Both kernels emit ONE
    sentinel hash for docs shorter than n units (slot offsets[d]) —
    callers mask it, since no n-gram exists there."""
    if unit == "token":
        h, offsets, units = _token_shingle_hashes(texts, n)
        return h, offsets, units
    if unit == "char":
        # code-point lengths come from the kernel's own encode pass
        # (VERDICT r4 nit: no separate per-row Python len() map)
        h, offsets, units = _char_shingle_hashes_with_lens(texts, n)
        return h, offsets, units
    raise ValueError(f"unknown unit {unit!r} (expected 'token' or 'char')")


def _shingle_arrow(col, n: int, unit: str):
    """:func:`_shingle` for an Arrow string column: all-ASCII null-free
    batches hash straight off the Arrow UTF-8 buffer (r7 — no pandas
    conversion, no per-row encode; bit-identical results, see
    dedup._token/_char_shingle_hashes_ascii); anything else falls back
    to the exact pandas kernels."""
    if unit in ("token", "char"):
        fast = _ascii_text_buffer(col)
        if fast is not None:
            data, lens = fast
            if unit == "char":
                return _char_shingle_hashes_ascii(data, lens, n)
            return _token_shingle_hashes_ascii(data, lens, n)
    return _shingle(col.to_pandas(), n, unit)


def _gram_hashes_df(df: DataFrame, text_col: str, n: int, unit: str) -> DataFrame:
    """Distinct n-gram hashes of a text column as a 1-column DataFrame
    (docs shorter than n units contribute nothing — no n-gram exists)."""
    schema = StructType([StructField("gram_hash", LongType(), False)])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            h, offsets, units = _shingle(pdf[text_col], n, unit)
            # mask out the whole-doc hash the kernel emits for short docs
            # (exactly ONE slot per short doc, at offsets[d] — kernel
            # contract; vectorized, VERDICT r3 #4)
            keep = np.ones(len(h), dtype=bool)
            keep[offsets[:-1][units < n]] = False
            yield pd.DataFrame({"gram_hash": np.unique(h[keep]).astype(np.int64)})

    # r7: AQE-rebalance the (tiny, post-filter) eval projection before
    # the Python stage — the gram extraction otherwise inherits the
    # SCAN's task count (e.g. 32-64 tasks for ~2k surviving docs), and
    # each Python task costs ~10-15 ms of serialized handshake
    # (§OPTIMIZATION_r07.md). AQE sizes the rebalance by bytes
    # (advisoryPartitionSizeInBytes), so corpus-sized eval tables still
    # fan out. Row placement only; the distinct gram set is unchanged.
    return df.select(text_col).hint("rebalance").mapInPandas(extract, schema).distinct()


class EvalGramOverflow(ValueError):
    """Eval set has more distinct n-grams than ``max_eval_grams`` — the
    broadcast-probe path is off the table; callers fall back to the
    distributed gram equi-join. A dedicated type (ADVICE r5): catching
    bare ValueError silently rerouted UNRELATED errors onto the
    expensive full-corpus-shuffle path."""


def eval_gram_table(
    eval_df: DataFrame,
    text_col: str,
    n: int = 13,
    max_eval_grams: int = 20_000_000,
    unit: str = "token",
) -> np.ndarray:
    """Sorted uint64 array of the eval set's distinct n-gram hashes.

    Collected to the driver deliberately: benchmarks are small by
    definition, and a sorted array broadcast once beats re-shuffling a
    100-TB corpus against it. ``max_eval_grams`` (default 2e7 ≈ 160 MB
    as a numpy array) guards against mis-pointing this at a corpus-sized
    table. Collection rides Arrow (``toArrow``), not row-object
    ``collect()`` — py4j Row objects cost ~100 bytes each, which at the
    default cap would be multi-GB of driver heap (ADVICE r3)."""
    # limit(cap+1) bounds driver memory in ONE scan; overflow raises
    limited = _gram_hashes_df(eval_df, text_col, n, unit).limit(max_eval_grams + 1)
    try:
        col = limited.toArrow().column("gram_hash").to_numpy(zero_copy_only=False)
    except AttributeError:  # Spark < 4 fallback: Arrow-backed toPandas
        col = limited.toPandas()["gram_hash"].to_numpy()
    if len(col) > max_eval_grams:
        raise EvalGramOverflow(
            f"eval set has >{max_eval_grams} distinct {n}-grams; "
            "decontaminate() broadcasts the eval side — use a smaller eval table "
            "or raise max_eval_grams if the driver/executors have the memory"
        )
    return np.sort(col.astype(np.int64).view(np.uint64))


def _probe_blob(spark: SparkSession, table: np.ndarray, method: str, bloom_fpr: float):
    """Broadcast the eval-side probe structure; returns the handle."""
    if method == "bloom":
        from ..core.bloom import BloomAccumulator, BloomSpec

        acc = BloomAccumulator()
        spec = BloomSpec.for_capacity(max(len(table), 1), bloom_fpr)
        state = acc.zero(spec)
        h1, h2 = _bloom_pair(table)
        acc._add(state, h1, h2, spec)
        return spark.sparkContext.broadcast(acc.serialize(state, spec))
    if method == "exact":
        return spark.sparkContext.broadcast(table.tobytes())
    raise ValueError(f"unknown method {method!r}")


def _make_member(method: str, blob: bytes):
    """Build the vectorized membership fn from the broadcast payload —
    called once per task."""
    if method == "bloom":
        from ..core.bloom import BloomAccumulator as _Acc
        from ..core.bloom import _positions

        state_l, spec_l = _Acc().deserialize(blob)

        def member(h: np.ndarray) -> np.ndarray:
            if len(h) == 0:
                return np.zeros(0, dtype=bool)
            h1, h2 = _bloom_pair(h)
            pos = _positions(h1, h2, spec_l.hashes, spec_l.bits)
            return state_l[pos].all(axis=0)

        return member

    sorted_hashes = np.frombuffer(blob, dtype=np.uint64)
    # cheap prefilter: a byte mask over the hash low bits turns ~97%+ of
    # probes into ONE vectorized byte load — searchsorted (binary
    # search, ~20 dependent loads/needle) runs only on the survivors.
    # Byte-identical result. r7: the mask is sized to the table (~64
    # slots/entry, clamped to [2^16, 2^24]) instead of a fixed 16 MB —
    # a benchmark-sized eval set (~40k grams) now uses a 4 MB
    # cache-resident mask with the same ~99% rejection, instead of
    # thrashing 16 MB × n_workers through the LLC.
    _MASK_BITS = max(16, min(24, int(max(len(sorted_hashes), 1) * 64 - 1).bit_length()))
    _MASK = np.uint64((1 << _MASK_BITS) - 1)
    prefilter = np.zeros(1 << _MASK_BITS, dtype=np.uint8)
    prefilter[(sorted_hashes & _MASK).astype(np.int64)] = 1

    def member(h: np.ndarray) -> np.ndarray:
        out = np.zeros(len(h), dtype=bool)
        if len(sorted_hashes) == 0 or len(h) == 0:
            return out
        maybe = prefilter[(h & _MASK).astype(np.int64)].view(bool)
        idx = np.flatnonzero(maybe)
        if len(idx):
            hh = h[idx]
            pos = np.minimum(np.searchsorted(sorted_hashes, hh), len(sorted_hashes) - 1)
            out[idx] = sorted_hashes[pos] == hh
        return out

    return member


def _flag_counts(member, h, offsets, units, n: int) -> np.ndarray:
    """Per-doc matched-gram occurrence counts from a shingle-kernel
    (hashes, offsets, units) triple."""
    if not len(h) or not len(units):
        return np.zeros(len(units), dtype=np.int64)
    hits = member(h)
    # zero out short docs' whole-doc sentinel hash (one slot each —
    # kernel contract; vectorized, VERDICT r3 #4)
    hits[offsets[:-1][units < n]] = False
    # the kernel emits >=1 hash per doc (short docs get a whole-doc
    # sentinel, masked above), so offsets are strictly increasing and
    # reduceat is well-defined per doc
    return np.add.reduceat(hits.astype(np.int64), offsets[:-1])


def _flag_batch(member, texts: pd.Series, n: int, unit: str = "char") -> np.ndarray:
    """Per-doc matched-gram occurrence counts for one batch."""
    h, offsets, units = _shingle(texts, n, unit)
    return _flag_counts(member, h, offsets, units, n)


def _corpus_gram_occurrences(docs: DataFrame, id_col: str, text_col: str, n: int, unit: str) -> DataFrame:
    """(id, gram_hash) — one row per n-gram OCCURRENCE of every doc
    (short-doc sentinel hashes masked). The corpus side of the
    distributed fallback join; never used when the eval side fits the
    broadcast cap."""
    schema = StructType([docs.schema[id_col], StructField("gram_hash", LongType(), False)])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            h, offsets, units = _shingle(pdf[text_col], n, unit)
            keep = np.ones(len(h), dtype=bool)
            keep[offsets[:-1][units < n]] = False
            per_doc = offsets[1:] - offsets[:-1]
            ids = np.repeat(pdf[id_col].values, per_doc)[keep]
            yield pd.DataFrame({id_col: ids, "gram_hash": h[keep].astype(np.int64)})

    return docs.select(id_col, text_col).mapInPandas(extract, schema)


def _flag_via_join(corpus_grams: DataFrame, eval_df: DataFrame, id_col: str,
                   eval_text_col: str, n: int, unit: str) -> DataFrame:
    """Distributed fallback (r5, VERDICT r4 #6): equi-join corpus gram
    occurrences against the eval set's DISTINCT gram hashes, then count
    per doc — identical flags/counts to the broadcast-probe path, at the
    cost of shuffling the corpus's gram stream. Only taken when the eval
    side exceeds ``max_eval_grams``."""
    eval_grams = _gram_hashes_df(eval_df, eval_text_col, n, unit)
    return (
        corpus_grams.join(eval_grams, "gram_hash")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched_grams"))
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_text_col: str | None = None,
    n: int = 13,
    method: str = "exact",
    bloom_fpr: float = 0.001,
    max_eval_grams: int = 20_000_000,
    unit: str = "token",
) -> DataFrame:
    """Flag corpus documents sharing ≥1 n-gram with eval_df.

    ``unit="token"`` (DEFAULT — VERDICT r3 #1): n-grams of whitespace
    tokens, the unit of the published GPT-3-appendix / Llama 13-gram
    rule this operator implements. ``unit="char"`` keeps the previous
    character-n-gram semantics (≈2.5 English words at n=13 — far more
    aggressive; useful for sub-word contamination screens).

    Returns (id_col, n_matched_grams) for flagged docs only. Keepers =
    ``docs.join(flagged, id_col, "left_anti")``.

    method="exact": broadcast sorted hash array, prefiltered searchsorted.
    method="bloom": broadcast this engine's Bloom over the eval hashes
    (~10 bits/gram at fpr 1e-3) — smaller broadcast, may over-flag at
    the documented fpr, never under-flags.

    Crossover (r5): when the eval side's distinct gram count exceeds
    ``max_eval_grams`` (default 2e7 ≈ 160 MB broadcast — real benchmarks
    are far below it), the operator no longer raises: it falls back to a
    distributed equi-join of the corpus's gram-hash stream against the
    eval gram DataFrame (flags via groupBy count — identical results,
    one corpus-gram shuffle instead of zero). The broadcast probe stays
    the scale path; the join is the correctness net for corpus-sized
    "eval" tables.
    """
    eval_text_col = eval_text_col or text_col
    spark = docs.sparkSession
    try:
        table = eval_gram_table(eval_df, eval_text_col, n, max_eval_grams, unit)
    except EvalGramOverflow:
        return _flag_via_join(
            _corpus_gram_occurrences(docs, id_col, text_col, n, unit),
            eval_df, id_col, eval_text_col, n, unit,
        )
    probe_state = _probe_blob(spark, table, method, bloom_fpr)

    schema = StructType(
        [docs.schema[id_col], StructField("n_matched_grams", LongType(), False)]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        member = _make_member(method, probe_state.value)
        for pdf in batches:
            per_doc = _flag_batch(member, pdf[text_col], n, unit)
            flagged = per_doc > 0
            if flagged.any():
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].values[flagged],
                        "n_matched_grams": per_doc[flagged],
                    }
                )

    return docs.select(id_col, text_col).mapInPandas(probe, schema)


def decontaminate_parquet(
    spark: SparkSession,
    path: str,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_text_col: str | None = None,
    n: int = 13,
    method: str = "exact",
    bloom_fpr: float = 0.001,
    max_eval_grams: int = 20_000_000,
    unit: str = "token",
    filter=None,
    batch_rows: int = 32768,
    files_per_task: int | None = None,
) -> DataFrame:
    """:func:`decontaminate` with the corpus scan moved INTO the Python
    workers (``map_parquet_batches``): the driver plans file/row-group
    splits, each task reads only (id, text) with pyarrow (column-pruned,
    filters pushed) and probes in place. Same results as the DataFrame
    path on the same table (equivalence-tested); use when the corpus
    scan dominates — the generic DataFrame path pays the shared-JVM
    Arrow-IPC ceiling (~5.4M rows/s measured here) that this path dodges,
    exactly like ``build_sketches_parquet``."""
    import pyarrow as pa

    from ..sources.parquet_scan import map_parquet_batches

    eval_text_col = eval_text_col or text_col
    id_field = spark.read.parquet(path).schema[id_col]
    try:
        table = eval_gram_table(eval_df, eval_text_col, n, max_eval_grams, unit)
    except EvalGramOverflow:
        # same distributed-join fallback as :func:`decontaminate`, with
        # the corpus gram stream produced by the worker-side scan
        gram_schema = StructType([id_field, StructField("gram_hash", LongType(), False)])

        def gfn(batches):
            for rb in batches:
                pdf = rb.to_pandas()
                h, offsets, units = _shingle(pdf[text_col], n, unit)
                keep = np.ones(len(h), dtype=bool)
                keep[offsets[:-1][units < n]] = False
                per_doc = offsets[1:] - offsets[:-1]
                ids = np.repeat(pdf[id_col].values, per_doc)[keep]
                if len(ids):
                    yield pa.RecordBatch.from_pandas(
                        pd.DataFrame({id_col: ids, "gram_hash": h[keep].astype(np.int64)}),
                        preserve_index=False,
                    )

        corpus_grams = map_parquet_batches(
            spark, path, gfn, gram_schema, [id_col, text_col], filter, batch_rows, files_per_task
        )
        return _flag_via_join(corpus_grams, eval_df, id_col, eval_text_col, n, unit)
    probe_state = _probe_blob(spark, table, method, bloom_fpr)

    schema = StructType([id_field, StructField("n_matched_grams", LongType(), False)])

    def fn(batches):
        member = _make_member(method, probe_state.value)
        for rb in batches:
            # Arrow-native probe (r7): shingle straight off the Arrow
            # string buffer (ASCII fast path, exact pandas fallback) and
            # materialize ONLY the flagged rows' ids — unflagged rows
            # never become Python objects at all
            tcol = rb.column(rb.schema.get_field_index(text_col))
            h, offsets, units = _shingle_arrow(tcol, n, unit)
            per_doc = _flag_counts(member, h, offsets, units, n)
            idx = np.flatnonzero(per_doc > 0)
            if len(idx):
                ids = rb.column(rb.schema.get_field_index(id_col)).take(
                    pa.array(idx)
                )
                yield pa.RecordBatch.from_arrays(
                    [ids, pa.array(per_doc[idx], type=pa.int64())],
                    names=[id_col, "n_matched_grams"],
                )

    return map_parquet_batches(
        spark, path, fn, schema, [id_col, text_col], filter, batch_rows, files_per_task
    )
