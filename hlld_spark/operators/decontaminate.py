"""Benchmark decontamination — flag training documents that share any
character n-gram with an evaluation/benchmark set.

The standard LLM-training hygiene step (the GPT-3 appendix / Llama
"13-gram overlap" rule): any training document containing an n-gram that
also appears in a held-out benchmark is flagged (and usually dropped) so
eval scores aren't contaminated by memorization.

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
  table with ``np.searchsorted`` — only ``(id, n_matched)`` leaves the
  worker. No shuffle of corpus data at all; the only exchange is the
  (tiny) flagged-id set if the caller dedups/joins afterwards.
* ``method="bloom"`` swaps the sorted array for this engine's own Bloom
  filter (``core.bloom``) built over the eval hashes: ~10x smaller
  broadcast at a documented false-positive rate. Bloom errors only
  OVER-flag (drop a clean doc), never under-flag — the safe direction
  for decontamination.

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
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .dedup import _char_shingle_hashes, _splitmix

# second hash for the Bloom double-hashing scheme — any odd constant
# xor + splitmix gives an independent-enough h2 from the gram hash
_BLOOM_H2_SALT = np.uint64(0x9E3779B97F4A7C15)


def _bloom_pair(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return h, _splitmix(h ^ _BLOOM_H2_SALT)


def _gram_hashes_df(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct n-gram hashes of a text column as a 1-column DataFrame
    (docs shorter than n contribute nothing — no n-gram exists)."""
    schema = StructType([StructField("gram_hash", LongType(), False)])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col]
            lens = texts.map(lambda t: len(t) if isinstance(t, str) else 0).values
            h, offsets = _char_shingle_hashes(texts, n)
            # mask out the whole-doc hash the kernel emits for short docs
            keep = np.ones(len(h), dtype=bool)
            short = np.flatnonzero(lens < n)
            for d in short:
                keep[int(offsets[d]) : int(offsets[d + 1])] = False
            yield pd.DataFrame({"gram_hash": np.unique(h[keep]).astype(np.int64)})

    return df.select(text_col).mapInPandas(extract, schema).distinct()


def eval_gram_table(
    eval_df: DataFrame, text_col: str, n: int = 13, max_eval_grams: int = 20_000_000
) -> np.ndarray:
    """Sorted uint64 array of the eval set's distinct n-gram hashes.

    Collected to the driver deliberately: benchmarks are small by
    definition, and a sorted array broadcast once beats re-shuffling a
    100-TB corpus against it. ``max_eval_grams`` (default 2e7 ≈ 160 MB)
    guards against mis-pointing this at a corpus-sized table."""
    # limit(cap+1) bounds driver memory in ONE scan; overflow raises
    rows = _gram_hashes_df(eval_df, text_col, n).limit(max_eval_grams + 1).collect()
    if len(rows) > max_eval_grams:
        raise ValueError(
            f"eval set has >{max_eval_grams} distinct {n}-grams; "
            "decontaminate() broadcasts the eval side — use a smaller eval table "
            "or raise max_eval_grams if the driver/executors have the memory"
        )
    return np.sort(np.array([r[0] for r in rows], dtype=np.int64).view(np.uint64))


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
) -> DataFrame:
    """Flag corpus documents sharing ≥1 character n-gram with eval_df.

    Returns (id_col, n_matched_grams) for flagged docs only. Keepers =
    ``docs.join(flagged, id_col, "left_anti")``.

    method="exact": broadcast sorted hash array, searchsorted probe.
    method="bloom": broadcast this engine's Bloom over the eval hashes
    (~10 bits/gram at fpr 1e-3) — smaller broadcast, may over-flag at
    the documented fpr, never under-flags.
    """
    eval_text_col = eval_text_col or text_col
    spark = docs.sparkSession
    table = eval_gram_table(eval_df, eval_text_col, n, max_eval_grams)

    if method == "bloom":
        from ..core.bloom import BloomAccumulator, BloomSpec

        acc = BloomAccumulator()
        spec = BloomSpec.for_capacity(max(len(table), 1), bloom_fpr)
        state = acc.zero(spec)
        h1, h2 = _bloom_pair(table)
        acc._add(state, h1, h2, spec)
        probe_state = spark.sparkContext.broadcast(acc.serialize(state, spec))
    elif method == "exact":
        probe_state = spark.sparkContext.broadcast(table.tobytes())
    else:
        raise ValueError(f"unknown method {method!r}")

    schema = StructType(
        [docs.schema[id_col], StructField("n_matched_grams", LongType(), False)]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if method == "bloom":
            from ..core.bloom import BloomAccumulator as _Acc
            from ..core.bloom import _positions

            _acc = _Acc()
            state_l, spec_l = _acc.deserialize(probe_state.value)

            def member(h: np.ndarray) -> np.ndarray:
                if len(h) == 0:
                    return np.zeros(0, dtype=bool)
                h1, h2 = _bloom_pair(h)
                pos = _positions(h1, h2, spec_l.hashes, spec_l.bits)
                return state_l[pos].all(axis=0)

        else:
            sorted_hashes = np.frombuffer(probe_state.value, dtype=np.uint64)
            # cheap prefilter: a 2^24-slot byte mask over the hash low
            # bits turns ~97% of probes into ONE vectorized byte load —
            # searchsorted (binary search, ~20 dependent loads/needle)
            # runs only on the survivors. Byte-identical result.
            _MASK_BITS = 24
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
                    pos = np.minimum(
                        np.searchsorted(sorted_hashes, hh), len(sorted_hashes) - 1
                    )
                    out[idx] = sorted_hashes[pos] == hh
                return out

        for pdf in batches:
            texts = pdf[text_col]
            lens = texts.map(lambda t: len(t) if isinstance(t, str) else 0).values
            h, offsets = _char_shingle_hashes(texts, n)
            hits = member(h) if len(h) else np.zeros(0, dtype=bool)
            # zero out short docs' whole-doc sentinel hash
            short = np.flatnonzero(lens < n)
            for d in short:
                hits[int(offsets[d]) : int(offsets[d + 1])] = False
            # the kernel emits >=1 hash per doc (short docs get a
            # whole-doc sentinel, masked above), so offsets are strictly
            # increasing and reduceat is well-defined per doc
            per_doc = (
                np.add.reduceat(hits.astype(np.int64), offsets[:-1])
                if len(h)
                else np.zeros(len(pdf), dtype=np.int64)
            )
            flagged = per_doc > 0
            if flagged.any():
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].values[flagged],
                        "n_matched_grams": per_doc[flagged],
                    }
                )

    return docs.select(id_col, text_col).mapInPandas(probe, schema)
