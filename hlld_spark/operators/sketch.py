"""Distributed sketch aggregation: the Spark restatement of hlld's write path.

The reference's hot loop is ``bulk name k1 k2 ...`` — per-thread register
updates into a shared array (/root/reference/src/conn_handler.c:166-217,
src/set.c:267-289). Its distributed shape here:

    stage 1  mapInPandas   — partition-local build: hash + rho + scatter-max
                             over Arrow batches, one partial sketch per
                             (partition, group). This is Catalyst's
                             partial-aggregate phase, hand-rolled because
                             Python UDAFs can't partial-agg natively.
    stage 2  applyInPandas — register-wise max (HLL) / counter-sum (CMS) /
                             bitwise-OR (Bloom) merge per group.

Scale properties (designed for 10^12 rows / 1000 executors):

* the shuffle moves **sketches, not rows**: ≤ groups × partitions rows of
  a few KB each, independent of input cardinality. A 100 TB scan with 10
  groups shuffles ~10 × n_partitions × sketch_bytes — megabytes.
* row-level key skew is irrelevant: a partition with 10^9 rows of one
  lang still emits exactly one partial per group. No salting is needed
  for sketch builds (the partial agg *is* the salt); `salt_partitions`
  exists for callers who want to bound per-task group fan-out when
  grouping by a high-cardinality key.
* input scan prunes to ``keys + [col]`` before entering Python, so
  parquet reads only the needed columns (check .explain ReadSchema).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, DoubleType, LongType, StructField, StructType

from ..core.accumulator import HllSpec, accumulator_for, deserialize_any
from ..core.hashing import hll_hash

_SKETCH_FIELD = "sketch"
_NROWS_FIELD = "n_rows"


def _result_schema(df: DataFrame, keys: list[str]) -> StructType:
    fields = [df.schema[k] for k in keys]
    fields.append(StructField(_SKETCH_FIELD, BinaryType(), False))
    fields.append(StructField(_NROWS_FIELD, LongType(), False))
    return StructType(fields)


def _group_indices(pdf: pd.DataFrame, keys: list[str]) -> dict[tuple, np.ndarray]:
    if not keys:
        return {(): np.arange(len(pdf))}
    grouped = pdf.groupby(keys, sort=False, dropna=False).indices
    if len(keys) == 1:
        return {(k,): v for k, v in grouped.items()}
    return grouped


def _make_build_partials(keys: list[str], col: str, spec):
    acc_kind = spec.kind

    def build_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..core.accumulator import _ACCUMULATORS

        acc = _ACCUMULATORS[acc_kind]
        states: dict[tuple, object] = {}
        counts: dict[tuple, int] = {}
        for pdf in batches:
            values = pdf[col]
            mask = values.notna()
            if not mask.all():
                pdf = pdf[mask]
                values = pdf[col]
            if len(pdf) == 0:
                continue
            # hash/ingest the whole batch column once, slice per group
            prepared = acc.prepare_batch(values) if hasattr(acc, "prepare_batch") else None
            for gkey, idx in _group_indices(pdf, keys).items():
                st = states.get(gkey)
                if st is None:
                    st = acc.zero(spec)
                    counts[gkey] = 0
                if prepared is not None:
                    st = acc.update_prepared(st, prepared, idx, spec)
                else:
                    st = acc.update(st, values.iloc[idx], spec)
                states[gkey] = st
                counts[gkey] += len(idx)
        if not states:
            return
        rows = {k: [g[i] for g in states] for i, k in enumerate(keys)}
        out = pd.DataFrame(rows)
        out[_SKETCH_FIELD] = [acc.serialize(s, spec) for s in states.values()]
        out[_NROWS_FIELD] = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
        yield out

    return build_partials


def _make_merge_partials(keys: list[str]):
    def merge_partials(pdf: pd.DataFrame) -> pd.DataFrame:
        bufs = pdf[_SKETCH_FIELD]
        acc, state, spec = deserialize_any(bufs.iloc[0])
        for b in bufs.iloc[1:]:
            _, other, ospec = deserialize_any(b)
            state = acc.merge(state, other, spec)
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row[_SKETCH_FIELD] = [acc.serialize(state, spec)]
        row[_NROWS_FIELD] = [int(pdf[_NROWS_FIELD].sum())]
        return pd.DataFrame(row)

    return merge_partials


def build_sketches(
    df: DataFrame,
    keys: list[str] | None,
    col: str,
    spec=None,
    salt_partitions: int | None = None,
) -> DataFrame:
    """``groupBy(keys).agg(sketch(col))`` → DataFrame(keys..., sketch, n_rows).

    ``spec`` defaults to reference-default HLL (p=12, eps≈2%
    — /root/reference/src/config.c:26-27).
    """
    spec = spec if spec is not None else HllSpec()
    keys = list(keys or [])
    accumulator_for(spec)  # validate early, on the driver
    pruned = df.select(*keys, col)
    if salt_partitions:
        pruned = pruned.repartition(salt_partitions, F.col(col) if not keys else F.col(keys[0]))
    schema = _result_schema(pruned, keys)
    partials = pruned.mapInPandas(_make_build_partials(keys, col, spec), schema=schema)
    if not keys:
        # global sketch: single-group tree merge; coalesce partials first
        return partials.coalesce(1).mapInPandas(_merge_all_factory(), schema=schema)
    return partials.groupBy(*keys).applyInPandas(_make_merge_partials(keys), schema=schema)


def _merge_all_factory():
    def merge_all(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = state = spec = None
        n = 0
        for pdf in batches:
            for buf, nr in zip(pdf[_SKETCH_FIELD], pdf[_NROWS_FIELD]):
                a, st, sp = deserialize_any(buf)
                if state is None:
                    acc, state, spec = a, st, sp
                else:
                    state = acc.merge(state, st, spec)
                n += int(nr)
        if state is not None:
            yield pd.DataFrame({_SKETCH_FIELD: [acc.serialize(state, spec)], _NROWS_FIELD: [n]})

    return merge_all


def merge_sketches(sketch_df: DataFrame, keys: list[str] | None) -> DataFrame:
    """Re-aggregate an existing sketch table to a coarser grain.

    Sketches are re-aggregable: per-(lang, day) sketches merge up to
    per-lang, per-day, or global without touching the raw rows — the
    grouping-sets strategy from SURVEY.md §2.2.
    """
    keys = list(keys or [])
    base = sketch_df.select(*keys, _SKETCH_FIELD, _NROWS_FIELD)
    if not keys:
        schema = StructType(
            [StructField(_SKETCH_FIELD, BinaryType(), False), StructField(_NROWS_FIELD, LongType(), False)]
        )
        return base.coalesce(1).mapInPandas(_merge_all_factory(), schema=schema)
    schema = _result_schema(base, keys)
    return base.groupBy(*keys).applyInPandas(_make_merge_partials(keys), schema=schema)


@F.pandas_udf(DoubleType())
def sketch_estimate(bufs: pd.Series) -> pd.Series:
    """Primary estimate per serialized sketch (HLL → cardinality,
    CMS/Bloom/t-digest/KLL → their scalar default)."""
    out = np.empty(len(bufs), dtype=np.float64)
    for i, b in enumerate(bufs):
        acc, state, spec = deserialize_any(b)
        out[i] = acc.estimate(state, spec)
    return pd.Series(out)


@F.pandas_udf(LongType())
def sketch_size_bytes(bufs: pd.Series) -> pd.Series:
    return pd.Series([len(b) for b in bufs], dtype=np.int64)


def with_estimate(sketch_df: DataFrame, out: str = "estimate") -> DataFrame:
    return sketch_df.withColumn(out, sketch_estimate(F.col(_SKETCH_FIELD)))


def distinct_count(
    df: DataFrame, keys: list[str] | None, col: str, spec=None, out: str = "estimate"
) -> DataFrame:
    """End-to-end approximate COUNT(DISTINCT col) GROUP BY keys."""
    keys = list(keys or [])
    sk = build_sketches(df, keys, col, spec)
    return with_estimate(sk, out).select(*keys, out, _NROWS_FIELD)
