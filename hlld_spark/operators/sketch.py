"""Distributed sketch aggregation: the Spark restatement of hlld's write path.

The reference's hot loop is ``bulk name k1 k2 ...`` — per-thread register
updates into a shared array (/root/reference/src/conn_handler.c:166-217,
src/set.c:267-289). Its distributed shape here:

    stage 1  mapInArrow    — partition-local build: hash + rho + scatter-max
                             over Arrow batches (pandas fallback on old
                             PySpark), one partial sketch per
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

import math
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


def _make_build_partials_arrow(keys: list[str], col: str, spec):
    """Arrow-native partial build (mapInArrow): no pandas conversion, no
    per-row PyObject strings — group codes via C++ dictionary_encode,
    hashes via the zero-copy arrow buffer path. This is the hot path; the
    pandas variant below is the fallback."""
    acc_kind = spec.kind

    def build_partials(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..core.accumulator import _ACCUMULATORS, new_builder

        acc = _ACCUMULATORS[acc_kind]
        states: dict[tuple, object] = {}  # gkey -> builder
        counts: dict[tuple, int] = {}
        reps: dict[tuple, tuple] = {}  # gkey -> pa scalars (preserve exact types)
        key_types = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            if key_types is None:
                key_types = [rb.schema.field(k).type for k in keys]
            vcol = rb.column(rb.schema.get_field_index(col))
            if vcol.null_count:
                rb = rb.filter(pc.is_valid(vcol))
                if rb.num_rows == 0:
                    continue
                vcol = rb.column(rb.schema.get_field_index(col))
            prepared = acc.prepare_batch(vcol, spec)
            if not keys:
                b = states.get(())
                if b is None:
                    b = states[()] = new_builder(acc, spec)
                    counts[()] = 0
                b.add_prepared(prepared, np.arange(rb.num_rows))
                counts[()] += rb.num_rows
                continue
            # combine per-key dictionary codes into one group code; for
            # 3+ keys each step is re-encoded with np.unique so the code
            # range stays ≤ batch size (no int64 overflow regardless of
            # key count / category cardinality)
            combined = None
            for k in keys:
                d = pc.dictionary_encode(rb.column(rb.schema.get_field_index(k)))
                idxs = d.indices
                ncat = len(d.dictionary)
                codes = (
                    idxs.fill_null(ncat).to_numpy(zero_copy_only=False).astype(np.int64)
                    if idxs.null_count
                    else idxs.to_numpy(zero_copy_only=False).astype(np.int64)
                )
                if combined is None:
                    combined = codes
                else:
                    combined = combined * (ncat + 1) + codes
                    if len(keys) > 2:
                        combined = np.unique(combined, return_inverse=True)[1]
            order = np.argsort(combined, kind="stable")
            sorted_codes = combined[order]
            bounds = np.flatnonzero(np.diff(sorted_codes)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(order)]))
            key_cols = [rb.column(rb.schema.get_field_index(k)) for k in keys]
            for s, e in zip(starts, ends):
                idx = order[s:e]
                # group-key scalars straight from a representative row —
                # exact arrow types preserved, nulls included
                r0 = int(idx[0])
                scalars = tuple(kc[r0] for kc in key_cols)
                gkey = tuple(s.as_py() for s in scalars)
                b = states.get(gkey)
                if b is None:
                    b = states[gkey] = new_builder(acc, spec)
                    counts[gkey] = 0
                    reps[gkey] = scalars
                b.add_prepared(prepared, idx)
                counts[gkey] += len(idx)
        if not states:
            return
        arrays = []
        names = []
        for i, k in enumerate(keys):
            vals = [reps[g][i].as_py() for g in states]
            arrays.append(pa.array(vals, type=key_types[i]))
            names.append(k)
        arrays.append(pa.array([acc.serialize(b.finish(), spec) for b in states.values()], type=pa.binary()))
        names.append(_SKETCH_FIELD)
        arrays.append(pa.array([counts[g] for g in states], type=pa.int64()))
        names.append(_NROWS_FIELD)
        yield pa.RecordBatch.from_arrays(arrays, names=names)

    return build_partials


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
            prepared = acc.prepare_batch(values, spec) if hasattr(acc, "prepare_batch") else None
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


#: above this many partial sketches, global merges go through a
#: sqrt(n)-task intermediate level so the final task's fan-in stays
#: logarithmic-ish (≈√n blobs) instead of linear
_GLOBAL_MERGE_FANIN = 64


def _merge_global(partials: DataFrame, schema) -> DataFrame:
    """Merge per-task partial sketches down to ONE global row.

    Uses ``repartition`` (a real exchange), NOT ``coalesce``: coalesce(1)
    is a narrow dependency that collapses the entire upstream stage into
    the single merge task — measured empirically, 16 input partitions'
    partial BUILDS all ran under one taskAttemptId, i.e. the global path
    was serialized end-to-end. The exchange it replaces them with
    carries only tasks × sketch_bytes (a few KB per task), so the build
    stays fully parallel and the shuffle is ~free.

    Above ``_GLOBAL_MERGE_FANIN`` partials, a two-level tree
    (repartition(⌈√n⌉) merge, then repartition(1) merge) bounds the
    final task's fan-in at ~√n blobs: at 10^5–10^6 map tasks the last
    task pulls MBs, not GBs. Reference analog: hlld's partial/final set
    fold (/root/reference/src/set.c:281-284) never funnels every
    partial through one thread either.

    Byte-identity: HLL (register max), CMS (counter sum), Bloom
    (bitwise OR) merges are associative AND commutative, so the tree
    yields byte-identical output regardless of arrival order; t-digest/
    KLL are order-sensitive in representation but remain within their
    published error bounds (same property the keyed groupBy merge
    already relies on).
    """
    use_arrow = hasattr(partials, "mapInArrow")
    factory = _merge_all_arrow_factory if use_arrow else _merge_all_factory
    mapper = "mapInArrow" if use_arrow else "mapInPandas"
    n = partials.rdd.getNumPartitions()
    out = partials
    if n > _GLOBAL_MERGE_FANIN:
        mid = int(math.ceil(math.sqrt(n)))
        out = getattr(out.repartition(mid), mapper)(factory(), schema=schema)
    return getattr(out.repartition(1), mapper)(factory(), schema=schema)


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
    if hasattr(pruned, "mapInArrow"):
        partials = pruned.mapInArrow(_make_build_partials_arrow(keys, col, spec), schema=schema)
    else:  # older PySpark fallback: pandas batches
        partials = pruned.mapInPandas(_make_build_partials(keys, col, spec), schema=schema)
    if not keys:
        # global sketch: exchange the KB-sized partials, tree-merge
        return _merge_global(partials, schema)
    return partials.groupBy(*keys).applyInPandas(_make_merge_partials(keys), schema=schema)


def _pq_filter_to_expr(filters):
    """Convert read_table-style [(col, op, val), ...] filters to a
    pyarrow.dataset expression (for the row-group read path)."""
    import pyarrow.dataset as ds

    expr = None
    for col, op, val in filters:
        f = ds.field(col)
        if op in ("=", "=="):
            e = f == val
        elif op == "!=":
            e = f != val
        elif op == "<":
            e = f < val
        elif op == "<=":
            e = f <= val
        elif op == ">":
            e = f > val
        elif op == ">=":
            e = f >= val
        elif op == "in":
            e = f.isin(val)
        else:
            raise ValueError(f"unsupported filter op {op!r}")
        expr = e if expr is None else (expr & e)
    return expr


def list_parquet_files(path: str) -> list[str]:
    """Plan the file splits for a parquet table path or glob.

    Uses pyarrow.dataset discovery (works for local paths AND object
    stores like s3://, and skips `_SUCCESS`-style non-data files via the
    default '_'/'.' ignore prefixes); falls back to glob for patterns.
    """
    import glob as _glob
    import os as _os

    import pyarrow.dataset as _ds

    if "*" in path or "?" in path:
        files = sorted(_glob.glob(path))
    else:
        try:
            files = sorted(_ds.dataset(path, format="parquet").files)
        except Exception:
            if _os.path.isdir(path):
                files = sorted(_glob.glob(_os.path.join(path, "*.parquet")))
            else:
                files = sorted(_glob.glob(path))
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    return files


def build_sketches_parquet(
    spark,
    path: str,
    keys: list[str] | None,
    col: str,
    spec=None,
    filter=None,
    files_per_task: int | None = None,
    batch_rows: int = 32768,
) -> DataFrame:
    """Sketch build with **worker-side parquet reads**: file splits are
    planned on the driver and each Spark python task reads its splits
    directly with pyarrow (column-pruned, optional pushed-down filter),
    so no row data crosses the JVM↔Python Arrow IPC channel.

    Why this exists: profiled on local[N], the generic DataFrame path
    saturates at ~5.4M rows/s on the shared JVM-side Arrow IPC/allocator
    regardless of cores, while direct pyarrow reads scale linearly
    (0.87 efficiency 2→8 procs, ~2.5× absolute). On a real cluster this
    is the standard python-native-engine pattern (Spark 4 Python Data
    Source / pyiceberg plan_files read data files the same way): the
    scan happens where the compute is, object store → worker.

    ``filter`` accepts EITHER a read_table-style ``[(col, op, val), ...]``
    tuple list OR a ``pyarrow.dataset`` Expression; both forms are
    evaluated in the parquet reader (row-group pruning + late
    materialization) on both the whole-file and row-group-split paths.
    """
    from ..sources.parquet_scan import map_parquet_batches

    spec = spec if spec is not None else HllSpec()
    keys = list(keys or [])
    accumulator_for(spec)
    files = list_parquet_files(path)
    # key schema from the parquet footer (driver-side, metadata only)
    probe = spark.read.parquet(files[0]).select(*keys, col) if keys else spark.read.parquet(files[0]).select(col)
    schema = _result_schema(probe, keys)
    # one continuous batch stream per task ⇒ one partial per (task,
    # group), amortized across all of the task's splits
    partials = map_parquet_batches(
        spark,
        path,
        _make_build_partials_arrow(keys, col, spec),
        schema,
        keys + [col],
        filter=filter,
        batch_rows=batch_rows,
        files_per_task=files_per_task,
        # r7: ONE wave of full-width tasks — the sketch build is uniform
        # scan+hash work where the ~5-10 ms serialized per-Python-task
        # handshake dominates makespan variance (A/B: best 0.67 s vs
        # 1.05 s at bench scale); compute-heavy consumers keep waves=2
        waves=1,
    )
    if not keys:
        return _merge_global(partials, schema)
    return partials.groupBy(*keys).applyInPandas(_make_merge_partials(keys), schema=schema)


def _merge_all_arrow_factory():
    def merge_all(batches):
        import pyarrow as pa

        acc = state = spec = None
        n = 0
        for rb in batches:
            sk_i = rb.schema.get_field_index(_SKETCH_FIELD)
            nr_i = rb.schema.get_field_index(_NROWS_FIELD)
            for buf, nr in zip(rb.column(sk_i).to_pylist(), rb.column(nr_i).to_pylist()):
                a, st, sp = deserialize_any(buf)
                if state is None:
                    acc, state, spec = a, st, sp
                else:
                    state = acc.merge(state, st, spec)
                n += int(nr)
        if state is not None:
            yield pa.RecordBatch.from_arrays(
                [pa.array([acc.serialize(state, spec)], pa.binary()), pa.array([n], pa.int64())],
                names=[_SKETCH_FIELD, _NROWS_FIELD],
            )

    return merge_all


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
        return _merge_global(base, schema)
    schema = _result_schema(base, keys)
    return base.groupBy(*keys).applyInPandas(_make_merge_partials(keys), schema=schema)


def rollup_sketches(df: DataFrame, keys: list[str], col: str, spec=None) -> DataFrame:
    """SQL ROLLUP over sketches without rescanning rows: build once at
    the finest grain, then re-merge upward (sketches are re-aggregable).
    Output: keys (null = aggregated-out, like ROLLUP) + sketch + n_rows +
    grouping_level (0 = finest … len(keys) = grand total).

    At 100 TB this is the difference between one scan and len(keys)+1
    scans — coarser grains merge a few KB of registers per group.
    """
    spec = spec if spec is not None else HllSpec()
    finest = build_sketches(df, keys, col, spec)
    out = finest.withColumn("grouping_level", F.lit(0))
    level = finest
    for i in range(len(keys), 0, -1):
        coarser_keys = keys[: i - 1]
        level = merge_sketches(level, coarser_keys)
        withnulls = level
        for k in keys[i - 1 :]:
            withnulls = withnulls.withColumn(k, F.lit(None).cast(df.schema[k].dataType))
        out = out.unionByName(
            withnulls.select(*keys, _SKETCH_FIELD, _NROWS_FIELD).withColumn(
                "grouping_level", F.lit(len(keys) - i + 1)
            )
        )
    return out


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
