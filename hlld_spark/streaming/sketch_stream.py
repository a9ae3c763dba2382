"""Structured Streaming sketch aggregation.

The reference is an *online* server: incremental ``set`` ops mutate
named registers, periodic flush persists them (src/background.c:99-146).
The streaming restatement: registers are the **state** of a stateful
operator, the register-max update is the state transition, and each
trigger emits the refreshed estimate.

Two surfaces:

* :func:`sketch_stream` — ``groupBy(keys).applyInPandasWithState``:
  state = one serialized sketch per key, arbitrary-cardinality keys,
  estimate emitted on every update.
* :func:`windowed_sketch_stream` — event-time tumbling windows with a
  watermark: one sketch per (window, keys...). Late rows beyond the
  watermark are dropped by Spark's late-row filter; closed windows'
  STATE is removed explicitly via EventTimeTimeout + state.remove()
  (custom stateful operators don't get watermark eviction for free).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..core.accumulator import HllSpec, accumulator_for, deserialize_any


def _state_schema() -> StructType:
    return StructType(
        [StructField("sketch", BinaryType(), True), StructField("n_rows", LongType(), True)]
    )


def _interval_ms(interval: str) -> int:
    """Parse simple '<n> <unit>' Spark interval strings to milliseconds."""
    n, unit = interval.strip().split()
    unit = unit.rstrip("s")
    scale = {"millisecond": 1, "second": 1000, "minute": 60_000, "hour": 3_600_000,
             "day": 86_400_000, "week": 604_800_000}[unit]
    return int(float(n) * scale)


def sketch_stream(
    stream_df: DataFrame,
    keys: list[str],
    col: str,
    spec=None,
    _evict_after_ms: int | None = None,
    _watermark_col: str | None = None,
) -> DataFrame:
    """Continuously-updated per-key sketches over a stream.

    Output rows (update semantics): (keys..., estimate double, n_rows
    long, sketch binary) — re-emitted for a key whenever new rows arrive.

    Per-key state persists for the life of the query — the reference's
    named sets likewise live until dropped — so key cardinality bounds
    state size. For bounded event-time windows use
    :func:`windowed_sketch_stream`, which evicts closed windows' state.

    ``_evict_after_ms`` (internal, used by windowed_sketch_stream): when
    set, keys are event-time keyed — the FIRST key column must be a
    window-start timestamp — and state is removed via EventTimeTimeout
    once the watermark passes window_start + _evict_after_ms.
    """
    spec = spec if spec is not None else HllSpec()
    accumulator_for(spec)
    keys = list(keys)
    out_fields = [stream_df.schema[k] for k in keys] + [
        StructField("estimate", DoubleType(), False),
        StructField("n_rows", LongType(), False),
        StructField("sketch", BinaryType(), False),
    ]
    out_schema = StructType(out_fields)
    acc_kind = spec.kind
    fspec = spec
    fcol = col
    evict_ms = _evict_after_ms

    def update(key, pdfs, state: GroupState):
        from ..core.accumulator import _ACCUMULATORS

        if evict_ms is not None and state.hasTimedOut:
            state.remove()  # window closed: watermark passed its end
            return
        acc = _ACCUMULATORS[acc_kind]
        if state.exists:
            buf, n = state.get
            _, st, sp = deserialize_any(bytes(buf))
        else:
            st, sp, n = acc.zero(fspec), fspec, 0
        for pdf in pdfs:
            vals = pdf[fcol].dropna()
            if len(vals):
                st = acc.update(st, vals, sp)
                n += len(vals)
        buf = acc.serialize(st, sp)
        state.update((buf, n))
        if evict_ms is not None:
            # evict once the watermark passes the window end (key[0] is
            # the window start; epoch math avoids tz ambiguity)
            import calendar

            win_start = key[0]
            ts_ms = int(calendar.timegm(win_start.utctimetuple()) * 1000 + win_start.microsecond // 1000)
            state.setTimeoutTimestamp(ts_ms + evict_ms)
        row = {k: [key[i]] for i, k in enumerate(keys)}
        row["estimate"] = [float(acc.estimate(st, sp))]
        row["n_rows"] = [n]
        row["sketch"] = [buf]
        yield pd.DataFrame(row)

    # the watermarked column must survive the projection for Spark to
    # allow EventTimeTimeout on this operator
    proj = [*keys, col] + ([_watermark_col] if _watermark_col and _watermark_col not in keys else [])
    return (
        stream_df.select(*proj)
        .groupBy(*keys)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_state_schema(),
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout if evict_ms is not None else GroupStateTimeout.NoTimeout
            ),
        )
    )


def stream_into_registry(
    stream_df: DataFrame,
    col: str,
    registry_dir: str,
    set_name: str = None,
    key: str | None = None,
    name_prefix: str = "",
    spec=None,
):
    """The reference's online-daemon role: a stream of keys continuously
    ingested into named registry sets (one set per ``key`` value, or a
    single ``set_name``), durable via the registry's flush-on-batch.

    Returns a StreamingQuery handle (foreachBatch sink: per micro-batch,
    build partial sketches distributed, merge into the named sets, flush
    — the reference's ``bulk`` + periodic-flush loop,
    src/background.c:99-146, at micro-batch cadence).
    """
    spec = spec if spec is not None else HllSpec()
    if (set_name is None) == (key is None):
        raise ValueError("pass exactly one of set_name / key")

    def sink(batch_df, epoch_id):
        from ..core import hll as hll_core
        from ..registry import EXISTS, SketchRegistry
        from ..operators.sketch import build_sketches

        reg = SketchRegistry(registry_dir)
        keys = [key] if key else []
        rows = build_sketches(batch_df, keys, col, spec).collect()
        for r in rows:
            name = f"{name_prefix}{r[key]}" if key else set_name
            reg.create(name, precision=spec.precision)
            regs, _ = hll_core.deserialize(bytes(r["sketch"]))
            reg.merge_registers(name, regs, int(r["n_rows"]))
        reg.flush()

    return stream_df.writeStream.foreachBatch(sink)


def windowed_sketch_stream(
    stream_df: DataFrame,
    ts_col: str,
    keys: list[str],
    col: str,
    spec=None,
    window: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Event-time tumbling-window sketches with late-data handling.

    Adds the window start as an extra key through the same stateful
    operator. Closed windows' state is evicted explicitly via
    EventTimeTimeout: each update arms a timeout at window_end +
    watermark_delay, and when the watermark passes it the state entry is
    removed (state-store size stays bounded by the number of OPEN
    windows × keys, not stream lifetime). Rows later than the watermark
    are dropped by Spark's late-row filter before reaching the operator.
    """
    spec = spec if spec is not None else HllSpec()
    wm = stream_df.withWatermark(ts_col, watermark)
    windowed = wm.withColumn("__win", F.window(F.col(ts_col), window).getField("start"))
    evict_ms = _interval_ms(window) + _interval_ms(watermark)
    return sketch_stream(
        windowed, ["__win"] + list(keys), col, spec, _evict_after_ms=evict_ms, _watermark_col=ts_col
    ).withColumnRenamed("__win", "window_start")
