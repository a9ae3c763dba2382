"""The mergeable-accumulator protocol: one interface for every sketch.

The reference exposes exactly one accumulator family (named HLL sets,
update = ``set``/``bulk``, read = ``info``/``list``); the brief mandates
companions (count-min, Bloom, t-digest, KLL) under the same interface
(BASELINE.json north_rule). Every sketch is:

    zero(spec) → state
    update(state, values, spec) → state       # batch of column values
    merge(a, b, spec) → state                 # associative + commutative
    serialize(state, spec) → bytes            # self-describing (tag byte)
    deserialize(buf) → (state, spec)
    estimate(state, spec) → float             # primary scalar answer

``update`` takes a whole Arrow/pandas batch — the per-row loop lives in
vectorized numpy, never Python (input_hint requirement). Spark carries
states as an opaque BinaryType column; partial aggregation happens in
``mapInPandas`` (partition-local), final aggregation in
``applyInPandas`` (register/counter merge), mirroring the reference's
per-thread-update → shared-array two-phase shape
(/root/reference/src/set.c:281-284).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import hll as _hll
from .hashing import hll_hash

MAGIC = b"HS01"

KIND_HLL = 1
KIND_CMS = 2
KIND_BLOOM = 3
KIND_TDIGEST = 4
KIND_KLL = 5


@dataclass(frozen=True)
class HllSpec:
    """Dense HLL, reference-parity semantics. precision ∈ [4,18]."""

    precision: int = _hll.DEFAULT_PRECISION

    kind = "hll"

    def __post_init__(self):
        if not (_hll.HLL_MIN_PRECISION <= self.precision <= _hll.HLL_MAX_PRECISION):
            raise ValueError(
                f"precision must be in [{_hll.HLL_MIN_PRECISION},{_hll.HLL_MAX_PRECISION}]"
            )

    @staticmethod
    def for_error(eps: float) -> "HllSpec":
        p = _hll.precision_for_error(eps)
        if p < 0:
            raise ValueError("eps must be in (0, 1)")
        return HllSpec(precision=min(max(p, _hll.HLL_MIN_PRECISION), _hll.HLL_MAX_PRECISION))

    @property
    def error(self) -> float:
        return _hll.error_for_precision(self.precision)

    @property
    def state_bytes(self) -> int:
        return _hll.bytes_for_precision(self.precision)


class HllAccumulator:
    kind = "hll"
    tag = KIND_HLL

    def zero(self, spec: HllSpec) -> np.ndarray:
        return _hll.new_registers(spec.precision)

    def update(self, state: np.ndarray, values, spec: HllSpec) -> np.ndarray:
        hashes = hll_hash(values)
        return _hll.add_hashes(state, hashes, spec.precision)

    def update_hashes(self, state: np.ndarray, hashes: np.ndarray, spec: HllSpec) -> np.ndarray:
        return _hll.add_hashes(state, hashes, spec.precision)

    # batch fast path used by the Spark partial-build stage: hash the whole
    # Arrow batch column once, then scatter per-group slices
    def prepare_batch(self, values) -> np.ndarray:
        return hll_hash(values)

    def update_prepared(
        self, state: np.ndarray, hashes: np.ndarray, idx: np.ndarray, spec: HllSpec
    ) -> np.ndarray:
        return _hll.add_hashes(state, hashes[idx], spec.precision)

    def merge(self, a: np.ndarray, b: np.ndarray, spec: HllSpec) -> np.ndarray:
        if len(a) != len(b):
            raise ValueError(f"cannot merge HLLs of different precisions ({len(a)} vs {len(b)} registers)")
        return _hll.merge(a, b)

    def serialize(self, state: np.ndarray, spec: HllSpec) -> bytes:
        return _hll.serialize(state, spec.precision)

    def deserialize(self, buf: bytes) -> tuple[np.ndarray, HllSpec]:
        regs, precision = _hll.deserialize(buf)
        return regs, HllSpec(precision=precision)

    def estimate(self, state: np.ndarray, spec: HllSpec) -> float:
        return _hll.cardinality(state, spec.precision)


_ACCUMULATORS: dict[str, object] = {}
_TAGS: dict[int, object] = {}


def register_accumulator(acc) -> None:
    _ACCUMULATORS[acc.kind] = acc
    _TAGS[acc.tag] = acc


def accumulator_for(spec) -> object:
    try:
        return _ACCUMULATORS[spec.kind]
    except KeyError:
        raise ValueError(f"no accumulator registered for kind {spec.kind!r}") from None


def deserialize_any(buf: bytes):
    """Dispatch on the tag byte → (accumulator, state, spec)."""
    if len(buf) < 6 or buf[:4] != MAGIC:
        raise ValueError("not a serialized sketch")
    acc = _TAGS.get(buf[4])
    if acc is None:
        raise ValueError(f"unknown sketch tag {buf[4]}")
    state, spec = acc.deserialize(buf)
    return acc, state, spec


register_accumulator(HllAccumulator())


def _register_companions() -> None:
    """Companion sketches register lazily so core HLL has no extra deps."""
    from . import bloom, cms, kll, tdigest  # noqa: F401


try:
    _register_companions()
except ImportError:
    pass
