"""Property-based tests (hypothesis): the vectorized murmur against an
independent pure-python scalar implementation over arbitrary byte
strings, and merge-algebra invariants under random shardings."""

import numpy as np
from hypothesis import given, settings, strategies as st

from hlld_spark.core import hll
from hlld_spark.core.hashing import hll_hash, murmur3_x64_128

_M = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(k):
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M
    k ^= k >> 33
    return k


def _murmur_scalar(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Independent scalar MurmurHash3_x64_128 from the published spec."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed
    nblocks = len(data) // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * c1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & _M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * c2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & _M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M
    tail = data[nblocks * 16 :]
    k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
    k2 = int.from_bytes(tail[8:16].ljust(8, b"\0"), "little")
    if len(tail) > 8:
        k2 = (k2 * c2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & _M
        h2 ^= k2
    if len(tail) > 0:
        k1 = (k1 * c1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & _M
        h1 ^= k1
    h1 ^= len(data)
    h2 ^= len(data)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_murmur_matches_scalar_spec(data):
    h1, h2 = murmur3_x64_128([data])
    e1, e2 = _murmur_scalar(data)
    assert (int(h1[0]), int(h2[0])) == (e1, e2)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=50))
def test_murmur_batch_order_independent(datas):
    batch = murmur3_x64_128(datas)[1]
    single = np.array([murmur3_x64_128([d])[1][0] for d in datas], dtype=np.uint64)
    assert np.array_equal(batch, single)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=8),
    st.randoms(use_true_random=False),
)
def test_shard_invariance_property(keys, n_shards, rng):
    prec = 10
    single = hll.new_registers(prec)
    hll.add_hashes(single, hll_hash(keys), prec)
    shards = [[] for _ in range(n_shards)]
    for k in keys:
        shards[rng.randrange(n_shards)].append(k)
    merged = hll.new_registers(prec)
    for sh in shards:
        s = hll.new_registers(prec)
        if sh:
            hll.add_hashes(s, hll_hash(sh), prec)
        merged = hll.merge(merged, s)
    assert np.array_equal(merged, single)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=200))
def test_merge_with_self_and_zero(keys):
    prec = 8
    a = hll.new_registers(prec)
    hll.add_hashes(a, hll_hash(keys), prec)
    assert np.array_equal(hll.merge(a, a), a)
    assert np.array_equal(hll.merge(a, hll.new_registers(prec)), a)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=500))
def test_sparse_dense_builder_equivalence(hash_ints):
    """The sparse-until-dense builder and the direct dense path agree on
    arbitrary hash inputs (including adversarial duplicates)."""
    from hlld_spark.core.accumulator import HllAccumulator, HllSpec

    acc = HllAccumulator()
    spec = HllSpec(precision=4)  # tiny m forces densification mid-stream
    hashes = np.array(hash_ints, dtype=np.uint64)
    prepared = hll.combined_from_hashes(hashes, 4)

    dense = hll.new_registers(4)
    hll.add_hashes(dense, hashes, 4)

    b = acc.new_builder(spec)
    for i in range(0, len(hashes), 7):
        b.add_prepared(prepared, np.arange(i, min(i + 7, len(hashes))))
    assert np.array_equal(b.finish(), dense)


@given(
    st.lists(st.sampled_from([f"i{k}" for k in range(12)]), min_size=1, max_size=400),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=1, max_value=50),
)
def test_misra_gries_error_bound_property(items, capacity, batch_size):
    """The textbook MG invariant under arbitrary batching: for every
    item, true_count - N/capacity <= summary_count <= true_count (absent
    items have true_count <= N/capacity)."""
    from collections import Counter

    import numpy as np

    from hlld_spark.operators.frequent import _mg_update

    counters: dict = {}
    for i in range(0, len(items), batch_size):
        batch = items[i : i + batch_size]
        u, c = np.unique(np.asarray(batch, dtype=object), return_counts=True)
        _mg_update(counters, u, c, capacity)
    true = Counter(items)
    n = len(items)
    assert len(counters) <= capacity
    for it, tc in true.items():
        got = counters.get(it, 0)
        assert got <= tc
        assert got >= tc - n / capacity - 1e-9, (it, got, tc, n, capacity)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.text(alphabet="abc х日 ", min_size=0, max_size=30), min_size=1, max_size=15),
    st.lists(st.text(alphabet="abc х日 ", min_size=0, max_size=20), min_size=1, max_size=4),
    st.integers(min_value=2, max_value=6),
)
def test_decontaminate_kernel_matches_bruteforce(corpus, evals, n):
    """The decontamination probe (shingle kernel + prefiltered
    searchsorted membership + per-doc reduceat) counts EXACTLY the
    n-gram occurrences a brute-force python substring scan counts —
    including short docs, empty docs, unicode, and doc boundaries."""
    import numpy as np
    import pandas as pd

    from hlld_spark.operators.decontaminate import _flag_batch, _make_member
    from hlld_spark.operators.dedup import _char_shingle_hashes

    # eval gram hashes, driver-side (mirrors _gram_hashes_df's masking)
    h, offsets = _char_shingle_hashes(pd.Series(evals), n)
    keep = np.ones(len(h), dtype=bool)
    for d, e in enumerate(evals):
        if len(e) < n:
            keep[int(offsets[d]) : int(offsets[d + 1])] = False
    table = np.sort(np.unique(h[keep]))
    member = _make_member("exact", table.tobytes())
    counts = _flag_batch(member, pd.Series(corpus), n)

    ev_grams = {e[i : i + n] for e in evals for i in range(len(e) - n + 1)}
    for doc, c in zip(corpus, counts):
        expect = sum(
            1 for i in range(max(len(doc) - n + 1, 0)) if doc[i : i + n] in ev_grams
        )
        assert c == expect, (doc, n, c, expect)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.text(alphabet="ab х\t\n ", min_size=0, max_size=40), min_size=1, max_size=15),
    st.lists(st.text(alphabet="ab х\t\n ", min_size=0, max_size=30), min_size=1, max_size=4),
    st.integers(min_value=2, max_value=4),
)
def test_decontaminate_token_kernel_matches_bruteforce(corpus, evals, n):
    """Token-mode decontamination (round 4, the published 13-gram unit)
    counts EXACTLY the token n-gram occurrences a brute-force python
    split()-window scan counts — across whitespace runs, empty docs,
    docs shorter than n tokens, unicode, and doc boundaries."""
    import numpy as np
    import pandas as pd

    from hlld_spark.operators.decontaminate import _flag_batch, _make_member, _shingle

    h, offsets, units = _shingle(pd.Series(evals), n, "token")
    keep = np.ones(len(h), dtype=bool)
    keep[offsets[:-1][units < n]] = False
    table = np.sort(np.unique(h[keep]))
    member = _make_member("exact", table.tobytes())
    counts = _flag_batch(member, pd.Series(corpus), n, unit="token")

    ev_grams = {
        tuple(e.split()[i : i + n])
        for e in evals
        for i in range(len(e.split()) - n + 1)
    }
    for doc, c in zip(corpus, counts):
        toks = doc.split()
        expect = sum(
            1 for i in range(max(len(toks) - n + 1, 0)) if tuple(toks[i : i + n]) in ev_grams
        )
        assert c == expect, (doc, n, c, expect)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=20, max_value=60),
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=2, max_value=4),
)
def test_token_minhash_estimates_token_jaccard(n_shared, n_extra, k):
    """Token-unit minhash signatures estimate the TRUE token-k-shingle
    Jaccard within binomial tolerance (num_perm=256 -> sigma <= 0.032;
    assert 5 sigma). Pins that the token kernel + affine mixes form a
    correct minhash family over token shingles, not just a determinism
    check."""
    import numpy as np
    import pandas as pd

    from hlld_spark.operators.dedup import _minhash_signatures, _token_shingle_hashes

    a_toks = [f"s{i}" for i in range(n_shared)]
    b_toks = a_toks[: max(n_shared - n_extra, k)] + [f"x{i}" for i in range(n_extra)]
    a, b = " ".join(a_toks), " ".join(b_toks)
    # true Jaccard over hashed token k-shingle sets (the estimand)
    h, off, _ = _token_shingle_hashes(pd.Series([a, b]), k)
    sa = set(h[off[0] : off[1]].tolist())
    sb = set(h[off[1] : off[2]].tolist())
    true_j = len(sa & sb) / max(len(sa | sb), 1)
    sig = _minhash_signatures(pd.Series([a, b]), 256, k, unit="token")
    est = float((sig[0] == sig[1]).mean())
    assert abs(est - true_j) <= 5 * np.sqrt(max(true_j * (1 - true_j), 0.01) / 256) + 1e-9
