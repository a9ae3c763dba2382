"""Megatron-style indexed dataset sink/source
(sources/indexed_dataset.py).

Truth direction: a struct-level reference parser in THIS file decodes
the emitted .idx bytes independently of the library reader; roundtrip
equality is checked token-for-token; the driver gate verifies the
manifest against a DuckDB oracle computing the same counts and byte
formulas from the input table.
"""

import os
import struct

import numpy as np
import pytest

from hlld_spark.sources.indexed_dataset import (
    idx_bytes_for,
    read_indexed_dataset,
    read_shard,
    write_indexed_dataset,
)


def _ref_parse_idx(path):
    """Spec-literal parse, no library code."""
    raw = open(path, "rb").read()
    assert raw[:9] == b"MMIDIDX\x00\x00"
    version = struct.unpack_from("<Q", raw, 9)[0]
    code = raw[17]
    n_seq = struct.unpack_from("<q", raw, 18)[0]
    n_didx = struct.unpack_from("<q", raw, 26)[0]
    off = 34
    sizes = np.frombuffer(raw, "<i4", n_seq, off); off += 4 * n_seq
    pointers = np.frombuffer(raw, "<i8", n_seq, off); off += 8 * n_seq
    doc_idx = np.frombuffer(raw, "<i8", n_didx, off); off += 8 * n_didx
    assert off == len(raw)
    return version, code, sizes, pointers, doc_idx


def _toy_rows():
    rows = []
    for i in range(23):
        toks = [(i * 31 + j * 7) % 60000 for j in range(3 + i % 5)]
        rows.append((i, toks))
    rows.append((23, []))  # empty doc survives with size 0
    return rows


@pytest.mark.spark
def test_roundtrip_and_idx_layout(spark, tmp_path):
    out = str(tmp_path / "ds")
    rows = _toy_rows()
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    man = write_indexed_dataset(df, out, n_shards=4).collect()
    assert sorted(r["shard_id"] for r in man) == [0, 1, 2, 3]

    truth = dict(rows)
    for r in man:
        prefix = os.path.join(out, f"shard-{r['shard_id']:05d}")
        version, code, sizes, pointers, doc_idx = _ref_parse_idx(prefix + ".idx")
        assert version == 1 and code == 8  # uint16 default
        assert os.path.getsize(prefix + ".idx") == idx_bytes_for(r["n_docs"]) == r["idx_bytes"]
        assert os.path.getsize(prefix + ".bin") == r["bin_bytes"] == 2 * r["n_tokens"]
        assert list(doc_idx) == list(range(r["n_docs"] + 1))
        # pointers are the running byte offsets of sizes
        assert list(pointers) == list(np.concatenate([[0], np.cumsum(sizes[:-1] * 2)]))
        docs = read_shard(prefix)
        ids = sorted(i for i in truth if i % 4 == r["shard_id"])
        assert r["min_doc_id"] == ids[0] and r["max_doc_id"] == ids[-1]
        assert len(docs) == len(ids)
        for doc_id, got in zip(ids, docs):
            assert got.tolist() == truth[doc_id]

    # distributed reader reproduces every token
    back = read_indexed_dataset(spark, out).collect()
    assert sum(r["n_tokens"] for r in back) == sum(len(t) for _, t in rows)
    for r in back:
        ids = sorted(i for i in truth if i % 4 == r["shard_id"])
        assert r["tokens"] == truth[ids[r["seq_index"]]]


@pytest.mark.spark
def test_int32_dtype_and_range_guard(spark, tmp_path):
    out = str(tmp_path / "ds32")
    df = spark.createDataFrame(
        [(0, [70000, 1]), (1, [2])], "doc_id long, tokens array<int>"
    )
    man = {r["shard_id"]: r for r in write_indexed_dataset(df, out, n_shards=1, dtype="int32").collect()}
    assert man[0]["bin_bytes"] == 4 * 3
    docs = read_shard(os.path.join(out, "shard-00000"))
    assert [d.tolist() for d in docs] == [[70000, 1], [2]]

    # uint16 overflow must raise, not truncate
    with pytest.raises(Exception, match="out of range"):
        write_indexed_dataset(df, str(tmp_path / "bad"), n_shards=1, dtype="uint16")


@pytest.mark.spark
def test_manifest_is_deterministic_across_reruns(spark, tmp_path):
    rows = _toy_rows()
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    a = write_indexed_dataset(df, str(tmp_path / "a"), n_shards=3)
    b = write_indexed_dataset(df.repartition(7), str(tmp_path / "b"), n_shards=3)
    ka = sorted(tuple(r) for r in a.collect())
    kb = sorted(tuple(r) for r in b.collect())
    assert ka == kb
    for s in range(3):
        da = read_shard(str(tmp_path / "a" / f"shard-{s:05d}"))
        db = read_shard(str(tmp_path / "b" / f"shard-{s:05d}"))
        assert [x.tolist() for x in da] == [x.tolist() for x in db]
