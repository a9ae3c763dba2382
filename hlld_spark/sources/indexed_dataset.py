"""Megatron-style indexed binary dataset sink + source.

The training-side handoff format: after cleaning / dedup / packing,
trainers (Megatron-LM, and readers in GPT-NeoX / LLM-Foundry) consume
token ids from a pair of files per shard

* ``shard-NNNNN.bin`` — every document's token ids back to back, one
  fixed-width little-endian integer per token;
* ``shard-NNNNN.idx`` — the index: magic ``MMIDIDX\\x00\\x00``,
  version (uint64 = 1), dtype code (uint8), sequence count (int64),
  doc-index length (int64), per-sequence sizes (int32), per-sequence
  byte pointers (int64), and the document index (int64,
  ``[0..n_docs]``) — the layout published in Megatron-LM's
  ``indexed_dataset.py`` (open source, Apache-2.0).

plus one ``manifest.parquet`` describing every shard — the unit the
driver gate verifies against a DuckDB oracle (counts, byte sizes and
doc-id ranges are pure functions of the input).

Distributed shape: sharding is DETERMINISTIC (``doc_id % n_shards``),
so reruns and engines agree on membership. The write is one
``applyInPandas`` per shard — each task sorts its shard by doc id and
streams one .bin/.idx pair to a temp name, renames atomically, and
emits a single manifest row. Peak task memory is the shard payload:
the caller sizes ``n_shards`` so a shard is ~256 MB–1 GB (at 100 TB
that is simply more shards — the plan is one exchange keyed by shard
id, no driver traffic beyond the manifest). The reader parallelizes
one task per shard and yields bounded Arrow batches.

Reference scope note: armon/hlld has no sinks beyond its own mmap
registers; LLM-pipeline layer of the brief.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_MAGIC = b"MMIDIDX\x00\x00"
_VERSION = 1
# Megatron dtype codes (indexed_dataset.py): 1..8; we emit the two that
# matter for token ids and accept them back.
_DTYPES = {4: np.dtype("<i4"), 8: np.dtype("<u2")}
_CODES = {np.dtype("<i4"): 4, np.dtype("<u2"): 8}

MANIFEST_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType(), False),
        StructField("n_docs", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("bin_bytes", LongType(), False),
        StructField("idx_bytes", LongType(), False),
        StructField("min_doc_id", LongType(), False),
        StructField("max_doc_id", LongType(), False),
    ]
)


def idx_bytes_for(n_docs: int) -> int:
    """Exact .idx size for n one-sequence-per-doc entries: header
    9+8+1+8+8, sizes 4n, pointers 8n, doc_idx 8(n+1)."""
    return 34 + 4 * n_docs + 8 * n_docs + 8 * (n_docs + 1)


def _write_shard(path_prefix: str, docs: list[np.ndarray], dtype: np.dtype) -> int:
    """Stream one .bin/.idx pair; returns bin byte count. Temp-name +
    rename so a killed task never leaves a half shard visible."""
    sizes = np.array([len(d) for d in docs], dtype="<i4")
    pointers = np.zeros(len(docs), dtype="<i8")
    np.cumsum(sizes[:-1] * dtype.itemsize, out=pointers[1:])
    bin_tmp, idx_tmp = path_prefix + ".bin.tmp", path_prefix + ".idx.tmp"
    n_bytes = 0
    with open(bin_tmp, "wb") as f:
        for d in docs:
            b = np.ascontiguousarray(d, dtype=dtype).tobytes()
            f.write(b)
            n_bytes += len(b)
    with open(idx_tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", _VERSION))
        f.write(struct.pack("<B", _CODES[dtype]))
        f.write(struct.pack("<q", len(docs)))
        f.write(struct.pack("<q", len(docs) + 1))
        f.write(sizes.tobytes())
        f.write(pointers.tobytes())
        f.write(np.arange(len(docs) + 1, dtype="<i8").tobytes())
    os.replace(bin_tmp, path_prefix + ".bin")
    os.replace(idx_tmp, path_prefix + ".idx")
    return n_bytes


def write_indexed_dataset(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_shards: int = 8,
    dtype: str = "uint16",
) -> DataFrame:
    """Write ``df[tokens_col]`` (array<int>) as n_shards .bin/.idx
    pairs under ``out_dir`` plus ``manifest.parquet``; returns the
    manifest DataFrame (read back from disk, so what you see is what
    was committed). Token ids must fit the dtype — each task verifies
    and raises rather than silently truncating."""
    np_dtype = np.dtype("<u2") if dtype == "uint16" else np.dtype("<i4")
    if np_dtype not in _CODES:
        raise ValueError("dtype must be uint16 or int32")
    os.makedirs(out_dir, exist_ok=True)
    lim = 65535 if dtype == "uint16" else 2**31 - 1

    shard_col = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("__shard")
    slim = df.select(
        shard_col, F.col(id_col).alias("__id"), F.col(tokens_col).alias("__toks")
    )

    def one_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id")
        shard = int(pdf["__shard"].iloc[0])
        docs = [np.asarray(t, dtype=np.int64) for t in pdf["__toks"]]
        for d in docs:
            if len(d) and (d.min() < 0 or d.max() > lim):
                raise ValueError(f"token id out of range for {dtype} in shard {shard}")
        prefix = os.path.join(out_dir, f"shard-{shard:05d}")
        n_bytes = _write_shard(prefix, docs, np_dtype)
        n_tokens = int(sum(len(d) for d in docs))
        return pd.DataFrame(
            [
                {
                    "shard_id": shard,
                    "n_docs": len(docs),
                    "n_tokens": n_tokens,
                    "bin_bytes": n_bytes,
                    "idx_bytes": idx_bytes_for(len(docs)),
                    "min_doc_id": int(pdf["__id"].min()),
                    "max_doc_id": int(pdf["__id"].max()),
                }
            ]
        )

    manifest = slim.groupBy("__shard").applyInPandas(one_shard, MANIFEST_SCHEMA)
    spark = df.sparkSession
    manifest.write.mode("overwrite").parquet(os.path.join(out_dir, "manifest.parquet"))
    return spark.read.parquet(os.path.join(out_dir, "manifest.parquet"))


def read_shard(path_prefix: str) -> list[np.ndarray]:
    """Decode one .bin/.idx pair back into per-document token arrays
    (validates magic/version/dtype and the pointer arithmetic)."""
    with open(path_prefix + ".idx", "rb") as f:
        if f.read(9) != _MAGIC:
            raise ValueError("bad idx magic")
        (version,) = struct.unpack("<Q", f.read(8))
        if version != _VERSION:
            raise ValueError(f"unsupported idx version {version}")
        (code,) = struct.unpack("<B", f.read(1))
        dtype = _DTYPES.get(code)
        if dtype is None:
            raise ValueError(f"unsupported dtype code {code}")
        (n_seq,) = struct.unpack("<q", f.read(8))
        (n_doc_idx,) = struct.unpack("<q", f.read(8))
        sizes = np.frombuffer(f.read(4 * n_seq), dtype="<i4")
        pointers = np.frombuffer(f.read(8 * n_seq), dtype="<i8")
        doc_idx = np.frombuffer(f.read(8 * n_doc_idx), dtype="<i8")
    if n_doc_idx != n_seq + 1 or (n_seq and doc_idx[-1] != n_seq):
        raise ValueError("inconsistent doc index")
    data = np.fromfile(path_prefix + ".bin", dtype=dtype)
    out = []
    for i in range(n_seq):
        start = pointers[i] // dtype.itemsize
        out.append(data[start : start + sizes[i]])
    return out


def read_indexed_dataset(
    spark: SparkSession, out_dir: str, tokens_type: str = "array<int>"
) -> DataFrame:
    """Distributed reader: one task per shard, yielding
    (shard_id, seq_index, n_tokens, tokens). Shards stream through
    Arrow batches; nothing is collected on the driver."""
    prefixes = sorted(
        os.path.join(out_dir, f[:-4])
        for f in os.listdir(out_dir)
        if f.endswith(".idx")
    )
    schema = StructType(
        [
            StructField("shard_id", IntegerType(), False),
            StructField("seq_index", IntegerType(), False),
            StructField("n_tokens", IntegerType(), False),
            StructField("tokens", ArrayType(IntegerType()), False),
        ]
    )

    def load(iterator):
        for pdf in iterator:
            for prefix in pdf["prefix"]:
                shard = int(prefix.rsplit("-", 1)[1])
                docs = read_shard(prefix)
                yield pd.DataFrame(
                    {
                        "shard_id": shard,
                        "seq_index": range(len(docs)),
                        "n_tokens": [len(d) for d in docs],
                        "tokens": [d.astype(np.int32) for d in docs],
                    }
                )

    pre = spark.createDataFrame(
        [(p,) for p in prefixes], "prefix string"
    ).repartition(max(len(prefixes), 1))
    return pre.mapInPandas(load, schema)
