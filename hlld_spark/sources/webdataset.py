"""WebDataset-style tar-shard sink + source.

The multimodal-training handoff format: WebDataset (webdataset/wids,
used by torchdata and most large-scale image/audio training loops)
stores samples in plain POSIX tar shards where one SAMPLE is the group
of consecutive files sharing a basename key — ``000042.txt``,
``000042.json``, ``000042.jpg`` — so a trainer streams samples
sequentially with zero per-sample seeks. This module writes and reads
that layout from DataFrames:

* :func:`write_webdataset` — one ``applyInPandas`` task per shard
  (deterministic membership ``key % n_shards``), each task streams ONE
  tar via :mod:`tarfile` with zeroed mtime/uid/gid so output bytes are
  run-independent, plus a ``manifest.parquet`` of per-shard counts and
  sizes. Peak task memory = the SHARD payload (ADVICE r6 correction:
  ``groupBy().applyInPandas`` materializes the whole shard group as one
  pandas frame before the tar streaming starts — size ``n_shards`` so a
  shard fits comfortably in a task, exactly as indexed_dataset.py
  documents for the same shape).
* :func:`read_webdataset` — one task per shard, yielding the LONG form
  (shard_id, key, ext, content) through bounded Arrow batches; group
  by key downstream to reassemble samples. Nothing touches the driver.

100-TB shape: shards are the parallelism unit in both directions —
writing is one exchange keyed by shard id; reading is an
embarrassingly parallel scan over shard files. Size ``n_shards`` so a
shard lands at the WebDataset-conventional ~1 GB.

Reference scope note: armon/hlld has no sinks beyond its own mmap
registers; this is LLM-pipeline layer of the brief (multimodal
companion of the Megatron sink in ``indexed_dataset.py``).
"""

from __future__ import annotations

import io
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType(), False),
        StructField("n_samples", LongType(), False),
        StructField("n_files", LongType(), False),
        StructField("tar_bytes", LongType(), False),
        StructField("min_key", LongType(), False),
        StructField("max_key", LongType(), False),
    ]
)

READ_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType(), False),
        StructField("key", StringType(), False),
        StructField("ext", StringType(), False),
        StructField("content", BinaryType(), False),
    ]
)


def _to_bytes(v) -> bytes | None:
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v)
    return str(v).encode("utf-8")


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    ext_cols: dict[str, str],
    key_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Write one tar shard per ``key % n_shards`` under ``out_dir``.
    ``ext_cols`` maps tar member extension -> source column, e.g.
    ``{"txt": "text", "json": "meta_json", "jpg": "payload"}``; string
    columns are utf-8 encoded, binary columns pass through, NULL cells
    skip that member (WebDataset's own sparse-sample convention).
    Returns the manifest DataFrame read back from disk."""
    if not ext_cols:
        raise ValueError("ext_cols must map at least one extension to a column")
    os.makedirs(out_dir, exist_ok=True)
    exts = sorted(ext_cols)  # fixed member order inside a sample

    cols = [
        F.pmod(F.col(key_col), F.lit(n_shards)).cast("int").alias("__shard"),
        F.col(key_col).cast("long").alias("__key"),
    ] + [F.col(ext_cols[e]).alias(f"__c_{e}") for e in exts]
    slim = df.select(*cols)

    def one_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__key")
        shard = int(pdf["__shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        tmp = path + ".tmp"
        n_files = 0
        # GNU_FORMAT with zeroed times/owners -> byte-deterministic tars
        cols = ["__key"] + [f"__c_{e}" for e in exts]
        with tarfile.open(tmp, "w", format=tarfile.GNU_FORMAT) as tar:
            # name=None -> plain tuples (itertuples would mangle the
            # leading-underscore column names)
            for row in pdf[cols].itertuples(index=False, name=None):
                key = int(row[0])
                for j, e in enumerate(exts):
                    body = _to_bytes(row[1 + j])
                    if body is None:
                        continue
                    info = tarfile.TarInfo(name=f"{key:012d}.{e}")
                    info.size = len(body)
                    info.mtime = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(body))
                    n_files += 1
        os.replace(tmp, path)
        return pd.DataFrame(
            [
                {
                    "shard_id": shard,
                    "n_samples": len(pdf),
                    "n_files": n_files,
                    "tar_bytes": os.path.getsize(path),
                    "min_key": int(pdf["__key"].min()),
                    "max_key": int(pdf["__key"].max()),
                }
            ]
        )

    manifest = slim.groupBy("__shard").applyInPandas(one_shard, MANIFEST_SCHEMA)
    spark = df.sparkSession
    manifest.write.mode("overwrite").parquet(os.path.join(out_dir, "manifest.parquet"))
    return spark.read.parquet(os.path.join(out_dir, "manifest.parquet"))


def read_webdataset(spark: SparkSession, out_dir: str) -> DataFrame:
    """Distributed reader: one task per shard tar, yielding
    (shard_id, key, ext, content) — the long form; ``groupBy("key")``
    with ``map_from_entries(collect_list(struct(ext, content)))``
    reassembles samples when needed. Tar members stream through
    bounded Arrow batches."""
    shards = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".tar")
    )

    def load(iterator):
        for pdf in iterator:
            for path in pdf["path"]:
                shard = int(os.path.basename(path)[6:-4])
                rows: list[tuple[int, str, str, bytes]] = []
                with tarfile.open(path, "r") as tar:
                    for info in tar:
                        if not info.isfile():
                            continue
                        base = os.path.basename(info.name)
                        key, _, ext = base.partition(".")
                        fh = tar.extractfile(info)
                        rows.append((shard, key, ext, fh.read() if fh else b""))
                        if len(rows) >= 4096:
                            yield pd.DataFrame(
                                rows, columns=["shard_id", "key", "ext", "content"]
                            )
                            rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=["shard_id", "key", "ext", "content"])

    pre = spark.createDataFrame([(p,) for p in shards], "path string").repartition(
        max(len(shards), 1)
    )
    return pre.mapInPandas(load, schema=READ_SCHEMA)
