"""WebDataset tar-shard sink + source (r6).

Covers: write→read round trip (text + binary members), deterministic
shard membership and byte-identical rewrites, NULL-cell member
skipping (the sparse-sample convention), manifest consistency with
what tarfile itself sees, and key zero-padding/ordering inside a
shard.
"""

import hashlib
import os
import tarfile

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_webdataset_round_trip_and_manifest(spark, tmp_path):
    from hlld_spark.sources.webdataset import read_webdataset, write_webdataset

    rows = [
        (i, f"text body {i} " * (1 + i % 3), bytes([i % 256, 255 - i % 256]) * (1 + i % 5))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, payload binary")
    out = str(tmp_path / "wd")
    man = write_webdataset(
        df, out, {"txt": "text", "bin": "payload"}, key_col="doc_id", n_shards=4
    ).orderBy("shard_id").collect()
    assert [m["shard_id"] for m in man] == [0, 1, 2, 3]
    assert sum(m["n_samples"] for m in man) == 40
    assert sum(m["n_files"] for m in man) == 80
    for m in man:
        path = os.path.join(out, f"shard-{m['shard_id']:05d}.tar")
        assert m["tar_bytes"] == os.path.getsize(path)
        with tarfile.open(path) as tar:
            names = [i.name for i in tar if i.isfile()]
        assert len(names) == m["n_files"]
        # members are key-sorted and zero-padded, exts in sorted order
        assert names == sorted(names, key=lambda n: (n.split(".")[0], n.split(".")[1]))

    wd = read_webdataset(spark, out)
    got = {
        (int(r["key"]), r["ext"]): bytes(r["content"]) for r in wd.collect()
    }
    assert len(got) == 80
    for i, text, payload in rows:
        assert got[(i, "txt")] == text.encode()
        assert got[(i, "bin")] == payload
        assert (i % 4) == next(
            r["shard_id"] for r in wd.filter(F.col("key") == f"{i:012d}").collect()
        )


@pytest.mark.spark
def test_webdataset_null_members_skipped(spark, tmp_path):
    from hlld_spark.sources.webdataset import read_webdataset, write_webdataset

    rows = [(0, "has text", None), (1, None, b"only binary"), (2, "both", b"b2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, payload binary")
    out = str(tmp_path / "wd")
    man = write_webdataset(
        df, out, {"txt": "text", "bin": "payload"}, key_col="doc_id", n_shards=1
    ).collect()
    assert man[0]["n_samples"] == 3 and man[0]["n_files"] == 4
    got = {(int(r["key"]), r["ext"]) for r in read_webdataset(spark, out).collect()}
    assert got == {(0, "txt"), (1, "bin"), (2, "txt"), (2, "bin")}


@pytest.mark.spark
def test_webdataset_rewrite_is_byte_identical(spark, tmp_path):
    from hlld_spark.sources.webdataset import write_webdataset

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id long, text string"
    )
    out = str(tmp_path / "wd")

    def digests():
        return {
            f: hashlib.md5(open(os.path.join(out, f), "rb").read()).hexdigest()
            for f in os.listdir(out)
            if f.endswith(".tar")
        }

    write_webdataset(df, out, {"txt": "text"}, n_shards=3)
    h1 = digests()
    # different partitioning of the input must not change the bytes
    write_webdataset(df.repartition(7), out, {"txt": "text"}, n_shards=3)
    assert digests() == h1


@pytest.mark.spark
def test_webdataset_requires_ext_cols(spark, tmp_path):
    from hlld_spark.sources.webdataset import write_webdataset

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="ext_cols"):
        write_webdataset(df, str(tmp_path / "wd"), {})
