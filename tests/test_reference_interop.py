"""End-to-end interop with the reference engine: sketches built by OUR
distributed Spark pipeline, flushed through the registry to the
reference's on-disk layout, are read back by the REFERENCE's own
compiled hll code (tests/golden/readmmap_src) and produce the identical
estimate. This is the strongest parity statement available: a user of
the reference could point its storage at our flush output.

The C harness links the reference sources read-only from
/root/reference; the test skips when no compiler is available.
"""

import os
import shutil
import subprocess
import tempfile

import pytest

from hlld_spark.core import hll
from hlld_spark.core.hashing import hll_hash
from hlld_spark.registry import SketchRegistry

_READMMAP_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include "hll.h"
int bitmap_close(hlld_bitmap *map) { (void)map; return 0; }
int main(int argc, char **argv) {
    if (argc != 3) return 2;
    int precision = atoi(argv[2]);
    FILE *f = fopen(argv[1], "rb");
    if (!f) return 1;
    uint64_t expect = hll_bytes_for_precision(precision);
    uint32_t *buf = malloc(expect);
    if (fread(buf, 1, expect, f) != expect) return 1;
    fclose(f);
    hll_t h; h.precision = (unsigned char)precision; h.registers = buf; h.bm = NULL;
    printf("%.10f\n", hll_size(&h));
    return 0;
}
"""

REF = "/root/reference"


@pytest.fixture(scope="module")
def readmmap():
    if shutil.which("gcc") is None or shutil.which("g++") is None:
        pytest.skip("no C compiler for reference interop harness")
    d = tempfile.mkdtemp(prefix="refinterop")
    src = os.path.join(d, "readmmap.c")
    with open(src, "w") as f:
        f.write(_READMMAP_C)
    exe = os.path.join(d, "readmmap")
    try:
        subprocess.run(
            ["gcc", "-O2", "-std=c99", "-c", src, f"{REF}/src/hll.c", f"{REF}/src/hll_constants.c", f"-I{REF}/src"],
            cwd=d, check=True, capture_output=True,
        )
        subprocess.run(
            ["g++", "-O2", "-c", f"{REF}/deps/murmurhash/MurmurHash3.cpp", "-o", "murmur.o"],
            cwd=d, check=True, capture_output=True,
        )
        subprocess.run(
            ["g++", "-O2", "readmmap.o", "hll.o", "hll_constants.o", "murmur.o", "-o", exe, "-lm"],
            cwd=d, check=True, capture_output=True,
        )
    except subprocess.CalledProcessError as e:
        pytest.skip(f"reference build failed: {e.stderr[:200]}")
    return exe


def _ref_estimate(exe: str, mmap_path: str, precision: int) -> float:
    out = subprocess.run([exe, mmap_path, str(precision)], capture_output=True, text=True, check=True)
    return float(out.stdout.strip())


def test_registry_flush_readable_by_reference(readmmap, tmp_path):
    reg = SketchRegistry(str(tmp_path / "data"))
    reg.create("interop", precision=12)
    reg.bulk("interop", [f"test{i}" for i in range(10000)])
    ours = reg.info("interop")["size"]
    reg.flush("interop")
    mmap = os.path.join(str(tmp_path / "data"), "hlld.interop", "registers.mmap")
    theirs = _ref_estimate(readmmap, mmap, 12)
    assert theirs == pytest.approx(ours, rel=1e-8)
    assert 9800 < theirs < 10200  # the reference's own accuracy window


@pytest.mark.spark
def test_spark_built_sketch_readable_by_reference(readmmap, spark, sf_dir, tmp_path):
    """Distributed Spark build → registry merge → flush → reference reads
    the bytes and agrees on the estimate."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reg = SketchRegistry(str(tmp_path / "data"))
    reg.create("docs", precision=14)
    reg.add_dataframe("docs", docs, "doc_id")
    ours = reg.info("docs")["size"]
    reg.flush("docs")
    mmap = os.path.join(str(tmp_path / "data"), "hlld.docs", "registers.mmap")
    theirs = _ref_estimate(readmmap, mmap, 14)
    assert theirs == pytest.approx(ours, rel=1e-8)
    exact = docs.select("doc_id").distinct().count()
    assert abs(theirs - exact) / exact <= 3 * hll.error_for_precision(14)


def test_bitexact_registers_both_directions(readmmap, tmp_path):
    """Round-trip: our packed bytes → reference estimate → matches our
    estimate; and a reference-layout file we synthesize loads back."""
    regs = hll.new_registers(10)
    hll.add_hashes(regs, hll_hash([f"foobar{i}" for i in range(777)]), 10)
    p = str(tmp_path / "regs.mmap")
    with open(p, "wb") as f:
        f.write(hll.to_hlld_bytes(regs))
    theirs = _ref_estimate(readmmap, p, 10)
    assert theirs == pytest.approx(hll.cardinality(regs, 10), rel=1e-8)
    # load back
    back = hll.from_hlld_bytes(open(p, "rb").read(), 10)
    import numpy as np

    assert np.array_equal(back, regs)


# ---------------------------------------------------------------------------
# config.ini discovery parity (VERDICT r2 #3): the reference's OWN INI
# parser (src/config.c:set_config_from_filename, inih-backed) reads the
# config.ini this engine writes on flush and recovers the exact fields —
# a stock hlld daemon pointed at our data dir would discover these sets.
# ---------------------------------------------------------------------------

_READINI_C = r"""
#include <stdio.h>
#include <stdint.h>
#include "hll.h"
#include "config.h"
/* link stubs: config parsing never touches these */
int bitmap_close(hlld_bitmap *map) { (void)map; return 0; }
void MurmurHash3_x64_128(const void *key, const int len, const uint32_t seed, void *out) {
    (void)key; (void)len; (void)seed; (void)out;
}
int main(int argc, char **argv) {
    if (argc != 2) return 2;
    hlld_set_config c;
    c.size = 0; c.default_eps = 0; c.default_precision = 0; c.in_memory = 0;
    int r = set_config_from_filename(argv[1], &c);
    if (r) return 1;
    printf("%llu %f %d %d\n", (unsigned long long)c.size, c.default_eps,
           c.default_precision, c.in_memory);
    return 0;
}
"""


@pytest.fixture(scope="module")
def readini():
    if shutil.which("gcc") is None:
        pytest.skip("no C compiler for reference interop harness")
    d = tempfile.mkdtemp(prefix="refini")
    src = os.path.join(d, "readini.c")
    with open(src, "w") as f:
        f.write(_READINI_C)
    exe = os.path.join(d, "readini")
    try:
        subprocess.run(
            ["gcc", "-O2", "-std=gnu99", "-D_GNU_SOURCE", src,
             f"{REF}/src/config.c", f"{REF}/src/hll.c", f"{REF}/src/hll_constants.c",
             f"{REF}/deps/inih/ini.c",
             f"-I{REF}/src", f"-I{REF}/deps/inih", "-o", exe, "-lm"],
            cwd=d, check=True, capture_output=True,
        )
    except subprocess.CalledProcessError as e:
        pytest.skip(f"reference config build failed: {e.stderr[:300]}")
    return exe


def test_flushed_config_ini_parsed_by_reference(readini, tmp_path):
    reg = SketchRegistry(str(tmp_path / "data"))
    reg.create("cfg", precision=13)
    reg.bulk("cfg", [f"key{i}" for i in range(5000)])
    reg.flush("cfg")
    ini = os.path.join(str(tmp_path / "data"), "hlld.cfg", "config.ini")
    out = subprocess.run([readini, ini], capture_output=True, text=True, check=True)
    size_s, eps_s, prec_s, mem_s = out.stdout.split()
    assert int(prec_s) == 13
    assert int(mem_s) == 0
    assert float(eps_s) == pytest.approx(hll.error_for_precision(13), abs=1e-6)
    info_size = SketchRegistry(str(tmp_path / "data")).info("cfg")["size"]
    assert int(size_s) == int(info_size)  # %llu truncation parity


def test_legacy_layout_read_compat(tmp_path):
    """Dirs written by the pre-r3 layout (config.json + data.mmap) are
    still discovered, faulted in, and upgraded to the reference layout
    on the next flush."""
    import json as _json

    root = tmp_path / "data"
    d = root / "hlld.old"
    os.makedirs(d)
    regs = hll.new_registers(12)
    hll.add_hashes(regs, hll_hash([f"legacy{i}" for i in range(3000)]), 12)
    with open(d / "data.mmap", "wb") as f:
        f.write(hll.to_hlld_bytes(regs))
    with open(d / "config.json", "w") as f:
        _json.dump({"precision": 12, "eps": hll.error_for_precision(12),
                    "in_memory": False, "size": 0.0}, f)
    reg = SketchRegistry(str(root))
    assert "old" in [e["name"] for e in reg.list()]
    reg.bulk("old", ["one-more"])
    reg.flush("old")
    assert os.path.exists(d / "registers.mmap")
    assert os.path.exists(d / "config.ini")
    back = hll.from_hlld_bytes(open(d / "registers.mmap", "rb").read(), 12)
    got = hll.cardinality(back, 12)
    assert got == pytest.approx(hll.cardinality(regs, 12), rel=0.01)
