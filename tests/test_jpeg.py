"""Baseline JPEG codec (r6, ITU-T T.81): entropy-coding exactness vs
the direct no-huffman pipeline, a spec-literal IDCT reference, analytic
DC-only fixtures, header parsing, malformed-payload errors, and the
Spark multimodal integration."""

import numpy as np
import pytest

from hlld_spark.operators.jpeg import (
    JpegFormatError,
    ZIGZAG,
    _A,
    decode_jpeg,
    dequant_idct_reference,
    encode_jpeg,
    parse_jpeg_header,
    quantized_planes,
)


def _idct_spec_literal(block: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 IDCT written as the literal double sum — an
    independent reference for the einsum/basis-matrix implementation
    (same pattern as the PNG unfilter reference in test_codecs.py)."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * block[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4.0
    return out


def test_idct_matches_spec_literal():
    rng = np.random.default_rng(3)
    for _ in range(5):
        blk = rng.integers(-512, 512, (8, 8)).astype(np.float64)
        fast = np.einsum("ux,uv,vy->xy", _A, blk, _A)
        assert np.allclose(fast, _idct_spec_literal(blk), atol=1e-9)


def test_fdct_idct_are_inverses():
    rng = np.random.default_rng(4)
    f = rng.integers(0, 256, (8, 8)).astype(np.float64)
    coef = np.einsum("ux,xy,vy->uv", _A, f, _A)
    back = np.einsum("ux,uv,vy->xy", _A, coef, _A)
    assert np.allclose(back, f, atol=1e-9)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot-checks (T.81 Figure 5): first diagonal walk
    assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]


def test_flat_gray_block_is_analytic():
    """A flat image has a DC-only spectrum: the decode must return the
    flat value exactly (quantized DC round-trips losslessly here)."""
    for val in (0, 77, 128, 200, 255):
        img = np.full((8, 8), val, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=85))
        # quant error of the DC coefficient only
        q = np.unique(out)
        assert len(q) == 1
        assert abs(int(q[0]) - val) <= 2


@pytest.mark.parametrize("ss", ["4:4:4", "4:2:2", "4:2:0"])
@pytest.mark.parametrize("quality", [60, 85, 95])
def test_entropy_coding_is_exact(ss, quality):
    """decode(encode(img)) must equal the direct dequant+IDCT of the
    encoder's quantized coefficients — pixel-exact. This pins the
    huffman tables, bit packing/stuffing, EXTEND, run-lengths and MCU
    interleave: any entropy-layer bug breaks equality."""
    rng = np.random.default_rng(quality)
    img = rng.integers(0, 256, (37, 46, 3), dtype=np.uint8)
    coefs, qs, samp = quantized_planes(img, quality, ss)
    truth = dequant_idct_reference(coefs, qs, samp, 46, 37, False)
    out = decode_jpeg(encode_jpeg(img, quality, ss))
    assert np.array_equal(out, truth)


@pytest.mark.parametrize("dri", [1, 2, 5])
def test_restart_intervals_exact(dri):
    rng = np.random.default_rng(dri)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    coefs, qs, samp = quantized_planes(img, 80, "4:2:0")
    truth = dequant_idct_reference(coefs, qs, samp, 40, 24, False)
    out = decode_jpeg(encode_jpeg(img, 80, "4:2:0", restart_interval=dri))
    assert np.array_equal(out, truth)


def test_grayscale_and_odd_sizes():
    rng = np.random.default_rng(9)
    for h, w in ((1, 1), (7, 9), (17, 8), (16, 25)):
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        coefs, qs, samp = quantized_planes(g, 85)
        truth = dequant_idct_reference(coefs, qs, samp, w, h, True)
        out = decode_jpeg(encode_jpeg(g, 85))
        assert out.shape == (h, w, 1)
        assert np.array_equal(out, truth)


def test_smooth_image_close_to_original():
    """End-to-end sanity independent of our own transform code: a
    smooth gradient must survive lossy coding within a small error."""
    xs = np.linspace(0, 255, 48)
    base = np.clip(np.add.outer(xs, xs) / 2, 0, 255).astype(np.uint8)
    img = np.stack([base, base[::-1], base.T], axis=-1)
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_header_parse_and_errors():
    img = np.zeros((10, 12, 3), dtype=np.uint8)
    b = encode_jpeg(img, 85, "4:2:0")
    assert parse_jpeg_header(b) == (12, 10, 3)
    g = encode_jpeg(np.zeros((5, 6), dtype=np.uint8))
    assert parse_jpeg_header(g) == (6, 5, 1)
    with pytest.raises(JpegFormatError, match="SOI"):
        decode_jpeg(b"\x00\x01not a jpeg")
    with pytest.raises(JpegFormatError, match="truncated segment"):
        decode_jpeg(b[:30])  # cut mid-DQT
    with pytest.raises(JpegFormatError, match="missing SOF"):
        decode_jpeg(b[:20])  # SOI + APP0 only
    # flip SOF0 -> SOF2: a BASELINE full-band interleaved scan is not a
    # legal progressive scan — must raise, not misdecode (progressive
    # proper is supported as of r6; see the SOF2 tests below)
    sof_at = b.find(b"\xff\xc0")
    prog = b[:sof_at + 1] + b"\xc2" + b[sof_at + 2 :]
    with pytest.raises(JpegFormatError):
        decode_jpeg(prog)
    # lossless SOF3 stays an explicit unsupported error
    sof3 = b[:sof_at + 1] + b"\xc3" + b[sof_at + 2 :]
    with pytest.raises(JpegFormatError, match="unsupported SOF"):
        decode_jpeg(sof3)
    # corrupt the entropy stream: must raise, not loop or crash
    with pytest.raises(JpegFormatError):
        decode_jpeg(b[:-10] + b"\x00" * 8 + b"\xff\xd9")


def test_quality_scaling_monotone():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    sizes = [len(encode_jpeg(img, q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


@pytest.mark.spark
def test_spark_multimodal_jpeg_integration(spark):
    """parse_metadata reads SOF headers; extract_image_features decodes
    for real; resize re-encodes JPEG-in-JPEG-out; a corrupt JPEG maps to
    NULL features instead of failing the job."""
    from hlld_spark.operators.multimodal import (
        extract_image_features,
        parse_metadata,
        resize_images,
    )

    from hlld_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    payload = encode_jpeg(img, 85, "4:2:0")
    truncated = payload[:30]  # header unparseable -> kind unknown
    sof_at = payload.find(b"\xff\xc0")
    mislabeled = payload[: sof_at + 1] + b"\xc2" + payload[sof_at + 2 :]
    progressive = encode_jpeg_progressive(img, 85, "4:2:0")
    df = spark.createDataFrame(
        [
            (0, bytearray(payload)),
            (1, bytearray(truncated)),
            (2, bytearray(mislabeled)),
            (3, bytearray(progressive)),
        ],
        "asset_id long, payload binary",
    )
    md = {r["asset_id"]: r["meta"] for r in parse_metadata(df).collect()}
    assert (md[0]["kind"], md[0]["width"], md[0]["height"], md[0]["channels"]) == (
        "image", 17, 21, 3,
    )
    assert md[1]["kind"] == "unknown"
    assert md[2]["kind"] == "image"  # SOF2 dims are header-readable...
    assert (md[3]["kind"], md[3]["width"], md[3]["height"]) == ("image", 17, 21)
    feats = {r["asset_id"]: r["features"] for r in extract_image_features(df).collect()}
    truth = decode_jpeg(payload).astype(np.float64)
    want = [round(float(x), 6) for x in np.concatenate([truth.mean(axis=(0, 1)), truth.std(axis=(0, 1))])]
    assert feats[0] == want
    assert feats[1] is None
    assert feats[2] is None  # ...but a mislabeled baseline stream is corrupt -> NULL
    assert feats[3] == want  # REAL progressive decodes to the same pixels (r6)
    rs = {r["asset_id"]: r["resized"] for r in resize_images(df, 4, 4).collect()}
    assert bytes(rs[0])[:2] == b"\xff\xd8"  # JPEG in -> JPEG out
    assert parse_jpeg_header(bytes(rs[0])) == (4, 4, 3)
    assert rs[1] is None


# ---------------------------------------------------------------------------
# progressive (SOF2) — r6
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ss", ["4:4:4", "4:2:2", "4:2:0"])
def test_progressive_entropy_coding_is_exact(ss):
    """All spectral-selection + successive-approximation passes together
    carry every coefficient bit: progressive decode must equal the
    direct (no-entropy-coding) pipeline pixel-for-pixel."""
    from hlld_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (37, 46, 3), dtype=np.uint8)
    coefs, qs, samp = quantized_planes(img, 80, ss)
    truth = dequant_idct_reference(coefs, qs, samp, 46, 37, False)
    out = decode_jpeg(encode_jpeg_progressive(img, 80, ss))
    assert np.array_equal(out, truth)


def test_progressive_gray_restarts_and_equivalence_to_baseline():
    from hlld_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(33)
    g = rng.integers(0, 256, (19, 26), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(g, 85))
    for dri in (0, 1, 3):
        prog = decode_jpeg(encode_jpeg_progressive(g, 85, restart_interval=dri))
        # same quantized coefficients -> identical pixels either way
        assert np.array_equal(prog, base), dri
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, 80, "4:2:0"))
    for dri in (2, 5):
        prog = decode_jpeg(encode_jpeg_progressive(img, 80, "4:2:0", restart_interval=dri))
        assert np.array_equal(prog, base), dri


def test_progressive_eob_run_spans_blocks():
    """Hand-crafted stream with a REAL EOBn (run > 1) — our encoder is
    EOB0-only, so this pins the decoder's cross-block run handling
    independently. Gray 8x32: 4 blocks; block 0 sets coef[1]=+1 then
    EOB1(+ext 1) ends blocks 1 and 2; block 3 sets coef[1]=+1."""
    import struct as st

    from hlld_spark.operators.jpeg import _BitWriter, _huff_codes

    def seg(marker, body):
        return st.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    # quant table: all ones (zigzag order)
    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    sof = seg(0xC2, st.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
    # DC table: standard luma; AC table: two 2-bit codes {EOB1=0x10, 0x01}
    dc_bits, dc_vals = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12))
    ac_bits, ac_vals = [0, 2] + [0] * 14, [0x10, 0x01]
    dht = seg(0xC4, bytes([0x00] + dc_bits + dc_vals)) + seg(
        0xC4, bytes([0x10] + ac_bits + ac_vals)
    )
    dc_codes = _huff_codes(dc_bits, dc_vals)
    ac_codes = _huff_codes(ac_bits, ac_vals)
    # scan 1: DC first pass, Al=0 — four zero diffs
    w1 = _BitWriter()
    for _ in range(4):
        w1.put(*dc_codes[0])
    scan1 = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + w1.flush()
    # scan 2: AC 1-63 first pass, Al=0
    w2 = _BitWriter()
    w2.put(*ac_codes[0x01])  # block 0: r=0, s=1 at k=1
    w2.put(1, 1)  # value +1
    w2.put(*ac_codes[0x10])  # EOB1 ...
    w2.put(1, 1)  # ... + ext bit 1 -> eobrun = 2 (blocks 1 and 2)
    w2.put(*ac_codes[0x01])  # block 3: coef[1] = +1
    w2.put(1, 1)
    w2.put(*ac_codes[0x10])  # trailing EOB (run past the end, ignored)
    w2.put(0, 1)
    scan2 = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + w2.flush()
    data = b"\xff\xd8" + dqt + sof + dht + scan1 + scan2 + b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == (8, 32, 1)
    # expected: blocks 0 and 3 have zigzag coef[1]=1 (q=1), others zero
    zz = np.zeros((1, 4, 64), dtype=np.int32)
    zz[0, 0, 1] = 1
    zz[0, 3, 1] = 1
    want = dequant_idct_reference([zz], [np.ones(64, dtype=np.int64)], [(1, 1)], 32, 8, True)
    assert np.array_equal(out, want)
    # blocks 1 and 2 decode flat 128 (all-zero coefficients)
    assert np.all(out[:, 8:24] == 128)


def test_progressive_header_parse_and_metadata():
    from hlld_spark.operators.jpeg import encode_jpeg_progressive

    img = np.zeros((10, 12, 3), dtype=np.uint8)
    b = encode_jpeg_progressive(img, 85, "4:2:0")
    assert b[:2] == b"\xff\xd8" and b"\xff\xc2" in b[:200]
    assert parse_jpeg_header(b) == (12, 10, 3)
