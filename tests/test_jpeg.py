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
    # flip SOF0 -> SOF2: progressive must be an explicit unsupported error
    sof_at = b.find(b"\xff\xc0")
    prog = b[:sof_at + 1] + b"\xc2" + b[sof_at + 2 :]
    with pytest.raises(JpegFormatError, match="progressive"):
        decode_jpeg(prog)
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

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    payload = encode_jpeg(img, 85, "4:2:0")
    truncated = payload[:30]  # header unparseable -> kind unknown
    sof_at = payload.find(b"\xff\xc0")
    progressive = payload[: sof_at + 1] + b"\xc2" + payload[sof_at + 2 :]
    df = spark.createDataFrame(
        [(0, bytearray(payload)), (1, bytearray(truncated)), (2, bytearray(progressive))],
        "asset_id long, payload binary",
    )
    md = {r["asset_id"]: r["meta"] for r in parse_metadata(df).collect()}
    assert (md[0]["kind"], md[0]["width"], md[0]["height"], md[0]["channels"]) == (
        "image", 17, 21, 3,
    )
    assert md[1]["kind"] == "unknown"
    assert md[2]["kind"] == "image"  # SOF2 dims are header-readable...
    feats = {r["asset_id"]: r["features"] for r in extract_image_features(df).collect()}
    truth = decode_jpeg(payload).astype(np.float64)
    want = [round(float(x), 6) for x in np.concatenate([truth.mean(axis=(0, 1)), truth.std(axis=(0, 1))])]
    assert feats[0] == want
    assert feats[1] is None
    assert feats[2] is None  # ...but progressive decode is unsupported -> NULL
    rs = {r["asset_id"]: r["resized"] for r in resize_images(df, 4, 4).collect()}
    assert bytes(rs[0])[:2] == b"\xff\xd8"  # JPEG in -> JPEG out
    assert parse_jpeg_header(bytes(rs[0])) == (4, 4, 3)
    assert rs[1] is None
