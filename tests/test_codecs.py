"""Pure-python PNG/WAV codecs (r5) — the real-format multimodal layer.

Covers: encode/decode round-trips for every supported channel count and
row filter, an INDEPENDENT reference unfilter implementation for all 5
PNG filter types, palette expansion, CRC/format rejection, WAV chunk
walking (extra chunks, 8-bit widening, stereo), and the Spark operators
over real PNG/WAV payload columns.
"""

import struct
import zlib

import numpy as np
import pytest

from hlld_spark.operators.codecs import (
    PNG_MAGIC,
    PngFormatError,
    WavFormatError,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    parse_png_header,
    parse_wav_header,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def test_png_round_trip_shapes_and_filters():
    rng = np.random.RandomState(0)
    for shape in [(1, 1), (7, 3), (16, 16, 3), (5, 9, 4), (12, 1, 2), (3, 300, 3)]:
        for ftype in (0, 1, 2):
            a = rng.randint(0, 256, size=shape).astype(np.uint8)
            ref = a if a.ndim == 3 else a[:, :, None]
            data = encode_png(a, filter_type=ftype)
            assert np.array_equal(decode_png(data), ref), (shape, ftype)
            w, h, c = parse_png_header(data)
            assert (w, h, c) == (ref.shape[1], ref.shape[0], ref.shape[2])


def _ref_unfilter(ftype, row, prev, bpp):
    """Independent spec-literal unfilter (per-byte, used only as the
    test oracle for the vectorized decoder paths)."""
    out = []
    for x, v in enumerate(row):
        a = out[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            p = 0
        elif ftype == 1:
            p = a
        elif ftype == 2:
            p = b
        elif ftype == 3:
            p = (a + b) // 2
        else:
            q = a + b - c
            pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
            p = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out.append((v + p) & 0xFF)
    return out


def test_png_all_five_filters_match_reference():
    rng = np.random.RandomState(3)
    w, h, c = 6, 5, 3
    filt_rows = [(f, list(rng.randint(0, 256, size=w * c))) for f in (0, 1, 2, 3, 4)]
    raw = b"".join(bytes([f]) + bytes(r) for f, r in filt_rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    prev, exp = [0] * (w * c), []
    for f, r in filt_rows:
        rec = _ref_unfilter(f, r, prev, c)
        exp.append(rec)
        prev = rec
    expect = np.array(exp, dtype=np.uint8).reshape(h, w, c)
    assert np.array_equal(decode_png(png), expect)


def test_png_palette_expands_to_rgb():
    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, size=(4, 3)).astype(np.uint8)
    idx = rng.randint(0, 4, size=(3, 5)).astype(np.uint8)
    raw = b"".join(b"\x00" + bytes(r) for r in idx)
    png = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 3, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), pal[idx])
    assert parse_png_header(png) == (5, 3, 3)  # palette reports 3 channels


def test_png_rejections():
    good = encode_png(np.zeros((4, 4, 3), np.uint8))
    bad_crc = bytearray(good)
    bad_crc[40] ^= 0xFF
    with pytest.raises(PngFormatError):
        decode_png(bytes(bad_crc))
    with pytest.raises(PngFormatError):
        decode_png(b"not a png at all")
    # 16-bit depth rejected, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    deep = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\x00" * 26)) + _chunk(b"IEND", b"")
    with pytest.raises(PngFormatError, match="bit depth"):
        decode_png(deep)
    # unknown interlace method rejected (Adam7 itself is SUPPORTED)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 7)
    inter = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\x00" * 14)) + _chunk(b"IEND", b"")
    with pytest.raises(PngFormatError, match="interlace"):
        decode_png(inter)


def test_png_adam7_interlaced_decode():
    """Adam7 (r5): an interlaced stream hand-built by scattering a known
    image into the 7 passes (each its own filtered sub-image; pass 2
    uses Sub, pass 4 uses Up for filter coverage) decodes back to the
    original — on sizes smaller and larger than one 8x8 tile, and on a
    width where some passes are empty."""
    adam7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    rng = np.random.RandomState(13)
    for (h, w, c), ctype in [((3, 3, 3), 2), ((16, 20, 3), 2), ((9, 2, 1), 0), ((8, 8, 4), 6)]:
        img = rng.randint(0, 256, size=(h, w, c)).astype(np.uint8)
        raw = b""
        for p, (x0, y0, dx, dy) in enumerate(adam7):
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            flat = sub.reshape(sub.shape[0], -1)
            if p == 1:  # Sub-filter this pass
                filt = flat.copy()
                filt[:, c:] = flat[:, c:] - flat[:, :-c]
                raw += b"".join(b"\x01" + r.tobytes() for r in filt)
            elif p == 3:  # Up-filter this pass
                filt = flat.copy()
                filt[1:] = flat[1:] - flat[:-1]
                raw += b"".join(b"\x02" + r.tobytes() for r in filt)
            else:
                raw += b"".join(b"\x00" + r.tobytes() for r in flat)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
        png = (
            PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(png), img), (h, w, c)


def test_wav_round_trip_mono_stereo_and_header():
    rng = np.random.RandomState(1)
    for shape in [(100,), (64, 2)]:
        s = rng.randint(-32768, 32767, size=shape).astype(np.int16)
        b = encode_wav(s, 16000)
        d, sr = decode_wav(b)
        assert sr == 16000 and np.array_equal(d.reshape(s.shape), s)
        sr2, n, ch = parse_wav_header(b)
        assert (sr2, n, ch) == (16000, shape[0], shape[1] if len(shape) > 1 else 1)


def test_truncated_payloads_raise_codec_errors():
    """Truncated data/frame chunks surface as the codec's own exception
    type, not a raw numpy buffer error."""
    from hlld_spark.operators.codecs import AviFormatError, decode_avi, encode_avi

    w = encode_wav(np.arange(100, dtype=np.int16), 8000)
    with pytest.raises(WavFormatError, match="truncated"):
        decode_wav(w[:-50])
    a = encode_avi(np.zeros((2, 4, 4, 3), np.uint8))
    with pytest.raises(AviFormatError, match="truncated"):
        decode_avi(a[:-20])


def test_wav_extra_chunks_and_8bit():
    # hand-build: LIST chunk before fmt, odd-length chunk padding, 8-bit PCM
    samples8 = bytes([0, 128, 255, 64])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    inner = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd length + pad
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(samples8)) + samples8
    )
    wav = b"RIFF" + struct.pack("<I", len(inner)) + inner
    d, sr = decode_wav(wav)
    assert sr == 8000
    assert list(d) == [(v - 128) << 8 for v in [0, 128, 255, 64]]
    with pytest.raises(WavFormatError):
        decode_wav(b"RIFFxxxxJUNK")
    # non-PCM rejected
    bad_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    inner = b"WAVE" + b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt + b"data" + struct.pack("<I", 0)
    with pytest.raises(WavFormatError, match="PCM"):
        decode_wav(b"RIFF" + struct.pack("<I", len(inner)) + inner)


def test_avi_round_trip_and_header():
    from hlld_spark.operators.codecs import (
        AviFormatError,
        decode_avi,
        encode_avi,
        parse_avi_header,
    )

    rng = np.random.RandomState(2)
    # widths 6 and 9 force the DIB 4-byte stride padding path
    for shape in [(1, 4, 4, 3), (5, 7, 6, 3), (3, 8, 9, 3)]:
        f = rng.randint(0, 256, size=shape).astype(np.uint8)
        b = encode_avi(f, fps=12.0)
        d, fps = decode_avi(b)
        assert np.array_equal(d, f), shape
        w, h, n, fps2 = parse_avi_header(b)
        assert (n, h, w) == shape[:3] and abs(fps2 - 12.0) < 0.01
    with pytest.raises(AviFormatError):
        decode_avi(b"RIFFxxxxJUNK")
    # compressed streams rejected, not mis-decoded: patch biCompression
    good = bytearray(encode_avi(np.zeros((1, 4, 4, 3), np.uint8)))
    strf_at = bytes(good).index(b"strf") + 8
    struct.pack_into("<I", good, strf_at + 16, 0x44495658)  # 'XVID'
    with pytest.raises(AviFormatError, match="DIB or MJPG"):
        decode_avi(bytes(good))


def test_codec_round_trip_property():
    """Hypothesis fuzz: encode→decode is the identity for every codec
    across random shapes, channel counts, filter types and sample
    rates."""
    from hypothesis import given, settings, strategies as st

    from hlld_spark.operators.codecs import decode_avi, encode_avi

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(1, 40), st.integers(1, 40), st.sampled_from([1, 2, 3, 4]),
        st.sampled_from([0, 1, 2]), st.integers(0, 2**32 - 1),
    )
    def png_prop(h, w, c, ftype, seed):
        a = np.random.RandomState(seed % 2**31).randint(0, 256, size=(h, w, c)).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(a, filter_type=ftype)), a)

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 500), st.sampled_from([1, 2, 3]), st.integers(0, 2**31 - 1))
    def wav_prop(n, ch, seed):
        s = np.random.RandomState(seed).randint(-32768, 32767, size=(n, ch)).astype(np.int16)
        d, sr = decode_wav(encode_wav(s, 44100))
        assert sr == 44100 and np.array_equal(d.reshape(s.shape), s)

    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 6), st.integers(1, 16), st.integers(1, 16), st.integers(0, 2**31 - 1))
    def avi_prop(n, h, w, seed):
        f = np.random.RandomState(seed).randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)
        d, _ = decode_avi(encode_avi(f))
        assert np.array_equal(d, f)

    png_prop()
    wav_prop()
    avi_prop()


@pytest.mark.spark
def test_spark_operators_on_real_formats(spark):
    """parse_metadata / extract_image_features / resize_images /
    sample_audio_frames over a real PNG + WAV payload column."""
    from pyspark.sql import functions as F

    from hlld_spark.operators.multimodal import (
        extract_image_features,
        parse_metadata,
        resize_images,
        sample_audio_frames,
    )

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(10, 6, 3)).astype(np.uint8)
    aud = rng.randint(-1000, 1000, size=(50,)).astype(np.int16)
    rows = [
        (0, bytearray(encode_png(img, filter_type=1))),
        (1, bytearray(encode_wav(aud, 22050))),
        (2, bytearray(b"garbage bytes")),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    md = {r["asset_id"]: r["meta"] for r in parse_metadata(df).collect()}
    assert (md[0]["kind"], md[0]["width"], md[0]["height"], md[0]["channels"]) == ("image", 6, 10, 3)
    assert (md[1]["kind"], md[1]["sample_rate"], md[1]["n_samples"]) == ("audio", 22050, 50)
    assert md[2]["kind"] == "unknown"

    feats = {r["asset_id"]: r["features"] for r in extract_image_features(df).collect()}
    assert feats[1] is None and feats[2] is None
    assert feats[0][0] == round(float(img.astype(np.float64)[:, :, 0].mean()), 6)

    rs = {r["asset_id"]: r["resized"] for r in resize_images(df, 4, 4).collect()}
    assert rs[1] is None
    out = decode_png(bytes(rs[0]))  # PNG in -> PNG out
    assert out.shape == (4, 4, 3)
    ys = (np.arange(4) * 10 // 4).clip(0, 9)
    xs = (np.arange(4) * 6 // 4).clip(0, 5)
    assert np.array_equal(out, img[ys][:, xs])

    smp = {r["asset_id"]: r["frame_samples"] for r in sample_audio_frames(df, every_n=4).collect()}
    assert smp[0] is None
    assert smp[1] == [int(x) for x in aud[::4]]


@pytest.mark.spark
def test_extract_audio_features_real_wav(spark):
    """r5: audio counterpart of image features — rms / zcr / peak /
    duration over channel 0, real WAV and non-audio→None."""
    from hlld_spark.operators.multimodal import extract_audio_features

    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr
    tone = (10000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    df = spark.createDataFrame(
        [
            (0, bytearray(encode_wav(tone, sr))),
            (1, bytearray(encode_png(np.zeros((4, 4, 3), np.uint8)))),
            (2, None),
        ],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r["audio_features"] for r in extract_audio_features(df).collect()}
    assert got[1] is None and got[2] is None
    rms, zcr, peak, dur = got[0]
    xf = tone.astype(np.float64)
    assert rms == round(float(np.sqrt(np.mean(xf * xf))), 6)
    # 440 Hz tone crosses zero ~880 times/sec
    assert abs(zcr - 880 / sr) < 0.01
    assert peak == float(np.abs(xf).max())
    assert dur == 1.0


@pytest.mark.spark
def test_multimodal_features_parquet_equivalence(spark, tmp_path):
    """The worker-side-scan feature path returns exactly what the
    DataFrame operators return on the same real-format table."""
    from hlld_spark.operators.multimodal import (
        extract_audio_features,
        extract_image_features,
        multimodal_features_parquet,
        write_real_assets_fixture,
    )

    p = str(tmp_path / "real_assets.parquet")
    write_real_assets_fixture(p, 60)
    df = spark.read.parquet(p).select("asset_id", "payload")
    base_img = {r["asset_id"]: r["features"] for r in extract_image_features(df).collect()}
    base_aud = {r["asset_id"]: r["audio_features"] for r in extract_audio_features(df).collect()}
    got = {r["asset_id"]: r for r in multimodal_features_parquet(spark, p).collect()}
    assert len(got) == 60
    for aid, r in got.items():
        assert r["features"] == base_img[aid], aid
        assert r["audio_features"] == base_aud[aid], aid
        assert r["kind"] == ("image" if base_img[aid] else "audio" if base_aud[aid] else "other")


@pytest.mark.spark
def test_null_payloads_yield_nulls(spark):
    """r5: a NULL payload cell flows through every multimodal operator
    as NULL output instead of crashing the worker."""
    from hlld_spark.operators.multimodal import (
        extract_image_features,
        resize_images,
        sample_audio_frames,
        sample_video_frames,
    )

    df = spark.createDataFrame(
        [(0, None), (1, bytearray(encode_png(np.zeros((4, 4, 3), np.uint8))))],
        "asset_id long, payload binary",
    )
    feats = {r["asset_id"]: r["features"] for r in extract_image_features(df).collect()}
    assert feats[0] is None and feats[1] is not None
    rs = {r["asset_id"]: r["resized"] for r in resize_images(df, 2, 2).collect()}
    assert rs[0] is None and rs[1] is not None
    assert sample_audio_frames(df).collect()[0]["frame_samples"] is None
    assert sample_video_frames(df).collect()[0]["frame_features"] is None


@pytest.mark.spark
def test_spark_video_sampling_on_real_avi(spark):
    from hlld_spark.operators.codecs import encode_avi
    from hlld_spark.operators.multimodal import parse_metadata, sample_video_frames

    rng = np.random.RandomState(11)
    vid = rng.randint(0, 256, size=(9, 6, 5, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [(0, bytearray(encode_avi(vid, fps=8.0)))], "asset_id long, payload binary"
    )
    md = parse_metadata(df).collect()[0]["meta"]
    assert (md["kind"], md["width"], md["height"], md["channels"], md["n_frames"]) == (
        "video", 5, 6, 3, 9,
    )
    feats = sample_video_frames(df, every_n=4).collect()[0]["frame_features"]
    expect = [round(float(f.astype(np.float64).mean()), 6) for f in vid[::4]]
    assert feats == expect


def test_truncated_riff_chunks_raise_format_errors():
    """ADVICE r5: a truncated fmt/avih/strf chunk must raise the
    codec's FormatError (which the operators map to 'unknown'/None),
    never a raw struct.error that kills the whole job."""
    import struct

    from hlld_spark.operators.codecs import (
        AviFormatError,
        WavFormatError,
        decode_avi,
        decode_wav,
        encode_avi,
        encode_wav,
        parse_avi_header,
        parse_wav_header,
    )

    wav = encode_wav(np.zeros(16, dtype=np.int16), 8000)
    # fmt chunk declares 16 bytes but carries 4
    bad_wav = wav[:12] + b"fmt " + struct.pack("<I", 4) + wav[20:24]
    for fn in (decode_wav, parse_wav_header):
        with pytest.raises(WavFormatError):
            fn(bad_wav)

    avi = encode_avi(np.zeros((1, 4, 4, 3), dtype=np.uint8), fps=10)
    # truncate inside the avih body: keep RIFF + LIST hdrl + avih header,
    # then cut the file 8 bytes into avih's 56-byte body
    avih_at = avi.find(b"avih")
    bad_avi = avi[: avih_at + 8 + 8]
    for fn in (decode_avi, parse_avi_header):
        with pytest.raises(AviFormatError):
            fn(bad_avi)
    # shrink the strf chunk's declared length below the 20 bytes _walk_avi needs
    strf_at = avi.find(b"strf")
    bad_strf = avi[: strf_at + 4] + struct.pack("<I", 8) + avi[strf_at + 8 : strf_at + 16]
    with pytest.raises(AviFormatError):
        decode_avi(bad_strf)


@pytest.mark.spark
def test_zero_frame_avi_through_sampler(spark):
    """ADVICE r5: a zero-frame AVI used to crash sample_video_frames
    (reshape of a size-0 array); it must flow through as an empty
    feature list."""
    from hlld_spark.operators.codecs import decode_avi, encode_avi
    from hlld_spark.operators.multimodal import sample_video_frames

    empty = encode_avi(np.zeros((0, 4, 4, 3), dtype=np.uint8), fps=10)
    fr, _fps = decode_avi(empty)
    assert fr.shape == (0, 4, 4, 3)
    df = spark.createDataFrame([("v0", bytearray(empty))], "id string, payload binary")
    rows = sample_video_frames(df, every_n=2).select("id", "frame_features").collect()
    assert rows[0]["frame_features"] == []


def _filtered_png(rng, h, w, c, filter_seq):
    """Build a PNG whose rows use the given repeating filter sequence
    (spec-literal FORWARD filtering — independent of the encoder)."""
    px = rng.randint(0, 256, size=(h, w, c)).astype(np.uint8)
    flat = px.reshape(h, w * c).astype(np.int64)
    raw = bytearray()
    prev = [0] * (w * c)
    for y in range(h):
        f = filter_seq[y % len(filter_seq)]
        raw.append(f)
        row = list(flat[y])
        enc = []
        for x, v in enumerate(row):
            a = row[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                p = 0
            elif f == 1:
                p = a
            elif f == 2:
                p = b
            elif f == 3:
                p = (a + b) // 2
            else:
                q = a + b - cc
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - cc)
                p = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc.append((v - p) & 0xFF)
        raw.extend(enc)
        prev = row
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b""),
        px,
    )


def test_wavefront_unfilter_matches_row_path():
    """r6: the anti-diagonal wavefront unfilter must agree byte-exactly
    with the r5 row-sequential path on every filter mix and shape."""
    from hlld_spark.operators.codecs import _unfilter_image_rows, _unfilter_image_wavefront

    rng = np.random.RandomState(17)
    seqs = [[4], [3], [3, 4], [0, 1, 2, 3, 4], [4, 2], [1, 3, 4], [2]]
    for i, (h, w, c) in enumerate(
        [(1, 1, 1), (2, 3, 3), (9, 1, 4), (1, 40, 2), (23, 17, 3), (40, 40, 1), (8, 300, 3)]
    ):
        png, px = _filtered_png(rng, h, w, c, seqs[i % len(seqs)])
        assert np.array_equal(decode_png(png), px), (h, w, c)
        raw = np.frombuffer(
            zlib.decompress(png[png.find(b"IDAT") + 4 : png.rfind(b"IEND") - 8]), np.uint8
        ).reshape(h, w * c + 1)
        assert np.array_equal(
            _unfilter_image_wavefront(raw, c), _unfilter_image_rows(raw, c)
        ), (h, w, c)


def test_decode_png_batch_groups_and_isolates():
    """decode_png_batch == per-image decode across mixed shapes,
    channel counts, filters, palette and Adam7 members; a corrupt
    member makes the batch raise, and the operator-level helper
    isolates it to a None slot."""
    from hlld_spark.operators.codecs import decode_png_batch
    from hlld_spark.operators.multimodal import _decode_images

    rng = np.random.RandomState(23)
    payloads, truths = [], []
    for i in range(24):
        h, w = int(rng.randint(1, 30)), int(rng.randint(1, 30))
        c = (1, 2, 3, 4)[i % 4]
        seq = ([4], [3, 4], [0, 1, 2, 3, 4], [2])[i % 4]
        png, px = _filtered_png(rng, h, w, c, seq)
        payloads.append(png)
        truths.append(px)
    # duplicates of one shape so the same-shape wavefront grouping runs
    payloads += payloads[:6]
    truths += truths[:6]
    outs = decode_png_batch(payloads)
    assert all(np.array_equal(o, t) for o, t in zip(outs, truths))
    # corrupt member: batch raises, operator helper yields None in place
    bad = payloads[3][:40] + b"\x00\x00\x00\x00" + payloads[3][44:]
    with pytest.raises(PngFormatError):
        decode_png_batch([payloads[0], bad])
    res = _decode_images([payloads[0], bad, payloads[1]])
    assert np.array_equal(res[0], truths[0])
    assert res[1] is None
    assert np.array_equal(res[2], truths[1])


# ---------------------------------------------------------------------------
# GIF (r6)
# ---------------------------------------------------------------------------


def _rand_paletted(rng, h, w, npal, nframes=None):
    pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
    if nframes is None:
        return pal[rng.integers(0, npal, (h, w))]
    return pal[rng.integers(0, npal, (nframes, h, w))]


def test_gif_round_trip_palette_sizes_and_interlace():
    from hlld_spark.operators.codecs import decode_gif, encode_gif, parse_gif_header

    rng = np.random.default_rng(11)
    for npal in (2, 3, 16, 17, 128, 256):
        for interlace in (False, True):
            img = _rand_paletted(rng, 23, 31, npal)
            b = encode_gif(img, interlace=interlace)
            assert parse_gif_header(b) == (31, 23, 1)
            assert np.array_equal(decode_gif(b), img)


def test_gif_animation_round_trip_and_fps():
    from hlld_spark.operators.codecs import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
        parse_gif_header,
    )

    rng = np.random.default_rng(12)
    anim = _rand_paletted(rng, 14, 9, 40, nframes=5)
    b = encode_gif(anim, fps=25.0)
    assert parse_gif_header(b) == (9, 14, 5)
    frames, fps = decode_gif_frames(b)
    assert np.array_equal(frames, anim)
    assert fps == 25.0
    # the image view of an animation is its FIRST frame
    assert np.array_equal(decode_gif(b), anim[0])


def test_gif_lzw_table_reset_at_4096():
    """An image large and noisy enough to exhaust the 12-bit code space
    forces the encoder's CLEAR + table rebuild; decode must follow."""
    from hlld_spark.operators.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(13)
    img = _rand_paletted(rng, 240, 350, 250)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_subrect_transparency_composites_onto_canvas():
    """Hand-assembled two-frame GIF: frame 1 paints a 2x3 sub-rect at
    (2, 1) with one transparent pixel — the canvas must keep the old
    value there and composite the rest."""
    from hlld_spark.operators.codecs import _lzw_encode, decode_gif_frames

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8)
    idx0 = np.zeros((4, 5), dtype=np.uint8)  # all red
    out = bytearray(b"GIF89a") + struct.pack("<HH", 5, 4) + bytes([0x82, 0, 0])
    table = np.zeros((8, 3), dtype=np.uint8)
    table[:4] = pal
    out += table.tobytes()

    def frame(grid, x0, y0, transparent):
        gflags = 1 if transparent is not None else 0
        buf = b"\x21\xf9\x04" + bytes([gflags]) + struct.pack("<H", 10)
        buf += bytes([transparent or 0, 0])
        buf += b"\x2c" + struct.pack("<4H", x0, y0, grid.shape[1], grid.shape[0]) + b"\x00\x03"
        stream = _lzw_encode(grid.reshape(-1), 3)
        for off in range(0, len(stream), 255):
            blk = stream[off : off + 255]
            buf += bytes([len(blk)]) + blk
        return buf + b"\x00"

    sub = np.array([[1, 7, 1], [2, 2, 7]], dtype=np.uint8)  # 7 = transparent
    out += frame(idx0, 0, 0, None) + frame(sub, 2, 1, 7) + b"\x3b"
    frames, fps = decode_gif_frames(bytes(out))
    assert fps == 10.0
    truth1 = pal[idx0].copy()
    truth1[1, 2] = pal[1]
    truth1[1, 4] = pal[1]  # (row 1): [red, red, green, RED(kept), green]... see below
    # compose explicitly: rows 1-2, cols 2-4; transparent where sub == 7
    truth = pal[idx0].copy()
    for dy in range(2):
        for dx in range(3):
            v = sub[dy, dx]
            if v != 7:
                truth[1 + dy, 2 + dx] = pal[v]
    assert np.array_equal(frames[0], pal[idx0])
    assert np.array_equal(frames[1], truth)


def test_gif_disposal_restore_background_and_previous():
    """Disposal 2 clears the frame rect to the background color before
    the next frame; disposal 3 restores the pre-frame canvas."""
    from hlld_spark.operators.codecs import _lzw_encode, decode_gif_frames

    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]], dtype=np.uint8)
    out = bytearray(b"GIF89a") + struct.pack("<HH", 3, 3) + bytes([0x82, 0, 0])
    table = np.zeros((8, 3), dtype=np.uint8)
    table[:4] = pal
    out += table.tobytes()

    def frame(grid, x0, y0, disposal):
        buf = b"\x21\xf9\x04" + bytes([disposal << 2]) + struct.pack("<H", 5) + b"\x00\x00"
        buf += b"\x2c" + struct.pack("<4H", x0, y0, grid.shape[1], grid.shape[0]) + b"\x00\x03"
        stream = _lzw_encode(grid.reshape(-1), 3)
        for off in range(0, len(stream), 255):
            blk = stream[off : off + 255]
            buf += bytes([len(blk)]) + blk
        return buf + b"\x00"

    base = np.full((3, 3), 1, dtype=np.uint8)  # all red
    dot2 = np.full((1, 1), 2, dtype=np.uint8)  # green dot, disposal 2
    dot3 = np.full((1, 1), 3, dtype=np.uint8)  # blue dot, disposal 3
    out += frame(base, 0, 0, 0)
    out += frame(dot2, 1, 1, 2)  # after this frame: rect -> background
    out += frame(dot3, 0, 0, 3)  # after this frame: restore previous
    out += frame(np.full((1, 1), 2, dtype=np.uint8), 2, 2, 0) + b"\x3b"
    frames, _ = decode_gif_frames(bytes(out))
    assert np.array_equal(frames[0], pal[base])
    f1 = pal[base].copy()
    f1[1, 1] = pal[2]
    assert np.array_equal(frames[1], f1)
    # frame 2 renders on a canvas whose (1,1) was restored to BACKGROUND
    f2 = pal[base].copy()
    f2[1, 1] = pal[0]
    f2[0, 0] = pal[3]
    assert np.array_equal(frames[2], f2)
    # frame 3 renders on the canvas RESTORED to pre-frame-2 state
    f3 = pal[base].copy()
    f3[1, 1] = pal[0]
    f3[2, 2] = pal[2]
    assert np.array_equal(frames[3], f3)


def test_gif_rejections():
    from hlld_spark.operators.codecs import (
        GifFormatError,
        decode_gif,
        encode_gif,
        parse_gif_header,
    )

    rng = np.random.default_rng(14)
    with pytest.raises(GifFormatError):
        parse_gif_header(b"NOTAGIF" + b"\x00" * 20)
    with pytest.raises(GifFormatError):
        decode_gif(b"GIF89a" + b"\x00" * 4)  # truncated LSD
    # >256 unique colors: honest encoder error, no silent quantization
    big = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)  # ~400 colors
    with pytest.raises(GifFormatError):
        encode_gif(big)
    # truncated stream: cut a valid GIF in half
    ok = encode_gif(np.zeros((8, 8, 3), dtype=np.uint8))
    with pytest.raises(GifFormatError):
        decode_gif(ok[: len(ok) // 2])
    # trailing-garbage introducer: decode_gif stops at the first frame
    # BY DESIGN, but the full-animation walk must reject it
    from hlld_spark.operators.codecs import decode_gif_frames

    assert decode_gif(ok[:-1] + b"\x7f\x3b").shape == (8, 8, 3)
    with pytest.raises(GifFormatError):
        decode_gif_frames(ok[:-1] + b"\x7f\x3b")


def test_gif_lzw_reference_decode():
    """Pin _lzw_decode against a tiny hand-worked stream: the canonical
    GIF89a spec example uses mcs=2; verify with an independent pure-
    python re-implementation over random index streams."""
    from hlld_spark.operators.codecs import _lzw_decode, _lzw_encode

    def ref_decode(data, mcs, n):
        # independent spec-literal decoder (bit cursor kept as an index)
        clear, eoi = 1 << mcs, (1 << mcs) + 1
        bits = "".join(f"{b:08b}"[::-1] for b in data)
        pos = 0
        width = mcs + 1
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        out, prev = bytearray(), None
        while len(out) < n:
            code = int(bits[pos : pos + width][::-1], 2)
            pos += width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width, prev = mcs + 1, None
                continue
            if code == eoi:
                break
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                if len(table) < 4096:
                    table.append(entry)
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
        return bytes(out[:n])

    rng = np.random.default_rng(15)
    for mcs, n in ((2, 40), (4, 500), (8, 20000)):
        idx = rng.integers(0, 1 << mcs, n).astype(np.uint8)
        stream = _lzw_encode(idx, mcs)
        got = _lzw_decode(stream, mcs, n)
        assert bytes(got.tobytes()) == ref_decode(stream, mcs, n) == idx.tobytes()


# ---------------------------------------------------------------------------
# Motion-JPEG AVI (r6)
# ---------------------------------------------------------------------------


def test_mjpeg_avi_round_trip_pixel_exact_vs_encoder_truth():
    from hlld_spark.operators.codecs import decode_avi, encode_avi, parse_avi_header
    from hlld_spark.operators.jpeg import dequant_idct_reference, quantized_planes

    rng = np.random.default_rng(16)
    frames = rng.integers(0, 256, (3, 19, 26, 3), dtype=np.uint8)
    for q, ss in ((75, "4:2:0"), (92, "4:4:4")):
        b = encode_avi(frames, fps=24.0, codec="mjpg", quality=q, subsampling=ss)
        w, h, nf, fps = parse_avi_header(b)
        assert (w, h, nf) == (26, 19, 3) and abs(fps - 24.0) < 0.01
        out, _ = decode_avi(b)
        assert out.shape == (3, 19, 26, 3)
        for k in range(3):
            coefs, qs, samp = quantized_planes(frames[k], q, ss)
            truth = dequant_idct_reference(coefs, qs, samp, 26, 19, False)
            assert np.array_equal(out[k], truth)


def test_mjpeg_avi_bad_frame_raises_avi_error():
    from hlld_spark.operators.codecs import AviFormatError, decode_avi, encode_avi

    rng = np.random.default_rng(17)
    frames = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    b = bytearray(encode_avi(frames, codec="mjpg"))
    # corrupt the first JPEG's SOI inside the movi list
    soi = b.find(b"\xff\xd8\xff", 100)
    assert soi > 0
    b[soi] = 0x00
    with pytest.raises(AviFormatError):
        decode_avi(bytes(b))


def test_gif_and_mjpeg_through_spark_operators(spark):
    """End-to-end through parse_metadata / extract_image_features /
    sample_video_frames / resize_images with the anim fixture
    generator, plus corrupt payloads mapping to NULL rows."""
    from pyspark.sql import functions as F

    from hlld_spark.operators.multimodal import (
        _gen_anim_asset,
        extract_image_features,
        parse_metadata,
        resize_images,
        sample_video_frames,
    )

    rows = [_gen_anim_asset(i, 7) for i in range(12)]
    rows.append(
        {"asset_id": 99, "kind": "junk", "payload": b"GIF89a\x03\x00",
         "width": None, "height": None, "n_frames": None, "chan0_mean": None,
         "frame0_mean": None, "last_frame_mean": None, "resized_mean": None}
    )
    df = spark.createDataFrame(
        [(r["asset_id"], bytearray(r["payload"])) for r in rows],
        "asset_id long, payload binary",
    )
    out = sample_video_frames(extract_image_features(parse_metadata(df)), every_n=1)
    out = extract_image_features(resize_images(out, 4, 4), payload_col="resized", out="rf")
    got = {
        r["asset_id"]: r
        for r in out.select(
            "asset_id",
            F.col("meta.kind").alias("kind"),
            F.col("features")[0].alias("c0"),
            F.col("frame_features")[0].alias("f0"),
            F.element_at(F.col("frame_features"), -1).alias("fl"),
            F.col("rf")[0].alias("rm"),
        ).collect()
    }
    for r in rows[:-1]:
        g = got[r["asset_id"]]
        assert g["c0"] == r["chan0_mean"]
        assert g["f0"] == r["frame0_mean"]
        assert g["fl"] == r["last_frame_mean"]
        assert g["rm"] == r["resized_mean"]
        assert g["kind"] == r["kind"]
    junk = got[99]
    assert junk["kind"] == "unknown"
    assert junk["c0"] is None and junk["f0"] is None and junk["rm"] is None
