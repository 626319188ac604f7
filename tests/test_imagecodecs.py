"""Pure-stdlib image codecs (operators/imagecodecs.py): hand-built
fixture images decode BIT-EXACTLY (geometry + pixel digest) through the
same Arrow mapInPandas path mm_decode_geometry grades
(multimodal.decode_image). The encoders here are written forward from
the public format specs, independently of the decoder's logic."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest

from sql_based_etl_spark.operators.imagecodecs import (
    ImageDecodeError,
    decode_image_bytes,
    sniff_format,
)


def _rng_pixels(h: int, w: int, c: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8).reshape(h, w, c)


# --- test-side encoders (format specs applied forward) ------------------


def encode_ppm(px: np.ndarray, ascii_form: bool = False) -> bytes:
    h, w, c = px.shape
    magic = (b"P3" if ascii_form else b"P6") if c == 3 else (
        b"P2" if ascii_form else b"P5")
    head = magic + b"\n# comment line\n" + f"{w} {h}\n255\n".encode()
    if ascii_form:
        return head + b" ".join(str(v).encode() for v in px.reshape(-1))
    return head + px.tobytes()


def encode_bmp(px: np.ndarray) -> bytes:
    h, w, c = px.shape
    assert c in (3, 4)
    stride = (w * c + 3) & ~3
    rows = bytearray()
    order = [2, 1, 0] + ([3] if c == 4 else [])  # RGB(A) -> BGR(A)
    bgr = px[:, :, order]
    for r in range(h - 1, -1, -1):  # bottom-up
        row = bgr[r].tobytes()
        rows += row + b"\x00" * (stride - len(row))
    pix_offset = 14 + 40
    filehdr = b"BM" + struct.pack("<IHHI", pix_offset + len(rows), 0, 0,
                                  pix_offset)
    infohdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, c * 8, 0, len(rows),
                          2835, 2835, 0, 0)
    return filehdr + infohdr + bytes(rows)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def encode_png(px: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Forward-filter each scanline with the given filter type (cycled),
    per the PNG spec's filter definitions."""
    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = px.reshape(h, w * c).astype(np.int32)
    filters = filters or [0]
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for r in range(h):
        f = filters[r % len(filters)]
        line = flat[r]
        filt = np.zeros(w * c, dtype=np.int32)
        for i in range(w * c):
            a = int(line[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1,
                    4: _paeth(a, b, cc)}[f]
            filt[i] = (int(line[i]) - pred) & 0xFF
        out += bytes([f]) + filt.astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


# --- decoder unit tests --------------------------------------------------


def test_netpbm_binary_and_ascii_bit_exact():
    px = _rng_pixels(5, 7, 3)
    for ascii_form in (False, True):
        fmt, got = decode_image_bytes(encode_ppm(px, ascii_form))
        assert fmt == "ppm"
        assert np.array_equal(got, px)
    gray = _rng_pixels(4, 6, 1)
    for ascii_form in (False, True):
        fmt, got = decode_image_bytes(encode_ppm(gray, ascii_form))
        assert fmt == "pgm"
        assert np.array_equal(got, gray)


def test_bmp_24_and_32_bit_exact():
    for c in (3, 4):
        # w=5 with c=3 exercises the 4-byte row padding (stride 16 != 15)
        px = _rng_pixels(3, 5, c)
        fmt, got = decode_image_bytes(encode_bmp(px))
        assert fmt == "bmp"
        assert np.array_equal(got, px)


def test_png_all_filters_and_color_types_bit_exact():
    # every filter type on every supported color type, incl. mixed rows
    for c in (1, 2, 3, 4):
        px = _rng_pixels(6, 5, c, seed=c)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            fmt, got = decode_image_bytes(encode_png(px, filters))
            assert fmt == "png"
            assert np.array_equal(got, px), (c, filters)


def test_decoders_fail_loud():
    px = _rng_pixels(2, 2, 3)
    with pytest.raises(NotImplementedError, match="external codec"):
        decode_image_bytes(b"\xff\xd8\xff\xe0fakejpeg")
    with pytest.raises(ImageDecodeError, match="raster"):
        decode_image_bytes(encode_ppm(px)[:-1])  # truncated raster
    with pytest.raises(ImageDecodeError, match="compression"):
        bad = bytearray(encode_bmp(px))
        struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
        decode_image_bytes(bytes(bad))
    with pytest.raises(ImageDecodeError, match="bit depth"):
        good = encode_png(px)
        ihdr_at = good.index(b"IHDR")
        bad = bytearray(good)
        bad[ihdr_at + 12] = 16  # depth byte inside IHDR
        decode_image_bytes(bytes(bad))
    assert sniff_format(b"GIF89a....") == "gif"


# --- the Spark path: same mapInPandas shape mm_decode_geometry grades ----


def test_decode_image_through_spark(spark):
    from sql_based_etl_spark.operators.multimodal import decode_image

    imgs = {
        1: ("ppm", _rng_pixels(4, 4, 3, seed=1)),
        2: ("bmp", _rng_pixels(3, 5, 3, seed=2)),
        3: ("png", _rng_pixels(5, 3, 4, seed=3)),
        4: ("pgm", _rng_pixels(2, 8, 1, seed=4)),
    }
    enc = {1: encode_ppm(imgs[1][1]), 2: encode_bmp(imgs[2][1]),
           3: encode_png(imgs[3][1], [0, 1, 2, 3, 4]),
           4: encode_ppm(imgs[4][1])}
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enc.items()],
        "doc_id long, payload binary",
    ).repartition(2)
    got = {r.doc_id: r for r in decode_image(df).collect()}
    assert len(got) == 4
    for i, (fmt, px) in imgs.items():
        r = got[i]
        h, w, c = px.shape
        assert (r.format, r.width, r.height, r.n_channels) == (fmt, w, h, c)
        assert r.pixel_md5 == hashlib.md5(px.tobytes()).hexdigest()
        assert r.mean_pixel == round(float(px.mean()), 6)
