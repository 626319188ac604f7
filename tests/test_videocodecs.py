"""AVI container codec: round-trip exactness (encoder composed with
struct, independent of the decoder — proving both), frame sampling,
geometry edge cases (odd widths exercise the 4-byte DIB row pad,
single-pixel frames), and the fail-loud boundary (malformed containers
raise VideoDecodeError naming the defect; compressed streams raise
NotImplementedError naming the codec — never a silently-wrong frame).
Mirrors tests/test_audiocodecs.py for the audio leg."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sql_based_etl_spark.operators.videocodecs import (
    VideoDecodeError,
    decode_avi_frames,
    encode_avi_bytes,
    sniff_video,
)


@pytest.mark.parametrize("n,h,w", [(5, 6, 8), (3, 7, 9), (1, 2, 2),
                                   (4, 5, 7), (2, 1, 1)])
def test_avi_round_trip_exact(n, h, w):
    rng = np.random.default_rng(n * 100 + h * 10 + w)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    data = encode_avi_bytes(frames, fps=12)
    assert sniff_video(data) == "avi"
    fps, out = decode_avi_frames(data)
    assert fps == 12.0
    assert [i for i, _ in out] == list(range(n))
    for (_, arr), exp in zip(out, frames):
        assert arr.shape == (h, w, 3)
        assert np.array_equal(arr, exp)


def test_avi_every_n_sampling():
    frames = np.arange(7 * 4 * 4 * 3, dtype=np.uint8).reshape(7, 4, 4, 3) % 256
    data = encode_avi_bytes(frames, fps=10)
    _, out = decode_avi_frames(data, every_n=3)
    assert [i for i, _ in out] == [0, 3, 6]
    for i, arr in out:
        assert np.array_equal(arr, frames[i])


def test_avi_malformed_fails_loud():
    with pytest.raises(VideoDecodeError, match="not a RIFF/AVI"):
        decode_avi_frames(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(VideoDecodeError, match="hdrl"):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00AVI ")
    good = encode_avi_bytes(np.zeros((2, 4, 4, 3), dtype=np.uint8))
    # truncate inside movi: the frame-count promise in avih breaks
    with pytest.raises(VideoDecodeError):
        decode_avi_frames(good[: len(good) - 80])


def test_avi_compressed_and_odd_depth_name_the_format():
    good = bytearray(encode_avi_bytes(np.zeros((2, 4, 4, 3), dtype=np.uint8)))
    i = bytes(good).find(b"strf")
    struct.pack_into("<I", good, i + 8 + 16, struct.unpack("<I", b"cvid")[0])
    with pytest.raises(NotImplementedError, match="cvid"):
        decode_avi_frames(bytes(good))
    good = bytearray(encode_avi_bytes(np.zeros((2, 4, 4, 3), dtype=np.uint8)))
    i = bytes(good).find(b"strf")
    struct.pack_into("<H", good, i + 8 + 14, 8)  # biBitCount = 8
    with pytest.raises(NotImplementedError, match="8 bpp"):
        decode_avi_frames(bytes(good))


def test_avi_frame_count_mismatch_fails_loud():
    good = bytearray(encode_avi_bytes(np.zeros((3, 4, 4, 3), dtype=np.uint8)))
    i = bytes(good).find(b"avih")
    struct.pack_into("<I", good, i + 8 + 16, 5)  # dwTotalFrames = 5, movi has 3
    with pytest.raises(VideoDecodeError, match="promises 5 frames, movi holds 3"):
        decode_avi_frames(bytes(good))


def test_decode_video_operator_exact(spark):
    """The Spark lane end-to-end at a handful of ids: synth → decode →
    rows match the synthesis law replayed in numpy."""
    from sql_based_etl_spark.operators.multimodal import decode_video, synth_avi

    ids = [0, 1, 2, 3, 7, 11]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = decode_video(synth_avi(df), every_n=2).collect()
    got = {(r.doc_id, r.frame_idx): (r.width, r.height, r.fps_millis,
                                     r.pix_sum, r.pix_max) for r in rows}
    expect = {}
    for d in ids:
        n, w, h = 2 + d % 4, 8 + (d % 3) * 4, 4 + (d % 2) * 3
        for f in range(0, n, 2):
            y = np.arange(h, dtype=np.int64)[:, None, None]
            x = np.arange(w, dtype=np.int64)[None, :, None]
            c = np.arange(3, dtype=np.int64)[None, None, :]
            px = (d * 13 + f * 7 + y * 5 + x * 3 + c * 11) % 256
            expect[(d, f)] = (w, h, 10_000, int(px.sum()), int(px.max()))
    assert got == expect


# --- MJPEG (JPEG-in-AVI, with and without DHT) ---------------------------


def _strip_dht(jpeg: bytes) -> bytes:
    """Remove every DHT segment — the shape camera MJPEG writes, where
    the T.81 Annex K default tables are implied."""
    import struct as _s

    out = bytearray(jpeg[:2])
    pos = 2
    while pos + 4 <= len(jpeg):
        marker = jpeg[pos + 1]
        if marker == 0xDA:
            out += jpeg[pos:]
            return bytes(out)
        (seglen,) = _s.unpack_from(">H", jpeg, pos + 2)
        if marker != 0xC4:
            out += jpeg[pos:pos + 2 + seglen]
        pos += 2 + seglen
    raise AssertionError("no SOS")


def test_mjpeg_avi_matches_direct_jpeg_decode():
    from tests.test_imagecodecs import _rng_pixels, encode_jpeg

    from sql_based_etl_spark.operators.imagecodecs import decode_image_bytes
    from sql_based_etl_spark.operators.videocodecs import encode_avi_mjpeg

    w, h = 16, 8
    jpegs = [encode_jpeg(_rng_pixels(h, w, 3, seed=s)) for s in (1, 2, 3)]
    fps, frames = decode_avi_frames(encode_avi_mjpeg(jpegs, w, h, fps=15))
    assert fps == 15.0 and [i for i, _ in frames] == [0, 1, 2]
    for (i, px), j in zip(frames, jpegs):
        assert np.array_equal(px, decode_image_bytes(j)[1])


def test_mjpeg_dhtless_uses_annex_k_tables(monkeypatch):
    """Encode with the REAL Annex K luminance tables, strip the DHT
    segments (camera MJPEG's shape), wrap in an AVI: the decoder must
    splice the standard tables back in and reproduce the with-DHT
    decode bit-for-bit. A wrong byte anywhere in the transcribed K.3/K.5
    constants breaks the Huffman prefix property or the decode equality."""
    import tests.test_imagecodecs as tj
    from sql_based_etl_spark.operators import videocodecs as vc
    from sql_based_etl_spark.operators.imagecodecs import decode_image_bytes

    monkeypatch.setattr(tj, "_JPEG_DC_BITS", vc._K_DC_LUMA[0])
    monkeypatch.setattr(tj, "_JPEG_DC_VALS", bytes(vc._K_DC_LUMA[1]))
    monkeypatch.setattr(tj, "_JPEG_AC_BITS", vc._K_AC_LUMA[0])
    monkeypatch.setattr(tj, "_JPEG_AC_VALS", bytes(vc._K_AC_LUMA[1]))
    w, h = 16, 16
    full = tj.encode_jpeg(tj._rng_pixels(h, w, 3, seed=11))
    bare = _strip_dht(full)
    assert b"\xff\xc4" not in bare[: bare.find(b"\xff\xda")]
    avi = vc.encode_avi_mjpeg([bare], w, h)
    _, frames = decode_avi_frames(avi)
    assert np.array_equal(frames[0][1], decode_image_bytes(full)[1])


def test_mjpeg_geometry_lie_fails_loud():
    from tests.test_imagecodecs import _rng_pixels, encode_jpeg

    from sql_based_etl_spark.operators.videocodecs import encode_avi_mjpeg

    j = encode_jpeg(_rng_pixels(8, 16, 3, seed=4))
    avi = encode_avi_mjpeg([j], 32, 8)  # strf promises the wrong width
    with pytest.raises(VideoDecodeError, match="strf promises"):
        decode_avi_frames(avi)
