"""Pure-stdlib RIFF/WAVE codec (operators/audiocodecs.py): hand-built
containers per the public spec — every supported bit depth, channel
layout, chunk padding — plus the fail-loud contract for malformed and
genuinely-external formats, and the Arrow ``decode_audio`` plumbing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sql_based_etl_spark.operators.audiocodecs import (
    AudioDecodeError,
    decode_wav_bytes,
    encode_wav_bytes,
    sniff_audio,
)


def _wav(payload: bytes, tag: int = 1, n_ch: int = 1, rate: int = 8000,
         bits: int = 16, extra_chunks: list[tuple[bytes, bytes]] | None = None,
         ) -> bytes:
    """Hand-built RIFF/WAVE, independent of encode_wav_bytes."""
    block = max(1, n_ch * bits // 8)
    chunks = [(b"fmt ", struct.pack("<HHIIHH", tag, n_ch, rate,
                                    rate * block, block, bits))]
    chunks += extra_chunks or []
    chunks.append((b"data", payload))
    body = b""
    for cid, c in chunks:
        body += cid + struct.pack("<I", len(c)) + c
        if len(c) & 1:
            body += b"\x00"  # RIFF word alignment
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_pcm16_mono_roundtrip():
    s = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    rate, out = decode_wav_bytes(_wav(s.astype("<i2").tobytes()))
    assert rate == 8000
    assert out.shape == (5, 1)
    assert out[:, 0].tolist() == s.tolist()


def test_pcm16_stereo_interleave():
    # interleaved L R L R: frame rows must be (L, R)
    s = np.array([1, -1, 2, -2], dtype="<i2")
    _, out = decode_wav_bytes(_wav(s.tobytes(), n_ch=2))
    assert out.tolist() == [[1, -1], [2, -2]]


def test_pcm8_unsigned_recentered():
    _, out = decode_wav_bytes(_wav(bytes([0, 128, 255]), bits=8))
    assert out[:, 0].tolist() == [-128, 0, 127]


def test_pcm24_sign_extension():
    vals = [0, 1, -1, (1 << 23) - 1, -(1 << 23)]
    payload = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    _, out = decode_wav_bytes(_wav(payload, bits=24))
    assert out[:, 0].tolist() == vals


def test_pcm32_and_float32():
    ints = np.array([2**31 - 1, -(2**31), 7], dtype="<i4")
    _, out = decode_wav_bytes(_wav(ints.tobytes(), bits=32))
    assert out[:, 0].tolist() == ints.tolist()
    fl = np.array([0.5, -1.25, 3.0], dtype="<f4")
    _, outf = decode_wav_bytes(_wav(fl.tobytes(), tag=3, bits=32))
    assert outf.dtype == np.float32
    assert outf[:, 0].tolist() == fl.tolist()


def test_odd_sized_chunk_padding_is_skipped():
    # a 3-byte LIST chunk before data forces the word-alignment pad path
    s = np.array([5, 6], dtype="<i2")
    raw = _wav(s.tobytes(), extra_chunks=[(b"LIST", b"abc")])
    _, out = decode_wav_bytes(raw)
    assert out[:, 0].tolist() == [5, 6]


def test_encode_wav_bytes_is_decodable_and_canonical():
    s = np.array([[1, -2], [3, -4]], dtype=np.int16)
    raw = encode_wav_bytes(s, 16000)
    assert sniff_audio(raw) == "wav"
    rate, out = decode_wav_bytes(raw)
    assert rate == 16000
    assert out.tolist() == s.tolist()
    with pytest.raises(AudioDecodeError, match="int16 range"):
        encode_wav_bytes(np.array([40000]), 8000)


def test_fail_loud_contract():
    with pytest.raises(NotImplementedError, match="external codec"):
        decode_wav_bytes(b"fLaC" + b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="format tag"):
        decode_wav_bytes(_wav(b"\x00\x00", tag=2))  # ADPCM
    with pytest.raises(NotImplementedError, match="IEEE-float"):
        decode_wav_bytes(_wav(b"\x00" * 8, tag=3, bits=64))
    with pytest.raises(AudioDecodeError, match="no data chunk"):
        raw = _wav(b"")
        decode_wav_bytes(raw[: raw.index(b"data")])
    with pytest.raises(AudioDecodeError, match="multiple of 2 channels"):
        decode_wav_bytes(_wav(b"\x00\x00", n_ch=2))
    with pytest.raises(AudioDecodeError, match="multiple of 3"):
        decode_wav_bytes(_wav(b"\x00" * 4, bits=24))


def test_decode_audio_arrow_path(spark):
    """The mapInPandas plumbing end-to-end: synthesize per-id WAVs,
    decode, and pin the stats against an independent numpy replay."""
    from sql_based_etl_spark.operators.multimodal import decode_audio, synth_wav

    ids = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    got = {r["doc_id"]: r for r in decode_audio(synth_wav(ids)).collect()}
    for d in range(7):
        n_ch = 1 + d % 2
        frames = 64 + d % 191
        i = np.arange(frames)[:, None]
        c = np.arange(n_ch)[None, :]
        s = ((d * 31 + i * 17 + c * 7) % 2001) - 1000
        r = got[d]
        assert (r["sample_rate"], r["n_channels"], r["n_frames"]) == (
            8000, n_ch, frames)
        assert r["duration_us"] == frames * 1_000_000 // 8000
        assert r["peak"] == int(np.abs(s).max())
        assert r["sum_abs"] == int(np.abs(s).sum())


def test_wav_roundtrip_property():
    """Property: any int16 (frames, channels) block round-trips through
    encode_wav_bytes → decode_wav_bytes bit-exactly. Pure-python."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=1, max_value=40),   # frames
        st.integers(min_value=1, max_value=4),    # channels
        st.integers(min_value=1000, max_value=96000),  # rate
        st.randoms(use_true_random=False),
    )
    def check(frames, n_ch, rate, rnd):
        s = np.array(
            [[rnd.randint(-32768, 32767) for _ in range(n_ch)]
             for _ in range(frames)], dtype=np.int16)
        got_rate, out = decode_wav_bytes(encode_wav_bytes(s, rate))
        assert got_rate == rate
        assert out.tolist() == s.tolist()

    check()


def test_truncated_fmt_and_misaligned_payloads_fail_as_decode_errors():
    # file ends mid-fmt: declared size 16 but fewer body bytes present
    raw = _wav(b"")
    cut = raw[:raw.index(b"fmt ") + 12]
    with pytest.raises(AudioDecodeError, match="fmt chunk too short"):
        decode_wav_bytes(cut)
    # payload length not a multiple of the sample size — AudioDecodeError,
    # never a bare numpy/struct error escaping the documented contract
    with pytest.raises(AudioDecodeError, match="not a multiple"):
        decode_wav_bytes(_wav(b"\x00", bits=16))
    with pytest.raises(AudioDecodeError, match="not a multiple"):
        decode_wav_bytes(_wav(b"\x00\x00\x00", tag=3, bits=32))


def test_decode_audio_rejects_float_wav(spark):
    """Integer statistics must never be silently computed from
    truncated float samples (multimodal.py:decode_audio)."""
    from sql_based_etl_spark.operators.multimodal import decode_audio

    fl = np.array([0.5, -0.25], dtype="<f4")
    raw = _wav(fl.tobytes(), tag=3, bits=32)
    df = spark.createDataFrame([(1, bytearray(raw))],
                               "doc_id long, payload binary")
    with pytest.raises(Exception, match="integer sample statistics"):
        decode_audio(df).collect()
