"""FLAC codec: lossless round-trip exactness through every decode path
(the encoder is bit-composed independently of the decoder, so a pass
proves both sides), integrity enforcement (CRC-8/CRC-16/STREAMINFO MD5
— corruption anywhere fails loudly), and the honest external boundary
(ogg/mp3 still raise NotImplementedError through the routing decode).
Mirrors tests/test_audiocodecs.py for the PCM/ADPCM leg."""

from __future__ import annotations

import numpy as np
import pytest

from sql_based_etl_spark.operators.flaccodec import (
    FlacDecodeError,
    decode_flac_bytes,
    encode_flac_bytes,
    sniff_flac,
)


def _rt(s, rate=8000, **kw):
    data = encode_flac_bytes(s, rate, **kw)
    assert sniff_flac(data)
    r2, out = decode_flac_bytes(data)
    exp = np.asarray(s)
    if exp.ndim == 1:
        exp = exp[:, None]
    assert r2 == rate
    assert out.shape == exp.shape
    assert np.array_equal(out, exp)
    return data


def test_fixed_predictors_multiblock():
    rng = np.random.default_rng(1)
    _rt(rng.integers(-30000, 30000, size=5000, dtype=np.int64),
        block_size=1024)


def test_smooth_signal_compresses():
    t = np.arange(6000)
    s = (1000 * np.sin(t / 50)).astype(np.int64)
    data = _rt(s)
    assert len(data) < 6000 * 2 * 0.25  # order-2 predictor earns its keep


@pytest.mark.parametrize("force", [None, "verbatim", "lpc", "escape"])
def test_subframe_types(force):
    rng = np.random.default_rng(2)
    _rt(rng.integers(-5000, 5000, size=2048, dtype=np.int64), force=force)


def test_constant_subframe():
    _rt(np.full(300, 123, dtype=np.int64))


@pytest.mark.parametrize("stereo", [None, "left-side", "mid-side"])
def test_stereo_decorrelation(stereo):
    rng = np.random.default_rng(3)
    _rt(rng.integers(-2000, 2000, size=(900, 2), dtype=np.int64),
        stereo=stereo)


def test_wasted_bits_and_partitions():
    rng = np.random.default_rng(4)
    s = rng.integers(-7000, 7000, size=4096, dtype=np.int64)
    _rt(s * 4)                             # two wasted bits per sample
    _rt(s, partition_order=3)
    _rt(s, block_size=512, partition_order=2, force="lpc")


@pytest.mark.parametrize("bps,lim", [(8, 120), (16, 30000),
                                     (24, 8_000_000)])
def test_bit_depths(bps, lim):
    rng = np.random.default_rng(bps)
    _rt(rng.integers(-lim, lim, size=1000, dtype=np.int64), bps=bps)


def test_corruption_fails_loud():
    s = (500 * np.sin(np.arange(2000) / 30)).astype(np.int64)
    data = bytearray(encode_flac_bytes(s, 8000))
    data[len(data) // 2] ^= 0xFF
    with pytest.raises(FlacDecodeError):
        decode_flac_bytes(bytes(data))
    # STREAMINFO sample-count lie
    good = encode_flac_bytes(s, 8000)
    with pytest.raises(FlacDecodeError):
        decode_flac_bytes(good[: len(good) - 30])
    with pytest.raises(FlacDecodeError, match="fLaC"):
        decode_flac_bytes(b"RIFF....WAVE")


def test_md5_integrity_is_checked():
    """Flip one residual bit so the frame still parses structurally but
    the reconstructed PCM differs → the STREAMINFO MD5 (or a CRC on the
    way there) must catch it. Brute-force a byte position that passes
    neither check silently."""
    rng = np.random.default_rng(5)
    s = rng.integers(-100, 100, size=512, dtype=np.int64)
    data = bytearray(encode_flac_bytes(s, 8000, force="verbatim"))
    caught = 0
    for off in range(len(data) - 40, len(data) - 20):
        bad = bytearray(data)
        bad[off] ^= 0x01
        try:
            _, out = decode_flac_bytes(bytes(bad))
            assert np.array_equal(out[:, 0], s), "silent corruption"
        except (FlacDecodeError, NotImplementedError):
            caught += 1
    assert caught > 0


def test_routing_decode_audio_bytes():
    from sql_based_etl_spark.operators.audiocodecs import decode_audio_bytes

    s = np.arange(-50, 50, dtype=np.int64)
    rate, out = decode_audio_bytes(encode_flac_bytes(s, 16000))
    assert rate == 16000 and np.array_equal(out[:, 0], s)
    with pytest.raises(NotImplementedError, match="ogg"):
        decode_audio_bytes(b"OggS" + b"\x00" * 40)


def test_synth_flac_operator_matches_wav_law(spark):
    """The FLAC lane end-to-end: synth_flac → decode_audio equals
    synth_wav → decode_audio on the same ids (same PCM law, different
    container — lossless means identical stats and sample_md5)."""
    from sql_based_etl_spark.operators.multimodal import (
        decode_audio,
        synth_flac,
        synth_wav,
    )

    df = spark.createDataFrame([(i,) for i in [0, 1, 2, 5, 9]], "doc_id long")
    cols = ["doc_id", "sample_rate", "n_channels", "n_frames",
            "duration_us", "peak", "sum_abs", "sample_md5"]
    via_flac = {r.doc_id: tuple(r) for r in
                decode_audio(synth_flac(df)).select(*cols).collect()}
    via_wav = {r.doc_id: tuple(r) for r in
               decode_audio(synth_wav(df)).select(*cols).collect()}
    assert via_flac == via_wav
