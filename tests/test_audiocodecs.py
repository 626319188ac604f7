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
        decode_wav_bytes(_wav(b"\x00\x00", tag=85))  # MP3-in-WAV
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


# --- IMA/DVI ADPCM (format tag 0x11) -------------------------------------
#
# Test-side ENCODER written forward from the public reference
# algorithm: the standard quantizer tracks the decoder's reconstruction
# internally, so the decoder's output must equal the encoder's internal
# reference EXACTLY (integer equality), with the original signal only
# approximated (4-bit residual).

_T_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_T_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_encode_nibble(sample, pred, index):
    step = _T_STEPS[index]
    diff = sample - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    if diff >= step:
        nib |= 4
        diff -= step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nib |= 1
    # reconstruct exactly as the decoder will
    d = step >> 3
    if nib & 1:
        d += step >> 2
    if nib & 2:
        d += step >> 1
    if nib & 4:
        d += step
    if nib & 8:
        d = -d
    pred = max(-32768, min(32767, pred + d))
    index = max(0, min(88, index + _T_INDEX[nib & 7]))
    return nib, pred, index


def encode_ima_adpcm_wav(samples: np.ndarray, rate: int,
                         block_align: int) -> tuple[bytes, np.ndarray]:
    """Encode (frames, channels) int16 as an IMA ADPCM WAV; returns
    (bytes, reference) where reference is the decoder-exact
    reconstruction."""
    frames, n_ch = samples.shape
    spb = (block_align - 4 * n_ch) * 2 // n_ch + 1
    assert frames % spb == 0, "test fixture must fill whole blocks"
    data = bytearray()
    ref = np.zeros_like(samples, dtype=np.int32)
    idxs = [0] * n_ch
    for b0 in range(0, frames, spb):
        preds = [int(samples[b0, c]) for c in range(n_ch)]
        for c in range(n_ch):
            data += struct.pack("<hBB", preds[c], idxs[c], 0)
            ref[b0, c] = preds[c]
        nibbles = [[] for _ in range(n_ch)]
        for s in range(1, spb):
            for c in range(n_ch):
                nib, preds[c], idxs[c] = _ima_encode_nibble(
                    int(samples[b0 + s, c]), preds[c], idxs[c])
                nibbles[c].append(nib)
                ref[b0 + s, c] = preds[c]
        n_words = (spb - 1 + 7) // 8
        for w in range(n_words):
            for c in range(n_ch):
                grp = nibbles[c][w * 8:w * 8 + 8] + [0] * 8
                for k in range(0, 8, 2):
                    data += bytes([grp[k] | (grp[k + 1] << 4)])
    block = block_align
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 4 + 8 + 20 + 8 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHHHH", 20, 0x11, n_ch, rate,
                             rate * block // spb, block, 4, 2, spb),
        b"data", struct.pack("<I", len(data)),
    ])
    return hdr + bytes(data), ref


def test_ima_adpcm_mono_decoder_matches_reference_exactly():
    rng = np.random.RandomState(5)
    # 2 blocks of 505 samples at block_align 256 (mono)
    spb = (256 - 4) * 2 + 1
    t = np.arange(2 * spb)
    sig = (8000 * np.sin(t / 9.0) + rng.randint(-500, 500, t.size)).astype(
        np.int16)[:, None]
    raw, ref = encode_ima_adpcm_wav(sig, 8000, 256)
    rate, got = decode_wav_bytes(raw)
    assert rate == 8000
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)  # bit-exact vs the state machine
    # and a faithful approximation of the original (4-bit residual)
    err = np.abs(got.astype(np.int64) - sig.astype(np.int64))
    assert np.median(err) < 256


def test_ima_adpcm_stereo_interleave_exact():
    rng = np.random.RandomState(6)
    spb = (128 - 8) * 2 // 2 + 1  # block_align 128, 2 channels
    n = 3 * spb
    sig = np.stack([
        (6000 * np.sin(np.arange(n) / 7.0)).astype(np.int16),
        rng.randint(-2000, 2000, n).astype(np.int16),
    ], axis=1)
    raw, ref = encode_ima_adpcm_wav(sig, 16000, 128)
    rate, got = decode_wav_bytes(raw)
    assert rate == 16000 and got.shape == (n, 2)
    assert np.array_equal(got, ref)


def test_ima_adpcm_fail_loud():
    sig = np.zeros(((256 - 4) * 2 + 1, 1), dtype=np.int16)
    raw, _ = encode_ima_adpcm_wav(sig, 8000, 256)
    # truncated mid-block: not a multiple of nBlockAlign
    with pytest.raises(AudioDecodeError, match="nBlockAlign"):
        cut = bytearray(raw[:-10])
        at = cut.index(b"data")
        struct.pack_into("<I", cut, at + 4, len(cut) - at - 8)
        decode_wav_bytes(bytes(cut))
    # corrupt step index beyond 88 fails loudly
    bad = bytearray(raw)
    at = bad.index(b"data") + 8
    bad[at + 2] = 99  # step index byte of the first block header
    with pytest.raises(AudioDecodeError, match="step index"):
        decode_wav_bytes(bytes(bad))


# --- Microsoft ADPCM (format tag 0x0002) ----------------------------------

_MS_T_COEFS = [(256, 0), (512, -256), (0, 64), (192, 64),
               (240, 0), (460, -208), (392, -232)]
_MS_T_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
               768, 614, 512, 409, 307, 230, 230, 230]


def encode_ms_adpcm_wav(samples: np.ndarray, rate: int, block_align: int,
                        predictor: int = 0) -> tuple[bytes, np.ndarray]:
    """Spec-forward MS ADPCM encoder (quantize against the decoder's
    own reconstruction); returns (bytes, decoder-exact reference)."""
    frames, n_ch = samples.shape
    spb = (block_align - 7 * n_ch) * 2 // n_ch + 2
    assert frames % spb == 0, "test fixture must fill whole blocks"
    c1, c2 = _MS_T_COEFS[predictor]
    data = bytearray()
    ref = np.zeros_like(samples, dtype=np.int32)
    for b0 in range(0, frames, spb):
        s2 = [int(samples[b0, c]) for c in range(n_ch)]
        s1 = [int(samples[b0 + 1, c]) for c in range(n_ch)]
        deltas = [64] * n_ch
        data += bytes([predictor] * n_ch)
        for c in range(n_ch):
            data += struct.pack("<h", deltas[c])
        for c in range(n_ch):
            data += struct.pack("<h", s1[c])
        for c in range(n_ch):
            data += struct.pack("<h", s2[c])
        for c in range(n_ch):
            ref[b0, c] = s2[c]
            ref[b0 + 1, c] = s1[c]
        nibs: list[int] = []
        for s in range(2, spb):
            for c in range(n_ch):
                pred = (s1[c] * c1 + s2[c] * c2) >> 8
                err = int(samples[b0 + s, c]) - pred
                q = max(-8, min(7, int(round(err / deltas[c]))))
                nib = q & 0x0F
                new = max(-32768, min(32767, pred + q * deltas[c]))
                s2[c], s1[c] = s1[c], new
                deltas[c] = max(16, (_MS_T_ADAPT[nib] * deltas[c]) >> 8)
                ref[b0 + s, c] = new
                nibs.append(nib)
        for i in range(0, len(nibs), 2):
            data += bytes([(nibs[i] << 4) | nibs[i + 1]])  # high half first
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 4 + 8 + 18 + 8 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHHH", 18, 0x02, n_ch, rate,
                             rate, block_align, 4, 2),
        b"data", struct.pack("<I", len(data)),
    ])
    return hdr + bytes(data), ref


def test_ms_adpcm_mono_decoder_matches_reference_exactly():
    rng = np.random.RandomState(9)
    spb = (256 - 7) * 2 + 2  # 500 samples per 256-byte mono block
    t = np.arange(2 * spb)
    sig = (7000 * np.sin(t / 11.0) + rng.randint(-300, 300, t.size)).astype(
        np.int16)[:, None]
    raw, ref = encode_ms_adpcm_wav(sig, 8000, 256)
    rate, got = decode_wav_bytes(raw)
    assert rate == 8000 and got.shape == ref.shape
    assert np.array_equal(got, ref)
    err = np.abs(got.astype(np.int64) - sig.astype(np.int64))
    assert np.median(err) < 512


def test_ms_adpcm_stereo_and_predictors_exact():
    rng = np.random.RandomState(10)
    spb = (128 - 14) * 2 // 2 + 2  # 116 frames per 128-byte stereo block
    n = 2 * spb
    sig = np.stack([
        (5000 * np.sin(np.arange(n) / 5.0)).astype(np.int16),
        rng.randint(-3000, 3000, n).astype(np.int16),
    ], axis=1)
    for predictor in (0, 1, 4, 6):
        raw, ref = encode_ms_adpcm_wav(sig, 22050, 128, predictor=predictor)
        rate, got = decode_wav_bytes(raw)
        assert rate == 22050 and got.shape == (n, 2)
        assert np.array_equal(got, ref), predictor


def test_ms_adpcm_fail_loud():
    sig = np.zeros(((64 - 7) * 2 + 2, 1), dtype=np.int16)
    raw, _ = encode_ms_adpcm_wav(sig, 8000, 64)
    bad = bytearray(raw)
    at = bad.index(b"data") + 8
    bad[at] = 9  # predictor index out of range (valid: 0..6)
    with pytest.raises(AudioDecodeError, match="predictor index"):
        decode_wav_bytes(bytes(bad))
    cut = bytearray(raw[:-5])
    at = cut.index(b"data")
    struct.pack_into("<I", cut, at + 4, len(cut) - at - 8)
    with pytest.raises(AudioDecodeError, match="nBlockAlign"):
        decode_wav_bytes(bytes(cut))


# --- MP3 / OGG container parsers (operators/audiocontainers.py) ----------


def test_mp3_frame_walk_round_trip():
    """Every (version, rate, bitrate, channel, padding, ID3) shape the
    synthesizer emits parses back to the exact analytic facts."""
    from sql_based_etl_spark.operators.audiocontainers import (
        _BITRATE_V1_L3,
        _BITRATE_V2_L3,
        _RATES,
        parse_mp3_frames,
        synth_mp3_bytes,
    )

    for ver, table in ((3, _BITRATE_V1_L3), (2, _BITRATE_V2_L3)):
        for ri in range(3):
            for bi in (1, 8, 14):
                for mono in (True, False):
                    data = synth_mp3_bytes(4, ver, bi, ri, mono, id3_junk=19)
                    r = parse_mp3_frames(data)
                    rate = _RATES[ver][ri]
                    samples = 1152 if ver == 3 else 576
                    assert r["n_frames"] == 4
                    assert r["sample_rate"] == rate
                    assert r["channels"] == (1 if mono else 2)
                    assert r["bitrate_kbps_sum"] == 4 * table[bi]
                    assert r["duration_micros"] == (
                        4 * samples * 1_000_000 // rate)


def test_mp3_fail_loud_edges():
    """Bad sync, reserved indexes, truncation, mid-stream fact changes
    and non-syncsafe ID3 lengths all raise naming the problem."""
    import pytest

    from sql_based_etl_spark.operators.audiocodecs import AudioDecodeError
    from sql_based_etl_spark.operators.audiocontainers import (
        parse_mp3_frames,
        synth_mp3_bytes,
    )

    good = synth_mp3_bytes(3, 3, 5, 0, False)
    b = bytearray(good)
    b[0] = 0
    with pytest.raises(AudioDecodeError, match="sync"):
        parse_mp3_frames(bytes(b))
    with pytest.raises(AudioDecodeError, match="claims"):
        parse_mp3_frames(good[:-3])  # truncated final frame
    # mid-stream rate change = corruption, not VBR
    other = synth_mp3_bytes(1, 3, 5, 1, False)
    with pytest.raises(AudioDecodeError, match="changed mid-file"):
        parse_mp3_frames(good + other)
    # VBR (bitrate index change only) is legal
    vbr = synth_mp3_bytes(2, 3, 5, 0, False) + synth_mp3_bytes(2, 3, 9, 0, False)
    assert parse_mp3_frames(vbr)["n_frames"] == 4
    with pytest.raises(AudioDecodeError, match="syncsafe"):
        parse_mp3_frames(b"ID3\x04\x00\x00\xff\xff\xff\xff" + good)


def test_ogg_page_walk_round_trip_and_crc():
    """Pages round-trip with the spec CRC verified; the final granule
    drives the duration; payload corruption and sequence jumps raise."""
    import pytest

    from sql_based_etl_spark.operators.audiocodecs import AudioDecodeError
    from sql_based_etl_spark.operators.audiocontainers import (
        _ogg_crc,
        parse_ogg_vorbis,
        synth_ogg_vorbis_bytes,
    )

    data = synth_ogg_vorbis_bytes(2, 44100, 160000, [700, 1400, 99999])
    r = parse_ogg_vorbis(data)
    assert (r["channels"], r["sample_rate"], r["bitrate_nominal"]) == (
        2, 44100, 160000)
    assert r["n_pages"] == 4 and r["last_granule"] == 99999
    assert r["duration_micros"] == 99999 * 1_000_000 // 44100
    assert r["payload_bytes"] == (64 + 0) + (64 + 16) + (64 + 32)
    assert _ogg_crc(b"") == 0
    b = bytearray(data)
    b[-1] ^= 0x55
    with pytest.raises(AudioDecodeError, match="CRC"):
        parse_ogg_vorbis(bytes(b))
    # a large payload exercises multi-lacing (255-byte runs)
    big = synth_ogg_vorbis_bytes(1, 8000, 64000, [123],
                                 page_payload_len=lambda p: 700)
    r2 = parse_ogg_vorbis(big)
    assert r2["payload_bytes"] == 700 and r2["n_pages"] == 2


def test_mp3_real_world_trailers_tolerated():
    """Corpus MP3s routinely end with metadata trailers — ID3v1 ('TAG',
    128 bytes), APE tags, trailing ID3v2, and ID3v2.4 footers on the
    leading tag. None may abort the frame walk; junk that is NOT a
    recognized trailer still fails loudly."""
    import pytest

    from sql_based_etl_spark.operators.audiocodecs import AudioDecodeError
    from sql_based_etl_spark.operators.audiocontainers import (
        parse_mp3_frames,
        synth_mp3_bytes,
    )

    good = synth_mp3_bytes(3, 3, 5, 0, False)
    id3v1 = b"TAG" + bytes(125)
    assert parse_mp3_frames(good + id3v1)["n_frames"] == 3
    # APE tag: 32-byte header, size covers body+footer (here 0+32)
    ape = (b"APETAGEX" + (2000).to_bytes(4, "little")
           + (32).to_bytes(4, "little") + (0).to_bytes(4, "little")
           + (0x80000000).to_bytes(4, "little") + bytes(8) + bytes(32))
    assert parse_mp3_frames(good + ape)["n_frames"] == 3
    assert parse_mp3_frames(good + ape + id3v1)["n_frames"] == 3
    # trailing ID3v2 (some taggers append instead of prepending)
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + bytes(20)
    assert parse_mp3_frames(good + id3v2)["n_frames"] == 3
    # leading ID3v2.4 WITH the footer flag: size excludes the footer
    lead = (b"ID3\x04\x00\x10" + bytes([0, 0, 0, 8]) + bytes(8)
            + b"3DI\x04\x00\x10" + bytes([0, 0, 0, 8]))
    assert parse_mp3_frames(lead + good)["n_frames"] == 3
    # unrecognized junk still fails loudly
    with pytest.raises(AudioDecodeError):
        parse_mp3_frames(good + b"\x00garbage-that-is-not-a-tag")


def test_ogg_vorbis_comment_header_round_trip():
    """Vorbis comment header (round-10 codec tail): vendor string +
    KEY=value comments round-trip through the page walker — keys
    upper-cased (spec case-insensitivity), repeats preserved in order,
    header pages never counted as payload, comment-less streams
    unchanged (vendor None / comments {}), and a corrupt framing bit or
    truncated vendor fails loudly."""
    import struct

    from sql_based_etl_spark.operators.audiocontainers import (
        _build_ogg_page,
        parse_ogg_vorbis,
        synth_ogg_vorbis_bytes,
    )

    plain = synth_ogg_vorbis_bytes(2, 44100, 128000, [1000, 2500])
    r = parse_ogg_vorbis(plain)
    assert r["vendor"] is None and r["comments"] == {}

    tagged = synth_ogg_vorbis_bytes(
        1, 22050, 64000, [500, 900],
        comments=[("TITLE", "Song A"), ("artist", "X"), ("ARTIST", "Y"),
                  ("date", "2024-01-02")],
        vendor="testvendor")
    r2 = parse_ogg_vorbis(tagged)
    assert r2["vendor"] == "testvendor"
    assert r2["comments"] == {
        "TITLE": ["Song A"], "ARTIST": ["X", "Y"], "DATE": ["2024-01-02"]}
    # header pages excluded from payload accounting
    assert r2["payload_bytes"] == (64 + 16 * 0) + (64 + 16 * 1)
    assert r2["duration_micros"] == 900 * 1_000_000 // 22050

    # corrupt framing bit: rebuild the comment page with trailing \x00
    ident = bytearray([1]) + b"vorbis" + struct.pack(
        "<IBIiii", 0, 1, 22050, 0, 64000, 0) + bytes([1 << 6, 1])
    bad_pkt = bytearray([3]) + b"vorbis"
    bad_pkt += (2).to_bytes(4, "little") + b"vv"
    bad_pkt += (0).to_bytes(4, "little")
    bad_pkt += b"\x00"  # framing bit UNSET
    serial = 0x5E551D01
    bad = (_build_ogg_page(2, 0, serial, 0, [bytes(ident)])
           + _build_ogg_page(4, 100, serial, 1, [bytes(bad_pkt)]))
    with pytest.raises(AudioDecodeError, match="framing bit"):
        parse_ogg_vorbis(bad)

    # truncated comment payload fails loudly, naming the piece
    trunc_pkt = bytearray([3]) + b"vorbis" + (99).to_bytes(4, "little")
    trunc = (_build_ogg_page(2, 0, serial, 0, [bytes(ident)])
             + _build_ogg_page(4, 100, serial, 1, [bytes(trunc_pkt)]))
    with pytest.raises(AudioDecodeError, match="vendor string"):
        parse_ogg_vorbis(trunc)


def test_ogg_setup_header_spanning_pages_not_counted_as_payload():
    """libvorbis-style framing (round-10 self-review fix): comment +
    setup headers share page 1, the setup header CONTINUES onto page 2
    (lacing ends at 255, next page flags continuation) — header bytes
    never count into payload_bytes, the comment still parses, and the
    first audio page starts the payload accounting."""
    import struct

    from sql_based_etl_spark.operators.audiocontainers import (
        _ogg_crc,
        parse_ogg_vorbis,
    )

    def page(htype, granule, serial, seq, laces, body):
        pg = bytearray(b"OggS") + struct.pack(
            "<BBqIII", 0, htype, granule, serial, seq, 0)
        pg.append(len(laces))
        pg += bytes(laces)
        pg += body
        pg[22:26] = struct.pack("<I", _ogg_crc(bytes(pg)))
        return bytes(pg)

    serial = 0x0BAD_F00D
    ident = (bytearray([1]) + b"vorbis"
             + struct.pack("<IBIiii", 0, 2, 44100, 0, 128000, 0)
             + bytes([1 << 6, 1]))
    comment = bytearray([3]) + b"vorbis"
    vb = b"libvorbis-ish"
    comment += len(vb).to_bytes(4, "little") + vb
    comment += (1).to_bytes(4, "little")
    c = b"TITLE=Spanning"
    comment += len(c).to_bytes(4, "little") + c + b"\x01"
    setup = bytes([5]) + b"vorbis" + bytes(603)   # 610 bytes total
    part1, part2 = setup[:510], setup[510:]

    audio = bytes((i * 7) % 256 for i in range(64))
    stream = (
        page(2, 0, serial, 0, [len(ident)], bytes(ident))
        # page 1: complete comment + first 510 bytes of setup
        # (laces: comment, then 255,255 — ends AT 255: continued)
        + page(0, 0, serial, 1, [len(comment), 255, 255],
               bytes(comment) + part1)
        # page 2: continuation flag, setup remainder
        + page(1, 0, serial, 2, [len(part2)], part2)
        # page 3: first audio page (fresh packet), eos
        + page(4, 4096, serial, 3, [len(audio)], audio)
    )
    r = parse_ogg_vorbis(stream)
    assert r["comments"] == {"TITLE": ["Spanning"]}
    assert r["vendor"] == "libvorbis-ish"
    assert r["payload_bytes"] == 64, r["payload_bytes"]
    assert r["n_pages"] == 4
    assert r["duration_micros"] == 4096 * 1_000_000 // 44100

    # an audio packet laced onto a header page is spec-illegal framing
    bad = (
        page(2, 0, serial, 0, [len(ident)], bytes(ident))
        + page(0, 0, serial, 1, [len(comment), len(audio)],
               bytes(comment) + audio)
    )
    with pytest.raises(AudioDecodeError, match="fresh page"):
        parse_ogg_vorbis(bad)


def test_ogg_comment_header_spanning_pages_reassembled():
    """A COMMENT header that spans pages (comments just over one page —
    real libvorbis output for art-heavy tags) must be REASSEMBLED from
    its fragments and parsed, not silently dropped (the pre-round-11
    walker returned vendor=None/comments={} for exactly this shape).
    Covers a 2-page span and a 3-page span (a whole middle page of
    fragment), plus an unfinished header followed by a non-continuation
    page still failing loudly."""
    import struct

    from sql_based_etl_spark.operators.audiocontainers import (
        _ogg_crc,
        parse_ogg_vorbis,
    )

    def page(htype, granule, serial, seq, laces, body):
        pg = bytearray(b"OggS") + struct.pack(
            "<BBqIII", 0, htype, granule, serial, seq, 0)
        pg.append(len(laces))
        pg += bytes(laces)
        pg += body
        pg[22:26] = struct.pack("<I", _ogg_crc(bytes(pg)))
        return bytes(pg)

    def comment_pkt(value: str) -> bytes:
        pkt = bytearray([3]) + b"vorbis"
        vb = b"vend"
        pkt += len(vb).to_bytes(4, "little") + vb
        pkt += (1).to_bytes(4, "little")
        c = f"TITLE={value}".encode()
        pkt += len(c).to_bytes(4, "little") + c + b"\x01"
        return bytes(pkt)

    serial = 0x51A2_B3C4
    ident = (bytearray([1]) + b"vorbis"
             + struct.pack("<IBIiii", 0, 2, 44100, 0, 128000, 0)
             + bytes([1 << 6, 1]))
    setup = bytes([5]) + b"vorbis" + bytes(40)
    audio = bytes((i * 3) % 256 for i in range(64))

    # -- 2-page span: fragment (510 B, laces end at 255) + remainder --
    pkt = comment_pkt("A" * 560)
    f1, f2 = pkt[:510], pkt[510:]
    stream = (
        page(2, 0, serial, 0, [len(ident)], bytes(ident))
        + page(0, 0, serial, 1, [255, 255], f1)
        + page(1, 0, serial, 2, [len(f2), len(setup)], f2 + setup)
        + page(4, 2048, serial, 3, [len(audio)], audio)
    )
    r = parse_ogg_vorbis(stream)
    assert r["vendor"] == "vend"
    assert r["comments"] == {"TITLE": ["A" * 560]}
    assert r["payload_bytes"] == 64
    assert r["n_pages"] == 4

    # -- 3-page span: a whole middle page is fragment ------------------
    pkt = comment_pkt("B" * 1100)
    f1, f2, f3 = pkt[:510], pkt[510:1020], pkt[1020:]
    stream3 = (
        page(2, 0, serial, 0, [len(ident)], bytes(ident))
        + page(0, 0, serial, 1, [255, 255], f1)
        + page(1, 0, serial, 2, [255, 255], f2)
        + page(1, 0, serial, 3, [len(f3), len(setup)], f3 + setup)
        + page(4, 4096, serial, 4, [len(audio)], audio)
    )
    r3 = parse_ogg_vorbis(stream3)
    assert r3["comments"] == {"TITLE": ["B" * 1100]}
    assert r3["payload_bytes"] == 64
    assert r3["n_pages"] == 5

    # -- unfinished header + non-continuation page: loud failure -------
    bad = (
        page(2, 0, serial, 0, [len(ident)], bytes(ident))
        + page(0, 0, serial, 1, [255, 255], f1)
        + page(4, 2048, serial, 2, [len(audio)], audio)  # no cont flag
    )
    with pytest.raises(AudioDecodeError, match="continuation"):
        parse_ogg_vorbis(bad)


def test_ogg_back_to_back_spanning_headers():
    """A page that COMPLETES one spanning header and immediately starts
    another spanning packet (comment span ends on page 2, setup span
    begins on the same page — the common album-art layout): the second
    span's fragments must carry over too, the comment still parses,
    and header bytes never leak into payload accounting."""
    import struct

    from sql_based_etl_spark.operators.audiocontainers import (
        _ogg_crc,
        parse_ogg_vorbis,
    )

    def page(htype, granule, serial, seq, laces, body):
        pg = bytearray(b"OggS") + struct.pack(
            "<BBqIII", 0, htype, granule, serial, seq, 0)
        pg.append(len(laces))
        pg += bytes(laces)
        pg += body
        pg[22:26] = struct.pack("<I", _ogg_crc(bytes(pg)))
        return bytes(pg)

    serial = 0x0B2B_0B2B
    ident = (bytearray([1]) + b"vorbis"
             + struct.pack("<IBIiii", 0, 2, 44100, 0, 128000, 0)
             + bytes([1 << 6, 1]))
    comment = bytearray([3]) + b"vorbis"
    vb = b"v2"
    comment += len(vb).to_bytes(4, "little") + vb
    comment += (1).to_bytes(4, "little")
    c = b"TITLE=" + b"Z" * 560
    comment += len(c).to_bytes(4, "little") + c + b"\x01"
    comment = bytes(comment)
    cf1, cf2 = comment[:510], comment[510:]
    setup = bytes([5]) + b"vorbis" + bytes(700)
    sf1, sf2 = setup[:255], setup[255:]
    audio = bytes((i * 11) % 256 for i in range(48))

    stream = (
        page(2, 0, serial, 0, [len(ident)], bytes(ident))
        # page 1: comment fragment only (laces end AT 255 → continued)
        + page(0, 0, serial, 1, [255, 255], cf1)
        # page 2: completes the comment AND starts the setup span
        + page(1, 0, serial, 2, [len(cf2), 255], cf2 + sf1)
        # page 3: completes the setup
        + page(1, 0, serial, 3, [255, len(sf2) - 255], sf2)
        # page 4: first audio page, eos
        + page(4, 4096, serial, 4, [len(audio)], audio)
    )
    r = parse_ogg_vorbis(stream)
    assert r["vendor"] == "v2"
    assert r["comments"] == {"TITLE": ["Z" * 560]}
    assert r["payload_bytes"] == 48, r["payload_bytes"]
    assert r["n_pages"] == 5
