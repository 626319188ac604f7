"""Pure-stdlib WAV (RIFF/PCM) codec for the multimodal pipeline.

Companion to :mod:`.imagecodecs` — the audio half of the codec gap.
WAV is decodable from its public specification (the RIFF container
layout and the WAVEFORMAT ``fmt `` chunk) with nothing beyond
``struct`` + numpy: integer PCM at 8 (unsigned), 16, 24 and 32 bits
and IEEE float32, mono or multichannel. Compressed codecs (ADPCM,
MP3-in-WAV, …) are genuinely external and stay honest
``NotImplementedError`` integration points, exactly like JPEG on the
image side.

These functions run INSIDE the Arrow ``mapInPandas`` batch path
(multimodal.decode_audio): bytes in, (rate/channels/frames, integer
sample statistics) out — samples never leave the executor, matching
the digests-only-to-driver posture of the rest of the multimodal
stack.

Format reference: the RIFF/WAVE container layout (chunk id + LE size,
word-aligned chunk padding) and the ``fmt `` fields (wFormatTag 1 =
integer PCM / 3 = IEEE float, nChannels, nSamplesPerSec,
wBitsPerSample), all public documents.
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
    fmt_chunk: tuple[int, int, int, int] | None = None
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
            tag, n_ch, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            fmt_chunk = (tag, n_ch, rate, bits)
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
    tag, n_ch, rate, bits = fmt_chunk
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
    else:
        raise NotImplementedError(
            f"WAV format tag {tag} (compressed codecs are external)"
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
