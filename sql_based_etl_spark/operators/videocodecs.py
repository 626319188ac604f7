"""Pure-stdlib AVI (RIFF) video container codec — the video leg of the
multimodal decode lane (images: ``imagecodecs.py``, audio:
``audiocodecs.py``).

Covers the uncompressed path end-to-end: a writer
(:func:`encode_avi_bytes`) that builds a spec-shaped AVI — ``hdrl``
(``avih`` + ``strl`` with ``strh``/``strf``), ``movi`` with ``00db``
DIB frames, and an ``idx1`` index — and a reader
(:func:`decode_avi_frames`) that walks the RIFF tree, validates the
headers, and returns frames as RGB numpy arrays. Compressed streams
(``biCompression != 0``: MJPEG, cinepak, …) and bit depths other than
24 stay honest ``NotImplementedError`` integration points — the
*container* logic (the scale-relevant plumbing: chunk walking, frame
sampling, geometry) is real either way.

Reference parity: the reference treats video as opaque binary with
typed metadata; frame sampling there shells out to an external decoder.
Here the uncompressed-DIB decode is native so the Spark-side plumbing
(mapInPandas batch shape, per-frame rows, exact integer statistics) is
testable without ffmpeg in the container.
"""

from __future__ import annotations

import struct

import numpy as np


class VideoDecodeError(ValueError):
    """Malformed or truncated video container."""


def sniff_video(data: bytes) -> str:
    """'avi' for a RIFF/AVI payload, 'unknown' otherwise."""
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    return "unknown"


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) over a RIFF chunk
    run; chunk payloads are word-aligned (odd sizes carry a pad byte)."""
    off = start
    while off + 8 <= end:
        fcc = data[off:off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        body = off + 8
        if body + size > end:
            raise VideoDecodeError(
                f"RIFF chunk {fcc!r} at {off} overruns its parent "
                f"(size {size}, parent ends at {end})"
            )
        yield fcc, body, size
        off = body + size + (size & 1)


def _find_list(data: bytes, start: int, end: int, list_type: bytes):
    for fcc, body, size in _chunks(data, start, end):
        if fcc == b"LIST" and data[body:body + 4] == list_type:
            return body + 4, body + size
    return None


def decode_avi_frames(data: bytes, every_n: int = 1) -> tuple[float, list]:
    """Decode an uncompressed AVI: ``(fps, [(frame_idx, rgb_array)])``
    for every ``every_n``-th video frame, each frame a ``(h, w, 3)``
    uint8 RGB array.

    Fail-loud contract matching the image/audio codecs: truncated or
    malformed containers raise :class:`VideoDecodeError` naming the
    defect; compressed streams (``biCompression != 0``) and non-24-bit
    DIBs raise ``NotImplementedError`` naming the format, never a
    silently-wrong frame."""
    if sniff_video(data) != "avi":
        raise VideoDecodeError("not a RIFF/AVI container")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))

    hdrl = _find_list(data, 12, end, b"hdrl")
    if hdrl is None:
        raise VideoDecodeError("AVI without an hdrl header list")
    h_start, h_end = hdrl

    avih = None
    for fcc, body, size in _chunks(data, h_start, h_end):
        if fcc == b"avih":
            if size < 40:
                raise VideoDecodeError(f"avih too short ({size} bytes)")
            avih = struct.unpack_from("<10I", data, body)
            break
    if avih is None:
        raise VideoDecodeError("AVI hdrl without an avih main header")
    total_frames = avih[4]

    # first video stream: its 0-based position among ALL streams is the
    # two-digit prefix of its movi chunk ids ('00db' for stream 0)
    stream_no = -1
    fps = 0.0
    w = h = None
    pos = h_start
    n_seen = 0
    while True:
        nxt = _find_list(data, pos, h_end, b"strl")
        if nxt is None:
            break
        s_start, s_end = nxt
        strh = strf = None
        for fcc, body, size in _chunks(data, s_start, s_end):
            if fcc == b"strh":
                strh = (data[body:body + 4], body, size)
            elif fcc == b"strf":
                strf = (body, size)
        if strh is not None and strh[0] == b"vids":
            stream_no = n_seen
            _, body, size = strh
            if size < 40:
                raise VideoDecodeError(f"strh too short ({size} bytes)")
            scale, rate = struct.unpack_from("<II", data, body + 20)
            if scale:
                fps = rate / scale
            if strf is None:
                raise VideoDecodeError("vids stream without a strf format")
            fb, fsize = strf
            if fsize < 40:
                raise VideoDecodeError(f"BITMAPINFOHEADER too short ({fsize})")
            (_bi_size, w, h, _planes, bitcount, compression) = \
                struct.unpack_from("<IiiHHI", data, fb)
            if compression != 0:
                fourcc = struct.pack("<I", compression)
                raise NotImplementedError(
                    "AVI compressed video stream "
                    f"(biCompression {fourcc!r}) needs an external codec; "
                    "only uncompressed BI_RGB decodes natively"
                )
            if bitcount != 24:
                raise NotImplementedError(
                    f"AVI DIB at {bitcount} bpp; only 24-bit BI_RGB "
                    "decodes natively"
                )
            break
        n_seen += 1
        pos = s_end  # scan resumes after this strl
    if stream_no < 0:
        raise VideoDecodeError("AVI without a video ('vids') stream")

    movi = _find_list(data, 12, end, b"movi")
    if movi is None:
        raise VideoDecodeError("AVI without a movi data list")
    m_start, m_end = movi

    prefix = b"%02d" % stream_no
    bottom_up = h > 0
    height = abs(h)
    stride = (w * 3 + 3) & ~3
    frames = []
    idx = 0
    for fcc, body, size in _chunks(data, m_start, m_end):
        if not (fcc[:2] == prefix and fcc[2:4] in (b"db", b"dc")):
            continue
        if idx % every_n == 0:
            if size < stride * height:
                raise VideoDecodeError(
                    f"frame {idx} chunk holds {size} bytes, "
                    f"DIB geometry needs {stride * height}"
                )
            rows = np.frombuffer(
                data, dtype=np.uint8, count=stride * height, offset=body
            ).reshape(height, stride)[:, : w * 3].reshape(height, w, 3)
            if bottom_up:
                rows = rows[::-1]
            frames.append((idx, rows[..., ::-1].copy()))  # BGR → RGB
        idx += 1
    if total_frames and idx != total_frames:
        raise VideoDecodeError(
            f"avih promises {total_frames} frames, movi holds {idx}"
        )
    return fps, frames


def encode_avi_bytes(frames: np.ndarray, fps: int = 10) -> bytes:
    """Build an uncompressed AVI from ``frames`` — ``(n, h, w, 3)``
    uint8 RGB — with a single BI_RGB 24-bit video stream: RIFF('AVI ')
    → LIST hdrl (avih + LIST strl(strh 'vids' + strf BITMAPINFOHEADER))
    → LIST movi ('00db' bottom-up BGR DIB frames, rows padded to 4
    bytes) → idx1. Independent of the decoder (struct-composed, like
    ``encode_wav_bytes``), so round-trip tests prove both sides."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"frames must be (n, h, w, 3) uint8, got {frames.shape}")
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3

    def chunk(fcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    frame_size = stride * h
    avih = struct.pack(
        "<10I16x",
        1_000_000 // fps,            # dwMicroSecPerFrame
        frame_size * fps,            # dwMaxBytesPerSec
        0,                           # dwPaddingGranularity
        0x10,                        # AVIF_HASINDEX
        n, 0, 1, frame_size,         # totalFrames, initial, streams, bufSize
        w, h,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"\x00\x00\x00\x00", 0, 0, 0, 0,
        1, fps,                      # dwScale, dwRate → fps
        0, n, frame_size, 0xFFFFFFFF, 0,
        0, 0, w, h,                  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl",
               chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    dib_frames = []
    for f in frames:
        bgr = f[::-1, :, ::-1]       # bottom-up rows, BGR channel order
        if stride == w * 3:
            rows = bgr.reshape(h, w * 3)
        else:
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, : w * 3] = bgr.reshape(h, w * 3)
        dib_frames.append(rows.tobytes())

    movi_payload = b"".join(chunk(b"00db", d) for d in dib_frames)
    movi = lst(b"movi", movi_payload)

    idx_entries = []
    off = 4                          # offsets count from the 'movi' fourcc
    for d in dib_frames:
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, len(d)))
        off += 8 + len(d) + (len(d) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
