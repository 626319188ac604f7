"""Pure-stdlib FLAC codec — the lossless leg of the audio decode lane
(``audiocodecs.py`` handles RIFF/WAVE PCM + ADPCM).

Decoder (:func:`decode_flac_bytes`): the full mandatory surface of the
public FLAC format — STREAMINFO parsing, frame headers (all block-size
/ sample-rate / sample-size codes, UTF-8-coded frame numbers, CRC-8),
all four subframe types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC
orders 1-32 with quantized coefficients), both Rice residual methods
(4- and 5-bit parameters, escape-to-raw partitions, partition orders),
wasted-bits shifts, all four channel assignments (independent,
left/side, right/side, mid/side), frame CRC-16, and the STREAMINFO
MD5 check over the decoded PCM — a decoder that reconstructs even one
sample wrongly fails the container's own integrity hash.

Encoder (:func:`encode_flac_bytes`): an independent writer (bit-level
composition, shares nothing with the decoder) producing real
compressed streams — fixed predictors chosen per block by residual
magnitude, Rice parameters chosen per partition, optional
verbatim/constant subframes and left/side / mid/side stereo — so
round-trip tests exercise every decode path against ground-truth PCM.

Format reference: the public FLAC format spec (RFC 9639 /
xiph.org/flac/format.html). No code consulted or copied.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacDecodeError(ValueError):
    """Malformed, truncated, or integrity-failing FLAC stream."""


# --- CRCs (FLAC's polynomials: CRC-8 x^8+x^2+x+1, CRC-16 CCITT x^16+x^15+x^2+1)


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        table.append(r & mask)
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16[(r >> 8) ^ b]
    return r


# --- bit reader ----------------------------------------------------------


class _Bits:
    __slots__ = ("d", "pos")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.d = data
        self.pos = byte_pos * 8

    def read(self, n: int) -> int:
        d, pos = self.d, self.pos
        end = pos + n
        if end > len(d) * 8:
            raise FlacDecodeError("truncated FLAC stream (bit read past end)")
        v = int.from_bytes(d[pos >> 3: (end + 7) >> 3], "big")
        v >>= (-end) % 8
        self.pos = end
        return v & ((1 << n) - 1)

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        d = self.d
        n = 0
        pos = self.pos
        total = len(d) * 8
        while True:
            if pos >= total:
                raise FlacDecodeError("truncated FLAC stream (unary run)")
            byte = d[pos >> 3]
            rem = 8 - (pos & 7)
            chunk = byte & ((1 << rem) - 1)
            if chunk == 0:
                n += rem
                pos += rem
                continue
            lead = rem - chunk.bit_length()
            n += lead
            pos += lead + 1
            self.pos = pos
            return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bytepos(self) -> int:
        return self.pos >> 3


# --- decoder -------------------------------------------------------------

_BLOCKSIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
              8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
              13: 8192, 14: 16384, 15: 32768}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BITS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def sniff_flac(data: bytes) -> bool:
    return len(data) >= 4 and data[:4] == b"fLaC"


def _read_utf8_number(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise FlacDecodeError(f"invalid UTF-8-coded frame number lead {b0:#x}")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise FlacDecodeError("invalid UTF-8-coded frame number tail")
        v = (v << 6) | (c & 0x3F)
    return v


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method not in (0, 1):
        raise FlacDecodeError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    parts = 1 << porder
    if blocksize % parts or (blocksize >> porder) < order:
        raise FlacDecodeError(
            f"rice partition order {porder} incompatible with blocksize "
            f"{blocksize} / predictor order {order}"
        )
    out: list[int] = []
    for p in range(parts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            if raw == 0:
                out.extend(0 for _ in range(count))
            else:
                out.extend(bits.sread(raw) for _ in range(count))
            continue
        for _ in range(count):
            q = bits.unary()
            u = (q << param) | bits.read(param) if param else q
            out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise FlacDecodeError("subframe padding bit set")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        bps -= wasted
    if ftype == 0:                       # CONSTANT
        v = bits.sread(bps)
        samples = [v] * blocksize
    elif ftype == 1:                     # VERBATIM
        samples = [bits.sread(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:               # FIXED, order 0-4
        order = ftype - 8
        samples = [bits.sread(bps) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(r + pred)
    elif ftype >= 32:                    # LPC, order 1-32
        order = (ftype & 0x1F) + 1
        samples = [bits.sread(bps) for _ in range(order)]
        prec = bits.read(4)
        if prec == 0xF:
            raise FlacDecodeError("invalid LPC coefficient precision 15")
        prec += 1
        shift = bits.sread(5)
        if shift < 0:
            raise FlacDecodeError("negative LPC shift")
        coefs = [bits.sread(prec) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        for r in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs)) >> shift
            samples.append(r + pred)
    else:
        raise FlacDecodeError(f"reserved subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac_bytes(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a FLAC stream to ``(sample_rate, int32 array of shape
    (frames, channels))``. Verifies frame-header CRC-8, frame CRC-16,
    the sample count against STREAMINFO, and the decoded PCM against
    STREAMINFO's MD5 — any mismatch raises :class:`FlacDecodeError`."""
    if not sniff_flac(data):
        raise FlacDecodeError("not a FLAC stream (no fLaC marker)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise FlacDecodeError("truncated FLAC metadata")
        head = int.from_bytes(data[pos:pos + 4], "big")
        last, btype, blen = head >> 31, (head >> 24) & 0x7F, head & 0xFFFFFF
        body = data[pos + 4: pos + 4 + blen]
        if len(body) < blen:
            raise FlacDecodeError("truncated FLAC metadata block")
        if btype == 0:
            if blen < 34:
                raise FlacDecodeError(f"STREAMINFO too short ({blen} bytes)")
            b = _Bits(body)
            b.read(16), b.read(16)        # min/max blocksize
            b.read(24), b.read(24)        # min/max framesize
            rate = b.read(20)
            n_ch = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            md5 = body[18:34]
            info = (rate, n_ch, bps, total, md5)
        elif btype == 127:
            raise FlacDecodeError("invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise FlacDecodeError("FLAC stream without STREAMINFO")
    rate, n_ch, bps, total, md5 = info
    if rate == 0:
        raise FlacDecodeError("STREAMINFO sample rate 0")

    channels: list[list[int]] = [[] for _ in range(n_ch)]
    while pos < len(data):
        frame_start = pos
        bits = _Bits(data, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise FlacDecodeError(
                f"lost frame sync at byte {pos} (got {sync:#x})")
        bits.read(1)                      # reserved
        bits.read(1)                      # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)                      # reserved
        _read_utf8_number(bits)
        if bs_code == 0:
            raise FlacDecodeError("reserved block size code 0")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE[bs_code]
        if sr_code == 0:
            pass                          # STREAMINFO rate
        elif sr_code in _RATES:
            if _RATES[sr_code] != rate:
                raise FlacDecodeError("frame sample rate differs from STREAMINFO")
        elif sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        else:
            raise FlacDecodeError("invalid frame sample rate code 15")
        if ss_code == 0:
            f_bps = bps
        elif ss_code in _BITS:
            f_bps = _BITS[ss_code]
            if f_bps != bps:
                raise FlacDecodeError("frame bit depth differs from STREAMINFO")
        else:
            raise FlacDecodeError(f"reserved sample size code {ss_code}")
        header_end = bits.bytepos()
        crc8 = bits.read(8)
        if _crc8(data[frame_start:header_end]) != crc8:
            raise FlacDecodeError(f"frame header CRC-8 mismatch at {frame_start}")

        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise FlacDecodeError("frame channel count differs from STREAMINFO")
            subs = [_decode_subframe(bits, blocksize, f_bps)
                    for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise FlacDecodeError("stereo decorrelation in non-stereo stream")
            # the difference channel carries one extra bit
            if ch_code == 8:              # left/side
                left = _decode_subframe(bits, blocksize, f_bps)
                side = _decode_subframe(bits, blocksize, f_bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:            # right/side
                side = _decode_subframe(bits, blocksize, f_bps + 1)
                right = _decode_subframe(bits, blocksize, f_bps)
                subs = [[s + r for s, r in zip(side, right)], right]
            else:                         # mid/side
                mid = _decode_subframe(bits, blocksize, f_bps)
                side = _decode_subframe(bits, blocksize, f_bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    subs[0].append((m2 + s) >> 1)
                    subs[1].append((m2 - s) >> 1)
        else:
            raise FlacDecodeError(f"reserved channel assignment {ch_code}")

        bits.align()
        crc_end = bits.bytepos()
        crc16 = bits.read(16)
        if _crc16(data[frame_start:crc_end]) != crc16:
            raise FlacDecodeError(f"frame CRC-16 mismatch at {frame_start}")
        pos = bits.bytepos()
        for ch, s in zip(channels, subs):
            ch.extend(s)

    frames = len(channels[0])
    if total and frames != total:
        raise FlacDecodeError(
            f"STREAMINFO promises {total} samples, frames hold {frames}")
    out = np.array(channels, dtype=np.int64).T.copy()
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if out.size and (out.min() < lo or out.max() > hi):
        raise FlacDecodeError(f"decoded sample outside {bps}-bit range")
    if md5 != b"\x00" * 16:
        if _pcm_md5(out, bps) != md5:
            raise FlacDecodeError(
                "decoded PCM fails the STREAMINFO MD5 integrity check")
    return rate, out.astype(np.int32)


def _pcm_md5(samples: np.ndarray, bps: int) -> bytes:
    """FLAC's MD5: interleaved little-endian PCM at ceil(bps/8) bytes."""
    nbytes = (bps + 7) // 8
    flat = samples.reshape(-1)
    buf = bytearray()
    mask = (1 << (8 * nbytes)) - 1
    for v in flat.tolist():
        buf += (v & mask).to_bytes(nbytes, "little")
    return hashlib.md5(bytes(buf)).digest()


# --- encoder (independent of the decoder; for round-trip tests) ----------


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _rice_write(w: _BitWriter, resid: list[int], param: int) -> None:
    for r in resid:
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1
        q = u >> param
        w.write(0, q)
        w.write(1, 1)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _best_rice_param(resid: list[int]) -> int:
    if not resid:
        return 0
    mean = sum(abs(r) for r in resid) / len(resid)
    p = 0
    while (1 << p) < mean + 1 and p < 14:
        p += 1
    return p


def _write_residual(w: _BitWriter, resid: list[int], blocksize: int,
                    order: int, porder: int, escape: bool,
                    raw_bits: int) -> None:
    w.write(0, 2)                         # rice method 0 (4-bit params)
    w.write(porder, 4)
    off = 0
    for p in range(1 << porder):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        part = resid[off:off + count]
        off += count
        if escape:
            w.write(0xF, 4)
            w.write(raw_bits, 5)
            for r in part:
                w.write(r, raw_bits)
            continue
        param = _best_rice_param(part)
        w.write(param, 4)
        _rice_write(w, part, param)


def _encode_subframe(w: _BitWriter, s: list[int], bps: int,
                     force: str | None, porder: int = 0) -> None:
    blocksize = len(s)
    if force == "verbatim":
        w.write(0, 1), w.write(1, 6), w.write(0, 1)
        for v in s:
            w.write(v, bps)
        return
    if len(set(s)) == 1 and force in (None, "constant"):
        w.write(0, 1), w.write(0, 6), w.write(0, 1)
        w.write(s[0], bps)
        return
    # wasted bits: factor out trailing zero bits common to every sample
    wasted = 0
    if any(s):
        ors = 0
        for v in s:
            ors |= v
        wasted = (ors & -ors).bit_length() - 1
    if wasted:
        s = [v >> wasted for v in s]
        bps -= wasted
    if porder and blocksize % (1 << porder):
        porder = 0
    if force == "lpc":
        # the fixed order-2 polynomial written in LPC clothing — exact,
        # and it drives the decoder's precision/shift/coef reader
        order, coefs, shift, prec = 2, [2, -1], 0, 3
        resid = [
            s[i] - ((coefs[0] * s[i - 1] + coefs[1] * s[i - 2]) >> shift)
            for i in range(order, blocksize)
        ]
        w.write(0, 1), w.write(0x20 | (order - 1), 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.write(1, wasted)            # unary(wasted-1) then the 1
        for v in s[:order]:
            w.write(v, bps)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(c, prec)
        _write_residual(w, resid, blocksize, order, porder,
                        force == "escape", 0)
        return
    # fixed predictor: pick the order (0-2) with the smallest |residual| sum
    best_order, best_resid, best_cost = 0, list(s), sum(abs(v) for v in s)
    for order in (1, 2):
        if blocksize <= order:
            break
        coefs = _FIXED_COEFS[order]
        resid = [
            s[i] - sum(c * s[i - j - 1] for j, c in enumerate(coefs))
            for i in range(order, blocksize)
        ]
        cost = sum(abs(r) for r in resid)
        if cost < best_cost:
            best_order, best_resid, best_cost = order, resid, cost
    order = best_order
    resid = best_resid
    w.write(0, 1), w.write(8 + order, 6)
    w.write(1 if wasted else 0, 1)
    if wasted:
        w.write(1, wasted)                # unary coding of wasted-1
    for v in s[:order]:
        w.write(v, bps)
    raw_bits = max((abs(r).bit_length() + 1 for r in resid), default=1)
    _write_residual(w, resid, blocksize, order, porder,
                    force == "escape", min(raw_bits, 31))


def encode_flac_bytes(samples: np.ndarray, sample_rate: int,
                      bps: int = 16, block_size: int = 4096,
                      force: str | None = None,
                      stereo: str | None = None,
                      partition_order: int = 0) -> bytes:
    """Encode ``(frames, channels)`` integer PCM as a real FLAC stream.

    ``force``: None (constant where possible, else best fixed
    predictor), ``'verbatim'``, ``'constant'``, ``'lpc'`` (the order-2
    polynomial in LPC clothing — exact, drives the coefficient reader),
    or ``'escape'`` (raw-bits escape partitions). ``stereo``: None
    (independent channels), ``'left-side'`` or ``'mid-side'`` (2-channel
    input only). ``partition_order``: Rice partition order to write
    when the block size divides evenly — every knob exists to exercise
    a decoder path against ground-truth PCM."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, n_ch = samples.shape
    if stereo and n_ch != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")

    body = bytearray()
    num = 0
    for start in range(0, frames, block_size):
        block = samples[start:start + block_size]
        bs = len(block)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)                     # reserved
        w.write(0, 1)                     # fixed blocksize strategy
        w.write(7, 4)                     # blocksize: 16-bit field below
        w.write(0, 4)                     # sample rate: STREAMINFO
        if stereo == "left-side":
            w.write(8, 4)
        elif stereo == "mid-side":
            w.write(10, 4)
        else:
            w.write(n_ch - 1, 4)
        w.write(0, 3)                     # sample size: STREAMINFO
        w.write(0, 1)                     # reserved
        # UTF-8 coded frame number (fits one byte for <128 frames,
        # two-byte form after)
        if num < 0x80:
            w.write(num, 8)
        else:
            w.write(0xC0 | (num >> 6), 8)
            w.write(0x80 | (num & 0x3F), 8)
        w.write(bs - 1, 16)
        # header fields above are whole bytes by construction
        hdr_bytes = bytes(w.buf)
        w.write(_crc8(hdr_bytes), 8)
        if stereo == "left-side":
            left = block[:, 0].tolist()
            side = (block[:, 0] - block[:, 1]).tolist()
            _encode_subframe(w, left, bps, force, partition_order)
            _encode_subframe(w, side, bps + 1, force, partition_order)
        elif stereo == "mid-side":
            mid = ((block[:, 0] + block[:, 1]) >> 1).tolist()
            side = (block[:, 0] - block[:, 1]).tolist()
            _encode_subframe(w, mid, bps, force, partition_order)
            _encode_subframe(w, side, bps + 1, force, partition_order)
        else:
            for c in range(n_ch):
                _encode_subframe(w, block[:, c].tolist(), bps, force,
                                 partition_order)
        w.align()
        frame_bytes = bytes(w.buf)
        w.write(_crc16(frame_bytes), 16)
        body += w.bytes()
        num += 1

    si = _BitWriter()
    si.write(min(block_size, max(frames, 16)), 16)   # min blocksize
    si.write(block_size, 16)                          # max blocksize
    si.write(0, 24), si.write(0, 24)                  # min/max framesize
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(frames, 36)
    streaminfo = si.bytes() + _pcm_md5(samples, bps)
    header = b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") \
        + streaminfo
    return header + bytes(body)
