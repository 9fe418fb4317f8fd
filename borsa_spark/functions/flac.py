"""FLAC (Free Lossless Audio Codec) in pure Python + numpy — the
lossless half of "compressed audio", closing the audio stub for the one
compressed format whose decode can be verified EXACTLY (decode(encode(x))
== x bit-for-bit; rms over a FLAC equals rms over the WAV of the same
samples, which is f58's analytic oracle reused verbatim).

Decoder scope (public format spec): STREAMINFO + frames with CONSTANT /
VERBATIM / FIXED(0-4) subframes, rice-coded residuals (4- and 5-bit
parameter variants, escape-to-raw partitions), independent and
left-side / right-side / mid-side stereo decorrelation, wasted bits,
UTF-8-coded frame numbers, CRC-8 header check. LPC subframes (type
32-63) raise ValueError — the honest boundary: the fixture encoder
below never emits them, so a decode path with zero test coverage would
be a liability, and real-world LPC streams route to the documented
corrupt-fallback instead of risking silently wrong samples.

Encoder scope (fixtures): 16-bit mono/stereo, independent channels,
one rice partition per subframe, per-block best-of fixed orders 0-2
with CONSTANT detection — small, but it produces genuinely compressed,
spec-conformant streams (rice-coded fixed-predictor residuals), so the
decoder's arithmetic is exercised for real, not just pass-through.
"""

from __future__ import annotations

import struct

import numpy as np


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over a byte buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if v >= 1 << (n - 1):
            v -= 1 << n
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1

    def read_utf8_number(self) -> int:
        first = self.read(8)
        if first < 0x80:
            return first
        n = 0
        mask = 0x40
        while first & mask:
            n += 1
            mask >>= 1
        if n < 1 or n > 6:
            raise ValueError("invalid FLAC UTF-8 frame number")
        v = first & (mask - 1)
        for _ in range(n):
            c = self.read(8)
            if c & 0xC0 != 0x80:
                raise ValueError("invalid FLAC UTF-8 continuation")
            v = (v << 6) | (c & 0x3F)
        return v


_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_residuals(bits: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method not in (0, 1):
        raise ValueError("unsupported FLAC residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = bits.read(4)
    nparts = 1 << po
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        count = (blocksize >> po) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("invalid FLAC partition layout")
        param = bits.read(plen)
        if param == escape:
            nbits = bits.read(5)
            for _ in range(count):
                out[idx] = bits.read_signed(nbits) if nbits else 0
                idx += 1
        else:
            for _ in range(count):
                q = bits.read_unary()
                r = bits.read(param) if param else 0
                u = (q << param) | r
                out[idx] = (u >> 1) ^ -(u & 1)  # zigzag -> signed
                idx += 1
    return out


def _read_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1) != 0:
        raise ValueError("invalid FLAC subframe padding bit")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.read_unary()
    eff = bps - wasted
    if ftype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        samples = np.full(blocksize, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        samples = np.empty(blocksize, dtype=np.int64)
        for i in range(blocksize):
            samples[i] = bits.read_signed(eff)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        resid = _read_residuals(bits, blocksize, order)
        samples = np.empty(blocksize, dtype=np.int64)
        samples[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[i - 1 - j]
            samples[i] = pred + resid[i - order]
    elif ftype >= 32:
        raise ValueError("FLAC LPC subframes unsupported (fixture "
                         "encoder never emits them)")
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        samples <<= wasted
    return samples


def decode_flac(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a FLAC stream -> ((n_frames, channels) int32 samples,
    sample_rate, bits_per_sample). Exact — the format is lossless."""
    if len(data) < 8 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    sample_rate = None
    bps = None
    nchan = None
    total = None
    while pos + 4 <= len(data):
        hdr = data[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:  # STREAMINFO
            if blen != 34:
                raise ValueError("bad FLAC STREAMINFO length")
            b = _Bits(body)
            b.read(16)  # min blocksize
            b.read(16)  # max blocksize
            b.read(24)  # min frame size
            b.read(24)  # max frame size
            sample_rate = b.read(20)
            nchan = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
        pos += 4 + blen
        if last:
            break
    if sample_rate is None or not sample_rate:
        raise ValueError("FLAC missing STREAMINFO")

    chans: list[list[np.ndarray]] = [[] for _ in range(nchan)]
    got = 0
    while pos < len(data) and (total is None or got < total):
        bits = _Bits(data, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC frame sync lost")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        bits.read_utf8_number()
        if bs_code == 0:
            raise ValueError("reserved FLAC blocksize code")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        hdr_end = bits.byte + (1 if bits.bit else 0)
        crc_calc = _crc8(data[pos:hdr_end])
        crc_read = bits.read(8)
        if crc_calc != crc_read:
            raise ValueError("FLAC frame header CRC mismatch")
        if ss_code == 0:
            frame_bps = bps
        else:
            frame_bps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(
                ss_code
            )
            if frame_bps is None:
                raise ValueError("reserved FLAC sample size code")

        if ch_code < 8:
            n = ch_code + 1
            if n != nchan:
                raise ValueError("FLAC frame channel count mismatch")
            sub = [
                _read_subframe(bits, blocksize, frame_bps)
                for _ in range(n)
            ]
        elif ch_code == 8:  # left/side
            left = _read_subframe(bits, blocksize, frame_bps)
            side = _read_subframe(bits, blocksize, frame_bps + 1)
            sub = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _read_subframe(bits, blocksize, frame_bps + 1)
            right = _read_subframe(bits, blocksize, frame_bps)
            sub = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _read_subframe(bits, blocksize, frame_bps)
            side = _read_subframe(bits, blocksize, frame_bps + 1)
            m2 = (mid << 1) | (side & 1)
            sub = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("reserved FLAC channel assignment")
        bits.align()
        crc16_read = struct.unpack_from(">H", data, bits.byte)
        if _crc16(data[pos : bits.byte]) != crc16_read[0]:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = bits.byte + 2
        for c in range(nchan):
            chans[c].append(sub[c])
        got += blocksize

    if not chans[0]:
        raise ValueError("FLAC stream has no frames")
    out = np.stack(
        [np.concatenate(c) for c in chans], axis=1
    ).astype(np.int32)
    if total:
        out = out[:total]
    return out, sample_rate, bps


# ---------------------------------------------------------------------------
# Fixture encoder
# ---------------------------------------------------------------------------


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self.n:
            self.write(0, 1)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    # encoders may emit multi-byte for larger frame indices
    parts = []
    while n >= 0x40:
        parts.append(0x80 | (n & 0x3F))
        n >>= 6
    lead_len = len(parts) + 1
    lead = (0xFF00 >> lead_len) & 0xFF | n
    return bytes([lead] + list(reversed(parts)))


def _rice_cost(resid: np.ndarray, param: int) -> int:
    u = (np.abs(resid) << 1) - (resid < 0)
    return int(np.sum(u >> param)) + len(resid) * (param + 1)


def _write_residuals(bw: _BitW, resid: np.ndarray) -> None:
    best_p, best_c = 0, None
    for p in range(15):
        c = _rice_cost(resid, p)
        if best_c is None or c < best_c:
            best_p, best_c = p, c
    bw.write(0, 2)   # rice, 4-bit params
    bw.write(0, 4)   # partition order 0
    bw.write(best_p, 4)
    for v in resid:
        v = int(v)
        u = (abs(v) << 1) - (1 if v < 0 else 0)  # zigzag
        bw.write_unary(u >> best_p)
        if best_p:
            bw.write(u & ((1 << best_p) - 1), best_p)


def _write_subframe(bw: _BitW, samples: np.ndarray, bps: int) -> None:
    bw.write(0, 1)  # padding
    if np.all(samples == samples[0]):
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(samples[0]), bps)
        return
    best = None
    for order in (0, 1, 2):
        if len(samples) <= order:
            continue
        coefs = _FIXED_COEFS[order]
        resid = samples[order:].astype(np.int64).copy()
        for j, c in enumerate(coefs):
            resid -= c * samples[order - 1 - j : len(samples) - 1 - j]
        cost = min(_rice_cost(resid, p) for p in range(15))
        if best is None or cost < best[2]:
            best = (order, resid, cost)
    order, resid, _ = best
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)          # no wasted bits
    for i in range(order):
        bw.write_signed(int(samples[i]), bps)
    _write_residuals(bw, resid)


def encode_flac(
    samples: np.ndarray, sample_rate: int = 16_000, blocksize: int = 4096
) -> bytes:
    """int16-range samples (1-D mono or (frames, channels)) -> FLAC
    bytes: STREAMINFO + fixed-blocksize frames of independent CONSTANT/
    FIXED subframes with rice-coded residuals."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    total, nchan = arr.shape
    if not 1 <= nchan <= 8:
        raise ValueError("encode_flac supports 1-8 channels")
    bps = 16

    info = _BitW()
    info.write(blocksize, 16)
    info.write(blocksize, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(nchan - 1, 3)
    info.write(bps - 1, 5)
    info.write(total & ((1 << 36) - 1), 36)
    info_bits = bytes(info.out) + b"\x00" * 16  # md5 unset (all zero)

    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(info_bits))[1:]
    out += info_bits

    frame_idx = 0
    for start in range(0, total, blocksize):
        block = arr[start : start + blocksize]
        n = len(block)
        hdr = _BitW()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)   # reserved
        hdr.write(0, 1)   # fixed blocksize stream
        hdr.write(7, 4)   # blocksize: 16-bit field follows
        hdr.write(0, 4)   # sample rate: from STREAMINFO
        hdr.write(nchan - 1, 4)
        hdr.write(4, 3)   # 16 bps
        hdr.write(0, 1)
        hdr.align()
        header = bytes(hdr.out) + _utf8_number(frame_idx) + struct.pack(
            ">H", n - 1
        )
        header += bytes([_crc8(header)])

        body = _BitW()
        for c in range(nchan):
            _write_subframe(body, block[:, c], bps)
        body.align()
        frame = header + bytes(body.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_idx += 1
    return bytes(out)
