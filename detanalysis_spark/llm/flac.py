"""FLAC codec — stdlib + numpy only (no libFLAC / soundfile).

Decoder covers the baseline FLAC stream feature set (the format is
published as RFC 9639 / the xiph.org spec): STREAMINFO + skipped
metadata blocks, frames with UTF-8-coded frame numbers, CONSTANT /
VERBATIM / FIXED(0-4) / LPC subframes, partitioned Rice residuals
(4- and 5-bit parameter variants with raw-bits escape), wasted-bits
shifts, all four stereo decorrelation modes (independent, left/side,
right/side, mid/side), 8/16/24-bit samples, and CRC-8 / CRC-16
verification.

The encoder exists for tests/fixtures (16-bit): per-block, per-channel
subframe choice of CONSTANT (constant blocks), VERBATIM, or FIXED
order-2 with single-partition Rice residuals; optional mid/side
decorrelation so the decoder's stereo reconstruction paths are
exercised by round-trip tests. Compression ratio is a non-goal.

Reference parity: none — the reference has no audio path; this backs
the multimodal pillar's compressed-audio payloads. Public knowledge
only (RFC 9639).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac"]

_MAGIC = b"fLaC"

_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
               4: [4, -6, 4, -1]}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            b = (self.data[self.byte] >> (7 - self.bit)) & 1
            v = (v << 1) | b
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _utf8_number(r: _BitReader) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number."""
    b0 = r.bits(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (r.bits(8) & 0x3F)
    return v


def _read_residual(r: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = r.bits(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.bits(4)
    nparts = 1 << porder
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        param = r.bits(pbits)
        if param == escape:
            raw = r.bits(5)
            for i in range(n):
                out[idx] = r.sbits(raw) if raw else 0
                idx += 1
        else:
            for i in range(n):
                q = r.unary()
                v = (q << param) | r.bits(param)
                out[idx] = (v >> 1) ^ -(v & 1)       # unzigzag
                idx += 1
    return out


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.bits(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = r.bits(6)
    wasted = 0
    if r.bits(1):
        wasted = 1 + r.unary()
        bps -= wasted
    if stype == 0:                                   # CONSTANT
        out = np.full(blocksize, r.sbits(bps), dtype=np.int64)
    elif stype == 1:                                 # VERBATIM
        out = np.array([r.sbits(bps) for _ in range(blocksize)],
                       dtype=np.int64)
    elif 8 <= stype <= 12:                           # FIXED
        order = stype - 8
        warm = [r.sbits(bps) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coef = _FIXED_COEF[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coef):
                pred += c * out[i - 1 - j]
            out[i] = pred + res[i - order]
    elif stype >= 32:                                # LPC
        order = stype - 31
        warm = [r.sbits(bps) for _ in range(order)]
        prec = r.bits(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid qlp precision")
        shift = r.sbits(5)
        coef = [r.sbits(prec) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coef[j] * out[i - 1 - j]
            out[i] = (pred >> shift) + res[i - order]
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    return out << wasted if wasted else out


_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC payload → (float64 (n_samples, channels) in
    [-1, 1], sample_rate)."""
    if data[:4] != _MAGIC:
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    try:
        return _decode_flac(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"FLAC: truncated or corrupt payload ({e})")


def _decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    pos = 4
    rate = nch = bps = total = None
    while True:
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\0" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + blen]
        if btype == 0:                               # STREAMINFO
            r = _BitReader(body)
            r.bits(16); r.bits(16)                   # min/max blocksize
            r.bits(24); r.bits(24)                   # min/max framesize
            rate = r.bits(20)
            nch = r.bits(3) + 1
            bps = r.bits(5) + 1
            total = r.bits(36)
        pos += 4 + blen
        if last:
            break
    if rate is None:
        raise ValueError("FLAC: missing STREAMINFO")
    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    n_read = 0
    while pos < len(data) and (total == 0 or n_read < total):
        frame_start = pos
        r = _BitReader(data, pos)
        sync = r.bits(14)
        if sync != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        r.bits(1)                                    # reserved
        r.bits(1)                                    # blocking strategy
        bs_code = r.bits(4)
        sr_code = r.bits(4)
        ch_code = r.bits(4)
        ss_code = r.bits(3)
        r.bits(1)                                    # reserved
        _utf8_number(r)
        if bs_code == 6:
            blocksize = r.bits(8) + 1
        elif bs_code == 7:
            blocksize = r.bits(16) + 1
        elif bs_code in _BLOCKSIZE_CODES:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        else:                                        # code 0 is reserved
            raise ValueError(
                f"FLAC: reserved blocksize code {bs_code} in frame header")
        if sr_code == 12:
            r.bits(8)
        elif sr_code in (13, 14):
            r.bits(16)
        r.align()
        hdr_bytes = data[frame_start:r.byte]
        crc8 = data[r.byte]
        if _crc8(hdr_bytes) != crc8:
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        r.byte += 1
        if ss_code == 0:                 # "get from STREAMINFO"
            frame_bps = bps
        elif ss_code in _SAMPLE_SIZE_CODES:
            frame_bps = _SAMPLE_SIZE_CODES[ss_code]
        else:                            # code 3 is reserved
            raise ValueError(
                f"FLAC: reserved sample-size code {ss_code} in frame header")
        if ch_code < 8:
            subs = [_read_subframe(r, blocksize, frame_bps)
                    for _ in range(ch_code + 1)]
        elif ch_code == 8:                           # left/side
            left = _read_subframe(r, blocksize, frame_bps)
            side = _read_subframe(r, blocksize, frame_bps + 1)
            subs = [left, left - side]
        elif ch_code == 9:                           # right/side
            side = _read_subframe(r, blocksize, frame_bps + 1)
            right = _read_subframe(r, blocksize, frame_bps)
            subs = [right + side, right]
        elif ch_code == 10:                          # mid/side
            mid = _read_subframe(r, blocksize, frame_bps)
            side = _read_subframe(r, blocksize, frame_bps + 1)
            # spec: mid = (l+r)>>1 (floor), side = l-r; the dropped
            # low bit of (l+r) equals side's low bit
            left = ((mid << 1) + (side & 1) + side) >> 1
            subs = [left, left - side]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        r.align()
        if _crc16(data[frame_start:r.byte]) != \
                struct.unpack(">H", data[r.byte:r.byte + 2])[0]:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        r.byte += 2
        pos = r.byte
        for c in range(nch):
            chans[c].append(subs[c])
        n_read += blocksize
    if not chans[0]:                                 # zero-sample stream
        return np.zeros((0, nch)), rate
    sig = np.stack([np.concatenate(c) for c in chans], axis=1)
    if total:
        sig = sig[:total]
    return sig / float(1 << (bps - 1)), rate


# ----------------------------------------------------------------------
# encoder (tests/fixtures; 16-bit)
# ----------------------------------------------------------------------
def _write_utf8_number(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    # enough for frame numbers in tests (up to 2^11)
    w.write(0xC0 | (v >> 6), 8)
    w.write(0x80 | (v & 0x3F), 8)


def _rice_param(res: np.ndarray) -> int:
    mean = float(np.mean(np.abs(res))) if res.size else 0.0
    p = 0
    while (1 << p) < mean and p < 14:
        p += 1
    return p


def _write_residual(w: _BitWriter, res: np.ndarray) -> None:
    w.write(0, 2)                                    # 4-bit rice
    w.write(0, 4)                                    # partition order 0
    param = _rice_param(res)
    w.write(param, 4)
    for v in res:
        z = (int(v) << 1) ^ (int(v) >> 63)           # zigzag
        w.unary(z >> param)
        if param:
            w.write(z & ((1 << param) - 1), param)


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int,
                    mode: str) -> None:
    if np.all(x == x[0]):
        w.write(0, 1); w.write(0, 6); w.write(0, 1)  # CONSTANT
        w.write(int(x[0]), bps)
        return
    if mode == "fixed" and x.size > 2:
        w.write(0, 1); w.write(10, 6); w.write(0, 1)  # FIXED order 2
        w.write(int(x[0]), bps)
        w.write(int(x[1]), bps)
        res = x[2:] - (2 * x[1:-1] - x[:-2])
        _write_residual(w, res)
        return
    w.write(0, 1); w.write(1, 6); w.write(0, 1)      # VERBATIM
    for v in x:
        w.write(int(v), bps)


def encode_flac(x: np.ndarray, sample_rate: int, mode: str = "fixed",
                mid_side: bool = False, blocksize: int = 4096) -> bytes:
    """Encode float [-1, 1] (n_samples,) or (n_samples, channels) →
    FLAC bytes (16-bit). ``mode``: "fixed" (order-2 predictor + Rice)
    or "verbatim"; constant blocks always use CONSTANT subframes.
    ``mid_side=True`` (stereo only) writes mid/side frames to exercise
    the decoder's stereo decorrelation."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    elif x.shape[0] < x.shape[1] and x.size:
        x = x.T
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int64)
    n, nch = pcm.shape
    if mid_side and nch != 2:
        raise ValueError("mid_side needs stereo input")
    bps = 16

    info = _BitWriter()
    info.write(blocksize, 16); info.write(blocksize, 16)
    info.write(0, 24); info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(nch - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    info.out += bytes(16)                            # md5 unset
    out = bytearray(_MAGIC)
    out += bytes([0x80]) + struct.pack(">I", len(info.out))[1:]
    out += info.out

    for fi, start in enumerate(range(0, n, blocksize)):
        blk = pcm[start:start + blocksize]
        bs = blk.shape[0]
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1); w.write(0, 1)
        w.write(7, 4)                                # 16-bit blocksize-1
        w.write(0, 4)                                # rate from streaminfo
        ch_code = 10 if mid_side else nch - 1
        w.write(ch_code, 4)
        w.write(4, 3)                                # 16 bps
        w.write(0, 1)
        _write_utf8_number(w, fi)
        w.write(bs - 1, 16)
        w.align()
        hdr = bytes(w.out)
        body = _BitWriter()
        if mid_side:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            _write_subframe(body, mid, bps, mode)
            _write_subframe(body, side, bps + 1, mode)
        else:
            for c in range(nch):
                _write_subframe(body, blk[:, c], bps, mode)
        body.align()
        frame = hdr + bytes([_crc8(hdr)]) + bytes(body.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)
