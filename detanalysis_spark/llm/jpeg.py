"""Baseline-sequential JPEG (JFIF) codec — stdlib + numpy only.

Decodes SOF0 (baseline DCT, huffman, 8-bit) JPEGs: generic DQT/DHT
parsing, interleaved-MCU entropy decode with restart-marker support,
arbitrary per-component sampling factors (4:4:4 / 4:2:2 / 4:2:0
upsampled by replication), separable matrix IDCT, and JFIF YCbCr → RGB.
Progressive (SOF2), arithmetic-coded, and 12-bit streams are out of
scope and raise ``NotImplementedError`` — callers fall back to PIL for
those (`multimodal._decode`).

The encoder exists for tests/fixtures: 4:4:4 or 4:2:0, a single
quality-scaled quantization table pair, and *self-describing* canonical
Huffman tables (fixed-length codes emitted in the DHT segments), so the
decoder exercises its generic table parser rather than a baked-in
Annex-K copy. Compression ratio is a non-goal.

Reference parity: none — the reference
(`/root/reference/detanalysis/analyzer.py`) has no image path; this
backs the multimodal pillar's dominant real-world payload format.
Public knowledge only: ITU-T T.81 (the JPEG spec) and the JFIF
conventions.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63])

# orthonormal 8-point DCT-II basis: A[u, x] = a(u) cos((2x+1)u pi/16);
# forward coef = A @ block @ A.T, inverse block = A.T @ coef @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# standard luminance/chrominance quantization tables (T.81 Annex K.1,
# the only tables the spec itself publishes), natural order
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99]).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99]).reshape(8, 8)


# ----------------------------------------------------------------------
# decoder
# ----------------------------------------------------------------------
class _BitReader:
    """Entropy-coded-segment bit reader: 0xFF00 unstuffing, RSTn
    detection (byte-aligns and resets via ``restart``)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data, self.pos = data, pos
        self.acc, self.nbits = 0, 0

    def _fill(self) -> None:
        if self.pos + 1 >= len(self.data):
            raise ValueError("JPEG: truncated entropy-coded segment")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartPending()
            else:
                # EOI or another marker: the spec pads the final bits
                # with 1s; feed 1-bytes without consuming the marker
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume the RSTn marker and byte-align."""
        self.acc = self.nbits = 0
        # scan to the RSTn marker itself (not a stuffed 0xFF00 data
        # byte) and consume it
        d = self.data
        while not (d[self.pos] == 0xFF
                   and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartPending(Exception):
    pass


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """DHT → {(length, code): symbol} via canonical assignment
    (T.81 C.2): codes of each length are consecutive, doubling when the
    length increases."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid huffman code in scan")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential JPEG → float64 (H, W, C) in [0, 1]
    (C = 1 grayscale, 3 RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"JPEG: truncated or corrupt payload ({e})")


def _decode_jpeg(data: bytes) -> np.ndarray:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None          # (w, h, [(cid, hi, vi, tq)])
    restart_interval = 0
    scan = None           # ([(cid, td, ta)], data_pos)
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:          # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:          # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables")
                tbl = np.frombuffer(body[i + 1:i + 65], np.uint8)
                q = np.zeros(64)
                q[_ZIGZAG] = tbl
                qt[tq] = q.reshape(8, 8).astype(np.float64)
                i += 65
        elif marker == 0xC4:        # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = body[i + 17:i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _build_huffman(bits, vals)
                i += 17 + n
        elif marker == 0xC0:        # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            comps = []
            for k in range(nc):
                cid, hv, tq = body[6 + 3 * k:9 + 3 * k]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: only baseline SOF0 supported (got SOF{marker & 0x0F})")
        elif marker == 0xDD:        # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:        # SOS
            ns = body[0]
            sel = [(body[1 + 2 * k], body[2 + 2 * k] >> 4,
                    body[2 + 2 * k] & 0x0F) for k in range(ns)]
            scan = (sel, pos + 2 + seglen)
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG: missing SOF/SOS")
    w, h, comps = frame
    sel, data_pos = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {cid: np.zeros((mcuy * vi * 8, mcux * hi * 8))
              for cid, hi, vi, _tq in comps}
    comp_by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    tabs = {cid: (huff_dc[td], huff_ac[ta]) for cid, td, ta in sel}

    r = _BitReader(data, data_pos)
    pred = {cid: 0 for cid, _, _ in sel}
    n_mcu = mcux * mcuy
    mcu = 0
    while mcu < n_mcu:
        try:
            my, mx = divmod(mcu, mcux)
            for cid, _td, _ta in sel:
                hi, vi, tq = comp_by_id[cid]
                dc_t, ac_t = tabs[cid]
                for by in range(vi):
                    for bx in range(hi):
                        coef = np.zeros(64)
                        s = _huff_decode(r, dc_t)
                        diff = _extend(r.bits(s), s) if s else 0
                        pred[cid] += diff
                        coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_t)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:      # ZRL
                                    k += 16
                                    continue
                                break              # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            coef[k] = _extend(r.bits(size), size)
                            k += 1
                        block = coef[np.argsort(_ZIGZAG)]  # de-zigzag
                        dq = block.reshape(8, 8) * qt[tq]
                        px = _A.T @ dq @ _A + 128.0
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = px
            mcu += 1
            if restart_interval and mcu % restart_interval == 0 \
                    and mcu < n_mcu:
                r.restart()
                pred = {cid: 0 for cid in pred}
        except _RestartPending:
            # encoder emitted RSTn earlier than our count (defensive)
            r.restart()
            pred = {cid: 0 for cid in pred}
    out_planes = []
    for cid, hi, vi, _tq in comps:
        p = planes[cid]
        # replicate to full resolution, then crop
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        img = out_planes[0][:, :, None]
    elif len(out_planes) == 3:
        y, cb, cr = out_planes
        img = np.stack([
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0)], axis=2)
    else:
        raise NotImplementedError("JPEG: only 1- or 3-component frames")
    return np.clip(img, 0.0, 255.0) / 255.0


# ----------------------------------------------------------------------
# encoder (tests/fixtures)
# ----------------------------------------------------------------------
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)       # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _fixed_tables(symbols: list[int], length: int):
    """Canonical all-one-length Huffman table: (bits16, vals,
    {symbol: (code, length)}). Valid as long as
    ``len(symbols) < 2**length`` (the all-ones code stays unused)."""
    assert len(symbols) < (1 << length) - 0
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    enc = {sym: (i, length) for i, sym in enumerate(symbols)}
    return bits, bytes(symbols), enc


def _mag(v: int) -> tuple[int, int]:
    """(size, raw bits) for a DC diff / AC coefficient value."""
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    raw = v if v >= 0 else v + (1 << s) - 1
    return s, raw


def encode_jpeg(img: np.ndarray, quality: int = 75,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode (H, W, C) float [0, 1] (C = 1 or 3) → baseline JPEG.
    ``subsample=True`` writes 4:2:0 (exercises the decoder's
    upsampling path); otherwise 4:4:4. ``restart_interval`` > 0 emits a
    DRI segment and RSTn markers every that-many MCUs (exercises the
    decoder's restart path). Huffman tables are fixed-length canonical
    codes declared in the DHT segments."""
    arr = np.clip(np.asarray(img, dtype=np.float64), 0, 1) * 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg needs 1 or 3 channels")
    # quality scaling per the widely-published IJG formula
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    def q_scaled(base: np.ndarray) -> np.ndarray:
        q = np.floor((base * scale + 50) / 100)
        return np.clip(q, 1, 255)
    qtabs = [q_scaled(_Q_LUMA)] + ([q_scaled(_Q_CHROMA)] if nc == 3 else [])

    if nc == 3:
        y = (0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1]
             + 0.114 * arr[:, :, 2])
        cb = 128.0 + (arr[:, :, 2] - y) * 0.564
        cr = 128.0 + (arr[:, :, 0] - y) * 0.713
        chans = [y, cb, cr]
    else:
        chans = [arr[:, :, 0]]
        subsample = False
    sampling = [(2, 2), (1, 1), (1, 1)] if subsample else \
        [(1, 1)] * len(chans)
    hmax = max(s[0] for s in sampling[:len(chans)])
    vmax = max(s[1] for s in sampling[:len(chans)])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = []
    for ci, ch in enumerate(chans):
        hi, vi = sampling[ci]
        pw, ph = mcux * hi * 8, mcuy * vi * 8
        if (hi, vi) != (hmax, vmax):
            # box-average downsample by the sampling ratio
            fy, fx = vmax // vi, hmax // hi
            full_h, full_w = mcuy * vmax * 8, mcux * hmax * 8
            padded = np.pad(ch, ((0, full_h - h), (0, full_w - w)),
                            mode="edge")
            ch = padded.reshape(ph, fy, pw, fx).mean(axis=(1, 3))
        else:
            ch = np.pad(ch, ((0, ph - h), (0, pw - w)), mode="edge")
        planes.append(ch)

    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s
                              for r in range(16) for s in range(1, 11)]
    dc_bits, dc_vals, dc_enc = _fixed_tables(dc_syms, 5)
    ac_bits, ac_vals, ac_enc = _fixed_tables(ac_syms, 8)

    bw = _BitWriter()
    pred = [0] * len(chans)
    inv_zig = np.argsort(_ZIGZAG)  # zz[inv_zig] = natural -> zigzag order
    mcu_i = 0
    n_mcu = mcux * mcuy
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i < n_mcu \
                    and mcu_i % restart_interval == 0:
                bw.flush()                      # byte-align with 1-pad
                bw.out += bytes([0xFF, 0xD0 + (mcu_i // restart_interval
                                               - 1) % 8])
                pred = [0] * len(chans)
            mcu_i += 1
            for ci, plane in enumerate(planes):
                hi, vi = sampling[ci]
                q = qtabs[min(ci, 1)]
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        block = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = _A @ block @ _A.T
                        qc = np.round(coef / q).astype(int)
                        zz = np.zeros(64, dtype=int)
                        zz[inv_zig] = qc.ravel()
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        s, raw = _mag(diff)
                        bw.write(*dc_enc[s])
                        if s:
                            bw.write(raw, s)
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                bw.write(*ac_enc[0xF0])
                                run -= 16
                            s, raw = _mag(v)
                            bw.write(*ac_enc[(run << 4) | s])
                            bw.write(raw, s)
                            run = 0
                        if run:
                            bw.write(*ac_enc[0x00])
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtabs):
        zz = np.zeros(64, dtype=np.uint8)
        zz[inv_zig] = q.ravel().astype(np.uint8)
        out += seg(0xDB, bytes([ti]) + zz.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(chans))
    for ci in range(len(chans)):
        hi, vi = sampling[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, min(ci, 1)])
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    if len(chans) == 3:
        out += seg(0xC4, bytes([0x01]) + bytes(dc_bits) + dc_vals)
        out += seg(0xC4, bytes([0x11]) + bytes(ac_bits) + ac_vals)
    sos = bytes([len(chans)])
    for ci in range(len(chans)):
        td = ta = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (td << 4) | ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
