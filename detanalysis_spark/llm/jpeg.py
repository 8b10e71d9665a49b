"""JPEG (JFIF) codec — stdlib + numpy only.

Decodes baseline-sequential (SOF0) AND progressive (SOF2, T.81
Annex G) 8-bit huffman JPEGs: generic DQT/DHT parsing, interleaved-MCU
entropy decode with restart-marker support, arbitrary per-component
sampling factors (4:4:4 / 4:2:2 / 4:2:0 upsampled by replication),
multi-scan progressive state (DC first/refinement, per-component AC
spectral-selection bands with EOB-run coding, successive-approximation
AC refinement with correction bits), separable matrix IDCT, and JFIF
YCbCr → RGB. Arithmetic-coded, 12-bit, lossless, and hierarchical
streams are out of scope and raise ``NotImplementedError`` — callers
fall back to PIL for those (`multimodal._decode`).

The encoder exists for tests/fixtures: 4:4:4 or 4:2:0, baseline or a
real progressive scan script (DC successive approximation + AC
spectral bands + AC refinement), a single quality-scaled quantization
table pair, and *self-describing* canonical Huffman tables
(fixed-length codes emitted in the DHT segments), so the decoder
exercises its generic table parser rather than a baked-in Annex-K
copy. Both paths quantize identically, so progressive and baseline
decodes of the same image must agree bit-for-bit — the codec's
round-trip oracle. Compression ratio is a non-goal.

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
        if self.pos >= len(self.data):
            raise ValueError("JPEG: truncated entropy-coded segment")
        b = self.data[self.pos]
        if b == 0xFF:
            # only the marker peek needs a second byte; a plain entropy
            # byte at EOF (stream without EOI) is still valid
            if self.pos + 1 >= len(self.data):
                raise ValueError("JPEG: truncated entropy-coded segment")
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
    frame = None          # (w, h, [(cid, hi, vi, tq)], progressive)
    restart_interval = 0
    geom = None           # set lazily after SOF
    coefs: dict[int, np.ndarray] = {}   # cid -> (bh_pad, bw_pad, 64) zigzag
    saw_scan = False
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
        elif marker in (0xC0, 0xC2):    # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            comps = []
            for k in range(nc):
                cid, hv, tq = body[6 + 3 * k:9 + 3 * k]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps, marker == 0xC2)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: only SOF0/SOF2 supported (got SOF{marker & 0x0F})")
        elif marker == 0xDD:        # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:        # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            w, h, comps, progressive = frame
            if geom is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                geom = (hmax, vmax, mcux, mcuy)
                for cid, hi, vi, _tq in comps:
                    coefs[cid] = np.zeros(
                        (mcuy * vi, mcux * hi, 64), dtype=np.int64)
            ns = body[0]
            sel = [(body[1 + 2 * k], body[2 + 2 * k] >> 4,
                    body[2 + 2 * k] & 0x0F) for k in range(ns)]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            approx = body[3 + 2 * ns]
            ah, al = approx >> 4, approx & 0x0F
            r = _BitReader(data, pos + 2 + seglen)
            _decode_scan(r, sel, ss, se, ah, al, progressive, frame,
                         geom, coefs, huff_dc, huff_ac,
                         restart_interval)
            saw_scan = True
            pos = r.pos
            continue
        pos += 2 + seglen
    if frame is None or not saw_scan:
        raise ValueError("JPEG: missing SOF/SOS")
    w, h, comps, _prog = frame
    hmax, vmax, mcux, mcuy = geom
    inv_zig = np.argsort(_ZIGZAG)
    out_planes = []
    for cid, hi, vi, tq in comps:
        bh, bw = coefs[cid].shape[:2]
        # de-zigzag + dequantize + IDCT the whole component at once
        blocks = coefs[cid][:, :, inv_zig].astype(np.float64) \
            .reshape(bh, bw, 8, 8) * qt[tq]
        px = np.einsum("ux,bcuv,vy->bcxy", _A, blocks, _A) + 128.0
        p = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
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


def _decode_scan(r, sel, ss, se, ah, al, progressive, frame, geom,
                 coefs, huff_dc, huff_ac, restart_interval) -> None:
    """One entropy-coded scan into the zigzag coefficient arrays.

    Baseline: the single full-band interleaved scan. Progressive
    (T.81 Annex G): DC scans are interleaved (first pass codes the
    point-transformed diffs, refinement one bit per block); AC scans
    are single-component over the component's OWN block grid, first
    pass with EOB-run coding, refinement with correction bits."""
    w, h, comps, _prog = frame
    hmax, vmax, mcux, mcuy = geom
    comp_by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}

    def used_blocks(cid):
        hi, vi, _tq = comp_by_id[cid]
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        return -(-ch // 8), -(-cw // 8)

    if progressive and ss > 0:                       # AC scan
        if len(sel) != 1:
            raise ValueError("JPEG: progressive AC scan must be "
                             "single-component")
        cid, _td, ta = sel[0]
        ac_t = huff_ac[ta]
        arr = coefs[cid]
        bh, bw = used_blocks(cid)
        eobrun = 0
        p1, m1 = 1 << al, -1 << al
        n_blk = bh * bw
        bi = 0
        while bi < n_blk:
            try:
                by, bx = divmod(bi, bw)
                block = arr[by, bx]
                if ah == 0:                          # AC first pass
                    if eobrun:
                        eobrun -= 1
                    else:
                        k = ss
                        while k <= se:
                            rs = _huff_decode(r, ac_t)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run < 15:
                                    eobrun = (1 << run) - 1
                                    if run:
                                        eobrun += r.bits(run)
                                    break
                                k += 16              # ZRL
                            else:
                                k += run
                                if k > se:
                                    raise ValueError(
                                        "JPEG: AC index overflow")
                                block[k] = _extend(r.bits(size),
                                                   size) << al
                                k += 1
                else:                                # AC refinement
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = _huff_decode(r, ac_t)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run < 15:
                                    eobrun = (1 << run)
                                    if run:
                                        eobrun += r.bits(run)
                                    break            # tail sweep below
                                val = 0              # ZRL
                            else:
                                if size != 1:
                                    raise ValueError(
                                        "JPEG: bad AC refinement size")
                                val = p1 if r.bits(1) else m1
                            while k <= se:
                                if block[k]:
                                    if r.bits(1) and \
                                            not (block[k] & p1):
                                        block[k] += p1 if block[k] > 0 \
                                            else m1
                                else:
                                    if run == 0:
                                        break
                                    run -= 1
                                k += 1
                            if val and k <= se:
                                block[k] = val
                            k += 1
                    if eobrun > 0:
                        while k <= se:               # correction sweep
                            if block[k]:
                                if r.bits(1) and not (block[k] & p1):
                                    block[k] += p1 if block[k] > 0 \
                                        else m1
                            k += 1
                        eobrun -= 1
                bi += 1
                if restart_interval and bi % restart_interval == 0 \
                        and bi < n_blk:
                    r.restart()
                    eobrun = 0
            except _RestartPending:
                r.restart()
                eobrun = 0
        return

    if progressive and ss == 0 and se != 0:
        raise ValueError("JPEG: progressive DC scan must have Se=0")
    # DC scan (progressive) or the full baseline scan — interleaved
    # over the scan components; a single-component scan iterates that
    # component's own (non-padded) block grid per the spec
    tabs = {}
    for cid, td, ta in sel:
        tabs[cid] = (huff_dc.get(td), huff_ac.get(ta))
    pred = {cid: 0 for cid, _, _ in sel}
    if len(sel) == 1:
        only = sel[0][0]
        bh, bw = used_blocks(only)
        units = [(only, by, bx) for by in range(bh) for bx in range(bw)]
        n_mcu = len(units)
        per_mcu = 1
    else:
        n_mcu = mcux * mcuy
        per_mcu = None
    mcu = 0
    while mcu < n_mcu:
        try:
            if per_mcu == 1:
                todo = [units[mcu]]
            else:
                my, mx = divmod(mcu, mcux)
                todo = []
                for cid, _td, _ta in sel:
                    hi, vi, _tq = comp_by_id[cid]
                    for by in range(vi):
                        for bx in range(hi):
                            todo.append((cid, my * vi + by,
                                         mx * hi + bx))
            for cid, by, bx in todo:
                block = coefs[cid][by, bx]
                dc_t, ac_t = tabs[cid]
                if progressive and ah > 0:           # DC refinement
                    if r.bits(1):
                        block[0] |= 1 << al
                    continue
                s = _huff_decode(r, dc_t)
                diff = _extend(r.bits(s), s) if s else 0
                pred[cid] += diff
                block[0] = pred[cid] << al
                if progressive:
                    continue                         # DC-only scan
                k = 1
                while k < 64:
                    rs = _huff_decode(r, ac_t)
                    run, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if run == 15:                # ZRL
                            k += 16
                            continue
                        break                        # EOB
                    k += run
                    if k > 63:
                        raise ValueError("JPEG: AC index overflow")
                    block[k] = _extend(r.bits(size), size)
                    k += 1
            mcu += 1
            if restart_interval and mcu % restart_interval == 0 \
                    and mcu < n_mcu:
                r.restart()
                pred = {cid: 0 for cid in pred}
        except _RestartPending:
            r.restart()
            pred = {cid: 0 for cid in pred}


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
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """Encode (H, W, C) float [0, 1] (C = 1 or 3) → JPEG bytes.
    ``subsample=True`` writes 4:2:0 (exercises the decoder's
    upsampling path); otherwise 4:4:4. ``restart_interval`` > 0 emits a
    DRI segment and RSTn markers (baseline + progressive DC scans).
    ``progressive=True`` writes SOF2 with the full scan shape real
    encoders use — successive approximation (DC first at Al=1 + DC
    refinement; AC spectral bands 1-5/6-63 at Al=1 + AC refinement
    scans with buffered correction bits) — so every progressive decode
    path is exercised. Identical quantized coefficients either way:
    decode(progressive) must equal decode(baseline) bit-for-bit.
    Huffman tables are fixed-length canonical codes declared in the
    DHT segments."""
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

    inv_zig = np.argsort(_ZIGZAG)  # zz[inv_zig] = natural -> zigzag order

    # quantized zigzag coefficient arrays per component (padded grid) —
    # shared by the baseline single scan and the progressive sequence
    carrs = []
    for ci, plane in enumerate(planes):
        hi, vi = sampling[ci]
        q = qtabs[min(ci, 1)]
        bh, bwid = mcuy * vi, mcux * hi
        arr = np.zeros((bh, bwid, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bwid):
                block = plane[by * 8:by * 8 + 8,
                              bx * 8:bx * 8 + 8] - 128.0
                qc = np.round((_A @ block @ _A.T) / q).astype(np.int64)
                arr[by, bx, inv_zig] = qc.ravel()
        carrs.append(arr)

    def trunc2(v: int) -> int:
        """Point transform for AC at Al=1: divide by 2 toward zero."""
        return -((-v) >> 1) if v < 0 else v >> 1

    def emit_dc_scan(bw: _BitWriter, al: int, first: bool) -> None:
        """Interleaved DC scan over the padded grid: first pass codes
        diffs of (dc >> al); refinement emits bit ``al`` per block."""
        pred = [0] * len(chans)
        mcu_i, n_mcu = 0, mcux * mcuy
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_i and mcu_i < n_mcu \
                        and mcu_i % restart_interval == 0:
                    bw.flush()
                    bw.out += bytes([0xFF, 0xD0 + (mcu_i
                                     // restart_interval - 1) % 8])
                    pred = [0] * len(chans)
                mcu_i += 1
                for ci in range(len(chans)):
                    hi, vi = sampling[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            dc = int(carrs[ci][my * vi + by,
                                               mx * hi + bx, 0])
                            if first:
                                v = dc >> al
                                diff = v - pred[ci]
                                pred[ci] = v
                                sz, raw = _mag(diff)
                                bw.write(*dc_enc[sz])
                                if sz:
                                    bw.write(raw, sz)
                            else:
                                bw.write((dc >> al) & 1, 1)

    def _maybe_restart(bw: _BitWriter, unit_i: int) -> None:
        """RSTn between restart intervals — DRI applies to EVERY scan,
        counted in MCUs (= blocks for non-interleaved AC scans)."""
        if restart_interval and unit_i \
                and unit_i % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (unit_i // restart_interval
                                           - 1) % 8])

    def emit_ac_block(bw: _BitWriter, vals) -> None:
        """Run-length + magnitude coding of one block band (baseline
        AC body and progressive AC first pass share this)."""
        run = 0
        for v in vals:
            v = int(v)
            if v == 0:
                run += 1
                continue
            while run > 15:
                bw.write(*ac_enc[0xF0])
                run -= 16
            sz, raw = _mag(v)
            bw.write(*ac_enc[(run << 4) | sz])
            bw.write(raw, sz)
            run = 0
        if run:
            bw.write(*ac_enc[0x00])          # EOB (run = this block)

    def emit_ac_refine_scan(bw: _BitWriter, ci: int, ss: int,
                            se: int) -> None:
        """Progressive AC refinement (Ah=1, Al=0): newly-significant
        coefficients (|v| == 1) emit (run<<4)|1 + sign; coefficients
        already significant at Ah emit buffered correction bits (their
        low bit), flushed after the next symbol (T.81 G.1.2.3)."""
        hi, vi = sampling[ci]
        bh = -(-(-(-h * vi // vmax)) // 8)
        bwid = -(-(-(-w * hi // hmax)) // 8)
        bi = 0
        for by in range(bh):
            for bx in range(bwid):
                _maybe_restart(bw, bi)
                bi += 1
                block = carrs[ci][by, bx]
                pending: list[int] = []
                run = 0
                for k in range(ss, se + 1):
                    v = int(block[k])
                    if trunc2(v) != 0:       # history-nonzero
                        pending.append(abs(v) & 1)
                    elif v == 0:
                        run += 1
                    else:                    # newly significant, |v|=1
                        while run >= 16:
                            bw.write(*ac_enc[0xF0])
                            for b in pending:
                                bw.write(b, 1)
                            pending = []
                            run -= 16
                        bw.write(*ac_enc[(run << 4) | 1])
                        bw.write(1 if v > 0 else 0, 1)
                        for b in pending:
                            bw.write(b, 1)
                        pending = []
                        run = 0
                if run or pending:
                    bw.write(*ac_enc[0x00])  # EOB covering this block
                    for b in pending:
                        bw.write(b, 1)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos_seg(comp_sel, ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_sel)])
        for ci in comp_sel:
            td = ta = 0 if ci == 0 else 1
            body += bytes([ci + 1, (td << 4) | ta])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

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
    out += seg(0xC2 if progressive else 0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    if len(chans) == 3:
        out += seg(0xC4, bytes([0x01]) + bytes(dc_bits) + dc_vals)
        out += seg(0xC4, bytes([0x11]) + bytes(ac_bits) + ac_vals)

    if not progressive:
        bw = _BitWriter()
        pred = [0] * len(chans)
        mcu_i, n_mcu = 0, mcux * mcuy
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_i and mcu_i < n_mcu \
                        and mcu_i % restart_interval == 0:
                    bw.flush()
                    bw.out += bytes([0xFF, 0xD0 + (mcu_i
                                     // restart_interval - 1) % 8])
                    pred = [0] * len(chans)
                mcu_i += 1
                for ci in range(len(chans)):
                    hi, vi = sampling[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            zz = carrs[ci][my * vi + by, mx * hi + bx]
                            diff = int(zz[0]) - pred[ci]
                            pred[ci] = int(zz[0])
                            sz, raw = _mag(diff)
                            bw.write(*dc_enc[sz])
                            if sz:
                                bw.write(raw, sz)
                            emit_ac_block(bw, zz[1:])
        bw.flush()
        out += sos_seg(list(range(len(chans))), 0, 63, 0, 0)
        out += bw.out
        out += b"\xff\xd9"
        return bytes(out)

    # progressive scan sequence: DC first (Al=1) -> DC refine -> per
    # component AC spectral bands at Al=1 -> AC refinements to Al=0.
    # DRI applies to EVERY scan: _maybe_restart emits RSTn in the
    # interleaved DC scans AND the per-component AC spectral-band /
    # refinement scans (the decoder depends on this).
    bands = [(1, 5), (6, 63)]
    bw = _BitWriter()
    emit_dc_scan(bw, al=1, first=True)
    bw.flush()
    out += sos_seg(list(range(len(chans))), 0, 0, 0, 1)
    out += bw.out
    bw = _BitWriter()
    emit_dc_scan(bw, al=0, first=False)
    bw.flush()
    out += sos_seg(list(range(len(chans))), 0, 0, 1, 0)
    out += bw.out
    for ci in range(len(chans)):
        hi, vi = sampling[ci]
        bh = -(-(-(-h * vi // vmax)) // 8)
        bwid = -(-(-(-w * hi // hmax)) // 8)
        for ss, se in bands:
            bw = _BitWriter()
            bi = 0
            for by in range(bh):
                for bx in range(bwid):
                    _maybe_restart(bw, bi)
                    bi += 1
                    block = carrs[ci][by, bx]
                    emit_ac_block(
                        bw, [trunc2(int(v)) for v in block[ss:se + 1]])
            bw.flush()
            out += sos_seg([ci], ss, se, 0, 1)
            out += bw.out
    for ci in range(len(chans)):
        for ss, se in bands:
            bw = _BitWriter()
            emit_ac_refine_scan(bw, ci, ss, se)
            bw.flush()
            out += sos_seg([ci], ss, se, 1, 0)
            out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
