"""Minimal pure-stdlib HDF5 reader/writer for the vaex columnar layout.

The reference's arrival format is vaex-layout HDF5 — contiguous 1-D
datasets at ``/table/columns/<col>/data`` written by h5py with the
default (``libver='earliest'``) superblock-0 / v1-object-header /
symbol-table-group on-disk format (reference analyzer.py:560
``vx.open_many``; the checked-in ``demos/features.hdf5`` is exactly
this shape). h5py is not installable in every environment, so this
module implements the small, fully-specified subset of the HDF5 File
Format Specification (v3.0) that layout needs:

Reader (``File(path, "r")``):
- superblock v0/v1 (and v2/v3 for ``libver='latest'`` files)
- v1 object headers (+ continuations) and v2 ``OHDR`` headers
  (+ ``OCHK`` continuations; checksums skipped, not verified)
- old-style groups (v1 B-tree + local heap + SNOD symbol nodes, any
  tree depth) and new-style compact groups (link messages)
- contiguous and compact 1-D..n-D datasets of fixed-point, IEEE
  float, and fixed-length string datatypes
- everything else (chunked/filtered layout, dense fractal-heap
  groups, variable-length types) raises ``NotImplementedError`` with
  the h5py escape hatch named

Writer (``File(path, "w")``):
- nested groups + contiguous datasets of the same three datatype
  classes, emitted in the same superblock-0 old-style format h5py
  writes, so files round-trip through either reader (an
  h5py-interop pytest cross-checks when h5py is importable).

API: the h5py subset the ingest path and its tests use —
``File``/``Group``/``Dataset`` with ``create_group``,
``create_dataset(name, data=...)``, ``keys()``, ``in``, indexing,
``.shape``, ``.dtype``, and ``[...]`` slicing.

No code here derives from h5py/libhdf5 sources — it is written
against the public format specification (HDF5 File Format Spec v3.0,
https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html).
"""

from __future__ import annotations

import os
import struct
from typing import Any

import numpy as np

__all__ = ["File", "Group", "Dataset"]

UNDEF = 0xFFFFFFFFFFFFFFFF
_SIG = b"\x89HDF\r\n\x1a\n"

# message type ids (spec IV.A.2)
MSG_NIL = 0x0000
MSG_DATASPACE = 0x0001
MSG_LINK_INFO = 0x0002
MSG_DATATYPE = 0x0003
MSG_FILL_OLD = 0x0004
MSG_FILL = 0x0005
MSG_LINK = 0x0006
MSG_LAYOUT = 0x0008
MSG_GROUP_INFO = 0x000A
MSG_FILTER = 0x000B
MSG_ATTRIBUTE = 0x000C
MSG_CONTINUATION = 0x0010
MSG_SYMBOL_TABLE = 0x0011

_GROUP_LEAF_K = 4          # symbols per SNOD = 2K = 8
_GROUP_INTERNAL_K = 16


# ----------------------------------------------------------------------
# reader
# ----------------------------------------------------------------------
class Dataset:
    def __init__(self, f: "File", dims: tuple, dtype: np.dtype,
                 data_addr: int | None, data_size: int,
                 compact: bytes | None):
        self._f = f
        self.shape = dims
        self.dtype = dtype
        self._addr = data_addr
        self._size = data_size
        self._compact = compact

    def __len__(self) -> int:
        return self.shape[0] if self.shape else 0

    def _read(self) -> np.ndarray:
        n = int(np.prod(self.shape)) if self.shape else 1
        if self._compact is not None:
            buf = self._compact
        elif self._addr is None or self._addr == UNDEF:
            return np.zeros(self.shape, dtype=self.dtype)  # never allocated
        else:
            buf = self._f._pread(self._addr, n * self.dtype.itemsize)
        return np.frombuffer(buf, dtype=self.dtype,
                             count=n).reshape(self.shape)

    def __getitem__(self, key) -> Any:
        return self._read()[key]


class Group:
    def __init__(self, f: "File", links: dict):
        self._f = f
        self._links = links          # name -> object header address

    def keys(self):
        return sorted(self._links)

    def __contains__(self, name: str) -> bool:
        return name in self._links

    def __iter__(self):
        return iter(self.keys())

    def __getitem__(self, name: str):
        if "/" in name:
            obj: Any = self
            for part in name.split("/"):
                if part:
                    obj = obj[part]
            return obj
        if name not in self._links:
            raise KeyError(name)
        return self._f._open_object(self._links[name])


class _Writable:
    """Shared create_* API for writer-mode groups."""

    def create_group(self, name: str) -> "_WGroup":
        g = _WGroup()
        self._children[name] = g          # type: ignore[attr-defined]
        return g

    def create_dataset(self, name: str, data=None,
                       dtype=None) -> "_WDataset":
        arr = np.asarray(data, dtype=dtype)
        if arr.dtype.kind in ("O", "U"):
            # h5py accepts plain str lists; numpy gives them '<U' (not
            # object) dtype, so match on kind and encode to bytes
            arr = np.array([v.encode() if isinstance(v, str) else v
                            for v in arr.ravel()]).reshape(arr.shape)
        d = _WDataset(arr)
        self._children[name] = d          # type: ignore[attr-defined]
        return d


class _WGroup(_Writable):
    def __init__(self):
        self._children: dict[str, Any] = {}

    def keys(self):
        return sorted(self._children)

    def __contains__(self, name):
        return name in self._children

    def __getitem__(self, name):
        return self._children[name]


class _WDataset:
    def __init__(self, arr: np.ndarray):
        self.data = arr
        self.shape = arr.shape
        self.dtype = arr.dtype

    def __getitem__(self, key):
        return self.data[key]


class File(Group, _Writable):
    """h5py-subset File: mode "r" parses, mode "w" buffers and writes
    the whole file on close()."""

    def __init__(self, path: str, mode: str = "r"):
        self._path = path
        self._mode = mode
        self._closed = False
        if mode == "r":
            self._fh = open(path, "rb")
            self._offsets = 8
            self._lengths = 8
            root = self._parse_superblock()
            Group.__init__(self, self, self._read_links(root))
        elif mode == "w":
            self._children = {}
        else:
            raise ValueError(f"mode {mode!r} not supported (r or w)")

    # -- context manager -------------------------------------------------
    def __enter__(self) -> "File":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        if self._mode == "r":
            self._fh.close()
        else:
            _write_file(self._path, self._children)

    # -- low-level read helpers ------------------------------------------
    def _pread(self, addr: int, n: int) -> bytes:
        self._fh.seek(addr)
        b = self._fh.read(n)
        if len(b) != n:
            raise ValueError(f"HDF5: truncated read at {addr}")
        return b

    def _parse_superblock(self) -> int:
        """Returns the root group object-header address."""
        head = self._pread(0, 8)
        if head != _SIG:
            raise ValueError("not an HDF5 file (bad signature)")
        version = self._pread(8, 1)[0]
        if version in (0, 1):
            # sig(8) versions(8) leaf_k(2) internal_k(2) flags(4)
            off = 24
            if version == 1:
                off += 4                  # indexed-storage K + reserved
            self._offsets, self._lengths = self._pread(13, 2)[0:2]
            base, _fs, _eof, _drv = struct.unpack(
                "<4Q", self._pread(off, 32))
            # root symbol-table entry: link_off, OH addr, cache, rsvd
            oh_addr = struct.unpack("<Q", self._pread(off + 32 + 8, 8))[0]
            return base + oh_addr
        if version in (2, 3):
            self._offsets, self._lengths = self._pread(9, 2)[0:2]
            base, _ext, _eof, oh_addr = struct.unpack(
                "<4Q", self._pread(12, 32))
            return base + oh_addr
        raise NotImplementedError(f"HDF5 superblock version {version}")

    # -- object headers ---------------------------------------------------
    def _messages(self, addr: int) -> list[tuple[int, bytes]]:
        """All (type, body) messages of the object header at addr,
        following continuations."""
        if self._pread(addr, 4) == b"OHDR":
            return self._messages_v2(addr)
        return self._messages_v1(addr)

    def _messages_v1(self, addr: int) -> list[tuple[int, bytes]]:
        ver, _r, nmsg, _refs, hsize = struct.unpack(
            "<BBHII", self._pread(addr, 12))
        if ver != 1:
            raise NotImplementedError(f"HDF5 object header v{ver}")
        out: list[tuple[int, bytes]] = []
        # 12-byte prefix + 4 pad; continuations are raw message runs
        blocks = [(addr + 16, hsize)]
        while blocks and len(out) < nmsg:
            pos, remaining = blocks.pop(0)
            while remaining >= 8 and len(out) < nmsg:
                mtype, msize, _flags = struct.unpack(
                    "<HHB", self._pread(pos, 5))
                body = self._pread(pos + 8, msize)
                pos += 8 + msize
                remaining -= 8 + msize
                if mtype == MSG_CONTINUATION:
                    coff, clen = struct.unpack("<QQ", body[:16])
                    blocks.append((coff, clen))
                else:
                    out.append((mtype, body))
        return out

    def _messages_v2(self, addr: int) -> list[tuple[int, bytes]]:
        flags = self._pread(addr, 6)[5]
        pos = addr + 6
        if flags & 0x20:
            pos += 16                      # access/mod/change/birth times
        if flags & 0x10:
            pos += 4                       # max compact / min dense
        size_bytes = 1 << (flags & 0x3)
        chunk0 = int.from_bytes(self._pread(pos, size_bytes), "little")
        pos += size_bytes
        out: list[tuple[int, bytes]] = []
        creation_order = bool(flags & 0x4)
        blocks = [(pos, chunk0, False)]
        while blocks:
            bpos, blen, has_sig = blocks.pop(0)
            if has_sig:
                if self._pread(bpos, 4) != b"OCHK":
                    raise ValueError("HDF5: bad OCHK continuation")
                bpos += 4
                blen -= 8                  # signature + trailing checksum
            else:
                blen -= 4                  # trailing checksum
            end = bpos + blen
            while bpos + 4 <= end:
                mtype = self._pread(bpos, 1)[0]
                msize = struct.unpack("<H", self._pread(bpos + 1, 2))[0]
                bpos += 4
                if creation_order:
                    bpos += 2
                body = self._pread(bpos, msize)
                bpos += msize
                if mtype == MSG_CONTINUATION:
                    coff, clen = struct.unpack("<QQ", body[:16])
                    blocks.append((coff, clen, True))
                else:
                    out.append((mtype, body))
        return out

    def _open_object(self, addr: int):
        msgs = self._messages(addr)
        types = {t for t, _ in msgs}
        if MSG_DATASPACE in types and MSG_DATATYPE in types:
            return self._open_dataset(msgs)
        return Group(self, self._read_links(addr, msgs))

    # -- groups -----------------------------------------------------------
    def _read_links(self, addr: int,
                    msgs: list | None = None) -> dict:
        if msgs is None:
            msgs = self._messages(addr)
        links: dict[str, int] = {}
        for mtype, body in msgs:
            if mtype == MSG_SYMBOL_TABLE:
                btree, heap = struct.unpack("<QQ", body[:16])
                self._walk_btree(btree, heap, links)
            elif mtype == MSG_LINK:
                name, target = _parse_link_message(body)
                if target is not None:
                    links[name] = target
            elif mtype == MSG_LINK_INFO:
                fheap = struct.unpack(
                    "<Q", body[2 + (8 if body[1] & 1 else 0):][:8])[0]
                if fheap != UNDEF:
                    raise NotImplementedError(
                        "HDF5: dense (fractal-heap) group links — "
                        "re-write the file with h5py/libver='earliest'")
        return links

    def _walk_btree(self, btree_addr: int, heap_addr: int,
                    links: dict) -> None:
        sig = self._pread(btree_addr, 4)
        if sig != b"TREE":
            raise ValueError("HDF5: bad group B-tree signature")
        ntype, level, used = struct.unpack(
            "<BBH", self._pread(btree_addr + 4, 4))
        if ntype != 0:
            raise ValueError("HDF5: not a group B-tree node")
        # keys/children: key0 child0 key1 child1 ... key_used
        pos = btree_addr + 8 + 2 * self._offsets   # skip siblings
        pos += self._lengths                        # key 0
        for _ in range(used):
            child = struct.unpack("<Q", self._pread(pos, 8))[0]
            pos += self._offsets + self._lengths    # child + next key
            if level > 0:
                self._walk_btree(child, heap_addr, links)
            else:
                self._read_snod(child, heap_addr, links)

    def _read_snod(self, addr: int, heap_addr: int, links: dict) -> None:
        if self._pread(addr, 4) != b"SNOD":
            raise ValueError("HDF5: bad symbol node signature")
        nsym = struct.unpack("<H", self._pread(addr + 6, 2))[0]
        heap_data = self._heap_data_addr(heap_addr)
        pos = addr + 8
        for _ in range(nsym):
            name_off, oh_addr = struct.unpack(
                "<QQ", self._pread(pos, 16))
            links[self._heap_string(heap_data, name_off)] = oh_addr
            pos += 40
    def _heap_data_addr(self, heap_addr: int) -> int:
        if self._pread(heap_addr, 4) != b"HEAP":
            raise ValueError("HDF5: bad local heap signature")
        return struct.unpack("<Q", self._pread(heap_addr + 24, 8))[0]

    def _heap_string(self, data_addr: int, offset: int) -> str:
        out = bytearray()
        pos = data_addr + offset
        while True:
            self._fh.seek(pos)
            chunk = self._fh.read(64)      # may be short near EOF
            i = chunk.find(b"\x00")
            if i >= 0:
                out += chunk[:i]
                return out.decode("utf-8")
            if len(chunk) < 64:
                raise ValueError("HDF5: unterminated heap string")
            out += chunk
            pos += 64

    # -- datasets ---------------------------------------------------------
    def _open_dataset(self, msgs: list) -> Dataset:
        dims: tuple = ()
        dtype: np.dtype | None = None
        addr: int | None = None
        size = 0
        compact: bytes | None = None
        for mtype, body in msgs:
            if mtype == MSG_DATASPACE:
                dims = _parse_dataspace(body)
            elif mtype == MSG_DATATYPE:
                dtype = _parse_datatype(body)
            elif mtype == MSG_LAYOUT:
                addr, size, compact = _parse_layout(body)
        if dtype is None:
            raise ValueError("HDF5: dataset without a datatype message")
        return Dataset(self, dims, dtype, addr, size, compact)


def _parse_link_message(body: bytes) -> tuple[str, int | None]:
    ver, flags = body[0], body[1]
    pos = 2
    ltype = 0
    if flags & 0x8:
        ltype = body[pos]
        pos += 1
    if flags & 0x4:
        pos += 8                           # creation order
    if flags & 0x10:
        pos += 1                           # charset
    lsize = 1 << (flags & 0x3)
    nlen = int.from_bytes(body[pos:pos + lsize], "little")
    pos += lsize
    name = body[pos:pos + nlen].decode("utf-8")
    pos += nlen
    if ltype != 0:                         # soft/external links: skip
        return name, None
    return name, struct.unpack("<Q", body[pos:pos + 8])[0]


def _parse_dataspace(body: bytes) -> tuple:
    ver = body[0]
    if ver == 1:
        ndims, flags = body[1], body[2]
        pos = 8
    elif ver == 2:
        ndims, flags = body[1], body[2]
        pos = 4
    else:
        raise NotImplementedError(f"HDF5 dataspace v{ver}")
    dims = struct.unpack(f"<{ndims}Q", body[pos:pos + 8 * ndims])
    return tuple(int(d) for d in dims)


def _parse_datatype(body: bytes) -> np.dtype:
    cls = body[0] & 0x0F
    b0 = body[1]
    size = struct.unpack("<I", body[4:8])[0]
    order = ">" if (b0 & 1) else "<"
    if cls == 0:                           # fixed point
        signed = "i" if (b0 & 0x08) else "u"
        return np.dtype(f"{order}{signed}{size}")
    if cls == 1:                           # IEEE float
        return np.dtype(f"{order}f{size}")
    if cls == 3:                           # fixed-length string
        return np.dtype(f"S{size}")
    raise NotImplementedError(
        f"HDF5 datatype class {cls} (fixed/float/fixed-string only; "
        f"use h5py for variable-length or compound data)")


def _parse_layout(body: bytes) -> tuple[int | None, int, bytes | None]:
    ver = body[0]
    if ver != 3:
        raise NotImplementedError(f"HDF5 data layout v{ver} "
                                  f"(v3 contiguous/compact only)")
    lclass = body[1]
    if lclass == 0:                        # compact
        csize = struct.unpack("<H", body[2:4])[0]
        return None, csize, body[4:4 + csize]
    if lclass == 1:                        # contiguous
        addr, size = struct.unpack("<QQ", body[2:18])
        return addr, size, None
    raise NotImplementedError(
        "HDF5 chunked/filtered layout — convert with h5py, or write "
        "contiguous datasets")


# ----------------------------------------------------------------------
# writer (superblock v0, v1 object headers, symbol-table groups —
# the same shape h5py emits with the default libver)
# ----------------------------------------------------------------------
def _align8(n: int) -> int:
    return (n + 7) & ~7


def _msg(mtype: int, body: bytes) -> bytes:
    padded = body + b"\x00" * (_align8(len(body)) - len(body))
    return struct.pack("<HHB3x", mtype, len(padded), 0) + padded


def _object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return struct.pack("<BBHII4x", 1, 0, len(messages), 1,
                       len(blob)) + blob


def _dtype_message(dt: np.dtype) -> bytes:
    kind, size = dt.kind, dt.itemsize
    if kind in ("i", "u"):
        bits = 0x08 if kind == "i" else 0x00
        return struct.pack("<BBBBIHH", 0x10, bits, 0, 0, size,
                           0, size * 8)
    if kind == "f":
        if size == 8:
            exp_loc, exp_sz, man_sz, bias, sign = 52, 11, 52, 1023, 63
        elif size == 4:
            exp_loc, exp_sz, man_sz, bias, sign = 23, 8, 23, 127, 31
        else:
            raise NotImplementedError(f"float{size * 8} write")
        return struct.pack("<BBBBIHHBBBBI", 0x11, 0x20, sign, 0, size,
                           0, size * 8, exp_loc, exp_sz, 0, man_sz, bias)
    if kind == "S":
        return struct.pack("<BBBBI", 0x13, 0x01, 0, 0, size)
    raise NotImplementedError(
        f"dtype {dt} write (int/uint/float/bytes only)")


def _dataspace_message(shape: tuple) -> bytes:
    return struct.pack("<BBB5x", 1, len(shape), 0) + b"".join(
        struct.pack("<Q", d) for d in shape)


class _Alloc:
    """Sequential 8-aligned block allocator + deferred byte patches."""

    def __init__(self):
        self.blocks: list[bytearray] = []
        self.addrs: list[int] = []
        self.pos = 0

    def add(self, data: bytes | bytearray) -> int:
        addr = self.pos
        ba = bytearray(data)
        pad = _align8(len(ba)) - len(ba)
        ba += b"\x00" * pad
        self.blocks.append(ba)
        self.addrs.append(addr)
        self.pos += len(ba)
        return addr


def _write_file(path: str, children: dict) -> None:
    alloc = _Alloc()
    alloc.pos = 96                          # superblock v0 reserved
    root_oh = _emit_group(alloc, children)
    eof = alloc.pos
    sb = struct.pack(
        "<8sBBBBBBBBHHIQQQQ", _SIG, 0, 0, 0, 0, 0, 8, 8, 0,
        _GROUP_LEAF_K, _GROUP_INTERNAL_K, 0,
        0, UNDEF, eof, UNDEF)
    sb += struct.pack("<QQII16x", 0, root_oh, 0, 0)
    with open(path, "wb") as f:
        f.write(sb)
        for addr, block in zip(alloc.addrs, alloc.blocks):
            f.seek(addr)
            f.write(block)
        f.seek(0, os.SEEK_END)
        if f.tell() < eof:
            f.truncate(eof)


def _emit_group(alloc: _Alloc, children: dict) -> int:
    """Emit one group (children first) → its object-header address."""
    names = sorted(children)
    child_addrs = {}
    for name in names:
        obj = children[name]
        if isinstance(obj, _WGroup):
            child_addrs[name] = _emit_group(alloc, obj._children)
        elif isinstance(obj, _WDataset):
            child_addrs[name] = _emit_dataset(alloc, obj)
        else:
            raise TypeError(f"cannot write {type(obj)}")
    # local heap: offset 0 = empty string, then names, nul-terminated,
    # 8-aligned; no free list (head = 1)
    heap = bytearray(b"\x00" * 8)
    name_off = {}
    for name in names:
        name_off[name] = len(heap)
        nb = name.encode("utf-8") + b"\x00"
        heap += nb + b"\x00" * (_align8(len(nb)) - len(nb))
    # SNOD chunks of ≤ 2K entries
    cap = 2 * _GROUP_LEAF_K
    chunks = [names[i:i + cap] for i in range(0, len(names), cap)] or [[]]
    if len(chunks) > 2 * _GROUP_INTERNAL_K:
        raise NotImplementedError(
            f"minihdf5 writer: >{cap * 2 * _GROUP_INTERNAL_K} links in "
            f"one group (use h5py)")
    snod_addrs = []
    for chunk in chunks:
        body = bytearray(struct.pack("<4sBBH", b"SNOD", 1, 0, len(chunk)))
        for name in chunk:
            body += struct.pack("<QQII16x", name_off[name],
                                child_addrs[name], 0, 0)
        body += b"\x00" * (8 + cap * 40 - len(body))
        snod_addrs.append(alloc.add(body))
    # B-tree v1 node (level 0): key0=0(empty), child_i, key_{i+1}=last
    # name of chunk i
    bt = bytearray(struct.pack("<4sBBHQQ", b"TREE", 0, 0, len(chunks),
                               UNDEF, UNDEF))
    bt += struct.pack("<Q", 0)
    for chunk, saddr in zip(chunks, snod_addrs):
        bt += struct.pack("<QQ", saddr,
                          name_off[chunk[-1]] if chunk else 0)
    bt += b"\x00" * (24 + 8 * (2 * _GROUP_LEAF_K + 1)
                     + 8 * 2 * _GROUP_LEAF_K - len(bt))
    btree_addr = alloc.add(bt)
    heap_data_addr = alloc.pos + 32
    heap_hdr = struct.pack("<4sB3xQQQ", b"HEAP", 0, len(heap), 1,
                           heap_data_addr)
    alloc.add(heap_hdr + bytes(heap))
    oh = _object_header([_msg(MSG_SYMBOL_TABLE,
                              struct.pack("<QQ", btree_addr, heap_data_addr
                                          - 32))])
    return alloc.add(oh)


def _emit_dataset(alloc: _Alloc, ds: _WDataset) -> int:
    arr = np.ascontiguousarray(ds.data)
    if arr.dtype.byteorder == ">":
        arr = arr.astype(arr.dtype.newbyteorder("<"))
    raw = arr.tobytes()
    data_addr = alloc.add(raw) if raw else UNDEF
    layout = struct.pack("<BBQQ", 3, 1,
                         data_addr if raw else UNDEF, len(raw))
    fill = struct.pack("<BBBB", 2, 2, 2, 0)
    msgs = [_msg(MSG_DATASPACE, _dataspace_message(arr.shape)),
            _msg(MSG_DATATYPE, _dtype_message(arr.dtype)),
            _msg(MSG_FILL, fill),
            _msg(MSG_LAYOUT, layout)]
    return alloc.add(_object_header(msgs))
