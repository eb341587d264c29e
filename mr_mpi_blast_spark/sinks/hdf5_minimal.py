"""Minimal pure-Python HDF5 writer/reader for the W4 sink.

The reference exports hits to a PyTables table ``/blhits/blhitstab``
(tools/converter/load_hd5.py:62-92). This container has neither
PyTables nor h5py, so this module implements just enough of the public
HDF5 File Format Specification (version 0 superblock, classic groups,
v1 object headers, contiguous layout, compound datatype) to produce a
standard .hd5 file any HDF5 1.x reader opens, and an independent
reader that walks the file strictly by the spec for round-trip tests.

Format elements used (spec section numbers from the HDF5 File Format
Specification III/IV):
- superblock v0 with root symbol-table entry
- classic groups: v1 B-tree (TREE) + local heap (HEAP) + SNOD
- object headers v1; messages: dataspace (0x0001), datatype (0x0003,
  compound of fixed-point / IEEE f64 / fixed string), fill value
  (0x0005), layout v3 contiguous (0x0008), symbol table (0x0011)
- data: one contiguous segment of packed little-endian records

Scope: one-dimensional contiguous compound datasets, names < 64 KiB,
no chunking/compression/attributes — exactly what the converter
schema needs. The writer is an export tool (like the reference's
single-process converter); the dataset streams from Spark in Arrow
batches so the driver never holds more than one batch.
"""

from __future__ import annotations

import struct

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# low-level builders (writer)
# ---------------------------------------------------------------------------

def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _dt_fixed(size: int, signed: bool) -> bytes:
    """Fixed-point datatype message body (class 0, v1, little-endian)."""
    bf0 = 0x08 if signed else 0x00
    return (struct.pack("<B3BI", 0x10, bf0, 0, 0, size)
            + struct.pack("<HH", 0, size * 8))


def _dt_f64() -> bytes:
    """IEEE 754 double LE (class 1, v1): sign bit 63, exp 52..62 bias
    1023, mantissa 0..51, MSB-implied normalization."""
    return (struct.pack("<B3BI", 0x11, 0x20, 0x3F, 0x00, 8)
            + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023))


def _dt_string(size: int) -> bytes:
    """Fixed-length ASCII string, null-padded (class 3, v1)."""
    return struct.pack("<B3BI", 0x13, 0x01, 0, 0, size)


_BASE = {"u8": lambda: _dt_fixed(8, False),
         "u4": lambda: _dt_fixed(4, False),
         "i8": lambda: _dt_fixed(8, True),
         "f8": _dt_f64}


def _dt_member(name: str, offset: int, base: bytes) -> bytes:
    """One compound member (v1): padded name, byte offset, scalar dims."""
    return (_pad8(name.encode("ascii") + b"\x00")
            + struct.pack("<IB3BII", offset, 0, 0, 0, 0, 0, 0)
            + struct.pack("<4I", 0, 0, 0, 0)
            + base)


def _dt_compound(fields: list[tuple[str, str, int]], itemsize: int) -> bytes:
    """Compound datatype (class 6, v1). fields: (name, kind, size) where
    kind is one of u8/u4/i8/f8/S<n>."""
    body = b""
    off = 0
    for name, kind, size in fields:
        base = _dt_string(size) if kind == "S" else _BASE[kind]()
        body += _dt_member(name, off, base)
        off += size
    head = struct.pack("<BBBBI", 0x16, len(fields) & 0xFF,
                       (len(fields) >> 8) & 0xFF, 0, itemsize)
    return head + body


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3B", mtype, len(body), 0, 0, 0, 0) + body


def _object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return struct.pack("<BBHII", 1, 0, len(messages), 1, len(blob)) \
        + b"\x00" * 4 + blob
    # v1 header block is 8-byte aligned: fixed part is 12 bytes + 4 pad


def _dataspace_1d(n: int) -> bytes:
    return struct.pack("<BBB5x", 1, 1, 0) + struct.pack("<Q", n)


def _fill_value() -> bytes:
    # v2, alloc time early(1), write time ifset(2), undefined fill
    return struct.pack("<BBBB", 2, 1, 2, 0)


def _layout_contiguous(addr: int, size: int) -> bytes:
    return struct.pack("<BBQQ", 3, 1, addr, size)


def _local_heap(names: list[str], data_addr: int) -> tuple[bytes, bytes, dict]:
    """(heap header, heap data, name->offset map). Offset 0 is the
    empty string used as the B-tree's low key."""
    data = b"\x00" * 8
    offsets = {}
    for nm in names:
        offsets[nm] = len(data)
        data += _pad8(nm.encode("ascii") + b"\x00")
    header = (b"HEAP" + struct.pack("<B3x", 0)
              + struct.pack("<QQQ", len(data), UNDEF, data_addr))
    return header, data, offsets


def _btree_group(snod_addr: int, last_name_off: int) -> bytes:
    return (b"TREE" + struct.pack("<BBH", 0, 0, 1)
            + struct.pack("<QQ", UNDEF, UNDEF)
            + struct.pack("<QQQ", 0, snod_addr, last_name_off))


def _snod(entries: list[tuple[int, int]]) -> bytes:
    """Symbol table node; entries: (heap name offset, header addr).
    Padded to the 2*sym_leaf_k (=8) entry capacity libhdf5 allocates."""
    out = b"SNOD" + struct.pack("<BBH", 1, 0, len(entries))
    for name_off, oh_addr in entries:
        out += struct.pack("<QQ", name_off, oh_addr) \
            + struct.pack("<II16x", 0, 0)
    return out + b"\x00" * (40 * (8 - len(entries)))


def _symtab_msg(btree_addr: int, heap_addr: int) -> bytes:
    return struct.pack("<QQ", btree_addr, heap_addr)


# superblock v0 with 8-byte offsets/lengths is fixed-size: 8 (signature)
# + 8 (version bytes + sizes) + 8 (group k's + flags) + 32 (base, free
# space, EOF, driver) + 40 (root symbol table entry) = 96 bytes.
_SUPERBLOCK_SIZE = 96


class _Out:
    """Append-only layout planner starting just past the superblock."""

    def __init__(self):
        self.blobs: list[bytearray] = []
        self.size = _SUPERBLOCK_SIZE

    def add(self, blob: bytes) -> int:
        addr = self.size
        self.blobs.append(bytearray(blob))
        self.size += len(blob)
        return addr


def write_compound_hdf5(path: str, group: str, table: str,
                        fields: list[tuple[str, str, int]],
                        batches, n_rows: int) -> int:
    """Write /{group}/{table} as a contiguous compound dataset.

    batches: iterable of bytes objects, each a whole number of packed
    records totalling n_rows; streamed straight to the data segment.
    Returns rows written.
    """
    itemsize = sum(size for _, _, size in fields)
    out = _Out()

    # ---- dataset object header
    ds_oh = out.add(_object_header([
        _msg(0x0001, _dataspace_1d(n_rows)),
        _msg(0x0003, _dt_compound(fields, itemsize)),
        _msg(0x0005, _fill_value()),
        _msg(0x0008, _layout_contiguous(UNDEF, n_rows * itemsize)),
    ]))

    # ---- child group (heap + snod + btree + header)
    heap_hdr_len = 4 + 4 + 24
    g_heap_addr = out.size
    g_heap_hdr, g_heap_data, g_off = _local_heap(
        [table], g_heap_addr + heap_hdr_len)
    out.add(g_heap_hdr + g_heap_data)
    g_snod = out.add(_snod([(g_off[table], ds_oh)]))
    g_btree = out.add(_btree_group(g_snod, g_off[table]))
    grp_oh = out.add(_object_header([
        _msg(0x0011, _symtab_msg(g_btree, g_heap_addr))]))

    # ---- root group
    r_heap_addr = out.size
    r_heap_hdr, r_heap_data, r_off = _local_heap(
        [group], r_heap_addr + heap_hdr_len)
    out.add(r_heap_hdr + r_heap_data)
    r_snod = out.add(_snod([(r_off[group], grp_oh)]))
    r_btree = out.add(_btree_group(r_snod, r_off[group]))
    root_oh = out.add(_object_header([
        _msg(0x0011, _symtab_msg(r_btree, r_heap_addr))]))

    data_addr = out.size
    eof = data_addr + n_rows * itemsize

    # patch the layout message with the real data address
    ds_blob = out.blobs[0]
    layout_probe = struct.pack("<BBQQ", 3, 1, UNDEF, n_rows * itemsize)
    idx = bytes(ds_blob).find(layout_probe)
    assert idx >= 0
    ds_blob[idx + 2:idx + 10] = struct.pack("<Q", data_addr)

    superblock = (
        b"\x89HDF\r\n\x1a\n"
        + struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
        + struct.pack("<HHI", 4, 16, 0)
        + struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
        # root symbol table entry: name offset 0, header addr, cached
        # symbol-table scratch (btree addr + heap addr)
        + struct.pack("<QQ", 0, root_oh)
        + struct.pack("<II", 1, 0)
        + struct.pack("<QQ", r_btree, r_heap_addr))
    assert len(superblock) == _SUPERBLOCK_SIZE

    with open(path, "wb") as f:
        f.write(superblock)
        for blob in out.blobs:
            f.write(bytes(blob))
        assert f.tell() == data_addr
        written = 0
        for chunk in batches:
            f.write(chunk)
            written += len(chunk)
    assert written == n_rows * itemsize, (written, n_rows * itemsize)
    return n_rows


# ---------------------------------------------------------------------------
# independent reader (round-trip oracle; strictly spec-driven)
# ---------------------------------------------------------------------------

def _parse_datatype(b: bytes, pos: int):
    """-> (numpy dtype fragment, bytes consumed)."""
    cls_ver = b[pos]
    cls, ver = cls_ver & 0x0F, cls_ver >> 4
    assert ver == 1, f"datatype version {ver} unsupported"
    size = struct.unpack_from("<I", b, pos + 4)[0]
    if cls == 0:                                  # fixed point
        signed = bool(b[pos + 1] & 0x08)
        return np.dtype(f"<{'i' if signed else 'u'}{size}"), 8 + 4
    if cls == 1:                                  # float
        return np.dtype(f"<f{size}"), 8 + 12
    if cls == 3:                                  # string
        return np.dtype(f"S{size}"), 8
    if cls == 6:                                  # compound
        n = b[pos + 1] | (b[pos + 2] << 8)
        names, formats, offsets = [], [], []
        p = pos + 8
        for _ in range(n):
            end = b.index(b"\x00", p)
            name = b[p:end].decode("ascii")
            p += (end - p + 1 + 7) // 8 * 8
            m_off = struct.unpack_from("<I", b, p)[0]
            p += 16 + 16                          # member fixed part + dims
            frag, used = _parse_datatype(b, p)
            p += used
            names.append(name)
            formats.append(frag)
            offsets.append(m_off)
        dt = np.dtype({"names": names, "formats": formats,
                       "offsets": offsets, "itemsize": size})
        return dt, p - pos
    raise ValueError(f"datatype class {cls} unsupported")


def _read_object_header(b: bytes, addr: int) -> dict[int, bytes]:
    version, _, nmsgs, _refs, hsize = struct.unpack_from("<BBHII", b, addr)
    assert version == 1, f"object header v{version} unsupported"
    msgs: dict[int, bytes] = {}
    p = addr + 16
    for _ in range(nmsgs):
        mtype, msize = struct.unpack_from("<HH", b, p)
        msgs[mtype] = b[p + 8:p + 8 + msize]
        p += 8 + msize
    return msgs


def _read_group(b: bytes, msgs: dict[int, bytes]) -> dict[str, int]:
    """Symbol-table group -> {link name: object header address}."""
    btree_addr, heap_addr = struct.unpack_from("<QQ", msgs[0x0011], 0)
    assert b[btree_addr:btree_addr + 4] == b"TREE"
    n_entries = struct.unpack_from("<H", b, btree_addr + 6)[0]
    heap_data_addr = struct.unpack_from("<Q", b, heap_addr + 24)[0]
    out: dict[str, int] = {}
    p = btree_addr + 8 + 16   # past signature/type/level/count + siblings
    for i in range(n_entries):
        snod_addr = struct.unpack_from("<Q", b, p + 8 + i * 16)[0]
        assert b[snod_addr:snod_addr + 4] == b"SNOD"
        n_syms = struct.unpack_from("<H", b, snod_addr + 6)[0]
        for s in range(n_syms):
            base = snod_addr + 8 + s * 40
            name_off, oh_addr = struct.unpack_from("<QQ", b, base)
            end = b.index(b"\x00", heap_data_addr + name_off)
            out[b[heap_data_addr + name_off:end].decode("ascii")] = oh_addr
    return out


def read_compound_hdf5(path: str, dataset_path: str) -> np.ndarray:
    """Open /group/.../dataset written in the classic format above and
    return its records as a numpy structured array."""
    with open(path, "rb") as f:
        b = f.read()
    assert b[:8] == b"\x89HDF\r\n\x1a\n", "not an HDF5 file"
    assert b[8] == 0, f"superblock v{b[8]} unsupported"
    # root STE begins at 56 (sig 8 + versions 8 + k's/flags 8 + four
    # addresses 32); its object header address is the second field.
    root_oh = struct.unpack_from("<Q", b, 56 + 8)[0]
    msgs = _read_object_header(b, root_oh)
    for part in dataset_path.strip("/").split("/"):
        links = _read_group(b, msgs)
        msgs = _read_object_header(b, links[part])
    dt, _ = _parse_datatype(msgs[0x0003], 0)
    version, rank, flags = struct.unpack_from("<BBB", msgs[0x0001], 0)
    assert (version, rank) == (1, 1)
    n = struct.unpack_from("<Q", msgs[0x0001], 8)[0]
    lay_ver, lay_cls = struct.unpack_from("<BB", msgs[0x0008], 0)
    assert (lay_ver, lay_cls) == (3, 1), "only contiguous layout"
    addr, size = struct.unpack_from("<QQ", msgs[0x0008], 2)
    assert size == n * dt.itemsize
    return np.frombuffer(b[addr:addr + size], dtype=dt)
