"""Dependency-free LMDB file format reader/writer.

Capability parity for the reference's lmdb dataset backend
(``codes/data/Vimeo7_dataset.py:70-109`` reads frame blobs from an LMDB
environment) in an image where the ``lmdb`` package does not exist: this
module implements the on-disk format (LMDB 0.9 ``data.mdb``) directly —
meta pages, branch/leaf B-tree pages, overflow (BIGDATA) pages — so
databases written by the real liblmdb are readable here and vice versa.

Scope: read-only access (``LmdbReader``) plus a batch writer
(``write_lmdb``) that builds the B-tree bottom-up in one transaction — all
the dataset pipeline needs. No freelist, no nested DBs, no DUPSORT.

Layout constants follow lmdb.h (64-bit, little-endian, 4096-byte pages).
"""

from __future__ import annotations

import os
import struct
from typing import Dict, Iterable, List, Optional, Tuple

PAGE = 4096
MAGIC = 0xBEEFC0DE
VERSION = 1
HDRSZ = 16          # MDB_page header size (pgno 8 + pad 2 + flags 2 + 2 + 2)

P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08

F_BIGDATA = 0x01    # node flag: data is an overflow pgno

# MDB_db: pad u32, flags u16, depth u16, branch u64, leaf u64, overflow u64,
# entries u64, root u64
_DB = struct.Struct("<IHHQQQQQ")
# MDB_meta prefix: magic u32, version u32, address u64, mapsize u64
_META_HEAD = struct.Struct("<IIQQ")
_META_TAIL = struct.Struct("<QQ")  # last_pg, txnid


def _node_pgno(lo: int, hi: int, flags: int) -> int:
    return lo | (hi << 16) | (flags << 32)


class LmdbReader:
    """Read-only LMDB environment over ``data.mdb`` (or a subdir path)."""

    def __init__(self, path: str):
        if os.path.isdir(path):
            path = os.path.join(path, "data.mdb")
        self.path = path
        self._f = open(path, "rb")
        self._size = os.path.getsize(path)
        meta = []
        for pg in (0, 1):
            raw = self._page(pg)
            magic, ver, _, _ = _META_HEAD.unpack_from(raw, HDRSZ)
            if magic != MAGIC:
                continue
            off = HDRSZ + _META_HEAD.size + 2 * _DB.size
            last_pg, txnid = _META_TAIL.unpack_from(raw, off)
            main = _DB.unpack_from(raw, HDRSZ + _META_HEAD.size + _DB.size)
            meta.append((txnid, main, last_pg))
        if not meta:
            raise ValueError(f"{path}: not an LMDB data file")
        meta.sort()
        _, main, _ = meta[-1]
        self._root = main[7]
        self.entries = main[6]
        self.depth = main[2]

    def _page(self, pgno: int, npages: int = 1) -> bytes:
        self._f.seek(pgno * PAGE)
        return self._f.read(npages * PAGE)

    @staticmethod
    def _page_flags(raw: bytes) -> int:
        return struct.unpack_from("<H", raw, 10)[0]

    @staticmethod
    def _numkeys(raw: bytes) -> int:
        lower = struct.unpack_from("<H", raw, 12)[0]
        return (lower - HDRSZ) // 2

    @staticmethod
    def _node(raw: bytes, i: int) -> Tuple[int, int, int, bytes, int]:
        """Returns (lo, hi, flags, key, node_offset)."""
        ptr = struct.unpack_from("<H", raw, HDRSZ + 2 * i)[0]
        lo, hi, flags, ksize = struct.unpack_from("<HHHH", raw, ptr)
        key = raw[ptr + 8: ptr + 8 + ksize]
        return lo, hi, flags, key, ptr

    def get(self, key: bytes) -> Optional[bytes]:
        if isinstance(key, str):
            key = key.encode()
        if self._root == 0xFFFFFFFFFFFFFFFF:  # P_INVALID: empty db
            return None
        raw = self._page(self._root)
        while self._page_flags(raw) & P_BRANCH:
            n = self._numkeys(raw)
            child = None
            for i in range(n - 1, -1, -1):
                lo, hi, fl, k, _ = self._node(raw, i)
                if i == 0 or k <= key:
                    child = _node_pgno(lo, hi, fl)
                    break
            raw = self._page(child)
        n = self._numkeys(raw)
        for i in range(n):
            lo, hi, fl, k, ptr = self._node(raw, i)
            if k == key:
                dsize = lo | (hi << 16)
                if fl & F_BIGDATA:
                    (opg,) = struct.unpack_from(
                        "<Q", raw, ptr + 8 + len(k))
                    oraw = self._page(opg)
                    npages = struct.unpack_from("<I", oraw, 12)[0]
                    blob = self._page(opg, npages)
                    return blob[HDRSZ: HDRSZ + dsize]
                dof = ptr + 8 + len(k)
                return raw[dof: dof + dsize]
            if k > key:
                return None
        return None

    def keys(self) -> List[bytes]:
        """All keys in order (walks every leaf)."""
        out: List[bytes] = []
        if self._root == 0xFFFFFFFFFFFFFFFF:
            return out

        def walk(pgno):
            raw = self._page(pgno)
            n = self._numkeys(raw)
            if self._page_flags(raw) & P_BRANCH:
                for i in range(n):
                    lo, hi, fl, _, _ = self._node(raw, i)
                    walk(_node_pgno(lo, hi, fl))
            else:
                for i in range(n):
                    _, _, _, k, _ = self._node(raw, i)
                    out.append(k)

        walk(self._root)
        return out

    def close(self):
        self._f.close()


class _PageBuf:
    """One page under construction: nodes appended top-down."""

    def __init__(self, pgno: int, flags: int):
        self.pgno = pgno
        self.flags = flags
        self.ptrs: List[int] = []
        self.tail = bytearray()  # node storage, grows downward from PAGE
        self.upper = PAGE

    def free(self) -> int:
        return self.upper - (HDRSZ + 2 * len(self.ptrs)) - 2  # room for ptr

    def add(self, node: bytes):
        self.upper -= len(node)
        self.ptrs.append(self.upper)
        self.tail[0:0] = node  # prepend (nodes packed downward)

    def render(self) -> bytes:
        lower = HDRSZ + 2 * len(self.ptrs)
        out = bytearray(PAGE)
        struct.pack_into("<QHH", out, 0, self.pgno, 0, self.flags)
        struct.pack_into("<HH", out, 12, lower, self.upper)
        for i, p in enumerate(self.ptrs):
            struct.pack_into("<H", out, HDRSZ + 2 * i, p)
        out[self.upper:PAGE] = self.tail
        return bytes(out)


def _leaf_node(key: bytes, data: bytes, big_pgno: Optional[int]) -> bytes:
    dsize = len(data)
    if big_pgno is not None:
        body = struct.pack("<Q", big_pgno)
        flags = F_BIGDATA
    else:
        body = data
        flags = 0
    return (struct.pack("<HHHH", dsize & 0xFFFF, dsize >> 16, flags,
                        len(key)) + key + body)


def _branch_node(key: bytes, pgno: int) -> bytes:
    return (struct.pack("<HHHH", pgno & 0xFFFF, (pgno >> 16) & 0xFFFF,
                        (pgno >> 32) & 0xFFFF, len(key)) + key)


def write_lmdb(path: str, items: Iterable[Tuple[bytes, bytes]],
               map_size: int = 1 << 34) -> Dict[str, int]:
    """Write ``items`` ((key, value), pre-sorted or not) as ``path/data.mdb``.

    Single bulk transaction, bottom-up B-tree build; values larger than a
    quarter page go to overflow pages (like liblmdb). Returns stats.
    """
    items = sorted(
        (k.encode() if isinstance(k, str) else k,
         v.encode() if isinstance(v, str) else v)
        for k, v in items
    )
    os.makedirs(path, exist_ok=True)
    fpath = os.path.join(path, "data.mdb")

    pages: List[bytes] = [b"", b""]  # meta placeholders (pgno 0, 1)
    next_pg = 2
    n_overflow = 0

    def alloc() -> int:
        nonlocal next_pg
        next_pg += 1
        return next_pg - 1

    big_threshold = PAGE // 4  # liblmdb: values > pagesize/4 overflow

    # ------------------------------------------------------------ leaves
    leaves: List[Tuple[bytes, int]] = []  # (first_key, pgno)
    leaf: Optional[_PageBuf] = None
    overflow_chunks: List[Tuple[int, bytes]] = []
    for k, v in items:
        big = None
        if len(v) > big_threshold:
            npg = (HDRSZ + len(v) + PAGE - 1) // PAGE
            big = alloc()
            for _ in range(npg - 1):
                alloc()
            hdr = bytearray(PAGE * npg)
            struct.pack_into("<QHH", hdr, 0, big, 0, P_OVERFLOW)
            struct.pack_into("<I", hdr, 12, npg)
            hdr[HDRSZ: HDRSZ + len(v)] = v
            overflow_chunks.append((big, bytes(hdr)))
            n_overflow += npg
        node = _leaf_node(k, v, big)
        if leaf is None or leaf.free() < len(node):
            if leaf is not None:
                pages.append(None)  # placeholder; rendered later
            leaf = _PageBuf(alloc(), P_LEAF)
            leaves.append([k, leaf])
        leaf.add(node)
    # collect rendered leaves in pgno order later
    leaf_pages = {pb.pgno: pb for _, pb in leaves}

    # ----------------------------------------------------------- branches
    level: List[Tuple[bytes, int]] = [(k, pb.pgno) for k, pb in leaves]
    branch_pages: Dict[int, _PageBuf] = {}
    depth = 1
    while len(level) > 1:
        depth += 1
        nxt: List[Tuple[bytes, int]] = []
        buf: Optional[_PageBuf] = None
        for idx, (k, pg) in enumerate(level):
            first_in_page = buf is None
            key = b"" if first_in_page else k
            node = _branch_node(key, pg)
            if buf is not None and buf.free() < len(node):
                buf = None
                first_in_page = True
                node = _branch_node(b"", pg)
            if buf is None:
                buf = _PageBuf(alloc(), P_BRANCH)
                branch_pages[buf.pgno] = buf
                nxt.append([k, buf.pgno])
            buf.add(node)
        level = nxt
    root = level[0][1] if level else 0xFFFFFFFFFFFFFFFF
    if not items:
        depth = 0

    # ------------------------------------------------------------ assemble
    total_pages = next_pg
    blob = bytearray(total_pages * PAGE)
    for pgno, pb in leaf_pages.items():
        blob[pgno * PAGE:(pgno + 1) * PAGE] = pb.render()
    for pgno, pb in branch_pages.items():
        blob[pgno * PAGE:(pgno + 1) * PAGE] = pb.render()
    for pgno, chunk in overflow_chunks:
        blob[pgno * PAGE: pgno * PAGE + len(chunk)] = chunk

    n_branch = len(branch_pages)
    n_leaf = len(leaf_pages)
    for mpg, txnid in ((0, 0), (1, 1)):
        off = mpg * PAGE
        struct.pack_into("<QHH", blob, off, mpg, 0, P_META)
        _META_HEAD.pack_into(blob, off + HDRSZ, MAGIC, VERSION, 0,
                             max(map_size, total_pages * PAGE))
        dboff = off + HDRSZ + _META_HEAD.size
        # FREE_DBI: empty
        _DB.pack_into(blob, dboff, 0, 0, 0, 0, 0, 0, 0,
                      0xFFFFFFFFFFFFFFFF)
        # MAIN_DBI
        _DB.pack_into(blob, dboff + _DB.size, 0, 0, depth, n_branch,
                      n_leaf, n_overflow, len(items), root)
        _META_TAIL.pack_into(blob, dboff + 2 * _DB.size,
                             total_pages - 1, txnid)

    with open(fpath, "wb") as f:
        f.write(blob)
    return {"entries": len(items), "pages": total_pages,
            "leaf_pages": n_leaf, "branch_pages": n_branch,
            "overflow_pages": n_overflow, "depth": depth}
