"""BGZF (blocked gzip) reading and writing.

Used for bgzip-compressed FASTA (with .gzi block indexes) and BAM files.
Replaces the reference's use of boost::iostreams gzip + manual .gzi seeking
(/root/reference/libpanvc3/compressed_fasta_reader.cc:163-215) with a plain
Python implementation; a C++ fast path can be slotted in later for bulk
decompression.
"""

from __future__ import annotations

import os
import struct
import zlib

BGZF_MAGIC = b"\x1f\x8b\x08\x04"
# Empty BGZF block used as EOF marker (fixed 28-byte sequence from the spec).
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)
MAX_BLOCK_UNCOMPRESSED = 65280


def is_bgzf(path: str) -> bool:
    with open(path, "rb") as fh:
        return fh.read(4) == BGZF_MAGIC


def _native_bgzf():
    """The C parallel codec (native/bgzf.c), or None."""
    from ..native import get_native

    nat = get_native()
    if nat is not None and hasattr(nat, "bgzf_decompress"):
        return nat
    return None


def bgzf_threads() -> int:
    v = os.environ.get("PANVC3_BGZF_THREADS")
    if v:
        return max(1, int(v))
    return min(8, os.cpu_count() or 1)


def _parse_block_header(buf, off: int) -> int:
    """BSIZE (total compressed block size) of the block at ``off``, or 0
    if the header is incomplete; raises on a non-BGZF prefix."""
    if off + 12 > len(buf):
        return 0
    if bytes(buf[off:off + 4]) != BGZF_MAGIC:
        raise ValueError("not a BGZF block")
    xlen = struct.unpack_from("<H", buf, off + 10)[0]
    end = off + 12 + xlen
    if end > len(buf):
        return 0
    xo = off + 12
    while xo + 4 <= end:
        si1, si2 = buf[xo], buf[xo + 1]
        slen = struct.unpack_from("<H", buf, xo + 2)[0]
        if si1 == 66 and si2 == 67 and slen == 2 and xo + 6 <= end:
            return struct.unpack_from("<H", buf, xo + 4)[0] + 1
        xo += 4 + slen
    raise ValueError("BGZF block without BC subfield")


def whole_block_prefix(buf) -> int:
    """Largest p such that buf[:p] consists of whole BGZF blocks."""
    off = 0
    n = len(buf)
    while off < n:
        bsize = _parse_block_header(buf, off)
        if bsize == 0 or off + bsize > n:
            break
        off += bsize
    return off


def _read_block(fh) -> tuple[bytes, int] | None:
    """Read one BGZF block; returns (uncompressed_payload, compressed_size)
    or None at EOF."""
    header = fh.read(12)
    if not header:
        return None
    if len(header) < 12 or header[:4] != BGZF_MAGIC:
        raise ValueError("not a BGZF block")
    xlen = struct.unpack("<H", header[10:12])[0]
    extra = fh.read(xlen)
    bsize = None
    off = 0
    while off + 4 <= len(extra):
        si1, si2, slen = extra[off], extra[off + 1], struct.unpack("<H", extra[off + 2:off + 4])[0]
        if si1 == 66 and si2 == 67 and slen == 2:
            bsize = struct.unpack("<H", extra[off + 4:off + 6])[0] + 1
        off += 4 + slen
    if bsize is None:
        raise ValueError("BGZF block without BC subfield")
    cdata_len = bsize - 12 - xlen - 8
    cdata = fh.read(cdata_len)
    crc, isize = struct.unpack("<II", fh.read(8))
    data = zlib.decompress(cdata, -15)
    if len(data) != isize:
        raise ValueError("BGZF block length mismatch")
    return data, bsize


def read_all(path: str) -> bytes:
    """Decompress an entire BGZF file (parallel inflate when the native
    codec is built)."""
    nat = _native_bgzf()
    if nat is not None:
        with open(path, "rb") as fh:
            return nat.bgzf_decompress(fh.read(), bgzf_threads())
    chunks = []
    with open(path, "rb") as fh:
        while True:
            blk = _read_block(fh)
            if blk is None:
                break
            chunks.append(blk[0])
    return b"".join(chunks)


class BgzfReader:
    """Random-access BGZF reader backed by a block index.

    The index is either loaded from a ``.gzi`` file (pairs of
    (compressed offset, uncompressed offset) as little-endian u64, entry
    count first — the bgzip format the reference parses at
    compressed_fasta_reader.cc:163-215) or built by scanning the file.
    """

    def __init__(self, path: str, gzi_path: str | None = None):
        self.path = path
        self._fh = open(path, "rb")
        if gzi_path is not None:
            self._blocks = self._load_gzi(gzi_path)
        else:
            self._blocks = self._scan_blocks()

    @staticmethod
    def _load_gzi(path: str) -> list[tuple[int, int]]:
        with open(path, "rb") as fh:
            (count,) = struct.unpack("<Q", fh.read(8))
            entries = [(0, 0)]
            for _ in range(count):
                comp, uncomp = struct.unpack("<QQ", fh.read(16))
                entries.append((comp, uncomp))
        return entries

    def _scan_blocks(self) -> list[tuple[int, int]]:
        # header-walk only: BSIZE from the BC subfield, ISIZE from the
        # trailer — no inflate needed to build the index
        entries = [(0, 0)]
        comp = uncomp = 0
        self._fh.seek(0)
        while True:
            header = self._fh.read(12)
            if not header:
                break
            if len(header) < 12 or header[:4] != BGZF_MAGIC:
                raise ValueError("not a BGZF block")
            xlen = struct.unpack("<H", header[10:12])[0]
            extra = self._fh.read(xlen)
            bsize = _parse_block_header(header + extra, 0)
            if bsize == 0:
                raise ValueError("truncated BGZF header")
            self._fh.seek(comp + bsize - 4)
            (isize,) = struct.unpack("<I", self._fh.read(4))
            comp += bsize
            uncomp += isize
            entries.append((comp, uncomp))
        return entries

    def close(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def read_range(self, start: int, length: int) -> bytes:
        """Read ``length`` uncompressed bytes starting at uncompressed
        offset ``start``, seeking via the block index."""
        if length <= 0:
            return b""
        # find last block with uncompressed offset <= start
        lo, hi = 0, len(self._blocks) - 1
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if self._blocks[mid][1] <= start:
                lo = mid
            else:
                hi = mid - 1
        comp_off, uncomp_off = self._blocks[lo]
        self._fh.seek(comp_off)
        nat = _native_bgzf()
        if nat is not None:
            # compressed span covering [start, start+length), inflated in
            # parallel
            j = lo + 1
            nb = len(self._blocks)
            while j < nb and self._blocks[j][1] <= start + length - 1:
                j += 1
            if j < nb:
                span = self._fh.read(self._blocks[j][0] - comp_off)
            else:
                span = self._fh.read()
            data = nat.bgzf_decompress(span, bgzf_threads())
            off = start - uncomp_off
            return data[off:off + length]
        out = []
        have = 0
        skip = start - uncomp_off
        while have < length:
            blk = _read_block(self._fh)
            if blk is None:
                break
            data = blk[0]
            if skip:
                if skip >= len(data):
                    skip -= len(data)
                    continue
                data = data[skip:]
                skip = 0
            out.append(data)
            have += len(data)
        return b"".join(out)[:length]


class BgzfWriter:
    """Streaming BGZF writer (used for BAM and bgzipped text output).

    With the native codec built, whole blocks are deflated in parallel
    over pthreads in ~4 MiB batches (same 65280-byte block framing, so
    the output stream is structurally identical to the per-block path)."""

    def __init__(self, fileobj, level: int = 6):
        self._fh = fileobj
        self._level = level
        self._buf = bytearray()
        self._nat = _native_bgzf()
        self._flush_at = MAX_BLOCK_UNCOMPRESSED * (64 if self._nat else 1)

    def write(self, data: bytes) -> None:
        self._buf += data
        if self._nat is not None:
            if len(self._buf) >= self._flush_at:
                whole = (
                    len(self._buf) // MAX_BLOCK_UNCOMPRESSED
                ) * MAX_BLOCK_UNCOMPRESSED
                self._fh.write(
                    self._nat.bgzf_compress(
                        bytes(self._buf[:whole]), self._level, bgzf_threads()
                    )
                )
                del self._buf[:whole]
            return
        while len(self._buf) >= MAX_BLOCK_UNCOMPRESSED:
            self._flush_block(self._buf[:MAX_BLOCK_UNCOMPRESSED])
            del self._buf[:MAX_BLOCK_UNCOMPRESSED]

    def _flush_block(self, data: bytes) -> None:
        co = zlib.compressobj(self._level, zlib.DEFLATED, -15)
        cdata = co.compress(bytes(data)) + co.flush()
        bsize = len(cdata) + 25 + 1
        header = (
            BGZF_MAGIC
            + b"\x00\x00\x00\x00\x00\xff"
            + struct.pack("<H", 6)
            + b"BC"
            + struct.pack("<H", 2)
            + struct.pack("<H", bsize - 1)
        )
        footer = struct.pack("<II", zlib.crc32(bytes(data)) & 0xFFFFFFFF, len(data))
        self._fh.write(header + cdata + footer)

    def close(self) -> None:
        if self._buf:
            if self._nat is not None:
                self._fh.write(
                    self._nat.bgzf_compress(
                        bytes(self._buf), self._level, bgzf_threads()
                    )
                )
            else:
                self._flush_block(bytes(self._buf))
            self._buf.clear()
        self._fh.write(BGZF_EOF)
        self._fh.flush()
