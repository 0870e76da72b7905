"""BGZF (blocked gzip) reading and writing.

Used for bgzip-compressed FASTA (with .gzi block indexes) and BAM files.
Replaces the reference's use of boost::iostreams gzip + manual .gzi seeking
(/root/reference/libpanvc3/compressed_fasta_reader.cc:163-215) with a plain
Python implementation; a C++ fast path can be slotted in later for bulk
decompression.
"""

from __future__ import annotations

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
    """Decompress an entire BGZF file."""
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
        entries = [(0, 0)]
        comp = uncomp = 0
        self._fh.seek(0)
        while True:
            blk = _read_block(self._fh)
            if blk is None:
                break
            data, bsize = blk
            comp += bsize
            uncomp += len(data)
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
    """Streaming BGZF writer (used for BAM and bgzipped text output)."""

    def __init__(self, fileobj, level: int = 6):
        self._fh = fileobj
        self._level = level
        self._buf = bytearray()

    def write(self, data: bytes) -> None:
        self._buf += data
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
            self._flush_block(bytes(self._buf))
            self._buf.clear()
        self._fh.write(BGZF_EOF)
        self._fh.flush()
