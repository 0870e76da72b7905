"""Packed gap bitvectors with O(1) rank0 and fast select0.

TPU-native replacement for the reference's ``sdsl::rrr_vector<15>`` plus
rank0/select0 supports (/root/reference/include/panvc3/msa_index.hh:43-54,
239-258).  Instead of RRR compression we store:

- ``words``:      uint32[ceil(n/32)] packed bits (bit i of word w = position
                  32*w + i; 1 == gap),
- ``block_rank0``: int64[ceil(n/32)+1] cumulative count of zeros strictly
                  before each word boundary.

rank0(pos)   = block_rank0[pos>>5] + popcount(~word & mask(pos&31))
select0(k)   = binary search block_rank0 for the word containing the k-th
               zero, then an in-word popcount binary search.

Both are branch-free gather+popcount pipelines, which is exactly what the
TPU's VPU wants; the same arrays are uploaded to HBM unchanged for the
batched device kernels in :mod:`panvc3_tpu.ops.rank_select`.
"""

from __future__ import annotations

import numpy as np


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """Pack a bool/0-1 array into uint32 words (little-endian bit order)."""
    bits = np.asarray(bits, dtype=np.uint8)
    n = bits.shape[0]
    n_words = (n + 31) // 32
    padded = np.zeros(n_words * 32, dtype=np.uint8)
    padded[:n] = bits
    b = padded.reshape(n_words, 4, 8)
    weights = (1 << np.arange(8, dtype=np.uint32))
    bytes_ = (b * weights).sum(axis=2).astype(np.uint32)
    shifts = np.uint32(8) * np.arange(4, dtype=np.uint32)
    return (bytes_ << shifts).sum(axis=1, dtype=np.uint32)


def unpack_bits(words: np.ndarray, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint8[n]."""
    words = np.asarray(words, dtype=np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    bits = ((words[:, None] >> shifts) & 1).astype(np.uint8).reshape(-1)
    return bits[:n]


def _popcount32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    x = x - ((x >> 1) & np.uint32(0x55555555))
    x = (x & np.uint32(0x33333333)) + ((x >> 2) & np.uint32(0x33333333))
    x = (x + (x >> 4)) & np.uint32(0x0F0F0F0F)
    # sum the four bytes; go through uint64 to avoid intended-wraparound warnings
    return (((x.astype(np.uint64) * np.uint64(0x01010101)) >> np.uint64(24)) & np.uint64(0xFF)).astype(np.int64)


class GapBitVector:
    """Gap bitvector (1 == gap) with rank0/select0 support.

    Positions are over the *aligned* (MSA column) coordinate space; zeros
    correspond to actual sequence characters ("unaligned" positions).
    """

    __slots__ = ("n", "n_zeros", "words", "block_rank0")

    def __init__(self, words: np.ndarray, n: int, block_rank0: np.ndarray | None = None):
        self.words = np.ascontiguousarray(words, dtype=np.uint32)
        self.n = int(n)
        if block_rank0 is None:
            # zeros per word; padding bits beyond n are zeros in the packed
            # representation, so mask them out of the last word's count.
            zeros_per_word = 32 - _popcount32(self.words)
            tail = self.n & 31
            if tail and len(zeros_per_word):
                pad = 32 - tail
                zeros_per_word[-1] -= pad
            block_rank0 = np.zeros(len(self.words) + 1, dtype=np.int64)
            np.cumsum(zeros_per_word, out=block_rank0[1:])
        self.block_rank0 = np.ascontiguousarray(block_rank0, dtype=np.int64)
        self.n_zeros = int(self.block_rank0[-1])

    @classmethod
    def from_gap_string(cls, seq: str | bytes, gap: str = "-") -> "GapBitVector":
        """Build from an aligned sequence string; ``gap`` chars set bits.

        Mirrors detail::fill_gaps (/root/reference/include/panvc3/msa_index.hh:19-33).
        """
        if isinstance(seq, str):
            seq = seq.encode("ascii")
        arr = np.frombuffer(seq, dtype=np.uint8)
        bits = (arr == ord(gap)).astype(np.uint8)
        return cls(pack_bits(bits), len(bits))

    @classmethod
    def from_bits(cls, bits: np.ndarray) -> "GapBitVector":
        bits = np.asarray(bits, dtype=np.uint8)
        return cls(pack_bits(bits), len(bits))

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, pos: int) -> int:
        return int((self.words[pos >> 5] >> np.uint32(pos & 31)) & 1)

    def bit_at(self, pos) -> np.ndarray:
        """Vectorised bit read at aligned positions."""
        pos = np.asarray(pos, dtype=np.int64)
        return ((self.words[pos >> 5] >> (pos & 31).astype(np.uint32)) & 1).astype(np.uint8)

    # -- rank/select -------------------------------------------------------

    def rank0(self, pos) -> np.ndarray:
        """Number of zeros strictly before aligned position ``pos``.

        Matches sdsl rank0 semantics used by project_aligned_position
        (/root/reference/include/panvc3/msa_index.hh:246-250).  Vectorised.
        """
        pos = np.asarray(pos, dtype=np.int64)
        word_idx = pos >> 5
        bit_idx = (pos & 31).astype(np.uint32)
        base = self.block_rank0[word_idx]
        mask = (np.uint64(1) << bit_idx.astype(np.uint64)) - np.uint64(1)
        inword = _popcount32((~self.words[word_idx]) & mask.astype(np.uint32))
        return base + inword

    def select0(self, k) -> np.ndarray:
        """Aligned position of the k-th zero (1-based k, sdsl semantics).

        ``select0(1 + unaligned_pos)`` converts an unaligned position to its
        aligned position, as in sequence_entry::aligned_position
        (/root/reference/include/panvc3/msa_index.hh:239-243).  Vectorised.
        """
        k = np.asarray(k, dtype=np.int64)
        # word containing the k-th zero: last word index w with block_rank0[w] < k
        word_idx = np.searchsorted(self.block_rank0, k, side="left") - 1
        rem = k - self.block_rank0[word_idx]  # 1-based rank of the zero within the word
        inv = (~self.words[word_idx]).astype(np.uint32)
        # in-word binary search over 5 levels using prefix popcounts
        pos = np.zeros_like(k)
        cur = np.zeros_like(k)
        width = 16
        shifted = inv
        while width:
            lower = shifted & ((np.uint32(1) << np.uint32(width)) - np.uint32(1))
            cnt = _popcount32(lower)
            go_right = cnt < rem - cur
            cur = np.where(go_right, cur + cnt, cur)
            pos = np.where(go_right, pos + width, pos)
            shifted = np.where(go_right, shifted >> np.uint32(width), lower).astype(np.uint32)
            width >>= 1
        return (word_idx << 5) + pos

    # -- (de)serialisation -------------------------------------------------

    def state(self) -> dict:
        return {"words": self.words, "n": np.int64(self.n), "block_rank0": self.block_rank0}

    @classmethod
    def from_state(cls, words, n, block_rank0) -> "GapBitVector":
        return cls(np.asarray(words, dtype=np.uint32), int(n), np.asarray(block_rank0, dtype=np.int64))
