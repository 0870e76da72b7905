"""Vectorised rank0/select0 over packed gap bitvectors on device.

The TPU-native replacement for sdsl rank/select supports
(/root/reference/include/panvc3/msa_index.hh:43-54): the host-side
GapBitVector arrays (uint32 words + per-word cumulative zero counts) are
concatenated across sequences into flat HBM-resident buffers; queries are
batched arrays of (sequence id, position), answered with gathers +
``lax.population_count`` and fixed-trip-count binary searches — no
data-dependent control flow, so everything fuses under jit and shards
trivially over the query batch dimension.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..bitvec import GapBitVector


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceGapIndex:
    """Flattened, device-friendly stack of gap bitvectors.

    Sequences are identified by dense ids (order of construction).  All
    arrays are immutable; the whole structure is a pytree so it can be
    donated/replicated/sharded with jax.device_put or closed over in jit.
    """

    words: jnp.ndarray        # uint32[total_words] packed bits
    brank: jnp.ndarray        # int32[total_brank] per-word cumulative zeros (len nwords+1 per seq)
    seq_word_off: jnp.ndarray  # int32[S]
    seq_brank_off: jnp.ndarray  # int32[S]
    seq_nwords: jnp.ndarray   # int32[S]
    seq_nzeros: jnp.ndarray   # int32[S]
    search_steps: int         # static: ceil(log2(max nwords + 1))

    def tree_flatten(self):
        children = (
            self.words, self.brank, self.seq_word_off, self.seq_brank_off,
            self.seq_nwords, self.seq_nzeros,
        )
        return children, self.search_steps

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)

    @classmethod
    def build(cls, vectors: list[GapBitVector]) -> "DeviceGapIndex":
        words_parts = []
        brank_parts = []
        word_off = []
        brank_off = []
        nwords = []
        nzeros = []
        woff = boff = 0
        for gv in vectors:
            words_parts.append(gv.words)
            brank_parts.append(gv.block_rank0.astype(np.int32))
            word_off.append(woff)
            brank_off.append(boff)
            nwords.append(len(gv.words))
            nzeros.append(gv.n_zeros)
            woff += len(gv.words)
            boff += len(gv.block_rank0)
        max_nwords = max(nwords) if nwords else 1
        return cls(
            words=jnp.asarray(np.concatenate(words_parts) if words_parts else np.zeros(1, np.uint32)),
            brank=jnp.asarray(np.concatenate(brank_parts) if brank_parts else np.zeros(1, np.int32)),
            seq_word_off=jnp.asarray(np.array(word_off, np.int32)),
            seq_brank_off=jnp.asarray(np.array(brank_off, np.int32)),
            seq_nwords=jnp.asarray(np.array(nwords, np.int32)),
            seq_nzeros=jnp.asarray(np.array(nzeros, np.int32)),
            search_steps=max(1, math.ceil(math.log2(max_nwords + 1))),
        )

    # -- queries (all element-wise over same-shaped int32 arrays) ----------

    def rank0(self, seq: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """Zeros strictly before ``pos`` in sequence ``seq``."""
        pos = pos.astype(jnp.int32)
        wi = pos >> 5
        bi = (pos & 31).astype(jnp.uint32)
        base = self.brank[self.seq_brank_off[seq] + wi]
        w = self.words[self.seq_word_off[seq] + wi]
        mask = ((jnp.uint32(1) << bi) - jnp.uint32(1)).astype(jnp.uint32)
        inword = jax.lax.population_count((~w) & mask).astype(jnp.int32)
        return base + inword

    def bit(self, seq: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        pos = pos.astype(jnp.int32)
        w = self.words[self.seq_word_off[seq] + (pos >> 5)]
        return ((w >> (pos & 31).astype(jnp.uint32)) & jnp.uint32(1)).astype(jnp.int32)

    def select0(self, seq: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
        """Position of the k-th zero (1-based) in sequence ``seq``.

        Per-sequence binary search over the block-rank table (fixed
        ``search_steps`` trips), then a 5-step in-word popcount search.
        """
        k = k.astype(jnp.int32)
        boff = self.seq_brank_off[seq]
        n = self.seq_nwords[seq]

        # find largest j in [0, n-1] with brank[boff + j] < k
        lo = jnp.zeros_like(k)
        hi = n - 1  # inclusive
        for _ in range(self.search_steps):
            mid = (lo + hi + 1) >> 1
            go_right = self.brank[boff + mid] < k
            lo = jnp.where(go_right, mid, lo)
            hi = jnp.where(go_right, hi, mid - 1)
        wi = lo
        rem = k - self.brank[boff + wi]  # 1-based zero rank within word
        inv = (~self.words[self.seq_word_off[seq] + wi]).astype(jnp.uint32)

        pos = jnp.zeros_like(k)
        cur = jnp.zeros_like(k)
        shifted = inv
        width = 16
        while width:
            lower = shifted & ((jnp.uint32(1) << jnp.uint32(width)) - jnp.uint32(1))
            cnt = jax.lax.population_count(lower).astype(jnp.int32)
            go_right = cnt < rem - cur
            cur = jnp.where(go_right, cur + cnt, cur)
            pos = jnp.where(go_right, pos + width, pos)
            shifted = jnp.where(go_right, shifted >> jnp.uint32(width), lower).astype(jnp.uint32)
            width >>= 1
        return (wi << 5) + pos
