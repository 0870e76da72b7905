"""Pallas TPU kernel for the affine-gap DP fill.

The batched fill in :mod:`panvc3_tpu.ops.realign_batch` runs as XLA ops (a
scan of vector ops per DP row).  This Pallas version keeps the whole
wavefront in VMEM and emits the packed trace without round-tripping row
state through HBM:

- grid over batch tiles; each program owns (TB, Q, R) substitution scores
  and writes (TB, Q+1, R+1) packed trace bytes;
- the row recurrence is a ``fori_loop`` whose carry (best/vert rows) lives
  in VMEM scratch;
- the in-row horizontal-gap prefix max uses the same log-step doubling as
  the XLA path, built from shift-and-mask (no associative_scan).

Semantics are identical to ``realign_batch._fill_batch`` (same trace bits
and tie-breaking); tests assert bit-equality in interpreter mode and the
engine only enables the kernel on real TPU backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = np.float32(-1e30)

_TR_DIAG = 0
_TR_VERT = 1
_TR_HORIZ = 2


def _fill_kernel(m_ref, n_ref, go_ref, ge_ref, sub_ref, trace_ref, best_s, vert_s):
    """One batch tile: sub (Q, TB, W) -> trace (Q+1, TB, W).

    The DP row index is the leading (untiled) dimension so the per-row
    loads/stores use a dynamic leading offset (Mosaic cannot prove
    alignment for dynamic indices into the tiled sublane dimension).  W is
    the lane-padded working width (>= R+1, multiple of 128); columns beyond
    R+1 are inert (masked to NEG / zero trace)."""
    Q, TB, W = sub_ref.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
    go = go_ref[0]
    ge = ge_ref[0]
    n = n_ref[...]  # (TB, 1) column vectors: 1-D int operands hit XLA/Mosaic
    m = m_ref[...]  # layout mismatches, so lengths ship 2-D
    col_valid = cols <= n

    best0 = jnp.where(cols == 0, 0.0, go + ge * cols.astype(jnp.float32))
    best0 = jnp.where(col_valid, best0, NEG)
    tr0 = jnp.where(cols == 0, 0, _TR_HORIZ)
    tr0 = tr0 | jnp.where(cols == 1, 8, 0)
    trace_ref[0] = tr0.astype(jnp.uint8)
    best_s[...] = best0
    vert_s[...] = jnp.full((TB, W), NEG)

    def shift_right(x, k, fill):
        rolled = pltpu.roll(x, k, axis=1)
        return jnp.where(cols < k, fill, rolled)

    def row_body(i, _):
        best_prev = best_s[...]
        vert_prev = vert_s[...]
        srow = sub_ref[i - 1]  # (TB, W); col j holds s(query i-1, ref j-1) shifted below
        row_valid = i <= m

        v_open = best_prev + go + ge
        v_ext = vert_prev + ge
        vopen_bit = v_open >= v_ext
        vert = jnp.maximum(v_open, v_ext)

        diag_shift = shift_right(best_prev, 1, NEG)
        srow_pad = shift_right(srow, 1, np.float32(0.0))
        diag = jnp.where(cols == 0, NEG, diag_shift + srow_pad)
        a = jnp.maximum(diag, vert)
        border = go + ge * i.astype(jnp.float32)
        a = jnp.where(cols == 0, border, a)
        vert = jnp.where(cols == 0, border, vert)

        shifted = a + go - ge * cols.astype(jnp.float32)
        run = shift_right(shifted, 1, NEG)
        k = 1
        while k < W:
            run = jnp.maximum(run, shift_right(run, k, NEG))
            k <<= 1
        horiz = run + ge * cols.astype(jnp.float32)
        horiz = jnp.where(cols == 0, NEG, horiz)
        best = jnp.maximum(a, horiz)

        h_prev = shift_right(horiz, 1, NEG)
        b_prev = shift_right(best, 1, NEG)
        hopen_bit = b_prev + go >= h_prev

        # trace math in int32 (8-bit vector masks force unsupported
        # relayouts in Mosaic); cast at the store
        tr = jnp.where(diag >= vert, _TR_DIAG, _TR_VERT)
        tr = jnp.where(horiz > a, _TR_HORIZ, tr)
        tr = jnp.where(cols == 0, _TR_VERT, tr)
        packed = tr | jnp.where(vopen_bit, 4, 0) | jnp.where(hopen_bit, 8, 0)
        best = jnp.where(col_valid, best, NEG)
        vert = jnp.where(col_valid, vert, NEG)

        best = jnp.where(row_valid, best, best_prev)
        vert = jnp.where(row_valid, vert, vert_prev)
        packed = jnp.where(row_valid, packed, 0)

        trace_ref[i] = packed.astype(jnp.uint8)
        best_s[...] = best
        vert_s[...] = vert
        return 0

    jax.lax.fori_loop(1, Q + 1, row_body, 0)


@partial(jax.jit, static_argnames=("R", "Q", "interpret"))
def fill_batch_pallas(sub, m, n, go, ge, R: int, Q: int, interpret: bool = False):
    """Drop-in for realign_batch._fill_batch backed by the Pallas kernel.

    The kernel works at a 128-lane-aligned width W >= R+1; the substitution
    scores are pre-shifted into cols [1, R] of a (B, Q, W) buffer and the
    trace is sliced back to (B, Q+1, R+1).
    """
    B = sub.shape[0]
    TB = min(B, 128)
    n_tiles = pl.cdiv(B, TB)
    W = max(128, -(-(R + 1) // 128) * 128)
    pad = n_tiles * TB - B
    sub_w = jnp.zeros((sub.shape[1], n_tiles * TB, W), jnp.float32)
    sub_w = sub_w.at[:, :B, :R].set(jnp.swapaxes(sub, 0, 1))
    if pad:
        m = jnp.pad(m, (0, pad))
        n = jnp.pad(n, (0, pad))

    trace = pl.pallas_call(
        _fill_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((sub.shape[1], TB, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Q + 1, TB, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Q + 1, n_tiles * TB, W), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((TB, W), jnp.float32),
            pltpu.VMEM((TB, W), jnp.float32),
        ],
        interpret=interpret,
    )(
        m.astype(jnp.int32)[:, None],
        n.astype(jnp.int32)[:, None],
        jnp.asarray([go], jnp.float32),
        jnp.asarray([ge], jnp.float32),
        sub_w,
    )
    return jnp.swapaxes(trace, 0, 1)[:B, :, :R + 1]
