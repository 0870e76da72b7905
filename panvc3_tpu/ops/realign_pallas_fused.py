"""Fused Pallas realignment kernel: DP fill + traceback in ONE launch.

The XLA path (ops/realign_batch._fill_batch + _traceback_batch) is
bit-exact but runs as ~Q + (R+Q) serialized scan steps, each a separate
tiny HLO loop iteration whose per-step overhead (~35 us on the v5e)
dominates: at (16384, 16, 16) the whole DP moves ~50 MB/iter yet sustains
only ~27 GB/s — step-latency-bound, not bandwidth-bound.  This kernel
collapses everything into one pallas_call per batch tile:

- layout is batch-in-lanes: every working array is (sublanes, TILE_B)
  with the DP column axis (R+1) or the flattened trace axis
  ((Q+1)*(R+1)) in sublanes, so each row step is pure VPU work;
- the packed trace lives in a VMEM scratch for the traceback — it never
  touches HBM;
- the per-record dynamic trace reads of the traceback use the same
  one-hot masked-sum formulation as the XLA kernel (gather/scatter-free),
  but over VMEM.

The math replicates ops/realign_batch bit for bit — same recurrences,
same tie-breaking (diag >= vert > horiz, open >= extend via the 4/8 trace
bits), same 127 filler — and is differential-tested against it in
tests/test_device_ops.py (interpret mode on CPU, compiled on TPU).
Integer and quality scoring are both supported: the substitution scores
arrive precomputed, transposed to (Q, R, B).

Kernel-internal trace encoding (VMEM only, never leaves the kernel): the
2-bit move code uses the spare value 3 for a MISMATCHING diagonal
(0 = diag match, 3 = diag mismatch, 1/2 = vert/horiz as in
realign_batch).  That lets the traceback emit =/X straight from the code
instead of re-reading query/ref characters with two more one-hot sums
per step, and its packed-word read is one flattened-iota masked sum.
The OUTPUT (ops/count) stays bit-identical to the XLA kernel.

Reference semantics: align_global
(/root/reference/include/panvc3/align.hh:59-112).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .realign_batch import _TR_DIAG, _TR_HORIZ, _TR_VERT

# Python float (the module-level realign_batch.NEG is a traced jnp scalar,
# which pallas kernels cannot close over)
NEG = -1e30

# lanes per kernel tile (batch-in-lanes layout; must be a multiple of
# 128).  Read once at import; PANVC3_DP_TILE_B overrides for tuning.
TILE_B = int(os.environ.get("PANVC3_DP_TILE_B", "256"))


def _pick_tile(R: int, Q: int) -> int:
    """Shape-dependent lane count: 512 amortises the per-row-step VPU op
    overhead on small column counts (+32% at the 16-pad production shape,
    tools/probe_tile.py), but loses at 48-pad where the wider working set
    pressures VMEM; PANVC3_DP_TILE_B forces one width."""
    if "PANVC3_DP_TILE_B" in os.environ:
        return int(os.environ["PANVC3_DP_TILE_B"])
    return 512 if R + Q <= 48 else 256


def _kernel(go_ref, ge_ref, *refs, R: int, Q: int, has_sub: bool,
            has_qual: bool = False):
    if has_sub:
        (sub_ref, ref_ref, query_ref, m_ref, n_ref,
         ops_ref, count_ref, trace_ref) = refs
        mrow_ref = xrow_ref = qq_ref = None
    elif has_qual:
        # pinned-ref-quality Malde scoring (the production -q path: the
        # reference ALWAYS pins ref qualities to phred42 max) — the 64x64
        # tables collapse to two 64-entry rows indexed by the query phred,
        # so sub[i, j] = eq ? mrow[qq[i]] : xrow[qq[i]].  The per-position
        # score vectors are built in-kernel from the SMEM rows (no (B,Q,R)
        # sub tile, no VMEM blow-up at large run pads).
        (mrow_ref, xrow_ref, qq_ref, ref_ref, query_ref, m_ref, n_ref,
         ops_ref, count_ref, trace_ref) = refs
        sub_ref = None
    else:
        # integer scoring: the substitution row is a single compare —
        # computed in-kernel, skipping the (B, Q, R) f32 materialisation,
        # its HBM round trip and the XLA-side transpose entirely
        (ref_ref, query_ref, m_ref, n_ref,
         ops_ref, count_ref, trace_ref) = refs
        sub_ref = None
        mrow_ref = xrow_ref = qq_ref = None
    go = go_ref[0, 0]
    ge = ge_ref[0, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (R + 1, 1), 0)
    colsf = cols.astype(jnp.float32)
    n_row = n_ref[0:1, :]                                   # (1, TB)
    m_row = m_ref[0:1, :]
    col_valid = cols <= n_row                               # (R+1, TB)
    tb = n_row.shape[1]
    neg_row = jnp.full((1, tb), NEG, jnp.float32)

    # -- row 0 ---------------------------------------------------------
    # rows beyond every lane's query length carry packed == 0 in the XLA
    # kernel; prefill so the dynamic-bound fill loop can skip them.
    # trace is (Q+1, n_words, TB) with EIGHT 4-bit cells nibble-packed per
    # int32 word: the traceback's per-step one-hot read then scans
    # (Q+1)*n_words sublanes instead of (Q+1)*(R+1) — ~6x less work at
    # R=16.  The dynamic row index stays on the leading untiled dimension
    # (Mosaic requires tiled-dim offsets be multiples of the sublane
    # count).
    n_words = (R + 1 + 7) // 8

    def pack_words(packed):
        # packed: (R+1, TB) int32 of 4-bit cell values -> (n_words, TB)
        words = []
        for w in range(n_words):
            acc = jnp.zeros((1, tb), jnp.int32)
            for c in range(8 * w, min(8 * w + 8, R + 1)):
                acc = acc | (packed[c:c + 1, :] << (4 * (c - 8 * w)))
            words.append(acc)
        return jnp.concatenate(words, axis=0)

    trace_ref[:, :, :] = jnp.zeros_like(trace_ref)
    best = jnp.where(cols == 0, 0.0, go + ge * colsf)
    best = jnp.broadcast_to(best, (R + 1, tb))
    best = jnp.where(col_valid, best, NEG)
    vert = jnp.full((R + 1, tb), NEG, jnp.float32)
    tr0 = jnp.where(cols == 0, 0, _TR_HORIZ) | jnp.where(cols == 1, 8, 0)
    trace_ref[0, :, :] = pack_words(
        jnp.broadcast_to(tr0, (R + 1, tb)).astype(jnp.int32)
    )

    # -- fill: dynamic-bound loop over query rows ------------------------
    # (rows above the tile's longest query are no-ops — skip them)
    max_m = jnp.max(m_ref[0:1, :])
    q_iota_f = jax.lax.broadcasted_iota(jnp.int32, (Q, 1), 0)
    query_if = query_ref[:, :].astype(jnp.int32)            # (Q, TB)
    ref_if = ref_ref[:, :].astype(jnp.int32)                # (R, TB)

    if has_qual:
        # per-query-position match/mismatch scores (Q, TB): one-hot decode
        # of the two 64-entry pinned-row tables by the query phreds — pure
        # VPU selects, no gathers (each table read is a static-index SMEM
        # scalar)
        qq_i = qq_ref[:, :]                                 # (Q, TB) int32
        sm_all = jnp.zeros((Q, tb), jnp.float32)
        sx_all = jnp.zeros((Q, tb), jnp.float32)
        for v in range(64):
            sel = qq_i == v
            sm_all = jnp.where(sel, mrow_ref[v, 0], sm_all)
            sx_all = jnp.where(sel, xrow_ref[v, 0], sx_all)
    else:
        sm_all = sx_all = None

    def fill_row(i, carry):
        best_prev, vert_prev = carry
        row_valid = i <= m_row                              # (1, TB)

        v_open = best_prev + go + ge
        v_ext = vert_prev + ge
        vopen_bit = v_open >= v_ext
        vert = jnp.maximum(v_open, v_ext)

        # the =/X decision rides in the trace code (0 diag-match vs
        # 3 diag-mismatch), so every mode needs the row's equality vector
        onehot = q_iota_f == (i - 1)
        qch = jnp.sum(
            jnp.where(onehot, query_if, 0),
            axis=0,
            keepdims=True,
        )                                                   # (1, TB)
        eqrow = ref_if == qch                               # (R, TB)
        if has_sub:
            srow = sub_ref[i - 1, :, :]                     # (R, TB)
        elif has_qual:
            sm_row = jnp.sum(
                jnp.where(onehot, sm_all, 0.0), axis=0, keepdims=True
            )
            sx_row = jnp.sum(
                jnp.where(onehot, sx_all, 0.0), axis=0, keepdims=True
            )
            srow = jnp.where(eqrow, sm_row, sx_row)
        else:
            srow = jnp.where(eqrow, 0.0, -1.0).astype(jnp.float32)
        diag = jnp.concatenate([neg_row, best_prev[:-1, :] + srow], axis=0)
        diag = jnp.where(cols == 0, NEG, diag)
        a = jnp.maximum(diag, vert)
        border = go + ge * i.astype(jnp.float32)
        a = jnp.concatenate(
            [jnp.full((1, tb), border, jnp.float32), a[1:, :]], axis=0
        )
        vert = jnp.concatenate(
            [jnp.full((1, tb), border, jnp.float32), vert[1:, :]], axis=0
        )

        shifted = a + go - ge * colsf
        run = jnp.concatenate([neg_row, shifted[:-1, :]], axis=0)
        k = 1
        while k < R + 1:
            run = jnp.maximum(
                run,
                jnp.pad(run[:-k, :], ((k, 0), (0, 0)), constant_values=NEG),
            )
            k <<= 1
        horiz = run + ge * colsf
        horiz = jnp.where(cols == 0, NEG, horiz)
        best = jnp.maximum(a, horiz)

        h_prev = jnp.concatenate([neg_row, horiz[:-1, :]], axis=0)
        b_prev = jnp.concatenate([neg_row, best[:-1, :]], axis=0)
        hopen_bit = b_prev + go >= h_prev

        # diag at col c consumed ref[c-1]: shift the row's equality vector
        # into the (R+1)-column frame (col 0 is the border, never diag).
        # int32, not bool: Mosaic cannot concatenate i1 vectors.
        eq_col = jnp.concatenate(
            [jnp.zeros((1, tb), jnp.int32), eqrow.astype(jnp.int32)], axis=0
        )
        tr = jnp.where(
            diag >= vert, jnp.where(eq_col != 0, _TR_DIAG, 3), _TR_VERT
        )
        tr = jnp.where(horiz > a, _TR_HORIZ, tr)
        tr = jnp.where(cols == 0, _TR_VERT, tr)
        packed = tr | jnp.where(vopen_bit, 4, 0) | jnp.where(hopen_bit, 8, 0)
        best = jnp.where(col_valid, best, NEG)
        vert = jnp.where(col_valid, vert, NEG)

        best = jnp.where(row_valid, best, best_prev)
        vert = jnp.where(row_valid, vert, vert_prev)
        packed = jnp.where(row_valid, packed, 0)
        trace_ref[i, :, :] = pack_words(packed.astype(jnp.int32))
        return best, vert

    jax.lax.fori_loop(1, max_m + 1, fill_row, (best, vert))

    # -- traceback: dynamic-bound loop over <= R+Q steps -----------------
    # flat-index one-hot: ONE iota compare selects the (row, word) pair
    # (was two compares + AND over the same (Q+1)*n_words sublanes), and
    # the =/X decision comes from the trace code itself (no per-step
    # query/ref character one-hot sums).  flat3 folds to a constant.
    row_iota3 = jax.lax.broadcasted_iota(jnp.int32, (Q + 1, n_words, 1), 0)
    word_iota3 = jax.lax.broadcasted_iota(jnp.int32, (Q + 1, n_words, 1), 1)
    flat3 = row_iota3 * n_words + word_iota3
    trace = trace_ref[:, :, :]                          # (Q+1, n_words, TB)

    from ..cigar import D, EQ, I, X

    # steps beyond every lane's m+n only emit the 127 filler — prefill
    # and bound the loop by the tile's longest walk
    ops_ref[:, :, :] = jnp.full((R + Q, 1, tb), 127, jnp.int32)
    max_steps = jnp.max(m_row + n_row)

    def tb_step(step, carry):
        i, j, state, k = carry
        done = (i == 0) & (j == 0)
        idx = i * n_words + (j >> 3)                        # (1, TB)
        word = jnp.sum(
            jnp.where(flat3 == idx[None, :, :], trace, 0),
            axis=(0, 1),
            keepdims=False,
        )[None, :]                                          # (1, TB)
        cell = (word >> (4 * (j & 7))) & 15
        tr = cell & 3          # 0 diag-match, 3 diag-mismatch, 1/2 V/H
        vopen = (cell >> 2) & 1
        hopen = (cell >> 3) & 1

        in_m = state == 0
        eff = jnp.where(in_m, tr, state)
        eff = jnp.where(in_m & (i == 0) & (j > 0), _TR_HORIZ, eff)
        eff = jnp.where(in_m & (j == 0) & (i > 0), _TR_VERT, eff)

        is_diag = ((eff == _TR_DIAG) | (eff == 3)) & ~done
        is_vert = (eff == _TR_VERT) & ~done
        is_horiz = (eff == _TR_HORIZ) & ~done

        op = jnp.where(
            is_diag,
            jnp.where(eff == _TR_DIAG, EQ, X),
            jnp.where(is_vert, I, D),
        )
        emit = jnp.where(done, 127, op)
        k = jnp.where(done, k, k + 1)

        ni = jnp.where(is_diag | is_vert, i - 1, i)
        nj = jnp.where(is_diag | is_horiz, j - 1, j)
        ns = jnp.where(
            is_diag,
            0,
            jnp.where(
                is_vert,
                jnp.where(vopen == 1, 0, 1),
                jnp.where(hopen == 1, 0, 2),
            ),
        )
        state = jnp.where(done, state, ns)
        i = jnp.where(done, i, ni)
        j = jnp.where(done, j, nj)
        ops_ref[step, :, :] = emit.astype(jnp.int32)
        return i, j, state, k

    init = (
        m_row,
        n_row,
        jnp.zeros((1, tb), jnp.int32),
        jnp.zeros((1, tb), jnp.int32),
    )
    _, _, _, k = jax.lax.fori_loop(0, max_steps, tb_step, init)
    count_ref[0:1, :] = k


@partial(jax.jit, static_argnames=("R", "Q", "interpret"))
def realign_fused_pallas(sub, ref, query, m, n, go, ge, R: int, Q: int,
                         interpret: bool | None = None, qual=None):
    """Run the fused kernel.  sub: (B, Q, R) f32 substitution scores
    (quantised-Malde — exact in f32), or None for the integer scoring
    scheme (the single compare is then done in-kernel, skipping the
    (B, Q, R) materialisation and its HBM round trip); ref/query:
    (B, R)/(B, Q) uint8; m/n: (B,) int32 query/ref lengths.  Returns
    (ops int8 (B, R+Q), count int32 (B,)), identical to
    realign_batch._traceback_batch's output.

    ``qual=(qq, mrow, xrow)`` selects the pinned-ref-quality Malde mode
    (mutually exclusive with ``sub``): qq (B, Q) int query phreds plus the
    64-entry match/mismatch table rows at the pinned reference quality
    (align.malde_tables()[...][PHRED42_MAX]).  Scores identical to
    realign_batch._substitution_scores(ref_qual=None) — but built
    in-kernel, so VMEM stays O(Q x TILE_B) at any run pad (the explicit
    sub tile OOMs past 64x64)."""
    if interpret is None:
        # Mosaic only lowers on real TPUs; everywhere else (the CPU test
        # mesh) the interpreter executes the identical program
        interpret = jax.default_backend() != "tpu"
    has_sub = sub is not None
    has_qual = qual is not None
    assert not (has_sub and has_qual)
    if has_qual:
        qq, mrow, xrow = qual
    B = ref.shape[0]
    tile = _pick_tile(R, Q)
    pad = (-B) % tile
    if pad:
        if has_sub:
            sub = jnp.pad(sub, ((0, pad), (0, 0), (0, 0)))
        if has_qual:
            qq = jnp.pad(qq, ((0, pad), (0, 0)))
        ref = jnp.pad(ref, ((0, pad), (0, 0)))
        query = jnp.pad(query, ((0, pad), (0, 0)))
        m = jnp.pad(m, (0, pad))
        n = jnp.pad(n, (0, pad))
    bp = B + pad

    ref_t = jnp.transpose(ref, (1, 0))                      # (R, BP)
    query_t = jnp.transpose(query, (1, 0))                  # (Q, BP)
    m2 = m.astype(jnp.int32).reshape(1, bp)
    n2 = n.astype(jnp.int32).reshape(1, bp)
    go2 = jnp.asarray(go, jnp.float32).reshape(1, 1)
    ge2 = jnp.asarray(ge, jnp.float32).reshape(1, 1)

    smem = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [smem, smem]
    inputs = [go2, ge2]
    if has_sub:
        in_specs.append(pl.BlockSpec((Q, R, tile), lambda b: (0, 0, b)))
        inputs.append(jnp.transpose(sub, (1, 2, 0)))        # (Q, R, BP)
    if has_qual:
        row_smem = pl.BlockSpec(
            (64, 1), lambda b: (0, 0), memory_space=pltpu.SMEM
        )
        in_specs += [
            row_smem,
            row_smem,
            pl.BlockSpec((Q, tile), lambda b: (0, b)),
        ]
        inputs += [
            jnp.asarray(mrow, jnp.float32).reshape(64, 1),
            jnp.asarray(xrow, jnp.float32).reshape(64, 1),
            jnp.transpose(qq.astype(jnp.int32), (1, 0)),    # (Q, BP)
        ]
    in_specs += [
        pl.BlockSpec((R, tile), lambda b: (0, b)),
        pl.BlockSpec((Q, tile), lambda b: (0, b)),
        pl.BlockSpec((1, tile), lambda b: (0, b)),
        pl.BlockSpec((1, tile), lambda b: (0, b)),
    ]
    inputs += [ref_t, query_t, m2, n2]

    grid = bp // tile
    kern = partial(_kernel, R=R, Q=Q, has_sub=has_sub, has_qual=has_qual)
    ops_t, count_t = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((R + Q, 1, tile), lambda b: (0, 0, b)),
            pl.BlockSpec((1, tile), lambda b: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R + Q, 1, bp), jnp.int32),
            jax.ShapeDtypeStruct((1, bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q + 1, (R + 1 + 7) // 8, tile), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs)

    ops = jnp.transpose(ops_t[:, 0, :], (1, 0)).astype(jnp.int8)[:B]
    count = count_t[0, :B]
    return ops, count
