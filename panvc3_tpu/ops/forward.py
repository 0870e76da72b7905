"""The flagship jittable forward step: batched coordinate projection.

One fused, fully-jittable function over fixed-shape arrays combining the
two device stages of the projection pipeline:

1. per-base CIGAR rewrite math (select0/rank0/bit gathers + character
   comparison) over a (B, R) block of reference-consuming units;
2. the batched affine-gap realignment DP fill + traceback over (B, RR, RQ)
   run slices.

This is what ``__graft_entry__.entry`` exposes for the single-chip compile
check and what the multi-chip dry run shards over the batch dimension.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .rank_select import DeviceGapIndex
from .realign_batch import _fill_one, _substitution_scores, _traceback_one


@partial(jax.jit, static_argnames=("run_r", "run_q"))
def projection_step(
    index: DeviceGapIndex,
    ref_flat: jnp.ndarray,
    src_seq: jnp.ndarray,       # int32[B]
    dst_seq: jnp.ndarray,       # int32[B]
    rec_src_pos: jnp.ndarray,   # int32[B]
    ref_off: jnp.ndarray,       # int32[B]
    ref_src_pos: jnp.ndarray,   # int32[B, R]
    ref_is_mtype: jnp.ndarray,  # bool[B, R]
    ref_qpos: jnp.ndarray,      # int32[B, R]
    ref_valid: jnp.ndarray,     # bool[B, R]
    query: jnp.ndarray,         # uint8[B, Lq]
    run_ref: jnp.ndarray,       # uint8[B, RR] realignment run ref slices
    run_query: jnp.ndarray,     # uint8[B, RQ]
    run_ref_len: jnp.ndarray,   # int32[B]
    run_query_len: jnp.ndarray,  # int32[B]
    go: jnp.ndarray,            # float32
    ge: jnp.ndarray,            # float32
    run_r: int,
    run_q: int,
):
    """Returns (dst_pos, d_run, main_code, main_len, realign_ops,
    realign_counts, stats) for one batch."""
    from ..cigar import D, EQ, I, X
    from .rewrite_batch import CODE_NONE

    s = src_seq[:, None]
    d = dst_seq[:, None]
    pos = jnp.where(ref_valid, ref_src_pos, 0)

    aligned = index.select0(s, pos + 1)
    excess = index.rank0(d, aligned)
    isgap = index.bit(d, aligned)
    initial = index.rank0(dst_seq, index.select0(src_seq, rec_src_pos + 1))

    nongap = 1 - isgap
    prev_excess = jnp.concatenate([initial[:, None], (excess + nongap)[:, :-1]], axis=1)
    d_run = jnp.maximum(excess - prev_excess, 0).astype(jnp.int32)

    dst_char = ref_flat[ref_off[:, None] + excess]
    qchar = jnp.take_along_axis(query, jnp.where(ref_valid, ref_qpos, 0), axis=1)
    eq = qchar == dst_char
    main_code = jnp.where(
        ref_is_mtype,
        jnp.where(isgap == 1, I, jnp.where(eq, EQ, X)),
        jnp.where(isgap == 1, CODE_NONE, D),
    ).astype(jnp.int8)
    main_len = jnp.where(main_code == CODE_NONE, 0, 1).astype(jnp.int32)

    # realignment DP over the run slices
    sub = _substitution_scores(run_ref, run_query, None, None, False)

    def one(sub_i, ref_i, query_i, m, n):
        trace = _fill_one(sub_i, m, n, go, ge, run_r, run_q)
        return _traceback_one(trace, ref_i, query_i, m, n, run_r, run_q)

    realign_ops, realign_counts = jax.vmap(one)(
        sub, run_ref, run_query, run_query_len, run_ref_len
    )

    # global statistics ride a cross-device reduction when sharded
    stats = jnp.stack(
        [
            jnp.sum(jnp.where(ref_valid, 1, 0)),
            jnp.sum(d_run),
            jnp.sum(realign_counts),
        ]
    )
    return initial, d_run, main_code, main_len, realign_ops, realign_counts, stats
