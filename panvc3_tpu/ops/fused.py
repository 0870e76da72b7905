"""Fully-fused projection kernel: rewrite + indel-run detection + realign
DP in one device dispatch.

The two-dispatch engine path (rewrite kernel -> host run detection ->
realign kernel) pays two tunnel round trips and host work on the critical
path.  This kernel keeps everything on device:

1. rewrite math over (B, R) reference units (ops/rewrite_batch.rewrite_math);
2. indel-run detection with the checker semantics
   (/root/reference/libpanvc3/indel_run_checker.cc:31-121) as a lax.scan
   over the full unit stream (reference units + pass-through ops, expanded
   on device the same way as the rewrite);
3. run compaction into a fixed pool of slots (prefix-sum scatter; overflow
   reported so the host can fall back);
4. gather of the run's reference/query slices (reference bytes
   dna5-normalised on device) and the batched affine DP + traceback.

The host then recomputes run bookkeeping from the collapsed CIGAR (native
single pass, microseconds) and matches realigned runs 1:1 by order — run
order and ranges are identical on collapsed and uncollapsed op streams
because the checker's transitions depend only on op types.

Quality-aware (-q) scoring is not fused (the default pipeline path is the
integer scheme; -q falls back to the two-dispatch path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..alphabet import DNA5_NORMALISE
from ..cigar import D, EQ, H, I, N, P, S, X
from .rank_select import DeviceGapIndex
from .realign_batch import NEG, _fill_batch, _traceback_batch
from .rewrite_batch import CODE_NONE, _IS_MTYPE_OP, _IS_QUERY_OP, _IS_REF_OP, rewrite_math

_DNA5_LUT = jnp.asarray(DNA5_NORMALISE)


@partial(jax.jit, static_argnames=("R", "U", "max_runs", "run_r", "run_q"))
def fused_projection_kernel(
    index: DeviceGapIndex,
    ref_flat: jnp.ndarray,     # uint8[Nref]
    src_seq: jnp.ndarray,      # int32[B]
    dst_seq: jnp.ndarray,      # int32[B]
    rec_src_pos: jnp.ndarray,  # int32[B]
    ref_off: jnp.ndarray,      # int32[B]
    ops: jnp.ndarray,          # int8[B, O]
    counts: jnp.ndarray,       # int32[B, O]
    query: jnp.ndarray,        # uint8[B, Lq]
    go: jnp.ndarray,           # float32
    ge: jnp.ndarray,           # float32
    R: int,                    # max reference units
    U: int,                    # max total units (ref units + pass-through ops)
    max_runs: int,             # run-slot pool size
    run_r: int,                # max run ref length (pad)
    run_q: int,                # max run query length (pad)
):
    B = src_seq.shape[0]
    O = ops.shape[1]

    dst_pos, d_run, main_code = rewrite_math(
        index, ref_flat, src_seq, dst_seq, rec_src_pos, ref_off, ops, counts,
        query, R,
    )

    # ---- device-side unit stream over ALL units (ref + pass-through) ----
    is_ref_op = jnp.asarray(_IS_REF_OP)[ops]
    unit_per_op = jnp.where(is_ref_op, counts, 1)
    unit_pref = jnp.cumsum(unit_per_op, axis=1) - unit_per_op  # exclusive
    total_units = unit_pref[:, -1] + unit_per_op[:, -1]

    ref_counts = jnp.where(is_ref_op, counts, 0)
    ref_pref = jnp.cumsum(ref_counts, axis=1) - ref_counts

    u = jnp.arange(U, dtype=jnp.int32)[None, :]
    op_idx = jnp.sum(unit_pref[:, None, :] <= u[:, :, None], axis=2) - 1  # (B, U)
    op_idx = jnp.clip(op_idx, 0, O - 1)
    u_valid = u < total_units[:, None]

    take = lambda a: jnp.take_along_axis(a, op_idx, axis=1)
    u_op = take(ops)
    u_is_ref = take(is_ref_op) & u_valid
    u_count = take(counts)
    u_ref_idx = take(ref_pref) + (u - take(unit_pref))  # ref-unit index r

    gather_r = jnp.clip(u_ref_idx, 0, R - 1)
    u_d = jnp.where(
        u_is_ref, jnp.take_along_axis(d_run, gather_r, axis=1), 0
    )
    u_main = jnp.where(
        u_is_ref,
        jnp.take_along_axis(main_code, gather_r, axis=1),
        u_op,
    ).astype(jnp.int32)
    # pass-through op emitted length
    u_main_len = jnp.where(
        u_is_ref,
        jnp.where(u_main == CODE_NONE, 0, 1),
        u_count,
    )
    u_main = jnp.where(u_valid, u_main, CODE_NONE)
    u_d = jnp.where(u_valid, u_d, 0)
    u_main_len = jnp.where(u_valid, u_main_len, 0)

    # per-emitted-op consumption
    def consumption(code, length):
        cons_ref = jnp.where(
            (code == D) | (code == N) | (code == EQ) | (code == X) | (code == 0),
            length,
            0,
        )
        cons_query = jnp.where(
            (code == I) | (code == S) | (code == EQ) | (code == X) | (code == 0),
            length,
            0,
        )
        return cons_ref, cons_query

    # ---- indel-run checker scan over units -------------------------------
    # state per record: run_type(2b), ref_pos, query_pos, run_start_ref,
    # run_start_query, n_runs, per-run outputs scattered to (B, max_runs)
    HAS_I, HAS_D, BOTH = 1, 2, 3

    def emit_op(state, code, length):
        """Feed one emitted op (possibly zero-length) through the checker."""
        (run_type, ref_pos, query_pos, start_ref, start_query,
         n_runs, runs_sr, runs_rl, runs_sq, runs_ql, runs_cr, runs_cq) = state
        active = length > 0
        cons_ref, cons_query = consumption(code, length)

        # run starts lazily when run_type == 0
        fresh = active & (run_type == 0)
        start_ref = jnp.where(fresh, ref_pos, start_ref)
        start_query = jnp.where(fresh, query_pos, start_query)

        is_i = active & (code == I)
        is_d = active & (code == D)
        breaking = active & ~is_i & ~is_d

        report = breaking & (run_type == BOTH)
        slot = jnp.minimum(n_runs, max_runs - 1)
        bidx = jnp.arange(B)

        def scatter(buf, val):
            return buf.at[bidx, slot].set(jnp.where(report, val, buf[bidx, slot]))

        new_ref_pos = ref_pos + cons_ref
        new_query_pos = query_pos + cons_query
        runs_sr = scatter(runs_sr, start_ref)
        runs_rl = scatter(runs_rl, ref_pos - start_ref)
        runs_sq = scatter(runs_sq, start_query)
        runs_ql = scatter(runs_ql, query_pos - start_query)
        runs_cr = scatter(runs_cr, new_ref_pos)
        runs_cq = scatter(runs_cq, new_query_pos)
        n_runs = n_runs + jnp.where(report, 1, 0)

        run_type = jnp.where(
            breaking,
            0,
            run_type | jnp.where(is_i, HAS_I, 0) | jnp.where(is_d, HAS_D, 0),
        )
        # a breaking op resets the lazy start to AFTER itself (the next
        # fresh op re-captures positions), matching the checker
        return (run_type, new_ref_pos, new_query_pos, start_ref, start_query,
                n_runs, runs_sr, runs_rl, runs_sq, runs_ql, runs_cr, runs_cq)

    zeros_i = jnp.zeros(B, jnp.int32)
    runs_shape = (B, max_runs)
    state0 = (
        zeros_i, dst_pos.astype(jnp.int32), zeros_i,
        dst_pos.astype(jnp.int32), zeros_i, zeros_i,
        jnp.zeros(runs_shape, jnp.int32), jnp.zeros(runs_shape, jnp.int32),
        jnp.zeros(runs_shape, jnp.int32), jnp.zeros(runs_shape, jnp.int32),
        jnp.zeros(runs_shape, jnp.int32), jnp.zeros(runs_shape, jnp.int32),
    )

    def unit_step(state, xs):
        d_len, code, length = xs
        state = emit_op(state, jnp.full(B, D), d_len)   # the inter-position D run
        state = emit_op(state, code, length)            # the unit's own op
        return state, None

    xs = (
        jnp.swapaxes(u_d, 0, 1),
        jnp.swapaxes(u_main, 0, 1),
        jnp.swapaxes(u_main_len, 0, 1),
    )
    state, _ = jax.lax.scan(unit_step, state0, xs)
    (run_type, ref_pos_f, query_pos_f, start_ref, start_query,
     n_runs, runs_sr, runs_rl, runs_sq, runs_ql, runs_cr, runs_cq) = state

    # final run at CIGAR end
    final_report = run_type == BOTH
    slot = jnp.minimum(n_runs, max_runs - 1)
    bidx = jnp.arange(B)

    def fscatter(buf, val):
        return buf.at[bidx, slot].set(jnp.where(final_report, val, buf[bidx, slot]))

    runs_sr = fscatter(runs_sr, start_ref)
    runs_rl = fscatter(runs_rl, ref_pos_f - start_ref)
    runs_sq = fscatter(runs_sq, start_query)
    runs_ql = fscatter(runs_ql, query_pos_f - start_query)
    runs_cr = fscatter(runs_cr, ref_pos_f)
    runs_cq = fscatter(runs_cq, query_pos_f)
    n_runs = n_runs + jnp.where(final_report, 1, 0)

    overflow = jnp.sum(jnp.where(n_runs > max_runs, 1, 0)).astype(jnp.int32)
    n_runs = jnp.minimum(n_runs, max_runs)

    # ---- compact runs into a global slot pool ----------------------------
    run_off = jnp.cumsum(n_runs) - n_runs              # (B,) global offsets
    total_runs = run_off[-1] + n_runs[-1]
    slot_pool = B  # pool size: one run per record on average is generous
    pool_overflow = jnp.where(total_runs > slot_pool, 1, 0).astype(jnp.int32)

    j = jnp.arange(max_runs, dtype=jnp.int32)[None, :]
    valid_run = j < n_runs[:, None]
    gslot = jnp.clip(run_off[:, None] + j, 0, slot_pool - 1)
    # only scatter valid runs: send invalid ones to a dummy slot via drop
    gslot_flat = jnp.where(valid_run, gslot, slot_pool).reshape(-1)

    def compact2(buf):
        out = jnp.zeros(slot_pool, jnp.int32)
        return out.at[gslot_flat].set(buf.reshape(-1), mode="drop")

    c_sr = compact2(runs_sr)
    c_rl = compact2(runs_rl)
    c_sq = compact2(runs_sq)
    c_ql = compact2(runs_ql)
    c_rec = compact2(jnp.broadcast_to(jnp.arange(B)[:, None], (B, max_runs)))

    # ---- gather run slices ----------------------------------------------
    rr = jnp.arange(run_r, dtype=jnp.int32)[None, :]
    rq = jnp.arange(run_q, dtype=jnp.int32)[None, :]
    ref_len = jnp.minimum(c_rl, run_r)
    query_len = jnp.minimum(c_ql, run_q)
    len_overflow = jnp.sum(
        jnp.where((c_rl > run_r) | (c_ql > run_q), 1, 0)
    ).astype(jnp.int32)

    ref_idx = ref_off[c_rec][:, None] + c_sr[:, None] + rr
    ref_slice = _DNA5_LUT[ref_flat[jnp.clip(ref_idx, 0, ref_flat.shape[0] - 1)]]
    ref_slice = jnp.where(rr < ref_len[:, None], ref_slice, 0)

    q_idx = jnp.clip(c_sq[:, None] + rq, 0, query.shape[1] - 1)
    q_slice = query[c_rec[:, None], q_idx]
    q_slice = jnp.where(rq < query_len[:, None], q_slice, 0)

    # ---- batched DP ------------------------------------------------------
    eq_m = q_slice[:, :, None] == ref_slice[:, None, :]
    sub = jnp.where(eq_m, 0.0, -1.0).astype(jnp.float32)
    trace = _fill_batch(sub, query_len, ref_len, go, ge, run_r, run_q)
    realign_ops, realign_counts = _traceback_batch(
        trace, ref_slice, q_slice, query_len, ref_len, run_r, run_q
    )

    d8 = jnp.minimum(d_run, 255).astype(jnp.uint8)
    d_overflow = jnp.sum(jnp.where(d_run >= 255, 1, 0)).astype(jnp.int32)
    flags = jnp.stack([overflow + pool_overflow + len_overflow, d_overflow, total_runs])
    return dst_pos, d8, main_code, realign_ops, realign_counts, flags, d_run
