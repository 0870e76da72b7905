"""Batched CIGAR rewriting on device.

The per-character loop of the reference
(/root/reference/include/panvc3/rewrite_cigar.hh:80-152) becomes a
fixed-shape, data-parallel pipeline:

1. host: expand each record's CIGAR into *units* — one unit per base for
   reference-consuming ops (M/=/X/D/N), one unit per op for the
   pass-through ops (I/S/H/P); reference-consuming units are additionally
   packed into a dense (B, R) block, in order;
2. device: for every reference-consuming unit, compute
   ``aligned = select0(src, pos+1)``, ``excess = rank0(dst, aligned)``,
   the destination gap bit, and the query/destination character comparison —
   pure gathers + popcounts over the HBM-resident index, vmapped over the
   whole batch;
3. host: merge the device results back into the unit stream, emit the
   inter-position deletion runs, and RLE-collapse into final CIGARs.

The result is bit-identical to :func:`panvc3_tpu.rewrite.rewrite_cigar`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cigar import CODE_TO_OP, D, EQ, H, I, M, N, OP_TO_CODE, P, S, X, Cigar
from .rank_select import DeviceGapIndex

_REF_OPS = frozenset((M, EQ, X, D, N))
_MTYPE = frozenset((M, EQ, X))
CODE_NONE = 15  # emitted-op code for "nothing"


@dataclass
class RewriteBatch:
    """Host-side staging of one batch of records for the rewrite kernel."""

    # per record
    src_seq: np.ndarray       # int32[B] sequence id in the device index
    dst_seq: np.ndarray       # int32[B]
    rec_src_pos: np.ndarray   # int32[B]
    ref_off: np.ndarray       # int32[B] offset of the record's output ref in ref_flat
    query: np.ndarray         # uint8[B, Lq] dna5-normalised, 0-padded
    # per unit (full stream, padded)
    unit_op: np.ndarray       # int8[B, U]
    unit_count: np.ndarray    # int32[B, U]
    unit_valid: np.ndarray    # bool[B, U]
    # reference-consuming units (dense pack, padded)
    ref_src_pos: np.ndarray   # int32[B, R]
    ref_is_mtype: np.ndarray  # bool[B, R]
    ref_qpos: np.ndarray      # int32[B, R]
    ref_valid: np.ndarray     # bool[B, R]
    ref_unit_idx: np.ndarray  # int32[B, R] position of this unit in the unit stream
    n_units: np.ndarray       # int32[B]


_IS_REF_OP = np.zeros(9, dtype=bool)
for _c in (M, EQ, X, D, N):
    _IS_REF_OP[_c] = True
_IS_MTYPE_OP = np.zeros(9, dtype=bool)
for _c in (M, EQ, X):
    _IS_MTYPE_OP[_c] = True
_IS_QUERY_OP = np.zeros(9, dtype=bool)
for _c in (I, S):
    _IS_QUERY_OP[_c] = True


def expand_cigars(
    cigars: list[Cigar],
    src_positions: list[int],
    queries: list[bytes],
    src_seq_ids: list[int],
    dst_seq_ids: list[int],
    ref_offsets: list[int],
    pad_units: int | None = None,
    pad_ref_units: int | None = None,
    pad_query: int | None = None,
) -> RewriteBatch:
    """Expand CIGARs into padded unit arrays (step 1 above).

    Fully vectorised: O(total ops) Python work, O(total units) numpy work.
    """
    b = len(cigars)

    # flatten (record, count, op) triples — CIGARs are short, this is the
    # only per-op Python loop
    n_ops = np.fromiter((len(c) for c in cigars), dtype=np.int64, count=b)
    total_ops = int(n_ops.sum())
    ops_flat = np.empty(total_ops, dtype=np.int8)
    counts_flat = np.empty(total_ops, dtype=np.int64)
    k = 0
    for cig in cigars:
        for count, op_char in cig:
            ops_flat[k] = OP_TO_CODE[op_char]
            counts_flat[k] = count
            k += 1
    op_rec = np.repeat(np.arange(b), n_ops)

    is_ref_op = _IS_REF_OP[ops_flat]
    # expansion: ref-consuming ops produce `count` units, others one unit
    rep = np.where(is_ref_op, counts_flat, 1)
    unit_op = np.repeat(ops_flat, rep)
    unit_rec = np.repeat(op_rec, rep)
    unit_count = np.repeat(np.where(is_ref_op, 1, counts_flat), rep).astype(np.int32)
    total_units = len(unit_op)

    # per-record segment bookkeeping
    units_per_rec = np.bincount(unit_rec, minlength=b)
    rec_unit_start = np.concatenate([[0], np.cumsum(units_per_rec)[:-1]])
    unit_idx_in_rec = np.arange(total_units) - rec_unit_start[unit_rec]

    is_ref_unit = _IS_REF_OP[unit_op]
    is_mtype_unit = _IS_MTYPE_OP[unit_op]

    # reference position per unit: record src_pos + #ref units before it
    ref_consume = is_ref_unit.astype(np.int64)
    c_ref = np.cumsum(ref_consume)
    excl_ref = c_ref - ref_consume
    ref_before = excl_ref - excl_ref[rec_unit_start][unit_rec]
    src_pos_arr = np.asarray(src_positions, dtype=np.int64)
    unit_src_pos = src_pos_arr[unit_rec] + ref_before

    # query position per unit: M-type units consume 1, I/S units their count
    q_consume = np.where(is_mtype_unit, 1, 0) + np.where(
        _IS_QUERY_OP[unit_op], unit_count, 0
    )
    c_q = np.cumsum(q_consume)
    excl_q = c_q - q_consume
    unit_qpos = excl_q - excl_q[rec_unit_start][unit_rec]

    # dense rank of ref units within each record
    c_rank = np.cumsum(ref_consume)
    excl_rank = c_rank - ref_consume
    ref_rank = excl_rank - excl_rank[rec_unit_start][unit_rec]

    u = pad_units if pad_units is not None else max(1, int(units_per_rec.max(initial=0)))
    ref_per_rec = np.bincount(unit_rec[is_ref_unit], minlength=b)
    r = pad_ref_units if pad_ref_units is not None else max(1, int(ref_per_rec.max(initial=0)))
    lq = pad_query if pad_query is not None else max(1, max((len(q) for q in queries), default=1))

    batch = RewriteBatch(
        src_seq=np.asarray(src_seq_ids, dtype=np.int32),
        dst_seq=np.asarray(dst_seq_ids, dtype=np.int32),
        rec_src_pos=np.asarray(src_positions, dtype=np.int32),
        ref_off=np.asarray(ref_offsets, dtype=np.int32),
        query=np.zeros((b, lq), dtype=np.uint8),
        unit_op=np.zeros((b, u), dtype=np.int8),
        unit_count=np.zeros((b, u), dtype=np.int32),
        unit_valid=np.zeros((b, u), dtype=bool),
        ref_src_pos=np.zeros((b, r), dtype=np.int32),
        ref_is_mtype=np.zeros((b, r), dtype=bool),
        ref_qpos=np.zeros((b, r), dtype=np.int32),
        ref_valid=np.zeros((b, r), dtype=bool),
        ref_unit_idx=np.zeros((b, r), dtype=np.int32),
        n_units=units_per_rec.astype(np.int32),
    )

    batch.unit_op[unit_rec, unit_idx_in_rec] = unit_op
    batch.unit_count[unit_rec, unit_idx_in_rec] = unit_count
    batch.unit_valid[unit_rec, unit_idx_in_rec] = True

    rm = is_ref_unit
    rrec = unit_rec[rm]
    rcol = ref_rank[rm]
    batch.ref_src_pos[rrec, rcol] = unit_src_pos[rm]
    batch.ref_is_mtype[rrec, rcol] = is_mtype_unit[rm]
    batch.ref_qpos[rrec, rcol] = unit_qpos[rm]
    batch.ref_valid[rrec, rcol] = True
    batch.ref_unit_idx[rrec, rcol] = unit_idx_in_rec[rm]

    # queries: pack via a flat buffer
    qlens = np.fromiter((len(q) for q in queries), dtype=np.int64, count=b)
    if b and qlens.max(initial=0):
        qflat = np.frombuffer(b"".join(queries), dtype=np.uint8)
        qrec = np.repeat(np.arange(b), qlens)
        qstart = np.concatenate([[0], np.cumsum(qlens)[:-1]])
        qcol = np.arange(len(qflat)) - qstart[qrec]
        batch.query[qrec, qcol] = qflat
    return batch


@partial(jax.jit, static_argnames=())
def rewrite_device_kernel(
    index: DeviceGapIndex,
    ref_flat: jnp.ndarray,     # uint8[Nref] concatenated output reference bytes
    src_seq: jnp.ndarray,      # int32[B]
    dst_seq: jnp.ndarray,      # int32[B]
    rec_src_pos: jnp.ndarray,  # int32[B]
    ref_off: jnp.ndarray,      # int32[B]
    ref_src_pos: jnp.ndarray,  # int32[B, R]
    ref_is_mtype: jnp.ndarray,  # bool[B, R]
    ref_qpos: jnp.ndarray,     # int32[B, R]
    ref_valid: jnp.ndarray,    # bool[B, R]
    query: jnp.ndarray,        # uint8[B, Lq]
):
    """Step 2: the per-base coordinate math (device)."""
    s = src_seq[:, None]
    d = dst_seq[:, None]
    pos = jnp.where(ref_valid, ref_src_pos, 0)

    aligned = index.select0(s, pos + 1)
    excess = index.rank0(d, aligned)
    isgap = index.bit(d, aligned)

    initial = index.rank0(dst_seq, index.select0(src_seq, rec_src_pos + 1))

    # consume flag: the unit ended on a destination non-gap
    nongap = (1 - isgap)
    prev_excess = jnp.concatenate(
        [initial[:, None], (excess + nongap)[:, :-1]], axis=1
    )
    d_run = jnp.maximum(excess - prev_excess, 0)

    dst_char = ref_flat[ref_off[:, None] + excess]
    qchar = jnp.take_along_axis(query, jnp.where(ref_valid, ref_qpos, 0), axis=1)
    eq = qchar == dst_char

    main_code = jnp.where(
        ref_is_mtype,
        jnp.where(isgap == 1, I, jnp.where(eq, EQ, X)),
        jnp.where(isgap == 1, CODE_NONE, D),
    ).astype(jnp.int8)
    main_len = jnp.where(main_code == CODE_NONE, 0, 1).astype(jnp.int32)

    return initial, d_run.astype(jnp.int32), main_code, main_len


def finalize_rewrite(
    batch: RewriteBatch,
    dst_pos: np.ndarray,
    d_run: np.ndarray,
    main_code: np.ndarray,
    main_len: np.ndarray,
) -> tuple[list[int], list[Cigar]]:
    """Step 3: merge device results into per-record rewritten CIGARs.

    One flat RLE pass over the whole batch: adjacent equal ops merge within
    a record, run boundaries break at record boundaries.
    """
    b, u = batch.unit_op.shape
    out_ops = np.repeat(batch.unit_op[:, :, None], 2, axis=2).astype(np.int16)
    out_lens = np.zeros((b, u, 2), dtype=np.int32)
    # passthrough units emit their own op in slot 1
    out_ops[:, :, 0] = CODE_NONE
    out_lens[:, :, 1] = np.where(batch.unit_valid, batch.unit_count, 0)

    # scatter reference-unit results
    bidx = np.repeat(np.arange(b)[:, None], batch.ref_unit_idx.shape[1], axis=1)
    rv = batch.ref_valid
    ui = batch.ref_unit_idx
    out_ops[bidx[rv], ui[rv], 0] = D
    out_lens[bidx[rv], ui[rv], 0] = d_run[rv]
    out_ops[bidx[rv], ui[rv], 1] = main_code[rv]
    out_lens[bidx[rv], ui[rv], 1] = main_len[rv]

    flat_ops = out_ops.reshape(-1)
    flat_lens = out_lens.reshape(-1)
    flat_rec = np.repeat(np.arange(b), 2 * u)

    keep = flat_lens > 0
    ops_k = flat_ops[keep]
    lens_k = flat_lens[keep]
    rec_k = flat_rec[keep]

    positions = [int(p) for p in dst_pos]
    if len(ops_k) == 0:
        return positions, [[] for _ in range(b)]

    boundary = np.empty(len(ops_k), dtype=bool)
    boundary[0] = True
    np.logical_or(ops_k[1:] != ops_k[:-1], rec_k[1:] != rec_k[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    run_lens = np.add.reduceat(lens_k, starts)
    run_ops = ops_k[starts]
    run_rec = rec_k[starts]

    runs_per_rec = np.bincount(run_rec, minlength=b)
    run_off = np.concatenate([[0], np.cumsum(runs_per_rec)])
    ops_list = run_ops.tolist()
    lens_list = run_lens.tolist()
    cigars: list[Cigar] = []
    for i in range(b):
        lo, hi = run_off[i], run_off[i + 1]
        cigars.append(
            [(lens_list[j], CODE_TO_OP[ops_list[j]]) for j in range(lo, hi)]
        )
    return positions, cigars


def rewrite_batch(
    index: DeviceGapIndex,
    ref_flat: np.ndarray,
    batch: RewriteBatch,
) -> tuple[list[int], list[Cigar]]:
    """Run the full batched rewrite (host expand → device → host RLE).

    numpy arrays are passed straight into the jitted kernel (one dispatch,
    transfers bundled) and results fetched with a single device_get.
    """
    out = rewrite_device_kernel(
        index,
        ref_flat,
        batch.src_seq,
        batch.dst_seq,
        batch.rec_src_pos,
        batch.ref_off,
        batch.ref_src_pos,
        batch.ref_is_mtype,
        batch.ref_qpos,
        batch.ref_valid,
        batch.query,
    )
    dst_pos, d_run, main_code, main_len = jax.device_get(out)
    return finalize_rewrite(batch, dst_pos, d_run, main_code, main_len)
