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
    """Expand CIGARs into padded unit arrays (step 1 above)."""
    b = len(cigars)
    unit_ops: list[np.ndarray] = []
    unit_counts: list[np.ndarray] = []
    ref_positions: list[np.ndarray] = []
    ref_mtypes: list[np.ndarray] = []
    ref_qpositions: list[np.ndarray] = []
    ref_unit_idxs: list[np.ndarray] = []

    for cigar, src_pos in zip(cigars, src_positions):
        ops_l: list[int] = []
        counts_l: list[int] = []
        rpos_l: list[int] = []
        rmt_l: list[bool] = []
        rqp_l: list[int] = []
        ridx_l: list[int] = []
        qpos = 0
        spos = src_pos
        for count, op_char in cigar:
            op = OP_TO_CODE[op_char]
            if op in _REF_OPS:
                mt = op in _MTYPE
                for _ in range(count):
                    rpos_l.append(spos)
                    rmt_l.append(mt)
                    rqp_l.append(qpos)
                    ridx_l.append(len(ops_l))
                    ops_l.append(op)
                    counts_l.append(1)
                    spos += 1
                    if mt:
                        qpos += 1
            else:
                ops_l.append(op)
                counts_l.append(count)
                if op in (I, S):
                    qpos += count
        unit_ops.append(np.array(ops_l, dtype=np.int8))
        unit_counts.append(np.array(counts_l, dtype=np.int32))
        ref_positions.append(np.array(rpos_l, dtype=np.int32))
        ref_mtypes.append(np.array(rmt_l, dtype=bool))
        ref_qpositions.append(np.array(rqp_l, dtype=np.int32))
        ref_unit_idxs.append(np.array(ridx_l, dtype=np.int32))

    u = pad_units if pad_units is not None else max((len(x) for x in unit_ops), default=1) or 1
    r = pad_ref_units if pad_ref_units is not None else max((len(x) for x in ref_positions), default=1) or 1
    lq = pad_query if pad_query is not None else max((len(q) for q in queries), default=1) or 1

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
        n_units=np.array([len(x) for x in unit_ops], dtype=np.int32),
    )
    for i in range(b):
        k = len(unit_ops[i])
        batch.unit_op[i, :k] = unit_ops[i]
        batch.unit_count[i, :k] = unit_counts[i]
        batch.unit_valid[i, :k] = True
        kr = len(ref_positions[i])
        batch.ref_src_pos[i, :kr] = ref_positions[i]
        batch.ref_is_mtype[i, :kr] = ref_mtypes[i]
        batch.ref_qpos[i, :kr] = ref_qpositions[i]
        batch.ref_valid[i, :kr] = True
        batch.ref_unit_idx[i, :kr] = ref_unit_idxs[i]
        q = np.frombuffer(queries[i], dtype=np.uint8)
        batch.query[i, :len(q)] = q
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
    """Step 3: merge device results into per-record rewritten CIGARs."""
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

    positions: list[int] = []
    cigars: list[Cigar] = []
    flat_ops = out_ops.reshape(b, -1)
    flat_lens = out_lens.reshape(b, -1)
    for i in range(b):
        n = int(batch.n_units[i]) * 2
        ops = flat_ops[i, :n]
        lens = flat_lens[i, :n]
        keep = lens > 0
        ops = ops[keep]
        lens = lens[keep]
        cig: Cigar = []
        for op, ln in zip(ops.tolist(), lens.tolist()):
            ch = CODE_TO_OP[op]
            if cig and cig[-1][1] == ch:
                cig[-1] = (cig[-1][0] + ln, ch)
            else:
                cig.append((ln, ch))
        cigars.append(cig)
        positions.append(int(dst_pos[i]))
    return positions, cigars


def rewrite_batch(
    index: DeviceGapIndex,
    ref_flat: np.ndarray,
    batch: RewriteBatch,
) -> tuple[list[int], list[Cigar]]:
    """Run the full batched rewrite (host expand → device → host RLE)."""
    dst_pos, d_run, main_code, main_len = rewrite_device_kernel(
        index,
        jnp.asarray(ref_flat),
        jnp.asarray(batch.src_seq),
        jnp.asarray(batch.dst_seq),
        jnp.asarray(batch.rec_src_pos),
        jnp.asarray(batch.ref_off),
        jnp.asarray(batch.ref_src_pos),
        jnp.asarray(batch.ref_is_mtype),
        jnp.asarray(batch.ref_qpos),
        jnp.asarray(batch.ref_valid),
        jnp.asarray(batch.query),
    )
    return finalize_rewrite(
        batch,
        np.asarray(dst_pos),
        np.asarray(d_run),
        np.asarray(main_code),
        np.asarray(main_len),
    )
