"""Batched CIGAR rewriting on device.

The per-character loop of the reference
(/root/reference/include/panvc3/rewrite_cigar.hh:80-152) becomes a
fixed-shape, data-parallel pipeline.  CIGARs never materialise per-base on
the host: records ship to the device as compact op-level arrays
(op codes + counts, ~8 ops per read), and the device expands them to
per-base "reference units" itself with prefix sums + comparisons before
running the coordinate math (select0/rank0/bit gathers over the HBM-resident
index plus the query/reference character comparison).

Per batch of B records with up to O CIGAR ops and R reference-consuming
bases each:

- host: flatten CIGARs to (B, O) op/count arrays + a flat unit stream used
  only for the final RLE merge (numpy, O(total units));
- device: expand to (B, R) units, compute ``aligned = select0(src, pos+1)``,
  ``excess = rank0(dst, aligned)``, the destination gap bit, the emitted op
  per unit and the inter-position deletion run lengths;
- host: interleave the device results with the pass-through ops and
  RLE-collapse into final CIGARs (one flat vectorised pass).

The result is bit-identical to :func:`panvc3_tpu.rewrite.rewrite_cigar`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..cigar import CODE_TO_OP, D, EQ, H, I, M, N, OP_TO_CODE, P, S, X, Cigar
from .rank_select import DeviceGapIndex

_REF_OPS = frozenset((M, EQ, X, D, N))
_MTYPE = frozenset((M, EQ, X))
CODE_NONE = 15  # emitted-op code for "nothing"

_IS_REF_OP = np.zeros(16, dtype=bool)
for _c in (M, EQ, X, D, N):
    _IS_REF_OP[_c] = True
_IS_MTYPE_OP = np.zeros(16, dtype=bool)
for _c in (M, EQ, X):
    _IS_MTYPE_OP[_c] = True
_IS_QUERY_OP = np.zeros(16, dtype=bool)
for _c in (I, S):
    _IS_QUERY_OP[_c] = True


def expand_by_delta(values, starts, out_len):
    """Gather-free monotone run-length expansion.

    ``out[b, u, ...] = values[b, j, ...]`` for the largest ``j`` with
    ``starts[b, j] <= u`` (zero where no such ``j``).  Equivalent to
    ``take_along_axis`` with the monotone segment map, but formulated as a
    scatter of first differences + one prefix sum: this backend serializes
    ``take_along_axis`` element by element, and the serialized gathers were
    the fused projection kernel's dominant cost (~155 of 185 ms/dispatch).

    ``starts`` must be non-decreasing per row; duplicate start positions
    telescope correctly (the later segment's value wins, matching the
    "largest j" semantics).  Out-of-range starts are dropped, which matches
    the comparison-count formulation because such segments can never
    satisfy ``starts <= u`` for ``u < out_len``.
    """
    B = values.shape[0]
    deltas = jnp.diff(values, axis=1, prepend=0)
    z = jnp.zeros((B, out_len) + values.shape[2:], values.dtype)
    return jnp.cumsum(
        z.at[jnp.arange(B)[:, None], starts].add(deltas, mode="drop"), axis=1
    )


@dataclass
class RewriteBatch:
    """Host-side staging of one batch of records for the rewrite kernel."""

    # per record (shipped to device)
    src_seq: np.ndarray       # int32[B]
    dst_seq: np.ndarray       # int32[B]
    rec_src_pos: np.ndarray   # int32[B]
    ref_off: np.ndarray       # int32[B] offset of the record's output ref in ref_flat
    ops: np.ndarray           # int8[B, O] CIGAR op codes (CODE_NONE padding)
    counts: np.ndarray        # int32[B, O]
    query: np.ndarray         # uint8[B, Lq] dna5-normalised, 0-padded
    # host-only bookkeeping for the RLE merge
    n_ref_units: np.ndarray   # int32[B]
    unit_op: np.ndarray       # int8[total_units] flat unit stream
    unit_count: np.ndarray    # int32[total_units]
    unit_rec: np.ndarray      # int32[total_units]
    pad_ref_units: int        # R


def expand_cigars(
    cigars: list[Cigar],
    src_positions: list[int],
    queries: list[bytes],
    src_seq_ids: list[int],
    dst_seq_ids: list[int],
    ref_offsets: list[int],
    pad_ops: int | None = None,
    pad_ref_units: int | None = None,
    pad_query: int | None = None,
) -> RewriteBatch:
    """Stage a batch: op-level device arrays + flat host unit stream."""
    b = len(cigars)

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
    ref_per_rec = np.bincount(op_rec, weights=np.where(is_ref_op, counts_flat, 0), minlength=b).astype(np.int64)

    # flat unit stream (one unit per base for ref ops, one per op otherwise)
    rep = np.where(is_ref_op, counts_flat, 1)
    unit_op = np.repeat(ops_flat, rep)
    unit_rec = np.repeat(op_rec, rep).astype(np.int32)
    unit_count = np.repeat(np.where(is_ref_op, 1, counts_flat), rep).astype(np.int32)

    o = pad_ops if pad_ops is not None else max(1, int(n_ops.max(initial=0)))
    r = pad_ref_units if pad_ref_units is not None else max(1, int(ref_per_rec.max(initial=0)))
    lq = pad_query if pad_query is not None else max(1, max((len(q) for q in queries), default=1))

    ops_2d = np.full((b, o), CODE_NONE, dtype=np.int8)
    counts_2d = np.zeros((b, o), dtype=np.int32)
    op_start = np.concatenate([[0], np.cumsum(n_ops)[:-1]])
    col = np.arange(total_ops) - op_start[op_rec]
    ops_2d[op_rec, col] = ops_flat
    counts_2d[op_rec, col] = counts_flat

    query_2d = np.zeros((b, lq), dtype=np.uint8)
    qlens = np.fromiter((len(q) for q in queries), dtype=np.int64, count=b)
    if b and qlens.max(initial=0):
        qflat = np.frombuffer(b"".join(queries), dtype=np.uint8)
        qrec = np.repeat(np.arange(b), qlens)
        qstart = np.concatenate([[0], np.cumsum(qlens)[:-1]])
        qcol = np.arange(len(qflat)) - qstart[qrec]
        query_2d[qrec, qcol] = qflat

    return RewriteBatch(
        src_seq=np.asarray(src_seq_ids, dtype=np.int32),
        dst_seq=np.asarray(dst_seq_ids, dtype=np.int32),
        rec_src_pos=np.asarray(src_positions, dtype=np.int32),
        ref_off=np.asarray(ref_offsets, dtype=np.int32),
        ops=ops_2d,
        counts=counts_2d,
        query=query_2d,
        n_ref_units=ref_per_rec.astype(np.int32),
        unit_op=unit_op,
        unit_count=unit_count,
        unit_rec=unit_rec,
        pad_ref_units=r,
    )


def rewrite_math(
    index: DeviceGapIndex,
    ref_flat: jnp.ndarray,     # uint8[Nref] concatenated output reference bytes
    src_seq: jnp.ndarray,      # int32[B]
    dst_seq: jnp.ndarray,      # int32[B]
    rec_src_pos: jnp.ndarray,  # int32[B]
    ref_off: jnp.ndarray,      # int32[B]
    ops: jnp.ndarray,          # int8[B, O]
    counts: jnp.ndarray,       # int32[B, O]
    query: jnp.ndarray,        # uint8[B, Lq]
    R: int,
):
    """Device-side per-base expansion + coordinate math (traceable body).

    Returns (dst_pos int32[B], d_run int32[B, R], main_code int8[B, R]).
    """
    is_ref_op = jnp.asarray(_IS_REF_OP)[ops]
    is_mtype_op = jnp.asarray(_IS_MTYPE_OP)[ops]
    is_query_op = jnp.asarray(_IS_QUERY_OP)[ops]

    ref_counts = jnp.where(is_ref_op, counts, 0)
    pref = jnp.cumsum(ref_counts, axis=1) - ref_counts       # exclusive
    total_ref = pref[:, -1] + ref_counts[:, -1]

    q_counts = jnp.where(is_mtype_op | is_query_op, counts, 0)
    qpref = jnp.cumsum(q_counts, axis=1) - q_counts

    r = jnp.arange(R, dtype=jnp.int32)[None, :]              # (1, R)
    valid = r < total_ref[:, None]

    # expand the per-op values over ref units gather-free (expand_by_delta;
    # the op_idx comparison-sum + three take_along_axis here were ~half the
    # fused kernel's cost)
    is_mtype = (
        expand_by_delta(
            is_mtype_op.astype(jnp.int32)[:, :, None], pref, R
        )[:, :, 0]
        == 1
    ) & valid

    # query chars placed onto the ref units that consume them — the inverse
    # of the qpos gather, also gather-free: expand each op's (ref prefix -
    # query prefix) offset over query space, then one unique-index scatter
    # of the query bytes to r = q + offset.  q positions owned by I/S ops
    # (or padding) drop out; ref units that receive no byte are non-mtype,
    # where the comparison result is unused.
    Lq = query.shape[1]
    q_ax = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    qlane = ((pref - qpref) << 1) | is_mtype_op.astype(jnp.int32)
    eq_q = expand_by_delta(qlane[:, :, None], qpref, Lq)[:, :, 0]
    r_of_q = jnp.where((eq_q & 1) == 1, q_ax + (eq_q >> 1), R)
    qchar = (
        jnp.zeros((query.shape[0], R), query.dtype)
        .at[jnp.arange(query.shape[0])[:, None], r_of_q]
        .add(query, mode="drop")
    )

    d = dst_seq[:, None]
    # consecutive ranks -> one contiguous zsel row DMA per record instead of
    # B*R element gathers (same pattern as the packed gap kernel); entries
    # beyond total_ref are tail-pad garbage, masked by every consumer.
    aligned = index.select0_consecutive(src_seq, rec_src_pos + 1, R)
    excess, isgap = index.rank0_and_bit(d, aligned)
    # aligned[:, 0] == select0(src, pos + 1): reuse the consecutive row DMA
    # instead of a second per-record select0 gather (same as _gap_math)
    initial = index.rank0(dst_seq, aligned[:, 0])

    nongap = 1 - isgap
    prev_excess = jnp.concatenate([initial[:, None], (excess + nongap)[:, :-1]], axis=1)
    # beyond total_ref the consecutive select reads tail pad: pin those
    # entries (d_run=0, main=CODE_NONE) so overflow counters and wire
    # outputs stay deterministic
    d_run = jnp.where(valid, jnp.maximum(excess - prev_excess, 0), 0).astype(
        jnp.int32
    )

    dst_char = ref_flat[ref_off[:, None] + excess]
    eq = qchar == dst_char

    main_code = jnp.where(
        valid,
        jnp.where(
            is_mtype,
            jnp.where(isgap == 1, I, jnp.where(eq, EQ, X)),
            jnp.where(isgap == 1, CODE_NONE, D),
        ),
        CODE_NONE,
    ).astype(jnp.int8)
    return initial, d_run, main_code


rewrite_device_kernel = jax.jit(rewrite_math, static_argnames=("R",))

# ---------------------------------------------------------------------------
# Tunnel-friendly packing: the link to the (remote) chip moves ~15 MB/s, so
# bytes on the wire dominate the batch time.  Queries ship as 4-bit dna5
# codes; the result arrays come back as nibble-packed op codes plus a sparse
# list of the (rare) non-zero deletion-run lengths.
# ---------------------------------------------------------------------------

_QUERY_CODE = np.full(256, 5, dtype=np.uint8)  # 5 == padding / other
for _i, _c in enumerate(b"ACGTN"):
    _QUERY_CODE[_c] = _i
_QUERY_DECODE = jnp.asarray(
    np.array([65, 67, 71, 84, 78, 0, 0, 0], dtype=np.uint8)  # "ACGTN" + pad
)

D_SPARSE_SLOTS = 8  # non-zero deletion runs per record (overflow -> refetch)


def pack_query(query: np.ndarray) -> np.ndarray:
    """uint8 (B, Lq) query bytes -> 4-bit codes packed (B, Lq/2)."""
    codes = _QUERY_CODE[query]
    return (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)


def _unpack_query(packed: jnp.ndarray, lq: int) -> jnp.ndarray:
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    codes = jnp.stack([lo, hi], axis=2).reshape(packed.shape[0], lq)
    return _QUERY_DECODE[codes]


def _rewrite_math_packed(index, ref_flat, src_seq, dst_seq, rec_src_pos,
                         ref_off, ops, counts, query_packed, R, Lq):
    """rewrite_math with wire-packed inputs/outputs.

    Returns (dst_pos, code_packed (B, R/2) u8 nibbles, d_vals (B, K) u8,
    d_pos (B, K) u8 unit indices, d_n (B,) i32, overflow i32, d_run full).
    overflow counts records whose sparse slots or u8 value range ran out;
    the host then re-fetches the full int32 d_run.
    """
    query = _unpack_query(query_packed, Lq)
    dst_pos, d_run, main_code = rewrite_math(
        index, ref_flat, src_seq, dst_seq, rec_src_pos, ref_off, ops, counts,
        query, R,
    )
    code_packed = (
        (main_code[:, 0::2].astype(jnp.uint8) & 0xF)
        | ((main_code[:, 1::2].astype(jnp.uint8) & 0xF) << 4)
    )

    nz = d_run > 0
    slot = jnp.cumsum(nz.astype(jnp.int32), axis=1) - 1
    d_n = jnp.sum(nz, axis=1).astype(jnp.int32)
    K = D_SPARSE_SLOTS
    scatter_to = jnp.where(nz, jnp.clip(slot, 0, K - 1), K)
    B = d_run.shape[0]
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], d_run.shape)
    d_vals = jnp.zeros((B, K), jnp.uint8).at[
        bidx.reshape(-1), scatter_to.reshape(-1)
    ].set(jnp.minimum(d_run, 255).astype(jnp.uint8).reshape(-1), mode="drop")
    d_pos = jnp.zeros((B, K), jnp.uint8).at[
        bidx.reshape(-1), scatter_to.reshape(-1)
    ].set(
        jnp.broadcast_to(
            jnp.arange(R, dtype=jnp.int32)[None, :], d_run.shape
        ).astype(jnp.uint8).reshape(-1),
        mode="drop",
    )
    overflow = (
        jnp.sum(jnp.where(d_n > K, 1, 0))
        + jnp.sum(jnp.where(d_run >= 255, 1, 0))
        + jnp.where(R > 255, 1, 0)
    ).astype(jnp.int32)
    return dst_pos, code_packed, d_vals, d_pos, d_n, overflow, d_run


rewrite_device_kernel_packed = jax.jit(
    _rewrite_math_packed, static_argnames=("R", "Lq")
)


def fetch_rewrite_outputs(out, R: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fetch (dst_pos, d_run, main_code) from a packed-kernel result,
    falling back to the full int32 deletion runs only on overflow."""
    dst_pos, code_packed, d_vals, d_pos, d_n, overflow = jax.device_get(out[:6])
    b = dst_pos.shape[0]
    main_code = np.empty((b, R), dtype=np.int8)
    main_code[:, 0::2] = code_packed & 0xF
    main_code[:, 1::2] = (code_packed >> 4) & 0xF
    # nibble 15 is CODE_NONE (already 15 = 0xF, fits); codes are 0..15
    if int(overflow):
        d_run = jax.device_get(out[6])
    else:
        d_run = np.zeros((b, R), dtype=np.int32)
        k = np.arange(D_SPARSE_SLOTS)[None, :]
        valid = k < d_n[:, None]
        rows = np.broadcast_to(np.arange(b)[:, None], valid.shape)[valid]
        d_run[rows, d_pos[valid].astype(np.int64)] = d_vals[valid]
    return dst_pos, d_run, main_code


def finalize_rewrite(
    batch: RewriteBatch,
    dst_pos: np.ndarray,
    d_run: np.ndarray,
    main_code: np.ndarray,
) -> tuple[list[int], list[Cigar]]:
    """Merge device results into per-record rewritten CIGARs (one flat RLE
    pass: adjacent equal ops merge within a record, runs break at record
    boundaries)."""
    total_units = len(batch.unit_op)
    b = len(batch.src_seq)

    is_ref = _IS_REF_OP[batch.unit_op]

    # device rows -> flat per-record ref-unit stream (row-major order of the
    # valid region matches unit order)
    R = batch.pad_ref_units
    valid = np.arange(R)[None, :] < batch.n_ref_units[:, None]
    dev_d = d_run[valid]
    dev_code = main_code[valid]

    out_ops = np.empty((total_units, 2), dtype=np.int16)
    out_lens = np.zeros((total_units, 2), dtype=np.int32)
    out_ops[:, 0] = CODE_NONE
    out_ops[:, 1] = batch.unit_op
    out_lens[:, 1] = batch.unit_count
    out_ops[is_ref, 0] = D
    out_lens[is_ref, 0] = dev_d
    out_ops[is_ref, 1] = dev_code
    out_lens[is_ref, 1] = np.where(dev_code == CODE_NONE, 0, 1)

    flat_ops = out_ops.reshape(-1)
    flat_lens = out_lens.reshape(-1)
    flat_rec = np.repeat(batch.unit_rec, 2)

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


# ---------------------------------------------------------------------------
# Gap-geometry kernel ("rewrite v3"): the device computes ONLY the
# coordinate/gap structure — per ref unit its inter-position deletion run
# and whether the destination column is a gap.  The =/X character
# comparison is host work (the host already holds the query and the
# reference contig bytes), so neither the query nor the reference ships to
# the device at all.  Wire cost drops from ~220 B/read to ~60 B/read and
# the kernel loses the two character gathers; profiling showed the tool
# fetch-bound on exactly those bytes.
#
# Inputs per record: src/dst sequence ids, source position, ref-unit count
# (16 B).  Outputs: dst_pos, isgap bitmask (R/8 B), sparse deletion runs.
# ---------------------------------------------------------------------------


def _gap_math(index, src_seq, dst_seq, rec_src_pos, n_ref_units, R):
    """(initial dst positions, d_run int32[B, R], isgap int32[B, R]).

    The R units of a record are CONSECUTIVE source positions, so select0
    loads one contiguous ``zsel`` slice per record (select0_consecutive)
    and rank0_and_bit is one combined-table gather per unit — values
    beyond ``n_ref_units`` are garbage and masked here."""
    r = jnp.arange(R, dtype=jnp.int32)[None, :]
    valid = r < n_ref_units[:, None]
    aligned = index.select0_consecutive(src_seq, rec_src_pos + 1, R)
    excess, isgap = index.rank0_and_bit(dst_seq[:, None], aligned)
    # aligned[:, 0] == select0(src, pos + 1) independent of n_ref_units
    initial = index.rank0(dst_seq, aligned[:, 0])
    isgap = jnp.where(valid, isgap, 0)
    nongap = jnp.where(valid, 1 - isgap, 0)
    prev_excess = jnp.concatenate(
        [initial[:, None], (excess + nongap)[:, :-1]], axis=1
    )
    d_run = jnp.where(valid, jnp.maximum(excess - prev_excess, 0), 0).astype(
        jnp.int32
    )
    return initial, d_run, isgap


def _gap_math_packed(index, src_seq, dst_seq, rec_src_pos, n_ref_units, R):
    """Gap kernel with wire-packed outputs: isgap as a bitmask and the
    (rare) non-zero deletion runs as per-record sparse slots."""
    initial, d_run, isgap = _gap_math(
        index, src_seq, dst_seq, rec_src_pos, n_ref_units, R
    )
    B = d_run.shape[0]
    # bitmask: 8 units per byte, little-endian bit order
    bits = isgap.astype(jnp.uint8).reshape(B, R // 8, 8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))[None, None, :]
    gapbits = jnp.sum(bits * weights, axis=2).astype(jnp.uint8)

    nz = d_run > 0
    slot = jnp.cumsum(nz.astype(jnp.int32), axis=1) - 1
    d_n = jnp.sum(nz, axis=1).astype(jnp.int32)
    K = D_SPARSE_SLOTS
    # compact the <=K non-zero runs per record via one-hot reductions
    # (TPU scatters serialize; a (B, K, R) masked sum stays on the VPU)
    sel = nz[:, None, :] & (
        slot[:, None, :] == jnp.arange(K, dtype=jnp.int32)[None, :, None]
    )
    d_vals = jnp.sum(
        jnp.where(sel, jnp.minimum(d_run, 255)[:, None, :], 0), axis=2
    ).astype(jnp.uint8)
    d_pos = jnp.sum(
        jnp.where(sel, jnp.arange(R, dtype=jnp.int32)[None, None, :], 0),
        axis=2,
    ).astype(jnp.uint8)
    overflow = (
        jnp.sum(jnp.where(d_n > K, 1, 0))
        + jnp.sum(jnp.where(d_run >= 255, 1, 0))
        + jnp.where(R > 255, 1, 0)
    ).astype(jnp.int32)
    # wire-packed count: valid (<= R <= 255) whenever overflow == 0
    d_n8 = jnp.minimum(d_n, 255).astype(jnp.uint8)
    return initial, gapbits, d_vals, d_pos, d_n8, overflow, d_run


rewrite_gap_kernel_packed = jax.jit(_gap_math_packed, static_argnames=("R",))


# ---------------------------------------------------------------------------
# Single-buffer wire format: the tunnel charges per RPC as well as per byte,
# so the fast lane ships ONE u8 array each way.  Input row (10 B/record):
# [pos i32 LE | n_units u16 LE | src u16 LE | dst u16 LE].  Output row
# (5 + R/8 + 2K B): [dst_pos i32 LE | d_n u8 | gapbits R/8 | d_pos K | d_vals K].
# ---------------------------------------------------------------------------

GAP_WIRE_IN = 10


def gap_wire_row_bytes(R: int) -> int:
    return 5 + R // 8 + 2 * D_SPARSE_SLOTS


def pack_gap_wire_input(
    pos: np.ndarray, n_units: np.ndarray, src: np.ndarray, dst: np.ndarray
) -> np.ndarray:
    b = len(pos)
    out = np.empty((b, GAP_WIRE_IN), dtype=np.uint8)
    out[:, 0:4] = pos.astype("<i4").view(np.uint8).reshape(b, 4)
    out[:, 4:6] = n_units.astype("<u2").view(np.uint8).reshape(b, 2)
    out[:, 6:8] = src.astype("<u2").view(np.uint8).reshape(b, 2)
    out[:, 8:10] = dst.astype("<u2").view(np.uint8).reshape(b, 2)
    return out


def _gap_math_wire(index, packed_in, R):
    p = packed_in.astype(jnp.int32)
    pos = p[:, 0] | (p[:, 1] << 8) | (p[:, 2] << 16) | (p[:, 3] << 24)
    n_units = p[:, 4] | (p[:, 5] << 8)
    src = p[:, 6] | (p[:, 7] << 8)
    dst = p[:, 8] | (p[:, 9] << 8)
    initial, gapbits, d_vals, d_pos, d_n8, overflow, d_run = _gap_math_packed(
        index, src, dst, pos, n_units, R
    )
    pos_bytes = jnp.stack(
        [((initial >> k) & 0xFF).astype(jnp.uint8) for k in (0, 8, 16, 24)],
        axis=1,
    )
    wire = jnp.concatenate(
        [pos_bytes, d_n8[:, None], gapbits, d_pos, d_vals], axis=1
    )
    return wire, overflow, d_run


rewrite_gap_kernel_wire = jax.jit(_gap_math_wire, static_argnames=("R",))


def unpack_gap_wire(wire: np.ndarray, R: int):
    """Split a fetched wire buffer back into (dst_pos i32, d_n u8,
    gapbits u8[B, R/8], d_pos u8[B, K], d_vals u8[B, K]); all contiguous."""
    b = wire.shape[0]
    K = D_SPARSE_SLOTS
    dst_pos = np.ascontiguousarray(wire[:, 0:4]).view("<i4").reshape(b)
    d_n = np.ascontiguousarray(wire[:, 4])
    gapbits = np.ascontiguousarray(wire[:, 5:5 + R // 8])
    d_pos = np.ascontiguousarray(wire[:, 5 + R // 8:5 + R // 8 + K])
    d_vals = np.ascontiguousarray(wire[:, 5 + R // 8 + K:5 + R // 8 + 2 * K])
    return dst_pos, d_n, gapbits, d_pos, d_vals


def fetch_gap_outputs(out, R: int):
    """(dst_pos, d_run int32[B, R], isgap uint8[B, R]) from the packed gap
    kernel; falls back to the full deletion-run array only on overflow."""
    dst_pos, gapbits, d_vals, d_pos, d_n, overflow = jax.device_get(out[:6])
    b = dst_pos.shape[0]
    isgap = np.unpackbits(gapbits, axis=1, bitorder="little", count=R)
    if int(overflow):
        d_run = jax.device_get(out[6])
    else:
        d_run = np.zeros((b, R), dtype=np.int32)
        k = np.arange(D_SPARSE_SLOTS)[None, :]
        valid = k < d_n[:, None]
        rows = np.broadcast_to(np.arange(b)[:, None], valid.shape)[valid]
        d_run[rows, d_pos[valid].astype(np.int64)] = d_vals[valid]
    return dst_pos, d_run, isgap


def reconstruct_main_code(
    unit_op: np.ndarray,     # int8[total_units] flat unit stream
    unit_count: np.ndarray,  # int32[total_units]
    unit_rec: np.ndarray,    # int32[total_units]
    b: int,
    R: int,
    dst_pos: np.ndarray,     # int32[B]
    d_run: np.ndarray,       # int32[B, R]
    isgap: np.ndarray,       # uint8[B, R] (zero beyond the valid region)
    query2d: np.ndarray,     # uint8[B, Lq] dna5-normalised
    ref_flat: np.ndarray,    # uint8[] raw host reference bytes (concat)
    ref_off: np.ndarray,     # int32[B] per-record offset into ref_flat
    ref_len: np.ndarray | None = None,  # int64[B] per-record contig length
) -> np.ndarray:
    """Host-side emitted-op reconstruction (the character-comparison half
    of rewrite_cigar.hh:80-152): given the device's gap geometry, compare
    query vs reference bytes locally and emit =/X/I/D/CODE_NONE per ref
    unit.  Matches rewrite_math's main_code on the valid region exactly
    for well-formed records.  Note: on a MALFORMED record whose
    query-consuming CIGAR length exceeds |query|, this host path clamps the
    query index to the last byte while rewrite_math's scatter formulation
    yields qchar=0 (emits X) — such records are rejected upstream with a
    typed error before either path runs (SamRecord CIGAR/SEQ validation;
    see the robustness-audit parity tests), so the divergence is
    unreachable in the pipeline."""
    unit_op = np.asarray(unit_op)
    unit_count = np.asarray(unit_count, dtype=np.int64)
    unit_rec = np.asarray(unit_rec)
    is_ref = _IS_REF_OP[unit_op]
    is_m = _IS_MTYPE_OP[unit_op]
    is_q = _IS_QUERY_OP[unit_op]

    # per-unit exclusive query prefix within each record
    qc = np.where(is_m | is_q, unit_count, 0)
    cq = np.cumsum(qc)
    excl_q = cq - qc
    if len(unit_rec):
        starts = np.r_[0, np.flatnonzero(np.diff(unit_rec)) + 1]
        present = unit_rec[starts]
        first_q = np.zeros(b, dtype=np.int64)
        first_q[present] = excl_q[starts]
        qpos_flat = excl_q - first_q[unit_rec]
        # within-record ref-unit column
        isr = is_ref.astype(np.int64)
        cr = np.cumsum(isr)
        excl_r = cr - isr
        first_r = np.zeros(b, dtype=np.int64)
        first_r[present] = excl_r[starts]
        col_flat = excl_r - first_r[unit_rec]
    else:
        qpos_flat = np.zeros(0, dtype=np.int64)
        col_flat = np.zeros(0, dtype=np.int64)

    rows = unit_rec[is_ref]
    col = col_flat[is_ref]
    mtype_u = is_m[is_ref]
    qpos_u = qpos_flat[is_ref]

    # reference position per unit: excess = dst_pos + cum(d_run) +
    # shifted-cum(nongap) (the prev_excess recurrence of rewrite_math;
    # contributions beyond the valid region only affect positions that are
    # never gathered)
    cum_d = np.cumsum(d_run, axis=1, dtype=np.int64)
    ng = (1 - isgap).astype(np.int64)
    cum_ng = np.concatenate(
        [np.zeros((b, 1), np.int64), np.cumsum(ng, axis=1)[:, :-1]], axis=1
    )
    excess = dst_pos[:, None].astype(np.int64) + cum_d + cum_ng

    refpos = excess[rows, col]
    # clamp within the record's contig (matches the native
    # finalize_reconstruct; only out-of-range units on malformed records
    # reach the clamp)
    ref_flat = np.asarray(ref_flat)
    if ref_len is not None:
        refpos = np.clip(refpos, 0, np.maximum(ref_len[rows] - 1, 0))
    idx = np.clip(
        ref_off[rows].astype(np.int64) + refpos, 0, max(0, len(ref_flat) - 1)
    )
    dst_char = ref_flat[idx]
    lq = query2d.shape[1]
    qchar = query2d[rows, np.minimum(qpos_u, lq - 1)]
    gap = isgap[rows, col].astype(bool)
    eq = qchar == dst_char
    code_u = np.where(
        mtype_u,
        np.where(gap, I, np.where(eq, EQ, X)),
        np.where(gap, CODE_NONE, D),
    ).astype(np.int8)
    main_code = np.full((b, R), CODE_NONE, np.int8)
    main_code[rows, col] = code_u
    return main_code


def rewrite_batch(
    index: DeviceGapIndex,
    ref_flat,
    batch: RewriteBatch,
) -> tuple[list[int], list[Cigar]]:
    """Run the full batched rewrite (host stage -> device -> host RLE)."""
    out = rewrite_device_kernel(
        index,
        ref_flat,
        batch.src_seq,
        batch.dst_seq,
        batch.rec_src_pos,
        batch.ref_off,
        batch.ops,
        batch.counts,
        batch.query,
        batch.pad_ref_units,
    )
    dst_pos, d_run, main_code = jax.device_get(out)
    return finalize_rewrite(batch, dst_pos, d_run, main_code)
