"""Event-based projection geometry: O(#MSA-differences) instead of
O(reads x read-length).

The per-unit gap geometry the rewrite needs (which destination columns
are gaps, how many destination bases fall between consecutive source
units) is fully determined by the columns where the source and
destination gap bitvectors DIFFER.  Real MSAs differ rarely (one indel
site per ~100 bp), so precomputing the difference *runs* per (src, dst)
sequence pair turns the per-record work into two `searchsorted` calls
plus a handful of event decodes — microseconds per batch on the host,
replacing a 1M-gather device dispatch and its tunnel round trip.

Per pair, from ``xor`` of the packed gap words:

- **gap events** ``[gap_start, gap_end]``: maximal runs of consecutive
  source ranks whose aligned column is a destination gap (these emit I
  in place of M/=/X — rewrite_cigar.hh:96-116);
- **del events** ``(del_b, del_len)``: for each inter-unit boundary
  ``b``, the number of destination bases strictly between the aligned
  columns of source units ``b-1`` and ``b`` (these emit D runs —
  rewrite_cigar.hh:88-94,117-133).

Outputs are bit-identical to the device gap kernel
(:func:`panvc3_tpu.ops.rewrite_batch._gap_math`) on the valid region;
tests/test_device_ops.py asserts this on random MSAs.
"""

from __future__ import annotations

from dataclasses import dataclass

import os

import numpy as np

from ..bitvec import GapBitVector


@dataclass
class PairEvents:
    gap_start: np.ndarray  # int64[] first unit rank of a dst-gap run
    gap_end: np.ndarray    # int64[] last unit rank (inclusive)
    del_b: np.ndarray      # int64[] boundary rank (strictly increasing)
    del_len: np.ndarray    # int64[] dst bases between units b-1 and b
    gap_clen: np.ndarray   # int64[n_gap+1] cumulative gap-run lengths
    del_clen: np.ndarray   # int64[n_del+1] cumulative deleted-base counts


def _make_pair_events(gap_start, gap_end, del_b, del_len) -> PairEvents:
    gap_clen = np.zeros(len(gap_start) + 1, np.int64)
    np.cumsum(gap_end - gap_start + 1, out=gap_clen[1:])
    del_clen = np.zeros(len(del_b) + 1, np.int64)
    np.cumsum(del_len, out=del_clen[1:])
    return PairEvents(gap_start, gap_end, del_b, del_len, gap_clen, del_clen)


def build_pair_events(src: GapBitVector, dst: GapBitVector) -> PairEvents:
    """Difference events of one (src, dst) pair from the packed words."""
    mw = min(len(src.words), len(dst.words))
    wd = src.words[:mw] ^ dst.words[:mw]
    empty = np.zeros(0, np.int64)
    # set-bit positions via a C-level unpack: at genome scale the previous
    # per-word (nzw, 32) expansion built multi-hundred-MB int64
    # intermediates and dominated engine start-up
    bits_all = np.unpackbits(
        np.ascontiguousarray(wd).view(np.uint8), bitorder="little"
    )
    cols = np.flatnonzero(bits_all).astype(np.int64)
    cols = cols[cols < min(src.n, dst.n)]
    if cols.size == 0:
        return _make_pair_events(empty, empty, empty, empty)
    # src bit + rank0 at every difference column without a full-length
    # cumulative array: gaps are sparse, so rank0(c) = c - (# gap
    # positions < c) via one searchsorted over the gap-position list
    # (the general gather-based rank0 and a full int64 cumsum both
    # dominated genome-scale engine start-up)
    up_to = int(cols[-1]) + 1
    src_bits = np.unpackbits(
        np.ascontiguousarray(src.words).view(np.uint8),
        count=up_to,
        bitorder="little",
    )
    src_gap_pos = np.flatnonzero(src_bits)
    sbit = src_bits[cols]
    srank = cols - np.searchsorted(src_gap_pos, cols, side="left")

    # src zero + dst gap: the unit itself projects onto a gap column
    g = srank[sbit == 0]
    if g.size:
        cut = np.r_[True, np.diff(g) > 1]
        gap_start = g[cut]
        gap_end = g[np.r_[cut[1:], True]]
    else:
        gap_start = gap_end = empty

    # src gap + dst zero: a dst base between consecutive units
    d = srank[sbit == 1]
    if d.size:
        del_b, del_len = np.unique(d, return_counts=True)
        del_len = del_len.astype(np.int64)
    else:
        del_b = del_len = empty
    return _make_pair_events(gap_start, gap_end, del_b, del_len)


def project_unit(pe: PairEvents, u: np.ndarray) -> np.ndarray:
    """Destination position of source unit ``u`` from the events alone.

    Identity: ``dst.rank0(src.select0(u + 1)) == u - G(u) + D(u)`` where
    ``G(u)`` counts source units below ``u`` that project onto destination
    gaps (gap-event coverage of ``[0, u)``) and ``D(u)`` counts
    destination-only bases at boundaries ``<= u`` (del-event prefix sum).
    Proof sketch: the aligned columns before ``select0(u+1)`` hold exactly
    ``u`` source units plus the source gaps of rank ``<= u``; a column is
    a destination zero unless it is a gap/del difference event.  This
    replaces the rank/select evaluation of project_position
    (/root/reference/include/panvc3/msa_index.hh:253-258) with two binary
    searches over the O(#MSA-differences) event tables.
    """
    u = np.asarray(u, dtype=np.int64)
    if pe.gap_start.size:
        j = np.searchsorted(pe.gap_end, u, side="left")
        i = np.searchsorted(pe.gap_start, u, side="left")
        straddle = np.where(
            i > j, u - pe.gap_start[np.minimum(j, pe.gap_start.size - 1)], 0
        )
        g = pe.gap_clen[j] + straddle
    else:
        g = np.zeros_like(u)
    if pe.del_b.size:
        d = pe.del_clen[np.searchsorted(pe.del_b, u, side="right")]
    else:
        d = np.zeros_like(u)
    return u - g + d


def _ranges(cnt: np.ndarray) -> np.ndarray:
    """[0..cnt0), [0..cnt1), ... concatenated."""
    total = int(cnt.sum())
    out = np.arange(total, dtype=np.int64)
    starts = np.r_[np.int64(0), np.cumsum(cnt)[:-1]]
    return out - np.repeat(starts, cnt)


class DeviceEventGeometry:
    """Device-resident event tables + the event-geometry kernel.

    The TPU-native counterpart of :class:`EventGeometry`: instead of the
    gap kernel's O(reads x R) rank/select gathers (HBM-random-access
    bound — profiled at ~19 ms per 8192x128-unit batch, >90% in the two
    gathers), the kernel binary-searches the per-pair difference-event
    tables (fixed-trip, ~log2(E) scalar gathers per record) and decodes a
    bounded number of events per record with one-hot compares — pure VPU
    work.  Outputs are bit-identical to ``_gap_math_packed`` on the valid
    region whenever no record overflows the event slots; ``overflow``
    reports slot/width overruns so the caller can fall back to the gap
    kernel (typical reads overlap 0-2 events, so overflow is rare by
    construction of the slot counts).

    Tables are flattened across input reference ids like
    :class:`~panvc3_tpu.ops.rank_select.DeviceGapIndex` and live in HBM
    (a few MB per genome — events scale with MSA differences, not
    length).
    """

    GAP_SLOTS = 8   # dst-gap runs a record may overlap
    DEL_SLOTS = 8   # deletion boundaries a record may overlap (= K)

    def __init__(self, host_geo: "EventGeometry"):
        """All tables (incl. the prefix sums used for the initial-position
        identity, see :func:`project_unit`) come from the host event
        geometry; no device rank/select structures are required."""
        import jax.numpy as jnp

        gs_parts, ge_parts, db_parts, dl_parts = [], [], [], []
        gap_off, del_off = [0], [0]
        nzeros = []
        for pe, sgv in zip(host_geo.events, host_geo.src_gv):
            nzeros.append(sgv.n_zeros if sgv is not None else 0)
            if pe is None:
                gap_off.append(gap_off[-1])
                del_off.append(del_off[-1])
                continue
            gs_parts.append(pe.gap_start)
            ge_parts.append(pe.gap_end)
            db_parts.append(pe.del_b)
            dl_parts.append(pe.del_len)
            gap_off.append(gap_off[-1] + len(pe.gap_start))
            del_off.append(del_off[-1] + len(pe.del_b))

        def cat(parts):
            a = (
                np.concatenate(parts).astype(np.int32)
                if parts
                else np.zeros(0, np.int64)
            )
            # one sentinel so fixed-trip searches can clamp safely
            return np.r_[a, np.int32(2**31 - 1)].astype(np.int32)

        def catsum(parts):
            # global cumulative sums; per-pair values are differences
            # against the value at the pair's base offset
            a = (
                np.concatenate(parts).astype(np.int64)
                if parts
                else np.zeros(0, np.int64)
            )
            return np.r_[np.int64(0), np.cumsum(a)].astype(np.int32)

        # host copies: the kernel never gathers these individually (every
        # device lookup goes through the fused tables below), so they stay
        # off HBM
        self.gap_start = cat(gs_parts)
        self.gap_end = cat(ge_parts)
        self.del_b = cat(db_parts)
        self.del_len = cat(dl_parts)
        self.gap_clen = catsum(
            [pe_ge - pe_gs + 1 for pe_gs, pe_ge in zip(gs_parts, ge_parts)]
        )
        self.del_clen = catsum(dl_parts)
        self.max_gap = int(np.max(np.diff(gap_off), initial=0))
        self.max_del = int(np.max(np.diff(del_off), initial=0))
        # one concatenated search table so the kernel's seven independent
        # binary searches run as ONE fixed-trip loop over stacked queries
        # (each search step is a serialized tiny gather round — the kernel's
        # dominant cost — so 7 searches -> 1 cuts the rounds ~7x)
        ge_n = int(self.gap_end.shape[0])
        gs_n = int(self.gap_start.shape[0])
        self.search_tab = jnp.asarray(
            np.concatenate([self.gap_end, self.gap_start, self.del_b])
        )
        self.base_gap_end = 0
        self.base_gap_start = ge_n
        self.base_del_b = ge_n + gs_n

        # Two-level search: a direct-mapped rank-bucket index per (pair,
        # table) narrows every binary search to one bucket, cutting the
        # serialized gather rounds from ~log2(events/pair) (21 at genome
        # depth) to ~log2(bucket occupancy) (~7).  bucket j of pair p holds
        # the first table index with value >= j << BUCKET_SHIFT; query q
        # searches [bucket[q>>S], bucket[q>>S + 1]].  Memory: one int32 per
        # 2^BUCKET_SHIFT source ranks per table (S auto-tunes below so the
        # index stays ~1.5 bytes/event; PANVC3_EVENT_BUCKET_SHIFT overrides).
        tab_host = np.asarray(self.search_tab)
        go_h = np.asarray(gap_off, np.int64)
        do_h = np.asarray(del_off, np.int64)
        n_pairs_s = len(go_h) - 1
        env_s = os.environ.get("PANVC3_EVENT_BUCKET_SHIFT")
        if env_s:
            S = max(1, int(env_s))
        else:
            # Width so the densest pair averages ~2 events/bucket (~2-3
            # step in-bucket searches; each step costs lanes x B gather
            # elements).  The index then costs ~6 bytes/event — small next
            # to the ~8 bytes/event tables.  Clamped to [6, 12]: sparser
            # tables gain nothing from more buckets, and the kernel falls
            # back to plain binary search when buckets cannot beat it.
            S = 12
            for pp in range(n_pairs_s):
                ev_n = max(
                    int(go_h[pp + 1] - go_h[pp]),
                    int(do_h[pp + 1] - do_h[pp]),
                    1,
                )
                nz_p = max(int(nzeros[pp]), 1)
                S = min(S, max(6, int(np.log2(max(2 * nz_p // ev_n, 1)))))
        self.BUCKET_SHIFT = S
        bucket_parts = []
        bucket_off = [0]
        max_occ = 0
        n_pairs = len(go_h) - 1
        for p in range(n_pairs):
            nz = int(nzeros[p])
            nb = (max(nz + 1, 1) >> S) + 1
            thresholds = np.arange(nb + 1, dtype=np.int64) << S
            row_parts = []
            for base, off in (
                (self.base_gap_end, go_h),
                (self.base_gap_start, go_h),
                (self.base_del_b, do_h),
            ):
                lo = base + int(off[p])
                hi = base + int(off[p + 1])
                vals = tab_host[lo:hi]
                bs = lo + np.searchsorted(vals, thresholds, side="left")
                occ = int(np.max(np.diff(bs), initial=0))
                max_occ = max(max_occ, occ)
                row_parts.append(bs.astype(np.int32))
            # layout per pair: [gap_end | gap_start | del_b] bucket rows,
            # each nb+1 entries (3*(nb+1) per pair block)
            bucket_parts.append(np.concatenate(row_parts))
            bucket_off.append(bucket_off[-1] + 3 * (nb + 1))
        self.bucket_tab = jnp.asarray(
            np.concatenate(bucket_parts)
            if bucket_parts
            else np.zeros(1, np.int32)
        )
        self.bucket_steps = max(1, int(np.ceil(np.log2(max_occ + 1))) + 1)

        # ---- fused gather tables --------------------------------------
        # The kernel's cost is serialized gather ROUNDS, not bytes: every
        # per-pair scalar rides ONE metadata gather, and every post-search
        # lookup (slot decodes, straddle, prefix sums) rides ONE gather
        # over an interleaved table — 16 gather ops -> 3 (+ search steps).
        # rows 7/8 let the kernel drop the ju/jd search lanes (see slots():
        # they equal lo/dlo except at clamped positions, where the answer
        # is a per-pair constant)
        go_i = np.asarray(gap_off, np.int64)
        do_i = np.asarray(del_off, np.int64)
        last_ge = np.where(
            go_i[1:] > go_i[:-1],
            self.gap_end[np.maximum(go_i[1:] - 1, 0)],
            np.int32(-1),
        ).astype(np.int32)
        first_db = np.where(
            do_i[1:] > do_i[:-1],
            self.del_b[np.minimum(do_i[:-1], max(len(self.del_b) - 1, 0))],
            np.int32(-1),
        ).astype(np.int32)
        last_db = np.where(
            do_i[1:] > do_i[:-1],
            self.del_b[np.maximum(do_i[1:] - 1, 0)],
            np.int32(-1),
        ).astype(np.int32)
        meta = np.stack(
            [
                np.asarray(gap_off[:-1], np.int32),   # 0: g_lo0
                np.asarray(gap_off[1:], np.int32),    # 1: g_hi0
                np.asarray(del_off[:-1], np.int32),   # 2: d_lo
                np.asarray(del_off[1:], np.int32),    # 3: d_hi
                np.asarray(nzeros, np.int32),         # 4: n_zeros
                np.asarray(bucket_off[:-1], np.int32),  # 5: bucket base
                np.asarray(np.diff(bucket_off) // 3, np.int32),  # 6: row len
                last_ge,                              # 7: pair's last gap_end
                first_db,                             # 8: pair's first del_b
                last_db,                              # 9: pair's last del_b
            ]
        )
        self.meta_tab = jnp.asarray(meta)

        # interleaved post-search table:
        #   [gs0 ge0 gs1 ge1 ... | db0 dl0 db1 dl1 ... | gap_clen | del_clen]
        # so each gap/del slot decodes with adjacent indices of one gather
        ndel = int(self.del_b.shape[0])
        slot_np = np.empty(2 * (ge_n + ndel), np.int32)
        slot_np[0 : 2 * ge_n : 2] = self.gap_start
        slot_np[1 : 2 * ge_n : 2] = self.gap_end
        self.base_del_il = 2 * ge_n
        slot_np[self.base_del_il :: 2] = self.del_b
        slot_np[self.base_del_il + 1 :: 2] = self.del_len
        self.base_gap_clen = len(slot_np)
        self.base_del_clen = self.base_gap_clen + len(self.gap_clen)
        self.post_tab = jnp.asarray(
            np.concatenate([slot_np, self.gap_clen, self.del_clen])
        )
        self._gap_off_np = go_i
        self._del_off_np = do_i
        self._eff_cache: dict[int, tuple[int, int]] = {}

    def effective_slots(self, R: int) -> tuple[int, int]:
        """Tight per-geometry slot widths for records spanning <= R units.

        Real MSAs are sparse (one indel site per ~100 bp), so a record
        window overlaps 1-3 events, not the worst-case 8 — and every slot
        lane costs a serialized gather element PER RECORD (~10 ns on this
        backend, tools/bench_prims.py).  The bound is exact: for a window
        whose first overlapped gap event is i, the overlap count is at
        most searchsorted(gap_start, gap_end[i] + R) - i (window width
        <= R, events sorted); deletions likewise over del_b.  Records can
        therefore never overflow the effective widths, which are clamped
        to the wire-format maxima GAP_SLOTS/DEL_SLOTS."""
        hit = self._eff_cache.get(R)
        if hit is not None:
            return hit
        kg = kd = 1
        go, do = self._gap_off_np, self._del_off_np
        for pp in range(len(go) - 1):
            gs = self.gap_start[go[pp] : go[pp + 1]]
            ge = self.gap_end[go[pp] : go[pp + 1]]
            if len(gs):
                kg = max(
                    kg,
                    int(
                        np.max(
                            np.searchsorted(gs, ge.astype(np.int64) + R)
                            - np.arange(len(gs))
                        )
                    ),
                )
            db = self.del_b[do[pp] : do[pp + 1]]
            if len(db):
                kd = max(
                    kd,
                    int(
                        np.max(
                            np.searchsorted(db, db.astype(np.int64) + R)
                            - np.arange(len(db))
                        )
                    ),
                )
        out = (min(kg, self.GAP_SLOTS), min(kd, self.DEL_SLOTS))
        self._eff_cache[R] = out
        return out

    def slots(self, ref_ids, pos, n_units, R: int):
        """Jittable: decode the record-relative event slots.

        Returns ``(initial, a, b, gcnt, d_rel, d_len, dcnt, overflow)``:
        ``a``/``b`` int32[B, kg] record-relative ref-rank bounds of the
        overlapping dst-gap runs (clipped to [0, n-1]; invalid slots a=R,
        b=-1), ``d_rel``/``d_len`` int32[B, kd] record-relative deletion
        boundaries in [1, n-1] and their dst-base counts (invalid slots
        zero); (kg, kd) = ``effective_slots(R)`` <= the wire maxima.
        ``overflow`` counts records whose events exceed the slot bounds —
        their slot decodes are truncated and the caller must fall back
        (the wire packers additionally count u8 width overruns).
        """
        import jax.numpy as jnp

        def searchsorted(table, off_lo, off_hi, value, steps):
            # first index in [off_lo, off_hi) with table[i] >= value
            lo = off_lo
            hi = off_hi
            for _ in range(steps):
                mid = (lo + hi) >> 1
                safe = jnp.clip(mid, 0, table.shape[0] - 1)
                go_right = (table[safe] < value) & (mid < hi)
                lo = jnp.where(go_right, mid + 1, lo)
                hi = jnp.where(go_right, hi, mid)
            return lo

        p = pos.astype(jnp.int32)
        n = jnp.minimum(n_units.astype(jnp.int32), R)
        B = p.shape[0]

        gsteps = max(1, int(np.ceil(np.log2(self.max_gap + 1))) + 1)
        dsteps = max(1, int(np.ceil(np.log2(self.max_del + 1))) + 1)
        # every per-pair scalar in ONE gather (rounds, not bytes, are the
        # kernel's cost — see the fused-table note in __init__)
        meta = self.meta_tab[:, ref_ids]                       # (10, B)
        g_lo0, g_hi0, d_lo, d_hi = meta[0], meta[1], meta[2], meta[3]

        # initial = u - G(u) + D(u) over the event prefix sums (see
        # project_unit); no rank/select tables involved.
        u = jnp.clip(p, 0, jnp.maximum(meta[4] - 1, 0))

        # The searches are independent, so they run as ONE fixed-trip loop
        # over stacked queries against the concatenated table: search cost
        # on this backend is per gathered ELEMENT, so fewer lanes is the
        # lever.  Only FOUR searches are needed — the initial-position
        # searches derive from them:
        #   ju (gap_end >= u):  equals lo when 0 <= p < nz (u == p) and
        #     when p < 0 (both reduce to g_lo0: all values >= 0); at
        #     p >= nz, u = nz-1 and gap_end is strictly increasing and
        #     <= nz-1, so ju = g_hi0 - [pair's last gap_end == nz-1]
        #     (meta row 7, -1 for empty pairs);
        #   jd (del_b >= u+1):  equals dlo when 0 <= p < nz; at p < 0,
        #     u+1 = 1 and jd = d_lo + [pair's first del_b == 0] (meta
        #     row 8, del_b strictly increasing); at p >= nz, u+1 = nz and
        #     del_b <= nz, so jd = d_hi - [pair's last del_b == nz]
        #     (meta row 9);
        #   iu (gap_start >= u) is only ever used for the straddle test
        #     iu > ju, which (runs disjoint, gap_start increasing) is
        #     exactly gap_start[ju] < u — and gap_start[ju] is already a
        #     lane of the post-search gather.
        bgs = self.base_gap_start
        bdb = self.base_del_b
        steps = max(gsteps, dsteps)
        q_val = jnp.stack([p, p + n, p + 1, p + n])
        if (
            self.bucket_steps + 2 < steps
            and os.environ.get("PANVC3_EVENT_BUCKETS") != "0"
        ):
            # two-level: the rank-bucket index narrows each search window
            # to one bucket (two extra gather rounds buy ~log2(events) -
            # ~log2(occupancy) fewer loop steps — 21 -> ~9 at genome depth)
            Sh = self.BUCKET_SHIFT
            base_p = meta[5][None, :]
            row_len = meta[6][None, :]
            # table row per query: gap_end=0, gap_start=1, del_b=2
            r_t = jnp.asarray([0, 1, 2, 2], jnp.int32)[:, None]
            j = jnp.clip(q_val >> Sh, 0, row_len - 2)
            slot = base_p + r_t * row_len + j
            bt = self.bucket_tab[jnp.stack([slot, slot + 1])]  # one gather
            res = searchsorted(
                self.search_tab, bt[0], bt[1], q_val, self.bucket_steps
            )
        else:
            q_lo = jnp.stack([g_lo0, g_lo0 + bgs, d_lo + bdb, d_lo + bdb])
            q_hi = jnp.stack([g_hi0, g_hi0 + bgs, d_hi + bdb, d_hi + bdb])
            res = searchsorted(self.search_tab, q_lo, q_hi, q_val, steps)
        lo = res[0]
        hi = res[1] - bgs
        dlo = res[2] - bdb
        dhi = res[3] - bdb
        # meta rows 7-9 are -1 for empty tables, so the == compares below
        # are safely false there (nz - 1 = -1 only with an empty gap table)
        over_end = p > jnp.maximum(meta[4] - 1, 0)
        ju = jnp.where(
            over_end,
            g_hi0
            - jnp.where((meta[7] == meta[4] - 1) & (g_hi0 > g_lo0), 1, 0),
            lo,
        )
        jd = jnp.where(
            over_end,
            # u+1 = nz there (nz = 0 keeps u+1 = 1 > any del_b <= 0)
            d_hi - jnp.where((meta[9] == meta[4]) & (meta[4] >= 1), 1, 0),
            jnp.where(p >= 0, dlo, d_lo + jnp.where(meta[8] == 0, 1, 0)),
        )

        gcnt = jnp.maximum(hi - lo, 0)
        dcnt = jnp.maximum(dhi - dlo, 0)

        # every post-search lookup in ONE gather over the interleaved
        # table, over the geometry's EFFECTIVE slot widths (usually 1-3,
        # not the wire-format 8 — see effective_slots)
        KG, K = self.effective_slots(R)
        kk = jnp.arange(KG, dtype=jnp.int32)[None, :]
        dk = jnp.arange(K, dtype=jnp.int32)[None, :]
        ev = 2 * jnp.clip(lo[:, None] + kk, 0, self.gap_start.shape[0] - 1)
        dev = self.base_del_il + 2 * jnp.clip(
            dlo[:, None] + dk, 0, self.del_b.shape[0] - 1
        )
        ju_c = 2 * jnp.clip(ju, 0, self.gap_start.shape[0] - 1)
        bgc = self.base_gap_clen
        bdc = self.base_del_clen
        post_idx = jnp.concatenate(
            [
                ev, ev + 1, dev, dev + 1,
                ju_c[:, None],
                (bgc + ju)[:, None], (bgc + g_lo0)[:, None],
                (bdc + jd)[:, None], (bdc + d_lo)[:, None],
            ],
            axis=1,
        )
        vals = self.post_tab[post_idx]            # (B, 2KG + 2K + 5)
        gs_v = vals[:, :KG]
        ge_v = vals[:, KG : 2 * KG]
        db_v = vals[:, 2 * KG : 2 * KG + K]
        dl_v = vals[:, 2 * KG + K : 2 * KG + 2 * K]
        c0 = 2 * KG + 2 * K

        # iu > ju  <=>  gap_start[ju] < u (see the lane-derivation note)
        straddle = jnp.where(
            (ju < g_hi0), jnp.maximum(u - vals[:, c0], 0), 0
        )
        g_cov = vals[:, c0 + 1] - vals[:, c0 + 2] + straddle
        d_cov = vals[:, c0 + 3] - vals[:, c0 + 4]
        initial = (u - g_cov + d_cov).astype(jnp.int32)

        ev_valid = kk < gcnt[:, None]
        a = jnp.where(ev_valid, gs_v - p[:, None], R)
        b = jnp.where(ev_valid, ge_v - p[:, None], -1)
        a = jnp.maximum(a, 0)
        b = jnp.minimum(b, n[:, None] - 1)

        dvalid = dk < dcnt[:, None]
        d_pos_i = jnp.where(dvalid, db_v - p[:, None], 0)
        d_len_i = jnp.where(dvalid, dl_v, 0)

        overflow = (
            jnp.sum(jnp.where(gcnt > KG, 1, 0))
            + jnp.sum(jnp.where(dcnt > K, 1, 0))
        ).astype(jnp.int32)
        return initial, a, b, gcnt, d_pos_i, d_len_i, dcnt, overflow

    def pack_isgap(self, a, b, R: int):
        """Little-endian per-record gap bitmask u8[B, R/8] from the clipped
        gap-run slot bounds (the wire format of ``_gap_math_packed``).

        Interval paint as a (B, slots, R) one-hot compare + any-reduce:
        pure VPU work at ~0.09 ns/element, vs ~11 ns/element for the
        scatter-delta formulation's two (B, slots) scatters (this backend
        serializes scatters per element — tools/bench_prims.py), which
        flips the old "fewer element ops" reasoning on its head."""
        import jax.numpy as jnp

        B = a.shape[0]
        r = jnp.arange(R, dtype=jnp.int32)[None, None, :]
        isgap = jnp.any(
            (a[:, :, None] <= r) & (r <= b[:, :, None]), axis=1
        )
        bits = isgap.astype(jnp.uint8).reshape(B, R // 8, 8)
        weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))[None, None, :]
        return jnp.sum(bits * weights, axis=2).astype(jnp.uint8)

    def kernel(self, ref_ids, pos, n_units, R: int):
        """Jittable: (initial, gapbits, d_vals, d_pos, d_n8, overflow).

        Same wire layout as ``_gap_math_packed`` minus the full fallback
        (callers fall back to the gap kernel on overflow)."""
        import jax.numpy as jnp

        from .rewrite_batch import D_SPARSE_SLOTS

        initial, a, b, gcnt, d_pos_i, d_len_i, dcnt, ov_slots = self.slots(
            ref_ids, pos, n_units, R
        )
        gapbits = self.pack_isgap(a, b, R)
        # zero-pad the effective slot widths back to the fixed wire width
        wpad = D_SPARSE_SLOTS - d_len_i.shape[1]
        d_vals = jnp.pad(
            jnp.minimum(d_len_i, 255).astype(jnp.uint8), ((0, 0), (0, wpad))
        )
        d_pos = jnp.pad(
            jnp.minimum(d_pos_i, 255).astype(jnp.uint8), ((0, 0), (0, wpad))
        )
        d_n8 = jnp.minimum(dcnt, 255).astype(jnp.uint8)

        overflow = (
            ov_slots
            + jnp.sum(jnp.where(d_len_i >= 255, 1, 0))
            + jnp.where(R > 255, 1, 0)
        ).astype(jnp.int32)
        return initial, gapbits, d_vals, d_pos, d_n8, overflow

    def kernel_wire(self, ref_ids, pos, n_units, R: int):
        """Single-buffer wire output, same row layout as
        ``rewrite_gap_kernel_wire``: [dst_pos i32 LE | d_n u8 |
        gapbits R/8 | d_pos K | d_vals K].  Callers fall back to the host
        event geometry when ``overflow`` is non-zero."""
        import jax.numpy as jnp

        initial, gapbits, d_vals, d_pos, d_n8, overflow = self.kernel(
            ref_ids, pos, n_units, R
        )
        pos_bytes = jnp.stack(
            [((initial >> k) & 0xFF).astype(jnp.uint8) for k in (0, 8, 16, 24)],
            axis=1,
        )
        wire = jnp.concatenate(
            [pos_bytes, d_n8[:, None], gapbits, d_pos, d_vals], axis=1
        )
        return wire, overflow


class EventGeometry:
    """Per-input-reference event tables + batched geometry queries.

    Produces exactly the arrays the native ``finalize_reconstruct``
    consumes (dst_pos, gapbits bitmask, sparse-or-full deletion runs).
    """

    def __init__(self, src_entries, dst_entries, ref_id_mapping):
        self.src_gv = [e.gaps if e is not None else None for e in src_entries]
        self.dst_gv = [
            dst_entries[ref_id_mapping[i]].gaps
            if src_entries[i] is not None
            and dst_entries[ref_id_mapping[i]] is not None
            else None
            for i in range(len(src_entries))
        ]
        # dedupe identical pairs (many input refs share gap vectors)
        cache: dict[tuple[int, int], PairEvents] = {}
        self.events: list[PairEvents | None] = []
        for s, d in zip(self.src_gv, self.dst_gv):
            if s is None or d is None:
                self.events.append(None)
                continue
            key = (id(s), id(d))
            if key not in cache:
                cache[key] = build_pair_events(s, d)
            self.events.append(cache[key])

        # native fast path: per-rid buffer tuples for event_geometry_batch
        self._native = None
        self._native_group: list[tuple | None] = []
        import os

        if os.environ.get("PANVC3_EVENT_GEOMETRY_NATIVE") != "0":
            from ..native import get_native

            nat = get_native()
            if nat is not None and hasattr(nat, "event_geometry_batch"):
                self._native = nat
                for pe, s, d in zip(self.events, self.src_gv, self.dst_gv):
                    if pe is None:
                        self._native_group.append(None)
                        continue
                    self._native_group.append((
                        np.ascontiguousarray(pe.gap_start),
                        np.ascontiguousarray(pe.gap_end),
                        np.ascontiguousarray(pe.del_b),
                        np.ascontiguousarray(pe.del_len),
                        np.ascontiguousarray(pe.gap_clen),
                        np.ascontiguousarray(pe.del_clen),
                        int(s.n_zeros),
                    ))

    def batch(
        self,
        ref_ids: np.ndarray,   # int32[B] input reference id per record
        pos: np.ndarray,       # int32[B] source position
        n_units: np.ndarray,   # int32[B] ref-consuming CIGAR length
        R: int,                # padded unit count (multiple of 8)
        K: int,                # sparse deletion slots
    ):
        """(dst_pos i32[B], gapbits u8[B, R/8], d_vals u8[B, K],
        d_pos u8[B, K], d_n u8[B], use_full, d_full i32[B*R or 0])."""
        B = len(pos)
        if self._native is not None:
            gs = (R + 7) // 8
            dp_b, gap_b, dv_b, dpos_b, dn_b, use_full, df_b = (
                self._native.event_geometry_batch(
                    np.ascontiguousarray(ref_ids, dtype=np.int32),
                    np.ascontiguousarray(pos, dtype=np.int32),
                    np.ascontiguousarray(n_units, dtype=np.int32),
                    R, K, self._native_group,
                )
            )
            return (
                np.frombuffer(dp_b, np.int32),
                np.frombuffer(gap_b, np.uint8).reshape(B, gs),
                np.frombuffer(dv_b, np.uint8).reshape(B, K),
                np.frombuffer(dpos_b, np.uint8).reshape(B, K),
                np.frombuffer(dn_b, np.uint8),
                use_full,
                np.frombuffer(df_b, np.int32),
            )
        dst_pos = np.zeros(B, np.int32)
        paint = np.zeros((B, R + 1), np.int16)
        rows_parts: list[np.ndarray] = []
        rr_parts: list[np.ndarray] = []
        ll_parts: list[np.ndarray] = []

        for rid in np.unique(ref_ids):
            idx = np.flatnonzero(ref_ids == rid)
            pe = self.events[rid]
            sgv = self.src_gv[rid]
            if pe is None:
                raise ValueError(f"record references index-less ref id {rid}")
            p = pos[idx].astype(np.int64)
            n = np.minimum(n_units[idx].astype(np.int64), R)

            u = np.clip(p, 0, max(0, sgv.n_zeros - 1))
            dst_pos[idx] = project_unit(pe, u).astype(np.int32)

            if pe.gap_start.size:
                lo = np.searchsorted(pe.gap_end, p, side="left")
                hi = np.searchsorted(pe.gap_start, p + n, side="left")
                cnt = np.maximum(hi - lo, 0)
                if cnt.any():
                    rows = np.repeat(idx, cnt)
                    ev = np.repeat(lo, cnt) + _ranges(cnt)
                    pr = np.repeat(p, cnt)
                    a = np.maximum(pe.gap_start[ev] - pr, 0)
                    b = np.minimum(pe.gap_end[ev] - pr, np.repeat(n, cnt) - 1)
                    keep = a <= b
                    np.add.at(paint, (rows[keep], a[keep]), 1)
                    np.add.at(paint, (rows[keep], b[keep] + 1), -1)

            if pe.del_b.size:
                lo = np.searchsorted(pe.del_b, p + 1, side="left")
                hi = np.searchsorted(pe.del_b, p + n, side="left")
                cnt = np.maximum(hi - lo, 0)
                if cnt.any():
                    rows = np.repeat(idx, cnt)
                    ev = np.repeat(lo, cnt) + _ranges(cnt)
                    rows_parts.append(rows)
                    rr_parts.append(pe.del_b[ev] - np.repeat(p, cnt))
                    ll_parts.append(pe.del_len[ev])

        isgap = np.cumsum(paint[:, :R], axis=1) > 0
        gapbits = np.packbits(isgap, axis=1, bitorder="little")

        if rows_parts:
            rows = np.concatenate(rows_parts)
            rr = np.concatenate(rr_parts)
            ll = np.concatenate(ll_parts)
        else:
            rows = rr = ll = np.zeros(0, np.int64)
        counts = np.bincount(rows, minlength=B) if rows.size else np.zeros(B, np.int64)
        use_full = (
            R > 255
            or (counts > K).any()
            or bool(ll.size and ll.max() > 255)
        )
        d_vals = np.zeros((B, K), np.uint8)
        d_pos = np.zeros((B, K), np.uint8)
        d_n = np.zeros(B, np.uint8)
        d_full = np.zeros(0, np.int32)
        if use_full:
            d_full = np.zeros((B, R), np.int32)
            if rows.size:
                np.add.at(d_full, (rows, rr), ll)
            d_full = d_full.reshape(-1)
        elif rows.size:
            # per-row instances are contiguous and rr-ascending (events
            # are scanned in boundary order within each record)
            starts = np.r_[np.int64(0), np.flatnonzero(np.diff(rows)) + 1]
            run_lens = np.diff(np.r_[starts, rows.size])
            rel = np.arange(rows.size, dtype=np.int64) - np.repeat(
                np.arange(rows.size, dtype=np.int64)[starts], run_lens
            )
            d_vals[rows, rel] = ll
            d_pos[rows, rel] = rr
            d_n[:] = counts.astype(np.uint8)
        return dst_pos, gapbits, d_vals, d_pos, d_n, int(use_full), d_full
