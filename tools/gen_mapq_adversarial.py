#!/usr/bin/env python
"""Generate the LOCKED adversarial recalculate_mapq fixture
(tests/data/mapq_adversarial.tsv).

The projector has its adversarial golden table
(tests/data/projector_adversarial.tsv); this is the analogous anchor for
the OTHER semantically-risky component, the MAPQ group algorithm
(/root/reference/recalculate-mapq/main.cc:960-1179) whose subtle
invariants (exact Bowtie2-v2 table boundaries, dedup-by-position-pair
keep-best, MAPQ 255 for non-best duplicates, mate lookup via YR/YP
binary search, the sequences_eq paired/content rule, the it==end
own-sequence UB-parity case, mixed-pairedness skips) are easy to drift
in ALL engines at once — the randomized differential test only proves
the engines agree with each other.

Constructions:

- score ladders landing diff_next/normalised-score quotients just above,
  below and exactly ON the NON_UNIQUE_ALIGNMENT_SCORES thresholds
  (0.67/0.68/0.84/0.88/1.0 x 0.0..0.9), including diff_next == 0 exact
  ties (the `1 if nsq >= 0.67 else 0` branch);
- duplicate normalised projected position pairs with distinct totals
  (dedup keeps best; the rest get MAPQ 255) for paired records, and the
  same positions NOT deduplicated for unpaired records (unique seq_key);
- mate lookup edges: YR/YP at an existing original position, between two
  positions (not found), below every position (j == 0), missing tags
  (INVALID_POSITION), RNEXT `=` vs explicit;
- groups with no valid positions; mixed paired/unpaired groups (skipped
  and dropped from the output);
- reverse/secondary flags, float AS tags, missing AS tags
  (ALIGNMENT_SCORE_MIN), `*` sequences;
- rescore-mode records: =/X CIGARs with soft clips, I/D gap runs, N
  bases, XN reference-N bitmasks, QUAL ladders across the Phred-scaled
  penalty table (incl. q=0 and q>=40 saturation).

Expected values come from the OBJECT path (MapqScorer), which is
calibrated against the reference's tables and algorithm; the table locks
that behaviour and the C group engine + the pure-Python scorer fallback
are then held to it by tests/test_mapq_adversarial.py.  Regenerate ONLY
on a deliberate semantics change:  python tools/gen_mapq_adversarial.py

Fixture format (TSV, one record per line):
  I\t<sam line>            input alignment line, in order
  O\tastag\t<sam line>     expected output line, AS-tag scorer mode
  O\trescore\t<sam line>   expected output line, --rescore-alignments
"""
from __future__ import annotations

import io
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT = pathlib.Path(__file__).resolve().parent.parent / (
    "tests/data/mapq_adversarial.tsv"
)

RNAMES = ("chrA", "chrB")
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _seq(rng, n, with_n=False):
    s = rng.choice(BASES, n).astype(np.uint8)
    if with_n and n >= 4:
        idx = rng.integers(0, n, max(1, n // 16))
        s[idx] = ord("N")
    return s.tobytes().decode()


def _qual(rng, n, lo=0, hi=41):
    return "".join(chr(33 + int(q)) for q in rng.integers(lo, hi + 1, n))


class Group:
    """One QNAME group under construction."""

    def __init__(self, qname):
        self.qname = qname
        self.lines = []

    def add(
        self,
        *,
        flag=0,
        rname="chrA",
        pos=1000,
        cigar=None,
        rnext="*",
        pnext=0,
        seq="ACGT",
        qual="*",
        tags=(),
    ):
        cigar = cigar or (f"{len(seq)}=" if seq != "*" else "*")
        self.lines.append(
            f"{self.qname}\t{flag}\t{rname}\t{pos}\t60\t{cigar}\t{rnext}\t"
            f"{pnext}\t0\t{seq}\t{qual}"
            + ("\t" + "\t".join(tags) if tags else "")
        )


def build_groups(rng):
    groups = []
    gid = 0

    def new(tag):
        nonlocal gid
        gid += 1
        g = Group(f"adv{gid:03d}_{tag}")
        groups.append(g)
        return g

    # ---- A. unpaired score ladders across the Bowtie2-v2 table ---------
    # Unpaired: min = -0.6 - 0.6*L, range = 0.6 + 0.6*L.  With L = 99 the
    # range is 60.0, so integer AS values step the quotients in 1/60s —
    # land just-below / just-above each normalised and diff threshold.
    L = 99
    rng_a = rng
    for dn_times60 in (0, 1, 5, 6, 7, 11, 12, 13, 17, 23, 29, 35, 41, 47, 53, 55):
        for best_as in (0, -3, -9, -19, -32, -45, -57):
            g = new(f"lad{dn_times60}_{-best_as}")
            seq = _seq(rng_a, L)
            next_as = best_as - dn_times60
            g.add(
                pos=int(rng_a.integers(1, 50000)),
                seq=seq,
                cigar=f"{L}=",
                tags=(f"AS:i:{best_as}", "XR:i:0",
                      f"XP:i:{int(rng_a.integers(0, 50000))}"),
            )
            g.add(
                pos=int(rng_a.integers(50001, 90000)),
                seq=seq,
                cigar=f"{L}=",
                tags=(f"AS:i:{next_as}", "XR:i:1",
                      f"XP:i:{int(rng_a.integers(0, 50000))}"),
            )

    # the (0.5, 0.0, 5) row needs nsq < 0.68 AND an unclamped next score:
    # best = -20, next = -55 (>= min -60.06) -> diff 35/60 = 0.583,
    # nsq = 40.6/60 = 0.677
    for best_as, dn in ((-20, 35), (-24, 31)):
        g = new(f"row5_{-best_as}")
        seq = _seq(rng, L)
        g.add(pos=1500, seq=seq, cigar=f"{L}=",
              tags=(f"AS:i:{best_as}", "XR:i:0", "XP:i:60"))
        g.add(pos=88000, seq=seq, cigar=f"{L}=",
              tags=(f"AS:i:{best_as - dn}", "XR:i:1", "XP:i:61"))

    # exact diff_next == 0 ties at / around the 0.67 normalised boundary
    for best_as in (0, -10, -19, -20, -21, -40, -59):
        g = new(f"tie{-best_as}")
        seq = _seq(rng, L)
        for k in range(3):
            g.add(
                pos=1000 + 7000 * k,
                seq=seq,
                cigar=f"{L}=",
                tags=(f"AS:i:{best_as}", "XR:i:0", f"XP:i:{100 + 11 * k}"),
            )

    # ---- B. paired groups: dedup, MAPQ 255, mate lookup edges ----------
    for variant in range(10):
        g = new(f"pair{variant}")
        L1, L2 = 80, 60
        s1, s2 = _seq(rng, L1), _seq(rng, L2)
        # two candidate pairs at distinct projected positions
        for c, (p1, p2) in enumerate(((2000, 2600), (40000, 40500))):
            as1, as2 = -2 * c - variant % 3, -5 * c
            op1, op2 = 100 + 10 * c, 200 + 10 * c
            g.add(flag=99, rname="chrA", pos=p1, seq=s1, cigar=f"{L1}=",
                  rnext="=", pnext=p2,
                  tags=(f"AS:i:{as1}", "XR:i:0", f"XP:i:{op1}",
                        "YR:i:0", f"YP:i:{op2}"))
            g.add(flag=147, rname="chrA", pos=p2, seq=s2, cigar=f"{L2}=",
                  rnext="=", pnext=p1,
                  tags=(f"AS:i:{as2}", "XR:i:0", f"XP:i:{op2}",
                        "YR:i:0", f"YP:i:{op1}"))
        if variant % 2:
            # a DUPLICATE projected position pair with a lower total:
            # deduplicated away (paired seq_key is None) -> its records
            # score against the surviving entry; non-best -> MAPQ 255
            g.add(flag=99, rname="chrA", pos=2000, seq=s1, cigar=f"{L1}=",
                  rnext="=", pnext=2600,
                  tags=("AS:i:-40", "XR:i:0", "XP:i:300",
                        "YR:i:0", "YP:i:310"))
            g.add(flag=147, rname="chrA", pos=2600, seq=s2, cigar=f"{L2}=",
                  rnext="=", pnext=2000,
                  tags=("AS:i:-41", "XR:i:0", "XP:i:310",
                        "YR:i:0", "YP:i:300"))
        if variant % 3 == 0:
            # mate-lookup misses: YP between original positions, below all,
            # and missing YR/YP tags entirely
            g.add(flag=99, rname="chrB", pos=70000, seq=s1, cigar=f"{L1}=",
                  rnext="=", pnext=70400,
                  tags=("AS:i:-7", "XR:i:1", "XP:i:5000",
                        "YR:i:1", "YP:i:4999"))
            g.add(flag=147, rname="chrB", pos=70400, seq=s2, cigar=f"{L2}=",
                  rnext="=", pnext=70000,
                  tags=("AS:i:-8", "XR:i:1", "XP:i:5001",
                        "YR:i:0", "YP:i:0"))
        if variant == 7:
            # mate position tags valid but RNEXT/PNEXT fields themselves
            # absent (unpaired-by-field while tags claim otherwise)
            g.add(flag=0, rname="chrB", pos=81000, seq=s1, cigar=f"{L1}=",
                  tags=("AS:i:-3", "XR:i:1", "XP:i:6000"))

    # ---- C. unpaired same-position NON-dedup --------------------------
    g = new("samepos_unpaired")
    s = _seq(rng, 70)
    for k in range(3):
        g.add(pos=12345, seq=s, cigar="70=",
              tags=(f"AS:i:{-4 * k}", "XR:i:0", f"XP:i:{400 + k}"))
    # distinct sequences at the same position: content comparison matters
    g = new("samepos_diffseq")
    for k in range(3):
        g.add(pos=2222, seq=_seq(rng, 64), cigar="64=",
              tags=(f"AS:i:{-3 * k}", "XR:i:0", f"XP:i:{500 + k}"))

    # ---- D. positions / tags invalid ----------------------------------
    g = new("novalidpos")
    for k in range(2):
        g.add(pos=900 + k, seq=_seq(rng, 40), cigar="40=",
              tags=(f"AS:i:{-k}",))  # no XR/XP at all
    g = new("missing_as")
    g.add(pos=600, seq=_seq(rng, 50), cigar="50=", tags=("XR:i:0", "XP:i:70"))
    g.add(pos=700, seq=_seq(rng, 50), cigar="50=",
          tags=("AS:i:-2", "XR:i:0", "XP:i:80"))
    g = new("star_seq")
    g.add(pos=800, seq="*", cigar="*", tags=("AS:i:-1", "XR:i:0", "XP:i:90"))
    g.add(pos=850, seq=_seq(rng, 30), cigar="30=",
          tags=("AS:i:-2", "XR:i:0", "XP:i:91"))

    # ---- E. mixed pairedness: whole group skipped ---------------------
    g = new("mixed_skip")
    s = _seq(rng, 44)
    g.add(flag=99, rname="chrA", pos=100, seq=s, cigar="44=", rnext="=",
          pnext=300, tags=("AS:i:-1", "XR:i:0", "XP:i:10",
                           "YR:i:0", "YP:i:20"))
    g.add(flag=0, rname="chrA", pos=500, seq=s, cigar="44=",
          tags=("AS:i:-2", "XR:i:0", "XP:i:20"))

    # ---- F. float AS tags, reverse/secondary flags --------------------
    g = new("float_as")
    s = _seq(rng, 66)
    g.add(pos=3000, seq=s, cigar="66=", flag=16,
          tags=("AS:f:-3.5", "XR:i:0", "XP:i:120"))
    g.add(pos=9000, seq=s, cigar="66=", flag=272,
          tags=("AS:f:-10.25", "XR:i:1", "XP:i:130"))

    # ---- G. rescore-mode constructions --------------------------------
    # CIGAR shapes whose recomputed scores ladder the quality-scaled
    # penalty table; AS tags present so astag mode scores them too.
    for variant in range(8):
        g = new(f"resc{variant}")
        Lr = 64
        with_n = variant % 2 == 1
        s = _seq(rng, Lr, with_n=with_n)
        qual = _qual(rng, Lr, lo=0 if variant < 4 else 30,
                     hi=12 if variant < 2 else 41)
        n_x = variant % 5
        body = Lr - n_x
        if variant % 3 == 0 and body > 12:
            # 4S + (body-10)= + nX + 2I + 4= consumes exactly Lr query chars
            cigar = f"4S{body - 10}={n_x}X2I4="
        elif variant % 3 == 1:
            cigar = f"{body}={n_x}X" if n_x else f"{Lr}="
        else:
            # the deletion consumes reference only; query usage is exact
            cigar = f"{body - 6}=2D{n_x}X6=" if n_x else f"{Lr - 6}=3D6="
        tags = [f"AS:i:{-variant}", "XR:i:0", f"XP:i:{1000 + variant}"]
        if variant % 4 == 0:
            nb = (Lr + 7) // 8
            items = ",".join(
                str(int(x)) for x in rng.integers(0, 256, nb)
            )
            tags.append(f"XN:B:C,{items}")
        g.add(pos=5000 + 100 * variant, seq=s, cigar=cigar, qual=qual,
              tags=tuple(tags))
        # a competitor so MAPQ has a next score
        g.add(pos=60000 + 100 * variant, seq=s, cigar=f"{Lr}=",
              qual=_qual(rng, Lr),
              tags=(f"AS:i:{-variant - 4}", "XR:i:1",
                    f"XP:i:{2000 + variant}"))

    return groups


def main():
    from panvc3_tpu.pipeline.recalculate_mapq import run_recalculate_mapq

    rng = np.random.default_rng(20260820)
    groups = build_groups(rng)

    header = ["@HD\tVN:1.6"] + [f"@SQ\tSN:{n}\tLN:100000" for n in RNAMES]
    in_lines = []
    for g in groups:
        in_lines.extend(g.lines)
    sam = ("\n".join(header + in_lines) + "\n").encode()

    rows = [f"I\t{ln}" for ln in in_lines]
    for mode, rescore in (("astag", False), ("rescore", True)):
        out = io.BytesIO()
        run_recalculate_mapq(io.BytesIO(sam), out, rescore=rescore)
        for ln in out.getvalue().decode().splitlines():
            if ln.startswith("@"):
                continue
            rows.append(f"O\t{mode}\t{ln}")

    OUT.write_text("\n".join(rows) + "\n")
    n_in = len(in_lines)
    n_out = sum(1 for r in rows if r.startswith("O\t"))
    print(f"wrote {OUT}: {len(groups)} groups, {n_in} input records, "
          f"{n_out} locked output lines")


if __name__ == "__main__":
    main()
