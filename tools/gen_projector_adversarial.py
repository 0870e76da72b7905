#!/usr/bin/env python
"""Generate the LOCKED adversarial full-projector fixture table
(tests/data/projector_adversarial.tsv) — VERDICT r4 #8.

The reference's own projector golden set is only 10 cases
(/root/reference/tests/alignment_projector.cc:157-247); the DP-level
tiebreak table (tests/data/tiebreak_fixtures.tsv) covers align_global in
isolation.  This table locks ~120 FULL-projector answers (rewrite +
indel-run detection + realignment + collapse) on adversarial
constructions:

- near-tie I+D runs (inserted bases copy the deleted founder bases,
  homopolymers, tandem repeats) at segment starts/ends, read
  starts/ends, and adjacent to soft clips;
- runs spanning MSA gap clusters (dst gaps inside the realigned region);
- multiple runs per read;
- -q cases with query phreds at Malde quantisation edges (phred 2/3,
  where quantised match/mismatch scores nearly tie) and mixed-quality
  runs;
- N bases inside realigned query slices (wire-fallback paths).

Expected values come from the host ORACLE (projector.project_alignment),
whose tie-breaking is calibrated against the reference's golden fixtures
— the table locks that behaviour and every engine is then held to it by
tests/test_projector_adversarial.py.  Regenerate ONLY on a deliberate
semantics change:  python tools/gen_projector_adversarial.py
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from panvc3_tpu.cigar import format_cigar, parse_cigar  # noqa: E402
from panvc3_tpu.msa_index import make_sequence_entry_pair  # noqa: E402
from panvc3_tpu.projector import project_alignment  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent.parent / (
    "tests/data/projector_adversarial.tsv"
)

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_msa(rng, n_cols, src_gap_p, dst_gap_p, mismatch_p):
    """(src_gapped, dst_gapped) rows over the same aligned length; gap
    runs are clustered (runs of 1-4) so realigned regions can span them."""
    src = rng.choice(BASES, n_cols).astype(np.uint8)
    dst = src.copy()
    mism = rng.random(n_cols) < mismatch_p
    dst[mism] = BASES[(np.searchsorted(BASES, dst[mism]) + 1) % 4]

    def punch_gaps(row, p):
        i = 1  # never gap column 0 (keeps positions simple)
        while i < n_cols - 1:
            if rng.random() < p:
                run = int(rng.integers(1, 5))
                row[i:i + run] = ord("-")
                i += run + 2
            else:
                i += 1

    punch_gaps(src, src_gap_p)
    punch_gaps(dst, dst_gap_p)
    # avoid all-gap columns mattering: they are legal, keep as-is
    return src.tobytes().decode(), dst.tobytes().decode()


def founder_seq(src_gapped):
    return src_gapped.replace("-", "")


def build_query(rng, fseq, src_pos, pattern, tie_mode):
    """(cigar_str, query) realising ``pattern`` — a list of (kind, length)
    with kinds =,I,D,S — against the founder sequence at src_pos.
    Inserted bases follow ``tie_mode``: 'copy' duplicates the upcoming
    founder bases (maximal ambiguity), 'homo' repeats the previous base,
    'random' is random, 'n' plants an N."""
    q = []
    cig = []
    fpos = src_pos
    for kind, ln in pattern:
        if kind == "=":
            q.append(fseq[fpos:fpos + ln])
            fpos += ln
        elif kind == "D":
            fpos += ln
        elif kind == "S":
            q.append("".join(rng.choice(list("ACGT")) for _ in range(ln)))
        elif kind == "I":
            if tie_mode == "copy":
                ins = fseq[fpos:fpos + ln]
                if len(ins) < ln:
                    ins = ins + "A" * (ln - len(ins))
            elif tie_mode == "homo":
                prev = fseq[fpos - 1] if fpos > 0 else "A"
                ins = prev * ln
            elif tie_mode == "n":
                ins = "N" * ln
            else:
                ins = "".join(rng.choice(list("ACGT")) for _ in range(ln))
            q.append(ins)
        cig.append(f"{ln}{kind}")
    return "".join(cig), "".join(q)


def gen_cases():
    rng = np.random.default_rng(20260820)
    cases = []

    run_patterns = [
        # (name, pattern builder) — k sampled per case
        ("mid_ID", lambda k, j: [("=", 8), ("I", k), ("D", j), ("=", 8)]),
        ("mid_DI", lambda k, j: [("=", 8), ("D", j), ("I", k), ("=", 8)]),
        ("start_ID", lambda k, j: [("I", k), ("D", j), ("=", 10)]),
        ("end_ID", lambda k, j: [("=", 10), ("I", k), ("D", j)]),
        ("clip_ID", lambda k, j: [("S", 4), ("=", 6), ("I", k), ("D", j), ("=", 6)]),
        ("double_run", lambda k, j: [
            ("=", 5), ("I", k), ("D", j), ("=", 6), ("D", k), ("I", j), ("=", 5),
        ]),
        ("IDI", lambda k, j: [("=", 6), ("I", k), ("D", j), ("I", k), ("=", 6)]),
        ("long_D", lambda k, j: [("=", 7), ("I", k), ("D", j + 6), ("=", 7)]),
    ]
    tie_modes = ["copy", "homo", "random"]
    msa_shapes = [
        # (src_gap_p, dst_gap_p, mismatch_p): founder-only segments,
        # ref-only segments, both, and mismatch-dense
        (0.00, 0.08, 0.05),
        (0.08, 0.00, 0.05),
        (0.06, 0.06, 0.03),
        (0.04, 0.04, 0.15),
    ]

    idx = 0
    for pi, (pname, pat) in enumerate(run_patterns):
        for ti, tmode in enumerate(tie_modes):
            for mi, shape in enumerate(msa_shapes):
                src_g, dst_g = make_msa(rng, 120, *shape)
                fseq = founder_seq(src_g)
                k = int(rng.integers(1, 6))
                j = int(rng.integers(1, 6))
                pattern = pat(k, j)
                need = sum(
                    ln for kind, ln in pattern if kind in ("=", "D")
                ) + 4
                if len(fseq) <= need + 2:
                    continue
                src_pos = int(rng.integers(0, len(fseq) - need))
                cig, q = build_query(rng, fseq, src_pos, pattern, tmode)
                # integer-scoring case
                cases.append((f"{pname}_{tmode}_{mi}", src_g, dst_g,
                              src_pos, cig, q, "*", "int"))
                idx += 1
                # a -q twin for a subset: phreds at quantisation edges
                if ti == 0 or (idx % 3 == 0):
                    quals = rng.choice(
                        [2, 2, 3, 20, 40, 41], size=len(q)
                    ).astype(np.int32)
                    qs = "".join(chr(33 + int(x)) for x in quals)
                    cases.append((f"{pname}_{tmode}_{mi}_q", src_g, dst_g,
                                  src_pos, cig, q, qs, "q"))

    # N-in-run cases (wire fallback content)
    for i in range(6):
        src_g, dst_g = make_msa(rng, 100, 0.05, 0.05, 0.05)
        fseq = founder_seq(src_g)
        k = int(rng.integers(2, 5))
        pattern = [("=", 8), ("I", k), ("D", k), ("=", 8)]
        src_pos = int(rng.integers(0, len(fseq) - 25))
        cig, q = build_query(rng, fseq, src_pos, pattern, "n")
        cases.append((f"n_run_{i}", src_g, dst_g, src_pos, cig, q, "*", "int"))

    # all-low-quality runs: every score at the quantisation floor
    for i in range(6):
        src_g, dst_g = make_msa(rng, 100, 0.05, 0.05, 0.08)
        fseq = founder_seq(src_g)
        k = int(rng.integers(2, 6))
        pattern = [("=", 8), ("I", k), ("D", k), ("=", 8)]
        src_pos = int(rng.integers(0, len(fseq) - 30))
        cig, q = build_query(rng, fseq, src_pos, pattern, "copy")
        qs = "".join(chr(33 + 2) for _ in q)
        cases.append((f"lowq_run_{i}", src_g, dst_g, src_pos, cig, q, qs, "q"))
    return cases


def main():
    rows = []
    n_fail = 0
    for name, src_g, dst_g, src_pos, cig, q, quals, mode in gen_cases():
        src_e, dst_e = make_sequence_entry_pair(src_g, dst_g)
        ref = dst_g.replace("-", "")
        if mode == "q":
            qarr = np.asarray(
                [ord(c) - 33 for c in quals], dtype=np.int32
            )
        else:
            qarr = None
        try:
            res = project_alignment(
                src_pos, src_e, dst_e, ref, q, parse_cigar(cig), qarr,
                gap_opening_cost=0, gap_extension_cost=-1,
            )
        except Exception as exc:  # noqa: BLE001 — invalid construction
            n_fail += 1
            print(f"skip {name}: {exc}")
            continue
        rows.append(
            "\t".join(
                [
                    name, src_g, dst_g, str(src_pos), cig, q, quals, mode,
                    str(res.dst_pos), format_cigar(res.cigar),
                ]
            )
        )
    header = (
        "# LOCKED adversarial full-projector goldens — regenerate only via "
        "tools/gen_projector_adversarial.py (deliberate semantics change)\n"
        "# name\tsrc_gapped\tdst_gapped\tsrc_pos\tcigar\tquery\tquals"
        "\tmode\texpected_dst_pos\texpected_cigar\n"
    )
    OUT.write_text(header + "\n".join(rows) + "\n")
    print(f"wrote {len(rows)} cases ({n_fail} skipped) -> {OUT}")


if __name__ == "__main__":
    main()
