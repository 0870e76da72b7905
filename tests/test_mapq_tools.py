"""Tests for recalculate_mapq, rewrite_cigar (tool) and subset_alignments."""

import io

import pytest

from panvc3_tpu.cigar import parse_cigar
from panvc3_tpu.io.sam import SamReader
from panvc3_tpu.pipeline.recalculate_mapq import (
    ALIGNMENT_SCORE_MIN,
    AlignmentScoring,
    CigarScorer,
    calculate_mapq,
    run_recalculate_mapq,
)
from panvc3_tpu.pipeline.rewrite_cigar_tool import (
    rewrite_alignment_match,
    rewrite_sequence_match,
    run_rewrite_cigar,
)
from panvc3_tpu.pipeline.subset_alignments import run_subset_alignments


# -- calculate_mapq ---------------------------------------------------------

def test_calculate_mapq_values():
    # paired, 100bp mates: min = 2*(-60.6), range 121.2
    assert calculate_mapq(100, 100, -20.0, -80.0) == 14
    # single best with no next: next clamps to min; dq == nq
    assert calculate_mapq(100, 0, -10.0, ALIGNMENT_SCORE_MIN) == 27
    # score below minimum
    assert calculate_mapq(100, 0, -100.0, ALIGNMENT_SCORE_MIN) == 0
    # tie with next (diff == 0): 1 if nq >= 0.67 else 0
    assert calculate_mapq(100, 0, -10.0, -10.0) == 1
    assert calculate_mapq(100, 0, -45.0, -45.0) == 0
    # perfect paired score, no next: dq = nq = 1.0 -> (0.9, 1.0) -> 39
    assert calculate_mapq(100, 100, 0.0, ALIGNMENT_SCORE_MIN) == 39


def test_cigar_scorer_penalties():
    scorer = CigarScorer(AlignmentScoring())
    # q=40 mismatch penalty = 6; q=20 -> int(2 + 0.5*4) = 4; q=0 -> 2
    assert scorer.mismatch_penalties[40] == 6
    assert scorer.mismatch_penalties[41] == 6  # cut off at 40
    assert scorer.mismatch_penalties[20] == 4
    assert scorer.mismatch_penalties[0] == 2


def _sam(records, sq=("ref", 10000)):
    lines = ["@HD\tVN:1.6", f"@SQ\tSN:{sq[0]}\tLN:{sq[1]}"]
    lines += records
    return io.BytesIO(("\n".join(lines) + "\n").encode())


def test_recalculate_mapq_paired_group():
    # Two candidate pairs for one read; pair A scores -10/-10, pair B -40/-40.
    q = "A" * 100
    ql = "I" * 100
    def rec(pos, mpos, as_score, flag):
        return (
            f"r1\t{flag}\tref\t{pos}\t0\t100=\t=\t{mpos}\t0\t{q}\t{ql}"
            f"\tAS:i:{as_score}\tXP:i:{pos - 1}\tXR:i:0\tYP:i:{mpos - 1}\tYR:i:0"
        )

    sam = _sam([
        rec(101, 301, -10, 99),
        rec(301, 101, -10, 147),
        rec(1001, 1301, -40, 355),
        rec(1301, 1001, -40, 403),
    ])
    out = io.BytesIO()
    stats = run_recalculate_mapq(sam, out)
    assert stats.total_alignments == 4
    out.seek(0)
    recs = list(SamReader(out))
    assert [r.mapq for r in recs] == [14, 14, 255, 255]


def test_recalculate_mapq_unpaired_best():
    q = "A" * 100
    ql = "I" * 100
    sam = _sam([
        f"u1\t0\tref\t101\t0\t100=\t*\t0\t0\t{q}\t{ql}\tAS:i:-10\tXP:i:100\tXR:i:0",
    ])
    out = io.BytesIO()
    run_recalculate_mapq(sam, out)
    out.seek(0)
    recs = list(SamReader(out))
    assert recs[0].mapq == 27


def test_recalculate_mapq_rescore():
    q = "A" * 95 + "C" + "A" * 4
    ql = "I" * 100  # phred 40
    sam = _sam([
        f"u1\t0\tref\t101\t0\t95=1X4=\t*\t0\t0\t{q}\t{ql}\tAS:i:-11\tXP:i:100\tXR:i:0",
    ])
    out = io.BytesIO()
    run_recalculate_mapq(sam, out, rescore=True)
    out.seek(0)
    recs = list(SamReader(out))
    r = recs[0]
    assert r.tags["AS"] == ("i", -6)
    assert r.tags["XS"] == ("i", -11)
    assert r.tags["YS"][0] == "f" and float(r.tags["YS"][1]) == -6.0


def test_recalculate_mapq_mixed_group_skipped(capsys=None):
    q = "A" * 10
    ql = "I" * 10
    sam = _sam([
        f"m1\t99\tref\t101\t0\t10=\t=\t201\t0\t{q}\t{ql}\tAS:i:-1\tXP:i:100\tXR:i:0\tYP:i:200\tYR:i:0",
        f"m1\t0\tref\t501\t0\t10=\t*\t0\t0\t{q}\t{ql}\tAS:i:-1\tXP:i:500\tXR:i:0",
    ])
    out = io.BytesIO()
    stats = run_recalculate_mapq(sam, out)
    assert stats.reads_with_and_without_mate == 1
    out.seek(0)
    assert list(SamReader(out)) == []


# -- rewrite_cigar tool -----------------------------------------------------

def test_rewrite_alignment_match():
    assert rewrite_alignment_match(parse_cigar("3=2X5=")) == parse_cigar("10M")
    assert rewrite_alignment_match(parse_cigar("2S3=1I2X1H")) == parse_cigar("2S3M1I2M1H")


def test_rewrite_sequence_match():
    #        0123456789
    ref = b"ACGTNACGTA"
    #  query aligned at 0 with 4M1M5M -> compare
    query = "ACGTTACGTA"
    cigar, xn = rewrite_sequence_match(ref, 0, query, parse_cigar("10M"))
    # position 4: query T vs ref N -> X
    assert cigar == parse_cigar("4=1X5=")
    assert xn == bytes([0b00010000, 0])
    # runs are NOT merged across op boundaries
    cigar2, _ = rewrite_sequence_match(ref, 0, query[:8], parse_cigar("2=6M"))
    assert cigar2 == [(2, "="), (2, "="), (1, "X"), (3, "=")]


def test_rewrite_cigar_tool_roundtrip(tmp_path):
    ref_path = tmp_path / "ref.fa"
    ref_path.write_bytes(b">ref\nACGTNACGTA\n")
    sam = _sam(["q\t0\tref\t1\t60\t10M\t*\t0\t0\tACGTTACGTA\tIIIIIIIIII"], sq=("ref", 10))
    out = io.BytesIO()
    run_rewrite_cigar(sam, out, mode="sequence-match", reference_path=str(ref_path))
    out.seek(0)
    rec = list(SamReader(out))[0]
    assert rec.cigar == parse_cigar("4=1X5=")
    assert rec.tags["XN"] == ("B", ("C", [16, 0]))


# -- subset_alignments ------------------------------------------------------

def test_subset_by_read_id_and_chr():
    sam = _sam([
        "a\t0\tref\t1\t60\t3M\t*\t0\t0\tACG\tIII",
        "b\t0\tref\t5\t60\t3M\t*\t0\t0\tACG\tIII",
    ])
    out = io.BytesIO()
    mc = run_subset_alignments(sam, out, read_ids=["a"])
    assert (mc.matches, mc.mismatches) == (1, 1)
    out.seek(0)
    assert [r.qname for r in SamReader(out)] == ["a"]


def test_subset_best_mapq_pairs():
    q = "ACG"
    lines = [
        f"r\t99\tref\t101\t30\t3M\t=\t201\t0\t{q}\tIII",
        f"r\t147\tref\t201\t30\t3M\t=\t101\t0\t{q}\tIII",
        f"r\t355\tref\t501\t12\t3M\t=\t601\t0\t{q}\tIII",
        f"r\t403\tref\t601\t12\t3M\t=\t501\t0\t{q}\tIII",
    ]
    sam = _sam(lines)
    out = io.BytesIO()
    run_subset_alignments(sam, out, best_mapq=True)
    out.seek(0)
    recs = list(SamReader(out))
    assert len(recs) == 2
    assert recs[0].pos == 100 and recs[1].pos == 200


def test_recalculate_mapq_jobs_byte_identical(tmp_path):
    """--jobs N fans QNAME groups out over worker processes; output and
    statistics must equal the sequential run exactly."""
    import numpy as np

    rng = np.random.default_rng(3)
    lines = ["@HD\tVN:1.6\tSO:queryname", "@SQ\tSN:chr1\tLN:100000"]
    for i in range(800):
        p1, p2 = int(rng.integers(0, 90000)), int(rng.integers(0, 90000))
        # a few multi-candidate groups and an unmapped record
        k = 1 + (i % 3 == 0)
        for c in range(k):
            off = c * 7
            for pos, mpos, flag in ((p1 + off, p2, 99), (p2, p1 + off, 147)):
                lines.append(
                    f"pair{i}\t{flag}\tchr1\t{pos+1}\t60\t100=\t=\t{mpos+1}"
                    f"\t200\t" + "ACGT" * 25 + "\t" + "I" * 100
                    + f"\tAS:i:-{int(rng.integers(0, 12))}\tXR:i:0"
                    f"\tXP:i:{pos}\tYR:i:0\tYP:i:{mpos}"
                )
        if i % 50 == 0:
            lines.append(f"pair{i}x\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII")
    sam = ("\n".join(lines) + "\n").encode()

    out1, out3 = io.BytesIO(), io.BytesIO()
    s1 = run_recalculate_mapq(io.BytesIO(sam), out1)
    s3 = run_recalculate_mapq(io.BytesIO(sam), out3, jobs=3)
    strip = lambda b: [l for l in b.split(b"\n") if not l.startswith(b"@PG")]
    assert strip(out1.getvalue()) == strip(out3.getvalue())
    assert s1 == s3
    assert s1.total_alignments > 0


def test_recalculate_mapq_jobs_bam_roundtrip():
    """--jobs with BAM input and BAM output (C converters) must produce
    the same bytes as the sequential BAM path."""
    import numpy as np

    from panvc3_tpu.io.sam import SamReader, SamWriter

    rng = np.random.default_rng(9)
    lines = ["@HD\tVN:1.6\tSO:queryname", "@SQ\tSN:chr1\tLN:100000"]
    for i in range(400):
        p1, p2 = int(rng.integers(0, 90000)), int(rng.integers(0, 90000))
        for pos, mpos, flag in ((p1, p2, 99), (p2, p1, 147)):
            lines.append(
                f"pair{i}\t{flag}\tchr1\t{pos+1}\t60\t100=\t=\t{mpos+1}"
                f"\t200\t" + "ACGT" * 25 + "\t" + "I" * 100
                + f"\tAS:i:-{int(rng.integers(0, 12))}\tXR:i:0"
                f"\tXP:i:{pos}\tYR:i:0\tYP:i:{mpos}"
            )
    sam = ("\n".join(lines) + "\n").encode()
    rd = SamReader(io.BytesIO(sam), is_bam=False)
    bam_in = io.BytesIO()
    w = SamWriter(bam_in, rd.header, bam=True)
    for rec in rd:
        w.write(rec)
    w.close()
    bam = bam_in.getvalue()

    out1, out3 = io.BytesIO(), io.BytesIO()
    s1 = run_recalculate_mapq(io.BytesIO(bam), out1, output_bam=True)
    s3 = run_recalculate_mapq(io.BytesIO(bam), out3, output_bam=True, jobs=3)
    assert out1.getvalue() == out3.getvalue()
    assert s1 == s3
    assert s1.total_alignments == 800

def test_mapq_native_chunk_engine_differential(monkeypatch):
    """The C group engine (mapq_score_groups) must be byte-identical to the
    object path on randomized QNAME-grouped inputs: multi-candidate groups,
    paired/unpaired, missing AS/XR/XP/YR/YP, float AS tags, XN bitmasks,
    mixed-pairedness skips, invalid positions, extra tags, both AS-tag and
    rescore modes."""
    import io

    import numpy as np

    from panvc3_tpu.pipeline.recalculate_mapq import run_recalculate_mapq

    rng = np.random.default_rng(7)
    names = ["chr1", "chr2"]
    lines = ["@HD\tVN:1.6"] + [f"@SQ\tSN:{n}\tLN:100000" for n in names]
    bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
    qid = 0
    for g in range(400):
        qid += 1
        qname = f"r{qid}"
        n_cand = int(rng.integers(1, 5))
        paired_group = bool(rng.integers(0, 2))
        mixed = rng.integers(0, 20) == 0
        seq = rng.choice(bases, int(rng.integers(20, 80))).tobytes().decode()
        for c in range(n_cand):
            ref = names[int(rng.integers(0, 2))]
            pos = int(rng.integers(1, 90000))
            L = len(seq)
            n_x = int(rng.integers(0, 4))
            cigar = f"{L - n_x}={n_x}X" if n_x else f"{L}="
            if rng.integers(0, 10) == 0:
                cigar = f"2S{L - 2 - n_x}={n_x}X" if L - 2 - n_x > 0 else f"{L}="
            if rng.integers(0, 12) == 0:
                cigar = f"{L - 5}=2I3S" if L > 8 else f"{L}="
            paired = paired_group if not mixed else bool(c % 2)
            flag = (99 if c % 2 == 0 else 147) if paired else 0
            if paired:
                rnext = "=" if rng.integers(0, 2) else names[int(rng.integers(0, 2))]
                pnext = int(rng.integers(1, 90000))
            else:
                rnext, pnext = "*", 0
            qual = "".join(
                chr(33 + int(q)) for q in rng.integers(0, 42, L)
            ) if rng.integers(0, 8) else "*"
            tags = []
            if rng.integers(0, 10):  # AS usually present
                if rng.integers(0, 6) == 0:
                    tags.append(f"AS:f:{float(-int(rng.integers(0, 30))) + 0.5}")
                else:
                    tags.append(f"AS:i:{-int(rng.integers(0, 30))}")
            if rng.integers(0, 10):  # original-position tags usually present
                tags.append(f"XR:i:{int(rng.integers(0, 2))}")
                tags.append(f"XP:i:{int(rng.integers(0, 90000))}")
            if paired and rng.integers(0, 10):
                tags.append(f"YR:i:{int(rng.integers(0, 2))}")
                tags.append(f"YP:i:{pnext - 1}")
            if rng.integers(0, 4) == 0:  # XN bitmask covering the alignment
                nb = (L + 7) // 8 + int(rng.integers(0, 3))
                items = ",".join(str(int(x)) for x in rng.integers(0, 256, nb))
                tags.append(f"XN:B:C,{items}")
            if rng.integers(0, 3) == 0:
                tags.append(f"ZZ:Z:extra{c}")
            if rng.integers(0, 5) == 0:
                tags.append(f"XS:i:{-int(rng.integers(0, 50))}")
            if rng.integers(0, 60) == 0:
                # float-typed position tag: unsupported by the C engine,
                # forces the whole-chunk object-path fallback
                tags.append("XR:f:1")
                tags.append(f"XP:i:{int(rng.integers(0, 90000))}")
            lines.append(
                f"{qname}\t{flag}\t{ref}\t{pos}\t60\t{cigar}\t{rnext}\t"
                f"{pnext}\t0\t{seq}\t{qual}" + ("\t" + "\t".join(tags) if tags else "")
            )
        if rng.integers(0, 15) == 0:  # an unmapped record mid-stream
            lines.append(f"u{qid}\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII")
    sam = ("\n".join(lines) + "\n").encode()

    for rescore in (False, True):
        outs = {}
        for fast in ("0", "1"):
            monkeypatch.setenv("PANVC3_MAPQ_FAST", fast)
            out = io.BytesIO()
            err_buf = io.StringIO()
            import contextlib

            with contextlib.redirect_stderr(err_buf):
                stats = run_recalculate_mapq(
                    io.BytesIO(sam), out, rescore=rescore,
                    status_output_interval=0,
                )
            outs[fast] = (out.getvalue(), err_buf.getvalue(), stats)
        fast_out, fast_err, fast_stats = outs["1"]
        slow_out, slow_err, slow_stats = outs["0"]
        assert fast_out == slow_out, f"output mismatch (rescore={rescore})"
        assert sorted(fast_err.splitlines()) == sorted(slow_err.splitlines())
        for f in (
            "total_alignments", "unpaired_alignments",
            "reads_with_and_without_mate", "mate_not_found",
            "reads_without_valid_position",
        ):
            assert getattr(fast_stats, f) == getattr(slow_stats, f), f

def test_subset_native_engine_differential(monkeypatch):
    """The C subset engine (subset_filter_lines) must be byte-identical to
    the object path across chr/read-id/best-mapq filter combinations,
    MAPQ-255 groups, mates, '*' positions, and tag canonicalization."""
    import io

    import numpy as np

    from panvc3_tpu.pipeline.subset_alignments import run_subset_alignments

    rng = np.random.default_rng(11)
    names = ["chr1", "chr2"]
    lines = ["@HD\tVN:1.6"] + [f"@SQ\tSN:{n}\tLN:100000" for n in names]
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for g in range(300):
        qname = f"r{g}"
        n_cand = int(rng.integers(1, 5))
        for c in range(n_cand):
            ref = names[int(rng.integers(0, 2))]
            pos = int(rng.integers(1, 90000))
            seq = rng.choice(bases, 30).tobytes().decode()
            mapq = int(rng.choice([0, 10, 37, 60, 255]))
            paired = bool(rng.integers(0, 2))
            rnext = ("=" if rng.integers(0, 2) else names[int(rng.integers(0, 2))]) if paired else "*"
            pnext = int(rng.integers(1, 90000)) if paired else 0
            tags = []
            if rng.integers(0, 2):
                tags.append(f"AS:i:{-int(rng.integers(0, 30))}")
            if rng.integers(0, 4) == 0:
                tags.append("ZF:f:2.50")  # canonicalizes to 2.5
            if rng.integers(0, 4) == 0:
                tags.append(f"ZB:B:c,{-int(rng.integers(0, 5))},07")
            lines.append(
                f"{qname}\t{0 if not paired else 99}\t{ref}\t{pos}\t{mapq}\t"
                f"30=\t{rnext}\t{pnext}\t0\t{seq}\t{'I' * 30}"
                + ("\t" + "\t".join(tags) if tags else "")
            )
    sam = ("\n".join(lines) + "\n").encode()

    read_ids = [f"r{g}" for g in range(0, 300, 3)]
    cases = [
        dict(best_mapq=True),
        dict(chr_id="chr1", best_mapq=True),
        dict(chr_id="chr2"),
        dict(read_ids=read_ids, best_mapq=True),
        dict(chr_id="chr1", read_ids=read_ids),
    ]
    for kw in cases:
        outs = {}
        for fast in ("0", "1"):
            monkeypatch.setenv("PANVC3_SUBSET_FAST", fast)
            out = io.BytesIO()
            mc = run_subset_alignments(io.BytesIO(sam), out, **kw)
            outs[fast] = (out.getvalue(), mc.matches, mc.mismatches)
        assert outs["1"] == outs["0"], f"mismatch for {kw}"

def test_rewrite_cigar_native_engine_differential(monkeypatch, tmp_path):
    """The C rewrite_cigar engine must be byte-identical to the object path
    in both modes, across M/=/X/I/D/N/S/H/P CIGARs, reference N bases (XN
    bitmask), multi-contig inputs (LRU retry protocol), unmapped records,
    and existing-XN replacement."""
    import io

    import numpy as np

    from panvc3_tpu.pipeline.rewrite_cigar_tool import run_rewrite_cigar

    rng = np.random.default_rng(13)
    refs = {}
    ref_lines = []
    for nm in ("c1", "c2", "c3", "c4", "c5", "c6"):
        seq = rng.choice(
            np.frombuffer(b"ACGTN", dtype=np.uint8), 5000,
            p=[0.23, 0.23, 0.23, 0.23, 0.08],
        )
        refs[nm] = seq
        ref_lines.append(f">{nm}\n{seq.tobytes().decode()}")
    ref_path = tmp_path / "refs.fa"
    ref_path.write_text("\n".join(ref_lines) + "\n")

    names = list(refs)
    lines = ["@HD\tVN:1.6"] + [f"@SQ\tSN:{n}\tLN:5000" for n in names]
    for i in range(600):
        nm = names[int(rng.integers(0, len(names)))]
        pos = int(rng.integers(0, 4500))
        kind = int(rng.integers(0, 6))
        L = 50
        seq = refs[nm][pos:pos + L].tobytes().decode().replace("N", "A")
        if kind == 0:
            cigar = f"{L}M"
        elif kind == 1:
            cigar = f"10M2I{L - 17}M5S"
            seq = seq[:10] + "GG" + seq[10:L - 7] + "TTTTT"
        elif kind == 2:
            cigar = f"5S10M3D{L - 15}M"
            seq = seq[:5] + refs[nm][pos + 5:pos + 15].tobytes().decode().replace("N", "A") + \
                refs[nm][pos + 18:pos + 18 + L - 15].tobytes().decode().replace("N", "A")
        elif kind == 3:
            cigar = f"2H{L}M3P"
        elif kind == 4:
            cigar = f"20=5X{L - 25}="
        else:
            cigar = f"{L}M"
        # mutate a few bases so X runs appear
        if rng.integers(0, 2):
            s = list(seq)
            for _ in range(int(rng.integers(1, 4))):
                j = int(rng.integers(0, len(s)))
                s[j] = "T" if s[j] != "T" else "C"
            seq = "".join(s)
        tags = []
        if rng.integers(0, 4) == 0:
            tags.append("XN:B:C,1,2")  # existing XN gets replaced
        if rng.integers(0, 3) == 0:
            tags.append(f"AS:i:{-int(rng.integers(0, 20))}")
        lines.append(
            f"q{i}\t0\t{nm}\t{pos + 1}\t60\t{cigar}\t*\t0\t0\t{seq}\t"
            + "I" * len(seq) + (("\t" + "\t".join(tags)) if tags else "")
        )
        if i % 40 == 0:
            lines.append(f"u{i}\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII")
    sam = ("\n".join(lines) + "\n").encode()

    for mode in ("sequence-match", "alignment-match"):
        outs = {}
        for fast in ("0", "1"):
            monkeypatch.setenv("PANVC3_REWRITE_TOOL_FAST", fast)
            out = io.BytesIO()
            n = run_rewrite_cigar(
                io.BytesIO(sam), out, mode=mode,
                reference_path=str(ref_path),
            )
            outs[fast] = (out.getvalue(), n)
        assert outs["1"] == outs["0"], f"mismatch in {mode}"


def test_mapq_rescore_overrun_and_lowqual_parity(monkeypatch):
    """The C group engine must bound-check =/X query slices (the object
    path raises 'CIGAR overruns the sequence') and floor quality chars
    below '!' at zero instead of wrapping — parity on both."""
    import io

    from panvc3_tpu.pipeline.recalculate_mapq import run_recalculate_mapq

    overrun = (
        "@HD\tVN:1.6\n@SQ\tSN:c\tLN:1000\n"
        "a\t0\tc\t5\t40\t100=\t*\t0\t0\t" + "A" * 30 + "\t" + "I" * 30 +
        "\tAS:i:-3\tXR:i:0\tXP:i:5\n"
    ).encode()
    lowq = (
        "@HD\tVN:1.6\n@SQ\tSN:c\tLN:1000\n"
        "b\t0\tc\t5\t40\t30X\t*\t0\t0\t" + "A" * 30 + "\t" + chr(30) * 30 +
        "\tAS:i:-3\tXR:i:0\tXP:i:5\n"
    ).encode()
    import panvc3_tpu.pipeline.recalculate_mapq as rm

    for sam, should_raise in ((overrun, True), (lowq, False)):
        res = {}
        # fast=0/1 toggles the C group engine; "py" forces the pure-Python
        # scorer fallback (no native built) — all three must agree
        for mode in ("0", "1", "py"):
            # a scoped MonkeyPatch per mode: a leaked get_native=None patch
            # would silently turn the later C-engine modes into Python
            # reruns and make the parity assertion vacuous
            with pytest.MonkeyPatch.context() as mp:
                mp.setenv("PANVC3_MAPQ_FAST", "0" if mode == "py" else mode)
                if mode == "py":
                    mp.setattr(rm, "get_native", lambda: None)
                try:
                    out = io.BytesIO()
                    run_recalculate_mapq(io.BytesIO(sam), out, rescore=True)
                    res[mode] = ("ok", out.getvalue())
                except ValueError as e:
                    res[mode] = ("err", str(e))
        assert res["0"] == res["1"] == res["py"]
        assert (res["0"][0] == "err") == should_raise


def test_rewrite_tool_overrun_parity(monkeypatch, tmp_path):
    """-S mode on records whose CIGAR overruns SEQ or the reference: both
    paths raise the same typed ValueError (no IndexError leaks)."""
    import io

    from panvc3_tpu.pipeline.rewrite_cigar_tool import run_rewrite_cigar

    ref = tmp_path / "r.fa"
    ref.write_bytes(b">c\n" + b"A" * 1000 + b"\n")
    cases = [
        ("a\t0\tc\t5\t40\t100M\t*\t0\t0\t" + "A" * 30 + "\t" + "I" * 30,
         "CIGAR overruns SEQ"),
        ("b\t0\tc\t995\t40\t30M\t*\t0\t0\t" + "A" * 30 + "\t" + "I" * 30,
         "CIGAR overruns the reference"),
    ]
    for rec, msg in cases:
        sam = ("@HD\tVN:1.6\n@SQ\tSN:c\tLN:1000\n" + rec + "\n").encode()
        res = {}
        for fast in ("0", "1"):
            monkeypatch.setenv("PANVC3_REWRITE_TOOL_FAST", fast)
            try:
                run_rewrite_cigar(
                    io.BytesIO(sam), io.BytesIO(), mode="sequence-match",
                    reference_path=str(ref),
                )
                res[fast] = ("ok",)
            except ValueError as e:
                res[fast] = ("err", str(e))
        assert res["0"] == res["1"] == ("err", msg)
