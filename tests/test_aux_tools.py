"""Tests for split_alignments, alignment_statistics, convert_bed_positions."""

import io

import pytest

from panvc3_tpu.io.sam import SamReader
from panvc3_tpu.msa_index import MsaIndex, make_sequence_entry_pair
from panvc3_tpu.pipeline.alignment_statistics import (
    ExtendedP2,
    calculate_coverage,
    calculate_record_length,
    count_alignments,
    mapq_box_plot,
    mapq_histogram,
)
from panvc3_tpu.cigar import parse_cigar
from panvc3_tpu.pipeline.convert_bed_positions import convert_position, run_convert_bed_positions
from panvc3_tpu.pipeline.split_alignments import (
    read_reference_names,
    run_list_reference_names,
    run_split_alignments,
)


def _sam(records, sqs=(("c1", 100), ("c2", 100))):
    lines = ["@HD\tVN:1.6"] + [f"@SQ\tSN:{n}\tLN:{l}" for n, l in sqs] + list(records)
    return io.BytesIO(("\n".join(lines) + "\n").encode())


# -- split ------------------------------------------------------------------

def test_reference_names_prefix_free():
    with pytest.raises(ValueError):
        read_reference_names(io.StringIO("chr1\nchr10\n"), prefixes=True, rewrite=False)
    recs = read_reference_names(io.StringIO("b\na\n"), prefixes=False, rewrite=False)
    assert [r.reference_name for r in recs] == ["a", "b"]


def test_split_alignments(tmp_path):
    sam = _sam([
        "q1\t0\tc1\t1\t60\t3M\t*\t0\t0\tACG\tIII",
        "q2\t0\tc2\t1\t60\t3M\t*\t0\t0\tACG\tIII",
        "q3\t0\tc1\t5\t60\t3M\t*\t0\t0\tACG\tIII",
    ])
    out = io.StringIO()
    counts = run_split_alignments(
        sam,
        io.StringIO("c1\nc2\n"),
        basename=str(tmp_path) + "/",
        out=out,
    )
    assert counts == {"c1": 2, "c2": 1}
    recs = list(SamReader(str(tmp_path / "c1.bam")))
    assert [r.qname for r in recs] == ["q1", "q3"]
    assert "c1\t2" in out.getvalue()


def test_split_alignments_rewrite_and_unmatched(tmp_path, capsys):
    """--rewrite-reference-names routes by ORIGINAL name while the output
    headers/RNAMEs carry the new names (main.cc:203-215); unmatched
    records count into "No matching reference ID" and warn only under
    --report-unmatched."""
    body = [
        "q1\t0\tc1\t1\t60\t3M\t*\t0\t0\tACG\tIII",
        "q2\t0\tc2\t1\t60\t3M\t*\t0\t0\tACG\tIII",
    ]
    hdr = ["@HD\tVN:1.6", "@SQ\tSN:c1\tLN:100", "@SQ\tSN:c2\tLN:100"]
    sam = io.BytesIO(("\n".join(hdr + body) + "\n").encode())
    out = io.StringIO()
    counts = run_split_alignments(
        sam,
        io.StringIO("c1\tnew1\nc2\tnew2\n"),
        basename=str(tmp_path) + "/",
        rewrite=True,
        out=out,
    )
    assert counts == {"c1": 1, "c2": 1}
    recs = list(SamReader(str(tmp_path / "c1.bam")))
    assert [r.qname for r in recs] == ["q1"]
    rdr = SamReader(str(tmp_path / "c1.bam"))
    assert rdr.header.ref_names == ["new1", "new2"]

    # rewrite with a header name missing from the map fails loudly
    sam2 = io.BytesIO(("\n".join(hdr + body) + "\n").encode())
    with pytest.raises(ValueError):
        run_split_alignments(
            sam2,
            io.StringIO("c1\tnew1\n"),
            basename=str(tmp_path) + "/x_",
            rewrite=True,
            out=io.StringIO(),
        )

    # unmatched records: counted, and warned only with report_unmatched
    sam3 = io.BytesIO(("\n".join(hdr + body) + "\n").encode())
    out3 = io.StringIO()
    counts = run_split_alignments(
        sam3,
        io.StringIO("c1\n"),
        basename=str(tmp_path) + "/y_",
        report_unmatched=True,
        out=out3,
    )
    assert counts == {"c1": 1}
    assert "No matching reference ID\t1" in out3.getvalue()
    assert "match 'c2'" in capsys.readouterr().err


def test_list_reference_names():
    sam = _sam(["q1\t0\tc2\t1\t60\t3M\t*\t0\t0\tACG\tIII"])
    out = io.StringIO()
    used = run_list_reference_names(sam, only_used=True, out=out)
    assert used == ["c2"]


# -- statistics -------------------------------------------------------------

def test_record_length_clipping():
    assert calculate_record_length(parse_cigar("3S5M2D"), False) == 7
    assert calculate_record_length(parse_cigar("3S5M2D"), True) == 10


def test_coverage():
    sam = _sam([
        "a\t0\tc1\t1\t60\t4M\t*\t0\t0\tACGT\tIIII",
        "b\t0\tc1\t3\t60\t4M\t*\t0\t0\tACGT\tIIII",
    ])
    out = io.StringIO()
    calculate_coverage(SamReader(sam), out)
    lines = out.getvalue().splitlines()
    assert lines[0] == "POSITION\tCOVERAGE"
    cov = dict(tuple(l.split("\t")) for l in lines[1:])
    # positions 0,1 covered by a only; 2,3 by both; 4,5 by b only
    assert cov["0"] == "1" and cov["2"] == "2" and cov["5"] == "1"


def test_count_and_histogram():
    records = [
        "a\t0\tc1\t1\t60\t3M\t*\t0\t0\tACG\tIII",
        "b\t0\tc2\t1\t42\t3M\t*\t0\t0\tACG\tIII",
        "c\t0\tc2\t2\t42\t3M\t*\t0\t0\tACG\tIII",
    ]
    out = io.StringIO()
    count_alignments(SamReader(_sam(records)), out)
    assert "c2\t2" in out.getvalue()

    out2 = io.StringIO()
    mapq_histogram(SamReader(_sam(records)), out2)
    assert "42\t2" in out2.getvalue()
    assert "60\t1" in out2.getvalue()


def test_extended_p2_reasonable():
    import numpy as np

    rng = np.random.default_rng(0)
    data = rng.normal(50, 10, 5000)
    acc = ExtendedP2([0.1, 0.25, 0.5, 0.75, 0.9])
    for x in data:
        acc.add(float(x))
    est = acc.quantile(0.5)
    true = float(np.median(data))
    assert abs(est - true) < 1.0
    assert acc.minimum == data.min()
    assert acc.maximum == data.max()


def test_extended_p2_jain_chlamtac_worked_example():
    """The classic 20-observation example of Jain & Chlamtac (1985), table
    in the original P² paper: the median marker converges to ~4.44.  With a
    single probability, ExtendedP2's 5 markers reduce to classic P²."""
    data = [0.02, 0.15, 0.74, 3.39, 0.83, 22.37, 10.15, 15.43, 38.62, 15.92,
            34.60, 10.28, 1.47, 0.40, 0.05, 11.39, 0.27, 0.42, 0.09, 11.37]
    acc = ExtendedP2([0.5])
    for x in data:
        acc.add(x)
    assert abs(acc.quantile(0.5) - 4.44) < 0.01
    assert acc.minimum == 0.02
    assert acc.maximum == 38.62


def test_extended_p2_accuracy_multiple_distributions():
    """Estimates track true sample quantiles within a small fraction of the
    distribution scale (validates the multi-marker extension the reference
    gets from boost::accumulators::extended_p_square,
    alignment-statistics/main.cc:400-466)."""
    import numpy as np

    probs = [0.1, 0.25, 0.5, 0.75, 0.9]
    for seed, gen in (
        (1, lambda r, n: r.normal(0.0, 1.0, n)),
        (2, lambda r, n: r.random(n)),
        (3, lambda r, n: r.exponential(1.0, n)),
    ):
        rng = np.random.default_rng(seed)
        xs = gen(rng, 20000)
        acc = ExtendedP2(probs)
        for x in xs:
            acc.add(float(x))
        scale = float(xs.std())
        for p in probs:
            err = abs(acc.quantile(p) - float(np.quantile(xs, p)))
            assert err < 0.05 * scale, (seed, p, err)


def test_extended_p2_low_count_bins():
    """Bins with fewer observations than markers fall back to the sorted
    sample (the behaviour PARITY.md flags for low-count bins)."""
    acc = ExtendedP2([0.1, 0.25, 0.5, 0.75, 0.9])  # 13 markers
    for x in (5.0, 1.0, 3.0):
        acc.add(x)
    assert acc.minimum == 1.0
    assert acc.maximum == 5.0
    assert acc.quantile(0.5) in (1.0, 3.0, 5.0)
    assert acc.quantile(0.0) == 1.0


def test_mapq_box_plot_runs():
    sam = _sam([
        f"r{i}\t0\tc1\t{i + 1}\t{30 + (i % 20)}\t3M\t*\t0\t0\tACG\tIII"
        for i in range(50)
    ])
    out = io.StringIO()
    mapq_box_plot(SamReader(sam), out, bin_width=100)
    lines = out.getvalue().splitlines()
    assert lines[0].startswith("BIN\tMIN")
    assert len(lines) == 2
    assert lines[1].split("\t")[-1] == "50"


# -- convert_bed_positions --------------------------------------------------

def test_convert_position_boundary():
    # src: GAT-ACA  dst: GATTACA ; position semantics mirror main.cc:60-73
    src, dst = make_sequence_entry_pair("GAT-ACA", "GATTACA")
    assert convert_position(src, dst, 0) == 0
    assert convert_position(src, dst, 3) == 4  # after dst's extra T
    # dst -> src across the gap: dst pos 3 (T, aligned col 3) is a gap in
    # src; +dstc-1 yields the previous src position boundary
    assert convert_position(dst, src, 3) == 3
    assert convert_position(dst, src, 4) == 3


def test_run_convert_bed_positions(tmp_path):
    from panvc3_tpu.bitvec import GapBitVector
    from panvc3_tpu.msa_index import ChrEntry, SequenceEntry

    idx = MsaIndex()
    chrom = ChrEntry("chrA")
    chrom.sequence_entries.append(SequenceEntry("s1", GapBitVector.from_gap_string("GAT-ACA")))
    chrom.sequence_entries.append(SequenceEntry("s2", GapBitVector.from_gap_string("GATTACA")))
    idx.chr_entries.append(chrom)
    idx.sort()
    p = tmp_path / "idx.npz"
    idx.save(str(p))

    bed = io.StringIO("chrA\t0\t3\nother\t1\t2\n")
    out = io.StringIO()
    matches, mismatches = run_convert_bed_positions(
        str(p), bed, "chrA", "s1", "s2", out=out
    )
    assert (matches, mismatches) == (1, 1)
    # end 3 ('A' after the src gap) lands at dst position 4 past the extra T
    assert out.getvalue() == "chrA\t0\t4\n"


# ---------------------------------------------------------------------------
# alignment_statistics native chunk engine: must be byte-identical to the
# Python loops across all four modes and the filter matrix.

def test_als_native_engine_differential(monkeypatch):
    import random

    from panvc3_tpu.native import get_native
    from panvc3_tpu.pipeline.alignment_statistics import (
        calculate_coverage,
        count_alignments,
        mapq_box_plot,
        mapq_histogram,
    )

    nat = get_native()
    if nat is None or not hasattr(nat, "als_chunk"):
        pytest.skip("native extension not built")

    def workload(seed):
        rng = random.Random(seed)
        chroms = ["chrA", "chrB", "other1"]
        ref_len = 2000
        lines = ["@HD\tVN:1.6\tSO:coordinate"]
        for c in chroms:
            lines.append(f"@SQ\tSN:{c}\tLN:{ref_len}")
        positions = sorted(rng.randrange(0, ref_len - 60) for _ in range(800))
        for i, p in enumerate(positions):
            flag = 0
            r = rng.random()
            if r < 0.05:
                flag |= 0x4
            elif r < 0.10:
                flag |= 0x200
            elif r < 0.18:
                flag |= 0x100
            ops = []
            if rng.random() < 0.3:
                ops.append((rng.randint(1, 6), "S"))
            ops.append((rng.randint(5, 40), rng.choice("M=X")))
            if rng.random() < 0.3:
                ops.append((rng.randint(1, 5), rng.choice("ID")))
                ops.append((rng.randint(3, 20), "M"))
            qlen = sum(c for c, o in ops if o in "M=XIS")
            cig = "".join(f"{c}{o}" for c, o in ops)
            chrom = rng.choice(chroms)
            rnext = rng.choice(["*", "=", rng.choice(chroms)])
            mapq = rng.choice([0, 1, 20, 42, 60, 254, 255])
            lines.append(
                f"r{i}\t{flag}\t{chrom}\t{p + 1}\t{mapq}\t{cig}\t{rnext}"
                f"\t{rng.randint(1, ref_len)}\t0\t{'A' * qlen}\t{'I' * qlen}"
            )
        return ("\n".join(lines) + "\n").encode()

    configs = [
        {},
        {"rnames": ("chrA",)},
        {"rnames": ("chr",), "rname_prefix": True, "same_ref": True},
        {"rnames": ("chrA", "chrB"), "same_ref": True, "primary_only": True},
        {"rnames": ("nomatch",)},  # non-matching filter disables filtering
    ]
    modes = [
        ("cov", lambda r, o, f: calculate_coverage(r, o, **f)),
        ("cov-clip", lambda r, o, f: calculate_coverage(
            r, o, include_clipping=True, **f)),
        ("count", lambda r, o, f: count_alignments(r, o, **f)),
        ("hist", lambda r, o, f: mapq_histogram(r, o, **f)),
        ("box", lambda r, o, f: mapq_box_plot(r, o, bin_width=257, **f)),
        ("box-wide", lambda r, o, f: mapq_box_plot(r, o, bin_width=100000, **f)),
    ]
    for seed in range(3):
        sam = workload(seed)
        for mname, fn in modes:
            for cfg in configs:
                results = {}
                for fast in ("0", "1"):
                    monkeypatch.setenv("PANVC3_ALS_FAST", fast)
                    out = io.StringIO()
                    stats = fn(SamReader(io.BytesIO(sam)), out, dict(cfg))
                    results[fast] = (out.getvalue(), stats)
                assert results["0"][0] == results["1"][0], (seed, mname, cfg)
                assert results["0"][1] == results["1"][1], (seed, mname, cfg)


def test_split_alignments_fast_lane_differential(monkeypatch, tmp_path):
    import random

    from panvc3_tpu.native import get_native
    from panvc3_tpu.pipeline.split_alignments import run_split_alignments

    nat = get_native()
    if nat is None or not hasattr(nat, "sam_text_to_bam"):
        pytest.skip("native extension not built")

    rng = random.Random(11)
    refs = ["chrA", "chrB", "scaf1", "scaf2"]
    lines = ["@HD\tVN:1.6"]
    for r in refs:
        lines.append(f"@SQ\tSN:{r}\tLN:5000")
    for i in range(500):
        r = rng.choice(refs + ["*"])
        if r == "*":
            lines.append(
                f"u{i}\t4\t*\t0\t0\t*\t*\t0\t0\t{'A' * 10}\t{'I' * 10}"
            )
            continue
        p = rng.randrange(1, 4800)
        tags = "" if rng.random() < 0.5 else "\tNM:i:2\tAS:i:-5"
        lines.append(
            f"r{i}\t0\t{r}\t{p}\t{rng.randrange(0, 61)}\t20M\t*\t0\t0\t"
            f"{'ACGT' * 5}\t{'I' * 20}{tags}"
        )
    sam = ("\n".join(lines) + "\n").encode()

    for name_spec, kwargs in [
        ("chrA\nchrB\nscaf1\nscaf2\n", {}),
        ("chr\nscaf\n", {"prefixes": True}),
        ("chrA\tnewA\nchrB\tnewB\nscaf1\tnews1\nscaf2\tnews2\n",
         {"rewrite": True}),
    ]:
        outputs = {}
        for fast in ("0", "1"):
            monkeypatch.setenv("PANVC3_SPLIT_FAST", fast)
            d = tmp_path / f"split{fast}{len(kwargs)}"
            d.mkdir(exist_ok=True)
            out = io.StringIO()
            counts = run_split_alignments(
                io.BytesIO(sam), io.StringIO(name_spec),
                basename=str(d) + "/", out=out, **kwargs,
            )
            files = {}
            for f in sorted(d.iterdir()):
                # decode each BAM back to records for comparison
                rd = SamReader(str(f))
                files[f.name] = (
                    rd.header.ref_names,
                    [tuple(map(str, (r.qname, r.flag, r.ref_id, r.pos,
                                     r.mapq, r.cigar, r.tlen, r.seq, r.qual,
                                     sorted(r.tags.items()))))
                     for r in rd],
                )
            outputs[fast] = (out.getvalue(), counts, files)
        assert outputs["0"] == outputs["1"], kwargs


def test_als_fast_engine_bam_input(monkeypatch):
    """alignment_statistics' chunk engine over BAM input must equal the
    SAM-text run (C BAM->SAM-text conversion feeding the same filter)."""
    import random

    from panvc3_tpu.io.sam import SamWriter
    from panvc3_tpu.native import get_native
    from panvc3_tpu.pipeline.alignment_statistics import calculate_coverage

    nat = get_native()
    if nat is None or not hasattr(nat, "als_chunk"):
        pytest.skip("native extension not built")

    rng = random.Random(4)
    lines = ["@HD\tVN:1.6\tSO:coordinate", "@SQ\tSN:c1\tLN:5000"]
    for i, p in enumerate(sorted(rng.randrange(0, 4800) for _ in range(300))):
        lines.append(
            f"r{i}\t0\tc1\t{p + 1}\t{rng.randrange(0, 61)}\t30M\t*\t0\t0\t"
            f"{'A' * 30}\t{'I' * 30}"
        )
    sam = ("\n".join(lines) + "\n").encode()

    rd = SamReader(io.BytesIO(sam))
    bam = io.BytesIO()
    wr = SamWriter(bam, rd.header, bam=True)
    for rec in rd:
        wr.write(rec)
    wr.close()
    bam.seek(0)

    monkeypatch.setenv("PANVC3_ALS_FAST", "1")
    out_sam = io.StringIO()
    s_sam = calculate_coverage(SamReader(io.BytesIO(sam)), out_sam)
    out_bam = io.StringIO()
    s_bam = calculate_coverage(SamReader(bam), out_bam)
    assert out_sam.getvalue() == out_bam.getvalue()
    assert s_sam == s_bam


def test_als_box_plot_fp_contract_regression(monkeypatch):
    """Regression: this exact MAPQ stream flips a P² marker-adjustment
    decision if the C estimator is compiled with FMA contraction
    (-ffp-contract=fast); the build must keep contraction off so the C
    doubles round exactly like the Python oracle."""
    from panvc3_tpu.native import get_native
    from panvc3_tpu.pipeline.alignment_statistics import mapq_box_plot

    nat = get_native()
    if nat is None or not hasattr(nat, "als_chunk"):
        pytest.skip("native extension not built")

    vals = [3, 3, 42, 254, 0, 254, 42, 0, 3, 42, 42, 42, 254, 3,
            254, 254, 42, 3, 254, 254, 42, 3, 0, 3, 3, 254, 254, 3]
    lines = ["@HD\tVN:1.6\tSO:coordinate", "@SQ\tSN:c\tLN:5000"]
    for i, v in enumerate(vals):
        lines.append(
            f"r{i}\t0\tc\t{10 + i}\t{v}\t10M\t*\t0\t0\t{'A' * 10}\t{'I' * 10}"
        )
    sam = ("\n".join(lines) + "\n").encode()
    rows = {}
    for fast in ("0", "1"):
        monkeypatch.setenv("PANVC3_ALS_FAST", fast)
        out = io.StringIO()
        mapq_box_plot(SamReader(io.BytesIO(sam)), out, bin_width=100000)
        rows[fast] = out.getvalue()
    assert rows["0"] == rows["1"]
    assert "171.556" in rows["1"]  # the correctly-rounded q75
