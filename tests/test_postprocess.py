import io

from panvc3_tpu.postprocess.count_diff import diff_streams
from panvc3_tpu.postprocess.coverage_tools import (
    coverage_histogram,
    filter_reference,
    filter_with_vcf,
    merge_coverages,
)
from panvc3_tpu.postprocess.reference_bias import calculate_reference_bias

COUNTS = """V\ttest\t2\t.\tC\tT\t1\t0
R\t6\tC
R\t4\tT
V\ttest\t9\t.\tG\tGA\t1\t1
R\t3\tG
R\t9\tGA
V\ttest\t20\t.\tA\tC\t1\t0
R\t1\tA
S\tTotal variants\t3
"""


def test_reference_bias():
    out = io.StringIO()
    err = io.StringIO()
    res = calculate_reference_bias(
        io.StringIO(COUNTS), out, err, min_coverage=2
    )
    lines = out.getvalue().splitlines()
    assert lines[0] == "BALANCE\tREF_LENGTH\tALT_LENGTH"
    assert lines[1] == "0.6\t1\t1"
    # second variant flagged reversed: REF/ALT swapped -> ref=GA alt=G
    assert lines[2] == f"{9 / 12}\t2\t1"
    # third variant below min coverage -> skipped
    assert res.variants_counted == 2
    assert res.variants_skipped == 1
    assert any(l.startswith("# Overall ref-to-alt ratio:") for l in lines)
    assert "S\tTotal variants\t3" in err.getvalue()


def test_count_diff():
    lhs = "V\tt\t2\tid1\tC\tT\n" + "R\t6\tC\n"
    rhs = "V\tt\t2\tid1\tC\tT\n" + "R\t5\tC\n"
    out = io.StringIO()
    n = diff_streams(io.StringIO(lhs), io.StringIO(rhs), out)
    assert n == 1
    assert "id1" in out.getvalue()
    # identical streams -> no diff
    out2 = io.StringIO()
    assert diff_streams(io.StringIO(lhs), io.StringIO(lhs), out2) == 0
    assert out2.getvalue() == ""


def test_coverage_histogram():
    data = "POSITION\tCOVERAGE\n0\t2\n1\t2\n3\t1\n"
    out = io.StringIO()
    coverage_histogram(io.StringIO(data), out, count_missing=True, max_length=5)
    lines = out.getvalue().splitlines()
    assert lines[0] == "COVERAGE\tCOUNT"
    hist = dict(l.split("\t") for l in lines[1:])
    assert hist["2"] == "2"
    assert hist["1"] == "1"
    assert hist["0"] == "3"  # position 2 missing + positions 4,5


def test_merge_coverages():
    a = "POSITION\tCOVERAGE\n0\t1\n2\t3\n"
    b = "POSITION\tCOVERAGE\n1\t2\n2\t4\n"
    out = io.StringIO()
    merge_coverages(io.StringIO(a), io.StringIO(b), out)
    assert out.getvalue() == "POSITION\tCOVERAGE\n0\t1\n1\t2\n2\t7\n"


def test_filter_with_vcf(tmp_path):
    vcf = tmp_path / "x.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "t\t3\t.\tAC\tA\t.\t.\t.\n"
    )
    cov = "POSITION\tCOVERAGE\n1\t5\n2\t6\n3\t7\n4\t8\n"
    out = io.StringIO()
    filter_with_vcf(io.StringIO(cov), str(vcf), out, chr_id="t")
    # variant covers 0-based positions 2..3
    assert out.getvalue() == "POSITION\tCOVERAGE\n2\t6\n3\t7\n"


def test_filter_reference():
    fasta = ">a desc\nACGT\nACGT\n>b\nTTTT\n"
    out = io.StringIO()
    ids = io.StringIO()
    filter_reference(
        io.StringIO(fasta),
        out,
        remove_contigs=frozenset({"a"}),
        contig_id_out=ids,
    )
    assert out.getvalue() == ">b\nTTTT\n"
    assert ids.getvalue() == "a\nb\n"


def test_coverage_tools_fast_path_differential(monkeypatch):
    """The C TSV codec + vectorized histogram/merge must match the
    streaming Python loops, including count_missing gap accounting, the
    max_length tail, non-strictly-increasing inputs (streaming fallback)
    and negative coverage values (slow fallback)."""
    import random

    from panvc3_tpu.native import get_native

    nat = get_native()
    if nat is None or not hasattr(nat, "parse_pos_cov"):
        import pytest

        pytest.skip("native extension not built")

    rng = random.Random(3)

    def stream(n, start=0, step_max=3, cov_lo=0, shuffle=False):
        pos = []
        p = start
        for _ in range(n):
            pos.append(p)
            p += rng.randint(1, step_max)
        if shuffle:
            rng.shuffle(pos)
        rows = [f"{p}\t{rng.randint(cov_lo, 9)}" for p in pos]
        return "POSITION\tCOVERAGE\n" + "\n".join(rows) + "\n"

    cases = [
        (stream(200), dict()),
        (stream(200), dict(count_missing=True)),
        (stream(200), dict(count_missing=True, max_length=1500)),
        ("POSITION\tCOVERAGE\n", dict()),
        ("POSITION\tCOVERAGE\n", dict(count_missing=True, max_length=7)),
        (stream(100, cov_lo=-2), dict()),  # negative coverage -> fallback
    ]
    from panvc3_tpu.postprocess.coverage_tools import (
        coverage_histogram,
        merge_coverages,
    )

    for text, kw in cases:
        res = {}
        for fast in ("0", "1"):
            monkeypatch.setenv("PANVC3_COVTOOLS_FAST", fast)
            out = io.StringIO()
            h = coverage_histogram(io.StringIO(text), out, **kw)
            res[fast] = (out.getvalue(), h)
        assert res["0"] == res["1"], kw

    merge_cases = [
        (stream(150), stream(180, start=37)),
        (stream(10), "POSITION\tCOVERAGE\n"),
        ("POSITION\tCOVERAGE\n", "POSITION\tCOVERAGE\n"),
        (stream(60, shuffle=True), stream(60)),  # unsorted -> streaming
    ]
    for a, b in merge_cases:
        res = {}
        for fast in ("0", "1"):
            monkeypatch.setenv("PANVC3_COVTOOLS_FAST", fast)
            out = io.StringIO()
            merge_coverages(io.StringIO(a), io.StringIO(b), out)
            res[fast] = out.getvalue()
        assert res["0"] == res["1"]
