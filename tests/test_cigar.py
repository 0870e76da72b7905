import pytest

from panvc3_tpu.cigar import (
    CigarBuffer,
    arrays_to_cigar,
    cigar_eq,
    cigar_to_arrays,
    collapse_cigar,
    format_cigar,
    parse_cigar,
)


def test_parse_format_roundtrip():
    for text in ["10M", "3=2X1I4D", "5S10M5S", "1H2P3N", "*"]:
        assert format_cigar(parse_cigar(text)) == text


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_cigar("10Q")
    with pytest.raises(ValueError):
        parse_cigar("M10")


def test_collapse():
    assert collapse_cigar([(1, "M"), (2, "M"), (3, "I")]) == [(3, "M"), (3, "I")]
    assert collapse_cigar([(1, "M"), (0, "I"), (2, "M")]) == [(3, "M")]
    assert collapse_cigar([]) == []


def test_buffer_merges_runs():
    buf = CigarBuffer()
    for op in "===XX=":
        buf.push_back(op)
    buf.push_back("I", 0)  # zero-count push is a no-op
    buf.finish()
    assert buf.operations == [(3, "="), (2, "X"), (1, "=")]


def test_cigar_eq_indel_run_permutation():
    # 3D3I == 3I3D == 1D1I2D2I within one run
    a = parse_cigar("3=3D3I")
    b = parse_cigar("3=3I3D")
    c = parse_cigar("3=1D1I2D2I")
    assert cigar_eq(a, b)
    assert cigar_eq(a, c)
    # but splitting the run with a match breaks equality
    d = parse_cigar("3=1D1=2D3I")
    assert not cigar_eq(a, d)


def test_cigar_eq_non_indel_must_match_exactly():
    assert not cigar_eq(parse_cigar("3="), parse_cigar("3X"))
    assert not cigar_eq(parse_cigar("3="), parse_cigar("4="))
    assert cigar_eq(parse_cigar("3=2I1="), parse_cigar("3=2I1="))
    assert not cigar_eq(parse_cigar("3=2I"), parse_cigar("3=2I1="))


def test_cigar_eq_padding():
    # With count_padding=True, P inside a run is ignored for comparison.
    a = parse_cigar("1I1P1D")
    b = parse_cigar("1D1I")
    assert cigar_eq(a, b, count_padding=True)
    assert not cigar_eq(a, b, count_padding=False)


def test_array_codec_roundtrip():
    cig = parse_cigar("3=2X1I4D10S")
    counts, codes = cigar_to_arrays(cig, pad_to=8)
    assert counts.shape == (8,)
    assert arrays_to_cigar(counts, codes) == cig
