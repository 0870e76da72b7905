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


def test_cigar_eq_arbitrary_run_permutation():
    """Property test mirroring the reference's rapidcheck suite
    (/root/reference/tests/cigar_eq.cc:460-559): randomly permuting and
    re-splitting the I/D ops *within* an indel run preserves cigar_eq,
    while changing any run's {#I, #D} totals breaks it."""
    import numpy as np

    rng = np.random.default_rng(5)
    for _ in range(300):
        # build a CIGAR of alternating anchor / indel-run segments
        cigar = []
        runs = []
        for _seg in range(int(rng.integers(1, 5))):
            cigar.append((int(rng.integers(1, 6)), "=MX"[int(rng.integers(3))]))
            ni, nd = int(rng.integers(0, 5)), int(rng.integers(0, 5))
            if ni or nd:
                runs.append((len(cigar), ni, nd))
                if ni:
                    cigar.append((ni, "I"))
                if nd:
                    cigar.append((nd, "D"))
        cigar.append((1, "="))

        # permute each run: random interleaving of its I's and D's
        permuted = []
        idx = 0
        run_starts = {start: (ni, nd) for start, ni, nd in runs}
        while idx < len(cigar):
            if idx in run_starts:
                ni, nd = run_starts[idx]
                letters = ["I"] * ni + ["D"] * nd
                rng.shuffle(letters)
                for ch in letters:
                    if permuted and permuted[-1][1] == ch:
                        permuted[-1] = (permuted[-1][0] + 1, ch)
                    else:
                        permuted.append((1, ch))
                idx += (1 if ni else 0) + (1 if nd else 0)
            else:
                permuted.append(cigar[idx])
                idx += 1
        assert cigar_eq(cigar, permuted), (cigar, permuted)

        # mutating one run's totals must break equality
        if runs:
            start, ni, nd = runs[int(rng.integers(len(runs)))]
            mutated = list(cigar)
            if ni:
                mutated[start] = (ni + 1, "I")
            else:
                mutated[start] = (nd + 1, "D")
            assert not cigar_eq(cigar, mutated), (cigar, mutated)
