"""Golden-table tests for find_indel_runs against the reference fixtures
(/root/reference/tests/indel_run_checker.cc:106-234)."""

import pytest

from panvc3_tpu.cigar import cigar_ref_length, cigar_query_length
from panvc3_tpu.indel_runs import find_indel_runs

from .conftest import DATA_DIR
from .fixtures import load_indel_run_cases

CASES = load_indel_run_cases(DATA_DIR / "indel_run_checker_inputs.tsv")


@pytest.mark.parametrize("case", CASES, ids=[c.name for c in CASES])
def test_indel_runs_golden(case):
    runs = find_indel_runs(case.cigar, 0)
    expected_runs = [seg for seg in case.segments if seg.is_run]
    expected_non_runs = [seg for seg in case.segments if not seg.is_run]

    assert len(runs) == len(expected_runs), case.name

    # Walk the CIGAR the way the reference test does: alternating non-run /
    # run segments must tile the whole op list.
    cigar_begin = 0
    non_run_idx = 0
    for run, exp in zip(runs, expected_runs):
        if cigar_begin != run.cigar_start:
            # preceding non-run segment
            seg = case.cigar[cigar_begin:run.cigar_start]
            assert non_run_idx < len(expected_non_runs)
            assert seg == expected_non_runs[non_run_idx].cigar_ops
            non_run_idx += 1
        assert case.cigar[run.cigar_start:run.cigar_end] == exp.cigar_ops
        assert run.query_start == exp.query_start
        assert run.query_start + run.query_length == exp.query_end
        assert run.ref_start == exp.ref_start
        assert run.ref_start + run.ref_length == exp.ref_end
        cigar_begin = run.cigar_end

    if cigar_begin < len(case.cigar):
        seg = case.cigar[cigar_begin:]
        assert non_run_idx < len(expected_non_runs)
        assert seg == expected_non_runs[non_run_idx].cigar_ops
        non_run_idx += 1
    assert non_run_idx == len(expected_non_runs)


@pytest.mark.parametrize("case", CASES, ids=[c.name for c in CASES])
def test_indel_runs_final_positions(case):
    # The checker's end positions equal the CIGAR's total ref/query span.
    assert cigar_query_length(case.cigar) == case.query_end
    assert cigar_ref_length(case.cigar) == case.ref_end


def test_run_broken_by_softclip_and_skip():
    runs = find_indel_runs([(2, "I"), (3, "D"), (4, "S"), (1, "I"), (1, "D")], 10)
    assert len(runs) == 2
    first, second = runs
    assert (first.ref_start, first.ref_length) == (10, 3)
    assert (first.query_start, first.query_length) == (0, 2)
    # checker positions include the breaking op's advance
    assert first.checker_ref_pos == 13
    assert first.checker_query_pos == 2 + 4
    assert (second.ref_start, second.ref_length) == (13, 1)
    assert (second.query_start, second.query_length) == (6, 1)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_indel_runs_arbitrary(seed):
    """Property test mirroring the reference's rapidcheck suite
    (/root/reference/tests/indel_run_checker_arbitrary.cc:487-536):
    for arbitrary op-run sequences the checker must report exactly the
    maximal I/D stretches that contain both an insertion and a deletion,
    with the brute-force coordinate model computed independently here."""
    import numpy as np

    rng = np.random.default_rng(seed)
    ops_pool = list("IDIDM=XSNHP")  # I/D-heavy so runs are common
    for _ in range(300):
        n_ops = int(rng.integers(1, 14))
        cigar = [
            (int(rng.integers(1, 6)), ops_pool[int(rng.integers(len(ops_pool)))])
            for _ in range(n_ops)
        ]
        ref_pos0 = int(rng.integers(0, 100))

        # independent brute-force model
        ref_adv = {"M": 1, "=": 1, "X": 1, "D": 1, "N": 1}
        query_adv = {"M": 1, "=": 1, "X": 1, "I": 1, "S": 1}
        ref_at = [ref_pos0]
        query_at = [0]
        for cnt, op in cigar:
            ref_at.append(ref_at[-1] + cnt * ref_adv.get(op, 0))
            query_at.append(query_at[-1] + cnt * query_adv.get(op, 0))
        expected = []
        i = 0
        while i < len(cigar):
            if cigar[i][1] in "ID":
                j = i
                kinds = set()
                while j < len(cigar) and cigar[j][1] in "ID":
                    kinds.add(cigar[j][1])
                    j += 1
                if kinds == {"I", "D"}:
                    # checker positions: after the breaking op advanced
                    # them, or the CIGAR end for a final run
                    after = min(j + 1, len(cigar))
                    expected.append(
                        (
                            i,
                            j,
                            ref_at[i],
                            ref_at[j] - ref_at[i],
                            query_at[i],
                            query_at[j] - query_at[i],
                            ref_at[after],
                            query_at[after],
                        )
                    )
                i = j
            else:
                i += 1

        runs = find_indel_runs(cigar, ref_pos0)
        got = [
            (
                r.cigar_start,
                r.cigar_end,
                r.ref_start,
                r.ref_length,
                r.query_start,
                r.query_length,
                r.checker_ref_pos,
                r.checker_query_pos,
            )
            for r in runs
        ]
        assert got == expected, (cigar, ref_pos0)
