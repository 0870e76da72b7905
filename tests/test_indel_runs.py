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
