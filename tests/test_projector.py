"""Golden-table tests for the full alignment projector against the reference
fixtures (/root/reference/tests/alignment_projector.cc:157-247).

The reference test runs each query with maximal phred42 base qualities and
gap costs (0, -1).  One fixture row is skipped: the second "short matching
segment … mismatching middle part" row shares its Catch2 SECTION name (and
source line) with an earlier row, so the reference test framework never
executes it; its expected value is inconsistent with the scoring scheme the
other rows pin down (see test_projector_dead_fixture_row below).
"""

import numpy as np
import pytest

from panvc3_tpu.alphabet import PHRED42_MAX
from panvc3_tpu.cigar import cigar_eq, format_cigar
from panvc3_tpu.msa_index import make_sequence_entry_pair
from panvc3_tpu.projector import project_alignment

from .conftest import DATA_DIR
from .fixtures import load_seq_pair_cases

CASES = load_seq_pair_cases(DATA_DIR / "alignment_projector_inputs.tsv")

# Replicate Catch2 section semantics: rows whose section name repeats an
# earlier row's never run in the reference suite.
_seen: set[str] = set()
PARAMS = []
DEAD = []
for ci, case in enumerate(CASES):
    for qi, q in enumerate(case.queries):
        if q.section_name in _seen:
            DEAD.append((case, q))
            continue
        _seen.add(q.section_name)
        PARAMS.append(pytest.param(case, q, id=f"{ci}-{qi}"))


def run_projection(case, q):
    src_entry, dst_entry = make_sequence_entry_pair(case.src, case.dst)
    dst_seq = case.dst.replace("-", "")
    quals = np.full(len(q.query), PHRED42_MAX, dtype=np.int32)
    return project_alignment(
        q.src_pos,
        src_entry,
        dst_entry,
        dst_seq,
        q.query,
        q.cigar,
        quals,
        gap_opening_cost=0,
        gap_extension_cost=-1,
    )


@pytest.mark.parametrize("case,q", PARAMS)
def test_projector_golden(case, q):
    res = run_projection(case, q)
    assert res.dst_pos == q.expected_dst_pos, q.section_name
    assert cigar_eq(q.expected_cigar, res.cigar, count_padding=True), (
        f"{q.section_name}: expected {format_cigar(q.expected_cigar)} "
        f"got {format_cigar(res.cigar)}"
    )


def test_projector_dead_fixture_row():
    # The dead row's realignment subproblem (ref "ATG" vs query "TTT") is
    # identical to the "partially mismatching tail" row, whose expected
    # output (1D1=1D2I) the quality-aware scorer produces; the dead row's
    # written expectation (1=1X1=1X1=) would require the quality-free scheme
    # instead.  We assert the consistent behaviour.
    assert len(DEAD) == 1
    case, q = DEAD[0]
    res = run_projection(case, q)
    assert res.dst_pos == q.expected_dst_pos
    assert format_cigar(res.cigar) == "1=1D1=1D2I1="
