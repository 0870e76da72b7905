"""Golden-table tests for rewrite_cigar against the reference fixtures
(/root/reference/tests/rewrite_cigar.cc:111-191)."""

import pytest

from panvc3_tpu.alphabet import normalise_dna5
from panvc3_tpu.cigar import cigar_eq, format_cigar
from panvc3_tpu.msa_index import make_sequence_entry_pair
from panvc3_tpu.rewrite import rewrite_cigar

from .conftest import DATA_DIR
from .fixtures import load_seq_pair_cases

CASES = load_seq_pair_cases(DATA_DIR / "rewrite_cigar_inputs.tsv")
PARAMS = [
    pytest.param(case, q, id=f"{ci}-{qi}")
    for ci, case in enumerate(CASES)
    for qi, q in enumerate(case.queries)
]


@pytest.mark.parametrize("case,q", PARAMS)
def test_rewrite_cigar_golden(case, q):
    src_entry, dst_entry = make_sequence_entry_pair(case.src, case.dst)
    dst_seq = case.dst.replace("-", "")
    query = normalise_dna5(q.query)

    dst_pos, actual = rewrite_cigar(
        q.src_pos, q.cigar, src_entry, dst_entry, query, dst_seq
    )
    assert dst_pos == q.expected_dst_pos, q.section_name
    assert cigar_eq(q.expected_cigar, actual, count_padding=True), (
        f"{q.section_name}: expected {format_cigar(q.expected_cigar)} "
        f"got {format_cigar(actual)}"
    )
