"""Parsers for the golden fixture TSVs vendored from the reference test
suite (/root/reference/tests/*_inputs.tsv — data files, not code)."""

from __future__ import annotations

import pathlib
from dataclasses import dataclass, field

from panvc3_tpu.cigar import Cigar, parse_cigar


@dataclass
class SeqPairCase:
    given: str
    src: str
    dst: str
    queries: list["QueryCase"] = field(default_factory=list)


@dataclass
class QueryCase:
    query: str
    src_pos: int
    expected_dst_pos: int
    cigar: Cigar
    expected_cigar: Cigar
    section_name: str
    query_given: str


def load_seq_pair_cases(path: pathlib.Path) -> list[SeqPairCase]:
    """Parse an S/Q fixture TSV (rewrite_cigar_inputs.tsv,
    alignment_projector_inputs.tsv)."""
    cases: list[SeqPairCase] = []
    for line in path.read_text().splitlines():
        if not line.strip():
            continue
        fields = line.split("\t")
        if fields[0] == "S":
            _, given, src, dst = fields
            cases.append(SeqPairCase(given, src, dst))
        elif fields[0] == "Q":
            _, query, src_pos, dst_pos, cig, exp_cig, section, given = fields
            cases[-1].queries.append(
                QueryCase(
                    query=query,
                    src_pos=int(src_pos),
                    expected_dst_pos=int(dst_pos),
                    cigar=parse_cigar(cig),
                    expected_cigar=parse_cigar(exp_cig),
                    section_name=section,
                    query_given=given,
                )
            )
        else:
            raise ValueError(f"unexpected fixture line: {line!r}")
    return cases


@dataclass
class IndelSegment:
    is_run: bool
    cigar_ops: Cigar
    # For runs only (see /root/reference/tests/indel_run_checker.cc:53-80):
    query_start: int = 0
    query_end: int = 0
    ref_start: int = 0
    ref_end: int = 0


@dataclass
class IndelRunCase:
    cigar: Cigar
    has_preceding: bool  # first run is preceded by a non-run segment
    has_tail: bool       # a non-run segment follows the last run
    query_end: int       # checker query position after full scan
    ref_end: int         # checker reference position after full scan
    name: str
    segments: list[IndelSegment] = field(default_factory=list)


def load_indel_run_cases(path: pathlib.Path) -> list[IndelRunCase]:
    """Parse indel_run_checker_inputs.tsv.

    Line types (see /root/reference/tests/indel_run_checker.cc:106-234):
    - ``N <cigar>``: an expected non-run segment;
    - ``I <cigar> <query_start> <query_end> <ref_start> <ref_end>``: an
      expected I+D run with its query/reference ranges;
    - ``C <cigar> <has_preceding> <has_tail> <query_end> <ref_end> <name>``:
      the full CIGAR plus the expected final checker positions; terminates
      one test case.
    """
    cases: list[IndelRunCase] = []
    pending: list[IndelSegment] = []
    for line in path.read_text().splitlines():
        if not line.strip():
            continue
        fields = line.split("\t")
        tag = fields[0]
        if tag == "N":
            pending.append(IndelSegment(False, parse_cigar(fields[1])))
        elif tag == "I":
            _, cig, q0, q1, r0, r1 = fields
            pending.append(
                IndelSegment(True, parse_cigar(cig), int(q0), int(q1), int(r0), int(r1))
            )
        elif tag == "C":
            _, cig, has_preceding, has_tail, query_end, ref_end, name = fields
            cases.append(
                IndelRunCase(
                    cigar=parse_cigar(cig),
                    has_preceding=has_preceding == "T",
                    has_tail=has_tail == "T",
                    query_end=int(query_end),
                    ref_end=int(ref_end),
                    name=name,
                    segments=pending,
                )
            )
            pending = []
        else:
            raise ValueError(f"unexpected fixture line: {line!r}")
    return cases
