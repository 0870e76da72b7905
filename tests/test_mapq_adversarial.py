"""LOCKED adversarial recalculate_mapq goldens.

tests/data/mapq_adversarial.tsv (generated once by
tools/gen_mapq_adversarial.py, then LOCKED) pins the full group
algorithm's answers — exact Bowtie2-v2 table boundaries, dedup-by-
position-pair keep-best, MAPQ 255 for non-best duplicates, mate lookup
edges, sequences_eq rules, mixed-pairedness skips, rescore-mode
quality-scaled penalties — on 146 adversarial groups.  Every engine is
held to the same bytes:

- the object path (PANVC3_MAPQ_FAST=0),
- the C group engine (PANVC3_MAPQ_FAST=1),
- the pure-Python scorer fallback (get_native forced to None),

in both AS-tag and --rescore-alignments modes.  The randomized
differential test (test_mapq_tools.py) proves the engines agree with
each other; this table prevents them all drifting together.

Reference semantics: /root/reference/recalculate-mapq/main.cc:376-425
(tables), 960-1179 (group algorithm).
"""

from __future__ import annotations

import io
import pathlib

import pytest

DATA = pathlib.Path(__file__).parent / "data/mapq_adversarial.tsv"

RNAMES = ("chrA", "chrB")


def _load():
    inputs: list[str] = []
    expected: dict[str, list[str]] = {"astag": [], "rescore": []}
    for line in DATA.read_text().splitlines():
        kind, rest = line.split("\t", 1)
        if kind == "I":
            inputs.append(rest)
        else:
            mode, rec = rest.split("\t", 1)
            expected[mode].append(rec)
    header = ["@HD\tVN:1.6"] + [f"@SQ\tSN:{n}\tLN:100000" for n in RNAMES]
    sam = ("\n".join(header + inputs) + "\n").encode()
    return sam, expected


@pytest.mark.parametrize("engine", ["object", "native", "py_scorer"])
@pytest.mark.parametrize("mode", ["astag", "rescore"])
def test_mapq_adversarial_goldens(engine, mode, monkeypatch, capsys):
    from panvc3_tpu.native import get_native
    import panvc3_tpu.pipeline.recalculate_mapq as rm

    if engine == "native" and get_native() is None:
        pytest.skip("native extension not built")

    sam, expected = _load()
    monkeypatch.setenv(
        "PANVC3_MAPQ_FAST", "1" if engine == "native" else "0"
    )
    if engine == "py_scorer":
        monkeypatch.setattr(rm, "get_native", lambda: None)

    out = io.BytesIO()
    rm.run_recalculate_mapq(io.BytesIO(sam), out, rescore=(mode == "rescore"))
    got = [
        ln for ln in out.getvalue().decode().splitlines()
        if not ln.startswith("@")
    ]
    want = expected[mode]
    assert len(got) == len(want), (len(got), len(want))
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"record {i} ({engine}/{mode}):\n got {g}\nwant {w}"


def test_fixture_covers_all_reachable_table_rows():
    """Every reachable MAPQ value must appear in the locked outputs: the
    full NON_UNIQUE table (the unique table is unreachable — see the
    module docstring of recalculate_mapq), the diff==0 tie branch (1)
    and MAPQ_NO_NEXT_RECORD (255)."""
    from panvc3_tpu.pipeline.recalculate_mapq import (
        MAPQ_NO_NEXT_RECORD,
        NON_UNIQUE_ALIGNMENT_SCORES,
    )

    _, expected = _load()
    seen = {
        int(rec.split("\t")[4])
        for recs in expected.values()
        for rec in recs
    }
    want = {m for _, _, m in NON_UNIQUE_ALIGNMENT_SCORES}
    want |= {0, 1, MAPQ_NO_NEXT_RECORD}
    missing = want - seen
    assert not missing, f"table rows never exercised: {sorted(missing)}"
