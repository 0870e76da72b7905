"""Byte-level regression goldens over the vendored toy workflow data.

The committed goldens (tests/data/golden_*.sam.gz) are the build's own
projected / MAPQ-recalculated outputs over deterministic read streams
derived from the vendored reference data (see tests/golden_workflow.py).
They pin the DP tie-breaking, rewrite semantics, tag surgery and SAM
formatting: any change that alters output bytes must be a conscious
decision (regenerate with ``python -m tests.golden_workflow --write``)."""

import gzip

import pytest

from .golden_workflow import DATA, GOLDEN_DIR, GOLDENS, run_all


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    return run_all(tmp_path_factory.mktemp("golden"))


@pytest.mark.parametrize("stream", sorted(GOLDENS))
def test_golden_outputs(outputs, stream):
    golden = gzip.decompress((GOLDEN_DIR / GOLDENS[stream]).read_bytes())
    got = outputs[stream]
    if got != golden:
        glines = golden.split(b"\n")
        olines = got.split(b"\n")
        for i, (a, b) in enumerate(zip(glines, olines)):
            assert a == b, (stream, f"first differing line {i}", a, b)
        assert len(glines) == len(olines), (stream, "line count differs")
        pytest.fail(f"{stream}: outputs differ")
