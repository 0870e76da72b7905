"""Native SAM text codec + CIGAR rescoring vs the pure-Python oracles.

The C extension (native/panvc3_native.c) supplies parse_sam_line,
format_sam_line and score_cigar; io/sam.py and recalculate_mapq.py fall
back to the Python implementations when it is absent.  These tests pin
byte-for-byte / value parity between the two paths.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from panvc3_tpu import native as native_mod
from panvc3_tpu.io.sam import (
    SamHeader,
    SamRecord,
    _parse_sam_record_py,
    format_sam_record,
    parse_sam_record,
)
from panvc3_tpu.pipeline.recalculate_mapq import AlignmentScoring, CigarScorer

nat = native_mod.get_native()
pytestmark = pytest.mark.skipif(nat is None, reason="native extension not built")


@pytest.fixture()
def header():
    h = SamHeader()
    h.ref_names = ["chr1", "chr2"]
    h.ref_lengths = [1000, 2000]
    return h


def _python_path(fn, *args):
    """Run fn with the native module masked off."""
    saved = native_mod._native
    native_mod._native = False
    try:
        return fn(*args)
    finally:
        native_mod._native = saved


def _random_line(rng, random_mod, i):
    f = [f"read{i}", str(int(rng.integers(0, 4096)))]
    rname = random_mod.choice(["chr1", "chr2", "*"])
    f.append(rname)
    f.append("0" if rname == "*" else str(int(rng.integers(1, 1000))))
    f.append(str(int(rng.integers(0, 255))))
    f.append(random_mod.choice(["*", "10M", "5=1X4=", "3S10=2I5=2D4=1N3="]))
    f.append(random_mod.choice(["*", "=", "chr1", "chr2"]))
    f.append(str(int(rng.integers(0, 1000))))
    f.append(str(int(rng.integers(-500, 500))))
    f.append("".join(random_mod.choices("ACGTN", k=12)))
    f.append("".join(chr(33 + int(q)) for q in rng.integers(0, 60, 12)))
    tags = []
    if random_mod.random() < 0.8:
        tags.append(f"AS:i:{int(rng.integers(-50, 1))}")
    if random_mod.random() < 0.5:
        tags.append("OA:Z:chr1,10,+,5M,60,2;")
    if random_mod.random() < 0.5:
        tags.append(f"XB:B:I,{int(rng.integers(0, 9))},{int(rng.integers(0, 9))}")
    if random_mod.random() < 0.3:
        tags.append("XF:f:1.5")
    if random_mod.random() < 0.3:
        tags.append("XA:A:c")
    if random_mod.random() < 0.2:
        tags.append("XE:B:C")  # empty numeric array
    random_mod.shuffle(tags)
    return "\t".join(f + tags)


def test_parse_and_format_parity_random(header):
    rng = np.random.default_rng(7)
    random.seed(7)
    checked = 0
    for i in range(500):
        line = _random_line(rng, random, i)
        ref = _parse_sam_record_py(line, header)
        got = parse_sam_record(line, header)
        assert got == ref
        nat_out = format_sam_record(ref, header)
        py_out = _python_path(format_sam_record, ref, header)
        assert nat_out == py_out
        checked += 1
    assert checked == 500


def test_parse_rejects_malformed(header):
    for bad in [
        "r1\t99\tchr1",  # truncated
        "r\tx\tchr1\t1\t60\t4=\t*\t0\t0\tACGT\tIIII",  # non-int flag
        "r\t0\tchr1\t1\t60\t4Q\t*\t0\t0\tACGT\tIIII",  # bad CIGAR op
        "r\t0\tchr1\t1\t60\t4=\t*\t0\t0\tACGT\tIIII\tbadtag",
        "r\t0\tchrX\t1\t60\t4=\t*\t0\t0\tACGT\tIIII",  # unknown reference
    ]:
        with pytest.raises(ValueError):
            parse_sam_record(bad, header)


def test_format_numpy_tag_values(header):
    """The projection pipeline stores numpy ints in tags; formatting must
    match the Python path's int() coercion."""
    r = SamRecord(
        qname="q", flag=0, ref_id=0, pos=9, mapq=60,
        cigar=[(4, "=")], seq="ACGT", qual="IIII",
    )
    r.tags["XP"] = ("i", np.int64(12))
    r.tags["XB"] = ("B", ("I", [np.int32(5), 6]))
    nat_out = format_sam_record(r, header)
    py_out = _python_path(format_sam_record, r, header)
    assert nat_out == py_out
    assert nat_out.endswith("XB:B:I,5,6\tXP:i:12")


def test_score_cigar_parity_random():
    rng = np.random.default_rng(3)
    sc = CigarScorer(AlignmentScoring())
    for _ in range(200):
        length = int(rng.integers(1, 150))
        seq = "".join(rng.choice(list("ACGTN"), length))
        qual = (
            "".join(chr(33 + int(q)) for q in rng.integers(0, 60, length))
            if rng.random() < 0.9
            else "*"
        )
        ops = []
        rem = length
        while rem > 0:
            k = int(rng.integers(1, min(rem, 30) + 1))
            op = rng.choice(["=", "X", "I", "S"]) if rng.random() < 0.8 else "="
            ops.append((k, op))
            rem -= k
            if rng.random() < 0.3:
                ops.append((int(rng.integers(1, 5)), "D"))
            if rng.random() < 0.1:
                ops.append((int(rng.integers(1, 5)), "N"))
        rec = SamRecord(
            qname="q", flag=0, ref_id=0, pos=0, mapq=60,
            cigar=ops, seq=seq, qual=qual,
        )
        ref_len = sum(k for k, op in ops if op in "=XDN")
        mask = (
            list(rng.integers(0, 256, (ref_len + 7) // 8).astype(np.uint8))
            if rng.random() < 0.5
            else []
        )
        want = sc._calculate_scalar(rec, mask)
        assert sc.calculate(rec, mask) == want  # native path
        assert _python_path(sc.calculate, rec, mask) == want


def test_score_cigar_rejects_m_ops():
    sc = CigarScorer(AlignmentScoring())
    rec = SamRecord(
        qname="q", flag=0, ref_id=0, pos=0, mapq=60,
        cigar=[(4, "M")], seq="ACGT", qual="IIII",
    )
    with pytest.raises(ValueError):
        sc.calculate(rec, [])


def test_collapse_cigar_parity_random():
    import random

    from panvc3_tpu.cigar import _collapse_cigar_py, collapse_cigar

    random.seed(5)
    for _ in range(500):
        ops = [
            (random.randrange(0, 4), random.choice("MIDNSHP=X"))
            for _ in range(random.randrange(0, 40))
        ]
        assert collapse_cigar(ops) == _collapse_cigar_py(ops)
    assert collapse_cigar([]) == []
    assert collapse_cigar([(0, "M"), (0, "I")]) == []


def test_bam_decoder_rejects_corrupt_header():
    """Corrupt BAM record headers (zero read-name length, negative l_seq)
    raise a typed error instead of underflowing field arithmetic."""
    import struct

    import pytest

    from panvc3_tpu.native import get_native

    nat = get_native()
    if nat is None or not hasattr(nat, "bam_to_sam_lines"):
        pytest.skip("native extension not built")

    # l_read_name == 0
    rec = struct.pack("<iiBBHHHiiii", 0, 10, 0, 60, 0, 0, 0, 4, -1, -1, 0)
    with pytest.raises(ValueError, match="corrupt BAM record header"):
        nat.bam_to_sam_lines(struct.pack("<I", len(rec)) + rec, ["c"])
    # negative l_seq
    rec2 = struct.pack("<iiBBHHHiiii", 0, 10, 2, 60, 0, 0, 0, -5, -1, -1, 0)
    with pytest.raises(ValueError, match="corrupt BAM record header"):
        nat.bam_to_sam_lines(struct.pack("<I", len(rec2)) + rec2, ["c"])
