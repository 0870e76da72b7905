"""Systematic gap-boundary enumeration for the fused-v4 decode.

ADVICE r3's silent-corruption bug lived exactly where an MSA gap-run
boundary coincides with a non-ref op's unit position.  Rather than hoping
randomized soaks hit those configurations, this test ENUMERATES them: for
every combination of (gap row: REF / founder / both, gap length, offset
of the gap run relative to the read's indel-run boundary, clipped or
not), one read is placed in its own region of a shared MSA, and the whole
batch is projected through the host oracle engine and the fused-v4 device
path — byte-identical output required, with spies asserting the v4 wire
(not a fallback) produced the device answer.  A second pass runs the same
batch under -q (quantised Malde scoring), which must also match the host
byte-for-byte.
"""

import io

import numpy as np
import pytest

from panvc3_tpu.pipeline.project_alignments import (
    ProjectConfig,
    run_project_alignments,
)

REGION = 64          # aligned columns reserved per case
CIGAR_CORE = "3=2I2D12="   # one adjacent I+D indel run after 3 matches
READ_UNITS = 17      # founder units consumed by the core (3 + 2D->0 ... )


def _build_case_msa(rng):
    """(founder_aligned, ref_aligned, cases): one region per enumerated
    configuration; gap runs are written into the chosen row(s) at the
    chosen offset from the read's run boundary."""
    combos = [
        (row, glen, off, clipped)
        for row in ("ref", "founder", "both")
        for glen in (1, 2)
        for off in (-2, -1, 0, 1, 2, 3, 4)
        for clipped in (False, True)
    ]
    n_cols = REGION * (len(combos) + 2)
    base = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n_cols)
    founder = base.copy()
    ref = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n_cols)
    cases = []
    for k, (row, glen, off, clipped) in enumerate(combos):
        start_col = REGION * (k + 1)
        # the read starts 8 founder units into the region; with no gaps
        # yet in the region, founder unit u sits at column start_col + u.
        read_unit0 = 8
        # the I+D run boundary sits 3 units into the read (after the 3=);
        # place the gap run at that unit's column + off
        gap_col = start_col + read_unit0 + 3 + off
        if row in ("ref", "both"):
            ref[gap_col:gap_col + glen] = ord("-")
        if row in ("founder", "both"):
            # keep the founder gap from overlapping the ref gap so both
            # boundaries stay distinct events (offset by one column)
            fc = gap_col + (glen + 1 if row == "both" else 0)
            founder[fc:fc + glen] = ord("-")
        cases.append((start_col, read_unit0, clipped))
    return founder, ref, cases


def _reads_for_cases(founder_aligned, cases, rng):
    """SAM lines: each case's read is built from the founder's ungapped
    sequence so the CIGAR is valid regardless of the region's gaps."""
    f_ungapped = founder_aligned[founder_aligned != ord("-")]
    # founder unit index of each aligned column's unit (for locating the
    # read start unit of a region that may contain founder gaps)
    is_unit = founder_aligned != ord("-")
    unit_of_col = np.cumsum(is_unit) - 1
    lines = []
    for i, (start_col, read_unit0, clipped) in enumerate(cases):
        u0 = int(unit_of_col[start_col]) + read_unit0
        m1, ni, nd, m2 = 3, 2, 2, 12
        seq = (
            f_ungapped[u0:u0 + m1].tobytes()
            + bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), ni))
            + f_ungapped[u0 + m1 + nd:u0 + m1 + nd + m2].tobytes()
        )
        cigar = f"{m1}={ni}I{nd}D{m2}="
        if clipped:
            clip = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), 2))
            seq = clip + seq + clip
            cigar = f"2S{cigar}2S"
        qual = "".join(
            chr(33 + int(x)) for x in rng.integers(5, 42, len(seq))
        )
        lines.append(
            f"c{i}\t0\ttest/1\t{u0 + 1}\t60\t{cigar}\t*\t0\t0\t"
            f"{seq.decode()}\t{qual}"
        )
    return lines


@pytest.fixture(scope="module")
def boundary_setup(tmp_path_factory):
    from panvc3_tpu.bitvec import GapBitVector
    from panvc3_tpu.msa_index import ChrEntry, MsaIndex, SequenceEntry

    tmp = tmp_path_factory.mktemp("fused_boundary")
    rng = np.random.default_rng(20260820)
    founder_aligned, ref_aligned, cases = _build_case_msa(rng)

    index = MsaIndex()
    ce = ChrEntry("test")
    ce.sequence_entries = sorted(
        [
            SequenceEntry(
                "REF", GapBitVector.from_gap_string(ref_aligned.tobytes())
            ),
            SequenceEntry(
                "1", GapBitVector.from_gap_string(founder_aligned.tobytes())
            ),
        ],
        key=lambda e: e.seq_id,
    )
    index.chr_entries.append(ce)
    index.sort()
    index_path = tmp / "msa.npz"
    index.save(str(index_path))
    ref_path = tmp / "ref.fa"
    ref_path.write_bytes(
        b">test\n" + ref_aligned.tobytes().replace(b"-", b"") + b"\n"
    )

    f_len = int((founder_aligned != ord("-")).sum())
    lines = ["@HD\tVN:1.6", f"@SQ\tSN:test/1\tLN:{f_len}"]
    lines += _reads_for_cases(founder_aligned, cases, rng)
    sam = ("\n".join(lines) + "\n").encode()
    return index_path, ref_path, sam, len(cases)


@pytest.mark.parametrize("use_quality", [False, True])
def test_fused_v4_boundary_enumeration(boundary_setup, monkeypatch, use_quality):
    import panvc3_tpu.ops.engine as eng

    index_path, ref_path, sam, n_cases = boundary_setup
    # engage the device DP (toy MSA-expanded runs exceed the production
    # run pad) and forbid every fallback for the fused run
    monkeypatch.setattr(eng.BatchProjector, "FUSED_RUN_PAD", 64)
    calls = {"gap": 0, "host_realign": 0}
    orig_fg = eng.BatchProjector._dispatch_fused_gap
    orig_rs = eng.BatchProjector._realign_and_splice

    def spy_fg(self, *a, **kw):
        calls["gap"] += 1
        return orig_fg(self, *a, **kw)

    def spy_rs(self, *a, **kw):
        calls["host_realign"] += 1
        return orig_rs(self, *a, **kw)

    outs = {}
    for engine, fused in (("host", False), ("device", True)):
        if fused:
            monkeypatch.setattr(
                eng.BatchProjector, "_dispatch_fused_gap", spy_fg
            )
            monkeypatch.setattr(
                eng.BatchProjector, "_realign_and_splice", spy_rs
            )
        cfg = ProjectConfig(
            msa_index_path=str(index_path),
            reference_path=str(ref_path),
            reference_msa_id="REF",
            ref_id_separator="/",
            engine=engine,
            device_batch_size=32,  # several batches; window boundaries move
            fused_kernel=fused,
            use_read_base_qualities=use_quality,
        )
        out = io.BytesIO()
        stats = run_project_alignments(io.BytesIO(sam), out, cfg)
        assert stats.matched_reads == n_cases
        # a few configurations legitimately lose their run (the 2D
        # projects entirely into a REF gap and vanishes); the bulk must
        # still realign, and both engines must agree on the count
        assert stats.realigned_range_count >= int(0.9 * n_cases)
        outs[engine] = (stats.realigned_range_count, out.getvalue())
    assert calls["gap"] == 0, "event-overflow redispatch fired: v4 not tested"
    assert calls["host_realign"] == 0, "host realign fallback fired"
    assert outs["host"] == outs["device"]
