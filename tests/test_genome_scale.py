"""Genome-scale shakedown: a multi-Mbp chromosome through the full tool.

The reference's whole reason for rrr_vector compression is genome-length
gap vectors (msa_index.hh:43-54); this test builds a 4 Mbp-aligned-column
MSA (REF + 3 founders, ~1% gaps), round-trips it through the npz index
serialisation, and runs the projection tool end to end — fast lane
(device engine + adaptive host DP) against the scalar host engine,
asserting byte-identical output at scale.
"""

from __future__ import annotations

import io

import numpy as np
import pytest

from panvc3_tpu.bitvec import GapBitVector
from panvc3_tpu.msa_index import ChrEntry, MsaIndex, SequenceEntry
from panvc3_tpu.pipeline.project_alignments import (
    ProjectConfig,
    TagSpec,
    run_project_alignments,
)

N_COLS = 4_000_000
GAP_FRAC = 0.01


@pytest.fixture(scope="module")
def genome_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("genome")
    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    consensus = rng.choice(bases, N_COLS)

    seqs = {}
    for sid in ("REF", "f1", "f2", "f3"):
        s = consensus.copy()
        # per-sequence substitutions + gaps
        sub = rng.random(N_COLS) < 0.002
        s[sub] = rng.choice(bases, int(sub.sum()))
        gaps = rng.random(N_COLS) < GAP_FRAC
        s[gaps] = ord("-")
        seqs[sid] = s.tobytes()

    index = MsaIndex()
    ce = ChrEntry("big")
    ce.sequence_entries = [
        SequenceEntry(sid, GapBitVector.from_gap_string(seq))
        for sid, seq in sorted(seqs.items())
    ]
    index.chr_entries.append(ce)
    index.sort()
    index_path = tmp / "big-index.npz"
    index.save(str(index_path))

    ref_unaligned = seqs["REF"].replace(b"-", b"")
    ref_path = tmp / "big-ref.fa"
    ref_path.write_bytes(b">big\n" + ref_unaligned + b"\n")

    founders = {
        sid: seqs[sid].replace(b"-", b"") for sid in ("f1", "f2", "f3")
    }
    return index_path, ref_path, founders


def _synth_sam(founders, n_reads=1500, read_len=100, seed=7) -> bytes:
    rng = np.random.default_rng(seed)
    sids = sorted(founders)
    lines = ["@HD\tVN:1.6"]
    for sid in sids:
        lines.append(f"@SQ\tSN:big/{sid}\tLN:{len(founders[sid])}")
    for i in range(n_reads):
        sid = sids[int(rng.integers(len(sids)))]
        s = founders[sid]
        pos = int(rng.integers(0, len(s) - read_len - 16))
        kind = i % 3
        if kind == 0:
            cigar = f"{read_len}="
            seq = s[pos:pos + read_len]
        elif kind == 1:
            k = int(rng.integers(1, 6))
            half = read_len // 2
            seq = s[pos:pos + half] + s[pos + half + k:pos + half + k + read_len - half]
            cigar = f"{half}={k}D{read_len - half}="
        else:
            k = int(rng.integers(1, 6))
            j = int(rng.integers(1, 6))
            half = read_len // 2
            ins = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), k).tobytes()
            seq = (
                s[pos:pos + half] + ins
                + s[pos + half + j:pos + half + j + read_len - half - k]
            )
            cigar = f"{half}={k}I{j}D{read_len - half - k}="
        lines.append(
            f"r{i}\t0\tbig/{sid}\t{pos + 1}\t60\t{cigar}\t*\t0\t0\t"
            f"{seq.decode()}\t{'I' * len(seq)}"
        )
    return ("\n".join(lines) + "\n").encode()


def test_genome_scale_device_matches_host(genome_setup):
    index_path, ref_path, founders = genome_setup
    sam = _synth_sam(founders)

    outs = {}
    for engine, fastlane in (("device", True), ("host", False)):
        cfg = ProjectConfig(
            msa_index_path=str(index_path),
            reference_path=str(ref_path),
            reference_msa_id="REF",
            ref_id_separator="/",
            tags=TagSpec(rec_idx="XI"),
            engine=engine,
            fastlane=fastlane,
            device_batch_size=512,
        )
        out = io.BytesIO()
        stats = run_project_alignments(io.BytesIO(sam), out, cfg)
        outs[engine] = (out.getvalue(), stats)

    dev, dev_stats = outs["device"]
    host, host_stats = outs["host"]
    assert dev == host
    assert dev_stats.matched_reads == host_stats.matched_reads == 1500
    assert dev_stats.realigned_range_count == host_stats.realigned_range_count
    assert dev_stats.realigned_range_count > 0


def test_genome_scale_index_roundtrip(genome_setup):
    index_path, _, founders = genome_setup
    index = MsaIndex.load(str(index_path))
    ce = index.chr_entries[0]
    assert [e.seq_id for e in ce.sequence_entries] == ["REF", "f1", "f2", "f3"]
    # coordinate maps survive serialisation at scale: spot-project positions
    rng = np.random.default_rng(1)
    src = next(e for e in ce.sequence_entries if e.seq_id == "f1")
    dst = next(e for e in ce.sequence_entries if e.seq_id == "REF")
    pos = rng.integers(0, src.unaligned_length - 1, 200).astype(np.int64)
    projected = src.project_position(pos, dst)
    assert (np.diff(projected[np.argsort(pos)]) >= 0).all()
    assert projected.min() >= 0
    assert projected.max() < dst.unaligned_length
