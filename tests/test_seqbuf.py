"""Bounded contig buffer store (reference: sequence_buffer_store.cc:14-72,
rewrite-cigar/main.cc:51-108 MAX_SIZE=4)."""

import io

import numpy as np
import pytest

from panvc3_tpu.bitvec import GapBitVector
from panvc3_tpu.msa_index import ChrEntry, MsaIndex, SequenceEntry
from panvc3_tpu.pipeline.project_alignments import (
    ProjectConfig,
    run_project_alignments,
)
from panvc3_tpu.seqbuf import SequenceBufferStore


def test_store_lru_bound():
    loads = []
    store = SequenceBufferStore(lambda k: loads.append(k) or b"x%d" % k, max_size=3)
    for k in range(6):
        assert store.get(k) == b"x%d" % k
    assert len(store) == 3
    assert store.evictions == 3
    # most-recent three survive
    assert set(store) == {3, 4, 5}
    store.get(4)  # refresh 4
    store.get(6)  # evicts 3 (LRU), not 4
    assert set(store) == {5, 4, 6}


def test_store_require_pins_oversized_batch():
    store = SequenceBufferStore(lambda k: b"c%d" % k, max_size=2)
    snap = store.require(range(5))
    assert len(snap) == 5          # complete snapshot despite max_size=2
    assert len(store) <= 5
    store.require([7])
    assert len(store) <= 2 + 1     # trimmed back between batches


def _many_contig_setup(tmp_path, n_contigs=24):
    """Tiny per-contig MSAs (REF + one founder each) + a multi-contig ref."""
    rng = np.random.default_rng(3)
    index = MsaIndex()
    ref_fa = []
    founders = {}
    for c in range(n_contigs):
        base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 400)
        ref = base.tobytes()
        founder = bytearray(ref)
        founder[100:103] = b"---"          # founder has a deletion vs ref
        ce = ChrEntry(f"chr{c:02d}")
        ce.sequence_entries = [
            SequenceEntry("F", GapBitVector.from_gap_string(bytes(founder))),
            SequenceEntry("REF", GapBitVector.from_gap_string(ref)),
        ]
        index.chr_entries.append(ce)
        founders[f"chr{c:02d}"] = bytes(founder).replace(b"-", b"")
        ref_fa.append(f">chr{c:02d}\n".encode() + ref + b"\n")
    index.sort()
    index_path = tmp_path / "many.npz"
    index.save(str(index_path))
    fa_path = tmp_path / "many.fa"
    fa_path.write_bytes(b"".join(ref_fa))
    return index_path, fa_path, founders


def test_project_alignments_bounded_contigs(tmp_path):
    index_path, fa_path, founders = _many_contig_setup(tmp_path)
    lines = ["@HD\tVN:1.6"]
    for name, s in founders.items():
        lines.append(f"@SQ\tSN:{name}/F\tLN:{len(s)}")
    rng = np.random.default_rng(5)
    for i in range(200):
        name = f"chr{int(rng.integers(24)):02d}"
        s = founders[name]
        pos = int(rng.integers(0, len(s) - 60))
        seq = s[pos:pos + 50].decode()
        lines.append(
            f"r{i}\t0\t{name}/F\t{pos + 1}\t60\t50=\t*\t0\t0\t{seq}\t{'I' * 50}"
        )
    sam = ("\n".join(lines) + "\n").encode()

    outs = {}
    for engine, fastlane in (("host", False), ("device", True), ("device", False)):
        cfg = ProjectConfig(
            msa_index_path=str(index_path),
            reference_path=str(fa_path),
            reference_msa_id="REF",
            ref_id_separator="/",
            engine=engine,
            device_batch_size=16,
            fastlane=fastlane,
        )
        out = io.BytesIO()
        run_project_alignments(io.BytesIO(sam), out, cfg)
        outs[(engine, fastlane)] = out.getvalue()
    assert outs[("host", False)] == outs[("device", True)] == outs[("device", False)]
