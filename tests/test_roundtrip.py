"""Round-trip integration test on the bundled real reads.

workflows/test-workflow/data/reads/alignment.bam (vendored reference data) holds the 2000
Mason-simulated alignments against the original genome.  We project each
record from REF coordinates into a founder's coordinates (using REF as the
source row and the founder as destination — the same machinery in the
opposite direction), then run the full projection pipeline founder->REF and
check the round trip: positions must match exactly and CIGARs must be
consistent up to indel-run reordering and realignment."""

import io
import pathlib

import numpy as np
import pytest

from panvc3_tpu.cigar import cigar_query_length, cigar_ref_length, format_cigar
from panvc3_tpu.io.sam import SamReader
from panvc3_tpu.msa_index import MsaIndex
from panvc3_tpu.pipeline.project_alignments import (
    ProjectConfig,
    run_project_alignments,
)
from panvc3_tpu.projector import project_alignment

from .test_workflow_data import WORKFLOW, founder_seqs, msa_files  # fixtures



@pytest.mark.parametrize("engine", ["host", "device"])
def test_roundtrip_real_reads(msa_files, founder_seqs, engine, tmp_path):
    index_path, _, _ = msa_files
    index = MsaIndex.load(str(index_path))
    chrom = index.find_chr("test")
    ref_entry = chrom.find("REF")
    founder_ids = ["1", "2", "3", "4"]
    founders_gapless = {
        sid: founder_seqs[sid].replace(b"-", b"") for sid in founder_ids
    }

    reader = SamReader(str(WORKFLOW / "reads/alignment.bam"))
    records = [r for r in reader if not r.is_unmapped and r.seq != "*"]
    # the Mason ground-truth BAM marks many reads unmapped; 766 are usable
    assert len(records) == 766

    # 1. project REF-space records into founder space (REF -> founder)
    rng = np.random.default_rng(0)
    lines = ["@HD\tVN:1.6"]
    for sid in founder_ids:
        lines.append(f"@SQ\tSN:test/{sid}\tLN:{len(founders_gapless[sid])}")
    originals = {}
    n_skipped = 0
    for i, rec in enumerate(records):
        sid = founder_ids[int(rng.integers(len(founder_ids)))]
        fe = chrom.find(sid)
        res = project_alignment(
            rec.pos,
            ref_entry,
            fe,
            founders_gapless[sid],
            rec.seq,
            rec.cigar,
            None,
            0,
            -1,
        )
        # skip reads that fall off the founder's end after projection
        if res.dst_pos + cigar_ref_length(res.cigar) > len(founders_gapless[sid]):
            n_skipped += 1
            continue
        qname = f"rt{i}"
        originals[qname] = rec
        lines.append(
            f"{qname}\t{rec.flag & 0x10}\ttest/{sid}\t{res.dst_pos + 1}\t60\t"
            f"{format_cigar(res.cigar)}\t*\t0\t0\t{rec.seq}\t{'I' * len(rec.seq)}"
        )
    assert len(originals) > 700
    sam = ("\n".join(lines) + "\n").encode()

    # 2. project back founder -> REF through the full pipeline
    cfg = ProjectConfig(
        msa_index_path=str(index_path),
        reference_path=str(WORKFLOW / "genome/genome.fa.gz"),
        reference_msa_id="REF",
        ref_id_separator="/",
        engine=engine,
    )
    out = io.BytesIO()
    stats = run_project_alignments(io.BytesIO(sam), out, cfg)
    assert stats.matched_reads == len(originals)

    out.seek(0)
    n_pos_exact = 0
    for back in SamReader(out):
        orig = originals[back.qname]
        # spans must be preserved exactly
        assert cigar_query_length(back.cigar) == len(orig.seq), back.qname
        if back.pos == orig.pos:
            n_pos_exact += 1
        else:
            # reads whose first aligned base lies in an indel-polymorphic
            # column shift by at most the local indel length
            assert abs(back.pos - orig.pos) <= 50, back.qname
        # soft-clip structure preserved
        orig_clips = [c for c in orig.cigar if c[1] == "S"]
        back_clips = [c for c in back.cigar if c[1] == "S"]
        assert orig_clips == back_clips, back.qname
    # positions must round-trip exactly for the overwhelming majority
    # (boundary reads whose first aligned base sits inside a founder
    # deletion legitimately shift)
    assert n_pos_exact >= len(originals) * 0.90
