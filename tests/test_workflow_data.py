"""End-to-end tests over the vendored toy workflow data
(workflows/test-workflow/data, a verbatim copy of the reference's bundled
/root/reference/test-workflow inputs — see its README): build the MSA index
from the real founder sequences, synthesise founder-aligned reads, project
them, and verify coordinate/CIGAR consistency invariants."""

import io
import pathlib

import numpy as np
import pytest

from panvc3_tpu.cigar import cigar_query_length, cigar_ref_length
from panvc3_tpu.io.fasta import FastaReader
from panvc3_tpu.io.sam import SamHeader, SamReader, SamWriter, parse_sam_record
from panvc3_tpu.msa_index import MsaIndex
from panvc3_tpu.pipeline.index_msa import build_index_from_tsv, list_contents
from panvc3_tpu.pipeline.project_alignments import (
    ProjectConfig,
    TagSpec,
    run_project_alignments,
)

WORKFLOW = pathlib.Path(__file__).resolve().parent.parent / "workflows/test-workflow/data"


@pytest.fixture(scope="module")
def msa_files(tmp_path_factory):
    """Build the index + unaligned FASTA from the bundled founder MSA."""
    tmp = tmp_path_factory.mktemp("msa")
    tsv = tmp / "input.tsv"
    rows = []
    for line in (WORKFLOW / "index-input/input.tsv").read_text().splitlines():
        chr_id, seq_id, rel = line.split("\t")
        rows.append(f"{chr_id}\t{seq_id}\t{WORKFLOW / rel}")
    tsv.write_text("\n".join(rows) + "\n")

    fasta_path = tmp / "unaligned.fa"
    with open(fasta_path, "wb") as fh:
        index = build_index_from_tsv(str(tsv), pipe_command="bzip2 -d -c", fasta_out=fh)
    index_path = tmp / "msa-index.npz"
    index.save(str(index_path))
    return index_path, fasta_path, tmp


def test_index_contents(msa_files):
    index_path, _, _ = msa_files
    index = MsaIndex.load(str(index_path))
    assert [c.chr_id for c in index.chr_entries] == ["test"]
    seqs = index.chr_entries[0].sequence_entries
    assert [e.seq_id for e in seqs] == ["1", "2", "3", "4", "REF"]
    for e in seqs:
        assert e.aligned_length == 12636
    out = io.StringIO()
    list_contents(index, out)
    assert out.getvalue().startswith("test\n\t1\t")


def test_ref_row_matches_genome(msa_files):
    index_path, fasta_path, _ = msa_files
    fa = FastaReader(str(fasta_path))
    ref = fa.read_sequence("test/REF")
    genome = FastaReader(str(WORKFLOW / "genome/genome.fa.gz")).read_sequence("test")
    assert ref == genome


def _apply_cigar(query: str, ref: bytes, pos: int, cigar) -> None:
    """Check that a projected CIGAR is consistent with query and reference."""
    qpos, rpos = 0, pos
    for n, op in cigar:
        if op == "=":
            assert query[qpos:qpos + n].upper() == ref[rpos:rpos + n].decode().upper(), (
                qpos, rpos, n)
            qpos += n
            rpos += n
        elif op == "X":
            for k in range(n):
                assert query[qpos + k].upper() != ref[rpos + k:rpos + k + 1].decode().upper()
            qpos += n
            rpos += n
        elif op in "M":
            qpos += n
            rpos += n
        elif op in "IS":
            qpos += n
        elif op in "DN":
            rpos += n
    assert qpos == len(query)


@pytest.fixture(scope="module")
def founder_seqs():
    import bz2

    seqs = {}
    for line in (WORKFLOW / "index-input/input.tsv").read_text().splitlines():
        chr_id, seq_id, rel = line.split("\t")
        seqs[seq_id] = bz2.open(WORKFLOW / rel, "rb").read()
    return seqs


def _synthesise_sam(founder_seqs, n_reads=200, read_len=100, seed=42) -> str:
    """Reads sampled verbatim from founder sequences, aligned with all-=
    CIGARs against the gap-stripped founders."""
    rng = np.random.default_rng(seed)
    lines = ["@HD\tVN:1.6"]
    stripped = {sid: s.replace(b"-", b"") for sid, s in founder_seqs.items()}
    for sid, s in stripped.items():
        lines.append(f"@SQ\tSN:test/{sid}\tLN:{len(s)}")
    names = list(stripped)
    for i in range(n_reads):
        sid = names[rng.integers(len(names))]
        s = stripped[sid]
        pos = int(rng.integers(0, len(s) - read_len))
        seq = s[pos:pos + read_len].decode()
        lines.append(
            f"read{i}\t0\ttest/{sid}\t{pos + 1}\t60\t{read_len}=\t*\t0\t0\t{seq}\t{'I' * read_len}\tNM:i:0\tXD:i:7"
        )
    return "\n".join(lines) + "\n"


def test_project_synthetic_reads(msa_files, founder_seqs, tmp_path):
    index_path, _, _ = msa_files
    sam_text = _synthesise_sam(founder_seqs)
    out = io.BytesIO()
    cfg = ProjectConfig(
        msa_index_path=str(index_path),
        reference_path=str(WORKFLOW / "genome/genome.fa.gz"),
        reference_msa_id="REF",
        ref_id_separator="/",
        tags=TagSpec(rec_idx="XI"),
        preserve_tags=("XS", "YS"),
    )
    stats = run_project_alignments(io.BytesIO(sam_text.encode()), out, cfg)
    assert stats.matched_reads == 200
    # the XD test tag must have been stripped, NM too (recorded in OA)
    assert stats.removed_tag_counts.get("XD") == 200
    assert stats.removed_tag_counts.get("NM") == 200

    out.seek(0)
    rd = SamReader(out)
    assert rd.header.ref_names == ["test"]
    assert rd.header.ref_lengths == [10000]
    genome = FastaReader(str(WORKFLOW / "genome/genome.fa.gz")).read_sequence("test")

    recs = list(rd)
    assert len(recs) == 200
    for rec in recs:
        assert rec.ref_id == 0
        # projected CIGAR consistent with query and the standard reference
        _apply_cigar(rec.seq, genome, rec.pos, rec.cigar)
        # query length preserved
        assert cigar_query_length(rec.cigar) == len(rec.seq)
        # tags: OA records the original alignment; XR/XP original coords
        assert rec.tags["OA"][1].endswith(";")
        assert rec.tags["XP"][0] == "i"
        assert "XD" not in rec.tags
        assert "XI" in rec.tags

    # reads sampled from REF itself must project to identity
    for rec in recs:
        oa = rec.tags["OA"][1]
        rname, pos0 = oa.split(",")[0], int(oa.split(",")[1])
        if rname == "test/REF":
            assert rec.pos == pos0
            assert rec.cigar == [(100, "=")]


def test_project_with_mates_and_ranges(msa_files, founder_seqs, tmp_path):
    index_path, _, _ = msa_files
    stripped = {sid: s.replace(b"-", b"") for sid, s in founder_seqs.items()}
    s1 = stripped["1"]
    seq = s1[1000:1100].decode()
    seq2 = s1[1200:1300].decode()
    lines = ["@HD\tVN:1.6"]
    for sid, s in stripped.items():
        lines.append(f"@SQ\tSN:test/{sid}\tLN:{len(s)}")
    lines.append(
        f"p1\t99\ttest/1\t1001\t60\t100=\t=\t1201\t300\t{seq}\t{'I'*100}"
    )
    lines.append(
        f"p1\t147\ttest/1\t1201\t60\t100=\t=\t1001\t-300\t{seq2}\t{'I'*100}"
    )
    sam_text = "\n".join(lines) + "\n"

    ranges_path = tmp_path / "realn.tsv"
    out = io.BytesIO()
    cfg = ProjectConfig(
        msa_index_path=str(index_path),
        reference_path=str(WORKFLOW / "genome/genome.fa.gz"),
        reference_msa_id="REF",
        ref_id_separator="/",
        output_realigned_ranges_path=str(ranges_path),
    )
    run_project_alignments(io.BytesIO(sam_text.encode()), out, cfg)
    out.seek(0)
    recs = list(SamReader(out))
    assert len(recs) == 2
    index = MsaIndex.load(str(index_path))
    chrom = index.find_chr("test")
    src = chrom.find("1")
    ref = chrom.find("REF")
    exp_first = int(src.project_position(1000, ref))
    exp_second = int(src.project_position(1200, ref))
    assert recs[0].pos == exp_first
    assert recs[0].mate_pos == exp_second
    assert recs[1].pos == exp_second
    assert recs[1].mate_pos == exp_first
    # YR/YP record original mate coordinates
    assert recs[0].tags["YP"] == ("i", 1200)
    assert recs[0].tags["YR"] == ("i", 1)  # input @SQ order: REF=0, 1=1, …
    assert ranges_path.read_text().startswith("Location\tLength\n")


def test_a2m_index_matches_tsv(msa_files, founder_seqs, tmp_path):
    """Building from A2M must give the same index as the TSV path."""
    from panvc3_tpu.pipeline.index_msa import build_index_from_a2m

    a2m = tmp_path / "input.a2m"
    with open(a2m, "wb") as fh:
        for sid, seq in founder_seqs.items():
            fh.write(f">test/{sid}\n".encode())
            fh.write(seq + b"\n")
    fasta_out = io.BytesIO()
    index = build_index_from_a2m(str(a2m), fasta_out=fasta_out)

    index_path, _, _ = msa_files
    ref_index = MsaIndex.load(str(index_path))
    chrom = index.find_chr("test")
    ref_chrom = ref_index.find_chr("test")
    assert [e.seq_id for e in chrom.sequence_entries] == [
        e.seq_id for e in ref_chrom.sequence_entries
    ]
    for a, b in zip(chrom.sequence_entries, ref_chrom.sequence_entries):
        assert a.aligned_length == b.aligned_length
        assert a.unaligned_length == b.unaligned_length
        import numpy as np

        pos = np.arange(0, a.aligned_length, 7)
        assert np.array_equal(a.gaps.rank0(pos), b.gaps.rank0(pos))
    assert fasta_out.getvalue().startswith(b">test/REF\n")
