import io
import pathlib

import pytest

from panvc3_tpu.io.bgzf import BgzfReader, BgzfWriter, read_all
from panvc3_tpu.io.fasta import FastaReader, write_fasta
from panvc3_tpu.io.sam import (
    SamHeader,
    SamReader,
    SamRecord,
    SamWriter,
    format_sam_record,
    parse_sam_record,
)

REF_WORKFLOW = pathlib.Path(__file__).resolve().parent.parent / "workflows/test-workflow/data"


def test_bgzf_roundtrip(tmp_path):
    data = bytes(range(256)) * 1000
    p = tmp_path / "x.bgz"
    with open(p, "wb") as fh:
        w = BgzfWriter(fh)
        for i in range(0, len(data), 7777):
            w.write(data[i:i + 7777])
        w.close()
    assert read_all(str(p)) == data
    rd = BgzfReader(str(p))
    assert rd.read_range(0, 10) == data[:10]
    assert rd.read_range(65000, 1000) == data[65000:66000]
    assert rd.read_range(len(data) - 5, 100) == data[-5:]


def test_bgzf_native_python_cross_compat(tmp_path, monkeypatch):
    """Files written by the parallel C codec must read back through the
    pure-Python block loop and vice versa (same 65280-byte framing)."""
    import numpy as np

    from panvc3_tpu.io import bgzf as bgzf_mod
    from panvc3_tpu.native import get_native

    if get_native() is None or not hasattr(get_native(), "bgzf_compress"):
        pytest.skip("native extension not built")
    rng = np.random.default_rng(5)
    # compressible + incompressible segments, > one 4 MiB flush batch
    data = (
        bytes(rng.integers(0, 256, 3 << 20, dtype=np.uint8))
        + b"ACGT" * (1 << 20)
        + bytes(rng.integers(0, 4, 1 << 20, dtype=np.uint8))
    )

    p_nat = tmp_path / "nat.bgz"
    with open(p_nat, "wb") as fh:
        w = BgzfWriter(fh)
        assert w._nat is not None
        for i in range(0, len(data), 100003):
            w.write(data[i:i + 100003])
        w.close()

    p_py = tmp_path / "py.bgz"
    monkeypatch.setattr(bgzf_mod, "_native_bgzf", lambda: None)
    with open(p_py, "wb") as fh:
        w = BgzfWriter(fh)
        assert w._nat is None
        for i in range(0, len(data), 100003):
            w.write(data[i:i + 100003])
        w.close()
    # python reader on the native file
    assert read_all(str(p_nat)) == data
    rd = BgzfReader(str(p_nat))
    assert rd.read_range(65279, 3) == data[65279:65282]
    monkeypatch.undo()
    # native reader on the python file, and both rebuilt indexes agree
    assert read_all(str(p_py)) == data
    rd_nat = BgzfReader(str(p_nat))
    rd_py = BgzfReader(str(p_py))
    assert rd_nat._blocks == rd_py._blocks  # identical block framing
    for start, ln in [(0, 1), (65280, 65280), (len(data) - 7, 7),
                      (4 << 20, 1 << 20)]:
        assert rd_nat.read_range(start, ln) == data[start:start + ln]


def test_read_bundled_genome():
    fa = FastaReader(str(REF_WORKFLOW / "genome/genome.fa.gz"))
    assert fa.names == ["test"]
    seq = fa.read_sequence("test")
    assert len(seq) == 10000
    assert set(seq) <= set(b"ACGTNacgtn")


def test_plain_fasta(tmp_path):
    p = tmp_path / "x.fa"
    with open(p, "wb") as fh:
        write_fasta(fh, "s1", b"ACGTACGT", line_width=3)
        write_fasta(fh, "s2", b"TTTT")
    fa = FastaReader(str(p))
    assert fa.names == ["s1", "s2"]
    assert fa.read_sequence("s1") == b"ACGTACGT"
    assert fa.read_sequence("s2") == b"TTTT"


def test_read_bundled_bam():
    rd = SamReader(str(REF_WORKFLOW / "reads/alignment.bam"))
    assert rd.header.ref_names == ["test"]
    recs = list(rd)
    assert len(recs) == 2000  # 1000 read pairs
    r = recs[0]
    assert r.qname.startswith("simulated")
    assert r.pos >= 0
    assert r.query_length() == len(r.seq)


def test_bam_roundtrip(tmp_path):
    rd = SamReader(str(REF_WORKFLOW / "reads/alignment.bam"))
    recs = list(rd)
    out = tmp_path / "rt.bam"
    w = SamWriter(str(out), rd.header, bam=True)
    for r in recs:
        w.write(r)
    w.close()
    rd2 = SamReader(str(out))
    recs2 = list(rd2)
    assert len(recs) == len(recs2)
    for a, b in zip(recs, recs2):
        assert format_sam_record(a, rd.header) == format_sam_record(b, rd2.header)


def test_sam_text_roundtrip():
    hdr = SamHeader.parse("@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000\n@SQ\tSN:chr2\tLN:500")
    assert hdr.ref_names == ["chr1", "chr2"]
    line = "r1\t99\tchr1\t100\t60\t5M2I3M\t=\t200\t108\tACGTACGTAC\tIIIIIIIIII\tAS:i:-4\tNM:i:2\tXS:Z:hello"
    rec = parse_sam_record(line, hdr)
    assert rec.pos == 99
    assert rec.cigar == [(5, "M"), (2, "I"), (3, "M")]
    assert rec.mate_ref_id == 0
    assert rec.tags["NM"] == ("i", 2)
    assert format_sam_record(rec, hdr) == line


def test_sam_tags_sorted_on_output():
    hdr = SamHeader.parse("@SQ\tSN:c\tLN:10")
    rec = SamRecord(qname="q", flag=0, ref_id=0, pos=0, mapq=60, seq="A", qual="I")
    rec.tags["ZZ"] = ("i", 1)
    rec.tags["AS"] = ("i", 2)
    out = format_sam_record(rec, hdr)
    assert out.index("AS:i:2") < out.index("ZZ:i:1")


def test_pg_chain():
    hdr = SamHeader.parse("@HD\tVN:1.6\n@PG\tID:bowtie2\tPN:bowtie2")
    hdr.append_program("panvc3.project-alignments", "project_alignments", "cmd --x", "0.1")
    assert any("PP:bowtie2" in l for l in hdr.lines)
    hdr.append_program("panvc3.project-alignments", "project_alignments", "cmd --y", "0.1")
    ids = [f[3:] for l in hdr.lines if l.startswith("@PG") for f in l.split("\t") if f.startswith("ID:")]
    assert len(ids) == len(set(ids))


def test_sam_reader_from_text_stream():
    text = "@SQ\tSN:c\tLN:10\nq\t0\tc\t1\t60\t3M\t*\t0\t0\tACG\tIII\n"
    rd = SamReader(io.BytesIO(text.encode()))
    recs = list(rd)
    assert len(recs) == 1
    assert recs[0].cigar == [(3, "M")]


def test_sam_gz_autodetect(tmp_path):
    import gzip

    text = "@SQ\tSN:c\tLN:10\nq\t0\tc\t1\t60\t3M\t*\t0\t0\tACG\tIII\n"
    p = tmp_path / "x.sam.gz"
    with gzip.open(p, "wb") as fh:
        fh.write(text.encode())
    rd = SamReader(str(p))
    assert not rd.is_bam
    recs = list(rd)
    assert len(recs) == 1 and recs[0].qname == "q"
