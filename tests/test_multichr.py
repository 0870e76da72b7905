"""Multi-chromosome projection through the device engine.

All other engine tests use the single-chromosome toy MSA; this one builds a
two-chromosome index with different founder sets and verifies that the
batched engine routes per-record sequence ids and reference offsets
correctly (byte-identical to the host oracle)."""

import io

import numpy as np
import pytest

from panvc3_tpu.bitvec import GapBitVector
from panvc3_tpu.io.sam import SamReader
from panvc3_tpu.msa_index import ChrEntry, MsaIndex, SequenceEntry
from panvc3_tpu.pipeline.project_alignments import (
    ProjectConfig,
    run_project_alignments,
)


def _random_chr(rng, n_cols, n_founders):
    base = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n_cols)
    rows = {}
    ref = base.copy()
    ref_gaps = rng.random(n_cols) < 0.05
    ref[ref_gaps] = ord("-")
    rows["REF"] = ref.tobytes()
    for k in range(n_founders):
        f = base.copy()
        # substitutions
        subs = rng.random(n_cols) < 0.03
        f[subs] = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), int(subs.sum()))
        gaps = rng.random(n_cols) < 0.05
        f[gaps] = ord("-")
        rows[str(k + 1)] = f.tobytes()
    return rows


@pytest.fixture(scope="module")
def two_chr_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multichr")
    rng = np.random.default_rng(11)
    chrs = {"chrA": _random_chr(rng, 3000, 2), "chrB": _random_chr(rng, 5000, 3)}

    index = MsaIndex()
    for chr_id, rows in chrs.items():
        ce = ChrEntry(chr_id)
        for seq_id, aligned in rows.items():
            ce.sequence_entries.append(
                SequenceEntry(seq_id, GapBitVector.from_gap_string(aligned))
            )
        index.chr_entries.append(ce)
    index.sort()
    index_path = tmp / "idx.npz"
    index.save(str(index_path))

    fasta_path = tmp / "ref.fa"
    with open(fasta_path, "wb") as fh:
        for chr_id, rows in chrs.items():
            fh.write(f">{chr_id}\n".encode())
            fh.write(rows["REF"].replace(b"-", b"") + b"\n")
    return index_path, fasta_path, chrs


def test_multichr_device_matches_host(two_chr_setup):
    index_path, fasta_path, chrs = two_chr_setup
    rng = np.random.default_rng(5)

    lines = ["@HD\tVN:1.6"]
    stripped = {}
    for chr_id, rows in chrs.items():
        for seq_id, aligned in rows.items():
            name = f"{chr_id}/{seq_id}"
            stripped[name] = aligned.replace(b"-", b"")
            lines.append(f"@SQ\tSN:{name}\tLN:{len(stripped[name])}")
    names = [n for n in stripped if not n.endswith("/REF")]
    for i in range(150):
        name = names[int(rng.integers(len(names)))]
        s = stripped[name]
        read_len = 60
        pos = int(rng.integers(0, len(s) - read_len - 10))
        kind = i % 2
        if kind == 0:
            seq = s[pos:pos + read_len]
            cigar = f"{read_len}="
        else:
            ins = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), 3).tobytes()
            seq = s[pos:pos + 30] + ins + s[pos + 32:pos + 32 + (read_len - 33)]
            cigar = f"30=3I2D{read_len - 33}="
        lines.append(
            f"mc{i}\t0\t{name}\t{pos + 1}\t60\t{cigar}\t*\t0\t0\t{seq.decode()}\t{'I' * len(seq)}"
        )
    sam = ("\n".join(lines) + "\n").encode()

    outs = {}
    for engine in ("host", "device"):
        cfg = ProjectConfig(
            msa_index_path=str(index_path),
            reference_path=str(fasta_path),
            reference_msa_id="REF",
            ref_id_separator="/",
            engine=engine,
            device_batch_size=64,
        )
        out = io.BytesIO()
        stats = run_project_alignments(io.BytesIO(sam), out, cfg)
        assert stats.matched_reads == 150
        outs[engine] = out.getvalue()

    assert outs["host"] == outs["device"]
    out0 = io.BytesIO(outs["host"])
    rd = SamReader(out0)
    assert rd.header.ref_names == ["chrA", "chrB"]
    recs = list(rd)
    assert {rd.header.ref_names[r.ref_id] for r in recs} == {"chrA", "chrB"}


def test_chr_sharded_index_projection(two_chr_setup):
    """Each shard loads only its chromosomes' bitvectors and projects its
    pre-routed records identically to a whole-index run (the multi-host
    memory-scaling path; see parallel.distributed.split_chromosomes)."""
    from panvc3_tpu.parallel.distributed import split_chromosomes

    index_path, fasta_path, chrs = two_chr_setup
    rng = np.random.default_rng(9)

    assert MsaIndex.chromosome_ids(str(index_path)) == ["chrA", "chrB"]
    assert split_chromosomes(["chrA", "chrB"], 2) == [["chrA"], ["chrB"]]

    stripped = {}
    for chr_id, rows in chrs.items():
        for seq_id, aligned in rows.items():
            stripped[f"{chr_id}/{seq_id}"] = aligned.replace(b"-", b"")

    def make_sam(chr_filter=None):
        lines = ["@HD\tVN:1.6"]
        for name, s in stripped.items():
            if chr_filter and not name.startswith(chr_filter + "/"):
                continue
            lines.append(f"@SQ\tSN:{name}\tLN:{len(s)}")
        names = [
            n for n in stripped
            if not n.endswith("/REF")
            and (not chr_filter or n.startswith(chr_filter + "/"))
        ]
        body = []
        for i in range(80):
            name = names[i % len(names)]
            s = stripped[name]
            pos = int(rng.integers(0, len(s) - 70))
            body.append(
                f"sc{name.replace('/', '_')}_{i}\t0\t{name}\t{pos + 1}\t60\t60=\t"
                f"*\t0\t0\t{s[pos:pos + 60].decode()}\t{'I' * 60}"
            )
        return ("\n".join(lines + body) + "\n").encode()

    def project(sam, shard):
        cfg = ProjectConfig(
            msa_index_path=str(index_path),
            reference_path=str(fasta_path),
            reference_msa_id="REF",
            ref_id_separator="/",
            engine="device",
            device_batch_size=32,
            chr_shard=shard,
        )
        out = io.BytesIO()
        run_project_alignments(io.BytesIO(sam), out, cfg)
        return [
            line for line in out.getvalue().decode().splitlines()
            if not line.startswith("@")
        ]

    rng = np.random.default_rng(9)
    full_a = project(make_sam("chrA"), None)
    rng = np.random.default_rng(9)
    shard_a = project(make_sam("chrA"), (0, 2))
    assert shard_a == full_a

    rng = np.random.default_rng(9)
    sam_b = make_sam("chrB")
    shard_b = project(sam_b, (1, 2))
    rng = np.random.default_rng(9)
    full_b = project(make_sam("chrB"), None)
    assert shard_b == full_b

    # a shard given the wrong chromosome's records fails loudly
    with pytest.raises((ValueError, KeyError)):
        project(sam_b, (0, 2))


def test_process_headers_missing_target_founder_row_gives_ln0():
    """A chromosome whose projection-target founder row (chr/REF) is absent
    from the input header must get LN:0 — the reference default-constructs
    output ref_id_info and only overwrites entries whose target row was
    seen (project_alignments.cc:1229-1240), so sharded/subset inputs yield
    a zero length there too."""
    from panvc3_tpu.io.sam import SamHeader
    from panvc3_tpu.pipeline.project_alignments import process_headers

    h = SamHeader()
    h.ref_names = ["a/REF", "a/f1", "b/f1", "b/f2"]
    h.ref_lengths = [1000, 1002, 2002, 2003]
    h.lines = ["@HD\tVN:1.6"]
    out, mapping = process_headers(h, "/", "REF", None)
    assert out.ref_names == ["a", "b"]
    assert out.ref_lengths == [1000, 0]
    assert mapping == [0, 0, 1, 1]
    assert "@SQ\tSN:b\tLN:0" in out.lines

def test_process_headers_copies_target_sq_extras():
    """Extra @SQ fields (M5/UR/AS...) of the projection-target founder row
    ride along to the output chromosome's @SQ line: the reference copies
    the whole seqan3 ref_id_info tuple, which holds LN plus the residual
    fields (project_alignments.cc:1237-1241).  Non-target founder rows'
    extras are ignored."""
    from panvc3_tpu.io.sam import SamHeader
    from panvc3_tpu.pipeline.project_alignments import process_headers

    h = SamHeader.parse(
        "@HD\tVN:1.6\n"
        "@SQ\tSN:a/REF\tLN:1000\tM5:abc123\tUR:file:///g.fa\n"
        "@SQ\tSN:a/f1\tLN:1002\tM5:zzz999\n"
        "@SQ\tSN:b/f1\tLN:2002\n"
    )
    out, mapping = process_headers(h, "/", "REF", None)
    assert out.ref_names == ["a", "b"]
    assert "@SQ\tSN:a\tLN:1000\tM5:abc123\tUR:file:///g.fa" in out.lines
    # founder row extras (a/f1) do not leak; missing-target chromosome is bare
    assert "@SQ\tSN:b\tLN:0" in out.lines
    assert mapping == [0, 0, 1]


def test_reference_order_input(two_chr_setup, tmp_path, capsys):
    """--reference-order-input reorders the output reference set
    (process_headers, project_alignments.cc:1104-1150): listed identifiers
    first in file order, unlisted ones appended with a warning; unknown and
    duplicate identifiers warn and are skipped."""
    index_path, fasta_path, chrs = two_chr_setup

    lines = ["@HD\tVN:1.6"]
    stripped = {}
    for chr_id, rows in chrs.items():
        for seq_id, aligned in rows.items():
            name = f"{chr_id}/{seq_id}"
            stripped[name] = aligned.replace(b"-", b"")
            lines.append(f"@SQ\tSN:{name}\tLN:{len(stripped[name])}")
    s = stripped["chrB/1"]
    lines.append(
        f"r0\t0\tchrB/1\t11\t60\t40=\t*\t0\t0\t{s[10:50].decode()}\t{'I' * 40}"
    )
    s2 = stripped["chrA/1"]
    lines.append(
        f"r1\t0\tchrA/1\t11\t60\t40=\t*\t0\t0\t{s2[10:50].decode()}\t{'I' * 40}"
    )
    sam = ("\n".join(lines) + "\n").encode()

    order_path = tmp_path / "order.txt"
    order_path.write_text("chrB\nnosuchchr\nchrB\n")

    outs = {}
    for engine in ("host", "device"):
        cfg = ProjectConfig(
            msa_index_path=str(index_path),
            reference_path=str(fasta_path),
            reference_msa_id="REF",
            ref_id_separator="/",
            engine=engine,
            reference_order_path=str(order_path),
        )
        out = io.BytesIO()
        stats = run_project_alignments(io.BytesIO(sam), out, cfg)
        assert stats.matched_reads == 2
        outs[engine] = out.getvalue()
    assert outs["host"] == outs["device"]

    err = capsys.readouterr().err
    assert "'nosuchchr' specified in reference name order but does not appear" in err
    assert "'chrB' specified in reference name order more than once" in err
    assert "'chrA' not found in the output order, placing in the end" in err

    rd = SamReader(io.BytesIO(outs["host"]))
    # chrB listed first; chrA appended after the ordered set
    assert rd.header.ref_names == ["chrB", "chrA"]
    recs = list(rd)
    assert [rd.header.ref_names[r.ref_id] for r in recs] == ["chrB", "chrA"]
