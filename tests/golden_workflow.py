"""Deterministic toy-workflow runs whose outputs are committed as goldens.

VERDICT r3 asked for captured end-to-end outputs to diff against (the
reference binaries cannot be built in this image — BASELINE.md), so the
goldens lock in the CURRENT build's behavior over the vendored reference
data (workflows/test-workflow/data): any recurrence/tie-break/formatting
change that alters output bytes fails tests/test_workflow_golden.py
loudly instead of drifting silently.

Two deterministic streams, both pure functions of the vendored data:

* ``match`` — 500 all-``=`` reads sampled from the founders (the
  test-workflow's shape: project -> qname-sort -> recalculate_mapq);
* ``indel`` — 400 reads carrying insertions/deletions adjacent to MSA
  gaps with randomized qualities, projected twice (integer path and
  ``-q``), exercising the realignment DP + Malde scoring end to end.

Regenerate (intentionally, after a semantics-change decision) with::

    python -m tests.golden_workflow --write

@PG header lines are stripped before comparison: they carry the version
string and command line, which may change without output semantics
changing.
"""

from __future__ import annotations

import gzip
import io
import pathlib

import numpy as np

DATA = pathlib.Path(__file__).resolve().parent.parent / "workflows/test-workflow/data"
GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "data"

GOLDENS = {
    "match_projected": "golden_match_projected.sam.gz",
    "match_mapq": "golden_match_mapq.sam.gz",
    "indel_projected": "golden_indel_projected.sam.gz",
    "indel_projected_q": "golden_indel_projected_q.sam.gz",
}


def _founders() -> dict[str, bytes]:
    import bz2

    seqs = {}
    for line in (DATA / "index-input/input.tsv").read_text().splitlines():
        chr_id, seq_id, rel = line.split("\t")
        seqs[seq_id] = bz2.open(DATA / rel, "rb").read()
    return seqs


def _build_index(tmp: pathlib.Path) -> pathlib.Path:
    from panvc3_tpu.pipeline.index_msa import build_index_from_tsv

    tsv = tmp / "input.tsv"
    rows = []
    for line in (DATA / "index-input/input.tsv").read_text().splitlines():
        chr_id, seq_id, rel = line.split("\t")
        rows.append(f"{chr_id}\t{seq_id}\t{DATA / rel}")
    tsv.write_text("\n".join(rows) + "\n")
    index = build_index_from_tsv(str(tsv), pipe_command="bzip2 -d -c")
    index_path = tmp / "msa-index.npz"
    index.save(str(index_path))
    return index_path


def _match_sam(founders: dict[str, bytes]) -> bytes:
    from .test_workflow_data import _synthesise_sam

    return _synthesise_sam(founders, n_reads=500, seed=42).encode()


def _indel_sam(founders: dict[str, bytes]) -> bytes:
    """Reads with I/D runs against the founders + randomized qualities.

    CIGAR shape 30=kI m= kD rest= keeps query length == read length, so the
    read bytes can be sampled from the founder with the insertion spliced
    in; deletions skip founder bases.  Every read triggers indel-run
    realignment when projected (indel adjacent to founder/REF MSA gaps for
    many sampled positions)."""
    rng = np.random.default_rng(7)
    stripped = {sid: s.replace(b"-", b"") for sid, s in founders.items()}
    lines = ["@HD\tVN:1.6"]
    for sid, s in stripped.items():
        lines.append(f"@SQ\tSN:test/{sid}\tLN:{len(s)}")
    names = [s for s in stripped if s != "REF"]
    read_len = 100
    for i in range(400):
        sid = names[int(rng.integers(len(names)))]
        s = stripped[sid]
        k = int(rng.integers(1, 9))
        pos = int(rng.integers(0, len(s) - read_len - 2 * k - 1))
        lead = 30
        mid = int(rng.integers(5, 40))
        tail = read_len - lead - k - mid
        seq = (
            s[pos:pos + lead]
            + rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), k).tobytes()
            + s[pos + lead:pos + lead + mid]
            # deletion: skip k founder bases
            + s[pos + lead + mid + k:pos + lead + mid + k + tail]
        )
        cigar = f"{lead}={k}I{mid}={k}D{tail}="
        qual = "".join(chr(33 + int(x)) for x in rng.integers(2, 42, read_len))
        lines.append(
            f"ind{i}\t0\ttest/{sid}\t{pos + 1}\t60\t{cigar}\t*\t0\t0\t"
            f"{seq.decode()}\t{qual}"
        )
    return ("\n".join(lines) + "\n").encode()


def _strip_pg(sam: bytes) -> bytes:
    return b"\n".join(
        l for l in sam.split(b"\n") if not l.startswith(b"@PG")
    )


def run_all(tmp: pathlib.Path) -> dict[str, bytes]:
    """{stream: output bytes (PG-stripped)} for all four golden streams."""
    from panvc3_tpu.io.sam import SamReader, SamWriter
    from panvc3_tpu.pipeline.project_alignments import (
        ProjectConfig,
        TagSpec,
        run_project_alignments,
    )
    from panvc3_tpu.pipeline.recalculate_mapq import run_recalculate_mapq

    index_path = _build_index(tmp)
    founders = _founders()

    def project(sam: bytes, use_q: bool) -> bytes:
        cfg = ProjectConfig(
            msa_index_path=str(index_path),
            reference_path=str(DATA / "genome/genome.fa.gz"),
            reference_msa_id="REF",
            ref_id_separator="/",
            tags=TagSpec(rec_idx="XI"),
            preserve_tags=("XS", "YS"),
            use_read_base_qualities=use_q,
            status_output_interval=0,
        )
        out = io.BytesIO()
        run_project_alignments(io.BytesIO(sam), out, cfg)
        return out.getvalue()

    outputs = {}
    match_projected = project(_match_sam(founders), False)
    outputs["match_projected"] = _strip_pg(match_projected)

    # qname-sort (samtools sort -n stand-in), then recalculate_mapq — the
    # test-workflow's terminal artifact (Snakefile rule recalculate_mapq)
    rd = SamReader(io.BytesIO(match_projected))
    recs = sorted(rd, key=lambda r: r.qname)
    qs = io.BytesIO()
    w = SamWriter(qs, rd.header)
    for r in recs:
        w.write(r)
    w.close()
    mq = io.BytesIO()
    run_recalculate_mapq(
        io.BytesIO(qs.getvalue()), mq, status_output_interval=0
    )
    outputs["match_mapq"] = _strip_pg(mq.getvalue())

    indel = _indel_sam(founders)
    outputs["indel_projected"] = _strip_pg(project(indel, False))
    outputs["indel_projected_q"] = _strip_pg(project(indel, True))
    return outputs


def main() -> None:
    import argparse
    import tempfile

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--write", action="store_true", help="regenerate goldens")
    args = p.parse_args()
    with tempfile.TemporaryDirectory() as tmp:
        outputs = run_all(pathlib.Path(tmp))
    for stream, data in outputs.items():
        path = GOLDEN_DIR / GOLDENS[stream]
        if args.write:
            # mtime=0 + fixed name: byte-stable archives across regens
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", filename="", mtime=0) as gz:
                gz.write(data)
            path.write_bytes(buf.getvalue())
            print(f"wrote {path} ({len(data)} bytes uncompressed)")
        else:
            golden = gzip.decompress(path.read_bytes())
            status = "OK" if golden == data else "MISMATCH"
            print(f"{stream}: {status}")


if __name__ == "__main__":
    main()
