#!/usr/bin/env python
"""Dependency-free driver for the toy end-to-end pipeline.

Runs the same DAG as workflows/test-workflow/Snakefile without requiring
snakemake/bowtie2/samtools: the aligner stage is replaced by reading a
pre-aligned founder SAM (or by synthesising founder-aligned reads from the
MSA when none is given), then

    index_msa -> project_alignments -> (QNAME sort) -> recalculate_mapq

Useful for smoke-testing the full stack on the bundled reference data:

    python workflows/run_test_workflow.py --workdir /tmp/wf \
        --data workflows/test-workflow/data
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--data", default=str(pathlib.Path(__file__).resolve().parent / "test-workflow/data"))
    p.add_argument("--alignments", help="founder-aligned SAM/BAM input")
    p.add_argument("--n-reads", type=int, default=1000)
    p.add_argument("--engine", choices=("host", "device"), default="host")
    args = p.parse_args()

    import numpy as np

    from panvc3_tpu.io.sam import SamReader, SamWriter
    from panvc3_tpu.pipeline.index_msa import build_index_from_tsv
    from panvc3_tpu.pipeline.project_alignments import (
        ProjectConfig,
        TagSpec,
        run_project_alignments,
    )
    from panvc3_tpu.pipeline.recalculate_mapq import run_recalculate_mapq

    work = pathlib.Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    data = pathlib.Path(args.data)

    # 1. index_msa
    tsv = work / "input.tsv"
    rows = []
    for line in (data / "index-input/input.tsv").read_text().splitlines():
        chr_id, seq_id, rel = line.split("\t")
        rows.append(f"{chr_id}\t{seq_id}\t{data / rel}")
    tsv.write_text("\n".join(rows) + "\n")
    index_path = work / "msa-index.npz"
    fasta_path = work / "unaligned.fa"
    with open(fasta_path, "wb") as fh:
        index = build_index_from_tsv(str(tsv), pipe_command="bzip2 -d -c", fasta_out=fh)
    index.save(str(index_path))
    print(f"[workflow] MSA index built: {index_path}", file=sys.stderr)

    # 2. founder alignments (external aligner stand-in)
    if args.alignments:
        aln_path = pathlib.Path(args.alignments)
    else:
        import bz2

        founders = {}
        for line in (data / "index-input/input.tsv").read_text().splitlines():
            chr_id, seq_id, rel = line.split("\t")
            founders[seq_id] = bz2.open(data / rel, "rb").read()
        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))
        from test_workflow_data import _synthesise_sam

        sam_text = _synthesise_sam(founders, n_reads=args.n_reads)
        aln_path = work / "founder.sam"
        aln_path.write_text(sam_text)
        print(f"[workflow] synthesised {args.n_reads} founder reads", file=sys.stderr)

    # 3. project
    projected = work / "alignments.projected.sam"
    cfg = ProjectConfig(
        msa_index_path=str(index_path),
        reference_path=str(data / "genome/genome.fa.gz"),
        reference_msa_id="REF",
        ref_id_separator="/",
        tags=TagSpec(rec_idx="XI"),
        preserve_tags=("XS", "YS"),
        engine=args.engine,
    )
    stats = run_project_alignments(str(aln_path), str(projected), cfg)
    print(f"[workflow] projected {stats.matched_reads} reads", file=sys.stderr)

    # 4. QNAME sort (samtools sort -n stand-in)
    reader = SamReader(str(projected))
    records = list(reader)
    records.sort(key=lambda r: r.qname)
    qsorted = work / "alignments.projected.qname-sorted.sam"
    w = SamWriter(str(qsorted), reader.header)
    for rec in records:
        w.write(rec)
    w.close()

    # 5. recalculate MAPQ
    final = work / "alignments.mapq-recalculated.sam"
    mstats = run_recalculate_mapq(str(qsorted), str(final))
    print(
        f"[workflow] MAPQ recalculated for {mstats.total_alignments} alignments "
        f"-> {final}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
