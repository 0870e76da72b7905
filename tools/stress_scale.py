"""One-off scale stresses backing ROADMAP's "Scale-stress results".

Run directly (CPU backend; ~2 min):

    python tools/stress_scale.py [genome|contigs|deep|mapq|all]

These are deliberately not part of the test suite (they assert nothing
beyond completion and print wall/RSS figures that vary by machine); the
correctness of every path they exercise is covered by the differential
tests in tests/.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import resource
import sys
import tempfile
import time


def _rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def stress_genome(n_cols: int = 40_000_000, n_reads: int = 20_000) -> None:
    """Whole-tool run over a 40M-aligned-column index (cold start incl.
    index build, event tables, jit compiles)."""
    import numpy as np

    from panvc3_tpu.bitvec import GapBitVector
    from panvc3_tpu.msa_index import ChrEntry, MsaIndex, SequenceEntry
    from panvc3_tpu.pipeline.project_alignments import (
        ProjectConfig,
        TagSpec,
        run_project_alignments,
    )

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(1)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    consensus = rng.choice(bases, n_cols)
    index = MsaIndex()
    ce = ChrEntry("chr1")
    rows = {}
    t0 = time.perf_counter()
    for sid in ["REF", "f1", "f2"]:
        row = consensus.copy()
        sub = rng.random(n_cols) < 0.002
        row[sub] = rng.choice(bases, int(sub.sum()))
        gaps = rng.random(n_cols) < 0.03
        row[gaps] = ord("-")
        rows[sid] = row.tobytes()
        ce.sequence_entries.append(
            SequenceEntry(sid, GapBitVector.from_gap_string(rows[sid]))
        )
    index.chr_entries.append(ce)
    index.sort()
    index.save(f"{tmp}/msa.npz")
    print(f"[genome] build+save {3 * n_cols / 1e6:.0f}M cols: "
          f"{time.perf_counter() - t0:.1f}s")

    ref_gapless = rows["REF"].replace(b"-", b"")
    with open(f"{tmp}/ref.fa", "wb") as fh:
        fh.write(b">chr1\n" + ref_gapless + b"\n")
    stripped = {sid: r.replace(b"-", b"") for sid, r in rows.items()}
    lines = ["@HD\tVN:1.6"]
    for sid, s in stripped.items():
        lines.append(f"@SQ\tSN:chr1/{sid}\tLN:{len(s)}")
    rng2 = np.random.default_rng(2)
    for i in range(n_reads):
        sid = ["f1", "f2"][int(rng2.integers(2))]
        s = stripped[sid]
        pos = int(rng2.integers(0, len(s) - 130))
        if i % 3 == 2:
            k = int(rng2.integers(1, 5))
            j = int(rng2.integers(1, 5))
            ins = rng2.choice(bases, k).tobytes()
            seq = s[pos:pos + 50] + ins + s[pos + 50 + j:pos + 50 + j + (50 - k)]
            cigar = f"50={k}I{j}D{50 - k}="
        else:
            seq = s[pos:pos + 100]
            cigar = "100="
        lines.append(
            f"g{i}\t0\tchr1/{sid}\t{pos + 1}\t60\t{cigar}\t*\t0\t0\t"
            f"{seq.decode()}\t{'I' * len(seq)}"
        )
    sam = ("\n".join(lines) + "\n").encode()
    cfg = ProjectConfig(
        msa_index_path=f"{tmp}/msa.npz", reference_path=f"{tmp}/ref.fa",
        reference_msa_id="REF", ref_id_separator="/",
        tags=TagSpec(rec_idx="XI"), engine="device", device_batch_size=8192,
    )
    t0 = time.perf_counter()
    out = io.BytesIO()
    st = run_project_alignments(io.BytesIO(sam), out, cfg)
    dt = time.perf_counter() - t0
    assert st.matched_reads == n_reads
    print(f"[genome] project {n_reads} reads over {n_cols / 1e6:.0f}M cols: "
          f"{dt:.1f}s ({n_reads / dt:,.0f} reads/s), peak RSS {_rss_gb():.2f} GB")


def stress_contigs(n_chr: int = 500, n_reads: int = 100_000) -> None:
    """Many-contig routing + per-pair event tables + npz member loading."""
    import numpy as np

    from panvc3_tpu.bitvec import GapBitVector
    from panvc3_tpu.msa_index import ChrEntry, MsaIndex, SequenceEntry
    from panvc3_tpu.pipeline.project_alignments import (
        ProjectConfig,
        TagSpec,
        run_project_alignments,
    )

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    index = MsaIndex()
    ref_fa = []
    stripped = {}
    for c in range(n_chr):
        ce = ChrEntry(f"c{c}")
        consensus = rng.choice(bases, 2000)
        rows = {}
        for sid in ["REF", "f1"]:
            row = consensus.copy()
            gaps = rng.random(2000) < 0.03
            row[gaps] = ord("-")
            rows[sid] = row.tobytes()
            ce.sequence_entries.append(
                SequenceEntry(sid, GapBitVector.from_gap_string(rows[sid]))
            )
        index.chr_entries.append(ce)
        stripped[f"c{c}"] = rows["f1"].replace(b"-", b"")
        ref_fa.append(
            f">c{c}\n".encode() + rows["REF"].replace(b"-", b"") + b"\n"
        )
    index.sort()
    index.save(f"{tmp}/msa.npz")
    with open(f"{tmp}/ref.fa", "wb") as fh:
        fh.write(b"".join(ref_fa))

    lines = ["@HD\tVN:1.6"]
    for c, s in stripped.items():
        lines.append(f"@SQ\tSN:{c}/f1\tLN:{len(s)}")
    for i in range(n_reads):
        c = f"c{rng.integers(n_chr)}"
        s = stripped[c]
        pos = int(rng.integers(0, len(s) - 120))
        lines.append(
            f"m{i}\t0\t{c}/f1\t{pos + 1}\t60\t100=\t*\t0\t0\t"
            f"{s[pos:pos + 100].decode()}\t{'I' * 100}"
        )
    sam = ("\n".join(lines) + "\n").encode()
    cfg = ProjectConfig(
        msa_index_path=f"{tmp}/msa.npz", reference_path=f"{tmp}/ref.fa",
        reference_msa_id="REF", ref_id_separator="/",
        tags=TagSpec(rec_idx="XI"), engine="device", device_batch_size=8192,
    )
    t0 = time.perf_counter()
    st = run_project_alignments(io.BytesIO(sam), io.BytesIO(), cfg)
    dt = time.perf_counter() - t0
    assert st.matched_reads == n_reads
    print(f"[contigs] {n_chr} contigs x {n_reads} reads: {dt:.1f}s "
          f"({n_reads / dt:,.0f} reads/s), peak RSS {_rss_gb():.2f} GB")


def stress_deep(n_reads: int = 50_000, n_vars: int = 200) -> None:
    """Deep coverage pile-up through the count_supporting_reads engine."""
    import random

    from panvc3_tpu.pipeline.count_supporting_reads import (
        run_count_supporting_reads,
    )

    random.seed(1)
    lines = ["@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:c\tLN:3000\n"]
    for i, p in enumerate(sorted(random.randrange(0, 2000) for _ in range(n_reads))):
        lines.append(
            f"d{i}\t0\tc\t{p + 1}\t60\t100M\t*\t0\t0\t{'A' * 100}\t{'I' * 100}\n"
        )
    sam = "".join(lines).encode()
    tmp = tempfile.mkdtemp()
    with open(f"{tmp}/v.vcf", "w") as fh:
        fh.write(
            "##fileformat=VCFv4.2\n"
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        )
        for j, p in enumerate(sorted(random.sample(range(100, 2000), n_vars))):
            fh.write(f"c\t{p}\tv{j}\tA\tG\t.\tPASS\t.\tGT\t0|1\n")
    t0 = time.perf_counter()
    run_count_supporting_reads(f"{tmp}/v.vcf", io.BytesIO(sam), io.StringIO())
    print(f"[deep] {n_reads} reads piled on 2kb, {n_vars} variants: "
          f"{time.perf_counter() - t0:.2f}s")


def stress_mapq(n_groups: int = 2000, k: int = 100) -> None:
    """recalculate_mapq with bowtie2 -k 100-shaped candidate groups."""
    import random

    from panvc3_tpu.pipeline.recalculate_mapq import run_recalculate_mapq

    random.seed(2)
    lines = ["@HD\tVN:1.6\n@SQ\tSN:c\tLN:1000000\n"]
    for g in range(n_groups):
        for j in range(k):
            p = random.randrange(1, 900000)
            flag = 0 if j == 0 else 0x100
            lines.append(
                f"grp{g}\t{flag}\tc\t{p}\t40\t100M\t*\t0\t0\t{'A' * 100}\t"
                f"{'I' * 100}\tAS:i:{-random.randrange(0, 60)}\tXR:i:0\tXP:i:{p}\n"
            )
    sam = "".join(lines).encode()
    n = n_groups * k
    t0 = time.perf_counter()
    run_recalculate_mapq(io.BytesIO(sam), io.BytesIO())
    dt = time.perf_counter() - t0
    print(f"[mapq] {n_groups} groups x k={k}: {dt:.2f}s ({n / dt:,.0f} rec/s)")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("genome", "all"):
        stress_genome()
    if which in ("contigs", "all"):
        stress_contigs()
    if which in ("deep", "all"):
        stress_deep()
    if which in ("mapq", "all"):
        stress_mapq()
