#!/usr/bin/env python
"""Benchmark: projected reads/s through the batched device engine.

Workload mirrors the reference's test-workflow scale point (100 bp reads
against a founder MSA, mixed match/indel CIGARs, projection + indel-run
realignment; /root/reference/test-workflow/README.md:16-30).  Uses the
bundled toy MSA when available, otherwise a synthetic one.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); its
single-threaded C++ projection loop logs µs/record at runtime.  We use a
documented estimate of 25,000 reads/s (40 µs/record) for a single-threaded
panvc3_project_alignments with realignment enabled as the comparison
point; BASELINE.md's target is >= 10x that on one chip.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first compile over the axon tunnel
    is slow; later bench runs reuse it."""
    try:
        import jax

        cache_dir = str(pathlib.Path(__file__).parent / ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()

BASELINE_READS_PER_S = 25_000.0
WORKFLOW = pathlib.Path("/root/reference/test-workflow")


def build_index_entries():
    """(src_entries, dst_entries, ref_id_mapping, ref_seq, founders)"""
    import bz2

    from panvc3_tpu.bitvec import GapBitVector
    from panvc3_tpu.msa_index import SequenceEntry

    if WORKFLOW.exists():
        rows = []
        for line in (WORKFLOW / "index-input/input.tsv").read_text().splitlines():
            chr_id, seq_id, rel = line.split("\t")
            rows.append((seq_id, bz2.open(WORKFLOW / rel, "rb").read()))
    else:
        rng = np.random.default_rng(0)
        n_cols = 12000
        base = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), n_cols)
        rows = []
        for k in range(5):
            seq = base.copy()
            gaps = rng.random(n_cols) < 0.02
            seq[gaps] = ord("-")
            rows.append((["REF", "1", "2", "3", "4"][k], seq.tobytes()))

    entries = {}
    for seq_id, aligned in rows:
        entries[seq_id] = (
            SequenceEntry(seq_id, GapBitVector.from_gap_string(aligned)),
            aligned.replace(b"-", b""),
        )
    ref_entry, ref_seq = entries["REF"]
    src_ids = [sid for sid, _ in rows]
    src_entries = [entries[sid][0] for sid in src_ids]
    dst_entries = [ref_entry]
    ref_id_mapping = [0] * len(src_entries)
    founders = {i: entries[sid][1] for i, sid in enumerate(src_ids)}
    return src_entries, dst_entries, ref_id_mapping, ref_seq, founders


def synthesise_records(founders, n_reads: int, read_len: int = 100, seed: int = 1):
    from panvc3_tpu.cigar import parse_cigar
    from panvc3_tpu.io.sam import SamRecord

    rng = np.random.default_rng(seed)
    recs = []
    fids = list(founders)
    for i in range(n_reads):
        fid = fids[int(rng.integers(len(fids)))]
        s = founders[fid]
        pos = int(rng.integers(0, len(s) - read_len - 16))
        kind = i % 3
        if kind == 0:
            cigar = f"{read_len}="
            seq = s[pos:pos + read_len]
        elif kind == 1:
            k = int(rng.integers(1, 6))
            half = read_len // 2
            seq = s[pos:pos + half] + s[pos + half + k:pos + half + k + (read_len - half)]
            cigar = f"{half}={k}D{read_len - half}="
        else:
            k = int(rng.integers(1, 6))
            j = int(rng.integers(1, 6))
            half = read_len // 2
            ins = bytes(rng.choice(list(b"ACGT"), k))
            seq = (
                s[pos:pos + half]
                + ins
                + s[pos + half + j:pos + half + j + (read_len - half - k)]
            )
            cigar = f"{half}={k}I{j}D{read_len - half - k}="
        recs.append(
            SamRecord(
                qname=f"r{i}",
                flag=0,
                ref_id=fid,
                pos=pos,
                mapq=60,
                cigar=parse_cigar(cigar),
                seq=seq.decode(),
                qual="I" * len(seq),
            )
        )
    return recs


def main() -> None:
    # the tunnel to the TPU occasionally drops; retry the whole measurement
    for attempt in range(3):
        try:
            _run()
            return
        except Exception as exc:  # noqa: BLE001 — backend flakes surface as JaxRuntimeError
            print(f"[bench] attempt {attempt + 1} failed: {exc}", file=sys.stderr)
            time.sleep(20)
    raise SystemExit("bench failed after 3 attempts")


def _run() -> None:
    from panvc3_tpu.ops.engine import BatchProjector

    class Cfg:
        use_read_base_qualities = False

    src_entries, dst_entries, ref_id_mapping, ref_seq, founders = build_index_entries()
    engine = BatchProjector(src_entries, dst_entries, ref_id_mapping, 0, -1)
    ref_seqs = {0: ref_seq}

    batch_size = 4096
    n_batches = 8
    records = synthesise_records(founders, batch_size)

    # warmup (compile)
    engine.project_batch(records[:batch_size], ref_seqs, Cfg())

    # two-deep pipelined measurement (device work overlaps host post-processing)
    t0 = time.perf_counter()
    total = 0
    pending = []
    res = None
    for _ in range(n_batches):
        pending.append(engine.start_batch(records, ref_seqs, Cfg()))
        if len(pending) >= 2:
            res = engine.finish_batch(pending.pop(0))
            total += len(res)
    while pending:
        res = engine.finish_batch(pending.pop(0))
        total += len(res)
    dt = time.perf_counter() - t0
    reads_per_s = total / dt

    n_realn = sum(r.num_realignments for r in res)
    print(
        f"[bench] {total} reads in {dt:.3f}s, {n_realn} realignments/batch, "
        f"batch={batch_size}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "projected_reads_per_s",
                "value": round(reads_per_s, 1),
                "unit": "reads/s/chip",
                "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
