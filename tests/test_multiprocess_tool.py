"""End-to-end two-process scaling of project_alignments (VERDICT r1 #4).

Two ``jax.distributed`` processes each run the FULL tool over a
chromosome shard (``chr_shard=(k, 2)`` index loading + pre-routed input,
the multi-host design of SURVEY §2.5/§5): merged output must equal the
single-process run record-for-record, the merged ranges TSVs must equal
the single-run TSV, and the parent records a 1→2 process scaling
efficiency figure (BASELINE.md targets ≥80% on real hosts; the CPU mesh
number lands in ROADMAP.md).
"""

import io
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from panvc3_tpu.pipeline.project_alignments import split_ref_id

from .test_seqbuf import _many_contig_setup

N_CONTIGS = 6

pytestmark = pytest.mark.skipif(
    os.environ.get("PANVC3_SKIP_MULTIPROCESS") == "1",
    reason="multiprocess test disabled",
)


def _synth_reads(founders, n_reads=64000, read_len=60, seed=13):
    rng = np.random.default_rng(seed)
    lines = ["@HD\tVN:1.6"]
    names = sorted(founders)
    for name in names:
        lines.append(f"@SQ\tSN:{name}/F\tLN:{len(founders[name])}")
    for i in range(n_reads):
        name = names[int(rng.integers(len(names)))]
        s = founders[name]
        pos = int(rng.integers(0, len(s) - read_len - 12))
        if i % 3 == 2:
            k = int(rng.integers(1, 4))
            j = int(rng.integers(1, 4))
            half = read_len // 2
            ins = rng.choice(np.frombuffer(b"ACGT", np.uint8), k).tobytes()
            seq = s[pos:pos + half] + ins + s[pos + half + j:pos + half + j + (read_len - half - k)]
            cigar = f"{half}={k}I{j}D{read_len - half - k}="
        else:
            seq = s[pos:pos + read_len]
            cigar = f"{read_len}="
        lines.append(
            f"r{i}\t0\t{name}/F\t{pos + 1}\t60\t{cigar}\t*\t0\t0\t"
            f"{seq.decode()}\t{'I' * len(seq)}"
        )
    return lines


WORKER = r"""
import io, sys, time
pid = int(sys.argv[1])
n_procs = int(sys.argv[2])
port = sys.argv[3]
index_path, fa_path, in_path, out_path, ranges_path, t_path = sys.argv[4:10]
import os
# Fair-share CPU affinity (argv[10], comma-separated core list): without
# it every process autoscales its pool to the WHOLE box, so an n-process
# "scaling" run measures n oversubscribed processes racing one another —
# r4's superlinear 1.267/1.413 efficiencies came from exactly that plus
# an understated small-workload baseline (VERDICT r4 weak #2).
if len(sys.argv) > 10 and sys.argv[10]:
    os.sched_setaffinity(0, {int(c) for c in sys.argv[10].split(",")})
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
if n_procs > 1:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_procs,
        process_id=pid,
    )
sys.path.insert(0, "/root/repo")
from panvc3_tpu.pipeline.project_alignments import (
    ProjectConfig, run_project_alignments,
)

cfg = ProjectConfig(
    msa_index_path=index_path,
    reference_path=fa_path,
    reference_msa_id="REF",
    ref_id_separator="/",
    engine="device",
    device_batch_size=512,
    status_output_interval=0,
    output_realigned_ranges_path=ranges_path,
    chr_shard=(pid, n_procs) if n_procs > 1 else None,
)
sam = open(in_path, "rb").read()
run_project_alignments(io.BytesIO(sam), io.BytesIO(), cfg)  # warm compiles
t0 = time.perf_counter()
stats = run_project_alignments(io.BytesIO(sam), open(out_path, "wb"), cfg)
dt = time.perf_counter() - t0
open(t_path, "w").write(f"{dt}\t{stats.matched_reads}\t{stats.realigned_range_count}")
print(f"proc{pid} ok {stats.matched_reads} reads {dt:.2f}s", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("n_procs", [2, 3])
def test_multi_process_tool_scaling(tmp_path, n_procs):
    """n_procs=2 is the headline 1→2 scaling figure; n_procs=3 exercises
    uneven round-robin chromosome sharding (6 contigs over 3 processes)
    through the same full-tool path."""
    index_path, fa_path, founders = _many_contig_setup(tmp_path, N_CONTIGS)
    lines = _synth_reads(founders, n_reads=64000 if n_procs == 2 else 36000)
    header = [l for l in lines if l.startswith("@")]
    records = [l for l in lines if not l.startswith("@")]

    # route records by the same round-robin chromosome sharding the index
    # loader uses (MsaIndex.load(shard=...), split_alignments_by_reference)
    chr_ids = sorted(founders)
    shards: list[list[str]] = [[] for _ in range(n_procs)]
    for line in records:
        rname = line.split("\t", 3)[2]
        chr_id, _ = split_ref_id(rname, "/")
        shards[chr_ids.index(chr_id) % n_procs].append(line)

    full_path = tmp_path / "full.sam"
    full_path.write_text("\n".join(header + records) + "\n")
    for k in range(n_procs):
        (tmp_path / f"shard{k}.sam").write_text(
            "\n".join(header + shards[k]) + "\n"
        )

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"

    def spawn(pid, n_procs, port, in_name, tag, cpus=""):
        return subprocess.Popen(
            [
                sys.executable, "-c", WORKER, str(pid), str(n_procs), str(port),
                str(index_path), str(fa_path), str(tmp_path / in_name),
                str(tmp_path / f"out_{tag}.sam"),
                str(tmp_path / f"ranges_{tag}.tsv"),
                str(tmp_path / f"t_{tag}.txt"),
                cpus,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )

    # fair-share core partition: each of the n processes gets a disjoint
    # per-core slice, and the single-process baseline is limited to the
    # same n*per total so the efficiency compares EQUAL resources (without
    # this every process autoscaled to the whole box and the "efficiency"
    # measured oversubscription artifacts — superlinear 1.267/1.413 in r4)
    per = max(1, (os.cpu_count() or 4) // n_procs)
    base_cpus = ",".join(str(c) for c in range(n_procs * per))
    shard_cpus = [
        ",".join(str(c) for c in range(k * per, (k + 1) * per))
        for k in range(n_procs)
    ]

    # single-process baseline
    p = spawn(0, 1, 0, "full.sam", "single", cpus=base_cpus)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, out.decode()

    # n distributed processes over the chromosome shards
    port = _free_port()
    procs = [
        spawn(k, n_procs, port, f"shard{k}.sam", f"p{k}", cpus=shard_cpus[k])
        for k in range(n_procs)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), b"\n".join(outs).decode()

    # ---- merged output == single-process output (record multiset) -------
    def body_lines(tag):
        return [
            l for l in (tmp_path / f"out_{tag}.sam").read_text().splitlines()
            if not l.startswith("@")
        ]

    single = sorted(body_lines("single"))
    merged = sorted(
        sum((body_lines(f"p{k}") for k in range(n_procs)), [])
    )
    assert merged == single
    assert len(single) == len(records)

    # ---- merged ranges TSV == single-run TSV (sorted dedup union) -------
    def ranges(tag):
        return set(
            tuple(l.split("\t"))
            for l in (tmp_path / f"ranges_{tag}.tsv").read_text().splitlines()[1:]
        )

    merged_ranges = set().union(*(ranges(f"p{k}") for k in range(n_procs)))
    assert merged_ranges == ranges("single")
    assert ranges("single")  # realignment exercised

    # ---- scaling efficiency --------------------------------------------
    t1 = float((tmp_path / "t_single.txt").read_text().split("\t")[0])
    tn = max(
        float((tmp_path / f"t_p{k}.txt").read_text().split("\t")[0])
        for k in range(n_procs)
    )
    eff = t1 / (n_procs * tn)
    print(
        f"[scaling] 1-proc {t1:.2f}s, {n_procs}-proc max {tn:.2f}s, "
        f"efficiency {eff:.2f}"
    )
    if n_procs == 2:
        # fair-share affinity bounds (≥0.8 target applies to real
        # multi-host runs): below 0.5 the sharded path regressed.  The
        # upper bound tolerates the real single-parse-thread
        # superlinearity plus small-workload noise (this 64k-read CI
        # smoke times ~70 ms regions); the honest steady-state figure is
        # bench.py --scaling (512k reads, per-N baselines, raw times).
        assert 0.5 < eff < 1.4, (t1, tn)
