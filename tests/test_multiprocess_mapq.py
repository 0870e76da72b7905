"""Whole-tool two-process sharded recalculate_mapq (VERDICT r4 #5).

SURVEY §2.5/§5 names QNAME-group locality as the multi-host design point
for MAPQ recalculation: the reference's group algorithm
(/root/reference/recalculate-mapq/main.cc:960-1277) assumes a read's
candidates are co-located because the input is QNAME-sorted, so the
scale-out design routes whole QNAME groups by hash
(parallel.distributed.qname_shard) and runs the unmodified tool per
shard.  Here two ``jax.distributed`` processes each run the FULL tool
over a QNAME-hash shard; the merged output must equal the single-process
run record for record, and the parent records a fair-share scaling
figure (same affinity scheme as test_multiprocess_tool).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from panvc3_tpu.parallel.distributed import qname_shard

pytestmark = pytest.mark.skipif(
    os.environ.get("PANVC3_SKIP_MULTIPROCESS") == "1",
    reason="multiprocess test disabled",
)


def synth_grouped_sam(n_groups=2000, seed=5):
    """QNAME-grouped projected-style SAM with multi-candidate groups,
    AS scores and the original-position tags the scorer keys on."""
    rng = np.random.default_rng(seed)
    lines = ["@HD\tVN:1.6\tSO:queryname", "@SQ\tSN:chr1\tLN:100000"]
    for i in range(n_groups):
        p1, p2 = int(rng.integers(0, 90000)), int(rng.integers(0, 90000))
        k = 1 + (i % 3 == 0) + (i % 7 == 0)
        for c in range(k):
            off = c * 7
            for pos, mpos, flag in ((p1 + off, p2, 99), (p2, p1 + off, 147)):
                lines.append(
                    f"pair{i}\t{flag}\tchr1\t{pos + 1}\t60\t100=\t=\t{mpos + 1}"
                    f"\t200\t" + "ACGT" * 25 + "\t" + "I" * 100
                    + f"\tAS:i:-{int(rng.integers(0, 12))}\tXR:i:0"
                    f"\tXP:i:{pos}\tYR:i:0\tYP:i:{mpos}"
                )
        if i % 97 == 0:
            lines.append(f"pair{i}x\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII")
    return lines


MAPQ_WORKER = r"""
import io, sys, time
pid = int(sys.argv[1])
n_procs = int(sys.argv[2])
port = sys.argv[3]
in_path, out_path, t_path = sys.argv[4:7]
import os
if len(sys.argv) > 7 and sys.argv[7]:
    os.sched_setaffinity(0, {int(c) for c in sys.argv[7].split(",")})
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
from panvc3_tpu.pipeline.recalculate_mapq import run_recalculate_mapq

sam = open(in_path, "rb").read()
run_recalculate_mapq(io.BytesIO(sam), io.BytesIO(), status_output_interval=0)
t0 = time.perf_counter()
stats = run_recalculate_mapq(
    io.BytesIO(sam), open(out_path, "wb"), status_output_interval=0
)
dt = time.perf_counter() - t0
open(t_path, "w").write(f"{dt}\t{stats.total_alignments}")
print(f"proc{pid} ok {stats.total_alignments} alignments {dt:.2f}s", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def shard_lines(lines, n_procs):
    """Route whole QNAME groups by hash; header replicated."""
    header = [l for l in lines if l.startswith("@")]
    shards = [[] for _ in range(n_procs)]
    for line in lines:
        if line.startswith("@"):
            continue
        qname = line.split("\t", 1)[0]
        shards[qname_shard(qname, n_procs)].append(line)
    return header, shards


def test_multi_process_mapq_sharding(tmp_path):
    n_procs = 2
    lines = synth_grouped_sam()
    header, shards = shard_lines(lines, n_procs)
    records = [l for l in lines if not l.startswith("@")]
    assert all(shards)  # both shards non-trivial

    (tmp_path / "full.sam").write_text("\n".join(lines) + "\n")
    for k in range(n_procs):
        (tmp_path / f"shard{k}.sam").write_text(
            "\n".join(header + shards[k]) + "\n"
        )

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    per = max(1, (os.cpu_count() or 4) // n_procs)
    base_cpus = ",".join(str(c) for c in range(n_procs * per))

    def spawn(pid, n, port, in_name, tag, cpus):
        return subprocess.Popen(
            [
                sys.executable, "-c", MAPQ_WORKER, str(pid), str(n),
                str(port), str(tmp_path / in_name),
                str(tmp_path / f"out_{tag}.sam"),
                str(tmp_path / f"t_{tag}.txt"), cpus,
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )

    p = spawn(0, 1, 0, "full.sam", "single", base_cpus)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, out.decode()

    port = _free_port()
    procs = [
        spawn(
            k, n_procs, port, f"shard{k}.sam", f"p{k}",
            ",".join(str(c) for c in range(k * per, (k + 1) * per)),
        )
        for k in range(n_procs)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), b"\n".join(outs).decode()

    # merged output == single-process output, record for record: MAPQ
    # depends only on the record's own QNAME group, so hash-routing whole
    # groups must not change a single byte of any record
    def body(tag):
        return [
            l
            for l in (tmp_path / f"out_{tag}.sam").read_text().splitlines()
            if not l.startswith("@")
        ]

    single = sorted(body("single"))
    merged = sorted(body("p0") + body("p1"))
    assert merged == single
    # the tool itself drops unmapped records (flag 0x4) — everything else
    # must come through
    n_mapped = sum(1 for l in records if not int(l.split("\t")[1]) & 4)
    assert len(single) == n_mapped

    t1 = float((tmp_path / "t_single.txt").read_text().split("\t")[0])
    tn = max(
        float((tmp_path / f"t_p{k}.txt").read_text().split("\t")[0])
        for k in range(n_procs)
    )
    eff = t1 / (n_procs * tn)
    print(f"[mapq scaling] 1-proc {t1:.2f}s, 2-proc max {tn:.2f}s, eff {eff:.2f}")
    assert 0.3 < eff < 1.3, (t1, tn)  # smoke band (tiny workload)
