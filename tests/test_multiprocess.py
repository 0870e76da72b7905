"""Two-process jax.distributed smoke test (SURVEY §4: fake multi-host mesh
on CPU).  Each process owns 4 virtual CPU devices; the global 8-device dp
mesh runs one fused projection step with the batch sharded across both
processes and verifies the global statistics all-reduce."""

import os
import pathlib
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=pid,
)
assert len(jax.devices()) == 8, jax.devices()

sys.path.insert(0, "/root/repo")
import numpy as np
from __graft_entry__ import _example_inputs
from panvc3_tpu.ops.forward import projection_step
from panvc3_tpu.parallel.mesh import make_mesh, replicate, shard_batch_arrays

mesh = make_mesh()
b = 16
r, o, run = 32, 4, 8
inputs = _example_inputs(b=b, r=r, o=o, lq=32, run_r=run, run_q=run)
index = replicate(mesh, inputs.pop("index"))
ref_flat = replicate(mesh, inputs.pop("ref_flat"))
go = inputs.pop("go")
ge = inputs.pop("ge")
sharded = shard_batch_arrays(mesh, inputs)
out = projection_step(
    index, ref_flat,
    sharded["src_seq"], sharded["dst_seq"], sharded["rec_src_pos"],
    sharded["ref_off"], sharded["ops"], sharded["counts"], sharded["query"],
    sharded["run_ref"], sharded["run_query"], sharded["run_ref_len"],
    sharded["run_query_len"], go, ge, R=r, run_r=run, run_q=run,
)
jax.block_until_ready(out)
stats = np.asarray(out[-1])
assert stats[0] == b * r, stats
print(f"proc{pid} ok", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("PANVC3_SKIP_MULTIPROCESS") == "1",
    reason="multiprocess test disabled",
)
def test_two_process_distributed(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    port = str(12400 + os.getpid() % 1000)  # avoid cross-run collisions
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
    assert "proc0 ok" in outs[0][1]
    assert "proc1 ok" in outs[1][1]
