"""Two-process jax.distributed smoke test (SURVEY §4: fake multi-host mesh
on CPU).  Each process owns 4 virtual CPU devices; the global 8-device dp
mesh runs one fused-v4 projection step (the production wire: event-table
searches + segment-space run detection + realignment DP in one dispatch)
with the batch sharded across both processes, then byte-compares every
locally addressable output shard against a process-local single-device
replay of the same inputs."""

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
from __graft_entry__ import _example_inputs, _kernel_fn
from panvc3_tpu.parallel.mesh import make_mesh, replicate, shard_batch_arrays

mesh = make_mesh()
b, r = 16, 32
# deterministic seed: both processes build identical global inputs
geo, ref_flat, batch = _example_inputs(b=b, r=r, lq_pad=r, seed=3)
fn = _kernel_fn(geo, b, r)

sharded = shard_batch_arrays(mesh, dict(batch))
out = fn(replicate(mesh, ref_flat), *sharded.values())
jax.block_until_ready(out)

# process-local single-device replay of the SAME global inputs
ref_out = fn(ref_flat, *batch.values())
jax.block_until_ready(ref_out)
flags = np.asarray(ref_out[-1])
assert int(flags[1]) == 0, "event-slot overflow: v4 wire not exercised"
assert int(flags[0]) == 0, "run-pool overflow: v4 wire not exercised"
assert int(flags[2]) >= b, flags

names = ("dst_pos", "gapbits", "d_vals", "d_pos", "d_n",
         "realign_ops", "realign_counts", "flags")
for name, a, e in zip(names, out, ref_out):
    expect = np.asarray(e)
    for shard in a.addressable_shards:
        got = np.asarray(shard.data)
        assert np.array_equal(got, expect[shard.index]), (
            f"proc{pid} shard of {name} differs from local replay"
        )
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
