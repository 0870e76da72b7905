#!/usr/bin/env python
"""A/B the fused-DP tile width (PANVC3_DP_TILE_B): marginal per-dispatch
rates at the production 16-pad shape and the 48-bucket regime, per tile
width.  Spawns one subprocess per width (TILE_B is read at import)."""
from __future__ import annotations

import pathlib
import subprocess
import sys

INNER = r"""
import pathlib, sys, time
from functools import partial
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
jax.config.update(
    "jax_compilation_cache_dir", "/root/repo/.jax_cache"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from panvc3_tpu.ops.realign_batch import realign_device_kernel
from panvc3_tpu.ops.realign_pallas_fused import TILE_B

go = np.float32(0); ge = np.float32(-1)

@partial(jax.jit, static_argnames=("R", "Q", "n_iters"))
def dp_loop(ref, q, rl, ql, zr, zq, R, Q, n_iters):
    def body(i, carry):
        acc, ref_ = carry
        ref_ = ref_.at[0, 0].set((acc % 4 + 65).astype(jnp.uint8))
        ops, counts = realign_device_kernel(
            ref_, q, rl, ql, go, ge, zr, zq, False, R, Q
        )
        return acc + counts[0] + ops[0, 0].astype(jnp.int32), ref_
    return jax.lax.fori_loop(0, n_iters, body, (jnp.int32(0), ref))[0]

def marginal(S, R, Q, lo_len, hi_len, it_lo=10, it_hi=50, sort=True):
    rng = np.random.default_rng(7)
    rl = rng.integers(lo_len, hi_len, S).astype(np.int32)
    ql = rng.integers(lo_len, hi_len, S).astype(np.int32)
    if sort:
        o = np.argsort(rl + ql, kind="stable"); rl, ql = rl[o], ql[o]
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = rng.choice(bases, (S, R)).astype(np.uint8)
    q = rng.choice(bases, (S, Q)).astype(np.uint8)
    ref[np.arange(R)[None, :] >= rl[:, None]] = 0
    q[np.arange(Q)[None, :] >= ql[:, None]] = 0
    a = [jax.device_put(x) for x in (ref, q, rl, ql)]
    zr = jax.device_put(np.zeros((S, R), np.int32))
    zq = jax.device_put(np.zeros((S, Q), np.int32))
    np.asarray(dp_loop(*a, zr, zq, R, Q, it_lo))
    np.asarray(dp_loop(*a, zr, zq, R, Q, it_hi))
    def t(n):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(dp_loop(*a, zr, zq, R, Q, n))
            best = min(best, time.perf_counter() - t0)
        return best
    dt = max(t(it_hi) - t(it_lo), 1e-9) / (it_hi - it_lo)
    cells = int(np.sum(rl.astype(np.int64) * ql))
    print(
        f"TILE_B={TILE_B:4d} S={S:6d} R=Q={R:3d} len[{lo_len},{hi_len}) "
        f"sort={int(sort)} {dt*1e3:8.3f} ms/disp  "
        f"{cells/dt/1e9:8.3f} G real  {S*R*Q/dt/1e9:8.3f} G padded",
        flush=True,
    )

marginal(16384, 16, 16, 2, 13)
marginal(131072, 16, 16, 2, 13)
marginal(16384, 48, 48, 48, 49)
marginal(16384, 48, 48, 8, 49)
"""


def main():
    import os

    for tile in ("256", "512", "1024"):
        env = {**os.environ, "PANVC3_DP_TILE_B": tile}
        subprocess.run(
            [sys.executable, "-c", INNER], env=env, check=False,
            cwd=str(pathlib.Path(__file__).resolve().parent.parent),
        )


if __name__ == "__main__":
    main()
