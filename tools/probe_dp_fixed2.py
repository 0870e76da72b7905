#!/usr/bin/env python
"""Probe 2: force a real D2H sync (np.asarray) after the loop and scale
iteration counts, so tunnel RTT, fixed per-dispatch cost and marginal
compute separate cleanly.  probe_dp_fixed.py's block_until_ready timings
came back below one tunnel RTT — not trustworthy on this backend."""
from __future__ import annotations

import pathlib
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from panvc3_tpu.ops.realign_batch import realign_device_kernel  # noqa: E402

go = np.float32(0)
ge = np.float32(-1)


def timed_sync(fn, *args, reps=3):
    np.asarray(fn(*args))  # warm (compile) + real sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, r


def make_runs(S, R, Q, lo, hi, seed=7, sort=False):
    rng = np.random.default_rng(seed)
    rl = rng.integers(lo, hi, S).astype(np.int32)
    ql = rng.integers(lo, hi, S).astype(np.int32)
    if sort:
        order = np.argsort(rl + ql, kind="stable")
        rl, ql = rl[order], ql[order]
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = rng.choice(bases, (S, R)).astype(np.uint8)
    q = rng.choice(bases, (S, Q)).astype(np.uint8)
    ref[np.arange(R)[None, :] >= rl[:, None]] = 0
    q[np.arange(Q)[None, :] >= ql[:, None]] = 0
    return ref, q, rl, ql


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


def bench_shape(S, R, Q, lo, hi, iters, sort=False, tag=""):
    ref, q, rl, ql = make_runs(S, R, Q, lo, hi, sort=sort)
    dref, dq, drl, dql = map(jax.device_put, (ref, q, rl, ql))
    zr = jax.device_put(np.zeros((S, R), np.int32))
    zq = jax.device_put(np.zeros((S, Q), np.int32))
    dt, _ = timed_sync(dp_loop, dref, dq, drl, dql, zr, zq, R, Q, iters)
    cells = int(np.sum(rl.astype(np.int64) * ql))
    print(
        f"S={S:7d} R=Q={R:3d} len[{lo},{hi}) sort={int(sort)} it={iters:4d} "
        f"{tag:10s} total {dt * 1e3:9.2f} ms  "
        f"{dt / iters * 1e3:8.4f} ms/disp  "
        f"{cells * iters / dt / 1e9:8.3f} G real",
        flush=True,
    )
    return dt


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.arange(1000).sum())
    print(f"trivial op (sync): {time.perf_counter() - t0:.2f}s", flush=True)

    # RTT floor: tiny op, synced
    t, _ = timed_sync(jax.jit(lambda x: x + 1), jnp.zeros(8))
    print(f"tiny-op sync round trip: {t * 1e3:.1f} ms", flush=True)

    # iteration scaling at the production shape -> fixed vs marginal
    for iters in (5, 20, 80):
        bench_shape(16384, 16, 16, 2, 13, iters, tag="prod")
    for iters in (5, 20):
        bench_shape(131072, 16, 16, 2, 13, iters, tag="prod")
    # sorted variants
    bench_shape(16384, 16, 16, 2, 13, 20, sort=True, tag="sorted")
    bench_shape(131072, 16, 16, 2, 13, 20, sort=True, tag="sorted")
    # 48-bucket regime
    bench_shape(16384, 48, 48, 48, 49, 20, tag="48full")
    bench_shape(16384, 48, 48, 8, 49, 20, tag="48mix")
    bench_shape(16384, 48, 48, 8, 49, 20, sort=True, tag="48mixsort")


if __name__ == "__main__":
    main()
