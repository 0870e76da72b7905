#!/usr/bin/env python
"""Decompose the fused-DP dispatch cost: fixed per-dispatch overhead vs
marginal per-tile cost, and what sorting runs by length buys.

Context (VERDICT r4 weak #1): bench.py's kernel_dp_cell_updates_per_s at
S=16384, R=Q=16, lengths U[2,13) measures ~594M real cells/s = ~1.35 ms
per dispatch, while the same kernel sustains ~16G padded cells/s at
48x48 — so ~87% of the production-shape dispatch is overhead, not DP.
This probe separates: (a) per-dispatch fixed cost (vary S), (b) the
pre/post XLA transposes, (c) dynamic-bound savings from sorting lanes by
length, (d) the per-tile cost at different TILE counts.

Run on the tunnelled TPU:  python tools/probe_dp_fixed.py
"""
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
from panvc3_tpu.ops.realign_pallas_fused import (  # noqa: E402
    TILE_B,
    _kernel,
)
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

go = np.float32(0)
ge = np.float32(-1)
ITERS = 20


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return time.perf_counter() - t0


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


def bench_shape(S, R, Q, lo, hi, sort=False, tag=""):
    ref, q, rl, ql = make_runs(S, R, Q, lo, hi, sort=sort)
    dref, dq, drl, dql = map(jax.device_put, (ref, q, rl, ql))
    zr = jax.device_put(np.zeros((S, R), np.int32))
    zq = jax.device_put(np.zeros((S, Q), np.int32))
    dt = timed(dp_loop, dref, dq, drl, dql, zr, zq, R, Q, ITERS)
    cells = int(np.sum(rl.astype(np.int64) * ql))
    per_disp = dt / ITERS
    print(
        f"S={S:7d} R=Q={R:3d} len[{lo},{hi}) sort={int(sort)} {tag:12s} "
        f"{per_disp * 1e3:8.3f} ms/dispatch  "
        f"{cells * ITERS / dt / 1e9:7.3f} G real  "
        f"{S * R * Q * ITERS / dt / 1e9:7.3f} G padded",
        flush=True,
    )
    return per_disp


# -- raw pallas-only variant: no transposes, pre-staged (R, S)/(Q, S) ----
@partial(jax.jit, static_argnames=("R", "Q", "n_iters"))
def dp_loop_raw(ref_t, q_t, m2, n2, R, Q, n_iters):
    bp = ref_t.shape[1]
    go2 = jnp.asarray(go, jnp.float32).reshape(1, 1)
    ge2 = jnp.asarray(ge, jnp.float32).reshape(1, 1)
    smem = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [
        smem, smem,
        pl.BlockSpec((R, TILE_B), lambda b: (0, b)),
        pl.BlockSpec((Q, TILE_B), lambda b: (0, b)),
        pl.BlockSpec((1, TILE_B), lambda b: (0, b)),
        pl.BlockSpec((1, TILE_B), lambda b: (0, b)),
    ]
    kern = partial(_kernel, R=R, Q=Q, has_sub=False, has_qual=False)

    def call(ref_t_):
        return pl.pallas_call(
            kern,
            grid=(bp // TILE_B,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((R + Q, 1, TILE_B), lambda b: (0, 0, b)),
                pl.BlockSpec((1, TILE_B), lambda b: (0, b)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((R + Q, 1, bp), jnp.int32),
                jax.ShapeDtypeStruct((1, bp), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((Q + 1, (R + 1 + 7) // 8, TILE_B), jnp.int32),
            ],
        )(go2, ge2, ref_t_, q_t, m2, n2)

    def body(i, carry):
        acc, ref_ = carry
        ref_ = ref_.at[0, 0].set((acc % 4 + 65).astype(jnp.uint8))
        ops_t, count_t = call(ref_)
        return acc + count_t[0, 0] + ops_t[0, 0, 0], ref_
    return jax.lax.fori_loop(0, n_iters, body, (jnp.int32(0), ref_t))[0]


def bench_raw(S, R, Q, lo, hi, sort=False, tag="raw-pallas"):
    ref, q, rl, ql = make_runs(S, R, Q, lo, hi, sort=sort)
    ref_t = jax.device_put(np.ascontiguousarray(ref.T))
    q_t = jax.device_put(np.ascontiguousarray(q.T))
    m2 = jax.device_put(ql.reshape(1, S))  # m = query len
    n2 = jax.device_put(rl.reshape(1, S))
    dt = timed(dp_loop_raw, ref_t, q_t, m2, n2, R, Q, ITERS)
    cells = int(np.sum(rl.astype(np.int64) * ql))
    per_disp = dt / ITERS
    print(
        f"S={S:7d} R=Q={R:3d} len[{lo},{hi}) sort={int(sort)} {tag:12s} "
        f"{per_disp * 1e3:8.3f} ms/dispatch  "
        f"{cells * ITERS / dt / 1e9:7.3f} G real  "
        f"{S * R * Q * ITERS / dt / 1e9:7.3f} G padded",
        flush=True,
    )
    return per_disp


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.arange(1000).sum())
    print(f"trivial op: {time.perf_counter() - t0:.2f}s", flush=True)

    # fixed-vs-marginal: vary S at the production shape
    for S in (2048, 8192, 16384, 65536, 131072):
        bench_shape(S, 16, 16, 2, 13, tag="prod-shape")
    # sorting lanes by length (per-tile dynamic bounds tighten)
    for S in (16384, 131072):
        bench_shape(S, 16, 16, 2, 13, sort=True, tag="sorted")
    # raw pallas (no XLA transposes around the call)
    for S in (16384, 131072):
        bench_raw(S, 16, 16, 2, 13)
        bench_raw(S, 16, 16, 2, 13, sort=True, tag="raw+sorted")
    # the 48x48 capability point for reference
    bench_shape(16384, 48, 48, 48, 49, tag="48x48-full")
    # heterogeneous 48-bucket mixture (the aggregate window's regime)
    bench_shape(16384, 48, 48, 8, 49, tag="48-mix")
    bench_shape(16384, 48, 48, 8, 49, sort=True, tag="48-mix-sort")


if __name__ == "__main__":
    main()
