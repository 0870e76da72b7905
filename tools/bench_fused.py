"""Microbench of the fused projection kernel only (device-resident inputs,
single fori_loop dispatch) — for A/B-ing kernel formulations on the real
chip without running the whole bench.

Usage: python tools/bench_fused.py [batch_size] [iters]
Prints ms/iter and reads/s; also a SHA of the kernel outputs so two
formulations can be checked for wire identity across runs.
"""

import hashlib
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from bench import build_index_entries, synthesise_records, _enable_compilation_cache  # noqa: E402


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from panvc3_tpu.alphabet import normalise_dna5
    from panvc3_tpu.ops.engine import BatchProjector, _next_pow2
    from panvc3_tpu.ops.fused import fused_projection_kernel
    from panvc3_tpu.ops.rewrite_batch import expand_cigars

    src_entries, dst_entries, ref_id_mapping, ref_seq, founders = build_index_entries()
    records = synthesise_records(founders, batch_size)

    bp = BatchProjector(src_entries, dst_entries, ref_id_mapping, 0, -1)
    bp._ensure_refs({0: ref_seq})
    recs = records[:batch_size]
    queries = [normalise_dna5(rec.seq) for rec in recs]
    cigars = [rec.cigar for rec in recs]
    max_ops = max(len(c) for c in cigars)
    max_ref_units = max(sum(c for c, op in cig if op in "M=XDN") for cig in cigars)
    batch = expand_cigars(
        cigars,
        [rec.pos for rec in recs],
        queries,
        [bp.src_dev_ids[rec.ref_id] for rec in recs],
        [bp.dst_dev_ids[ref_id_mapping[rec.ref_id]] for rec in recs],
        [0] * len(recs),
        pad_ops=_next_pow2(max_ops),
        pad_ref_units=max(2, _next_pow2(max_ref_units)),
        pad_query=max(2, _next_pow2(max(len(q) for q in queries))),
    )
    dev = [
        jax.device_put(x)
        for x in (
            batch.src_seq, batch.dst_seq, batch.rec_src_pos, batch.ref_off,
            batch.ops, batch.counts, batch.query,
        )
    ]
    R = batch.pad_ref_units
    U = R + batch.ops.shape[1]
    pool = max(256, len(recs) // 2)
    go, ge = np.float32(0), np.float32(-1)
    ref_flat_dev = bp.ref_flat_dev
    dev_index = bp.index

    # wire-identity check: one plain call, hash all outputs
    out = fused_projection_kernel(
        dev_index, ref_flat_dev, *dev, go, ge, R, U,
        BatchProjector.FUSED_RUN_PAD, BatchProjector.FUSED_RUN_PAD, pool,
    )
    h = hashlib.sha256()
    for arr in jax.device_get(out):
        h.update(np.ascontiguousarray(arr).tobytes())
    print(f"[fused-bench] output sha256 {h.hexdigest()[:16]}", file=sys.stderr)

    @partial(jax.jit, static_argnames=("n_iters", "stage"))
    def fused_loop(args, n_iters, stage):
        def body(i, carry):
            acc, query = carry
            query = query.at[0, 0].set((acc % 4 + 65).astype(jnp.uint8))
            o = fused_projection_kernel(
                dev_index, ref_flat_dev, *args[:6], query, go, ge, R, U,
                BatchProjector.FUSED_RUN_PAD, BatchProjector.FUSED_RUN_PAD,
                pool, stage,
            )
            return acc + o[5][2], query
        return jax.lax.fori_loop(0, n_iters, body, (jnp.int32(0), args[6]))[0]

    stages = (
        (0, 1, 2, 3, 4, 5) if len(sys.argv) > 3 and sys.argv[3] == "stages"
        else (5,)
    )
    names = {
        0: "rewrite_math", 1: "+unit expand", 2: "+token stream",
        3: "+compaction", 4: "+slice gather", 5: "full",
    }
    for stage in stages:
        jax.block_until_ready(fused_loop(dev, iters, stage))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fused_loop(dev, iters, stage))
            dt = time.perf_counter() - t0
            best = min(best, dt)
        print(
            f"[fused-bench] stage {stage} ({names[stage]}): "
            f"{best / iters * 1e3:.2f} ms/iter "
            f"{batch_size * iters / best:,.0f} reads/s"
        )


if __name__ == "__main__":
    main()
