#!/usr/bin/env python
"""Extended randomized differential soak (beyond the CI seeds).

Runs project_alignments over random founder MSAs and read sets and
asserts byte-identical output across the host oracle engine, the device
engine (object path) and the native fast lane, sweeping the fast-lane
configuration axes (span fast path, ref-gather wire, DP aggregation,
forced host/device realign lanes, -q).  CPU backend; intended as an
offline confidence run after engine changes:

    python tools/soak.py [--seeds N] [--reads N]

Exits non-zero on the first mismatch with the seed/config that broke.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_case(seed: int, n_reads: int, workdir: str):
    from panvc3_tpu.pipeline.index_msa import build_index_from_tsv

    rng = np.random.default_rng(seed)
    L = 600
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = alpha[rng.integers(0, 4, L)]
    names = ["REF", "f1", "f2", "f3", "f4"]
    founder_seqs = {}
    gap_p = float(rng.choice([0.02, 0.1, 0.25]))
    for sid in names:
        while True:
            gaps = rng.random(L) < gap_p
            mut = rng.random(L) < 0.06
            chars = np.where(mut, alpha[rng.integers(0, 4, L)], base)
            row = np.where(gaps, ord("-"), chars).astype(np.uint8).tobytes()
            if len(row.replace(b"-", b"")) >= 220:
                break
        founder_seqs[sid] = row

    d = os.path.join(workdir, f"msa{seed}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "input.tsv"), "w") as fh:
        for sid, row in founder_seqs.items():
            path = os.path.join(d, f"{sid}.txt")
            with open(path, "wb") as f2:
                f2.write(row)
            fh.write(f"c\t{sid}\t{path}\n")
    idx = build_index_from_tsv(os.path.join(d, "input.tsv"))
    idx.save(os.path.join(d, "msa.npz"))
    ref_gapless = founder_seqs["REF"].replace(b"-", b"")
    with open(os.path.join(d, "ref.fa"), "wb") as fh:
        fh.write(b">c\n" + ref_gapless + b"\n")

    stripped = {sid: row.replace(b"-", b"") for sid, row in founder_seqs.items()}
    lines = ["@HD\tVN:1.6"]
    for sid in names:
        lines.append(f"@SQ\tSN:c/{sid}\tLN:{len(stripped[sid])}")
    read_len = 90
    n = 0
    for i in range(n_reads):
        sid = names[1 + int(rng.integers(len(names) - 1))]
        s = stripped[sid]
        if len(s) < read_len + 60:
            continue
        pos = int(rng.integers(0, len(s) - read_len - 50))
        kind = i % 4
        if kind == 0:
            cigar = f"{read_len}="
            seq = bytearray(s[pos:pos + read_len])
            # sprinkle mismatches to exercise the span compare
            for o in rng.integers(0, read_len, int(rng.integers(0, 5))):
                seq[o] = alpha[int(rng.integers(0, 4))]
            seq = bytes(seq)
        elif kind == 1:
            k = int(rng.integers(1, 6))
            half = read_len // 2
            seq = s[pos:pos + half] + s[pos + half + k:pos + half + k + (read_len - half)]
            cigar = f"{half}={k}D{read_len - half}="
        elif kind == 2:
            k = int(rng.integers(1, 6))
            j = int(rng.integers(1, 6))
            half = read_len // 2
            ins = rng.choice(alpha, k).tobytes()
            seq = (
                s[pos:pos + half] + ins
                + s[pos + half + j:pos + half + j + (read_len - half - k)]
            )
            cigar = f"{half}={k}I{j}D{read_len - half - k}="
        else:
            # large adjacent I+D run (device-lane shapes)
            k = int(rng.integers(16, 33))
            half = (read_len - k) // 2
            ins = rng.choice(alpha, k).tobytes()
            seq = s[pos:pos + half] + ins + s[
                pos + half + k:pos + half + k + (read_len - half - k)
            ]
            cigar = f"{half}={k}I{k}D{read_len - half - k}="
        qual = "".join(chr(33 + int(x)) for x in rng.integers(10, 42, len(seq)))
        lines.append(
            f"q{i}\t0\tc/{sid}\t{pos + 1}\t60\t{cigar}\t*\t0\t0\t"
            f"{seq.decode()}\t{qual}\tNM:i:0\tXS:i:-5"
        )
        n += 1
    sam = ("\n".join(lines) + "\n").encode()
    return d, sam, n


CONFIGS = [
    # (label, env overrides, fastlane, engine, use_quality)
    ("host-oracle", {}, False, "host", False),
    ("device-object", {}, False, "device", False),
    ("fastlane", {}, True, "device", False),
    ("fastlane-nospan", {"PANVC3_SPAN_FAST": "0"}, True, "device", False),
    ("fastlane-devlane-rg", {"PANVC3_HOST_DP": "0",
                             "PANVC3_DP_REFGATHER": "1"}, True, "device", False),
    ("fastlane-devlane-norg", {"PANVC3_HOST_DP": "0",
                               "PANVC3_DP_REFGATHER": "0"}, True, "device", False),
    ("fastlane-noagg", {"PANVC3_HOST_DP": "0",
                        "PANVC3_DP_AGGREGATE": "0"}, True, "device", False),
    ("fastlane-hostdp", {"PANVC3_HOST_DP_CELLS": str(10**15)}, True,
     "device", False),
    # fused single-dispatch kernels (ADVICE r3's high-severity bug lived
    # in the v4 segment decode — keep them under the randomized
    # differential; FUSED_RUN_PAD is raised in run_config so the device
    # DP path engages instead of the host fallback)
    ("fused-v4", {"PANVC3_FUSED_EVENT": "1", "_FUSED": "1"}, False,
     "device", False),
    ("fused-v3-gapmath", {"PANVC3_FUSED_EVENT": "0", "_FUSED": "1"}, False,
     "device", False),
    # event-geometry variants of the fast lane's rewrite stage
    ("fastlane-devgeo", {"PANVC3_EVENT_GEOMETRY": "device"}, True,
     "device", False),
    ("fastlane-gapkernel", {"PANVC3_EVENT_GEOMETRY": "0"}, True,
     "device", False),
    # r5 aggregate-dispatch variants: 2-bit query wire and length-sorted
    # windows off (defaults are on), and chaos scheduling jitter
    ("fastlane-devlane-nowire2", {"PANVC3_HOST_DP": "0",
                                  "PANVC3_DP_WIRE2": "0"}, True,
     "device", False),
    ("fastlane-devlane-nosort", {"PANVC3_HOST_DP": "0",
                                 "PANVC3_DP_AGG_SORT": "0"}, True,
     "device", False),
    ("fastlane-chaos", {"PANVC3_FASTLANE_CHAOS": "7"}, True,
     "device", False),
]

Q_CONFIGS = [
    ("q-fastlane", {}, True, "device", True),
    ("q-devlane", {"PANVC3_HOST_DP": "0"}, True, "device", True),
    ("q-devlane-nowire2", {"PANVC3_HOST_DP": "0",
                           "PANVC3_DP_WIRE2": "0"}, True, "device", True),
    ("q-hostdp", {"PANVC3_HOST_DP_CELLS": str(10**15)}, True, "device", True),
]


def run_config(d, sam, label, env, fastlane, engine, use_quality):
    from panvc3_tpu.pipeline.project_alignments import (
        ProjectConfig,
        TagSpec,
        run_project_alignments,
    )

    import panvc3_tpu.ops.engine as eng

    env = dict(env)
    fused = env.pop("_FUSED", None) is not None
    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    saved_pad = eng.BatchProjector.FUSED_RUN_PAD
    if fused:
        eng.BatchProjector.FUSED_RUN_PAD = 64
    try:
        cfg = ProjectConfig(
            msa_index_path=os.path.join(d, "msa.npz"),
            reference_path=os.path.join(d, "ref.fa"),
            reference_msa_id="REF",
            ref_id_separator="/",
            tags=TagSpec(rec_idx="XI"),
            engine=engine,
            fastlane=fastlane,
            fused_kernel=fused,
            device_batch_size=64,
            use_read_base_qualities=use_quality,
            status_output_interval=0,
        )
        out = io.BytesIO()
        run_project_alignments(io.BytesIO(sam), out, cfg)
        return out.getvalue()
    finally:
        eng.BatchProjector.FUSED_RUN_PAD = saved_pad
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=24)
    ap.add_argument("--reads", type=int, default=400)
    args = ap.parse_args()

    failures = 0
    with tempfile.TemporaryDirectory() as workdir:
        for seed in range(args.seeds):
            d, sam, n = build_case(1000 + seed, args.reads, workdir)
            ref_out = None
            for label, env, fastlane, engine, uq in CONFIGS:
                out = run_config(d, sam, label, env, fastlane, engine, uq)
                if ref_out is None:
                    ref_out = out
                elif out != ref_out:
                    print(f"MISMATCH seed={seed} config={label}")
                    failures += 1
            # -q: device/fast-lane paths must agree with each other (the
            # float64 host oracle may pick co-optimal ties differently)
            q_ref = None
            for label, env, fastlane, engine, uq in Q_CONFIGS:
                out = run_config(d, sam, label, env, fastlane, engine, uq)
                if q_ref is None:
                    q_ref = out
                elif out != q_ref:
                    print(f"MISMATCH seed={seed} config={label}")
                    failures += 1
            print(f"seed {seed}: {n} reads x {len(CONFIGS) + len(Q_CONFIGS)} "
                  f"configs ok", flush=True)
    if failures:
        sys.exit(f"{failures} mismatching configurations")
    print("soak clean")


if __name__ == "__main__":
    main()
