#!/usr/bin/env python
"""Instrument the LaneController over the BENCH's exact realign-heavy
sequence (forced-device runs, forced-host runs, then adaptive) — the
adaptive row lands ~163k reads/s there while the heavy-only sequence
(tools/probe_adaptive.py) converges to 205-277k in the same windows.
Logs every decision/span/override to find what the forced phase leaves
behind."""
from __future__ import annotations

import io
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

bench._enable_compilation_cache()

from panvc3_tpu.pipeline import fastlane  # noqa: E402
from panvc3_tpu.pipeline.project_alignments import (  # noqa: E402
    ProjectConfig,
    TagSpec,
    run_project_alignments,
)

log = []
ctl = fastlane._ADAPT

orig_decide = ctl.decide
orig_close = ctl._close_span

counts = {"host": 0, "dev": 0}


def decide(cells):
    r = orig_decide(cells)
    counts["host" if r else "dev"] += 1
    return r


def close():
    lane = ctl.span_lane
    reads = ctl.span_reads
    el = ctl.span_last_ns - ctl.span_start_ns
    orig_close()
    log.append(
        (
            "close", lane, reads, round(el / 1e6, 1),
            None if not reads or not el else round(el / reads, 1),
            {k: None if v is None else round(v, 1) for k, v in ctl.ns_read.items()},
            ctl.mode, "bk", ctl.backoff,
        )
    )


ctl.decide = decide
ctl._close_span = close


def main():
    (
        cfg0, sam, n, records, src_entries, dst_entries, ref_id_mapping,
        ref_seq, founders, batch_size, pipeline_depth,
    ) = bench._setup_headline()
    n_short = min(8, max(1, 65536 // batch_size)) * batch_size
    n_long = 3 * n_short
    heavy_short = bench._records_to_sam(
        bench.synthesise_heavy_records(founders, n_short), src_entries
    )
    heavy_long = bench._records_to_sam(
        bench.synthesise_heavy_records(founders, n_long), src_entries
    )
    cfg = ProjectConfig(
        msa_index_path=cfg0.msa_index_path,
        reference_path=cfg0.reference_path,
        reference_msa_id="REF",
        ref_id_separator="/",
        tags=TagSpec(rec_idx="XI"),
        engine="device",
        device_batch_size=batch_size,
        pipeline_depth=pipeline_depth,
        status_output_interval=0,
    )

    def run(tag, sam_b, env=None, repeats=1, nreads=None):
        if nreads is None:
            nreads = n_short if sam_b is heavy_short else n_long
        saved = {}
        for k, v in (env or {}).items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            best = 0.0
            for _ in range(repeats):
                counts["host"] = counts["dev"] = 0
                t0 = time.perf_counter()
                run_project_alignments(io.BytesIO(sam_b), io.BytesIO(), cfg)
                dt = time.perf_counter() - t0
                best = max(best, nreads / dt)
                log.append(
                    (f"== {tag}", round(nreads / dt / 1e3, 1), "k/s",
                     "decisions", dict(counts),
                     "mode", ctl.mode, "bk", ctl.backoff, "tick", ctl.tick)
                )
            return best
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    if os.environ.get("PROBE_SEQ_MIXED", "0") == "1":
        # reproduce the full bench: the mixed headline rows precede the
        # heavy block and leave their regime in the controller
        run("mixed warm", sam, nreads=n)
        run("mixed", sam, nreads=n, repeats=2)
    run("dev warm", heavy_short, env={"PANVC3_HOST_DP_CELLS": "0"})
    run("dev", heavy_short, env={"PANVC3_HOST_DP_CELLS": "0"}, repeats=3)
    run("host warm", heavy_short, env={"PANVC3_HOST_DP_CELLS": str(10**15)})
    run("host", heavy_short, env={"PANVC3_HOST_DP_CELLS": str(10**15)}, repeats=3)
    run("adaptive warm", heavy_long)
    a1 = run("adaptive 1", heavy_long)
    a2 = run("adaptive 2", heavy_long)
    for e in log:
        print(e)
    print(json.dumps({"a1": round(a1, 1), "a2": round(a2, 1)}))


if __name__ == "__main__":
    main()
