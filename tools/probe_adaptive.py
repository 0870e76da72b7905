#!/usr/bin/env python
"""Instrument the LaneController over the realign-heavy workload: log
every lane decision, span close, and EMA update to see why the adaptive
row can land below both forced lanes (VERDICT r4 weak #3)."""
from __future__ import annotations

import io
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

bench._enable_compilation_cache()

import numpy as np  # noqa: E402

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


def decide(cells):
    r = orig_decide(cells)
    log.append(("decide", "host" if r else "dev", ctl.mode, ctl.tick))
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
            ctl.mode,
        )
    )


ctl.decide = decide
ctl._close_span = close


def main():
    (
        cfg, sam, n, records, src_entries, dst_entries, ref_id_mapping,
        ref_seq, founders, batch_size, pipeline_depth,
    ) = bench._setup_headline()
    n_long = 3 * min(8, max(1, 65536 // batch_size)) * batch_size
    heavy = bench._records_to_sam(
        bench.synthesise_heavy_records(founders, n_long), src_entries
    )
    cfg = ProjectConfig(
        msa_index_path=cfg.msa_index_path,
        reference_path=cfg.reference_path,
        reference_msa_id="REF",
        ref_id_separator="/",
        tags=TagSpec(rec_idx="XI"),
        engine="device",
        device_batch_size=batch_size,
        pipeline_depth=pipeline_depth,
        status_output_interval=0,
    )
    run_project_alignments(io.BytesIO(heavy), io.BytesIO(), cfg)  # warm
    log.append(("--- timed run 1 ---",))
    t0 = time.perf_counter()
    run_project_alignments(io.BytesIO(heavy), io.BytesIO(), cfg)
    dt1 = time.perf_counter() - t0
    log.append(("--- timed run 2 ---",))
    t0 = time.perf_counter()
    run_project_alignments(io.BytesIO(heavy), io.BytesIO(), cfg)
    dt2 = time.perf_counter() - t0
    for e in log:
        print(e)
    print(
        json.dumps(
            {
                "adaptive_run1_reads_per_s": round(n_long / dt1, 1),
                "adaptive_run2_reads_per_s": round(n_long / dt2, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
