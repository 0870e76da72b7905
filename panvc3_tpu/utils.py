"""Observability: periodic status output, timing, memory logging.

TPU-era counterpart of the reference's status threads and counters
(/root/reference/project-alignments/project_alignments.cc:446-526,
 recalculate-mapq/main.cc:1198-1225, libbio log_memory_usage)."""

from __future__ import annotations

import resource
import sys
import time


def log_time(msg: str, file=sys.stderr) -> None:
    """Timestamped stderr line (libbio lb::log_time convention)."""
    ts = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())
    print(f"[{ts}] {msg}", file=file, flush=True)


def format_duration(seconds: float) -> str:
    s = int(seconds)
    h, s = divmod(s, 3600)
    m, s = divmod(s, 60)
    if h:
        return f"{h} h {m} min {s} s"
    if m:
        return f"{m} min {s} s"
    return f"{s} s"


class StatusReporter:
    """Interval-based progress reporting from the record loop.

    The reference uses a timer thread; here the hot loop calls ``tick()``
    (cheap clock check) and the report fires when the interval has elapsed.
    ``interval_minutes=0`` disables reporting, like the reference's
    ``--status-output-interval=0``.
    """

    def __init__(self, interval_minutes: int, what: str = "records"):
        self.interval = interval_minutes * 60.0
        self.what = what
        self.start = time.monotonic()
        self.last = self.start
        self.extra_cb = None

    def tick(self, n_processed: int) -> None:
        if not self.interval:
            return
        now = time.monotonic()
        if now - self.last < self.interval:
            return
        self.last = now
        elapsed = now - self.start
        msg = f"Time spent processing: {format_duration(elapsed)}; processed {n_processed} {self.what}"
        if n_processed:
            usecs = elapsed * 1e6 / n_processed
            msg += f" (in {usecs:.2f} µs / record)"
        if self.extra_cb is not None:
            msg += self.extra_cb()
        log_time(msg + ".")

    def final(self, n_processed: int) -> None:
        elapsed = time.monotonic() - self.start
        msg = f"Done; processed {n_processed} {self.what} in {format_duration(elapsed)}"
        if n_processed and elapsed > 0:
            msg += f" ({n_processed / elapsed:.0f} {self.what}/s)"
        log_time(msg + ".")


_compile_cache_enabled = False


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache for device-engine tool runs.

    TPU compiles are expensive (minutes per fresh realign/rewrite shape
    over the axon tunnel); caching them on disk makes every tool run
    after the first start warm.  CPU runs skip it (compiles are cheap and
    tests should not write cache files).  PANVC3_COMPILE_CACHE=0
    disables; JAX_COMPILATION_CACHE_DIR overrides the default
    ~/.cache/panvc3_tpu/jax."""
    global _compile_cache_enabled
    if _compile_cache_enabled:
        return
    _compile_cache_enabled = True
    import os

    if os.environ.get("PANVC3_COMPILE_CACHE") == "0":
        return
    try:
        import jax

        if getattr(jax.config, "jax_compilation_cache_dir", None):
            return  # caller (e.g. bench.py) already configured a cache
        if jax.default_backend() != "tpu":
            return
        d = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "panvc3_tpu", "jax"
        )
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimisation only
        pass


def log_peak_memory(file=sys.stderr) -> int:
    """Log and return peak RSS in bytes (the role of libbio's
    log_memory_usage)."""
    kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(f"Peak RSS: {kb / 1024:.1f} MiB", file=file, flush=True)
    return kb * 1024
