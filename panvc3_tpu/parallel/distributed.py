"""Multi-host execution helpers.

The reference is strictly single-machine (SURVEY §2.5); scaling the
projection pipeline across hosts is data-parallel over reads:

- each host parses its own slice of the input (byte-range splits of the
  SAM/BAM, aligned to record boundaries),
- the MSA index and reference bytes are replicated per host,
- the global mesh `dp` axis spans all hosts' devices; per-batch execution
  is identical to single-host (no cross-device traffic in the kernels; the
  only collective is the statistics all-reduce),
- downstream MAPQ recalculation requires whole QNAME groups on one shard:
  :func:`qname_shard` routes reads by QNAME hash so groups stay host-local
  (the cheaper design noted in SURVEY §5 — no cross-host merges).
"""

from __future__ import annotations

import hashlib


def initialise(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialise jax.distributed when running multi-host (no-op single
    host)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def qname_shard(qname: str, n_shards: int) -> int:
    """Stable shard id for a read name.

    Uses a fixed hash (not Python's randomized ``hash``) so every process
    routes identically.  All records of a template share a QNAME, so MAPQ
    groups and mate pairs land on the same shard.
    """
    h = hashlib.blake2b(qname.encode(), digest_size=8).digest()
    return int.from_bytes(h, "little") % n_shards


def split_records_by_qname(records, n_shards: int):
    """Partition an iterable of SamRecords into n_shards lists, QNAME-local."""
    shards = [[] for _ in range(n_shards)]
    for rec in records:
        shards[qname_shard(rec.qname, n_shards)].append(rec)
    return shards


def byte_ranges(total_size: int, n_shards: int) -> list[tuple[int, int]]:
    """Even byte-range splits for per-host input reading; the reader must
    scan forward to the first record boundary inside its range."""
    step = total_size // n_shards
    ranges = []
    for i in range(n_shards):
        start = i * step
        end = total_size if i == n_shards - 1 else (i + 1) * step
        ranges.append((start, end))
    return ranges
