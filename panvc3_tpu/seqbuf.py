"""Bounded LRU store for decompressed reference contig buffers.

The reference bounds contig memory two ways: project_alignments recycles
refcounted buffers with a small spare pool
(/root/reference/libpanvc3/sequence_buffer_store.cc:14-72,
SPARE_BUFFER_COUNT=4) and rewrite_cigar keeps a 4-entry heap LRU
(/root/reference/rewrite-cigar/main.cc:51-108, MAX_SIZE=4).  Round 1
cached every contig forever — the wrong asymptote for whole-genome,
many-contig inputs.

This store keeps at most ``max_size`` unpinned buffers in LRU order.
``require()`` returns an immutable per-batch snapshot dict: buffers a
dispatched batch still references stay alive through the snapshot's
references (the Python-refcount analogue of the reference's
acquire/release), so eviction never invalidates in-flight work.
"""

from __future__ import annotations

import threading
from typing import Callable, Iterator


class SequenceBufferStore:
    """LRU-bounded mapping ``key -> bytes`` with a lazy loader.

    ``require``/``get`` are serialized by a lock: the fast lane calls them
    from pool workers (one call per batch — the lock is never hot), and
    the reference's store is likewise shared between its reader and output
    threads via atomics (sequence_buffer_store.cc:14-45)."""

    def __init__(self, load: Callable[[int], bytes], max_size: int = 4):
        self._load = load
        self._max = max(1, max_size)
        self._map: dict[int, bytes] = {}  # insertion order == LRU order
        self._lock = threading.Lock()
        self.loads = 0
        self.evictions = 0

    def _get_locked(self, key: int) -> bytes:
        if key in self._map:
            v = self._map.pop(key)  # move to most-recent position
            self._map[key] = v
            return v
        v = self._load(key)
        self.loads += 1
        self._map[key] = v
        self._evict()
        return v

    def get(self, key: int) -> bytes:
        with self._lock:
            return self._get_locked(key)

    def require(self, keys) -> dict[int, bytes]:
        """Load ``keys`` and return a snapshot dict for one batch.

        All requested keys are protected from eviction while trimming, so
        a batch needing more than ``max_size`` contigs still gets a
        complete snapshot (the bound then applies between batches)."""
        keys = list(keys)
        with self._lock:
            snap = {k: self._get_locked(k) for k in keys}
            self._evict(set(keys))
        return snap

    def _evict(self, protect: set | None = None) -> None:
        if len(self._map) <= self._max:
            return
        for k in list(self._map):
            if len(self._map) <= self._max:
                break
            if protect and k in protect:
                continue
            del self._map[k]
            self.evictions += 1

    # mapping conveniences (host oracle path reads like a dict)
    def __getitem__(self, key: int) -> bytes:
        return self.get(key)

    def __contains__(self, key: int) -> bool:
        return key in self._map

    def __len__(self) -> int:
        return len(self._map)

    def __iter__(self) -> Iterator[int]:
        return iter(self._map)
