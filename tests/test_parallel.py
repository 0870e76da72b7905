import numpy as np

from panvc3_tpu.io.sam import SamRecord
from panvc3_tpu.parallel.distributed import (
    byte_ranges,
    qname_shard,
    split_records_by_qname,
)


def test_qname_shard_stable_and_balanced():
    n = 8
    counts = [0] * n
    for i in range(4000):
        s = qname_shard(f"read{i}", n)
        assert s == qname_shard(f"read{i}", n)  # deterministic
        counts[s] += 1
    assert min(counts) > 4000 / n * 0.7  # roughly balanced


def test_split_records_keeps_groups_together():
    recs = []
    for i in range(100):
        for mate in range(2):
            recs.append(SamRecord(qname=f"pair{i}"))
    shards = split_records_by_qname(recs, 4)
    assert sum(len(s) for s in shards) == 200
    for shard in shards:
        names = {}
        for r in shard:
            names[r.qname] = names.get(r.qname, 0) + 1
        for v in names.values():
            assert v == 2  # both mates on the same shard


def test_byte_ranges_cover():
    rngs = byte_ranges(1000, 3)
    assert rngs[0][0] == 0
    assert rngs[-1][1] == 1000
    for (a, b), (c, d) in zip(rngs, rngs[1:]):
        assert b == c
