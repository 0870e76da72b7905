import numpy as np
import pytest

from panvc3_tpu.bitvec import GapBitVector, pack_bits, unpack_bits
from panvc3_tpu.msa_index import make_sequence_entry_pair


def brute_rank0(bits, pos):
    return int(np.sum(bits[:pos] == 0))


def brute_select0(bits, k):
    zeros = np.flatnonzero(bits == 0)
    return int(zeros[k - 1])


@pytest.mark.parametrize("n", [1, 31, 32, 33, 64, 100, 1000, 4097])
def test_pack_unpack_roundtrip(n):
    rng = np.random.default_rng(n)
    bits = rng.integers(0, 2, size=n).astype(np.uint8)
    assert np.array_equal(unpack_bits(pack_bits(bits), n), bits)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [1, 40, 64, 333, 2048])
def test_rank0_select0_match_bruteforce(seed, n):
    rng = np.random.default_rng(seed * 1000 + n)
    bits = (rng.random(n) < 0.3).astype(np.uint8)
    bits[0] = 0  # ensure at least one zero
    gv = GapBitVector.from_bits(bits)
    assert gv.n_zeros == int(np.sum(bits == 0))

    positions = np.arange(n)
    expected_rank = np.array([brute_rank0(bits, p) for p in positions])
    assert np.array_equal(gv.rank0(positions), expected_rank)

    ks = np.arange(1, gv.n_zeros + 1)
    expected_sel = np.array([brute_select0(bits, k) for k in ks])
    assert np.array_equal(gv.select0(ks), expected_sel)

    # bit_at
    assert np.array_equal(gv.bit_at(positions), bits)


def test_from_gap_string():
    gv = GapBitVector.from_gap_string("GAT-ACA")
    assert len(gv) == 7
    assert gv.n_zeros == 6
    assert gv[3] == 1
    assert gv[0] == 0


def test_projection_semantics():
    # msa_index.hh:239-258 semantics on the SURVEY example pair.
    src, dst = make_sequence_entry_pair("GAT-ACA", "GATTACA")
    # unaligned src position 3 ('A' after the gap) -> aligned 4 -> dst 4
    assert int(src.aligned_position(3)) == 4
    assert int(src.project_position(3, dst)) == 4
    # dst position 3 ('T') projects to src: aligned 3 is a gap in src,
    # rank0 gives 3 (number of src non-gaps before the gap column)
    assert int(dst.project_position(3, src)) == 3


def test_serialisation_state_roundtrip():
    rng = np.random.default_rng(7)
    bits = (rng.random(500) < 0.4).astype(np.uint8)
    gv = GapBitVector.from_bits(bits)
    st = gv.state()
    gv2 = GapBitVector.from_state(
        st["words"], st["n"], st["sb_rank0"], st["rel_rank0"]
    )
    pos = np.arange(500)
    assert np.array_equal(gv.rank0(pos), gv2.rank0(pos))
    # rebuilding the directory from the words alone (v1-archive load path)
    gv3 = GapBitVector.from_state(st["words"], st["n"])
    assert np.array_equal(gv3.sb_rank0, gv.sb_rank0)
    assert np.array_equal(gv3.rel_rank0, gv.rel_rank0)


@pytest.mark.parametrize("n", [255, 256, 8192, 8193, 70000])
def test_rank_directory_boundaries(n):
    """rank0/select0 across block (256-bit) and superblock (8192-bit)
    boundaries, including the pos == n and k == n_zeros edges."""
    rng = np.random.default_rng(n)
    bits = (rng.random(n) < 0.15).astype(np.uint8)
    bits[-1] = 0
    gv = GapBitVector.from_bits(bits)
    zeros = np.flatnonzero(bits == 0)
    csum = np.r_[0, np.cumsum(bits == 0)]
    # all block/superblock edges plus the extremes
    edges = np.unique(np.clip(np.r_[
        0, 1, n - 1, n,
        np.arange(0, n + 1, 256), np.arange(0, n + 1, 8192),
        np.arange(255, n, 256), rng.integers(0, n + 1, 64),
    ], 0, n))
    assert np.array_equal(gv.rank0(edges), csum[edges])
    ks = np.unique(np.clip(np.r_[
        1, gv.n_zeros, rng.integers(1, gv.n_zeros + 1, 128),
    ], 1, gv.n_zeros))
    assert np.array_equal(gv.select0(ks), zeros[ks - 1])


def test_load_v1_index_archive(tmp_path):
    """v1 archives (per-word int64 rank arrays) still load; the two-level
    directory is rebuilt from the packed words."""
    from panvc3_tpu.msa_index import MAGIC, MsaIndex

    rng = np.random.default_rng(3)
    bits = (rng.random(700) < 0.2).astype(np.uint8)
    gv = GapBitVector.from_bits(bits)
    # per-word rank array exactly as FORMAT_VERSION=1 wrote it
    v1_rank = gv._word_rank0()
    arrays = {
        "__magic__": np.frombuffer(MAGIC.encode(), dtype=np.uint8),
        "__version__": np.array([1], dtype=np.int64),
        "__names__": np.frombuffer(b"chr1\tREF\te0_0", dtype=np.uint8),
        "e0_0_words": gv.words,
        "e0_0_n": np.array([gv.n], dtype=np.int64),
        "e0_0_rank": v1_rank,
    }
    p = tmp_path / "v1.npz"
    with open(p, "wb") as fh:
        np.savez_compressed(fh, **arrays)
    idx = MsaIndex.load(str(p))
    entry = idx.find("chr1", "REF")
    pos = np.arange(700)
    assert np.array_equal(entry.gaps.rank0(pos), gv.rank0(pos))
    ks = np.arange(1, gv.n_zeros + 1)
    assert np.array_equal(entry.gaps.select0(ks), gv.select0(ks))


def test_rank_directory_memory_overhead():
    """The resident rank directory must stay v5-class: < 0.08 bits per
    column on top of the 1-bit packed words (the genome-scale memory
    contract replacing the reference's rrr_vector, msa_index.hh:43-54)."""
    n = 4_000_000
    rng = np.random.default_rng(11)
    gv = GapBitVector.from_bits((rng.random(n) < 0.02).astype(np.uint8))
    directory_bits = 8 * (gv.sb_rank0.nbytes + gv.rel_rank0.nbytes)
    assert directory_bits / n < 0.08
    assert 8 * gv.nbytes / n < 1.1


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scalar_paths_match_vector(seed):
    """The pure-Python scalar rank0/select0 walks (the host oracle's
    per-base fast path, incl. the consecutive-query caches) must answer
    identically to the vectorised numpy paths in every access pattern:
    sequential, repeated, random, and interleaved across both queries."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 20_000))
    bits = (rng.random(n) < rng.uniform(0.02, 0.98)).astype(np.uint8)
    gv = GapBitVector.from_bits(bits)
    nz = gv.n_zeros
    vec_r = gv.rank0(np.arange(n + 1, dtype=np.int64))
    vec_s = gv.select0(np.arange(1, nz + 1, dtype=np.int64)) if nz else None
    # sequential select0 walk exercises the next-clear-bit cache
    for k in range(1, nz + 1):
        assert gv.select0(k) == vec_s[k - 1]
    # monotone rank0 walk exercises the incremental-count cache
    q = 0
    while q <= n:
        assert gv.rank0(q) == vec_r[q]
        q += int(rng.integers(1, 50))
    # random interleave with repeats (cache misses + k==last_k hits)
    for _ in range(400):
        if nz:
            k = int(rng.integers(1, nz + 1))
            assert gv.select0(k) == vec_s[k - 1]
            assert gv.select0(k) == vec_s[k - 1]
            if k < nz:
                assert gv.select0(k + 1) == vec_s[k]
        q = int(rng.integers(0, n + 1))
        assert gv.rank0(q) == vec_r[q]


def test_scalar_paths_degenerate_vectors():
    """All-zero / all-one / tiny vectors through the scalar walks."""
    for bits in (
        np.zeros(1000, np.uint8),
        np.ones(1000, np.uint8),
        np.zeros(3, np.uint8),
        np.array([1, 0, 1], np.uint8),
        np.array([0], np.uint8),
        np.array([1], np.uint8),
    ):
        gv = GapBitVector.from_bits(bits)
        n = len(bits)
        vec_r = gv.rank0(np.arange(n + 1, dtype=np.int64))
        for q in range(n + 1):
            assert gv.rank0(q) == vec_r[q]
        if gv.n_zeros:
            vec_s = gv.select0(np.arange(1, gv.n_zeros + 1, dtype=np.int64))
            for k in range(1, gv.n_zeros + 1):
                assert gv.select0(k) == vec_s[k - 1]
