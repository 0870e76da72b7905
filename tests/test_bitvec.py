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
    gv2 = GapBitVector.from_state(st["words"], st["n"], st["block_rank0"])
    pos = np.arange(500)
    assert np.array_equal(gv.rank0(pos), gv2.rank0(pos))
