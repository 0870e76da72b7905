"""Property-style randomized tests (the role of the reference's rapidcheck
suite, /root/reference/tests/rewrite_cigar_arbitrary.cc and
indel_run_checker_arbitrary.cc): construct random MSAs and alignments whose
expected projections are known from the construction itself."""

import numpy as np
import pytest

from panvc3_tpu.cigar import (
    cigar_eq,
    cigar_query_length,
    cigar_ref_length,
    format_cigar,
)
from panvc3_tpu.indel_runs import find_indel_runs
from panvc3_tpu.msa_index import make_sequence_entry_pair
from panvc3_tpu.rewrite import rewrite_cigar


def _random_identical_msa(rng, n):
    """src == dst except for gap placement: projecting a read sampled from
    src must reproduce an equivalent alignment on dst."""
    base = "".join("ACGT"[int(x)] for x in rng.integers(0, 4, n))
    # insert gaps independently into both rows over a common spine
    src_parts = []
    dst_parts = []
    for c in base:
        if rng.random() < 0.15:
            src_parts.append("-")
            dst_parts.append(c)
        elif rng.random() < 0.15:
            src_parts.append(c)
            dst_parts.append("-")
        else:
            src_parts.append(c)
            dst_parts.append(c)
    return "".join(src_parts), "".join(dst_parts)


@pytest.mark.parametrize("seed", range(8))
def test_rewrite_preserves_query_and_consistency(seed):
    rng = np.random.default_rng(seed)
    src, dst = _random_identical_msa(rng, 120)
    se, de = make_sequence_entry_pair(src, dst)
    src_gapless = src.replace("-", "")
    dst_gapless = dst.replace("-", "")
    if len(src_gapless) < 30:
        pytest.skip("degenerate")

    for _ in range(10):
        read_len = int(rng.integers(5, 25))
        pos = int(rng.integers(0, len(src_gapless) - read_len))
        query = src_gapless[pos:pos + read_len]
        dst_pos, out = rewrite_cigar(
            pos, [(read_len, "=")], se, de, query, dst_gapless
        )
        # invariants: query fully consumed; ref span within dst; all
        # non-indel ops are matches (the read IS the source row, and the
        # rows share their non-gap spine)
        assert cigar_query_length(out) == read_len
        assert dst_pos + cigar_ref_length(out) <= len(dst_gapless)
        assert all(op in "=IDX" for _, op in out), format_cigar(out)
        # characters at '=' positions really match
        qpos, rpos = 0, dst_pos
        for n, op in out:
            if op == "=":
                assert query[qpos:qpos + n] == dst_gapless[rpos:rpos + n]
            if op in "=X":
                qpos += n
                rpos += n
            elif op == "I":
                qpos += n
            elif op == "D":
                rpos += n


@pytest.mark.parametrize("seed", range(10))
def test_rewrite_matches_constructed_expectation(seed):
    """Mirror of rewrite_cigar_arbitrary.cc:1036-1090: build a two-row
    MSA from typed columns so the expected projected position AND the
    full expected CIGAR are derived from the construction itself, then
    check rewrite_cigar reproduces them (cigar_eq, indel-run-permutation
    insensitive)."""
    from panvc3_tpu.cigar import cigar_eq, collapse_cigar

    rng = np.random.default_rng(300 + seed)
    n = 160
    # column types: 0 both-match, 1 mismatch, 2 src-gap (dst char),
    # 3 dst-gap (src char), 4 both-gap (no-op column)
    kinds = rng.choice(5, size=n, p=[0.55, 0.1, 0.13, 0.13, 0.09])
    src_parts, dst_parts = [], []
    for k in kinds:
        c = "ACGT"[int(rng.integers(0, 4))]
        if k == 0:
            src_parts.append(c)
            dst_parts.append(c)
        elif k == 1:
            src_parts.append(c)
            dst_parts.append("ACGT"[("ACGT".index(c) + 1) % 4])
        elif k == 2:
            src_parts.append("-")
            dst_parts.append(c)
        elif k == 3:
            src_parts.append(c)
            dst_parts.append("-")
        else:
            src_parts.append("-")
            dst_parts.append("-")
    src = "".join(src_parts)
    dst = "".join(dst_parts)
    se, de = make_sequence_entry_pair(src, dst)
    src_gapless = src.replace("-", "")
    dst_gapless = dst.replace("-", "")
    if len(src_gapless) < 20:
        pytest.skip("degenerate")

    src_cols = [i for i, ch in enumerate(src) if ch != "-"]
    for _ in range(10):
        read_len = int(rng.integers(4, min(20, len(src_gapless))))
        pos = int(rng.integers(0, len(src_gapless) - read_len + 1))
        query = src_gapless[pos:pos + read_len]

        # expected: walk the aligned columns covered by the read
        lo_col = src_cols[pos]
        hi_col = src_cols[pos + read_len - 1]
        exp_pos = sum(
            1 for i in range(lo_col) if dst[i] != "-"
        )
        expected = []
        for i in range(lo_col, hi_col + 1):
            s, d = src[i], dst[i]
            if s != "-" and d != "-":
                expected.append((1, "=" if s == d else "X"))
            elif s != "-" and d == "-":
                expected.append((1, "I"))
            elif s == "-" and d != "-":
                expected.append((1, "D"))
            # both gaps: nothing
        expected = collapse_cigar(expected)

        dst_pos, out = rewrite_cigar(
            pos, [(read_len, "=")], se, de, query, dst_gapless
        )
        assert dst_pos == exp_pos
        assert cigar_eq(out, expected, count_padding=True), (
            f"{format_cigar(out)} != {format_cigar(expected)} @ {pos}"
        )


@pytest.mark.parametrize("seed", range(8))
def test_indel_run_checker_reports_exactly_the_ID_runs(seed):
    """Mirror of indel_run_checker_arbitrary.cc: generate random op
    sequences; the checker must report exactly the maximal runs containing
    both I and D."""
    rng = np.random.default_rng(100 + seed)
    ops = []
    for _ in range(int(rng.integers(1, 20))):
        op = "MIDNS=XHP"[int(rng.integers(0, 9))]
        ops.append((int(rng.integers(1, 5)), op))

    runs = find_indel_runs(ops, 0)

    # recompute expected runs naively
    expected = []
    cur = set()
    start = None
    for i, (n, op) in enumerate(ops):
        if op in "ID":
            if start is None:
                start = i
            cur.add(op)
        else:
            if start is not None and cur == {"I", "D"}:
                expected.append((start, i))
            start = None
            cur = set()
    if start is not None and cur == {"I", "D"}:
        expected.append((start, len(ops)))

    assert [(r.cigar_start, r.cigar_end) for r in runs] == expected

    # ranges consistent with op spans
    for r in runs:
        seg = ops[r.cigar_start:r.cigar_end]
        assert r.ref_length == sum(n for n, op in seg if op == "D")
        assert r.query_length == sum(n for n, op in seg if op == "I")


@pytest.mark.parametrize("seed", range(4))
def test_cigar_eq_run_permutation_property(seed):
    """cigar_eq must be invariant under permuting ops inside an indel run."""
    rng = np.random.default_rng(200 + seed)
    base = [(3, "="), (2, "I"), (1, "D"), (2, "I"), (4, "="), (1, "X")]
    run = [(2, "I"), (1, "D"), (2, "I")]
    for _ in range(5):
        perm = list(run)
        rng.shuffle(perm)
        other = [(3, "=")] + perm + [(4, "="), (1, "X")]
        assert cigar_eq(base, other)
    # changing counts breaks it
    assert not cigar_eq(base, [(3, "="), (5, "I"), (4, "="), (1, "X")])


def test_format_float_roundtrips_float32():
    """format_float must emit a string that parses back to the exact same
    float32 (std::to_chars shortest-round-trip contract,
    recalculate-mapq/main.cc YS tag output) for a wide value sweep."""
    import numpy as np

    from panvc3_tpu.io.sam import format_float

    rng = np.random.default_rng(17)
    vals = [0.0, 1.0, -1.0, 0.5, 1.5, 0.1, 1e-5, 1.23e-5, 3.4e38, 1e16,
            -2.5e-7, 123456.78, 6.02e23]
    vals += [float(np.float32(x)) for x in rng.normal(0, 1e3, 200)]
    vals += [float(np.float32(x)) for x in 10.0 ** rng.uniform(-30, 30, 200)]
    for v in vals:
        s = format_float(v)
        assert np.float32(s) == np.float32(v), (v, s)
        # small integral floats print as plain integers (fixed form wins
        # until scientific is strictly shorter, e.g. 100000 -> "1e+05")
        f = np.float32(v)
        if f == int(f) and abs(f) < 1e4:
            assert "." not in s and "e" not in s, (v, s)


def test_format_float_matches_std_to_chars_golden():
    """format_float (and the C formatter) must equal real std::to_chars
    output byte for byte.  tests/data/to_chars_f32_golden.tsv holds
    12,811 (float32 bit pattern, to_chars string) pairs generated with
    libstdc++'s std::to_chars: random patterns, every exponent at mantissa
    corners (binade-boundary asymmetric rounding intervals), dense small
    values, and the special values."""
    import numpy as np

    from panvc3_tpu.io.sam import format_float
    from panvc3_tpu.native import get_native

    from .conftest import DATA_DIR

    nat = get_native()
    n = 0
    with open(DATA_DIR / "to_chars_f32_golden.tsv") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            u, expect = line.rstrip("\n").split("\t")
            f = float(np.uint32(int(u)).view(np.float32))
            assert format_float(f) == expect, (u, expect)
            if nat is not None and hasattr(nat, "format_float_c"):
                assert nat.format_float_c(f) == expect, (u, expect)
            n += 1
    assert n > 12_000


def test_format_float_c_matches_python():
    """The C tag formatter (native format_float_c, used by the GIL-free
    splice_apply_format loop) must match io/sam.format_float byte for byte
    on random float32 bit patterns and the special values."""
    import numpy as np
    import pytest

    from panvc3_tpu.io.sam import format_float
    from panvc3_tpu.native import get_native

    nat = get_native()
    if nat is None or not hasattr(nat, "format_float_c"):
        pytest.skip("native extension not built")

    rng = np.random.default_rng(23)
    bits = rng.integers(0, 2**32, size=200_000, dtype=np.uint64)
    vals = bits.astype(np.uint32).view(np.float32)
    for v in vals:
        fv = float(v)
        assert nat.format_float_c(fv) == format_float(fv), hex(
            np.float32(fv).view(np.uint32)
        )
    for fv in [0.0, -0.0, float("inf"), float("-inf"), float("nan"),
               1e-45, -1.4e-45, 3.4e38, 1e-4, 0.000123, 65504.0, 1e16,
               9999999.5, -2.5]:
        assert nat.format_float_c(fv) == format_float(fv), fv


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_full_tool_random_msa_differential(seed, tmp_path):
    """End-to-end project_alignments over a RANDOM founder MSA: the host
    oracle engine and the device/fast-lane engine must emit identical
    bytes.  Exercises the event-geometry tables, rewrite, realignment and
    tag surgery on MSA shapes beyond the bundled toy data."""
    import io

    from panvc3_tpu.pipeline.index_msa import build_index_from_tsv
    from panvc3_tpu.pipeline.project_alignments import (
        ProjectConfig,
        TagSpec,
        run_project_alignments,
    )

    rng = np.random.default_rng(seed)
    L = 400
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = alpha[rng.integers(0, 4, L)]
    names = ["REF", "f1", "f2", "f3"]
    founder_seqs = {}
    for sid in names:
        while True:
            gaps = rng.random(L) < 0.15
            mut = rng.random(L) < 0.05
            chars = np.where(mut, alpha[rng.integers(0, 4, L)], base)
            row = np.where(gaps, ord("-"), chars).astype(np.uint8).tobytes()
            if len(row.replace(b"-", b"")) >= 150:
                break
        founder_seqs[sid] = row

    d = tmp_path / f"msa{seed}"
    d.mkdir()
    with open(d / "input.tsv", "w") as fh:
        for sid, row in founder_seqs.items():
            (d / f"{sid}.txt").write_bytes(row)
            fh.write(f"c\t{sid}\t{d / f'{sid}.txt'}\n")
    idx = build_index_from_tsv(str(d / "input.tsv"))
    idx.save(str(d / "msa.npz"))
    ref_gapless = founder_seqs["REF"].replace(b"-", b"")
    (d / "ref.fa").write_bytes(b">c\n" + ref_gapless + b"\n")

    # random reads from the founders with mismatch/indel CIGARs
    stripped = {sid: row.replace(b"-", b"") for sid, row in founder_seqs.items()}
    lines = ["@HD\tVN:1.6"]
    for sid in names:
        lines.append(f"@SQ\tSN:c/{sid}\tLN:{len(stripped[sid])}")
    read_len = 80
    n = 0
    for i in range(60):
        sid = names[1 + int(rng.integers(3))]
        s = stripped[sid]
        if len(s) < read_len + 30:
            continue
        pos = int(rng.integers(0, len(s) - read_len - 20))
        kind = i % 3
        if kind == 0:
            cigar = f"{read_len}="
            seq = s[pos:pos + read_len]
        elif kind == 1:
            k = int(rng.integers(1, 5))
            half = read_len // 2
            seq = s[pos:pos + half] + s[pos + half + k:pos + half + k + (read_len - half)]
            cigar = f"{half}={k}D{read_len - half}="
        else:
            k = int(rng.integers(1, 5))
            j = int(rng.integers(1, 5))
            half = read_len // 2
            ins = rng.choice(alpha, k).tobytes()
            seq = (
                s[pos:pos + half]
                + ins
                + s[pos + half + j:pos + half + j + (read_len - half - k)]
            )
            cigar = f"{half}={k}I{j}D{read_len - half - k}="
        qual = "".join(chr(33 + int(x)) for x in rng.integers(15, 42, len(seq)))
        lines.append(
            f"q{i}\t0\tc/{sid}\t{pos + 1}\t60\t{cigar}\t*\t0\t0\t"
            f"{seq.decode()}\t{qual}\tNM:i:0"
        )
        n += 1
    assert n >= 40
    sam = ("\n".join(lines) + "\n").encode()

    for use_quality in (False, True):
        outs = {}
        for engine in ("host", "device"):
            cfg = ProjectConfig(
                msa_index_path=str(d / "msa.npz"),
                reference_path=str(d / "ref.fa"),
                reference_msa_id="REF",
                ref_id_separator="/",
                tags=TagSpec(rec_idx="XI"),
                engine=engine,
                device_batch_size=16,
                use_read_base_qualities=use_quality,
            )
            out = io.BytesIO()
            stats = run_project_alignments(io.BytesIO(sam), out, cfg)
            assert stats.matched_reads == n
            outs[engine] = out.getvalue()
        assert outs["host"] == outs["device"], use_quality
