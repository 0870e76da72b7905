import io

from panvc3_tpu.cigar import parse_cigar
from panvc3_tpu.pipeline.count_supporting_reads import (
    calculate_record_lengths,
    run_count_supporting_reads,
    try_read_aligned_sequence,
)


def test_record_lengths():
    # right-anchored length stops at the last M/=/X
    assert calculate_record_lengths(parse_cigar("10M")) == (10, 10)
    assert calculate_record_lengths(parse_cigar("5M3D2M")) == (10, 10)
    assert calculate_record_lengths(parse_cigar("5M3D")) == (8, 5)
    assert calculate_record_lengths(parse_cigar("3S5M2I")) == (5, 5)


def test_try_read_snp():
    # read AGCTA aligned at 10 with 5=; variant at 12, ref len 1, alt len 1
    allele = try_read_aligned_sequence(10, "AGCTA", parse_cigar("5="), 5, 12, 1, 1, False)
    assert allele == "C"


def test_try_read_insertion():
    # read has a 2bp insertion at the variant site: 2=2I3=
    allele = try_read_aligned_sequence(10, "AGTTCTA", parse_cigar("2=2I3="), 5, 12, 1, 3, False)
    # at pos 12 (offset 2): insertion TT folded with following base C
    assert allele == "TTC"


def test_try_read_deletion():
    # read has a deletion: 2=2D3=; variant REF spans 3 bases at pos 12;
    # the deletion is contained in the variant span, so no '~' marker
    allele = try_read_aligned_sequence(10, "AGCTA", parse_cigar("2=2D3="), 7, 12, 3, 1, False)
    assert allele == "C"
    # a deletion extending past the variant end does produce '~'
    allele2 = try_read_aligned_sequence(10, "AGCTA", parse_cigar("2=4D3="), 9, 12, 3, 1, False)
    assert allele2 == "~"


def test_try_read_softclip_lowercase():
    allele = try_read_aligned_sequence(
        10, "AGCTT", parse_cigar("3=2S"), 3, 12, 1, 1, True
    )
    assert allele == "Ctt"


VCF = """##fileformat=VCFv4.2
##INFO=<ID=END,Number=1,Type=Integer,Description="End position">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1
test\t3\t.\tC\tT\t.\t.\t.\tGT\t0/1
test\t6\t.\tGAA\tG\t.\t.\tEND=8\tGT\t0/1
"""

#           0123456789
REFSEQ =   "AACTTGAACC"


def _sam_lines():
    # Three reads covering pos 2 (SNP C->T) and the deletion at 5..8.
    # Distinct start positions: the reference's candidate set is keyed by
    # position, so same-position records would be deduplicated.
    lines = ["@HD\tVN:1.6", "@SQ\tSN:test\tLN:10"]
    # read a at pos 0: matches reference (no variant)
    lines.append(f"a\t0\ttest\t1\t60\t10=\t*\t0\t0\t{REFSEQ}\t{'I'*10}")
    # read b at pos 1: has the SNP at genome pos 2
    seq2 = REFSEQ[1:2] + "T" + REFSEQ[3:]
    lines.append(f"b\t0\ttest\t2\t60\t1=1X7=\t*\t0\t0\t{seq2}\t{'I'*9}")
    # read c at pos 2: has the 2bp deletion after genome pos 5
    seq3 = REFSEQ[2:6] + REFSEQ[8:]
    lines.append(f"c\t0\ttest\t3\t60\t4=2D2=\t*\t0\t0\t{seq3}\t{'I'*6}")
    return "\n".join(lines) + "\n"


def test_count_supporting_reads_end_to_end(tmp_path):
    vcf_path = tmp_path / "v.vcf"
    vcf_path.write_text(VCF)
    out = io.StringIO()
    var_stats, aln_stats = run_count_supporting_reads(
        str(vcf_path),
        io.BytesIO(_sam_lines().encode()),
        out,
        zygosity=1,
    )
    text = out.getvalue().splitlines()
    v_lines = [l for l in text if l.startswith("V")]
    r_lines = [l for l in text if l.startswith("R")]
    assert v_lines == [
        "V\ttest\t2\t.\tC\tT\t1\t0",
        "V\ttest\t5\t.\tGAA\tG\t1\t0",
    ]
    # SNP site: 2 reads support C, 1 supports T; deletion site: 2 support
    # GAA, 1 supports G (the deletion is contained in the variant span)
    assert r_lines[0:2] == ["R\t2\tC", "R\t1\tT"]
    assert r_lines[2:] == ["R\t1\tG", "R\t2\tGAA"]
    assert aln_stats.matched_reads >= 3
    s_lines = [l for l in text if l.startswith("S")]
    assert "S\tTotal variants\t2" in s_lines


# ---------------------------------------------------------------------------
# Native sweep engine differential test: the C csr_sweep_chunk path must be
# byte-identical to the Python object path on a randomized workload.

def _random_workload(seed: int, n_reads: int = 400, n_vars: int = 120):
    import random

    rng = random.Random(seed)
    chroms = ["chr1", "chr2"]
    ref_len = 600

    header = ["@HD\tVN:1.6\tSO:coordinate"]
    for c in chroms:
        header.append(f"@SQ\tSN:{c}\tLN:{ref_len}")

    def rand_cigar():
        ops = []
        if rng.random() < 0.1:
            ops.append((rng.randint(1, 3), "H"))
        if rng.random() < 0.25:
            ops.append((rng.randint(1, 5), "S"))
        n_seg = rng.randint(1, 4)
        for k in range(n_seg):
            ops.append((rng.randint(3, 25), rng.choice("M=X")))
            if k + 1 < n_seg:
                ops.append((rng.randint(1, 4), rng.choice("IDND")))
            if rng.random() < 0.08:
                ops.append((rng.randint(1, 2), "P"))
        if rng.random() < 0.2:
            ops.append((rng.randint(1, 5), "S"))
        if rng.random() < 0.1:
            ops.append((rng.randint(1, 3), "H"))
        return ops

    lines = list(header)
    positions = sorted(rng.randrange(0, ref_len - 80) for _ in range(n_reads))
    for i, p in enumerate(positions):
        flag = 0
        r = rng.random()
        if r < 0.05:
            flag |= 0x4       # unmapped
        elif r < 0.10:
            flag |= 0x400     # duplicate
        elif r < 0.18:
            flag |= 0x100     # secondary
        ops = rand_cigar()
        qlen = sum(c for c, o in ops if o in "M=XIS")
        seq = "".join(rng.choice("ACGTN") for _ in range(qlen))
        cig = "".join(f"{c}{o}" for c, o in ops)
        chrom = rng.choice(chroms)
        rnext, pnext = "*", 0
        if rng.random() < 0.5:
            rnext = "=" if rng.random() < 0.7 else rng.choice(chroms)
            pnext = rng.randint(1, ref_len)
        lines.append(
            f"r{i}\t{flag}\t{chrom}\t{p + 1}\t60\t{cig}\t{rnext}\t{pnext}"
            f"\t0\t{seq}\t{'I' * qlen}"
        )
    sam_text = "\n".join(lines) + "\n"

    vcf = [
        "##fileformat=VCFv4.2",
        '##INFO=<ID=END,Number=1,Type=Integer,Description="e">',
        '##INFO=<ID=CO,Number=0,Type=Flag,Description="c">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1",
    ]
    # variants on one chromosome only: the sweep is a single global
    # coordinate space (the reference asserts pos <= var_pos the same way)
    for chrom in chroms[:1]:
        vps = sorted(rng.sample(range(1, ref_len - 12), n_vars))
        for j, p1 in enumerate(vps):
            kind = rng.random()
            if kind < 0.5:
                ref, alt = "A", "G"
            elif kind < 0.75:
                ref, alt = "A", "A" + "G" * rng.randint(1, 3)
            else:
                ref, alt = "A" + "C" * rng.randint(1, 3), "A"
            info = "."
            if rng.random() < 0.3:
                info = f"END={p1 + len(ref) - 1}"
            if rng.random() < 0.1:
                info = (info + ";CO" if info != "." else "CO")
            gt = rng.choice(["0|1", "1|0", "1|1", "0|0", "0/1", ".|1"])
            vcf.append(
                f"{chrom}\t{p1}\t{chrom}v{j}\t{ref}\t{alt}\t.\tPASS\t{info}"
                f"\tGT\t{gt}"
            )
    return sam_text, "\n".join(vcf) + "\n"


def test_csr_native_engine_differential(monkeypatch, tmp_path):
    from panvc3_tpu.native import get_native

    nat = get_native()
    if nat is None or not hasattr(nat, "csr_sweep_chunk"):
        import pytest

        pytest.skip("native extension not built")

    bed_path = tmp_path / "regions.bed"
    bed_path.write_text("chr1\t50\t250\nchr1\t400\t520\n")
    configs = [
        {},
        {"zygosity": 1},
        {"include_clipping": True},
        {"anchor_left": True},
        {"contig": "chr1", "primary_only": True, "same_ref": True},
        {"contig": "chr", "contig_is_prefix": True},
        {"regions_path": str(bed_path)},
        {"chr_id": "chr1"},
    ]
    for seed in range(4):
        sam_text, vcf_text = _random_workload(seed)
        vcf_path = tmp_path / f"v{seed}.vcf"
        vcf_path.write_text(vcf_text)
        for cfg in configs:
            results = {}
            for fast, vcf_fast in (("0", "0"), ("1", "0"), ("1", "1")):
                monkeypatch.setenv("PANVC3_CSR_FAST", fast)
                monkeypatch.setenv("PANVC3_CSR_VCF_FAST", vcf_fast)
                out = io.StringIO()
                vs, als = run_count_supporting_reads(
                    str(vcf_path), io.BytesIO(sam_text.encode()), out, **cfg
                )
                results[fast, vcf_fast] = (out.getvalue(), vs, als)
            assert results["1", "0"] == results["0", "0"], (seed, cfg)
            assert results["1", "1"] == results["0", "0"], (seed, cfg)


def test_csr_native_multi_alt_error_parity(monkeypatch, tmp_path):
    from panvc3_tpu.native import get_native

    nat = get_native()
    if nat is None or not hasattr(nat, "csr_sweep_chunk"):
        import pytest

        pytest.skip("native extension not built")

    sam = (
        "@HD\tVN:1.6\n@SQ\tSN:c\tLN:50\n"
        "a\t0\tc\t1\t60\t20M\t*\t0\t0\t" + "A" * 20 + "\t" + "I" * 20 + "\n"
    )
    vcf = (
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "c\t5\tv0\tA\tG,T\t.\tPASS\t.\tGT\t0|1\n"
    )
    vcf_path = tmp_path / "multalt.vcf"
    vcf_path.write_text(vcf)

    outcomes = {}
    for fast in ("0", "1"):
        monkeypatch.setenv("PANVC3_CSR_FAST", fast)
        out = io.StringIO()
        try:
            run_count_supporting_reads(
                str(vcf_path), io.BytesIO(sam.encode()), out
            )
            raise AssertionError("expected ValueError")
        except ValueError as e:
            outcomes[fast] = (str(e), out.getvalue())
    assert outcomes["0"] == outcomes["1"]


def test_csr_fast_engine_bam_input(monkeypatch, tmp_path):
    """The sweep engine consumes BAM input through the C BAM->SAM-text
    converter; output must equal the SAM-text run."""
    from panvc3_tpu.io.sam import SamReader, SamWriter
    from panvc3_tpu.native import get_native

    nat = get_native()
    if nat is None or not hasattr(nat, "csr_sweep_chunk"):
        import pytest

        pytest.skip("native extension not built")

    sam_text, vcf_text = _random_workload(2, n_reads=300, n_vars=60)
    vcf_path = tmp_path / "v.vcf"
    vcf_path.write_text(vcf_text)

    # SAM -> BAM round trip for the input
    rd = SamReader(io.BytesIO(sam_text.encode()))
    bam = io.BytesIO()
    wr = SamWriter(bam, rd.header, bam=True)
    for rec in rd:
        wr.write(rec)
    wr.close()
    bam.seek(0)

    monkeypatch.setenv("PANVC3_CSR_FAST", "1")
    out_sam = io.StringIO()
    r_sam = run_count_supporting_reads(
        str(vcf_path), io.BytesIO(sam_text.encode()), out_sam
    )
    out_bam = io.StringIO()
    r_bam = run_count_supporting_reads(str(vcf_path), bam, out_bam)
    assert out_sam.getvalue() == out_bam.getvalue()
    assert r_sam == r_bam


def test_csr_multichrom_vcf_chr_filter(monkeypatch, tmp_path):
    """A VCF spanning two chromosome blocks with --chromosome filtering:
    the native VCF tuple path must validate sortedness/contiguity and
    count chr mismatches exactly like the object path; out-of-order
    chromosome blocks must raise identically."""
    sam = (
        "@HD\tVN:1.6\n@SQ\tSN:chrA\tLN:100\n@SQ\tSN:chrB\tLN:100\n"
        + "".join(
            f"r{i}\t0\tchrA\t{10 + i}\t60\t20M\t*\t0\t0\t{'A' * 20}\t{'I' * 20}\n"
            for i in range(5)
        )
    ).encode()
    head = (
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
    )
    good = head + (
        "chrA\t15\tv0\tA\tG\t.\tPASS\t.\tGT\t0|1\n"
        "chrA\t20\tv1\tA\tG\t.\tPASS\t.\tGT\t0|1\n"
        "chrB\t5\tv2\tA\tG\t.\tPASS\t.\tGT\t0|1\n"
    )
    bad = head + (
        "chrA\t15\tv0\tA\tG\t.\tPASS\t.\tGT\t0|1\n"
        "chrB\t5\tv2\tA\tG\t.\tPASS\t.\tGT\t0|1\n"
        "chrA\t20\tv1\tA\tG\t.\tPASS\t.\tGT\t0|1\n"  # chrA block resumes
    )
    for name, text, should_raise in (("good", good, False), ("bad", bad, True)):
        p = tmp_path / f"{name}.vcf"
        p.write_text(text)
        res = {}
        for fast, vfast in (("0", "0"), ("1", "1")):
            monkeypatch.setenv("PANVC3_CSR_FAST", fast)
            monkeypatch.setenv("PANVC3_CSR_VCF_FAST", vfast)
            out = io.StringIO()
            try:
                vs, als = run_count_supporting_reads(
                    str(p), io.BytesIO(sam), out, chr_id="chrA"
                )
                res[fast] = ("ok", out.getvalue(), vs, als)
            except ValueError as e:
                res[fast] = ("err", out.getvalue(), str(e))
        assert res["0"] == res["1"], name
        assert (res["0"][0] == "err") == should_raise, name
        if name == "good":
            assert res["0"][2].chr_id_mismatches == 1  # the chrB variant


def test_csr_cigar_longer_than_seq(monkeypatch, tmp_path):
    """A record whose CIGAR claims more query than SEQ holds (malformed but
    parseable): the Python walk silently truncates its slices; the C walk
    must clamp identically instead of overreading the candidate buffer."""
    from panvc3_tpu.native import get_native

    nat = get_native()
    if nat is None or not hasattr(nat, "csr_sweep_chunk"):
        import pytest

        pytest.skip("native extension not built")

    sam = (
        "@HD\tVN:1.6\n@SQ\tSN:c\tLN:200\n"
        # claims 100M/20I but SEQ has only 30 bases
        "bad1\t0\tc\t1\t60\t100M\t*\t0\t0\t" + "A" * 30 + "\t" + "I" * 30 + "\n"
        "bad2\t0\tc\t2\t60\t50M20I50M\t*\t0\t0\t" + "C" * 30 + "\t" + "I" * 30 + "\n"
        "ok\t0\tc\t3\t60\t120M\t*\t0\t0\t" + "G" * 120 + "\t" + "I" * 120 + "\n"
    ).encode()
    vcf = (
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "c\t40\tv0\tA\tG\t.\tPASS\t.\tGT\t0|1\n"
        "c\t60\tv1\tAAA\tA\t.\tPASS\t.\tGT\t0|1\n"
    )
    p = tmp_path / "clamp.vcf"
    p.write_text(vcf)
    res = {}
    for fast in ("0", "1"):
        monkeypatch.setenv("PANVC3_CSR_FAST", fast)
        out = io.StringIO()
        vs, als = run_count_supporting_reads(str(p), io.BytesIO(sam), out)
        res[fast] = (out.getvalue(), vs, als)
    assert res["0"] == res["1"]
