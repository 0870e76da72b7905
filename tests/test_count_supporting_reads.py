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
