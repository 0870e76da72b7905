"""Adversarial full-projector goldens (VERDICT r4 #8).

tests/data/projector_adversarial.tsv locks 164 full-projector answers
(rewrite + indel-run detection + realignment + collapse; integer and -q
scoring) on adversarial constructions: near-tie I+D runs at segment/read
boundaries, runs spanning MSA gap clusters, double runs, Malde
quantisation-edge qualities, N bases in realigned slices.  The table was
generated from the host oracle (tools/gen_projector_adversarial.py),
whose tie-breaking is calibrated against the reference's golden fixtures
(/root/reference/tests/alignment_projector.cc:157-247); here every
engine is held to it:

- the host oracle itself (regression lock),
- the whole tool through the fast lane (adaptive + forced-device
  aggregate dispatch), both scoring modes.
"""

import io

import numpy as np
import pytest

from panvc3_tpu.cigar import format_cigar, parse_cigar
from panvc3_tpu.msa_index import make_sequence_entry_pair
from panvc3_tpu.projector import project_alignment

from .conftest import DATA_DIR

FIXTURE = DATA_DIR / "projector_adversarial.tsv"


def load_rows():
    rows = []
    for line in FIXTURE.read_text().splitlines():
        if not line or line.startswith("#"):
            continue
        (name, src_g, dst_g, src_pos, cig, q, quals, mode, exp_pos,
         exp_cig) = line.split("\t")
        rows.append(
            dict(
                name=name, src=src_g, dst=dst_g, src_pos=int(src_pos),
                cigar=cig, query=q, quals=quals, mode=mode,
                exp_pos=int(exp_pos), exp_cigar=exp_cig,
            )
        )
    return rows


ROWS = load_rows()


def test_fixture_size_and_coverage():
    assert len(ROWS) >= 100
    assert sum(r["mode"] == "q" for r in ROWS) >= 30
    assert any("N" in r["query"] for r in ROWS)


@pytest.mark.parametrize(
    "row", ROWS, ids=[r["name"] for r in ROWS]
)
def test_oracle_locked(row):
    src_e, dst_e = make_sequence_entry_pair(row["src"], row["dst"])
    ref = row["dst"].replace("-", "")
    qarr = (
        np.asarray([ord(c) - 33 for c in row["quals"]], dtype=np.int32)
        if row["mode"] == "q"
        else None
    )
    res = project_alignment(
        row["src_pos"], src_e, dst_e, ref, row["query"],
        parse_cigar(row["cigar"]), qarr,
        gap_opening_cost=0, gap_extension_cost=-1,
    )
    assert res.dst_pos == row["exp_pos"], row["name"]
    assert format_cigar(res.cigar) == row["exp_cigar"], row["name"]


def _build_inputs(tmp_path, rows):
    """One chr per case (REF = dst row, F = src row), a multi-contig
    FASTA, and a SAM with one read per case."""
    from panvc3_tpu.bitvec import GapBitVector
    from panvc3_tpu.msa_index import ChrEntry, MsaIndex, SequenceEntry

    index = MsaIndex()
    fa = []
    sam = ["@HD\tVN:1.6"]
    for i, r in enumerate(rows):
        chr_id = f"c{i}"
        ce = ChrEntry(chr_id)
        ce.sequence_entries = sorted(
            [
                SequenceEntry(
                    "REF", GapBitVector.from_gap_string(r["dst"].encode())
                ),
                SequenceEntry(
                    "F", GapBitVector.from_gap_string(r["src"].encode())
                ),
            ],
            key=lambda e: e.seq_id,
        )
        index.chr_entries.append(ce)
        fa.append(f">{chr_id}\n{r['dst'].replace('-', '')}")
        fl = len(r["src"].replace("-", ""))
        sam.append(f"@SQ\tSN:{chr_id}/F\tLN:{fl}")
    index.sort()
    for i, r in enumerate(rows):
        qual = r["quals"] if r["mode"] == "q" else "I" * len(r["query"])
        sam.append(
            f"r{i}\t0\tc{i}/F\t{r['src_pos'] + 1}\t60\t{r['cigar']}\t*\t0\t0"
            f"\t{r['query']}\t{qual}"
        )
    index_path = tmp_path / "adv_index.npz"
    index.save(str(index_path))
    fa_path = tmp_path / "adv_ref.fa"
    fa_path.write_text("\n".join(fa) + "\n")
    return index_path, fa_path, ("\n".join(sam) + "\n").encode()


@pytest.mark.parametrize("mode", ["int", "q"])
@pytest.mark.parametrize("lane", ["adaptive", "device"])
def test_tool_fastlane_matches_fixtures(tmp_path, monkeypatch, mode, lane):
    from panvc3_tpu.pipeline.project_alignments import (
        ProjectConfig,
        run_project_alignments,
    )

    rows = [r for r in ROWS if r["mode"] == mode]
    assert rows
    index_path, fa_path, sam = _build_inputs(tmp_path, rows)
    if lane == "device":
        monkeypatch.setenv("PANVC3_HOST_DP", "0")
        monkeypatch.setenv("PANVC3_HOST_DP_CELLS", "0")
    else:
        monkeypatch.delenv("PANVC3_HOST_DP", raising=False)
        monkeypatch.delenv("PANVC3_HOST_DP_CELLS", raising=False)
    cfg = ProjectConfig(
        msa_index_path=str(index_path),
        reference_path=str(fa_path),
        reference_msa_id="REF",
        ref_id_separator="/",
        engine="device",
        device_batch_size=32,
        use_read_base_qualities=(mode == "q"),
        status_output_interval=0,
    )
    out = io.BytesIO()
    stats = run_project_alignments(io.BytesIO(sam), out, cfg)
    assert stats.realigned_range_count > 0
    got = {}
    for line in out.getvalue().decode().splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        got[f[0]] = (int(f[3]) - 1, f[5])
    for i, r in enumerate(rows):
        qname = f"r{i}"
        assert got[qname] == (r["exp_pos"], r["exp_cigar"]), r["name"]
