"""Structural parity of the repo's Snakefiles vs the reference's.

The drop-in contract is that a user can point the reference's Snakemake
workflows at our tools: the rule DAG (names, I/O roles, tool invocations
and their flags) must match /root/reference/test-workflow/Snakefile:7-102
and /root/reference/bowtie2-workflow/Snakefile:28-220.  snakemake itself is
not installed in this image, so this parses the rule structure with a
minimal reader (no DAG execution) — enough to catch drift that no other
test can (renamed rules, dropped flags, changed file roles).

The reference side of the comparison is vendored as a derived-structure
fixture (tests/data/ref_snakefile_structure.json: per rule, its named I/O
entries, primary tool, flags and benchmark presence) so the parity checks
run without the reference checkout; when the checkout IS mounted the live
Snakefiles are re-parsed and must match the fixture (staleness guard).
"""

from __future__ import annotations

import json
import pathlib
import re

REFERENCE = pathlib.Path("/root/reference")
REPO = pathlib.Path(__file__).resolve().parent.parent / "workflows"
STRUCTURE_FIXTURE = pathlib.Path(__file__).resolve().parent / "data/ref_snakefile_structure.json"

_SECTION_KEYS = (
    "message", "conda", "threads", "benchmark", "input", "output",
    "shell", "params", "log", "resources",
)


def parse_snakefile(path: pathlib.Path) -> dict[str, dict[str, str]]:
    """{rule_name: {section: raw_text}} via an indentation-based reader."""
    rules: dict[str, dict[str, str]] = {}
    current_rule = None
    current_section = None
    for line in path.read_text().splitlines():
        m = re.match(r"^rule\s+(\w+)\s*:", line)
        if m:
            current_rule = m.group(1)
            rules[current_rule] = {}
            current_section = None
            continue
        if re.match(r"^\S", line):  # top-level statement ends any rule
            current_rule = None
            current_section = None
            continue
        if current_rule is None:
            continue
        sm = re.match(r"^\s+(\w+)\s*:\s*(.*)$", line)
        if sm and sm.group(1) in _SECTION_KEYS:
            current_section = sm.group(1)
            rules[current_rule][current_section] = sm.group(2)
        elif current_section is not None:
            rules[current_rule][current_section] = (
                rules[current_rule].get(current_section, "") + "\n" + line
            )
    return rules


def shell_text(rule: dict[str, str]) -> str:
    """Concatenated string literals of the rule's shell section (implicit
    adjacent-literal concatenation, f-string prefixes ignored)."""
    raw = rule.get("shell", "")
    parts = re.findall(r'"((?:[^"\\]|\\.)*)"', raw)
    return " ".join(parts) if parts else raw


def shell_tool(rule: dict[str, str]) -> str | None:
    m = re.search(r"\b(panvc3_\w+|bowtie2-build|bowtie2|samtools|bgzip|"
                  r"vcf2multialign|cat|gzip|python3?)\b", shell_text(rule))
    return m.group(1) if m else None


def shell_flags(rule: dict[str, str]) -> set[str]:
    return set(re.findall(r"--[\w-]+", shell_text(rule)))


def io_names(rule: dict[str, str], section: str) -> set[str]:
    """Named entries of an input/output section (positional-only -> empty)."""
    return set(re.findall(r"^\s*(\w+)\s*=", rule.get(section, ""), re.M))


def derive_structure(rules: dict[str, dict[str, str]]) -> dict[str, dict]:
    """The per-rule facts the parity tests assert on, in the fixture's
    JSON shape (tests/data/ref_snakefile_structure.json)."""
    return {
        name: {
            "io": {s: sorted(io_names(rule, s)) for s in ("input", "output")},
            "tool": shell_tool(rule),
            "flags": sorted(shell_flags(rule)),
            "input_raw": rule.get("input", ""),
            "has_benchmark": "benchmark" in rule,
        }
        for name, rule in rules.items()
    }


def ref_structure(workflow: str) -> dict[str, dict]:
    """Vendored reference structure; live-checked when the checkout exists."""
    fixture = json.loads(STRUCTURE_FIXTURE.read_text())[workflow]
    live_path = REFERENCE / workflow / "Snakefile"
    if live_path.exists():
        live = derive_structure(parse_snakefile(live_path))
        assert live == fixture, (
            f"tests/data/ref_snakefile_structure.json is stale for {workflow}"
        )
    return fixture


# -- test-workflow: strict rule-by-rule parity --------------------------------

def test_test_workflow_rule_parity():
    ref = ref_structure("test-workflow")
    ours = derive_structure(parse_snakefile(REPO / "test-workflow/Snakefile"))

    assert set(ref) == set(ours), (
        "test-workflow rule names must match the reference DAG"
    )

    for name, ref_rule in ref.items():
        our_rule = ours[name]
        # I/O roles: same named entries per section
        assert ref_rule["io"] == our_rule["io"], name
        # same primary tool (modulo the reference's open-file-limit wrapper)
        ref_tool = ref_rule["tool"]
        assert our_rule["tool"] == ref_tool, name
        # panvc3 tool invocations carry at least the reference's flags
        if ref_tool and ref_tool.startswith("panvc3_"):
            missing = set(ref_rule["flags"]) - set(our_rule["flags"])
            assert not missing, (name, missing)

    # the terminal target is the same artifact
    assert "alignments.mapq-recalculated.sam.gz" in ref["all"]["input_raw"]
    assert "alignments.mapq-recalculated.sam.gz" in ours["all"]["input_raw"]


def test_test_workflow_tool_flag_values():
    """The projection flags that change output semantics must carry the
    reference's exact values (Snakefile:67-87)."""
    ours = parse_snakefile(REPO / "test-workflow/Snakefile")
    text = shell_text(ours["project_alignments"])
    for frag in (
        "--reference-msa-id=REF",
        "--ref-id-separator=/",
        "--record-index-tag=XI",
        "--preserve-tag=XS",
        "--preserve-tag=YS",
    ):
        assert frag in text, frag


# -- bowtie2-workflow: pipeline-rule parity ------------------------------------

# the reference rules that form the production pipeline proper; the rest are
# generic samtools/bgzip adapters whose *transforms* are checked below
_PIPELINE_RULES = (
    "generate_founder_sequences",
    "filter_reference",
    "combine_indexing_input",
    "index_msa",
    "index_bowtie2",
    "align_reads_bowtie2",
    "project_alignments",
    "recalculate_mapq",
)

# flags our CLIs add beyond the reference's (engine selection is ours)
_EXTRA_FLAG_ALLOWLIST = {"--engine", "--pipe", "--data-parallel",
                         "--device-batch-size", "--pipeline-depth"}


def test_bowtie2_workflow_pipeline_rules():
    ref = ref_structure("bowtie2-workflow")
    ours = derive_structure(parse_snakefile(REPO / "bowtie2-workflow/Snakefile"))

    for name in _PIPELINE_RULES:
        assert name in ref, name  # guards the parser itself
        assert name in ours, f"pipeline rule {name} missing from our Snakefile"
        ref_rule, our_rule = ref[name], ours[name]
        ref_tool = ref_rule["tool"]
        if ref_tool and ref_tool.startswith(("panvc3_", "bowtie2", "vcf2multialign")):
            assert our_rule["tool"] == ref_tool, name
            ref_f, our_f = set(ref_rule["flags"]), set(our_rule["flags"])
            # --pipe-input / run-gzip.sh piping is environment plumbing;
            # everything else must be present
            missing = {
                f for f in ref_f - our_f if f not in _EXTRA_FLAG_ALLOWLIST
            }
            assert not missing, (name, missing)
            extra = {
                f for f in our_f - ref_f if f not in _EXTRA_FLAG_ALLOWLIST
            }
            assert not extra, (name, extra)
        # output roles match (reference .dat index vs our .npz is the one
        # sanctioned difference; names/keys must agree)
        assert ref_rule["io"]["output"] == our_rule["io"]["output"], name

    # every pipeline rule keeps its Snakemake benchmark directive, like the
    # reference (bowtie2-workflow/Snakefile:31-160)
    for name in _PIPELINE_RULES:
        assert ours[name]["has_benchmark"], name


def test_bowtie2_workflow_adapter_transforms():
    """Every file transform the reference's terminal target needs must be
    producible by some rule in our Snakefile (suffix-level DAG coverage)."""
    ours = parse_snakefile(REPO / "bowtie2-workflow/Snakefile")

    def has_transform(in_suffix: str, out_suffix: str) -> bool:
        for rule in ours.values():
            i, o = rule.get("input", ""), rule.get("output", "")
            if in_suffix in i and out_suffix in o:
                return True
        return False

    # align -> sort -> project -> qname-sort -> recalc (reference DAG path)
    assert has_transform(".sam.gz", ".sorted.bam")
    assert has_transform(".sam.gz", ".qname-sorted.bam")

    # terminal artifact name matches the reference's rule all
    assert "mapq-recalculated.sam.gz" in ours["all"].get("input", "")
