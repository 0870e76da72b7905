"""Distribution packaging (VERDICT r3 #9; reference parity:
/root/reference/conda/meta.yaml + Makefile dist target).

Builds the real wheel (native extension included) and checks the
installed layout actually works: the .so is inside the package, all nine
console scripts are declared, and the native loader finds the extension
from the wheel layout (not just from an in-repo `make native` build).
"""

import pathlib
import subprocess
import sys
import zipfile

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
SCRIPTS = [
    "panvc3_index_msa",
    "panvc3_project_alignments",
    "panvc3_recalculate_mapq",
    "panvc3_subset_alignments",
    "panvc3_count_supporting_reads",
    "panvc3_rewrite_cigar",
    "panvc3_split_alignments_by_reference",
    "panvc3_alignment_statistics",
    "panvc3_convert_bed_positions",
]


@pytest.fixture(scope="module")
def wheel(tmp_path_factory):
    out = tmp_path_factory.mktemp("dist")
    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "-w", str(out), str(REPO)],
        check=True, capture_output=True, timeout=300,
    )
    wheels = list(out.glob("panvc3_tpu-*.whl"))
    assert len(wheels) == 1, wheels
    return wheels[0]


def test_wheel_contents(wheel):
    names = zipfile.ZipFile(wheel).namelist()
    sos = [n for n in names if n.endswith(".so")]
    assert sos and all(
        n.startswith("panvc3_tpu/native_build/_panvc3_native") for n in sos
    ), sos
    eps = [n for n in names if n.endswith("entry_points.txt")]
    assert eps
    ep_text = zipfile.ZipFile(wheel).read(eps[0]).decode()
    for script in SCRIPTS:
        assert f"{script} = " in ep_text, script
    assert sum(n.endswith(".py") for n in names) >= 40


def test_sdist_contains_native_sources(tmp_path):
    """The source tarball must carry everything needed to compile the
    extension — all four .c files AND panvc3_common.h (a missing header
    makes `pip install <sdist>` fail at build time)."""
    import tarfile

    subprocess.run(
        [sys.executable, "setup.py", "-q", "sdist", "-d", str(tmp_path)],
        check=True, capture_output=True, timeout=120, cwd=str(REPO),
    )
    sdists = list(tmp_path.glob("panvc3_tpu-*.tar.gz"))
    assert len(sdists) == 1, sdists
    names = tarfile.open(sdists[0]).getnames()
    base = {n.split("/", 1)[1] for n in names if "/" in n}
    for req in (
        "native/panvc3_native.c", "native/fastpath.c", "native/bgzf.c",
        "native/csr.c", "native/als.c", "native/panvc3_common.h",
        "setup.py", "pyproject.toml",
    ):
        assert req in base, req


def test_wheel_native_loads(wheel, tmp_path):
    """Unpack the wheel layout and verify the native loader finds the
    bundled extension there (no in-repo native_build on the path)."""
    target = tmp_path / "site"
    zipfile.ZipFile(wheel).extractall(target)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "from panvc3_tpu.native import get_native\n"
        "n = get_native()\n"
        "assert n is not None\n"
        "assert hasattr(n, 'parse_sam_line')\n"
        "print('native ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, str(target)],
        check=True, capture_output=True, timeout=60,
        cwd=str(tmp_path),  # not the repo: the repo copy must not win
    )
    assert b"native ok" in out.stdout
