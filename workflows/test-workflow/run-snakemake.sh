#!/bin/bash
# Run the toy workflow against the vendored data (equivalent of the
# reference's test-workflow/run-snakemake.sh).  Requires snakemake,
# bowtie2 and samtools on PATH plus this package installed
# (pip install <repo>); panvc3_tpu itself needs only the baked-in
# Python stack.
#
# For a dependency-free smoke test of the same DAG (no snakemake or
# bowtie2), use:  python workflows/run_test_workflow.py --workdir /tmp/wf

set -euxo pipefail

cd "$(dirname "$0")/data"
snakemake --printshellcmds --snakefile ../Snakefile --cores "${CORES:-16}"
