"""Host I/O: BGZF, FASTA (+faidx/gzi), SAM/BAM, BED, VCF."""
