"""Device (JAX/XLA/Pallas) kernels: batched rank/select, CIGAR rewrite,
affine realignment DP, and the batch projection engine."""
