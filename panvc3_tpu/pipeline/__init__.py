"""Tool pipelines mirroring the reference's CLI executables."""
