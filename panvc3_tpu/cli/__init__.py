"""Command-line entry points mirroring the reference's panvc3_* tools."""
