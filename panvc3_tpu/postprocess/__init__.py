"""Post-processing utilities (the reference's L3 Python script layer)."""
