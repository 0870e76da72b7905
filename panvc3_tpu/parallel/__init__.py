"""Mesh / sharding utilities for multi-chip execution."""
