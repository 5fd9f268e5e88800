"""Placeholder — populated in M1."""
