"""Placeholder — populated in M1/M4/M5."""
