"""Placeholder — filled in M4/M5."""
