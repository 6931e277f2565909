"""Placeholder — filled in a later phase."""

SPECS = []
