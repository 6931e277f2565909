"""Structured Streaming parity layer for the reference's micro-batch model."""
