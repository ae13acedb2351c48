"""Structured Streaming surface (SURVEY §2.8 — extension, not reference parity)."""
