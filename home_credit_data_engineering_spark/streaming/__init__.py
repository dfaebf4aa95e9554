"""Structured Streaming surface (north-star extension; the reference is
batch-only — SURVEY §2.10)."""
