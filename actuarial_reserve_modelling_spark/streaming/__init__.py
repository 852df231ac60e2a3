"""Structured Streaming surface (SURVEY §2.9 T1-T6)."""
