"""Structured Streaming pipeline (SURVEY §2.8, §3.1)."""
