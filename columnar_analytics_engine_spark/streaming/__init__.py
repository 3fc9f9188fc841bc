"""Structured Streaming operators (extension surface; reference is batch-only)."""
