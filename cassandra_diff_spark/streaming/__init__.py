"""Structured Streaming surface (streaming diff / windowed aggregation)."""
