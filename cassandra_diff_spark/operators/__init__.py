"""Relational + pipeline operators (diff core, dedup, similarity, ...)."""
