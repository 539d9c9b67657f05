"""Scalar/expression-level functions: tokens, sampling, text, vectors."""
