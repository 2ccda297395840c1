"""Vectorized scalar functions: Unicode normalization, tokenization, hashing, vectors."""
