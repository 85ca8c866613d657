"""Vectorized UDFs and pure helpers: tokenizers, posting-list codec, hashing."""
