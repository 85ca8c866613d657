"""Corpus sources: synthetic deterministic corpus + table adapters."""
