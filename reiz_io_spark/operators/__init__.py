"""Distributed operators: index build, block encode, BM25 scoring, dedup,
similarity, multimodal plumbing, lineage/resume."""
