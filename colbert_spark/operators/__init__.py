"""Relational + retrieval operators: postings build, BM25 scoring (brute &
block-max WAND), dedup, similarity search, text analytics, eval metrics."""
