"""Scalar/text functions: tokenization, BM25 math, posting-list codecs."""
