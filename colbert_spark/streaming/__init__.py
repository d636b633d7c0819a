"""Structured Streaming surfaces: incremental index ingest + event rollups."""
