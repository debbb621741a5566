"""Structured Streaming ingest of the pages table."""
