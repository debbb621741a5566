"""End-to-end pipelines and manifest/checkpoint state."""
