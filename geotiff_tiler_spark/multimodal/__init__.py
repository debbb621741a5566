"""Multimodal binary-column plumbing (decode stages stubbed)."""
