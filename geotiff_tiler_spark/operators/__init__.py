"""Distributed operators: tiling, spatial joins, dedup, similarity, stats."""
