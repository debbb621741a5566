"""geotiff_tiler_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch rebuild of the capabilities of ``valhassan/geotiff-tiler``
(reference at /root/reference, studied for semantics only) as a distributed
Spark engine over Common-Crawl-style page tables:

- deterministic geocode + hierarchical cell index (H3/S2-style, pure Spark SQL)
- fixed-stride patch-grid tiling with the reference's window/filter/split
  semantics (reference tiler.py:779-848, val.py:39-101)
- spatial joins: bounds-overlap, point-in-polygon (filter/refine with a
  numpy STRtree), exact kNN via cell-ring expansion
- dataset aggregations: class distributions, running band stats, greedy
  validation-cell selection (reference val.py:155-297)
- manifest/checkpoint tables with anti-join resume (reference
  tiling_manifest.py)
- web-scale training-data ops: exact/minhash/simhash dedup, embedding
  similarity search, text quality/language analysis

Everything is DataFrame/Catalyst-first; Python appears only in Arrow-batched
pandas UDFs (never per-row).
"""

__version__ = "0.1.0"

from geotiff_tiler_spark.session import get_spark  # noqa: F401
