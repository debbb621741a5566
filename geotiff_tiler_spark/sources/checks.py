"""Pair/row validation as data, not exceptions (reference S7/F7 semantics).

The reference validates each image/label pair and routes failures into a
result dict consumed by the retry loop (io.py:177-235, checks.py:56-118;
failures recorded in the manifest, tiler.py:427-439). The Spark shape:
row-level predicates -> a `status` / `reason` column pair via
`when(...)` chains, then one filter splits the flow into a valid stream
and a quarantine table. No exceptions cross executor boundaries.

Page-table checks (the engine's input analog of the reference's
image/label checks):
  - empty_text       (reference: zero-dim image, checks.py:60-66)
  - extraction_mismatch (reference: label/image misalignment special case)
  - unknown_lang     (reference: attr-field resolution failure, io.py:609-621)
  - ts_out_of_range  (reference: georeferencing missing, checks.py:36-54)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KNOWN_LANGS = ("en", "fr", "de", "es", "zh")
TS_MIN = "2000-01-01"
TS_MAX = "2035-01-01"


def validate_pages(pages: DataFrame, extracted_col: str | None = None) -> DataFrame:
    """Attach (status, reason); status 'valid' or 'invalid'.

    The FIRST failing check names the reason (reference returns on first
    failure, io.py:186-221)."""
    text = F.col("text")
    checks = [
        (text.isNull() | (F.length(F.trim(text)) == 0), "empty_text"),
        (~F.col("lang").isin(*KNOWN_LANGS), "unknown_lang"),
        (
            (F.col("warc_ts") < F.lit(TS_MIN).cast("timestamp"))
            | (F.col("warc_ts") >= F.lit(TS_MAX).cast("timestamp")),
            "ts_out_of_range",
        ),
    ]
    if extracted_col is not None:
        checks.insert(1, (text != F.col(extracted_col), "extraction_mismatch"))
    reason = F.lit(None).cast("string")
    for cond, name in reversed(checks):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    out = pages.withColumn("reason", reason)
    return out.withColumn(
        "status", F.when(F.col("reason").isNull(), "valid").otherwise("invalid")
    )


def split_quarantine(validated: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid_rows, quarantine_rows) — failures are data routed to a table
    (reference: failed_images map in the manifest), not exceptions."""
    valid = validated.filter(F.col("status") == "valid").drop("status", "reason")
    quarantine = validated.filter(F.col("status") == "invalid")
    return valid, quarantine


def resolve_attr_field(columns: list[str], requested: list[str]) -> str:
    """J8 attr-field resolution (reference io.py:609-621): intersect the
    requested names with the actual columns; fail on 0 or >1 matches."""
    matches = [c for c in requested if c in set(columns)]
    if len(matches) == 0:
        raise ValueError(f"no attribute field among {requested} found in {columns}")
    if len(matches) > 1:
        raise ValueError(f"ambiguous attribute fields {matches}")
    return matches[0]
