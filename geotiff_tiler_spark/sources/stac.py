"""STAC item -> assets-by-common-band-name source (reference S2).

The reference resolves a STAC item into single-band asset hrefs keyed by
the eo extension's common band names and ordered by the caller's
``bands_requested`` (stacitem.py:11-107: inventory from ``eo:bands``
entries of length 1, common-name validity via the eo band-range table,
requested-subset check, then ``io.py:150-153`` stacks the hrefs in
requested order). pystac only parses item JSON, so the semantics need no
network or library: this module reproduces them over a DISTRIBUTED read
of item documents.

Scale shape: a catalog of 10^9 items is a JSONL/text dataset; parsing is
``from_json`` with an explicit schema (no sampling-based inference pass),
asset fan-out is bounded by per-item asset count, and every validation
(invalid common name, empty inventory, missing requested band) is a
bounded aggregate collected to the driver only to fail loudly with the
first offender — the reference raises ValueError at the same three
points. No per-row Python anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Public common-name -> wavelength-range table from the STAC eo extension
# (github.com/stac-extensions/eo#common-band-names; the same table backs
# pystac's Band.band_range, which the reference uses for validity at
# stacitem.py:90-92).
STAC_COMMON_BAND_RANGES: dict[str, tuple[float, float]] = {
    "coastal": (0.40, 0.45),
    "blue": (0.45, 0.50),
    "green": (0.50, 0.60),
    "red": (0.60, 0.70),
    "yellow": (0.58, 0.62),
    "pan": (0.50, 0.70),
    "rededge": (0.70, 0.79),
    "nir": (0.75, 1.00),
    "nir08": (0.75, 0.90),
    "nir09": (0.85, 1.05),
    "cirrus": (1.35, 1.40),
    "swir16": (1.55, 1.75),
    "swir22": (2.10, 2.30),
    "lwir": (10.5, 12.5),
    "lwir11": (10.5, 11.5),
    "lwir12": (11.5, 12.5),
}

# One eo:bands entry (github.com/stac-extensions/eo). Spark struct field
# names may contain ':' — only column REFERENCES need backticks.
_EO_BAND = (
    "struct<name:string,common_name:string,"
    "center_wavelength:double,full_width_half_max:double,description:string>"
)
ITEM_SCHEMA = (
    "struct<id:string,assets:map<string,struct<"
    f"href:string,type:string,description:string,`eo:bands`:array<{_EO_BAND}>"
    ">>>"
)


def is_valid_cname(common_name: str) -> bool:
    """Reference stacitem.py:90-92: valid iff the eo table has a range."""
    return common_name in STAC_COMMON_BAND_RANGES


def band_to_cname(input_band) -> str:
    """Naive band -> common-name conversion, parity with the reference
    (stacitem.py:94-108): 1-based int index or single-letter R/G/B/N or an
    already-common full name; anything else raises."""
    bands_ref = (("red", "R"), ("green", "G"), ("blue", "B"), ("nir", "N"))
    if isinstance(input_band, int) and not isinstance(input_band, bool):
        if 1 <= input_band <= 4:
            return bands_ref[input_band - 1][0]
    elif isinstance(input_band, str) and len(input_band) == 1:
        for cname, short in bands_ref:
            if input_band == short:
                return cname
    elif isinstance(input_band, str) and len(input_band) > 1:
        for cname, _ in bands_ref:
            if input_band == cname:
                return input_band
    raise ValueError(
        f"Cannot convert given band to valid stac common name. Got: {input_band}"
    )


def read_stac_items(spark: SparkSession, path: str) -> DataFrame:
    """Distributed parse of STAC item documents (one JSON item per line).

    Explicit schema so a petabyte catalog never pays a schema-inference
    scan; documents that fail to parse keep a NULL item struct and are
    surfaced by the empty-inventory check rather than dropped silently."""
    return spark.read.text(path).select(
        F.from_json(F.col("value"), ITEM_SCHEMA).alias("item")
    )


def assets_by_common_name(items: DataFrame) -> DataFrame:
    """Inventory of single-band assets keyed by common name, per item.

    Reference semantics (stacitem.py:60-92): only assets whose ``eo:bands``
    has exactly ONE entry carrying a ``common_name`` join the inventory;
    an invalid common name raises; an item whose inventory comes out empty
    raises ("Common names for assets cannot be retrieved"). Duplicate
    common names within an item: the LAST asset in document order wins
    (dict assignment order in the reference) — reproduced via max_by on
    the asset's map-entry position, since ``map_entries`` preserves
    document order.

    Output: (item_id, common_name, asset_name, href, center_wavelength,
    full_width_half_max), one row per (item, common_name)."""
    entries = items.select(
        F.col("item.id").alias("item_id"),
        F.posexplode_outer(F.map_entries(F.col("item.assets"))).alias(
            "pos", "entry"
        ),
    )
    single = entries.select(
        "item_id",
        "pos",
        F.col("entry.key").alias("asset_name"),
        F.col("entry.value.href").alias("href"),
        F.col("entry.value.`eo:bands`").alias("bands"),
    ).filter(F.size("bands") == 1)
    flat = single.select(
        "item_id",
        "pos",
        "asset_name",
        "href",
        F.col("bands")[0]["common_name"].alias("common_name"),
        F.col("bands")[0]["center_wavelength"].alias("center_wavelength"),
        F.col("bands")[0]["full_width_half_max"].alias("full_width_half_max"),
    ).filter(F.col("common_name").isNotNull())

    valid_set = sorted(STAC_COMMON_BAND_RANGES)
    bad = flat.filter(~F.col("common_name").isin(valid_set)).select(
        "item_id", "common_name"
    )
    offender = bad.take(1)
    if offender:
        raise ValueError(
            "Must be one of the accepted common names. Got "
            f'"{offender[0]["common_name"]}" (item {offender[0]["item_id"]}).'
        )

    inv = flat.groupBy("item_id", "common_name").agg(
        F.max_by(
            F.struct(
                "asset_name", "href", "center_wavelength", "full_width_half_max"
            ),
            F.col("pos"),
        ).alias("a")
    )
    # items (parsed or not) with an empty inventory -> loud failure, as in
    # the reference; bounded: one row per item on the left
    item_ids = items.select(
        F.coalesce(F.col("item.id"), F.lit("<unparsed item>")).alias("item_id")
    )
    starved = item_ids.join(inv, "item_id", "left_anti").take(1)
    if starved:
        raise ValueError(
            "Common names for assets cannot be retrieved "
            f'(item {starved[0]["item_id"]}).'
        )
    return inv.select(
        "item_id",
        "common_name",
        F.col("a.asset_name").alias("asset_name"),
        F.col("a.href").alias("href"),
        F.col("a.center_wavelength").alias("center_wavelength"),
        F.col("a.full_width_half_max").alias("full_width_half_max"),
    )


def select_bands_stac(
    assets: DataFrame, bands_requested: Sequence[str]
) -> DataFrame:
    """Requested-subset check + requested-order index (reference
    stacitem.py:34-47 and io.py:150-153: hrefs are stacked in the order the
    caller listed the bands, so ``band_index`` is the stack position).

    Raises if ANY item lacks a requested band — the reference's per-item
    ValueError, checked here as one bounded anti-join over (item,
    requested) pairs."""
    if not bands_requested:
        raise ValueError(
            "At least one band should be chosen if assets need to be reached"
        )
    req = F.array(*[F.lit(b) for b in bands_requested])
    have = assets.groupBy("item_id").agg(
        F.collect_set("common_name").alias("have")
    )
    missing = have.select(
        "item_id", F.array_except(req, F.col("have")).alias("missing")
    ).filter(F.size("missing") > 0)
    offender = missing.take(1)
    if offender:
        raise ValueError(
            f"Requested bands ({list(bands_requested)}) should be a subset of "
            f'available bands (item {offender[0]["item_id"]} is missing '
            f'{offender[0]["missing"]}).'
        )
    order = F.create_map(
        *[x for i, b in enumerate(bands_requested) for x in (F.lit(b), F.lit(i))]
    )
    return (
        assets.filter(F.col("common_name").isin(list(bands_requested)))
        .withColumn("band_index", order[F.col("common_name")].cast("int"))
    )
