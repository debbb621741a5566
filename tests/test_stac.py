"""S2: STAC item -> assets-by-common-name, reference-parity semantics
(reference stacitem.py:11-108) over a distributed JSONL catalog read."""

import json

import pytest

from geotiff_tiler_spark.sources import stac


def _item(item_id, assets):
    """assets: list of (asset_name, href, eo_bands-or-None)."""
    return json.dumps(
        {
            "id": item_id,
            "assets": {
                name: (
                    {"href": href, "type": "image/tiff"}
                    | ({"eo:bands": bands} if bands is not None else {})
                )
                for name, href, bands in assets
            },
        }
    )


def _band(cname, name=None, wl=None, fwhm=None):
    b = {"name": name or cname.upper(), "common_name": cname}
    if wl is not None:
        b["center_wavelength"] = wl
    if fwhm is not None:
        b["full_width_half_max"] = fwhm
    return b


GOOD = [
    _item(
        "itemA",
        [
            ("B04", "s3://x/A_red.tif", [_band("red", "B04", 0.65, 0.04)]),
            ("B03", "s3://x/A_green.tif", [_band("green", "B03", 0.56, 0.05)]),
            ("B02", "s3://x/A_blue.tif", [_band("blue", "B02", 0.49, 0.07)]),
            ("B08", "s3://x/A_nir.tif", [_band("nir", "B08", 0.84, 0.11)]),
            # multi-band asset: excluded from the inventory (stacitem.py:75-77)
            ("visual", "s3://x/A_rgb.tif", [_band("red"), _band("green")]),
            # no eo:bands at all: excluded
            ("thumbnail", "s3://x/A_thumb.png", None),
        ],
    ),
    _item(
        "itemB",
        [
            ("B04", "s3://x/B_red_v1.tif", [_band("red")]),
            # duplicate common name: LAST asset in document order wins
            ("B04A", "s3://x/B_red_v2.tif", [_band("red")]),
            ("B03", "s3://x/B_green.tif", [_band("green")]),
            ("B02", "s3://x/B_blue.tif", [_band("blue")]),
        ],
    ),
]


@pytest.fixture(scope="module")
def catalog(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("stac") / "items.jsonl"
    p.write_text("\n".join(GOOD) + "\n")
    return stac.read_stac_items(spark, str(p))


def test_inventory_by_common_name(catalog):
    inv = stac.assets_by_common_name(catalog)
    rows = {(r["item_id"], r["common_name"]): r for r in inv.collect()}
    # multi-band + bandless assets excluded: itemA has exactly its 4 singles
    assert sorted(c for i, c in rows if i == "itemA") == [
        "blue",
        "green",
        "nir",
        "red",
    ]
    a_red = rows[("itemA", "red")]
    assert a_red["asset_name"] == "B04"
    assert a_red["href"] == "s3://x/A_red.tif"
    assert a_red["center_wavelength"] == pytest.approx(0.65)
    assert a_red["full_width_half_max"] == pytest.approx(0.04)
    # duplicate common name: document-order last wins (dict overwrite parity)
    assert rows[("itemB", "red")]["href"] == "s3://x/B_red_v2.tif"


def test_select_bands_order_and_subset(catalog):
    inv = stac.assets_by_common_name(catalog)
    sel = stac.select_bands_stac(inv, ["green", "red", "blue"])
    got = {
        (r["item_id"], r["common_name"]): r["band_index"] for r in sel.collect()
    }
    # requested order defines the stack position (io.py:150-153)
    assert got[("itemA", "green")] == 0 and got[("itemA", "red")] == 1
    assert got[("itemB", "blue")] == 2
    assert len(got) == 6
    # itemB has no nir -> subset violation raises (stacitem.py:40-42)
    with pytest.raises(ValueError, match="subset of available"):
        stac.select_bands_stac(inv, ["red", "nir"])
    with pytest.raises(ValueError, match="At least one band"):
        stac.select_bands_stac(inv, [])


def test_invalid_common_name_raises(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        _item("itemC", [("B01", "s3://x/C.tif", [_band("ultraviolet")])]) + "\n"
    )
    with pytest.raises(ValueError, match="accepted common names"):
        stac.assets_by_common_name(stac.read_stac_items(spark, str(p)))


def test_empty_inventory_raises(spark, tmp_path):
    p = tmp_path / "empty.jsonl"
    p.write_text(
        _item("itemD", [("thumbnail", "s3://x/D_thumb.png", None)]) + "\n"
    )
    with pytest.raises(ValueError, match="cannot be retrieved"):
        stac.assets_by_common_name(stac.read_stac_items(spark, str(p)))


def test_unparsed_document_fails_loudly(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(GOOD[0] + "\n" + "{not json at all\n")
    with pytest.raises(ValueError, match="cannot be retrieved"):
        stac.assets_by_common_name(stac.read_stac_items(spark, str(p)))


def test_band_to_cname_parity():
    # stacitem.py:94-108 naive conversion table
    assert [stac.band_to_cname(i) for i in (1, 2, 3, 4)] == [
        "red",
        "green",
        "blue",
        "nir",
    ]
    assert stac.band_to_cname("R") == "red"
    assert stac.band_to_cname("N") == "nir"
    assert stac.band_to_cname("green") == "green"
    for bad in (0, 5, "X", "magenta"):
        with pytest.raises(ValueError, match="Cannot convert"):
            stac.band_to_cname(bad)
    assert stac.is_valid_cname("swir16") and not stac.is_valid_cname("uv")
