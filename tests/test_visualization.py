"""K9 visualization PNGs: encoder roundtrip, compositor geometry, and the
end-to-end split-grid sink (reference utils/visualization.py:148-237)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from geotiff_tiler_spark.multimodal import binary as mm
from geotiff_tiler_spark.operators import tiling
from geotiff_tiler_spark.operators.tiling import TilingParams
from geotiff_tiler_spark.plans import visualization as viz
from geotiff_tiler_spark.plans.raster_pipeline import (
    materialize_image_tiles,
    materialize_label_tiles,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("shape", [(7, 5, 1), (16, 16, 2), (9, 13, 3), (32, 8, 4)])
def test_encode_png_roundtrip_noise(shape):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert (mm.decode_png(mm.encode_png(arr)) == arr).all()


def test_encode_png_roundtrip_smooth_gradient():
    """Smooth content drives the MSAD heuristic into filters 1-4; the
    roundtrip must stay bit-exact and the deflate payload must actually
    shrink vs unfiltered raw bytes (the point of filtering)."""
    gy, gx = np.mgrid[0:64, 0:64]
    arr = np.stack(
        [(gx * 2) % 256, (gy * 3) % 256, ((gx + gy) * 5) % 256], axis=2
    ).astype(np.uint8)
    payload = mm.encode_png(arr)
    assert (mm.decode_png(payload) == arr).all()
    assert len(payload) < len(zlib.compress(arr.tobytes())) + 100


def test_encode_png_grayscale_2d_and_crc():
    """A 2-D array encodes as color type 0, every chunk carries a valid
    CRC (decode_png skips CRCs, so verify them independently here)."""
    arr = ((np.arange(100).reshape(10, 10) * 7) % 256).astype(np.uint8)
    payload = mm.encode_png(arr)
    assert (mm.decode_png(payload) == arr[:, :, None]).all()
    pos = 8
    seen = []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        assert crc == (zlib.crc32(typ + data) & 0xFFFFFFFF), typ
        seen.append(typ)
        pos += 12 + ln
    assert seen == [b"IHDR", b"IDAT", b"IEND"]


def test_encode_png_rejects_bad_input():
    with pytest.raises(ValueError):
        mm.encode_png(np.zeros((4, 4), dtype=np.float32))
    with pytest.raises(ValueError):
        mm.encode_png(np.zeros((4, 4, 5), dtype=np.uint8))


def test_colormap_label_palette():
    lbl = np.array([[0, 1, 2, 11, viz.IGNORE]], dtype=np.uint8)
    rgb = viz.colormap_label(lbl)
    assert (rgb[0, 0] == 0).all()  # background black
    assert tuple(rgb[0, 1]) == tuple(viz.TAB10[0])  # burn 1 -> first color
    assert tuple(rgb[0, 2]) == tuple(viz.TAB10[1])
    assert tuple(rgb[0, 3]) == tuple(viz.TAB10[0])  # wraps mod 10
    assert (rgb[0, 4] == 127).all()  # IGNORE gray


def test_render_patch_grid_geometry():
    img = np.zeros((6, 4, 3), dtype=np.uint8)
    lbl = np.full((6, 4, 3), 9, dtype=np.uint8)
    canvas = viz.render_patch_grid([(img, lbl)] * 3)
    p = viz.PAD
    assert canvas.shape == (p + 3 * (6 + p), p + 2 * (4 + p), 3)
    assert (canvas[0:p] == 255).all()  # top gutter white
    assert (canvas[p : p + 6, p : p + 4] == 0).all()  # first image cell
    assert (canvas[p : p + 6, 2 * p + 4 : 2 * p + 8] == 9).all()  # label cell


P = TilingParams(
    image_res=3, width=448, height=448, patch_w=112, patch_h=112,
    stride=None, discard_empty=True, label_threshold=0.0002,
    grid_size=4, val_ratio=0.2,
)


@pytest.fixture(scope="module")
def split_tiles(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pts = tiling.doc_points(docs, P)
    kept = tiling.assign_split(
        tiling.filter_patches(tiling.full_tile_grid(pts, P), P).filter("keep"), P
    )
    img = materialize_image_tiles(kept, P).cache()
    lbl = materialize_label_tiles(pts, P, class_order=["en", "fr", "de", "es"]).cache()
    return img, lbl


def test_visualize_split_end_to_end(spark, split_tiles, tmp_path):
    """The written grid PNG decodes with the engine's own decoder to the
    exact canvas geometry, deterministically across invocations."""
    img, lbl = split_tiles
    path = viz.visualize_split(
        img, lbl, str(tmp_path), "demo", "trn", P.patch_h, P.patch_w,
        samples_per_split=3, seed=0,
    )
    assert path is not None and path.endswith("demo/demo_trn.png")
    with open(path, "rb") as fh:
        payload = fh.read()
    arr = mm.decode_png(payload)
    n = min(3, img.filter("split = 'trn'").count())
    p = viz.PAD
    assert arr.shape == (p + n * (112 + p), p + 2 * (112 + p), 3)
    # deterministic: same seed -> byte-identical file
    path2 = viz.visualize_split(
        img, lbl, str(tmp_path / "again"), "demo", "trn", P.patch_h, P.patch_w,
        samples_per_split=3, seed=0,
    )
    with open(path2, "rb") as fh:
        assert fh.read() == payload
    # a different seed samples a different patch set (hash order changes)
    path3 = viz.visualize_split(
        img, lbl, str(tmp_path / "seed"), "demo", "trn", P.patch_h, P.patch_w,
        samples_per_split=3, seed=1,
    )
    with open(path3, "rb") as fh:
        assert fh.read() != payload


def test_visualize_empty_split_is_none(spark, split_tiles, tmp_path):
    img, lbl = split_tiles
    assert (
        viz.visualize_split(
            img, lbl, str(tmp_path), "demo", "nosuch", P.patch_h, P.patch_w
        )
        is None
    )


def test_sample_plan_is_take_ordered(spark, split_tiles):
    """The seeded sample must compile to TakeOrderedAndProject — bounded
    driver traffic at any corpus size, not a global sort + collect."""
    img, lbl = split_tiles
    plan = (
        viz.sample_split_tiles(img, lbl, "trn", 5, 0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
