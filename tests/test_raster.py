"""Raster kernels vs brute-force oracles + the Spark two-pass SDF."""

import numpy as np
import pytest

from geotiff_tiler_spark.operators import raster


def brute_edt(mask):
    """O(n^2) exact distance oracle."""
    ys, xs = np.nonzero(mask)
    h, w = mask.shape
    out = np.full((h, w), np.inf)
    if len(ys) == 0:
        return out
    for y in range(h):
        for x in range(w):
            out[y, x] = np.sqrt(((ys - y) ** 2 + (xs - x) ** 2).min())
    return out


def test_edt_matches_bruteforce():
    rng = np.random.default_rng(5)
    for shape in [(1, 1), (7, 5), (20, 30)]:
        mask = rng.random(shape) < 0.1
        got = raster.edt(mask)
        want = brute_edt(mask)
        both_inf = np.isinf(got) & np.isinf(want)
        assert np.allclose(got[~both_inf], want[~both_inf], atol=1e-9)
        assert (np.isinf(got) == np.isinf(want)).all()


def test_edt_empty_and_full():
    assert np.isinf(raster.edt(np.zeros((4, 4), dtype=bool))).all()
    assert (raster.edt(np.ones((4, 4), dtype=bool)) == 0).all()


def test_burn_value_map():
    assert raster.burn_value_map(["fore", "hydro"]) == {"fore": 1, "hydro": 2}
    assert raster.burn_value_map([3, 7], continuous=False) == {3: 3, 7: 7}


def test_rasterize_points_overwrite_order():
    # same pixel, burns 2 and 1 -> 2 wins (ascending ordering: higher
    # burn value overwrites, reference io.py:680)
    px = np.array([3, 3])
    py = np.array([2, 2])
    out = raster.rasterize_points(px, py, np.array([2, 1]), 5, 5)
    assert out[2, 3] == 2
    out2 = raster.rasterize_points(px, py, np.array([1, 2]), 5, 5)
    assert out2[2, 3] == 2


def test_rasterize_polygon_center_sampling():
    sq = np.array([[1.0, 1.0], [4.0, 1.0], [4.0, 4.0], [1.0, 4.0]])
    out = raster.rasterize_polygon_rings([sq], 6, 6, burn=7)
    inside = {(x, y) for y in range(6) for x in range(6) if out[y, x] == 7}
    # pixel centers 1.5..3.5 lie inside [1,4)
    assert inside == {(x, y) for x in (1, 2, 3) for y in (1, 2, 3)}


def test_nodata_mask_and_erosion_restore():
    label = np.zeros((8, 8), dtype=np.uint8)
    label[2:6, 2:6] = 1  # 16 px instance
    label[0, 0] = 2  # 1 px instance
    nod = np.zeros((8, 8), dtype=bool)
    nod[7, 7] = True
    with_nod = raster.apply_nodata_mask(label, nod)
    assert with_nod[7, 7] == raster.IGNORE

    eroded = raster.erode_instances(with_nod, iterations=1, min_area=2)
    # 4x4 instance erodes to 2x2=4 px >= min_area BUT orig 16 >= 3*2=6 -> kept eroded
    assert (eroded == 1).sum() == 4
    # 1 px instance would vanish -> restored (reference io.py:668-675)
    assert eroded[0, 0] == 2
    assert eroded[7, 7] == raster.IGNORE


def test_dual_distance_weight_peaks_between_instances():
    label = np.zeros((9, 21), dtype=np.uint8)
    label[4, 3] = 1
    label[4, 17] = 2
    w = raster.dual_distance_weight(label, max_dist=12.0, sigma=8.0)
    mid = w[4, 10]
    assert mid > 0
    # pixels far from the second instance get 0 (d2 >= max_dist)
    assert w[0, 0] == 0
    # single-instance tile -> all zeros (d2 = inf)
    w1 = raster.dual_distance_weight(np.where(label == 2, 0, label).astype(np.uint8))
    assert (w1 == 0).all()


def test_gaussian_splat_clip():
    pts = np.array([[5.0, 5.0]] * 10)  # stacked splats must clip at 1
    out = raster.gaussian_splat(pts, 11, 11, sigma=1.5)
    assert out.max() == 1.0
    assert out[5, 5] == 1.0
    assert out[0, 0] < 0.1


def test_sdf_sign_and_normalization():
    label = np.zeros((10, 10), dtype=np.uint8)
    label[3:7, 3:7] = 1
    sdf = raster.sdf_unnormalized(label)
    assert sdf[5, 5] > 0  # inside positive
    assert sdf[0, 0] < 0  # outside negative
    norm = raster.sdf_normalize(sdf, float(np.abs(sdf).max()))
    assert norm.max() <= 1.0 and norm.min() >= -1.0
    # global max < 1 -> divide by 1 (reference build_targets.py:357)
    tiny = raster.sdf_normalize(np.array([[0.5, -0.25]], dtype=np.float32), 0.5)
    assert tiny[0, 0] == np.float32(0.5)


@pytest.fixture(scope="module")
def label_tiles(spark, docs):
    from geotiff_tiler_spark.operators.tiling import TilingParams, doc_points
    from geotiff_tiler_spark.plans.raster_pipeline import materialize_label_tiles

    params = TilingParams(patch_w=112, patch_h=112)
    pts = doc_points(docs, params)
    tiles = materialize_label_tiles(
        pts, params, class_order=["en", "fr", "de", "es"]
    ).cache()
    return params, pts, tiles


def test_materialize_label_tiles_counts(spark, label_tiles):
    import numpy as np

    from geotiff_tiler_spark.operators import tiling

    params, pts, tiles = label_tiles
    rows = tiles.collect()
    assert rows
    for r in rows[:10]:
        patch = np.frombuffer(bytes(r.patch), dtype=np.uint8).reshape(
            params.patch_h, params.patch_w
        )
        lab = (patch > 0) & (patch != 255)
        assert lab.sum() == r.n_label_px
    # label pixel counts must reconcile with the pure-SQL tile stats,
    # except pixels blanked by the synthetic nodata stripe
    stats = {
        (s.image_id, s.tile_x, s.tile_y): s.nonzero_px
        for s in tiling.tile_label_stats(tiling.assign_tiles(pts, params), params).collect()
    }
    for r in rows:
        assert r.n_label_px <= stats[(r.image_id, r.tile_x, r.tile_y)]


def test_sdf_two_pass_normalizes_per_image(spark, label_tiles):
    import numpy as np

    from geotiff_tiler_spark.plans.raster_pipeline import sdf_normalized

    params, _, tiles = label_tiles
    out = sdf_normalized(tiles.limit(20), params).collect()
    assert out
    for r in out:
        sdf = np.frombuffer(bytes(r.target), dtype=np.float32)
        assert np.abs(sdf).max() <= 1.0 + 1e-6


def test_centerline_weight_peaks_at_center():
    label = np.zeros((9, 15), dtype=np.uint8)
    label[3:6, 1:14] = 1  # 3-px-tall horizontal bar
    w = raster.centerline_weight_unnormalized(label)
    # center row of the bar carries the max interior distance
    assert w[4, 7] == w.max() > w[3, 7] > 0
    assert w[0, 0] == 0
    u8 = raster.centerline_weight_normalize(w, float(w.max()))
    assert u8.max() == 255 and u8.dtype == np.uint8
    # two instances max-merge without bleeding past bboxes
    label[7, 1] = 2
    w2 = raster.centerline_weight_unnormalized(label)
    assert w2[7, 1] > 0 and (w2[4] >= w[4]).all()


def test_image_tiles_and_band_stats(spark, docs):
    from pyspark.sql import functions as F

    from geotiff_tiler_spark.operators import tiling
    from geotiff_tiler_spark.operators.tiling import TilingParams
    from geotiff_tiler_spark.plans.raster_pipeline import (
        band_normalization_stats,
        materialize_image_tiles,
        synth_band_value,
    )

    p = TilingParams(label_threshold=None)
    pts = tiling.doc_points(docs, p)
    kept = tiling.assign_split(
        tiling.filter_patches(tiling.full_tile_grid(pts, p), p).filter("keep"), p
    )
    tiles = materialize_image_tiles(kept, p).cache()
    assert tiles.count() == kept.count()  # only kept tiles materialized
    r = tiles.first()
    bands = np.frombuffer(bytes(r.bands), dtype=np.uint8).reshape(3, p.patch_h, p.patch_w)
    gx = np.add.outer(np.zeros(p.patch_h, dtype=np.int64), np.arange(p.patch_w)) + r.tile_x
    gy = np.add.outer(np.arange(p.patch_h, dtype=np.int64), np.zeros(p.patch_w, dtype=np.int64)) + r.tile_y
    assert (bands[1] == synth_band_value(1, gx, gy)).all()
    assert abs(r.b_sum0 - bands[0].astype(np.float64).sum()) < 1e-6

    stats_row = band_normalization_stats(tiles).collect()[0]
    # numpy oracle over all trn patches
    trn = tiles.filter(F.col("split") == "trn").collect()
    allpx = np.concatenate(
        [np.frombuffer(bytes(t.bands), dtype=np.uint8).reshape(3, -1)[0] for t in trn]
    ).astype(np.float64)
    assert stats_row.n == len(allpx)
    assert abs(stats_row.mean_band0 - round(float(allpx.mean()), 6)) < 1e-6
    assert abs(stats_row.std_band0 - round(float(allpx.std()), 6)) < 1e-6


# ---------------------------------------------------------------------------
# J5 vector-domain nodata overlay (VERDICT item 8)
# ---------------------------------------------------------------------------


def _rasterize_polys(polys, h, w):
    import numpy as np

    from geotiff_tiler_spark.operators import strtree as st

    ys, xs = np.mgrid[0:h, 0:w]
    cx = xs.ravel() + 0.5
    cy = ys.ravel() + 0.5
    out = np.zeros(h * w, dtype=bool)
    for rings in polys:
        closed = [
            r if np.array_equal(r[0], r[-1]) else np.vstack([r, r[:1]]) for r in rings
        ]
        out |= st.points_in_rings(cx, cy, closed)
    return out.reshape(h, w)


def test_polygonize_mask_roundtrip():
    """Polygonize -> rasterize at pixel centers reproduces the mask, for
    blobs, holes, and diagonally-touching components (4-connectivity)."""
    import numpy as np

    from geotiff_tiler_spark.operators import raster

    rng = np.random.default_rng(11)
    cases = []
    m = np.zeros((12, 14), dtype=bool)
    m[2:7, 3:9] = True
    m[4:5, 5:7] = False  # hole
    m[8:11, 10:13] = True  # second component
    cases.append(m)
    m2 = np.zeros((6, 6), dtype=bool)
    m2[1, 1] = True
    m2[2, 2] = True  # diagonal touch: two components
    cases.append(m2)
    cases.append(rng.random((20, 25)) > 0.6)  # random speckle
    cases.append(np.zeros((5, 5), dtype=bool))  # empty
    cases.append(np.ones((4, 7), dtype=bool))  # full
    for m in cases:
        polys = raster.polygonize_mask(m)
        got = _rasterize_polys(polys, *m.shape)
        assert (got == m).all()
    # diagonal-touch case separates into two polygons (4-connectivity,
    # matching rasterio.features.shapes)
    assert len(raster.polygonize_mask(cases[1])) == 2


def test_mask_rectangles_partition():
    import numpy as np

    from geotiff_tiler_spark.operators import raster

    rng = np.random.default_rng(5)
    m = rng.random((15, 18)) > 0.5
    rects = raster.mask_rectangles(m)
    cover = np.zeros_like(m, dtype=int)
    for r0, r1, c0, c1 in rects:
        cover[r0:r1, c0:c1] += 1
    assert ((cover == 1) == m).all()  # exact, disjoint cover


def test_overlay_nodata_intersection_parity_with_per_pixel():
    """VERDICT item 8 'done' criterion: the vector-domain overlay's
    covered region equals the per-pixel mask path exactly (rasterized at
    pixel centers)."""
    import numpy as np

    from geotiff_tiler_spark.operators import raster

    h, w = 20, 24
    valid = np.ones((h, w), dtype=bool)
    valid[:, 7] = False                      # nodata stripe
    valid[12:17, 2:6] = False                # nodata blob
    # coords chosen so no pixel CENTER lies exactly on a label edge (a
    # center on the edge is ambiguous under half-open crossing rules and
    # flips with the 1-ulp perturbation clipping introduces)
    tri = np.array([[1.0, 1.2], [19.0, 3.1], [8.0, 18.0]])
    donut_o = np.array([[10.0, 8.0], [22.0, 8.0], [22.0, 19.0], [10.0, 19.0]])
    donut_h = np.array([[13.0, 11.0], [19.0, 11.0], [19.0, 16.0], [13.0, 16.0]])
    labels = [[tri], [donut_o, donut_h]]

    overlay = raster.overlay_nodata_intersection(labels, valid)
    got = _rasterize_polys(overlay, h, w)

    label_px = _rasterize_polys(labels, h, w)
    want = label_px & valid  # the per-pixel path: nodata -> removed
    assert (got == want).all()


def test_label_tiles_arrow_matches_reference_burn(spark):
    """r6 q35: the applyInArrow tile materialization must produce byte-
    identical patches and stats to a straight-line pandas reference of
    the same burn math (keep-mask, ascending burn, stripe nodata)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from geotiff_tiler_spark.operators import raster, tiling
    from geotiff_tiler_spark.plans.raster_pipeline import (
        assign_tiles,
        materialize_label_tiles,
        synthetic_nodata_mask,
    )
    import __spark_entry__ as e

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pts = tiling.doc_points(docs, e.P)
    got = {
        (r.image_id, r.tile_x, r.tile_y): (bytes(r.patch), r.n_label_px, r.n_classes)
        for r in materialize_label_tiles(
            pts, e.P, class_order=["en", "fr", "de", "es"]
        ).collect()
    }
    burn_map = raster.burn_value_map(["en", "fr", "de", "es"], continuous=True)
    pw, ph = e.P.patch_w, e.P.patch_h
    asg = (
        assign_tiles(pts, e.P)
        .filter(F.col("lang").isin(["en", "fr", "de", "es"]))
        .select("image_id", "tile_x", "tile_y", "px", "py", "lang")
        .toPandas()
    )
    want = {}
    for (img, tx, ty), g in asg.groupby(["image_id", "tile_x", "tile_y"]):
        lx = g["px"].to_numpy(dtype=np.int64) - tx
        ly = g["py"].to_numpy(dtype=np.int64) - ty
        keep = (lx >= 0) & (lx < pw) & (ly >= 0) & (ly < ph)
        lx, ly = lx[keep], ly[keep]
        burn = np.array([burn_map[c] for c in g["lang"].to_numpy()[keep]], dtype=np.int64)
        patch = raster.rasterize_points(lx, ly, burn, pw, ph)
        nod = synthetic_nodata_mask(
            np.add.outer(np.zeros(ph, dtype=np.int64), np.arange(pw)) + tx,
            np.add.outer(np.arange(ph, dtype=np.int64), np.zeros(pw, dtype=np.int64)) + ty,
        )
        patch = raster.apply_nodata_mask(patch, nod)
        lbl = (patch > 0) & (patch != raster.IGNORE)
        want[(img, tx, ty)] = (
            patch.tobytes(),
            int(lbl.sum()),
            int(len(np.unique(patch[lbl]))),
        )
    assert got.keys() == want.keys() and len(got) > 0
    for kk in got:
        assert got[kk] == want[kk], kk
