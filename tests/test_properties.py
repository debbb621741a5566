"""Property-based tests (hypothesis) for the pure-numpy geometry/raster
kernels — no JVM involved, so these shrink failures to minimal cases."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st_

from geotiff_tiler_spark.operators import raster, reproject, strtree as st

SETTINGS = dict(max_examples=30, deadline=None)

boxes_strategy = st_.lists(
    st_.tuples(
        st_.floats(0, 90, allow_nan=False),
        st_.floats(0, 90, allow_nan=False),
        st_.floats(0.1, 10, allow_nan=False),
        st_.floats(0.1, 10, allow_nan=False),
    ),
    min_size=0,
    max_size=60,
)


@settings(**SETTINGS)
@given(
    boxes_strategy,
    st_.floats(-5, 105, allow_nan=False),
    st_.floats(-5, 105, allow_nan=False),
)
def test_strtree_point_query_property(raw, qx, qy):
    boxes = np.array([(x, y, x + w, y + h) for x, y, w, h in raw]).reshape(-1, 4)
    tree = st.STRtree(boxes)
    got = sorted(tree.query_point(qx, qy).tolist())
    want = sorted(
        i
        for i in range(len(boxes))
        if boxes[i, 0] <= qx <= boxes[i, 2] and boxes[i, 1] <= qy <= boxes[i, 3]
    )
    assert got == want


triangle_strategy = st_.tuples(
    st_.floats(-20, 20, allow_nan=False),
    st_.floats(-20, 20, allow_nan=False),
    st_.floats(1, 15, allow_nan=False),
    st_.floats(1, 15, allow_nan=False),
)


@settings(**SETTINGS)
@given(
    triangle_strategy,
    st_.floats(-10, 10, allow_nan=False),
    st_.floats(-10, 10, allow_nan=False),
    st_.floats(1, 8, allow_nan=False),
    st_.floats(1, 8, allow_nan=False),
)
def test_clip_properties(tri_p, bx, by, bw, bh):
    cx, cy, w, h = tri_p
    tri = np.array(
        [[cx - w / 2, cy - h / 2], [cx + w / 2, cy - h / 2], [cx, cy + h / 2]]
    )
    tri = np.vstack([tri, tri[:1]])
    xmin, ymin, xmax, ymax = bx, by, bx + bw, by + bh
    clipped = st.clip_ring_to_box(tri, xmin, ymin, xmax, ymax)
    if len(clipped) == 0:
        return
    # clipped ring stays inside the box (within fp tolerance)
    assert clipped[:, 0].min() >= xmin - 1e-9 and clipped[:, 0].max() <= xmax + 1e-9
    assert clipped[:, 1].min() >= ymin - 1e-9 and clipped[:, 1].max() <= ymax + 1e-9
    # area never grows
    assert st.ring_area(clipped) <= st.ring_area(tri) + 1e-9
    # idempotent
    again = st.clip_ring_to_box(clipped, xmin, ymin, xmax, ymax)
    assert abs(st.ring_area(again) - st.ring_area(clipped)) < 1e-9


@settings(**SETTINGS)
@given(st_.integers(1, 14), st_.integers(1, 14), st_.integers(0, 10**9))
def test_edt_property(h, w, seed):
    rng = np.random.default_rng(seed)
    mask = rng.random((h, w)) < 0.15
    d = raster.edt(mask)
    if not mask.any():
        assert np.isinf(d).all()
        return
    assert (d[mask] == 0).all()
    # triangle inequality vs any true pixel: d <= distance to that pixel
    ys, xs = np.nonzero(mask)
    y0, x0 = int(ys[0]), int(xs[0])
    yy, xx = np.mgrid[0:h, 0:w]
    direct = np.sqrt((yy - y0) ** 2 + (xx - x0) ** 2)
    assert (d <= direct + 1e-9).all()


@settings(**SETTINGS)
@given(
    st_.floats(-179.9, 179.9, allow_nan=False),
    st_.floats(-84.9, 84.9, allow_nan=False),
)
def test_mercator_roundtrip_property(lon, lat):
    x, y = reproject.lonlat_to_mercator(np.array([lon]), np.array([lat]))
    lon2, lat2 = reproject.mercator_to_lonlat(x, y)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@settings(**SETTINGS)
@given(st_.integers(1, 12), st_.integers(1, 12), st_.integers(0, 10**9))
def test_erosion_subset_property(h, w, seed):
    rng = np.random.default_rng(seed)
    mask = rng.random((h, w)) < 0.5
    er = raster.binary_erode(mask)
    assert (er <= mask).all()  # erosion shrinks
    # eroded pixels have all 4 neighbors set
    ys, xs = np.nonzero(er)
    for y, x in zip(ys.tolist(), xs.tolist()):
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ny, nx = y + dy, x + dx
            assert 0 <= ny < h and 0 <= nx < w and mask[ny, nx]
