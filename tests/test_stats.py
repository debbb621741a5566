"""Greedy validation-cell selection determinism + running stats vs numpy."""

import numpy as np

from geotiff_tiler_spark.operators import stats


def test_greedy_selector_class_coverage_first():
    # 4 classes, each present only in one distinct cell -> phase 1 must pick
    # all four cells before filling
    target = {"a": 0.25, "b": 0.25, "c": 0.25, "d": 0.25}
    cells = {
        "0_0": {"a": 1.0},
        "1_1": {"b": 1.0},
        "2_2": {"c": 1.0},
        "3_3": {"d": 1.0},
        "0_3": {"a": 0.5, "b": 0.5},
    }
    got = stats.select_validation_cells(
        cells, grid_size=4, total_patches=160, target_distribution=target, val_ratio=0.2
    )
    # phase 1 prefers the multi-class cell (-10 per new class, reference
    # val.py:222): 0_3 covers {a,b} in one pick, then c and d need their
    # dedicated cells — all four classes must end up covered
    assert {"0_3", "2_2", "3_3"} <= got
    covered = set()
    for cid in got:
        covered |= {c for c, v in cells[cid].items() if v > 0.01}
    assert covered == set(target)


def test_greedy_selector_deterministic_tiebreak():
    # two identical cells: insertion order (gx outer, gy inner) must win
    target = {"a": 1.0}
    cells = {"0_0": {"a": 1.0}, "0_1": {"a": 1.0}, "1_0": {"a": 1.0}}
    got1 = stats.select_validation_cells(cells, 2, 8, target, 0.25)
    got2 = stats.select_validation_cells(cells, 2, 8, target, 0.25)
    assert got1 == got2
    # target_val_size = max(5, int(8*0.25)) = 5 -> patches_per_cell = 2
    # -> picks 3 cells (est 2,4,6 >= 5 after 3) but only 3 valid cells exist
    assert len(got1) == 3


def test_greedy_selector_spatial_diversity():
    # phase 2 prefers cells far from already-selected ones
    target = {"a": 1.0}
    cells = {f"{x}_{y}": {"a": 1.0} for x in range(4) for y in range(4)}
    got = stats.select_validation_cells(cells, 4, 16 * 100, target, 0.25)
    # needs int(1600*.25)=400 patches at 100/cell -> 4 cells
    assert len(got) == 4
    xs = [tuple(map(int, c.split("_"))) for c in got]
    # selected cells should not be a single clump: max pairwise Manhattan > 2
    dists = [abs(a[0] - b[0]) + abs(a[1] - b[1]) for a in xs for b in xs]
    assert max(dists) >= 3


def test_random_selector_seeded():
    ids = [f"{x}_{y}" for x in range(4) for y in range(4)]
    a = stats.select_validation_cells_random(ids, 0.25, seed=42)
    b = stats.select_validation_cells_random(ids, 0.25, seed=42)
    c = stats.select_validation_cells_random(ids, 0.25, seed=43)
    assert a == b and len(a) == 4
    assert a != c  # overwhelmingly likely


def test_running_band_stats_vs_numpy(spark):
    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 255, size=200)
    rows = [(1, float(v)) for v in vals]
    df = spark.createDataFrame(rows, ["image_id", "v"])
    out = stats.running_band_stats(df, ["v"]).collect()[0]
    assert out.n == 200
    assert abs(out.mean_v - round(float(vals.mean()), 6)) <= 1e-6
    # reference finalization: std = sqrt(E[X^2] - E[X]^2) (population std)
    assert abs(out.std_v - round(float(vals.std()), 6)) <= 1e-6


def test_incremental_distribution_merge():
    old = {"a": 0.5, "b": 0.5}
    cur = {"a": 1.0}
    got = stats.incremental_distribution_merge(old, cur, k=1)
    assert abs(got["a"] - 0.75) < 1e-12 and abs(got["b"] - 0.25) < 1e-12


def test_target_distribution_mean(spark):
    df = spark.createDataFrame(
        [(1, "a", 1, 0.2), (2, "a", 1, 0.4), (1, "b", 1, 0.8)],
        ["image_id", "class", "cnt", "frac"],
    )
    got = stats.target_distribution(df)
    assert abs(got["a"] - 0.3) < 1e-12 and abs(got["b"] - 0.8) < 1e-12


def test_distributed_selector_matches_driver(spark, docs):
    from geotiff_tiler_spark.operators import tiling
    from geotiff_tiler_spark.operators.tiling import TilingParams

    p = TilingParams()
    pts = tiling.doc_points(docs, p)
    grid_dists = stats.grid_cell_distributions(pts, p)
    target = stats.target_distribution(stats.class_distribution(pts))
    driver = stats.select_validation_cells_for_images(grid_dists, p, target, 0.2)
    dist = stats.select_validation_cells_distributed(grid_dists, p, target, 0.2)
    got = {}
    for r in dist.collect():
        got.setdefault(r.image_id, set()).add(r.cell_key)
    assert got == driver

    # random strategy parity (seeded)
    driver_r = stats.select_validation_cells_for_images(
        grid_dists, p, target, 0.2, strategy="random", seed=42
    )
    dist_r = stats.select_validation_cells_distributed(
        grid_dists, p, target, 0.2, strategy="random", seed=42
    )
    got_r = {}
    for r in dist_r.collect():
        got_r.setdefault(r.image_id, set()).add(r.cell_key)
    assert got_r == driver_r


def test_target_distribution_exact_distributed_bit_parity(spark, docs):
    """Round-4 VERDICT item 3: the distributed exact-rational A5 must
    produce BIT-identical doubles to the driver-collect variant (Fraction
    arithmetic is exact, so bucketing/order cannot change the result) —
    across different bucket counts too."""
    from geotiff_tiler_spark.operators import tiling
    from geotiff_tiler_spark.operators.tiling import TilingParams

    pts = tiling.doc_points(docs, TilingParams())
    driver = stats.target_distribution_exact_from_points(pts)
    for n_buckets in (1, 7, 64):
        dist = stats.target_distribution_exact_distributed(pts, n_buckets=n_buckets)
        assert dist == driver  # exact ==, not approx: bit parity
