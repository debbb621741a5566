"""Kill/resume + manifest semantics (R1-R6, F7):

- a job killed mid-run resumes with zero recomputed tiles;
- final output after resume == single-shot run;
- an uncommitted (marker-less) directory is invisible to readers;
- consistency validator (A9) is clean after a complete run.
"""

import os
import shutil

from geotiff_tiler_spark.operators.tiling import TilingParams
from geotiff_tiler_spark.plans.manifest import Manifest
from geotiff_tiler_spark.plans.pipeline import create_tiles

P = TilingParams(label_threshold=None)


def _collect_tiles(spark, out_dir):
    path = os.path.join(out_dir, "tiles")
    df = spark.read.parquet(path)
    return sorted(
        (r.image_id, r.tile_x, r.tile_y, r.split, r.point_cnt) for r in df.collect()
    )


def test_kill_resume_no_recompute(spark, docs, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("resume"))
    full_dir, part_dir = f"{base}/full", f"{base}/part"

    # single-shot reference run
    r_full = create_tiles(spark, docs, P, f"{full_dir}/out", f"{full_dir}/mf")
    assert r_full.kept > 10

    # killed run: only 7 tiles committed
    r1 = create_tiles(spark, docs, P, f"{part_dir}/out", f"{part_dir}/mf", limit_tiles=7)
    assert r1.kept == 7 and r1.skipped_resume == 0

    # resume: must skip exactly the 7 committed tiles
    r2 = create_tiles(spark, docs, P, f"{part_dir}/out", f"{part_dir}/mf")
    assert r2.skipped_resume == 7
    assert r1.kept + r2.kept == r_full.kept

    # final state identical to the single-shot run, no duplicates
    assert _collect_tiles(spark, f"{part_dir}/out") == _collect_tiles(
        spark, f"{full_dir}/out"
    )

    # third run: everything already done
    r3 = create_tiles(spark, docs, P, f"{part_dir}/out", f"{part_dir}/mf")
    assert r3.kept == 0 and r3.skipped_resume == r_full.kept


def test_uncommitted_dir_invisible(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mf"))
    m = Manifest(spark, root)
    df = spark.createDataFrame(
        [(1, 0, 0, "trn", 3, 3)],
        "image_id long, tile_x long, tile_y long, split string, point_cnt long, nonzero_px long",
    )
    m.append("patches", df)
    assert m.completed_patches().count() == 1
    # simulate a crash mid-commit: parquet written, marker missing
    crashed = os.path.join(root, "patches", "9999999999999-deadbeef")
    df.withColumnRenamed("nonzero_px", "nonzero_px").write.parquet(crashed)
    assert not os.path.exists(os.path.join(crashed, "_COMMITTED"))
    assert m.completed_patches().count() == 1  # still invisible
    shutil.rmtree(crashed)


def test_consistency_report_clean(spark, docs, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("consist"))
    create_tiles(spark, docs, P, f"{base}/out", f"{base}/mf")
    m = Manifest(spark, f"{base}/mf")
    assert m.consistency_report() == []


def test_consistency_report_detects_mismatch(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mf2"))
    m = Manifest(spark, root)
    patches = spark.createDataFrame(
        [(1, 0, 0, "trn", 3, 3)],
        "image_id long, tile_x long, tile_y long, split string, point_cnt long, nonzero_px long",
    )
    m.append("patches", patches)
    images = spark.createDataFrame(
        [(1, "completed", 5, 0)], "image_id long, status string, kept long, discarded long"
    )
    m.append("images", images)  # claims 5 kept but only 1 patch row
    issues = m.consistency_report()
    assert len(issues) == 1 and "!=" in issues[0]
