"""spark-submit entry point (north rule: runs via spark-submit --py-files).

Usage:
  spark-submit --py-files dist/geotiff_tiler_spark.zip tools/submit_job.py \
      [n_pages] [out_dir]

Runs the flagship create_tiles pipeline on a synthesized pages table and
prints the commit summary + scale-workload metrics as JSON.
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="gts-")
    spark = SparkSession.builder.appName("geotiff-tiler-spark").getOrCreate()

    from geotiff_tiler_spark.operators.tiling import TilingParams
    from geotiff_tiler_spark.plans.pipeline import create_tiles
    from geotiff_tiler_spark.plans.scale_job import run_scale_workload
    from geotiff_tiler_spark.sources import pages

    docs = pages.synth_pages(spark, n_pages).select(
        "doc_id", pages.extract_text("html").alias("text"), "lang"
    )
    params = TilingParams(label_threshold=None)
    run = create_tiles(spark, docs, params, f"{out_dir}/out", f"{out_dir}/manifest")
    metrics = run_scale_workload(spark, n_pages)
    print(
        json.dumps(
            {
                "kept": run.kept,
                "skipped_resume": run.skipped_resume,
                "images": run.images,
                "commit_id": run.commit_id,
                "out_dir": out_dir,
                "scale": metrics,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
