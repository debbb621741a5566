"""WebDataset tar sink: rotation, determinism, registry accounting, and
byte-level roundtrip of the per-patch sample members."""

from __future__ import annotations

import hashlib
import io
import tarfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotiff_tiler_spark.operators import tiling
from geotiff_tiler_spark.operators.tiling import TilingParams
from geotiff_tiler_spark.plans import webdataset as wd
from geotiff_tiler_spark.plans.raster_pipeline import materialize_label_tiles

SF = "/root/testdata/sf0.001"
P = TilingParams(
    image_res=3, width=448, height=448, patch_w=112, patch_h=112,
    stride=None, discard_empty=True, label_threshold=0.0002,
    grid_size=4, val_ratio=0.2,
)


def _samples(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pts = tiling.doc_points(docs, P)
    tiles = materialize_label_tiles(pts, P, class_order=["en", "fr", "de", "es"])
    split = tiles.withColumn(
        "split", F.when(F.col("image_id") % 2 == 0, "trn").otherwise("val")
    )
    keyed = tiling.patch_key(split)
    return wd.metadata_json(
        keyed, ["image_id", "tile_x", "tile_y", "n_label_px", "n_classes"]
    ).select("patch_key", "split", "patch", "metadata")


def _write(spark, tmp, max_count=5):
    samples = _samples(spark)
    reg = wd.write_webdataset(
        samples,
        str(tmp),
        members={"label_patch.npy": "patch", "metadata.json": "metadata"},
        max_count=max_count,
        partitions=4,
    )
    return samples, reg.collect()


def test_roundtrip_and_registry(spark, tmp_path):
    samples, reg = _write(spark, tmp_path / "wds")
    want = {r.patch_key: (bytes(r.patch), r.metadata) for r in samples.collect()}
    assert len(want) > 10

    # registry accounts for every sample exactly once, sizes are real files
    assert sum(r.n_samples for r in reg) == len(want)
    assert all(r.size_bytes > 0 for r in reg)
    # rotation: max_count=5 forces multiple shards per split
    assert len(reg) > 2
    assert {r.split for r in reg} == {"trn", "val"}

    back = wd.read_webdataset(spark, str(tmp_path / "wds")).collect()
    got: dict[str, dict[str, bytes]] = {}
    for r in back:
        got.setdefault(r.key, {})[r.member] = bytes(r.payload)
    assert set(got) == set(want)
    for key, members in got.items():
        assert set(members) == {"label_patch.npy", "metadata.json"}
        assert members["metadata.json"].decode() == want[key][1]
        assert members["label_patch.npy"] == bytes(want[key][0])

    # members of one sample are contiguous within a shard (WebDataset rule)
    for r in reg:
        p = tmp_path / "wds" / r.split / r.shard
        with tarfile.open(p) as tf:
            names = [i.name for i in tf]
        keys = [n.split(".", 1)[0] for n in names]
        seen, prev = set(), None
        for k in keys:
            if k != prev:
                assert k not in seen, f"sample {k} split across positions"
                seen.add(k)
            prev = k


def test_deterministic_bytes(spark, tmp_path):
    _, reg1 = _write(spark, tmp_path / "a")
    _, reg2 = _write(spark, tmp_path / "b")

    def digests(root, reg):
        return {
            (r.split, r.shard): hashlib.md5(
                (root / r.split / r.shard).read_bytes()
            ).hexdigest()
            for r in reg
        }

    assert digests(tmp_path / "a", reg1) == digests(tmp_path / "b", reg2)


def test_npy_member_is_loadable():
    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw = wd.npy_bytes(arr)
    back = np.load(io.BytesIO(raw))
    assert (back == arr).all() and back.dtype == np.uint8


def test_size_rotation(spark, tmp_path):
    samples = _samples(spark)
    reg = wd.write_webdataset(
        samples,
        str(tmp_path / "wds"),
        members={"label_patch.npy": "patch"},
        max_count=10**9,
        max_bytes=40 * 1024,  # patches are 12.25 KiB -> ~3 per shard
        partitions=1,
    ).collect()
    per_shard = [r.n_samples for r in reg]
    assert max(per_shard) <= 3
    assert sum(per_shard) == samples.count()
