"""K9 — split visualization PNGs, Spark-native and codec-free.

Reference semantics (utils/visualization.py:148-237 `visualize_csv_patches`):
sample up to `samples_per_split` patches of one split with a seeded RNG,
render each as [RGB image | colormapped label] side by side, and save ONE
grid PNG to ``{output_dir}/{prefix}/{prefix}_{split}.png``; an empty split
is a silent no-op. The reference does this with matplotlib + rasterio on
driver-side file reads.

Spark-native rebuild: the sample is a seeded-hash TakeOrderedAndProject
over the distributed tile rows (no full sort, no full collect — only the
<= samples_per_split winners reach the driver, same cardinality the
reference reads), the compositor is pure numpy, and the PNG bytes come
from the engine's own encoder (multimodal.binary.encode_png — stdlib zlib,
vectorized RFC 2083 forward filtering), so K9 needs neither matplotlib nor
any codec library. Label colors use the tab10 palette values (public
matplotlib constants) keyed by burn value, IGNORE=255 renders gray,
background 0 renders black — the same visual contract as the reference's
``cmap='tab10'`` imshow without replicating matplotlib's value rescaling.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..multimodal.binary import encode_png
from ..operators.raster import IGNORE

# matplotlib tab10 categorical palette (public constants), as uint8 RGB
TAB10 = np.array(
    [
        (31, 119, 180),
        (255, 127, 14),
        (44, 160, 44),
        (214, 39, 40),
        (148, 103, 189),
        (140, 86, 75),
        (227, 119, 194),
        (127, 127, 127),
        (188, 189, 34),
        (23, 190, 207),
    ],
    dtype=np.uint8,
)

PAD = 4  # white gutter between grid cells, pixels


def colormap_label(lbl: np.ndarray) -> np.ndarray:
    """(H, W) uint8 label patch -> (H, W, 3) uint8 RGB: burn value v>0 maps
    to TAB10[(v-1) % 10], background 0 to black, IGNORE to mid-gray."""
    out = TAB10[(lbl.astype(np.int32) - 1) % 10]
    out[lbl == 0] = 0
    out[lbl == IGNORE] = 127
    return out


def normalize_rgb(bands_chw: np.ndarray) -> np.ndarray:
    """First three bands CHW -> HWC uint8, min-max stretched per patch —
    the reference's display normalization (visualization.py:203-205)."""
    rgb = bands_chw[:3].astype(np.float32)
    lo, hi = rgb.min(), rgb.max()
    rgb = (rgb - lo) / (hi - lo + 1e-6)
    return (rgb * 255.0 + 0.5).astype(np.uint8).transpose(1, 2, 0)


def render_patch_grid(pairs: list[tuple[np.ndarray, np.ndarray]]) -> np.ndarray:
    """Compose n rows of [RGB patch | label patch] into one RGB canvas with
    white gutters; all patches share one (H, W) shape (fixed-stride grid)."""
    if not pairs:
        raise ValueError("render_patch_grid needs at least one patch pair")
    h, w, _ = pairs[0][0].shape
    rows = len(pairs)
    canvas = np.full(
        (PAD + rows * (h + PAD), PAD + 2 * (w + PAD), 3), 255, dtype=np.uint8
    )
    for i, (img, lbl_rgb) in enumerate(pairs):
        y = PAD + i * (h + PAD)
        canvas[y : y + h, PAD : PAD + w] = img
        canvas[y : y + h, 2 * PAD + w : 2 * PAD + 2 * w] = lbl_rgb
    return canvas


def sample_split_tiles(
    image_tiles: DataFrame,
    label_tiles: DataFrame,
    split: str,
    samples_per_split: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Seeded deterministic sample of joined (image, label) tile rows for
    one split. orderBy(hash).limit(n) compiles to TakeOrderedAndProject —
    per-partition top-n then a driver merge of n*partitions candidates, so
    the plan is collect-safe at any corpus size."""
    img = image_tiles.filter(F.col("split") == split).select(
        "image_id", "tile_x", "tile_y", "bands", "n_bands"
    )
    lbl = label_tiles.select("image_id", "tile_x", "tile_y", "patch")
    joined = img.join(lbl, ["image_id", "tile_x", "tile_y"])
    rank = F.xxhash64(F.lit(seed), "image_id", "tile_x", "tile_y")
    return joined.orderBy(rank.asc(), "image_id", "tile_x", "tile_y").limit(
        samples_per_split
    )


def visualize_split(
    image_tiles: DataFrame,
    label_tiles: DataFrame,
    out_dir: str,
    prefix: str,
    split: str,
    patch_h: int,
    patch_w: int,
    samples_per_split: int = 5,
    seed: int = 0,
) -> str | None:
    """K9 sink: write ``{out_dir}/{prefix}/{prefix}_{split}.png`` from a
    seeded sample of the split's materialized tiles; None when the split is
    empty (reference: silent return on an empty CSV). The collect is
    bounded at samples_per_split rows by the TakeOrderedAndProject sample —
    the only driver-side data is the handful of patches being drawn."""
    rows = sample_split_tiles(
        image_tiles, label_tiles, split, samples_per_split, seed
    ).collect()
    if not rows:
        return None
    pairs = []
    for r in rows:
        bands = np.frombuffer(bytes(r.bands), dtype=np.uint8).reshape(
            r.n_bands, patch_h, patch_w
        )
        lbl = np.frombuffer(bytes(r.patch), dtype=np.uint8).reshape(patch_h, patch_w)
        pairs.append((normalize_rgb(bands), colormap_label(lbl)))
    png = encode_png(render_patch_grid(pairs))
    dest = os.path.join(out_dir, prefix)
    os.makedirs(dest, exist_ok=True)
    path = os.path.join(dest, f"{prefix}_{split}.png")
    with open(path, "wb") as fh:
        fh.write(png)
    return path
