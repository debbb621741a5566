"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested: schemas, partition-friendly
batch iteration (`mapInPandas`, Arrow-batched), deterministic fake
decoders sized like the real thing. The codec step itself is stubbed —
image/audio libraries are not available in this environment — behind
`decode_image_real`, which raises NotImplementedError with the intended
integration point documented.

Schema contract:
  media:    (media_id long, kind string, payload binary,
             meta struct<width int, height int, channels int,
                         sample_rate int, n_frames int>)
  features: (media_id long, kind string, feat array<float>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, channels:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = "media_id long, kind string, feat array<float>"

FEAT_DIM = 16


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media rows: payload bytes derived from media_id.

    Payload sizes mimic small thumbnails / audio snippets (1-16 KiB) so the
    Arrow batch shapes are realistic without real codecs."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for mid in ids:
                rng = np.random.default_rng(seed + int(mid))
                kind = ["image", "audio", "video"][int(mid) % 3]
                size = int(rng.integers(1024, 16384))
                payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
                meta = {
                    "width": int(rng.integers(16, 256)) if kind != "audio" else 0,
                    "height": int(rng.integers(16, 256)) if kind != "audio" else 0,
                    "channels": 3 if kind == "image" else (1 if kind == "audio" else 3),
                    "sample_rate": 16000 if kind == "audio" else 0,
                    "n_frames": int(rng.integers(1, 64)) if kind == "video" else 1,
                }
                rows.append((int(mid), kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n).mapInPandas(_gen, MEDIA_SCHEMA)


def decode_image_real(payload: bytes, meta: dict) -> np.ndarray:
    """Real decode hook — STUB.

    Integration point for Pillow/rasterio/ffmpeg on a real cluster:
    return an (H, W, C) uint8 array decoded from `payload`. Not available
    in this environment."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "plug Pillow/rasterio/ffmpeg here on a real deployment"
    )


def _fake_decode(payload: bytes, meta) -> np.ndarray:
    """Deterministic stand-in decode: payload bytes tiled to (H, W, C).

    Keeps the downstream feature-extraction path real (shape handling,
    dtype, reductions) while the codec is stubbed."""
    h = max(int(meta["height"]) or 8, 8)
    w = max(int(meta["width"]) or 8, 8)
    c = max(int(meta["channels"]), 1)
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = h * w * c
    arr = np.resize(raw, need).reshape(h, w, c)
    return arr


def extract_features(media: DataFrame, batch_size: int = 64) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched mapInPandas.

    Per row: decode (fake) -> per-channel mean/std + byte histogram summary
    -> FEAT_DIM float vector. The UDF signature, batch shape, and schema are
    the production contract; only `_fake_decode` is a stand-in."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].to_list()
            metas = pdf["meta"].to_list()
            # decode once per row (per-payload by nature — sizes vary), then
            # group same-shape decodes and VECTORIZE every reduction over
            # the stacked group — the batch shape a real vectorized decoder
            # (e.g. nvJPEG/torchvision batched decode) would feed
            groups: dict[tuple, list[tuple[int, np.ndarray]]] = {}
            for i, (p, m) in enumerate(zip(payloads, metas)):
                arr = _fake_decode(bytes(p), m)
                groups.setdefault(arr.shape, []).append((i, arr))
            feats = np.zeros((len(pdf), FEAT_DIM), dtype=np.float32)
            for shape, items in groups.items():
                idx = np.fromiter((i for i, _ in items), dtype=np.intp)
                stack = np.stack([a for _, a in items]).astype(np.float64)
                b, c = len(items), shape[2]
                flat = stack.reshape(b, -1, c)
                means = flat.mean(axis=1)  # (B, C)
                stds = flat.std(axis=1)
                binned = (stack.reshape(b, -1) // 32).astype(np.intp)
                offs = np.arange(b, dtype=np.intp)[:, None] * 8
                hist = np.bincount(
                    (binned + offs).ravel(), minlength=b * 8
                ).reshape(b, 8)
                hist = hist / hist.sum(axis=1, keepdims=True)
                nc = min(c, 4)
                feats[idx, :nc] = means[:, :nc]
                feats[idx, 4 : 4 + nc] = stds[:, :nc]
                feats[idx, 8:16] = hist
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "feat": list(feats),
                }
            )

    return media.mapInPandas(_feat, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index
    (JVM-side sequence explode on metadata; the frame decode itself would
    plug into decode_image_real)."""
    vids = media.filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
    return vids.select(
        "media_id", F.explode(idx).alias("frame_idx"), F.col("meta.n_frames").alias("n_frames")
    )
