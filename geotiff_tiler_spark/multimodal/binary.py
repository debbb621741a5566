"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested: schemas, partition-friendly
batch iteration (`mapInPandas`, Arrow-batched). The image codec is ALSO
real for PNG: `decode_png` is a from-scratch stdlib-zlib + numpy decoder
(chunk walk, IDAT inflate, RFC 2083 scanline defiltering for all five
filter types), exercised end-to-end by the feature pipeline on genuinely
encoded fixture bytes in tests. Other formats (JPEG/video/audio) keep
the deterministic stand-in decode — their codec libraries are not in
this environment; `decode_image_real` documents the integration point.

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


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def _png_defilter(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse PNG scanline filtering (RFC 2083 §6: None/Sub/Up/Average/
    Paeth) -> (H, W, C) uint8. Up is vectorized over the row; Sub/Average/
    Paeth recur on the left neighbor so they run per byte — acceptable for
    thumbnail-scale payloads inside an Arrow batch (rows decode
    independently across the batch; the loop is per-image, not per-table)."""
    bpp = channels
    stride = w * channels
    if len(raw) != h * (1 + stride):
        raise ValueError(f"PNG data size {len(raw)} != {h}*(1+{stride})")
    out = np.zeros((h, stride), dtype=np.int32)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(np.int32)
        pos += stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            recon = line
        elif ftype == 2:
            recon = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            recon = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = recon[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                recon[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype} at row {y}")
        out[y] = recon
    return out.astype(np.uint8).reshape(h, w, channels)


def decode_png(payload: bytes) -> np.ndarray:
    """Pure stdlib-zlib + numpy PNG decoder: 8-bit depth, non-interlaced,
    color types 0/2/4/6 (the overwhelmingly common web/thumbnail cases).
    Chunk walk -> concatenated-IDAT inflate -> per-scanline defilter."""
    import struct
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + CRC (CRC not verified)
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, interlace={interlace})"
        )
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype} (palette?)")
    raw = zlib.decompress(b"".join(idat))
    return _png_defilter(raw, h, w, _PNG_CHANNELS[ctype])


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """Pure stdlib-zlib + numpy PNG ENCODER — the write half of decode_png.

    8-bit, non-interlaced, color types 0/2/4/6 from an (H, W, C) or (H, W)
    uint8 array. Forward filtering is fully VECTORIZED over the whole image
    (unlike decode, the forward direction predicts from ORIGINAL bytes, so
    left/up/up-left are plain array shifts): all five RFC 2083 candidates
    are computed as (5, H, stride) and the per-row filter is chosen by the
    libpng minimum-sum-of-absolute-(signed)-differences heuristic.
    Round-trips bit-exactly through decode_png (asserted in tests)."""
    import struct
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_png wants uint8, got {arr.dtype}")
    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise ValueError(f"unsupported channel count {c}")
    bpp = c
    x = arr.reshape(h, w * c).astype(np.int32)
    a = np.zeros_like(x)
    a[:, bpp:] = x[:, :-bpp]
    b = np.zeros_like(x)
    b[1:] = x[:-1]
    cc = np.zeros_like(x)
    cc[1:, bpp:] = x[:-1, :-bpp]
    p = a + b - cc
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
    paeth = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc))
    cand = np.stack(
        [
            x,
            (x - a) & 0xFF,
            (x - b) & 0xFF,
            (x - ((a + b) >> 1)) & 0xFF,
            (x - paeth) & 0xFF,
        ]
    ).astype(np.uint8)
    # MSAD: filtered bytes as signed deltas; smallest row sum wins
    signed = np.where(cand > 127, 256 - cand.astype(np.int32), cand.astype(np.int32))
    choice = signed.sum(axis=2).argmin(axis=0)  # (H,)
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = choice
    raw[:, 1:] = cand[choice, np.arange(h)]

    def chunk(typ: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), level))
        + chunk(b"IEND", b"")
    )


def decode_image_real(payload: bytes, meta: dict) -> np.ndarray:
    """Real byte-level decode: PNG handled natively (decode_png — stdlib
    zlib + numpy, no codec library needed); other formats are the
    integration point for Pillow/rasterio/ffmpeg on a real cluster."""
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "only PNG decodes natively in this environment; plug "
        "Pillow/rasterio/ffmpeg here for JPEG/TIFF/video on a real deployment"
    )


def _fake_decode(payload: bytes, meta) -> np.ndarray:
    """Deterministic stand-in decode: payload bytes tiled to (H, W, C).

    Keeps the downstream feature-extraction path real (shape handling,
    dtype, reductions) for NON-PNG payloads (synth media, audio/video)."""
    h = max(int(meta["height"]) or 8, 8)
    w = max(int(meta["width"]) or 8, 8)
    c = max(int(meta["channels"]), 1)
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = h * w * c
    arr = np.resize(raw, need).reshape(h, w, c)
    return arr


def _decode(payload: bytes, meta) -> np.ndarray:
    """Dispatch: genuinely encoded PNG bytes take the REAL decoder; other
    payloads (synthetic media, formats without an in-env codec) fall back
    to the deterministic stand-in so the pipeline stays runnable."""
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    return _fake_decode(payload, meta)


def extract_features(media: DataFrame, batch_size: int = 64) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched mapInPandas.

    Per row: decode (REAL for PNG payloads, deterministic stand-in
    otherwise — see _decode) -> per-channel mean/std + byte histogram
    summary -> FEAT_DIM float vector. The UDF signature, batch shape, and
    schema are the production contract."""

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
                arr = _decode(bytes(p), m)
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
