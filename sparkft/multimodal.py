"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Engine-original (training-data pipeline surface). The Spark-side plumbing —
schemas, Arrow batch shapes, partition-friendly UDF signatures — is real and
tested; the actual media decode is STUBBED behind `FakeCodec` (the container
ships no image/audio libraries), clearly marked and swappable: every
transform takes a `codec` implementing decode/resize/sample.

Design for 100 TB: media bytes never leave the executor (mapInPandas streams
Arrow batches); metadata-only operations (filtering by width, duration,
mime) are plain columnar predicates that never touch the binary column, so
Parquet column pruning skips the heavy bytes entirely.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np

MEDIA_SCHEMA = (
    "media_id long, mime string, width int, height int, duration_ms int, "
    "data binary"
)

FEATURE_SCHEMA = (
    "media_id long, feat array<float>, out_width int, out_height int, "
    "n_frames int, sha256 string"
)


class FakeCodec:
    """Deterministic stand-in for a real media codec (STUB).

    decode -> a pseudo-pixel array derived from the bytes; resize ->
    nearest-neighbor index sampling (NOT mean pooling — a real codec's
    resampling will differ, so features validated against this stub do not
    transfer); frame sample -> strided slices. Real deployments inject a
    codec backed by PIL/ffmpeg with the same interface.
    """

    def decode(self, data: bytes, width: int, height: int) -> np.ndarray:
        if width * height == 0:
            raise ValueError("empty media")
        raw = np.frombuffer(
            hashlib.sha256(data).digest() * ((width * height * 3) // 32 + 1),
            dtype=np.uint8,
        )[: width * height * 3]
        return raw.reshape(height, width, 3)

    def resize(self, img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
        h, w, c = img.shape
        ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
        xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
        return img[ys][:, xs]

    def sample_frames(self, data: bytes, n: int) -> list[bytes]:
        step = max(len(data) // max(n, 1), 1)
        return [data[i * step: (i + 1) * step] for i in range(n)]


class RealCodecUnavailable:
    """Marker codec that raises: the sandbox has no media libraries."""

    def decode(self, *a, **k):
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg; inject a codec or use FakeCodec"
        )

    resize = decode
    sample_frames = decode


def extract_features(df, codec=None, out_w: int = 8, out_h: int = 8, n_frames: int = 4):
    """mapInPandas transform: media rows -> fixed-size feature vectors.

    Feature = channel-averaged nearest-neighbor-resized pseudo-pixels, flattened float32; plus the
    content sha256 (lineage / dedup key). Batch shape: each pandas batch maps
    1:1 to an output batch — no state, safe to repartition arbitrarily.
    """
    codec = codec or FakeCodec()
    try:
        from .spark_util import ensure_shipped

        ensure_shipped(df.sparkSession)
    except Exception:
        pass

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats, ws, hs, nf, shas = [], [], [], [], []
            for data, w, h in zip(pdf["data"], pdf["width"], pdf["height"]):
                img = codec.decode(bytes(data), int(w), int(h))
                small = codec.resize(img, out_w, out_h)
                feats.append((small.astype(np.float32) / 255.0).mean(axis=2).ravel().tolist())
                ws.append(out_w)
                hs.append(out_h)
                nf.append(len(codec.sample_frames(bytes(data), n_frames)))
                shas.append(hashlib.sha256(bytes(data)).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feat": feats,
                    "out_width": ws,
                    "out_height": hs,
                    "n_frames": nf,
                    "sha256": shas,
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def synthetic_media_df(spark, n: int = 64, seed: int = 42):
    """Deterministic fake media table for tests/benchmarks."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = {
        "media_id": np.arange(n, dtype=np.int64),
        "mime": ["image/png" if i % 3 else "video/mp4" for i in range(n)],
        "width": rng.integers(16, 64, n).astype("int32"),
        "height": rng.integers(16, 64, n).astype("int32"),
        "duration_ms": np.where(np.arange(n) % 3 == 0, rng.integers(1000, 9000, n), 0).astype("int32"),
        "data": [rng.bytes(int(rng.integers(64, 512))) for _ in range(n)],
    }
    return spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
