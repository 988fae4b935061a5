"""Multimodal (image/audio/video) column plumbing — decode stubs.

Treats media as opaque ``binary`` columns with typed metadata. The Ray
side — schema, actor-pool stage shape, small batch sizes for wide binary
rows, output layout — is real and tested; the actual codec work is
stubbed (no image/audio libraries in this environment): ``decode_fn``
defaults to a deterministic fake that derives a fixed-size feature vector
from the bytes, and passing ``strict=True`` raises ``NotImplementedError``
where a real decoder would run.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def fake_feature_extract(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: blake2b-seeded
    pseudo-features. STUB — replace with PIL/torchvision/ffmpeg stages."""
    h = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(h, "little"))
    return rng.standard_normal(dim).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: model/codec init once per actor, per-batch decode.

    Batch sizes must stay small for wide binary rows (a batch ×
    concurrency must fit worker heap — see DataContext.target_max_block_size).
    """

    def __init__(self, dim: int = 16, strict: bool = False):
        self.dim = dim
        self.strict = strict

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.strict:
            raise NotImplementedError(
                "real media decoding requires image/audio libraries not present "
                "in this environment; wire a decoder into MediaFeatureExtractor"
            )
        feats = [fake_feature_extract(p or b"", self.dim) for p in batch["payload"]]
        return pd.DataFrame(
            {
                "media_id": batch["media_id"].astype(np.int64),
                "kind": batch["kind"],
                "feature": [f.tolist() for f in feats],
            }
        )


def extract_media_features(
    media: rd.Dataset, dim: int = 16, concurrency: int = 2, batch_size: int = 64
) -> rd.Dataset:
    """Decode/feature-extract media rows with an actor pool (small batches)."""
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageResizer:
    """Actor-pool resize stage. Plumbing real (schema, metadata update,
    per-actor init, small batches); the pixel work is a deterministic
    byte-level stand-in — ``strict=True`` raises where PIL would run."""

    def __init__(self, width: int, height: int, strict: bool = False):
        self.width = int(width)
        self.height = int(height)
        self.strict = strict

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.strict:
            raise NotImplementedError(
                "real image resizing requires PIL/torchvision, absent here"
            )
        out_payload = [
            hashlib.blake2b(
                (p or b"") + self.width.to_bytes(4, "little")
                + self.height.to_bytes(4, "little"),
                digest_size=32,
            ).digest()
            for p in batch["payload"]
        ]
        return pd.DataFrame(
            {
                "media_id": batch["media_id"].astype(np.int64),
                "kind": batch["kind"],
                "payload": out_payload,
                "width": np.full(len(batch), self.width, dtype=np.int32),
                "height": np.full(len(batch), self.height, dtype=np.int32),
            }
        )


def resize_images(
    media: rd.Dataset, width: int, height: int,
    concurrency: int = 2, batch_size: int = 64,
) -> rd.Dataset:
    """Resize image rows (actor pool, small batches for wide binary rows)."""
    return media.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class FrameSampler:
    """Video → frame rows at a fixed period: one input row expands to
    ``duration_ms // every_ms`` output rows (media_id, frame_idx, ts_ms,
    payload). Row expansion, ordering and batch sizing are real; frame
    extraction is a deterministic fake — ``strict=True`` raises where
    ffmpeg would run."""

    def __init__(self, every_ms: int = 1000, strict: bool = False):
        self.every_ms = int(every_ms)
        self.strict = strict

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.strict:
            raise NotImplementedError(
                "real frame sampling requires ffmpeg/av, absent here"
            )
        ids, idxs, tss, payloads = [], [], [], []
        for mid, dur, p in zip(
            batch["media_id"], batch["duration_ms"], batch["payload"]
        ):
            n = max(0, int(dur or 0) // self.every_ms)
            for i in range(n):
                ids.append(int(mid))
                idxs.append(i)
                tss.append(i * self.every_ms)
                payloads.append(
                    hashlib.blake2b(
                        (p or b"") + i.to_bytes(4, "little"), digest_size=24
                    ).digest()
                )
        return pd.DataFrame(
            {
                "media_id": pd.Series(ids, dtype=np.int64),
                "frame_idx": pd.Series(idxs, dtype=np.int64),
                "ts_ms": pd.Series(tss, dtype=np.int64),
                "payload": payloads,
            }
        )


def sample_frames(
    media: rd.Dataset, every_ms: int = 1000,
    concurrency: int = 2, batch_size: int = 16,
) -> rd.Dataset:
    """Sample frames from video rows (actor pool; expansion-aware tiny
    batches — each input row can emit many wide binary rows)."""
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
