"""Multimodal column plumbing (image/audio as opaque binary columns).

The engine treats media as ``binary`` payload columns with typed
metadata; decode / feature-extraction / resize / frame-sample are
actor-pool ``map_batches`` stages. The decode KERNELS are stubbed
(image/audio libs are not in this container — clearly marked below),
but the Ray-side plumbing is real and tested: schema contracts, small
batch sizes for large payloads, per-actor init, Arrow binary in/out.

Scale notes: media rows are large, so stages run with small
``batch_size`` and ``batch_format="pyarrow"`` (binary columns do NOT
round-trip pandas cleanly); blocks stay bounded by
DataContext.target_max_block_size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # "image" | "audio"
    ("payload", pa.binary()),       # opaque encoded bytes
    ("width", pa.int32()),          # images: pixel dims; audio: 0
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),    # audio; images: 0
])


def synth_media_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus matching MEDIA_SCHEMA."""
    rng = np.random.RandomState(seed)
    kinds, payloads, widths, heights, rates = [], [], [], [], []
    for i in range(n):
        kind = "image" if i % 2 == 0 else "audio"
        size = int(rng.randint(256, 4096))
        payloads.append(rng.randint(0, 256, size, dtype=np.uint8).tobytes())
        kinds.append(kind)
        widths.append(int(rng.randint(16, 256)) if kind == "image" else 0)
        heights.append(int(rng.randint(16, 256)) if kind == "image" else 0)
        rates.append(16000 if kind == "audio" else 0)
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(widths, pa.int32()),
        "height": pa.array(heights, pa.int32()),
        "sample_rate": pa.array(rates, pa.int32()),
    })


def _fake_decode(payload: bytes, out_len: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-pixels from a blake2b stream.

    Replace with PIL.Image.open / soundfile.read on a cluster with the
    media libraries installed — the stage contract (bytes in, float32
    feature vector out) is unchanged.
    """
    h = hashlib.blake2b(payload, digest_size=32).digest()
    rng = np.random.RandomState(np.frombuffer(h[:4], dtype=np.uint32)[0])
    return rng.rand(out_len).astype(np.float32)


class MediaFeaturizer:
    """Actor-pool stage: decode + fixed-size feature vector per row.

    __init__ is the once-per-actor model/codec setup (here: nothing to
    load — the stub is free; a real decoder would open codecs/models
    here). Use: ds.map_batches(MediaFeaturizer, concurrency=N,
    batch_size=16, batch_format="pyarrow").
    """

    FEATURE_DIM = 64

    def __init__(self, feature_dim: int = 64):
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            _fake_decode(p, self.dim)
            for p in batch.column("payload").to_pylist()
        ]
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "payload_bytes": pa.array(
                [len(p) for p in batch.column("payload").to_pylist()],
                pa.int64()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
        })


class ImageResizer:
    """Actor-pool stage: resize metadata transform (decode stubbed).

    Real implementation would decode, resize to (target, target),
    re-encode; the stub rewrites the size metadata and passes payload
    through untouched so downstream schema/layout is exercised.
    """

    def __init__(self, target: int = 64):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        is_img = np.array(
            [k == "image" for k in batch.column("kind").to_pylist()])
        w = batch.column("width").to_numpy().copy()
        h = batch.column("height").to_numpy().copy()
        w[is_img] = self.target
        h[is_img] = self.target
        return (batch.set_column(batch.schema.get_field_index("width"),
                                 "width", pa.array(w, pa.int32()))
                .set_column(batch.schema.get_field_index("height"),
                            "height", pa.array(h, pa.int32())))


class AudioFrameSampler:
    """Actor-pool stage: sample N fixed-length frames per audio row
    (decode stubbed: frames are deterministic slices of the payload)."""

    def __init__(self, num_frames: int = 4, frame_bytes: int = 64):
        self.num_frames = num_frames
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for mid, kind, payload in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("payload").to_pylist()):
            if kind != "audio":
                continue
            step = max(1, len(payload) // self.num_frames)
            for fi in range(self.num_frames):
                start = min(fi * step, max(0, len(payload) - 1))
                frames.append(payload[start:start + self.frame_bytes])
                ids.append(mid)
                idxs.append(fi)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def featurize_media(media_ds, concurrency=(1, 4), batch_size: int = 16):
    """media Dataset -> per-row feature vectors via the actor pool."""
    ds = rd.from_arrow(media_ds) if isinstance(media_ds, pa.Table) \
        else media_ds
    return ds.map_batches(MediaFeaturizer, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
