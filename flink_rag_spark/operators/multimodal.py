"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

No multimodal capability exists in the reference (its only payloads are
UTF-8 strings, ``AiJob.java:23``); this is north-star surface for a
training-data pipeline. The container has no image/audio codecs, so the
DECODE step is a pluggable codec: ``StubCodec`` raises NotImplementedError
(the clearly-marked integration point for a real libjpeg/ffmpeg-backed
codec), ``FakeCodec`` produces deterministic synthetic features so the
Spark-side plumbing — schema, batching, partition flow — is fully testable.

Scale notes: binary payloads ride the columnar Arrow path in batches;
``mapInPandas`` streams record batches so one task never materializes its
whole partition; feature extraction is embarrassingly parallel (no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# canonical multimodal record: payload + typed metadata
MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, digest string, "
    "feature array<float>"
)


class StubCodec:
    """The integration point for real decoders (PIL/ffmpeg/...).

    Deliberately unimplemented in this container — see module docstring."""

    def decode(self, kind: str, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "media decode requires an image/audio codec; plug a real codec "
            "into extract_features(codec=...)")


class FakeCodec:
    """Deterministic stand-in: 'decodes' payload bytes into a fixed-size
    pseudo-signal seeded by the payload digest. Exercises every piece of
    plumbing a real codec would."""

    def __init__(self, dims: int = 16):
        self.dims = dims

    def decode(self, kind: str, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.dims).astype(np.float32)


def extract_features(media: DataFrame, codec=None,
                     batch_size_hint: int = 256) -> DataFrame:
    """media (MEDIA_SCHEMA) → per-item digest + feature vector.

    mapInPandas: codec constructed ONCE per task (the RichFunction.open
    analog), applied per Arrow batch."""
    codec = codec or FakeCodec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, digests, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload) if payload is not None else b""
                digests.append(hashlib.md5(b).hexdigest())
                sizes.append(len(b))
                feats.append([float(x) for x in codec.decode(kind, b)])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": sizes,
                "digest": digests,
                "feature": feats,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode n_frames into sampled frame
    indices (decode of each frame goes through the codec seam). Pure SQL —
    the explode is the real shape of the operator at scale."""
    return (media.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("n_frames") - 1, F.lit(0)),
                        F.lit(every_n))).alias("frame_idx")))


@dataclass
class ResizeSpec:
    width: int
    height: int


def resize_plan(media: DataFrame, spec: ResizeSpec, codec=None) -> DataFrame:
    """Resize = decode → (real codec's resample) → feature of the resized
    signal. With FakeCodec the 'resize' deterministically mixes target dims
    into the seed, proving the spec reaches the worker."""
    codec = codec or FakeCodec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload) if payload is not None else b""
                sized = b + f":{spec.width}x{spec.height}".encode()
                feats.append([float(x) for x in codec.decode(kind, sized)])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": spec.width, "height": spec.height,
                "feature": feats,
            })

    return media.mapInPandas(
        run, schema="media_id bigint, width int, height int, feature array<float>")
