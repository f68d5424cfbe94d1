"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

No multimodal capability exists in the reference (its only payloads are
UTF-8 strings, ``AiJob.java:23``); this is north-star surface for a
training-data pipeline. The DECODE step is a pluggable codec:
``operators/codecs.StdlibCodec`` is a REAL decoder (full PNG pixel decode,
full WAV sample decode, JPEG/GIF header probes — stdlib + numpy only),
``FakeCodec`` produces deterministic synthetic features for plumbing tests,
and ``StubCodec`` remains the explicit integration point for native codecs
(PIL/libjpeg-turbo/ffmpeg) absent from this container.

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
    analog), applied per Arrow batch. A codec may return None for a payload
    it cannot decode (StdlibCodec's non-strict mode) — that row keeps its
    digest/size but gets a null feature, so one corrupt file never fails
    the task."""
    codec = codec or FakeCodec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, digests, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload) if payload is not None else b""
                digests.append(hashlib.md5(b).hexdigest())
                sizes.append(len(b))
                vec = codec.decode(kind, b)
                feats.append(None if vec is None
                             else [float(x) for x in vec])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": sizes,
                "digest": digests,
                "feature": feats,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


PROBE_SCHEMA = (
    "media_id bigint, detected string, width int, height int, "
    "channels int, bit_depth int, sample_rate int, n_samples bigint, "
    "duration double"
)


def probe_media(media: DataFrame) -> DataFrame:
    """Real container metadata extraction: sniff each payload's magic bytes
    and parse its header (PNG IHDR, JPEG SOF, GIF screen descriptor, WAV
    fmt) — no trust in the caller-supplied ``kind`` or metadata columns.
    Unknown/corrupt payloads yield detected='unknown' with null fields
    rather than failing the task (the at-scale contract: bad files are
    data, not errors). Header-only parsing, so cost is O(1) per row no
    matter the payload size."""
    from flink_rag_spark.operators.codecs import probe_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    m = probe_bytes(
                        bytes(payload) if payload is not None else None)
                except Exception:
                    m = {"detected": "unknown"}
                rows.append({
                    "media_id": mid,
                    "detected": m.get("detected"),
                    "width": m.get("width"),
                    "height": m.get("height"),
                    "channels": m.get("channels"),
                    "bit_depth": m.get("bit_depth"),
                    "sample_rate": m.get("sample_rate"),
                    "n_samples": m.get("n_samples"),
                    "duration": m.get("duration"),
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=PROBE_SCHEMA)


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
    """Resize = decode → resample → feature of the resized signal. A codec
    exposing ``resize()`` (StdlibCodec: real nearest-neighbor resample of
    decoded PNG pixels) is used directly; otherwise the FakeCodec path
    deterministically mixes target dims into the decode seed, proving the
    spec reaches the worker."""
    codec = codec or FakeCodec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real_resize = getattr(codec, "resize", None)
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload) if payload is not None else b""
                if real_resize is not None:
                    vec = real_resize(kind, b, spec.width, spec.height)
                else:
                    sized = b + f":{spec.width}x{spec.height}".encode()
                    vec = codec.decode(kind, sized)
                feats.append(None if vec is None
                             else [float(x) for x in vec])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": spec.width, "height": spec.height,
                "feature": feats,
            })

    return media.mapInPandas(
        run, schema="media_id bigint, width int, height int, feature array<float>")
