"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-native extension for training-data pipelines. The design treats
media as ``binary`` payload columns with a typed metadata struct, and
runs decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages — the only sane shape at 100 TB:

- payloads never round-trip through Python row-at-a-time (Arrow batches);
- each stage is schema-stable (declared output schema, checked here by
  tests) so stages compose into pipelines;
- partitioning is by content hash so equal payloads co-locate for dedup.

The container has no image/audio codecs, so the actual decode is STUBBED:
``decode_image`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case a seeded hash of the payload
produces stable fake dimensions/features — the Spark-side plumbing
(schemas, batching, UDF signatures) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "meta struct<format:string, declared_width:int, declared_height:int>"
)

DECODED_SCHEMA = "media_id long, width int, height int, n_channels int, ok boolean"
FEATURES_SCHEMA = "media_id long, vector_dim int, features array<float>"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a media table from the documents fixture: payload = UTF-8
    bytes of the text (a stand-in for real image bytes), metadata derived
    deterministically. Real pipelines read (path, bytes) from object
    storage with exactly this schema."""
    h = F.abs(F.xxhash64(F.col(text_col)))
    # NULL-text contract (r12 sweep): no content -> no media row. Stated
    # here AND defensively at each decode stage (a NULL payload must
    # never abort a 100 TB job inside the Arrow worker).
    docs = docs.filter(F.col(text_col).isNotNull())
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.when(h % 3 == 0, "image/png")
        .when(h % 3 == 1, "image/jpeg")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.struct(
            F.when(h % 3 == 2, "mp4").otherwise("img").alias("format"),
            ((h % 640) + 64).cast("int").alias("declared_width"),
            ((h % 480) + 48).cast("int").alias("declared_height"),
        ).alias("meta"),
    )


def decode_image(media: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Decode stage: (payload → width/height/channels) via mapInPandas.

    Real codec integration point — swap the body for PIL/libvips when the
    runtime has them. ``deterministic_fake`` produces stable pseudo-dims
    from the payload hash so downstream stages are testable without
    codecs.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "no image codec in this runtime; call with deterministic_fake=True "
            "to exercise the pipeline plumbing"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            import hashlib

            # md5-derived 60-bit fake: md5 is bit-identical across
            # engines, so the decoded dims are SQL-oracle-checkable
            h = pdf["payload"].map(
                lambda b: int(hashlib.md5(bytes(b)).hexdigest()[:15], 16)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": (h % 1920 + 1).astype("int32"),
                    "height": (h % 1080 + 1).astype("int32"),
                    "n_channels": ((h % 3) + 1).astype("int32"),
                    "ok": pdf["payload"].map(lambda b: len(bytes(b)) > 0),
                }
            )

    # NULL payloads are undecodable by definition; drop them JVM-side
    # (scan-fused filter) so a stray NULL can never crash the Arrow stage
    return (
        media.select("media_id", "payload")
        .filter(F.col("payload").isNotNull())
        .mapInPandas(_decode, DECODED_SCHEMA)
    )


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extract stage: payload → fixed-dim float vector.

    Deterministic featurizer (byte histogram folded to ``dim`` buckets,
    L1-normalized) — a real model swaps in with the same mapInPandas
    shape and Arrow batch flow.
    """

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                total = hist.sum() or 1.0
                feats.append((hist / total).astype("float32"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "vector_dim": dim,
                    "features": feats,
                }
            )

    return (
        media.select("media_id", "payload")
        .filter(F.col("payload").isNotNull())
        .mapInPandas(_feat, FEATURES_SCHEMA)
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Frame-sample stage for video payloads: emit up to ``max_frames``
    byte-slices per payload (stand-in for keyframe extraction — one input
    row fans out to N output rows, the defining shape of this stage)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(b)
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(raw[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return (
        media.select("media_id", "payload")
        .filter(F.col("payload").isNotNull())
        .mapInPandas(_frames, FRAMES_SCHEMA)
    )


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_image(
    media: DataFrame, width: int = 224, height: int = 224, deterministic_fake: bool = False
) -> DataFrame:
    """Resize stage: payload → fixed-dims payload via mapInPandas.

    STUB: no codec in this runtime — ``deterministic_fake`` emits a
    truncated/padded byte payload of width*height bytes so the stage's
    schema, fan-through shape, and batch flow are exercised; a real
    implementation swaps in PIL/libvips with the identical signature.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "no image codec in this runtime; call with deterministic_fake=True"
        )
    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (bytes(b) * (target // max(1, len(bytes(b))) + 1))[:target]
                for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return (
        media.select("media_id", "payload")
        .filter(F.col("payload").isNotNull())
        .mapInPandas(_resize, RESIZED_SCHEMA)
    )


def dedup_by_payload(media: DataFrame) -> DataFrame:
    """Exact media dedup: content-hash groupBy on the binary payload
    (md5 over bytes — JVM-side, no Python)."""
    hashed = media.withColumn("payload_hash", F.md5(F.col("payload")))
    keep = hashed.groupBy("payload_hash").agg(F.min("media_id").alias("media_id"))
    return hashed.join(keep, ["payload_hash", "media_id"], "left_semi").drop("payload_hash")
