"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a ``modality`` tag
(schema ``sources/schemas.py:MEDIA_SCHEMA``). The decode step needs
media libs not present in this container, so it is STUBBED behind
``decode_media`` (raises ``NotImplementedError``) with a deterministic
fake (``fake_decode``) used by tests — the Spark-side plumbing
(schemas, Arrow batching via ``mapInPandas``, partition sizing) is
real and tested.

Scale notes: payloads are the widest column by far, so every
metadata-only operation selects away ``payload`` first (column
pruning reaches the parquet scan). ``mapInPandas`` streams Arrow
batches — constant memory per task regardless of partition size.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.schemas import MEDIA_FEATURES_SCHEMA

FEATURE_DIM = 8


def decode_media(payload: bytes, mime_type: str):
    """Real decoder hook (PIL / torchaudio / pyav). Not available in
    this container — replace in a deps-enabled deployment."""
    raise NotImplementedError(
        "media decode requires image/audio libs not installed here; "
        "use fake_decode for deterministic tests"
    )


def fake_decode(payload: bytes, mime_type: str) -> list[float]:
    """Deterministic stand-in: FEATURE_DIM floats derived from the
    payload hash. Same shape/dtype contract as a real embedding."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata-only projection — never touches ``payload`` bytes
    except for length, so the scan prunes the heavy column when the
    source stores byte-length as metadata (iceberg/delta stats)."""
    return media.select(
        "media_id",
        "modality",
        "mime_type",
        F.length("payload").alias("n_bytes"),
        "width",
        "height",
        "duration_ms",
    )


def extract_features(media: DataFrame, decoder=fake_decode) -> DataFrame:
    """payload → fixed-dim feature vector via Arrow-batched mapInPandas.

    One Python worker per partition, Arrow transfer both ways; the
    decoder runs per-row inside the batch loop (vectorize further in
    a real deployment with batched GPU decode).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decoder(p if p is not None else b"", m)
                for p, m in zip(pdf["payload"], pdf["mime_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    # NULL payload -> NULL hash (NOT md5 of b"") so
                    # this column agrees with dedup_media_exact's
                    # JVM md5: a missing payload is not "the same
                    # content" as a genuinely empty file
                    "content_hash": pdf["payload"].map(
                        lambda b: (
                            hashlib.md5(b).hexdigest()
                            if b is not None
                            else None
                        )
                    ),
                    "feature": feats,
                }
            )

    cols = media.select("media_id", "modality", "mime_type", "payload")
    return cols.mapInPandas(batches, schema=MEDIA_FEATURES_SCHEMA)


def dedup_media_exact(media: DataFrame) -> DataFrame:
    """Exact media dedup on content hash — JVM-side md5 over binary,
    no Python in the loop; same shape as ``dedup.dedup_exact``.
    NULL payloads are EXCLUDED: they have no content, so grouping
    them under the NULL hash would declare unrelated broken rows
    duplicates of each other (and disagree with
    ``extract_features``'s NULL content_hash)."""
    return (
        media.filter(F.col("payload").isNotNull())
        .withColumn("content_hash", F.md5(F.col("payload")))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("keep_media_id"),
        )
    )


def fake_resize(payload: bytes, mime_type: str, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: output bytes derived from the
    payload hash + target box, length proportional to the target area
    (mimics a real thumbnail's size behavior for partition-sizing
    tests). Same (bytes in → bytes out) contract as a PIL resizer."""
    h = hashlib.sha256((payload or b"") + f"{width}x{height}".encode()).digest()
    n = max(1, (width * height) // 64)
    return (h * (n // len(h) + 1))[:n]


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, resizer=fake_resize
) -> DataFrame:
    """Image resize via Arrow-batched ``mapInPandas`` (real resizer =
    PIL ``Image.resize``; stubbed here — the container has no image
    libs). Output keeps the MEDIA_SCHEMA shape with the new box and
    payload, so resized corpora flow through every downstream media
    op unchanged.

    Scale note: resize SHRINKS rows (thumbnail ≪ original), so the
    output partition count should follow the input's byte-based
    splits; no repartition needed. Only image rows pay the Python
    boundary; other modalities pass through untouched via the cheap
    union of two disjoint filters.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = [
                resizer(p if p is not None else b"", m, width, height)
                for p, m in zip(pdf["payload"], pdf["mime_type"])
            ]
            out["width"] = width
            out["height"] = height
            yield out

    images = media.filter(F.col("modality") == "image")
    others = media.filter(F.col("modality") != "image")
    resized = images.mapInPandas(batches, schema=media.schema)
    return resized.unionByName(others)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode a frame-timestamp grid
    from duration metadata (decode of each frame is the stubbed
    step). Pure JVM ``sequence``+``explode`` — the expensive decode
    fan-out is expressed as rows so Spark parallelizes it."""
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def docs_as_media(documents: DataFrame) -> DataFrame:
    """Deterministic MEDIA_SCHEMA frame derived from ``documents`` —
    the sandbox has no real media files, so driver queries exercise
    the multimodal plumbing over synthetic-but-stable payloads:
    utf-8 text bytes as the binary column, modality cycling by
    doc_id, box/duration metadata as pure doc_id expressions (every
    value reproducible by the SQL oracle).
    """
    m = F.col("media_id") % 3
    modality = (
        F.when(m == 0, F.lit("image"))
        .when(m == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    mime = (
        F.when(m == 0, F.lit("image/png"))
        .when(m == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    base = documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return base.select(
        "media_id",
        modality.alias("modality"),
        mime.alias("mime_type"),
        "payload",
        F.when(m == 0, ((F.col("media_id") % 8 + 1) * 16).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("width"),
        F.when(m == 0, ((F.col("media_id") % 4 + 1) * 16).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("height"),
        F.when(m != 0, ((F.col("media_id") % 10 + 1) * 2000).cast("bigint"))
        .otherwise(F.lit(None).cast("bigint"))
        .alias("duration_ms"),
    )
