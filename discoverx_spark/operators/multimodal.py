"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.  The image/audio codec libraries are
NOT available in this container (environment constraint), so the decode
kernels are honest stubs: a clearly-marked deterministic fake
(byte-statistics + sha256) keeps
the Spark-side plumbing — schema, batching, partition flow, UDF
signatures — real and testable.  ``strict=True`` raises NotImplementedError
instead of faking, for callers that must not ship fake features.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, mime string, payload binary, "
                "meta_width int, meta_height int, meta_duration_ms int")

IMAGE_FEATURES_SCHEMA = ("media_id long, width int, height int, "
                         "mean_byte double, sha256 string")

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_sha256 string"


def attach_fake_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Deterministic synthetic payloads for tests: payload bytes derived
    from sha256 of the id (stable across runs/partitionings)."""
    payload = F.sha2(F.col(id_col).cast("string"), 256).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(f"{kind}/x-fake").alias("mime"),
        payload.alias("payload"),
        (F.pmod(F.col(id_col).cast("long"), F.lit(640)) + 32).cast("int").alias("meta_width"),
        (F.pmod(F.col(id_col).cast("long"), F.lit(480)) + 32).cast("int").alias("meta_height"),
        (F.pmod(F.col(id_col).cast("long"), F.lit(90000))).cast("int").alias("meta_duration_ms"),
    )


def decode_image_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Per-image features via mapInPandas. There is NO real decode path in
    this repo (codec libraries are an environment constraint — module
    docstring / LIMITATIONS §5); the fake kernel computes deterministic
    byte statistics with the exact production batch shape.

    ``strict=True`` ALWAYS raises: a merely-importable PIL does not make
    the fake features real, so the honesty guard must not silently
    disappear on machines where the import happens to succeed (and a
    driver-side import probe can disagree with the executor environment
    anyway)."""
    if strict:
        raise NotImplementedError(
            "no real image decode is implemented (codec libraries are an "
            "environment constraint); strict=True refuses the "
            "fake-feature path — see LIMITATIONS §5")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, w, h, payload in zip(pdf["media_id"], pdf["meta_width"],
                                          pdf["meta_height"], pdf["payload"]):
                if mid is None or pd.isna(mid):
                    continue  # no identity, no feature row
                b = bytes(payload) if payload is not None else b""
                mean = (sum(b) / len(b)) if b else 0.0
                # MEDIA_SCHEMA metadata is nullable: real rows with
                # missing dims must not crash the task on int(None)
                w_i = 0 if w is None or pd.isna(w) else int(w)
                h_i = 0 if h is None or pd.isna(h) else int(h)
                rows.append((int(mid), w_i, h_i, float(mean),
                             hashlib.sha256(b).hexdigest()))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height",
                                              "mean_byte", "sha256"])

    return media.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling (STUB kernel, real batch plumbing): splits the
    payload into n deterministic chunks standing in for decoded frames."""
    if n_frames < 1:
        raise ValueError("n_frames must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if mid is None or pd.isna(mid):
                    continue
                b = bytes(payload) if payload is not None else b""
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    chunk = b[i * step:(i + 1) * step]
                    rows.append((int(mid), i, hashlib.sha256(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame_sha256"])

    return media.mapInPandas(kernel, schema=FRAME_SAMPLE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: metadata transform is real; pixel work is the
    stubbed kernel (payload passed through)."""
    return media.withColumn("meta_width", F.lit(width).cast("int")) \
                .withColumn("meta_height", F.lit(height).cast("int"))
