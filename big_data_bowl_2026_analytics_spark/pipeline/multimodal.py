"""Multimodal (binary) column processing.

Images/audio/video are opaque ``binary`` columns with typed metadata
alongside; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so the bytes never round-trip
through Python row objects. The decode step itself is environment-
gated: with no imaging/audio libraries in this container, a
deterministic byte-level fake stands in (clearly marked), while the
Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is real and tested.

Scale notes: blobs dominate partition size, so the media table should
be written with a small ``maxRecordsPerFile`` / row-group size, and
feature extraction should run BEFORE any shuffle (features are a few
hundred bytes; blobs are megabytes — never shuffle blobs to group
features).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # pragma: no cover - not available in this container
    from PIL import Image  # noqa: F401

    HAS_IMAGING = True
except Exception:  # noqa: BLE001
    HAS_IMAGING = False

#: Canonical media-table schema: blob + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("blob", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _decode(blob: bytes, media_type: str) -> np.ndarray:
    """Decode a blob to a pixel/sample array.

    Real decoding requires imaging/audio libraries that are absent
    here; the fallback is a DETERMINISTIC FAKE (sha256-seeded bytes)
    so the pipeline shape is fully testable. Swap in PIL/librosa/ffmpeg
    by replacing this one function.
    """
    if HAS_IMAGING and media_type == "image":  # pragma: no cover
        raise NotImplementedError(
            "PIL decode path intentionally not implemented in this container"
        )
    digest = hashlib.sha256(blob).digest()
    seed = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
    return seed


def extract_features(media: DataFrame) -> DataFrame:
    """Per-blob metadata + fixed-size feature vector via mapInPandas.

    The iterator-of-batches signature streams Arrow batches through a
    single Python worker per partition — constant memory regardless of
    partition row count.
    """

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob, mtype in zip(pdf["blob"], pdf["media_type"]):
                b = bytes(blob)
                decoded = _decode(b, mtype)
                # Deterministic pooled 'embedding' of the decoded array.
                pooled = decoded.reshape(FEATURE_DIM, -1).mean(axis=1) / 255.0
                feats.append(
                    (
                        len(b),
                        hashlib.sha256(b).hexdigest(),
                        [float(x) for x in pooled],
                    )
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [f[0] for f in feats],
                    "content_sha256": [f[1] for f in feats],
                    "features": [f[2] for f in feats],
                }
            )
            yield out

    return media.mapInPandas(per_batch, schema=_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video blobs: one output row per kept
    frame index (the decode of each frame is the same gated stub).

    Expressed as sequence+explode so the expansion happens executor-
    side; the blob column is dropped BEFORE the explode — only frame
    indices and metadata multiply, never the bytes.
    """
    from pyspark.sql import functions as F

    video = media.where(F.col("media_type") == "video")
    idx = F.sequence(
        F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return video.select(
        "media_id",
        "n_frames",
        F.explode(idx).alias("frame_index"),
    )


# Pickle this module's functions BY VALUE into UDF closures: Spark's
# Python workers otherwise resolve them by module name, which fails
# whenever the package isn't on the worker's import path (e.g. the
# driver imported the repo by file location from another cwd).
import sys as _sys

try:  # pragma: no cover - exercised via worker round-trips in tests
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass
