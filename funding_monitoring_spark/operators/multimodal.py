"""Multimodal column plumbing (north-star extension).

Design: media are opaque ``binary`` columns plus a typed metadata
struct (modality, mime, width/height/duration, …). All Spark-side
plumbing — schema, Arrow-batched Pandas UDFs over ``mapInPandas``,
partition sizing — is real and tested; the actual codec calls
(image decode, audio resample, video frame-sample) are stubbed
behind ``NotImplementedError`` or a deterministic fake, because the
media libraries are not in this environment. Swapping the stub for
PIL/ffmpeg changes ONE function, not the pipeline.

Scale notes (100 TB): media rows are large, so the operators use
``mapInPandas`` (streaming Arrow batches, no row materialization of
the whole partition), and callers should size partitions by bytes
(``spark.sql.files.maxPartitionBytes``) not rows. Feature extraction
is a narrow map — no shuffle; downstream joins happen on the small
extracted-feature table, never on the binary payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every media payload
MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),  # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real codec hook — intentionally not implemented here.

    In production: ``PIL.Image.open(io.BytesIO(payload))``. The Spark
    pipeline never calls this directly; extract_features uses the
    deterministic fake so the distributed plumbing is testable.
    """
    raise NotImplementedError(
        "image codec not available in this environment; "
        "swap in PIL/torchvision here"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector:
    byte-histogram moments folded into ``dim`` buckets. Pure function
    of the payload → reproducible across engines and runs."""
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = max(len(payload), 1)
    return [round(a / n, 6) for a in acc]


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: build a MEDIA_SCHEMA frame from the documents fixture
    (utf-8 bytes play the payload; deterministic metadata)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    The UDF receives an iterator of pandas batches (never the whole
    partition), emits FEATURE_SCHEMA rows. This is the sanctioned
    pattern for any real decode step: per-batch Python cost, columnar
    transfer both ways.
    """

    # Worker processes may not have this package on sys.path (the
    # driver contract only guarantees the entry module is importable
    # driver-side). Pickle the UDF and its module references by value
    # so the closure is self-contained on the wire.
    try:
        import sys as _sys

        from pyspark import cloudpickle as _cp

        _cp.register_pickle_by_value(_sys.modules[__name__])
    except Exception:
        pass

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "header_hex": payloads.map(
                        lambda p: bytes(p[:4]).hex()
                    ),
                    "feature": payloads.map(_fake_feature),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→encode: stride-sample
    the payload down to width*height bytes (pad by cycling). In
    production this is PIL resize; same signature, same plumbing."""
    target = max(width * height, 1)
    if len(payload) == 0:
        return bytes(target)
    if len(payload) >= target:
        stride = len(payload) // target
        return bytes(payload[i * stride] for i in range(target))
    reps = -(-target // len(payload))
    return (payload * reps)[:target]


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every payload to width×height (stubbed codec), updating
    the metadata struct — a narrow 1:1 mapInPandas, no shuffle; output
    keeps MEDIA_SCHEMA so resize composes with any downstream media op.
    """
    try:
        import sys as _sys

        from pyspark import cloudpickle as _cp

        _cp.register_pickle_by_value(_sys.modules[__name__])
    except Exception:
        pass

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pd.DataFrame(
                {
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "width": width,
                    "height": height,
                    "duration_ms": [m["duration_ms"] for m in pdf["meta"]],
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(
                        lambda p: _fake_resize(bytes(p), width, height)
                    ),
                    "meta": meta.to_dict("records"),
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 1024, every_n: int = 4
) -> DataFrame:
    """One-to-many frame sampling (the video path): each payload is
    split into fixed-size 'frames' (stub for an ffmpeg keyframe
    iterator) and every n-th is emitted. mapInPandas yields more rows
    than it receives — the Spark-side shape (explode-like fan-out with
    binary payloads, batch-bounded memory) is exactly the production
    pattern."""
    try:
        import sys as _sys

        from pyspark import cloudpickle as _cp

        _cp.register_pickle_by_value(_sys.modules[__name__])
    except Exception:
        pass

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = -(-len(raw) // frame_bytes) if raw else 0
                for k in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(raw[k * frame_bytes : (k + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
