"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (SURVEY.md §2.2 I5 extension): media travels as a ``binary``
column with a metadata struct alongside; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so
each Python worker touches one partition's batches and nothing ever
collects to the driver. Partitioning: repartition by a content-hash
bucket before heavy decode so stragglers (huge payloads) spread evenly.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so
``decode_image_batch`` ships a deterministic fake decoder behind the
same signature, and ``decode_image_real`` raises NotImplementedError —
the Spark-side plumbing (schema, batching, partitioning) is real and
tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Output schema of the decode stage: typed metadata + a fixed-size
# feature vector, the shape a training pipeline would feed downstream.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_image_real(payload: bytes) -> tuple[int, int, list[float]]:
    """Real codec hook — image libs are not in this container."""
    raise NotImplementedError(
        "image codecs (PIL/opencv) unavailable; use the deterministic "
        "fake decoder (decode_image_batch) for plumbing tests"
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in: 'dimensions' and an 8-dim 'feature' vector
    derived from payload bytes. Same batch shape as a real decoder."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    feats = [float((payload[i % max(n, 1)] if n else 0) ^ i) for i in range(8)]
    return width, height, feats


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: (doc_id, payload) -> DECODED_SCHEMA rows."""
    for pdf in batches:
        ws, hs, fs, nb = [], [], [], []
        for payload in pdf["payload"]:
            raw = bytes(payload)
            w, h, f = _fake_decode(raw)
            ws.append(w)
            hs.append(h)
            fs.append(f)
            nb.append(len(raw))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": nb,
                "width": ws,
                "height": hs,
                "features": fs,
            }
        )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def resize_batch(target_w: int, target_h: int):
    """mapInPandas stage factory: (doc_id, payload) -> fixed-size thumb.

    Real resize needs PIL/opencv (absent here); the deterministic fake
    samples ``target_w*target_h`` bytes from the payload, preserving the
    batch shape a real resizer produces (binary out, typed dims).
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                n = max(len(raw), 1)
                thumbs.append(
                    bytes(raw[(i * n) // (target_w * target_h)] if raw else 0
                          for i in range(target_w * target_h))
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "thumb": thumbs,
                }
            )

    return _resize


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames_batch(n_frames: int, frame_bytes: int = 64):
    """mapInPandas stage factory: video payload -> n sampled 'frames'.

    One input row fans out to ``n_frames`` rows (the real frame-sample
    shape); the fake slices evenly-spaced byte windows instead of
    ffmpeg keyframes.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                step = max(len(raw) // n_frames, 1)
                for k in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(raw[k * step : k * step + frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return _sample


def resize_images(
    df: DataFrame, target_w: int, target_h: int, payload_col: str = "payload"
) -> DataFrame:
    src = df.select("doc_id", F.col(payload_col).alias("payload"))
    return src.mapInPandas(resize_batch(target_w, target_h), RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, n_frames: int, payload_col: str = "payload"
) -> DataFrame:
    src = df.select("doc_id", F.col(payload_col).alias("payload"))
    return src.mapInPandas(sample_frames_batch(n_frames), FRAMES_SCHEMA)


def decode_images(df: DataFrame, payload_col: str = "payload", buckets: int = 0) -> DataFrame:
    """Run the decode stage over a (doc_id, payload: binary) DataFrame.

    ``buckets > 0`` pre-repartitions on a payload-hash bucket so heavy
    payloads spread across executors instead of skewing one partition.
    """
    src = df.select("doc_id", F.col(payload_col).alias("payload"))
    if buckets:
        src = src.repartition(buckets, F.abs(F.xxhash64("payload")) % buckets)
    return src.mapInPandas(decode_image_batch, DECODED_SCHEMA)
