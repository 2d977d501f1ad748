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


def decode_images(df: DataFrame, payload_col: str = "payload", buckets: int = 0) -> DataFrame:
    """Run the decode stage over a (doc_id, payload: binary) DataFrame.

    ``buckets > 0`` pre-repartitions on a payload-hash bucket so heavy
    payloads spread across executors instead of skewing one partition.
    """
    src = df.select("doc_id", F.col(payload_col).alias("payload"))
    if buckets:
        src = src.repartition(buckets, F.abs(F.xxhash64("payload")) % buckets)
    return src.mapInPandas(decode_image_batch, DECODED_SCHEMA)
