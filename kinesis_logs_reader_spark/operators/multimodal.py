"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (SURVEY.md §2.2 I5 extension): media travels as a ``binary``
column with a metadata struct alongside; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so
each Python worker touches one partition's batches and nothing ever
collects to the driver. Partitioning: repartition by a content-hash
bucket before heavy decode so stragglers (huge payloads) spread evenly.

Codecs are an OPTIONAL import (VERDICT r3 item 6): when Pillow is
installed, ``codec="real"`` (or ``"auto"``) decodes/resizes through it;
without it, the deterministic fake decoder keeps the plumbing testable
and ``codec="real"`` raises loudly. The oracle-checked q49 pins
``codec="fake"`` explicitly so its output is deterministic regardless
of what's installed. tests/test_multimodal.py carries a
skipped-if-unavailable real-codec test.
"""

from __future__ import annotations

import io

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_logs_reader_spark.sources.tables import load_table, spread_scan
from kinesis_logs_reader_spark.functions.caching import corpus_key

try:  # optional dependency: real image codec
    from PIL import Image as _PILImage
except ImportError:  # container lacks image libs; fake decoder stands in
    _PILImage = None

HAVE_PIL = _PILImage is not None

# Planted-fixture id namespaces (ADVICE r11): q194/q196/q197/q199
# re-emit natural docs at doc_id + offset so their oracles can plant
# recoverable twins in-query. INVARIANT: natural corpus doc_ids stay
# BELOW the smallest offset — at a corpus approaching 6M documents,
# raise all three offsets together (and their oracle literals) or
# is_planted silently flips on natural ids. The synthetic test corpus
# tops out ~6x10^5 at sf~1; the margin is 10x.
PLANT_PHASH = 6_000_000  # q194 near-dup twins; q199 filters below this
PLANT_STATIC = 7_000_000  # q196 static clips
PLANT_SILENT = 8_000_000  # q197 half-silent clips

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
    """Real codec: Pillow decode + an 8-dim luminance feature vector
    (per-pixel RGB means of a 4x2 thumbnail — cheap, deterministic).
    Raises loudly when Pillow is absent rather than silently faking."""
    if _PILImage is None:
        raise NotImplementedError(
            "Pillow not installed; install it for codec='real' or use "
            "the deterministic fake decoder (codec='fake')"
        )
    img = _PILImage.open(io.BytesIO(payload))
    img.load()
    width, height = img.size
    thumb = img.convert("RGB").resize((4, 2))
    feats = [sum(px) / (3.0 * 255.0) for px in thumb.getdata()]
    return width, height, feats


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in: 'dimensions' and an 8-dim 'feature' vector
    derived from payload bytes. Same batch shape as a real decoder."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    feats = [float((payload[i % max(n, 1)] if n else 0) ^ i) for i in range(8)]
    return width, height, feats


def _resolve_codec(codec: str):
    """'fake' | 'real' | 'auto' -> decode function. 'auto' prefers the
    real codec when Pillow is importable on the WORKER (checked lazily
    inside the stage, not on the driver — a cluster can have different
    images driver-side vs executor-side)."""
    if codec == "fake":
        return _fake_decode
    if codec == "real":
        return decode_image_real
    if codec == "auto":
        return decode_image_real if HAVE_PIL else _fake_decode
    raise ValueError(f"codec must be 'fake' | 'real' | 'auto', got {codec!r}")


def decode_image_batch(codec: str = "fake"):
    """mapInPandas stage factory: (doc_id, payload) -> DECODED_SCHEMA."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _resolve_codec(codec)
        for pdf in batches:
            ws, hs, fs, nb = [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                w, h, f = decode(raw)
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

    return _decode


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def _fake_resize(raw: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic stand-in: samples target_w*target_h payload bytes,
    preserving the batch shape a real resizer produces."""
    n = max(len(raw), 1)
    return bytes(
        raw[(i * n) // (target_w * target_h)] if raw else 0
        for i in range(target_w * target_h)
    )


def _real_resize(raw: bytes, target_w: int, target_h: int) -> bytes:
    """Pillow resize -> raw grayscale bytes (target_w*target_h)."""
    if _PILImage is None:
        raise NotImplementedError(
            "Pillow not installed; install it for codec='real' or use "
            "the deterministic fake resizer (codec='fake')"
        )
    img = _PILImage.open(io.BytesIO(raw))
    return img.convert("L").resize((target_w, target_h)).tobytes()


def resize_batch(target_w: int, target_h: int, codec: str = "fake"):
    """mapInPandas stage factory: (doc_id, payload) -> fixed-size thumb.

    ``codec`` as in :func:`decode_images`: 'fake' | 'real' | 'auto'.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "real" or (codec == "auto" and HAVE_PIL):
            kernel = _real_resize
        elif codec in ("fake", "auto"):
            kernel = _fake_resize
        else:
            raise ValueError(f"codec must be 'fake' | 'real' | 'auto', got {codec!r}")
        for pdf in batches:
            thumbs = [
                kernel(bytes(payload), target_w, target_h)
                for payload in pdf["payload"]
            ]
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
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    codec: str = "fake",
) -> DataFrame:
    src = df.select("doc_id", F.col(payload_col).alias("payload"))
    return src.mapInPandas(resize_batch(target_w, target_h, codec), RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, n_frames: int, payload_col: str = "payload",
    spread: bool = True,
) -> DataFrame:
    # spread_scan (r14): fan the Arrow frame-sample stage across
    # Python workers when the input is an unsplittable scan (guide
    # §2.5/§4.1); no-op on many-split or synthetic inputs. Callers
    # whose downstream is digest-light pass spread=False (q175 A/B:
    # OFF wins 0.49 vs 0.53 s) while frame-pair-heavy consumers keep
    # it (q196 A/B: spread wins 0.90 vs 1.29 s).
    src = df.select("doc_id", F.col(payload_col).alias("payload"))
    if spread:
        src = spread_scan(src)
    return src.mapInPandas(sample_frames_batch(n_frames), FRAMES_SCHEMA)


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    buckets: int = 0,
    codec: str = "fake",
) -> DataFrame:
    """Run the decode stage over a (doc_id, payload: binary) DataFrame.

    ``buckets > 0`` pre-repartitions on a payload-hash bucket so heavy
    payloads spread across executors instead of skewing one partition.
    ``codec``: 'fake' (deterministic, always available), 'real'
    (Pillow, raises if absent), 'auto' (real when installed).
    """
    src = df.select("doc_id", F.col(payload_col).alias("payload"))
    if buckets:
        src = src.repartition(buckets, F.abs(F.xxhash64("payload")) % buckets)
    return src.mapInPandas(decode_image_batch(codec), DECODED_SCHEMA)


def q175_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level dedup audit over video-shaped binaries (r8): sample
    8 'frames' per clip (the fake codec slices evenly-spaced 64-byte
    windows; a real deployment swaps in ffmpeg keyframes behind the
    same mapInPandas stage — multimodal.py's stated contract), md5-
    fingerprint each frame, and report per-source frame counts,
    distinct-fingerprint counts, and the duplicate rate — the static-
    intro / duplicated-b-roll detector a video-training pipeline runs
    before sampling clips.

    Spark shape: payload is an opaque BINARY column; the fan-out (1
    clip -> 8 frame rows) runs in the Arrow-batched sample_frames
    stage (the real multimodal plumbing: binary in, binary out,
    bounded 64-byte frames); fingerprints are JVM md5 over the binary
    frames; the rollup is one (source) aggregate with a distinct
    count. At 100 TB frames shuffle as 16-byte digests, never pixels
    (the q40/q160 digest discipline).

    Oracle: the fake codec's byte windows re-derived as VARCHAR
    substrings — valid because the corpus is ASCII (octet == char,
    the same fixture invariant the levenshtein contract pins in
    tests/test_hash_contract_fuzz.py); md5 of the same bytes is the
    same hex in both engines.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("text").cast("binary").alias("payload")
    )
    frames = sample_frames(docs, n_frames=8, spread=False)
    fp = frames.select(
        "doc_id", F.md5(F.col("frame")).alias("fp")
    ).join(docs.select("doc_id", "source"), "doc_id")
    return (
        fp.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.countDistinct("fp").alias("n_distinct"),
        )
        .select(
            "source",
            "n_frames",
            "n_distinct",
            F.expr(
                "((n_frames - n_distinct) * 1000000L) div n_frames"
            ).alias("dup_ppm"),
        )
        .orderBy("source")
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("b0", T.IntegerType()),
        T.StructField("b1", T.IntegerType()),
        T.StructField("b2", T.IntegerType()),
        T.StructField("b3", T.IntegerType()),
    ]
)


def dhash_batch(codec: str = "fake"):
    """mapInPandas stage factory: (doc_id, payload) -> 64-bit dHash as
    4x16-bit bands (b0..b3) — the perceptual image digest.

    dHash (difference hash): resize to a 9x8 grayscale grid, then bit
    k = 8r+c is set iff pixel[r][c] > pixel[r][c+1] — 64 horizontal-
    gradient bits, robust to uniform brightness/scale changes. The
    'fake' codec samples payload bytes ((i*n) div 72, the _fake_resize
    rule) so the digest is integer arithmetic end-to-end and DuckDB-
    re-derivable; 'real' decodes through Pillow (convert('L'),
    resize((9,8))) behind the same batch shape and raises loudly when
    absent. Bands never assemble into one int64 (bit 63 would need
    unsigned semantics; DuckDB errors on signed overflow) — Hamming
    distance is the SUM of per-band bit_count(xor), identical either
    way.
    """

    def _stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if codec == "real" or (codec == "auto" and HAVE_PIL):
            if _PILImage is None:
                raise NotImplementedError(
                    "Pillow not installed; install it for codec='real' "
                    "or use the deterministic fake grid (codec='fake')"
                )

            def grid(raw: bytes) -> list[int]:
                img = _PILImage.open(io.BytesIO(raw))
                return list(img.convert("L").resize((9, 8)).tobytes())

        elif codec in ("fake", "auto"):

            def grid(raw: bytes) -> list[int]:
                n = max(len(raw), 1)
                return [
                    (raw[(i * n) // 72] if raw else 0) for i in range(72)
                ]

        else:
            raise ValueError(
                f"codec must be 'fake' | 'real' | 'auto', got {codec!r}"
            )

        weights = (1 << (np.arange(64, dtype=np.int64) % 16)).reshape(4, 16)
        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                continue
            px = np.array(
                [grid(bytes(p)) for p in pdf["payload"]], dtype=np.int16
            ).reshape(n_rows, 8, 9)
            bits = (px[:, :, :8] > px[:, :, 1:]).reshape(n_rows, 4, 16)
            bands = (bits * weights).sum(axis=2).astype(np.int32)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "b0": bands[:, 0],
                    "b1": bands[:, 1],
                    "b2": bands[:, 2],
                    "b3": bands[:, 3],
                }
            )

    return _stage


def perceptual_hashes(
    df: DataFrame,
    payload_col: str = "payload",
    codec: str = "fake",
    spread: bool = False,
) -> DataFrame:
    """(doc_id, payload) -> (doc_id, b0..b3): the dHash stage.

    ``spread`` defaults to False (ADVICE r14): every corpus caller in
    this module feeds the stage from inside an lru_persisted builder or
    a filter-bounded frame where the r14 A/Bs measured the fan-out
    exchange neutral-to-negative (q200's many small consumer stages,
    the 21-row planted batch), and the streaming micro-batch caller is
    non-file-backed so spread_scan no-ops there regardless. Pass
    ``spread=True`` only for a one-shot decode+hash pass over a
    single-row-group corpus scan with no persisted reuse — the one
    shape where the r14 measurements showed the exchange winning
    (guide §2.5/§4.1)."""
    src = df.select("doc_id", F.col(payload_col).alias("payload"))
    if spread:
        src = spread_scan(src)
    return src.mapInPandas(dhash_batch(codec), PHASH_SCHEMA)


def q194_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup pairs (r11: the multimodal
    family's similarity story — q49 does metadata, q175 exact frame
    digests; this catches images that are ALIKE, not identical —
    re-encoded thumbnails, brightness-shifted copies — the image-side
    analog of q47's SimHash text near-dup).

    Near-dups are planted in-query (docs with id < 24 re-emitted at
    id+PLANT_PHASH with the FIRST byte replaced by 'Z'): the fake grid
    samples (i*n) div 72, so a same-length one-byte change perturbs at
    most the pixels that sample offset 0 — Hamming distance <= a few
    bits, guaranteed recoverable (a <= 1-bit difference leaves >= 3 of
    the 4 bands identical, so LSH banding MUST surface the pair).

    Spark shape: digests come out of the Arrow dhash stage (one
    mapInPandas pass, binary in / 4 small ints out — at 100 TB pixels
    never shuffle, only 8-byte signatures, the q175 digest
    discipline); candidates are the q46 banded self-join (4 bands x
    16 bits, pairs only within equal (band, value) buckets — never
    all-pairs); verification joins the two signature rows and keeps
    Hamming <= 6 via SUM(bit_count(xor(band))), exact int arithmetic
    in both engines. Oracle re-derives the byte-sampled grid as
    VARCHAR ord(substr()) (ASCII corpus: octet == char, the q175
    invariant) and the full band/LSH/Hamming pipeline in SQL.

    Reference analog: none (beyond-reference mandate; multimodal
    family, SURVEY §2.2 I5).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    planted = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 24)
        .select(
            (F.col("doc_id") + PLANT_PHASH).alias("doc_id"),
            F.concat(F.lit("Z"), F.expr("substr(text, 2)"))
            .cast("binary")
            .alias("payload"),
        )
    )
    # The signature frame is read three times (band explode + both
    # verification sides); session-persist it so the Arrow stage runs
    # ONCE per corpus — 5 small ints per doc, the q46 pair-frame
    # convention (at 100 TB this is the phash side table a pipeline
    # materializes anyway).
    from kinesis_logs_reader_spark.functions.caching import lru_persisted

    sig = lru_persisted(
        spark,
        "_klrs_phash_sig_cache",
        corpus_key(sf_dir, "documents"),
        lambda: perceptual_hashes(
            docs.unionByName(planted), spread=False
        ),
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"), F.col(f"b{i}").alias("bv")
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.bi", "b.bv")
    left, right = bands.alias("l"), bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.bi") == F.col("r.bi"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("ida"), F.col("r.doc_id").alias("idb")
        )
        .distinct()
    )
    sig_a = sig.select(
        F.col("doc_id").alias("ida"),
        *[F.col(f"b{i}").alias(f"a{i}") for i in range(4)],
    )
    sig_b = sig.select(
        F.col("doc_id").alias("idb"),
        *[F.col(f"b{i}").alias(f"bb{i}") for i in range(4)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"bb{i}")))
        for i in range(4)
    )
    return (
        cand.join(sig_a, "ida")
        .join(sig_b, "idb")
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= 6)
        .select(
            "ida",
            "idb",
            "hamming",
            (F.col("idb") - F.col("ida") == PLANT_PHASH).alias("is_planted"),
        )
        .orderBy("ida", "idb")
    )


def q196_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip scene-cut profile (r11: the multimodal family's
    TEMPORAL story — q175 dedups frames, q194 matches alike images;
    this reads a clip's internal structure): dHash every sampled
    frame, take consecutive-frame Hamming distances, and report per
    clip how many hard cuts it contains (step >= 16 of 64 bits),
    where the first one lands, and the mean/max inter-frame change —
    the shot-boundary detector a video-training pipeline runs to
    split clips into scenes before sampling.

    Planted semantics: docs with id < 30 (and >= 64 chars) re-emitted
    at id+PLANT_STATIC as STATIC clips — the first 64 bytes repeated 8
    times, so every sampled frame is the identical 64-byte block
    (step = len div 8 = 64 exactly), every dHash equal, zero cuts by
    construction; pinned against natural clips, which cut nearly
    everywhere on byte-sampled text.

    Spark shape: ONE Arrow fan-out (sample_frames — the swap-in point
    for real keyframe extraction) feeding ONE Arrow dHash stage via a
    fid = doc_id*8+frame_idx key (frames enter the hash stage as the
    SAME batch shape q194 uses — no new kernel); everything after is
    JVM: a per-clip lag window over 8-row partitions and one
    aggregate. At 100 TB pixels cross exactly two Arrow boundaries as
    64-byte frames and shuffle once as 8 small ints per frame.

    Oracle: frames as VARCHAR substrings (q175's ASCII invariant),
    the q194 grid/band kernel per frame, lag windows in SQL.

    Reference analog: none (beyond-reference mandate; multimodal
    family, SURVEY §2.2 I5).
    """
    from pyspark.sql.window import Window

    cut = 16
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    planted = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 30) & (F.length("text") >= 64))
        .select(
            (F.col("doc_id") + PLANT_STATIC).alias("doc_id"),
            F.repeat(F.expr("substr(text, 1, 64)"), 8)
            .cast("binary")
            .alias("payload"),
        )
    )
    frames = sample_frames(docs.unionByName(planted), n_frames=8)
    # spread=False: frames is sample_frames output, already fanned
    # across workers — a second exchange here is pure overhead
    sig = perceptual_hashes(
        frames.select(
            (F.col("doc_id") * 8 + F.col("frame_idx")).alias("doc_id"),
            F.col("frame").alias("payload"),
        ),
        spread=False,
    ).select(
        F.expr("doc_id div 8").alias("doc_id"),
        F.expr("doc_id % 8").cast("int").alias("frame_idx"),
        "b0",
        "b1",
        "b2",
        "b3",
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    stepped = sig.select(
        "doc_id",
        "frame_idx",
        sum(
            F.bit_count(
                F.col(f"b{i}").bitwiseXOR(F.lag(f"b{i}").over(w))
            )
            for i in range(4)
        ).alias("h"),
    ).filter(F.col("frame_idx") >= 1)
    return (
        stepped.groupBy("doc_id")
        .agg(
            F.sum((F.col("h") >= cut).cast("long")).alias("n_cuts"),
            F.max("h").cast("int").alias("max_step"),
            F.expr("(sum(h) * 1000) div count(1)").alias("mean_step_milli"),
            F.coalesce(
                F.min(F.when(F.col("h") >= cut, F.col("frame_idx"))),
                F.lit(-1),
            )
            .cast("int")
            .alias("first_cut"),
        )
        .withColumn("is_planted_static", F.col("doc_id") >= PLANT_STATIC)
        .orderBy("doc_id")
    )


# --- audio: energy / voice-activity segmentation -----------------------------

AUDIO_WIN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)

# Per-window voiced threshold, calibrated on the synthetic corpus: full
# 64-byte prose windows measure 569k-672k (1st pct 586k, median 628k);
# space/digit-dense stretches fall below 610k (~15% of natural windows)
# and a pure-space window is 32^2*64 = 65,536 — unambiguously silent.
VOICED_THRESH = 610_000


def audio_energy_batch(win_bytes: int = 64):
    """mapInPandas stage factory: audio payload -> fixed-size analysis
    windows with integer short-time energy (sum of squared samples).

    The fake codec reads the payload as unsigned 8-bit PCM; a real
    deployment swaps soundfile/ffmpeg decode into this same stage
    (binary in, bounded ints out — the multimodal.py contract). The
    per-window energy is exact int64 (max 255^2 * 64 < 2^23), so the
    oracle can re-derive it bit-for-bit; only FULL windows are
    emitted (len // win_bytes), matching the SQL generate_series
    bound. Inner loop is numpy (frombuffer -> square -> reshape-sum):
    no per-sample Python, the q143/q45 Arrow-kernel rule.
    """

    def _stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            energies: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_win = len(raw) // win_bytes
                if n_win == 0:
                    continue
                arr = np.frombuffer(
                    raw, dtype=np.uint8, count=n_win * win_bytes
                ).astype(np.int64)
                e = (arr * arr).reshape(n_win, win_bytes).sum(axis=1)
                ids.extend([doc_id] * n_win)
                idxs.extend(range(n_win))
                energies.extend(e.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "win_idx": np.asarray(idxs, dtype=np.int32),
                    "energy": np.asarray(energies, dtype=np.int64),
                }
            )

    return _stage


def audio_energy(
    df: DataFrame, win_bytes: int = 64, payload_col: str = "payload"
) -> DataFrame:
    """(doc_id, payload: binary) -> (doc_id, win_idx, energy) windows.

    spread_scan A/B (r14): OFF wins 0.61 vs 0.87 s (q197, the sole
    caller) — the int64 energy sum is cheap per byte and the window
    rows re-exchange into the VAD aggregate anyway. Measured-negative.
    """
    src = df.select("doc_id", F.col(payload_col).alias("payload"))
    return src.mapInPandas(audio_energy_batch(win_bytes), AUDIO_WIN_SCHEMA)


def q197_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip voice-activity segmentation over audio-shaped binaries
    (r11: the multimodal family's AUDIO story — q49/q194/q196 cover
    images and video; this is the energy-based VAD a speech-training
    pipeline runs to drop silence and split clips into utterances
    before transcription): 64-byte analysis windows with integer
    short-time energy, a voiced/silent flag per window, and per clip
    the voiced fraction, utterance count (maximal voiced runs), and
    longest silence run.

    Planted semantics: docs with id < 24 (and >= 256 chars) re-emitted
    at id+PLANT_SILENT as half-silent clips — the first 256 payload bytes
    followed by 256 spaces — so the tail is 4 windows of energy
    32^2*64 = 65,536 (silent by construction) and every planted clip
    reports longest_silence >= 4; pinned in tests together with a
    pure-Python recompute of the full pipeline.

    Spark shape: ONE Arrow stage (audio_energy — the decode swap-in
    point; numpy kernel, no per-sample Python) emitting 3 small ints
    per window; everything after is JVM — run-length segmentation via
    a per-clip lag window (partitions bounded by len/64 windows per
    clip) and one aggregate per run then per clip. At 100 TB waveforms
    cross exactly one Arrow boundary and shuffle once as 3-int window
    rows (the q175/q196 digest discipline: payload bytes never
    shuffle).

    Oracle: windows as VARCHAR substrings (the q175 ASCII invariant:
    octet == char), energy re-derived with list_transform ord()
    squares, the identical lag/run/rollup windows in SQL — exact
    int64 end to end.

    Reference analog: none (beyond-reference mandate; multimodal
    family, SURVEY §2.2 I5).
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    planted = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 24) & (F.length("text") >= 256))
        .select(
            (F.col("doc_id") + PLANT_SILENT).alias("doc_id"),
            F.concat(F.expr("substr(text, 1, 256)"), F.lit(" " * 256))
            .cast("binary")
            .alias("payload"),
        )
    )
    wins = audio_energy(docs.unionByName(planted)).withColumn(
        "voiced", F.col("energy") >= F.lit(VOICED_THRESH)
    )
    w = Window.partitionBy("doc_id").orderBy("win_idx")
    lagged = F.lag("voiced").over(w)
    runs = wins.withColumn(
        "new_run",
        F.when(lagged.isNull() | (lagged != F.col("voiced")), 1).otherwise(0),
    ).withColumn("run_id", F.sum("new_run").over(w))
    run_lens = runs.groupBy("doc_id", "run_id", "voiced").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        run_lens.groupBy("doc_id")
        .agg(
            F.sum("run_len").alias("n_windows"),
            F.sum(
                F.when(F.col("voiced"), F.col("run_len")).otherwise(F.lit(0))
            ).alias("voiced_windows"),
            F.sum(F.when(F.col("voiced"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_segments"),
            F.coalesce(
                F.max(F.when(~F.col("voiced"), F.col("run_len"))), F.lit(0)
            )
            .cast("bigint")
            .alias("longest_silence"),
        )
        .select(
            "doc_id",
            "n_windows",
            "voiced_windows",
            F.expr("voiced_windows * 1000000L div n_windows").alias(
                "voiced_ppm"
            ),
            "n_segments",
            "longest_silence",
            (F.col("doc_id") >= PLANT_SILENT).alias("is_planted"),
        )
        .orderBy("doc_id")
    )


def q199_crossmodal_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval with RRF fusion (r12: the multimodal
    ladder's RETRIEVAL story, VERDICT r11 item 6 — q194 matches alike
    images, q196 reads temporal structure; this answers "find items
    LIKE this one" across BOTH modalities at once): the query item is
    doc_id 0, every other document is a candidate scored twice —
    visually, by the Hamming distance between dHash signatures (the
    q194 Arrow stage over the payload column), and lexically, by
    distinct shared-token count against the query's text — and the two
    top-60 rank lists fuse via Reciprocal Rank Fusion (Cormack et al.
    2009) in integer micro-units, the q110b idiom, so every hashed
    column is pure integer arithmetic in both engines.

    Scale shape: the signature side table is the SAME session-persisted
    frame q194 builds (one Arrow pass per corpus — at 100 TB this is
    the materialized phash table, filtered here to natural ids); the
    1-row query signature broadcasts into a map-only Hamming pass;
    each retriever's candidate list collapses through
    TakeOrderedAndProject (per-partition heaps + driver merge, never a
    global sort of the corpus); the lexical pass broadcasts the
    query's distinct tokens into the exploded candidate tokens and
    partial-aggregates the overlap count by doc_id. The fusion itself
    is a full outer join of two <=60-row frames. Ranks come from
    integer scores with doc_id tie-breaks, so ranks — and the
    1000000 DIV (60+rank) micro-unit RRF — are bit-identical across
    engines.

    Reference analog: none (beyond-reference mandate; multimodal
    family, SURVEY §2.2 I5 + I7).
    """
    from kinesis_logs_reader_spark.functions.caching import lru_persisted
    from kinesis_logs_reader_spark.functions.text import tokens

    from pyspark.sql.window import Window

    k_list = 60
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    planted = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 24)
        .select(
            (F.col("doc_id") + PLANT_PHASH).alias("doc_id"),
            F.concat(F.lit("Z"), F.expr("substr(text, 2)"))
            .cast("binary")
            .alias("payload"),
        )
    )
    # q194's signature cache, verbatim (same key -> shared build);
    # natural corpus only for retrieval
    sig = lru_persisted(
        spark,
        "_klrs_phash_sig_cache",
        corpus_key(sf_dir, "documents"),
        lambda: perceptual_hashes(
            docs.unionByName(planted), spread=False
        ),
    ).filter(F.col("doc_id") < PLANT_PHASH)
    qsig = sig.filter(F.col("doc_id") == 0).select(
        *[F.col(f"b{i}").alias(f"q{i}") for i in range(4)]
    )
    hamming = sum(
        F.bit_count(F.col(f"b{i}").bitwiseXOR(F.col(f"q{i}")))
        for i in range(4)
    )
    vis_top = (
        sig.filter(F.col("doc_id") > 0)
        .join(F.broadcast(qsig))
        .select("doc_id", hamming.cast("int").alias("hamming"))
        .orderBy("hamming", "doc_id")
        .limit(k_list)
    )
    w_vis = Window.orderBy("hamming", "doc_id")
    vis_rank = vis_top.select(
        "doc_id", F.row_number().over(w_vis).alias("rank_vis")
    )
    text_docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    # explode_nonempty, not explode: a non-outer generate over an array
    # computed in the same plan lets Catalyst infer size()>0 and
    # re-inline the array build per row (the r11 InferFilters trap)
    from kinesis_logs_reader_spark.functions.generate import explode_nonempty

    qtok = (
        explode_nonempty(
            text_docs.filter(F.col("doc_id") == 0),
            F.array_distinct(tokens()),
            "tok",
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    overlap = (
        explode_nonempty(
            text_docs.filter(F.col("doc_id") > 0),
            F.array_distinct(tokens()),
            "tok",
            "doc_id",
        )
        .join(F.broadcast(qtok), "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap"))
    )
    lex_top = overlap.orderBy(F.col("overlap").desc(), "doc_id").limit(k_list)
    w_lex = Window.orderBy(F.col("overlap").desc(), "doc_id")
    lex_rank = lex_top.select(
        "doc_id", F.row_number().over(w_lex).alias("rank_lex")
    )
    # full outer cannot broadcast (Spark join-type constraint); the SMJ
    # here merges two <=60-row frames — size-bounded by construction
    fused = vis_rank.join(lex_rank, "doc_id", "full").select(
        "doc_id",
        "rank_vis",
        "rank_lex",
        (
            F.coalesce(F.expr("1000000 DIV (60 + rank_vis)"), F.lit(0))
            + F.coalesce(F.expr("1000000 DIV (60 + rank_lex)"), F.lit(0))
        )
        .cast("bigint")
        .alias("rrf_ppm"),
    )
    top = fused.orderBy(F.col("rrf_ppm").desc(), "doc_id").limit(20)
    return top.orderBy("doc_id")


# q200 planted-admission namespaces: far past any plausible doc count
# (the q160 convention — a +2e6 shift would collide with the sf~1
# synthesized table's shifted copies).
PLANT_ADM_EXACT = 4_000_000_000_000
PLANT_ADM_NEAR = 8_000_000_000_000
PLANT_ADM_BATCH = 9_000_000_000_000  # second copy of each mutated payload


def phash_sig64(prefix: str = "") -> "F.Column":
    """Packed 64-bit dHash signature as ONE bigint: b0..b3 16-bit
    bands, top band biased by 32768 so 4x16 bits span the FULL signed
    int64 range (an unbiased b3<<48 overflows at b3 >= 32768; ANSI
    mode raises). Same expression on the oracle side."""
    c = lambda n: F.col(f"{prefix}{n}").cast("bigint")  # noqa: E731
    return (
        c("b0")
        + c("b1") * F.lit(1 << 16)
        + c("b2") * F.lit(1 << 32)
        + (c("b3") - F.lit(32768)) * F.lit(1 << 48)
    )


def phash_digest_rows(sigs: DataFrame) -> DataFrame:
    """(doc_id, b0..b3) -> (doc_id, band_idx, digest) with NAMESPACED
    string digests — band_idx -1 carries "x:<sig64>" (the exact packed
    signature), 0..3 carry "<i>:<band value>". Namespacing keys band
    identity into the digest itself (the q160 c3 contract), so ONE
    digest-bucketed store serves both the exact probe and the band
    probe with zero store-side exchange."""
    out = sigs.select(
        "doc_id",
        F.lit(-1).cast("int").alias("band_idx"),
        F.concat(F.lit("x:"), phash_sig64().cast("string")).alias("digest"),
    )
    for i in range(4):
        out = out.unionByName(
            sigs.select(
                "doc_id",
                F.lit(i).cast("int").alias("band_idx"),
                F.concat(
                    F.lit(f"{i}:"), F.col(f"b{i}").cast("string")
                ).alias("digest"),
            )
        )
    return out


def _phash_index_path(sf_dir: str) -> str:
    """Fingerprinted location of the persisted phash signature index —
    the q160 path discipline (corpus mtime+size fingerprint; contract
    version bumped if the digest recipe or layout ever changes)."""
    import os
    import re

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    src = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src)
    except OSError as e:
        raise FileNotFoundError(
            f"corpus source not statable, refusing to fingerprint: {src}"
        ) from e
    fp = f"{st.st_mtime_ns}_{st.st_size}"
    safe = re.sub(r"[^A-Za-z0-9_.-]+", "_", os.path.abspath(sf_dir))
    return os.path.join(
        repo_root, "spark-warehouse", "phash_index", f"p1_{safe}_{fp}"
    )


def get_or_build_phash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disk-persisted dHash signature index of the image STORE
    partition (doc_id % 10 != 3): one digest-bucketed parquet side
    table of (doc_id, band_idx, digest) rows, built once per corpus
    fingerprint, reused across calls AND sessions — the q160
    incremental-index discipline on the q194 phash side table
    (VERDICT r11 item 8a). Probe joins against it read the bucketed
    layout with NO store-side exchange; only incoming batches shuffle.
    """
    import os

    from kinesis_logs_reader_spark.functions.caching import lru_persisted
    from kinesis_logs_reader_spark.operators.dedup import (
        _read_index_bucketed,
        _write_index_bucketed,
    )

    path = _phash_index_path(sf_dir)
    if not os.path.isdir(path):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.col("text").cast("binary").alias("payload")
        )
        planted_q194 = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 24)
            .select(
                (F.col("doc_id") + PLANT_PHASH).alias("doc_id"),
                F.concat(F.lit("Z"), F.expr("substr(text, 2)"))
                .cast("binary")
                .alias("payload"),
            )
        )
        nat = lru_persisted(
            spark,
            "_klrs_phash_sig_cache",
            corpus_key(sf_dir, "documents"),
            lambda: perceptual_hashes(
            docs.unionByName(planted_q194), spread=False
        ),
        ).filter(F.col("doc_id") < PLANT_PHASH)
        store_sigs = nat.filter(F.col("doc_id") % 10 != 3)
        _write_index_bucketed(spark, phash_digest_rows(store_sigs), path)
    return _read_index_bucketed(spark, path)


def phash_admission_verdicts(
    incoming_sigs: DataFrame,
    known_digests: DataFrame,
    store_label: str = "exact_store",
    near_label: str = "near_store",
) -> DataFrame:
    """THE visual admission-verdict pipeline, shared by the batch
    operator (:func:`q200_phash_admission`) and the streaming sink
    (``streaming.jobs.apply_phash_admission_batch``) so the twins
    cannot drift — the exact mirror of ``dedup.admission_verdicts``
    on the dHash side table.

    ``incoming_sigs``: (doc_id, b0..b3); ``known_digests``: (digest)
    in the :func:`phash_digest_rows` namespaces. Precedence is fixed:
    exact-vs-store (packed signature digest in the store),
    exact-within-batch (min-doc_id keeps), any-band collision
    near-candidate, else novel. Both store probes are digest-keyed
    left-semi joins against the SAME frame — band identity lives
    inside the namespaced digest — so a digest-bucketed store serves
    them with zero store-side exchange. Pixels never move; only
    signature strings.
    """
    rows = phash_digest_rows(incoming_sigs)
    exact_rows = rows.filter(F.col("band_idx") == -1).select(
        "doc_id", "digest"
    )
    known = known_digests.select("digest")
    in_store = (
        exact_rows.join(known, "digest", "left_semi")
        .select("doc_id")
        .withColumn("_exact_store", F.lit(True))
    )
    first_seen = exact_rows.groupBy("digest").agg(
        F.min("doc_id").alias("_first_id")
    )
    in_batch = (
        exact_rows.join(first_seen, "digest")
        .filter(F.col("doc_id") > F.col("_first_id"))
        .select("doc_id")
        .withColumn("_exact_batch", F.lit(True))
    )
    near = (
        rows.filter(F.col("band_idx") >= 0)
        .join(known, "digest", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_near", F.lit(True))
    )
    return (
        incoming_sigs.select("doc_id")
        .join(in_store, "doc_id", "left")
        .join(in_batch, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_exact_store"), F.lit(store_label))
            .when(F.col("_exact_batch"), F.lit("exact_batch"))
            .when(F.col("_near"), F.lit(near_label))
            .otherwise(F.lit("novel"))
            .alias("verdict"),
        )
    )


def q200_phash_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IMAGE admission (r12, VERDICT r11 item 8a — the
    q160 signature-index discipline on the q194 phash side table): the
    incoming batch (doc_id % 10 == 3) is verdicted against the stored
    corpus's persisted dHash signature index
    (:func:`get_or_build_phash_index`) without re-decoding stored
    pixels.

    Per incoming image, first verdict that applies: ``exact_store``
    (identical 64-bit dHash already admitted), ``exact_batch``
    (duplicates a smaller-doc_id image of its own batch),
    ``near_store`` (any 16-bit LSH band collides — the q194 banding
    contract), else ``novel``. Planted admissions exercise every
    class: store images re-submitted verbatim at +4e12 (their
    signatures RE-KEYED from the signature frame — identical payload
    implies identical dHash, no second decode), one-byte-mutated store
    images at +8e12 (>= 3 of 4 bands survive a same-length first-byte
    change, so the band probe MUST catch them; they land exact_store
    in the rare no-bit-flip case and the oracle replays the same
    rule), and a +9e12 second copy of each mutated payload
    (exact_batch whenever the first copy was not already stored).

    Output is the per-verdict admission summary (count + id checksum),
    O(4) rows at any scale. Probe joins read the digest-bucketed index
    with NO store-side exchange (the q160 scale contract); only the
    batch-sized incoming frame shuffles. The DuckDB oracle recomputes
    BOTH sides from the raw table, so a hash-green row also certifies
    the persisted index content itself.
    """
    from kinesis_logs_reader_spark.functions.caching import lru_persisted

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    planted_q194 = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 24)
        .select(
            (F.col("doc_id") + PLANT_PHASH).alias("doc_id"),
            F.concat(F.lit("Z"), F.expr("substr(text, 2)"))
            .cast("binary")
            .alias("payload"),
        )
    )
    nat = lru_persisted(
        spark,
        "_klrs_phash_sig_cache",
        corpus_key(sf_dir, "documents"),
        lambda: perceptual_hashes(
            docs.unionByName(planted_q194), spread=False
        ),
    ).filter(F.col("doc_id") < PLANT_PHASH)
    inc_nat = nat.filter(F.col("doc_id") % 10 == 3)
    inc_exact = (
        nat.filter((F.col("doc_id") % 10 != 3) & (F.col("doc_id") < 10))
        .select(
            (F.col("doc_id") + PLANT_ADM_EXACT).alias("doc_id"),
            "b0",
            "b1",
            "b2",
            "b3",
        )
    )
    mutated = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 24) & (F.col("doc_id") % 10 != 3))
        .select(
            (F.col("doc_id") + PLANT_ADM_NEAR).alias("doc_id"),
            F.concat(F.lit("Z"), F.expr("substr(text, 2)"))
            .cast("binary")
            .alias("payload"),
        )
    )
    # both the mutated row AND its +1e12 batch twin come out of ONE
    # Arrow pass: a second consumer of m_sigs would duplicate the whole
    # mapInPandas subtree (two Python-worker round trips per run)
    m_both = perceptual_hashes(mutated, spread=False).select(
        F.explode(
            F.array(
                F.col("doc_id"),
                F.col("doc_id") + F.lit(PLANT_ADM_BATCH - PLANT_ADM_NEAR),
            )
        ).alias("doc_id"),
        "b0",
        "b1",
        "b2",
        "b3",
    )
    incoming = inc_nat.unionByName(m_both).unionByName(inc_exact)
    idx = get_or_build_phash_index(spark, sf_dir)
    return (
        phash_admission_verdicts(incoming, idx.select("digest"))
        .groupBy("verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("verdict")
    )
