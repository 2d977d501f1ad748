"""Round-11 additions: perceptual-hash (dHash) image near-dup (q194).

Layered like the prior rounds' suites: kernel-vs-pure-Python pin,
planted-recovery semantics, codec gating, and banding guarantees.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _py_dhash_bands(raw: bytes) -> list[int]:
    """Independent pure-Python dHash: the spec, written twice."""
    n = max(len(raw), 1)
    px = [(raw[(i * n) // 72] if raw else 0) for i in range(72)]
    bands = [0, 0, 0, 0]
    for r in range(8):
        for c in range(8):
            k = 8 * r + c
            if px[9 * r + c] > px[9 * r + c + 1]:
                bands[k // 16] |= 1 << (k % 16)
    return bands


def test_dhash_stage_matches_pure_python(spark):
    """The vectorized-numpy Arrow stage against the per-pixel spec on
    edge payloads (empty, 1 byte, shorter/longer than the grid,
    constant, strictly increasing/decreasing bytes)."""
    from kinesis_logs_reader_spark.operators.multimodal import (
        perceptual_hashes,
    )

    payloads = [
        b"",
        b"a",
        b"ab",
        b"\x00" * 72,
        bytes(range(72)),
        bytes(reversed(range(200))),
        b"hello world " * 40,
        bytes([7]) * 71 + bytes([200]),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )
    got = {
        r.doc_id: [r.b0, r.b1, r.b2, r.b3]
        for r in perceptual_hashes(df).collect()
    }
    want = {i: _py_dhash_bands(p) for i, p in enumerate(payloads)}
    assert got == want


def test_dhash_real_codec_gated(spark):
    """codec='real' must raise loudly (NotImplementedError) when Pillow
    is absent — never silently fake (the multimodal contract)."""
    from kinesis_logs_reader_spark.operators import multimodal

    df = spark.createDataFrame([(1, b"xx")], "doc_id long, payload binary")
    if multimodal.HAVE_PIL:
        pytest.skip("Pillow installed; loud-fail path not reachable")
    with pytest.raises(Exception) as exc:
        multimodal.perceptual_hashes(df, codec="real").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_q194_recovers_planted_neardups(spark):
    """All 24 planted one-byte-perturbed copies must surface as pairs
    (a <= 1-bit signature difference leaves >= 3 of 4 bands equal, so
    banding cannot miss them), every planted pair's Hamming distance
    is tiny, and every reported pair is within the declared radius."""
    from kinesis_logs_reader_spark.operators.multimodal import (
        q194_phash_neardup,
    )

    rows = q194_phash_neardup(spark, SF_DIR).collect()
    planted = {(r.ida, r.idb) for r in rows if r.is_planted}
    assert planted == {(i, i + 6_000_000) for i in range(24)}
    for r in rows:
        assert 0 <= r.hamming <= 6
        assert r.ida < r.idb


def test_q194_hamming_symmetry_and_self_zero(spark):
    """Hamming(x, x) == 0 through the same band arithmetic: a doc
    paired with its unmodified planted copy (identical payload) must
    report 0; and the planted perturbation never exceeds the one-byte
    bound for grid-sized payloads."""
    from kinesis_logs_reader_spark.operators.multimodal import (
        q194_phash_neardup,
    )
    from kinesis_logs_reader_spark.sources.tables import load_table

    lens = {
        r.doc_id: r.n
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 24)
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    rows = q194_phash_neardup(spark, SF_DIR).collect()
    for r in rows:
        if r.is_planted and lens[r.ida] >= 72:
            # one changed byte samples into at most pixel 0 -> at most
            # the single (r0,c0) gradient bit flips
            assert r.hamming <= 1, (r.ida, r.hamming)
