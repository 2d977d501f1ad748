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


# --- q195: cross-encoder-shaped rerank of q188's shortlist -----------------

_P = 2_147_483_647
_C = (912_367_891, 1_500_450_271, 2_038_074_743)


def _py_shingle_hashes(text: str) -> list[int]:
    """Independent pure-Python shingle-hash spec (functions/text.py)."""
    import hashlib

    tb = [
        int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _P
        for t in text.split(" ")
    ]
    return [
        (tb[i] * _C[0] % _P + tb[i + 1] * _C[1] % _P + tb[i + 2] * _C[2] % _P)
        % _P
        for i in range(max(0, len(tb) - 2))
    ]


def test_q195_matches_pure_python_rerank(spark):
    """End-to-end exactness pin: recompute the saturated-tf idf
    interaction scores and the full reranked output in pure Python
    from the raw texts + q188's shortlist, and require bit equality —
    the kernel (idf table, tf saturation, tie order) has one spec."""
    import math
    from collections import Counter

    from kinesis_logs_reader_spark.operators.similarity import (
        q188_pq_reranked,
        q195_ce_rerank,
    )
    from kinesis_logs_reader_spark.sources.tables import load_table

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    n = len(texts)
    sh = {d: _py_shingle_hashes(t) for d, t in texts.items()}
    df_cnt = Counter()
    for hs in sh.values():
        df_cnt.update(set(hs))
    idf = {
        t: math.floor(math.log(n / c) * 1e6 + 0.5)
        for t, c in df_cnt.items()
        if c * 10 <= n
    }
    tf = {d: Counter(hs) for d, hs in sh.items()}

    def ce_u(q: int, c: int) -> int:
        tq, tc = tf[q], tf[c]
        return sum(
            idf[t] * min(tq[t], 3) * min(tc[t], 3)
            for t in tq.keys() & tc.keys()
            if t in idf
        )

    top10 = [
        (r.qid, r.rk, r.vec_id, r.d2)
        for r in q188_pq_reranked(spark, SF_DIR).collect()
    ]
    expected = []
    for qid in sorted({q for q, *_ in top10}):
        cands = [
            (-ce_u(qid, v), d2, v, rk)
            for (q, rk, v, d2) in top10
            if q == qid
        ]
        for i, (neg_ce, d2, v, rk) in enumerate(sorted(cands)[:5], 1):
            expected.append((qid, i, v, rk, d2, -neg_ce))

    got = [
        (r.qid, r.ce_rank, r.vec_id, r.pq_rank, r.d2, r.ce_u)
        for r in q195_ce_rerank(spark, SF_DIR).collect()
    ]
    assert got == expected


def test_q195_output_contract(spark):
    """Shape invariants: exactly 5 rows per query, ce_rank 1..5,
    output pairs are a subset of q188's top-10, and the reranker
    actually reorders on content (ce_u non-increasing per qid)."""
    from collections import defaultdict

    from kinesis_logs_reader_spark.operators.similarity import (
        q188_pq_reranked,
        q195_ce_rerank,
    )

    pairs_188 = {
        (r.qid, r.vec_id) for r in q188_pq_reranked(spark, SF_DIR).collect()
    }
    rows = q195_ce_rerank(spark, SF_DIR).collect()
    by_q = defaultdict(list)
    for r in rows:
        by_q[r.qid].append(r)
        assert (r.qid, r.vec_id) in pairs_188
        assert r.ce_u >= 0
    for qid, rs in by_q.items():
        assert [r.ce_rank for r in rs] == [1, 2, 3, 4, 5]
        ces = [r.ce_u for r in rs]
        assert ces == sorted(ces, reverse=True)


def test_q189b_ties_out_with_q189(spark):
    """The production twin's estimates must equal q189's corresponding
    columns row for row (same sketches, same arithmetic — only the
    exact audit branch dropped)."""
    from kinesis_logs_reader_spark.operators.dedup import (
        q189_kmv_overlap,
        q189b_kmv_overlap_sketch,
    )

    full = {
        (r.source_a, r.source_b): (r.n_a, r.n_b, r.union_est, r.jacc_est_ppm)
        for r in q189_kmv_overlap(spark, SF_DIR).collect()
    }
    twin = {
        (r.source_a, r.source_b): (r.n_a, r.n_b, r.union_est, r.jacc_est_ppm)
        for r in q189b_kmv_overlap_sketch(spark, SF_DIR).collect()
    }
    assert twin == full


# --- q196: per-clip scene cuts ---------------------------------------------


def test_q196_planted_static_clips_have_zero_cuts(spark):
    """A static clip (one 64-byte block repeated 8 times) samples 8
    identical frames -> identical dHashes -> zero cuts, no first cut,
    zero mean step — by construction; natural byte-sampled text clips
    must show cuts somewhere (the detector actually fires)."""
    from kinesis_logs_reader_spark.operators.multimodal import q196_scene_cuts
    from tests.conftest import SF_DIR

    rows = q196_scene_cuts(spark, SF_DIR).collect()
    static = [r for r in rows if r.is_planted_static]
    natural = [r for r in rows if not r.is_planted_static]
    assert static, "planted static clips must exist"
    for r in static:
        assert (r.n_cuts, r.max_step, r.mean_step_milli, r.first_cut) == (
            0,
            0,
            0,
            -1,
        )
    assert any(r.n_cuts > 0 for r in natural)


def test_q196_matches_pure_python_spec(spark):
    """End-to-end kernel pin on a handful of clips: frame sampling,
    per-frame dHash (the q194 spec), consecutive Hamming steps, and
    the per-clip rollup recomputed in pure Python."""
    from kinesis_logs_reader_spark.operators.multimodal import q196_scene_cuts
    from kinesis_logs_reader_spark.sources.tables import load_table
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    texts = {
        r.doc_id: r.text.encode()
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 12)
        .collect()
    }

    def clip_profile(raw: bytes):
        step = max(len(raw) // 8, 1)
        frames = [raw[k * step : k * step + 64] for k in range(8)]
        sigs = [_py_dhash_bands(f) for f in frames]
        hs = [
            sum(bin(a ^ b).count("1") for a, b in zip(sigs[i - 1], sigs[i]))
            for i in range(1, 8)
        ]
        cuts = [i for i, h in enumerate(hs, 1) if h >= 16]
        return (
            len(cuts),
            max(hs),
            sum(hs) * 1000 // len(hs),
            cuts[0] if cuts else -1,
        )

    got = {
        r.doc_id: (r.n_cuts, r.max_step, r.mean_step_milli, r.first_cut)
        for r in q196_scene_cuts(spark, SF_DIR)
        .filter(F.col("doc_id") < 12)
        .collect()
    }
    want = {d: clip_profile(t) for d, t in texts.items()}
    assert got == want


# --- q197: per-clip audio VAD ------------------------------------------------


def _py_vad_profile(raw: bytes):
    """Pure-Python spec of the q197 pipeline: 64-byte windows, integer
    short-time energy, voiced threshold, run-length segmentation."""
    n_win = len(raw) // 64
    if n_win == 0:
        return None
    voiced = [
        sum(b * b for b in raw[k * 64 : (k + 1) * 64]) >= 610_000
        for k in range(n_win)
    ]
    runs: list[tuple[bool, int]] = []
    for v in voiced:
        if runs and runs[-1][0] == v:
            runs[-1] = (v, runs[-1][1] + 1)
        else:
            runs.append((v, 1))
    voiced_windows = sum(n for v, n in runs if v)
    return (
        n_win,
        voiced_windows,
        voiced_windows * 1_000_000 // n_win,
        sum(1 for v, _n in runs if v),
        max((n for v, n in runs if not v), default=0),
    )


def test_q197_planted_half_silent_clips(spark):
    """Planted clips (256 payload bytes + 256 spaces) have exactly 8
    windows and a tail silence run >= 4 by construction (space windows
    measure 32^2*64 = 65,536 << the 610k threshold); the natural corpus
    must contain both fully-voiced docs and docs with real silence —
    the detector separates, it doesn't rubber-stamp."""
    from kinesis_logs_reader_spark.operators.multimodal import q197_audio_vad

    rows = q197_audio_vad(spark, SF_DIR).collect()
    planted = [r for r in rows if r.is_planted]
    natural = [r for r in rows if not r.is_planted]
    assert planted, "planted half-silent clips must exist"
    for r in planted:
        assert r.n_windows == 8
        assert r.longest_silence >= 4
        assert r.voiced_ppm <= 500_000
    assert any(r.voiced_ppm == 1_000_000 for r in natural)
    assert any(r.voiced_ppm < 1_000_000 for r in natural)
    for r in rows:
        assert 0 <= r.voiced_windows <= r.n_windows
        assert r.n_segments <= (r.n_windows + 1) // 2 + 1


def test_q197_matches_pure_python_spec(spark):
    """End-to-end kernel pin on a handful of clips: windowing, energy,
    threshold, and run segmentation recomputed in pure Python."""
    from kinesis_logs_reader_spark.operators.multimodal import q197_audio_vad
    from kinesis_logs_reader_spark.sources.tables import load_table

    texts = {
        r.doc_id: r.text.encode()
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 12)
        .collect()
    }
    want = {}
    for d, t in texts.items():
        prof = _py_vad_profile(t)
        if prof is not None:
            want[d] = prof
        prof_p = _py_vad_profile(t[:256] + b" " * 256) if len(t) >= 256 else None
        if prof_p is not None:
            want[d + 8_000_000] = prof_p
    got = {
        r.doc_id: (
            r.n_windows,
            r.voiced_windows,
            r.voiced_ppm,
            r.n_segments,
            r.longest_silence,
        )
        for r in q197_audio_vad(spark, SF_DIR)
        .filter((F.col("doc_id") % 8_000_000) < 12)
        .collect()
    }
    assert got == want


# --- q198: per-label embedding dispersion -----------------------------------


def test_q198_matches_numpy_recompute(spark):
    """End-to-end pin: grid quantization, the sums scatter identity,
    floor-division centroids, and the nearest-centroid argmin all
    recomputed in numpy over the full (tiny) corpus."""
    import numpy as np

    from kinesis_logs_reader_spark.operators.similarity import (
        q198_embedding_dispersion,
    )
    from kinesis_logs_reader_spark.sources.tables import load_table

    rows = load_table(spark, SF_DIR, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        q = np.floor(np.asarray(r.embedding, dtype=np.float64) * 1024 + 0.5)
        by_label.setdefault(r.label, []).append(q.astype(np.int64))
    want = {}
    cents = {}
    for lab, vecs in by_label.items():
        m = np.stack(vecs)
        n = len(vecs)
        sum_sq = int((m * m).sum())
        s1 = m.sum(axis=0)
        norm_s1_sq = int((s1 * s1).sum())
        disp = (n * sum_sq - norm_s1_sq) * 1000 // (n * n)
        cents[lab] = np.floor(s1.astype(np.float64) / n).astype(np.int64)
        want[lab] = (n, disp)
    for lab in want:
        best = min(
            (int(((cents[lab] - cents[o]) ** 2).sum()), o)
            for o in cents
            if o != lab
        )
        want[lab] = want[lab] + (best[1], best[0])
    got = {
        r.label: (r.n_vecs, r.dispersion_milli, r.nearest_label, r.nearest_d2)
        for r in q198_embedding_dispersion(spark, SF_DIR).collect()
    }
    assert got == want
    assert all(v[1] > 0 for v in got.values())  # no collapsed label here


def test_multimodal_kernels_survive_adversarial_corpus(spark, tmp_path):
    """Robustness floor for the r11 multimodal kernels: q194/q196/q197
    must RUN (no crash, invariants hold) on a corpus the fake codec was
    never calibrated for — empty docs, one-byte docs, multi-byte
    unicode/emoji, NUL bytes, a 100 KB monster, single spaces. (Their
    ORACLES legitimately require the ASCII corpus invariant — this
    pins the Spark side's totality, not cross-engine equality.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis_logs_reader_spark.operators.multimodal import (
        q194_phash_neardup,
        q196_scene_cuts,
        q197_audio_vad,
    )

    texts = [
        "",
        " ",
        "a",
        "é ü ß 中文 🦆" * 3,
        "x\x00y " * 40,
        "z" * 100_000,
        "normal prose with several tokens in it " * 4,
        "  \t\n  ",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "source": ["fuzz"] * len(texts),
                "lang": ["xx"] * len(texts),
                "n_chars": [len(t) for t in texts],
            },
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("source", pa.string()),
                    ("lang", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
        ),
        tmp_path / "documents.parquet",
    )
    sf = str(tmp_path)

    vad = q197_audio_vad(spark, sf).collect()
    assert vad, "the monster and prose docs have full windows"
    for r in vad:
        assert r.n_windows >= 1
        assert 0 <= r.voiced_windows <= r.n_windows
        assert 0 <= r.voiced_ppm <= 1_000_000
    # the 100 KB single-char doc: zero byte-variance windows, all below
    # threshold ('z' = 122 -> 122^2*64 = 952576 > 610k: actually voiced)
    monster = next(r for r in vad if r.doc_id == 5)
    assert monster.n_windows == 100_000 // 64
    assert monster.n_segments <= 1

    cuts = q196_scene_cuts(spark, sf).collect()
    for r in cuts:
        assert 0 <= r.n_cuts <= 7

    pairs = q194_phash_neardup(spark, sf).collect()
    for r in pairs:
        assert 0 <= r.hamming <= 6


def test_q197_segmentation_law_on_constructed_patterns(spark, tmp_path):
    """Property pin: clips CONSTRUCTED from 64-byte blocks of known
    class — 'the' + spaces (voiced prose: mixed-letter windows) vs
    all-spaces (silent) — must segment exactly per the pattern: one
    (doc per pattern) DataFrame, 40 random patterns, one Spark job."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis_logs_reader_spark.operators.multimodal import q197_audio_vad

    rng = random.Random(1197)
    VOICED = "thequickbrownfox" * 4  # exactly 64 letter bytes
    SILENT = " " * 64
    assert len(VOICED) == 64 and len(SILENT) == 64
    assert sum(ord(c) ** 2 for c in VOICED) >= 610_000
    assert sum(ord(c) ** 2 for c in SILENT) < 610_000

    patterns = []
    for _ in range(40):
        patterns.append([rng.random() < 0.6 for _ in range(rng.randint(1, 12))])
    texts = ["".join(VOICED if v else SILENT for v in pat) for pat in patterns]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "source": ["pat"] * len(texts),
                "lang": ["xx"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = {
        r.doc_id: (r.n_windows, r.voiced_windows, r.n_segments, r.longest_silence)
        for r in q197_audio_vad(spark, str(tmp_path)).collect()
    }
    for i, pat in enumerate(patterns):
        runs = []
        for v in pat:
            if runs and runs[-1][0] == v:
                runs[-1][1] += 1
            else:
                runs.append([v, 1])
        want = (
            len(pat),
            sum(pat),
            sum(1 for v, _n in runs if v),
            max((n for v, n in runs if not v), default=0),
        )
        assert got[i] == want, (i, pat, got[i], want)


def test_q198_collapsed_and_separated_clusters(spark, tmp_path):
    """Geometric pin: a label whose vectors are all IDENTICAL must
    report dispersion exactly 0; two labels planted far apart and one
    near the first must resolve nearest_label by actual distance, with
    the exact integer d2 of the constructed grid offsets."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis_logs_reader_spark.operators.similarity import (
        q198_embedding_dispersion,
    )

    dim = 8
    base = [0.5] * dim          # grid 512 per dim
    near = [0.5 + 10.0 / 1024] * dim   # +10 grid steps -> d2 = 8*100
    far = [100.0] * dim         # grid 102400 per dim
    rows, labels = [], []
    for _ in range(5):
        rows.append(base); labels.append(0)      # collapsed cluster
    for _ in range(4):
        rows.append(near); labels.append(1)      # collapsed, near 0
    for _ in range(3):
        rows.append(far); labels.append(2)       # collapsed, far away
    pq.write_table(
        pa.table(
            {
                "vec_id": list(range(len(rows))),
                "embedding": pa.array(rows, type=pa.list_(pa.float32())),
                "label": pa.array(labels, type=pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    got = {
        r.label: (r.n_vecs, r.dispersion_milli, r.nearest_label, r.nearest_d2)
        for r in q198_embedding_dispersion(spark, str(tmp_path)).collect()
    }
    assert got[0] == (5, 0, 1, 8 * 10 * 10)
    assert got[1] == (4, 0, 0, 8 * 10 * 10)
    assert got[2][0:2] == (3, 0)
    assert got[2][2] == 1  # far cluster's nearest is the closer of 0/1
