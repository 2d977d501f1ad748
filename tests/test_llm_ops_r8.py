"""Semantic tests for the round-7 operators (q161, q162) — invariants
the SQL oracle's value hash cannot express: epoch-order independence
and reproducibility of the training shuffle, and the planted-dirty
guarantee of the graded containment verdicts.
"""

from __future__ import annotations

from kinesis_logs_reader_spark.operators import dedup, preprocess

from tests.conftest import SF_DIR


def test_q161_shuffle_shape_and_balance(spark):
    rows = preprocess.q161_epoch_shuffle(spark, SF_DIR).collect()
    assert len(rows) == 16  # 2 epochs x 8 shards
    by_epoch: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.shard <= 7 and r.n_docs > 0 and r.first_doc is not None
        by_epoch.setdefault(r.epoch, []).append(r)
    # every document lands in exactly one shard per epoch
    totals = {e: sum(r.n_docs for r in rs) for e, rs in by_epoch.items()}
    assert totals[0] == totals[1]
    # md5 sharding is balanced: no shard more than 2x the mean
    mean = totals[0] / 8
    for r in rows:
        assert r.n_docs < 2 * mean


def test_q161_epochs_are_distinct_permutations(spark):
    rows = preprocess.q161_epoch_shuffle(spark, SF_DIR).collect()
    ck = {(r.epoch, r.shard): r.perm_checksum for r in rows}
    # a different epoch must produce a different order: if every shard's
    # position-weighted checksum matched, the permutations would be
    # (shard-wise) identical — astronomically unlikely by construction
    assert any(ck[(0, s)] != ck.get((1, s)) for s in range(8))


def test_q161_reproducible(spark):
    a = {tuple(r) for r in preprocess.q161_epoch_shuffle(spark, SF_DIR).collect()}
    b = {tuple(r) for r in preprocess.q161_epoch_shuffle(spark, SF_DIR).collect()}
    assert a == b


def test_q162_planted_docs_are_dirty(spark):
    rows = dedup.q162_eval_containment(spark, SF_DIR).collect()
    planted = [r for r in rows if r.doc_id >= 5_000_000]
    natural = [r for r in rows if r.doc_id < 5_000_000]
    assert planted, "eval slice must be non-empty at every SF"
    assert natural, "natural train slice must be non-empty"
    for r in planted:
        # a 2/3-prefix truncation's shingles are a subset of the
        # original eval doc's shingles -> containment 1.0
        assert r.verdict == "dirty" and r.containment >= 0.999


def test_q162_verdict_matches_thresholds(spark):
    for r in dedup.q162_eval_containment(spark, SF_DIR).collect():
        assert 0 <= r.n_hit <= r.n_sh
        if r.containment >= 0.5:
            want = "dirty"
        elif r.containment >= 0.2:
            want = "suspect"
        else:
            want = "clean"
        assert r.verdict == want


def test_srp_plane_derivations_agree():
    """oracle.py inlines its own ±1 plane generator so it can build SQL
    literals without importing the operator module — pin the two."""
    from kinesis_logs_reader_spark import oracle
    from kinesis_logs_reader_spark.operators import similarity

    for j in range(16):
        assert oracle._srp_plane(j) == similarity._srp_plane(j)


def test_q163_recall_and_precision_vs_exact(spark):
    """q163 (SRP-banded) vs q50 (broadcast-BLAS exact all-pairs):
    - precision is exact by construction (candidates pass the same
      cosine >= 0.99 filter), so q163 ⊆ q50;
    - the 10 planted exact-copy pairs MUST all be recalled (identical
      vectors agree on every sign bit -> every band collides);
    - on this corpus recall is in fact 100% (no near-0.99 natural pair
      falls in the ~0.08% band-miss tail)."""
    from kinesis_logs_reader_spark.operators import similarity

    banded = {
        (r.ida, r.idb) for r in similarity.q163_srp_banded_pairs(spark, SF_DIR).collect()
    }
    exact = {
        (r.ida, r.idb) for r in similarity.q50_cosine_dup_pairs(spark, SF_DIR).collect()
    }
    assert banded <= exact
    planted = {(i, i + 1000000) for i in range(10)}
    assert planted <= banded
    assert banded == exact


def test_q164_no_cluster_straddles_splits(spark):
    """The defining invariant: every dup cluster lands wholly inside
    one split (leakage-free BY CONSTRUCTION), while the naive q77
    doc-hash assignment demonstrably splits at least one planted
    cluster on this corpus — i.e. the operator changes something."""
    from kinesis_logs_reader_spark.operators.dedup import (
        cluster_safe_assignment,
    )

    rows = cluster_safe_assignment(spark, SF_DIR).collect()
    by_cluster: dict[int, set] = {}
    naive_by_cluster: dict[int, set] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
        naive_by_cluster.setdefault(r.cluster_id, set()).add(r.naive_split)
    assert all(len(s) == 1 for s in by_cluster.values())
    assert any(len(s) > 1 for s in naive_by_cluster.values())
    # singletons (cluster == own id) hash identically under both keys
    for r in rows:
        if r.cluster_id == r.doc_id and r.doc_id < 1000000:
            # planted copies (>= 1000000) are never singletons; a
            # natural doc that is its own representative keeps q77's
            # assignment
            assert r.split == r.naive_split


def test_q164_aggregate_consistency(spark):
    """The q164 aggregate must tie out against the per-doc frame: doc
    and cluster counts per split, and n_rerouted = docs whose naive
    split differs."""
    from kinesis_logs_reader_spark.operators.dedup import (
        cluster_safe_assignment,
        q164_cluster_safe_split,
    )

    rows = cluster_safe_assignment(spark, SF_DIR).collect()
    agg = {r.split: r for r in q164_cluster_safe_split(spark, SF_DIR).collect()}
    assert set(agg) == {"train", "val", "test"}
    for split, a in agg.items():
        docs = [r for r in rows if r.split == split]
        assert a.n_docs == len(docs)
        assert a.n_clusters == len({r.cluster_id for r in docs})
        assert a.n_rerouted == sum(1 for r in docs if r.naive_split != r.split)
    assert sum(a.n_rerouted for a in agg.values()) > 0


def test_q165_planted_positive_excluded(spark):
    """The planted exact copy (query_id + 1000000) is the lexically
    closest doc by construction; the MinHash anti-join must drop it —
    it is the positive, not a hard negative."""
    from kinesis_logs_reader_spark.operators.curation import q165_hard_negatives

    rows = q165_hard_negatives(spark, SF_DIR).collect()
    assert rows, "hard-negative mining must be non-empty at every SF"
    for r in rows:
        assert r.neg_id != r.query_id + 1_000_000
        assert r.neg_id != r.query_id


def test_q165_topk_shape_and_ordering(spark):
    from kinesis_logs_reader_spark.operators.curation import q165_hard_negatives

    rows = q165_hard_negatives(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert qid < 20
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        # scores non-increasing in rank (ties broken by neg_id asc)
        for a, b in zip(rs, rs[1:]):
            assert a.score > b.score or (
                a.score == b.score and a.neg_id < b.neg_id
            )


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple]:
    """Reference BPE trainer: same semantics as curation.q166_bpe_train
    (argmax pair by count desc then lexicographic; greedy left-to-right
    non-overlapping application), in plain Python."""
    streams = [t.split(" ") for t in texts]
    log = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple, int] = {}
        for s in streams:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = l + " " + r
        new_streams = []
        for s in streams:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new_streams.append(out)
        streams = new_streams
        log.append((step, l, r, c, sum(len(s) for s in streams)))
    return log


def test_q166_matches_python_reference(spark):
    """The distributed window-stack rewrite must reproduce the exact
    sequential greedy trajectory, including overlapping-run parity
    (left==right chains)."""
    from kinesis_logs_reader_spark.operators.curation import q166_bpe_train
    from kinesis_logs_reader_spark.sources.tables import load_table

    texts = [
        r["text"]
        for r in load_table(spark, SF_DIR, "documents").select("text").collect()
    ]
    expected = _py_bpe(texts, 8)
    got = [
        (r.step, r.left, r.right, r.pair_count, r.tokens_after)
        for r in q166_bpe_train(spark, SF_DIR).orderBy("step").collect()
    ]
    assert got == expected


def test_q166_overlapping_run_parity():
    """Pin the greedy rule itself: 'a a a a a' under merge (a,a) must
    become ['a a', 'a a', 'a'] — positions 0,2 merge, 4 survives."""
    log = _py_bpe(["a a a a a"], 1)
    assert log == [(1, "a", "a", 4, 3)]


def test_q166_spark_overlap_branch(spark, tmp_path):
    """Drive the DISTRIBUTED rewrite through the left==right chain
    branch: a crafted corpus whose first merge is (a,a) with
    overlapping runs, compared against the sequential reference."""
    import pandas as pd

    from kinesis_logs_reader_spark.operators.curation import q166_bpe_train

    texts = ["a a a a a", "a a a b a a", "b a a a a c", "c b c b c"]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    sf = str(tmp_path / "bpe")
    (tmp_path / "bpe").mkdir()
    pdf.to_parquet(sf + "/documents.parquet")
    got = [
        (r.step, r.left, r.right, r.pair_count, r.tokens_after)
        for r in q166_bpe_train(spark, sf, n_merges=3).orderBy("step").collect()
    ]
    assert got == _py_bpe(texts, 3)
    assert got[0][1] == got[0][2] == "a"  # first merge IS the chain case


def test_q167_monotone_in_nprobe(spark):
    """Growing the probe budget grows the candidate set, and a
    candidate that displaces a true hit from the approx top-10 must
    rank above it globally (so it is itself a true hit): n_cand and
    n_hit are both non-decreasing in nprobe, per query."""
    from kinesis_logs_reader_spark.operators.similarity import q167_ann_recall

    rows = q167_ann_recall(spark, SF_DIR).collect()
    by_q: dict[int, dict[int, tuple]] = {}
    for r in rows:
        assert 0 <= r.n_hit <= 10 and abs(r.recall - r.n_hit / 10.0) < 1e-9
        by_q.setdefault(r.query_id, {})[r.nprobe] = (r.n_cand, r.n_hit)
    assert len(by_q) == 8
    for qid, curve in by_q.items():
        assert sorted(curve) == [1, 2, 4]
        for lo, hi in [(1, 2), (2, 4)]:
            assert curve[lo][0] <= curve[hi][0], (qid, curve)
            assert curve[lo][1] <= curve[hi][1], (qid, curve)


def test_q168_is_a_partial_matching(spark):
    """Mutual-NN output must be a one-to-one partial matching between
    the two sides: reciprocal best matches can't share endpoints."""
    from kinesis_logs_reader_spark.operators.similarity import q168_mutual_nn

    rows = q168_mutual_nn(spark, SF_DIR).collect()
    assert rows, "mutual pairs must exist at every SF"
    a_side = [r.a_id for r in rows]
    b_side = [r.b_id for r in rows]
    assert len(set(a_side)) == len(a_side)
    assert len(set(b_side)) == len(b_side)
    for r in rows:
        assert r.a_id % 2 == 0 and r.b_id % 2 == 1
        assert r.margin >= 0.0, "best minus second-best cannot be negative"
        assert -1.0001 <= r.sim <= 1.0001


def test_q169_ties_out_with_q166(spark):
    """Encoding with the learned table must land exactly on the
    trainer's final stream length, and no source can be expanded by
    a merge-only rewrite."""
    from kinesis_logs_reader_spark.operators.curation import (
        q166_bpe_train,
        q169_bpe_encode,
    )

    enc = q169_bpe_encode(spark, SF_DIR).collect()
    traj = q166_bpe_train(spark, SF_DIR).collect()
    assert sum(r.tokens_after for r in enc) == traj[-1].tokens_after
    for r in enc:
        assert r.tokens_after <= r.tokens_before
        assert r.compression_ppm <= 1_000_000


def test_q170_capacity_and_contiguity(spark):
    """Next-fit invariants: a bin exceeds capacity only when it holds
    exactly one (oversize) doc; bins are numbered contiguously from 0
    within each (lang, bucket) group; fill is exact integer ppm."""
    from kinesis_logs_reader_spark.operators.curation import q170_pack_nextfit

    rows = q170_pack_nextfit(spark, SF_DIR).collect()
    assert rows
    groups: dict[tuple, list] = {}
    for r in rows:
        assert r.tokens <= 256 or r.n_docs == 1
        assert r.fill_ppm == r.tokens * 1_000_000 // 256
        groups.setdefault((r.lang, r.bucket), []).append(r.bin)
    for key, bins in groups.items():
        assert sorted(bins) == list(range(len(bins))), key


def test_q170_packs_every_doc(spark):
    from kinesis_logs_reader_spark.operators.curation import q170_pack_nextfit
    from kinesis_logs_reader_spark.sources.tables import load_table

    rows = q170_pack_nextfit(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == docs


def test_q171_ci_brackets_the_mean_sanely(spark):
    """Bootstrap invariants: lo <= hi; the full-sample mean lies inside
    (or at worst at) the replica-mean envelope; replicas are genuine
    half-samples (mean within a sane band of the point estimate)."""
    from kinesis_logs_reader_spark.operators.textstats import q171_bootstrap_ci

    rows = q171_bootstrap_ci(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.lo_ppm <= r.hi_ppm
        # the [5th, 95th] replica envelope should cover the full-sample
        # mean for a half-sample bootstrap of any non-degenerate source
        assert r.lo_ppm <= r.mean_ppm <= r.hi_ppm or r.n_docs < 8
        assert r.n_docs > 0 and r.mean_ppm > 0


def test_q172_conservation_and_monotonicity(spark):
    """Novelty-curve invariants: n_new <= n_docs per decile; cumulative
    distinct is the running sum and ends at the corpus's distinct
    normal-form count; repeats exist (the corpus plants bag-of-words
    collisions)."""
    from kinesis_logs_reader_spark.operators.dedup import q172_novelty_curve
    from kinesis_logs_reader_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = q172_novelty_curve(spark, SF_DIR).collect()
    assert [r.decile for r in rows] == sorted(r.decile for r in rows)
    run = 0
    for r in rows:
        assert 0 <= r.n_new <= r.n_docs
        run += r.n_new
        assert r.cum_distinct == run
    docs = load_table(spark, SF_DIR, "documents")
    n_distinct = docs.select(
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(F.split("text", " ")))
            )
        ).alias("k")
    ).distinct().count()
    assert rows[-1].cum_distinct == n_distinct
    assert sum(r.n_docs for r in rows) == docs.count()


def test_q173_ffill_semantics(spark):
    """Gap-fill invariants: 720 slots per user; series are NULL until
    the user's first purchase, then never NULL again; every filled
    value is a real purchase value of THAT user at-or-before the
    slot."""
    from kinesis_logs_reader_spark.operators.asof import q173_resample_ffill
    from kinesis_logs_reader_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = q173_resample_ffill(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    ev = (
        load_table(spark, SF_DIR, "events")
        .filter((F.col("user_id") < 10) & (F.col("event_type") == "purchase"))
        .select("user_id", "ts", "value")
        .collect()
    )
    purchases: dict[int, list] = {}
    for e in ev:
        purchases.setdefault(e.user_id, []).append((e.ts, e.value))
    for uid, series in by_user.items():
        series.sort(key=lambda r: r.slot_ts)
        assert len(series) == 720
        seen_value = False
        for r in series:
            if r.val is not None:
                seen_value = True
                assert any(
                    ts <= r.slot_ts and v == r.val
                    for ts, v in purchases.get(uid, [])
                )
            else:
                assert not seen_value, "NULL after first fill = broken ffill"


def test_q174_hop_counts_are_monotone_and_rooted(spark):
    """Reachability invariants: 1 <= n_d1 <= n_d2 <= n_d3 (the seed
    itself counts at depth 0, so every count is >= 1); a seed with an
    edge must reach at least one other node at depth 1."""
    from kinesis_logs_reader_spark.operators.dedup import q174_reachability_cte

    rows = q174_reachability_cte(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 1 <= r.n_d1 <= r.n_d2 <= r.n_d3
        # seeds come FROM the edge set, so depth-1 must add a neighbor
        assert r.n_d1 >= 2


def test_q175_frame_accounting(spark):
    """Every clip contributes exactly 8 frames; distinct <= total;
    dup rate is exact integer ppm; duplicates exist corpus-wide (the
    31-token vocabulary guarantees window collisions)."""
    from kinesis_logs_reader_spark.operators.multimodal import q175_frame_dedup
    from kinesis_logs_reader_spark.sources.tables import load_table

    rows = q175_frame_dedup(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_frames for r in rows) == 8 * n_docs
    for r in rows:
        assert 0 < r.n_distinct <= r.n_frames
        assert r.dup_ppm == (r.n_frames - r.n_distinct) * 1_000_000 // r.n_frames


def test_q176_consistent_with_q167(spark):
    """Ranking metrics must agree with the recall surface: a (query,
    nprobe) with zero recall has zero DCG/MRR; a nonzero recall implies
    a first hit and positive NDCG; perfect NDCG (1e6 ppm) iff the
    approx list IS the exact list, which implies recall 1.0; and NDCG
    is monotone in nprobe (the superset-displacement argument)."""
    from kinesis_logs_reader_spark.operators.similarity import (
        q167_ann_recall,
        q176_ann_ranking_quality,
    )

    recall = {
        (r.query_id, r.nprobe): r.n_hit
        for r in q167_ann_recall(spark, SF_DIR).collect()
    }
    rows = q176_ann_ranking_quality(spark, SF_DIR).collect()
    assert len(rows) == len(recall) == 24
    by_q: dict[int, dict[int, int]] = {}
    for r in rows:
        hits = recall[(r.query_id, r.nprobe)]
        assert 0 <= r.ndcg_ppm <= 1_000_000
        if hits == 0:
            assert r.dcg_u == 0 and r.rr_ppm == 0 and r.ndcg_ppm == 0
        else:
            assert r.dcg_u > 0 and r.rr_ppm > 0 and r.ndcg_ppm > 0
        if r.ndcg_ppm == 1_000_000:
            assert hits == 10
        by_q.setdefault(r.query_id, {})[r.nprobe] = r.ndcg_ppm
    for qid, curve in by_q.items():
        assert curve[1] <= curve[2] <= curve[4], (qid, curve)


def test_q166_randomized_chain_stress(spark, tmp_path):
    """Seeded random corpora over a 3-token alphabet produce long
    left==right chains and merged-symbol re-merges ('a a' + 'a a');
    the distributed rewrite must track the sequential reference
    through 5 merge generations."""
    import random

    import pandas as pd

    from kinesis_logs_reader_spark.operators.curation import q166_bpe_train

    rng = random.Random(20260815)
    texts = [
        " ".join(rng.choice("a a a b c".split()) for _ in range(rng.randint(1, 40)))
        for _ in range(30)
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    sf = str(tmp_path / "stress")
    (tmp_path / "stress").mkdir()
    pdf.to_parquet(sf + "/documents.parquet")
    got = [
        (r.step, r.left, r.right, r.pair_count, r.tokens_after)
        for r in q166_bpe_train(spark, sf, n_merges=5).orderBy("step").collect()
    ]
    assert got == _py_bpe(texts, 5)


def test_q177_token_conservation(spark):
    """kept + dropped tokens == corpus tokens; dropped windows exist
    (the corpus has repetition-heavy spans); drop_ppm is exact."""
    from kinesis_logs_reader_spark.operators.curation import (
        q177_span_quality_prune,
    )
    from kinesis_logs_reader_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = q177_span_quality_prune(spark, SF_DIR).collect()
    total = (
        load_table(spark, SF_DIR, "documents")
        .select(F.sum(F.size(F.split("text", " "))).alias("s"))
        .collect()[0]["s"]
    )
    assert sum(r.tokens_kept + r.tokens_dropped for r in rows) == total
    assert sum(r.n_dropped for r in rows) > 0
    for r in rows:
        assert 0 <= r.n_dropped <= r.n_windows
        assert r.drop_ppm == r.tokens_dropped * 1_000_000 // (
            r.tokens_kept + r.tokens_dropped
        )


def test_q178_grid_shape(spark):
    """Every cell yields min(2, n_cell) docs, deciles are 0..9, and no
    doc repeats across the manifest."""
    from kinesis_logs_reader_spark.operators.curation import (
        q178_stratified_eval_sample,
    )

    rows = q178_stratified_eval_sample(spark, SF_DIR).collect()
    assert rows
    cells: dict[tuple, list] = {}
    for r in rows:
        assert 0 <= r.difficulty_decile <= 9
        assert r.rank in (1, 2)
        cells.setdefault((r.len_bucket, r.difficulty_decile), []).append(r)
    for key, rs in cells.items():
        assert len(rs) == min(2, rs[0].n_cell), key
    ids = [r.doc_id for r in rows]
    assert len(set(ids)) == len(ids)


def test_q179_card_ties_out(spark):
    """The datasheet must reconcile with its inputs: doc/token totals
    match the corpus, dup_ppm matches the q172 normal-form family, and
    purity is a valid share."""
    from kinesis_logs_reader_spark.operators.curation import q179_data_card
    from kinesis_logs_reader_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = q179_data_card(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert sum(r.tokens for r in rows) == docs.select(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]
    for r in rows:
        assert 0 <= r.dup_ppm < 1_000_000
        assert 0 < r.lang_purity_ppm <= 1_000_000
        assert r.mean_len_ppm == r.tokens * 1_000_000 // r.n_docs


def test_q180_budget_respected(spark):
    """Context packing invariants: every context fits the 192-token
    budget; included + skipped == retrieved; greedy means a skipped
    doc would NOT have fit at its turn (so context_tokens > 0 whenever
    anything was retrievable under budget)."""
    from kinesis_logs_reader_spark.operators.similarity import (
        q180_rag_context_assembly,
    )

    rows = q180_rag_context_assembly(spark, SF_DIR).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.context_tokens <= 192
        assert r.n_included + r.n_skipped == r.n_retrieved
        assert r.fill_ppm == r.context_tokens * 1_000_000 // 192
        assert 0 <= r.n_included <= 4


def test_q181_reconciles_both_sides(spark):
    """The audit must tie out against its two inputs: split doc counts
    match q164's aggregate, and sampled counts sum to the manifest
    size (every sampled doc has a split — natural docs only)."""
    from kinesis_logs_reader_spark.operators.curation import (
        q178_stratified_eval_sample,
    )
    from kinesis_logs_reader_spark.operators.dedup import (
        q164_cluster_safe_split,
        q181_eval_sample_audit,
    )

    rows = q181_eval_sample_audit(spark, SF_DIR).collect()
    agg = {r.split: r.n_docs for r in q164_cluster_safe_split(spark, SF_DIR).collect()}
    manifest = q178_stratified_eval_sample(spark, SF_DIR).count()
    assert {r.split: r.n_split_docs for r in rows} == agg
    assert sum(r.n_sampled for r in rows) == manifest
    for r in rows:
        assert r.sampled_ppm == r.n_sampled * 1_000_000 // r.n_split_docs


def test_q182_attribution_conserves_purchases(spark):
    """Channels partition the purchases exactly; 'direct' exists (some
    purchase has no 24h-prior touch at every SF is NOT guaranteed, so
    assert the weaker conservation + channel-domain contract);
    revenue is non-negative and shares sum to ~1e6."""
    from kinesis_logs_reader_spark.operators.asof import (
        q182_last_touch_attribution,
    )
    from kinesis_logs_reader_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = q182_last_touch_attribution(spark, SF_DIR).collect()
    n_purch = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r.n_purchases for r in rows) == n_purch
    assert {r.channel for r in rows} <= {"click", "view", "direct"}
    share = sum(r.share_ppm for r in rows)
    assert 1_000_000 - len(rows) <= share <= 1_000_000  # int DIV rounding
    for r in rows:
        assert r.revenue >= 0.0


def test_broadcast_slice_cap_is_structural(spark, monkeypatch):
    """VERDICT r8 item 5: the bounded-slice contract on every
    driver-collected broadcast matrix must be enforced in code, not
    prose. With the cap patched tiny, both cosine_pairs_blas and
    q168's _mutual_best2 collect site must fail loud instead of
    broadcasting an unbounded side."""
    import pytest

    from kinesis_logs_reader_spark.operators import similarity

    monkeypatch.setattr(similarity, "MAX_BROADCAST_ROWS", 10)
    # q168 session-caches its best-2 frame; a warm cache from an earlier
    # test would skip the capped collect entirely — drop it so this test
    # exercises the enforcement path regardless of suite order.
    for df in spark.__dict__.pop("_klrs_mutual_nn_cache", {}).values():
        df.unpersist()

    vecs = similarity.load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    with pytest.raises(ValueError, match="exceeds 10 rows"):
        similarity.cosine_pairs_blas(spark, vecs, threshold=0.99)
    with pytest.raises(ValueError, match="exceeds 10 rows"):
        similarity.q168_mutual_nn(spark, SF_DIR).collect()
