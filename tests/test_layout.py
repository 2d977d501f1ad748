"""Storage layout: partition pruning must reach the scan, and
compaction must reduce file counts without changing data."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kinesis_logs_reader_spark.plans import explain
from kinesis_logs_reader_spark.sources import layout
from kinesis_logs_reader_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def test_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "orders_by_year")
    layout.write_partitioned(
        load_table(spark, SF_DIR, "orders"),
        out,
        derive={"o_year": F.year("o_orderdate")},
    )
    # hive-style dirs exist
    assert glob.glob(out + "/o_year=*")

    df = spark.read.parquet(out).filter(F.col("o_year") == 1997)
    plan = explain.formatted_plan(df)
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1][:200]

    want = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .count()
    )
    assert df.count() == want > 0


def test_compaction(spark, tmp_path):
    out = str(tmp_path / "fragmented")
    src = load_table(spark, SF_DIR, "orders")
    src.repartition(37).write.mode("overwrite").parquet(out)
    assert len(glob.glob(out + "/part-*.parquet")) == 37

    n = layout.compact(spark, out, target_files=4)
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) <= 4
    assert spark.read.parquet(out).count() == n == src.count()


def test_zorder_write_prunes_2d_boxes(spark, tmp_path):
    """Z-order clustering: for a 2-D box predicate, far fewer files'
    min/max footer ranges intersect the box than with an unclustered
    layout — the data-skipping win the curve exists for."""
    import pyarrow.parquet as pq

    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.dayofyear("ts")
    )
    zpath = str(tmp_path / "z")
    ppath = str(tmp_path / "plain")
    layout.zorder_write(events, zpath, F.col("user_id"), F.col("day"), n_files=8)
    events.repartition(8).write.parquet(ppath)

    def candidate_files(path, box):
        (ulo, uhi), (dlo, dhi) = box
        n_total, n_hit = 0, 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            umin = umax = dmin = dmax = None
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    st = col.statistics
                    if st is None:
                        continue
                    name = col.path_in_schema
                    if name == "user_id":
                        umin = st.min if umin is None else min(umin, st.min)
                        umax = st.max if umax is None else max(umax, st.max)
                    elif name == "day":
                        dmin = st.min if dmin is None else min(dmin, st.min)
                        dmax = st.max if dmax is None else max(dmax, st.max)
            n_total += 1
            if umin is not None and not (umax < ulo or umin > uhi or dmax < dlo or dmin > dhi):
                n_hit += 1
        return n_hit, n_total

    box = ((10, 30), (5, 12))
    z_hit, z_total = candidate_files(zpath, box)
    p_hit, p_total = candidate_files(ppath, box)
    assert p_hit == p_total, "unclustered layout cannot skip anything"
    assert z_hit < p_hit, "z-order must reduce candidate files for a 2-D box"


def test_write_training_shards_order_and_audit(spark, tmp_path):
    """The materialized shard files carry the q161 permutation: one
    file per (epoch, shard) hive leaf, in-file rows in training order
    (pos == 1..n in physical sequence), and the position-weighted
    checksum of the FILE BYTES equals the q161 audit row — the audit
    certifies exactly what the writer shipped."""
    import pyarrow.parquet as pq

    from kinesis_logs_reader_spark.operators.preprocess import (
        q161_epoch_shuffle,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    path = str(tmp_path / "shards")
    layout.write_training_shards(docs, path, epochs=2, n_shards=8)

    audit = {
        (r.epoch, r.shard): r
        for r in q161_epoch_shuffle(spark, SF_DIR).collect()
    }
    leaves = sorted(glob.glob(os.path.join(path, "epoch=*", "shard=*")))
    assert len(leaves) == 16
    for leaf in leaves:
        epoch = int(leaf.split("epoch=")[1].split(os.sep)[0])
        shard = int(leaf.split("shard=")[1])
        files = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
        assert len(files) == 1, f"{leaf}: one sorted file per shard"
        tbl = pq.read_table(os.path.join(leaf, files[0]))
        pos = tbl.column("pos").to_pylist()
        ids = tbl.column("doc_id").to_pylist()
        assert pos == list(range(1, len(pos) + 1)), "file order IS training order"
        row = audit[(epoch, shard)]
        assert row.n_docs == len(ids)
        assert row.perm_checksum == sum(p * d for p, d in zip(pos, ids))
        assert row.first_doc == ids[0]
