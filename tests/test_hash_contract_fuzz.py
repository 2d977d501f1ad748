"""Adversarial cross-engine check of the shared text-hash contract.

The MinHash/digest family's correctness rests on Spark and DuckDB
computing IDENTICAL values for md5(text), the per-token base hashes,
and the LSH band digests. The fixture corpus is single-space
tokenized; this test feeds both engines a deliberately nasty corpus
(empty strings, runs of spaces, leading/trailing space, tabs/newlines,
unicode incl. multi-byte and emoji, long repeats) written to one
parquet file, and asserts the engines agree — so the documented
"single-space tokenization" precondition is measured, not assumed, and
any engine-boundary divergence (split semantics, UTF-8 hashing,
empty-token handling) surfaces here first.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kinesis_logs_reader_spark.functions.text import (
    token_base_hashes,
    token_shingle_hashes,
)

NASTY = [
    "",
    " ",
    "   ",
    "a",
    "a b c",
    " a b c",
    "a b c ",
    "a  b",
    "a\tb c",
    "a\nb c",
    "é ü ß",
    "中文 文本 数据",
    "🦆 🦆 🦆 dedup",
    "x " * 50 + "x",
    "same same same same",
    "Mixed CASE Tokens Mixed",
    "punct, tok; tok! tok?",
    "0 00 000 0000",
]


@pytest.fixture(scope="module")
def nasty_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("fuzz") / "docs.parquet"
    pq.write_table(
        pa.table(
            {"doc_id": list(range(len(NASTY))), "text": NASTY},
            schema=pa.schema(
                [("doc_id", pa.int64()), ("text", pa.string())]
            ),
        ),
        p,
    )
    return str(p)


def test_md5_exact_digest_agrees(spark, nasty_path):
    s = {
        (r["doc_id"], r["h"])
        for r in spark.read.parquet(nasty_path)
        .select("doc_id", F.md5("text").alias("h"))
        .collect()
    }
    d = set(
        duckdb.sql(
            f"SELECT doc_id, md5(text) FROM read_parquet('{nasty_path}')"
        ).fetchall()
    )
    assert s == d


def test_token_base_hashes_agree(spark, nasty_path):
    s = {
        (r["doc_id"], tuple(r["tb"]))
        for r in spark.read.parquet(nasty_path)
        .select("doc_id", token_base_hashes().alias("tb"))
        .collect()
    }
    d = {
        (i, tuple(tb))
        for i, tb in duckdb.sql(
            "SELECT doc_id, list_transform(str_split(text, ' '), "
            "t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % 2147483647)"
            f" FROM read_parquet('{nasty_path}')"
        ).fetchall()
    }
    assert s == d


def test_band_digests_agree(spark, nasty_path):
    from kinesis_logs_reader_spark.functions.text import (
        band_hashes,
        minhash_signature,
    )
    from kinesis_logs_reader_spark.oracle import _MH

    docs = spark.read.parquet(nasty_path)
    tok = docs.select("doc_id", token_base_hashes().alias("tb"))
    based = tok.select(
        "doc_id", token_shingle_hashes(F.col("tb")).alias("bases")
    )
    sig = based.select(
        "doc_id", *minhash_signature(F.col("bases"), num_hashes=8)
    )
    banded = sig.select("doc_id", *band_hashes(num_hashes=8, rows_per_band=2))
    s = {
        (r["doc_id"], r["band0"], r["band1"], r["band2"], r["band3"])
        for r in banded.collect()
    }
    d = set(
        duckdb.sql(
            f"""
WITH tok AS (
  SELECT doc_id,
         list_transform(str_split(text, ' '),
           t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % 2147483647) AS tb
  FROM read_parquet('{nasty_path}')
), based AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(0, len(tb) - 2)),
           i -> ((tb[i] * 912367891) % 2147483647
               + (tb[i+1] * 1500450271) % 2147483647
               + (tb[i+2] * 2038074743) % 2147483647) % 2147483647)) AS bases
  FROM tok
), sigs AS (
  SELECT doc_id,
         list_aggregate({_MH.format(a=1103515245, b=12345)}, 'min') AS mh0,
         list_aggregate({_MH.format(a=1299709, b=987654321)}, 'min') AS mh1,
         list_aggregate({_MH.format(a=7368787, b=11939)}, 'min') AS mh2,
         list_aggregate({_MH.format(a=104729, b=7919)}, 'min') AS mh3,
         list_aggregate({_MH.format(a=179424673, b=104659)}, 'min') AS mh4,
         list_aggregate({_MH.format(a=15485863, b=15487469)}, 'min') AS mh5,
         list_aggregate({_MH.format(a=32452843, b=982451653)}, 'min') AS mh6,
         list_aggregate({_MH.format(a=49979687, b=86028121)}, 'min') AS mh7
  FROM based
)
SELECT doc_id, md5(mh0 || '|' || mh1), md5(mh2 || '|' || mh3),
       md5(mh4 || '|' || mh5), md5(mh6 || '|' || mh7)
FROM sigs
"""
        ).fetchall()
    )
    assert s == d
