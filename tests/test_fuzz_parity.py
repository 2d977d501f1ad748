"""Fuzzed cross-engine parity: hypothesis generates random predicate
trees over lineitem; Spark and DuckDB must agree on the surviving
row-set (count + key multiset) for every generated query.

This generalizes the hand-written q01-q67 oracle gate the way
sqllogictest generalizes unit tests: the grammar covers comparisons on
numeric/string/timestamp columns, IN lists, BETWEEN, LIKE prefixes,
and AND/OR/NOT composition.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kinesis_logs_reader_spark.sources.tables import load_table

from tests.conftest import SF_DIR

# --- predicate grammar (renders to a dialect-common SQL string) -----------

_NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_STR_COLS = [("l_returnflag", ["A", "N", "R"]), ("l_linestatus", ["F", "O"])]

_num_leaf = st.builds(
    lambda c, op, v: f"({c} {op} {v})",
    st.sampled_from(_NUM_COLS),
    st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]),
    st.integers(min_value=0, max_value=60),
)
_between_leaf = st.builds(
    lambda c, lo, hi: f"({c} BETWEEN {min(lo, hi)} AND {max(lo, hi)})",
    st.sampled_from(["l_quantity", "l_linenumber"]),
    st.integers(min_value=0, max_value=50),
    st.integers(min_value=0, max_value=50),
)
_str_leaf = st.builds(
    lambda cv, vals: f"({cv[0]} IN ({', '.join(repr(v) for v in vals)}))",
    st.sampled_from(_STR_COLS),
    st.lists(st.sampled_from(["A", "N", "R", "F", "O"]), min_size=1, max_size=3),
)
_date_leaf = st.builds(
    lambda y, op: f"(l_shipdate {op} TIMESTAMP '{y}-06-01 00:00:00')",
    st.integers(min_value=1995, max_value=2001),
    st.sampled_from(["<", ">="]),
)
_leaf = st.one_of(_num_leaf, _between_leaf, _str_leaf, _date_leaf)


def _combine(children):
    a, b, op, neg = children
    expr = f"({a} {op} {b})"
    return f"(NOT {expr})" if neg else expr


_predicate = st.recursive(
    _leaf,
    lambda inner: st.builds(
        _combine,
        st.tuples(inner, inner, st.sampled_from(["AND", "OR"]), st.booleans()),
    ),
    max_leaves=6,
)


def _duck(sql: str):
    """Run one oracle query on a FRESH in-memory connection.

    A module-lived connection was observed to die mid-run under
    pytest+Spark (duckdb FATAL "Attempted to dereference unique_ptr that
    is NULL", after which every later example reports "database has been
    invalidated"). Per-example connections are cheap (~ms) and make each
    hypothesis example hermetic.
    """
    con = duckdb.connect()
    try:
        for t in ("lineitem", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        try:
            return con.sql(sql).fetchall()
        except duckdb.Error as e:
            if "INTERNAL Error" in str(e) or "unsuccessful or closed" in str(e):
                # DuckDB 1.0.0 optimizer assertion failure — minimal
                # trigger: identical OR branches each containing a
                # degenerate BETWEEN (x BETWEEN 0 AND 0), e.g.
                #   (A AND x BETWEEN 0 AND 0) OR (A AND x BETWEEN 0 AND 0)
                # (verified standalone, fresh connection, view AND table).
                # The ORACLE crashed, not the engine under test: discard
                # the example rather than fail the parity property.
                assume(False)
            raise
    finally:
        con.close()


@pytest.fixture(scope="module")
def li_view(spark):
    load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem_fuzz")
    return "lineitem_fuzz"


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=_predicate)
def test_random_predicates_agree(spark, li_view, pred):
    q = (
        "SELECT COUNT(*) AS n, COALESCE(SUM(l_orderkey * 7 + l_linenumber), 0) AS keysum "
        "FROM {t} WHERE " + pred
    )
    [srow] = spark.sql(q.format(t=li_view)).collect()
    [drow] = _duck(q.format(t="lineitem"))
    assert (srow.n, srow.keysum) == (drow[0], drow[1]), pred


# --- aggregate grammar: random GROUP BY + aggregate sets -------------------

_GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]
# integer-valued aggregates only: SUM of floats across engines differs
# in summation order; counts/mins/maxes and integer sums are exact.
_AGGS = [
    "COUNT(*)",
    "COUNT(DISTINCT l_orderkey)",
    "MIN(l_orderkey)",
    "MAX(l_orderkey)",
    "SUM(l_linenumber)",
    "SUM(CAST(l_quantity AS BIGINT))",
    "MIN(CAST(l_shipdate AS DATE))",
]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    groups=st.lists(st.sampled_from(_GROUP_COLS), min_size=1, max_size=3, unique=True),
    aggs=st.lists(st.sampled_from(_AGGS), min_size=1, max_size=4, unique=True),
    pred=_predicate,
)
def test_random_aggregates_agree(spark, li_view, groups, aggs, pred):
    """Random GROUP BY + exact-aggregate sets must match row-for-row."""
    gb = ", ".join(groups)
    sel = ", ".join(f"{a} AS a{i}" for i, a in enumerate(aggs))
    q = (
        f"SELECT {gb}, {sel} FROM {{t}} WHERE {pred} "
        f"GROUP BY {gb} ORDER BY {gb}"
    )
    srows = [tuple(r) for r in spark.sql(q.format(t=li_view)).collect()]
    drows = [tuple(r) for r in _duck(q.format(t="lineitem"))]

    def canon(rows):
        out = []
        for row in rows:
            out.append(tuple(str(c) for c in row))
        return out

    assert canon(srows) == canon(drows), q


# --- join grammar: random equi-join + filter ------------------------------

@pytest.fixture(scope="module")
def orders_views(spark):
    load_table(spark, SF_DIR, "orders").createOrReplaceTempView("orders_fuzz")
    return "orders_fuzz"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    jt=st.sampled_from(["JOIN", "LEFT JOIN", "LEFT SEMI JOIN", "LEFT ANTI JOIN"]),
    pred=_predicate,
)
def test_random_joins_agree(spark, li_view, orders_views, jt, pred):
    """Random join type x random lineitem predicate: surviving orders
    keyset must match (semi/anti joins keep only left columns)."""
    sub = f"(SELECT * FROM {{t}} WHERE {pred})"
    if jt in ("LEFT SEMI JOIN", "LEFT ANTI JOIN"):
        q = (
            f"SELECT COUNT(*) AS n, COALESCE(SUM(o_orderkey), 0) AS ks FROM orders_t "
            f"{jt} {sub} li ON orders_t.o_orderkey = li.l_orderkey"
        )
    else:
        q = (
            f"SELECT COUNT(*) AS n, COALESCE(SUM(o_orderkey), 0) AS ks, "
            f"COUNT(li.l_orderkey) AS matched FROM orders_t "
            f"{jt} {sub} li ON orders_t.o_orderkey = li.l_orderkey"
        )
    sq = q.replace("orders_t", "orders_fuzz").format(t=li_view)
    # DuckDB spells semi/anti joins without the LEFT keyword
    dq = (
        q.replace("LEFT SEMI JOIN", "SEMI JOIN")
        .replace("LEFT ANTI JOIN", "ANTI JOIN")
        .replace("orders_t", "orders")
        .format(t="lineitem")
    )
    [srow] = spark.sql(sq).collect()
    [drow] = _duck(dq)
    assert tuple(srow) == tuple(drow), q


# --- window grammar: random function x partition x order x predicate ------

_WIN_FUNCS = [
    "ROW_NUMBER()",
    "RANK()",
    "DENSE_RANK()",
    "COUNT(*)",
    "SUM(l_linenumber)",
    "MIN(l_orderkey)",
    "LAG(l_linenumber, 1, 0)",
    "LEAD(l_linenumber, 2, -1)",
]
_PART_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]
_ORDER_COLS = ["l_quantity", "l_extendedprice", "l_shipdate"]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    func=st.sampled_from(_WIN_FUNCS),
    part=st.sampled_from(_PART_COLS),
    order=st.sampled_from(_ORDER_COLS),
    desc=st.booleans(),
    pred=_predicate,
)
def test_random_windows_agree(spark, li_view, func, part, order, desc, pred):
    """Random window function over a random partition/order, reduced to
    a weighted checksum both engines must reproduce exactly. The ORDER
    BY ends in a unique key so ranking/offset functions and default
    frames are deterministic."""
    direction = "DESC" if desc else "ASC"
    q = (
        "SELECT COUNT(*) AS n, "
        "SUM(CAST(w AS BIGINT) * (l_orderkey % 97 + 1)) AS chk FROM ("
        f"SELECT {func} OVER (PARTITION BY {part} "
        f"ORDER BY {order} {direction}, l_orderkey * 8 + l_linenumber) AS w, "
        "l_orderkey, l_linenumber "
        "FROM {t} WHERE " + pred + ")"
    )
    [srow] = spark.sql(q.format(t=li_view)).collect()
    [drow] = _duck(q.format(t="lineitem"))
    assert (srow.n, srow.chk) == (drow[0], drow[1]), q


# --- dedup fuzz: planted exact copies on random corpora -------------------

_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
          "hotel", "india", "juliet", "kilo", "lima"]
_doc_text = st.lists(
    st.sampled_from(_WORDS), min_size=4, max_size=14
).map(" ".join)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_doc_text, min_size=3, max_size=12),
    copy_idx=st.data(),
)
def test_fuzz_minhash_finds_planted_copies(spark, texts, copy_idx):
    """On ANY corpus, an exact copy collides with its source in every
    MinHash band, so minhash_pairs must report the (src, copy) pair.
    Generalizes the fixed-data planted test the way the predicate fuzz
    generalizes q02."""
    from kinesis_logs_reader_spark.operators.dedup import minhash_pairs

    n = len(texts)
    k = copy_idx.draw(st.integers(min_value=0, max_value=n - 1))
    rows = [(i, t) for i, t in enumerate(texts)]
    rows.append((1000 + k, texts[k]))  # planted exact copy
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.ida, r.idb) for r in minhash_pairs(docs).collect()}
    assert (k, 1000 + k) in pairs, (texts[k], sorted(pairs))
    # output contract: ida < idb, no self-pairs, no duplicates
    assert all(a < b for a, b in pairs)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_doc_text, min_size=2, max_size=15))
def test_fuzz_exact_dedup_matches_duckdb(spark, texts):
    """Exact dedup kernel (md5-keyed min-id survivor) agrees with
    DuckDB on arbitrary corpora — the cross-engine md5 + grouping
    contract q40/q78 rely on, fuzzed over generated inputs."""
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    s = sorted(
        tuple(r)
        for r in docs.groupBy(F.md5(F.col("text")).alias("h"))
        .agg(F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO d VALUES (?, ?)", rows)
        d = sorted(
            tuple(r)
            for r in con.sql(
                "SELECT md5(text) AS h, MIN(doc_id) AS keep, COUNT(*) AS n "
                "FROM d GROUP BY h"
            ).fetchall()
        )
    finally:
        con.close()
    assert s == d


# --- text-normalization grammar: random strings through both engines ------

_text_strategy = st.text(
    alphabet=st.sampled_from(list("abcXYZ012 .,!?-_@#\t")),
    min_size=0,
    max_size=60,
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_text_strategy, min_size=1, max_size=8))
def test_normalize_text_agrees_cross_engine(spark, texts):
    """normalize_text (lowercase -> strip non-alnum-non-space ->
    collapse spaces -> trim) must canonicalize identically in Spark
    and DuckDB for arbitrary strings — the dedup keys of
    q78/q90/q118 depend on it."""
    from kinesis_logs_reader_spark.operators.preprocess import normalize_text

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    srows = {
        r.i: r.n
        for r in df.select("i", normalize_text(F.col("t")).alias("n")).collect()
    }
    con = duckdb.connect()
    try:
        drows = {}
        for i, t in enumerate(texts):
            [(n,)] = con.execute(
                "SELECT trim(regexp_replace(regexp_replace(lower(?), "
                "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))",
                [t],
            ).fetchall()
            drows[i] = n
    finally:
        con.close()
    assert srows == drows, texts


# --- MinHash kernel pairing: the Python expression chain vs the SQL macro --

_token_strategy = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=5), min_size=0, max_size=12
)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(toks=_token_strategy)
def test_shingle_hash_kernel_agrees_cross_engine(spark, toks):
    """token_base_hashes -> token_shingle_hashes (functions/text.py)
    must produce the SAME distinct base-hash sets as the hand-written
    DuckDB macro the q46/q74/q123/q128/q129 oracles embed — this pair
    is maintained by hand, so fuzz the pairing itself."""
    from kinesis_logs_reader_spark.functions.text import (
        token_base_hashes,
        token_shingle_hashes,
    )

    text = " ".join(toks) if toks else ""
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    [row] = (
        df.select(token_base_hashes().alias("tb"))
        .select(token_shingle_hashes(F.col("tb")).alias("bases"))
        .collect()
    )
    con = duckdb.connect()
    try:
        [(dbases,)] = con.execute(
            """
            WITH tok AS (
              SELECT list_transform(str_split(?, ' '),
                t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % 2147483647) AS tb
            )
            SELECT list_distinct(list_transform(
              generate_series(1, greatest(0, len(tb) - 2)),
              i -> ((tb[i] * 912367891) % 2147483647
                  + (tb[i+1] * 1500450271) % 2147483647
                  + (tb[i+2] * 2038074743) % 2147483647) % 2147483647))
            FROM tok
            """,
            [text],
        ).fetchall()
    finally:
        con.close()
    assert sorted(row.bases) == sorted(dbases), text


# --- r4 batch 5-7 hash kernels: CMS bucket + md5-coin sampling key --------

_term_strategy = st.lists(
    st.text(alphabet="abcdefghij0123", min_size=1, max_size=8),
    min_size=1,
    max_size=10,
    unique=True,
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(terms=_term_strategy)
def test_cms_bucket_kernel_agrees_cross_engine(spark, terms):
    """The q132 Count-Min bucket hash (md5(j || ':' || term) -> 61-bit
    int -> % width) must land every (j, term) in the same bucket in
    both engines — the grid is meaningless otherwise."""
    df = spark.createDataFrame(
        [(j, t) for j in range(4) for t in terms], "j int, term string"
    )
    srows = {
        (r.j, r.term): r.bucket
        for r in df.select(
            "j",
            "term",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", F.col("j").cast("string"), F.col("term")
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 64
            ).alias("bucket"),
        ).collect()
    }
    con = duckdb.connect()
    try:
        drows = {}
        for j in range(4):
            for t in terms:
                [(b,)] = con.execute(
                    "SELECT CAST('0x' || substr(md5(CAST(? AS VARCHAR) || ':' || ?), 1, 15) AS BIGINT) % 64",
                    [j, t],
                ).fetchall()
                drows[(j, t)] = b
    finally:
        con.close()
    assert srows == drows


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=20, unique=True
    ),
    weights=st.lists(
        st.integers(min_value=1, max_value=10**6), min_size=20, max_size=20
    ),
)
def test_weighted_sample_key_kernel_agrees_cross_engine(spark, ids, weights):
    """The q140 Efraimidis-Spirakis key (md5 coin -> u in (0,1) ->
    floor(ln(u)/w * 1e9)) must be bit-identical across engines for
    arbitrary ids and weights — sampling membership depends on exact
    key order."""
    rows = [(i, w) for i, w in zip(ids, weights)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    m = 1_000_003
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("wsamp"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % m
        + 1
    )
    key = F.floor(
        F.log(h.cast("double") / float(m + 1)) / F.col("w").cast("double") * 1e9
    ).cast("bigint")
    srows = {r.doc_id: r.k for r in df.select("doc_id", key.alias("k")).collect()}
    con = duckdb.connect()
    try:
        drows = {}
        for i, w in rows:
            [(k,)] = con.execute(
                "SELECT CAST(FLOOR(LN(CAST(CAST('0x' || substr(md5('wsamp:' || CAST(? AS VARCHAR)), 1, 15) AS BIGINT) % 1000003 + 1 AS DOUBLE) / 1000004.0) / CAST(? AS DOUBLE) * 1e9) AS BIGINT)",
                [i, w],
            ).fetchall()
            drows[i] = k
    finally:
        con.close()
    assert srows == drows


# --- entropy quantization kernel: c*ln(c) micro-nat sums (q144) ------------


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=3),
            min_size=1,
            max_size=15,
        ).map(lambda ws: " ".join(ws)),
        min_size=1,
        max_size=6,
    )
)
def test_entropy_kernel_agrees_cross_engine_and_math(spark, texts):
    """q144's ln(n) - sum(floor(c*ln(c)*1e6))/1e6/n identity must (a)
    produce bit-identical rounded values in Spark and DuckDB for
    arbitrary corpora and (b) track the true Shannon entropy within
    quantization error (n terms x 1e-6 each, plus rounding)."""
    import math

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    counts = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(
            F.floor(
                F.col("c").cast("double") * F.log(F.col("c").cast("double")) * 1e6
            ).cast("bigint")
        ).alias("sq"),
    )
    srows = {
        r.doc_id: round(
            math.nan
            if r.n == 0
            else __import__("math").log(r.n) - r.sq / 1e6 / r.n,
            4,
        )
        for r in agg.collect()
    }
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO d VALUES (?, ?)", rows)
        drows = dict(
            con.sql(
                """
                WITH c AS (
                  SELECT doc_id, t, COUNT(*) AS c FROM
                    (SELECT doc_id, unnest(str_split(text, ' ')) AS t FROM d)
                  GROUP BY doc_id, t
                ), a AS (
                  SELECT doc_id, SUM(c) AS n,
                         SUM(CAST(FLOOR(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))
                                        * 1e6) AS BIGINT)) AS sq
                  FROM c GROUP BY doc_id
                )
                SELECT doc_id,
                       ROUND(LN(CAST(n AS DOUBLE))
                             - CAST(sq AS DOUBLE) / 1e6 / CAST(n AS DOUBLE), 4)
                FROM a
                """
            ).fetchall()
        )
    finally:
        con.close()
    assert srows == drows, texts
    # semantics: matches direct Shannon entropy within quantization slack
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n = len(toks)
        from collections import Counter

        h = -sum((c / n) * math.log(c / n) for c in Counter(toks).values())
        assert abs(srows[i] - h) < 1e-3, (t, srows[i], h)


# --- charset translate-count kernel (q150) --------------------------------


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("aZ09 .!€äλ\t\n")),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_charset_translate_counts_agree_cross_engine(spark, texts):
    """length-minus-translate class counting (q150) must agree with
    DuckDB's length-minus-regexp_replace for arbitrary strings,
    including multi-byte codepoints and control characters — and both
    must equal a direct Python count."""
    _alpha = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "i long, t string")
    srows = {
        r.i: (r.a, r.d, r.s)
        for r in docs.select(
            "i",
            (F.length("t") - F.length(F.translate("t", _alpha, ""))).alias("a"),
            (F.length("t") - F.length(F.translate("t", "0123456789", ""))).alias("d"),
            (F.length("t") - F.length(F.translate("t", " ", ""))).alias("s"),
        ).collect()
    }
    con = duckdb.connect()
    try:
        drows = {}
        for i, t in enumerate(texts):
            [(a, d, s)] = con.execute(
                "SELECT LENGTH(?) - LENGTH(regexp_replace(?, '[a-zA-Z]', '', 'g')),"
                "       LENGTH(?) - LENGTH(regexp_replace(?, '[0-9]', '', 'g')),"
                "       LENGTH(?) - LENGTH(REPLACE(?, ' ', ''))",
                [t] * 6,
            ).fetchall()
            drows[i] = (a, d, s)
    finally:
        con.close()
    assert srows == drows, texts
    for i, t in enumerate(texts):
        py = (
            sum(ch in _alpha for ch in t),
            sum(ch.isdigit() and ch in "0123456789" for ch in t),
            t.count(" "),
        )
        assert srows[i] == py, (t, srows[i], py)


# --- bigram slicing kernel pairing (q147) ---------------------------------


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(toks=_token_strategy)
def test_bigram_kernel_agrees_cross_engine(spark, toks):
    """shingles_from_tokens(k=2) (Spark) and the DuckDB
    range/list_transform slice macro embedded in the q147 oracle must
    produce the same bigram MULTISET for arbitrary token lists,
    including the empty and single-token edge cases."""
    from kinesis_logs_reader_spark.functions.text import shingles_from_tokens

    text = " ".join(toks)
    df = spark.createDataFrame([(text,)], "text string")
    [row] = df.select(
        shingles_from_tokens(F.split("text", " "), k=2).alias("bg")
    ).collect()
    s = sorted(row.bg)
    con = duckdb.connect()
    try:
        [(d,)] = con.execute(
            """
            SELECT list_sort(list_transform(
                     range(1, GREATEST(len(toks) - 1, 0) + 1),
                     i -> array_to_string(toks[i:i+1], ' ')))
            FROM (SELECT str_split(?, ' ') AS toks)
            """,
            [text],
        ).fetchall()
    finally:
        con.close()
    assert s == sorted(d), (toks, s, d)


# --- window grammar: random specs + frames (r6) ----------------------------
# Integer-exact window outputs only (ranks, counts, integer sums,
# lag/lead of an int column) over a DETERMINISTIC total order
# (l_orderkey, l_linenumber is unique), so both engines must agree
# bit-for-bit; the comparison collapses each query to one BIGINT
# checksum row. Frames cover ROWS variants incl. bounded preceding/
# following — the semantics area the hand-written q18-q20/q60 cover
# only pointwise.

_WIN_PARTS = st.sampled_from(
    ["", "PARTITION BY l_returnflag", "PARTITION BY l_returnflag, l_linestatus"]
)
_WIN_FRAMES = st.sampled_from(
    [
        "",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
    ]
)
_WIN_FNS = st.sampled_from(
    [
        ("ROW_NUMBER()", False),
        ("RANK()", False),
        ("DENSE_RANK()", False),
        ("COUNT(*)", True),
        ("SUM(l_linenumber)", True),
        ("MIN(l_orderkey)", True),
        ("MAX(l_orderkey)", True),
        ("LAG(l_linenumber, 1, 0)", False),
        ("LEAD(l_linenumber, 2, -1)", False),
    ]
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(fn=_WIN_FNS, part=_WIN_PARTS, frame=_WIN_FRAMES)
def test_random_window_specs_agree(spark, li_view, fn, part, frame):
    expr, takes_frame = fn
    spec_bits = [part, "ORDER BY l_orderkey, l_linenumber"]
    if takes_frame and frame:
        spec_bits.append(frame)
    spec = " ".join(b for b in spec_bits if b)
    q = (
        "SELECT CAST(SUM(CAST(w AS BIGINT) * (l_orderkey * 7 + l_linenumber)) AS BIGINT) AS chk, "
        "COUNT(*) AS n FROM ("
        f"SELECT l_orderkey, l_linenumber, {expr} OVER ({spec}) AS w "
        "FROM {t} WHERE l_orderkey < 2000) v"
    )
    [srow] = spark.sql(q.format(t=li_view)).collect()
    [drow] = _duck(q.format(t="lineitem"))
    assert (srow.chk, srow.n) == (drow[0], drow[1]), (expr, spec)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    part=_WIN_PARTS,
    lo=st.integers(min_value=0, max_value=10),
    hi=st.integers(min_value=0, max_value=10),
    agg=st.sampled_from(["SUM(l_linenumber)", "COUNT(*)", "MIN(l_orderkey)"]),
)
def test_random_range_frames_agree(spark, li_view, part, lo, hi, agg):
    """RANGE (value-based) frames over an integer order key: the frame
    is defined by value distance, so ties enter symmetrically and the
    output is deterministic without a unique order — both engines must
    agree exactly (q60's semantics, fuzzed)."""
    spec_bits = [
        part,
        "ORDER BY CAST(l_quantity AS BIGINT)",
        f"RANGE BETWEEN {lo} PRECEDING AND {hi} FOLLOWING",
    ]
    spec = " ".join(b for b in spec_bits if b)
    q = (
        "SELECT CAST(SUM(CAST(w AS BIGINT) * (l_orderkey * 7 + l_linenumber)) AS BIGINT) AS chk, "
        "COUNT(*) AS n FROM ("
        f"SELECT l_orderkey, l_linenumber, {agg} OVER ({spec}) AS w "
        "FROM {t} WHERE l_orderkey < 2000) v"
    )
    [srow] = spark.sql(q.format(t=li_view)).collect()
    [drow] = _duck(q.format(t="lineitem"))
    assert (srow.chk, srow.n) == (drow[0], drow[1]), spec
