"""Property-based tests (hypothesis) for the Python-side kernels that
back UDFs — driver-side pure functions, no Spark session needed."""

from __future__ import annotations

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_logs_reader_spark.functions.gzip_udfs import gzip_compress
from kinesis_logs_reader_spark.operators.dedup import _simhash_one


@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_gzip_roundtrip_property(raw: bytes):
    assert gzip.decompress(gzip_compress(raw)) == raw


@given(st.binary(max_size=512))
@settings(max_examples=100, deadline=None)
def test_gzip_deterministic(raw: bytes):
    """mtime pinned -> byte-identical output (fixture stability)."""
    assert gzip_compress(raw) == gzip_compress(raw)


@given(st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=6), min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_simhash_in_range_and_deterministic(tokens: list[str]):
    text = " ".join(tokens)
    h = _simhash_one(text)
    assert 0 <= h < 2**64
    assert h == _simhash_one(text)


@given(
    st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=6), min_size=5, max_size=40),
    st.integers(min_value=0, max_value=4),
)
@settings(max_examples=50, deadline=None)
def test_simhash_single_edit_bounded_distance(tokens: list[str], edit_pos: int):
    """Editing one token flips a bounded number of sketch bits."""
    orig = _simhash_one(" ".join(tokens))
    mutated = list(tokens)
    mutated[edit_pos % len(mutated)] = "zzzz"
    edited = _simhash_one(" ".join(mutated))
    hamming = bin(orig ^ edited).count("1")
    # one token among >=5 shifts at most half the bits in practice;
    # identical-token edits give distance 0
    assert hamming <= 40


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
@settings(max_examples=20, deadline=None)
def test_morton_z_is_injective_and_bounded(pairs):
    """morton_z must be a bijection on 16-bit pairs (distinct inputs ->
    distinct codes) and fit in a positive bigint — pure-Python mirror
    of the literal-shift expression in sources/layout.py."""

    def z(x, y, bits=16):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    codes = [z(x, y) for x, y in pairs]
    assert len(set(codes)) == len(pairs)
    assert all(0 <= c < 2**32 for c in codes)


def test_morton_z_spark_matches_python(spark):
    """The Catalyst expression agrees with the reference bit math."""
    from pyspark.sql import functions as F

    from kinesis_logs_reader_spark.sources.layout import morton_z

    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 42)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {(r.x, r.y): r.z for r in df.select("x", "y", morton_z(F.col("x"), F.col("y")).alias("z")).collect()}

    def z(x, y, bits=16):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    assert got == {(x, y): z(x, y) for x, y in rows}
