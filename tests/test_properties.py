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
