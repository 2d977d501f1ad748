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


def test_normalize_text_unicode_path_agrees(spark, nasty_path):
    """normalize_text(unicode_safe=True) — the regex form — must
    produce identical canonical strings in both engines on ALL nasty
    input including multi-byte codepoints; it is the documented
    general-Unicode contract."""
    from kinesis_logs_reader_spark.operators.preprocess import normalize_text

    s = {
        (r["doc_id"], r["n"])
        for r in spark.read.parquet(nasty_path)
        .select(
            "doc_id",
            normalize_text(F.col("text"), unicode_safe=True).alias("n"),
        )
        .collect()
    }
    d = set(
        duckdb.sql(
            "SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),"
            " '[^a-z0-9 ]+', '', 'g'), '  +', ' ', 'g'))"
            f" FROM read_parquet('{nasty_path}')"
        ).fetchall()
    )
    assert s == d


def test_normalize_text_fast_path_agrees_on_ascii(spark, nasty_path):
    """The default translate-based fast path (r9) is byte-identical to
    the regex form for every ASCII input — tabs, newlines, control
    chars, punctuation, edge/run spaces. Non-ASCII codepoints are
    excluded here by contract (the fast path keeps them; q78/q90/q118's
    corpora are ASCII, pinned by test_documents_corpus_is_ascii)."""
    from kinesis_logs_reader_spark.operators.preprocess import normalize_text

    rows = (
        spark.read.parquet(nasty_path)
        .filter(~F.col("text").rlike("[^\\x00-\\x7f]"))
        .select(
            "doc_id",
            normalize_text(F.col("text")).alias("fast"),
            normalize_text(F.col("text"), unicode_safe=True).alias("regex"),
        )
        .collect()
    )
    assert len(rows) >= 15  # the ASCII majority of NASTY
    for r in rows:
        assert r["fast"] == r["regex"], (r["doc_id"], r["fast"], r["regex"])


def test_documents_corpus_is_ascii(spark):
    """Structural guard for the normalize fast path: the documents
    table contains no non-ASCII codepoint (verified max codepoint 121
    at r9), so translate-delete == regex-delete on every corpus row.
    If the generator ever emits Unicode, this fails before any oracle
    hash does."""
    n = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("text").rlike("[^\\x00-\\x7f]"))
        .count()
    )
    assert n == 0


def test_levenshtein_char_vs_byte_semantics(spark):
    """MEASURED cross-engine divergence, pinned: Spark levenshtein
    counts CHARACTERS, DuckDB counts BYTES — they agree exactly on
    ASCII and disagree on any multi-byte codepoint ('e-acute' vs 'e' is
    1 in Spark, 2 in DuckDB). The q158/q158b oracle contract therefore
    requires an ASCII vocabulary, which
    test_q158_vocabulary_is_ascii asserts against the fixture corpus.
    If either engine changes semantics, this test fails first."""
    pairs = [
        ("kitten", "sitting", 3, 3),
        ("", "", 0, 0),
        ("", "ab", 2, 2),
        ("aaa", "aaa", 0, 0),
        ("ab", "ba", 2, 2),
        ("\u00e9", "e", 1, 2),
        ("\u00fcber", "uber", 1, 2),
        ("caf\u00e9", "cafe", 1, 2),
        ("\U0001f986x", "x", 1, 4),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b, _, _ in pairs], "a string, b string"
    )
    got = {
        (r["a"], r["b"]): r["d"]
        for r in df.select(
            "a", "b", F.levenshtein("a", "b").alias("d")
        ).collect()
    }
    for a, b, spark_d, duck_d in pairs:
        assert got[(a, b)] == spark_d, (a, b)
        (dd,) = duckdb.sql(
            "SELECT levenshtein(?, ?)", params=[a, b]
        ).fetchone()
        assert dd == duck_d, (a, b, dd)


def test_q158_vocabulary_is_ascii(spark):
    """Fixture invariant backing the q158/q158b oracle contract (see
    test_levenshtein_char_vs_byte_semantics): every token of the
    part-name vocabulary is pure ASCII, so character-based (Spark) and
    byte-based (DuckDB) edit distances coincide."""
    from tests.conftest import SF_DIR

    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    non_ascii = (
        part.select(
            F.explode(F.split("p_name", " ")).alias("t")
        )
        .filter(~F.col("t").rlike("^[\\x00-\\x7F]*$"))
        .count()
    )
    assert non_ascii == 0


def test_pii_scrub_regexes_agree(spark, nasty_path):
    """The q99-family PII masks (email/IP regex, replace + count) —
    cross-engine on text containing overlapping and adjacent matches."""
    from kinesis_logs_reader_spark.operators.preprocess import (
        _EMAIL_RE,
        _IP_RE,
    )

    rows = [
        "contact me at bob@example.com or al1ce@mail.org today",
        "1.2.3.4 10.0.0.255 999.999.999.999x",
        "no pii here",
        "a@b.c a@b.c a@b.c",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "i long, t string")
    s = {
        (r["i"], r["scrub"], r["ne"], r["nip"])
        for r in df.select(
            "i",
            F.regexp_replace(
                F.regexp_replace("t", _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
            ).alias("scrub"),
            F.regexp_count("t", F.lit(_EMAIL_RE)).alias("ne"),
            F.regexp_count("t", F.lit(_IP_RE)).alias("nip"),
        ).collect()
    }
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(rows))
    d = set(
        duckdb.sql(
            f"""SELECT i,
       regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_IP_RE}', '<IP>', 'g'),
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT),
       CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT)
FROM (VALUES {vals}) v(i, t)"""
        ).fetchall()
    )
    assert s == d


def test_string_ordering_agrees(spark):
    """min/max and pairwise < on strings: both engines compare UTF-8
    bytes, so ordering-sensitive outputs (top-k ties, tok_a < tok_b
    pair canonicalization) agree even on multi-byte input."""
    vals = ["", "a", "A", "Z", "z", "é", "über", "uber",
            "中文", "\U0001f986", "ss", "ß"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    smin, smax = df.agg(F.min("s"), F.max("s")).collect()[0]
    con = duckdb.connect()
    placeholders = ", ".join(["(?)"] * len(vals))
    dmin, dmax = con.execute(
        f"SELECT min(s), max(s) FROM (VALUES {placeholders}) t(s)", vals
    ).fetchone()
    assert (smin, smax) == (dmin, dmax)
    pairs = [("é", "z"), ("a", "é"), ("中", "z"), ("ß", "s")]
    sp = [
        r["lt"]
        for r in spark.createDataFrame(pairs, "a string, b string")
        .select(F.expr("a < b").alias("lt"))
        .collect()
    ]
    dp = [
        con.execute("SELECT ? < ?", list(p)).fetchone()[0] for p in pairs
    ]
    assert sp == dp


def test_upper_case_fold_divergence_pinned(spark):
    """MEASURED divergence, pinned: full Unicode case mapping differs —
    Spark upper('<sharp-s>') = 'SS' (one-to-many fold), DuckDB = the
    capital sharp s. lower() agrees. Any oracle-hashed output built on
    upper() therefore requires ASCII text, which
    test_documents_corpus_is_ascii asserts (q122's uppercase transform
    rides on it)."""
    df = spark.createDataFrame([("ß",), ("Straße",)], "s string")
    got = {r["s"]: r["u"] for r in df.select("s", F.upper("s").alias("u")).collect()}
    assert got["ß"] == "SS"
    con = duckdb.connect()
    (du,) = con.execute("SELECT upper(?)", ["ß"]).fetchone()
    assert du == "ẞ"  # capital sharp s — NOT Spark's 'SS'
    # and on ASCII the engines agree exactly
    (da,) = con.execute("SELECT upper('mixed Case 42')").fetchone()
    sa = (
        spark.createDataFrame([("mixed Case 42",)], "s string")
        .select(F.upper("s"))
        .collect()[0][0]
    )
    assert sa == da


def test_documents_corpus_is_ascii(spark):
    """Fixture invariant backing every upper()/levenshtein-dependent
    oracle (q122, q158 family): the documents corpus is pure ASCII at
    every shipped scale factor."""
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert (
        docs.filter(~F.col("text").rlike("^[\\x00-\\x7F]*$")).count() == 0
    )


def test_round_semantics_agree(spark):
    """ROUND on doubles — including the classic binary-representation
    traps (2.675, exact .5 halves, 1e15+0.5) — is identical across
    engines: both round the actual binary double. This is the footing
    under every ROUND(x, n) double in a hashed output."""
    vals = [0.125, -0.125, 2.675, 0.5, 1.5, 2.5, -0.5, -1.5,
            0.045, 0.055, 1e15 + 0.5, 0.30000000000000004]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    s = {
        r["x"]: (r["r0"], r["r2"])
        for r in df.select(
            "x", F.round("x", 0).alias("r0"), F.round("x", 2).alias("r2")
        ).collect()
    }
    con = duckdb.connect()
    for v in vals:
        d = con.execute("SELECT round(?, 0), round(?, 2)", [v, v]).fetchone()
        assert s[v] == tuple(d), (v, s[v], d)


def test_integer_div_mod_agree_on_negatives(spark):
    """Spark `div`/`%` == DuckDB `//`/`%` for every sign combination
    (truncate toward zero; remainder follows the dividend) — the
    footing under the ppm/micro scaled-int64 idiom and the sign-safe
    floor-mean in the k-means oracle."""
    ints = [(7, 3), (-7, 3), (7, -3), (-7, -3), (0, 3), (-1, 10)]
    di = spark.createDataFrame(ints, "a long, b long")
    s = {
        (r["a"], r["b"]): (r["d"], r["m"])
        for r in di.select(
            "a", "b", F.expr("a div b").alias("d"), F.expr("a % b").alias("m")
        ).collect()
    }
    con = duckdb.connect()
    for a, b in ints:
        d = con.execute("SELECT ? // ?, ? % ?", [a, b, a, b]).fetchone()
        assert s[(a, b)] == tuple(d), (a, b)


def test_bow_signature_agrees(spark, nasty_path):
    """q172's novelty key — md5 over the SORTED DISTINCT token list —
    must be bit-identical across engines even on unicode, emoji,
    multi-space, and empty-token inputs: the sort order of the distinct
    set and the join separator are the whole contract."""
    import duckdb

    from pyspark.sql import functions as F

    got = {
        r["doc_id"]: r["k"]
        for r in spark.read.parquet(nasty_path)
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    " ", F.array_sort(F.array_distinct(F.split("text", " ")))
                )
            ).alias("k"),
        )
        .collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT doc_id, md5(array_to_string(list_sort(list_distinct("
            f"str_split(text, ' '))), ' ')) FROM read_parquet('{nasty_path}')"
        ).fetchall()
    )
    assert got == want


def test_q143_rle_kernel_agrees_on_nasty_corpus(spark, nasty_path, tmp_path):
    """r11: q143's vectorized-numpy RLE (mapInPandas) against an
    independent pure-Python itertools.groupby formulation on the nasty
    corpus — pins the str.split(' ') == F.split(text,' ') tokenization
    contract (empty tokens from consecutive/leading/trailing spaces,
    tabs/newlines NOT split, unicode) and the run-stat arithmetic."""
    import itertools
    import math
    import shutil

    from kinesis_logs_reader_spark.operators.textstats import (
        q143_repetition_runs,
    )

    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    shutil.copy(nasty_path, sf_dir / "documents.parquet")

    expected = {}
    for doc_id, text in enumerate(NASTY):
        toks = text.split(" ")
        runs = [len(list(g)) for _, g in itertools.groupby(toks)]
        mx = max(runs)
        nr3 = sum(1 for r in runs if r >= 3)
        tir = sum(r for r in runs if r >= 3)
        frac = math.floor(tir / len(toks) * 1e4 + 0.5) / 1e4  # HALF_UP
        expected[doc_id] = (len(toks), mx, nr3, frac)

    got = {
        r.doc_id: (r.n_tokens, r.max_run, r.n_runs_ge3, r.run_frac)
        for r in q143_repetition_runs(spark, str(sf_dir)).collect()
    }
    assert got == expected


def test_q45_fingerprint_kernel_agrees_on_nasty_corpus(spark, nasty_path, tmp_path):
    """r11: q45's Python hashlib fingerprint kernel against DuckDB's
    independent SQL formulation (md5 over explicit 3-token shingles,
    list min) on the nasty corpus — pins UTF-8 md5 equality, the
    <3-token NULL contract, and hex-string min ordering."""
    import shutil

    from kinesis_logs_reader_spark.operators.textstats import q45_fingerprint

    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    shutil.copy(nasty_path, sf_dir / "documents.parquet")

    got = {
        r.doc_id: (r.exact_fp, r.shingle_fp)
        for r in q45_fingerprint(spark, str(sf_dir)).collect()
    }
    want = {
        row[0]: (row[1], row[2])
        for row in duckdb.sql(
            f"""
            WITH toks AS (
              SELECT doc_id, md5(text) AS exact_fp,
                     str_split(text, ' ') AS t FROM read_parquet('{nasty_path}')
            )
            SELECT doc_id, exact_fp,
                   list_min(list_transform(
                     generate_series(1, len(t) - 2),
                     i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   )) AS shingle_fp
            FROM toks
            """
        ).fetchall()
    }
    assert got == want


def test_audio_energy_ascii_contract(spark, nasty_path):
    """q197's kernel contract: Spark's numpy byte-squares over
    cast-to-binary text must equal DuckDB's ord(substr()) squares over
    the SAME rows — exactly the ASCII-invariant boundary the
    multimodal oracles ride. The nasty corpus INCLUDES multi-byte
    unicode rows: there the byte view and the char view legitimately
    diverge (ord() yields the codepoint, bytes yield UTF-8 units), so
    the pin asserts (a) exact agreement on every pure-ASCII row and
    (b) that the guarded divergence actually exists — documenting WHY
    q197's oracle is valid only under the corpus-is-ascii invariant
    (test_documents_corpus_is_ascii)."""
    from kinesis_logs_reader_spark.operators.multimodal import audio_energy

    docs = spark.read.parquet(nasty_path).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    got = {
        (r.doc_id, r.win_idx): r.energy
        for r in audio_energy(docs, win_bytes=4).collect()
    }
    want = {
        (r[0], r[1]): r[2]
        for r in duckdb.sql(
            f"""
            SELECT doc_id, CAST(k AS INTEGER), list_aggregate(
              list_transform(list_transform(generate_series(0, 3),
                i -> CAST(ord(substr(text, CAST(k*4+i+1 AS INTEGER), 1))
                     AS BIGINT)), v -> v*v), 'sum')
            FROM (SELECT doc_id, text,
                    unnest(generate_series(0, length(text) // 4 - 1)) AS k
                  FROM read_parquet('{nasty_path}'))
            """
        ).fetchall()
    }
    ascii_rows = {
        r.doc_id
        for r in spark.read.parquet(nasty_path)
        .filter(~F.col("text").rlike("[^\\x00-\\x7f]"))
        .collect()
    }
    # key-set equality FIRST (ADVICE r11): a kernel that silently
    # emitted fewer windows for an ASCII row must fail here, not be
    # skipped by a membership guard
    assert {k for k in got if k[0] in ascii_rows} == {
        k for k in want if k[0] in ascii_rows
    }
    for key, v in want.items():
        if key[0] in ascii_rows:
            assert got[key] == v, key
    # the divergence the invariant guards: multi-byte rows differ in
    # window COUNT (len() counts chars, bytes count UTF-8 units)
    non_ascii = {k[0] for k in got} - ascii_rows
    assert any(
        sum(1 for k in got if k[0] == d) != sum(1 for k in want if k[0] == d)
        for d in non_ascii
    )


def test_centroid_floor_division_shared_ieee(spark):
    """q198's centroid contract: floor(CAST(s1 AS DOUBLE)/n) must give
    identical bits in both engines, including the adversarial
    near-integer quotients where TRUE floor(a/b) and
    floor(double-divide(a, b)) can disagree — both engines do the
    SAME correctly-rounded IEEE divide, so they cannot split."""
    cases = [
        (7, 2), (-7, 2), (10**15 + 1, 10**7), (10**15 - 1, 10**7),
        (4503599627370497, 3), (0, 5), (-1, 3), (999999999999, 7),
    ]
    got = spark.createDataFrame(cases, "s1 long, n long").select(
        F.floor(F.col("s1").cast("double") / F.col("n").cast("double"))
        .cast("bigint")
        .alias("c")
    ).collect()
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(floor(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE)) AS BIGINT) "
            "FROM (VALUES " + ",".join(f"({a},{b})" for a, b in cases) + ") t(s1, n) "
        ).fetchall()
    ]
    assert [r.c for r in got] == want


def test_hex_prefix_to_int_agrees(spark):
    """q131c's hex-parse idiom: Spark ``conv(substr(h,1,13), 16, 10)``
    and DuckDB ``CAST('0x' || substr(h,1,13) AS BIGINT)`` must agree
    bit-for-bit on adversarial 13-char prefixes — leading zeros, all
    'f's (the 52-bit max), all '9's (decimal-lookalike), and real md5
    prefixes — plus the substream/grid split arithmetic (w % 256,
    w // 256) downstream of the parse."""
    prefixes = [
        "0000000000000",
        "fffffffffffff",
        "9999999999999",
        "00000000000ff",
        "a00000000000b",
        "123456789abcd",
    ]
    import hashlib

    prefixes += [
        hashlib.md5(s.encode()).hexdigest()[:13]
        for s in ("", "x", "hello world", "12345")
    ]
    got = (
        spark.createDataFrame([(p,) for p in prefixes], "h string")
        .select(
            F.conv("h", 16, 10).cast("long").alias("w"),
        )
        .select("w", (F.col("w") % 256).alias("b"), F.expr("w div 256").alias("u"))
        .collect()
    )
    want = duckdb.sql(
        "SELECT CAST('0x' || h AS BIGINT) AS w, "
        "CAST('0x' || h AS BIGINT) % 256 AS b, "
        "CAST('0x' || h AS BIGINT) // 256 AS u "
        "FROM (VALUES " + ",".join(f"('{p}')" for p in prefixes) + ") t(h)"
    ).fetchall()
    assert [(r.w, r.b, r.u) for r in got] == [tuple(r) for r in want]
