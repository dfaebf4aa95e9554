"""Unit tests for operators not fully covered by declared queries:
salted joins, as-of forward direction, dedup survivorship, bounded sinks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.dedup import deduplicate
from home_credit_data_engineering_spark.operators.joins import asof_join, salted_join
from home_credit_data_engineering_spark.sources.sinks import to_pandas_sample


def test_salted_join_equals_plain_join(spark, sf_dir):
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    orders = read_testdata(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_testdata(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
    )
    salted = salted_join(
        orders,
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        on="o_custkey",
        salt_buckets=8,
    )
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.select(plain.columns).collect()}
    assert a == b and len(a) > 0


def test_asof_join_forward(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (2, 5)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 12), (1, 20), (1, 30), (2, 1)], "k long, rt long"
    )
    out = {
        (r["k"], r["t"]): r["rt_asof"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt", direction="forward"
        ).collect()
    }
    # earliest right time >= left time
    assert out[(1, 10)] == 12
    assert out[(1, 25)] == 30
    assert out[(2, 5)] is None  # only right time is 1 < 5 → no forward match


def test_deduplicate_survivors(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1 → removed
        (3, base.replace("today", "tomorrow")),  # near dup of 1 → removed
        (4, "entirely different text with completely other words inside it"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in deduplicate(
            docs, "doc_id", "text", near=True, threshold=0.5, bands=16
        ).collect()
    )
    assert kept == [1, 4]


def test_to_pandas_sample_bounded(spark, sf_dir):
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    li = read_testdata(spark, sf_dir, "lineitem")
    pdf = to_pandas_sample(li, n=50, fraction=0.5, seed=42)
    assert len(pdf) <= 50
    pdf2 = to_pandas_sample(li, n=50, fraction=0.5, seed=42)
    assert pdf.equals(pdf2)  # seeded → reproducible


def test_export_sample_csv(spark, sf_dir, tmp_path):
    import pandas as pd

    from home_credit_data_engineering_spark.sources.readers import read_testdata
    from home_credit_data_engineering_spark.sources.sinks import export_sample

    cust = read_testdata(spark, sf_dir, "customer")
    out = export_sample(cust, str(tmp_path / "sample.csv"), n=25, fmt="csv")
    back = pd.read_csv(out)
    assert len(back) == 25
    assert list(back.columns) == cust.columns

    # xlsx without openpyxl: explicit CSV fallback (warns, returns the
    # .csv path it actually wrote) — the export leg still produces an
    # artifact in environments without Excel support.
    try:
        import openpyxl  # noqa: F401

        has_openpyxl = True
    except ImportError:
        has_openpyxl = False
    xlsx_target = str(tmp_path / "sample.xlsx")
    if has_openpyxl:
        out2 = export_sample(cust, xlsx_target, n=5, fmt="xlsx")
        assert out2 == xlsx_target
    else:
        with pytest.warns(UserWarning, match="openpyxl not installed"):
            out2 = export_sample(cust, xlsx_target, n=5, fmt="xlsx")
        assert out2 == xlsx_target + ".csv"
        back2 = pd.read_csv(out2)
        assert len(back2) == 5
        assert list(back2.columns) == cust.columns


def test_bernoulli_sample_seed_reproducible(spark, sf_dir):
    """Engine-RNG seeded sample: same seed => identical membership within
    this engine (cross-engine membership is engine-specific, which is why
    the driver-facing o3 slot uses hash_bernoulli_sample instead)."""
    from home_credit_data_engineering_spark.operators.sampling import (
        bernoulli_sample,
        hash_bernoulli_sample,
    )
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    cust = read_testdata(spark, sf_dir, "customer")
    a = {r["c_custkey"] for r in bernoulli_sample(cust, 0.1, seed=7).collect()}
    b = {r["c_custkey"] for r in bernoulli_sample(cust, 0.1, seed=7).collect()}
    assert a == b and len(a) > 0
    c = {r["c_custkey"] for r in bernoulli_sample(cust, 0.1, seed=8).collect()}
    assert a != c
    # Hash form: ~fraction of rows kept, deterministic under repartition.
    n = cust.count()
    h1 = {r["c_custkey"] for r in hash_bernoulli_sample(cust, "c_custkey", 0.1).collect()}
    h2 = {
        r["c_custkey"]
        for r in hash_bernoulli_sample(cust.repartition(13), "c_custkey", 0.1).collect()
    }
    assert h1 == h2
    assert 0.05 * n < len(h1) < 0.15 * n


def test_salted_join_rejects_outer_how(spark):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(df, df, on="k", how=how)


def test_lsh_bands_validation(spark):
    from home_credit_data_engineering_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "one two three four five six seven")], "doc_id long, text string"
    )
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=8)
    with pytest.raises(ValueError, match="evenly divide"):
        lsh_candidate_pairs(sigs, bands=3, num_hashes=8)
    with pytest.raises(ValueError, match="evenly divide"):
        lsh_candidate_pairs(sigs, bands=16, num_hashes=8)
    # Runtime guard (num_hashes not passed): indivisible bands fail loudly.
    import py4j.protocol

    with pytest.raises(Exception, match="evenly divide|USER_RAISED"):
        lsh_candidate_pairs(sigs, bands=3).collect()
    # Divisible bands still work both ways.
    assert lsh_candidate_pairs(sigs, bands=4, num_hashes=8).count() >= 0
    assert lsh_candidate_pairs(sigs, bands=4).count() >= 0


def test_normalize_unicode_matches_duckdb_nfc(spark):
    """Composed/decomposed forms collapse identically to DuckDB's
    nfc_normalize; NFKC folds compatibility chars; nulls pass; bad form
    rejected."""
    import duckdb
    import pytest as _pytest
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.functions.text import (
        fingerprint,
        normalize_unicode,
    )

    composed = "café résumé"
    decomposed = "café résumé"
    rows = [(1, composed), (2, decomposed), (3, "ﬁle plain"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["norm"]
        for r in df.select(
            "doc_id", normalize_unicode("text").alias("norm")
        ).collect()
    }
    con = duckdb.connect()
    for doc_id, text in rows:
        expect = (
            con.sql("SELECT nfc_normalize(?)", params=[text]).fetchone()[0]
            if text is not None
            else None
        )
        assert out[doc_id] == expect, doc_id
    con.close()
    assert out[1] == out[2]  # forms collapse to one string
    # and therefore to one dedup fingerprint
    fps = {
        r["fp"]
        for r in df.filter(F.col("doc_id").isin(1, 2))
        .select(fingerprint(normalize_unicode("text")).alias("fp"))
        .collect()
    }
    assert len(fps) == 1
    nfkc = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", normalize_unicode("text", "NFKC").alias("n")
        ).collect()
    }
    assert nfkc[3] == "file plain"  # U+FB01 ligature folds under NFKC
    with _pytest.raises(ValueError, match="form"):
        normalize_unicode("text", "NFX")


def test_strip_html_matches_duckdb_twin(spark):
    """Markup extraction: script/style content dropped, tags/comments
    stripped, entities decoded, whitespace collapsed — and the pure-RE2
    DuckDB replay of the same chain agrees byte for byte."""
    import duckdb

    from home_credit_data_engineering_spark.functions.text import strip_html

    cases = [
        '<html><head><style>p {color: red}</style>'
        '<script type="x">var a = "<b>";</script></head>\n'
        '<body><!-- nav --><h1>Hello &amp; welcome</h1>'
        '<p>5 &lt; 6 &nbsp; "q"</p></body></html>',
        "no markup at all",
        "<p>nested <b>bold <i>italic</i></b> text</p>",
        "<SCRIPT>UPPER.case()</SCRIPT>ok<STYLE>x</STYLE>",
        "broken <unclosed attr='v' rest",
        "&amp;lt; decodes to &lt; only once",
        "",
        # numeric character references (r6): decimal, hex (either case,
        # leading zeros), tab/newline codepoints, Latin-1 accents
        "caf&#233; r&#xE9;sum&#XE9; na&#239;ve",
        "A&#9;B&#10;C&#13;D",
        "&#65;&#066;&#x43;&#x044;",
        "quote&#34;dash&#45;tilde&#126;",
        # out-of-range / malformed stay verbatim
        "&#8364;euro &#0;nul &#999999;big &#x110000;huge &#xZZ; &#; &#x;",
        "mixed &#38;#65; stays one-decode",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i long, text string"
    )
    got = {
        r["i"]: r["clean"]
        for r in df.select("i", strip_html("text").alias("clean")).collect()
    }
    assert got[0] == 'Hello & welcome 5 < 6 "q"'
    assert got[1] == "no markup at all"
    assert got[2] == "nested bold italic text"
    assert got[3] == "ok"
    assert got[5] == "&lt; decodes to < only once"  # no double-decode
    assert got[6] == ""

    # pure-RE2 replay of the same chain: tag strip, then ONE simultaneous
    # entity pass (split on the entity pattern, decode each match via the
    # same named/numeric CASE, interleave back), then whitespace collapse
    sql = r"""
    WITH t0 AS (
      SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(?,
          '(?is)<script[^>]*>.*?</script\s*>', ' ', 'g'),
          '(?is)<style[^>]*>.*?</style\s*>', ' ', 'g'),
          '(?s)<!--.*?-->', ' ', 'g'),
          '(?s)<[^>]+>', ' ', 'g') AS t
    ),
    parts AS (
      SELECT t,
        string_split_regex(t,
          '&(?:#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6}|nbsp|lt|gt|quot|apos|amp);')
          AS segs,
        list_transform(
          regexp_extract_all(t,
            '&(?:#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6}|nbsp|lt|gt|quot|apos|amp);'),
          e -> CASE e
            WHEN '&nbsp;' THEN ' ' WHEN '&lt;' THEN '<'
            WHEN '&gt;' THEN '>' WHEN '&quot;' THEN '"'
            WHEN '&#39;' THEN '''' WHEN '&apos;' THEN ''''
            WHEN '&amp;' THEN '&'
            ELSE CASE WHEN
              COALESCE(CASE
                WHEN regexp_matches(e, '^&#[xX]')
                  THEN CAST('0x' ||
                       regexp_extract(e, '^&#[xX]([0-9a-fA-F]+);$', 1)
                       AS BIGINT)
                ELSE CAST(regexp_extract(e, '^&#([0-9]+);$', 1) AS BIGINT)
              END, -1) IN (9, 10, 13)
              OR COALESCE(CASE
                WHEN regexp_matches(e, '^&#[xX]')
                  THEN CAST('0x' ||
                       regexp_extract(e, '^&#[xX]([0-9a-fA-F]+);$', 1)
                       AS BIGINT)
                ELSE CAST(regexp_extract(e, '^&#([0-9]+);$', 1) AS BIGINT)
              END, -1) BETWEEN 32 AND 255
            THEN chr(CAST(CASE
                WHEN regexp_matches(e, '^&#[xX]')
                  THEN CAST('0x' ||
                       regexp_extract(e, '^&#[xX]([0-9a-fA-F]+);$', 1)
                       AS BIGINT)
                ELSE CAST(regexp_extract(e, '^&#([0-9]+);$', 1) AS BIGINT)
              END AS INTEGER))
            ELSE e END
          END) AS decs
      FROM t0
    )
    SELECT trim(regexp_replace(
      CASE WHEN len(decs) = 0 THEN t
           ELSE segs[1] || array_to_string(
             list_transform(generate_series(1, len(decs)),
                            i -> decs[i] || segs[i + 1]), '')
      END, '\s+', ' ', 'g'))
    FROM parts
    """
    con = duckdb.connect()
    for i, t in enumerate(cases):
        assert got[i] == con.sql(sql, params=[t]).fetchone()[0], (i, got[i])
    con.close()


def test_corpus_report_card_hand_computed(spark):
    import math

    from home_credit_data_engineering_spark.operators.quality import (
        corpus_report_card,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en", "s1"),
            (2, "alpha beta gamma delta", "en", "s1"),  # exact dup of 1
            (3, "", "de", "s1"),                        # blank
            (4, "uno dos", "es", "s2"),
        ],
        schema="doc_id bigint, text string, lang string, source string",
    )
    card = {r.source: r for r in corpus_report_card(docs).collect()}
    s1 = card["s1"]
    assert (s1.n_docs, s1.n_blank, s1.n_tokens) == (3, 1, 8)
    # 3 docs, 2 distinct fingerprints -> dup_rate 1/3
    assert s1.dup_rate == pytest.approx(1 / 3, abs=1e-6)
    # langs en:2 de:1 -> H = -(2/3 ln 2/3 + 1/3 ln 1/3)
    expect_h = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert s1.lang_entropy == pytest.approx(expect_h, abs=1e-6)
    s2 = card["s2"]
    assert (s2.n_docs, s2.n_blank, s2.dup_rate) == (1, 0, 0.0)
    assert s2.lang_entropy == pytest.approx(0.0, abs=1e-9)
    # quality averaged over NON-BLANK docs only (s1: two identical docs)
    assert s1.mean_quality is not None and 0.0 <= s1.mean_quality <= 1.0


def test_report_card_state_merge_equals_full(spark):
    from home_credit_data_engineering_spark.operators.quality import (
        corpus_report_card,
        merge_report_card_state,
        report_card_from_state,
        report_card_state,
    )

    rows = [
        (1, "alpha beta gamma delta", "en", "s1"),
        (2, "alpha beta gamma delta", "en", "s1"),
        (3, "", "de", "s1"),
        (4, "uno dos", "es", "s2"),
        (5, "alpha beta gamma delta", "de", "s1"),  # same fp, other lang
        (6, "neu text hier", "de", "s1"),
    ]
    schema = "doc_id bigint, text string, lang string, source string"
    full = spark.createDataFrame(rows, schema)
    day1 = spark.createDataFrame(rows[:3], schema)
    day2 = spark.createDataFrame(rows[3:], schema)
    merged = merge_report_card_state(
        report_card_state(day1), report_card_state(day2)
    )
    got = {
        r.source: r.asDict() for r in report_card_from_state(merged).collect()
    }
    expect = {
        r.source: r.asDict() for r in corpus_report_card(full).collect()
    }
    assert got == expect
    # cross-lang duplicate counts once in dup mass: s1 has 5 docs but
    # 3 distinct fingerprints (the dup text appears en x2 AND de x1 —
    # distinct-fp must not double-count it across language cells)
    assert expect["s1"]["n_docs"] == 5
    assert expect["s1"]["dup_rate"] == pytest.approx(1 - 3 / 5, abs=1e-6)


def test_grouped_weighted_percentile_hand_computed(spark):
    from home_credit_data_engineering_spark.operators.aggregates import (
        grouped_weighted_percentile,
    )

    df = spark.createDataFrame(
        [
            ("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 8),   # wmedian = 3
            ("h", 10.0, 5), ("h", 20.0, 5),                 # cum hits 0.5 AT 10
            ("z", 7.0, 3), ("z", 5.0, 0), ("z", None, 9),   # zero-w + null drop
        ],
        schema="k string, v double, w int",
    )
    got = {
        r.k: r
        for r in grouped_weighted_percentile(df, ["k"], "v", "w").collect()
    }
    assert got["g"].wpct_value == 3.0 and got["g"].total_weight == 10.0
    # lower weighted percentile: cum(10.0)=5 >= 0.5*10 -> 10
    assert got["h"].wpct_value == 10.0
    assert got["z"].wpct_value == 7.0 and got["z"].total_weight == 3.0
    with pytest.raises(ValueError, match="q must be"):
        grouped_weighted_percentile(df, ["k"], "v", "w", q=0.0)


def test_grouped_weighted_percentile_ties_accumulate_together(spark):
    from home_credit_data_engineering_spark.operators.aggregates import (
        grouped_weighted_percentile,
    )

    # tied values: RANGE frame accumulates the whole tie group at once
    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 1.0, 1), ("g", 2.0, 1)],
        schema="k string, v double, w int",
    )
    row = grouped_weighted_percentile(df, ["k"], "v", "w").collect()[0]
    assert row.wpct_value == 1.0  # cum at v=1 is 2 >= 1.5
