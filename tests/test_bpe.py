"""Real byte-level BPE tokenization (functions/bpe.py): UDF vs the
pure-Python reference, trainer determinism/greedy properties, and the
opt-in integration with the token-denominated operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.bpe import (
    _pretokenize,
    bpe_encode,
    bytes_to_unicode,
    load_merges,
    merge_ranks,
    save_merges,
    train_bpe_merges,
    with_bpe_token_count,
)


def test_bytes_to_unicode_is_a_256_bijection():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
    # mapped symbols carry no whitespace/control chars — the merges file
    # stays line-oriented and space-splittable
    assert all(not ch.isspace() and ch.isprintable() for ch in m.values())


def test_reference_encoder_known_cases():
    # tiny hand-built table: merge h+e, then he+l (rank order matters)
    ranks = merge_ranks([("h", "e"), ("he", "l"), ("l", "o")])
    assert bpe_encode("hello", ranks) == ["hel", "lo"]
    # unmerged text falls back to byte symbols
    assert bpe_encode("xy", ranks) == ["x", "y"]
    assert bpe_encode("", ranks) == []
    # merge application is leftmost-greedy within one merge
    assert bpe_encode("lll", merge_ranks([("l", "l")])) == ["ll", "l"]


def test_pretokenize_covers_every_byte():
    for text in (
        "the quick brown fox",
        "Hello, World!  123",
        "a\tb\nc",
        "façade 你好 -- end.",
        "",
    ):
        units = _pretokenize(text)
        assert "".join(units) == text


def test_udf_matches_reference_on_corpus(spark, sf_dir):
    merges = load_merges()
    ranks = merge_ranks(merges)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    got = {
        r["doc_id"]: r["bpe_token_count"]
        for r in with_bpe_token_count(docs, "text").collect()
    }
    want = {
        r["doc_id"]: len(bpe_encode(r["text"], ranks))
        for r in docs.collect()
    }
    assert got == want
    assert len(got) > 0


def test_udf_null_text_counts_zero(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "the table"), (3, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["bpe_token_count"]
        for r in with_bpe_token_count(df, "text").collect()
    }
    assert got[1] == 0 and got[3] == 0 and got[2] >= 1


def test_trainer_is_deterministic_and_greedy(spark):
    rows = [(i, "low lower lowest newer newest wide widest " * 2) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m1 = train_bpe_merges(df, "text", num_merges=16, max_docs=100)
    m2 = train_bpe_merges(df, "text", num_merges=16, max_docs=100)
    assert m1 == m2 and len(m1) == 16
    # every learned merge symbol pair must be constructible: each side is
    # either a single byte symbol or the concatenation of an earlier merge
    known = set(bytes_to_unicode().values())
    for left, right in m1:
        assert left in known and right in known, (left, right)
        known.add(left + right)
    # applying the merges shortens the corpus encoding monotonically
    text = rows[0][1]
    lens = [
        len(bpe_encode(text, merge_ranks(m1[:k]))) for k in (0, 4, 8, 16)
    ]
    assert lens == sorted(lens, reverse=True)


def test_trainer_guards():
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe_merges(None, "text", num_merges=0)
    with pytest.raises(ValueError, match="max_docs"):
        train_bpe_merges(None, "text", num_merges=1, max_docs=10**9)


def test_save_load_roundtrip(tmp_path):
    merges = [("h", "e"), ("he", "l"), ("Ġ", "t")]
    path = str(tmp_path / "m.txt")
    save_merges(merges, path)
    assert load_merges(path) == merges


def test_fixture_loads_and_is_nontrivial():
    merges = load_merges()
    assert len(merges) >= 64
    ranks = merge_ranks(merges)
    # corpus-vocabulary words compress below their byte length
    assert len(bpe_encode("table value scan", ranks)) < len(
        "table value scan".encode()
    )


def test_packing_accepts_bpe_counts(spark):
    # the opt-in integration: budget pack_sequences in REAL tokens
    from home_credit_data_engineering_spark.operators.packing import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(i, "the table value scan row key agg") for i in range(50)],
        "doc_id long, text string",
    )
    counted = with_bpe_token_count(df, "text")
    packed = pack_sequences(
        counted, "doc_id", "bpe_token_count", budget=64, shards=4
    )
    rows = packed.collect()
    assert len(rows) == 50
    # token_count column carried through is the REAL bpe count
    ranks = merge_ranks(load_merges())
    real = len(bpe_encode("the table value scan row key agg", ranks))
    assert all(r["token_count"] == real for r in rows)
