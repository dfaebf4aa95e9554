"""Unigram-LM tokenizer (functions/unigram.py): distributed-vs-reference
bit equality, encoder properties, and the packed-corpus handoff
(unigram ids flow through write_packed_corpus / jobs.pack_corpus
unchanged — VERDICT r8 next-round #4)."""

from __future__ import annotations

import math

import pytest

from home_credit_data_engineering_spark.functions.unigram import (
    UNK_PIECE,
    load_unigram,
    save_unigram,
    train_unigram,
    train_unigram_reference,
    unigram_encode,
    unigram_encode_ids,
    unigram_token_ids_col,
    unigram_vocab_ids,
)

_CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a catalog of category theory",
    "the dog sat on the log",
    "dogs and cats and dogs and cats",
    "a logbook of the catalog",
    "theory of the category of logs",
    "mats and logs and dogs",
]
_PARAMS = dict(vocab_size=64, num_iters=3, max_piece_len=4, max_seed_pieces=256)


@pytest.fixture(scope="module")
def ref_vocab():
    return train_unigram_reference(_CORPUS, **_PARAMS)


def test_distributed_trainer_equals_reference_bitwise(spark, ref_vocab):
    df = spark.createDataFrame([(t,) for t in _CORPUS], "text string")
    got = train_unigram(df, "text", **_PARAMS)
    # same pieces, same log-probs, BIT-equal doubles (shared per-unit
    # E-step code + exact integer micro-count folds on both paths)
    assert got == ref_vocab


def test_trainer_is_deterministic_across_runs(ref_vocab):
    again = train_unigram_reference(_CORPUS, **_PARAMS)
    assert again == ref_vocab


def test_vocab_shape_and_probabilities(ref_vocab):
    logp = dict(ref_vocab)
    assert len(logp) <= _PARAMS["vocab_size"]
    # every corpus character survives pruning (segmentation stays total)
    chars = {c for t in _CORPUS for c in t if c != " "}
    assert chars <= set(logp)
    # kept pieces carry finite log-probs summing to ~1
    total = sum(math.exp(lp) for lp in logp.values() if lp > -100.0)
    assert total == pytest.approx(1.0, abs=1e-6)
    # EM favors real morphemes: 'the' and 'cat' earn multi-char pieces
    assert "the" in logp and "cat" in logp


def test_encode_is_lossless_partition(ref_vocab):
    logp = dict(ref_vocab)
    for text in _CORPUS:
        pieces = unigram_encode(text, logp, _PARAMS["max_piece_len"])
        assert "".join(pieces) == text.replace(" ", "")


def test_encode_unknown_chars_emit_unk(ref_vocab):
    logp = dict(ref_vocab)
    pieces = unigram_encode("cat Ω dog", logp, _PARAMS["max_piece_len"])
    assert UNK_PIECE in pieces
    rebuilt = "".join(p if p != UNK_PIECE else "Ω" for p in pieces)
    assert rebuilt == "catΩdog"


def test_ids_are_stable_and_round_trip(ref_vocab, tmp_path):
    logp = dict(ref_vocab)
    ids = unigram_vocab_ids(logp)
    assert ids[UNK_PIECE] == 0
    assert sorted(ids.values()) == list(range(len(logp) + 1))
    path = str(tmp_path / "unigram.vocab")
    save_unigram(ref_vocab, path)
    reloaded = load_unigram(path)
    assert reloaded == ref_vocab  # repr round-trip keeps doubles exact


def test_token_ids_col_matches_python(spark, ref_vocab):
    logp = dict(ref_vocab)
    ids = unigram_vocab_ids(logp)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id int, text string"
    )
    got = {
        r.doc_id: list(r.ids)
        for r in df.select(
            "doc_id",
            unigram_token_ids_col(
                "text", ref_vocab, _PARAMS["max_piece_len"]
            ).alias("ids"),
        ).collect()
    }
    for i, t in enumerate(_CORPUS):
        assert got[i] == unigram_encode_ids(
            t, logp, ids, _PARAMS["max_piece_len"]
        )


def test_packed_corpus_e2e_with_unigram_ids(spark, ref_vocab, tmp_path):
    """The verdict's done-criterion: unigram token ids flow through the
    packed-shard writer unchanged (same ids_col contract as BPE)."""
    from home_credit_data_engineering_spark.operators.packing import (
        write_packed_corpus,
    )

    logp = dict(ref_vocab)
    ids = unigram_vocab_ids(logp)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id bigint, text string"
    ).withColumn(
        "uids",
        unigram_token_ids_col("text", ref_vocab, _PARAMS["max_piece_len"]),
    )
    out = str(tmp_path / "packed_unigram")
    budget = 32
    write_packed_corpus(df, "doc_id", out, budget, ids_col="uids", shards=2)
    packed = spark.read.parquet(out).collect()
    expected = {
        i: unigram_encode_ids(t, logp, ids, _PARAMS["max_piece_len"])
        for i, t in enumerate(_CORPUS)
    }
    seen = {}
    for b in packed:
        assert b.n_tokens <= budget
        for doc_id, start, size in zip(b.doc_ids, b.doc_starts, b.doc_sizes):
            seen[doc_id] = list(b.token_ids[start : start + size])
    assert seen == expected


def test_pack_corpus_cli_consumes_unigram_ids(spark, ref_vocab, tmp_path):
    """jobs/pack_corpus.py --ids-col packs unigram-encoded parquet with
    zero changes — the CLI handoff."""
    from home_credit_data_engineering_spark.jobs import pack_corpus as pack_job

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id bigint, text string"
    ).withColumn(
        "uids",
        unigram_token_ids_col("text", ref_vocab, _PARAMS["max_piece_len"]),
    )
    enc_path = str(tmp_path / "encoded")
    df.select("doc_id", "uids").write.parquet(enc_path)
    out = str(tmp_path / "packed")
    rc = pack_job.main(
        [
            "--input", enc_path,
            "--output", out,
            "--ids-col", "uids",
            "--budget", "32",
            "--shards", "2",
        ]
    )
    assert rc == 0
    packed = spark.read.parquet(out)
    assert packed.count() >= 1


def test_unigram_job_train_encode_pack_chain(spark, tmp_path):
    """Full CLI chain: jobs/unigram.py --train + --encode-out, then
    jobs/pack_corpus.py --ids-col over the encoded parquet."""
    from home_credit_data_engineering_spark.jobs import pack_corpus as pack_job
    from home_credit_data_engineering_spark.jobs import unigram as unigram_job
    from home_credit_data_engineering_spark.runlog import read_run_log

    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id bigint, text string"
    ).write.parquet(docs_path)
    vocab_path = str(tmp_path / "unigram.vocab")
    enc_path = str(tmp_path / "encoded")
    run_log = str(tmp_path / "run.jsonl")
    rc = unigram_job.main(
        [
            "--input", docs_path,
            "--train",
            "--vocab-out", vocab_path,
            "--vocab-size", "64",
            "--iters", "3",
            "--max-piece-len", "4",
            "--max-seed-pieces", "256",
            "--encode-out", enc_path,
            "--run-log", run_log,
        ]
    )
    assert rc == 0
    # CLI training == library reference on the same corpus
    assert load_unigram(vocab_path) == train_unigram_reference(
        _CORPUS, **_PARAMS
    )
    rec = read_run_log(run_log)[0]
    assert rec["rows_encoded"] == len(_CORPUS)
    out = str(tmp_path / "packed")
    rc = pack_job.main(
        [
            "--input", enc_path,
            "--output", out,
            "--ids-col", "token_ids",
            "--budget", "32",
            "--shards", "2",
        ]
    )
    assert rc == 0
    packed = spark.read.parquet(out)
    from pyspark.sql import functions as F

    stats = packed.agg(
        F.sum("n_docs").alias("d"), F.max("n_tokens").alias("m")
    ).first()
    assert stats["d"] == len(_CORPUS) and stats["m"] <= 32


def test_pinned_fixture_vocab_reproducible(spark, sf_dir):
    """The committed vocab fixture is a pure function of (sf0.001 docs,
    params) — retraining the pure-Python reference reproduces it
    bit-for-bit (the BPE-merges-fixture discipline)."""
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    texts = [
        r.text
        for r in read_testdata(spark, "/root/testdata/sf0.001", "documents")
        .select("text")
        .collect()
    ]
    fixture = load_unigram()  # default = the committed fixture
    assert fixture == train_unigram_reference(
        texts, vocab_size=512, num_iters=4, max_piece_len=6,
        max_seed_pieces=4096,
    )


def test_pack_corpus_cli_unigram_tokenizer_mode(spark, tmp_path):
    """jobs/pack_corpus.py --tokenizer unigram encodes text with the
    pinned vocab fixture and packs the ids (no pre-encoding step)."""
    from home_credit_data_engineering_spark.jobs import pack_corpus as pack_job

    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id bigint, text string"
    ).write.parquet(docs_path)
    out = str(tmp_path / "packed")
    rc = pack_job.main(
        [
            "--input", docs_path,
            "--output", out,
            "--budget", "64",
            "--shards", "2",
            "--tokenizer", "unigram",
        ]
    )
    assert rc == 0
    from home_credit_data_engineering_spark.functions.unigram import (
        unigram_encode_ids,
    )

    vocab = load_unigram()  # the pinned fixture
    logp, ids = dict(vocab), unigram_vocab_ids(dict(vocab))
    expected = {
        i: unigram_encode_ids(t, logp, ids) for i, t in enumerate(_CORPUS)
    }
    seen = {}
    for b in spark.read.parquet(out).collect():
        assert b.n_tokens <= 64
        for doc_id, start, size in zip(b.doc_ids, b.doc_starts, b.doc_sizes):
            seen[doc_id] = list(b.token_ids[start : start + size])
    assert seen == expected


def test_vocab_roundtrip_with_hash_piece(tmp_path):
    """A learned '#' piece (single chars are never pruned) must survive
    save/load — comment lines are TABLESS '#' lines only."""
    vocab = [("#", -2.5), ("#a", -3.0), ("a", -1.0)]
    path = str(tmp_path / "v.vocab")
    save_unigram(vocab, path)
    assert load_unigram(path) == vocab


def test_unk_sentinel_cannot_collide_with_learned_pieces():
    """UNK_PIECE contains whitespace, so no whitespace-split unit can
    ever learn it as a piece — the reserved id-0 mapping is safe even
    for corpora containing the literal text '<unk>'."""
    assert any(c.isspace() for c in UNK_PIECE)
    vocab = train_unigram_reference(
        ["the <unk> token appears here", "the <unk> appears again here"],
        vocab_size=64, num_iters=2, max_piece_len=6, max_seed_pieces=128,
    )
    logp = dict(vocab)
    assert UNK_PIECE not in logp
    ids = unigram_vocab_ids(logp)
    assert ids[UNK_PIECE] == 0 and len(ids) == len(logp) + 1


def test_ascii_whitespace_class_matches_engines():
    """NBSP is NOT a unit separator (Java \\s and RE2 \\s are ASCII-only;
    the reference must match the engine paths, not Python's unicode
    split)."""
    from home_credit_data_engineering_spark.functions.unigram import _units

    assert _units("a b c") == ["a b", "c"]
    assert _units("  a\tb\nc  ") == ["a", "b", "c"]


def test_vt_whitespace_class_matches_oracle(spark, ref_vocab):
    # r10 review finding: RE2's \s does NOT match \x0b while Java's \s
    # (and _WS_RE) does, so the coverage oracles must spell the class
    # explicitly. Pin the parity on a VT-containing document: Spark-side
    # coverage == DuckDB's explicit-class non-whitespace char count.
    import duckdb

    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.functions.unigram import (
        unigram_stats_col,
    )

    text = "ab\x0bcd ef\tgh"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = (
        df.select(unigram_stats_col("text", ref_vocab)["coverage_chars"])
        .first()[0]
    )
    con = duckdb.connect()
    want = con.execute(
        r"select length(regexp_replace(?, '[ \t\n\x0b\f\r]+', '', 'g'))",
        [text],
    ).fetchone()[0]
    con.close()
    assert got == want == 8
