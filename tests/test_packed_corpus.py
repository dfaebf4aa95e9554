"""Packed-corpus emission (operators/packing.py:packed_corpus_frame /
write_packed_corpus + functions/bpe.py token-ID encoding): pure-Python
reference equality for the full encode→FFD→concat pipeline, invariants,
and the parquet writer round trip (VERDICT r6 missing #1)."""

from __future__ import annotations

import glob
import hashlib
import os

import pytest

from home_credit_data_engineering_spark.functions.bpe import (
    bpe_encode_ids,
    load_merges,
    merge_ranks,
    vocab_from_merges,
    with_bpe_token_ids,
)
from home_credit_data_engineering_spark.operators.packing import (
    packed_corpus_frame,
    write_packed_corpus,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "spark scan table value key agg row"),
    (3, "hello world"),
    (4, "a b c d e f g h i j k l m n o p"),
    (5, "the the the the the"),
    (6, ""),  # zero tokens -> dropped
    (7, "one more document with several words in it"),
]


def _py_packed(docs, budget, shards, seed=42):
    """Pure-Python replica of encode -> FFD -> concat."""
    merges = load_merges()
    ranks, vocab = merge_ranks(merges), vocab_from_merges(merges)

    def perm(doc_id):
        return hashlib.md5(f"s{seed}:{doc_id}".encode()).hexdigest()

    def shard_of(doc_id):
        return int(perm(doc_id)[:8], 16) % shards

    enc = {i: bpe_encode_ids(t, ranks, vocab) for i, t in docs}
    enc = {i: ids for i, ids in enc.items() if ids}
    out = {}
    for s in range(shards):
        members = sorted(
            (i for i in enc if shard_of(i) == s),
            key=lambda i: (-len(enc[i]), perm(i), i),
        )
        bins: list[int] = []  # remaining capacity
        assign: dict[int, list[int]] = {}
        for i in members:
            need = len(enc[i])
            assert need <= budget
            for b, rem in enumerate(bins):
                if rem >= need:
                    bins[b] -= need
                    assign.setdefault(b, []).append(i)
                    break
            else:
                bins.append(budget - need)
                assign.setdefault(len(bins) - 1, []).append(i)
        for b, ids_in_bin in assign.items():
            token_ids: list[int] = []
            starts, sizes = [], []
            for i in ids_in_bin:
                starts.append(len(token_ids))
                sizes.append(len(enc[i]))
                token_ids.extend(enc[i])
            out[(s, b)] = {
                "doc_ids": ids_in_bin,
                "doc_sizes": sizes,
                "doc_starts": starts,
                "token_ids": token_ids,
            }
    return out


@pytest.fixture(scope="module")
def packed(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    enc = with_bpe_token_ids(df, "text")
    return packed_corpus_frame(
        enc, "doc_id", "bpe_token_ids", budget=64, shards=2
    ).collect()


def test_packed_matches_python_reference(packed):
    ref = _py_packed(DOCS, budget=64, shards=2)
    got = {
        (r["shard"], r["bin_id"]): {
            "doc_ids": list(r["doc_ids"]),
            "doc_sizes": list(r["doc_sizes"]),
            "doc_starts": list(r["doc_starts"]),
            "token_ids": list(r["token_ids"]),
        }
        for r in packed
    }
    assert got == ref


def test_packed_invariants(packed):
    assert packed, "nonempty fixture must pack"
    for r in packed:
        assert 1 <= r["n_tokens"] <= 64
        assert r["n_tokens"] == len(r["token_ids"])
        assert r["n_docs"] == len(r["doc_ids"]) == len(r["doc_starts"])
        assert r["doc_starts"][0] == 0
        for i in range(len(r["doc_starts"]) - 1):
            assert (
                r["doc_starts"][i + 1]
                == r["doc_starts"][i] + r["doc_sizes"][i]
            )
        assert r["doc_starts"][-1] + r["doc_sizes"][-1] == r["n_tokens"]
    # conservation: every nonempty doc appears exactly once
    seen = sorted(d for r in packed for d in r["doc_ids"])
    assert seen == [1, 2, 3, 4, 5, 7]


def test_writer_round_trip_partitioned_by_shard(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = str(tmp_path / "packed")
    write_packed_corpus(df, "doc_id", out, budget=64, text_col="text", shards=2)
    assert glob.glob(os.path.join(out, "shard=*")), "hive-partitioned layout"
    back = spark.read.parquet(out)
    ref = _py_packed(DOCS, budget=64, shards=2)
    # partition-column type inference may surface `shard` as string
    got = {
        (int(r["shard"]), r["bin_id"]): list(r["token_ids"])
        for r in back.collect()
    }
    assert got == {k: v["token_ids"] for k, v in ref.items()}


def test_writer_pre_encoded_ids_path_matches_text_path(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    enc = with_bpe_token_ids(df, "text")
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    write_packed_corpus(df, "doc_id", out_a, budget=64, text_col="text", shards=2)
    write_packed_corpus(
        enc, "doc_id", out_b, budget=64, ids_col="bpe_token_ids", shards=2
    )
    key = lambda r: (int(r["shard"]), r["bin_id"])  # noqa: E731
    rows_a = {key(r): list(r["token_ids"]) for r in spark.read.parquet(out_a).collect()}
    rows_b = {key(r): list(r["token_ids"]) for r in spark.read.parquet(out_b).collect()}
    assert rows_a == rows_b


def test_writer_guards(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="exactly one"):
        write_packed_corpus(df, "doc_id", str(tmp_path / "x"), budget=64)
    with pytest.raises(ValueError, match="exactly one"):
        write_packed_corpus(
            df, "doc_id", str(tmp_path / "x"), budget=64,
            text_col="text", ids_col="bpe_token_ids",
        )


def test_pack_corpus_cli_end_to_end(spark, tmp_path):
    """jobs/pack_corpus.py: parquet in -> partitioned packed shards out,
    equal to the python reference; budget guard enforced."""
    from home_credit_data_engineering_spark.jobs.pack_corpus import (
        main as pack_main,
    )
    from home_credit_data_engineering_spark.runlog import read_run_log

    src = str(tmp_path / "docs")
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "packed")
    log = str(tmp_path / "runs.jsonl")
    rc = pack_main(
        ["--input", src, "--output", out, "--budget", "64",
         "--shards", "2", "--run-log", log]
    )
    assert rc == 0
    ref = _py_packed(DOCS, budget=64, shards=2)
    got = {
        (int(r["shard"]), r["bin_id"]): list(r["token_ids"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {k: v["token_ids"] for k, v in ref.items()}
    (record,) = read_run_log(log)
    assert record["n_docs"] == 6
    assert record["n_tokens"] == sum(
        len(v["token_ids"]) for v in ref.values()
    )
    with pytest.raises(SystemExit):
        pack_main(["--input", src, "--output", out, "--budget", "0"])


def test_ids_column_size_equals_count_column(spark):
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.functions.bpe import (
        with_bpe_token_count,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    both = with_bpe_token_count(with_bpe_token_ids(df, "text"), "text")
    bad = both.filter(
        F.size("bpe_token_ids") != F.col("bpe_token_count")
    ).count()
    assert bad == 0


def test_epoch_shuffle_is_a_deterministic_permutation(spark):
    from home_credit_data_engineering_spark.operators.packing import (
        epoch_shuffle,
    )

    bins = spark.createDataFrame(
        [(i % 4, i, f"payload{i}") for i in range(64)],
        "shard int, bin_id bigint, payload string",
    )
    out1 = epoch_shuffle(bins, epoch_seed=1, shards=8).collect()
    out2 = epoch_shuffle(bins, epoch_seed=1, shards=8).collect()
    # permutation: every input row survives exactly once, payload intact
    assert sorted((r.shard, r.bin_id, r.payload) for r in out1) == sorted(
        (i % 4, i, f"payload{i}") for i in range(64)
    )
    # per-shard positions are contiguous 1..n
    by_shard: dict[int, list[int]] = {}
    for r in out1:
        by_shard.setdefault(r.new_shard, []).append(r.position)
    for shard, positions in by_shard.items():
        assert 0 <= shard < 8
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic across runs…
    key = lambda rows: sorted((r.bin_id, r.new_shard, r.position) for r in rows)  # noqa: E731
    assert key(out1) == key(out2)
    # …and a DIFFERENT epoch seed produces a different order
    out3 = epoch_shuffle(bins, epoch_seed=2, shards=8).collect()
    assert key(out1) != key(out3)


def test_epoch_shuffle_validation(spark):
    import pytest

    from home_credit_data_engineering_spark.operators.packing import (
        epoch_shuffle,
    )

    bins = spark.createDataFrame([(0, 1)], "shard int, bin_id bigint")
    with pytest.raises(ValueError, match="shards"):
        epoch_shuffle(bins, epoch_seed=1, shards=0)
