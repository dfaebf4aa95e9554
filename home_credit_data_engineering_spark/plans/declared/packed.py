"""Packed-corpus emission declared query (the trainer-facing last mile:
token-ID encoding + FFD whole-doc packing + per-bin concatenation,
``operators/packing.py:packed_corpus_frame`` — VERDICT r6 missing #1).

Twin-certificate design (the ``text_bpe_real_token_count`` mold — BPE
ids are not SQL-expressible, so the oracle pins what it CAN derive and
exact-hash-verifies a planted probe corpus):

- **planted leg**: a fixed 7-document corpus packed at budget 64 into 2
  shards. The EXPECTED bins — membership, sizes, boundary offsets, and
  the md5 of the concatenated token-ID sequence — are computed at import
  time by the pure-Python reference pipeline (``bpe_encode_ids`` + a
  first-fit replica) and embedded in the oracle as literals, so the
  driver gate hash-verifies real byte-pair ids flowing through the real
  packer into the real concatenation order.
- **corpus leg**: the documents table packed at budget 1024 into 8
  md5-shards. Per shard the oracle independently derives the document
  count (same md5-shard arithmetic, nonempty text only) and the TRUE
  expected values of the certificates the packed output must satisfy:
  capacity (no bin over budget), boundary arithmetic
  (``starts[0]=0``, ``starts[i+1]=starts[i]+sizes[i]``, last end =
  ``n_tokens``), and token conservation against an INDEPENDENT
  per-document BPE count pass.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata

#: Planted probe corpus (no apostrophes — keeps SQL literals quote-free).
_PLANTED: list[tuple[int, str]] = [
    (-1, "the quick brown fox jumps over the lazy dog"),
    (-2, "spark scan table value key agg row"),
    (-3, "hello world"),
    (-4, "a b c d e f g h i j k l m n o p"),
    (-5, "the the the the the"),
    (-6, ""),
    (-7, "one more document with several words in it"),
]

_PLANTED_BUDGET = 64
_PLANTED_SHARDS = 2
_CORPUS_BUDGET = 1024
_CORPUS_SHARDS = 8
_SEED = 42


def _py_packed_expected() -> list[tuple[int, int, int, int, str, str]]:
    """Import-time pure-Python replica of encode → first-fit → concat
    over the planted corpus: rows of (shard, bin_id, n_docs, n_tokens,
    ids_md5, starts_md5)."""
    from home_credit_data_engineering_spark.functions.bpe import (
        bpe_encode_ids,
        load_merges,
        merge_ranks,
        vocab_from_merges,
    )

    merges = load_merges()
    ranks, vocab = merge_ranks(merges), vocab_from_merges(merges)

    def perm(doc_id: int) -> str:
        return hashlib.md5(f"s{_SEED}:{doc_id}".encode()).hexdigest()

    enc = {
        i: ids
        for i, t in _PLANTED
        if (ids := bpe_encode_ids(t, ranks, vocab))
    }
    rows: list[tuple[int, int, int, int, str, str]] = []
    for s in range(_PLANTED_SHARDS):
        members = sorted(
            (i for i in enc if int(perm(i)[:8], 16) % _PLANTED_SHARDS == s),
            key=lambda i: (-len(enc[i]), perm(i), i),
        )
        bins: list[int] = []
        assign: dict[int, list[int]] = {}
        for i in members:
            need = len(enc[i])
            for b, rem in enumerate(bins):
                if rem >= need:
                    bins[b] -= need
                    assign.setdefault(b, []).append(i)
                    break
            else:
                bins.append(_PLANTED_BUDGET - need)
                assign.setdefault(len(bins) - 1, []).append(i)
        for b in sorted(assign):
            ids: list[int] = []
            starts: list[int] = []
            for i in assign[b]:
                starts.append(len(ids))
                ids.extend(enc[i])
            rows.append(
                (
                    s,
                    b,
                    len(assign[b]),
                    len(ids),
                    hashlib.md5(",".join(map(str, ids)).encode()).hexdigest(),
                    hashlib.md5(
                        ",".join(map(str, starts)).encode()
                    ).hexdigest(),
                )
            )
    return rows


_PLANTED_VALUES = ",\n      ".join(
    f"({s}, {b}, {nd}, {nt}, '{im}', '{sm}')"
    for s, b, nd, nt, im, sm in _py_packed_expected()
)

#: Boundary-arithmetic certificate over (doc_starts, doc_sizes, n_tokens).
_STARTS_OK = (
    "doc_starts[0] = 0 AND size(doc_starts) = size(doc_sizes) AND "
    "(CASE WHEN size(doc_starts) < 2 THEN true ELSE "
    "aggregate(sequence(0, size(doc_starts) - 2), true, "
    "(a, i) -> a AND doc_starts[i + 1] = doc_starts[i] + doc_sizes[i]) "
    "END) AND "
    "element_at(doc_starts, -1) + element_at(doc_sizes, -1) = n_tokens AND "
    "n_tokens = size(token_ids)"
)


def planted_packed_df(spark: SparkSession) -> DataFrame:
    """The exact-hash planted leg (shard, bin_id, n_docs, n_tokens,
    ids_md5, starts_md5, ok) — shared by :func:`text_packed_corpus` and
    the ``combo_corpus_prep`` driver slot's ``packc`` leg."""
    from home_credit_data_engineering_spark.functions.bpe import (
        with_bpe_token_ids,
    )
    from home_credit_data_engineering_spark.operators.packing import (
        packed_corpus_frame,
    )

    planted = spark.createDataFrame(_PLANTED, "doc_id long, text string")
    p_packed = packed_corpus_frame(
        with_bpe_token_ids(planted, "text"),
        "doc_id",
        "bpe_token_ids",
        budget=_PLANTED_BUDGET,
        shards=_PLANTED_SHARDS,
        seed=_SEED,
    )
    return p_packed.select(
        "shard",
        "bin_id",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "n_tokens",
        F.md5(F.concat_ws(",", F.col("token_ids")).cast("binary")).alias(
            "ids_md5"
        ),
        F.md5(F.concat_ws(",", F.col("doc_starts")).cast("binary")).alias(
            "starts_md5"
        ),
        (
            (F.col("n_tokens") <= _PLANTED_BUDGET) & F.expr(_STARTS_OK)
        ).alias("ok"),
    )


@register(
    "text_packed_corpus",
    oracle=f"""
    WITH planted(shard, bin_id, n_docs, n_tokens, ids_md5, starts_md5)
      AS (VALUES
      {_PLANTED_VALUES}),
    corpus_shards AS (
      SELECT CAST(CAST('0x' || substr(md5('s{_SEED}:' ||
                 CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                 % {_CORPUS_SHARDS} AS INTEGER) AS shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents
      WHERE text IS NOT NULL AND text != ''
      GROUP BY 1)
    SELECT 'planted' AS leg, shard, bin_id,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ids_md5, starts_md5, TRUE AS ok
    FROM planted
    UNION ALL
    SELECT 'corpus', shard, -1, n_docs,
           CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), TRUE
    FROM corpus_shards
    """,
    operators=("T-ext:packed-corpus", "T-ext:bpe-real", "T-ext:pack-whole"),
    doc="Packed training shards (operators/packing.py:packed_corpus_frame "
    "— token-ID encode, FFD whole-doc assignment, per-bin concatenation "
    "with boundary offsets; written by write_packed_corpus / "
    "jobs/pack_corpus.py). Planted leg: a 7-doc probe corpus whose "
    "expected bins — membership, token totals, and the md5 of the "
    "concatenated token-ID sequence and of the boundary offsets — are "
    "computed at import time by the pure-Python reference encoder+packer "
    "and exact-hash-verified. Corpus leg: per md5-shard doc counts the "
    "oracle derives independently plus capacity / boundary-arithmetic / "
    "token-conservation certificates (conservation checked against an "
    "independent BPE count pass). The payload concat is one hash "
    "aggregate keyed (shard, bin); each group is budget-bounded.",
)
def text_packed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.bpe import (
        bpe_token_count_col,
        with_bpe_token_ids,
    )
    from home_credit_data_engineering_spark.operators.packing import (
        packed_corpus_frame,
    )

    # --- planted leg: exact-hash of ids + boundaries per bin ---
    p_leg = planted_packed_df(spark).select(
        F.lit("planted").alias("leg"),
        "shard",
        "bin_id",
        "n_docs",
        "n_tokens",
        "ids_md5",
        "starts_md5",
        "ok",
    )

    # --- corpus leg: per-shard counts + certificates ---
    docs = read_testdata(spark, sf_dir, "documents")
    c_packed = packed_corpus_frame(
        with_bpe_token_ids(docs, "text"),
        "doc_id",
        "bpe_token_ids",
        budget=_CORPUS_BUDGET,
        shards=_CORPUS_SHARDS,
        seed=_SEED,
    )
    per_shard = c_packed.groupBy("shard").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").alias("__tok_total"),
        (F.max("n_tokens") <= _CORPUS_BUDGET).alias("__no_overflow"),
        F.min(F.expr(_STARTS_OK)).alias("__starts_ok"),
    )
    # independent conservation side: per-doc BPE counts, same md5 shard
    shard_expr = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"s{_SEED}:"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _CORPUS_SHARDS
    ).cast("int")
    indep = (
        docs.select(
            shard_expr.alias("shard"),
            bpe_token_count_col("text").alias("__n"),
        )
        .filter(F.col("__n") >= 1)
        .groupBy("shard")
        .agg(F.sum("__n").alias("__indep_total"))
    )
    c_leg = per_shard.join(indep, "shard").select(
        F.lit("corpus").alias("leg"),
        "shard",
        F.lit(-1).alias("bin_id"),
        "n_docs",
        F.lit(None).cast("bigint").alias("n_tokens"),
        F.lit(None).cast("string").alias("ids_md5"),
        F.lit(None).cast("string").alias("starts_md5"),
        (
            F.col("__no_overflow")
            & F.col("__starts_ok")
            & (F.col("__tok_total") == F.col("__indep_total"))
        ).alias("ok"),
    )
    return p_leg.unionByName(c_leg)
