"""Similarity-search declared queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.similarity import (
    brute_force_topk_gemm,
    lsh_topk,
)
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata


@register(
    "sim_bruteforce_topk",
    oracle="""
    SELECT query_id, neighbor_id, score, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[])), 6) DESC,
                        c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id % 50 = 0 AND q.vec_id < 2000) t
    WHERE rank <= 5
    """,
    operators=("S-ext:ann-bruteforce",),
    doc="Exact cosine top-5 for the query subset (vec_id % 50 = 0): "
    "Arrow-batched numpy GEMM per corpus batch with partial top-k "
    "(mapInPandas), merged by an exact window top-k. Ranking is "
    "deterministic: (round(score,6) DESC, id ASC).",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    # Fixed query panel (ids < 2000): query load must NOT scale with the
    # corpus — at 10x data the experiment is corpus scaling, not 10x more
    # queries. No-op at the base SFs (all ids < 2000 there).
    queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    return brute_force_topk_gemm(emb, queries, k=5).select(
        "query_id", "neighbor_id", "score", "rank"
    )


@register(
    "sim_lsh_topk",
    oracle=None,  # approximate by design → rows-only; recall pinned in tests
    operators=("S-ext:ann-lsh",),
    doc="Approximate top-5 via multi-table random-hyperplane LSH: bucket "
    "equi-joins replace the full cross product; exact cosine re-ranks "
    "candidates. The scale path when the query set is large.",
)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    # Fixed query panel (ids < 2000): query load must NOT scale with the
    # corpus — at 10x data the experiment is corpus scaling, not 10x more
    # queries. No-op at the base SFs (all ids < 2000 there).
    queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    return lsh_topk(emb, queries, dim=64, k=5, n_bits=10, n_tables=4).select(
        "query_id", "neighbor_id", "score", "rank"
    )
