"""Lexical retrieval + hybrid fusion declared queries (BM25 / MLT / RRF).

Cross-engine discipline: per-term BM25 contributions round to 9 decimals
and accumulate as DECIMAL(18,9) on BOTH engines (exact, order-independent
— the operators/lm.py log-prob pattern); final scores round to 6; every
ranking tie-breaks on the id column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata

#: Fixed term panel for the BM25 showcase: a rare term ('dup', df≈26 of
#: 500 at sf0.01 — high IDF), stopword-grade common terms, and a
#: multi-term query. Shared by the Spark builder and the SQL oracle.
BM25_PANEL: tuple[tuple[int, str], ...] = (
    (0, "dup"),
    (0, "spark"),
    (1, "vector"),
    (1, "stream"),
    (2, "customer"),
    (2, "order"),
    (2, "join"),
    (3, "window"),
    (3, "agg"),
)

BM25_PANEL_VALUES = ", ".join(f"({q}, '{t}')" for q, t in BM25_PANEL)

#: BM25 SQL core over `documents` for a `qt(query_id, term)` CTE the
#: caller prepends. Lucene-variant IDF ln(1 + (N - df + .5)/(df + .5)),
#: k1=1.2, b=0.75. Produces `bm25_scored(query_id, doc_id, score)`.
BM25_SQL_CTES = """
    toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
      FROM documents),
    dls AS (
      SELECT doc_id,
             CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END AS DOUBLE) AS dl
      FROM documents),
    bm25_stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dls),
    bm25_matched AS (
      SELECT doc_id, term FROM toks
      WHERE term IN (SELECT DISTINCT term FROM qt)),
    bm25_tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM bm25_matched GROUP BY 1, 2),
    bm25_df AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
      FROM bm25_matched GROUP BY 1),
    bm25_contrib AS (
      SELECT q.query_id, tf.doc_id,
             CAST(ROUND(
               ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)),
             9) AS DECIMAL(18,9)) AS c
      FROM bm25_tf tf
      JOIN bm25_df d USING (term)
      JOIN dls l USING (doc_id)
      JOIN (SELECT DISTINCT query_id, term FROM qt) q USING (term)
      CROSS JOIN bm25_stats s),
    bm25_scored AS (
      SELECT query_id, doc_id, ROUND(CAST(SUM(c) AS DOUBLE), 6) AS score
      FROM bm25_contrib GROUP BY 1, 2)
"""


def bm25_panel_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(BM25_PANEL), schema="query_id bigint, term string"
    )


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH qt(query_id, term) AS (VALUES {BM25_PANEL_VALUES}),
    {BM25_SQL_CTES}
    SELECT query_id, doc_id, score, CAST(rk AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
      FROM bm25_scored) t
    WHERE rk <= 5
    """,
    operators=("T-ext:bm25",),
    doc="Okapi BM25 top-5 per query (operators/retrieval.py:bm25_topk; "
    "Robertson & Walker SIGIR 1994, Lucene IDF variant) over a fixed "
    "term panel mixing a rare high-IDF term with stopword-grade ones. "
    "Postings semi-join against the broadcast term panel BEFORE tf/df "
    "aggregation; doc lengths are a narrow per-row expression (no "
    "explode); N/avgdl ride a 1-row broadcast. Per-term contributions "
    "accumulate as DECIMAL(18,9) for cross-engine exactness.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.retrieval import bm25_topk

    docs = read_testdata(spark, sf_dir, "documents")
    return bm25_topk(docs, bm25_panel_df(spark), k=5).select(
        "query_id", "doc_id", "score", "rank"
    )


@register(
    "text_more_like_this",
    oracle=f"""
    WITH qt AS (
      SELECT doc_id AS query_id,
             unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
               AS term
      FROM documents WHERE doc_id % 50 = 0 AND doc_id < 2000),
    {BM25_SQL_CTES}
    SELECT query_id, doc_id, score, CAST(rk AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
      FROM bm25_scored WHERE query_id != doc_id) t
    WHERE rk <= 5
    """,
    operators=("T-ext:bm25", "T-ext:mlt"),
    doc="Query-by-document BM25 (operators/retrieval.py:more_like_this; "
    "Lucene MoreLikeThis semantics): each panel document's distinct "
    "terms form its query, the corpus is BM25-ranked against them, "
    "self-matches drop. The related-documents / near-dup-retrieval "
    "serving primitive. Fixed panel (doc_id % 50 = 0, < 2000) so query "
    "load does not scale with the corpus.",
)
def text_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.retrieval import (
        more_like_this,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    qdocs = docs.filter((F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 2000))
    return more_like_this(docs, qdocs, k=5).select(
        "query_id", "doc_id", "score", "rank"
    )


@register(
    "sim_hybrid_rrf",
    oracle=f"""
    WITH qt AS (
      SELECT doc_id AS query_id,
             unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
               AS term
      FROM documents WHERE doc_id % 50 = 0 AND doc_id < 2000),
    {BM25_SQL_CTES},
    lex AS (
      SELECT query_id, doc_id, CAST(rk AS DOUBLE) AS r
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
        FROM bm25_scored WHERE query_id != doc_id) t
      WHERE rk <= 20),
    vec AS (
      SELECT query_id, doc_id, CAST(rk AS DOUBLE) AS r
      FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY ROUND(list_cosine_similarity(
                            CAST(q.embedding AS DOUBLE[]),
                            CAST(c.embedding AS DOUBLE[])), 6) DESC,
                          c.vec_id) AS rk
        FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        WHERE q.vec_id % 50 = 0 AND q.vec_id < 2000) t
      WHERE rk <= 20),
    fused AS (
      SELECT query_id, doc_id,
             ROUND(SUM(1.0 / (60.0 + r)), 6) AS rrf_score
      FROM (SELECT * FROM lex UNION ALL SELECT * FROM vec)
      GROUP BY 1, 2)
    SELECT query_id, doc_id, rrf_score, CAST(rk AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rk
      FROM fused) t
    WHERE rk <= 5
    """,
    operators=("S-ext:rrf", "T-ext:bm25", "S-ext:ann-bruteforce"),
    doc="Hybrid search via Reciprocal Rank Fusion "
    "(operators/retrieval.py:rrf_fuse; Cormack et al. SIGIR 2009): the "
    "lexical leg is query-by-document BM25 top-20 over `documents`, the "
    "vector leg exact GEMM cosine top-20 over `embeddings` (vec_id "
    "doubles as doc_id in the synthetic corpus), fused as "
    "sum(1/(60+rank)) and re-ranked. Both legs are deterministic, so "
    "the fused ranking is EXACT-hash-verified. Legs are per-query "
    "top-k frames — the fusion shuffles only (query, doc, rank) "
    "triples.",
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.retrieval import (
        more_like_this,
        rrf_fuse,
    )
    from home_credit_data_engineering_spark.operators.similarity import (
        brute_force_topk_gemm,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    emb = read_testdata(spark, sf_dir, "embeddings")
    qdocs = docs.filter((F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 2000))
    qvecs = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    lex = more_like_this(docs, qdocs, k=20)
    vec = brute_force_topk_gemm(emb, qvecs, k=20).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([lex, vec], k=5).select(
        "query_id", "doc_id", "rrf_score", "rank"
    )


@register(
    "bm25_increment_topk",
    # FULL oracle: the incremented index must score exactly like DuckDB's
    # from-scratch BM25 over the whole corpus — the increment's exactness
    # contract (postings/doclens append, df merged as vocab state, avgdl
    # re-derived from exact integer dl sums) surfaced as a value-hash
    # gate, not just an in-repo equality test.
    oracle=f"""
    WITH qt(query_id, term) AS (VALUES {BM25_PANEL_VALUES}),
    {BM25_SQL_CTES}
    SELECT query_id, doc_id, score, CAST(rk AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
      FROM bm25_scored) t
    WHERE rk <= 5
    """,
    operators=("T-ext:bm25",),
    doc="O(Δ) incremental BM25 index maintenance (operators/retrieval.py:"
    "bm25_index_increment): a persisted index built on 3/4 of the "
    "documents absorbs the last quarter as an append-only increment "
    "(postings/doclens appended into existing term buckets, df merged "
    "as vocab-sized state, avgdl re-derived from exact integer dl "
    "sums), then serves the standard panel. The oracle recomputes BM25 "
    "from scratch over the FULL corpus, so the hash-compare certifies "
    "the increment is EXACT — bit-identical scores to a rebuild.",
)
def bm25_increment_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from home_credit_data_engineering_spark.operators.retrieval import (
        bm25_index_increment,
        bm25_query_index,
        build_bm25_index,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    idx = tempfile.mkdtemp(prefix="bm25_increment_") + "/idx"
    build_bm25_index(docs.filter(F.col("doc_id") % 4 != 1), idx, n_buckets=16)
    bm25_index_increment(docs.filter(F.col("doc_id") % 4 == 1), idx)
    return bm25_query_index(
        spark, idx, bm25_panel_df(spark), k=5, n_buckets=16
    ).select("query_id", "doc_id", "score", "rank")
