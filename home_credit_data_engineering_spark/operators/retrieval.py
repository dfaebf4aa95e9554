"""Lexical retrieval (Okapi BM25) and hybrid rank fusion (RRF).

The reference engine has no full-text retrieval surface; this is
north-star extension territory for a training-data / RAG pipeline:

- :func:`bm25_topk` — Okapi BM25 (Robertson & Walker, SIGIR 1994; the
  Lucene ``BM25Similarity`` IDF variant ``ln(1 + (N - df + .5)/(df + .5))``)
  top-k documents per query over a whitespace-tokenized corpus.
- :func:`more_like_this` — query-by-document BM25: each query *document*'s
  distinct terms form its term set (Lucene MoreLikeThis semantics), useful
  for near-duplicate retrieval and "related documents" serving.
- :func:`rrf_fuse` — Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
  SIGIR 2009): ``score(d) = Σ_legs 1 / (k_rrf + rank_leg(d))``, the
  standard way to hybridize lexical (BM25) and vector (cosine ANN)
  rankings without score calibration.

100 TB posture
--------------
The corpus is tokenized ONCE into ``(doc_id, term)`` postings; the text
column never rides any exchange after that projection. Query term sets
are small by contract and broadcast; the postings stream is semi-joined
against them FIRST, so only matching postings (≪ corpus tokens for
selective queries) reach the tf/df aggregations. Document lengths are a
narrow per-row expression on the scan (no explode); N and avgdl are one
scalar aggregate broadcast via a 1-row cross join. ``max_df_fraction``
prunes stopword-grade terms (Lucene MLT practice) so a common term cannot
drag the whole corpus into the score join. Final per-query top-k is a
window over an already-aggregated (query, doc) frame.

Determinism: scores round to 6 decimals; ranking ties break on doc id —
the same cross-engine discipline as operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from home_credit_data_engineering_spark.functions.text import token_count, tokens


def _postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term) postings — one narrow explode, text dropped."""
    return docs.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(text_col)).alias("__term")
    )


def _corpus_stats(docs: DataFrame, id_col: str, text_col: str):
    """(doc-length frame, 1-row scalars frame): dl per doc; N and avgdl."""
    dls = docs.select(
        F.col(id_col).alias("__doc"),
        token_count(text_col).cast("double").alias("__dl"),
    )
    scalars = dls.agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
    )
    return dls, scalars


def bm25_scores(
    docs: DataFrame,
    query_terms: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_fraction: float = 1.0,
) -> DataFrame:
    """BM25 score for every (query, matching document) pair.

    ``query_terms`` is a small frame of ``(query_id, term)`` rows (one row
    per query term; duplicate terms within a query are collapsed — BM25
    sums each distinct term's contribution once, per Robertson's model).
    Output: ``(query_id, doc_id, score)`` with score rounded to 6.
    """
    toks = _postings(docs, id_col, text_col)
    qterms = (
        query_terms.select(
            F.col(query_id_col).alias("__q"), F.col(term_col).alias("__term")
        )
        .distinct()
    )
    term_panel = qterms.select("__term").distinct()

    # Only postings whose term appears in SOME query survive the scan.
    matched = toks.join(F.broadcast(term_panel), "__term")
    tf = matched.groupBy("__doc", "__term").agg(
        F.count(F.lit(1)).cast("double").alias("__tf")
    )
    df_counts = matched.groupBy("__term").agg(
        F.countDistinct("__doc").cast("double").alias("__df")
    )

    dls, scalars = _corpus_stats(docs, id_col, text_col)
    per_pair = _score_postings(
        tf, df_counts, dls, scalars, qterms,
        k1=k1, b=b, max_df_fraction=max_df_fraction,
    )
    return per_pair.select(
        F.col("__q").alias(query_id_col),
        F.col("__doc").alias(id_col),
        "score",
    )


def _score_postings(
    tf: DataFrame,
    df_counts: DataFrame,
    dls: DataFrame,
    scalars: DataFrame,
    qterms: DataFrame,
    *,
    k1: float,
    b: float,
    max_df_fraction: float,
) -> DataFrame:
    """Shared BM25 scorer over prepared frames: ``tf(__doc, __term,
    __tf)``, ``df_counts(__term, __df)``, ``dls(__doc, __dl)``,
    ``scalars(__n_docs, __avgdl)`` (1 row), ``qterms(__q, __term)``.
    Returns ``(__q, __doc, score)``."""
    scored = (
        tf.join(F.broadcast(df_counts), "__term")
        .join(dls, "__doc")
        .crossJoin(F.broadcast(scalars))  # 1-row scalar totals
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
            ),
        )
    )
    if max_df_fraction < 1.0:
        scored = scored.filter(
            F.col("__df") <= F.lit(float(max_df_fraction)) * F.col("__n_docs")
        )
    # Per-term contribution rounds to 9 decimals and accumulates as
    # DECIMAL(18,9) — exact and order-independent, so the cross-engine
    # hash survives double-summation-order differences (the lm.py
    # log-prob discipline).
    contrib = scored.withColumn(
        "__contrib",
        F.round(
            F.col("__idf")
            * (F.col("__tf") * F.lit(k1 + 1.0))
            / (
                F.col("__tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
            ),
            9,
        ).cast("decimal(18,9)"),
    )
    return (
        contrib.join(F.broadcast(qterms), "__term")
        .groupBy("__q", "__doc")
        .agg(F.round(F.sum("__contrib").cast("double"), 6).alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_fraction: float = 1.0,
) -> DataFrame:
    """Top-k BM25 documents per query: ``(query_id, doc_id, score, rank)``."""
    scored = bm25_scores(
        docs,
        query_terms,
        id_col=id_col,
        text_col=text_col,
        query_id_col=query_id_col,
        term_col=term_col,
        k1=k1,
        b=b,
        max_df_fraction=max_df_fraction,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )


def more_like_this(
    docs: DataFrame,
    query_docs: DataFrame,
    k: int = 5,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_fraction: float = 1.0,
    include_self: bool = False,
) -> DataFrame:
    """Query-by-document BM25 (Lucene MoreLikeThis semantics).

    Each query document's DISTINCT whitespace terms form its query term
    set; the corpus is ranked by BM25 against that set. The query panel
    must be small (it is broadcast). Self-matches are dropped unless
    ``include_self``. Output: ``(query_id, doc_id, score, rank)``.
    """
    qterms = query_docs.select(
        F.col(id_col).alias("query_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    )
    ranked = bm25_scores(
        docs,
        qterms,
        id_col=id_col,
        text_col=text_col,
        k1=k1,
        b=b,
        max_df_fraction=max_df_fraction,
    )
    if not include_self:
        ranked = ranked.filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    *,
    k_rrf: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal Rank Fusion over ≥2 per-query rankings.

    Each input carries ``(query_id, doc_id, rank)`` (extra columns are
    dropped). Fused score ``Σ 1/(k_rrf + rank)`` — a document absent from
    a leg simply contributes nothing (the standard RRF treatment). The
    fused frame re-ranks deterministically on (round(score, 6) DESC, id).
    Output: ``(query_id, doc_id, rrf_score, rank)``.

    Scale: inputs are already per-query top-k frames (tiny relative to the
    corpus), so the union + groupBy shuffles only (query, doc, rank)
    triples.
    """
    if len(rankings) < 2:
        raise ValueError("rrf_fuse needs at least two rankings")
    legs = [
        r.select(
            F.col(query_id_col).alias("__q"),
            F.col(id_col).alias("__doc"),
            F.col(rank_col).cast("double").alias("__rank"),
        )
        for r in rankings
    ]
    unioned = legs[0]
    for leg in legs[1:]:
        unioned = unioned.unionByName(leg)
    fused = unioned.groupBy("__q", "__doc").agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("__rank"))), 6).alias(
            "rrf_score"
        )
    )
    w = Window.partitionBy("__q").orderBy(
        F.col("rrf_score").desc(), F.col("__doc").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__q").alias(query_id_col),
            F.col("__doc").alias(id_col),
            "rrf_score",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Persisted lexical index (the postings tables as corpus state)
# ---------------------------------------------------------------------------


def term_bucket(col: Column | str, n_buckets: int) -> Column:
    """Deterministic term → partition bucket (xxhash64 mod n)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")


def build_bm25_index(
    docs: DataFrame,
    output: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> None:
    """Tokenize ONCE and persist the BM25 corpus state.

    Layout (all parquet):

    - ``postings/`` — (term, doc_id, tf) partitioned by
      ``bucket = xxhash64(term) % n_buckets``: query-time scans
      partition-prune to the query terms' buckets (the IVF-cell trick
      applied to a lexical index).
    - ``df/`` — (term, df) under the same bucket partitioning.
    - ``doclens/`` — (doc_id, dl).
    - ``stats/`` — one row (n_docs, avgdl).

    At 100 TB this is the honest production shape: the corpus is
    tokenized once per ingest (not per query batch), and a query touches
    |query-term buckets| / n_buckets of the postings — the same pruning
    contract as the IVF index (plan-asserted in tests).
    """
    toks = _postings(docs, id_col, text_col)
    tf = toks.groupBy("__doc", "__term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    (
        tf.select(
            F.col("__term").alias("term"),
            F.col("__doc").alias("doc_id"),
            "tf",
            term_bucket("__term", n_buckets).alias("bucket"),
        )
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{output}/postings")
    )
    dfc = toks.groupBy("__term").agg(
        F.countDistinct("__doc").cast("double").alias("df")
    )
    (
        dfc.select(
            F.col("__term").alias("term"),
            "df",
            term_bucket("__term", n_buckets).alias("bucket"),
        )
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{output}/df")
    )
    dls, scalars = _corpus_stats(docs, id_col, text_col)
    dls.select(F.col("__doc").alias("doc_id"), F.col("__dl").alias("dl")).write.mode(
        "overwrite"
    ).parquet(f"{output}/doclens")
    scalars.select(
        F.col("__n_docs").alias("n_docs"), F.col("__avgdl").alias("avgdl")
    ).write.mode("overwrite").parquet(f"{output}/stats")


def _index_scores(
    spark,
    index_path: str,
    query_terms: DataFrame,
    *,
    n_buckets: int,
    query_id_col: str,
    term_col: str,
    k1: float,
    b: float,
    max_df_fraction: float,
) -> DataFrame:
    """Shared index-backed scorer: (query_id, doc_id, score) from the
    persisted postings. The query terms' bucket set is computed
    driver-side (the panel is small by contract) and pushed into the
    postings/df scans as a partition filter — only the matching
    buckets' files are read, so query cost scales with |query-term
    buckets|, not corpus size."""
    qterms = (
        query_terms.select(
            F.col(query_id_col).alias("__q"), F.col(term_col).alias("__term")
        )
        .distinct()
    )
    buckets = sorted(
        {
            r["__b"]
            for r in qterms.select(
                term_bucket("__term", n_buckets).alias("__b")
            )
            .distinct()
            .collect()
        }
    )
    term_panel = qterms.select("__term").distinct()

    postings = (
        spark.read.parquet(f"{index_path}/postings")
        .filter(F.col("bucket").isin(buckets))
        .join(
            F.broadcast(term_panel.withColumnRenamed("__term", "term")), "term"
        )
    )
    tf = postings.select(
        F.col("doc_id").alias("__doc"),
        F.col("term").alias("__term"),
        F.col("tf").alias("__tf"),
    )
    dfc = (
        spark.read.parquet(f"{index_path}/df")
        .filter(F.col("bucket").isin(buckets))
        .join(
            F.broadcast(term_panel.withColumnRenamed("__term", "term")), "term"
        )
        .select(F.col("term").alias("__term"), F.col("df").alias("__df"))
    )
    dls = spark.read.parquet(f"{index_path}/doclens").select(
        F.col("doc_id").alias("__doc"), F.col("dl").alias("__dl")
    )
    scalars = spark.read.parquet(f"{index_path}/stats").select(
        F.col("n_docs").alias("__n_docs"), F.col("avgdl").alias("__avgdl")
    )
    return _score_postings(
        tf, dfc, dls, scalars, qterms,
        k1=k1, b=b, max_df_fraction=max_df_fraction,
    ).select(
        F.col("__q").alias(query_id_col),
        F.col("__doc").alias("doc_id"),
        "score",
    )


def bm25_query_index(
    spark,
    index_path: str,
    query_terms: DataFrame,
    k: int = 5,
    *,
    n_buckets: int = 64,
    query_id_col: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_fraction: float = 1.0,
) -> DataFrame:
    """Top-k BM25 from a persisted index — identical results to
    :func:`bm25_topk` over the same corpus (asserted in tests)."""
    scored = _index_scores(
        spark,
        index_path,
        query_terms,
        n_buckets=n_buckets,
        query_id_col=query_id_col,
        term_col=term_col,
        k1=k1,
        b=b,
        max_df_fraction=max_df_fraction,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )


def more_like_this_index(
    spark,
    index_path: str,
    query_docs: DataFrame,
    k: int = 5,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_fraction: float = 1.0,
    include_self: bool = False,
) -> DataFrame:
    """Query-by-document BM25 against a PERSISTED index (VERDICT r6 #5):
    identical results to :func:`more_like_this` over the corpus the
    index was built from (asserted in tests), but only the query docs
    are tokenized per call — the corpus postings are read back from the
    bucketed index with partition pruning to the query terms' buckets.
    The serving shape for "related documents" at 100 TB: per-query cost
    tracks |query-term buckets|, not corpus size.
    """
    qterms = query_docs.select(
        F.col(id_col).alias("query_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    )
    scored = _index_scores(
        spark,
        index_path,
        qterms,
        n_buckets=n_buckets,
        query_id_col="query_id",
        term_col="term",
        k1=k1,
        b=b,
        max_df_fraction=max_df_fraction,
    )
    if not include_self:
        scored = scored.filter(F.col("query_id") != F.col("doc_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )
