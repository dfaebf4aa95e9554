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

import os

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
        # exact (dl values are integer-valued doubles, so the sum is
        # order-independent); the increment path's avgdl seed
        F.sum("__dl").alias("__total_dl"),
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
    # total_dl and n_buckets ride along for the O(Δ) increment path
    # (bm25_index_increment): dl values are integer-valued doubles, so
    # their sum is EXACT and avgdl can be re-derived bit-identically
    # after an append (sum'/count' — the same single division avg()
    # performs); the bucket count pins the partitioning so increments
    # can never hash terms into the wrong buckets. The query path reads
    # only (n_docs, avgdl), so pre-existing indexes stay readable.
    scalars.select(
        F.col("__n_docs").alias("n_docs"),
        F.col("__avgdl").alias("avgdl"),
        F.col("__total_dl").alias("total_dl"),
        F.lit(n_buckets).alias("n_buckets"),
    ).write.mode("overwrite").parquet(f"{output}/stats")
    from home_credit_data_engineering_spark.sources.maintenance import (
        write_state_layout,
    )

    write_state_layout(output, "batch", "bm25")


def bm25_index_increment(
    new_docs: DataFrame,
    index_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
) -> dict:
    """Fold a batch of NEW documents into a persisted BM25 index in
    O(Δ + vocab) — no corpus re-tokenization, no postings rewrite.

    Unlike the ANN increment (``ann_state.py``, whose frozen centroids
    make it an approximation of a retrain), this one is EXACT: the four
    index legs are all either doc-keyed appends or small mergeable
    aggregates, so query results after any number of increments are
    row-identical to a full rebuild over the union (asserted in tests):

    - ``postings/`` (term, doc_id, tf) — append into the term-hash
      bucket partitions; old files untouched.
    - ``doclens/`` (doc_id, dl) — append.
    - ``df/`` — vocab-sized state: stored df + per-term delta counts,
      re-summed and swapped in two-phase (df values are integer-valued
      doubles, so the sums are exact in any order).
    - ``stats/`` — avgdl re-derived as total_dl'/n_docs' from the exact
      integer sums build_bm25_index stores, the same single division
      ``avg()`` performs, hence bit-identical to a rebuild. (A pre-r11
      index without ``total_dl`` reconstructs it as
      ``round(avgdl·n_docs)`` — exact while total_dl < 2^52.)

    The bucket count is pinned by the index (``stats.n_buckets``);
    passing a conflicting ``n_buckets`` raises rather than silently
    hashing new terms into the wrong partitions. Ids must be new (the
    incremental-state contract: re-ingesting a known doc id double
    counts it). The fold is REPLAY-IDEMPOTENT and crash-atomic via the
    processed-delta ledger (``sources/maintenance.py``): a re-run of a
    completed fold returns the original report with ``replayed=True``;
    the postings/doclens appends publish deterministically-named files
    out of a staged ``_incoming/{fp}`` directory, and the df/stats
    merge-swaps commit together under a two-state ledger marker, so a
    crash at any point either replays the whole fold convergently or
    completes it on the next run.

    Returns ``{"docs_added", "terms_touched", "n_docs", "avgdl"}``.
    """
    from home_credit_data_engineering_spark.sources.maintenance import (
        assert_layout_if_marked,
        begin_fold_commit,
        check_state_layout,
        delta_fingerprint,
        finish_fold_commit,
        incoming_delta_path,
        publish_delta_files,
        read_fold_marker,
        recover_fold_commits,
        recover_state_swap,
        staged_state_path,
        swap_in_state,
    )

    spark = new_docs.sparkSession
    # Two-phase layout guard: an EXPLICIT marker mismatch raises before
    # anything touches the tree; the legacy-tree inference (which reads
    # the stats leg) runs only after recovery, so it never reads a leg
    # that is mid-swap. Then recovery: finish any fold that crashed
    # mid-commit (its completed staged legs must swap in, which the
    # generic recovery below would instead discard), then the generic
    # rule for swaps outside a fold commit.
    assert_layout_if_marked(index_path, "batch", "bm25")
    recover_fold_commits(
        index_path, [f"{index_path}/df", f"{index_path}/stats"]
    )
    for leg in ("df", "stats"):
        recover_state_swap(f"{index_path}/{leg}")
    check_state_layout(
        index_path, "batch", "bm25",
        inferred_maintainer=(
            "streamed"
            if any(
                d.startswith("batch=")
                for d in (
                    os.listdir(f"{index_path}/stats")
                    if os.path.isdir(f"{index_path}/stats")
                    else ()
                )
            )
            else "batch"
        ),
    )
    stats_row = spark.read.parquet(f"{index_path}/stats").first()
    stored_buckets = (
        int(stats_row["n_buckets"])
        if "n_buckets" in stats_row.__fields__
        else None
    )
    if n_buckets is not None and stored_buckets is not None:
        if n_buckets != stored_buckets:
            raise ValueError(
                f"index was built with n_buckets={stored_buckets}, "
                f"got {n_buckets}"
            )
    n_buckets = stored_buckets or n_buckets or 64

    fp = delta_fingerprint(new_docs, [id_col, text_col])
    done = read_fold_marker(index_path, fp)
    if done is not None:
        return {**done["report"], "replayed": True}

    # one tokenization pass: tf rows are distinct (doc, term), so the
    # df delta is a row count per term — no second countDistinct scan
    tf = (
        _postings(new_docs, id_col, text_col)
        .groupBy("__doc", "__term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .localCheckpoint(eager=True)
    )
    postings_inc = incoming_delta_path(f"{index_path}/postings", fp)
    tf.select(
        F.col("__term").alias("term"),
        F.col("__doc").alias("doc_id"),
        "tf",
        term_bucket("__term", n_buckets).alias("bucket"),
    ).repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(postings_inc)
    publish_delta_files(postings_inc, f"{index_path}/postings", fp)

    delta_df = tf.groupBy("__term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    ).select(F.col("__term").alias("term"), "df")
    terms_touched = delta_df.count()
    merged_df = (
        spark.read.parquet(f"{index_path}/df")
        .select("term", "df")
        .unionByName(delta_df)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .withColumn("bucket", term_bucket("term", n_buckets))
    )
    df_path = f"{index_path}/df"
    merged_df.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(staged_state_path(df_path))

    dls, scalars = _corpus_stats(new_docs, id_col, text_col)
    doclens_inc = incoming_delta_path(f"{index_path}/doclens", fp)
    dls.select(
        F.col("__doc").alias("doc_id"), F.col("__dl").alias("dl")
    ).write.mode("overwrite").parquet(doclens_inc)
    publish_delta_files(doclens_inc, f"{index_path}/doclens", fp)

    delta = scalars.first()
    old_n = float(stats_row["n_docs"])
    old_total = (
        float(stats_row["total_dl"])
        if "total_dl" in stats_row.__fields__
        else float(round(stats_row["avgdl"] * old_n))
    )
    new_n = old_n + float(delta["__n_docs"] or 0.0)
    new_total = old_total + float(delta["__total_dl"] or 0.0)
    stats_path = f"{index_path}/stats"
    spark.createDataFrame(
        [(new_n, new_total / new_n if new_n else 0.0, new_total, n_buckets)],
        "n_docs double, avgdl double, total_dl double, n_buckets int",
    ).coalesce(1).write.mode("overwrite").parquet(
        staged_state_path(stats_path)
    )
    report = {
        "docs_added": int(delta["__n_docs"] or 0),
        "terms_touched": int(terms_touched),
        "n_docs": int(new_n),
        "avgdl": (new_total / new_n) if new_n else 0.0,
        "delta_fingerprint": fp,
    }
    # both read-modify-write legs are staged; commit them together
    # under the ledger marker so a crash between the swaps is finished
    # (not half-applied) by recover_fold_commits on the next run
    begin_fold_commit(index_path, fp, {"report": report})
    swap_in_state(df_path)
    swap_in_state(stats_path)
    finish_fold_commit(index_path, fp)
    return report


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
    # group-sum per term: the batch-maintained layout stores one row per
    # term (sum = identity), the streaming layout stores one DELTA row
    # per (term, batch) — integer-valued double counts, so the sum is
    # exact in any order and both layouts score identically
    dfc = (
        spark.read.parquet(f"{index_path}/df")
        .filter(F.col("bucket").isin(buckets))
        .join(
            F.broadcast(term_panel.withColumnRenamed("__term", "term")), "term"
        )
        .select(F.col("term").alias("__term"), F.col("df").alias("__df"))
        .groupBy("__term")
        .agg(F.sum("__df").alias("__df"))
    )
    dls = spark.read.parquet(f"{index_path}/doclens").select(
        F.col("doc_id").alias("__doc"), F.col("dl").alias("__dl")
    )
    stats = spark.read.parquet(f"{index_path}/stats")
    if "total_dl" in stats.columns:
        # merge-friendly: sum the per-batch rows (a single-row batch
        # layout is the identity case) and re-derive avgdl as the same
        # single division avg() performs — bit-identical either way,
        # because total_dl is an exact integer-valued sum
        scalars = stats.agg(
            F.sum("n_docs").alias("__n_docs"),
            (F.sum("total_dl") / F.sum("n_docs")).alias("__avgdl"),
        )
    else:  # pre-r11 stats: one row, stored avgdl
        scalars = stats.select(
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
