"""Signature-based dedup declared queries (MinHash-LSH, SimHash,
embedding near-dup).

MinHash/SimHash signatures hash with Spark's ``xxhash64`` — engine-specific
bits, so those queries are rows-only checks per the driver contract; their
*verification* math (exact Jaccard) is oracle-checked by
``dedup_ngram_jaccard`` (declared/text.py), and recall against exact
Jaccard is pinned by unit tests (tests/test_dedup_similarity.py).
The embedding near-dup query is exact arithmetic → full oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.dedup import (
    embedding_near_pairs,
    minhash_dedup,
    simhash_near_pairs,
    simhash_signatures,
)
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata


@register(
    "dedup_minhash_lsh",
    oracle=None,  # xxhash64 signatures are engine-specific → rows-only
    operators=("D-ext:minhash-lsh",),
    doc="MinHash(32) + LSH(8 bands) candidate generation + exact Jaccard "
    "verification at 0.2. Shuffle volume is per-bucket (no all-pairs).",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    return minhash_dedup(
        docs, "doc_id", "text", num_hashes=32, bands=8, shingle_k=3, threshold=0.2
    )


@register(
    "dedup_simhash",
    oracle=None,  # xxhash64 signatures are engine-specific → rows-only
    operators=("D-ext:simhash",),
    doc="64-bit SimHash near-dup pairs at Hamming ≤ 3, candidates via "
    "pigeonhole chunk blocking (4 equi-joins, never a cross product).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    sigs = simhash_signatures(docs, "doc_id", "text")
    return simhash_near_pairs(sigs, max_hamming=3)


@register(
    "dedup_embedding_neardup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS score
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
    """,
    operators=("D-ext:embedding",),
    doc="Embedding near-duplicate pairs (cosine ≥ 0.35), blocked by label "
    "— the blocked-pairs shape used at scale (block key would be an LSH "
    "bucket on a real corpus).",
)
def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.vectors import cosine

    emb = read_testdata(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("label"), F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va")
    )
    b = emb.select(
        F.col("label"), F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb")
    )
    return (
        a.join(b, on="label")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", F.round(cosine(F.col("__va"), F.col("__vb")), 6))
        .filter(F.col("score") >= 0.35)
        .select("id_a", "id_b", "score")
    )


@register(
    "dedup_semantic",
    oracle="""
    SELECT a.vec_id, a.label AS cluster,
           NOT EXISTS (
             SELECT 1 FROM embeddings b
             WHERE b.label = a.label AND b.vec_id < a.vec_id
               AND ROUND(list_cosine_similarity(
                     CAST(a.embedding AS DOUBLE[]),
                     CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
           ) AS kept
    FROM embeddings a
    """,
    operators=("D-ext:embedding",),
    doc="SemDeDup-style semantic dedup (arXiv:2303.09540): within each "
    "cluster, drop every vector with a smaller-id neighbor at cosine >= "
    "0.35 (min-id survivor per epsilon-neighborhood — deterministic and "
    "order-free, unlike the paper's centroid-distance heuristic). "
    "Blocked by the label column here so the verdict is fully "
    "oracle-verifiable; the production form swaps in the seeded-KMeans "
    "coarse quantizer (engine-specific assignment), pinned by planted-"
    "cluster unit tests.",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.dedup import semantic_dedup

    emb = read_testdata(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.35, cluster_col="label"
    )


@register(
    "text_winnowing_fingerprints",
    oracle=None,  # xxhash64 fingerprints are engine-specific -> rows-only
    operators=("T-ext:winnowing",),
    doc="Winnowing (MOSS) document fingerprints: rolling k-gram hashes + "
    "sliding-window minima, distinct per doc. Guarantees shared substrings "
    "of >= window+k-1 tokens produce shared fingerprints (partial-overlap "
    "detection). Behavior pinned by planted-overlap unit tests.",
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs, "doc_id", "text")


@register(
    "text_winnowing_md5",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
            FROM documents)
    ),
    grams AS (
      SELECT doc_id, pos,
             md5(tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w) AS fp,
             lead(tok, 2) OVER w AS last_lead
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    winnowed AS (
      SELECT doc_id,
             MIN(fp) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fingerprint
      FROM grams WHERE last_lead IS NOT NULL
    )
    SELECT DISTINCT doc_id, fingerprint FROM winnowed
    """,
    operators=("T-ext:winnowing", "T-ext:fingerprint"),
    doc="Winnowing with cross-engine md5 hashes and lexicographic window "
    "minima — the oracle-verifiable twin of text_winnowing_fingerprints "
    "(same MOSS scheme; xxhash64 stays the fast path).",
)
def text_winnowing_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.dedup import (
        winnowing_fingerprints_md5,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    return winnowing_fingerprints_md5(docs, "doc_id", "text")


@register(
    "dedup_canonical_best",
    oracle="""
    WITH c AS (
      SELECT doc_id, n_chars,
             CASE WHEN canon = '' THEN md5(lower(trim(text)))
                  ELSE md5(canon) END AS cluster_id
      FROM (
        SELECT doc_id, n_chars, text,
               trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 \\t\\n\\r\\f]', '', 'g'),
                 '[ \\t\\n\\r\\f]+', ' ', 'g')) AS canon
        FROM documents) t0
    ),
    r AS (
      SELECT doc_id, cluster_id, n_chars AS score,
             FIRST_VALUE(doc_id) OVER (
               PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC
             ) AS keep_id
      FROM c
    )
    SELECT doc_id, cluster_id, score, keep_id,
           (doc_id = keep_id) AS is_survivor
    FROM r
    """,
    operators=("D-ext:survivor-policy", "T-ext:fingerprint"),
    doc="Policy-based dedup survivors (operators/dedup.py:"
    "survivors_by_score): documents cluster by CANONICAL-form "
    "fingerprint (lowercase, punctuation stripped, whitespace "
    "collapsed — case/spacing variants share a key) and each cluster "
    "keeps its longest member (n_chars, ties to smallest id) rather "
    "than the smallest id — the keep-the-best-variant policy real "
    "pipelines want. min_by over struct(-score, id): one aggregate "
    "per cluster, ids+scores only through every shuffle; the oracle "
    "derives the identical survivor with a window.",
)
def dedup_canonical_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.text import (
        canonical_fingerprint,
    )
    from home_credit_data_engineering_spark.operators.dedup import (
        survivors_by_score,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    members = docs.select(
        "doc_id", canonical_fingerprint("text").alias("cluster_id")
    )
    scores = docs.select("doc_id", F.col("n_chars").alias("score"))
    return survivors_by_score(members, scores)


@register(
    "dedup_minhash_collapsed",
    oracle=None,  # xxhash64 signatures are engine-specific → rows-only
    operators=("D-ext:minhash-lsh",),
    doc="Collapse-exact-first MinHash-LSH "
    "(operators/dedup.py:minhash_dedup_collapsed): exact byte-duplicates "
    "collapse to one representative before signatures/banding, verified "
    "pairs expand back over group members. Pair-set ≡ the default "
    "pipeline (identical text ⇒ identical signatures ⇒ identical pair "
    "decisions; asserted in test_dedup_similarity) with d× fewer docs "
    "through LSH and d²× fewer candidate pairs through verification at "
    "duplication factor d — the common-crawl boilerplate regime. Benched "
    "against dedup_minhash_lsh at the 10×-replica scaled leg.",
)
def dedup_minhash_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.dedup import (
        minhash_dedup_collapsed,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    return minhash_dedup_collapsed(
        docs, "doc_id", "text", num_hashes=32, bands=8, shingle_k=3, threshold=0.2
    )
