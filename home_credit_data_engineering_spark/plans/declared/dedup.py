"""Signature-based dedup declared queries (MinHash-LSH, SimHash,
embedding near-dup).

MinHash/SimHash signatures hash with Spark's ``xxhash64`` — engine-specific
bits, so a DuckDB replay cannot reproduce the pair sets directly. Those
queries are therefore VERDICT CERTIFICATES (the ``combo_ann_approx`` /
``ann_ivf_increment_recall`` discipline): the sketch pipeline runs over
the corpus PLUS a deterministic planted panel (identical copies of every
``doc_id % 20 == 0, n_chars >= 100`` document at ``doc_id + 10^11`` —
both engines can enumerate the panel exactly), and the output is
booleans computed against ground truth the plant makes exact — an
identical copy has identical shingles/signature, so the sketch MUST
pair it with its original at Jaccard 1.0 / Hamming 0, and winnowing
MUST give it the identical fingerprint set. The trivially-true oracle
pins shape + panel; a dead bucket join, a broken signature, or a
verification regression flips real verdict bits. The sketch methods'
*verification* math (exact Jaccard) is additionally oracle-checked by
``dedup_ngram_jaccard`` (declared/text.py), and recall against exact
Jaccard on planted NEAR-duplicates (not just exact copies) is pinned by
unit tests (tests/test_dedup_similarity.py).
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

#: Planted-copy offset: certificate copies live at doc_id + 10^11 —
#: far above any real doc id at every SF AND above the 10x scaled
#: replicas' id bands (bench_scaled.py shifts each replica by 10^9, so
#: replica ids reach ~10^10; a 10^9 offset would collide with them).
PLANT_OFFSET = 100_000_000_000

#: SQL enumeration of the certificate panel (both engines agree on it).
#: The id cap keeps the panel FIXED when the corpus grows (the ANN query
#: panels' vec_id < 2000 convention): the 10x scaled replicas shift ids
#: by k*1e9 and 1e9 % 20 == 0, so without the cap every replica of a
#: panel doc would join the panel and the planted-copy groups would grow
#: quadratically inside the LSH buckets. No-op at the verification SFs
#: (all base ids are far below 1e9).
PANEL_WHERE = "doc_id % 20 = 0 AND n_chars >= 100 AND doc_id < 1000000000"


def planted_corpus(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(corpus ∪ identical panel copies, panel). The panel is every
    ``doc_id % 20 == 0`` document with ``n_chars >= 100`` (long enough
    that shingles/fingerprints exist); copies keep the text byte-
    identical so sketch-method ground truth is exact by construction."""
    panel = docs.filter(
        (F.col("doc_id") % 20 == 0)
        & (F.col("n_chars") >= 100)
        & (F.col("doc_id") < 1_000_000_000)
    )
    copies = panel.withColumn(
        "doc_id", F.col("doc_id") + F.lit(PLANT_OFFSET)
    )
    return docs.unionByName(copies), panel


@register(
    "dedup_minhash_lsh",
    # Verdict certificate (module doc): the planted identical copies
    # MUST surface as verified pairs at exact Jaccard 1.0, and every
    # emitted pair's verified score must clear the threshold.
    oracle=f"""
    SELECT doc_id, TRUE AS planted_pair_found,
           TRUE AS planted_score_exact, TRUE AS precision_ok
    FROM documents WHERE {PANEL_WHERE}
    """,
    operators=("D-ext:minhash-lsh",),
    doc="MinHash(32) + LSH(8 bands) candidate generation + exact Jaccard "
    "verification at 0.2 over the corpus plus the planted-copy panel. "
    "Shuffle volume is per-bucket (no all-pairs). Certified: every "
    "planted (original, identical copy) pair is found at Jaccard 1.0 "
    "(identical shingle sets ⇒ identical signatures ⇒ same buckets), "
    "and min verified score over ALL pairs >= threshold.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    corpus, panel = planted_corpus(docs)
    pairs = minhash_dedup(
        corpus, "doc_id", "text", num_hashes=32, bands=8, shingle_k=3,
        threshold=0.2,
    )
    return _planted_pair_certificate(
        pairs, panel, score_col="jaccard", exact_score=1.0,
        found_col="planted_pair_found", exact_col="planted_score_exact",
        precision=F.min("jaccard") >= 0.2,
    )


def _planted_pair_certificate(
    pairs: DataFrame,
    panel: DataFrame,
    *,
    score_col: str,
    exact_score: float,
    found_col: str,
    exact_col: str,
    precision,
) -> DataFrame:
    """Shared certificate shape for pair-emitting sketch dedup: per
    panel doc, was the (original, copy) pair found and did its score
    equal the identical-copy ground truth; plus one global precision
    bit (``precision`` is an aggregate boolean over ALL pairs).

    The pair pipeline is materialized ONCE (localCheckpoint): both the
    precision aggregate and the planted-pair probe read the
    checkpointed result instead of re-running the LSH/verification
    plan."""
    pairs = pairs.localCheckpoint(eager=True)
    prec = pairs.agg(
        F.coalesce(precision, F.lit(True)).alias("__prec_ok")
    )
    planted = pairs.filter(
        F.col("doc_b") == F.col("doc_a") + F.lit(PLANT_OFFSET)
    ).select(F.col("doc_a").alias("doc_id"), F.col(score_col).alias("__s"))
    return (
        panel.select("doc_id")
        .join(planted, "doc_id", "left")
        .crossJoin(F.broadcast(prec))
        .select(
            "doc_id",
            F.col("__s").isNotNull().alias(found_col),
            F.coalesce(
                F.col("__s") == F.lit(exact_score), F.lit(False)
            ).alias(exact_col),
            F.col("__prec_ok").alias("precision_ok"),
        )
    )


@register(
    "dedup_simhash",
    # Verdict certificate (module doc): identical planted copies have
    # identical 64-bit signatures, so the pigeonhole blocking MUST
    # surface them at Hamming 0; emitted pairs never exceed the cap.
    oracle=f"""
    SELECT doc_id, TRUE AS planted_pair_found,
           TRUE AS planted_score_exact, TRUE AS precision_ok
    FROM documents WHERE {PANEL_WHERE}
    """,
    operators=("D-ext:simhash",),
    doc="64-bit SimHash near-dup pairs at Hamming ≤ 3 over the corpus "
    "plus the planted-copy panel, candidates via pigeonhole chunk "
    "blocking (4 equi-joins, never a cross product). Certified: every "
    "planted (original, identical copy) pair found at Hamming 0, and "
    "max emitted Hamming <= 3.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    corpus, panel = planted_corpus(docs)
    sigs = simhash_signatures(corpus, "doc_id", "text")
    pairs = simhash_near_pairs(sigs, max_hamming=3)
    return _planted_pair_certificate(
        pairs, panel, score_col="hamming", exact_score=0.0,
        found_col="planted_pair_found", exact_col="planted_score_exact",
        precision=F.max("hamming") <= 3,
    )


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
    # Verdict certificate (module doc): winnowing is a pure function of
    # the token stream, so an identical planted copy MUST emit the
    # identical fingerprint set — any nondeterminism in the rolling
    # hash, window minima, or dedup step flips the match bit.
    oracle=f"""
    SELECT doc_id, TRUE AS has_fingerprints,
           TRUE AS copy_fingerprints_match
    FROM documents WHERE {PANEL_WHERE}
    """,
    operators=("T-ext:winnowing",),
    doc="Winnowing (MOSS) document fingerprints: rolling k-gram hashes + "
    "sliding-window minima, distinct per doc, over the corpus plus the "
    "planted-copy panel. Guarantees shared substrings of >= window+k-1 "
    "tokens produce shared fingerprints (partial-overlap detection; "
    "pinned by planted-overlap unit tests). Certified: every panel doc "
    "fingerprints non-empty, and its identical copy's fingerprint SET "
    "is identical (set symmetric difference empty).",
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    corpus, panel = planted_corpus(docs)
    # materialize once: the certificate reads the fingerprint frame
    # three times (orig side, copy side, counts)
    fps = winnowing_fingerprints(corpus, "doc_id", "text").localCheckpoint(
        eager=True
    )
    orig = fps.join(panel.select("doc_id"), "doc_id", "left_semi")
    copy = fps.filter(F.col("doc_id") >= PLANT_OFFSET).select(
        (F.col("doc_id") - F.lit(PLANT_OFFSET)).alias("doc_id"),
        "fingerprint",
    )
    # set symmetric difference via signed counts: fingerprints are
    # distinct per doc, so any (doc, fp) present on one side only sums
    # to ±1 and marks the doc as mismatched
    mismatch = (
        orig.select("doc_id", "fingerprint", F.lit(1).alias("__s"))
        .unionByName(
            copy.select("doc_id", "fingerprint", F.lit(-1).alias("__s"))
        )
        .groupBy("doc_id", "fingerprint")
        .agg(F.sum("__s").alias("__d"))
        .filter(F.col("__d") != 0)
        .select("doc_id")
        .distinct()
        .withColumn("__mismatch", F.lit(True))
    )
    counts = orig.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
    return (
        panel.select("doc_id")
        .join(counts, "doc_id", "left")
        .join(mismatch, "doc_id", "left")
        .select(
            "doc_id",
            (F.coalesce(F.col("__n"), F.lit(0)) > 0).alias(
                "has_fingerprints"
            ),
            (~F.coalesce(F.col("__mismatch"), F.lit(False))).alias(
                "copy_fingerprints_match"
            ),
        )
    )


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
    # Verdict certificate (module doc): the collapse-first pipeline's
    # distinguishing property is exact-duplicate handling — the planted
    # identical copies collapse into their originals' groups and expand
    # back as verified pairs at Jaccard 1.0.
    oracle=f"""
    SELECT doc_id, TRUE AS planted_pair_found,
           TRUE AS planted_score_exact, TRUE AS precision_ok
    FROM documents WHERE {PANEL_WHERE}
    """,
    operators=("D-ext:minhash-lsh",),
    doc="Collapse-exact-first MinHash-LSH "
    "(operators/dedup.py:minhash_dedup_collapsed) over the corpus plus "
    "the planted-copy panel: exact byte-duplicates collapse to one "
    "representative before signatures/banding, verified pairs expand "
    "back over group members. Pair-set ≡ the default pipeline "
    "(identical text ⇒ identical signatures ⇒ identical pair decisions; "
    "asserted in test_dedup_similarity) with d× fewer docs through LSH "
    "and d²× fewer candidate pairs through verification at duplication "
    "factor d — the common-crawl boilerplate regime. Benched against "
    "dedup_minhash_lsh at the 10×-replica scaled leg. Certified: every "
    "planted pair found at Jaccard 1.0, min verified score >= "
    "threshold.",
)
def dedup_minhash_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.dedup import (
        minhash_dedup_collapsed,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    corpus, panel = planted_corpus(docs)
    pairs = minhash_dedup_collapsed(
        corpus, "doc_id", "text", num_hashes=32, bands=8, shingle_k=3,
        threshold=0.2,
    )
    return _planted_pair_certificate(
        pairs, panel, score_col="jaccard", exact_score=1.0,
        found_col="planted_pair_found", exact_col="planted_score_exact",
        precision=F.min("jaccard") >= 0.2,
    )


@register(
    "dedup_jaccard_join_exact",
    # FULL oracle (not a certificate): the prefix-filter join is exact,
    # so DuckDB's brute-force all-pairs Jaccard must reproduce every
    # pair and score — candidate completeness is hash-verified, not
    # argued from the theorem alone.
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
               i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+2])) AS shingles
      FROM documents
      WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= 0.2
    """,
    operators=("D-ext:ngram-jaccard",),
    doc="EXACT all-pairs 3-gram Jaccard join at 0.2 with NO blocking key "
    "(operators/dedup.py:jaccard_similarity_join — prefix filtering, "
    "Chaudhuri'06 / PPJoin / Vernica SIGMOD'10): candidates come from an "
    "equi-join on each document's RAREST tokens (global-frequency-order "
    "prefix of length |x| - ceil(t|x|) + 1) plus a length filter, then "
    "exact array_intersect verification. The completeness the sketch "
    "pipelines (dedup_minhash_lsh) trade away, at equi-join cost instead "
    "of an all-pairs product; the DuckDB oracle IS the brute-force "
    "all-pairs join, so candidate completeness is hash-verified. Since "
    "r14 the operator collapses byte-identical docs to min-id reps "
    "before candidate generation by default (collapse_exact=True — "
    "bit-identical output, same oracle; d² fewer candidates under "
    "duplication factor d, the measured 57.5 s → ~7 s win at the "
    "10×-replica bench leg).",
)
def dedup_jaccard_join_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.text import tokens
    from home_credit_data_engineering_spark.operators.dedup import (
        jaccard_similarity_join,
    )

    docs = read_testdata(spark, sf_dir, "documents").filter(
        F.size(tokens("text")) >= 3
    )
    return jaccard_similarity_join(
        docs, "doc_id", "text", threshold=0.2, shingle_k=3
    )


@register(
    "dedup_jaccard_join_collapsed",
    # FULL oracle — the SAME brute-force all-pairs join as
    # dedup_jaccard_join_exact: the collapsed form's output contract is
    # bit-identical pairs and scores, so one oracle certifies both.
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
               i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+2])) AS shingles
      FROM documents
      WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= 0.2
    """,
    operators=("D-ext:ngram-jaccard",),
    doc="Collapse-exact-first EXACT Jaccard join (operators/dedup.py:"
    "jaccard_join_collapsed — the minhash_dedup_collapsed discipline "
    "applied to the prefix-filter join): byte-identical docs collapse "
    "to min-id representatives before the candidate join, cross-group "
    "pairs expand back over members with the representative score, and "
    "each group contributes its internal pairs at Jaccard 1.0. Output "
    "is bit-identical to dedup_jaccard_join_exact (same brute-force "
    "oracle) at d-squared fewer candidate pairs under duplication "
    "factor d — measured at the 10x-replica scaled leg: 76.8M -> 0.77M "
    "candidates, the common-crawl boilerplate regime.",
)
def dedup_jaccard_join_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.text import tokens
    from home_credit_data_engineering_spark.operators.dedup import (
        jaccard_join_collapsed,
    )

    docs = read_testdata(spark, sf_dir, "documents").filter(
        F.size(tokens("text")) >= 3
    )
    return jaccard_join_collapsed(
        docs, "doc_id", "text", threshold=0.2, shingle_k=3
    )


@register(
    "dedup_jaccard_join_incremental",
    # FULL oracle: the increment must produce EXACTLY the brute-force
    # all-pairs Jaccard restricted to pairs touching a delta doc — the
    # frozen-token-order candidate completeness is hash-verified against
    # DuckDB, not argued from the prefix theorem alone.
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
               i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+2])) AS shingles
      FROM documents
      WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE (a.doc_id % 5 = 3 OR b.doc_id % 5 = 3)
      AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= 0.2
    """,
    operators=("D-ext:ngram-jaccard",),
    doc="O(Δ) incremental EXACT Jaccard join (operators/dedup.py:"
    "jaccard_join_increment — the exact sibling of "
    "minhash_incremental_pairs): the corpus's 4/5 'accepted' docs build "
    "a persisted prefix + frozen-token-frequency sidecar (parquet "
    "round-trip in-query), the remaining 1/5 folds in as a delta — "
    "shingle/prefix passes over the delta only, candidate join against "
    "the state restricted to delta prefix tokens, verification "
    "semi-join-restricted to candidate ids. Exactness hinges on the "
    "frozen token order: the prefix filter is complete under ANY fixed "
    "total order, so accepted tokens keep their first-seen frequency "
    "rank and unseen tokens extend the order; the DuckDB oracle is the "
    "brute-force all-pairs join over the FULL corpus restricted to "
    "delta-touching pairs, so candidate completeness is hash-verified.",
)
def dedup_jaccard_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from home_credit_data_engineering_spark.functions.text import tokens
    from home_credit_data_engineering_spark.operators.jaccard_state import (
        jaccard_state_increment,
        write_jaccard_state,
    )

    docs = read_testdata(spark, sf_dir, "documents").filter(
        F.size(tokens("text")) >= 3
    )
    base = docs.filter(F.col("doc_id") % 5 != 3)
    delta = docs.filter(F.col("doc_id") % 5 == 3)
    # the REAL maintained-state path (operators/jaccard_state.py):
    # layout marker + pinned meta + ledger-idempotent fold — the driver
    # slot exercises the production machinery, not a hand round-trip
    tmp = tempfile.mkdtemp(prefix="jaccard_state_")
    root = tmp + "/state"
    try:
        write_jaccard_state(
            base, root, "doc_id", "text", threshold=0.2, shingle_k=3
        )
        # pairs is eagerly localCheckpointed inside the fold, so the
        # returned frame never re-reads the tree — safe to remove now
        # (repeated bench samples were each leaking a full state copy)
        return jaccard_state_increment(delta, root, docs)["pairs"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "dedup_containment_join",
    # FULL oracle: brute-force asymmetric containment over the same
    # probe/reference split — candidate completeness of the one-sided
    # prefix scheme (probe prefixes vs full reference postings) is
    # hash-verified, not argued from the lemma alone. The split moduli
    # divide 1e9, so the planted shape survives the replica id shift.
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
               i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+2])) AS shingles
      FROM documents
      WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3)
    SELECT p.doc_id AS probe_id, r.doc_id AS ref_id,
           ROUND(CAST(len(list_intersect(p.shingles, r.shingles)) AS DOUBLE)
                 / len(p.shingles), 6) AS containment
    FROM sh p JOIN sh r
      ON p.doc_id % 20 <> 7 AND r.doc_id % 20 = 7 AND p.doc_id <> r.doc_id
    WHERE CAST(len(list_intersect(p.shingles, r.shingles)) AS DOUBLE)
          / len(p.shingles) >= 0.5
    """,
    operators=("D-ext:ngram-jaccard",),
    doc="EXACT asymmetric containment join at 0.5 (operators/dedup.py:"
    "containment_join — the R-S prefix scheme of Vernica SIGMOD'10 "
    "§3.3): probe docs ship only their |P| - ceil(t|P|) + 1 rarest "
    "tokens while the (small) reference side is fully indexed, plus a "
    "|R| >= ceil(t|P|) length filter, then exact array_intersect "
    "verification of |P∩R|/|P| (collapse_exact=True since r14: both "
    "sides collapse byte-identical docs to min-id reps first — "
    "bit-identical output, same oracle, d·e fewer candidates under "
    "two-sided duplication). The set-containment form of benchmark "
    "decontamination — a training doc containing most of a benchmark "
    "item scores high where symmetric Jaccard is diluted by length "
    "mismatch; complements the positional span form "
    "(text_decontaminate_spans). The DuckDB oracle is the brute-force "
    "asymmetric join, so one-sided candidate completeness is "
    "hash-verified.",
)
def dedup_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.text import tokens
    from home_credit_data_engineering_spark.operators.dedup import (
        containment_join,
    )

    docs = read_testdata(spark, sf_dir, "documents").filter(
        F.size(tokens("text")) >= 3
    )
    return containment_join(
        docs.filter(F.col("doc_id") % 20 != 7),
        docs.filter(F.col("doc_id") % 20 == 7),
        "doc_id",
        "text",
        threshold=0.5,
        shingle_k=3,
    )


@register(
    "dedup_containment_join_collapsed",
    # SAME brute-force oracle as dedup_containment_join: the collapsed
    # form's contract is bit-identical output, so the identical oracle
    # hash IS the equivalence proof at driver scale.
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
               i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+2])) AS shingles
      FROM documents
      WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3)
    SELECT p.doc_id AS probe_id, r.doc_id AS ref_id,
           ROUND(CAST(len(list_intersect(p.shingles, r.shingles)) AS DOUBLE)
                 / len(p.shingles), 6) AS containment
    FROM sh p JOIN sh r
      ON p.doc_id % 20 <> 7 AND r.doc_id % 20 = 7 AND p.doc_id <> r.doc_id
    WHERE CAST(len(list_intersect(p.shingles, r.shingles)) AS DOUBLE)
          / len(p.shingles) >= 0.5
    """,
    operators=("D-ext:ngram-jaccard",),
    doc="Collapse-exact-first containment join (operators/dedup.py:"
    "containment_join_collapsed) — identical output to "
    "dedup_containment_join, built for duplication on BOTH sides: d "
    "byte-identical probe copies × e reference copies inflate the "
    "direct candidate join by d·e per contaminated pair, while this "
    "form collapses each side to min-id md5 representatives, runs the "
    "R-S prefix core over representatives only, and expands rep-level "
    "pairs over probe-group × ref-group members through id-only joins "
    "(the self-pair guard applies per expanded member — a rep sharing "
    "an id with a reference doc must not drop its group). The DuckDB "
    "oracle is the SAME brute-force asymmetric join, so bit-identity "
    "with the direct form is hash-verified.",
)
def dedup_containment_join_collapsed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from home_credit_data_engineering_spark.functions.text import tokens
    from home_credit_data_engineering_spark.operators.dedup import (
        containment_join_collapsed,
    )

    docs = read_testdata(spark, sf_dir, "documents").filter(
        F.size(tokens("text")) >= 3
    )
    return containment_join_collapsed(
        docs.filter(F.col("doc_id") % 20 != 7),
        docs.filter(F.col("doc_id") % 20 == 7),
        "doc_id",
        "text",
        threshold=0.5,
        shingle_k=3,
    )


@register(
    "dedup_containment_join_incremental",
    # FULL oracle: the same brute-force asymmetric containment as
    # dedup_containment_join — the union of the two per-delta folds
    # must equal the full join over the accumulated probe corpus, so
    # both the one-sided prefix completeness AND the fold-chaining
    # (frozen-order extension, persisted reference legs) are
    # hash-verified. The split moduli divide 1e9, so the planted shape
    # survives the replica id shift.
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
               i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
                    regexp_split_to_array(trim(text), '\\s+')[i+2])) AS shingles
      FROM documents
      WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3)
    SELECT p.doc_id AS probe_id, r.doc_id AS ref_id,
           ROUND(CAST(len(list_intersect(p.shingles, r.shingles)) AS DOUBLE)
                 / len(p.shingles), 6) AS containment
    FROM sh p JOIN sh r
      ON p.doc_id % 20 <> 7 AND r.doc_id % 20 = 7 AND p.doc_id <> r.doc_id
    WHERE CAST(len(list_intersect(p.shingles, r.shingles)) AS DOUBLE)
          / len(p.shingles) >= 0.5
    """,
    operators=("D-ext:ngram-jaccard",),
    doc="O(Δ) incremental EXACT containment decontamination "
    "(operators/containment_state.py + operators/dedup.py:"
    "containment_join_increment): the benchmark reference (doc_id % 20 "
    "== 7) builds a persisted state tree ONCE — full postings + "
    "verification sets + seed token frequencies — then the probe corpus "
    "folds in as TWO ledgered deltas (doc_id % 5 split), each an "
    "O(Δ) pass: delta-only shingle/prefix work under the frozen token "
    "order (extended append-only by first-seen delta tokens), candidate "
    "join against the fixed reference postings, verification against "
    "the persisted reference sets — no all_texts contract at all "
    "(probe docs never pair with each other). The DuckDB oracle is the "
    "brute-force asymmetric join over the FULL corpus, so the union of "
    "the two folds is hash-verified against the one-shot join — the "
    "production nightly-decontamination path, exercised end to end "
    "(layout marker, pinned meta, ledger idempotence, parquet round "
    "trips) inside the driver slot.",
)
def dedup_containment_join_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from home_credit_data_engineering_spark.functions.text import tokens
    from home_credit_data_engineering_spark.operators.containment_state import (
        containment_state_increment,
        write_containment_state,
    )

    docs = read_testdata(spark, sf_dir, "documents").filter(
        F.size(tokens("text")) >= 3
    )
    reference = docs.filter(F.col("doc_id") % 20 == 7)
    probe = docs.filter(F.col("doc_id") % 20 != 7)
    tmp = tempfile.mkdtemp(prefix="containment_state_")
    root = tmp + "/state"
    try:
        write_containment_state(
            reference, root, "doc_id", "text", threshold=0.5, shingle_k=3
        )
        # two chained folds: the second runs under the token order the
        # first extended — pairs are eagerly checkpointed inside each
        # fold, so the union never re-reads the removed tree
        p1 = containment_state_increment(
            probe.filter(F.col("doc_id") % 5 != 3), root
        )["pairs"]
        p2 = containment_state_increment(
            probe.filter(F.col("doc_id") % 5 == 3), root
        )["pairs"]
        return p1.unionByName(p2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
