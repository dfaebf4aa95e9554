"""Text-analysis declared queries over the documents table (north-star).

Every deterministic operator (token stats, quality, language-ID,
fingerprinting, exact dedup, n-gram Jaccard) carries a DuckDB oracle that
replicates the arithmetic; signature-based operators (MinHash/SimHash)
live in declared/dedup.py as rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
    total_token_length,
    unique_token_count,
    word_shingles,
)
from home_credit_data_engineering_spark.operators.dedup import exact_dedup
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata

# Shared oracle fragment: whitespace tokens of trimmed text (1-based lists).
_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct({_TOKS})) AS INTEGER) AS n_unique_tokens,
           ROUND(CAST(list_aggregate(list_transform({_TOKS}, t -> length(t)), 'sum')
                 AS DOUBLE) / len({_TOKS}), 4) AS avg_token_len
    FROM documents
    WHERE n_chars > 0
    """,
    operators=("T-ext:tokenize",),
    doc="Token counting + distinct-token stats, all JVM-side array ops "
    "(north-star text analysis).",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        unique_token_count("text").alias("n_unique_tokens"),
        F.round(
            total_token_length("text").cast("double") / token_count("text"), 4
        ).alias("avg_token_len"),
    )


@register(
    "text_lang_id",
    oracle="""
    WITH scored AS (
      SELECT lang,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 t -> t IN ('the','a','of','and','in','to','is'))) AS c_en,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS c_de,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 t -> t IN ('el','la','los','las','es','y','un'))) AS c_es,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 t -> t IN ('le','la','les','et','est','une','dans'))) AS c_fr
      FROM documents)
    SELECT lang,
           CASE WHEN c_en > 0 AND c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
                WHEN c_de > 0 AND c_de > c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
                WHEN c_es > 0 AND c_es > c_en AND c_es > c_de AND c_es >= c_fr THEN 'es'
                WHEN c_fr > 0 AND c_fr > c_en AND c_fr > c_de AND c_fr > c_es THEN 'fr'
                ELSE 'und' END AS lang_pred,
           COUNT(*) AS n_docs
    FROM scored
    GROUP BY 1, 2
    """,
    operators=("T-ext:lang-id",),
    doc="Deterministic stopword-profile language-ID heuristic (argmax with "
    "pinned tie-break). Graded on mechanics: the synthetic corpus shares "
    "one vocabulary across langs, so labels don't correlate.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    return (
        docs.withColumn("lang_pred", lang_id("text"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           ROUND((least(1.0, length(text) / 100.0)
                  + CASE WHEN len({_TOKS}) > 0
                         AND CAST(list_aggregate(list_transform({_TOKS},
                               t -> length(t)), 'sum') AS DOUBLE) / len({_TOKS})
                             BETWEEN 3 AND 10
                         THEN 1.0 ELSE 0.0 END
                  + CASE WHEN len({_TOKS}) > 0 THEN 1.0 ELSE 0.0 END) / 3.0,
                 4) AS quality,
           CAST(length(text) AS BIGINT) AS doc_chars
    FROM documents
    WHERE n_chars > 0
    """,
    operators=("T-ext:quality",),
    doc="Composite document quality score (length band, mean token length, "
    "non-emptiness) — the filter stage of a training-data pipeline.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return docs.select(
        "doc_id",
        F.round(quality_score("text"), 4).alias("quality"),
        F.length("text").cast("bigint").alias("doc_chars"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
    """,
    operators=("T-ext:fingerprint",),
    doc="Content fingerprint (md5 of normalized text) — engine-portable "
    "dedup key.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


@register(
    "text_word_freq_topk",
    oracle="""
    SELECT word, n FROM (
      SELECT word, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rk
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
            FROM documents)
      GROUP BY word) t
    WHERE rk <= 20
    """,
    operators=("T-ext:wordfreq",),
    doc="Corpus-wide top-20 term frequency: explode → hash aggregate → "
    "global top-k (partial aggregation keeps shuffle volume per-term).",
)
def text_word_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


@register(
    "text_heavy_hitters_mg",
    # The MG summary's surviving item SET depends on partition layout
    # (bounded-memory sketches always do), so — exactly like the HLL/GK
    # slots — the oracle pins the DETERMINISTIC guarantees over exact
    # SQL counts: containment (every item with n > N/(k+1) present) and
    # the undercount envelope (n - N/(k+1) <= est <= n), both provably
    # TRUE. The item stream plants 3 hot items (odd doc_ids collapse to
    # 'hot{0,1,2}') over the flat 31-word corpus vocabulary so the k=10
    # summary must compact (34 distinct > k) and the heavy set is
    # non-trivial.
    oracle="""
    WITH hh_toks AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN word
                  ELSE 'hot' || CAST(doc_id % 3 AS VARCHAR) END AS item
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
            FROM documents) hh_t0),
    hh_tot AS (SELECT COUNT(*) AS n_tot FROM hh_toks),
    hh_ex AS (SELECT item, COUNT(*) AS n FROM hh_toks GROUP BY 1)
    SELECT item, n, TRUE AS present, TRUE AS within_bound
    FROM hh_ex CROSS JOIN hh_tot WHERE n * 11 > n_tot
    """,
    operators=("A-ext:heavy-hitters",),
    doc="Misra-Gries heavy hitters (operators/sketch.py; Misra & Gries "
    "1982 + the PODS'12 mergeable-summaries merge): per-partition "
    "bounded k=10 summaries folded in one mapInPandas pass, merged by "
    "a hash aggregate over partitions x k rows + one final compaction "
    "— the sketch path for hot n-grams / boilerplate lines / top hosts "
    "when the distinct cardinality is itself too large to shuffle. "
    "Certificate: containment + undercount envelope verified against "
    "exact counts (deterministic TRUE verdicts, HLL/GK discipline).",
)
def text_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.sketch import (
        mg_heavy_hitters,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    items = docs.select(
        F.explode(tokens("text")).alias("word"), "doc_id"
    ).select(
        F.when(
            F.col("doc_id") % 2 == 0, F.col("word")
        ).otherwise(
            F.concat(F.lit("hot"), (F.col("doc_id") % 3).cast("string"))
        ).alias("item")
    )
    k = 10
    mg = mg_heavy_hitters(items, "item", k=k)
    tot = items.agg(F.count(F.lit(1)).alias("n_tot"))
    exact = items.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    heavy = exact.crossJoin(F.broadcast(tot)).filter(
        F.col("n") * (k + 1) > F.col("n_tot")
    )
    return heavy.join(mg, "item", "left").select(
        "item",
        "n",
        F.col("est").isNotNull().alias("present"),
        (
            F.col("est").isNotNull()
            & (F.col("est") <= F.col("n"))
            & (F.col("est") >= F.col("n") - F.col("err_bound"))
        ).alias("within_bound"),
    )


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS fp,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
    operators=("D-ext:exact",),
    doc="Exact deduplication by content fingerprint: one hash-aggregate "
    "shuffle on the 16-byte hash, survivor = min id.",
)
def dedup_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", "text").select("fp", "keep_id", "dup_count")


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id, lang,
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
                    - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard,
           ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / LEAST(len(a.shingles), len(b.shingles)), 6) AS containment
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= 0.2
    """,
    operators=("D-ext:ngram-jaccard",),
    doc="Exact 3-gram Jaccard near-dup pairs, blocked by lang (the "
    "verification stage of near-dup pipelines; candidate generation via "
    "MinHash-LSH is the rows-only dedup_minhash_lsh query). Also emits "
    "CONTAINMENT (|A∩B| / min(|A|,|B|), Broder's resemblance companion): "
    "symmetric Jaccard misses quote/subset duplication — a short doc "
    "fully embedded in a long one scores low Jaccard but containment 1 — "
    "and training-data pipelines filter on both.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.text import with_shingles

    docs = read_testdata(spark, sf_dir, "documents").filter(
        F.size(tokens("text")) >= 3
    )
    sh = with_shingles(docs, "doc_id", "text", k=3).join(
        docs.select("doc_id", "lang"), on="doc_id"
    ).select("doc_id", "lang", F.array_distinct("shingles").alias("shingles"))
    a = sh.select(
        F.col("lang"),
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
    )
    b = sh.select(
        F.col("lang"),
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
    jac = F.round(inter / union.cast("double"), 6)
    containment = F.round(
        inter / F.least(F.size("sh_a"), F.size("sh_b")).cast("double"), 6
    )
    return (
        a.join(b, on="lang")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("jaccard", jac)
        .withColumn("containment", containment)
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "jaccard", "containment")
    )


#: DuckDB twin of ``operators/quality.py:corpus_report_card`` —
#: ``card_out(source, n_docs, n_blank, n_tokens, avg_chars, dup_rate,
#: lang_entropy, mean_quality)``. Same stable-sum discipline: quality
#: rounded at 4 into DECIMAL(15,4), entropy terms rounded at 9 into
#: DECIMAL(18,9), one final double division per metric.
CARD_SQL_CTES = f"""
    card_base AS (
      SELECT source,
             COUNT(*) AS n_docs,
             SUM(CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len({_TOKS}) END) = 0
                      THEN 1 ELSE 0 END) AS n_blank,
             SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len({_TOKS}) END) AS n_tokens,
             SUM(CAST(length(text) AS BIGINT)) AS sum_chars,
             COUNT(DISTINCT md5(lower(trim(text)))) AS n_fp,
             SUM(CASE WHEN length(text) > 0 THEN
                   CAST(CAST(ROUND((least(1.0, length(text) / 100.0)
                     + CASE WHEN len({_TOKS}) > 0
                            AND CAST(list_aggregate(list_transform({_TOKS},
                                  t -> length(t)), 'sum') AS DOUBLE)
                                / len({_TOKS}) BETWEEN 3 AND 10
                            THEN 1.0 ELSE 0.0 END
                     + CASE WHEN len({_TOKS}) > 0 THEN 1.0 ELSE 0.0 END)
                     / 3.0, 4) AS DECIMAL(7,4)) AS DECIMAL(15,4)) END)
               AS sum_q,
             COUNT(CASE WHEN length(text) > 0 THEN 1 END) AS n_q
      FROM documents GROUP BY 1),
    card_lang AS (
      SELECT source, SUM(term) AS h FROM (
        SELECT g.source,
               CAST(ROUND((CAST(g.c AS DOUBLE) / b.n_docs)
                    * ln(CAST(g.c AS DOUBLE) / b.n_docs), 9)
                    AS DECIMAL(18,9)) AS term
        FROM (SELECT source, lang, COUNT(*) AS c
              FROM documents GROUP BY 1, 2) g
        JOIN card_base b USING (source)) t
      GROUP BY 1),
    card_out AS (
      SELECT b.source,
             CAST(b.n_docs AS BIGINT) AS n_docs,
             CAST(b.n_blank AS BIGINT) AS n_blank,
             CAST(b.n_tokens AS BIGINT) AS n_tokens,
             ROUND(CAST(b.sum_chars AS DOUBLE) / b.n_docs, 2) AS avg_chars,
             ROUND(1.0 - CAST(b.n_fp AS DOUBLE) / b.n_docs, 6) AS dup_rate,
             ROUND(-CAST(l.h AS DOUBLE), 6) AS lang_entropy,
             CASE WHEN b.n_q > 0
                  THEN ROUND(CAST(b.sum_q AS DOUBLE) / b.n_q, 6)
             END AS mean_quality
      FROM card_base b JOIN card_lang l USING (source))"""


@register(
    "corpus_report_card",
    oracle=f"""
    WITH {CARD_SQL_CTES}
    SELECT * FROM card_out
    """,
    operators=("T-ext:report-card",),
    doc="Per-source corpus datasheet (operators/quality.py:"
    "corpus_report_card — the 'datasheets for datasets' health report "
    "read before mixing sources): doc/blank/token counts, average "
    "length, exact content-duplicate mass (1 - distinct md5 "
    "fingerprints / docs), Shannon entropy of the language mix, and "
    "mean composite quality — every ratio one final double division "
    "over exact decimal/bigint sums (quality rounded at 4 into "
    "DECIMAL(15,4), entropy terms at 9 into DECIMAL(18,9)), so the "
    "whole card hash-verifies. One combinable aggregate per statistic "
    "family; the distinct-fingerprint sub-aggregate shuffles 32-char "
    "hashes, never text.",
)
def corpus_report_card_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.quality import (
        corpus_report_card,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    return corpus_report_card(docs)
