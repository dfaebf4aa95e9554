"""Third text/dedup declared-query batch: Gopher-style repetition/symbol
quality signals, benchmark-contamination overlap, and near-dup cluster
survivorship — the remaining stages of a production training-data
pipeline (quality filter → decontamination → canonical selection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.text import (
    digit_ratio,
    max_token_length,
    repeated_bigram_fraction,
    symbol_ratio,
    tokens,
    with_shingles,
)
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata

#: DuckDB fragment: whitespace tokens of trimmed text.
_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


@register(
    "text_gopher_quality",
    oracle=f"""
    SELECT doc_id,
           ROUND(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                 / length(text), 6) AS symbol_ratio,
           ROUND(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                 / length(text), 6) AS digit_ratio,
           CASE WHEN len({_TOKS}) >= 2 THEN
             ROUND(1.0 - CAST(len(list_distinct(list_transform(
                     generate_series(1, len({_TOKS}) - 1),
                     i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1]))) AS DOUBLE)
                   / (len({_TOKS}) - 1), 6)
           ELSE 0.0 END AS rep_bigram_frac,
           CAST(list_max(list_transform({_TOKS}, t -> length(t))) AS INTEGER)
             AS max_token_len
    FROM documents
    WHERE n_chars > 0
    """,
    operators=("T-ext:gopher",),
    doc="Gopher-style repetition/symbol quality signals per document: "
    "symbol ratio, digit ratio, repeated-bigram fraction (templated/spun "
    "text repeats n-grams), and longest-token length (URL/base64 blob "
    "detector). All codegen expressions (the bigram build uses zip_with "
    "over a once-materialized token array, never element_at-in-a-lambda) "
    "— scan speed at 100 TB, the filter stage before training.",
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return docs.select(
        "doc_id",
        F.round(symbol_ratio("text"), 6).alias("symbol_ratio"),
        F.round(digit_ratio("text"), 6).alias("digit_ratio"),
        F.round(repeated_bigram_fraction("text"), 6).alias("rep_bigram_frac"),
        max_token_length("text").alias("max_token_len"),
    )


@register(
    "text_contamination",
    oracle=f"""
    WITH arrs AS (
      SELECT doc_id, {_TOKS} AS arr FROM documents
      WHERE len({_TOKS}) >= 3),
    sh AS (
      SELECT doc_id, list_distinct(list_transform(
               generate_series(1, len(arr) - 2),
               i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingles
      FROM arrs),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    ev AS (SELECT DISTINCT s FROM ex WHERE doc_id % 97 = 0),
    tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM ex GROUP BY 1),
    hit AS (SELECT ex.doc_id, COUNT(*) AS n_overlap
            FROM ex JOIN ev USING (s) GROUP BY 1)
    SELECT t.doc_id, t.n_shingles,
           COALESCE(h.n_overlap, 0) AS n_overlap,
           ROUND(CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / t.n_shingles, 6)
             AS contamination
    FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    """,
    operators=("T-ext:contamination",),
    doc="Benchmark-contamination check: fraction of each document's "
    "distinct 3-gram shingles that appear in a designated eval set "
    "(docs with doc_id % 97 = 0 stand in for a benchmark corpus) — the "
    "decontamination stage every training pipeline runs before training. "
    "Shape: explode distinct shingles → semi-join against the distinct "
    "eval-shingle set → per-doc overlap ratio. The eval side is tiny and "
    "broadcast at scale; the corpus side shuffles 3-gram strings once.",
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents").filter(
        F.size(tokens("text")) >= 3
    )
    sh = with_shingles(docs, "doc_id", "text", k=3)
    ex = sh.select(
        "doc_id", F.explode(F.array_distinct("shingles")).alias("s")
    ).persist()
    ev = ex.filter(F.col("doc_id") % 97 == 0).select("s").distinct()
    tot = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hit = (
        ex.join(F.broadcast(ev), on="s", how="left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return tot.join(hit, on="doc_id", how="left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
        F.round(
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double")
            / F.col("n_shingles"),
            6,
        ).alias("contamination"),
    )


@register(
    "dedup_cluster_survivors",
    # Verdict certificate (declared/dedup.py module doc): planted
    # identical copies guarantee known edges, so cluster membership and
    # min-id survivorship have exact ground truth — a broken star round,
    # a lost edge, or a wrong label flips real verdict bits.
    oracle="""
    SELECT doc_id, TRUE AS same_cluster, TRUE AS label_is_min,
           TRUE AS survivor_rule_ok
    FROM documents
    WHERE doc_id % 20 = 0 AND n_chars >= 100 AND doc_id < 1000000000
    """,
    operators=("D-ext:cluster",),
    doc="Near-dup canonical selection over the corpus plus the "
    "planted-copy panel: MinHash-LSH verified pairs → large-star/"
    "small-star connected components → per-cluster survivor (cluster "
    "label = minimum doc id, so is_survivor = node == label). The step "
    "that turns pairwise near-dup edges into actual corpus removal "
    "lists (pairwise removal alone under-merges chains A~B~C). "
    "Certified per panel doc: original and its identical copy land in "
    "the SAME cluster, the cluster label is <= the original's id (min-"
    "id labeling), and exactly one of any labeled pair is the cluster "
    "label (survivor rule).",
)
def dedup_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.dedup import (
        connected_components_star,
        minhash_dedup,
    )
    from home_credit_data_engineering_spark.plans.declared.dedup import (
        PLANT_OFFSET,
        planted_corpus,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    corpus, panel = planted_corpus(docs)
    edges = minhash_dedup(
        corpus, "doc_id", "text", num_hashes=32, bands=8, threshold=0.2
    ).select("doc_a", "doc_b")
    labels = connected_components_star(edges)
    orig = labels.select(
        F.col("node").alias("doc_id"), F.col("component").alias("__c_orig")
    )
    copy = labels.select(
        (F.col("node") - F.lit(PLANT_OFFSET)).alias("doc_id"),
        F.col("component").alias("__c_copy"),
    )
    return (
        panel.select("doc_id")
        .join(orig, "doc_id", "left")
        .join(copy, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("__c_orig").isNotNull()
                & (F.col("__c_orig") == F.col("__c_copy"))
            ).alias("same_cluster"),
            F.coalesce(
                F.col("__c_orig") <= F.col("doc_id"), F.lit(False)
            ).alias("label_is_min"),
            # the survivor rule (is_survivor ⇔ node == label) applied to
            # the planted pair: the COPY can never be the survivor of
            # its own pair (its id is 10^9 above the original's)
            F.coalesce(
                F.col("__c_copy") != F.col("doc_id") + F.lit(PLANT_OFFSET),
                F.lit(False),
            ).alias("survivor_rule_ok"),
        )
    )


@register(
    "text_quality_filter",
    oracle=f"""
    SELECT doc_id,
           COALESCE(array_to_string(list_sort(list_filter([
             CASE WHEN NOT (len({_TOKS}) >= 5) THEN 'min_tokens' END,
             CASE WHEN NOT (len({_TOKS}) <= 100000) THEN 'max_tokens' END,
             CASE WHEN NOT (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                            AS DOUBLE) / length(text) <= 0.2)
                  THEN 'symbol_ratio' END,
             CASE WHEN NOT (CAST(len(regexp_extract_all(text, '[0-9]'))
                            AS DOUBLE) / length(text) <= 0.3)
                  THEN 'digit_ratio' END,
             CASE WHEN NOT ((CASE WHEN len({_TOKS}) >= 2 THEN
                     1.0 - CAST(len(list_distinct(list_transform(
                           generate_series(1, len({_TOKS}) - 1),
                           i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1]))) AS DOUBLE)
                           / (len({_TOKS}) - 1)
                   ELSE 0.0 END) <= 0.5)
                  THEN 'repetition' END,
             CASE WHEN NOT (CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                            / GREATEST(len({_TOKS}), 1) >= 0.2)
                  THEN 'unique_tokens' END,
             CASE WHEN NOT (list_max(list_transform({_TOKS}, t -> length(t)))
                            <= 60)
                  THEN 'token_length' END,
             CASE WHEN NOT (lang IN ('en', 'de', 'es', 'fr'))
                  THEN 'lang' END
           ], x -> x IS NOT NULL)), ','), '') AS failed_rules,
           (len(list_filter([
             CASE WHEN NOT (len({_TOKS}) >= 5) THEN 'x' END,
             CASE WHEN NOT (len({_TOKS}) <= 100000) THEN 'x' END,
             CASE WHEN NOT (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                            AS DOUBLE) / length(text) <= 0.2) THEN 'x' END,
             CASE WHEN NOT (CAST(len(regexp_extract_all(text, '[0-9]'))
                            AS DOUBLE) / length(text) <= 0.3) THEN 'x' END,
             CASE WHEN NOT ((CASE WHEN len({_TOKS}) >= 2 THEN
                     1.0 - CAST(len(list_distinct(list_transform(
                           generate_series(1, len({_TOKS}) - 1),
                           i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1]))) AS DOUBLE)
                           / (len({_TOKS}) - 1)
                   ELSE 0.0 END) <= 0.5) THEN 'x' END,
             CASE WHEN NOT (CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                            / GREATEST(len({_TOKS}), 1) >= 0.2) THEN 'x' END,
             CASE WHEN NOT (list_max(list_transform({_TOKS}, t -> length(t)))
                            <= 60) THEN 'x' END,
             CASE WHEN NOT (lang IN ('en', 'de', 'es', 'fr')) THEN 'x' END
           ], x -> x IS NOT NULL)) = 0) AS kept
    FROM documents
    WHERE n_chars > 0
    """,
    operators=("T-ext:quality", "T-ext:gopher"),
    doc="The corpus quality-filter verdict per document, oracle-verified: "
    "every plans.quality_filter rule (token-count band, symbol/digit "
    "ratios, repetition, unique-token fraction, max token length, lang "
    "allowlist) evaluated in one scan, emitting the kept flag and the "
    "sorted failed_rules audit as a comma-joined string (scalar so the "
    "driver canonicalizer can sort it) — the exact keep/drop semantics "
    "jobs/quality.py ships, certified cross-engine.",
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.plans.quality_filter import (
        QualityThresholds,
        quality_rules,
    )

    docs = read_testdata(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    rules = quality_rules(
        "text", "lang", QualityThresholds(langs=("en", "de", "es", "fr"))
    )
    failed = F.sort_array(
        F.array_compact(
            F.array(*[F.when(~keep, F.lit(name)) for name, keep in rules])
        )
    )
    return docs.select(
        "doc_id",
        F.array_join(failed, ",").alias("failed_rules"),
        (F.size(failed) == 0).alias("kept"),
    )


@register(
    "text_approx_topk_verdict",
    # Heavy-hitter sketch with a deterministic accuracy certificate, same
    # discipline as combo_approx_sketches: the sketch's item list is
    # engine-specific in general, but every token whose exact count is at
    # least 2x the exact (k+1)-th count MUST appear in approx_top_k(k) —
    # a margin the SpaceSaving/ItemsSketch error bound cannot breach —
    # so the boolean verdict is oracle-checkable.
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents WHERE trim(text) <> ''
    ),
    exact AS (
      SELECT tok, COUNT(*) AS exact_count FROM toks GROUP BY tok
    ),
    ranked AS (
      SELECT tok, exact_count,
             ROW_NUMBER() OVER (ORDER BY exact_count DESC, tok) AS rk
      FROM exact
    ),
    threshold AS (
      SELECT COALESCE(MAX(exact_count), 0) AS t FROM ranked WHERE rk = 11
    )
    SELECT tok, exact_count, TRUE AS in_approx_topk
    FROM ranked, threshold
    WHERE exact_count >= 2 * t
    """,
    operators=("A-ext:approx",),
    doc="approx_top_k heavy-hitter sketch (Spark 4, DataSketches "
    "frequent-items) with a deterministic margin verdict: tokens at "
    ">= 2x the exact 11th count must be reported in the sketch's "
    "top-10. Exact counts ride the comparison so the oracle verifies "
    "both the margin set and the membership booleans. In-repo slot; "
    "driver tag covered by combo_approx_sketches.",
)
def text_approx_topk_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    k = 10
    docs = read_testdata(spark, sf_dir, "documents")
    toks = docs.filter(F.trim("text") != "").select(
        F.explode(tokens("text")).alias("tok")
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_count"))
    ranked = exact.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("exact_count"), "tok"))
    )
    threshold = ranked.filter(F.col("rk") == k + 1).agg(
        F.coalesce(F.max("exact_count"), F.lit(0)).alias("__t")
    )
    approx = (
        toks.agg(F.expr(f"approx_top_k(tok, {k})").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("tok"), F.lit(True).alias("__in"))
    )
    return (
        ranked.crossJoin(F.broadcast(threshold))
        .filter(F.col("exact_count") >= 2 * F.col("__t"))
        .join(F.broadcast(approx), on="tok", how="left")
        .select(
            "tok",
            "exact_count",
            F.coalesce(F.col("__in"), F.lit(False)).alias("in_approx_topk"),
        )
    )


@register(
    "text_lm_perplexity",
    # Float discipline: per-token logp rounded at 9 and accumulated as
    # exact decimals on BOTH engines, so the only engine-library float
    # ops are ln (per vocab row) and exp (per doc) on bit-identical
    # inputs; the atol entry in tests/parity.py forgives their
    # last-ulp library differences (same precedent as
    # pandas_grouped_zscore).
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    ),
    doc_tok AS (
      SELECT doc_id, token, COUNT(*) AS cnt
      FROM tok WHERE length(token) > 0 GROUP BY doc_id, token
    ),
    vocab AS (SELECT token, SUM(cnt) AS ctok FROM doc_tok GROUP BY token),
    tot AS (SELECT SUM(ctok) AS t, COUNT(*) AS v FROM vocab),
    lp AS (
      SELECT token,
             CAST(ROUND(ln((ctok + 0.5) / (t + 0.5 * v)), 9)
                  AS DECIMAL(18,9)) AS logp
      FROM vocab, tot
    ),
    scored AS (
      SELECT d.doc_id,
             SUM(d.cnt) AS n_tokens,
             SUM(CAST(d.cnt AS DECIMAL(10,0)) * lp.logp) AS ll
      FROM doc_tok d JOIN lp USING (token) GROUP BY d.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(EXP(-(CAST(ll AS DOUBLE)) / CAST(n_tokens AS DOUBLE)), 4)
             AS ppl,
           CAST(NTILE(3) OVER (
             ORDER BY ROUND(EXP(-(CAST(ll AS DOUBLE))
                            / CAST(n_tokens AS DOUBLE)), 4), doc_id
           ) AS INTEGER) AS bucket
    FROM scored
    """,
    operators=("T-ext:perplexity", "T-ext:quality"),
    doc="CCNet-style LM perplexity filter (operators/lm.py, Wenzek et "
    "al. arXiv:1911.00359): an additively-smoothed unigram model is "
    "trained on the corpus itself, every document is scored by mean "
    "log-probability, and NTILE(3) over ascending perplexity yields the "
    "head/middle/tail buckets CCNet mixes from. Distributed shape = "
    "what a KenLM-backed variant would run: (doc, token) pre-aggregate, "
    "token-keyed model join, per-doc reduce — no Python, no driver "
    "state, exact-decimal log-prob accumulation.",
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.lm import (
        lm_perplexity,
        perplexity_buckets,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    return perplexity_buckets(lm_perplexity(docs, "doc_id", "text"))


@register(
    "text_bigram_backoff_ppl",
    # Same float discipline as text_lm_perplexity (exact decimal logp
    # sums; atol entry forgives last-ulp ln/exp library drift).
    oracle="""
    WITH sel AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         t -> length(t) > 0) AS arr
      FROM documents
    ),
    firsts AS (
      SELECT doc_id, CAST(NULL AS VARCHAR) AS prev, arr[1] AS token
      FROM sel WHERE len(arr) >= 1
    ),
    pairs AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(2, len(arr)),
                                   i -> arr[i-1])) AS prev,
             unnest(list_transform(generate_series(2, len(arr)),
                                   i -> arr[i])) AS token
      FROM sel WHERE len(arr) >= 2
    ),
    ev AS (SELECT * FROM firsts UNION ALL SELECT * FROM pairs),
    doc_ev AS (
      SELECT doc_id, prev, token, COUNT(*) AS cnt
      FROM ev GROUP BY doc_id, prev, token
    ),
    uni AS (SELECT token, SUM(cnt) AS c FROM doc_ev GROUP BY token),
    tot AS (SELECT SUM(c) AS n FROM uni),
    big AS (
      SELECT prev, token, SUM(cnt) AS cuv FROM doc_ev
      WHERE prev IS NOT NULL GROUP BY prev, token
    ),
    scored AS (
      SELECT d.doc_id, d.cnt,
             CAST(ROUND(CASE
               WHEN d.prev IS NULL
                 THEN ln(CAST(uv.c AS DOUBLE) / t.n)
               WHEN b.cuv IS NOT NULL
                 THEN ln(CAST(b.cuv AS DOUBLE) / up.c)
               ELSE ln(0.4) + ln(CAST(uv.c AS DOUBLE) / t.n)
             END, 9) AS DECIMAL(18,9)) AS logp
      FROM doc_ev d
      JOIN uni uv ON uv.token = d.token
      LEFT JOIN uni up ON up.token = d.prev
      LEFT JOIN big b ON b.prev = d.prev AND b.token = d.token
      CROSS JOIN tot t
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           ROUND(EXP(-(CAST(SUM(CAST(cnt AS DECIMAL(10,0)) * logp)
                       AS DOUBLE)) / CAST(SUM(cnt) AS DOUBLE)), 4) AS ppl
    FROM scored GROUP BY doc_id
    """,
    operators=("T-ext:perplexity",),
    doc="Bigram Stupid Backoff perplexity (operators/lm.py, Brants et "
    "al. EMNLP 2007): S(v|u) = f(uv)/f(u) when seen, else 0.4 * f(v)/N "
    "— the count-only distributed LM, scored per document as "
    "exp(-mean log S). The n-gram upgrade path from text_lm_perplexity: "
    "one lag() window per document builds the event stream, "
    "per-(doc,prev,token) pre-aggregation collapses repeats before the "
    "corpus shuffles, and the two count tables join back 1 row per key.",
)
def text_bigram_backoff_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.lm import (
        stupid_backoff_perplexity,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    return stupid_backoff_perplexity(docs, "doc_id", "text")


@register(
    "text_trigram_backoff_ppl",
    # Same float discipline as text_lm_perplexity (exact decimal logp
    # sums; atol entry forgives last-ulp ln/exp library drift).
    oracle="""
    WITH sel AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         t -> length(t) > 0) AS arr
      FROM documents
    ),
    ev AS (
      SELECT doc_id,
             CASE WHEN i >= 3 THEN arr[i-2] END AS p2,
             CASE WHEN i >= 2 THEN arr[i-1] END AS p1,
             arr[i] AS token
      FROM (
        SELECT doc_id, arr,
               unnest(generate_series(1, len(arr))) AS i
        FROM sel WHERE len(arr) >= 1) t
    ),
    doc_ev AS (
      SELECT doc_id, p2, p1, token, COUNT(*) AS cnt
      FROM ev GROUP BY doc_id, p2, p1, token
    ),
    uni AS (SELECT token, SUM(cnt) AS c1 FROM doc_ev GROUP BY token),
    tot AS (SELECT SUM(c1) AS n FROM uni),
    g2 AS (
      SELECT p1, token, SUM(cnt) AS c2 FROM doc_ev
      WHERE p1 IS NOT NULL GROUP BY p1, token
    ),
    g3 AS (
      SELECT p2, p1, token, SUM(cnt) AS c3 FROM doc_ev
      WHERE p2 IS NOT NULL GROUP BY p2, p1, token
    ),
    scored AS (
      SELECT d.doc_id, d.cnt,
             CAST(ROUND(CASE
               WHEN t3.c3 IS NOT NULL
                 THEN CAST(d.avail + 1 - 3 AS DOUBLE) * ln(0.4)
                      + ln(CAST(t3.c3 AS DOUBLE) / x3.c2)
               WHEN t2.c2 IS NOT NULL
                 THEN CAST(d.avail + 1 - 2 AS DOUBLE) * ln(0.4)
                      + ln(CAST(t2.c2 AS DOUBLE) / x2.c1)
               ELSE CAST(d.avail AS DOUBLE) * ln(0.4)
                    + ln(CAST(u.c1 AS DOUBLE) / tt.n)
             END, 9) AS DECIMAL(18,9)) AS logp
      FROM (
        SELECT *, CASE WHEN p2 IS NOT NULL THEN 2
                       WHEN p1 IS NOT NULL THEN 1 ELSE 0 END AS avail
        FROM doc_ev) d
      JOIN uni u ON u.token = d.token
      LEFT JOIN g3 t3 ON t3.p2 = d.p2 AND t3.p1 = d.p1
                     AND t3.token = d.token
      LEFT JOIN g2 x3 ON x3.p1 = d.p2 AND x3.token = d.p1
      LEFT JOIN g2 t2 ON t2.p1 = d.p1 AND t2.token = d.token
      LEFT JOIN uni x2 ON x2.token = d.p1
      CROSS JOIN tot tt
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           ROUND(EXP(-(CAST(SUM(CAST(cnt AS DECIMAL(10,0)) * logp)
                       AS DOUBLE)) / CAST(SUM(cnt) AS DOUBLE)), 4) AS ppl
    FROM scored GROUP BY doc_id
    """,
    operators=("T-ext:perplexity",),
    doc="Trigram Stupid Backoff perplexity (operators/lm.py:"
    "ngram_backoff_perplexity, Brants et al. EMNLP 2007 generalized to "
    "n-grams — CCNet's KenLM is 5-gram): the longest seen context wins, "
    "each back-off step multiplies 0.4, positions near the document "
    "start score from their available context length. One window with "
    "two lag() columns builds the event stream; all three count tables "
    "come off the same pre-aggregated (doc, p2, p1, token) stream; "
    "scoring is four equi-joins against 1-row-per-key count tables plus "
    "a broadcast scalar total. The join chain stays flat in corpus "
    "size (scaled-leg benched).",
)
def text_trigram_backoff_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.lm import (
        ngram_backoff_perplexity,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    return ngram_backoff_perplexity(docs, "doc_id", "text", order=3)


@register(
    "text_nb_lang_classify",
    # Exact decimals end to end (logps rounded at 9, decimal sums, the
    # argmax a pure decimal comparison) — same discipline as the lm
    # queries, so the whole train+score+argmax pipeline hash-verifies.
    oracle="""
    WITH base AS (SELECT doc_id, lang AS label, text FROM documents),
    score_base AS (
      SELECT doc_id, label, text FROM base
      UNION ALL SELECT -1, 'xx', '§oov1§ §oov2§ §oov1§'),
    tok AS (
      SELECT label,
             unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                t -> length(t) > 0)) AS token
      FROM base),
    cnt AS (SELECT label, token, COUNT(*) AS c FROM tok GROUP BY label, token),
    vocab AS (SELECT DISTINCT token FROM cnt),
    ltot AS (SELECT label, SUM(c) AS t FROM cnt GROUP BY label),
    dcnt AS (SELECT label, COUNT(*) AS d FROM base GROUP BY label),
    tot AS (SELECT (SELECT COUNT(*) FROM vocab) AS v,
                   (SELECT COUNT(*) FROM base) AS nd),
    grid AS (
      SELECT l.label, vv.token,
             CAST(ROUND(ln((COALESCE(c.c, 0) + 0.5)
                  / (l.t + 0.5 * tot.v)), 9) AS DECIMAL(18,9)) AS logp
      FROM vocab vv CROSS JOIN ltot l
      LEFT JOIN cnt c ON c.label = l.label AND c.token = vv.token
      CROSS JOIN tot),
    priors AS (
      SELECT l.label,
             CAST(ROUND(ln(CAST(d.d AS DOUBLE) / tot.nd), 9)
                  AS DECIMAL(18,9)) AS logprior,
             CAST(ROUND(ln(0.5 / (l.t + 0.5 * tot.v)), 9)
                  AS DECIMAL(18,9)) AS oov_logp
      FROM ltot l JOIN dcnt d USING (label) CROSS JOIN tot),
    doctok AS (
      SELECT doc_id, token, COUNT(*) AS cnt FROM (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                  t -> length(t) > 0)) AS token
        FROM score_base) t
      GROUP BY doc_id, token),
    iv AS (
      SELECT d.doc_id, g.label,
             SUM(CAST(d.cnt AS DECIMAL(10,0)) * g.logp) AS ll,
             SUM(d.cnt) AS n_iv
      FROM doctok d JOIN grid g ON g.token = d.token
      GROUP BY 1, 2),
    oovc AS (
      SELECT doc_id, SUM(cnt) AS n_oov FROM doctok
      WHERE token NOT IN (SELECT token FROM vocab) GROUP BY 1),
    scores AS (
      -- (doc, label) universe × LEFT-joined evidence: all-OOV docs
      -- score logprior + n_oov*oov_logp (operators/classify.py:nb_score)
      SELECT u.doc_id, p.label,
             p.logprior + COALESCE(iv.ll, 0)
               + CAST(COALESCE(o.n_oov, 0) AS DECIMAL(10,0)) * p.oov_logp
               AS score,
             CAST(COALESCE(iv.n_iv, 0) + COALESCE(o.n_oov, 0) AS BIGINT)
               AS n_tokens
      FROM (SELECT DISTINCT doc_id FROM doctok) u
      CROSS JOIN priors p
      LEFT JOIN iv ON iv.doc_id = u.doc_id AND iv.label = p.label
      LEFT JOIN oovc o ON o.doc_id = u.doc_id),
    ranked AS (
      SELECT doc_id, label, score, n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, label ASC) AS rn
      FROM scores)
    SELECT r.doc_id, r.label AS pred,
           (r.label = b.label) AS correct,
           r.n_tokens,
           CAST(ROUND(r.score * 10000, 0) AS BIGINT) AS score_e4
    FROM ranked r JOIN score_base b ON b.doc_id = r.doc_id
    WHERE r.rn = 1
    """,
    operators=("T-ext:lang-id", "T-ext:quality"),
    doc="Multinomial Naive Bayes language classification "
    "(operators/classify.py — the SQL-exact twin of the fastText "
    "classifiers CCNet/Gopher pipelines gate on): trained ON the corpus "
    "(label = the documents table's lang column) with additive "
    "smoothing, scored per document, argmax label with deterministic "
    "ties. Training is two hash aggregates (counting IS the fit, one "
    "corpus pass, no driver state); scoring is the lm.py token-join "
    "shape against the vocab x label grid. The scored set plants one "
    "ALL-OOV document (doc_id -1, every token outside the training "
    "vocabulary) so the oracle pins the logprior + n_oov*oov_logp "
    "floor path (VERDICT r6 #1). Output: prediction, agreement with "
    "the stored label, token count, and the exact decimal score "
    "integerized at 1e-4.",
)
def text_nb_lang_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.classify import (
        nb_predict,
        nb_train,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    planted = spark.createDataFrame(
        [(-1, "§oov1§ §oov2§ §oov1§", "xx")],
        schema="doc_id bigint, text string, lang string",
    )
    score_docs = docs.select("doc_id", "text", "lang").unionByName(planted)
    model = nb_train(docs, "lang", "text", alpha=0.5)
    pred = nb_predict(score_docs, model, "doc_id", "text")
    return pred.join(
        score_docs.select("doc_id", F.col("lang").alias("__lang")), "doc_id"
    ).select(
        "doc_id",
        "pred",
        (F.col("pred") == F.col("__lang")).alias("correct"),
        "n_tokens",
        F.round(F.col("score") * 10000, 0).cast("bigint").alias("score_e4"),
    )


#: DuckDB twin of ``operators/lm.py:corpus_divergence`` over
#: ``{toks}(s, word)`` token streams for splits ``{a}``/``{b}`` with
#: alpha = 1.0 — final relation ``dv_out(tokens_a, tokens_b, vocab,
#: ce_ab, kl_ab, kl_ba, js)``. Identical per-term arithmetic: round-9
#: ln of the smoothed ratio, DECIMAL(12,0) x DECIMAL(18,9) exact
#: count-weighted products, one fixed double formula per output.
DIVERGENCE_SQL_TMPL = """
    dv_vocab AS (
      SELECT word,
             SUM(CASE WHEN s = '{a}' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN s = '{b}' THEN 1 ELSE 0 END) AS cb
      FROM {toks} GROUP BY 1),
    dv_tot AS (
      SELECT SUM(ca) AS ta, SUM(cb) AS tb, COUNT(*) AS v FROM dv_vocab),
    dv_terms AS (
      SELECT ca, cb,
             CAST(ca AS DECIMAL(12,0)) * CAST(ROUND(ln((ca + 1.0)
               / (ta + 1.0 * v)), 9) AS DECIMAL(18,9)) AS saa,
             CAST(ca AS DECIMAL(12,0)) * CAST(ROUND(ln((cb + 1.0)
               / (tb + 1.0 * v)), 9) AS DECIMAL(18,9)) AS sab,
             CAST(cb AS DECIMAL(12,0)) * CAST(ROUND(ln((cb + 1.0)
               / (tb + 1.0 * v)), 9) AS DECIMAL(18,9)) AS sbb,
             CAST(cb AS DECIMAL(12,0)) * CAST(ROUND(ln((ca + 1.0)
               / (ta + 1.0 * v)), 9) AS DECIMAL(18,9)) AS sba,
             CAST(ca AS DECIMAL(12,0)) * CAST(ROUND(ln(((ca + 1.0)
               / (ta + 1.0 * v) + (cb + 1.0) / (tb + 1.0 * v)) / 2), 9)
               AS DECIMAL(18,9)) AS sam,
             CAST(cb AS DECIMAL(12,0)) * CAST(ROUND(ln(((ca + 1.0)
               / (ta + 1.0 * v) + (cb + 1.0) / (tb + 1.0 * v)) / 2), 9)
               AS DECIMAL(18,9)) AS sbm
      FROM dv_vocab CROSS JOIN dv_tot),
    dv_sums AS (
      SELECT SUM(ca) AS tokens_a, SUM(cb) AS tokens_b, COUNT(*) AS vocab,
             SUM(saa) AS saa, SUM(sab) AS sab, SUM(sbb) AS sbb,
             SUM(sba) AS sba, SUM(sam) AS sam, SUM(sbm) AS sbm
      FROM dv_terms),
    dv_out AS (
      SELECT CAST(tokens_a AS BIGINT) AS tokens_a,
             CAST(tokens_b AS BIGINT) AS tokens_b, vocab,
             ROUND(-CAST(sab AS DOUBLE) / CAST(tokens_a AS DOUBLE), 6)
               AS ce_ab,
             ROUND(CAST(saa - sab AS DOUBLE) / CAST(tokens_a AS DOUBLE), 6)
               AS kl_ab,
             ROUND(CAST(sbb - sba AS DOUBLE) / CAST(tokens_b AS DOUBLE), 6)
               AS kl_ba,
             ROUND(0.5 * CAST(saa - sam AS DOUBLE)
                     / CAST(tokens_a AS DOUBLE)
                 + 0.5 * CAST(sbb - sbm AS DOUBLE)
                     / CAST(tokens_b AS DOUBLE), 6) AS js
      FROM dv_sums)"""

#: en-vs-de instantiation over documents.lang (the declared query and
#: the combo_corpus_prep leg share it).
DIVERGENCE_SQL_CTES = (
    """
    dv_toks AS (
      SELECT s, word FROM (
        SELECT lang AS s,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
        FROM documents WHERE lang IN ('en', 'de')) dv_t0
      WHERE len(word) > 0),"""
    + DIVERGENCE_SQL_TMPL.format(toks="dv_toks", a="en", b="de")
)


@register(
    "text_corpus_divergence",
    oracle=f"""
    WITH {DIVERGENCE_SQL_CTES}
    SELECT tokens_a, tokens_b, vocab, ce_ab, kl_ab, kl_ba, js FROM dv_out
    """,
    operators=("T-ext:divergence",),
    doc="Corpus distribution drift (operators/lm.py:corpus_divergence): "
    "cross-entropy, both KL directions, and a Jensen-Shannon-style "
    "symmetric divergence between the English and German token "
    "distributions of the documents corpus (add-1 smoothed over the "
    "union vocabulary) — the mixture-tuning / domain-shift diagnostic "
    "run before blending sources. One (split, token) hash aggregate + "
    "a vocab-sized frame carrying six exact-decimal weighted log sums "
    "into a 1-row aggregate; round-9 ln terms + DECIMAL(12,0) x "
    "DECIMAL(18,9) products make the result hash-exact vs the DuckDB "
    "twin (the text_lm_perplexity float discipline).",
)
def text_corpus_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.lm import (
        corpus_divergence,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    return corpus_divergence(
        docs, "text", "lang", "en", "de", alpha=1.0
    )


#: DuckDB twin of ``operators/lm.py:pmi_collocations`` over the
#: ``documents`` table — ``pmi_sc(w1, w2, c_bigram, c_w1, c_w2, lp12,
#: praw)``. Identical arithmetic: the three-ln pinned-operand form
#: (no count products, safe at any corpus size), min_count filter
#: before the unigram joins.
PMI_SQL_CTES = """
    pmi_toks AS (
      SELECT regexp_split_to_array(trim(text), '\\s+') AS arr
      FROM documents WHERE length(trim(text)) > 0),
    pmi_uni AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(arr) AS w FROM pmi_toks) GROUP BY 1),
    pmi_bi AS (
      SELECT bg[1] AS w1, bg[2] AS w2, COUNT(*) AS c_bigram FROM (
        SELECT unnest(list_transform(generate_series(1, len(arr) - 1),
               i -> [arr[i], arr[i + 1]])) AS bg
        FROM pmi_toks WHERE len(arr) >= 2)
      GROUP BY 1, 2),
    pmi_nu AS (SELECT SUM(c) AS nu FROM pmi_uni),
    pmi_nb AS (SELECT SUM(c_bigram) AS nb FROM pmi_bi),
    pmi_sc AS (
      SELECT b.w1, b.w2, b.c_bigram, u1.c AS c_w1, u2.c AS c_w2, nb,
             ln(CAST(b.c_bigram AS DOUBLE) / nb) AS lp12,
             ln(CAST(b.c_bigram AS DOUBLE) / nb)
               - ln(CAST(u1.c AS DOUBLE) / nu)
               - ln(CAST(u2.c AS DOUBLE) / nu) AS praw
      FROM pmi_bi b
      JOIN pmi_uni u1 ON u1.w = b.w1
      JOIN pmi_uni u2 ON u2.w = b.w2
      CROSS JOIN pmi_nu CROSS JOIN pmi_nb
      WHERE b.c_bigram >= __PMI_MIN_COUNT__)"""


@register(
    "text_pmi_collocations",
    oracle=f"""
    WITH {PMI_SQL_CTES.replace("__PMI_MIN_COUNT__", "5")}
    SELECT w1, w2, CAST(c_bigram AS BIGINT) AS c_bigram,
           CAST(c_w1 AS BIGINT) AS c_w1, CAST(c_w2 AS BIGINT) AS c_w2,
           ROUND(praw, 6) AS pmi,
           CASE WHEN c_bigram = nb THEN 1.0
                ELSE ROUND(praw / -lp12, 6) END AS npmi
    FROM pmi_sc
    ORDER BY pmi DESC, w1, w2 LIMIT 50
    """,
    operators=("T-ext:collocation",),
    doc="Top-50 adjacent-bigram collocations by pointwise mutual "
    "information (operators/lm.py:pmi_collocations — the word2phrase / "
    "Mikolov et al. 2013 phrase-mining statistic, with normalized PMI): "
    "bigrams built JVM-side from the token array (transform over a "
    "slice — no window, no Python) and hash-aggregated with map-side "
    "combine, so the shuffle is bounded by the bigram vocabulary; "
    "unigram counts join on each side after the min_count cut; totals "
    "are 1-row broadcasts; top-k is TakeOrderedAndProject. The "
    "three-ln pinned-operand form avoids count products (double-safe "
    "at any corpus size) and both engines produce the identical double "
    "before the round-6, so the ranking hash-verifies.",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.lm import (
        pmi_collocations,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    return pmi_collocations(docs, "text", min_count=5, k=50)


#: DuckDB twin of ``operators/classify.py:token_label_association`` —
#: ``tla_sc(label, token, c_tl, c_t, chi2, log_odds)`` over the
#: documents corpus labeled by ``lang``. Pinned double operand order
#: (counts cast exactly as the Spark expressions are built).
TLA_SQL_CTES = """
    tla_tl AS (
      SELECT label, token, COUNT(*) AS c_tl FROM (
        SELECT lang AS label,
               unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                      x -> length(x) > 0)) AS token
        FROM documents) GROUP BY 1, 2),
    tla_tok AS (SELECT token, SUM(c_tl) AS c_t FROM tla_tl GROUP BY 1),
    tla_lab AS (SELECT label, SUM(c_tl) AS n_l FROM tla_tl GROUP BY 1),
    tla_n AS (SELECT SUM(c_tl) AS n_total FROM tla_tl),
    tla_sc AS (
      SELECT label, token, c_tl, CAST(c_t AS BIGINT) AS c_t,
             ROUND(CAST(n_total AS DOUBLE)
               * (CAST(c_tl AS DOUBLE)
                    * CAST(n_total - n_l - (c_t - c_tl) AS DOUBLE)
                  - CAST(c_t - c_tl AS DOUBLE) * CAST(n_l - c_tl AS DOUBLE))
               * (CAST(c_tl AS DOUBLE)
                    * CAST(n_total - n_l - (c_t - c_tl) AS DOUBLE)
                  - CAST(c_t - c_tl AS DOUBLE) * CAST(n_l - c_tl AS DOUBLE))
               / ((CAST(c_tl AS DOUBLE) + CAST(c_t - c_tl AS DOUBLE))
                  * (CAST(n_l - c_tl AS DOUBLE)
                     + CAST(n_total - n_l - (c_t - c_tl) AS DOUBLE))
                  * (CAST(c_tl AS DOUBLE) + CAST(n_l - c_tl AS DOUBLE))
                  * (CAST(c_t - c_tl AS DOUBLE)
                     + CAST(n_total - n_l - (c_t - c_tl) AS DOUBLE))),
               6) AS chi2,
             ROUND(ln((CAST(c_tl AS DOUBLE) + 0.5)
                      * (CAST(n_total - n_l - (c_t - c_tl) AS DOUBLE) + 0.5)
                      / ((CAST(c_t - c_tl AS DOUBLE) + 0.5)
                         * (CAST(n_l - c_tl AS DOUBLE) + 0.5))), 6)
               AS log_odds
      FROM tla_tl
      JOIN tla_tok USING (token)
      JOIN tla_lab USING (label)
      CROSS JOIN tla_n
      WHERE c_t >= __TLA_MIN_COUNT__)"""


@register(
    "text_token_label_chi2",
    oracle=f"""
    WITH {TLA_SQL_CTES.replace("__TLA_MIN_COUNT__", "5")}
    SELECT label, token, c_tl, c_t, chi2, log_odds, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY label ORDER BY chi2 DESC, token ASC) AS INTEGER) AS rank
      FROM tla_sc) r
    WHERE rank <= 20
    """,
    operators=("T-ext:feature-select",),
    doc="Chi-square / log-odds token-label feature selection (operators/"
    "classify.py:token_label_association — Manning et al. IR ch. 13, "
    "distributed): per language label, the 20 most discriminative "
    "tokens by the 2x2 occurrence-table chi-square with "
    "Haldane-corrected log-odds alongside. ONE full-data pass (the "
    "(token, label) hash aggregate); token/label/grand totals are "
    "second-level aggregates over that bounded frame; the ranking "
    "window partitions by label over the filtered vocabulary. Pinned "
    "double operand order keeps both engines bit-identical before the "
    "round-6 — at real scale the integer chi-square numerator "
    "overflows any decimal, so the double path IS the production "
    "arithmetic, not a shortcut.",
)
def text_token_label_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.classify import (
        token_label_association,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    return token_label_association(
        docs, "lang", "text", min_count=5, k_per_label=20
    )


@register(
    "text_unigram_token_stats",
    # Viterbi token counts are engine-specific (the segmentation needs
    # the vocab's log-probs), but the encoding's COVERAGE is not: a
    # lossless partition of each whitespace unit means the covered
    # character sum equals the document's non-whitespace char count,
    # which DuckDB computes directly. token_bound_ok is the verdict
    # column (every piece covers 1..max_piece_len chars, so n_tokens is
    # bracketed by ceil(coverage/6) and coverage).
    oracle="""
    SELECT doc_id,
           CAST(length(regexp_replace(text, '[ \t\n\x0b\f\r]+', '', 'g')) AS BIGINT)
             AS coverage_chars,
           TRUE AS token_bound_ok
    FROM documents
    """,
    operators=("T-ext:unigram",),
    doc="Unigram-LM encoder stats under the pinned vocab fixture "
    "(functions/unigram.py, VERDICT r8 #4): per document, the real "
    "Viterbi encoding's covered-character sum — oracle-verified against "
    "the non-whitespace char count (the lossless-partition certificate; "
    "a lossy or overlapping segmentation flips the hash) — plus the "
    "token-count bracket verdict ceil(coverage/max_piece_len) <= "
    "n_tokens <= coverage. Trainer exactness (distributed EM == "
    "pure-Python reference, bit-equal) is pinned in tests/test_unigram.",
)
def text_unigram_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.unigram import (
        load_unigram,
        unigram_stats_col,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    st = unigram_stats_col("text", load_unigram(), 6)
    return docs.select("doc_id", st.alias("__s")).select(
        "doc_id",
        F.col("__s.coverage_chars").alias("coverage_chars"),
        (
            (F.col("__s.n_tokens") <= F.col("__s.coverage_chars"))
            & (
                F.col("__s.n_tokens")
                >= F.ceil(F.col("__s.coverage_chars") / F.lit(6.0))
            )
        ).alias("token_bound_ok"),
    )
