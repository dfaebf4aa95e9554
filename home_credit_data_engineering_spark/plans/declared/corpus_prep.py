"""Corpus-preparation declared queries: exact-substring (span) dedup,
sequence packing, retrieval chunking.

The operators live in ``operators/spans.py`` and ``operators/packing.py``;
this module binds them to the documents table with full DuckDB oracles.
All three families are deterministic pure-relational pipelines (md5 window
hashes / md5 permutation ordering), so every query here is exactly
hash-verifiable cross-engine — no rows-only escape hatches.

``combo_corpus_prep`` packs the whole family into one driver slot
(registry.DRIVER_SET), unioned to a common (kind, doc_id, k1..k6, s)
schema; the fine-grained singles stay registered for the in-repo
full-registry parity gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from home_credit_data_engineering_spark.plans.declared.packed import (
    _PLANTED_VALUES as _PACKC_VALUES,
    planted_packed_df,
)
from home_credit_data_engineering_spark.plans.declared.text3 import (
    DIVERGENCE_SQL_CTES as _DIV_CTES,
    PMI_SQL_CTES,
)

#: PMI collocation CTE chain at the combo's min_count (text3 twin).
_PMI_CTES = PMI_SQL_CTES.replace("__PMI_MIN_COUNT__", "5")
from home_credit_data_engineering_spark.plans.declared.text2 import (
    _BPE_REAL_CTES,
    _bpe_real_df,
)
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata

#: Planted packed-corpus bins (import-time python-reference expectation,
#: see plans/declared/packed.py) — the combo's `packc` leg.
_PACKC_CTES = f"""
    packc_planted(shard, bin_id, n_docs, n_tokens, ids_md5, starts_md5)
      AS (VALUES
      {_PACKC_VALUES})
"""

_SPAN_K = 8
_PACK_BUDGET = 512
_PACK_SHARDS = 8
_CHUNK = 32
_STRIDE = 16

# Shared oracle CTEs: md5 k-gram stream (0-based positions) -> duplicated
# windows -> islands -> maximal spans. Mirrors operators/spans.py exactly;
# the Spark production path uses xxhash64 window hashes, but spans are
# defined by window EQUALITY, so the two agree modulo 64-bit collisions.
_GRAM_CONCAT = " || ' ' || ".join(
    ["tok"] + [f"lead(tok, {j}) OVER w" for j in range(1, _SPAN_K)]
)
_SPAN_CTES = f"""
    toks AS (
      SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) - 1 AS pos
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
            FROM documents)
    ),
    grams AS (
      SELECT doc_id, pos, md5({_GRAM_CONCAT}) AS fp,
             lead(tok, {_SPAN_K - 1}) OVER w AS last_lead
      FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    valid AS (SELECT doc_id, pos, fp FROM grams WHERE last_lead IS NOT NULL),
    dup AS (SELECT fp FROM valid GROUP BY fp HAVING COUNT(*) >= 2),
    hits AS (SELECT v.doc_id, v.pos FROM valid v JOIN dup USING (fp)),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM hits
    ),
    spans AS (
      SELECT doc_id,
             MIN(pos) AS span_start,
             MAX(pos) + {_SPAN_K - 1} AS span_end,
             MAX(pos) - MIN(pos) + {_SPAN_K} AS span_tokens
      FROM isl GROUP BY doc_id, g
    )
"""

_STRIP_CTES = f"""
    {_SPAN_CTES},
    kept AS (
      SELECT t.doc_id, t.pos, t.tok FROM toks t
      WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = t.doc_id
          AND t.pos BETWEEN s.span_start AND s.span_end
      )
    ),
    rejoined AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS joined
      FROM kept GROUP BY doc_id
    ),
    covered AS (
      SELECT doc_id, SUM(span_tokens) AS removed FROM spans GROUP BY doc_id
    ),
    stripped AS (
      SELECT d.doc_id,
             CASE WHEN c.doc_id IS NULL THEN d.text
                  ELSE COALESCE(r.joined, '') END AS text_clean,
             CAST(COALESCE(c.removed, 0) AS INTEGER) AS removed_tokens
      FROM documents d
      LEFT JOIN rejoined r ON r.doc_id = d.doc_id
      LEFT JOIN covered c ON c.doc_id = d.doc_id
    )
"""

_PACK_CTES = f"""
    pk_base AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n,
             md5('s42:' || CAST(doc_id AS VARCHAR)) AS ord_key,
             CAST(CAST('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % {_PACK_SHARDS} AS INTEGER) AS shard
      FROM documents
    ),
    pk_cum AS (
      SELECT doc_id, shard, CAST(n AS BIGINT) AS n,
             CAST(COALESCE(SUM(n) OVER (
               PARTITION BY shard ORDER BY ord_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_offset
      FROM pk_base WHERE n >= 1
    ),
    packed AS (
      SELECT doc_id, shard, start_offset,
             CAST(FLOOR(start_offset / {_PACK_BUDGET}) AS BIGINT) AS seq_first,
             CAST(FLOOR((start_offset + n - 1) / {_PACK_BUDGET}) AS BIGINT)
               AS seq_last,
             n AS token_count,
             CAST(FLOOR((start_offset + n - 1) / {_PACK_BUDGET})
                  - FLOOR(start_offset / {_PACK_BUDGET}) + 1 AS BIGINT) AS n_seqs
      FROM pk_cum
    )
"""

_CHUNK_CTES = f"""
    ck_base AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST(chunk_start / {_STRIDE} AS INTEGER) AS chunk_id,
             CAST(chunk_start AS INTEGER) AS chunk_start,
             CAST(LEAST({_CHUNK}, n - chunk_start) AS INTEGER) AS chunk_len,
             array_to_string(arr[chunk_start + 1 : chunk_start + {_CHUNK}], ' ')
               AS chunk_text
      FROM (SELECT doc_id, arr, n,
                   unnest(generate_series(0, n - 1, {_STRIDE})) AS chunk_start
            FROM ck_base WHERE n > 0)
    )
"""


_MIX_BUDGETS = {"src0": 800, "src1": 400, "src2": 1200}

_MIX_CTES = f"""
    mx_base AS (
      SELECT doc_id, source,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                  AS BIGINT) AS token_count,
             md5('s42:' || CAST(doc_id AS VARCHAR)) AS ord_key,
             CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 400
                         WHEN 'src2' THEN 1200 END AS budget
      FROM documents
    ),
    mixed AS (
      SELECT doc_id, source, token_count,
             CAST(COALESCE(SUM(token_count) OVER (
               PARTITION BY source ORDER BY ord_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS start_offset
      FROM mx_base WHERE budget IS NOT NULL AND token_count >= 1
    )
"""

#: Unigram LM perplexity legs (same arithmetic as text_lm_perplexity's
#: oracle; ppl integerized at 1e-4 so the combo stays bit-hash exact).
_PPL_CTES = """
    ppl_tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    ),
    ppl_doc_tok AS (
      SELECT doc_id, token, COUNT(*) AS cnt
      FROM ppl_tok WHERE length(token) > 0 GROUP BY doc_id, token
    ),
    ppl_vocab AS (
      SELECT token, SUM(cnt) AS ctok FROM ppl_doc_tok GROUP BY token
    ),
    ppl_tot AS (SELECT SUM(ctok) AS t, COUNT(*) AS v FROM ppl_vocab),
    ppl_lp AS (
      SELECT token,
             CAST(ROUND(ln((ctok + 0.5) / (t + 0.5 * v)), 9)
                  AS DECIMAL(18,9)) AS logp
      FROM ppl_vocab, ppl_tot
    ),
    ppl_scored AS (
      SELECT d.doc_id, SUM(d.cnt) AS n_tokens,
             SUM(CAST(d.cnt AS DECIMAL(10,0)) * l.logp) AS ll
      FROM ppl_doc_tok d JOIN ppl_lp l USING (token) GROUP BY d.doc_id
    ),
    ppl_final AS (
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(ROUND(ROUND(EXP(-(CAST(ll AS DOUBLE))
               / CAST(n_tokens AS DOUBLE)), 4) * 10000, 0) AS BIGINT)
               AS ppl_e4,
             CAST(NTILE(3) OVER (
               ORDER BY ROUND(EXP(-(CAST(ll AS DOUBLE))
                 / CAST(n_tokens AS DOUBLE)), 4), doc_id) AS BIGINT)
               AS bucket
      FROM ppl_scored
    )
"""

#: Canonical-cluster best-variant survivors (same as dedup_canonical_best).
_SURV_CTES = """
    surv_c AS (
      SELECT doc_id, n_chars,
             CASE WHEN canon = '' THEN md5(lower(trim(text)))
                  ELSE md5(canon) END AS cluster_id
      FROM (
        SELECT doc_id, n_chars, text,
               trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 \\t\\n\\r\\f]', '', 'g'),
                 '[ \\t\\n\\r\\f]+', ' ', 'g')) AS canon
        FROM documents) surv_t0
    ),
    surv AS (
      SELECT doc_id, cluster_id, n_chars AS score,
             FIRST_VALUE(doc_id) OVER (
               PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC
             ) AS keep_id
      FROM surv_c
    )
"""


def _spans_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.spans import duplicated_spans

    docs = read_testdata(spark, sf_dir, "documents")
    return duplicated_spans(docs, "doc_id", "text", k=_SPAN_K)


#: Idempotent persist for combo_corpus_prep's two-consumer spans leg:
#: keyed on (applicationId, sf_dir) with at most ONE live entry, so
#: repeated registry/bench invocations in a single session reuse the
#: same persisted RDD instead of accumulating cached copies (ADVICE r4
#: — the old bare .persist() leaked one cache entry per invocation and
#: relied on callers running clearCache()).
_SPANS_PERSISTED: dict[tuple[str, str], DataFrame] = {}


def _spans_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SPANS_PERSISTED:
        for old in _SPANS_PERSISTED.values():
            try:
                old.unpersist()
            except Exception:  # noqa: BLE001 — stale handle from a stopped session
                pass
        _SPANS_PERSISTED.clear()
        _SPANS_PERSISTED[key] = _spans_df(spark, sf_dir).persist()
    return _SPANS_PERSISTED[key]


@register(
    "text_duplicated_spans",
    oracle=f"WITH {_SPAN_CTES} "
    "SELECT doc_id, span_start, span_end, span_tokens FROM spans",
    operators=("T-ext:substring-dedup",),
    doc="Exact-substring dedup at window granularity (Lee et al., "
    "arXiv:2107.06499): maximal token spans whose every 8-token window "
    "occurs >= 2 times in the corpus. Production path hashes windows with "
    "xxhash64 over per-token hashes (no window strings materialized); the "
    "oracle rebuilds the same spans from md5 window digests — valid "
    "because spans depend only on window equality. The reference's dedup "
    "surface is whole-row dropDuplicates only (SURVEY §2.5); this is the "
    "passage-level operator an LLM corpus needs.",
)
def text_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spans_df(spark, sf_dir)


@register(
    "text_strip_duplicate_spans",
    oracle=f"WITH {_STRIP_CTES} "
    "SELECT doc_id, text_clean, removed_tokens FROM stripped",
    operators=("T-ext:substring-dedup", "T-ext:span-strip"),
    doc="Span-removal stage of exact-substring dedup: duplicated spans "
    "are cut out of each document (surviving tokens re-joined; documents "
    "without spans pass through verbatim). Token filtering happens in one "
    "projection via nested higher-order functions — the text never rides "
    "a shuffle.",
)
def text_strip_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.spans import strip_spans

    docs = read_testdata(spark, sf_dir, "documents")
    spans = _spans_df(spark, sf_dir)
    return strip_spans(docs, spans, "doc_id", "text")


@register(
    "text_sequence_packing",
    oracle=f"WITH {_PACK_CTES} SELECT doc_id, shard, start_offset, seq_first, "
    "seq_last, token_count, n_seqs FROM packed",
    operators=("T-ext:packing",),
    doc="GPT-style concatenate-and-chop training-sequence packing: "
    "documents hash-sharded and ordered by a seeded md5 permutation, "
    "token streams abutted and cut every 512 tokens; per-document start "
    "offset and spanned sequence range. Deterministic, append-stable, "
    "fully SQL-oracled; only (doc_id, token_count) metadata shuffles.",
)
def text_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.text import token_count
    from home_credit_data_engineering_spark.operators.packing import pack_sequences

    docs = read_testdata(spark, sf_dir, "documents")
    return pack_sequences(
        docs.withColumn("__ntok", token_count("text")),
        "doc_id",
        "__ntok",
        budget=_PACK_BUDGET,
        shards=_PACK_SHARDS,
    )


@register(
    "text_chunk_windows",
    oracle=f"WITH {_CHUNK_CTES} SELECT doc_id, chunk_id, chunk_start, "
    "chunk_len, chunk_text FROM chunks",
    operators=("T-ext:chunking",),
    doc="Overlapping token-window chunks (RAG/embedding prep): 32-token "
    "windows every 16 tokens, trailing partial chunks kept with their "
    "actual length. Narrow sequence+explode+slice projection — zero "
    "shuffle, zero Python (plan-asserted in tests/test_plan_quality.py).",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.packing import chunk_documents

    docs = read_testdata(spark, sf_dir, "documents")
    return chunk_documents(
        docs, "doc_id", "text", chunk_tokens=_CHUNK, stride=_STRIDE
    )


#: C4-style duplicate-line removal oracle: md5 replay of the xxhash64
#: path (valid because removals depend only on line EQUALITY), global
#: first occurrence kept, blank lines never considered.
_LINE_CTES = """
    dl_lines AS (
      SELECT doc_id, i - 1 AS line_pos, arr[i] AS line
      FROM (
        SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i
        FROM (SELECT doc_id, regexp_split_to_array(text, '\n') AS arr
              FROM documents) t0) t1
    ),
    dl_ranked AS (
      SELECT doc_id, line_pos,
             COUNT(*) OVER (PARTITION BY md5(line)) AS cnt,
             ROW_NUMBER() OVER (
               PARTITION BY md5(line) ORDER BY doc_id, line_pos) AS rn
      FROM dl_lines WHERE trim(line) <> ''
    ),
    dl_removed AS (
      SELECT doc_id, line_pos FROM dl_ranked WHERE cnt >= 2 AND rn >= 2
    ),
    dl_out AS (
      SELECT l.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(COUNT(r.line_pos) AS BIGINT) AS removed_lines,
             md5(COALESCE(string_agg(
               CASE WHEN r.line_pos IS NULL THEN l.line END,
               chr(10) ORDER BY l.line_pos), '')) AS clean_md5
      FROM dl_lines l
      LEFT JOIN dl_removed r
        ON r.doc_id = l.doc_id AND r.line_pos = l.line_pos
      GROUP BY l.doc_id
    )
"""


@register(
    "text_temperature_mix",
    oracle="""
    WITH sizes AS (
      SELECT source,
             SUM(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)
               AS n_tokens
      FROM documents GROUP BY source
    ),
    keyed AS (
      SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)), 6)
                  AS DECIMAL(28,6)) AS p
      FROM sizes
    ),
    tot AS (SELECT SUM(p) AS tp FROM keyed)
    SELECT source, n_tokens,
           ROUND(CAST(p AS DOUBLE) / CAST(tp AS DOUBLE), 6) AS weight,
           CAST(FLOOR(100000 * ROUND(CAST(p AS DOUBLE)
                / CAST(tp AS DOUBLE), 6)) AS BIGINT) AS budget
    FROM keyed, tot
    """,
    operators=("T-ext:mixing",),
    doc="Temperature-based mixture budgets (operators/packing.py:"
    "temperature_mix_budgets; T5 arXiv:1910.10683 §3.4.3, XLM-R "
    "arXiv:1911.02116): per-source sampling weight ∝ (token share)^α "
    "with α=0.5, upsampling small sources without drowning large ones; "
    "budget = floor(total × weight) feeds token_budget_mix. Exactly "
    "hash-verifiable because the only float ops are IEEE-exact sqrt on "
    "integer totals, a round-6, an order-free exact-decimal sum of the "
    "rounded powers, and one fixed ratio expression — the _stable.py "
    "discipline. One sources-cardinality aggregate; nothing scales "
    "with corpus rows except the scan.",
)
def text_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.text import token_count
    from home_credit_data_engineering_spark.operators.packing import (
        temperature_mix_budgets,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    counted = docs.select(
        "source", token_count("text").alias("n_tok")
    )
    return temperature_mix_budgets(
        counted, "source", "n_tok", total_budget=100_000, alpha=0.5
    )


@register(
    "text_line_dedup",
    oracle=f"""
    WITH {_LINE_CTES}
    SELECT doc_id, n_lines, removed_lines, clean_md5 FROM dl_out
    """,
    operators=("T-ext:line-dedup",),
    doc="Corpus-level duplicate-LINE removal (operators/spans.py:"
    "duplicated_lines + strip_lines) — the C4/RefinedWeb boilerplate "
    "pass (cookie banners, nav text): a non-blank line occurring >= 2 "
    "times corpus-wide keeps its global first occurrence and every "
    "other copy is stripped, order and blank lines preserved. "
    "Production path hashes lines with xxhash64 in the same narrow "
    "projection as the explode, so only (doc_id, line_pos, hash8) "
    "rides any Exchange; removals depend only on line equality, so the "
    "md5 SQL oracle verifies that path exactly (the duplicated_spans "
    "argument). Output is the per-document verdict (line counts + md5 "
    "of the cleaned text) for driver-scalar compliance.",
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.spans import (
        duplicated_lines,
        strip_lines,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    removals = duplicated_lines(docs, "doc_id", "text", min_count=2)
    cleaned = strip_lines(docs, removals, "doc_id", "text")
    return cleaned.select(
        "doc_id",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("removed_lines").cast("bigint").alias("removed_lines"),
        F.md5(F.col("text_clean").cast("binary")).alias("clean_md5"),
    )


@register(
    "combo_corpus_prep",
    oracle=f"""
    WITH {_STRIP_CTES},
    {_PACK_CTES},
    {_CHUNK_CTES},
    {_MIX_CTES},
    {_PPL_CTES},
    {_SURV_CTES},
    {_BPE_REAL_CTES},
    {_LINE_CTES},
    {_PACKC_CTES},
    {_DIV_CTES},
    {_PMI_CTES}
    SELECT 'span' AS kind, doc_id, CAST(span_start AS BIGINT) AS k1,
           CAST(span_end AS BIGINT) AS k2, CAST(span_tokens AS BIGINT) AS k3,
           CAST(NULL AS BIGINT) AS k4, CAST(NULL AS BIGINT) AS k5,
           CAST(NULL AS BIGINT) AS k6, CAST(NULL AS VARCHAR) AS s
    FROM spans
    UNION ALL
    SELECT 'strip', doc_id, CAST(removed_tokens AS BIGINT), NULL, NULL,
           NULL, NULL, NULL, text_clean
    FROM stripped
    UNION ALL
    SELECT 'pack', doc_id, CAST(shard AS BIGINT), start_offset, seq_first,
           seq_last, token_count, n_seqs, NULL
    FROM packed
    UNION ALL
    SELECT 'chunk', doc_id, CAST(chunk_id AS BIGINT),
           CAST(chunk_start AS BIGINT), CAST(chunk_len AS BIGINT),
           NULL, NULL, NULL, chunk_text
    FROM chunks
    UNION ALL
    SELECT 'mix', doc_id, token_count, start_offset, NULL, NULL, NULL,
           NULL, source
    FROM mixed
    WHERE start_offset < CASE source WHEN 'src0' THEN 800
                                     WHEN 'src1' THEN 400 ELSE 1200 END
    UNION ALL
    SELECT 'ppl', doc_id, n_tokens, bucket, ppl_e4, NULL, NULL, NULL, NULL
    FROM ppl_final
    UNION ALL
    SELECT 'survivor', doc_id, CAST(score AS BIGINT), keep_id,
           CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END,
           NULL, NULL, NULL, cluster_id
    FROM surv
    UNION ALL
    SELECT 'bpe', doc_id, n_pretokens, n_bytes, n_bpe,
           CASE WHEN bounds_ok THEN 1 ELSE 0 END, NULL, NULL, leg
    FROM bpe_out
    UNION ALL
    SELECT 'line', doc_id, n_lines, removed_lines, NULL, NULL, NULL, NULL,
           clean_md5
    FROM dl_out
    UNION ALL
    SELECT 'packw', CAST(shard AS BIGINT), COUNT(*),
           CAST(SUM(CAST(n AS BIGINT)) AS BIGINT), 1, 1, 1, NULL, NULL
    FROM (
      SELECT CAST(CAST('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)),
                  1, 8) AS BIGINT) % 8 AS INTEGER) AS shard,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n
      FROM documents
    ) pw_combo WHERE n >= 1 GROUP BY shard
    UNION ALL
    SELECT 'packc', CAST(shard AS BIGINT), CAST(bin_id AS BIGINT),
           CAST(n_docs AS BIGINT), CAST(n_tokens AS BIGINT), 1, NULL, NULL,
           ids_md5 || ':' || starts_md5
    FROM packc_planted
    UNION ALL
    SELECT 'div', CAST(0 AS BIGINT), tokens_a, tokens_b, vocab,
           CAST(ROUND(ce_ab * 1000000, 0) AS BIGINT),
           CAST(ROUND(kl_ab * 1000000, 0) AS BIGINT),
           CAST(ROUND(kl_ba * 1000000, 0) AS BIGINT),
           CAST(CAST(ROUND(js * 1000000, 0) AS BIGINT) AS VARCHAR)
    FROM dv_out
    UNION ALL
    SELECT 'colloc', CAST(NULL AS BIGINT), CAST(c_bigram AS BIGINT),
           CAST(c_w1 AS BIGINT), CAST(c_w2 AS BIGINT),
           CAST(ROUND(ROUND(praw, 6) * 1000000, 0) AS BIGINT),
           CAST(ROUND(CASE WHEN c_bigram = nb THEN 1.0
                           ELSE ROUND(praw / -lp12, 6) END * 1000000, 0)
                AS BIGINT),
           CAST(NULL AS BIGINT),
           w1 || ' ' || w2
    FROM (SELECT * FROM pmi_sc
          ORDER BY ROUND(praw, 6) DESC, w1, w2 LIMIT 20) pc
    """,
    operators=(
        "T-ext:substring-dedup",
        "T-ext:span-strip",
        "T-ext:packing",
        "T-ext:pack-whole",
        "T-ext:chunking",
        "T-ext:mixing",
        "T-ext:perplexity",
        "D-ext:survivor-policy",
        "T-ext:bpe-real",
        "T-ext:line-dedup",
        "T-ext:packed-corpus",
        "T-ext:divergence",
        "T-ext:collocation",
    ),
    doc="Driver slot packing the corpus-preparation family: duplicated "
    "spans (Lee et al. exact-substring dedup), span-stripped documents, "
    "sequence-packing assignment, retrieval chunks, the token-budget "
    "mixture sample, and (r5) the CCNet-style LM perplexity verdict "
    "(n_tokens, head/middle/tail bucket, ppl integerized at 1e-4), "
    "canonical-cluster best-variant survivors, the whole-document "
    "FFD packing certificate (per-shard totals + capacity/first-fit/"
    "2x-OPT verdicts), and (r7) the en-vs-de divergence diagnostics "
    "and top-20 PMI bigram collocations, unioned to a common "
    "(kind, doc_id, k1..k6, s) schema. Every leg is exactly "
    "hash-verified; fine-grained singles stay in the registry for the "
    "in-repo parity gate.",
)
def combo_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.spans import strip_spans

    docs = read_testdata(spark, sf_dir, "documents")
    # two consumers (span leg + strip join) — persist per the
    # multi-consumer rule, via the idempotent session-keyed cache above
    spans = _spans_persisted(spark, sf_dir)
    stripped = strip_spans(docs, spans, "doc_id", "text")
    packed = text_sequence_packing(spark, sf_dir)
    chunks = text_chunk_windows(spark, sf_dir)

    b = F.lit(None).cast("bigint")
    s = F.lit(None).cast("string")
    span_leg = spans.select(
        F.lit("span").alias("kind"),
        "doc_id",
        F.col("span_start").cast("bigint").alias("k1"),
        F.col("span_end").cast("bigint").alias("k2"),
        F.col("span_tokens").cast("bigint").alias("k3"),
        b.alias("k4"),
        b.alias("k5"),
        b.alias("k6"),
        s.alias("s"),
    )
    strip_leg = stripped.select(
        F.lit("strip").alias("kind"),
        "doc_id",
        F.col("removed_tokens").cast("bigint").alias("k1"),
        b.alias("k2"),
        b.alias("k3"),
        b.alias("k4"),
        b.alias("k5"),
        b.alias("k6"),
        F.col("text_clean").alias("s"),
    )
    pack_leg = packed.select(
        F.lit("pack").alias("kind"),
        "doc_id",
        F.col("shard").cast("bigint").alias("k1"),
        F.col("start_offset").cast("bigint").alias("k2"),
        F.col("seq_first").cast("bigint").alias("k3"),
        F.col("seq_last").cast("bigint").alias("k4"),
        F.col("token_count").cast("bigint").alias("k5"),
        F.col("n_seqs").cast("bigint").alias("k6"),
        s.alias("s"),
    )
    chunk_leg = chunks.select(
        F.lit("chunk").alias("kind"),
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("k1"),
        F.col("chunk_start").cast("bigint").alias("k2"),
        F.col("chunk_len").cast("bigint").alias("k3"),
        b.alias("k4"),
        b.alias("k5"),
        b.alias("k6"),
        F.col("chunk_text").alias("s"),
    )
    mixed = text_token_budget_mix(spark, sf_dir)
    mix_leg = mixed.select(
        F.lit("mix").alias("kind"),
        "doc_id",
        F.col("token_count").cast("bigint").alias("k1"),
        F.col("start_offset").cast("bigint").alias("k2"),
        b.alias("k3"),
        b.alias("k4"),
        b.alias("k5"),
        b.alias("k6"),
        F.col("source").alias("s"),
    )
    from home_credit_data_engineering_spark.operators.lm import (
        lm_perplexity,
        perplexity_buckets,
    )

    ppl = perplexity_buckets(lm_perplexity(docs, "doc_id", "text"))
    ppl_leg = ppl.select(
        F.lit("ppl").alias("kind"),
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("k1"),
        F.col("bucket").cast("bigint").alias("k2"),
        # ppl is already rounded at 4; integerize so the combo's exact
        # hash gate never touches a float column
        F.round(F.col("ppl") * 10000, 0).cast("bigint").alias("k3"),
        b.alias("k4"),
        b.alias("k5"),
        b.alias("k6"),
        s.alias("s"),
    )
    from home_credit_data_engineering_spark.functions.text import (
        canonical_fingerprint,
    )
    from home_credit_data_engineering_spark.operators.dedup import (
        survivors_by_score,
    )

    surv = survivors_by_score(
        docs.select("doc_id", canonical_fingerprint("text").alias("cluster_id")),
        docs.select("doc_id", F.col("n_chars").alias("score")),
    )
    surv_leg = surv.select(
        F.lit("survivor").alias("kind"),
        "doc_id",
        F.col("score").cast("bigint").alias("k1"),
        F.col("keep_id").cast("bigint").alias("k2"),
        F.col("is_survivor").cast("bigint").alias("k3"),
        b.alias("k4"),
        b.alias("k5"),
        b.alias("k6"),
        F.col("cluster_id").alias("s"),
    )
    bpe_leg = _bpe_real_df(spark, sf_dir).select(
        F.lit("bpe").alias("kind"),
        "doc_id",
        F.col("n_pretokens").alias("k1"),
        F.col("n_bytes").alias("k2"),
        F.col("n_bpe").alias("k3"),
        F.col("bounds_ok").cast("bigint").alias("k4"),
        b.alias("k5"),
        b.alias("k6"),
        F.col("leg").alias("s"),
    )
    line_leg = text_line_dedup(spark, sf_dir).select(
        F.lit("line").alias("kind"),
        "doc_id",
        F.col("n_lines").alias("k1"),
        F.col("removed_lines").alias("k2"),
        b.alias("k3"),
        b.alias("k4"),
        b.alias("k5"),
        b.alias("k6"),
        F.col("clean_md5").alias("s"),
    )
    # Corpus-divergence leg (r7): en-vs-de drift diagnostics,
    # integerized at 1e-6 into the combo's long schema (js rides the
    # string slot as an integer literal — engine-stable formatting).
    from home_credit_data_engineering_spark.operators.lm import (
        corpus_divergence,
    )

    # PMI collocation leg (r7): top-20 bigram phrases, pmi/npmi
    # integerized at 1e-6 (T-ext:collocation certification).
    from home_credit_data_engineering_spark.operators.lm import (
        pmi_collocations,
    )

    colloc_leg = pmi_collocations(docs, "text", min_count=5, k=20).select(
        F.lit("colloc").alias("kind"),
        b.alias("doc_id"),
        F.col("c_bigram").alias("k1"),
        F.col("c_w1").alias("k2"),
        F.col("c_w2").alias("k3"),
        F.round(F.col("pmi") * 1000000, 0).cast("bigint").alias("k4"),
        F.round(F.col("npmi") * 1000000, 0).cast("bigint").alias("k5"),
        b.alias("k6"),
        F.concat_ws(" ", "w1", "w2").alias("s"),
    )

    div = corpus_divergence(docs, "text", "lang", "en", "de", alpha=1.0)
    div_leg = div.select(
        F.lit("div").alias("kind"),
        F.lit(0).cast("bigint").alias("doc_id"),
        F.col("tokens_a").alias("k1"),
        F.col("tokens_b").alias("k2"),
        F.col("vocab").alias("k3"),
        F.round(F.col("ce_ab") * 1000000, 0).cast("bigint").alias("k4"),
        F.round(F.col("kl_ab") * 1000000, 0).cast("bigint").alias("k5"),
        F.round(F.col("kl_ba") * 1000000, 0).cast("bigint").alias("k6"),
        F.round(F.col("js") * 1000000, 0)
        .cast("bigint")
        .cast("string")
        .alias("s"),
    )
    return (
        span_leg.unionByName(strip_leg)
        .unionByName(pack_leg)
        .unionByName(chunk_leg)
        .unionByName(mix_leg)
        .unionByName(ppl_leg)
        .unionByName(surv_leg)
        .unionByName(bpe_leg)
        .unionByName(line_leg)
        .unionByName(
            text_pack_whole_verdict(spark, sf_dir).select(
                F.lit("packw").alias("kind"),
                F.col("shard").cast("bigint").alias("doc_id"),
                F.col("n_docs").cast("bigint").alias("k1"),
                F.col("total_tokens").cast("bigint").alias("k2"),
                F.col("no_overflow").cast("bigint").alias("k3"),
                F.col("at_most_one_half_empty").cast("bigint").alias("k4"),
                F.col("bins_within_2x").cast("bigint").alias("k5"),
                b.alias("k6"),
                s.alias("s"),
            )
        )
        .unionByName(
            planted_packed_df(spark).select(
                F.lit("packc").alias("kind"),
                F.col("shard").cast("bigint").alias("doc_id"),
                F.col("bin_id").cast("bigint").alias("k1"),
                F.col("n_docs").alias("k2"),
                F.col("n_tokens").alias("k3"),
                F.col("ok").cast("bigint").alias("k4"),
                b.alias("k5"),
                b.alias("k6"),
                F.concat_ws(":", "ids_md5", "starts_md5").alias("s"),
            )
        )
        .unionByName(div_leg)
        .unionByName(colloc_leg)
    )




@register(
    "text_token_budget_mix",
    oracle=f"""
    WITH {_MIX_CTES}
    SELECT doc_id, source, token_count, start_offset
    FROM mixed
    WHERE start_offset < CASE source WHEN 'src0' THEN 800
                                     WHEN 'src1' THEN 400 ELSE 1200 END
    """,
    operators=("T-ext:packing", "T-ext:mixing"),
    doc="Data-mixture sampling by per-source TOKEN budgets (training "
    "mixtures are specified in tokens, not documents): within each "
    "source, documents are taken in seeded md5-permutation order until "
    "the budget is reached (overshoot bounded by one boundary document); "
    "sources without a budget are dropped. Deterministic integer cumsum "
    "over md5 order — fully oracle-verified. Driver-covered via "
    "combo_corpus_prep's mix leg.",
)
def text_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.text import token_count
    from home_credit_data_engineering_spark.operators.packing import (
        token_budget_mix,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    return token_budget_mix(
        docs.withColumn("__ntok", token_count("text")),
        "doc_id",
        "__ntok",
        "source",
        budgets=_MIX_BUDGETS,
    )


@register(
    "text_decontaminate_spans",
    # Benchmark = src0 documents; train = everything else. A train span
    # is contaminated when every 8-token window in it also occurs in the
    # benchmark set — GPT-3 appendix C-style eval-overlap removal with
    # exact span boundaries (strip_spans applies unchanged downstream).
    oracle=f"""
    WITH {_SPAN_CTES.replace("spans AS (", "unused_spans AS (")},
    bench_fp AS (
      SELECT DISTINCT fp FROM valid
      WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = 'src0')
    ),
    train_hits AS (
      SELECT v.doc_id, v.pos FROM valid v
      JOIN bench_fp b ON b.fp = v.fp
      WHERE v.doc_id NOT IN (SELECT doc_id FROM documents WHERE source = 'src0')
    ),
    t_isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM train_hits
    )
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {_SPAN_K - 1} AS span_end,
           MAX(pos) - MIN(pos) + {_SPAN_K} AS span_tokens
    FROM t_isl GROUP BY doc_id, g
    """,
    operators=("T-ext:contamination", "T-ext:substring-dedup"),
    doc="Cross-corpus decontamination spans "
    "(operators/spans.py:contaminated_spans): maximal spans in TRAIN "
    "documents (source != src0) whose every 8-token window occurs in "
    "the BENCHMARK set (source = src0). The benchmark side collapses to "
    "its distinct window-hash set (broadcastable at 100 TB — benchmarks "
    "are tiny next to training corpora); detect -> strip_spans is the "
    "full decontamination pass. Window equality makes the xxhash64 "
    "production path exactly verifiable by the md5 oracle.",
)
def text_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.spans import (
        contaminated_spans,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return contaminated_spans(train, bench, "doc_id", "text", k=_SPAN_K)


@register(
    "text_pack_whole_verdict",
    # FFD bin assignment is iterative (not SQL-expressible), so this is
    # a verdict slot in the combo_approx_sketches mold: the oracle
    # recomputes everything derivable from the deterministic inputs
    # (per-shard doc counts + token totals over the same md5 shard
    # assignment) and the TRUE expected values of three certificates
    # the packing must satisfy — capacity (no bin over budget),
    # first-fit tightness (at most one bin per shard at <= half
    # capacity: two half-empty bins would have merged), and the 2x-OPT
    # bound that tightness implies. A broken packer emits false and
    # hash-mismatches.
    oracle="""
    WITH pw AS (
      SELECT doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                  AS BIGINT) AS n,
             CAST(CAST('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)),
                  1, 8) AS BIGINT) % 8 AS INTEGER) AS shard
      FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           TRUE AS no_overflow,
           TRUE AS at_most_one_half_empty,
           TRUE AS bins_within_2x
    FROM pw WHERE n >= 1 GROUP BY shard
    """,
    operators=("T-ext:packing", "T-ext:pack-whole"),
    doc="Whole-document FFD bin packing certificate "
    "(operators/packing.py:pack_documents_whole — the SFT-style packing "
    "that never splits an example): per md5-shard, doc/token totals "
    "plus three verdicts computed from the ACTUAL bin assignment — "
    "capacity respected, at most one half-empty bin (first-fit "
    "invariant), and bin count within the 2x-OPT bound the invariant "
    "implies. The totals tie the packer to the exact input partition "
    "the oracle derives independently.",
)
def text_pack_whole_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.text import token_count
    from home_credit_data_engineering_spark.operators.packing import (
        pack_documents_whole,
    )

    budget = 256
    docs = read_testdata(spark, sf_dir, "documents")
    packed = pack_documents_whole(
        docs.withColumn("__ntok", token_count("text")),
        "doc_id",
        "__ntok",
        budget=budget,
        shards=8,
    )
    bins = packed.groupBy("shard", "bin_id").agg(
        F.sum("token_count").alias("__bin_tokens"),
        F.count(F.lit(1)).alias("__bin_docs"),
    )
    return (
        bins.groupBy("shard")
        .agg(
            F.sum("__bin_docs").alias("n_docs"),
            F.sum("__bin_tokens").alias("total_tokens"),
            (F.max("__bin_tokens") <= budget).alias("no_overflow"),
            (
                F.sum(
                    F.when(F.col("__bin_tokens") <= budget / 2, 1).otherwise(0)
                )
                <= 1
            ).alias("at_most_one_half_empty"),
            (
                F.count(F.lit(1))
                <= F.ceil(F.lit(2.0) * F.sum("__bin_tokens") / budget)
            ).alias("bins_within_2x"),
        )
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            "no_overflow",
            "at_most_one_half_empty",
            "bins_within_2x",
        )
    )


@register(
    "pack_epoch_shuffle",
    # The shuffle assignment is a pure function of (seed, shard, bin) —
    # md5-keyed, so DuckDB reproduces it bit-for-bit. The bin frame here
    # is a deterministic stand-in derived from orders (the operator only
    # reads the two key columns; FFD bin CONTENT is certified separately
    # by text_packed_corpus).
    oracle="""
    WITH bins AS (
      SELECT DISTINCT o_orderkey % 16 AS shard, o_orderkey AS bin_id
      FROM orders),
    keyed AS (
      SELECT shard, bin_id,
             md5('7:' || CAST(shard AS VARCHAR) || ':'
                 || CAST(bin_id AS VARCHAR)) AS k
      FROM bins),
    assigned AS (
      SELECT shard, bin_id, k,
             CAST(CAST(('0x' || substring(k, 1, 15)) AS BIGINT) % 8
                  AS INTEGER) AS new_shard
      FROM keyed)
    SELECT bin_id, shard AS old_shard, new_shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY new_shard ORDER BY k, shard, bin_id
           ) AS INTEGER) AS position
    FROM assigned
    """,
    operators=("T-ext:packing",),
    doc="Deterministic epoch reshuffle of packed training bins "
    "(operators/packing.py:epoch_shuffle, epoch seed 7, 8 target "
    "shards): every (shard, bin) draws an md5 key, lands on 60 bits of "
    "it mod shards, and ranks into a per-shard position — same seed, "
    "same order, on every engine and partitioning; a permutation, never "
    "a sample. One projection + one exchange on new_shard: the minimum "
    "motion a true reshuffle can do.",
)
def pack_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.packing import (
        epoch_shuffle,
    )

    bins = (
        read_testdata(spark, sf_dir, "orders")
        .select(
            (F.col("o_orderkey") % 16).alias("shard"),
            F.col("o_orderkey").alias("bin_id"),
        )
        .distinct()
    )
    return epoch_shuffle(bins, epoch_seed=7, shards=8).select(
        "bin_id",
        F.col("shard").alias("old_shard"),
        "new_shard",
        F.col("position").cast("int").alias("position"),
    )
