"""Evaluation declared queries: the measured half of the
quality-classifier loop (``operators/evaluate.py``) — confusion-matrix
reports, exact ROC-AUC / average precision, the full threshold curve,
and calibration tables, each with a hash-exact DuckDB twin.

The evaluated systems are deterministic so both engines replay them
bit-for-bit: the stopword-profile language-ID heuristic
(``functions/text.py:lang_id``) against the stored ``lang`` label, and
an English-marker-ratio scorer (quantized at 1e-6) against the binary
``lang = 'en'`` label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.text import (
    LANG_STOPWORDS,
    lang_id,
    stopword_count,
    token_count,
)
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata

#: DuckDB fragment: whitespace tokens of trimmed text.
_TOKS = "regexp_split_to_array(trim(text), '\\s+')"

#: DuckDB fragment: the lang_id CASE (identical to text_lang_id's twin).
_LANG_PRED_CTES = f"""
    lp_scored AS (
      SELECT lang,
             len(list_filter({_TOKS},
                 t -> t IN ('the','a','of','and','in','to','is'))) AS c_en,
             len(list_filter({_TOKS},
                 t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS c_de,
             len(list_filter({_TOKS},
                 t -> t IN ('el','la','los','las','es','y','un'))) AS c_es,
             len(list_filter({_TOKS},
                 t -> t IN ('le','la','les','et','est','une','dans'))) AS c_fr
      FROM documents),
    lp AS (
      SELECT lang AS label,
             CASE WHEN c_en > 0 AND c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
                  WHEN c_de > 0 AND c_de > c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
                  WHEN c_es > 0 AND c_es > c_en AND c_es > c_de AND c_es >= c_fr THEN 'es'
                  WHEN c_fr > 0 AND c_fr > c_en AND c_fr > c_de AND c_fr > c_es THEN 'fr'
                  ELSE 'und' END AS pred
      FROM lp_scored)"""

#: DuckDB fragment: binary-scored corpus — label = (lang = 'en'),
#: score = English-marker token ratio integerized at 1e-6 (the
#: quantization that makes distinct-score grouping engine-exact).
_BINARY_SCORED_CTE = f"""
    ev_base AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             CAST(ROUND(len(list_filter({_TOKS},
                    t -> t IN ('the','a','of','and','in','to','is')))
                  * 1000000.0 / len({_TOKS}), 0) AS BIGINT) AS s
      FROM documents
      WHERE length(trim(text)) > 0)"""


#: DuckDB fragment: confusion grid -> per-class metrics (``perf``) and
#: totals (``tot``) from a ``lp(label, pred)`` relation — the exact
#: arithmetic of ``operators/evaluate.py:classification_report``.
_REPORT_CTES = """
    grid AS (SELECT label, pred, COUNT(*) AS n FROM lp GROUP BY 1, 2),
    classes AS (
      SELECT DISTINCT cls FROM (
        SELECT label AS cls FROM grid
        UNION ALL SELECT pred FROM grid)),
    sup AS (SELECT label AS cls, SUM(n) AS support FROM grid GROUP BY 1),
    prd AS (SELECT pred AS cls, SUM(n) AS predicted FROM grid GROUP BY 1),
    tp AS (SELECT label AS cls, n AS tp FROM grid WHERE label = pred),
    per AS (
      SELECT c.cls,
             CASE WHEN COALESCE(p.predicted, 0) > 0
                  THEN ROUND(CAST(COALESCE(t.tp, 0) AS DOUBLE) / p.predicted, 6)
                  ELSE 0.0 END AS prec,
             CASE WHEN COALESCE(s.support, 0) > 0
                  THEN ROUND(CAST(COALESCE(t.tp, 0) AS DOUBLE) / s.support, 6)
                  ELSE 0.0 END AS rec,
             COALESCE(s.support, 0) AS support
      FROM classes c
      LEFT JOIN sup s USING (cls)
      LEFT JOIN prd p USING (cls)
      LEFT JOIN tp t USING (cls)),
    perf AS (
      SELECT cls, prec, rec,
             CASE WHEN prec + rec > 0
                  THEN ROUND(2.0 * prec * rec / (prec + rec), 6)
                  ELSE 0.0 END AS f1,
             support
      FROM per),
    tot AS (
      SELECT SUM(n) AS total,
             SUM(CASE WHEN label = pred THEN n ELSE 0 END) AS total_tp
      FROM grid)"""

#: DuckDB fragment: report rows incl. macro/micro (follows _REPORT_CTES).
_REPORT_ROWS_SQL = """
    SELECT cls, prec, rec, f1, CAST(support AS BIGINT) AS support
    FROM perf
    UNION ALL
    SELECT 'macro', ROUND(AVG(prec), 6), ROUND(AVG(rec), 6),
           ROUND(AVG(f1), 6), CAST(SUM(support) AS BIGINT)
    FROM perf
    UNION ALL
    SELECT 'micro', ROUND(CAST(total_tp AS DOUBLE) / total, 6),
           ROUND(CAST(total_tp AS DOUBLE) / total, 6),
           ROUND(CAST(total_tp AS DOUBLE) / total, 6),
           CAST(total AS BIGINT)
    FROM tot"""

#: DuckDB fragment: AUC/AP accumulation from ``ev_base(y, s)``
#: (``operators/evaluate.py:binary_auc``'s exact arithmetic).
_AUC_CTES = """
    ev_by AS (
      SELECT s, SUM(y) AS pos, SUM(1 - y) AS neg FROM ev_base GROUP BY 1),
    ev_cum AS (
      SELECT s, pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below,
             SUM(pos) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp_cum,
             SUM(neg) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp_cum
      FROM ev_by),
    ev_terms AS (
      SELECT pos, neg,
             CAST(pos AS DECIMAL(18,0))
               * CAST(2 * neg_below + neg AS DECIMAL(19,0)) AS auc_term,
             CAST(pos AS DECIMAL(19,0))
               * CAST(ROUND(CAST(tp_cum AS DOUBLE) / (tp_cum + fp_cum), 9)
                      AS DECIMAL(18,9)) AS ap_term
      FROM ev_cum),
    ev_agg AS (
      SELECT SUM(pos) AS n_pos, SUM(neg) AS n_neg,
             COUNT(*) AS n_thresholds,
             SUM(auc_term) AS auc_num, SUM(ap_term) AS ap_num
      FROM ev_terms)"""

#: DuckDB fragment: cumulative ROC counts from ``ev_base(y, s)``.
_ROC_CTES = """
    ev_by AS (
      SELECT s, SUM(y) AS pos, SUM(1 - y) AS neg FROM ev_base GROUP BY 1),
    ev_tot AS (SELECT SUM(pos) AS p, SUM(neg) AS n FROM ev_by),
    ev_cum AS (
      SELECT s AS threshold,
             SUM(pos) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             SUM(neg) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
      FROM ev_by)"""

#: DuckDB fragment: calibration buckets from ``ev_base(y, s)`` —
#: operand order mirrors calibration_bins' IEEE expression exactly.
_CAL_CTES = """
    cal AS (
      SELECT GREATEST(0, LEAST(CAST(FLOOR((CAST(s AS DOUBLE) - 0.0)
               / 1000000.0 * 10) AS INTEGER), 9)) AS bin,
             COUNT(*) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             ROUND(AVG(CAST(s AS DOUBLE)), 6) AS mean_score,
             ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS pos_rate
      FROM ev_base
      GROUP BY 1)"""


@register(
    "eval_lang_report",
    oracle=f"""
    WITH {_LANG_PRED_CTES},
    {_REPORT_CTES}
    SELECT r.cls, r.prec AS "precision", r.rec AS recall, r.f1, r.support
    FROM ({_REPORT_ROWS_SQL}) r
    """,
    operators=("T-eval:report", "T-ext:lang-id"),
    doc="Classification report for the stopword-profile language-ID "
    "heuristic vs the stored gold label (operators/evaluate.py:"
    "classification_report — the sklearn surface, distributed): "
    "per-class precision/recall/F1/support over the exact confusion "
    "grid, plus macro (unweighted mean of the rounded per-class "
    "metrics) and micro (accuracy) rows. One combinable groupBy(label, "
    "pred) is the only full-data pass; every downstream op runs on the "
    "|classes|² grid (localCheckpoint-ed so it computes once). The "
    "synthetic corpus shares one vocabulary across langs, so the report "
    "certifies the METER (exact counts, pinned rounding), not the "
    "heuristic's skill.",
)
def eval_lang_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.evaluate import (
        classification_report,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    scored = docs.select(
        F.col("lang").alias("label"), lang_id("text").alias("pred")
    )
    return classification_report(scored, "label", "pred")


@register(
    "eval_binary_auc",
    oracle=f"""
    WITH {_BINARY_SCORED_CTE},
    {_AUC_CTES}
    SELECT CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           n_thresholds,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN ROUND(CAST(auc_num AS DOUBLE) / (2.0 * n_pos * n_neg), 6)
           END AS auc,
           CASE WHEN n_pos > 0
                THEN ROUND(CAST(ap_num AS DOUBLE) / n_pos, 6)
           END AS avg_precision
    FROM ev_agg
    """,
    operators=("T-eval:auc",),
    doc="Exact ROC-AUC + average precision (operators/evaluate.py:"
    "binary_auc) for the English-marker-ratio scorer against the binary "
    "lang='en' label: Mann-Whitney AUC with the standard half-credit "
    "tie correction in pure integer/decimal arithmetic, and the "
    "sklearn-definition step AP with per-threshold precision rounded at "
    "9 and carried as DECIMAL(18,9). Scores are integerized at 1e-6 so "
    "the distinct-score grouping is engine-exact; the cumulative window "
    "runs over the distinct-score frame only (the exact-NTILE trade), "
    "while the single full-data pass is one combinable hash aggregate.",
)
def eval_binary_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.evaluate import binary_auc

    return binary_auc(_binary_scored(spark, sf_dir), "y", "s")


@register(
    "eval_roc_points",
    oracle=f"""
    WITH {_BINARY_SCORED_CTE},
    {_ROC_CTES}
    SELECT threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(t.p - tp AS BIGINT) AS fn, CAST(t.n - fp AS BIGINT) AS tn,
           CASE WHEN t.p > 0
                THEN ROUND(CAST(tp AS DOUBLE) / t.p, 6) END AS tpr,
           CASE WHEN t.n > 0
                THEN ROUND(CAST(fp AS DOUBLE) / t.n, 6) END AS fpr,
           ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS "precision"
    FROM ev_cum CROSS JOIN ev_tot t
    """,
    operators=("T-eval:roc",),
    doc="The full ROC / precision-recall threshold curve (operators/"
    "evaluate.py:roc_pr_points): one row per distinct quantized score, "
    "threshold semantics 'predict positive at score >= s', exact "
    "TP/FP/FN/TN counts with round-6 rates. Grid-sized output — the "
    "curve a pipeline owner reads to pick the quality-gate threshold.",
)
def eval_roc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.evaluate import (
        roc_pr_points,
    )

    return roc_pr_points(_binary_scored(spark, sf_dir), "y", "s")


@register(
    "eval_score_calibration",
    oracle=f"""
    WITH {_BINARY_SCORED_CTE},
    {_CAL_CTES}
    SELECT bin, n, n_pos, mean_score, pos_rate FROM cal
    """,
    operators=("T-eval:calibration",),
    doc="Reliability-diagram table (operators/evaluate.py:"
    "calibration_bins): ten equal-width buckets over the quantized "
    "score range, per-bucket count / positive count / mean score / "
    "empirical positive rate — mean_score ≈ pos_rate per bin is the "
    "calibration criterion. One combinable aggregate; bucket ids from "
    "exact integer scores through the same IEEE expression order in "
    "both engines.",
)
def eval_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.evaluate import (
        calibration_bins,
    )

    return calibration_bins(
        _binary_scored(spark, sf_dir), "y", "s", n_bins=10, lo=0.0, hi=1_000_000.0
    )


def _binary_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(y, s): binary en-label + English-marker-ratio score integerized
    at 1e-6 over non-blank documents — the shared scored frame of the
    auc / roc / calibration queries."""
    docs = read_testdata(spark, sf_dir, "documents")
    n_tok = token_count("text")
    c_en = stopword_count("text", LANG_STOPWORDS["en"])
    return docs.filter(n_tok > 0).select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.round(c_en * 1_000_000.0 / n_tok, 0).cast("bigint").alias("s"),
    )


#: Marker lexicons per language (mirrors functions.text.LANG_STOPWORDS).
_OVR_LANGS = {
    "en": "('the','a','of','and','in','to','is')",
    "de": "('der','die','das','und','ist','nicht','ein')",
    "es": "('el','la','los','las','es','y','un')",
    "fr": "('le','la','les','et','est','une','dans')",
}

_OVR_LONG_SQL = "\n      UNION ALL\n".join(
    f"""      SELECT '{lang}' AS grp,
             CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END AS y,
             CAST(ROUND(len(list_filter({_TOKS}, t -> t IN {words}))
                  * 1000000.0 / len({_TOKS}), 0) AS BIGINT) AS s
      FROM documents WHERE length(trim(text)) > 0"""
    for lang, words in _OVR_LANGS.items()
)


#: DuckDB fragment: the full per-task OVR AUC chain -> ``ov_out(group,
#: n_pos, n_neg, n_thresholds, auc, avg_precision)``.
OVR_AUC_SQL_CTES = f"""
    ov_long AS (
{_OVR_LONG_SQL}),
    ov_by AS (
      SELECT grp, s, SUM(y) AS pos, SUM(1 - y) AS neg
      FROM ov_long GROUP BY 1, 2),
    ov_cum AS (
      SELECT grp, pos, neg,
             COALESCE(SUM(neg) OVER (PARTITION BY grp ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below,
             SUM(pos) OVER (PARTITION BY grp ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp_cum,
             SUM(neg) OVER (PARTITION BY grp ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp_cum
      FROM ov_by),
    ov_terms AS (
      SELECT grp, pos, neg,
             CAST(pos AS DECIMAL(18,0))
               * CAST(2 * neg_below + neg AS DECIMAL(19,0)) AS auc_term,
             CAST(pos AS DECIMAL(19,0))
               * CAST(ROUND(CAST(tp_cum AS DOUBLE) / (tp_cum + fp_cum), 9)
                      AS DECIMAL(18,9)) AS ap_term
      FROM ov_cum),
    ov_agg AS (
      SELECT grp, SUM(pos) AS n_pos, SUM(neg) AS n_neg,
             COUNT(*) AS n_thresholds,
             SUM(auc_term) AS auc_num, SUM(ap_term) AS ap_num
      FROM ov_terms GROUP BY 1),
    ov_out AS (
      SELECT grp AS "group",
             CAST(n_pos AS BIGINT) AS n_pos,
             CAST(n_neg AS BIGINT) AS n_neg,
             n_thresholds,
             CASE WHEN n_pos > 0 AND n_neg > 0
                  THEN ROUND(CAST(auc_num AS DOUBLE)
                             / (2.0 * n_pos * n_neg), 6)
             END AS auc,
             CASE WHEN n_pos > 0
                  THEN ROUND(CAST(ap_num AS DOUBLE) / n_pos, 6)
             END AS avg_precision
      FROM ov_agg)"""


@register(
    "eval_ovr_macro_auc",
    oracle=f"""
    WITH {OVR_AUC_SQL_CTES}
    SELECT * FROM ov_out
    UNION ALL
    SELECT '__macro__', CAST(SUM(n_pos) AS BIGINT),
           CAST(SUM(n_neg) AS BIGINT), CAST(SUM(n_thresholds) AS BIGINT),
           ROUND(AVG(auc), 6), ROUND(AVG(avg_precision), 6)
    FROM ov_out
    """,
    operators=("T-eval:ovr-auc",),
    doc="One-vs-rest macro AUC for a multi-class scorer (operators/"
    "evaluate.py:grouped_binary_auc — the standard multi-class "
    "extension of ROC-AUC): each language's marker-ratio score is "
    "evaluated against its own one-vs-rest label, every window "
    "PARTITIONED BY the task (unlike the single-task form nothing "
    "funnels into one partition — this is the shape that scales with "
    "any number of tasks), plus a __macro__ row averaging the "
    "round-6 per-task metrics. Same exact Mann-Whitney/step-AP "
    "arithmetic, hash-verified per task AND at the macro level.",
)
def eval_ovr_macro_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.evaluate import (
        grouped_binary_auc,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    n_tok = token_count("text")
    legs = []
    for lang in ("en", "de", "es", "fr"):
        c = stopword_count("text", LANG_STOPWORDS[lang])
        legs.append(
            docs.filter(n_tok > 0).select(
                F.lit(lang).alias("group"),
                (F.col("lang") == lang).cast("int").alias("y"),
                F.round(c * 1_000_000.0 / n_tok, 0).cast("bigint").alias("s"),
            )
        )
    long = legs[0]
    for leg in legs[1:]:
        long = long.unionByName(leg)
    per = grouped_binary_auc(long, "group", "y", "s")
    macro = per.agg(
        F.lit("__macro__").alias("group"),
        F.sum("n_pos").cast("bigint").alias("n_pos"),
        F.sum("n_neg").cast("bigint").alias("n_neg"),
        F.sum("n_thresholds").alias("n_thresholds"),
        F.round(F.avg("auc"), 6).alias("auc"),
        F.round(F.avg("avg_precision"), 6).alias("avg_precision"),
    )
    return per.unionByName(macro)
