"""Corpus quality filtering: the Gopher-style keep/drop pass a
training-data pipeline runs before dedup.

One scan computes every signal (all JVM-side expressions from
:mod:`~home_credit_data_engineering_spark.functions.text` — zero Python,
zero shuffle for the signals themselves), one ANDed predicate splits the
corpus into kept/dropped with per-rule drop counts, mirroring the
validation/quarantine shape of
:mod:`~home_credit_data_engineering_spark.operators.quality` for
relational data. Signal thresholds follow the published Gopher/C4 heuristic
ranges (length bands, symbol/digit ratios, repetition); they are
parameters, not constants — corpora differ.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.text import (
    digit_ratio,
    max_token_length,
    repeated_bigram_fraction,
    symbol_ratio,
    token_count,
    unique_token_count,
)


@dataclass
class QualityThresholds:
    """Keep a document iff every bound holds. Defaults are the
    Gopher/C4-ish ranges scaled to the synthetic corpus's short docs."""

    min_tokens: int = 5
    max_tokens: int = 100_000
    max_symbol_ratio: float = 0.2
    max_digit_ratio: float = 0.3
    max_repeated_bigram_fraction: float = 0.5
    #: Below this, the doc is mostly repeated vocabulary (boilerplate).
    min_unique_token_fraction: float = 0.2
    #: Tokens longer than this are markup/binary junk, not language.
    max_token_len: int = 60
    #: Restrict to these langs (None = keep all).
    langs: tuple[str, ...] | None = None


@dataclass
class QualityReport:
    rows_in: int = 0
    rows_kept: int = 0
    #: rule name → rows that violate it (a row can violate several).
    rule_drops: dict[str, int] = field(default_factory=dict)

    def as_record(self) -> dict:
        return {
            "job": "quality_filter",
            "rows_in": self.rows_in,
            "rows_kept": self.rows_kept,
            "rows_dropped": self.rows_in - self.rows_kept,
            "rule_drops": dict(self.rule_drops),
        }


def quality_rules(
    text_col: str, lang_col: str | None, t: QualityThresholds
) -> list[tuple[str, F.Column]]:
    """(name, keep-predicate) pairs — the text twin of
    ``operators.quality.Rule`` lists."""
    n_tok = token_count(text_col)
    rules = [
        ("min_tokens", n_tok >= t.min_tokens),
        ("max_tokens", n_tok <= t.max_tokens),
        ("symbol_ratio", symbol_ratio(text_col) <= t.max_symbol_ratio),
        ("digit_ratio", digit_ratio(text_col) <= t.max_digit_ratio),
        (
            "repetition",
            repeated_bigram_fraction(text_col)
            <= t.max_repeated_bigram_fraction,
        ),
        (
            "unique_tokens",
            unique_token_count(text_col).cast("double")
            / F.greatest(n_tok, F.lit(1)).cast("double")
            >= t.min_unique_token_fraction,
        ),
        ("token_length", max_token_length(text_col) <= t.max_token_len),
    ]
    if t.langs is not None and lang_col is not None:
        rules.append(("lang", F.col(lang_col).isin(*t.langs)))
    return rules


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
    thresholds: QualityThresholds | None = None,
) -> dict:
    """Split a corpus into kept/dropped by quality signals.

    Returns ``{"kept", "dropped", "report"}``; ``dropped`` carries a
    ``failed_rules`` array naming every violated rule (the quarantine
    audit trail). Counting strategy: the per-rule totals come from ONE
    aggregate over the signal expressions (single pass, partial
    aggregation) — not one count() job per rule, which is the reference's
    N-scans validation anti-pattern
    (/root/reference/spark/silver/processor.py:127-168).

    At 100 TB prefer :func:`quality_filter_single_pass`: it writes ONE
    dataset partitioned by the keep verdict with the counts riding the
    write as ``observe()`` metrics — the input is read exactly once.
    """
    t = thresholds or QualityThresholds()
    rules = quality_rules(text_col, lang_col, t)
    flagged = _flag(docs, rules)
    keep_all = F.size("failed_rules") == 0
    report = QualityReport()
    counts = flagged.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(keep_all.cast("long")).alias("__kept"),
        *[
            F.sum(F.array_contains("failed_rules", name).cast("long")).alias(name)
            for name, _ in rules
        ],
    ).first()
    report.rows_in = counts["__n"]
    report.rows_kept = counts["__kept"] or 0
    report.rule_drops = {name: counts[name] or 0 for name, _ in rules}
    kept = flagged.filter(keep_all).drop("failed_rules")
    dropped = flagged.filter(~keep_all)
    return {"kept": kept, "dropped": dropped, "report": report}


def _flag(docs: DataFrame, rules: list[tuple[str, F.Column]]) -> DataFrame:
    return docs.withColumn(
        "failed_rules",
        F.array_compact(
            F.array(*[F.when(~keep, F.lit(name)) for name, keep in rules])
        ),
    )


def quality_filter_single_pass(
    docs: DataFrame,
    output_path: str,
    text_col: str = "text",
    lang_col: str | None = "lang",
    thresholds: QualityThresholds | None = None,
) -> QualityReport:
    """One-scan corpus quality filter: write ``output_path`` partitioned
    by the boolean ``kept`` column (``kept=true`` / ``kept=false``
    partition directories — consumers partition-prune their side), with
    ``rows_in``/``rows_kept``/per-rule drop counts riding the SAME write
    action as ``observe()`` metrics (CollectMetrics). The 100 TB form of
    :func:`quality_filter`: input read exactly once, no separate count
    job, no second write.
    """
    from pyspark.sql import Observation

    t = thresholds or QualityThresholds()
    rules = quality_rules(text_col, lang_col, t)
    flagged = _flag(docs, rules).withColumn(
        "kept", F.size("failed_rules") == 0
    )
    obs = Observation("quality_filter")
    observed = flagged.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.col("kept").cast("long")).alias("rows_kept"),
        *[
            F.sum(F.array_contains("failed_rules", name).cast("long")).alias(name)
            for name, _ in rules
        ],
    )
    observed.write.mode("overwrite").partitionBy("kept").parquet(output_path)
    metrics = obs.get
    report = QualityReport()
    report.rows_in = metrics["rows_in"]
    report.rows_kept = metrics["rows_kept"] or 0
    report.rule_drops = {name: metrics[name] or 0 for name, _ in rules}
    return report
