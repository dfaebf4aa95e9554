"""Data-quality validation operators (SURVEY §2.3 P6-P7).

The reference evaluates 7 validation rules as per-rule failure ``count()``s
followed by one combined drop (``spark/silver/processor.py:127-174``). That
shape re-executes the upstream plan once per rule (~8 actions). This engine
computes **all rule failure counts in a single aggregate pass** —
``sum(case when not rule then 1 end)`` per rule — then applies the combined
filter: 1 job instead of N+1, identical semantics, and the filter still
pushes down to the scan for the clean-output job.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named validation predicate. Rows where ``predicate`` is False or
    NULL are failures (SQL three-valued logic: a NULL predicate does not
    pass the filter, matching the reference's ``df.filter`` drop)."""

    name: str
    predicate: Column


def failure_counts(df: DataFrame, rules: list[Rule]) -> dict[str, int]:
    """Count failures per rule in ONE aggregate job (vs. the reference's
    count-per-rule actions, ``spark/silver/processor.py:147-165``)."""
    aggs = [
        F.sum(
            F.when(F.coalesce(rule.predicate, F.lit(False)), 0).otherwise(1)
        ).alias(rule.name)
        for rule in rules
    ]
    row = df.agg(*aggs).collect()[0]
    return {rule.name: int(row[rule.name] or 0) for rule in rules}


def combined_predicate(rules: list[Rule]) -> Column:
    """AND of all rule predicates (``spark/silver/processor.py:167-168``)."""
    pred = None
    for rule in rules:
        pred = rule.predicate if pred is None else (pred & rule.predicate)
    return pred if pred is not None else F.lit(True)


def validate(
    df: DataFrame, rules: list[Rule], count_failures: bool = True
) -> tuple[dict[str, int], DataFrame]:
    """Run the rule set: (per-rule failure counts, surviving rows).

    Set ``count_failures=False`` to skip the counting job in latency-
    sensitive paths — the clean filter itself is always lazy.
    """
    counts = failure_counts(df, rules) if count_failures else {}
    return counts, df.filter(combined_predicate(rules))


def observed_validate(df: DataFrame, rules: list[Rule]):
    """(observation, clean_df) — validation whose failure counts cost ZERO
    extra passes.

    Per-rule failure counters (plus ``rows_in``) ride the plan as a
    ``CollectMetrics`` node (``df.observe``): whatever action materializes
    the clean frame — typically the parquet write itself — also delivers
    the counts, so a 100 TB validation run reads its input exactly once.
    ``failure_counts`` by contrast is a separate aggregate job (kept for
    interactive use). Catalyst does not push the clean filter through the
    metrics node, so counts always reflect the pre-filter input (asserted
    in tests/test_operators_unit.py).

    Read the counts after an action: ``observation.get``.
    """
    from pyspark.sql import Observation

    obs = Observation("quality")
    metrics = [F.count(F.lit(1)).alias("rows_in")] + [
        F.sum(
            F.when(F.coalesce(rule.predicate, F.lit(False)), 0).otherwise(1)
        ).alias(rule.name)
        for rule in rules
    ]
    observed = df.observe(obs, metrics[0], *metrics[1:])
    return obs, observed.filter(combined_predicate(rules))


def split_valid_invalid(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """Quarantine split: (valid rows, invalid rows + ``failed_rules``
    array naming every violated rule).

    The reference silently drops invalid rows after logging counts; at
    scale the standard pattern is to land them in a quarantine table for
    replay/debugging. The failed-rules array is built in the same
    projection as the filter — one pass, no extra action.
    """
    failed = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.coalesce(rule.predicate, F.lit(False)), F.lit(rule.name)
                )
                for rule in rules
            ]
        )
    )
    tagged = df.withColumn("failed_rules", failed)
    valid = tagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
    invalid = tagged.filter(F.size("failed_rules") > 0)
    return valid, invalid


@dataclass(frozen=True)
class Expectation:
    """A rule plus a tolerance: the run FAILS if more than
    ``max_failure_rate`` of rows violate the rule (0.0 = zero tolerance).
    The Great-Expectations-style contract a production pipeline gates
    deploys on, expressed over the same Rule predicates."""

    rule: Rule
    max_failure_rate: float = 0.0


class QualityGateError(RuntimeError):
    """Raised when an expectation's failure rate exceeds its tolerance."""

    def __init__(self, breaches: dict[str, tuple[float, float]]):
        self.breaches = breaches
        detail = ", ".join(
            f"{name}: {rate:.4%} > allowed {allowed:.4%}"
            for name, (rate, allowed) in breaches.items()
        )
        super().__init__(f"quality gate breached — {detail}")


def enforce_expectations(
    observation, rows_in_key: str = "rows_in", expectations: list[Expectation] = (),
) -> dict[str, float]:
    """Check an :func:`observed_validate` observation against tolerances.

    Call AFTER the action that materialized the observed frame (the
    write): the counts already exist, so enforcement costs zero extra
    passes over the data. Raises :class:`QualityGateError` listing every
    breached expectation; returns the per-rule failure rates otherwise.
    """
    got = observation.get
    rows_in = int(got[rows_in_key]) or 0
    rates: dict[str, float] = {}
    breaches: dict[str, tuple[float, float]] = {}
    for exp in expectations:
        failures = int(got[exp.rule.name])
        rate = (failures / rows_in) if rows_in else 0.0
        rates[exp.rule.name] = rate
        if rate > exp.max_failure_rate:
            breaches[exp.rule.name] = (rate, exp.max_failure_rate)
    if breaches:
        raise QualityGateError(breaches)
    return rates


def corpus_report_card(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus datasheet: the one-row-per-source health report
    a dataset owner reads before mixing sources into a training run
    (the "datasheets for datasets" summary, computed distributed).

    Output per source: ``(source, n_docs, n_blank, n_tokens, avg_chars,
    dup_rate, lang_entropy, mean_quality)`` where

    - ``dup_rate = round(1 - distinct(fingerprint)/n_docs, 6)`` — exact
      content-duplicate mass (md5 of lowercased trimmed text),
    - ``lang_entropy`` — Shannon entropy (nats) of the source's language
      mix: per-(source, lang) terms ``(c/n)·ln(c/n)`` rounded at 9 and
      summed as exact DECIMAL(18,9) (the repo's stable-sum discipline,
      so the order-dependent double sum never appears),
    - ``mean_quality`` — mean of the composite quality score over
      non-blank docs, each doc's score rounded at 4 and summed as exact
      DECIMAL(15,4) before the single final division.

    Composed as :func:`report_card_state` (one combinable (source, lang,
    fingerprint) aggregate — the mergeable O(delta) state) finalized by
    :func:`report_card_from_state`; a daily ingest merges states with
    :func:`merge_report_card_state` instead of rescanning history.

    Scale: the only per-document shuffle carries (source, lang, 32-char
    fingerprint, additive sums) — never text; the finalizer operates on
    the state frame (bounded by distinct content per source) and the
    per-source / per-language grids.
    """
    return report_card_from_state(
        report_card_state(
            docs,
            source_col=source_col,
            text_col=text_col,
            lang_col=lang_col,
        )
    )


def report_card_state(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Mergeable report-card state: one row per (source, lang,
    fingerprint) cell carrying ADDITIVE statistics — ``(source, lang,
    fp, n, n_blank, n_tokens, sum_chars, sum_q DECIMAL(15,4), n_q)``.
    Every column merges by cell-wise sum (:func:`merge_report_card_state`),
    and the per-doc quality/blank terms are deterministic, so
    merged-then-finalized ≡ finalized-over-the-union exactly."""
    from home_credit_data_engineering_spark.functions.text import (
        fingerprint,
        quality_score,
        token_count,
    )

    q4 = F.round(quality_score(text_col), 4).cast("decimal(7,4)")
    return (
        docs.select(
            F.col(source_col).alias("source"),
            F.col(lang_col).alias("lang"),
            fingerprint(text_col).alias("fp"),
            token_count(text_col).alias("__ntok"),
            F.length(text_col).alias("__nchars"),
            F.when(F.length(text_col) > 0, q4).alias("__q4"),
        )
        .groupBy("source", "lang", "fp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("__ntok") == 0, 1).otherwise(0)).alias(
                "n_blank"
            ),
            F.sum("__ntok").alias("n_tokens"),
            F.sum(F.col("__nchars").cast("bigint")).alias("sum_chars"),
            F.sum(F.col("__q4").cast("decimal(15,4)")).alias("sum_q"),
            F.count("__q4").alias("n_q"),
        )
    )


def merge_report_card_state(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Cell-wise merge of two report-card states (all columns additive)."""
    return (
        state.unionByName(delta)
        .groupBy("source", "lang", "fp")
        .agg(
            F.sum("n").alias("n"),
            F.sum("n_blank").alias("n_blank"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("sum_chars").alias("sum_chars"),
            F.sum("sum_q").cast("decimal(15,4)").alias("sum_q"),
            F.sum("n_q").alias("n_q"),
        )
    )


def report_card_from_state(state: DataFrame) -> DataFrame:
    """Finalize a (merged) report-card state into the per-source card —
    see :func:`corpus_report_card` for the output contract."""
    base = (
        state.groupBy("source")
        .agg(
            F.sum("n").alias("n_docs"),
            F.sum("n_blank").alias("n_blank"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("sum_chars").alias("__sum_chars"),
            F.countDistinct("fp").alias("__n_fp"),
            F.sum(F.col("sum_q").cast("decimal(15,4)")).alias("__sum_q"),
            F.sum("n_q").alias("__n_q"),
        )
    )
    # per-source frame is tiny and consumed twice (output + the entropy
    # denominator) — checkpoint so the aggregate over the state runs once
    base = base.localCheckpoint()
    lang_terms = (
        state.groupBy("source", "lang")
        .agg(F.sum("n").alias("__c"))
        .join(
            F.broadcast(base.select("source", F.col("n_docs").alias("__n"))),
            "source",
        )
        .select(
            "source",
            F.round(
                (F.col("__c").cast("double") / F.col("__n"))
                * F.log(F.col("__c").cast("double") / F.col("__n")),
                9,
            )
            .cast("decimal(18,9)")
            .alias("__term"),
        )
        .groupBy("source")
        .agg(F.sum("__term").alias("__h"))
    )
    return base.join(lang_terms, "source").select(
        "source",
        "n_docs",
        "n_blank",
        "n_tokens",
        F.round(
            F.col("__sum_chars").cast("double") / F.col("n_docs"), 2
        ).alias("avg_chars"),
        F.round(
            1.0 - F.col("__n_fp").cast("double") / F.col("n_docs"), 6
        ).alias("dup_rate"),
        F.round(-F.col("__h").cast("double"), 6).alias("lang_entropy"),
        F.when(
            F.col("__n_q") > 0,
            F.round(F.col("__sum_q").cast("double") / F.col("__n_q"), 6),
        ).alias("mean_quality"),
    )
