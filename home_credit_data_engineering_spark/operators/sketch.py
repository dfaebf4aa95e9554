"""Mergeable frequent-items summaries: Misra-Gries heavy hitters.

The bounded-memory pass a 100 TB token/n-gram stream needs when the
DISTINCT-item cardinality is itself too large to shuffle comfortably
(hot n-grams, boilerplate lines, top URLs/hosts): each partition folds
its stream into a summary of AT MOST ``k`` counters in one pass
(Misra & Gries 1982), the per-partition summaries — ``partitions x k``
rows, tiny — merge with a sum + one final compaction (Agarwal et al.,
"Mergeable Summaries", PODS 2012), and the result carries the classic
deterministic guarantees:

* UNDERCOUNT ONLY: every estimate satisfies ``est <= true_count``;
* BOUNDED ERROR: ``est >= true_count - N/(k+1)`` with ``N`` the total
  stream length (every compaction that subtracts ``t`` removes at least
  ``(k+1) * t`` total mass, and mass removed cannot exceed ``N``);
* CONTAINMENT: every item with ``true_count > N/(k+1)`` appears.

The exact-relational twin (``groupBy(item).count()``) is the right plan
whenever the distinct cardinality fits a shuffle — the repo's
``text_word_freq_topk``; this operator is the sketch path, certified
the same way the HLL/GK sketches are (deterministic bound VERDICTS over
exact SQL references, ``combo_approx_sketches``): the surviving item
SET depends on partition layout, so correctness is pinned by the
guarantees, not by hashing the summary itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_partition_summaries(
    df: DataFrame, item_col: str, k: int
) -> DataFrame:
    """One Misra-Gries summary per partition: ``(item, cnt)``, <= k
    rows each, via a single mapInPandas pass (state spans the
    partition's batches; compaction runs per batch, so driver-side
    memory is bounded by ``batch_distincts + k``, never the partition's
    distinct count)."""
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    item_type = df.schema[item_col].dataType.simpleString()
    out_schema = f"item {item_type}, cnt long"
    src = df.select(F.col(item_col).alias("item"))

    def summarize(batches):
        counts: dict = {}
        for pdf in batches:
            vc = pdf["item"].value_counts()
            for it, c in vc.items():
                counts[it] = counts.get(it, 0) + int(c)
            if len(counts) > k:
                vals = sorted(counts.values(), reverse=True)
                t = vals[k]  # (k+1)-th largest
                counts = {i: c - t for i, c in counts.items() if c > t}
        yield pd.DataFrame(
            {"item": list(counts.keys()), "cnt": list(counts.values())}
        )

    return src.mapInPandas(summarize, schema=out_schema)


def mg_heavy_hitters(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Merged Misra-Gries heavy hitters: ``(item, est, err_bound)``,
    at most ``k`` rows, ``true - err_bound <= est <= true`` and every
    item with ``true_count > err_bound`` present (``err_bound`` =
    ``N/(k+1)`` as a double, the same for every row).

    Plan: mapInPandas partition fold -> hash-aggregate merge over the
    ``partitions x k`` summary rows -> one window rank over that tiny
    frame for the final compaction threshold -> broadcast 1-row
    threshold + 1-row stream length. Nothing after the partition fold
    scales with the data.
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    total = df.agg(F.count(F.col(item_col)).alias("__n"))
    merged = (
        mg_partition_summaries(df, item_col, k)
        .groupBy("item")
        .agg(F.sum("cnt").alias("__cnt"))
    )
    w = Window.orderBy(F.col("__cnt").desc(), F.col("item"))
    ranked = merged.withColumn("__rk", F.row_number().over(w))
    thresh = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("__rk") == k + 1, F.col("__cnt"))),
            F.lit(0),
        ).alias("__t")
    )
    return (
        ranked.crossJoin(F.broadcast(thresh))
        .filter(F.col("__cnt") - F.col("__t") > 0)
        .crossJoin(F.broadcast(total))
        .select(
            "item",
            (F.col("__cnt") - F.col("__t")).alias("est"),
            (F.col("__n").cast("double") / F.lit(float(k + 1))).alias(
                "err_bound"
            ),
        )
    )
