"""Mergeable bounded-memory summaries: Misra-Gries heavy hitters,
KMV distinct-count sketches, and Count-Min frequency sketches.

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


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch
# ---------------------------------------------------------------------------

#: 2^52 — the u-value denominator (13 md5 hex digits = 52 bits, exactly
#: representable in a double, the same mapping the A-ES sampling keys use).
_KMV_DENOM = float(1 << 52)


def kmv_partition_minima(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """One KMV state per partition: the ``<= k`` smallest DISTINCT
    ``md5('kmv:' || item)`` hashes, folded in a single bounded-memory
    mapInPandas pass (state is ``k + batch_distincts`` hashes, never the
    partition's distinct count). Output: ``(h string)`` rows.

    The global k smallest distinct hashes are a subset of the union of
    per-partition k smallest distincts, so the merged sketch is a pure
    function of the item SET — independent of partitioning, and
    therefore exactly reproducible by a DuckDB twin (unlike HLL, whose
    register layout is engine-private)."""
    import pandas as pd

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    src = df.select(
        F.md5(
            F.concat(F.lit("kmv:"), F.col(item_col).cast("string"))
        ).alias("h")
    )

    def fold(batches):
        state: list = []  # sorted ascending, <= k distinct hashes
        for pdf in batches:
            merged = pd.concat(
                [pd.Series(state, dtype="object"), pdf["h"]],
                ignore_index=True,
            )
            # lexicographic == numeric order for fixed-width hex
            state = sorted(merged.drop_duplicates())[:k]
        yield pd.DataFrame({"h": state})

    return src.mapInPandas(fold, schema="h string")


def kmv_distinct(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Mergeable KMV distinct-count estimate (Bar-Yossef et al. 2002;
    Beyer et al., SIGMOD 2007 unbiased form): one row
    ``(n_kept bigint, theta double, est double)``.

    ``theta`` is the largest of the ``k`` smallest distinct hash values
    mapped to (0, 1) via the first 52 md5 bits; the estimator is
    ``(k-1)/theta`` (relative error ~ ``1/sqrt(k-2)``), or the EXACT
    distinct count when fewer than ``k`` distinct hashes exist
    (``theta`` NULL, the sketch saw everything). Deterministic: both the
    surviving hash set and the one double divide (rounded to 6) are pure
    functions of the item set, so a DuckDB twin is hash-identical —
    unlike ``approx_count_distinct``, certifiable only by error bound.

    Plan: bounded partition fold -> union of ``partitions x k`` hash
    rows -> distinct + TakeOrderedAndProject(k) over that tiny frame ->
    one-row aggregate. Nothing after the fold scales with the data; the
    only wide exchange carries 32-byte hashes capped at partitions*k
    rows. Mergeable across corpora: union the minima frames and re-take
    the k smallest."""
    minima = kmv_partition_minima(df, item_col, k)
    topk = minima.distinct().orderBy("h").limit(k)
    u = F.conv(F.substring(F.col("h"), 1, 13), 16, 10).cast("double") / F.lit(
        _KMV_DENOM
    )
    agg = topk.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max(u).alias("__umax"),
    )
    return agg.select(
        "n_kept",
        F.when(F.col("n_kept") >= k, F.round(F.col("__umax"), 9)).alias(
            "theta"
        ),
        F.when(
            F.col("n_kept") >= k,
            F.round(F.lit(float(k - 1)) / F.round(F.col("__umax"), 9), 6),
        )
        .otherwise(F.col("n_kept").cast("double"))
        .alias("est"),
    )


# ---------------------------------------------------------------------------
# Count-Min frequency sketch
# ---------------------------------------------------------------------------


def cms_counters(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a relational
    aggregate: ``depth x width`` counters ``(r, c, cnt)`` with
    ``c = first-32-md5-bits('cms<r>:' || item) mod width``.

    The bounded-cardinality groupBy partial-combines map-side, so the
    shuffle carries at most ``depth * width`` cells per task regardless
    of stream length — the frequency-table shape for streams whose
    distinct cardinality is itself too large to shuffle. Counters are
    mergeable by cell-wise addition (sum two sketches' ``cnt`` on
    ``(r, c)``). Hash functions are engine-portable md5 slices, so the
    counter grid — and every estimate derived from it — is exactly
    reproducible by a DuckDB twin (zero row empty cells are simply
    absent; readers COALESCE to 0)."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}x{width}")
    rows = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("r")
    src = df.select(F.col(item_col).cast("string").alias("__it"), rows)
    c = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cms"),
                        F.col("r").cast("string"),
                        F.lit(":"),
                        F.col("__it"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % width
    ).alias("c")
    return (
        src.select("r", c)
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query the sketch for each probe item:
    ``(item, est bigint)`` with ``est = min over rows r of the item's
    cell count`` (absent cell = 0). Classic guarantees: ``est >= true``
    always (overcount-only), and ``est <= true + eps*N`` w.h.p. with
    ``eps = e/width``.

    Join-shaped: probes explode to ``depth`` (r, c) keys and hash-join
    the counter grid (broadcast — the grid is ``<= depth*width`` rows
    by construction), then one min-aggregate per item. The probe panel
    never touches the raw stream."""
    rows = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("r")
    p = probes.select(
        F.col(item_col).cast("string").alias("item"), rows
    ).select(
        "item",
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cms"),
                            F.col("r").cast("string"),
                            F.lit(":"),
                            F.col("item"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % width
        ).alias("c"),
    )
    return (
        p.join(F.broadcast(counters), ["r", "c"], "left")
        .select("item", F.coalesce("cnt", F.lit(0)).alias("__cell"))
        .groupBy("item")
        .agg(F.min("__cell").alias("est"))
    )


def hll_sketch_state(
    df: DataFrame,
    item_col: str,
    keys: tuple[str, ...] = (),
    lgk: int = 12,
) -> DataFrame:
    """Mergeable HLL distinct-count state (Apache DataSketches via
    Spark's ``hll_sketch_agg``): per key group, one binary sketch column
    — the production COUNT(DISTINCT) path at 100 TB, complementing
    :func:`kmv_distinct` (which trades mergeability knobs for an
    oracle-recomputable estimate).

    The state is a first-class column: persist it per partition/day,
    merge with :func:`merge_hll_states` (register-wise union — the
    merged sketch covers exactly the union item set, because registers
    depend only on the hashed item SET), estimate with
    :func:`hll_state_estimate`. Estimator caveat: a ONE-PASS sketch
    reports through DataSketches' HIP estimator while a union must fall
    back to the composite estimator, so merged and direct ESTIMATES can
    differ by a fraction of the error bound (observed ~0.5% at 1k
    distinct) even though the register state is equivalent — both stay
    inside the lgk-configured bounds. One combinable aggregate; state
    size is 2^lgk registers per group regardless of data volume.
    """
    gb = df.groupBy(*keys) if keys else df.groupBy()
    return gb.agg(
        F.hll_sketch_agg(F.col(item_col), F.lit(lgk)).alias("sketch")
    )


def merge_hll_states(
    state: DataFrame, delta: DataFrame, keys: tuple[str, ...] = ()
) -> DataFrame:
    """Union two HLL states key-wise (``hll_union_agg``): exact on the
    item-set level — merged(s(A), s(B)) covers s(A ∪ B) — with the HIP
    vs composite estimator caveat documented on
    :func:`hll_sketch_state` (merged estimates match one-pass estimates
    to within a fraction of the error bound, not bit-exactly)."""
    both = state.unionByName(delta)
    gb = both.groupBy(*keys) if keys else both.groupBy()
    return gb.agg(F.hll_union_agg("sketch").alias("sketch"))


def hll_state_estimate(
    state: DataFrame, keys: tuple[str, ...] = ()
) -> DataFrame:
    """Estimate distinct counts from an HLL state frame."""
    return state.select(
        *keys, F.hll_sketch_estimate("sketch").alias("estimate")
    )
