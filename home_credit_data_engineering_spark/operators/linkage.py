"""Entity resolution / record linkage (north-star extension; no reference
counterpart — the reference's closest surface is whole-row dedup in
``spark/silver/processor.py``).

The classic three-stage pipeline, each stage expressed as declarative
DataFrame ops so Catalyst keeps it JVM-side end to end:

1. **Blocking** (:func:`blocked_pairs`): candidate pairs are generated
   ONLY within user-chosen block keys (a self equi-join), never as a
   cartesian product. The pair budget is sum(|block|²)/2, so block
   granularity is the scale dial — at 100 TB you block on
   (country, name-prefix, zip3, …) until the largest block fits the
   budget, and :func:`blocked_pairs` can enforce that with
   ``max_block_rows`` (raise or skip oversized blocks, counted in
   ``stats``) instead of silently going quadratic.
2. **Scoring** (:func:`score_name_pairs`): pairwise comparators on the
   carried columns. ``levenshtein`` is a built-in JVM expression —
   whole-stage-codegen'd, no Python in the loop.
3. **Resolution** (:func:`resolve_entities`): matched pairs are edges of
   an undirected similarity graph; entities are its connected components
   (alternating star algorithm, O(log² n) rounds — see
   ``operators/dedup.py:connected_components_star``), labeled by the
   component's minimum record id so the label is itself a record id
   (the survivor), not a synthetic key.

Shuffle discipline: every exchange in the pipeline carries (id, block
key, compare columns) or (id, id) pairs only — full payload rows are
joined back exactly once, after resolution, by record id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.dedup import (
    connected_components_star,
)


def blocked_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    carry_cols: list[str] | None = None,
    max_block_rows: int | None = None,
    oversize: str = "raise",
    stats: dict | None = None,
) -> DataFrame:
    """Within-block candidate pairs: one row per unordered pair
    ``(id_a < id_b)`` sharing every ``block_cols`` value.

    Output columns: ``{id}_a``, ``{id}_b``, ``{c}_a``/``{c}_b`` for each
    carry column, plus the block columns themselves (one copy — equal by
    construction).

    ``max_block_rows`` bounds the quadratic blow-up: with
    ``oversize="raise"`` an over-budget block is a hard error (the
    blocking key is too coarse — fix the key, don't eat the shuffle);
    with ``oversize="skip"`` oversized blocks are dropped from pairing
    and their count is reported in ``stats["oversized_blocks"]`` — the
    standard production trade (a block of 10M identical keys is junk
    data, not 50T candidate pairs).
    """
    carry_cols = list(carry_cols or [])
    slim = df.select(id_col, *block_cols, *carry_cols)
    if max_block_rows is not None:
        sizes = slim.groupBy(*block_cols).agg(
            F.count(F.lit(1)).alias("__blk_n")
        )
        over = sizes.filter(F.col("__blk_n") > max_block_rows)
        n_over = over.count()
        if stats is not None:
            stats["oversized_blocks"] = n_over
        if n_over:
            if oversize == "raise":
                raise ValueError(
                    f"{n_over} block(s) exceed max_block_rows="
                    f"{max_block_rows}; refine block_cols or pass "
                    'oversize="skip"'
                )
            slim = slim.join(
                F.broadcast(over.select(*block_cols)),
                on=block_cols,
                how="left_anti",
            )
    a = slim.select(
        *[F.col(c).alias(f"{c}_a") for c in (id_col, *carry_cols)],
        *block_cols,
    )
    b = slim.select(
        *[F.col(c).alias(f"{c}_b") for c in (id_col, *carry_cols)],
        *block_cols,
    )
    return a.join(b, on=list(block_cols)).filter(
        F.col(f"{id_col}_a") < F.col(f"{id_col}_b")
    )


def name_similarity(name_a: Column, name_b: Column, scale: int = 6) -> Column:
    """Normalized edit similarity ``1 - lev/max(len)`` rounded for
    cross-engine hash stability (both factors are exact integers, so the
    one rounded division is deterministic)."""
    lev = F.levenshtein(name_a, name_b)
    longest = F.greatest(F.length(name_a), F.length(name_b))
    return F.round(
        F.lit(1.0) - lev.cast("double") / longest.cast("double"), scale
    )


def score_name_pairs(
    pairs: DataFrame,
    name_a: str,
    name_b: str,
    out_lev: str = "lev",
    out_sim: str = "name_sim",
) -> DataFrame:
    """Stage-2 comparator: Levenshtein distance + normalized similarity
    on a carried name pair. Pure JVM expressions (codegen'd)."""
    return pairs.withColumns(
        {
            out_lev: F.levenshtein(F.col(name_a), F.col(name_b)),
            out_sim: name_similarity(F.col(name_a), F.col(name_b)),
        }
    )


def resolve_entities(
    records: DataFrame,
    matches: DataFrame,
    id_col: str,
    id_a: str,
    id_b: str,
) -> DataFrame:
    """Stage 3: collapse matched pairs into entities.

    Returns ``records``' id column plus ``entity_id`` (the component's
    minimum record id — unmatched records are their own entity) and
    ``entity_size``. The components come from the alternating-star CC
    (ids-only loop frames); the size join shuffles (id, entity_id) pairs
    only.
    """
    ids = records.select(id_col)
    comp = connected_components_star(
        matches.select(id_a, id_b), a_col=id_a, b_col=id_b
    )
    labeled = ids.join(
        comp.withColumnRenamed("node", id_col), on=id_col, how="left"
    ).select(
        id_col,
        F.coalesce(F.col("component"), F.col(id_col)).alias("entity_id"),
    )
    sizes = labeled.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("entity_size")
    )
    return labeled.join(sizes, on="entity_id").select(
        id_col, "entity_id", "entity_size"
    )
