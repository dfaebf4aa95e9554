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
from pyspark.sql.window import Window as W

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
    if oversize not in ("raise", "skip"):
        raise ValueError(
            f'oversize must be "raise" or "skip", got {oversize!r}'
        )
    carry_cols = list(carry_cols or [])
    # a carry column may repeat the id/block columns (scoring usually
    # compares the block key itself) — select each source column once
    slim = df.select(*dict.fromkeys([id_col, *block_cols, *carry_cols]))
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
    side_cols = list(dict.fromkeys([id_col, *carry_cols]))
    a = slim.select(
        *[F.col(c).alias(f"{c}_a") for c in side_cols],
        *block_cols,
    )
    b = slim.select(
        *[F.col(c).alias(f"{c}_b") for c in side_cols],
        *block_cols,
    )
    return a.join(b, on=list(block_cols)).filter(
        F.col(f"{id_col}_a") < F.col(f"{id_col}_b")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 10,
    shard_prefix_len: int = 4,
    carry_cols: list[str] | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Sorted-neighborhood candidate pairs (Hernández & Stolfo, SIGMOD'95):
    sort all records by ``key_col`` and pair each record with the next
    ``window - 1`` records — a LINEAR ``(window-1)·n`` pair budget, the
    complement to :func:`blocked_pairs`' per-block quadratic one (SNM
    finds matches that straddle block boundaries; blocking finds matches
    far apart in sort order).

    Output: ``{id}_a``/``{id}_b`` (a precedes b in sort order), carry
    columns suffixed ``_a``/``_b``, and ``pos_gap`` (1-based sort-order
    distance, ``< window``).

    Scale shape — no global window, no global sort:

    - The global sort position is a TWO-LEVEL row number (the
      ``packing.token_budget_mix`` sharded-cumsum discipline): records
      range-shard on the leading ``shard_prefix_len`` characters of the
      sort key (a string prefix is monotone in lexicographic order, and
      equal keys share a prefix, so concatenated per-shard order ==
      the global (key, id) order), per-shard counts (a tiny
      shards-sized frame) cumulate into broadcast base offsets, and
      each task adds only its within-shard ``row_number``. Equal to the
      single-window ``ROW_NUMBER() OVER (ORDER BY key, id)`` bit for
      bit, so the SQL oracle is shard-blind.
    - Neighbor pairing is an equi-join on ``floor(pos/window)`` bands:
      a pair at distance ``< window`` lands in the same or adjacent
      band, so the right side carries (band, band-1) keys and the join
      never compares beyond two bands — pairs shuffle on band ids, not
      positions.

    ``shard_prefix_len`` is the parallelism dial and its usefulness is
    bounded by the KEY's prefix entropy, not by the setting: each
    distinct prefix is one shard, and the per-shard ``row_number`` is a
    single-task sort of that shard. A key whose values overwhelmingly
    share a short prefix (e.g. ``"Customer#000..."`` — the TPC-H name
    shape) collapses into ONE giant shard no matter how long the prefix
    is, so pick a prefix length that reaches the part of the key that
    actually varies (for fixed-prefix synthetic keys: past the constant
    stem), or normalize the key first (strip constant stems, lowercase).
    Pass ``stats={}`` to measure instead of guessing: the dict gets
    ``n_shards`` / ``max_shard_rows`` / ``rows`` (one extra counting
    pass over the slim (id, key) projection), and a healthy setting has
    ``max_shard_rows ≪ rows`` with ``n_shards`` at least the cluster's
    task-slot count.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    carry_cols = list(carry_cols or [])
    # The sort key itself is a legal carry column (pair scoring usually
    # compares it) — select each source column once.
    base_cols = [id_col, key_col] + [
        c for c in carry_cols if c not in (id_col, key_col)
    ]
    # NULL sort keys must still pair (and a NULL shard would silently
    # fall out of the base-offset equi-join): coalesce them into the ''
    # shard, which sorts first — matching the NULLS-FIRST local order
    # below. An oracle/reference must therefore use ORDER BY key NULLS
    # FIRST (Spark's ascending default; DuckDB defaults NULLS LAST).
    slim = df.select(*base_cols).withColumn(
        "__shard",
        F.coalesce(
            F.substring(F.col(key_col), 1, shard_prefix_len), F.lit("")
        ),
    )
    # Tiny frame (one row per shard): the unpartitioned window is over
    # |shards| rows, never the data.
    sizes = slim.groupBy("__shard").agg(F.count(F.lit(1)).alias("__n"))
    if stats is not None:
        srow = sizes.agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.max("__n").alias("max_shard_rows"),
            F.sum("__n").alias("rows"),
        ).first()
        stats.update(
            {
                "n_shards": int(srow["n_shards"] or 0),
                "max_shard_rows": int(srow["max_shard_rows"] or 0),
                "rows": int(srow["rows"] or 0),
            }
        )
    shard_w = (
        W.orderBy("__shard").rowsBetween(W.unboundedPreceding, -1)
    )
    bases = sizes.select(
        "__shard",
        F.coalesce(F.sum("__n").over(shard_w), F.lit(0)).alias("__base"),
    )
    local_w = W.partitionBy("__shard").orderBy(
        F.col(key_col).asc_nulls_first(), F.col(id_col).asc_nulls_first()
    )
    pos = (
        slim.join(F.broadcast(bases), "__shard")
        .withColumn(
            "__pos", F.col("__base") + F.row_number().over(local_w)
        )
        .drop("__shard", "__base")
    )
    band = F.floor((F.col("__pos") - 1) / window)
    side_cols = list(dict.fromkeys([id_col, *carry_cols]))
    a = pos.select(
        *[F.col(c).alias(f"{c}_a") for c in side_cols],
        F.col("__pos").alias("__pos_a"),
        band.alias("__band"),
    )
    b = pos.select(
        *[F.col(c).alias(f"{c}_b") for c in side_cols],
        F.col("__pos").alias("__pos_b"),
        F.explode(F.array(band, band - 1)).alias("__band"),
    )
    return (
        a.join(b, "__band")
        .filter(
            (F.col("__pos_b") > F.col("__pos_a"))
            & (F.col("__pos_b") - F.col("__pos_a") < window)
        )
        .withColumn(
            "pos_gap", (F.col("__pos_b") - F.col("__pos_a")).cast("bigint")
        )
        .drop("__band", "__pos_a", "__pos_b")
    )


def phonetic_key(name: Column | str, algorithm: str = "soundex") -> Column:
    """Phonetic blocking key: records that SOUND alike share a block even
    when no character prefix matches ("smith"/"smyth"/"smythe" → S530),
    the classic complement to prefix blocking for person/organization
    names. ``soundex`` is a JVM builtin (codegen); ``nysiis``/``double
    metaphone`` would slot in as Arrow-batched comparators like
    Jaro-Winkler if ever needed. Case-normalized first — Soundex is
    defined on uppercase letters.

    No DuckDB twin exists (no soundex function), so queries blocking on
    this key are certified by planted-data tests rather than the oracle
    gate.
    """
    if algorithm != "soundex":
        raise ValueError(f"unknown phonetic algorithm: {algorithm}")
    col = F.col(name) if isinstance(name, str) else name
    return F.soundex(F.upper(col))


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
    max_lev: int | None = None,
) -> DataFrame:
    """Stage-2 comparator: Levenshtein distance + normalized similarity
    on a carried name pair. Pure JVM expressions (codegen'd).

    With ``max_lev``, the distance uses Spark's THRESHOLDED levenshtein
    (banded DP with early exit — O(k·len) per pair instead of the full
    O(len²) table) and over-bound pairs are filtered out, so the -1
    sentinel never escapes. Use it whenever a ``lev <= k`` match filter
    follows anyway: the comparator runs on EVERY candidate pair, and at
    the 10× bench scale the unbounded DP was the single largest ER cost
    (23 s of the 28 s ``er_resolved_entities`` leg over 30.7M
    candidates). Surviving rows carry the exact distance (the bound
    only changes how fast non-matches are rejected), so results —
    including ``name_sim`` computed from it — are identical to the
    unbounded form.
    """
    if max_lev is None:
        return pairs.withColumns(
            {
                out_lev: F.levenshtein(F.col(name_a), F.col(name_b)),
                out_sim: name_similarity(F.col(name_a), F.col(name_b)),
            }
        )
    bounded = pairs.withColumn(
        out_lev, F.levenshtein(F.col(name_a), F.col(name_b), max_lev)
    ).filter(F.col(out_lev) >= 0)
    longest = F.greatest(F.length(name_a), F.length(name_b))
    return bounded.withColumn(
        out_sim,
        F.round(
            F.lit(1.0)
            - F.col(out_lev).cast("double") / longest.cast("double"),
            6,
        ),
    )


def collapsed_match_edges(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    name_col: str,
    max_lev: int,
    max_block_rows: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """CONNECTIVITY-EQUIVALENT match edges for CC-based resolution —
    the collapse-exact-first discipline (``dedup.jaccard_join_collapsed``)
    applied to the blocked-pairs → thresholded-levenshtein → connected-
    components pipeline. Returns ``({id}_a, {id}_b)`` edges whose
    connected components EQUAL those of the full match-pair set
    ``blocked_pairs(...) |> score_name_pairs(max_lev=k) (lev <= k)``,
    at a d² smaller pair budget under duplication factor d.

    Why equivalent (the verbatim-duplicate regime): records sharing
    (``block_cols``, ``name_col``) are lev-0 matches of each other, and
    a member-level pair's distance equals its REPRESENTATIVES' distance
    (identical names ⇒ identical comparator inputs). So the full match
    set is exactly: complete graphs within each (block, name) group,
    plus complete bipartite graphs between every group pair whose rep
    names are within ``max_lev``. STAR edges (min-id rep ↔ member)
    span each group's complete graph; ONE rep-rep edge spans each
    matching group pair's bipartite graph — components, labels (min id:
    every group's rep IS its min id, so component minima are unchanged)
    and sizes are identical, asserted against the direct pipeline in
    ``test_linkage``. NOT a pair list: scores/multiplicities are
    deliberately dropped — feed this to :func:`resolve_entities` /
    :func:`entity_safe_split`, never to pair-output queries.

    ``max_block_rows`` applies to MEMBER counts per block (the direct
    path's guard surface, ``oversize="raise"`` semantics), so the guard
    fires exactly when the uncollapsed pipeline's would.
    """
    slim = df.select(*dict.fromkeys([id_col, *block_cols, name_col]))
    if max_block_rows is not None:
        over = (
            slim.groupBy(*block_cols)
            .agg(F.count(F.lit(1)).alias("__blk_n"))
            .filter(F.col("__blk_n") > max_block_rows)
        )
        n_over = over.count()
        if stats is not None:
            stats["oversized_blocks"] = n_over
        if n_over:
            raise ValueError(
                f"{n_over} block(s) exceed max_block_rows="
                f"{max_block_rows}; refine block_cols"
            )
    group_cols = list(dict.fromkeys([*block_cols, name_col]))
    # min-id representative per (block, name) group; the group table is
    # consumed by the star edges AND the rep-level pair generation —
    # checkpoint once (shared-lineage rule)
    members = (
        slim.select(id_col, *group_cols)
        .withColumn(
            "__rep", F.min(id_col).over(W.partitionBy(*group_cols))
        )
        .localCheckpoint(eager=True)
    )
    stars = members.filter(F.col(id_col) != F.col("__rep")).select(
        F.col("__rep").alias(f"{id_col}_a"),
        F.col(id_col).alias(f"{id_col}_b"),
    )
    reps = members.filter(F.col(id_col) == F.col("__rep")).select(
        id_col, *group_cols
    )
    rep_pairs = blocked_pairs(
        reps,
        id_col=id_col,
        block_cols=block_cols,
        carry_cols=[name_col],
        # the member-level guard above is the faithful one; rep-level
        # blocks are only ever smaller
        max_block_rows=None,
    )
    rep_edges = score_name_pairs(
        rep_pairs, f"{name_col}_a", f"{name_col}_b", max_lev=max_lev
    ).select(f"{id_col}_a", f"{id_col}_b")
    if stats is not None:
        stats["n_docs"] = members.count()
        stats["n_groups"] = reps.count()
    return stars.unionByName(rep_edges)


def jaro_winkler(s1: str, s2: str) -> float:
    """Reference Jaro-Winkler (Winkler 1990): standard p=0.1 prefix
    boost capped at 4 chars, applied only when jaro > 0.7 (the classic
    boost threshold), empty-vs-anything = 0. Verified BIT-exact against
    DuckDB's ``jaro_winkler_similarity`` on 3000 random cases — which is
    what lets :func:`jaro_winkler_pairs` carry a full DuckDB oracle.
    """
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    if s1 == s2:
        return 1.0
    match_dist = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = 0 if i <= match_dist else i - match_dist
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / len1 + matches / len2 + (matches - t) / matches) / 3
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for a, b in zip(s1, s2):
        if a == b and prefix < 4:
            prefix += 1
        else:
            break
    return jaro + prefix * 0.1 * (1 - jaro)


def jaro_winkler_pairs(
    pairs: DataFrame, name_a: str, name_b: str, out_col: str = "jw_sim"
) -> DataFrame:
    """Jaro-Winkler similarity per pair, as an Arrow-batched pandas UDF.

    JW is a per-pair dynamic computation Spark has no builtin for, so
    this is one of the engine's documented vectorized-Python exceptions
    (like the whitening apply): Arrow batch transfer, a tight per-pair
    loop inside the batch, no per-row pickling. It belongs AFTER a
    candidate generator — the pair stream is blocking-bounded
    ((w-1)·n for SNM), never the raw table cross product, so the Python
    stage scales with candidates, not data.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # non-decorator form: `from __future__ import annotations`
    # stringifies hints, which pandas_udf's inference can't resolve
    def _jw(a, b):
        return pd.Series(
            [
                jaro_winkler(x, y) if x is not None and y is not None else None
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    jw_udf = pandas_udf(_jw, "double")
    return pairs.withColumn(out_col, jw_udf(F.col(name_a), F.col(name_b)))


def fellegi_sunter_score(
    pairs: DataFrame,
    agreements: list[tuple[str, Column, float, float]],
    out_col: str = "fs_score",
    scale: int = 6,
) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (JASA 1969): per
    attribute k with agreement probability ``m`` among true matches and
    ``u`` among non-matches, an agreeing pair contributes
    ``log2(m/u)`` and a disagreeing one ``log2((1-m)/(1-u))``; the
    match score is the sum. The classical decision model every
    production linker (Splink, JedAI, …) builds on.

    ``agreements`` is ``(name, agree_condition, m, u)`` per attribute;
    the output carries one ``agree_{name}`` boolean per attribute plus
    the rounded score. Weights are computed driver-side as exact Python
    doubles and summed LEFT-TO-RIGHT in one codegen expression, so an
    oracle writing the same literals in the same order is bit-identical
    before the final round.

    m/u here are caller-supplied (from labeled pairs or domain
    knowledge); unsupervised EM estimation of m/u is the standard
    extension and would reuse exactly these agreement columns as its
    E-step input.
    """
    import math

    score = None
    out = pairs
    for name, cond, m, u in agreements:
        if not (0.0 < u < 1.0 and 0.0 < m < 1.0):
            raise ValueError(f"m/u for {name!r} must be in (0, 1)")
        agree_w = math.log2(m / u)
        disagree_w = math.log2((1.0 - m) / (1.0 - u))
        out = out.withColumn(f"agree_{name}", cond)
        term = F.when(F.col(f"agree_{name}"), F.lit(agree_w)).otherwise(
            F.lit(disagree_w)
        )
        score = term if score is None else score + term
    if score is None:
        raise ValueError("agreements must name at least one attribute")
    return out.withColumn(out_col, F.round(score, scale))


def estimate_fs_parameters(
    pairs: DataFrame,
    agreement_cols: list[str],
    iterations: int = 100,
    tol: float = 1e-10,
    p_init: float = 0.1,
    m_init: float = 0.9,
    u_init: float = 0.1,
) -> dict:
    """Unsupervised EM estimation of the Fellegi-Sunter parameters
    (Winkler 1988): given boolean agreement columns over candidate
    pairs, estimate per-attribute ``m`` (P(agree | match)), ``u``
    (P(agree | non-match)), and the match prevalence ``p`` — no labeled
    pairs needed.

    Driver-bounded by construction: the ONLY full-data pass is one
    groupBy over the agreement booleans, collapsing any number of pairs
    to at most ``2^k`` pattern-count rows (k = #attributes, so 8 rows
    for 3 attributes); EM then iterates on that tiny table driver-side.
    This is the standard production recipe (Splink's training loop has
    the same shape). ``m_init > u_init`` breaks the label-switching
    symmetry so "match" is the high-agreement class. Identifiability
    needs k >= 3 attributes (2^k - 1 observed pattern frequencies must
    cover the 2k + 1 free parameters; k = 2 is under-determined and the
    estimates drift — demonstrated in tests).

    Returns ``{"p": float, "params": {col: (m, u)}, "iterations": int,
    "converged": bool}`` — feed ``params`` straight into
    :func:`fellegi_sunter_score`.
    """
    k = len(agreement_cols)
    if not k:
        raise ValueError("agreement_cols must not be empty")
    rows = (
        pairs.groupBy(
            *[F.col(c).cast("boolean").alias(c) for c in agreement_cols]
        )
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    patterns = [
        (tuple(bool(r[c]) for c in agreement_cols), float(r["__n"]))
        for r in rows
    ]
    total = sum(n for _, n in patterns)
    p = float(p_init)
    m = [float(m_init)] * k
    u = [float(u_init)] * k
    converged = False
    it = 0
    for it in range(1, iterations + 1):
        # E-step on <= 2^k patterns
        post = []
        for gamma, n in patterns:
            pm = p
            pu = 1.0 - p
            for j in range(k):
                pm *= m[j] if gamma[j] else (1.0 - m[j])
                pu *= u[j] if gamma[j] else (1.0 - u[j])
            post.append(pm / (pm + pu) if (pm + pu) > 0 else 0.0)
        # M-step
        wm = sum(n * w for (_, n), w in zip(patterns, post))
        wu = total - wm
        new_p = wm / total
        new_m = []
        new_u = []
        for j in range(k):
            am = sum(
                n * w for (g, n), w in zip(patterns, post) if g[j]
            )
            au = sum(
                n * (1.0 - w) for (g, n), w in zip(patterns, post) if g[j]
            )
            # clamp away from {0,1} so log-weights stay finite
            new_m.append(min(max(am / wm if wm else 0.5, 1e-9), 1 - 1e-9))
            new_u.append(min(max(au / wu if wu else 0.5, 1e-9), 1 - 1e-9))
        delta = abs(new_p - p) + sum(
            abs(a - b) for a, b in zip(new_m, m)
        ) + sum(abs(a - b) for a, b in zip(new_u, u))
        p, m, u = new_p, new_m, new_u
        if delta < tol:
            converged = True
            break
    return {
        "p": p,
        "params": {c: (m[j], u[j]) for j, c in enumerate(agreement_cols)},
        "iterations": it,
        "converged": converged,
    }


def fs_decision(
    score: Column,
    upper: float,
    lower: float,
    out_values: tuple[str, str, str] = ("match", "possible", "nonmatch"),
) -> Column:
    """The Fellegi-Sunter three-way decision: link above ``upper``,
    clerical-review band between, non-link below ``lower``."""
    hi, mid, lo = out_values
    return (
        F.when(score >= upper, hi)
        .when(score >= lower, mid)
        .otherwise(lo)
    )


def entity_safe_split(
    records: DataFrame,
    matches: DataFrame,
    id_col: str,
    id_a: str,
    id_b: str,
    splits: list[tuple[str, float]],
    buckets: int = 10000,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: split by RESOLVED ENTITY,
    not by row, so near-duplicate records can never straddle train and
    test — the reason a training pipeline runs entity resolution / near
    dedup before splitting at all. Composition of
    :func:`resolve_entities` and the deterministic md5-bucket
    ``hash_split`` (pure projection, engine-portable): every record of
    an entity hashes the SAME entity_id, hence lands on the same side,
    reproducibly across runs and appends.
    """
    from home_credit_data_engineering_spark.operators.sampling import (
        hash_split,
    )

    labeled = resolve_entities(records, matches, id_col, id_a, id_b)
    return hash_split(labeled, "entity_id", splits, buckets).select(
        id_col, "entity_id", "split"
    )


def incremental_resolve_entities(
    state: DataFrame,
    batch: DataFrame,
    id_col: str,
    block_cols: list[str],
    compare_cols: list[str],
    matcher,
) -> DataFrame:
    """O(Δ) entity resolution: fold a batch of NEW records into a
    persisted resolved state without recomputing history.

    ``state`` is the running output — one row per known record with
    ``entity_id`` plus the blocking and compare columns future batches
    match against. ``batch`` carries the same columns minus
    ``entity_id``; batch ids must be new (same contract as the
    incremental dedup states — re-ingesting a known id is an upstream
    bug this layer does not mask). ``matcher`` maps the suffixed pair
    frame (``{c}_a``/``{c}_b``) to matched pairs.

    Per-batch cost is localized to TOUCHED BLOCKS:

    - candidate pairs are batch × (batch ∪ state members sharing a
      batch block key) — old-old pairs are never re-generated, they are
      already folded into the state's labels;
    - the CC runs over (new match edges ∪ one anchor edge per touched
      state member to its entity_id), so merges propagate through
      existing entities without loading untouched ones. A component's
      new label is the min id over its CC nodes, and every old
      component's min (its entity_id) IS a CC node, so labels equal the
      full-recompute labels exactly (asserted in tests);
    - old entities absorbed by a merge are renamed via an
      (old entity_id → new label) map joined on ``entity_id`` — an
      id-to-id metadata join, never a payload rewrite.

    Returns the updated state (same schema as ``state``).
    """
    attrs = [
        c
        for c in (*block_cols, *compare_cols)
        if c != id_col
    ]
    # dedupe while preserving order
    attrs = list(dict.fromkeys(attrs))
    slim_batch = batch.select(id_col, *attrs)
    touched = slim_batch.select(*block_cols).distinct()
    members = state.select(id_col, "entity_id", *attrs).join(
        touched, on=list(block_cols), how="left_semi"
    )
    # alias id + non-block attrs with pair suffixes; block cols stay
    # unsuffixed so the pair generation is an equi-join on them
    def _suffix(frame: DataFrame, suf: str) -> DataFrame:
        return frame.select(
            *[
                F.col(c).alias(f"{c}{suf}")
                for c in (id_col, *[x for x in attrs if x not in block_cols])
            ],
            *block_cols,
        )

    a = _suffix(slim_batch, "_a")
    # batch × batch: one orientation only (id_a < id_b) so the matcher
    # scores each new-new candidate once; batch × state-members: keep
    # the batch side as _a (state ids are distinct from batch ids by
    # contract, so no self-pairs arise).
    raw_pairs = (
        a.join(_suffix(slim_batch, "_b"), on=list(block_cols)).filter(
            F.col(f"{id_col}_a") < F.col(f"{id_col}_b")
        )
    ).unionByName(
        a.join(
            _suffix(members.drop("entity_id"), "_b"), on=list(block_cols)
        ).filter(F.col(f"{id_col}_a") != F.col(f"{id_col}_b"))
    )
    # block cols are equal within a pair; re-expose them suffixed so the
    # matcher sees the same shape blocked_pairs produces.
    for c in block_cols:
        raw_pairs = raw_pairs.withColumns(
            {f"{c}_a": F.col(c), f"{c}_b": F.col(c)}
        )
    matched = matcher(raw_pairs).select(
        F.least(F.col(f"{id_col}_a"), F.col(f"{id_col}_b")).alias("__ea"),
        F.greatest(F.col(f"{id_col}_a"), F.col(f"{id_col}_b")).alias("__eb"),
    )
    anchors = members.select(
        F.col(id_col).alias("__ea"), F.col("entity_id").alias("__eb")
    ).filter(F.col("__ea") != F.col("__eb"))
    edges = matched.unionByName(anchors).distinct()
    comp = connected_components_star(edges, a_col="__ea", b_col="__eb")
    # Entity rename map: every old entity whose id appears in the CC —
    # absorbed entities point at the merged component's new min label.
    ent_map = (
        state.select("entity_id")
        .distinct()
        .join(
            comp.select(
                F.col("node").alias("entity_id"),
                F.col("component").alias("__new"),
            ),
            on="entity_id",
        )
    )
    # ent_map is touched-entities-sized (bounded by batch blocks) — AQE
    # broadcasts it when small; no forced hint, merges can be wide.
    new_state = (
        state.join(ent_map, on="entity_id", how="left")
        .select(
            id_col,
            F.coalesce(F.col("__new"), F.col("entity_id")).alias("entity_id"),
            *attrs,
        )
    )
    batch_labeled = (
        slim_batch.join(
            comp.withColumnRenamed("node", id_col), on=id_col, how="left"
        )
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("entity_id"),
            *attrs,
        )
    )
    return new_state.unionByName(batch_labeled)


def entity_bucket(col: Column | str, n_buckets: int) -> Column:
    """Deterministic id → partition bucket (xxhash64 mod n) — the same
    pruning idiom as the BM25/IVF indexes (``retrieval.py:term_bucket``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")


def write_entity_index(
    state: DataFrame, output: str, id_col: str, n_buckets: int = 64
) -> None:
    """Persist the resolved state for SERVING: two bucket-partitioned
    copies so both access paths partition-prune instead of scanning.

    - ``by_record/`` — partitioned by ``rbucket = xxhash64(id) % n``:
      "which entity is record X in?" reads one bucket (1/n of bytes).
    - ``by_entity/`` — partitioned by ``ebucket = xxhash64(entity_id)
      % n``: "all members of entity E" reads one bucket.

    A point lookup is therefore two pruned scans regardless of state
    size — the lexical-index contract applied to the entity table.
    xxhash64 of a literal folds at plan time, so the partition filter is
    a constant comparison (PartitionFilters, plan-asserted in tests).

    The bucket count is pinned in ``_index_meta.json`` at the index
    root; :func:`refresh_entity_index` validates against it so a later
    incremental run cannot silently rewrite partitions under a
    different modulus.
    """
    import json
    import os

    (
        state.withColumn("rbucket", entity_bucket(id_col, n_buckets))
        .repartition("rbucket")
        .write.mode("overwrite")
        .partitionBy("rbucket")
        .parquet(f"{output}/by_record")
    )
    (
        state.withColumn("ebucket", entity_bucket("entity_id", n_buckets))
        .repartition("ebucket")
        .write.mode("overwrite")
        .partitionBy("ebucket")
        .parquet(f"{output}/by_entity")
    )
    tmp = os.path.join(output, "_index_meta.json.__next")
    with open(tmp, "w") as fh:
        json.dump({"n_buckets": int(n_buckets)}, fh)
    os.replace(tmp, os.path.join(output, "_index_meta.json"))


def entity_profile(
    spark,
    index_path: str,
    record_id,
    id_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Serving endpoint: all records of the entity containing
    ``record_id`` (the "golden record + sources" page). Two pruned
    point reads against :func:`write_entity_index` output. xxhash64 is
    TYPE-sensitive, so the probe literal is cast to the stored column's
    type before hashing — an int literal against a bigint column would
    silently hash into the wrong bucket otherwise.
    """
    by_record = spark.read.parquet(f"{index_path}/by_record")
    key = F.lit(record_id).cast(by_record.schema[id_col].dataType)
    rec = (
        by_record.filter(
            (F.col("rbucket") == entity_bucket(key, n_buckets))
            & (F.col(id_col) == key)
        )
        .select("entity_id")
        .limit(1)
        .collect()
    )
    by_entity = spark.read.parquet(f"{index_path}/by_entity")
    if not rec:
        return by_entity.limit(0).drop("ebucket")
    ent = F.lit(rec[0]["entity_id"]).cast(
        by_entity.schema["entity_id"].dataType
    )
    return by_entity.filter(
        (F.col("ebucket") == entity_bucket(ent, n_buckets))
        & (F.col("entity_id") == ent)
    ).drop("ebucket")


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
    # consumed by the size aggregate AND the join-back: share one
    # evaluation (lazy — the aggregate's pass materializes it) instead
    # of running the ids x components join and the CC roots anti-join
    # twice
    labeled = labeled.localCheckpoint(eager=False)
    sizes = labeled.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("entity_size")
    )
    return labeled.join(sizes, on="entity_id").select(
        id_col, "entity_id", "entity_size"
    )


# ---------------------------------------------------------------------------
# Clerical review: the consumer of fs_decision's "possible" band
# ---------------------------------------------------------------------------


def write_review_queue(
    scored_pairs: DataFrame,
    output: str,
    id_a: str,
    id_b: str,
    decision_col: str = "fs_decision",
    possible_value: str = "possible",
    n_buckets: int = 64,
) -> None:
    """Persist the Fellegi-Sunter clerical-review band as a serving
    artifact: the ``possible`` pairs (neither auto-link nor auto-reject)
    that a human or downstream model must adjudicate.

    Two bucket-partitioned copies, the :func:`write_entity_index`
    contract applied to pairs: ``by_a/`` partitioned on
    ``abucket = xxhash64(id_a) % n`` and ``by_b/`` on the ``id_b``
    bucket, so "pending reviews touching record X" is two pruned point
    scans regardless of queue size. Each row keeps the full scored-pair
    context (agreement pattern, score) — the reviewer sees the evidence,
    not just ids.
    """
    queue = scored_pairs.filter(F.col(decision_col) == possible_value)
    (
        queue.withColumn("abucket", entity_bucket(id_a, n_buckets))
        .repartition("abucket")
        .write.mode("overwrite")
        .partitionBy("abucket")
        .parquet(f"{output}/by_a")
    )
    (
        queue.withColumn("bbucket", entity_bucket(id_b, n_buckets))
        .repartition("bbucket")
        .write.mode("overwrite")
        .partitionBy("bbucket")
        .parquet(f"{output}/by_b")
    )


def reviews_for_record(
    spark,
    queue_path: str,
    record_id,
    id_a: str,
    id_b: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Pending reviews touching ``record_id``: two partition-pruned point
    scans (one per side). Probe literals are cast to the stored column
    types before hashing (xxhash64 is type-sensitive — same guard as
    :func:`entity_profile`)."""
    by_a = spark.read.parquet(f"{queue_path}/by_a")
    key_a = F.lit(record_id).cast(by_a.schema[id_a].dataType)
    left = by_a.filter(
        (F.col("abucket") == entity_bucket(key_a, n_buckets))
        & (F.col(id_a) == key_a)
    ).drop("abucket")
    by_b = spark.read.parquet(f"{queue_path}/by_b")
    key_b = F.lit(record_id).cast(by_b.schema[id_b].dataType)
    right = by_b.filter(
        (F.col("bbucket") == entity_bucket(key_b, n_buckets))
        & (F.col(id_b) == key_b)
    ).drop("bbucket")
    return left.unionByName(right)


def fold_match_edges(
    state: DataFrame,
    edges: DataFrame,
    id_col: str,
    id_a: str,
    id_b: str,
) -> DataFrame:
    """Fold new match edges AMONG EXISTING records into a resolved
    state, O(touched entities) — the resolution step review decisions
    need (:func:`fold_review_decisions`), and the general form of
    :func:`incremental_resolve_entities`' relabel phase when no new
    records arrive.

    The CC runs over (new edges ∪ one anchor edge per touched record to
    its entity_id); a merged component's new label is the min over its
    nodes, and every involved entity's entity_id (= its member minimum)
    is a node via the anchors, so labels equal a full recompute with the
    accepted edges added (asserted in tests). Absorbed entities are
    renamed through an (old entity_id → new label) map joined on
    ``entity_id`` — id-to-id metadata, never a payload rewrite; an edge
    endpoint unknown to the state is a contract error surfaced by the
    anchor join producing no row for it (the edge still merges the ids
    it names).
    """
    new_edges = edges.select(
        F.least(F.col(id_a), F.col(id_b)).alias("__ea"),
        F.greatest(F.col(id_a), F.col(id_b)).alias("__eb"),
    ).filter(F.col("__ea") != F.col("__eb"))
    endpoints = (
        new_edges.select(F.col("__ea").alias(id_col))
        .unionByName(new_edges.select(F.col("__eb").alias(id_col)))
        .distinct()
    )
    anchors = (
        state.select(id_col, "entity_id")
        .join(endpoints, on=id_col, how="left_semi")
        .select(
            F.col(id_col).alias("__ea"), F.col("entity_id").alias("__eb")
        )
        .filter(F.col("__ea") != F.col("__eb"))
    )
    comp = connected_components_star(
        new_edges.unionByName(anchors).distinct(), a_col="__ea", b_col="__eb"
    )
    ent_map = (
        state.select("entity_id")
        .distinct()
        .join(
            comp.select(
                F.col("node").alias("entity_id"),
                F.col("component").alias("__new"),
            ),
            on="entity_id",
        )
    )
    other = [c for c in state.columns if c not in (id_col, "entity_id")]
    return state.join(ent_map, on="entity_id", how="left").select(
        id_col,
        F.coalesce(F.col("__new"), F.col("entity_id")).alias("entity_id"),
        *other,
    )


def fold_review_decisions(
    state: DataFrame,
    decisions: DataFrame,
    id_col: str,
    id_a: str,
    id_b: str,
    decision_col: str = "decision",
    accept_value: str = "accept",
) -> DataFrame:
    """Close the clerical-review loop: accepted decisions become match
    edges and the resolved state is re-labeled incrementally
    (:func:`fold_match_edges`); rejected/abstained rows are dropped —
    a rejection asserts "not the same entity", which is the default
    state of any unlinked pair.

    ``decisions`` carries ``(id_a, id_b, decision)`` — typically the
    review-queue rows (:func:`write_review_queue`) joined with reviewer
    verdicts. Folding the same accepted pair twice is a no-op (the edge
    is already inside one component), so replaying a decisions file is
    idempotent.
    """
    accepted = decisions.filter(F.col(decision_col) == accept_value)
    return fold_match_edges(state, accepted, id_col, id_a, id_b)


def tune_blocking(
    records: DataFrame,
    id_col: str,
    schemes: dict[str, list],
    matcher,
    carry_cols: list[str],
    max_block_rows: int | None = None,
) -> DataFrame:
    """Blocking-key tuning report: the pair-budget-vs-recall frontier
    across candidate blocking schemes — the consumer of
    ``er_blocking_quality``'s raw numbers.

    ``schemes`` maps a scheme name to its list of blocking-key
    expressions (column names or Columns — e.g. name prefixes of
    several lengths, phonetic keys, key combos). For each scheme the
    report measures the candidate-pair count (the cost axis) and a
    RECALL PROXY: the fraction of the reference match set the scheme's
    pairs retain, where the reference is the union of matched pairs
    over ALL candidate schemes (no labels needed — the standard
    generator-union proxy; a match no generator can produce is invisible
    to any of them, so the proxy compares schemes, not absolute truth).

    Returns one row per scheme: ``scheme``, ``n_pairs``,
    ``pair_fraction`` (vs C(n,2)), ``n_matched``, ``recall_proxy`` —
    sorted so the frontier reads top-down (recall desc, cost asc). The
    driver only ever holds one number per scheme; each scheme's pair
    generation is the ordinary blocked self-join, so at 100 TB this
    runs on a sample (pass a sampled ``records`` — the frontier shape,
    not the absolute counts, is the decision input) with oversized
    blocks skipped via ``max_block_rows``.
    """
    spark = records.sparkSession
    n = records.count()
    total_pairs = n * (n - 1) // 2
    per_scheme: dict[str, DataFrame] = {}
    pair_counts: dict[str, int] = {}
    for name, keys in schemes.items():
        keyed = records.withColumns(
            {
                f"__bk{i}": (F.col(k) if isinstance(k, str) else k)
                for i, k in enumerate(keys)
            }
        )
        pairs = blocked_pairs(
            keyed,
            id_col,
            [f"__bk{i}" for i in range(len(keys))],
            carry_cols=carry_cols,
            max_block_rows=max_block_rows,
            oversize="skip" if max_block_rows is not None else "raise",
        )
        pair_counts[name] = pairs.count()
        # checkpoint the (small) matched id-pair set: it is consumed
        # twice below (reference union + left_semi), and without this
        # each consumption re-runs the blocked join + matcher
        per_scheme[name] = (
            matcher(pairs)
            .select(
                F.least(
                    F.col(f"{id_col}_a"), F.col(f"{id_col}_b")
                ).alias("__ma"),
                F.greatest(
                    F.col(f"{id_col}_a"), F.col(f"{id_col}_b")
                ).alias("__mb"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
    reference = None
    for frame in per_scheme.values():
        reference = frame if reference is None else reference.unionByName(frame)
    if reference is None:
        raise ValueError("schemes must name at least one blocking scheme")
    reference = reference.distinct().persist()
    n_ref = reference.count()
    rows = []
    for name in schemes:
        n_matched = per_scheme[name].join(
            reference, on=["__ma", "__mb"], how="left_semi"
        ).count()
        rows.append(
            (
                name,
                pair_counts[name],
                round(pair_counts[name] / total_pairs, 9)
                if total_pairs
                else 0.0,
                n_matched,
                round(n_matched / n_ref, 9) if n_ref else 1.0,
            )
        )
    reference.unpersist()
    return spark.createDataFrame(
        rows,
        "scheme string, n_pairs bigint, pair_fraction double, "
        "n_matched bigint, recall_proxy double",
    ).orderBy(F.col("recall_proxy").desc(), F.col("n_pairs").asc())


def refresh_entity_index(
    state: DataFrame,
    prior_state: DataFrame,
    output: str,
    id_col: str,
    n_buckets: int = 64,
) -> dict:
    """O(touched buckets) serving-index maintenance — the incremental
    complement to :func:`write_entity_index`'s full rewrite.

    After an incremental fold (:func:`incremental_resolve_entities` /
    :func:`fold_review_decisions`), only records that are NEW or whose
    ``entity_id`` CHANGED need their index partitions refreshed. This
    diffs ``state`` against ``prior_state`` on (id, entity_id), maps the
    changed rows to their ``by_record``/``by_entity`` buckets, and
    rewrites ONLY those partitions via dynamic partition overwrite —
    each rewritten partition gets its complete new contents (overwrite
    semantics need whole partitions), untouched buckets keep their
    files byte-for-byte.

    A changed ENTITY label touches the entity's old and new ``by_entity``
    buckets; both come out of the diff because every relabeled member row
    appears in it (old label from ``prior_state``, new from ``state``).
    A touched bucket that ends up with ZERO rows (an absorbed entity was
    its bucket's only resident) is deleted explicitly — dynamic
    partition overwrite only replaces partitions PRESENT in the written
    data, so an empty bucket would otherwise keep its stale files.
    Returns ``{"changed_rows", "rbuckets", "ebuckets"}`` — at 100 TB a
    daily batch touching 1% of buckets rewrites 1% of the index instead
    of all of it. Results equal :func:`write_entity_index` output exactly
    (asserted in tests).

    ``n_buckets`` must match the count the index was BUILT with — it is
    validated against the ``_index_meta.json`` pin
    :func:`write_entity_index` writes (a mismatched modulus would
    rewrite some partitions while stale rows survive under the old
    layout). Indexes written before the pin existed are trusted as-is.
    """
    import json
    import os
    import shutil

    meta_path = os.path.join(output, "_index_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            stored = int(json.load(fh)["n_buckets"])
        if stored != n_buckets:
            raise ValueError(
                f"index was built with n_buckets={stored}, got {n_buckets}"
            )
    # the diff feeds three actions (two bucket collects + the count);
    # lazy checkpoint shares one evaluation of the exceptAll across them
    changed = (
        state.select(id_col, "entity_id")
        .exceptAll(prior_state.select(id_col, "entity_id"))
        .localCheckpoint(eager=False)
    )
    # old labels of relabeled records also free their by_entity buckets
    old_labels = prior_state.select(id_col, "entity_id").exceptAll(
        state.select(id_col, "entity_id")
    )
    rbuckets = sorted(
        r["b"]
        for r in changed.select(
            entity_bucket(id_col, n_buckets).alias("b")
        ).distinct().collect()
    )
    ebuckets = sorted(
        r["b"]
        for r in changed.select(
            entity_bucket("entity_id", n_buckets).alias("b")
        )
        .unionByName(
            old_labels.select(entity_bucket("entity_id", n_buckets).alias("b"))
        )
        .distinct()
        .collect()
    )
    n_changed = changed.count()

    def _rewrite(leg: str, part: str, key_col) -> None:
        buckets = rbuckets if part == "rbucket" else ebuckets
        if not buckets:
            return
        rows = state.withColumn(
            part, entity_bucket(key_col, n_buckets)
        ).filter(F.col(part).isin(buckets))
        present = {
            r["b"] for r in rows.select(F.col(part).alias("b")).distinct().collect()
        }
        if present:
            (
                rows.filter(F.col(part).isin(sorted(present)))
                .repartition(part)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(part)
                .parquet(f"{output}/{leg}")
            )
        # touched buckets with no surviving rows: dynamic overwrite
        # never sees them, so drop their stale partition dirs directly
        for b in set(buckets) - present:
            stale = os.path.join(f"{output}/{leg}", f"{part}={b}")
            if os.path.isdir(stale):
                shutil.rmtree(stale)

    _rewrite("by_record", "rbucket", id_col)
    _rewrite("by_entity", "ebucket", "entity_id")
    return {
        "changed_rows": int(n_changed),
        "rbuckets": [int(b) for b in rbuckets],
        "ebuckets": [int(b) for b in ebuckets],
    }
