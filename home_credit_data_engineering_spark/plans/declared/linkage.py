"""Entity-resolution / record-linkage declared queries.

North-star extension (no reference counterpart; nearest reference
surface is whole-row dedup, ``spark/silver/processor.py``): blocking →
pairwise scoring → connected-component resolution over the customer
table. The resolution oracle is an exact recursive-CTE transitive
closure — component labels are min-over-reachable-set, which DuckDB
computes exactly on the (small) sf0.01 match graph, while the Spark
side runs the O(log² n) alternating-star CC; both label a component by
its minimum member id, so the results are hash-identical.

Blocking key: (c_nationkey, substr(c_name, 1, 15)). TPC-H-ish names are
``Customer#`` + 9 zero-padded digits, so the 15-char prefix pins the
first 6 digits — blocks stay tiny (≤ ~80 rows at sf0.01, shrinking
relative to table size as SF grows), which is exactly the production
blocking discipline the operator enforces via ``max_block_rows``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata

_PREFIX = 15

_BLOCK_SQL = f"""
    er_c AS (
      SELECT c_custkey, c_name, c_nationkey,
             substr(c_name, 1, {_PREFIX}) AS blk
      FROM customer),
    er_pairs AS (
      SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
             a.c_name AS name_a, b.c_name AS name_b,
             levenshtein(a.c_name, b.c_name) AS lev
      FROM er_c a JOIN er_c b
        ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
       AND a.c_custkey < b.c_custkey)
"""


def _pairs(spark: SparkSession, sf_dir: str, max_lev: int) -> DataFrame:
    from home_credit_data_engineering_spark.operators.linkage import (
        blocked_pairs,
        score_name_pairs,
    )

    cust = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.substring("c_name", 1, _PREFIX).alias("blk"),
    )
    pairs = blocked_pairs(
        cust,
        id_col="c_custkey",
        block_cols=["c_nationkey", "blk"],
        carry_cols=["c_name"],
        max_block_rows=100_000,
    )
    # Thresholded comparator: the banded DP rejects non-matches in
    # O(max_lev·len); surviving rows carry the exact distance, so the
    # result set equals the unbounded lev <= max_lev filter the oracle
    # writes.
    return score_name_pairs(pairs, "c_name_a", "c_name_b", max_lev=max_lev)


def _match_edges(spark: SparkSession, sf_dir: str, max_lev: int) -> DataFrame:
    """Connectivity-equivalent match EDGES for the CC-consuming queries
    (er_resolved_entities, er_entity_safe_split) — r14 optimization:
    their outputs depend on the match graph only through its CONNECTED
    COMPONENTS, so the collapse-exact-first edge builder
    (operators/linkage.py:collapsed_match_edges) replaces the full
    blocked pair set with star edges per verbatim-duplicate (block,
    name) group plus one rep-level scored edge per matching group pair
    — same components, labels and sizes (the shared recursive-CTE
    oracle is the proof), at a d² smaller lev budget under the
    10×-replica duplication regime (30.7M → ~0.3M comparator pairs).
    Pair-OUTPUT queries (er_candidate_pairs, er_fellegi_sunter) keep
    the direct :func:`_pairs` path."""
    from home_credit_data_engineering_spark.operators.linkage import (
        collapsed_match_edges,
    )

    cust = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.substring("c_name", 1, _PREFIX).alias("blk"),
    )
    return collapsed_match_edges(
        cust,
        id_col="c_custkey",
        block_cols=["c_nationkey", "blk"],
        name_col="c_name",
        max_lev=max_lev,
        max_block_rows=100_000,
    )


@register(
    "er_candidate_pairs",
    oracle=f"""
    WITH {_BLOCK_SQL}
    SELECT custkey_a, custkey_b, lev,
           ROUND(1.0 - lev / CAST(GREATEST(length(name_a), length(name_b))
                                  AS DOUBLE), 6) AS name_sim
    FROM er_pairs WHERE lev <= 2
    """,
    operators=("ER-ext:blocking",),
    doc="Record-linkage candidate generation (operators/linkage.py:"
    "blocked_pairs + score_name_pairs): within-block self-join on "
    "(c_nationkey, 15-char name prefix) with id_a < id_b, JVM-codegen "
    "levenshtein + normalized name similarity, lev <= 2 match filter. "
    "Pair budget is sum(|block|^2)/2 — the blocking key, not the table "
    "size, dials the cost; max_block_rows guards the quadratic path.",
)
def er_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pairs(spark, sf_dir, max_lev=2).select(
        F.col("c_custkey_a").alias("custkey_a"),
        F.col("c_custkey_b").alias("custkey_b"),
        "lev",
        "name_sim",
    )


@register(
    "er_sorted_neighborhood",
    oracle="""
    WITH snm AS (
      SELECT c_custkey, c_name,
             ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS pos
      FROM customer)
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           b.pos - a.pos AS pos_gap,
           levenshtein(a.c_name, b.c_name) AS lev,
           ROUND(1.0 - levenshtein(a.c_name, b.c_name)
                 / CAST(GREATEST(length(a.c_name), length(b.c_name))
                        AS DOUBLE), 6) AS name_sim,
           ROUND(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw_sim
    FROM snm a JOIN snm b ON b.pos > a.pos AND b.pos - a.pos < 8
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
    operators=("ER-ext:sorted_neighborhood", "ER-ext:jaro_winkler"),
    doc="Sorted-neighborhood candidate generation (operators/linkage.py:"
    "sorted_neighborhood_pairs; Hernandez & Stolfo SIGMOD'95): global "
    "(c_name, c_custkey) sort order via a TWO-LEVEL sharded row number "
    "(prefix-monotone range shards + broadcast base offsets — no global "
    "window, no single-task sort), window-8 neighbor pairing as an "
    "equi-join on floor(pos/8) bands (adjacent-band trick: linear "
    "(w-1)*n pair budget), then codegen levenshtein scoring plus an "
    "Arrow-batched Jaro-Winkler comparator (operators/linkage.py:"
    "jaro_winkler_pairs — standard p=0.1/4-char/0.7-threshold form, "
    "bit-exact vs DuckDB's jaro_winkler_similarity). The oracle is the "
    "shard-blind single-window ROW_NUMBER form, certifying the "
    "two-level position is bit-equal to the global sort.",
)
def er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.linkage import (
        jaro_winkler_pairs,
        score_name_pairs,
        sorted_neighborhood_pairs,
    )

    cust = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    pairs = sorted_neighborhood_pairs(
        cust,
        id_col="c_custkey",
        key_col="c_name",
        window=8,
        shard_prefix_len=16,
        carry_cols=["c_name"],
    )
    scored = score_name_pairs(pairs, "c_name_a", "c_name_b", max_lev=2)
    return jaro_winkler_pairs(scored, "c_name_a", "c_name_b").select(
        F.col("c_custkey_a").alias("custkey_a"),
        F.col("c_custkey_b").alias("custkey_b"),
        "pos_gap",
        "lev",
        "name_sim",
        F.round(F.col("jw_sim"), 6).alias("jw_sim"),
    )


@register(
    "er_resolved_entities",
    oracle=f"""
    WITH RECURSIVE {_BLOCK_SQL},
    er_match AS (
      SELECT custkey_a AS a, custkey_b AS b FROM er_pairs WHERE lev <= 1),
    er_edges AS (
      SELECT a, b FROM er_match UNION SELECT b AS a, a AS b FROM er_match),
    er_reach(node, r) AS (
      SELECT c_custkey, c_custkey FROM er_c
      UNION
      SELECT er_reach.node, e.b FROM er_reach JOIN er_edges e
        ON er_reach.r = e.a),
    er_lab AS (
      SELECT node AS c_custkey, MIN(r) AS entity_id
      FROM er_reach GROUP BY node),
    er_sz AS (
      SELECT entity_id, COUNT(*) AS entity_size FROM er_lab GROUP BY 1)
    SELECT l.c_custkey, l.entity_id, s.entity_size, c.c_name AS canonical_name
    FROM er_lab l
    JOIN er_sz s ON l.entity_id = s.entity_id
    JOIN customer c ON l.entity_id = c.c_custkey
    """,
    operators=("ER-ext:blocking", "ER-ext:resolve"),
    doc="Entity resolution end-to-end (operators/linkage.py:"
    "resolve_entities): lev <= 1 matches within (nation, name-prefix) "
    "blocks become an undirected match graph; entities are its connected "
    "components via the alternating-star algorithm (ids-only loop "
    "frames, O(log^2 n) rounds), labeled by the component's minimum "
    "custkey — the survivor record, whose name joins back as "
    "canonical_name. The DuckDB oracle computes the exact recursive "
    "transitive closure with min-over-reachable labels, so the "
    "hash-compare certifies the distributed CC against a literal "
    "fixpoint definition.",
)
def er_resolved_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.linkage import (
        resolve_entities,
    )

    cust = read_testdata(spark, sf_dir, "customer")
    matches = _match_edges(spark, sf_dir, max_lev=1)
    resolved = resolve_entities(
        cust, matches, "c_custkey", "c_custkey_a", "c_custkey_b"
    )
    canon = cust.select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("canonical_name"),
    )
    return resolved.join(canon, on="entity_id").select(
        "c_custkey", "entity_id", "entity_size", "canonical_name"
    )


@register(
    "er_entity_safe_split",
    oracle=f"""
    WITH RECURSIVE {_BLOCK_SQL},
    ess_match AS (
      SELECT custkey_a AS a, custkey_b AS b FROM er_pairs WHERE lev <= 1),
    ess_edges AS (
      SELECT a, b FROM ess_match UNION SELECT b AS a, a AS b FROM ess_match),
    ess_reach(node, r) AS (
      SELECT c_custkey, c_custkey FROM er_c
      UNION
      SELECT ess_reach.node, e.b FROM ess_reach JOIN ess_edges e
        ON ess_reach.r = e.a),
    ess_lab AS (
      SELECT node AS c_custkey, MIN(r) AS entity_id
      FROM ess_reach GROUP BY node)
    SELECT c_custkey, entity_id,
           CASE WHEN b < 8000 THEN 'train'
                WHEN b < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT c_custkey, entity_id,
             CAST('0x' || substr(md5(CAST(entity_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 10000 AS b
      FROM ess_lab) t
    """,
    operators=("ER-ext:resolve", "S-ext:hash-split"),
    doc="Leakage-safe 80/10/10 split (operators/linkage.py:"
    "entity_safe_split): records are assigned to train/val/test by their "
    "RESOLVED ENTITY's md5 bucket, so near-duplicates never straddle "
    "train and test — the reason training pipelines resolve entities "
    "before splitting. Pure composition of two driver-verified "
    "operators (star-CC resolution + deterministic hash split); the "
    "oracle recomputes the closure AND the buckets, verifying the "
    "assignment itself.",
)
def er_entity_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.linkage import (
        entity_safe_split,
    )

    cust = read_testdata(spark, sf_dir, "customer")
    matches = _match_edges(spark, sf_dir, max_lev=1)
    return entity_safe_split(
        cust,
        matches,
        "c_custkey",
        "c_custkey_a",
        "c_custkey_b",
        [("train", 0.8), ("val", 0.1), ("test", 0.1)],
    )


def _fs_weights() -> dict[str, tuple[float, float]]:
    """(m, u) per agreement attribute — shared by the Spark build and the
    SQL literal interpolation below so both engines parse the exact same
    doubles."""
    return {"name": (0.9, 0.05), "segment": (0.95, 0.2), "acctbal": (0.8, 0.1)}


def _fs_sql_terms() -> str:
    import math

    parts = []
    conds = {
        "name": "lev <= 1",
        "segment": "seg_a = seg_b",
        "acctbal": "ABS(bal_a - bal_b) < 500.0",
    }
    for name, (m, u) in _fs_weights().items():
        aw = repr(math.log2(m / u))
        dw = repr(math.log2((1.0 - m) / (1.0 - u)))
        parts.append(f"CASE WHEN {conds[name]} THEN {aw} ELSE {dw} END")
    return " + ".join(parts)


@register(
    "er_fellegi_sunter",
    oracle=f"""
    WITH fs_c AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal,
             substr(c_name, 1, {_PREFIX}) AS blk
      FROM customer),
    fs_pairs AS (
      SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
             levenshtein(a.c_name, b.c_name) AS lev,
             a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
             a.c_acctbal AS bal_a, b.c_acctbal AS bal_b
      FROM fs_c a JOIN fs_c b
        ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
       AND a.c_custkey < b.c_custkey),
    fs_scored AS (
      SELECT custkey_a, custkey_b,
             lev <= 1 AS agree_name,
             seg_a = seg_b AS agree_segment,
             ABS(bal_a - bal_b) < 500.0 AS agree_acctbal,
             ROUND({_fs_sql_terms()}, 6) AS fs_score
      FROM fs_pairs)
    SELECT custkey_a, custkey_b, agree_name, agree_segment, agree_acctbal,
           fs_score,
           CASE WHEN fs_score >= 4.0 THEN 'match'
                WHEN fs_score >= 0.0 THEN 'possible'
                ELSE 'nonmatch' END AS decision
    FROM fs_scored
    WHERE fs_score >= 0.0
    """,
    operators=("ER-ext:fellegi_sunter",),
    doc="Fellegi-Sunter probabilistic linkage (operators/linkage.py:"
    "fellegi_sunter_score; JASA 1969): per-attribute agreement weights "
    "log2(m/u) / log2((1-m)/(1-u)) over name (lev<=1), market segment "
    "equality, and account-balance proximity, summed left-to-right as "
    "one codegen expression, plus the classical three-way "
    "match/possible/nonmatch decision bands. Weights are exact Python "
    "doubles interpolated via repr() into the oracle, so both engines "
    "sum identical IEEE literals in identical order — a probabilistic "
    "scoring model that is nonetheless hash-exact cross-engine.",
)
def er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.linkage import (
        blocked_pairs,
        fellegi_sunter_score,
        fs_decision,
    )

    w = _fs_weights()
    cust = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        "c_acctbal",
        F.substring("c_name", 1, _PREFIX).alias("blk"),
    )
    pairs = blocked_pairs(
        cust,
        id_col="c_custkey",
        block_cols=["c_nationkey", "blk"],
        carry_cols=["c_name", "c_mktsegment", "c_acctbal"],
        max_block_rows=100_000,
    )
    scored = fellegi_sunter_score(
        pairs,
        [
            (
                "name",
                F.levenshtein(F.col("c_name_a"), F.col("c_name_b")) <= 1,
                *w["name"],
            ),
            (
                "segment",
                F.col("c_mktsegment_a") == F.col("c_mktsegment_b"),
                *w["segment"],
            ),
            (
                "acctbal",
                F.abs(F.col("c_acctbal_a") - F.col("c_acctbal_b"))
                < F.lit(500.0),
                *w["acctbal"],
            ),
        ],
    )
    return scored.filter(F.col("fs_score") >= 0.0).select(
        F.col("c_custkey_a").alias("custkey_a"),
        F.col("c_custkey_b").alias("custkey_b"),
        "agree_name",
        "agree_segment",
        "agree_acctbal",
        "fs_score",
        fs_decision(F.col("fs_score"), upper=4.0, lower=0.0).alias(
            "decision"
        ),
    )


@register(
    "er_blocking_quality",
    oracle=f"""
    WITH bq_c AS (
      SELECT c_custkey, c_name, c_nationkey,
             substr(c_name, 1, {_PREFIX}) AS blk
      FROM customer),
    bq_n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM bq_c),
    bq_blocked AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM bq_c a JOIN bq_c b
        ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
       AND a.c_custkey < b.c_custkey),
    bq_pos AS (
      SELECT c_custkey,
             ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS pos
      FROM bq_c),
    bq_snm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM bq_pos a JOIN bq_pos b
        ON b.pos > a.pos AND b.pos - a.pos < 8)
    SELECT 'blocked' AS generator, n_pairs,
           ROUND(n_pairs / (n.n * (n.n - 1) / 2), 9) AS pair_fraction
    FROM bq_blocked CROSS JOIN bq_n n
    UNION ALL
    SELECT 'snm' AS generator, n_pairs,
           ROUND(n_pairs / (n.n * (n.n - 1) / 2), 9) AS pair_fraction
    FROM bq_snm CROSS JOIN bq_n n
    """,
    operators=("ER-ext:blocking", "ER-ext:sorted_neighborhood"),
    doc="Blocking-quality audit: candidate-pair counts and the pair "
    "fraction (generated pairs / C(n,2) — 1 minus the classical "
    "reduction ratio) for BOTH generators over the same records. The "
    "observability a production linker tunes its block keys with: at "
    "100 TB this is two count aggregates over the metadata-only pair "
    "streams, and a fraction drifting toward 1 is the quadratic "
    "explosion the max_block_rows guard exists to stop.",
)
def er_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.linkage import (
        blocked_pairs,
        sorted_neighborhood_pairs,
    )

    cust = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.substring("c_name", 1, _PREFIX).alias("blk"),
    )
    n = cust.count()
    denom = float(n) * (n - 1) / 2.0
    blocked = blocked_pairs(
        cust, id_col="c_custkey", block_cols=["c_nationkey", "blk"]
    )
    snm = sorted_neighborhood_pairs(
        cust,
        id_col="c_custkey",
        key_col="c_name",
        window=8,
        shard_prefix_len=16,
    )

    def leg(name: str, pairs: DataFrame) -> DataFrame:
        return pairs.agg(
            F.lit(name).alias("generator"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.count(F.lit(1)) / F.lit(denom), 9).alias(
                "pair_fraction"
            ),
        ).select("generator", "n_pairs", "pair_fraction")

    return leg("blocked", blocked).unionByName(leg("snm", snm))
