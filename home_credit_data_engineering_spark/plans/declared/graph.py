"""Graph-analytics declared queries (PageRank over TPC-H's trade graph).

The SQL twin unrolls the same fixed-iteration power method the Spark
operator runs (``operators/graph.py:pagerank``) — per-edge contributions
round to 9 and accumulate as DECIMAL(18,9), each new rank is one fixed
double formula rounded to 9, so both engines produce bit-identical
ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata


def pagerank_sql_ctes(
    edges_cte: str, iterations: int = 3, damping: float = 0.85
) -> str:
    """Unrolled-iteration PageRank CTE chain over ``edges_cte(src, dst)``.

    Final relation: ``pr_r{iterations}(node, deg, rank)``. The damping
    literals are interpolated via ``repr()`` so both engines parse the
    exact double the Spark operator uses (``1.0 - damping`` in IEEE is
    NOT the literal ``0.15``).
    """
    omd, d = repr(1.0 - damping), repr(damping)
    parts = [
        f"""
    pr_deg AS (SELECT src AS node, COUNT(*) AS deg FROM {edges_cte} GROUP BY 1),
    pr_nodes AS (
      -- DISTINCT-over-UNION-ALL, not a bare UNION: inside a WITH
      -- RECURSIVE block DuckDB treats ANY top-level-UNION CTE with
      -- recursive (append) semantics, silently dropping the dedup —
      -- combo_dedup_near hosts this chain under WITH RECURSIVE.
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM {edges_cte}
        UNION ALL SELECT dst FROM {edges_cte}) pr_n),
    pr_base AS (SELECT n.node, COALESCE(d.deg, 0) AS deg
                FROM pr_nodes n LEFT JOIN pr_deg d USING (node)),
    pr_stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pr_base),
    pr_r0 AS (SELECT node, deg, ROUND(1.0 / s.n, 9) AS rank
              FROM pr_base CROSS JOIN pr_stats s)"""
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f""",
    pr_c{k} AS (
      SELECT e.dst AS node,
             CAST(ROUND(r.rank / r.deg, 9) AS DECIMAL(18,9)) AS c
      FROM {edges_cte} e JOIN pr_r{p} r ON e.src = r.node),
    pr_recv{k} AS (SELECT node, SUM(c) AS s FROM pr_c{k} GROUP BY 1),
    pr_dang{k} AS (
      SELECT COALESCE(SUM(CAST(ROUND(rank, 9) AS DECIMAL(18,9))),
                      CAST(0 AS DECIMAL(18,9))) AS dg
      FROM pr_r{p} WHERE deg = 0),
    pr_r{k} AS (
      SELECT b.node, b.deg,
             ROUND({omd} / s.n + {d} * (CAST(COALESCE(v.s, 0) AS DOUBLE)
                   + CAST(g.dg AS DOUBLE) / s.n), 9) AS rank
      FROM pr_base b LEFT JOIN pr_recv{k} v USING (node)
      CROSS JOIN pr_stats s CROSS JOIN pr_dang{k} g)"""
        )
    return "".join(parts)


@register(
    "graph_pagerank",
    oracle=f"""
    WITH pr_edges AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
             'c' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    {pagerank_sql_ctes("pr_edges", iterations=3, damping=0.85)}
    SELECT node, rank FROM pr_r3
    """,
    operators=("G-ext:pagerank",),
    doc="Fixed-iteration PageRank (operators/graph.py:pagerank; 3 "
    "iterations, damping 0.85, dangling-mass redistribution) over the "
    "supplier->customer trade graph (distinct ship edges from "
    "lineitem x orders; customers are dangling sinks, exercising the "
    "redistribution term). Ranks and degrees are (node, number) pairs "
    "through every iteration — one equi-join + one aggregate per round, "
    "the Pregel schedule expressed relationally; DECIMAL(18,9) "
    "contribution sums make the result hash-identical to the unrolled "
    "SQL power method.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.graph import pagerank

    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    return pagerank(edges, iterations=3, damping=0.85).select("node", "rank")


def wpr_sql_ctes(
    edges_cte: str, iterations: int = 3, damping: float = 0.85
) -> str:
    """Unrolled WEIGHTED PageRank CTE chain over
    ``edges_cte(src, dst, weight)``: follow ratio
    ``round(w / W(src), 9)`` with W the exact DECIMAL(18,6) out-weight
    sum, contributions ``round(rank * ratio, 9)`` — the exact
    arithmetic ``operators/graph.py:pagerank(edge_weight_col=...)``
    runs. Final relation: ``wp_r{iterations}(node, deg, rank)``."""
    omd, d = repr(1.0 - damping), repr(damping)
    parts = [
        f"""
    wp_wt AS (SELECT src, SUM(CAST(weight AS DECIMAL(18,6))) AS wt
              FROM {edges_cte} GROUP BY 1),
    wp_e AS MATERIALIZED (
      SELECT w.src, w.dst,
             ROUND(CAST(CAST(w.weight AS DECIMAL(18,6)) AS DOUBLE)
                   / CAST(t.wt AS DOUBLE), 9) AS ratio
      FROM {edges_cte} w JOIN wp_wt t USING (src)),
    wp_deg AS (SELECT src AS node, COUNT(*) AS deg FROM wp_e GROUP BY 1),
    wp_nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM wp_e
        UNION ALL SELECT dst FROM wp_e) wp_n),
    wp_base AS (SELECT n.node, COALESCE(d.deg, 0) AS deg
                FROM wp_nodes n LEFT JOIN wp_deg d USING (node)),
    wp_stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM wp_base),
    wp_r0 AS (SELECT node, deg, ROUND(1.0 / s.n, 9) AS rank
              FROM wp_base CROSS JOIN wp_stats s)"""
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f""",
    wp_c{k} AS (
      SELECT e.dst AS node,
             CAST(ROUND(r.rank * e.ratio, 9) AS DECIMAL(18,9)) AS c
      FROM wp_e e JOIN wp_r{p} r ON e.src = r.node),
    wp_recv{k} AS (SELECT node, SUM(c) AS s FROM wp_c{k} GROUP BY 1),
    wp_dang{k} AS (
      SELECT COALESCE(SUM(CAST(ROUND(rank, 9) AS DECIMAL(18,9))),
                      CAST(0 AS DECIMAL(18,9))) AS dg
      FROM wp_r{p} WHERE deg = 0),
    wp_r{k} AS (
      SELECT b.node, b.deg,
             ROUND({omd} / s.n + {d} * (CAST(COALESCE(v.s, 0) AS DOUBLE)
                   + CAST(g.dg AS DOUBLE) / s.n), 9) AS rank
      FROM wp_base b LEFT JOIN wp_recv{k} v USING (node)
      CROSS JOIN wp_stats s CROSS JOIN wp_dang{k} g)"""
        )
    return "".join(parts)


@register(
    "graph_pagerank_weighted",
    oracle=f"""
    WITH wp_edges AS (
      SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
             'c' || CAST(o_custkey AS VARCHAR) AS dst,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS weight
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    {wpr_sql_ctes("wp_edges", iterations=3, damping=0.85)}
    SELECT node, rank FROM wp_r3
    """,
    operators=("G-ext:pagerank",),
    doc="WEIGHTED PageRank (operators/graph.py:pagerank with "
    "edge_weight_col): the random surfer follows supplier->customer "
    "edges proportionally to TRADE VOLUME (sum of shipped quantity per "
    "pair), not uniformly — the volume-weighted systemic-importance "
    "ranking. Follow ratios are one round-9 double divide of exact "
    "DECIMAL(18,6) out-weight sums, precomputed once outside the loop "
    "and persisted; per-iteration shape is identical to graph_pagerank "
    "(one equi-join + one decimal aggregate). Hash-identical to the "
    "unrolled weighted SQL twin.",
)
def graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.graph import pagerank

    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    orders = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "dst"
            ),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("weight")
        )
    )
    return pagerank(
        edges, iterations=3, damping=0.85, edge_weight_col="weight"
    ).select("node", "rank")


def ppr_sql_ctes(
    edges_cte: str,
    pers_cte: str,
    iterations: int = 3,
    damping: float = 0.85,
) -> str:
    """Unrolled PERSONALIZED PageRank CTE chain over
    ``edges_cte(src, dst)`` with teleport weights ``pers_cte(node, w)``
    (Page et al. 1998 §6): ``p(v) = round(w/Σw, 9)`` (absent → 0),
    ``r0 = p``, ``r' = (1-d)·p + d·(Σ contrib + D·p)`` — the exact
    arithmetic ``operators/graph.py:pagerank(personalization=...)``
    runs. Final relation: ``pp_r{iterations}(node, deg, p, rank)``."""
    omd, d = repr(1.0 - damping), repr(damping)
    parts = [
        f"""
    pp_deg AS (SELECT src AS node, COUNT(*) AS deg FROM {edges_cte} GROUP BY 1),
    pp_nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM {edges_cte}
        UNION ALL SELECT dst FROM {edges_cte}) pp_n),
    pp_wt AS (SELECT CAST(SUM(w) AS DOUBLE) AS wt FROM {pers_cte}),
    pp_base AS (
      SELECT n.node, COALESCE(d.deg, 0) AS deg,
             ROUND(COALESCE(p.w, 0.0) / t.wt, 9) AS p
      FROM pp_nodes n
      LEFT JOIN pp_deg d USING (node)
      LEFT JOIN {pers_cte} p USING (node)
      CROSS JOIN pp_wt t),
    pp_r0 AS (SELECT node, deg, p, p AS rank FROM pp_base)"""
    ]
    for k in range(1, iterations + 1):
        prev = k - 1
        parts.append(
            f""",
    pp_c{k} AS (
      SELECT e.dst AS node,
             CAST(ROUND(r.rank / r.deg, 9) AS DECIMAL(18,9)) AS c
      FROM {edges_cte} e JOIN pp_r{prev} r ON e.src = r.node),
    pp_recv{k} AS (SELECT node, SUM(c) AS s FROM pp_c{k} GROUP BY 1),
    pp_dang{k} AS (
      SELECT COALESCE(SUM(CAST(ROUND(rank, 9) AS DECIMAL(18,9))),
                      CAST(0 AS DECIMAL(18,9))) AS dg
      FROM pp_r{prev} WHERE deg = 0),
    pp_r{k} AS (
      SELECT b.node, b.deg, b.p,
             ROUND({omd} * b.p + {d} * (CAST(COALESCE(v.s, 0) AS DOUBLE)
                   + CAST(g.dg AS DOUBLE) * b.p), 9) AS rank
      FROM pp_base b LEFT JOIN pp_recv{k} v USING (node)
      CROSS JOIN pp_dang{k} g)"""
        )
    return "".join(parts)


@register(
    "graph_pagerank_personalized",
    oracle=f"""
    WITH pr_edges AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
             'c' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    pp_pers AS (SELECT DISTINCT src AS node, 1.0 AS w FROM pr_edges),
    {ppr_sql_ctes("pr_edges", "pp_pers", iterations=3, damping=0.85)}
    SELECT node, rank FROM pp_r3
    """,
    operators=("G-ext:ppr",),
    doc="PERSONALIZED PageRank (operators/graph.py:pagerank with a "
    "teleport vector; random walk with restart — the "
    "representative-selection / related-entity form): teleport mass "
    "uniform over SUPPLIER nodes only, so customers hold rank purely "
    "through walk flow and all restart+dangling mass returns to the "
    "supplier side. Same per-iteration shape as graph_pagerank (one "
    "equi-join + one aggregate, (node, number) frames, exact-decimal "
    "sums) with p riding the base frame; hash-identical to the "
    "unrolled SQL twin. The operator also takes tol= for an early-stop "
    "driver check (one scalar per round) — fixed-n here for the "
    "oracle.",
)
def graph_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.graph import pagerank

    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    pers = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return pagerank(
        edges, iterations=3, damping=0.85, personalization=pers
    ).select("node", "rank")


def hits_sql_ctes(edges_cte: str, iterations: int = 3) -> str:
    """Unrolled HITS CTE chain over ``edges_cte(src, dst)``. Final
    relations: ``ht_h{iterations}(node, hub)`` and
    ``ht_a{iterations}(node, authority)``."""
    parts = [
        f"""
    ht_nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM {edges_cte}
        UNION ALL SELECT dst FROM {edges_cte}) ht_n0),
    ht_n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM ht_nodes),
    ht_h0 AS (SELECT node, ROUND(1.0 / s.n, 9) AS hub
              FROM ht_nodes CROSS JOIN ht_n s)"""
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f""",
    ht_a{k}_raw AS (
      SELECT e.dst AS node,
             SUM(CAST(ROUND(h.hub, 9) AS DECIMAL(18,9))) AS raw
      FROM {edges_cte} e JOIN ht_h{p} h ON e.src = h.node GROUP BY 1),
    ht_a{k}_tot AS (
      SELECT COALESCE(SUM(raw), CAST(0 AS DECIMAL(18,9))) AS tot
      FROM ht_a{k}_raw),
    ht_a{k} AS (
      SELECT n.node,
             ROUND(CAST(COALESCE(r.raw, 0) AS DOUBLE)
                   / CAST(t.tot AS DOUBLE), 9) AS authority
      FROM ht_nodes n LEFT JOIN ht_a{k}_raw r USING (node)
      CROSS JOIN ht_a{k}_tot t),
    ht_h{k}_raw AS (
      SELECT e.src AS node,
             SUM(CAST(ROUND(a.authority, 9) AS DECIMAL(18,9))) AS raw
      FROM {edges_cte} e JOIN ht_a{k} a ON e.dst = a.node GROUP BY 1),
    ht_h{k}_tot AS (
      SELECT COALESCE(SUM(raw), CAST(0 AS DECIMAL(18,9))) AS tot
      FROM ht_h{k}_raw),
    ht_h{k} AS (
      SELECT n.node,
             ROUND(CAST(COALESCE(r.raw, 0) AS DOUBLE)
                   / CAST(t.tot AS DOUBLE), 9) AS hub
      FROM ht_nodes n LEFT JOIN ht_h{k}_raw r USING (node)
      CROSS JOIN ht_h{k}_tot t)"""
        )
    return "".join(parts)


@register(
    "graph_hits",
    oracle=f"""
    WITH pr_edges AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
             'c' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    {hits_sql_ctes("pr_edges", iterations=3)}
    SELECT h.node, h.hub, a.authority
    FROM ht_h3 h JOIN ht_a3 a USING (node)
    """,
    operators=("G-ext:hits",),
    doc="Fixed-iteration HITS (operators/graph.py:hits; Kleinberg JACM "
    "1999) over the supplier->customer trade graph: suppliers are pure "
    "hubs, customers pure authorities (bipartite), L1-normalized each "
    "half-step. Same exact-decimal/fixed-formula discipline as "
    "graph_pagerank, so both engines produce bit-identical scores.",
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.graph import hits

    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    return hits(edges, iterations=3).select("node", "hub", "authority")


def sssp_sql_ctes(
    edges_cte: str, sources_cte: str, iterations: int = 4
) -> str:
    """Unrolled multi-source shortest-path CTE chain over
    ``edges_cte(src, dst, w DECIMAL(18,6))`` and ``sources_cte(node)``
    — synchronous Bellman-Ford rounds with explicit NULL-handling CASE
    relaxation, the exact arithmetic
    ``operators/graph.py:shortest_paths`` runs (DECIMAL(18,6) sums, no
    rounding anywhere). Final relation: ``sp_d{iterations}(node, dist)``
    with dist NULL for nodes unreached within ``iterations`` hops."""
    parts = [
        f"""
    sp_nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM {edges_cte}
        UNION ALL SELECT dst FROM {edges_cte}
        UNION ALL SELECT node FROM {sources_cte}) sp_n),
    sp_d0 AS (
      SELECT n.node,
             CASE WHEN s.node IS NOT NULL
                  THEN CAST(0 AS DECIMAL(18,6)) END AS dist
      FROM sp_nodes n
      LEFT JOIN (SELECT DISTINCT node FROM {sources_cte}) s USING (node))"""
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f""",
    sp_c{k} AS (
      SELECT e.dst AS node, CAST(d.dist + e.w AS DECIMAL(18,6)) AS nd
      FROM {edges_cte} e JOIN sp_d{p} d ON e.src = d.node
      WHERE d.dist IS NOT NULL),
    sp_m{k} AS (SELECT node, MIN(nd) AS nd FROM sp_c{k} GROUP BY 1),
    sp_d{k} AS MATERIALIZED (
      SELECT d.node,
             CASE WHEN m.nd IS NULL THEN d.dist
                  WHEN d.dist IS NULL OR m.nd < d.dist THEN m.nd
                  ELSE d.dist END AS dist
      FROM sp_d{p} d LEFT JOIN sp_m{k} m USING (node))"""
        )
    return "".join(parts)


def lp_sql_ctes(edges_cte: str, iterations: int = 3) -> str:
    """Unrolled deterministic label-propagation CTE chain over
    ``edges_cte(src, dst)`` — synchronous plurality vote, ties to the
    smallest label, exactly what
    ``operators/graph.py:label_propagation`` runs. Final relation:
    ``lp_r{iterations}(node, label)``."""
    parts = [
        f"""
    lp_nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM {edges_cte}
        UNION ALL SELECT dst FROM {edges_cte}) lp_n),
    lp_r0 AS (SELECT node, node AS label FROM lp_nodes)"""
    ]
    for k in range(1, iterations + 1):
        p = k - 1
        parts.append(
            f""",
    lp_cnt{k} AS (
      SELECT e.dst AS node, r.label, COUNT(*) AS c
      FROM {edges_cte} e JOIN lp_r{p} r ON e.src = r.node
      GROUP BY 1, 2),
    lp_best{k} AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (
                 PARTITION BY node ORDER BY c DESC, label) AS rn
        FROM lp_cnt{k}) lp_q{k}
      WHERE rn = 1),
    lp_r{k} AS MATERIALIZED (
      SELECT r.node, COALESCE(b.label, r.label) AS label
      FROM lp_r{p} r LEFT JOIN lp_best{k} b USING (node))"""
        )
    return "".join(parts)


def tri_sql_ctes(edges_cte: str) -> str:
    """Per-node triangle-count CTE chain over ``edges_cte(src, dst)``
    (any direction/duplication; canonicalized internally) mirroring
    ``operators/graph.py:triangle_count``. Final relation:
    ``tri_out(node, triangles)``."""
    return f"""
    tri_und AS MATERIALIZED (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM {edges_cte} WHERE src <> dst),
    tri_t AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM tri_und e1
      JOIN tri_und e2 ON e1.b = e2.a
      JOIN tri_und e3 ON e3.a = e1.a AND e3.b = e2.b),
    tri_nodes AS (
      SELECT DISTINCT node FROM (
        SELECT a AS node FROM tri_und
        UNION ALL SELECT b FROM tri_und) tri_n),
    tri_per AS (
      SELECT node, COUNT(*) AS triangles FROM (
        SELECT a AS node FROM tri_t
        UNION ALL SELECT b FROM tri_t
        UNION ALL SELECT c FROM tri_t) tri_p
      GROUP BY 1),
    tri_out AS (
      SELECT n.node, CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles
      FROM tri_nodes n LEFT JOIN tri_per p USING (node))"""


#: Co-supplier co-occurrence edges: suppliers that shipped line items of
#: the SAME order — the entity-co-occurrence graph construction every
#: knowledge-graph/fraud pipeline runs, and (unlike the bipartite trade
#: graph) it has triangles. Canonical a<b pairs.
_COSUP_SQL = """
      SELECT DISTINCT l1.l_suppkey AS src, l2.l_suppkey AS dst
      FROM lineitem l1
      JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
       AND l1.l_suppkey < l2.l_suppkey"""


def _cosupplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("dst")
    )
    return (
        li.join(
            l2,
            (li["l_orderkey"] == l2["__ok"]) & (li["l_suppkey"] < l2["dst"]),
        )
        .select(F.col("l_suppkey").alias("src"), "dst")
        .distinct()
    )


@register(
    "graph_shortest_paths",
    oracle=f"""
    WITH sp_canon AS ({_COSUP_SQL}),
    sp_edges AS (
      SELECT src, dst, CAST(1 AS DECIMAL(18,6)) AS w FROM sp_canon
      UNION ALL
      SELECT dst AS src, src AS dst, CAST(1 AS DECIMAL(18,6)) AS w
      FROM sp_canon),
    sp_src AS (
      SELECT s_suppkey AS node FROM supplier WHERE s_nationkey = 0),
    {sssp_sql_ctes("sp_edges", "sp_src", iterations=4)}
    SELECT node, CAST(dist AS DOUBLE) AS dist FROM sp_d4
    """,
    operators=("G-ext:sssp",),
    doc="Multi-source BFS / shortest paths "
    "(operators/graph.py:shortest_paths): hop distance from the "
    "nation-0 supplier cohort over the symmetrized co-supplier "
    "co-occurrence graph, 4 synchronous Bellman-Ford rounds — per round "
    "one equi-join (edges x settled frontier) + one MIN aggregate + one "
    "left-join merge, (node, number) frames only, localCheckpoint per "
    "round. Distances are exact DECIMAL(18,6) sums with CASE-based "
    "relaxation (no engine-variant LEAST-with-NULL semantics), so the "
    "unrolled DuckDB twin is hash-identical; unreached nodes carry "
    "NULL. The k-hop-neighborhood / influence-radius primitive.",
)
def graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.graph import (
        shortest_paths,
    )

    canon = _cosupplier_edges(spark, sf_dir)
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sources = (
        read_testdata(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 0)
        .select(F.col("s_suppkey").alias("node"))
    )
    # double output (exact: IEEE nearest of the same exact decimal on
    # both engines) — NULL decimals normalize differently across the
    # DuckDB/Spark pandas bridges, NaN doubles identically
    return shortest_paths(sym, sources, iterations=4).select(
        "node", F.col("dist").cast("double").alias("dist")
    )


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH tri_edges AS ({_COSUP_SQL}),
    {tri_sql_ctes("tri_edges")}
    SELECT node, triangles FROM tri_out
    """,
    operators=("G-ext:triangles",),
    doc="Per-node triangle counts (operators/graph.py:triangle_count) "
    "over the co-supplier co-occurrence graph (suppliers sharing an "
    "order): id-ordered canonical edges, wedge closure via two "
    "single-key equi-joins — each triangle enumerated exactly once as "
    "a<b<c, no cartesian, no post-hoc distinct; triangle-free nodes "
    "emit 0. The clustering-coefficient / community-density primitive. "
    "Exact twin.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.graph import (
        triangle_count,
    )

    return triangle_count(_cosupplier_edges(spark, sf_dir)).select(
        "node", "triangles"
    )


@register(
    "graph_label_propagation",
    oracle=f"""
    WITH lp_canon AS ({_COSUP_SQL}),
    lp_edges AS (
      SELECT src, dst FROM lp_canon
      UNION ALL SELECT dst AS src, src AS dst FROM lp_canon),
    {lp_sql_ctes("lp_edges", iterations=3)}
    SELECT node, label FROM lp_r3
    """,
    operators=("G-ext:labelprop",),
    doc="Deterministic label propagation "
    "(operators/graph.py:label_propagation; Raghavan et al. 2007 with "
    "synchronous updates + smallest-label tie-breaks so the labeling "
    "is engine-portable) over the symmetrized co-supplier graph, 3 "
    "rounds: per iteration one (node,label) equi-join, one plurality "
    "count aggregate, one struct-min argmax. Community detection as "
    "the same Pregel-as-relational schedule as PageRank; exact twin.",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.graph import (
        label_propagation,
    )

    canon = _cosupplier_edges(spark, sf_dir)
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return label_propagation(sym, iterations=3).select("node", "label")
