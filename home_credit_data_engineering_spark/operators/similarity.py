"""Similarity search over embedding columns (north-star extension).

Two strategies:

- :func:`brute_force_topk` — exact cosine top-k. The query side is
  broadcast (queries ≪ corpus); the corpus is scanned once, similarity is
  computed JVM-side, and per-query top-k uses a window — so the plan is
  scan → broadcast-nested-loop → window, no corpus shuffle. At 100 TB this
  is the right *exact* baseline: cost is O(|corpus|·|queries|·dim) spread
  across executors, with nothing collected to the driver.
- :func:`lsh_topk` — approximate: random-hyperplane (SimHash-style) bucket
  signatures on both sides, candidates restricted to matching buckets
  (multi-probe via several independent tables), exact cosine re-ranking on
  the candidates. Turns the corpus scan per query into a hash-join on
  signature — the scale path when |queries| is large.

Determinism: rankings order by ``(round(score, 6) DESC, id ASC)`` so
results are stable across engines and runs (FP noise lives below 1e-6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: PEP 563 stringified UDF type hints resolve here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from home_credit_data_engineering_spark.functions.vectors import (
    cosine,
    cosine_arrow,
    dot,
    to_double_array,
)


def _ranked_topk(
    scored: DataFrame, query_id: str, corpus_id: str, k: int, score_col: str = "score"
) -> DataFrame:
    w = Window.partitionBy(query_id).orderBy(
        F.col(score_col).desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, score, rank).

    Self-matches (same id) are excluded. ``queries`` is broadcast — it must
    be the small side.
    """
    # Norms are precomputed per side (once per vector, not once per pair):
    # the per-pair work drops to a single dot product.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        to_double_array(vec_col).alias("__qvec"),
    ).withColumn("__qnorm", F.sqrt(dot(F.col("__qvec"), F.col("__qvec"))))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        to_double_array(vec_col).alias("__cvec"),
    ).withColumn("__cnorm", F.sqrt(dot(F.col("__cvec"), F.col("__cvec"))))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(
                F.when(
                    (F.col("__qnorm") > 0) & (F.col("__cnorm") > 0),
                    dot(F.col("__qvec"), F.col("__cvec"))
                    / (F.col("__qnorm") * F.col("__cnorm")),
                ),
                round_digits,
            ),
        )
        .drop("__qvec", "__cvec", "__qnorm", "__cnorm")
    )
    return _ranked_topk(scored, "query_id", "neighbor_id", k)


def brute_force_topk_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy GEMM — the fast path.

    Same results as :func:`brute_force_topk` (same rounding and
    (score DESC, id ASC) tie-break), different physical strategy:

    - the query matrix is collected driver-side (queries ≪ corpus — the
      same smallness assumption the broadcast in :func:`brute_force_topk`
      makes) and shipped to workers inside the UDF closure;
    - each Arrow batch of corpus vectors scores against ALL queries in one
      normalized matrix multiply (vectorized, ~100× the throughput of
      per-pair interpreted array lambdas);
    - each batch emits only its own top-k per query (partial top-k — the
      map-side-combine analogue), so the shuffle carries
      O(batches · queries · k) rows instead of |corpus|·|queries|;
    - a final window top-k merges the partials exactly.

    Contract deviations from the pair formulation (documented, not
    silent): zero-norm vectors — which score NULL there and sort last —
    are skipped on both sides here, so a zero-norm *query* yields no
    output rows instead of k NULL-score rows. Scores round half-away-
    from-zero to match Spark's ``F.round`` exactly (numpy's default is
    half-to-even). Id types are derived from the input schemas (ADVICE
    r6 — the partial-result schema used to hardcode ``long``); the
    per-batch tie-break ranks ids via ``np.unique`` so string ids order
    identically to the final window's id-ASC sort.
    """
    import pandas as pd

    def round_half_up(x: np.ndarray, digits: int) -> np.ndarray:
        scale = 10.0**digits
        return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale

    # Guarded driver-side collect: the query matrix lives in driver memory
    # and inside every task's UDF closure, so an unboundedly large query
    # set would OOM the driver silently. The limit(max+1) probe costs no
    # extra job — the collected frame IS the query matrix when in bounds.
    qpdf = (
        queries.select(
            F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("v")
        )
        .limit(max_query_rows + 1)
        .toPandas()
    )
    if len(qpdf) > max_query_rows:
        raise ValueError(
            f"brute_force_topk_gemm collects the query side driver-side and got "
            f"more than max_query_rows={max_query_rows} query rows; use lsh_topk "
            "or ivf_topk for large query sets (both keep queries distributed)"
        )
    q_ids = qpdf["query_id"].to_numpy()
    q_mat = np.array(qpdf["v"].tolist(), dtype=np.float64).reshape(len(qpdf), -1) \
        if len(qpdf) else np.zeros((0, 1))
    q_norm = np.linalg.norm(q_mat, axis=1)
    ok = q_norm > 0
    q_ids, q_mat, q_norm = q_ids[ok], q_mat[ok], q_norm[ok]
    q_unit = q_mat / q_norm[:, None] if len(q_mat) else q_mat

    def score_batches(batches):
        for pdf in batches:
            if len(pdf) == 0 or len(q_ids) == 0:
                continue
            c_ids = pdf["neighbor_id"].to_numpy()
            c_mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            keep = c_norm > 0
            if not keep.any():
                continue
            c_ids, c_mat, c_norm = c_ids[keep], c_mat[keep], c_norm[keep]
            scores = round_half_up(
                (c_mat / c_norm[:, None]) @ q_unit.T, round_digits
            )
            # self-match exclusion: push to -inf so it never enters top-k
            scores[c_ids[:, None] == q_ids[None, :]] = -np.inf
            top = min(k, len(c_ids))
            # id-ascending dense ranks: lexsort cannot key on object
            # (string) id arrays, and ranking keeps the tie-break
            # identical to the final window's id-ASC order for any type
            c_rank = np.unique(c_ids, return_inverse=True)[1]
            out_q, out_c, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                col = scores[:, j]
                # exact (score DESC, id ASC) partial top-k: lexsort is
                # stable, keys are (id-rank asc) then (-score asc)
                order = np.lexsort((c_rank, -col))[:top]
                order = order[np.isfinite(col[order])]
                out_q.extend([qid] * len(order))
                out_c.extend(c_ids[order])
                out_s.extend(col[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_c, "score": out_s}
            )

    q_id_type = queries.schema[id_col].dataType.simpleString()
    n_id_type = corpus.schema[id_col].dataType.simpleString()
    partials = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("v")
    ).mapInPandas(
        score_batches,
        schema=f"query_id {q_id_type}, neighbor_id {n_id_type}, score double",
    )
    return _ranked_topk(partials, "query_id", "neighbor_id", k)


def hyperplane_signature(
    vec_col: Column | str, planes: np.ndarray, table: int = 0
) -> Column:
    """Random-hyperplane signature: one bit per plane (sign of the dot
    product), packed into a long. ``planes`` is a (n_bits, dim) float array
    shipped as expression literals — fine at small n_bits × dim, but the
    plan grows O(n_bits × dim); prefer
    :func:`with_hyperplane_signatures` (broadcast planes table) for
    high-dim embeddings."""
    v = to_double_array(vec_col)
    bits = []
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(dot(v, plane_col) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("long")


def with_hyperplane_signatures(
    df: DataFrame,
    vec_col: Column | str,
    planes_tables: list[np.ndarray],
    out_col: str = "__sigs",
) -> DataFrame:
    """Attach an ``array<long>`` of hyperplane signatures (one per LSH
    table) in a single pass.

    The planes ride in a **scalar subquery** over a one-row local table
    (array<array<array<double>>>) instead of expression literals: the
    subquery executes once and its result is shipped to executors as a
    runtime constant, so the expression tree stays O(1) in ``n_bits ×
    dim`` — at dim=1024 the literal form bloats the plan and Catalyst's
    codegen — and no join node (not even a 1-row broadcast nested loop)
    enters the query shape. Bit packing matches
    :func:`hyperplane_signature` exactly: bit *i* (plane *i*) has weight
    ``1 << i`` — planes are pre-reversed driver-side so the left fold
    ``acc*2 + bit`` lands each bit at the same weight.
    """
    import uuid

    spark = df.sparkSession
    payload = [
        [[float(x) for x in plane] for plane in reversed(tp)] for tp in planes_tables
    ]
    planes_df = spark.createDataFrame(
        [(payload,)], "__planes array<array<array<double>>>"
    )
    view = f"__hyperplanes_{uuid.uuid4().hex}"
    planes_df.createOrReplaceTempView(view)
    v = to_double_array(vec_col)

    def table_sig(tp: Column) -> Column:
        bits = F.transform(
            tp,
            lambda p: F.when(dot(v, p) >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        return F.aggregate(
            bits, F.lit(0).cast("long"), lambda acc, x: acc * 2 + x
        )

    # Spark rejects subquery expressions inside higher-order functions, so
    # the subquery binds to a plain column first; the HOF references the
    # resulting attribute.
    out = (
        df.withColumn("__planes", F.expr(f"(SELECT __planes FROM {view})"))
        .withColumn(out_col, F.transform(F.col("__planes"), table_sig))
        .drop("__planes")
    )
    # Classic PySpark analyzes eagerly, so the subquery plan is already
    # resolved into `out` — the temp view can be dropped immediately.
    spark.catalog.dropTempView(view)
    return out


def make_planes(dim: int, n_bits: int = 12, n_tables: int = 3, seed: int = 42) -> list[np.ndarray]:
    """Deterministic hyperplane sets, one per LSH table."""
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((n_bits, dim)) for _ in range(n_tables)]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_iter: int = 5,
    init_mode: str = "random",
    train_fraction: float | None = None,
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) coarse quantizer.

    Build: seeded KMeans (pyspark.ml) partitions the corpus into
    ``n_centroids`` cells; each corpus vector is stored under its cell id.
    Query: each query probes its ``n_probe`` nearest cells (centroids are
    tiny — broadcast), and exact cosine re-ranks only vectors in probed
    cells. Search cost drops to ~(n_probe/n_centroids) of brute force; the
    candidate join is an equi-join on cell id, so the corpus is never
    cross-joined. The standard trade-off: recall grows with ``n_probe``.

    Quantizer-build economics: a *coarse* quantizer doesn't need a
    polished clustering — assignment quality is recovered by multi-probe.
    Random init (skips k-means||'s extra passes) and few iterations cut
    the build to ~a third of the default pipeline with recall pinned by
    tests; at 100 TB also pass ``train_fraction`` (e.g. 1e-4) — training
    the quantizer on a seeded sample is the standard IVF build, the full
    corpus is only ever *assigned* (one broadcast-join pass).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train_src = (
        corpus.sample(fraction=train_fraction, seed=seed)
        if train_fraction is not None
        else corpus
    )
    train = train_src.select(
        array_to_vector(to_double_array(vec_col)).alias("features")
    )
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, initMode=init_mode
    ).fit(train)
    from pyspark.sql.functions import pandas_udf

    # Centroids as a tiny unit-normalized numpy matrix shipped in the UDF
    # closure (n_centroids × dim ≈ KBs). Cell assignment is ONE narrow
    # pandas-UDF pass per side: batch matmul + stable argsort — no
    # N × n_centroids join rows, no per-id window shuffle (the crossJoin +
    # row_number formulation cost N·cells rows and dominated the build
    # once cells scaled as sqrt(N)).
    centers_mat = np.array([list(c) for c in model.clusterCenters()], dtype=np.float64)
    c_norm = np.linalg.norm(centers_mat, axis=1)
    c_unit = np.where(c_norm[:, None] > 0, centers_mat / np.maximum(c_norm, 1e-300)[:, None], 0.0)

    def top_cells_udf(n: int):
        @pandas_udf("array<int>")
        def top_cells(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype="object")
            M = np.array(v.tolist(), dtype=np.float64)
            mn = np.linalg.norm(M, axis=1)
            Mu = np.where(mn[:, None] > 0, M / np.maximum(mn, 1e-300)[:, None], 0.0)
            sims = Mu @ c_unit.T
            # stable sort keeps ascending-cell order on ties — same
            # tie-break the window formulation used
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n]
            return pd.Series(list(order.astype("int32")))

        return top_cells

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("__vec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("__vec")
    )
    corpus_cells = c.withColumn(
        "cell", top_cells_udf(1)("__vec")[0]
    ).withColumnRenamed("__vec", "__cvec")
    query_cells = (
        q.withColumn("__cells", top_cells_udf(n_probe)("__vec"))
        .select(
            "query_id",
            F.col("__vec").alias("__qvec"),
            F.explode("__cells").alias("cell"),
        )
    )
    # No pair dedup needed: every corpus vector lives in exactly ONE cell
    # and a query's n_probe cells are distinct, so (query, neighbor) pairs
    # are already unique — and skipping it keeps the candidate stream
    # pipelined (a dedup here would shuffle two vector payloads per pair).
    candidates = query_cells.join(corpus_cells, on="cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # Arrow-batched cosine: the re-rank touches n_probe/n_centroids of
    # |corpus| per query — interpreted per-element lambdas dominate here
    # (this is the GEMM lesson applied to the candidate join). Vectors are
    # dropped before the top-k shuffle, which carries only (ids, score).
    scored = candidates.withColumn(
        "score", F.round(cosine_arrow(F.col("__qvec"), F.col("__cvec")), 6)
    ).drop("__qvec", "__cvec", "cell")
    return _ranked_topk(scored, "query_id", "neighbor_id", k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 12,
    n_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via multi-table hyperplane LSH.

    Candidates = pairs sharing a signature in ANY table (posexplode the
    per-table signature array → one equi-join on (table, bucket) — pure
    shuffle-hash join, no cross product), then exact cosine re-ranking.
    Recall grows with ``n_tables``; cost is |bucket|² per bucket instead
    of |corpus|·|queries|. Planes ride in a one-row broadcast table
    (:func:`with_hyperplane_signatures`), not expression literals, so the
    plan stays small at high dim.
    """
    planes = make_planes(dim, n_bits=n_bits, n_tables=n_tables, seed=seed)
    q = with_hyperplane_signatures(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        ),
        "__qvec",
        planes,
    ).select(
        "query_id", "__qvec", F.posexplode("__sigs").alias("__t", "__sig")
    )
    c = with_hyperplane_signatures(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
        ),
        "__cvec",
        planes,
    ).select(
        "neighbor_id", "__cvec", F.posexplode("__sigs").alias("__t", "__sig")
    )
    # Multi-table probing duplicates (query, neighbor) pairs — dedup on
    # IDS ONLY so the shuffle never carries vector payloads, then join
    # the vectors back for the re-rank (same payload-after-dedup rule as
    # the blocked embedding near-dup).
    pairs = (
        q.select("query_id", "__t", "__sig")
        .join(c.select("neighbor_id", "__t", "__sig"), on=["__t", "__sig"])
        .drop("__t", "__sig")
        .dropDuplicates(["query_id", "neighbor_id"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    q_vecs = q.select("query_id", "__qvec").dropDuplicates(["query_id"])
    c_vecs = c.select("neighbor_id", "__cvec").dropDuplicates(["neighbor_id"])
    scored = (
        pairs.join(q_vecs, on="query_id")
        .join(c_vecs, on="neighbor_id")
        .withColumn(
            "score", F.round(cosine_arrow(F.col("__qvec"), F.col("__cvec")), 6)
        )
        .drop("__qvec", "__cvec")
    )
    return _ranked_topk(scored, "query_id", "neighbor_id", k)


# ---------------------------------------------------------------------------
# Persisted IVF index (partition-pruned ANN serving)
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 5,
    train_fraction: float | None = None,
) -> np.ndarray:
    """Seeded KMeans coarse quantizer — the shared trainer for the
    one-time index build (:func:`build_ivf_index`) and the streaming
    bootstrap (``streaming/ann.py``), so the two paths can never train
    differently on the same data."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train_src = (
        corpus.sample(fraction=train_fraction, seed=seed)
        if train_fraction is not None
        else corpus
    )
    train = train_src.select(
        array_to_vector(to_double_array(vec_col)).alias("features")
    )
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, initMode="random"
    ).fit(train)
    return np.array(
        [list(c) for c in model.clusterCenters()], dtype=np.float64
    )


def best_cell_udf(c_unit: np.ndarray):
    """Pandas UDF assigning each vector to its nearest (max-cosine)
    centroid from the given UNIT-normalized centroid matrix. Shared by
    the one-time build and the O(Δ) increment
    (``operators/ann_state.py``) so assignments can never drift between
    the two paths."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def best_cell(v: pd.Series) -> pd.Series:
        M = np.array(v.tolist(), dtype=np.float64)
        mn = np.linalg.norm(M, axis=1)
        Mu = np.where(mn[:, None] > 0, M / np.maximum(mn, 1e-300)[:, None], 0.0)
        sims = Mu @ c_unit.T
        return pd.Series(
            np.argsort(-sims, axis=1, kind="stable")[:, 0].astype("int32")
        )

    return best_cell


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 5,
    train_fraction: float | None = None,
) -> np.ndarray:
    """Persist an IVF index: corpus parquet PARTITIONED BY cell id, plus
    the centroid matrix (numpy, saved beside the data).

    This is the serving-time form of :func:`ivf_topk`: the one-time
    build pays a single shuffle on cell id, and every later query batch
    reads ONLY its probed cells through parquet partition pruning — at
    100 TB a 4-of-256-cell probe scans ~1.6% of the index instead of
    everything, with zero services beyond the object store.
    Returns the centroid matrix (also written to ``path/_centroids.npy``).
    """
    import os

    centers_mat = train_ivf_centroids(
        corpus,
        vec_col=vec_col,
        n_centroids=n_centroids,
        seed=seed,
        max_iter=max_iter,
        train_fraction=train_fraction,
    )
    c_norm = np.linalg.norm(centers_mat, axis=1)
    c_unit = np.where(
        c_norm[:, None] > 0, centers_mat / np.maximum(c_norm, 1e-300)[:, None], 0.0
    )

    best_cell = best_cell_udf(c_unit)
    # repartition on the partition key: one file per cell instead of
    # input_partitions x cells (the increment/compaction discipline)
    corpus.select(
        F.col(id_col), F.col(vec_col), best_cell(to_double_array(vec_col)).alias("cell")
    ).repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(path)
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, "_centroids.npy"), centers_mat)
    from home_credit_data_engineering_spark.sources.maintenance import (
        write_state_layout,
    )

    write_state_layout(path, "batch", "ivf")
    # Per-cell running stats seed the O(Δ) increment path's drift
    # tracking (ann_state.ivf_index_increment); computed from the
    # just-written index so the first increment is O(Δ), not O(corpus).
    from home_credit_data_engineering_spark.operators.ann_state import (
        refresh_cell_stats_from_index,
    )

    refresh_cell_stats_from_index(
        corpus.sparkSession, path, id_col=id_col, vec_col=vec_col
    )
    return centers_mat


def ivf_query_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Query a persisted IVF index with parquet partition pruning.

    The probed cell set is computed driver-side from the query batch
    (queries ≪ corpus — same smallness assumption every broadcast here
    makes), and the index scan filters ``cell IN (probed)`` — a
    partition-pruning predicate, so unprobed cells are never read.
    Results match :func:`ivf_topk` given the same centroids.
    """
    import os

    centers_mat = np.load(os.path.join(path, "_centroids.npy"))
    c_norm = np.linalg.norm(centers_mat, axis=1)
    c_unit = np.where(
        c_norm[:, None] > 0, centers_mat / np.maximum(c_norm, 1e-300)[:, None], 0.0
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def top_cells(v: pd.Series) -> pd.Series:
        M = np.array(v.tolist(), dtype=np.float64)
        mn = np.linalg.norm(M, axis=1)
        Mu = np.where(mn[:, None] > 0, M / np.maximum(mn, 1e-300)[:, None], 0.0)
        sims = Mu @ c_unit.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype("int32")))

    qvecs = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("__qvec")
    )
    # The per-query cell assignment is collected ONCE — n_queries × n_probe
    # (query_id, cell) ints, never the vectors; the same queries ≪ corpus
    # smallness assumption the probed-cell set already makes. The pandas
    # UDF therefore evaluates exactly once (during this collect), and
    # nothing stays persisted after the call — the r3 form cached the
    # assignment subtree and leaked it into executor storage across
    # repeated calls (ADVICE r3).
    assigned = [
        (r["query_id"], r["cell"])
        for r in qvecs.withColumn("__cells", top_cells("__qvec"))
        .select("query_id", F.explode("__cells").alias("cell"))
        .collect()
    ]
    probed = sorted({c for _, c in assigned})
    if not probed:  # empty query batch: isin([]) would fail analysis
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, score double, rank int"
        )
    qid_type = qvecs.schema["query_id"].dataType.simpleString()
    q_cells = F.broadcast(
        spark.createDataFrame(assigned, f"query_id {qid_type}, cell int")
    ).join(qvecs, on="query_id")
    index = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(probed))  # partition-pruned scan
        .select(
            F.col(id_col).alias("neighbor_id"),
            to_double_array(vec_col).alias("__cvec"),
            F.col("cell").cast("int").alias("cell"),
        )
    )
    candidates = F.broadcast(q_cells).join(index, on="cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = candidates.withColumn(
        "score", F.round(cosine_arrow(F.col("__qvec"), F.col("__cvec")), round_digits)
    ).drop("__qvec", "__cvec", "cell")
    return _ranked_topk(scored, "query_id", "neighbor_id", k)


def knn_join(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    train_fraction: float | None = None,
) -> DataFrame:
    """All-pairs approximate k-NN: every corpus vector's top-``k``
    cosine neighbors (SemDeDup-style pipelines, graph construction,
    recommendation candidate generation).

    Thin self-join form of :func:`ivf_topk` — the query side of that
    operator is fully distributed (cell assignment is a narrow
    pandas-UDF pass, candidates come from a cell equi-join), so passing
    the corpus as its own query set stays shuffle-bounded: cost is
    ~(n_probe/n_centroids)·|corpus|² pair evaluations spread over the
    cell partitioning, never a materialized cross product. Exclusion of
    self-matches and the (score DESC, id ASC) tie-break come with the
    underlying operator. At 100 TB size ``n_centroids ~ sqrt(N)`` so the
    probed fraction shrinks as the corpus grows.
    """
    return ivf_topk(
        corpus,
        corpus,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        n_probe=n_probe,
        seed=seed,
        train_fraction=train_fraction,
    )


def filtered_topk(
    corpus: DataFrame,
    queries: DataFrame,
    predicate: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_threshold: int = 10_000,
    n_probe: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Metadata-FILTERED vector search with pre-filter semantics: exact
    cosine top-k among corpus vectors satisfying ``predicate`` (the
    "show me the nearest docs WHERE lang = 'en' AND quality > 0.5"
    query every retrieval stack serves).

    Pre-filtering (restrict, then search) guarantees k results whenever
    k matches exist — post-filtering a fixed-index candidate list can
    silently return fewer under selective predicates, the classic
    filtered-ANN failure. The cost question is which search to run on
    the survivors, so the operator SIZE-ROUTES (the
    ``embedding_neardup`` precedent): one count-only scan with the
    predicate pushed into parquet, then

    - ``<= exact_threshold`` survivors → GEMM brute force (exact — a
      selective predicate makes exact search CHEAP; this is why
      pre-filtering is the right default);
    - above it → IVF built over the filtered subset (sqrt-N cells,
      bounded training sample), probing ``n_probe`` cells. For a
      standing predicate at 100 TB, persist a dedicated index
      (``jobs/ann_index.py``) instead of rebuilding per call — this
      path is the ad-hoc-predicate form.

    Returns (query_id, neighbor_id, score, rank); on the exact route
    the result is oracle-verifiable end to end.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if exact_threshold < 1:
        raise ValueError(
            f"exact_threshold must be >= 1, got {exact_threshold}"
        )
    filtered = corpus.filter(predicate)
    n = filtered.count()
    if n <= exact_threshold:
        return brute_force_topk_gemm(
            filtered, queries, k=k, id_col=id_col, vec_col=vec_col
        )
    n_cells = max(16, int(n**0.5))
    train_frac = min(1.0, 4096.0 / n) if n > 4096 else None
    return ivf_topk(
        filtered,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_cells,
        n_probe=n_probe,
        seed=seed,
        train_fraction=train_frac,
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    candidates: int = 50,
    lambda_: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998) — the diversified top-k every retrieval stack offers:
    greedily pick the next result maximizing
    ``λ·sim(query, d) − (1−λ)·max_{s∈selected} sim(d, s)``, so near
    duplicates of already-selected results are penalized. ``λ=1``
    degenerates to the plain exact top-k (asserted — that is also what
    makes the declared query exactly SQL-verifiable on one leg).

    Two-stage shape: exact GEMM top-``candidates`` per query (the
    distributed heavy lift — corpus streamed, never shuffled), then the
    greedy selection runs per query over ≤ ``candidates`` vectors in one
    ``applyInPandas`` group (numpy, O(k·candidates) sims; candidate
    slates are tiny by construction, so the group is bounded —
    the same contract as every per-query stage here). Deterministic:
    relevance comes in rounded at 6, marginal scores round at 9, ties
    break on neighbor id.

    Returns (query_id, neighbor_id, relevance, mmr_rank).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if candidates < k:
        raise ValueError(f"candidates={candidates} must be >= k={k}")
    if not 0 <= lambda_ <= 1:
        raise ValueError(f"lambda_ must be in [0, 1], got {lambda_}")
    cands = brute_force_topk_gemm(
        corpus,
        queries,
        k=candidates,
        id_col=id_col,
        vec_col=vec_col,
        max_query_rows=max_query_rows,
    ).select("query_id", "neighbor_id", F.col("score").alias("relevance"))
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("__cv")
    )
    slate = cands.join(c_vecs, "neighbor_id")

    lam = float(lambda_)
    kk = int(k)

    def select(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["relevance", "neighbor_id"], ascending=[False, True]
        ).reset_index(drop=True)
        vecs = np.array(pdf["__cv"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        vecs = np.where(
            norms[:, None] > 0,
            vecs / np.maximum(norms, 1e-300)[:, None],
            0.0,
        )
        rel = pdf["relevance"].to_numpy()
        ids = pdf["neighbor_id"].to_numpy()
        n = len(pdf)
        picked: list[int] = []
        max_sim = np.zeros(n)
        remaining = np.ones(n, dtype=bool)
        while len(picked) < min(kk, n):
            if picked:
                score = lam * rel - (1.0 - lam) * max_sim
            else:
                score = lam * rel
            score = np.round(score, 9)
            # deterministic argmax: score desc, id asc, remaining only
            masked = np.where(remaining, score, -np.inf)
            best_score = masked.max()
            tie = np.where(remaining & (masked == best_score))[0]
            best = tie[np.argmin(ids[tie])]
            picked.append(int(best))
            remaining[best] = False
            max_sim = np.maximum(max_sim, np.round(vecs @ vecs[best], 9))
        out = pdf.iloc[picked][["query_id", "neighbor_id", "relevance"]].copy()
        out["mmr_rank"] = np.arange(1, len(picked) + 1, dtype=np.int32)
        return out

    # The applyInPandas output schema carries the input frames' id types
    # (ADVICE r6: a hardcoded `long` broke string/non-bigint ids at
    # runtime) — query ids from the queries frame, neighbor ids from the
    # corpus frame.
    q_id_type = queries.schema[id_col].dataType.simpleString()
    n_id_type = corpus.schema[id_col].dataType.simpleString()
    schema = (
        f"query_id {q_id_type}, neighbor_id {n_id_type}, "
        "relevance double, mmr_rank int"
    )
    return slate.groupBy("query_id").applyInPandas(select, schema=schema)
