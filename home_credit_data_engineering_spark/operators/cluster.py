"""Distributed Lloyd's k-means over an embedding column.

The corpus-scale clustering pass a training-data pipeline runs before
semantic dedup (SemDeDup's stage 1), domain discovery, or
stratified-by-cluster sampling. Complements the DRIVER-SIDE numpy
k-means in ``operators/quantization.py`` (which trains PQ/IVF codebooks
on a bounded md5-ordered sample): here BOTH steps of every Lloyd
iteration — assignment and centroid recompute — are distributed Spark
aggregates, so the fit uses every row, not a sample, and nothing about
the algorithm bounds the corpus size.

Cross-engine exactness (the repo's decimal discipline, same as
``operators/graph.py``): vector components round to 9 decimals on
explode; squared-difference terms round to 9 and accumulate as
DECIMAL(18,9) (order-independent exact sums), so distances are exact
decimals; assignment is an (distance, centroid-id) argmin over exact
values; new centroid components are ONE double divide of an exact
decimal sum by a count, rounded to 9. A DuckDB replay that unrolls the
same iterations (``plans/declared/cluster.py:kmeans_sql_ctes``) is
hash-identical.

Determinism: initial centroids are the ``k`` vectors whose ids sort
first by ``(md5(id), id)`` — a seeded-RNG-free init both engines
reproduce; all later state is a pure function of it. Empty clusters are
DROPPED (the standard Lloyd caveat): a centroid that attracts no points
leaves the centroid frame and k shrinks — deterministic on both engines.

100 TB posture (r14 ``impl="array"`` default): the point set NEVER
shuffles. Assignment is a narrow pass — the k x dim centroid frame is
collapsed to ONE broadcast row of (cid, vector) structs, each point
row computes its k exact-decimal distances with ``zip_with`` +
``aggregate`` over its own array and takes the (dist, cid) struct
``array_min`` argmin in place (zero Exchange, zero per-point hash
aggregate). The one per-iteration shuffle is the centroid recompute's
(cid, ord) hash aggregate — map-side combined into at most k x dim
cells. The r13 ``impl="explode"`` form (points exploded to (id, ord,
value) scalar triples, broadcast centroid join on ord, two
data-sized per-iteration aggregates) is kept reachable for
measurement and equivalence tests; both compute bit-identical frames
(same round-9 products, same order-free DECIMAL sums — asserted in
``test_cluster`` and by the unrolled DuckDB twin). The centroid
frame is localCheckpoint-ed per iteration so the plan does not grow
with the iteration count. For latency-critical ASSIGN-only serving at
fixed centroids, a GEMM mapInPandas pass (the
``similarity.brute_force_topk_gemm`` shape) is the faster path; the
relational form here is the portable, exactly-verifiable fit path.

Relation to ``pyspark.ml.clustering.KMeans`` (which
``similarity.ivf_topk`` uses for its coarse quantizer): MLlib's fit is
also distributed, but its float arithmetic and k-means|| init are
engine-specific — fine for a quantizer whose quality is recovered by
multi-probe, unusable where the clustering itself must be reproducible
and auditable (dedup survivorship, stratified subsetting, compliance).
This operator trades a constant factor for bit-exact cross-engine
determinism. Composes directly with
``dedup.semantic_dedup(cluster_col=...)`` (SemDeDup stage 1) and
``sampling.weighted_sample_per_group`` (cluster-stratified subsetting,
see ``plans/declared/cluster.py:sim_cluster_stratified_sample``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(18,9)"


def _points(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, ord, value) triples with round-9 double components."""
    return df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "__ord", "__v"
        ),
    ).select("__id", "__ord", F.round("__v", 9).alias("__v"))


def _arrays(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, __a) rows with round-9 double components, array form.

    Null/empty vectors are dropped — the explode form never emits a
    triple for them, so the id vanishes from the fit there too.
    """
    a = F.transform(
        F.col(vec_col).cast("array<double>"), lambda v: F.round(v, 9)
    )
    return df.select(F.col(id_col).alias("__id"), a.alias("__a")).filter(
        F.size("__a") > 0
    )


def _sq_dist(a, c):
    """Exact squared-L2 between two round-9 arrays: per-component
    ``round(diff*diff, 9)`` DECIMAL(18,9) terms folded with an exact
    decimal add — the same terms and (order-free) sum as the explode
    form's groupBy, so distances are bit-identical."""
    sq = F.zip_with(
        a, c, lambda x, y: F.round((x - y) * (x - y), 9).cast(_DEC)
    )
    return F.aggregate(
        sq, F.lit(0).cast(_DEC), lambda acc, x: (acc + x).cast(_DEC)
    )


def _centroid_arrays(cent: DataFrame) -> DataFrame:
    """Long-form (cid, ord, c) centroids -> (cid, __carr) arrays,
    ordered by ord (array_sort on (ord, c) structs; ords are unique)."""
    return cent.groupBy("__cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__ord", "__c"))),
            lambda s: s["__c"],
        ).alias("__carr")
    )


def _assign_arrays(arrs: DataFrame, cent: DataFrame) -> DataFrame:
    """(id, __a, cid, dist) argmin assignment, zero-shuffle form: the
    k centroids collapse to ONE broadcast row of (cid, vector) structs
    and each point row takes the lexicographic (dist, cid) struct
    ``array_min`` over its k exact distances in place — same argmin and
    lower-cid tie-break as the explode form's struct-min aggregate."""
    cent_list = _centroid_arrays(cent).agg(
        F.array_sort(F.collect_list(F.struct("__cid", "__carr"))).alias(
            "__cl"
        )
    )
    m = F.array_min(
        F.transform(
            "__cl",
            lambda s: F.struct(
                _sq_dist(F.col("__a"), s["__carr"]).alias("__dist"),
                s["__cid"].alias("__cid"),
            ),
        )
    )
    return (
        arrs.crossJoin(F.broadcast(cent_list))
        .select("__id", "__a", m.alias("__m"))
        .select(
            "__id",
            "__a",
            F.col("__m.__cid").alias("__cid"),
            F.col("__m.__dist").alias("__dist"),
        )
    )


def _recompute_arrays(assigned: DataFrame) -> DataFrame:
    """Per-(cluster, ord) mean from the array-form assignment: one
    posexplode feeding a map-side-combinable hash aggregate into at
    most k x dim cells — the iteration's only Exchange. Same exact
    decimal sum / count / round-9 divide as the explode form."""
    return (
        assigned.select(
            "__cid", F.posexplode("__a").alias("__ord", "__v")
        )
        .groupBy("__cid", "__ord")
        .agg(
            F.round(
                F.sum(F.col("__v").cast(_DEC)).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("__c")
        )
    )


def _init_centroids(pts: DataFrame, k: int) -> DataFrame:
    """First k ids by (md5(id), id) -> (cid, ord, c) centroid frame.

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — a
    distributed partial top-k, not a global sort.
    """
    seed = (
        pts.select("__id")
        .distinct()
        .select("__id", F.md5(F.col("__id").cast("string")).alias("__h"))
        .orderBy("__h", "__id")
        .limit(k)
    )
    numbered = seed.withColumn(
        "__cid",
        F.row_number().over(Window.orderBy("__h", "__id")) - 1,
    ).select("__id", "__cid")
    return pts.join(numbered, "__id").select(
        "__cid", "__ord", F.col("__v").alias("__c")
    )


def _assign(pts: DataFrame, cent: DataFrame) -> DataFrame:
    """(id, cluster, dist) argmin assignment against ``cent``.

    Distances are exact DECIMAL(18,9) sums of round-9 squared diffs;
    ties break on the lower centroid id.
    """
    diff = F.col("__v") - F.col("__c")
    d = (
        pts.join(F.broadcast(cent), "__ord")
        .select(
            "__id",
            "__cid",
            F.round(diff * diff, 9).cast(_DEC).alias("__sq"),
        )
        .groupBy("__id", "__cid")
        .agg(F.sum("__sq").alias("__dist"))
    )
    # argmin via lexicographic struct-min — one hash aggregate (no
    # per-id sort); struct (dist, cid) min IS (dist ASC, cid ASC) first,
    # the same tie-break the SQL twin's ROW_NUMBER replays
    return d.groupBy("__id").agg(
        F.min(F.struct("__dist", "__cid")).alias("__m")
    ).select(
        "__id",
        F.col("__m.__cid").alias("__cid"),
        F.col("__m.__dist").alias("__dist"),
    )


def _recompute(pts: DataFrame, assign: DataFrame) -> DataFrame:
    """Per-(cluster, ord) mean: exact decimal sum / count, round 9.

    Clusters with no assigned points drop out (empty-cluster rule).
    """
    return (
        pts.join(assign.select("__id", "__cid"), "__id")
        .groupBy("__cid", "__ord")
        .agg(
            F.round(
                F.sum(F.col("__v").cast(_DEC)).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("__c")
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    iterations: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: bool = True,
    need_centroids: bool = True,
    impl: str = "array",
) -> tuple[DataFrame, DataFrame | None]:
    """Fixed-iteration distributed Lloyd's k-means (Lloyd 1982).

    Schedule: ``assign_i`` from ``cent_{i-1}``; ``cent_i`` from
    ``assign_i``. Returns BOTH final frames from one fit:
    ``(assignments, centroids)`` — assignments
    ``(id_col, cluster, dist)`` with ``dist`` the exact squared-L2
    decimal cast to a round-9 double (the labeling the last centroid
    update was computed FROM, exactly what the unrolled SQL twin
    replays), and the long-form centroid frame
    ``(cluster, ord, value)`` AFTER the last update. With
    ``checkpoint=True`` (production) every iteration is materialized
    once via eager localCheckpoint, so consuming both frames does not
    recompute the fit.

    ``checkpoint=False`` keeps the full lineage for plan inspection;
    production leaves it on (plan stays flat across iterations).
    ``need_centroids=False`` skips the last centroid recompute (the
    final assignment does not depend on it) and returns ``None`` in its
    place — the assignment-only fast path.

    ``impl`` (r14 optimization): ``"array"`` (default) keeps every
    point as one array row — assignment is a narrow zero-shuffle pass
    against ONE broadcast row of centroid structs and the only
    per-iteration Exchange is the k x dim-cell recompute aggregate;
    ``"explode"`` is the r13 scalar-triple form (broadcast centroid
    join on ord + two data-sized per-iteration hash aggregates), kept
    for measurement and as the equivalence reference. Both produce
    bit-identical frames (same round-9 terms, same order-free decimal
    sums, same (dist, cid) argmin tie-break) — asserted in
    ``test_cluster`` and by the unrolled DuckDB twin.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if impl not in ("array", "explode"):
        raise ValueError(f"impl must be 'array' or 'explode', got {impl}")
    if impl == "explode":
        pts = _points(df, id_col, vec_col).persist()
        cent = _init_centroids(pts, k)
        assign = None
        for i in range(iterations):
            if checkpoint:
                cent = cent.localCheckpoint(eager=True)
            assign = _assign(pts, cent)
            if checkpoint:
                assign = assign.localCheckpoint(eager=True)
            if need_centroids or i < iterations - 1:
                cent = _recompute(pts, assign)
        cent_out = None
        if need_centroids:
            cent_out = cent.select(
                F.col("__cid").cast("int").alias("cluster"),
                F.col("__ord").cast("int").alias("ord"),
                F.col("__c").alias("value"),
            )
        assign_out = assign.select(
            F.col("__id").alias(id_col),
            F.col("__cid").cast("int").alias("cluster"),
            F.round(F.col("__dist").cast("double"), 9).alias("dist"),
        )
        if checkpoint:
            if cent_out is not None:
                cent_out = cent_out.localCheckpoint(eager=True)
            pts.unpersist()
        return assign_out, cent_out
    arrs = _arrays(df, id_col, vec_col).persist()
    # same (md5(id), id) seed order as _init_centroids; the centroid
    # state stays long-form (cid, ord, c) so checkpoints and the
    # returned frame are identical across impls
    seed = (
        arrs.select("__id")
        .distinct()
        .select("__id", F.md5(F.col("__id").cast("string")).alias("__h"))
        .orderBy("__h", "__id")
        .limit(k)
    )
    numbered = seed.withColumn(
        "__cid",
        F.row_number().over(Window.orderBy("__h", "__id")) - 1,
    ).select("__id", "__cid")
    cent = arrs.join(F.broadcast(numbered), "__id").select(
        "__cid", F.posexplode("__a").alias("__ord", "__c")
    )
    assigned = None
    for i in range(iterations):
        if checkpoint:
            cent = cent.localCheckpoint(eager=True)
        assigned = _assign_arrays(arrs, cent)
        # no per-iteration assignment checkpoint: its lineage is the
        # persisted array frame x the checkpointed centroid row — flat
        # regardless of iteration count, and recomputing the narrow
        # pass once for the final output is cheaper than materializing
        # (id, array) rows every round
        if need_centroids or i < iterations - 1:
            cent = _recompute_arrays(assigned)
    cent_out = None
    if need_centroids:
        cent_out = cent.select(
            F.col("__cid").cast("int").alias("cluster"),
            F.col("__ord").cast("int").alias("ord"),
            F.col("__c").alias("value"),
        )
    assign_out = assigned.select(
        F.col("__id").alias(id_col),
        F.col("__cid").cast("int").alias("cluster"),
        F.round(F.col("__dist").cast("double"), 9).alias("dist"),
    )
    if checkpoint:
        assign_out = assign_out.localCheckpoint(eager=True)
        if cent_out is not None:
            cent_out = cent_out.localCheckpoint(eager=True)
        arrs.unpersist()
    return assign_out, cent_out


def kmeans(
    df: DataFrame,
    k: int,
    iterations: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: bool = True,
    return_centroids: bool = False,
    impl: str = "array",
) -> DataFrame:
    """Single-frame convenience wrapper over :func:`kmeans_fit`:
    assignments by default (skipping the final centroid recompute the
    assignment does not depend on), the centroid frame with
    ``return_centroids=True``."""
    assign, cent = kmeans_fit(
        df,
        k,
        iterations,
        id_col=id_col,
        vec_col=vec_col,
        checkpoint=checkpoint,
        need_centroids=return_centroids,
        impl=impl,
    )
    return cent if return_centroids else assign


def cluster_sizes(assignments: DataFrame) -> DataFrame:
    """(cluster, n) histogram of a :func:`kmeans` assignment frame."""
    return assignments.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Exact covariance + PCA/ZCA whitening
# ---------------------------------------------------------------------------


def embedding_covariance(
    df: DataFrame, id_col: str, vec_col: str, *, impl: str = "explode"
) -> DataFrame:
    """Exact population covariance of an embedding column:
    ``(i, j, cov)`` for every ``i <= j`` (upper triangle of the d x d
    matrix), with the module's decimal discipline — components round to
    9 on explode, per-pair products round to 9 and accumulate as
    DECIMAL(18,9) (order-independent), ``cov_ij = round(s_ij/n -
    mean_i*mean_j, 9)`` one fixed double formula — so a DuckDB twin is
    hash-identical. The PCA/OPQ/whitening input statistic, computed
    over EVERY row (not a sample).

    ``impl="explode"`` (default): (id, ord, value) scalar triples
    SELF-JOINED on the id (two Exchanges of the exploded stream + the
    join's d^2-per-id row production) feeding the d(d+1)/2-cell decimal
    aggregate — codegen'd joins and aggregates end to end.

    ``impl="array"`` generates each row's d(d+1)/2 upper-triangle
    (i, j, product) structs in place with nested index-aware
    ``transform``s — no join, nothing data-sized crosses an Exchange —
    but the nested higher-order functions run INTERPRETED (no
    whole-stage codegen) and allocate a d(d+1)/2 struct array per row
    before the generator; measured in r14 that per-row constant loses
    to the explode form's codegen'd join on parquet-scanned input
    (interleaved same-JVM minima: explode 2.5 s vs array 12.1 s per
    pass at 20k x 64-dim, and the array form degraded far worse under
    host CPU-steal bursts — 80-270 s samples). Kept for measurement,
    as the equivalence reference, and for callers whose exchange costs
    dominate per-task CPU (real network shuffles of a much larger
    exploded stream). Both impls are bit-identical (same round-9
    products, same order-free decimal sums — asserted in
    ``test_cluster`` and by the DuckDB twin).
    """
    if impl not in ("array", "explode"):
        raise ValueError(f"impl must be 'array' or 'explode', got {impl}")
    pts = _points(df, id_col, vec_col)
    means = pts.groupBy("__ord").agg(
        F.round(
            F.sum(F.col("__v").cast(_DEC)).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("__mean")
    )
    if impl == "array":
        arrs = _arrays(df, id_col, vec_col)
        pairs = F.flatten(
            F.transform(
                "__a",
                lambda vi, i: F.transform(
                    F.slice("__a", i + 1, F.size("__a") - i),
                    lambda vj, joff: F.struct(
                        i.alias("__i"),
                        (i + joff).alias("__j"),
                        F.round(vi * vj, 9).cast(_DEC).alias("__p"),
                    ),
                ),
            )
        )
        prods = (
            arrs.select(F.explode(pairs).alias("__pr"))
            .select("__pr.__i", "__pr.__j", "__pr.__p")
            .groupBy("__i", "__j")
            .agg(F.sum("__p").alias("__s"), F.count(F.lit(1)).alias("__n"))
        )
    else:
        b = pts.select(
            F.col("__id").alias("__id2"),
            F.col("__ord").alias("__j"),
            F.col("__v").alias("__vj"),
        )
        prods = (
            pts.join(
                b, (pts["__id"] == b["__id2"]) & (pts["__ord"] <= b["__j"])
            )
            .select(
                F.col("__ord").alias("__i"),
                "__j",
                F.round(F.col("__v") * F.col("__vj"), 9)
                .cast(_DEC)
                .alias("__p"),
            )
            .groupBy("__i", "__j")
            .agg(F.sum("__p").alias("__s"), F.count(F.lit(1)).alias("__n"))
        )
    mi = means.select(
        F.col("__ord").alias("__i"), F.col("__mean").alias("__mi")
    )
    mj = means.select(
        F.col("__ord").alias("__j"), F.col("__mean").alias("__mj")
    )
    return (
        prods.join(F.broadcast(mi), "__i")
        .join(F.broadcast(mj), "__j")
        .select(
            F.col("__i").alias("i"),
            F.col("__j").alias("j"),
            F.round(
                F.col("__s").cast("double") / F.col("__n")
                - F.col("__mi") * F.col("__mj"),
                9,
            ).alias("cov"),
        )
    )


def pca_whitening_model(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_components: int | None = None,
    eps: float = 1e-6,
    max_dim: int = 2048,
):
    """Fit a whitening transform from the EXACT distributed covariance
    (:func:`embedding_covariance`): returns ``(mean, W)`` numpy arrays
    with ``W`` shaped (out_dim, d) such that ``(x - mean) @ W.T`` has
    ~identity covariance.

    ``n_components=None`` -> ZCA whitening (``U diag(1/sqrt(l+eps))
    U^T``, stays in the original basis, out_dim = d); an integer ->
    PCA whitening onto the top components by eigenvalue
    (``diag(1/sqrt(l+eps)) U^T``, out_dim = n_components) — the
    decorrelate+rescale preprocessing embedding pipelines run before
    cosine ANN, OPQ, or semantic dedup.

    Driver state is the d x d covariance only — collected with a
    raising guard (``max_dim``, default 2048: 2048^2 doubles = 32 MiB);
    the eigendecomposition is numpy ``eigh`` on the driver, the one
    step that does not need the cluster. The heavy pass (covariance)
    is exact and distributed.
    """
    mean, cov = whitening_stats(df, id_col, vec_col, max_dim=max_dim)
    return mean, whitening_transform(cov, n_components=n_components, eps=eps)


def whitening_stats(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    max_dim: int = 2048,
):
    """The two distributed passes a whitening fit needs: per-dimension
    exact-decimal means and the exact d x d covariance
    (:func:`embedding_covariance`), returned as numpy arrays. Factored
    out so a caller fitting SEVERAL transforms (ZCA + PCA-k, different
    eps) pays the corpus passes once — :func:`whitening_transform` is
    driver-side numpy over these arrays."""
    import numpy as np

    cov_rows = embedding_covariance(df, id_col, vec_col).collect()
    if not cov_rows:
        raise ValueError("no vectors to fit whitening on")
    d = max(r["j"] for r in cov_rows) + 1
    if d > max_dim:
        raise ValueError(
            f"dimension {d} exceeds max_dim={max_dim}; raise max_dim "
            "explicitly if the driver can hold the d x d covariance"
        )
    means_rows = (
        _points(df, id_col, vec_col)
        .groupBy("__ord")
        .agg(
            F.round(
                F.sum(F.col("__v").cast(_DEC)).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("__mean")
        )
        .collect()
    )
    mean = np.zeros(d)
    for r in means_rows:
        mean[r["__ord"]] = r["__mean"]
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    return mean, cov


def whitening_transform(
    cov,
    *,
    n_components: int | None = None,
    eps: float = 1e-6,
):
    """Driver-side eigh over a fitted covariance: the ``W`` of
    :func:`pca_whitening_model` (ZCA for ``n_components=None``, PCA
    projection otherwise)."""
    import numpy as np

    d = cov.shape[0]
    lam, u = np.linalg.eigh(cov)  # ascending eigenvalues
    scale = 1.0 / np.sqrt(np.maximum(lam, 0.0) + eps)
    if n_components is None:
        return (u * scale) @ u.T  # ZCA
    if not 1 <= n_components <= d:
        raise ValueError(
            f"n_components must be in [1, {d}], got {n_components}"
        )
    top = np.argsort(lam)[::-1][:n_components]
    return (scale[top][:, None]) * u[:, top].T  # PCA


def whiten_embeddings(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    mean,
    w,
    out_col: str = "whitened",
) -> DataFrame:
    """Apply a fitted whitening transform:
    ``out = (x - mean) @ W.T`` as ``array<double>``, one Arrow-batched
    GEMM per batch (the ``brute_force_topk_gemm`` shape — vectorized,
    no per-row Python). ``mean``/``w`` broadcast with the serialized
    closure (d + out_dim*d doubles, small by the model guard)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mean = np.asarray(mean, dtype=np.float64)
    wt = np.asarray(w, dtype=np.float64).T.copy()

    # no type hints: module-level `from __future__ import annotations`
    # stringifies them, which pandas_udf's hint inference can't resolve
    def _apply(vecs):
        x = np.vstack(vecs.to_numpy()).astype(np.float64)
        out = (x - mean) @ wt
        return pd.Series(list(out))

    apply_w = pandas_udf(_apply, "array<double>")

    return df.select(
        F.col(id_col),
        apply_w(F.col(vec_col).cast("array<double>")).alias(out_col),
    )
