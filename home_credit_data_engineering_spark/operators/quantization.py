"""Product quantization (PQ) for compressed ANN at corpus scale.

Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split each vector into ``m`` subvectors, k-means
each subspace into ``2^nbits`` centroids, store each vector as ``m``
small codes. A 64-dim float corpus compresses 256 bytes → ``m`` bytes —
the difference between an ANN index that fits executor memory at 100 TB
and one that doesn't. Queries score against codes via ADC (asymmetric
distance computation): one ``m × 2^nbits`` lookup table per query, then
approximate distance = sum of ``m`` table entries per corpus row.

Spark-first shape, mirroring the IVF build economics
(``operators/similarity.py:ivf_topk``):

- **Training is driver-side numpy over a bounded seeded sample** (the
  codebooks are ~KBs; training a coarse quantizer on a 4096-row sample
  is the standard build — the corpus is only ever *encoded*).
- **Encoding is one Arrow-batched pandas-UDF pass** (batch matmul per
  subspace, no joins, no shuffle).
- **ADC scan is mapInPandas with per-batch partial top-k** (the same
  contract as the GEMM brute-force path: queries broadcast in the
  closure, corpus streamed, only k rows per query per batch survive).
- **Optional exact re-rank**: ADC selects ``rerank`` candidates per
  query; true cosine re-scores them (vectors join back by id — the
  payload-after-candidates rule every ANN path here follows).

Everything is deterministic: the sample is md5-ordered (partitioning-
independent), k-means init is seeded, ties break on id — so recall
against exact brute force is a fixed number and can carry a
bound-verdict oracle like the LSH/IVF legs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from home_credit_data_engineering_spark.functions.vectors import to_double_array

__all__ = [
    "train_pq_codebooks",
    "pq_encode",
    "pq_topk",
    "train_opq",
    "rotate_vectors",
    "opq_topk",
    "train_ivfpq_sidecars",
    "build_ivfpq_index",
    "ivfpq_query_index",
]


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    return np.where(
        norms[:, None] > 0, mat / np.maximum(norms, 1e-300)[:, None], 0.0
    )


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    nbits: int = 4,
    sample_rows: int = 4096,
    seed: int = 42,
    iters: int = 10,
) -> np.ndarray:
    """(m, 2^nbits, dim/m) codebook tensor from a deterministic sample.

    Vectors are unit-normalized before splitting, so ADC's squared-L2
    ranks like cosine (``cos = 1 - d²/2`` on the unit sphere). The
    sample is the ``sample_rows`` lowest ``md5(seed:id)`` rows —
    deterministic under any partitioning (same idiom as
    ``operators/sampling.py``). Lloyd iterations run in numpy with
    seeded init; empty clusters re-seed from the farthest points, so the
    result is a pure function of (sample, seed).
    """
    x = _pq_sample(corpus, vec_col, id_col, sample_rows, seed)
    return _lloyd_codebooks(x, m, nbits, seed, iters)


def _pq_sample(
    corpus: DataFrame, vec_col: str, id_col: str, sample_rows: int, seed: int
) -> np.ndarray:
    """Deterministic unit-normalized training sample (lowest md5 rows)."""
    perm = F.md5(F.concat(F.lit(f"s{seed}:"), F.col(id_col).cast("string")))
    rows = (
        corpus.select(to_double_array(vec_col).alias("__v"), perm.alias("__p"))
        .orderBy("__p")
        .limit(sample_rows)
        .collect()
    )
    return _unit(np.array([r["__v"] for r in rows], dtype=np.float64))


def _lloyd_codebooks(
    x: np.ndarray, m: int, nbits: int, seed: int, iters: int = 10
) -> np.ndarray:
    """Per-subspace Lloyd iterations over an in-memory sample (raw unit
    vectors for shared-codebook PQ; coarse residuals for IVFADC)."""
    if m < 1 or nbits < 1:
        raise ValueError(f"m and nbits must be >= 1, got m={m} nbits={nbits}")
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    dsub, ksub = dim // m, 1 << nbits
    if len(x) < ksub:
        raise ValueError(f"sample of {len(x)} rows < {ksub} centroids")
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        centers = sub[rng.choice(len(sub), ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    centers[c] = sub[mask].mean(axis=0)
                else:  # deterministic re-seed: farthest point from its center
                    centers[c] = sub[d2.min(axis=1).argmax()]
        books[j] = centers
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """(id, pq_code array<int>) — one narrow Arrow-batched pass; no
    shuffle. Codebooks (~KBs) ship in the UDF closure."""
    from pyspark.sql.functions import pandas_udf

    m, ksub, dsub = codebooks.shape
    books = codebooks.copy()

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        x = _unit(np.array(v.tolist(), dtype=np.float64))
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return df.select(
        F.col(id_col), encode(to_double_array(vec_col)).alias(out_col)
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Approximate cosine top-k over PQ codes via ADC.

    ``rerank > 0`` takes that many ADC candidates per query and re-scores
    them with exact cosine (recommended: ``rerank ≈ 10k``) — the
    standard two-stage PQ search. With ``rerank = 0`` the returned
    ``score`` is the ADC cosine approximation ``1 - d²/2``. Excludes
    self-matches. Queries are collected to a matrix bounded by
    ``max_query_rows`` (same guard as the GEMM path).
    """
    m, ksub, dsub = codebooks.shape
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("__v")
    ).limit(max_query_rows + 1).collect()
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"query side exceeds max_query_rows={max_query_rows}; "
            "batch the queries or raise the guard deliberately"
        )
    q_ids = np.array([r["query_id"] for r in q_rows])
    q_mat = _unit(np.array([r["__v"] for r in q_rows], dtype=np.float64))
    # LUT[q, j, c] = ||q_sub_j - centroid_jc||²  (nq × m × ksub, ~KBs)
    lut = np.empty((len(q_ids), m, ksub))
    for j in range(m):
        qs = q_mat[:, j * dsub : (j + 1) * dsub]
        lut[:, j, :] = ((qs[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(
            axis=2
        )

    codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    take = max(k, rerank)

    def adc_scan(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            c = np.array(pdf["pq_code"].tolist(), dtype=np.int64)  # (b, m)
            # d²(q, row) = Σ_j LUT[q, j, c[row, j]]
            d2 = np.zeros((len(q_ids), len(ids)))
            for j in range(m):
                d2 += lut[:, j, :][:, c[:, j]]
            out_q, out_n, out_s = [], [], []
            for qi in range(len(q_ids)):
                # stable partial top-take: (d², neighbor_id) lexicographic
                order = np.lexsort((ids, d2[qi]))[: take + 1]
                for oi in order:
                    if ids[oi] == q_ids[qi]:
                        continue
                    out_q.append(q_ids[qi])
                    out_n.append(ids[oi])
                    out_s.append(1.0 - d2[qi][oi] / 2.0)
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "__approx": out_s}
            )

    scored = codes.mapInPandas(
        adc_scan, schema="query_id long, neighbor_id long, __approx double"
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.desc("__approx"), F.asc("neighbor_id")
    )
    if rerank <= 0:
        return (
            scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.round(F.col("__approx"), 6).alias("score"),
            )
        )
    # two-stage: ADC candidates → exact cosine on the true vectors
    from home_credit_data_engineering_spark.functions.vectors import cosine_arrow

    cands = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= rerank)
        .select("query_id", "neighbor_id")
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"),
        to_double_array(vec_col).alias("__qv"),
    )
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        to_double_array(vec_col).alias("__cv"),
    )
    exact = (
        cands.join(F.broadcast(q_vecs), "query_id")
        .join(c_vecs, "neighbor_id")
        .withColumn("score", F.round(cosine_arrow(F.col("__qv"), F.col("__cv")), 6))
        .drop("__qv", "__cv")
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        exact.withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def assign_encode_udf(
    c_unit: np.ndarray,
    books: np.ndarray,
    rot: np.ndarray | None,
    residual: bool,
):
    """Pandas UDF mapping a raw vector to its (coarse cell, PQ code) under
    fixed centroids/codebooks/rotation. Shared by the one-time build and
    the O(Δ) increment (``operators/ann_state.py``) so the two paths can
    never encode differently."""
    from pyspark.sql.functions import pandas_udf

    m, _, dsub = books.shape

    @pandas_udf("struct<cell:int, code:array<int>>")
    def assign_and_encode(v: pd.Series) -> pd.DataFrame:
        x = _unit(np.array(v.tolist(), dtype=np.float64))
        if rot is not None:
            x = x @ rot
        cells = np.argsort(-(x @ c_unit.T), axis=1, kind="stable")[:, 0]
        if residual:
            x = x - c_unit[cells]
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.DataFrame(
            {"cell": cells.astype("int32"), "code": list(codes)}
        )

    return assign_and_encode


def train_ivfpq_sidecars(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    train_fraction: float | None = None,
    residual: bool = False,
    opq: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Train the IVF-PQ model state — coarse centroids, PQ codebooks and
    the optional OPQ rotation — without touching disk. The encode step
    (:func:`build_ivfpq_index`) and the streaming bootstrap
    (``streaming/ann.py``) share this so a streamed index is trained by
    exactly the one-shot builder's recipe. Returns
    ``(centroids, codebooks, rotation_or_None)``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.functions import pandas_udf

    rot = None
    if opq:
        rot, _ = train_opq(
            corpus, vec_col=vec_col, id_col=id_col, m=m, nbits=nbits, seed=seed
        )

    @pandas_udf("array<double>")
    def _rotated(v: pd.Series) -> pd.Series:
        x = np.array(v.tolist(), dtype=np.float64) @ rot
        return pd.Series(list(x))

    train_src = (
        corpus.sample(fraction=train_fraction, seed=seed)
        if train_fraction is not None
        else corpus
    )
    train_arr = to_double_array(vec_col)
    if rot is not None:
        train_arr = _rotated(train_arr)
    train = train_src.select(array_to_vector(train_arr).alias("features"))
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=5, initMode="random"
    ).fit(train)
    centers = np.array(
        [list(c) for c in model.clusterCenters()], dtype=np.float64
    )
    c_unit = _unit(centers)

    sample = _pq_sample(corpus, vec_col, id_col, 4096, seed)
    if rot is not None:
        sample = sample @ rot
    if residual:
        s_cells = np.argsort(-(sample @ c_unit.T), axis=1, kind="stable")[:, 0]
        books = _lloyd_codebooks(sample - c_unit[s_cells], m, nbits, seed)
    else:
        books = _lloyd_codebooks(sample, m, nbits, seed)
    return centers, books, rot


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    train_fraction: float | None = None,
    residual: bool = False,
    opq: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Persist a FAISS-style IVF-PQ index: cell-partitioned parquet of
    (id, pq_code) plus the coarse centroids and PQ codebooks.

    ``opq=True`` trains an OPQ rotation (:func:`train_opq`) first and
    builds the ENTIRE index — coarse centroids, codebooks, codes — in
    the rotated space (rotation saved as ``_rotation.npy``; the query
    path auto-detects and rotates queries to match). Orthogonal
    rotations preserve cosines, so the vectors store and the exact
    re-rank stage stay in the ORIGINAL space unchanged. With
    ``residual=True`` the rotation is trained against the
    shared-codebook objective and applied before the coarse step — the
    standard practical OPQ+IVFADC composition.

    The serving combination for 100 TB ANN: partition pruning bounds I/O
    to the probed cells (like :func:`~.similarity.build_ivf_index`), and
    PQ codes shrink what those cells store ~16× (``m`` codes per vector
    vs the full float array), so a probed cell fits memory even when the
    corpus doesn't. Original vectors are kept beside the codes under
    ``vectors/`` for the exact re-rank stage — read only for the final
    candidate slate, never during the ADC scan.

    Two quantization modes:

    - ``residual=False`` (default): codes quantize the RAW
      (unit-normalized) vectors with one shared codebook — one LUT per
      query at serve time, the cheapest scan.
    - ``residual=True``: proper IVFADC (Jégou et al., "Product
      Quantization for Nearest Neighbor Search", TPAMI 2011) — codes
      quantize ``x - centroid(cell)``. Residuals are smaller and more
      isotropic than raw vectors, so the same code budget reconstructs
      tighter and ADC ranks better at low ``m``/``nbits``; the price is
      a per-(query, probed-cell) lookup table at serve time (closure
      memory scales with ``n_probe``).

    Returns (centroids, codebooks); both are also saved under ``path``
    along with the residual flag (the query path auto-detects it).

    ``path`` must be a LOCAL filesystem path: the centroid/codebook
    sidecars go through ``os.makedirs`` + ``np.save`` (driver-local),
    unlike the parquet legs which go through Spark's Hadoop filesystem.
    For ``hdfs://`` / ``s3://`` deployments, write the sidecars to a
    local staging dir and upload, or keep the returned arrays and pass
    them to the query path directly. Same limitation in
    ``jobs/ann_index``.
    """
    import os

    centers, books, rot = train_ivfpq_sidecars(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        m=m,
        nbits=nbits,
        seed=seed,
        train_fraction=train_fraction,
        residual=residual,
        opq=opq,
    )
    c_unit = _unit(centers)

    assign_and_encode = assign_encode_udf(c_unit, books, rot, residual)

    enc = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        assign_and_encode(to_double_array(vec_col)).alias("__ae"),
    ).select(
        id_col,
        vec_col,
        F.col("__ae.cell").alias("cell"),
        F.col("__ae.code").alias("pq_code"),
    ).localCheckpoint(eager=True)  # encode ONCE: codes + vectors + stats
    # repartition on the partition key: one file per cell instead of
    # input_partitions x cells (the increment/compaction discipline)
    enc.select(id_col, "pq_code", "cell").repartition("cell").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(os.path.join(path, "codes"))
    enc.repartition("cell").select(id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "vectors"))
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, "_centroids.npy"), centers)
    np.save(os.path.join(path, "_codebooks.npy"), books)
    np.save(os.path.join(path, "_residual.npy"), np.array([int(residual)]))
    if rot is not None:
        np.save(os.path.join(path, "_rotation.npy"), rot)
    from home_credit_data_engineering_spark.sources.maintenance import (
        write_state_layout,
    )

    write_state_layout(path, "batch", "ivfpq")
    # Seed the per-cell running stats for the O(Δ) increment path's
    # drift tracking (ann_state.ivfpq_index_increment).
    from home_credit_data_engineering_spark.operators.ann_state import (
        refresh_cell_stats_from_index,
    )

    refresh_cell_stats_from_index(
        corpus.sparkSession, path, id_col=id_col, vec_col=vec_col
    )
    return centers, books


def ivfpq_query_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    rerank: int = 50,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Query a persisted IVF-PQ index: partition-pruned code scan → ADC →
    exact re-rank from the vectors store. The index's quantization mode
    (shared-codebook vs residual IVFADC) is auto-detected from the
    persisted flag; residual mode builds one lookup table per
    (query, probed cell) instead of per query.

    I/O contract: the codes scan reads ONLY probed cell partitions
    (PartitionFilters, plan-assertable); the vectors store is touched
    only for the ≤ queries × rerank candidate slate via a broadcast
    semi-selective join. Returns (query_id, neighbor_id, score, rank)
    with exact cosine scores when ``rerank > 0``.

    ``path`` must be a LOCAL filesystem path (the centroid/codebook
    sidecars load via ``np.load``) — see :func:`build_ivfpq_index`.
    """
    import os

    centers = np.load(os.path.join(path, "_centroids.npy"))
    books = np.load(os.path.join(path, "_codebooks.npy"))
    res_flag = os.path.join(path, "_residual.npy")
    residual = bool(np.load(res_flag)[0]) if os.path.exists(res_flag) else False
    rot_flag = os.path.join(path, "_rotation.npy")
    rot = np.load(rot_flag) if os.path.exists(rot_flag) else None
    m, ksub, dsub = books.shape
    c_unit = _unit(centers)

    q_rows = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("__v")
    ).limit(max_query_rows + 1).collect()
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"query side exceeds max_query_rows={max_query_rows}"
        )
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, score double, rank int"
        )
    q_ids = np.array([r["query_id"] for r in q_rows])
    q_mat = _unit(np.array([r["__v"] for r in q_rows], dtype=np.float64))
    if rot is not None:
        q_mat = q_mat @ rot  # OPQ index: probe/LUT in the rotated space
    probe_order = np.argsort(-(q_mat @ c_unit.T), axis=1, kind="stable")[
        :, :n_probe
    ]
    probed = sorted({int(c) for row in probe_order for c in row})

    def _lut_for(qs_mat: np.ndarray) -> np.ndarray:
        out = np.empty((len(qs_mat), m, ksub))
        for j in range(m):
            sub = qs_mat[:, j * dsub : (j + 1) * dsub]
            out[:, j, :] = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(
                axis=2
            )
        return out

    # query qi scans only its own probed cells
    q_probes = {int(q): {int(c) for c in probe_order[i]} for i, q in enumerate(q_ids)}
    if residual:
        # IVFADC: codes quantize x - centroid(cell), so the lookup table
        # is per (query, probed cell) over the query's residual w.r.t.
        # that cell. Ragged layout keeps closure memory at
        # n_queries * n_probe * m * ksub doubles (n_probe x the shared-
        # codebook path), bounded by the max_query_rows guard above.
        cell_luts: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for cell in probed:
            q_idx = np.array(
                [i for i in range(len(q_ids)) if cell in q_probes[int(q_ids[i])]]
            )
            cell_luts[cell] = (q_idx, _lut_for(q_mat[q_idx] - c_unit[cell]))
        lut = None
    else:
        lut = _lut_for(q_mat)
        cell_luts = {}
    take = max(k, rerank)

    codes = spark.read.parquet(os.path.join(path, "codes")).filter(
        F.col("cell").isin(probed)  # partition-pruned scan
    )

    def adc_scan(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy()
            c = np.array(pdf["pq_code"].tolist(), dtype=np.int64)
            if residual:
                # per-cell scatter: each probed cell has its own LUT and
                # its own subset of interested queries; everything else
                # stays +inf and is masked out below.
                d2 = np.full((len(q_ids), len(ids)), np.inf)
                for cell_val in np.unique(cells):
                    entry = cell_luts.get(int(cell_val))
                    if entry is None:
                        continue
                    q_idx, lutc = entry
                    if not len(q_idx):
                        continue
                    cmask = cells == cell_val
                    csub = c[cmask]
                    dc = np.zeros((len(q_idx), int(cmask.sum())))
                    for j in range(m):
                        dc += lutc[:, j, :][:, csub[:, j]]
                    d2[np.ix_(q_idx, np.where(cmask)[0])] = dc
            else:
                d2 = np.zeros((len(q_ids), len(ids)))
                for j in range(m):
                    d2 += lut[:, j, :][:, c[:, j]]
            out_q, out_n, out_s = [], [], []
            for qi in range(len(q_ids)):
                mask = np.array(
                    [int(cl) in q_probes[int(q_ids[qi])] for cl in cells]
                )
                if not mask.any():
                    continue
                sub_ids, sub_d2 = ids[mask], d2[qi][mask]
                order = np.lexsort((sub_ids, sub_d2))[: take + 1]
                for oi in order:
                    if sub_ids[oi] == q_ids[qi]:
                        continue
                    out_q.append(q_ids[qi])
                    out_n.append(sub_ids[oi])
                    out_s.append(1.0 - sub_d2[oi] / 2.0)
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "__approx": out_s}
            )

    scored = codes.mapInPandas(
        adc_scan, schema="query_id long, neighbor_id long, __approx double"
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("__approx"), F.asc("neighbor_id"))
    if rerank <= 0:
        return (
            scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.round("__approx", 6).alias("score"),
                F.col("__rk").cast("int").alias("rank"),
            )
        )
    from home_credit_data_engineering_spark.functions.vectors import cosine_arrow

    cands = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= rerank)
        .select("query_id", "neighbor_id")
    )
    q_vec_df = spark.createDataFrame(
        [(int(r["query_id"]), list(map(float, r["__v"]))) for r in q_rows],
        "query_id long, __qv array<double>",
    )
    vectors = spark.read.parquet(os.path.join(path, "vectors")).select(
        F.col(id_col).alias("neighbor_id"),
        to_double_array(vec_col).alias("__cv"),
    )
    exact = (
        cands.join(F.broadcast(q_vec_df), "query_id")
        .join(vectors, "neighbor_id")
        .withColumn("score", F.round(cosine_arrow(F.col("__qv"), F.col("__cv")), 6))
        .drop("__qv", "__cv")
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        exact.withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= k)
        .select("query_id", "neighbor_id", "score", F.col("__rk").cast("int").alias("rank"))
    )


def _pq_reconstruct(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Encode then decode ``x`` through ``books`` (training-time helper)."""
    m, ksub, dsub = books.shape
    out = np.empty_like(x)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        out[:, j * dsub : (j + 1) * dsub] = books[j][d2.argmin(axis=1)]
    return out


def train_opq(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    nbits: int = 4,
    sample_rows: int = 4096,
    seed: int = 42,
    iters: int = 10,
    opq_iters: int = 5,
) -> tuple[np.ndarray, np.ndarray]:
    """Optimized Product Quantization (Ge et al., CVPR 2013, the
    non-parametric OPQ_NP): learn an ORTHOGONAL rotation ``R`` that
    axis-aligns the data's correlations before the PQ subspace split,
    alternating (fix R → Lloyd codebooks on the rotated sample) with
    (fix codebooks → orthogonal Procrustes ``R = U·Vᵀ`` from
    ``svd(Xᵀ·Q)``). Plain PQ quantizes each aligned subspace
    independently, so correlated/anisotropic embeddings (the realistic
    case — learned embeddings concentrate variance in a few directions)
    waste code budget; the rotation redistributes variance across
    subspaces and strictly lowers training quantization error.

    Returns ``(R, codebooks)`` — both ~KBs, both pure functions of
    (sample, seed) (same determinism contract as
    :func:`train_pq_codebooks`; the SVD of a full-rank cross-covariance
    is unique up to sign conventions LAPACK fixes deterministically).
    Rotation preserves norms and cosines, so downstream exact re-ranking
    is unchanged whether it uses rotated or original vectors.
    """
    x = _pq_sample(corpus, vec_col, id_col, sample_rows, seed)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    if opq_iters < 1:
        raise ValueError(f"opq_iters must be >= 1, got {opq_iters}")
    rot = np.eye(dim)
    books = None
    for _ in range(opq_iters):
        xr = x @ rot
        books = _lloyd_codebooks(xr, m, nbits, seed, iters)
        q = _pq_reconstruct(xr, books)
        u, _, vt = np.linalg.svd(x.T @ q)
        rot = u @ vt
    books = _lloyd_codebooks(x @ rot, m, nbits, seed, iters)
    return rot, books


def rotate_vectors(
    df: DataFrame,
    rotation: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "rotated",
) -> DataFrame:
    """(id, out_col array<double>) — one narrow Arrow-batched matmul per
    batch; the dim×dim rotation (~KBs) ships in the UDF closure, no
    shuffle. Orthogonal rotations preserve norms and cosines."""
    from pyspark.sql.functions import pandas_udf

    rot = np.ascontiguousarray(rotation, dtype=np.float64)

    @pandas_udf("array<double>")
    def rotate(v: pd.Series) -> pd.Series:
        x = np.array(v.tolist(), dtype=np.float64) @ rot
        return pd.Series(list(x))

    return df.select(
        F.col(id_col), rotate(to_double_array(vec_col)).alias(out_col)
    )


def opq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 4,
    sample_rows: int = 4096,
    seed: int = 42,
    rerank: int = 0,
    max_query_rows: int = 100_000,
    opq_iters: int = 5,
) -> DataFrame:
    """:func:`pq_topk` with a learned OPQ rotation: train R + codebooks
    on the bounded sample, rotate corpus and queries (one narrow
    Arrow-batched pass each), run the identical ADC scan. Same output
    contract and determinism as :func:`pq_topk`; at equal code budget
    recall on correlated data is at least the plain-PQ recall
    (asserted on planted anisotropic fixtures in
    ``tests/test_quantization.py``)."""
    rot, books = train_opq(
        corpus,
        vec_col=vec_col,
        id_col=id_col,
        m=m,
        nbits=nbits,
        sample_rows=sample_rows,
        seed=seed,
        opq_iters=opq_iters,
    )
    rc = rotate_vectors(corpus, rot, id_col=id_col, vec_col=vec_col)
    rq = rotate_vectors(queries, rot, id_col=id_col, vec_col=vec_col)
    return pq_topk(
        rc,
        rq,
        books,
        k=k,
        id_col=id_col,
        vec_col="rotated",
        rerank=rerank,
        max_query_rows=max_query_rows,
    )
