"""Distributed k-means operator semantics (cross-engine exactness is
covered by the DuckDB twins in tests/test_oracle_parity.py — these pin
the algorithm's behavior on constructed fixtures)."""

from __future__ import annotations

import pytest

from home_credit_data_engineering_spark.operators.cluster import (
    cluster_sizes,
    kmeans,
    kmeans_fit,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, schema="vec_id bigint, embedding array<float>"
    )


def test_separated_blobs_are_recovered(spark):
    # two tight blobs far apart: any 2-means fit must split them
    blob_a = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(4)]
    blob_b = [(10 + i, [5.0 + 0.01 * i, 5.0]) for i in range(4)]
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans(_df(spark, blob_a + blob_b), k=2, iterations=3).collect()
    }
    a_clusters = {got[i] for i, _ in blob_a}
    b_clusters = {got[i] for i, _ in blob_b}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters


def test_assignment_distance_is_squared_l2_to_final_centroid_source(spark):
    # one cluster, one point at distance: centroid after the update is
    # the mean, but the reported dist is against the PRE-update centroid
    # the assignment ran on — for k=1, iteration 1 assigns to the init
    # centroid (the single md5-first point)
    rows = [(1, [0.0, 0.0]), (2, [3.0, 4.0])]
    out = {
        r["vec_id"]: r
        for r in kmeans(_df(spark, rows), k=1, iterations=1).collect()
    }
    assert set(out) == {1, 2}
    dists = sorted(r["dist"] for r in out.values())
    assert dists[0] == pytest.approx(0.0, abs=1e-9)
    assert dists[1] == pytest.approx(25.0, abs=1e-6)  # 3^2 + 4^2


def test_empty_cluster_is_dropped(spark):
    # two coincident points + one far point, k=3: the init places two
    # centroids on the SAME coordinates; the tie (dist equal) breaks to
    # the lower cid, so one centroid attracts nothing and is dropped.
    rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [9.0, 9.0])]
    assign, cent = kmeans_fit(_df(spark, rows), k=3, iterations=2)
    clusters = {r["cluster"] for r in assign.collect()}
    live = {r["cluster"] for r in cent.collect()}
    assert live == clusters
    assert len(live) == 2  # one of the three seeds died


def test_centroids_are_means_of_assigned_points(spark):
    rows = [
        (1, [0.0, 0.0]), (2, [1.0, 1.0]),
        (11, [10.0, 10.0]), (12, [12.0, 12.0]),
    ]
    assign, cent = kmeans_fit(_df(spark, rows), k=2, iterations=3)
    got_assign = {r["vec_id"]: r["cluster"] for r in assign.collect()}
    got_cent = {
        (r["cluster"], r["ord"]): r["value"] for r in cent.collect()
    }
    pts = dict(rows)
    for cid in set(got_assign.values()):
        members = [pts[i] for i, c in got_assign.items() if c == cid]
        for ord_ in (0, 1):
            mean = sum(m[ord_] for m in members) / len(members)
            assert got_cent[(cid, ord_)] == pytest.approx(mean, abs=1e-8)


def test_deterministic_across_runs(spark):
    rows = [(i, [float(i % 5), float(i % 7)]) for i in range(30)]
    a = sorted(map(tuple, kmeans(_df(spark, rows), k=4, iterations=2).collect()))
    b = sorted(map(tuple, kmeans(_df(spark, rows), k=4, iterations=2).collect()))
    assert a == b


def test_checkpoint_false_matches_checkpointed_run(spark):
    rows = [(i, [float(i % 3), float(i // 3)]) for i in range(12)]
    on = sorted(map(tuple, kmeans(_df(spark, rows), k=3, iterations=2).collect()))
    off = sorted(
        map(
            tuple,
            kmeans(
                _df(spark, rows), k=3, iterations=2, checkpoint=False
            ).collect(),
        )
    )
    assert on == off


def test_cluster_sizes(spark):
    rows = [(1, [0.0]), (2, [0.1]), (3, [9.0])]
    assign = kmeans(_df(spark, rows), k=2, iterations=2)
    sizes = {r["cluster"]: r["n"] for r in cluster_sizes(assign).collect()}
    assert sorted(sizes.values()) == [1, 2]


def test_validation(spark):
    df = _df(spark, [(1, [0.0])])
    with pytest.raises(ValueError):
        kmeans(df, k=0, iterations=1)
    with pytest.raises(ValueError):
        kmeans(df, k=1, iterations=0)
    with pytest.raises(ValueError):
        kmeans(df, k=1, iterations=1, impl="nope")


def test_kmeans_array_impl_equals_explode(spark):
    """r14 optimization: the zero-shuffle array assignment must yield
    bit-identical assignments AND centroids to the r13 exploded
    scalar-triple form — same round-9 terms, same order-free decimal
    sums, same (dist, cid) argmin tie-break — on a fixture with
    coincident points (tie-break), an empty cluster (drop rule), and
    k > 1 surviving clusters."""
    rows = [
        (1, [0.0, 0.0]),
        (2, [0.0, 0.0]),
        (3, [9.0, 9.0]),
        (4, [9.1, 8.9]),
        (5, [0.2, -0.1]),
    ]
    df = _df(spark, rows)
    outs = {}
    for impl in ("array", "explode"):
        assign, cent = kmeans_fit(df, k=3, iterations=2, impl=impl)
        outs[impl] = (
            sorted(map(tuple, assign.collect())),
            sorted(map(tuple, cent.collect())),
        )
    assert outs["array"][0] == outs["explode"][0]
    assert outs["array"][1] == outs["explode"][1]


# ---------------------------------------------------------------------------
# embedding_covariance / PCA-ZCA whitening
# ---------------------------------------------------------------------------

import numpy as np
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.cluster import (
    embedding_covariance,
    pca_whitening_model,
    whiten_embeddings,
)


def _emb_df(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(
        rows, schema="vec_id bigint, embedding array<double>"
    )


def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(7)
    x = np.round(rng.normal(size=(40, 5)), 6)
    df = _emb_df(spark, x)
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(df, "vec_id", "embedding").collect()
    }
    ref = np.cov(x, rowvar=False, bias=True)  # population covariance
    assert len(got) == 5 * 6 // 2
    for (i, j), v in got.items():
        assert v == pytest.approx(ref[i, j], abs=1e-6), (i, j)


def test_covariance_array_impl_equals_explode(spark):
    """r14 optimization: the joinless per-row pair generation must be
    bit-identical to the r13 exploded self-join form (same round-9
    products, same order-free decimal cell sums)."""
    rng = np.random.default_rng(11)
    x = np.round(rng.normal(size=(25, 6)), 6)
    df = _emb_df(spark, x)
    a = sorted(
        map(
            tuple,
            embedding_covariance(
                df, "vec_id", "embedding", impl="array"
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            embedding_covariance(
                df, "vec_id", "embedding", impl="explode"
            ).collect(),
        )
    )
    assert a == b
    with pytest.raises(ValueError):
        embedding_covariance(df, "vec_id", "embedding", impl="nope")


def test_covariance_partitioning_invariant(spark):
    rng = np.random.default_rng(3)
    x = np.round(rng.normal(size=(30, 4)), 6)
    a = embedding_covariance(
        _emb_df(spark, x).repartition(1), "vec_id", "embedding"
    ).collect()
    b = embedding_covariance(
        _emb_df(spark, x).repartition(7), "vec_id", "embedding"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_zca_whitening_yields_identity_covariance(spark):
    rng = np.random.default_rng(11)
    # correlated data: x2 = x1 + noise
    base = rng.normal(size=(200, 1))
    x = np.round(np.hstack([base, base + 0.1 * rng.normal(size=(200, 1)),
                            rng.normal(size=(200, 2))]), 6)
    df = _emb_df(spark, x)
    mean, w = pca_whitening_model(df, "vec_id", "embedding")
    assert w.shape == (4, 4)
    white = whiten_embeddings(df, "vec_id", "embedding", mean, w)
    wc = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(
            white, "vec_id", "whitened"
        ).collect()
    }
    for (i, j), v in wc.items():
        expect = 1.0 if i == j else 0.0
        assert v == pytest.approx(expect, abs=0.01), (i, j)


def test_pca_whitening_reduces_dimension(spark):
    rng = np.random.default_rng(13)
    x = np.round(rng.normal(size=(100, 6)), 6)
    df = _emb_df(spark, x)
    mean, w = pca_whitening_model(df, "vec_id", "embedding", n_components=2)
    assert w.shape == (2, 6)
    white = whiten_embeddings(df, "vec_id", "embedding", mean, w)
    [row] = white.agg(F.max(F.size("whitened")).alias("d")).collect()
    assert row["d"] == 2
    wc = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(white, "vec_id", "whitened").collect()
    }
    assert wc[(0, 0)] == pytest.approx(1.0, abs=0.01)
    assert wc[(1, 1)] == pytest.approx(1.0, abs=0.01)
    assert wc[(0, 1)] == pytest.approx(0.0, abs=0.01)


def test_whitening_model_guards(spark):
    df = _emb_df(spark, np.zeros((5, 3)))
    with pytest.raises(ValueError):
        pca_whitening_model(df, "vec_id", "embedding", max_dim=2)
    with pytest.raises(ValueError):
        pca_whitening_model(df, "vec_id", "embedding", n_components=9)
    empty = spark.createDataFrame(
        [], schema="vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError):
        pca_whitening_model(empty, "vec_id", "embedding")
