"""Behavioral tests for dedup and similarity operators on planted data.

The driver's synthetic corpus has no true duplicates and its embeddings are
isotropic random vectors, so these tests plant the structure the operators
exist to find: exact copies, light edits, and clustered vectors.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    simhash_near_pairs,
    simhash_signatures,
)
from home_credit_data_engineering_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
EDITED = BASE.replace("warm windowsill", "cold doorstep")  # light edit
OTHER = (
    "completely different content about spark query engines and columnar "
    "execution with vectorized readers and adaptive optimization at scale"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact duplicate of 1
        (3, EDITED),  # near duplicate of 1
        (4, OTHER),
        (5, "  " + BASE + "  "),  # whitespace-normalized duplicate of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    groups = {r["keep_id"]: r for r in exact_dedup(docs, "doc_id", "text").collect()}
    assert groups[1]["dup_count"] == 3  # 1, 2, and the padded 5
    assert groups[1]["member_ids"] == [1, 2, 5]
    assert groups[3]["dup_count"] == 1
    assert groups[4]["dup_count"] == 1


def test_minhash_finds_planted_near_dup(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_dedup(
            docs, "doc_id", "text", num_hashes=32, bands=16, threshold=0.5
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0  # exact copies
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0  # light edit
    assert all(4 not in pair for pair in pairs)  # unrelated doc never pairs


def test_simhash_distances(docs):
    sigs = simhash_signatures(docs, "doc_id", "text")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(sigs, max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0  # identical text → identical signature
    assert pairs[(1, 5)] == 0  # whitespace-insensitive tokenization
    assert (1, 3) in pairs and pairs[(1, 3)] <= 10  # light edit stays close
    assert all(4 not in pair for pair in pairs)


def test_minhash_md5_finds_planted_near_dup(docs):
    from home_credit_data_engineering_spark.operators.dedup import (
        minhash_md5_pairs,
    )

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_md5_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=16, threshold=0.5
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0  # exact copies
    assert pairs[(1, 5)] == 1.0  # whitespace-insensitive tokenization
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0  # light edit
    assert all(4 not in pair for pair in pairs)  # unrelated doc never pairs


def test_simhash_md5_distances(docs):
    from home_credit_data_engineering_spark.operators.dedup import (
        simhash_md5_pairs,
        simhash_md5_signatures,
    )

    sigs = simhash_md5_signatures(docs, "doc_id", "text")
    for r in sigs.collect():
        assert 0 <= r["simhash"] < (1 << 32)  # 32-bit signature domain
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_md5_pairs(sigs, max_hamming=8).collect()
    }
    assert pairs[(1, 2)] == 0  # identical text -> identical signature
    assert pairs[(1, 5)] == 0  # whitespace-insensitive tokenization
    assert (1, 3) in pairs and pairs[(1, 3)] <= 8  # light edit stays close
    assert all(4 not in pair for pair in pairs)


def test_lsh_oversized_buckets_observable(spark):
    """Dropped hot buckets must be visible, and dropping them must remove
    exactly their pairs — never a silent recall loss."""
    from home_credit_data_engineering_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        oversized_buckets,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, text) for i in range(5)] + [(99, "totally different words here x y z")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=16)
    # All 5 identical docs share every band bucket -> bucket size 5.
    dropped = oversized_buckets(sigs, bands=4, max_bucket=4, num_hashes=16).collect()
    assert dropped and all(r["bucket_size"] == 5 for r in dropped)
    assert all(r["doc_ids"] == [0, 1, 2, 3, 4] for r in dropped)
    pairs_capped = lsh_candidate_pairs(
        sigs, bands=4, max_bucket=4, num_hashes=16
    ).collect()
    assert pairs_capped == []  # every bucket of the clones was dropped
    pairs_uncapped = lsh_candidate_pairs(
        sigs, bands=4, max_bucket=1000, num_hashes=16
    ).collect()
    assert len(pairs_uncapped) == 10  # C(5,2) clone pairs


def test_simhash_chunk_bucket_cap_observable(spark):
    from home_credit_data_engineering_spark.operators.dedup import (
        simhash_near_pairs,
        simhash_oversized_chunks,
        simhash_signatures,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, text) for i in range(6)], "doc_id long, text string"
    )
    sigs = simhash_signatures(docs, "doc_id", "text")
    # 6 clones share all 4 chunk buckets; cap at 5 drops every bucket.
    assert simhash_near_pairs(sigs, max_hamming=3, max_bucket=5).collect() == []
    audit = simhash_oversized_chunks(sigs, max_hamming=3, max_bucket=5).collect()
    assert len(audit) == 4 and all(r["chunk_size"] == 6 for r in audit)
    # Default cap never triggers: all 15 clone pairs at hamming 0.
    assert simhash_near_pairs(sigs, max_hamming=3).count() == 15


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    """20 clusters × 10 members: base direction + small noise → true
    nearest neighbors are in-cluster. Noise scale 0.05 keeps in-cluster
    cosine ≈ 0.93 (0.05·√64 ≈ 0.4 noise norm vs unit base)."""
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for cluster in range(20):
        base = rng.standard_normal(64)
        base /= np.linalg.norm(base)
        for _ in range(10):
            noisy = base + 0.05 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in noisy], cluster))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_bruteforce_topk_finds_cluster(clustered_vectors):
    queries = clustered_vectors.filter(F.col("vec_id") % 10 == 0)
    top = brute_force_topk(clustered_vectors, queries, k=5)
    joined = (
        top.join(
            clustered_vectors.select(
                F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
            ),
            on="query_id",
        )
        .join(
            clustered_vectors.select(
                F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
            ),
            on="neighbor_id",
        )
    )
    rows = joined.collect()
    in_cluster = sum(r["q_label"] == r["n_label"] for r in rows)
    assert in_cluster / len(rows) > 0.95  # top-5 of a tight cluster


def test_bruteforce_gemm_matches_pair_formulation(clustered_vectors):
    from home_credit_data_engineering_spark.operators.similarity import (
        brute_force_topk_gemm,
    )

    queries = clustered_vectors.filter(F.col("vec_id") % 10 == 0)
    key = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["neighbor_id"], r["score"])
        for r in df.collect()
    )
    assert key(brute_force_topk_gemm(clustered_vectors, queries, k=5)) == key(
        brute_force_topk(clustered_vectors, queries, k=5)
    )


def test_ivf_topk_recall_vs_bruteforce(clustered_vectors):
    from home_credit_data_engineering_spark.operators.similarity import ivf_topk

    queries = clustered_vectors.filter(F.col("vec_id") % 10 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(clustered_vectors, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            clustered_vectors, queries, k=3, n_centroids=20, n_probe=3
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall:.2f} too low on clustered data"


def test_lsh_topk_recall_vs_bruteforce(clustered_vectors):
    queries = clustered_vectors.filter(F.col("vec_id") % 10 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(clustered_vectors, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(
            clustered_vectors, queries, dim=64, k=3, n_bits=6, n_tables=8
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} too low on clustered data"


def test_connected_components_chains(spark):
    from home_credit_data_engineering_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 20)],
        "doc_a long, doc_b long",
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1  # chain collapses
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == comp[22] == 20  # cycle
    assert comp[1] != comp[10] != comp[20]


def test_winnowing_detects_partial_overlap(spark):
    from home_credit_data_engineering_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, f"{shared} alpha beta gamma delta epsilon zeta eta theta"),
        (2, f"unrelated prefix words here {shared}"),  # shares a long span
        (3, "totally different vocabulary with no common span at all okay"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnowing_fingerprints(docs, "doc_id", "text")
    by_doc = {
        r["doc_id"]: set()
        for r in docs.collect()
    }
    for r in fps.collect():
        by_doc[r["doc_id"]].add(r["fingerprint"])
    # The 10-token shared span (>= window+k-1 = 6) must yield overlap.
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_bruteforce_gemm_empty_queries(clustered_vectors):
    from home_credit_data_engineering_spark.operators.similarity import (
        brute_force_topk_gemm,
    )

    empty = clustered_vectors.filter(F.col("vec_id") < 0)
    assert brute_force_topk_gemm(clustered_vectors, empty, k=3).count() == 0


def test_kgram_stream_unigrams(spark):
    from home_credit_data_engineering_spark.operators.dedup import kgram_hash_stream

    df = spark.createDataFrame([(1, "a b c"), (2, "")], "doc_id long, text string")
    rows = kgram_hash_stream(df, "doc_id", "text", k=1).collect()
    assert sum(1 for r in rows if r["doc_id"] == 1) == 3


def test_embedding_neardup_blocked_matches_exact(clustered_vectors):
    """The LSH-blocked path (default above block_threshold) finds nearly
    all exact-path pairs (recall floor) with zero false positives (exact
    cosine re-rank) on planted clusters."""
    from home_credit_data_engineering_spark.operators.dedup import (
        _embedding_near_pairs_blocked,
        embedding_near_pairs,
    )

    exact = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in embedding_near_pairs(
            clustered_vectors, threshold=0.9, block_threshold=10_000
        ).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in _embedding_near_pairs_blocked(
            clustered_vectors, "vec_id", "embedding", threshold=0.9
        ).collect()
    }
    assert exact, "planted clusters must yield pairs"
    # no false positives, identical scores where found
    for pair, score in blocked.items():
        assert pair in exact and exact[pair] == score
    recall = len(blocked) / len(exact)
    assert recall >= 0.9, f"blocked recall {recall:.3f} < 0.9"


def test_embedding_neardup_routes_to_blocked(clustered_vectors):
    """Above block_threshold the default path must not cross-join the
    corpus: no CartesianProduct, and the only nested-loop join allowed is
    the one-row planes broadcast."""
    from home_credit_data_engineering_spark.operators.dedup import (
        embedding_near_pairs,
    )

    routed = embedding_near_pairs(clustered_vectors, threshold=0.9, block_threshold=10)
    routed.collect()  # force execution so the AQE-final plan is available
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gemm_query_guard(clustered_vectors):
    from home_credit_data_engineering_spark.operators.similarity import (
        brute_force_topk_gemm,
    )

    queries = clustered_vectors.filter(F.col("vec_id") % 10 == 0)
    with pytest.raises(ValueError, match="max_query_rows"):
        brute_force_topk_gemm(clustered_vectors, queries, k=3, max_query_rows=5)


def test_connected_components_star_chain_and_equality(spark):
    """Large-star/small-star closes a 1000-node chain in ~log rounds and
    matches plain min-label propagation exactly on a mixed graph."""
    from home_credit_data_engineering_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    # chain 0-1-2-...-999 plus a separate triangle and a pair
    chain = [(i, i + 1) for i in range(999)]
    extra = [(2000, 2001), (2001, 2002), (2000, 2002), (3000, 3001)]
    edges = spark.createDataFrame(chain + extra, "doc_a long, doc_b long")
    stats: dict = {}
    star = {
        (r["node"], r["component"])
        for r in connected_components_star(edges, stats=stats).collect()
    }
    assert stats["rounds"] <= 12, f"chain-1000 took {stats['rounds']} rounds"
    chain_labels = {c for n, c in star if n < 1000}
    assert chain_labels == {0}
    assert {c for n, c in star if 2000 <= n < 3000} == {2000}
    assert {c for n, c in star if n >= 3000} == {3000}
    # exact equality vs the propagation implementation (needs ~999 rounds
    # on the chain, so compare on the small components only)
    small = spark.createDataFrame(extra, "doc_a long, doc_b long")
    prop = {
        (r["node"], r["component"])
        for r in connected_components(small).collect()
    }
    star_small = {
        (r["node"], r["component"])
        for r in connected_components_star(small).collect()
    }
    assert star_small == prop


def test_winnowing_md5_detects_partial_overlap(spark):
    """The oracle-verifiable md5 variant keeps the MOSS guarantee: shared
    spans >= window+k-1 tokens share a fingerprint."""
    from home_credit_data_engineering_spark.operators.dedup import (
        winnowing_fingerprints_md5,
    )

    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, f"{shared} alpha beta gamma delta epsilon zeta eta theta"),
        (2, f"unrelated prefix words here {shared}"),
        (3, "totally different vocabulary with no common span at all okay"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    by_doc: dict[int, set] = {1: set(), 2: set(), 3: set()}
    for r in winnowing_fingerprints_md5(docs, "doc_id", "text").collect():
        by_doc[r["doc_id"]].add(r["fingerprint"])
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_ivf_index_build_query_with_partition_pruning(clustered_vectors, tmp_path):
    """Persisted IVF index: cell-partitioned parquet + saved centroids.
    Querying must (a) match the in-memory ivf_topk results given the same
    centroids, and (b) scan ONLY the probed cell partitions (parquet
    partition pruning visible in the plan)."""
    from home_credit_data_engineering_spark.operators.similarity import (
        build_ivf_index,
        ivf_query_index,
        ivf_topk,
    )

    path = str(tmp_path / "ivf_index")
    build_ivf_index(clustered_vectors, path, n_centroids=20)
    queries = clustered_vectors.filter(F.col("vec_id") % 40 == 0)
    out = ivf_query_index(
        clustered_vectors.sparkSession, path, queries, k=3, n_probe=3
    )
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in out.collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in ivf_topk(
            clustered_vectors,
            queries,
            k=3,
            n_centroids=20,
            n_probe=3,
        ).collect()
    }
    assert got == want and len(got) > 0
    # partition pruning: the scan's partition filters mention `cell`
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:200]
    # The query side is persisted, so the cell-assignment pandas UDF is
    # not re-evaluated: the candidates join reads the cached q_cells
    # (InMemoryTableScan). The cached subtree's own plan (where top_cells
    # legitimately appears once) is printed inside the InMemoryRelation
    # node, so only the LIVE section above it is checked: it must contain
    # exactly one ArrowEvalPython — the cosine re-ranker.
    assert "InMemoryTableScan" in plan
    live = plan.split("InMemoryRelation")[0]
    assert live.count("ArrowEvalPython") == 1


def test_connected_components_star_empty_and_ivf_empty_queries(spark, tmp_path, clustered_vectors):
    from home_credit_data_engineering_spark.operators.dedup import (
        connected_components_star,
    )
    from home_credit_data_engineering_spark.operators.similarity import (
        build_ivf_index,
        ivf_query_index,
    )

    empty_edges = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components_star(empty_edges).count() == 0

    path = str(tmp_path / "ivf_empty_q")
    build_ivf_index(clustered_vectors, path, n_centroids=8)
    no_queries = clustered_vectors.filter(F.col("vec_id") < 0)
    out = ivf_query_index(spark, path, no_queries, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "score", "rank"]
