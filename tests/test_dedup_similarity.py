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


def test_semantic_dedup_label_blocked_min_id_survivors(clustered_vectors):
    """Label-blocked form: survivors match an exact numpy replication of
    the rule (drop iff a smaller-id same-cluster vector sits at cosine >=
    threshold); cross-cluster vectors never interact (blocked). In the
    planted data that is the min id of each clique plus the rare outlier
    whose noise pushed every intra-clique pair below the threshold."""
    from home_credit_data_engineering_spark.operators.dedup import semantic_dedup

    out = semantic_dedup(
        clustered_vectors, "vec_id", "embedding", threshold=0.8,
        cluster_col="label",
    ).collect()
    assert len(out) == 200
    kept = {r["vec_id"] for r in out if r["kept"]}
    rows = clustered_vectors.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    expect = set()
    for r in rows:
        i = r["vec_id"]
        vi = vecs[i]
        dropped = any(
            round(
                float(vi @ vecs[j] / (np.linalg.norm(vi) * np.linalg.norm(vecs[j]))),
                6,
            )
            >= 0.8
            for j in range((i // 10) * 10, i)  # smaller ids, same clique
        )
        if not dropped:
            expect.add(i)
    assert kept == expect
    assert {c * 10 for c in range(20)} <= kept  # min ids always survive
    assert len(kept) <= 25  # near-total collapse of the 200-vector corpus
    assert all(r["cluster"] == r["vec_id"] // 10 for r in out)


def test_semantic_dedup_kmeans_path_and_cap(clustered_vectors):
    """KMeans assignment: survivors drop near-dups regardless of exact
    cell boundaries (each planted clique is semantically identical, so
    at most one survivor per clique cell). max_cluster=1 excludes every
    cluster from the pair scan -> everything kept, audit view flags them."""
    from home_credit_data_engineering_spark.operators.dedup import (
        semantic_dedup,
        semantic_oversized_clusters,
    )

    out = semantic_dedup(
        clustered_vectors, "vec_id", "embedding", threshold=0.8,
        n_clusters=20, seed=1,
    ).collect()
    assert len(out) == 200
    kept = {r["vec_id"] for r in out if r["kept"]}
    # Every planted clique collapses to >= 1 survivor; splits across
    # cells and the rare sub-threshold outlier pair add a few more —
    # never anywhere near the 200-vector corpus.
    assert 20 <= len(kept) <= 50
    # Survivor soundness: replicate the rule in numpy against the
    # output's own cell assignment — kept iff no smaller-id same-cell
    # vector sits at cosine >= threshold.
    cell_of = {r["vec_id"]: r["cluster"] for r in out}
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in clustered_vectors.collect()
    }
    for i in sorted(vecs):
        vi = vecs[i]
        dropped = any(
            cell_of[j] == cell_of[i]
            and round(
                float(
                    vi @ vecs[j]
                    / (np.linalg.norm(vi) * np.linalg.norm(vecs[j]))
                ),
                6,
            )
            >= 0.8
            for j in range(i)
        )
        assert (i not in kept) == dropped, f"vec {i} survivor rule mismatch"

    capped = semantic_dedup(
        clustered_vectors, "vec_id", "embedding", threshold=0.8,
        cluster_col="label", max_cluster=1,
    ).collect()
    assert all(r["kept"] for r in capped)  # capped clusters keep members
    audit = semantic_oversized_clusters(
        clustered_vectors, cluster_col="label", max_cluster=1
    ).collect()
    assert len(audit) == 20 and all(r["cluster_size"] == 10 for r in audit)


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
    # the two join strategies (broadcast min frames vs sort-merge) must
    # be result-identical — under a LOCAL master the default is the
    # partitioned path (r14 decision: the groupBy-min exchange is reused
    # by the SMJ, so broadcast only pays off on a real cluster)
    assert stats["strategy"] == "partitioned"
    stats_b: dict = {}
    bcast = {
        (r["node"], r["component"])
        for r in connected_components_star(
            edges, stats=stats_b, broadcast_labels=True
        ).collect()
    }
    assert stats_b["strategy"] == "broadcast"
    assert bcast == star


def _random_bucket_view(spark, rng, n_docs: int, bands: int, n_buckets: int):
    """Random (doc_id, band, bucket) assignments with a planted hot bucket
    (~35% of docs land in bucket 0 per band) so small caps actually
    trigger — the cap-veto interaction is the property under test."""
    rows = []
    for d in range(n_docs):
        for b in range(bands):
            bucket = 0 if rng.random() < 0.35 else int(rng.integers(1, n_buckets))
            rows.append((d, b, bucket))
    return spark.createDataFrame(rows, "doc_id long, band int, bucket long")


@pytest.mark.parametrize("seed,max_bucket", [(0, 3), (1, 5), (2, None)])
def test_leftmost_match_equals_naive_pairs_random(spark, seed, max_bucket):
    """Property: the leftmost-surviving-match join emits EXACTLY the naive
    distinct pair set — with hot-bucket caps active (the subtle case: a
    pair's earlier shared band may be capped, so the veto must not fire
    there) and without."""
    from home_credit_data_engineering_spark.operators.dedup import (
        _banded_sized_from_buckets,
        _bucket_self_join,
        _bucket_self_join_naive,
    )

    rng = np.random.default_rng(seed)
    bands = 6
    buckets = _random_bucket_view(spark, rng, n_docs=40, bands=bands, n_buckets=8)
    sized = _banded_sized_from_buckets(buckets)
    left = {
        (r["doc_a"], r["doc_b"])
        for r in _bucket_self_join(sized, bands, max_bucket).collect()
    }
    naive = {
        (r["doc_a"], r["doc_b"])
        for r in _bucket_self_join_naive(sized, max_bucket).collect()
    }
    assert left == naive and naive  # non-vacuous: hot bucket guarantees pairs
    if max_bucket is not None:
        # caps actually triggered (the hot bucket exceeds the cap) AND some
        # pairs survived via other buckets — the interaction case.
        uncapped = {
            (r["doc_a"], r["doc_b"])
            for r in _bucket_self_join_naive(sized, None).collect()
        }
        assert naive < uncapped


def test_leftmost_match_mask_past_bit_31(spark):
    """Regression for the int-base shiftleft wrap: with >= 33 bands the
    survival bits for band >= 32 live past bit 31; a 32-bit wrap would
    alias them onto low bands and corrupt vetoes. Pairs agreeing ONLY on
    high bands must still come out exactly once."""
    from home_credit_data_engineering_spark.operators.dedup import (
        _banded_sized_from_buckets,
        _bucket_self_join,
        _bucket_self_join_naive,
    )

    bands = 40
    rng = np.random.default_rng(7)
    rows = []
    for d in range(12):
        for b in range(bands):
            if b >= 34:  # two surviving 6-doc buckets, shared bands 34..39
                bucket = 0 if d < 6 else 1
            elif b == 1:  # early hot band: all 12 share it -> capped (12 > 8)
                bucket = 99
            else:
                bucket = int(rng.integers(100, 10_000)) * 12 + d  # unique
            rows.append((d, b, bucket))
    buckets = spark.createDataFrame(rows, "doc_id long, band int, bucket long")
    sized = _banded_sized_from_buckets(buckets)
    left = [
        (r["doc_a"], r["doc_b"])
        for r in _bucket_self_join(sized, bands, 8).collect()
    ]
    naive = {
        (r["doc_a"], r["doc_b"])
        for r in _bucket_self_join_naive(sized, 8).collect()
    }
    # 2*C(6,2) within-group pairs, each exactly once (a wrapped mask would
    # re-emit every pair from each of bands 35..39 too); the capped band-1
    # bucket contributes no cross-group pairs.
    assert len(left) == len(set(left)) == 30
    assert set(left) == naive


def test_bucket_mask_band_limit_guard(spark):
    """bands > 63 with a cap must raise (bitmask is a 64-bit long); the
    uncapped path has no mask and still works."""
    from home_credit_data_engineering_spark.operators.dedup import (
        _banded_sized_from_buckets,
        _bucket_self_join,
        minhash_md5_pairs,
    )

    buckets = spark.createDataFrame(
        [(0, b, 0) for b in range(64)] + [(1, b, 0) for b in range(64)],
        "doc_id long, band int, bucket long",
    )
    sized = _banded_sized_from_buckets(buckets)
    with pytest.raises(ValueError, match="63 bands"):
        _bucket_self_join(sized, 64, 1000)
    assert {
        (r["doc_a"], r["doc_b"])
        for r in _bucket_self_join(sized, 64, None).collect()
    } == {(0, 1)}
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="shingle_k"):
        minhash_md5_pairs(docs, "doc_id", "text", shingle_k=1)
    with pytest.raises(ValueError, match="max_hamming"):
        from home_credit_data_engineering_spark.operators.dedup import (
            simhash_near_pairs,
            simhash_signatures,
        )

        simhash_near_pairs(
            simhash_signatures(docs, "doc_id", "text"), max_hamming=63
        ).collect()


def test_minhash_md5_capped_matches_naive_on_corpus(spark, docs):
    """End-to-end on real text: minhash_md5_pairs through the production
    leftmost join equals the naive formulation, with a cap tight enough
    to drop the exact-duplicate buckets."""
    from home_credit_data_engineering_spark.operators.dedup import (
        minhash_md5_pairs,
    )

    kw = dict(num_hashes=32, bands=16, threshold=0.0)
    for max_bucket in (None, 2):
        got = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in minhash_md5_pairs(
                docs, "doc_id", "text", max_bucket=max_bucket, **kw
            ).collect()
        }
        assert got == _naive_md5_pairs(docs, max_bucket=max_bucket, **kw)


def _naive_md5_pairs(docs, num_hashes, bands, threshold, max_bucket):
    """Naive-candidates reference for minhash_md5_pairs (distinct over the
    capped (band,bucket) self-join), sharing only the signature builder."""
    from home_credit_data_engineering_spark.operators.dedup import (
        _banded_sized_from_buckets,
        _bucket_self_join_naive,
        minhash_md5_pairs,
    )
    from unittest import mock

    with mock.patch(
        "home_credit_data_engineering_spark.operators.dedup._bucket_self_join",
        lambda sized, bands_, cap: _bucket_self_join_naive(sized, cap),
    ):
        return {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in minhash_md5_pairs(
                docs,
                "doc_id",
                "text",
                num_hashes=num_hashes,
                bands=bands,
                threshold=threshold,
                max_bucket=max_bucket,
            ).collect()
        }


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
    # The cell-assignment pandas UDF ran exactly once, driver-side, while
    # collecting the tiny (query_id, cell) list — it must NOT appear in
    # the result plan at all (r4: the r3 form cached the assignment
    # subtree and leaked the cache across calls). The only Python in the
    # plan is the Arrow cosine re-ranker, and nothing is left persisted.
    final_plan = plan.split("+- == Initial Plan ==")[0]
    assert final_plan.count("ArrowEvalPython") == 1
    assert "InMemoryTableScan" not in plan


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


def test_survivors_by_score_policy_and_string_ids(spark):
    """Highest score wins, ties break to smallest id — including string
    ids (the min_by struct(-score, id) trick needs no numeric id)."""
    from home_credit_data_engineering_spark.operators.dedup import (
        survivors_by_score,
    )

    members = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c1"), ("z", "c2"), ("y", "c2")],
        ["doc_id", "cluster_id"],
    )
    scores = spark.createDataFrame(
        [("a", 5.0), ("b", 9.0), ("c", 9.0), ("z", 1.0), ("y", 1.0)],
        ["doc_id", "score"],
    )
    out = {r["doc_id"]: r for r in survivors_by_score(members, scores).collect()}
    assert out["b"]["is_survivor"] and out["b"]["keep_id"] == "b"  # max, tie->min id
    assert not out["c"]["is_survivor"] and out["c"]["keep_id"] == "b"
    assert not out["a"]["is_survivor"]
    assert out["y"]["is_survivor"] and out["z"]["keep_id"] == "y"
    # members without a score drop out (inner join contract)
    partial = survivors_by_score(members, scores.filter("doc_id != 'c'"))
    assert {r["doc_id"] for r in partial.collect()} == {"a", "b", "y", "z"}


def test_minhash_collapsed_equals_default_on_duplicated_corpus(spark, sf_dir):
    """Collapse-exact-first MinHash must emit the SAME verified pair set
    as the default pipeline on a corpus with planted exact duplicates
    (caps untriggered): identical text => identical signatures => every
    pair decision is a pure function of the two texts."""
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.operators.dedup import (
        minhash_dedup,
        minhash_dedup_collapsed,
    )
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    base = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    # every document gets one exact copy (ids shifted) -> duplication
    # factor 2 everywhere, plus whatever near-dups the corpus already has
    dup = base.unionByName(
        base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    kw = dict(num_hashes=32, bands=8, threshold=0.2)
    default = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in minhash_dedup(dup, "doc_id", "text", **kw).collect()
    }
    collapsed = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in minhash_dedup_collapsed(dup, "doc_id", "text", **kw).collect()
    }
    assert collapsed == default
    assert len(collapsed) >= base.count()  # at least every planted copy pair


def test_minhash_collapsed_star_cap_preserves_connectivity(spark):
    """Over-cap groups expand as star pairs (rep <-> member), not
    all-pairs: O(group) rows, same connected component."""
    from home_credit_data_engineering_spark.operators.dedup import (
        connected_components_star,
        minhash_dedup_collapsed,
    )

    boiler = "the same boilerplate sentence repeated across many hosts"
    rows = [(i, boiler) for i in range(30)] + [
        (100, "a completely different document about gardens and trees"),
        (101, "a completely different document about gardens and trees"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_dedup_collapsed(
        df, "doc_id", "text", num_hashes=16, bands=4, threshold=0.5,
        max_group_pairs=10,
    )
    got = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    # boilerplate group (30 > cap 10): star = 29 pairs, not C(30,2)=435
    boiler_pairs = [p for p in got if p[0] < 100 and p[1] < 100]
    assert len(boiler_pairs) == 29
    assert all(a == 0 for a, _ in boiler_pairs)  # all through the rep
    # small group: the single all-pair
    assert (100, 101) in got
    # connectivity: one component covers all 30 boilerplate docs
    edges = pairs.select("doc_a", "doc_b")
    labels = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    assert len({labels[i] for i in range(30)}) == 1


def test_canonical_fingerprint_non_latin_guard_and_engine_parity(spark):
    # ADVICE r5: (a) docs with no ASCII alphanumerics must NOT collapse
    # into one cluster (that would silently drop all-but-one non-Latin /
    # emoji doc in a survivor pipeline); (b) the whitespace class is
    # spelled explicitly so Java and RE2 agree on U+000B (Java \s
    # includes it, RE2's does not).
    import duckdb
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.functions.text import (
        canonical_fingerprint,
    )

    rows = [
        (1, "Hello,  World!"),
        (2, "hello world"),          # same canonical form as 1
        (3, "你好世界"),  # CJK only — empty canonical
        (4, "こんにちは"),  # JP only — empty canonical
        (5, "!!! ???"),               # punctuation only — empty canonical
        (6, "a\x0bb"),                # vertical tab: engines must agree
        (7, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", canonical_fingerprint("text").alias("fp")
        ).collect()
    }
    # case/punct/spacing variants share a key
    assert got[1] == got[2]
    # no-alphanumeric docs fall back to distinct raw fingerprints
    assert len({got[3], got[4], got[5]}) == 3
    assert got[3] != got[1]

    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(
        rows, columns=["doc_id", "text"]
    ))
    sql = """
      SELECT doc_id,
             CASE WHEN canon = '' THEN md5(lower(trim(text)))
                  ELSE md5(canon) END AS fp
      FROM (
        SELECT doc_id, text,
               trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 \\t\\n\\r\\f]', '', 'g'),
                 '[ \\t\\n\\r\\f]+', ' ', 'g')) AS canon
        FROM docs) t
    """
    want = {int(d): f for d, f in con.execute(sql).fetchall()}
    assert got == want


def test_minhash_collapsed_persist_is_bounded(spark, docs):
    # ADVICE r5: repeated invocations must not accumulate cache entries —
    # the members persist is a one-live-entry idempotent slot.
    from home_credit_data_engineering_spark.operators import dedup as D

    for _ in range(3):
        D.minhash_dedup_collapsed(
            docs, "doc_id", "text", num_hashes=16, bands=4, threshold=0.2
        ).count()
    assert len(D._COLLAPSED_MEMBERS_PERSISTED) <= 1


def test_filtered_topk_prefilter_semantics_and_routing(clustered_vectors):
    # exact route: results equal brute force over the filtered subset,
    # and every neighbor satisfies the predicate (pre-filter guarantee)
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.operators.similarity import (
        brute_force_topk,
        filtered_topk,
    )

    emb = clustered_vectors
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    pred = F.col("vec_id") % 2 == 0
    got = filtered_topk(emb, queries, pred, k=3)
    want = brute_force_topk(emb.filter(pred), queries, k=3)
    as_set = lambda df: {  # noqa: E731
        (r["query_id"], r["neighbor_id"], r["score"], r["rank"])
        for r in df.collect()
    }
    assert as_set(got) == as_set(want)
    assert all(r["neighbor_id"] % 2 == 0 for r in got.collect())

    # forced IVF route (threshold below the filtered size): recall vs
    # the filtered brute force stays high on clustered data
    approx = filtered_topk(
        emb, queries, pred, k=3, exact_threshold=1, n_probe=8
    )
    truth = {
        (r["query_id"], r["neighbor_id"]) for r in want.collect()
    }
    hits = sum(
        1
        for r in approx.collect()
        if (r["query_id"], r["neighbor_id"]) in truth
    )
    assert hits >= int(0.6 * len(truth)), (hits, len(truth))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        filtered_topk(emb, queries, pred, k=0)


def test_mmr_rerank_matches_python_reference(clustered_vectors):
    import numpy as np
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    emb = clustered_vectors
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    k, cand, lam = 4, 12, 0.5

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    unit = {
        i: (v / n if (n := np.linalg.norm(v)) > 0 else v * 0.0)
        for i, v in vecs.items()
    }
    cands = {}
    for r in brute_force_topk(emb, queries, k=cand).collect():
        cands.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["score"])
        )

    def py_mmr(qid):
        slate = sorted(cands[qid], key=lambda t: (-t[1], t[0]))
        picked, max_sim = [], {nid: 0.0 for nid, _ in slate}
        rest = dict(slate)
        while rest and len(picked) < k:
            scored = {
                nid: round(
                    lam * rel - (0 if not picked else (1 - lam) * max_sim[nid]),
                    9,
                )
                for nid, rel in rest.items()
            }
            top = max(scored.values())
            best = min(n for n, s in scored.items() if s == top)
            picked.append(best)
            del rest[best]
            for nid in rest:
                sim = round(float(unit[nid] @ unit[best]), 9)
                max_sim[nid] = max(max_sim[nid], sim)
        return picked

    got = {}
    for r in mmr_rerank(
        emb, queries, k=k, candidates=cand, lambda_=lam
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["mmr_rank"], r["neighbor_id"])
        )
    for qid, rows in got.items():
        ordered = [nid for _, nid in sorted(rows)]
        assert ordered == py_mmr(qid), qid

    # lambda=1 degenerates to the plain top-k (order included)
    plain = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=k).collect()
    }
    degen = {
        (r["query_id"], r["mmr_rank"], r["neighbor_id"])
        for r in mmr_rerank(
            emb, queries, k=k, candidates=cand, lambda_=1.0
        ).collect()
    }
    assert degen == plain

    import pytest as _pytest

    with _pytest.raises(ValueError, match="candidates"):
        mmr_rerank(emb, queries, k=5, candidates=3)
    with _pytest.raises(ValueError, match="lambda"):
        mmr_rerank(emb, queries, k=2, candidates=5, lambda_=1.5)


def test_mmr_rerank_supports_string_ids(clustered_vectors):
    """ADVICE r6: the applyInPandas schema derives id types from the
    input frames instead of hardcoding bigint."""
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.operators.similarity import (
        mmr_rerank,
    )

    emb = clustered_vectors.select(
        F.concat(F.lit("v"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    queries = emb.filter(F.col("vec_id").isin("v0", "v25"))
    rows = mmr_rerank(emb, queries, k=3, candidates=8).collect()
    assert rows and all(
        isinstance(r["query_id"], str) and isinstance(r["neighbor_id"], str)
        for r in rows
    )


# ---------------------------------------------------------------------------
# exact prefix-filter Jaccard join (r12)
# ---------------------------------------------------------------------------


def test_jaccard_join_exact_equals_brute_force(spark):
    """Prefix filtering must lose NOTHING: the join's pair set and
    scores equal the all-pairs brute force at the same threshold."""
    from home_credit_data_engineering_spark.functions.text import (
        with_shingles,
    )
    from home_credit_data_engineering_spark.operators.dedup import (
        jaccard_similarity_join,
    )
    from pyspark.sql import functions as F

    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy cat tonight",
        "a completely different document about spark physical plans",
        "a completely different document about spark logical plans",
        "the quick brown fox jumps over the lazy dog tonight",  # exact dup
        "one two three four five six seven eight nine ten",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(base)], "doc_id long, text string"
    )

    for t in (0.2, 0.5, 1.0):
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_similarity_join(
                docs, threshold=t
            ).collect()
        }
        # brute force over the same shingle sets
        sh = with_shingles(docs, "doc_id", "text").select(
            "doc_id", F.array_distinct("shingles").alias("s")
        )
        a = sh.select(F.col("doc_id").alias("da"), F.col("s").alias("sa"))
        b = sh.select(F.col("doc_id").alias("db"), F.col("s").alias("sb"))
        inter = F.size(F.array_intersect("sa", "sb")).cast("double")
        union = (
            F.size("sa") + F.size("sb") - F.size(F.array_intersect("sa", "sb"))
        ).cast("double")
        want = {
            (r["da"], r["db"]): r["j"]
            for r in a.crossJoin(b)
            .filter(F.col("da") < F.col("db"))
            .withColumn("j", F.round(inter / union, 6))
            .filter(inter / union >= t)
            .collect()
        }
        assert got == want, f"threshold {t}"
    # sanity: the exact duplicate pair is found at every threshold
    assert (0, 4) in got


def test_jaccard_join_prefix_ceil_is_exact_at_float_hostile_sizes(spark):
    """A BINDING boundary pair: J exactly 0.2 with |y| = 35, where IEEE
    0.2 * 35 = 7.000000000000001. A float ceil would (a) shorten y's
    prefix from 29 to 28 — and the pair's ONLY cross-prefix token sits
    at exactly position 29 of y — and (b) fail the length filter
    (7.0000001 <= 7 is false). Either slip silently drops the pair;
    the decimal arithmetic must keep it.

    Construction: x = 9 words -> 7 shingles, ALL shared (x ⊂ y);
    y = 28 unique-run words + x's words -> 35 distinct shingles (26
    unique-run + 2 junction + 7 shared). J = 7/(7+35-7) = 0.2 exactly.
    Shared shingles have global freq 2 (sort LAST); y's 28 freq-1
    shingles fill prefix positions 1..28, so the first shared shingle
    is exactly position 29."""
    from home_credit_data_engineering_spark.operators.dedup import (
        jaccard_similarity_join,
    )

    x_words = [f"w{i}" for i in range(9)]
    u_words = [f"uaa{i:02d}" for i in range(28)]
    x = " ".join(x_words)
    y = " ".join(u_words + x_words)
    docs = spark.createDataFrame(
        [(1, x), (2, y)], "doc_id long, text string"
    )
    got = jaccard_similarity_join(docs, threshold=0.2).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in got] == [
        (1, 2, 0.2)
    ]


def test_jaccard_join_plan_has_no_cartesian(spark):
    from home_credit_data_engineering_spark.operators.dedup import (
        jaccard_similarity_join,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta tok{i}") for i in range(10)],
        "doc_id long, text string",
    )
    plan = (
        jaccard_similarity_join(docs, threshold=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_join_collapsed_equals_full(spark):
    """Collapse-exact-first exact Jaccard join: identical output (pairs
    AND scores) to the direct prefix-filter join on a corpus with
    planted byte-duplicates, near-duplicates, and empty-text twins
    (which must NOT pair — zero-token docs have no shingle set)."""
    import random

    from home_credit_data_engineering_spark.operators.dedup import (
        jaccard_join_collapsed,
        jaccard_similarity_join,
    )

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(30)]

    def doc(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    base_a, base_b = doc(25), doc(18)
    rows = []
    for i in range(40):
        if i % 5 == 0:
            rows.append((i, base_a))          # dup group of 8
        elif i % 7 == 0:
            rows.append((i, base_b))          # dup group of ~5
        else:
            rows.append((i, doc(rng.randint(6, 28))))
    # empty/whitespace texts tokenize to the single empty-string token
    # (tokens("") == [""]), so these three are Jaccard-1 twins of each
    # other in the FULL join — across two md5 groups ("" vs "   "),
    # which exercises the cross-group expansion at J=1.0; a null text
    # row is dropped by both forms
    rows += [(100, ""), (101, ""), (102, "   "), (103, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(threshold=0.25, shingle_k=3)

    # collapse_exact=False pins the DIRECT prefix-filter path as the
    # reference side — the default now routes through the collapsed form
    # (r14), which would make this equivalence check tautological
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_similarity_join(
            docs, "doc_id", "text", collapse_exact=False, **kw
        ).collect()
    }
    stats: dict = {}
    col = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_join_collapsed(
            docs, "doc_id", "text", stats=stats, **kw
        ).collect()
    }
    assert col == full
    assert (0, 5) in full  # the byte-dup group really pairs at 1.0
    assert full[(0, 5)] == 1.0
    assert full[(100, 101)] == full[(100, 102)] == full[(101, 102)] == 1.0
    assert not any(103 in p for p in full)
    # the collapse really collapsed: reps < docs, candidates computed
    # at representative level
    assert stats["n_groups"] < stats["n_docs"]
    assert stats["brute_force_pairs"] == (
        stats["n_groups"] * (stats["n_groups"] - 1) // 2
    )


def test_containment_join_planted_subsets(spark):
    """Asymmetric containment: a probe doc that is a SUBSET of a
    reference doc scores 1.0 regardless of the reference's extra length
    (where symmetric Jaccard dilutes); direction matters; near-subsets
    score their exact fraction; unrelated docs never pair."""
    from home_credit_data_engineering_spark.operators.dedup import (
        containment_join,
        jaccard_similarity_join,
    )

    bench = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon")
    rows_ref = [(1, bench), (2, "totally different reference words here "
                                "one two three four five six seven")]
    rows_probe = [
        # exact subset: first 8 tokens of bench -> all 6 of its 3-gram
        # shingles appear in bench -> containment 1.0
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
        # half-contaminated: 6 bench tokens + 6 novel tokens
        (101, "alpha beta gamma delta epsilon zeta q1 q2 q3 q4 q5 q6"),
        # unrelated
        (102, "nothing in common with either reference document at all"),
        # superset probe: bench + extra tail -> containment < 1 (its own
        # set is bigger), while REVERSED roles would give 1.0
        (103, bench + " extra tail words beyond the benchmark"),
    ]
    ref = spark.createDataFrame(rows_ref, "doc_id long, text string")
    probe = spark.createDataFrame(rows_probe, "doc_id long, text string")

    got = {
        (r["probe_id"], r["ref_id"]): r["containment"]
        for r in containment_join(
            probe, ref, "doc_id", "text", threshold=0.4, shingle_k=3
        ).collect()
    }
    assert got[(100, 1)] == 1.0  # subset detected despite length gap
    # symmetric Jaccard on the same pair is diluted well below 0.4 —
    # the reason the containment form exists
    sym = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_similarity_join(
            probe.unionByName(ref), "doc_id", "text",
            threshold=0.01, shingle_k=3,
        ).collect()
    }
    assert sym[(1, 100)] < 0.4
    # half-contaminated probe: 4 of its 10 shingles hit the bench
    # (novel-token boundary shingles don't) -> 0.4 exactly
    assert got[(101, 1)] == 0.4
    assert not any(p == 102 for p, _ in got)
    # direction: the superset probe's containment is |bench_shingles|/|own|
    assert (103, 1) in got and got[(103, 1)] < 1.0
    # reversed roles: bench IS a subset of probe 103
    rev = {
        (r["probe_id"], r["ref_id"]): r["containment"]
        for r in containment_join(
            ref, probe, "doc_id", "text", threshold=0.9, shingle_k=3
        ).collect()
    }
    assert rev[(1, 103)] == 1.0


def test_containment_join_collapsed_equals_direct(spark):
    """Collapse-exact-first containment: bit-identical output to the
    direct R-S join on a corpus duplicated on BOTH sides, including the
    planted edge where a probe group's REPRESENTATIVE id equals a
    reference id — its own self-pair drops but the rest of the group's
    pairs (and its own cross pairs) survive."""
    from home_credit_data_engineering_spark.operators.dedup import (
        containment_join,
        containment_join_collapsed,
    )

    r_a = " ".join(f"a{i}" for i in range(10))
    r_b = " ".join(f"b{i}" for i in range(10))
    r_c = " ".join(f"c{i}" for i in range(10))
    unrel = " ".join(f"u{i}" for i in range(10))
    ref_rows = (
        [(900 + i, r_a) for i in range(5)]
        + [(910 + i, r_b) for i in range(3)]
        + [(920, r_c), (930, "")]
    )
    probe_rows = (
        [(i, r_a) for i in range(1, 9)]
        # rep id 910 == a reference id carrying the SAME text
        + [(910, r_b), (5555, r_b)]
        + [(50 + i, unrel) for i in range(3)]
        + [(60, ""), (61, None)]
    )
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    probe = spark.createDataFrame(probe_rows, "doc_id long, text string")
    kw = dict(threshold=0.5, shingle_k=3)

    # collapse_exact=False pins the DIRECT R-S path as the reference
    # side (the default routes through the collapsed form since r14)
    full = {
        (r["probe_id"], r["ref_id"]): r["containment"]
        for r in containment_join(
            probe, ref, "doc_id", "text", collapse_exact=False, **kw
        ).collect()
    }
    stats: dict = {}
    col = {
        (r["probe_id"], r["ref_id"]): r["containment"]
        for r in containment_join_collapsed(
            probe, ref, "doc_id", "text", stats=stats, **kw
        ).collect()
    }
    assert col == full
    # 8 R_A probes x 5 R_A refs + rep 910 x {911, 912} + 5555 x 3, plus
    # the empty-text twins: tokens("") == [""] (pinned repo-wide), so
    # the empty probe and empty ref pair at containment 1.0 in BOTH
    # forms
    assert len(full) == 8 * 5 + 2 + 3 + 1
    assert (910, 910) not in full and full[(910, 911)] == 1.0
    assert full[(5555, 910)] == 1.0
    assert full[(60, 930)] == 1.0 and not any(p == 61 for p, _ in full)
    # the collapse really collapsed both sides: candidates computed at
    # representative level (3 rep pairs vs 46 expanded)
    assert stats["n_probe_groups"] == 4 and stats["n_probe_docs"] == 14
    assert stats["n_ref_groups"] == 4 and stats["n_ref_docs"] == 10
    assert stats["candidate_pairs"] * 10 <= len(full)
