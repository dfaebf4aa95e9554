"""Deduplication operators for large-scale corpus pipelines (north-star).

Four families, all expressed as shuffle-conscious DataFrame plans:

- **Exact** (:func:`exact_dedup`) — group on an md5 content fingerprint;
  one shuffle on the hash, survivor = min id per group.
- **MinHash + LSH** (:func:`minhash_signatures`, :func:`lsh_candidate_pairs`,
  :func:`minhash_dedup`) — shingle → k minhashes → band buckets →
  self-join per bucket → exact Jaccard verification on candidates only.
  The classic near-dup pipeline: no O(n²) comparison ever materializes;
  shuffle volume is per-bucket, and hot buckets (boilerplate shingles) are
  capped explicitly.
- **SimHash** (:func:`simhash_signatures`, :func:`simhash_near_pairs`) —
  64-bit sign-aggregated token hashes; near-dup = Hamming distance ≤ r,
  candidates via the pigeonhole principle (split the 64 bits into r+1
  chunks; any pair within distance r agrees on ≥1 chunk) — again equi-join
  shaped, never all-pairs.
- **Embedding near-dup** (:func:`embedding_near_pairs`) — cosine ≥ τ pairs,
  blocked either exactly (small corpora) or by hyperplane LSH buckets.

Hash function: ``xxhash64`` (Spark-native, JVM codegen, 64-bit) with seed
variation via suffix concat. These signatures are engine-specific, so
MinHash/SimHash declared queries are rows-only checks; the *verification*
step (exact Jaccard) is SQL-expressible and oracle-checked separately.
"""

from __future__ import annotations

# Module-global so pandas-UDF type hints (stringified under PEP 563)
# resolve when the decorator inspects them — same note as functions/vectors.
import time

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from home_credit_data_engineering_spark.functions.text import fingerprint, tokens


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact dedup groups: (fingerprint, keep_id, dup_count, all ids).

    Survivor policy: smallest id. One hash-aggregate shuffle on the
    16-byte fingerprint — at 100 TB this is the cheapest possible exact
    dedup (never shuffles the text itself).
    """
    return (
        df.select(F.col(id_col).alias("doc_id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
            F.sort_array(F.collect_list("doc_id")).alias("member_ids"),
        )
    )


def survivors_by_score(
    members: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "score",
) -> DataFrame:
    """Policy-based survivor selection: per cluster keep the HIGHEST-score
    member (ties → smallest id), not the smallest id.

    Real pipelines keep the best variant of a duplicate group — longest,
    highest quality score, lowest perplexity — while min-id survival is
    only a determinism convenience. ``members`` is (id, cluster) from any
    clustering (exact/canonical fingerprints, connected components over
    near-dup edges); ``scores`` is (id, score) from any scorer
    (``n_chars``, ``plans/quality_filter``, ``operators/lm``).

    Plan shape: inner join members⨝scores on id, one ``min_by`` aggregate
    per cluster over ``struct(-score, id)`` (max score, then min id —
    works for ids of any orderable type), then a join back on the cluster
    key the aggregate already partitioned by. Ids and scores only — text
    never rides any of these shuffles.
    """
    joined = members.join(scores, id_col).select(
        F.col(id_col), F.col(cluster_col), F.col(score_col)
    )
    # Both the aggregate and the final join-back consume `joined`; a
    # lazy checkpoint makes them SHARE one evaluation — without it the
    # cluster-key lineage (often an expensive canonical fingerprint over
    # full text) runs twice, which measured ~2x on the 10x bench leg.
    # Lazy: the aggregate's first pass materializes it, no extra job.
    joined = joined.localCheckpoint(eager=False)
    best = joined.groupBy(cluster_col).agg(
        F.min_by(
            F.col(id_col),
            F.struct(
                (-F.col(score_col)).alias("__ns"), F.col(id_col).alias("__i")
            ),
        ).alias("keep_id")
    )
    return joined.join(best, cluster_col).select(
        F.col(id_col),
        F.col(cluster_col),
        F.col(score_col),
        "keep_id",
        (F.col(id_col) == F.col("keep_id")).alias("is_survivor"),
    )


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) — connected components by iterative min-label
    propagation over an undirected edge list.

    Each round every node adopts the minimum component id in its
    neighborhood (two hash joins + an aggregate per round); convergence is
    checked with a change count, so chains of length L need O(log L)-ish
    rounds in practice and the loop stops early. This is the cluster step
    that turns pairwise near-dup edges into dedup groups (pairwise removal
    alone under-merges chains A~B~C).

    Scale note: each iteration is shuffle-on-node-id; for web-scale graphs
    use :func:`connected_components_star` (large-star/small-star — same
    DataFrame primitives, provably O(log² n) rounds and far fewer in
    practice on long chains). ``max_iter`` bounds the worst case.
    """
    sym = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionByName(
        edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))
    sym = sym.persist()
    labels = labels.persist()
    try:
        for _ in range(max_iter):
            neighbor_min = (
                sym.join(
                    labels.withColumnRenamed("node", "dst").withColumnRenamed(
                        "component", "dst_comp"
                    ),
                    on="dst",
                )
                .groupBy("src")
                .agg(F.min("dst_comp").alias("nbr_comp"))
                .withColumnRenamed("src", "node")
            )
            updated = (
                labels.join(neighbor_min, on="node", how="left")
                .select(
                    "node",
                    F.least(
                        F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
                    ).alias("component"),
                    (F.coalesce(F.col("nbr_comp"), F.col("component"))
                     < F.col("component")).alias("__changed"),
                )
            )
            updated = updated.persist()
            changed = updated.filter(F.col("__changed")).count()
            old = labels
            labels = updated.drop("__changed")
            old.unpersist()
            if changed == 0:
                break
        return labels
    finally:
        sym.unpersist()


def connected_components_star(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
    stats: dict | None = None,
    broadcast_labels: bool | None = None,
    broadcast_node_limit: int = 2_000_000,
    broadcast_max_bytes: int = 64 << 20,
) -> DataFrame:
    """(node, component) via alternating large-star/small-star — the
    web-scale connected-components algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14).

    Each round is two (groupBy-min + join) passes:

    - **large-star**: every node links its *larger* neighbors to the
      minimum of its closed neighborhood — emits ``(v, m(u))`` for
      ``v ∈ Γ(u), v > u`` with ``m(u) = min(Γ(u) ∪ {u})``;
    - **small-star**: on the now larger→smaller directed edges, every
      node links itself and all (smaller) neighbors to their minimum.

    Converges when the edge set is a star forest (every edge points at
    its component's root) in O(log² n) rounds worst-case — a chain of
    1000 nodes closes in a handful of rounds where plain min-label
    propagation needs ~500. Per-round cost matches one propagation step
    (shuffle on node id), so this is the default for deep/chained graphs;
    results are identical to :func:`connected_components`.

    ``stats`` (optional dict) receives ``{"rounds": n, "strategy": s}``
    for observability.

    **Two-path join strategy** (the PageRank/HITS idea from
    ``graph.py:190-224`` applied to the star rounds): each round's
    cost centers are the two (edge ⋈ min-frame) joins, and the min
    frame is always ids-only and node-count-bounded.

    Default decision (settled empirically in r14 — docs/EXPLAIN.md):

    - **local master → partitioned.** The groupBy-min that produces the
      min frame has ALREADY shuffled the (symmetrized) edge frame by
      ``u``, and Catalyst's ReusedExchange feeds that same shuffle into
      the sort-merge join — so broadcasting buys no avoided exchange
      and pays two driver collect+ship rounds per iteration. Measured
      at the 10× replica graph (250.6k edges): broadcast-off min
      1.938 s vs broadcast-on 2.189 s, faster in every sample and
      every per-round timing. (This differs from PageRank/HITS, where
      the rank frame changes but the EDGE frame is static — broadcast
      there lets iterations reuse one edge partitioning forever.)
    - **cluster master → broadcast, doubly bounded.** Exchange reuse
      applies on a cluster too, but a broadcast-hash join still skips
      the per-round SORT of the (much larger) edge side and the
      all-nodes exchange of the final roots anti-join; the min frame
      ships only when the node count is at most
      ``broadcast_node_limit`` AND its ESTIMATED bytes (node count ×
      (average id width + per-row hash-relation overhead), one
      combined aggregate) fit ``broadcast_max_bytes`` — wide string
      node ids degrade to the partitioned path long before the row
      limit (a 2M-node frame of 200-byte ids is ~0.5 GB shipped twice
      per round).

    ``broadcast_labels`` forces the decision either way.
    """
    # One eager checkpoint of the normalized edge list up front: the
    # incoming `edges` frame often carries an expensive lineage (e.g. the
    # whole MinHash-LSH pipeline), and both the iteration AND the final
    # node-labeling pass consume it — without this the upstream would
    # recompute once per consumer.
    e_all = (
        edges.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("u"),
            F.least(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Self-pairs (a == b) drop out of the iteration but contribute
    # singleton components below.
    # lazy checkpoint: the strategy count below materializes it, and the
    # final roots anti-join then reuses the materialization instead of
    # re-running the union+distinct (it is consumed twice)
    all_nodes = (
        e_all.select(F.col("u").alias("node"))
        .unionByName(e_all.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e = e_all.filter(F.col("u") != F.col("v"))

    # Strategy decision (docstring): forced > local-master partitioned >
    # cluster broadcast under the row AND estimated-byte bounds (one
    # combined bounded aggregate).
    if broadcast_labels is not None:
        use_bcast = broadcast_labels
    elif edges.sparkSession.sparkContext.master.startswith("local"):
        use_bcast = False
    else:
        row = all_nodes.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.length(F.col("node").cast("string"))).alias("w"),
        ).first()
        n_nodes = int(row["n"] or 0)
        # ~48 B/row covers the JVM hash-relation envelope around the id
        est_bytes = n_nodes * (float(row["w"] or 8.0) + 48.0)
        use_bcast = (
            n_nodes <= broadcast_node_limit
            and est_bytes <= broadcast_max_bytes
        )

    def _min_side(m: DataFrame) -> DataFrame:
        return F.broadcast(m) if use_bcast else m

    def large_star(ed: DataFrame) -> DataFrame:
        sym = ed.unionByName(
            ed.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.withColumn("m", F.least(F.col("mn"), F.col("u"))).drop("mn")
        return (
            sym.join(_min_side(m), on="u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(ed: DataFrame) -> DataFrame:
        # input edges are directed u > v
        m = ed.groupBy("u").agg(F.min("v").alias("m"))
        linked = (
            ed.join(_min_side(m), on="u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        self_link = m.select(F.col("u").alias("a"), F.col("m").alias("b"))
        return (
            linked.unionByName(self_link)
            .select(F.col("a").alias("u"), F.col("b").alias("v"))
            .distinct()
        )

    rounds = 0
    prev_sig = None
    converged = False
    round_secs: list[float] = []
    for _ in range(max_iter):
        rounds += 1
        _t0 = time.perf_counter()
        # localCheckpoint TRUNCATES the logical plan: each star round
        # references its input several times, so without truncation the
        # plan nests ~4-6x per round — exponential analysis cost that
        # OOMs the driver long before the executors feel anything. LAZY
        # (eager=False) on purpose: the signature aggregate right below
        # scans every partition, so one job both materializes the
        # checkpoint and computes the convergence signature — eager
        # checkpointing ran a separate materialization job per round,
        # doubling the round count's fixed job latency (the dominant
        # cost: the edge data is tiny, scheduling is not). On a real
        # cluster with executor churn, swap for reliable checkpoint()
        # on a checkpoint dir; the algorithm is unchanged.
        nxt = small_star(large_star(e)).localCheckpoint(eager=False)
        sig_row = nxt.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.expr("bit_xor(xxhash64(u, v))").alias("hash"),
        ).first()
        sig = (sig_row["cnt"], sig_row["hash"])
        e.unpersist()
        e = nxt
        round_secs.append(round(time.perf_counter() - _t0, 3))
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # The final labeling below assumes a star forest; emitting labels
        # from an unconverged edge set would be silently WRONG.
        raise RuntimeError(
            f"connected_components_star did not converge in max_iter={max_iter} "
            "rounds (needs ~log^2(n) worst case — raise max_iter)"
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["strategy"] = "broadcast" if use_bcast else "partitioned"
        stats["round_secs"] = round_secs
    # Star forest: every edge is (member, root). Roots and isolated nodes
    # label themselves. `e` is checkpointed (loop) and `all_nodes` reads
    # the up-front checkpoint, so no deep recompute on consumption. The
    # member set is node-bounded, so it rides the same broadcast decision
    # as the loop joins.
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    member_ids = e.select(F.col("u").alias("node")).distinct()
    roots = all_nodes.join(
        _min_side(member_ids), on="node", how="left_anti"
    ).withColumn("component", F.col("node"))
    return members.unionByName(roots)


def deduplicate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    near: bool = True,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Return ``df`` with duplicates removed (survivor = smallest id).

    Exact duplicates always collapse (md5 fingerprint); with ``near`` the
    MinHash-LSH pipeline also removes near-duplicates at ``threshold``
    (each near-dup pair drops the larger id — a union-find-free
    approximation that is exact for pairwise clusters and conservative for
    chains). Both removal sets arrive via anti-joins — no row ever carries
    its text through a shuffle.
    """
    exact = exact_dedup(df, id_col, text_col)
    exact_losers = (
        exact.select(F.explode("member_ids").alias("__loser"), "keep_id")
        .filter(F.col("__loser") != F.col("keep_id"))
        .select("__loser")
    )
    losers = exact_losers
    if near:
        near_pairs = minhash_dedup(
            df,
            id_col,
            text_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            threshold=threshold,
        )
        losers = losers.unionByName(
            near_pairs.select(F.col("doc_b").alias("__loser"))
        )
    losers = losers.distinct()
    return df.join(
        losers, on=[F.col(id_col) == F.col("__loser")], how="left_anti"
    )


def kgram_hash_stream(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    short_doc_fallback: bool = True,
) -> DataFrame:
    """(doc_id, __pos, __sh) — one 64-bit hash per k-token shingle.

    The shared all-codegen subplan under MinHash, winnowing, and Jaccard
    verification: posexplode tokens → hash each token ONCE → combine k
    consecutive token hashes with a ``lead()`` window into one
    ``xxhash64`` per position. No shingle strings are ever built, and no
    interpreted array lambdas run (a lambda referencing the tokenizer
    re-splits the text per element — measured 11× slower).

    With ``short_doc_fallback`` docs shorter than ``k`` tokens keep
    exactly their leading (partial) shingle — the whole-text fallback of
    :func:`~.functions.text.word_shingles`; without it they yield no rows
    (winnowing semantics).
    """
    from pyspark.sql.window import Window as W

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("__pos", "__t"),
    ).select("doc_id", "__pos", F.xxhash64("__t").alias("__h"))
    if k == 1:
        # Unigrams: every token is a complete shingle — no window needed.
        return toks.select("doc_id", "__pos", F.xxhash64("__h").alias("__sh"))
    w = W.partitionBy("doc_id").orderBy("__pos")
    leads = [F.lead("__h", j).over(w) for j in range(1, k)]
    cols = [
        F.col("doc_id"),
        F.col("__pos"),
        F.xxhash64(F.col("__h"), *leads).alias("__sh"),
        leads[-1].alias("__last_lead"),
    ]
    # Window expressions must live in the projection, not the filter.
    if short_doc_fallback:
        cols.append(F.count(F.lit(1)).over(W.partitionBy("doc_id")).alias("__n"))
    shingled = toks.select(*cols)
    keep = F.col("__last_lead").isNotNull()
    if short_doc_fallback:
        # full shingles only — except short docs, which keep exactly their
        # leading (partial) shingle as the whole-text fallback
        keep = keep | ((F.col("__n") < k) & (F.col("__pos") == 0))
    return shingled.filter(keep).select("doc_id", "__pos", "__sh")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, minhash array[num_hashes]).

    Plan shape: posexplode tokens → hash each token ONCE → shingle hash =
    ``xxhash64(h_i, h_{i+1}, …)`` over a lead() window → hash-aggregate
    ``min(xxhash64(shingle_hash, seed))`` per seed. Three wins over the
    naive array-lambda formulation (measured 11s → ~1s at sf0.1):

    - no shingle strings are ever built (token hashes combine directly);
    - per-seed hashing re-hashes an 8-byte long, not a string;
    - every expression is whole-stage-codegen (higher-order array lambdas
      evaluate interpreted per element, and a lambda that references the
      tokenizer expression re-splits the text per element).

    MinHash over shingle *hashes* estimates the same Jaccard as over
    shingle strings (modulo 64-bit collisions). Docs shorter than
    ``shingle_k`` tokens contribute one whole-text shingle (same fallback
    as :func:`~.functions.text.word_shingles`). Partial aggregation keeps
    the shuffle at num_hashes longs per doc.
    """
    shingled = kgram_hash_stream(df, id_col, text_col, k=shingle_k)
    seed_mins = [
        F.min(F.xxhash64(F.col("__sh"), F.lit(i))).alias(f"__mh{i}")
        for i in range(num_hashes)
    ]
    return (
        shingled.groupBy("doc_id")
        .agg(*seed_mins)
        .select(
            "doc_id",
            F.array(*[F.col(f"__mh{i}") for i in range(num_hashes)]).alias("minhash"),
        )
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 8,
    max_bucket: int = 1000,
    num_hashes: int | None = None,
) -> DataFrame:
    """Candidate pairs from banded minhash signatures: (doc_a, doc_b).

    Each signature is split into ``bands`` bands of ``num_hashes/bands``
    rows; a pair is a candidate if any band hashes equal. Implemented as
    explode(bands) → group on (band, band_hash) → intra-bucket self-join.
    ``max_bucket`` drops degenerate buckets (boilerplate that would
    quadratically blow up a 100 TB run) — dropped buckets are reported by
    the caller via :func:`oversized_buckets`, never silently at the API
    surface.

    ``bands`` must evenly divide the signature length, else trailing
    signature values would be silently ignored (and ``bands`` > length
    would hash empty slices — every doc in one bucket). Pass
    ``num_hashes`` to validate eagerly; without it the plan validates at
    runtime via a ``raise_error`` guard.
    """
    if bands < 1:
        raise ValueError(f"bands must be >= 1, got {bands}")
    if num_hashes is not None and (bands > num_hashes or num_hashes % bands):
        raise ValueError(
            f"bands={bands} must evenly divide the signature length "
            f"num_hashes={num_hashes} (and not exceed it): trailing hashes "
            "would be silently dropped from every band"
        )
    return _bucket_self_join(
        _lsh_banded_sized(signatures, bands, num_hashes), bands, max_bucket
    )


def _lsh_banded_sized(
    signatures: DataFrame, bands: int, num_hashes: int | None
) -> DataFrame:
    """(doc_id, __barr, band, bucket, bucket_size) — shared by the
    candidate join and the :func:`oversized_buckets` audit view.
    ``__barr`` is the doc's full band-bucket array, carried so the join
    can apply the leftmost-match veto without re-deriving buckets."""
    n = F.size(F.col("minhash"))
    if num_hashes is None:
        # Runtime guard (constant-folds to a no-op when sizes are uniform
        # and divisible): any signature whose length bands doesn't divide
        # fails loudly instead of silently losing hashes.
        signatures = signatures.withColumn(
            "minhash",
            F.when(
                (n % bands == 0) & (n >= bands), F.col("minhash")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(f"lsh_candidate_pairs: bands={bands} must evenly divide "),
                        F.lit("signature length, got length "),
                        n.cast("string"),
                    )
                )
            ),
        )
    rows_per_band = (n / bands).cast("int")
    banded = signatures.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.hash(
                F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)
            ),
        ).alias("__barr"),
    ).select("doc_id", "__barr", F.posexplode("__barr").alias("band", "bucket"))
    return banded.withColumn(
        "bucket_size",
        F.count(F.lit(1)).over(Window.partitionBy("band", "bucket")),
    )


def _bucket_self_join(
    sized: DataFrame, bands: int, max_bucket: int | None
) -> DataFrame:
    """Candidate pairs via the **leftmost-surviving-match** rule (see
    :func:`_simhash_chunk_pairs` for the full rationale): near-identical
    docs share MANY band buckets, so the naive formulation emits each
    pair once per shared band and then pays a ``dropDuplicates`` shuffle
    over the quadratic candidate set; vetoing any pair whose signatures
    already matched on an earlier *surviving* band emits each pair
    exactly once — a codegen filter instead of a candidate-sized shuffle.

    Generalized over any ``(doc_id, __barr, band, bucket, bucket_size)``
    view (``__barr`` = the doc's bucket per band, in band order; bucket
    values of any equality-comparable type) — shared by the production
    xxhash64 banding (:func:`_lsh_banded_sized`) and the md5 oracle twin
    (:func:`minhash_md5_pairs` via :func:`_banded_sized_from_buckets`),
    so the cross-engine parity check executes this exact join.

    ``max_bucket=None`` disables the hot-bucket cap: every bucket
    survives, so the survival bitmask (and its per-doc window) is elided
    and the veto is pure earlier-band equality — the result set is then
    provably identical to naive distinct candidate pairs. With a cap the
    per-band survival bit rides a bigint bitmask, which caps ``bands`` at
    63 (shiftleft past bit 63 would wrap and silently corrupt vetoes).
    The veto is a chain of ``bands-1`` codegen filters — fine at
    realistic band counts (≤ 64), part of why the bitmask cap is
    acceptable rather than worth a variable-length encoding.
    """
    if max_bucket is not None and bands > 63:
        raise ValueError(
            f"bands={bands}: the per-band survival bitmask is a 64-bit "
            "long, so at most 63 bands are supported with a hot-bucket "
            "cap (pass max_bucket=None to disable the cap, or lower bands)"
        )
    if max_bucket is None:
        capped = sized
        mask_cols: list = []
    else:
        survive_mask = F.sum(
            F.when(
                F.col("bucket_size") <= max_bucket,
                F.expr("shiftleft(cast(1 as bigint), band)"),
            ).otherwise(F.lit(0).cast("long"))
        ).over(Window.partitionBy("doc_id"))
        capped = sized.withColumn("__smask", survive_mask).filter(
            F.col("bucket_size") <= max_bucket
        )
        mask_cols = [F.col("__smask").alias("__smask_a")]
    a = capped.select(
        "band", "bucket",
        F.col("doc_id").alias("doc_a"),
        F.col("__barr").alias("__barr_a"),
        *mask_cols,
    )
    b = capped.select(
        "band", "bucket",
        F.col("doc_id").alias("doc_b"),
        F.col("__barr").alias("__barr_b"),
    )
    joined = a.join(b, on=["band", "bucket"]).filter(
        F.col("doc_a") < F.col("doc_b")
    )
    for j in range(bands - 1):
        earlier_match = (F.lit(j) < F.col("band")) & (
            F.col("__barr_a")[j] == F.col("__barr_b")[j]
        )
        if max_bucket is not None:
            earlier_match = earlier_match & (
                F.shiftright(F.col("__smask_a"), j).bitwiseAND(F.lit(1)) == 1
            )
        joined = joined.filter(~earlier_match)
    return joined.select("doc_a", "doc_b")


def _bucket_self_join_naive(
    sized: DataFrame, max_bucket: int | None
) -> DataFrame:
    """Reference semantics for :func:`_bucket_self_join`: drop capped
    buckets, self-join on (band, bucket), distinct the pair set. Pays the
    candidate-sized ``dropDuplicates`` shuffle the leftmost rule exists to
    eliminate — kept ONLY as the property-test twin (leftmost ≡ naive on
    any input, caps active or not); never on a production path.
    """
    capped = (
        sized if max_bucket is None
        else sized.filter(F.col("bucket_size") <= max_bucket)
    )
    a = capped.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    b = capped.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _banded_sized_from_buckets(buckets: DataFrame) -> DataFrame:
    """Adapt any ``(doc_id, band, bucket)`` frame (one row per doc per
    band, bands numbered 0..n-1) to the ``(doc_id, __barr, band, bucket,
    bucket_size)`` view :func:`_bucket_self_join` consumes. The band
    array is assembled with one groupBy (sorting the (band, bucket)
    structs by band); bucket_size rides a window over (band, bucket) that
    reuses the join's own hash partitioning.
    """
    barr = buckets.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("band", "bucket"))),
            lambda s: s["bucket"],
        ).alias("__barr")
    )
    sized = barr.select(
        "doc_id", "__barr", F.posexplode("__barr").alias("band", "bucket")
    )
    return sized.withColumn(
        "bucket_size",
        F.count(F.lit(1)).over(Window.partitionBy("band", "bucket")),
    )


def oversized_buckets(
    signatures: DataFrame,
    bands: int = 8,
    max_bucket: int = 1000,
    num_hashes: int | None = None,
) -> DataFrame:
    """(band, bucket, bucket_size, doc_ids) for every LSH bucket the
    candidate join drops as degenerate — the observability half of
    ``max_bucket``. A dropped bucket means boilerplate-identical band
    signatures (every doc would pair with every doc: |bucket|² join rows);
    production runs alert on the count and route those docs to exact
    dedup instead of letting one hot bucket quadratically dominate.
    """
    return (
        _lsh_banded_sized(signatures, bands, num_hashes)
        .filter(F.col("bucket_size") > max_bucket)
        .groupBy("band", "bucket")
        .agg(
            F.first("bucket_size").alias("bucket_size"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
    )


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    shingle_k: int = 3,
) -> DataFrame:
    """Exact Jaccard over distinct shingle-hash sets for candidate pairs
    only: (doc_a, doc_b, jaccard). Join-shaped: two hash joins on doc id —
    shingles are computed only for docs that appear in candidates (an
    explicit semi-join restricts the text scan first). Sets hold 64-bit
    k-gram hashes, not strings: same Jaccard modulo hash collisions, and
    the intersect runs over longs (8 bytes/element through the shuffle
    instead of full shingle text)."""
    ids = (
        candidates.select(F.col("doc_a").alias("__cid"))
        .unionByName(candidates.select(F.col("doc_b").alias("__cid")))
        .distinct()
    )
    relevant = df.join(
        ids, on=[F.col(id_col) == F.col("__cid")], how="left_semi"
    )
    sh = (
        kgram_hash_stream(relevant, id_col, text_col, k=shingle_k)
        .groupBy("doc_id")
        .agg(F.collect_set("__sh").alias("sh"))
    )
    joined = (
        candidates.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), on="doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), on="doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        joined.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: verified pairs (doc_a, doc_b,
    jaccard) with jaccard ≥ threshold.

    Signatures are persisted (memory-and-disk) for the duration of the
    plan: the banding self-join references them on both sides, and without
    materialization Spark recomputes the whole signature subtree per
    reference (observed 36 exchanges / 12 rescans in the executed plan).
    This mirrors the reference's one deliberate cache
    (``spark/silver/processor.py:422-425``) — persist inputs consumed by
    more than one downstream branch.
    """
    from pyspark import StorageLevel

    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # Candidates feed three consumers in jaccard_verify (both id sides of
    # the semi-join restriction + the verify join itself); without
    # materialization the banding self-join executes three times.
    candidates = lsh_candidate_pairs(sigs, bands=bands, num_hashes=num_hashes).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return jaccard_verify(
        candidates, df, id_col, text_col, threshold=threshold, shingle_k=shingle_k
    )


#: One-live-entry cache for minhash_dedup_collapsed's members persist
#: (keyed by applicationId; see the function body for semantics).
_COLLAPSED_MEMBERS_PERSISTED: dict[str, DataFrame] = {}


def _expand_collapsed_pairs(
    rep_pairs: DataFrame,
    members: DataFrame,
    max_group_pairs: int | None = None,
) -> DataFrame:
    """Shared expansion half of the collapse-exact-first joins
    (:func:`minhash_dedup_collapsed`, :func:`jaccard_join_collapsed`).

    ``members`` is the group table ``(__m, __rep, __gsz)`` (member id,
    min-id representative, group size); ``rep_pairs`` the verified
    representative-level ``(doc_a, doc_b, jaccard)``. Cross-group pairs
    inherit their representatives' score through two id-only joins;
    intra-group pairs (byte-identical texts) emit at Jaccard 1.0.

    ``max_group_pairs`` is the quadratic-corner guard: groups above it
    emit STAR pairs (rep ↔ member, same CC connectivity, O(group) rows)
    instead of all-pairs, and are represented by their rep only in the
    cross expansion. ``None`` disables the guard — the EXACT contract
    (output bit-identical to the uncollapsed join, inherently d²-sized
    under duplication factor d).
    """
    if max_group_pairs is None:
        exp = members
        small = members
    else:
        # over-cap groups participate through their rep only (their
        # members reach the cluster via the star pairs below)
        exp = members.filter(
            (F.col("__gsz") <= max_group_pairs)
            | (F.col("__m") == F.col("__rep"))
        )
        small = members.filter(F.col("__gsz") <= max_group_pairs)
    # cross-group expansion: every member pair inherits its reps' jaccard
    ma = exp.select(F.col("__rep").alias("doc_a"), F.col("__m").alias("__xa"))
    mb = exp.select(F.col("__rep").alias("doc_b"), F.col("__m").alias("__xb"))
    cross = (
        rep_pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            F.least("__xa", "__xb").alias("doc_a"),
            F.greatest("__xa", "__xb").alias("doc_b"),
            "jaccard",
        )
    )
    # intra-group expansion: identical texts are jaccard-1.0 pairs;
    # all-pairs within the cap (or always, exact mode), star beyond it
    intra = (
        small.alias("l")
        .join(small.alias("r"), F.col("l.__rep") == F.col("r.__rep"))
        .filter(F.col("l.__m") < F.col("r.__m"))
        .select(
            F.col("l.__m").alias("doc_a"),
            F.col("r.__m").alias("doc_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    out = cross.unionByName(intra)
    if max_group_pairs is None:
        return out
    star = (
        members.filter(
            (F.col("__gsz") > max_group_pairs)
            & (F.col("__m") != F.col("__rep"))
        )
        # rep = group min id, so rep < member always
        .select(
            F.col("__rep").alias("doc_a"),
            F.col("__m").alias("doc_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return out.unionByName(star)


def _collapse_md5_groups(
    docs: DataFrame, sets: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared collapse half of the collapse-exact-first joins: min-id
    md5 representatives of byte-identical texts, restricted to the docs
    that actually shingle (ids present in the prepared ``(__id, __set)``
    frame — identical zero-shingle docs never reach a candidate join in
    the direct paths, so they must not gain pairs here either).

    Returns ``(members, rep_of)``: ``members`` is the CHECKPOINTED
    ``(__m, __rep, __gsz)`` group table (consumed by expansion joins
    and stats aggregates — shared lineage, checkpoint once); ``rep_of``
    is ``(__fp, __rep, __gsz)`` for representative semi-joins.

    :func:`jaccard_join_collapsed` keeps its own specialized form — it
    collapses BEFORE shingling (that is its whole cost advantage) and
    therefore derives group membership from ``tokens() >= 1`` and
    carries the representative TEXT, which this sets-based helper
    cannot provide.
    """
    fp = docs.select(
        F.col(id_col).alias("__m"), F.md5(F.col(text_col)).alias("__fp")
    ).join(sets.select(F.col("__id").alias("__m")), "__m")
    rep_of = fp.groupBy("__fp").agg(
        F.min("__m").alias("__rep"),
        F.count(F.lit(1)).cast("long").alias("__gsz"),
    )
    members = (
        fp.join(rep_of, "__fp")
        .select("__m", "__rep", "__gsz")
        .localCheckpoint(eager=True)
    )
    return members, rep_of


def minhash_dedup_collapsed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.7,
    max_group_pairs: int = 1000,
) -> DataFrame:
    """:func:`minhash_dedup` for DUPLICATE-HEAVY corpora: collapse exact
    byte-duplicates to one representative per group, run the banded LSH
    pipeline on representatives only, then expand verified pairs back
    over group members.

    Why this is exact, not an approximation: identical text means
    identical shingle sets, hence identical minhash signatures, hence
    identical band buckets and identical Jaccard — every pair decision
    (candidate or not, jaccard value) is a pure function of the two
    TEXTS. So intra-group pairs are always (1.0)-verified candidates,
    and a cross-group pair (x∈A, y∈B) is a verified pair iff
    (rep_A, rep_B) is: the expanded pair set EQUALS the default path's
    (asserted on planted data in ``test_dedup_similarity``), modulo one
    deliberate divergence — hot-bucket caps. Caps see post-collapse
    bucket sizes, so buckets the default path would have dropped (size
    inflated by copies of the same text) survive here: strictly MORE
    recall on heavily-duplicated boilerplate, never less.

    Why it is fast where it matters: a corpus with duplication factor d
    sends d× fewer docs through signatures/banding and d²× fewer
    candidate pairs through exact verification — the common-crawl
    regime (boilerplate pages copied across hosts) where vanilla LSH
    melts. Group collapse is one md5 hash-aggregate (ids only);
    expansion is two metadata joins plus an intra-group self-join.

    ``max_group_pairs`` guards the one quadratic corner: a boilerplate
    text repeated a million times would expand to 10¹² intra pairs.
    Groups whose member count exceeds it emit STAR pairs (rep ↔ member)
    instead of all-pairs — same connectivity for the connected-components
    clustering every dedup run feeds (a removal list is unchanged), in
    O(group) rows; the cross-group expansion inherits the same guard on
    each side. This is the production entry point for web-scale corpora;
    :func:`minhash_dedup` remains the reference semantics.
    """
    from pyspark import StorageLevel

    if max_group_pairs < 1:
        raise ValueError(f"max_group_pairs must be >= 1, got {max_group_pairs}")
    raw_fp = F.md5(F.col(text_col).cast("string"))  # byte-exact, NOT normalized
    keyed = df.select(F.col(id_col).alias("__m"), raw_fp.alias("__fp"))
    # aggregate+join, not a fingerprint-partitioned window: a boilerplate
    # text repeated millions of times must partial-combine map-side, not
    # buffer one giant window group
    rep_of = keyed.groupBy("__fp").agg(
        F.min("__m").alias("__rep"), F.count(F.lit(1)).alias("__gsz")
    )
    # Idempotent persist (ADVICE r5 — same class as the r4 spans-leg
    # fix): at most ONE live members cache per session, the previous
    # invocation's entry unpersisted when a new one is built, so
    # repeated registry/bench invocations cannot accumulate cache
    # entries. Concurrent collapsed pipelines in one session would
    # alternate the slot — acceptable for a bounded-leak guarantee.
    members = keyed.join(rep_of, "__fp").select("__m", "__rep", "__gsz")
    app_id = df.sparkSession.sparkContext.applicationId
    # Evict only entries from OTHER (stopped) sessions (ADVICE r6: the
    # unconditional sweep made two interleaved collapsed pipelines in
    # one session thrash each other's cache); the current session keeps
    # its one live entry, replaced below — still a bounded leak.
    for old_key, old in list(_COLLAPSED_MEMBERS_PERSISTED.items()):
        if old_key == app_id:
            continue
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 — stale handle from a stopped session
            pass
        del _COLLAPSED_MEMBERS_PERSISTED[old_key]
    prev = _COLLAPSED_MEMBERS_PERSISTED.pop(app_id, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:  # noqa: BLE001
            pass
    members = members.persist(StorageLevel.MEMORY_AND_DISK)
    _COLLAPSED_MEMBERS_PERSISTED[app_id] = members
    reps = df.join(
        members.filter(F.col("__m") == F.col("__rep")).select(
            F.col("__m").alias(id_col)
        ),
        id_col,
        "left_semi",
    )
    rep_pairs = minhash_dedup(
        reps,
        id_col,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
    )
    return _expand_collapsed_pairs(rep_pairs, members, max_group_pairs)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    window: int = 4,
) -> DataFrame:
    """(doc_id, fingerprint) — winnowing document fingerprints
    (Schleimer/Wilkerson/Aiken MOSS scheme): rolling k-gram hashes, then
    the minimum hash of every ``window`` consecutive k-grams, deduplicated.

    Guarantee: any shared substring of ≥ window+k-1 tokens between two
    documents yields at least one shared fingerprint — the partial-overlap
    detector (plagiarism/quotation/boilerplate) that whole-document
    MinHash can't provide.

    Plan shape: the same codegen pipeline as :func:`minhash_signatures`
    (posexplode → token hash → lead()-combined k-gram hash) plus one more
    sliding ``min() over rows between`` window — still zero Python, one
    shuffle on doc_id.
    """
    from pyspark.sql.window import Window as W

    grams = kgram_hash_stream(
        df, id_col, text_col, k=shingle_k, short_doc_fallback=False
    )
    w_min = (
        W.partitionBy("doc_id").orderBy("__pos").rowsBetween(-(window - 1), 0)
    )
    return (
        grams.select("doc_id", F.min("__sh").over(w_min).alias("fingerprint"))
        .distinct()
    )


def winnowing_fingerprints_md5(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    window: int = 4,
) -> DataFrame:
    """(doc_id, fingerprint) — winnowing with **cross-engine** md5 hashes.

    Same MOSS scheme and guarantees as :func:`winnowing_fingerprints`,
    with two substitutions that make the output reproducible by any SQL
    engine (DuckDB oracle-verifiable):

    - k-gram hash = ``md5`` of the space-joined k-token shingle string
      (md5 is bit-identical everywhere; xxhash64 seeds differ by engine);
    - window minimum = **lexicographic** min over the fixed-width
      lowercase hex digest — a total order every engine agrees on.

    The xxhash64 variant stays the production path (no shingle strings
    are materialized there and 8-byte longs beat 32-char strings through
    the shuffle ~4×); this one exists so the fingerprint pipeline has an
    exact external oracle. Shingles are built with ``lead()`` windows
    (whole-stage codegen), not interpreted array lambdas.
    """
    from pyspark.sql.window import Window as W

    if shingle_k < 2:
        raise ValueError("shingle_k must be >= 2 (use tokens directly for k=1)")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("__pos", "__t"),
    )
    w = W.partitionBy("doc_id").orderBy("__pos")
    leads = [F.lead("__t", j).over(w) for j in range(1, shingle_k)]
    grams = toks.select(
        "doc_id",
        "__pos",
        F.md5(F.concat_ws(" ", F.col("__t"), *leads)).alias("__fp"),
        leads[-1].alias("__last_lead"),
    ).filter(F.col("__last_lead").isNotNull())
    w_min = W.partitionBy("doc_id").orderBy("__pos").rowsBetween(-(window - 1), 0)
    return (
        grams.select("doc_id", F.min("__fp").over(w_min).alias("fingerprint"))
        .distinct()
    )


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, simhash): 64-bit SimHash over whitespace tokens.

    bit_j(doc) = sign of Σ_tokens (±1 depending on bit_j(xxhash64(token))).

    Plan shape: explode tokens → hash once (codegen) → one hash-aggregate
    with **16 packed branchless sums** (4 × 16-bit per-bit one-counts per
    long; a doc would need >65535 tokens to overflow a field) → unpack +
    sign-threshold into a **flat** 64-element weight array folded by a
    tiny ``aggregate``. Two lessons are encoded here:

    - per-bit ±1 contributions need no conditional: #1s − #0s =
      2·#1s − n, so the aggregate sums plain ``(h >> j) & 1`` bits —
      branchless and 4-to-a-long (16 measures instead of 64, ~3× on the
      aggregate);
    - the packing expression is a **balanced** bitwiseOR tree (depth 6).
      The original left-leaning OR chain (depth 64) cost seconds of
      DRIVER-side optimizer time per query build, and an interpreted
      ``F.aggregate`` fold — tried first — re-evaluates per downstream
      consumer (the pigeonhole blocker scans signatures once per chunk),
      which is exactly the interpreted-HOF-in-a-hot-path trap the MinHash
      path already documents. Balanced + codegen keeps both the driver
      and the executors fast; signatures are bit-identical.
    """
    exploded = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("__t")
    ).select("doc_id", F.xxhash64("__t").alias("__h"))
    packed = []
    for g in range(16):
        expr = None
        for k in range(4):
            j = g * 4 + k
            term = F.shiftleft(
                F.shiftright(F.col("__h"), j).bitwiseAND(F.lit(1)), k * 16
            )
            expr = term if expr is None else expr + term
        packed.append(F.sum(expr).alias(f"__p{g}"))
    agged = exploded.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__n"), *packed
    )

    def weighted_bit(j: int):
        ones = F.shiftright(F.col(f"__p{j // 4}"), (j % 4) * 16).bitwiseAND(
            F.lit(0xFFFF)
        )
        # sign(2·#1s − n) > 0 ⇔ the original ±1 sum is positive.
        # shiftleft(1L, 63) wraps to the sign bit — correct for a packed
        # 64-bit signature (2**63 would overflow a long literal).
        return F.when(
            ones * 2 > F.col("__n"), F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))

    terms = [weighted_bit(j) for j in range(64)]
    while len(terms) > 1:  # balanced OR reduction, depth log2(64) = 6
        terms = [
            terms[i].bitwiseOR(terms[i + 1]) if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return agged.select("doc_id", terms[0].alias("simhash"))


def _simhash_chunked(
    signatures: DataFrame, chunks: int, sig_bits: int
) -> DataFrame:
    """(doc_id, simhash, chunk_id, chunk, chunk_size) — the pigeonhole
    blocking view shared by the pair joins and the oversized-chunk audit."""
    bits = sig_bits // chunks
    parts = []
    for i in range(chunks):
        chunk = F.shiftright(F.col("simhash"), i * bits).bitwiseAND(
            F.lit((1 << bits) - 1)
        )
        parts.append(
            signatures.select(
                "doc_id", F.col("simhash"), F.lit(i).alias("chunk_id"), chunk.alias("chunk")
            )
        )
    all_chunks = parts[0]
    for p in parts[1:]:
        all_chunks = all_chunks.unionByName(p)
    return all_chunks.withColumn(
        "chunk_size",
        F.count(F.lit(1)).over(Window.partitionBy("chunk_id", "chunk")),
    )


def _simhash_chunk_pairs(
    all_chunks: DataFrame, max_hamming: int, max_bucket: int, sig_bits: int
) -> DataFrame:
    """Pairs from the chunked view via the **leftmost-surviving-match**
    rule: a pair is emitted ONLY from the smallest chunk index where the
    two signatures agree on a non-capped bucket. Matching pairs agree on
    up to ``chunks`` chunk values (exact duplicates agree on all), so the
    naive formulation emits each pair once per agreeing chunk and then
    pays a ``dropDuplicates`` shuffle over the (quadratic) candidate set;
    the leftmost rule turns that into a codegen filter on the join output
    and removes the candidate-sized shuffle entirely. Cap-awareness: the
    "earlier chunk also matched" veto only applies where the earlier
    bucket SURVIVED the cap (tracked as a per-doc bitmask — when two
    signatures agree on chunk j they share that bucket, so one side's
    survival bit is both sides').
    """
    chunks = max_hamming + 1
    if chunks > 63:
        raise ValueError(
            f"max_hamming={max_hamming}: the per-chunk survival bitmask "
            "is a 64-bit long, so at most 63 chunks are supported"
        )
    bits = sig_bits // chunks
    mask = (1 << bits) - 1
    # bigint base: an INT 1 would make the shift wrap mod 32 and corrupt
    # the mask for chunk_id >= 32 (same guard class as _bucket_self_join).
    survive_mask = F.sum(
        F.when(
            F.col("chunk_size") <= max_bucket,
            F.expr("shiftleft(cast(1 as bigint), chunk_id)"),
        ).otherwise(F.lit(0).cast("long"))
    ).over(Window.partitionBy("doc_id"))
    flagged = all_chunks.withColumn("__smask", survive_mask)
    capped = flagged.filter(F.col("chunk_size") <= max_bucket)
    a = capped.select(
        F.col("chunk_id"), F.col("chunk"),
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"),
        F.col("__smask").alias("__smask_a"),
    )
    b = capped.select(
        F.col("chunk_id"), F.col("chunk"),
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
    )
    joined = a.join(b, on=["chunk_id", "chunk"]).filter(
        F.col("doc_a") < F.col("doc_b")
    )

    def chunk_of(col: str, j: int):
        return F.shiftright(F.col(col), j * bits).bitwiseAND(F.lit(mask))

    for j in range(chunks - 1):
        earlier_match = (
            (F.lit(j) < F.col("chunk_id"))
            & (chunk_of("sim_a", j) == chunk_of("sim_b", j))
            & (F.shiftright(F.col("__smask_a"), j).bitwiseAND(F.lit(1)) == 1)
        )
        joined = joined.filter(~earlier_match)
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        joined.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_near_pairs(
    signatures: DataFrame, max_hamming: int = 3, max_bucket: int = 100_000
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with Hamming distance ≤ ``max_hamming``.

    Pigeonhole blocking: split 64 bits into ``max_hamming + 1`` chunks; any
    pair within distance r agrees exactly on at least one chunk → equi-join
    per chunk, then exact popcount filter. Never an all-pairs product.

    ``max_bucket`` caps a chunk bucket's membership the same way
    :func:`lsh_candidate_pairs` caps band buckets: with billions of docs a
    16-bit chunk space averages n/65536 docs per bucket, and one
    boilerplate-heavy chunk value would contribute |bucket|² join rows.
    Dropped buckets are observable via :func:`simhash_oversized_chunks` —
    never a silent recall loss. The default never triggers below ~100k
    same-chunk docs (a corpus that hot should route through exact dedup
    first).

    The signature frame is persisted here: the chunk union references it
    ``chunks`` times on each of two join sides, and lazily Spark would
    re-run the signature aggregate per reference (measured 3.5× the
    pipeline wall at 10× sf0.1) — the same multi-consumer persist rule
    :func:`minhash_dedup` documents.
    """
    from pyspark import StorageLevel

    signatures = signatures.persist(StorageLevel.MEMORY_AND_DISK)
    all_chunks = _simhash_chunked(signatures, max_hamming + 1, 64)
    return _simhash_chunk_pairs(all_chunks, max_hamming, max_bucket, 64)


def simhash_oversized_chunks(
    signatures: DataFrame,
    max_hamming: int = 3,
    max_bucket: int = 100_000,
    sig_bits: int = 64,
) -> DataFrame:
    """(chunk_id, chunk, chunk_size) for every pigeonhole bucket the pair
    join drops — the audit twin of ``max_bucket`` in
    :func:`simhash_near_pairs` / :func:`simhash_md5_pairs`."""
    return (
        _simhash_chunked(signatures, max_hamming + 1, sig_bits)
        .filter(F.col("chunk_size") > max_bucket)
        .select("chunk_id", "chunk", "chunk_size")
        .distinct()
    )


def minhash_md5_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.2,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with **cross-engine** md5 hashing:
    (doc_a, doc_b, jaccard). Oracle-verifiable twin of
    :func:`minhash_dedup` (same scheme as :func:`winnowing_fingerprints_md5`
    is to :func:`winnowing_fingerprints`; xxhash64 stays the fast path —
    8-byte longs beat 32-char hex strings through every shuffle).

    Candidate generation routes through the SAME leftmost-surviving-match
    band join production uses (:func:`_bucket_self_join`, via the
    ``(doc_id, band, bucket)`` adapter :func:`_banded_sized_from_buckets`)
    — so the driver's cross-engine hash check verifies the rewritten join,
    not a separate naive formulation. ``max_bucket=None`` (the default)
    disables the hot-bucket cap, making the pair set provably identical
    to naive distinct candidates — exactly what a cap-free SQL oracle
    computes; pass a cap to mirror production recall behavior (then the
    oracle must model the cap too).

    Engine-portable substitutions:

    - minhash_i(doc) = lexicographic MIN over shingles of
      ``md5('<i>:' || shingle_text)`` — md5 is bit-identical everywhere
      and fixed-width lowercase hex gives a total order engines agree on;
    - band bucket = md5 of the '|'-joined band minhashes in seed order;
    - verification = exact Jaccard over the distinct md5(shingle) sets.

    Docs with fewer than ``shingle_k`` tokens yield no shingles and thus
    never pair (the production path keeps them via a whole-text fallback).

    Persist note (same multi-consumer rule :func:`minhash_dedup`
    documents): the distinct shingle-hash frame feeds both the per-seed
    minima and the Jaccard sets, so it is persisted and stays cached for
    the lifetime of the returned (lazy) plan — callers running many
    separate invocations in one session should ``spark.catalog.clearCache()``
    between them, as bench.py does.
    """
    from pyspark import StorageLevel

    if bands < 1 or bands > num_hashes or num_hashes % bands:
        raise ValueError(
            f"bands={bands} must evenly divide num_hashes={num_hashes}"
        )
    if shingle_k < 2:
        raise ValueError(
            "shingle_k must be >= 2 (use tokens directly for k=1)"
        )
    from home_credit_data_engineering_spark.functions.text import tokens
    from pyspark.sql.window import Window as W

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("__pos", "__t"),
    )
    w = W.partitionBy("doc_id").orderBy("__pos")
    leads = [F.lead("__t", j).over(w) for j in range(1, shingle_k)]
    # Hash each shingle to its md5 BEFORE the distinct: every downstream
    # shuffle (distinct, per-seed min, Jaccard sets) then carries 32-hex
    # ids, never raw shingle text — the ids+hashes-only shuffle discipline
    # the xxhash64 path has, kept here with an engine-portable hash.
    grams = (
        toks.select(
            "doc_id",
            F.md5(F.concat_ws(" ", F.col("__t"), *leads)).alias("gh"),
            leads[-1].alias("__last_lead"),
        )
        .filter(F.col("__last_lead").isNotNull())
        .select("doc_id", "gh")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seeded = grams.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed"),
        F.col("gh"),
    ).select(
        "doc_id",
        "seed",
        F.md5(
            F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("gh"))
        ).alias("__h"),
    )
    rows_per_band = num_hashes // bands
    mh = seeded.groupBy("doc_id", "seed").agg(F.min("__h").alias("mh"))
    buckets = (
        mh.withColumn("band", F.floor(F.col("seed") / rows_per_band))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                        lambda s: s["mh"],
                    ),
                )
            ).alias("bucket")
        )
    )
    cands = _bucket_self_join(
        _banded_sized_from_buckets(buckets), bands, max_bucket
    )
    sets = grams.groupBy("doc_id").agg(
        F.collect_set(F.col("gh")).alias("sh"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = cands.join(
        sets.select(
            F.col("doc_id").alias("doc_a"),
            F.col("sh").alias("sh_a"),
            F.col("n").alias("na"),
        ),
        on="doc_a",
    ).join(
        sets.select(
            F.col("doc_id").alias("doc_b"),
            F.col("sh").alias("sh_b"),
            F.col("n").alias("nb"),
        ),
        on="doc_b",
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = F.round(
        inter.cast("double")
        / (F.col("na") + F.col("nb") - inter).cast("double"),
        6,
    )
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_md5_signatures(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash with **cross-engine** md5 token
    hashing — the oracle-verifiable twin of :func:`simhash_signatures`
    (64-bit xxhash64 stays the production path).

    bit_b(doc) = sign of Σ_tokens (±1 by bit b of the token's md5), with
    the 32 bits drawn from the first 8 hex chars of ``md5(token)``
    (char i, bit k → b = 4*(i-1)+k). All expressions are integer
    arithmetic a SQL oracle reproduces exactly: ones-counts per bit, then
    2·ones − n > 0 as the sign test.
    """
    from home_credit_data_engineering_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("__t")
    ).select("doc_id", F.md5("__t").alias("__h"))
    digits = [
        F.conv(F.substring(F.col("__h"), i, 1), 16, 10).cast("int")
        for i in range(1, 9)
    ]
    ones = [
        F.sum(F.shiftright(digits[i], k).bitwiseAND(F.lit(1))).alias(
            f"__ones{4 * i + k}"
        )
        for i in range(8)
        for k in range(4)
    ]
    agged = toks.groupBy("doc_id").agg(
        *ones, F.count(F.lit(1)).alias("__n")
    )
    sig = None
    for b in range(32):
        bit = F.when(
            2 * F.col(f"__ones{b}") - F.col("__n") > 0, F.lit(1 << b)
        ).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return agged.select("doc_id", sig.cast("bigint").alias("simhash"))


def simhash_md5_pairs(
    signatures: DataFrame, max_hamming: int = 3, max_bucket: int = 100_000
) -> DataFrame:
    """(doc_a, doc_b, hamming) for 32-bit md5 SimHash signatures.

    Same pigeonhole blocking (and ``max_bucket`` hot-bucket cap, audited
    via :func:`simhash_oversized_chunks` with ``sig_bits=32``) as
    :func:`simhash_near_pairs` but over 32-bit signatures (4 chunks × 8
    bits for the default Hamming ≤ 3) — reusing the 64-bit splitter would
    leave the top chunks all-zero and every pair a candidate.
    """
    from pyspark import StorageLevel

    signatures = signatures.persist(StorageLevel.MEMORY_AND_DISK)
    all_chunks = _simhash_chunked(signatures, max_hamming + 1, 32)
    return _simhash_chunk_pairs(all_chunks, max_hamming, max_bucket, 32)


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------


def embedding_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_threshold: int = 10_000,
    n_bits: int = 8,
    n_tables: int = 6,
    seed: int = 42,
    corpus_count: int | None = None,
) -> DataFrame:
    """(id_a, id_b, score) pairs with cosine ≥ threshold (id_a < id_b).

    **Size-routed**: corpora up to ``block_threshold`` rows (probed with a
    ``limit(n+1).count()`` — never a full count; iterative callers that
    already know the size pass ``corpus_count`` to skip the probe job
    entirely) use the exact all-pairs path; anything larger routes
    through hyperplane-LSH blocking
    (:func:`_embedding_near_pairs_blocked`) — candidates are pairs sharing
    a bucket signature in any of ``n_tables`` tables, re-ranked by exact
    cosine, so the cost is |bucket|² per bucket, never |corpus|². The
    blocked path is approximate (recall < 1 for pairs that collide in no
    table); at cosine ≥ 0.95 the default 8-bit × 6-table setting holds
    recall ≈ 0.96 (P[bit agrees] = 1 − θ/π ≈ 0.90 at θ ≈ 18°).
    """
    from home_credit_data_engineering_spark.functions.vectors import cosine

    probe = (
        corpus_count
        if corpus_count is not None
        else df.limit(block_threshold + 1).count()
    )
    if probe > block_threshold:
        return _embedding_near_pairs_blocked(
            df, id_col, vec_col, threshold, n_bits=n_bits, n_tables=n_tables, seed=seed
        )

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", F.round(cosine(F.col("__va"), F.col("__vb")), 6))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def _embedding_near_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_bits: int = 8,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """LSH-blocked near-dup pairs: the 100 TB path.

    posexplode the per-table signatures → self equi-join on
    (table, bucket) → id-pair dedup → exact cosine re-rank on the
    candidate pairs only. Candidate discovery shuffles (id, table, sig)
    triples — vectors are joined back *after* pair dedup so embedding
    payloads never ride the banding shuffle ``n_tables`` times.
    """
    from pyspark import StorageLevel

    from home_credit_data_engineering_spark.functions.vectors import cosine
    from home_credit_data_engineering_spark.operators.similarity import (
        make_planes,
        with_hyperplane_signatures,
    )

    dim = df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    planes = make_planes(dim, n_bits=n_bits, n_tables=n_tables, seed=seed)
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    sigs = (
        with_hyperplane_signatures(base, "v", planes)
        .select("id", F.posexplode("__sigs").alias("t", "sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = sigs.select(F.col("t"), F.col("sig"), F.col("id").alias("id_a"))
    b = sigs.select(F.col("t"), F.col("sig"), F.col("id").alias("id_b"))
    candidates = (
        a.join(b, on=["t", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("__va"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("__vb"))
    return (
        candidates.join(va, on="id_a")
        .join(vb, on="id_b")
        .withColumn("score", F.round(cosine(F.col("__va"), F.col("__vb")), 6))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def _assign_clusters(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int,
    seed: int,
    max_iter: int,
    train_fraction: float | None,
) -> DataFrame:
    """(id, cluster, v) via a seeded KMeans coarse quantizer — the same
    build economics as :func:`~..similarity.ivf_topk`: random init, few
    iterations, optional seeded training sample; the full corpus is only
    *assigned* (one Arrow-batched matmul pass against the broadcast
    centroid matrix, no N × k join rows)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.functions import pandas_udf

    from home_credit_data_engineering_spark.functions.vectors import (
        to_double_array,
    )

    base = df.select(
        F.col(id_col).alias("id"), to_double_array(vec_col).alias("v")
    )
    train_src = (
        base.sample(fraction=train_fraction, seed=seed)
        if train_fraction is not None
        else base
    )
    model = KMeans(
        k=n_clusters, seed=seed, maxIter=max_iter, initMode="random"
    ).fit(train_src.select(array_to_vector("v").alias("features")))
    centers = np.array(
        [list(c) for c in model.clusterCenters()], dtype=np.float64
    )
    c_norm = np.linalg.norm(centers, axis=1)
    c_unit = np.where(
        c_norm[:, None] > 0, centers / np.maximum(c_norm, 1e-300)[:, None], 0.0
    )

    @pandas_udf("int")
    def best_cell(v: pd.Series) -> pd.Series:
        M = np.array(v.tolist(), dtype=np.float64)
        mn = np.linalg.norm(M, axis=1)
        Mu = np.where(mn[:, None] > 0, M / np.maximum(mn, 1e-300)[:, None], 0.0)
        return pd.Series(np.argmax(Mu @ c_unit.T, axis=1).astype("int32"))

    return base.withColumn("cluster", best_cell("v"))


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    cluster_col: str | None = None,
    n_clusters: int | None = None,
    seed: int = 42,
    max_iter: int = 5,
    train_fraction: float | None = None,
    max_cluster: int = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: (id, cluster, kept).

    Cluster the embedding space, then within each cluster drop every
    vector that has a **smaller-id** neighbor at cosine ≥ ``threshold``
    (the min-id survivor of each ε-neighborhood is kept) — the
    clustering-bounded near-duplicate pruning of Abbas et al.,
    *SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication* (arXiv:2303.09540), with a deterministic, order-free
    survivor rule instead of the paper's centroid-distance heuristic so
    the verdict is reproducible by any engine.

    ``cluster_col`` supplies a precomputed blocking column (a metadata
    label, an LSH bucket, a previous run's assignment) — the
    oracle-verifiable form, since KMeans assignment is engine-specific.
    Without it, a seeded KMeans coarse quantizer assigns clusters
    (``n_clusters`` defaults to √N on a one-off count — pass it
    explicitly in iterative jobs to skip the count job).

    Scale: the only shuffle keyed on data volume is the cluster
    self-join, |c|² per cluster — bounded by choosing n_clusters ≈
    N/target_cluster_size, with ``max_cluster`` dropping degenerate
    clusters from the pair scan (their members are all KEPT, never
    silently discarded; audit via :func:`semantic_oversized_clusters`).
    Vectors ride the single cluster-keyed exchange once per side; the
    drop set shuffles bare ids.
    """
    from home_credit_data_engineering_spark.functions.vectors import cosine

    if cluster_col is not None:
        clustered = df.select(
            F.col(id_col).alias("id"),
            F.col(cluster_col).alias("cluster"),
            F.col(vec_col).alias("v"),
        )
    else:
        if n_clusters is None:
            n_clusters = max(16, int(df.count() ** 0.5))
        clustered = _assign_clusters(
            df, id_col, vec_col, n_clusters, seed, max_iter, train_fraction
        )
    sized = clustered.withColumn(
        "__csize", F.count(F.lit(1)).over(Window.partitionBy("cluster"))
    )
    capped = sized.filter(F.col("__csize") <= max_cluster)
    a = capped.select(
        "cluster", F.col("id").alias("id_a"), F.col("v").alias("__va")
    )
    b = capped.select(
        "cluster", F.col("id").alias("id_b"), F.col("v").alias("__vb")
    )
    dropped = (
        a.join(b, on="cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", F.round(cosine(F.col("__va"), F.col("__vb")), 6))
        .filter(F.col("score") >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        clustered.join(
            dropped.withColumn("__dropped", F.lit(True)), on="id", how="left"
        )
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("kept"),
        )
    )


def semantic_oversized_clusters(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str | None = None,
    n_clusters: int | None = None,
    seed: int = 42,
    max_cluster: int = 100_000,
) -> DataFrame:
    """(cluster, cluster_size) for every cluster :func:`semantic_dedup`
    excludes from the pair scan — the audit twin of ``max_cluster``
    (members of such clusters are kept wholesale, so an alerting job
    routes them through a tighter re-clustering instead of silently
    accepting the recall loss)."""
    if cluster_col is not None:
        clustered = df.select(F.col(cluster_col).alias("cluster"))
    else:
        if n_clusters is None:
            n_clusters = max(16, int(df.count() ** 0.5))
        clustered = _assign_clusters(
            df, id_col, vec_col, n_clusters, seed, 5, None
        ).select("cluster")
    return (
        clustered.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .filter(F.col("cluster_size") > max_cluster)
    )


# ---------------------------------------------------------------------------
# Incremental MinHash dedup (O(delta) daily-job form)
# ---------------------------------------------------------------------------


def lsh_bucket_state(
    signatures: DataFrame, bands: int = 8, num_hashes: int | None = None
) -> DataFrame:
    """(band, bucket, doc_id) — the persisted LSH bucket table.

    This is the *state* an incremental dedup job maintains between runs:
    banding is computed once per document ever, and each day's delta
    probes the stored buckets instead of re-banding the whole corpus.
    Same banding expression as :func:`lsh_candidate_pairs` (bands must
    evenly divide the signature length — validated identically).
    """
    if bands < 1:
        raise ValueError(f"bands must be >= 1, got {bands}")
    if num_hashes is not None and (bands > num_hashes or num_hashes % bands):
        raise ValueError(
            f"bands={bands} must evenly divide num_hashes={num_hashes}"
        )
    n = F.size(F.col("minhash"))
    rows_per_band = (n / bands).cast("int")
    return signatures.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.hash(
                        F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def minhash_incremental_pairs(
    new_docs: DataFrame,
    bucket_state: DataFrame,
    all_texts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 1000,
) -> dict:
    """One incremental dedup step: verify only pairs that involve a NEW doc.

    The full-corpus pipeline (:func:`minhash_dedup`) is O(corpus) per
    run; the daily job should be O(delta): signatures and bucket rows are
    computed for ``new_docs`` only, candidates come from probing the
    persisted ``bucket_state`` (see :func:`lsh_bucket_state`) plus the
    new docs' own buckets, and exact-Jaccard verification touches only
    candidate docs (``all_texts`` is semi-join-restricted inside
    :func:`jaccard_verify`). Bucket-size capping counts only buckets the
    delta touches — never a full-state scan.

    Returns ``{"pairs", "new_buckets"}``: ``pairs`` are the verified
    (doc_a, doc_b, jaccard) edges involving ≥1 new doc; ``new_buckets``
    is the delta to append to the bucket state for the next run.
    Invariant (tested): full-corpus pairs == old-corpus pairs ∪
    incremental pairs.

    Contract: ``all_texts`` must contain the text of EVERY id that can
    appear in a candidate — i.e. the accepted corpus ∪ ``new_docs``.
    Ids missing from it silently drop their candidate pairs (the verify
    joins are inner on doc id).
    """
    from pyspark import StorageLevel

    new_sigs = minhash_signatures(
        new_docs, id_col, text_col, num_hashes=num_hashes, shingle_k=shingle_k
    )
    new_buckets = lsh_bucket_state(
        new_sigs, bands=bands, num_hashes=num_hashes
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # Only buckets the delta touches matter; restrict the state FIRST so
    # the size cap and the candidate join are O(delta · bucket size).
    touched = new_buckets.select("band", "bucket").distinct()
    relevant_state = bucket_state.join(touched, on=["band", "bucket"], how="left_semi")
    all_buckets = relevant_state.unionByName(new_buckets)
    sized = all_buckets.withColumn(
        "bucket_size",
        F.count(F.lit(1)).over(Window.partitionBy("band", "bucket")),
    ).filter(F.col("bucket_size") <= max_bucket)

    a = new_buckets.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    b = sized.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    candidates = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .dropDuplicates()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pairs = jaccard_verify(
        candidates,
        all_texts,
        id_col,
        text_col,
        threshold=threshold,
        shingle_k=shingle_k,
    )
    return {"pairs": pairs, "new_buckets": new_buckets}


def jaccard_similarity_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_k: int = 3,
    round_digits: int = 6,
    stats: dict | None = None,
    collapse_exact: bool = True,
) -> DataFrame:
    """EXACT all-pairs Jaccard join via prefix filtering — every pair of
    documents whose shingle-set Jaccard clears ``threshold``, with NO
    blocking key and NO sketch approximation (the completeness the
    MinHash/SimHash pipelines trade away).

    Prefix-filter principle (Chaudhuri/Ganti/Kaushik ICDE 2006; Vernica/
    Carey/Li SIGMOD 2010 for the MapReduce formulation; PPJoin, Xiao et
    al. WWW 2008): fix ONE global total order over tokens — here
    (ascending global frequency, then token text; rarest first) — and
    sort every document's token set by it. If ``J(x, y) >= t`` then the
    first ``|x| - ceil(t * |x|) + 1`` tokens of x and the corresponding
    prefix of y MUST share at least one token. So candidate generation
    is an equi-join on PREFIX tokens only — the rarest tokens of each
    document — instead of an all-pairs product, and a length filter
    (``t * |x| <= |y| <= |x| / t``) prunes further before verification.
    Verification recomputes exact Jaccard on the candidates
    (``array_intersect`` — the dedup_ngram_jaccard arithmetic).

    100 TB shape: one shingle pass, one token-frequency aggregate, a
    per-doc window over bounded groups, an equi-join whose fan-out is
    governed by prefix-token rarity (the global order puts every
    document's LEAST frequent tokens in its prefix), and a verify join
    that ships arrays only for surviving candidates. Every stage is
    DataFrame-native (codegen; no UDF). Threshold arithmetic uses exact
    decimals — ``ceil(0.2 * 35)`` must be 7, not 8, or the prefix is one
    token short and completeness silently breaks.

    Returns ``(doc_a, doc_b, jaccard)`` with ``doc_a < doc_b`` and
    jaccard rounded to ``round_digits``. Documents with fewer than
    ``shingle_k`` tokens shingle to their whole text (the
    ``with_shingles`` fallback) and participate normally.

    ``collapse_exact`` (default on, r14 optimization): collapse
    byte-identical documents to min-id representatives BEFORE candidate
    generation and expand verified pairs back over group members
    (:func:`jaccard_join_collapsed` — bit-identical output, asserted in
    ``test_dedup_similarity`` and by the shared brute-force oracle). At
    duplication factor d the direct prefix join generates d² times the
    candidate pairs and ships every one through array verification —
    measured 76.8M vs 0.77M candidates and 57.5 s vs 7.1 s at the
    10×-replica bench — while a duplicate-free corpus only pays one
    extra md5 hash-aggregate. The duplication regime is the common-
    crawl-boilerplate norm, so the guard is on by default; pass False
    to time or inspect the raw prefix-filter plan.
    """
    if collapse_exact:
        return jaccard_join_collapsed(
            docs,
            id_col,
            text_col,
            threshold=threshold,
            shingle_k=shingle_k,
            round_digits=round_digits,
            stats=stats,
        )
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t_dec = F.lit(threshold).cast("decimal(12,9)")

    # materialize the shingle sets ONCE: the frame feeds the prefix
    # chain AND both sides of the verify join — without the checkpoint
    # the tokenize+explode+window+collect_list pipeline re-executes per
    # consumer (the shared-lineage rule from the r11 cost findings)
    sets = _jaccard_shingle_sets(docs, id_col, text_col, shingle_k)
    elems = sets.select(
        "__id", F.size("__set").alias("__sz"), F.explode("__set").alias("__tok")
    )
    freq = elems.groupBy("__tok").agg(F.count(F.lit(1)).alias("__freq"))
    prefix = _jaccard_prefix_rows(elems, freq, t_dec)

    a = prefix.select(
        F.col("__id").alias("__ida"),
        F.col("__sz").alias("__sza"),
        "__tok",
    )
    b = prefix.select(
        F.col("__id").alias("__idb"),
        F.col("__sz").alias("__szb"),
        "__tok",
    )
    cand = (
        a.join(b, "__tok")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(_jaccard_length_filter(t_dec))
        .select("__ida", "__idb")
        .distinct()
    )
    if stats is not None:
        # fan-out observability: how many pairs the prefix+length
        # filters let through vs the all-pairs product they replaced —
        # the operator's scale-risk number (hot prefix tokens blow this
        # up). Costs one extra count; the checkpoint keeps the verify
        # join from recomputing the candidate chain.
        cand = cand.localCheckpoint(eager=True)
        n_docs = sets.count()
        stats["candidate_pairs"] = cand.count()
        stats["brute_force_pairs"] = n_docs * (n_docs - 1) // 2
        stats["n_docs"] = n_docs
    return _jaccard_verify_sets(cand, sets, threshold, round_digits)


def _jaccard_shingle_sets(
    docs: DataFrame, id_col: str, text_col: str, shingle_k: int
) -> DataFrame:
    """Distinct shingle-STRING sets per doc as ``(__id, __set)``, eagerly
    checkpointed (shared-lineage rule: the frame feeds the prefix chain
    AND both sides of the verify join). String shingles — not k-gram
    hashes — so the exact join's scores are collision-free and the
    brute-force oracle reproduces them bit-for-bit."""
    from home_credit_data_engineering_spark.functions.text import (
        with_shingles,
    )

    return (
        with_shingles(docs, id_col, text_col, k=shingle_k)
        .select(
            F.col("doc_id").alias("__id"),
            F.array_distinct("shingles").alias("__set"),
        )
        .filter(F.size("__set") >= 1)
        .localCheckpoint(eager=True)
    )


def _jaccard_prefix_rows(
    elems: DataFrame, freq: DataFrame, t_dec: Column
) -> DataFrame:
    """Prefix rows ``(__id, __sz, __tok)`` under the total token order
    (``__freq`` asc, ``__tok`` asc): each doc keeps its first
    ``|x| - ceil(t*|x|) + 1`` tokens (exact decimal ceil — the IEEE
    ``0.2*35`` trap). ``freq`` defines the order; the prefix theorem
    holds for ANY fixed total order, so the caller may pass true corpus
    frequencies (full join) or frozen state frequencies (increment)."""
    from pyspark.sql.window import Window as W

    ranked = elems.join(freq, "__tok").withColumn(
        "__rn",
        F.row_number().over(
            W.partitionBy("__id").orderBy("__freq", "__tok")
        ),
    )
    return ranked.filter(
        F.col("__rn")
        <= F.col("__sz") - F.ceil(t_dec * F.col("__sz")) + F.lit(1)
    ).select("__id", "__sz", "__tok")


def _jaccard_length_filter(t_dec: Column) -> Column:
    """J >= t forces ``t * max(|x|,|y|) <= min(|x|,|y|)`` — prunes
    candidates before verification, exact decimal arithmetic."""
    return t_dec * F.greatest("__sza", "__szb") <= F.least(
        "__sza", "__szb"
    ).cast("decimal(20,9)")


def _jaccard_verify_sets(
    cand: DataFrame, sets: DataFrame, threshold: float, round_digits: int
) -> DataFrame:
    """Exact Jaccard on candidate pairs against ``(__id, __set)`` string
    shingle sets: two hash joins ship arrays only for survivors of the
    prefix+length filters; threshold applies BEFORE rounding (rounding
    is output cosmetics, not semantics)."""
    inter = F.size(F.array_intersect("__seta", "__setb")).cast("double")
    union = (
        F.size("__seta") + F.size("__setb")
        - F.size(F.array_intersect("__seta", "__setb"))
    ).cast("double")
    return (
        cand.join(
            sets.select(
                F.col("__id").alias("__ida"), F.col("__set").alias("__seta")
            ),
            "__ida",
        )
        .join(
            sets.select(
                F.col("__id").alias("__idb"), F.col("__set").alias("__setb")
            ),
            "__idb",
        )
        .withColumn("__j", inter / union)
        .filter(F.col("__j") >= F.lit(float(threshold)))
        .select(
            F.col("__ida").alias("doc_a"),
            F.col("__idb").alias("doc_b"),
            F.round("__j", round_digits).alias("jaccard"),
        )
    )


def containment_join(
    probe: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 3,
    round_digits: int = 6,
    collapse_exact: bool = True,
) -> DataFrame:
    """EXACT asymmetric containment join: every (probe, reference) pair
    with ``|P ∩ R| / |P| >= threshold`` over shingle sets — the
    set-containment form of benchmark decontamination (a training doc
    that CONTAINS most of a benchmark item, or is contained by one,
    scores high where symmetric Jaccard is diluted by length mismatch;
    complements the positional span form in ``operators/spans.py``).

    Asymmetric prefix filter (the R-S join of Vernica/Carey/Li SIGMOD
    2010, §3.3): ``C(P, R) >= t`` forces ``|P ∩ R| >= ceil(t·|P|)``,
    and any set sharing >= k elements with P must hit one of P's first
    ``|P| - k + 1`` elements under ANY fixed total order — so only the
    PROBE side ships prefixes (its rarest tokens under the corpus
    frequency order), while the reference side is fully indexed (one
    posting per token). That asymmetry is the scale shape: the
    reference (benchmark suite) is orders of magnitude smaller than the
    probe corpus, so full postings on the small side + prefix-only on
    the big side keeps the candidate equi-join bounded by probe-prefix
    rarity. A length filter (``|R| >= ceil(t·|P|)``, since the
    intersection can't exceed |R|) prunes before exact verification.
    Exact decimal ``ceil`` arithmetic throughout (the IEEE ``0.2*35``
    trap). No UDF; candidates verify via ``array_intersect``.

    Returns ``(probe_id, ref_id, containment)``. Probe and reference
    may overlap in ids; self-pairs (same id both sides) are excluded.

    ``collapse_exact`` (default on, r14 optimization): collapse
    byte-identical docs on BOTH sides to min-id representatives before
    the candidate join and expand rep-level pairs over probe-group ×
    ref-group members (:func:`containment_join_collapsed` —
    bit-identical output, asserted in ``test_dedup_similarity`` and by
    the shared brute-force oracle). d probe twins × e reference twins
    inflate the direct candidate join d·e per contaminated pair; the
    collapsed form pays it once and expands by id-only joins. A
    duplicate-free corpus pays one md5 hash-aggregate per side. Pass
    False to time or inspect the raw one-sided prefix plan.
    """
    if collapse_exact:
        return containment_join_collapsed(
            probe,
            reference,
            id_col,
            text_col,
            threshold=threshold,
            shingle_k=shingle_k,
            round_digits=round_digits,
        )
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t_dec = F.lit(threshold).cast("decimal(12,9)")

    p_sets = _jaccard_shingle_sets(probe, id_col, text_col, shingle_k)
    r_sets = _jaccard_shingle_sets(reference, id_col, text_col, shingle_k)
    return _containment_pairs_from_sets(
        p_sets, r_sets, t_dec, threshold, round_digits, exclude_self=True
    )


def _containment_pairs_from_sets(
    p_sets: DataFrame,
    r_sets: DataFrame,
    t_dec: Column,
    threshold: float,
    round_digits: int,
    exclude_self: bool,
    stats: dict | None = None,
) -> DataFrame:
    """The containment R-S core over prepared ``(__id, __set)`` frames:
    probe prefixes (rarest tokens under the probe-corpus frequency
    order) vs full reference postings, length filter, exact
    verification. ``exclude_self=False`` is for callers that must defer
    the self-pair guard (the collapsed form applies it per expanded
    member, not per representative)."""
    p_elems = p_sets.select(
        "__id", F.size("__set").alias("__sz"), F.explode("__set").alias("__tok")
    )
    # order by PROBE-corpus frequency: the probe side dominates the
    # token statistics, and the lemma only needs one fixed total order
    freq = p_elems.groupBy("__tok").agg(F.count(F.lit(1)).alias("__freq"))
    prefix = _jaccard_prefix_rows(p_elems, freq, t_dec).select(
        F.col("__id").alias("__pid"),
        F.col("__sz").alias("__psz"),
        "__tok",
    )
    postings = r_sets.select(
        F.col("__id").alias("__rid"),
        F.size("__set").alias("__rsz"),
        F.explode("__set").alias("__tok"),
    )
    cand = (
        prefix.join(postings, "__tok")
        # |P ∩ R| <= |R|, so C >= t needs |R| >= ceil(t·|P|)
        .filter(
            F.col("__rsz").cast("decimal(20,9)") >= F.ceil(t_dec * F.col("__psz"))
        )
        .select("__pid", "__rid")
        .distinct()
    )
    if exclude_self:
        cand = cand.filter(F.col("__pid") != F.col("__rid"))
    if stats is not None:
        cand = cand.localCheckpoint(eager=True)
        stats["candidate_pairs"] = cand.count()
    inter = F.size(F.array_intersect("__pset", "__rset")).cast("double")
    return (
        cand.join(
            p_sets.select(
                F.col("__id").alias("__pid"), F.col("__set").alias("__pset")
            ),
            "__pid",
        )
        .join(
            r_sets.select(
                F.col("__id").alias("__rid"), F.col("__set").alias("__rset")
            ),
            "__rid",
        )
        .withColumn("__c", inter / F.size("__pset").cast("double"))
        .filter(F.col("__c") >= F.lit(float(threshold)))
        .select(
            F.col("__pid").alias("probe_id"),
            F.col("__rid").alias("ref_id"),
            F.round("__c", round_digits).alias("containment"),
        )
    )


def containment_join_collapsed(
    probe: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 3,
    round_digits: int = 6,
    stats: dict | None = None,
) -> DataFrame:
    """Collapse-exact-first EXACT containment join — identical output to
    :func:`containment_join`, built for the duplication regime on BOTH
    sides: d byte-identical copies of a probe doc × e copies of a
    reference doc inflate the direct candidate join by d·e per
    contaminated pair, while the collapsed form pays it once and
    expands by id-only joins.

    Both sides collapse independently to min-id md5 representatives
    (restricted to docs that actually shingle — identical empty docs
    never reach the candidate join in the direct path either); the R-S
    prefix core runs over representatives (the prefix ORDER comes from
    the collapsed probe's token frequencies — completeness is
    order-independent, so candidates may differ but verified pairs
    cannot); each rep-level pair then expands over probe-group ×
    ref-group members, every member pair inheriting the rep's
    containment (identical text ⇒ identical shingle set ⇒ identical
    |P∩R|/|P|). The self-pair guard applies per expanded MEMBER —
    the same wrinkle as the incremental fold's collapsed mode: a
    representative sharing an id with a reference doc must not drop its
    whole group's pairs.

    ``stats`` receives ``candidate_pairs`` (rep-level) plus
    ``n_probe_groups/n_probe_docs/n_ref_groups/n_ref_docs``.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t_dec = F.lit(threshold).cast("decimal(12,9)")

    p_sets = _jaccard_shingle_sets(probe, id_col, text_col, shingle_k)
    r_sets = _jaccard_shingle_sets(reference, id_col, text_col, shingle_k)

    def _groups(docs: DataFrame, sets: DataFrame):
        members, rep_of = _collapse_md5_groups(docs, sets, id_col, text_col)
        rep_sets = sets.join(
            rep_of.select(F.col("__rep").alias("__id")), "__id", "left_semi"
        ).localCheckpoint(eager=True)
        return members, rep_sets

    p_members, p_rep_sets = _groups(probe, p_sets)
    r_members, r_rep_sets = _groups(reference, r_sets)

    rep_pairs = _containment_pairs_from_sets(
        p_rep_sets,
        r_rep_sets,
        t_dec,
        threshold,
        round_digits,
        exclude_self=False,
        stats=stats,
    )
    if stats is not None:
        for side, members in (("probe", p_members), ("ref", r_members)):
            grow = members.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("__rep").alias("g"),
            ).first()
            stats[f"n_{side}_groups"] = grow["g"]
            stats[f"n_{side}_docs"] = grow["n"]
    return (
        rep_pairs.join(
            p_members.select(
                F.col("__m").alias("__pm"), F.col("__rep").alias("probe_id")
            ),
            "probe_id",
        )
        .join(
            r_members.select(
                F.col("__m").alias("__rm"), F.col("__rep").alias("ref_id")
            ),
            "ref_id",
        )
        .filter(F.col("__pm") != F.col("__rm"))
        .select(
            F.col("__pm").alias("probe_id"),
            F.col("__rm").alias("ref_id"),
            "containment",
        )
    )


def jaccard_join_collapsed(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_k: int = 3,
    round_digits: int = 6,
    stats: dict | None = None,
) -> DataFrame:
    """Collapse-exact-first EXACT Jaccard join — identical output to
    :func:`jaccard_similarity_join`, built for the duplicated-corpus
    regime (the ``minhash_dedup_collapsed`` discipline applied to the
    exact join).

    Byte-identical documents (md5 fingerprint groups) have identical
    shingle sets, hence Jaccard 1 with each other and identical
    similarity to everything else. So: collapse each group to its
    min-id representative, run the prefix-filter join over
    REPRESENTATIVES only, then expand — cross-group pairs fan out over
    both groups' members carrying the representative score, and each
    group of size d contributes its C(d,2) internal pairs at 1.0.

    At duplication factor d this cuts candidate pairs d²× (measured at
    the 10×-replica bench: 76.8M → 0.77M candidates) while the OUTPUT
    (which genuinely is d²× bigger) is produced by cheap id-only
    expansion joins instead of array-shipping verification. ``stats``
    receives the representative-level fan-out numbers plus
    ``n_groups``/``n_docs``.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # zero-token docs have no shingle set and never pair in the full
    # join — exclude them here too, or identical empty docs would gain
    # intra-group pairs the full join doesn't emit. This is the one
    # collapse site that cannot use _collapse_md5_groups: it collapses
    # BEFORE shingling (its whole cost advantage) and must carry the
    # representative text forward, so membership comes from tokens(),
    # not from a prepared shingle-set frame — keep the two exclusion
    # rules equivalent if _jaccard_shingle_sets ever changes.
    fp = docs.filter(F.size(tokens(text_col)) >= 1).select(
        F.col(id_col).alias("__m"),
        F.col(text_col).alias("__text"),
        F.md5(F.col(text_col)).alias("__fp"),
    )
    rep_of = fp.groupBy("__fp").agg(
        F.min("__m").alias("__rep"),
        F.min_by("__text", "__m").alias("__rtext"),
        F.count(F.lit(1)).alias("__gsz"),
    ).localCheckpoint(eager=True)
    # members is consumed by the expansion joins AND the intra-group
    # pair generation (inside _expand_collapsed_pairs) — shared lineage,
    # checkpoint once
    members = (
        fp.select("__m", "__fp")
        .join(rep_of.select("__fp", "__rep", "__gsz"), "__fp")
        .select("__m", "__rep", "__gsz")
        .localCheckpoint(eager=True)
    )
    rep_pairs = jaccard_similarity_join(
        rep_of.select(
            F.col("__rep").alias("doc_id"), F.col("__rtext").alias("text")
        ),
        "doc_id",
        "text",
        threshold=threshold,
        shingle_k=shingle_k,
        round_digits=round_digits,
        stats=stats,
        # reps are unique by text already — a second collapse pass would
        # group nothing and recurse forever
        collapse_exact=False,
    )
    # AFTER the inner call: its stats hook writes the representative-
    # level n_docs (what candidate_pairs/brute_force_pairs refer to);
    # this layer reports the corpus-level counts alongside
    if stats is not None:
        stats["n_groups"] = stats.pop("n_docs", None) or rep_of.count()
        stats["n_docs"] = members.count()
    # max_group_pairs=None: the EXACT contract — output bit-identical
    # to jaccard_similarity_join, no star-pair cap (the approximate
    # sibling minhash_dedup_collapsed takes the capped path)
    return _expand_collapsed_pairs(rep_pairs, members, None)


def jaccard_join_state(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> dict:
    """Sidecar state for :func:`jaccard_join_increment`: the accepted
    corpus's prefix rows and its FROZEN token frequencies.

    Returns ``{"prefixes", "tokens"}`` — persist both (parquet sidecars;
    ``prefixes`` is corpus-prefix-sized, ``tokens`` vocabulary-sized).
    ``tokens`` freezes each token's frequency as first observed: the
    prefix theorem needs only a FIXED total order shared by both join
    sides, so later deltas must never re-rank accepted tokens (a true
    re-count would invalidate every stored prefix), and the increment
    extends the order with unseen tokens instead (see
    :func:`jaccard_join_increment`).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t_dec = F.lit(threshold).cast("decimal(12,9)")
    sets = _jaccard_shingle_sets(docs, id_col, text_col, shingle_k)
    elems = sets.select(
        "__id", F.size("__set").alias("__sz"), F.explode("__set").alias("__tok")
    )
    freq = elems.groupBy("__tok").agg(F.count(F.lit(1)).alias("__freq"))
    prefixes = _jaccard_prefix_rows(elems, freq, t_dec).select(
        F.col("__id").alias("doc_id"),
        F.col("__sz").alias("set_size"),
        F.col("__tok").alias("token"),
    )
    return {
        "prefixes": prefixes,
        "tokens": freq.select(
            F.col("__tok").alias("token"), F.col("__freq").alias("freq")
        ),
    }


def jaccard_join_increment(
    new_docs: DataFrame,
    prefix_state: DataFrame,
    token_state: DataFrame,
    all_texts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_k: int = 3,
    round_digits: int = 6,
    collapse_exact: bool = False,
    stats: dict | None = None,
) -> dict:
    """O(Δ) incremental EXACT Jaccard similarity join: every pair at
    ``J >= threshold`` involving at least one new doc, without
    recomputing the accepted corpus (the delta-friendly Vernica
    formulation — the exact sibling of :func:`minhash_incremental_pairs`).

    **Why the frozen-frequency order is exact.** The prefix filter
    (Chaudhuri'06/PPJoin/Vernica'10) is complete under ANY total token
    order shared by both sides of the candidate join — frequency order
    is purely a fan-out heuristic. The state (:func:`jaccard_join_state`)
    freezes each token's frequency at first sight; the delta's brand-new
    tokens extend the order keyed by their delta frequency. Accepted
    tokens therefore never re-rank — every stored prefix remains the
    doc's true prefix under the extended order — and new docs' prefixes
    are computed under that same order, so the candidate equi-join is
    complete for new-old AND new-new pairs. (A true re-count would
    re-rank accepted tokens and silently invalidate stored prefixes.)

    O(Δ) shape: shingle + prefix passes over the delta only; the
    candidate join touches state prefix rows whose token occurs in a
    delta prefix (runtime-filtered scan, never a full-state pass);
    verification recomputes sets only for candidate ids out of
    ``all_texts`` (semi-join-restricted, same contract as the MinHash
    sibling: it must contain the text of every id that can appear in a
    candidate — accepted corpus ∪ delta; ids missing from it silently
    drop their pairs). New and state doc ids must be disjoint.

    Returns ``{"pairs", "new_prefixes", "new_tokens"}``: ``pairs`` are
    the verified (doc_a, doc_b, jaccard) edges involving ≥1 new doc;
    append ``new_prefixes`` to the prefix state and ``new_tokens``
    (brand-new tokens with their frozen delta frequencies) to the token
    state for the next run. Invariant (tested): full-corpus join ==
    old-corpus join ∪ incremental pairs.

    ``collapse_exact`` applies the :func:`jaccard_join_collapsed`
    discipline INSIDE the fold — the boilerplate-heavy-delta regime,
    where d byte-identical copies in one delta re-incur the d²
    candidate blowup on every fold: collapse the delta's md5 groups to
    min-id representatives, run prefix/candidate/verify over
    representatives only, then expand (cross pairs inherit the rep
    score through id-only joins; each group adds its C(d,2) internal
    pairs at 1.0). Output and state appends are BIT-IDENTICAL to the
    direct increment (tested): the frozen-order extension uses the
    FULL delta's token frequencies either way, and duplicate members'
    prefix rows are the rep's rows re-keyed (identical sets ⇒ identical
    prefixes under the same fixed order). ``stats`` receives
    ``candidate_pairs`` (+ ``n_groups``/``n_docs`` when collapsing) for
    the fold report's fan-out observability.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t_dec = F.lit(threshold).cast("decimal(12,9)")

    sets_new = _jaccard_shingle_sets(new_docs, id_col, text_col, shingle_k)
    elems_new = sets_new.select(
        "__id", F.size("__set").alias("__sz"), F.explode("__set").alias("__tok")
    )
    delta_freq = elems_new.groupBy("__tok").agg(
        F.count(F.lit(1)).alias("__dfreq")
    )
    # Extended order: frozen state frequency wins; unseen tokens slot in
    # by delta frequency (ties broken by token text either way). The
    # state side is vocabulary-sized and the join is delta-restricted.
    eff = delta_freq.join(
        token_state.select(
            F.col("token").alias("__tok"), F.col("freq").alias("__sfreq")
        ),
        "__tok",
        "left",
    )
    eff_freq = eff.select(
        "__tok",
        F.coalesce("__sfreq", "__dfreq").alias("__freq"),
        F.col("__sfreq").isNull().alias("__is_new_tok"),
    ).localCheckpoint(eager=True)

    members = None
    rep_of = None
    if collapse_exact:
        members, rep_of = _collapse_md5_groups(
            new_docs, sets_new, id_col, text_col
        )
        probe_sets = sets_new.join(
            rep_of.select(F.col("__rep").alias("__id")), "__id", "left_semi"
        ).localCheckpoint(eager=True)
        probe_elems = probe_sets.select(
            "__id",
            F.size("__set").alias("__sz"),
            F.explode("__set").alias("__tok"),
        )
    else:
        probe_elems = elems_new
    # probe prefixes (reps only when collapsing); the frozen-order
    # extension above always uses the FULL delta's frequencies, so the
    # two modes share one total order
    new_prefix = _jaccard_prefix_rows(
        probe_elems, eff_freq.select("__tok", "__freq"), t_dec
    ).localCheckpoint(eager=True)

    a = new_prefix.select(
        F.col("__id").alias("__ida"), F.col("__sz").alias("__sza"), "__tok"
    )
    # new × state: ids are disjoint by contract, canonicalize after the
    # join; the state scan is restricted to delta prefix tokens by the
    # inner join itself (+ runtime bloom filter at scale)
    b_state = prefix_state.select(
        F.col("doc_id").alias("__idb"),
        F.col("set_size").alias("__szb"),
        F.col("token").alias("__tok"),
    )
    cand_new_old = (
        a.join(b_state, "__tok")
        .filter(_jaccard_length_filter(t_dec))
        # id disjointness is the caller's contract, but a violated
        # contract (e.g. a crashed half-published state append) must
        # not surface as (x, x) self-pairs at J=1 — guard is free
        .filter(F.col("__ida") != F.col("__idb"))
        .select(
            F.least("__ida", "__idb").alias("__ida"),
            F.greatest("__ida", "__idb").alias("__idb"),
        )
    )
    b_new = new_prefix.select(
        F.col("__id").alias("__idb"), F.col("__sz").alias("__szb"), "__tok"
    )
    cand_new_new = (
        a.join(b_new, "__tok")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(_jaccard_length_filter(t_dec))
        .select("__ida", "__idb")
    )
    cand = cand_new_old.unionByName(cand_new_new).distinct()
    if stats is not None:
        cand = cand.localCheckpoint(eager=True)
        stats["candidate_pairs"] = cand.count()

    # verify with the SAME set construction as the full join (string
    # shingles), restricted to candidate ids out of all_texts
    cids = (
        cand.select(F.col("__ida").alias("__cid"))
        .unionByName(cand.select(F.col("__idb").alias("__cid")))
        .distinct()
    )
    relevant = all_texts.join(
        cids, on=[F.col(id_col) == F.col("__cid")], how="left_semi"
    )
    sets_cand = _jaccard_shingle_sets(relevant, id_col, text_col, shingle_k)
    pairs = _jaccard_verify_sets(cand, sets_cand, threshold, round_digits)

    if collapse_exact:
        # rep-level pairs expand over the delta's md5 groups; state ids
        # (and singleton reps) ride as identity rows so the expansion's
        # inner joins keep them. The pair frame is consumed three times
        # (cross join + two id extractions) — checkpoint once.
        pairs = pairs.localCheckpoint(eager=True)
        state_ids = (
            pairs.select(F.col("doc_a").alias("__m"))
            .unionByName(pairs.select(F.col("doc_b").alias("__m")))
            .distinct()
            .join(members.select("__m"), "__m", "left_anti")
            .select(
                "__m",
                F.col("__m").alias("__rep"),
                F.lit(1).cast("long").alias("__gsz"),
            )
        )
        # the expansion's output is already canonically ordered (cross
        # pairs via least/greatest of member ids, intra via __m < __m)
        pairs = _expand_collapsed_pairs(
            pairs, members.unionByName(state_ids), None
        )
        if stats is not None:
            # one aggregate over the CHECKPOINTED members frame — a
            # rep_of.count() would re-run the md5+join lineage over the
            # full delta
            grow = members.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("__rep").alias("g"),
            ).first()
            stats["n_groups"] = grow["g"]
            stats["n_docs"] = grow["n"]

    if collapse_exact:
        # every duplicate member's prefix rows are its rep's rows
        # re-keyed: identical sets ⇒ identical (size, token) prefixes
        # under the shared order — the state append is bit-identical to
        # the direct path's per-doc computation
        new_prefixes = members.join(
            new_prefix, members["__rep"] == new_prefix["__id"]
        ).select(
            F.col("__m").alias("doc_id"),
            F.col("__sz").alias("set_size"),
            F.col("__tok").alias("token"),
        )
    else:
        new_prefixes = new_prefix.select(
            F.col("__id").alias("doc_id"),
            F.col("__sz").alias("set_size"),
            F.col("__tok").alias("token"),
        )
    new_tokens = eff_freq.filter(F.col("__is_new_tok")).select(
        F.col("__tok").alias("token"), F.col("__freq").alias("freq")
    )
    return {
        "pairs": pairs,
        "new_prefixes": new_prefixes,
        "new_tokens": new_tokens,
    }


def containment_reference_state(
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> dict:
    """Sidecar state for :func:`containment_join_increment`: the FIXED
    reference corpus fully indexed, plus seed token frequencies.

    Decontamination is the nightly job par excellence: the benchmark
    reference is fixed, only the probe corpus grows — so the expensive
    side of :func:`containment_join` (shingling + posting the reference,
    materializing its verification sets) is computed ONCE and persisted,
    and each probe delta folds in O(Δ).

    Returns ``{"postings", "ref_sets", "tokens"}``:

    - ``postings`` — ``(ref_id, ref_size, token)``, one posting per
      reference token (the fully-indexed small side of the Vernica R-S
      scheme; never grows);
    - ``ref_sets`` — ``(ref_id, ref_set)`` shingle-string sets for exact
      verification (never grows);
    - ``tokens`` — ``(token, freq)`` seed frequencies from the reference
      itself, extended append-only by each fold's first-seen probe
      tokens. Unlike :func:`jaccard_join_state`, candidate COMPLETENESS
      here never depends on the order (the reference side posts ALL its
      tokens, so any per-delta prefix order intersects it); the frozen
      order is a fan-out heuristic — stable rarity estimates that
      improve as the corpus accumulates — kept append-only under the
      same frozen-first-seen discipline so folds never rewrite it.
    """
    r_sets = _jaccard_shingle_sets(reference, id_col, text_col, shingle_k)
    postings = r_sets.select(
        F.col("__id").alias("ref_id"),
        F.size("__set").alias("ref_size"),
        F.explode("__set").alias("token"),
    )
    tokens_seed = postings.groupBy("token").agg(
        F.count(F.lit(1)).alias("freq")
    )
    return {
        "postings": postings,
        "ref_sets": r_sets.select(
            F.col("__id").alias("ref_id"), F.col("__set").alias("ref_set")
        ),
        "tokens": tokens_seed,
    }


def containment_join_increment(
    new_probe: DataFrame,
    postings: DataFrame,
    token_state: DataFrame,
    ref_sets: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 3,
    round_digits: int = 6,
    collapse_exact: bool = False,
    stats: dict | None = None,
) -> dict:
    """O(Δ) incremental EXACT asymmetric containment join: every
    (new probe doc, reference doc) pair with ``|P ∩ R| / |P| >=
    threshold``, touching ONLY the delta and the persisted reference
    state (:func:`containment_reference_state`) — the incremental form
    of :func:`containment_join`.

    Unlike the Jaccard increment there are no probe-probe pairs, so no
    probe prefixes are ever persisted: the delta ships its own prefixes
    (its rarest tokens under the frozen order, extended by first-seen
    delta tokens keyed by delta frequency), the reference postings are
    read as-is, and verification joins the delta's own shingle sets
    against the persisted ``ref_sets`` — no ``all_texts`` contract at
    all. Completeness is per-pair and order-independent (the reference
    side is fully posted), so the union of per-delta increments equals
    the full :func:`containment_join` over the accumulated probe corpus
    (tested).

    Returns ``{"pairs", "new_tokens"}``: ``pairs`` is
    ``(probe_id, ref_id, containment)``; append ``new_tokens`` to the
    token state for the next fold's fan-out. ``stats`` receives
    ``candidate_pairs`` / ``brute_force_pairs`` (delta × reference) for
    the fold report's fan-out observability.

    ``collapse_exact`` is the boilerplate-heavy-delta regime of the
    Jaccard sibling (:func:`jaccard_join_increment`), specialized to
    the asymmetric shape: collapse the delta's md5 groups to min-id
    representatives, run prefix/candidate/verify over representatives
    only against the fixed reference, then re-key each member to its
    representative's ``(ref_id, containment)`` pairs (identical text ⇒
    identical shingle set ⇒ identical containment against every
    reference doc — no intra-group pairs exist in this join). Output
    and ``new_tokens`` are BIT-IDENTICAL to the direct increment
    (tested): the frozen-order extension always uses the FULL delta's
    token frequencies, and ``new_tokens`` derives from them alone. The
    self-pair guard (``probe_id != ref_id``) moves POST-expansion in
    this mode — a representative sharing an id with a reference doc
    must not drop its whole group's pairs, while a member sharing one
    must still be dropped. ``stats['candidate_pairs']`` is rep-level
    (the measured candidate cut); ``brute_force_pairs`` stays full
    delta × reference in both modes for comparability.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t_dec = F.lit(threshold).cast("decimal(12,9)")

    p_sets = _jaccard_shingle_sets(new_probe, id_col, text_col, shingle_k)
    p_elems = p_sets.select(
        "__id", F.size("__set").alias("__sz"), F.explode("__set").alias("__tok")
    )
    delta_freq = p_elems.groupBy("__tok").agg(
        F.count(F.lit(1)).alias("__dfreq")
    )
    # frozen state frequency wins; first-seen tokens slot in by delta
    # frequency — the state side is vocabulary-sized, join delta-restricted
    eff_freq = (
        delta_freq.join(
            token_state.select(
                F.col("token").alias("__tok"), F.col("freq").alias("__sfreq")
            ),
            "__tok",
            "left",
        )
        .select(
            "__tok",
            F.coalesce("__sfreq", "__dfreq").alias("__freq"),
            F.col("__sfreq").isNull().alias("__is_new_tok"),
        )
        .localCheckpoint(eager=True)
    )
    members = None
    if collapse_exact:
        members, rep_of = _collapse_md5_groups(
            new_probe, p_sets, id_col, text_col
        )
        probe_elems = (
            p_sets.join(
                rep_of.select(F.col("__rep").alias("__id")), "__id", "left_semi"
            )
            .select(
                "__id",
                F.size("__set").alias("__sz"),
                F.explode("__set").alias("__tok"),
            )
        )
    else:
        probe_elems = p_elems
    # probe prefixes (reps only when collapsing); the frozen-order
    # extension above always uses the FULL delta's frequencies, so the
    # two modes share one total order
    prefix = _jaccard_prefix_rows(
        probe_elems, eff_freq.select("__tok", "__freq"), t_dec
    ).select(
        F.col("__id").alias("__pid"),
        F.col("__sz").alias("__psz"),
        "__tok",
    )
    cand = (
        prefix.join(
            postings.select(
                F.col("ref_id").alias("__rid"),
                F.col("ref_size").alias("__rsz"),
                F.col("token").alias("__tok"),
            ),
            "__tok",
        )
        # |P ∩ R| <= |R|, so C >= t needs |R| >= ceil(t·|P|)
        .filter(
            F.col("__rsz").cast("decimal(20,9)")
            >= F.ceil(t_dec * F.col("__psz"))
        )
        .select("__pid", "__rid")
        .distinct()
    )
    if not collapse_exact:
        # collapsed mode defers the self-pair guard to post-expansion
        # (see the docstring) — here it is free to apply early
        cand = cand.filter(F.col("__pid") != F.col("__rid"))
    if stats is not None:
        cand = cand.localCheckpoint(eager=True)
        stats["candidate_pairs"] = cand.count()
        stats["brute_force_pairs"] = p_sets.count() * ref_sets.count()
    inter = F.size(F.array_intersect("__pset", "__rset")).cast("double")
    pairs = (
        cand.join(
            p_sets.select(
                F.col("__id").alias("__pid"), F.col("__set").alias("__pset")
            ),
            "__pid",
        )
        .join(
            ref_sets.select(
                F.col("ref_id").alias("__rid"),
                F.col("ref_set").alias("__rset"),
            ),
            "__rid",
        )
        .withColumn("__c", inter / F.size("__pset").cast("double"))
        .filter(F.col("__c") >= F.lit(float(threshold)))
        .select(
            F.col("__pid").alias("probe_id"),
            F.col("__rid").alias("ref_id"),
            F.round("__c", round_digits).alias("containment"),
        )
    )
    if collapse_exact:
        # rep-level pairs re-key over the delta's md5 groups (members
        # inherit the rep's score — identical sets); the deferred
        # self-pair guard applies per MEMBER, matching the direct path
        pairs = (
            members.join(pairs, members["__rep"] == pairs["probe_id"])
            .filter(F.col("__m") != F.col("ref_id"))
            .select(
                F.col("__m").alias("probe_id"), "ref_id", "containment"
            )
        )
        if stats is not None:
            # one aggregate over the CHECKPOINTED members frame
            grow = members.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("__rep").alias("g"),
            ).first()
            stats["n_groups"] = grow["g"]
            stats["n_docs"] = grow["n"]
    new_tokens = eff_freq.filter(F.col("__is_new_tok")).select(
        F.col("__tok").alias("token"), F.col("__freq").alias("freq")
    )
    return {"pairs": pairs, "new_tokens": new_tokens}
