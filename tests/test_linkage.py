"""Entity-resolution operator tests (operators/linkage.py).

The declared queries' value correctness is covered by the oracle-parity
gate (er_candidate_pairs / er_resolved_entities vs DuckDB, including the
exact recursive-closure resolution oracle); these tests pin the operator
semantics the SQL twin can't see: the oversized-block guard, chain
resolution on a hand fixture, and the plan-shape invariants (blocked
equi-join — never a cartesian; zero Python in the pipeline).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import home_credit_data_engineering_spark.plans.declared  # noqa: F401
from home_credit_data_engineering_spark.operators.linkage import (
    blocked_pairs,
    resolve_entities,
    score_name_pairs,
)
from home_credit_data_engineering_spark.plans.registry import REGISTRY


def _records(spark):
    return spark.createDataFrame(
        [
            (1, "B1", "ann smith"),
            (2, "B1", "ann smyth"),
            (3, "B1", "ann smythe"),
            (4, "B1", "zoe quinn"),
            (5, "B2", "ann smith"),
        ],
        ["id", "blk", "name"],
    )


def test_blocked_pairs_within_block_only(spark):
    pairs = blocked_pairs(
        _records(spark), id_col="id", block_cols=["blk"], carry_cols=["name"]
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # 4C2 = 6 pairs inside B1; id 5 (B2) pairs with nobody.
    assert got == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}


def test_blocked_pairs_carry_may_repeat_block_col(spark):
    # Scoring often compares the block key itself — carrying it must not
    # trip a duplicate-column selection.
    pairs = blocked_pairs(
        _records(spark),
        id_col="id",
        block_cols=["blk"],
        carry_cols=["blk", "name"],
    )
    rows = pairs.collect()
    assert len(rows) == 6
    assert all(r["blk_a"] == r["blk_b"] == r["blk"] for r in rows)


def test_blocked_pairs_oversize_raise_and_skip(spark):
    df = _records(spark)
    with pytest.raises(ValueError, match="max_block_rows"):
        blocked_pairs(
            df, id_col="id", block_cols=["blk"], max_block_rows=3
        ).count()
    stats: dict = {}
    pairs = blocked_pairs(
        df,
        id_col="id",
        block_cols=["blk"],
        max_block_rows=3,
        oversize="skip",
        stats=stats,
    )
    # B1 (4 rows) is skipped entirely; B2 has a single row -> no pairs.
    assert pairs.count() == 0
    assert stats["oversized_blocks"] == 1
    # a typo'd mode must fail loudly, not silently behave as "skip"
    with pytest.raises(ValueError, match="oversize"):
        blocked_pairs(
            df, id_col="id", block_cols=["blk"], max_block_rows=3,
            oversize="Raise",
        )


def test_score_and_resolve_chain(spark):
    # smith—smyth (lev 1) and smyth—smythe (lev 1) chain: one entity
    # {1,2,3} labeled by min id even though lev(smith, smythe) = 2.
    pairs = score_name_pairs(
        blocked_pairs(
            _records(spark),
            id_col="id",
            block_cols=["blk"],
            carry_cols=["name"],
        ),
        "name_a",
        "name_b",
    )
    matches = pairs.filter(F.col("lev") <= 1)
    out = resolve_entities(_records(spark), matches, "id", "id_a", "id_b")
    rows = {r["id"]: (r["entity_id"], r["entity_size"]) for r in out.collect()}
    assert rows == {
        1: (1, 3),
        2: (1, 3),
        3: (1, 3),
        4: (4, 1),
        5: (5, 1),
    }


def test_collapsed_match_edges_equals_direct_components(spark):
    """r14 optimization: the collapsed edge builder must yield the SAME
    resolved entities (labels AND sizes) as the full blocked-pair match
    set, on a corpus with verbatim-duplicate names (the 10×-replica
    regime), near-matches that bridge duplicate groups, and blocks that
    never pair."""
    from home_credit_data_engineering_spark.operators.linkage import (
        collapsed_match_edges,
    )

    rows = []
    # block B1: two duplicate groups whose reps are lev-1 of each other,
    # plus a far name — groups {1,2,3} ("ann smith" ×3) and {10, 11}
    # ("ann smyth" ×2) must merge into one entity; 20 stays alone
    rows += [(i, "B1", "ann smith") for i in (1, 2, 3)]
    rows += [(i, "B1", "ann smyth") for i in (10, 11)]
    rows += [(20, "B1", "zoe quinn")]
    # block B2: same name text as B1's group — must NOT cross blocks
    rows += [(30, "B2", "ann smith"), (31, "B2", "ann smith")]
    # singleton block
    rows += [(40, "B3", "solo record")]
    df = spark.createDataFrame(rows, ["id", "blk", "name"])

    direct_matches = score_name_pairs(
        blocked_pairs(
            df, id_col="id", block_cols=["blk"], carry_cols=["name"]
        ),
        "name_a",
        "name_b",
        max_lev=1,
    )
    stats: dict = {}
    collapsed = collapsed_match_edges(
        df,
        id_col="id",
        block_cols=["blk"],
        name_col="name",
        max_lev=1,
        stats=stats,
    )

    def _resolved(matches):
        return {
            (r["id"], r["entity_id"], r["entity_size"])
            for r in resolve_entities(
                df, matches, "id", "id_a", "id_b"
            ).collect()
        }

    want = _resolved(direct_matches)
    got = _resolved(collapsed)
    assert got == want
    # the fixture really merged across duplicate groups and kept blocks
    # apart: {1,2,3,10,11} one entity, {30,31} another, singletons alone
    assert (11, 1, 5) in got and (31, 30, 2) in got and (40, 40, 1) in got
    # the collapse really collapsed (9 docs, 5 (block, name) groups) and
    # the edge budget is linear: 4 stars + rep-level scored edges
    assert stats["n_docs"] == 9 and stats["n_groups"] == 5
    assert collapsed.count() < direct_matches.count()


def test_collapsed_match_edges_member_level_guard(spark):
    """The max_block_rows guard must fire on MEMBER counts (the direct
    path's surface), not post-collapse group counts: 5 members in one
    block exceed a guard of 4 even though they collapse to 2 groups."""
    from home_credit_data_engineering_spark.operators.linkage import (
        collapsed_match_edges,
    )

    df = spark.createDataFrame(
        [(i, "B1", "ann smith") for i in range(4)]
        + [(9, "B1", "ann smyth")],
        ["id", "blk", "name"],
    )
    with pytest.raises(ValueError, match="max_block_rows"):
        collapsed_match_edges(
            df,
            id_col="id",
            block_cols=["blk"],
            name_col="name",
            max_lev=1,
            max_block_rows=4,
        )
    # at the guard boundary it passes
    edges = collapsed_match_edges(
        df,
        id_col="id",
        block_cols=["blk"],
        name_col="name",
        max_lev=1,
        max_block_rows=5,
    )
    assert edges.count() == 4  # 3 stars + 1 rep-level lev-1 edge


def test_sorted_neighborhood_exact_pair_set(spark):
    from home_credit_data_engineering_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    # 9 rows; sort order by key = ids 1..9. window=3 -> each row pairs
    # with the next 2 rows: 8 + 7 = 15 pairs, INCLUDING pairs that cross
    # the floor(pos/3) band boundary (e.g. 3-4) and the shard boundary
    # (prefix "a" vs "b": 6-7) — the two places a naive implementation
    # drops pairs.
    rows = [(i, f"a{i}" if i <= 6 else f"b{i}") for i in range(1, 10)]
    df = spark.createDataFrame(rows, ["id", "k"])
    pairs = sorted_neighborhood_pairs(
        df, id_col="id", key_col="k", window=3, shard_prefix_len=1
    )
    got = {(r["id_a"], r["id_b"], r["pos_gap"]) for r in pairs.collect()}
    want = {(i, i + g, g) for g in (1, 2) for i in range(1, 10 - g)}
    assert got == want


def test_sorted_neighborhood_matches_single_window_rank(spark, sf_dir):
    # The two-level sharded position must equal the global
    # ROW_NUMBER() OVER (ORDER BY key, id) — compare the pair set
    # against a directly-computed single-window reference on real data.
    from pyspark.sql.window import Window

    from home_credit_data_engineering_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )
    from home_credit_data_engineering_spark.sources.readers import (
        read_testdata,
    )

    cust = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    got = {
        (r["c_custkey_a"], r["c_custkey_b"])
        for r in sorted_neighborhood_pairs(
            cust, "c_custkey", "c_name", window=5, shard_prefix_len=16
        ).collect()
    }
    ref_pos = cust.withColumn(
        "pos",
        F.row_number().over(Window.orderBy("c_name", "c_custkey")),
    )
    a = ref_pos.select(
        F.col("c_custkey").alias("ka"), F.col("pos").alias("pa")
    )
    b = ref_pos.select(
        F.col("c_custkey").alias("kb"), F.col("pos").alias("pb")
    )
    want = {
        (r["ka"], r["kb"])
        for r in a.join(
            b,
            (F.col("pb") > F.col("pa")) & (F.col("pb") - F.col("pa") < 5),
        ).collect()
    }
    assert got == want


def test_sorted_neighborhood_null_keys_still_pair(spark):
    # r10 review finding: a NULL sort key must not silently drop the
    # record (NULL shards fall out of equi-joins). NULLs sort FIRST
    # (Spark's ascending default), so with window=2 the two NULL-key
    # rows pair with each other and the first non-null row.
    from home_credit_data_engineering_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], ["id", "k"]
    )
    pairs = sorted_neighborhood_pairs(
        df, id_col="id", key_col="k", window=2, shard_prefix_len=1
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # sort order: (NULL,2), (NULL,4), ("a",1), ("b",3)
    assert got == {(2, 4), (4, 1), (1, 3)}


def test_generators_allow_id_in_carry_cols(spark):
    # carry_cols repeating the ID column must not produce ambiguous
    # id_a references (r10 review finding).
    from home_credit_data_engineering_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    df = _records(spark)
    bp = blocked_pairs(
        df, id_col="id", block_cols=["blk"], carry_cols=["id", "name"]
    )
    assert bp.filter(F.col("id_a") < F.col("id_b")).count() == 6
    sn = sorted_neighborhood_pairs(
        df, id_col="id", key_col="name", window=2, carry_cols=["id"]
    )
    assert sn.count() == 4


def test_phonetic_key_blocks_sound_alikes(spark):
    from home_credit_data_engineering_spark.operators.linkage import (
        blocked_pairs,
        phonetic_key,
    )

    df = spark.createDataFrame(
        [
            (1, "Smith"),
            (2, "smyth"),
            (3, "SMYTHE"),
            (4, "Quinn"),
        ],
        ["id", "name"],
    ).withColumn("snd", phonetic_key("name"))
    keys = {r["id"]: r["snd"] for r in df.collect()}
    # Soundex is case-blind here and groups the spelling variants.
    assert keys[1] == keys[2] == keys[3] == "S530"
    assert keys[4] != "S530"
    pairs = blocked_pairs(df, id_col="id", block_cols=["snd"])
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}


def _brute_components(edges, nodes):
    """Plain-Python union-find reference for resolve_entities."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labels
    labels = {}
    for n in nodes:
        r = find(n)
        labels.setdefault(r, []).append(n)
    out = {}
    for members in labels.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_resolve_entities_property_random_graphs(spark):
    import random

    from home_credit_data_engineering_spark.operators.linkage import (
        resolve_entities,
    )

    rng = random.Random(1234)
    for trial in range(5):
        n = rng.randint(2, 40)
        nodes = list(range(1, n + 1))
        m = rng.randint(0, 2 * n)
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(m)
        ]
        records = spark.createDataFrame([(x,) for x in nodes], ["id"])
        matches = spark.createDataFrame(
            edges or [(1, 1)], ["id_a", "id_b"]
        )
        if not edges:
            matches = matches.limit(0)
        out = resolve_entities(records, matches, "id", "id_a", "id_b")
        got = {r["id"]: r["entity_id"] for r in out.collect()}
        want = _brute_components(edges, nodes)
        assert got == want, f"trial {trial}: n={n} edges={edges}"
        sizes = {r["entity_id"]: r["entity_size"] for r in out.collect()}
        from collections import Counter

        want_sizes = Counter(want.values())
        assert sizes == dict(want_sizes)


def test_fs_em_recovers_planted_parameters(spark):
    import random

    from home_credit_data_engineering_spark.operators.linkage import (
        estimate_fs_parameters,
    )

    # Plant a three-attribute two-class mixture (k >= 3 is the classic
    # identifiability floor: 2^k - 1 observed frequencies must cover the
    # 2k + 1 free parameters, so k = 2 is UNDER-determined and EM would
    # drift): 20% matches with m=(0.95, 0.8, 0.9), non-matches with
    # u=(0.05, 0.3, 0.1). EM on the 8 pattern counts must recover
    # p/m/u within a few points.
    rng = random.Random(99)
    rows = []
    for _ in range(20000):
        is_match = rng.random() < 0.2
        a1 = rng.random() < (0.95 if is_match else 0.05)
        a2 = rng.random() < (0.8 if is_match else 0.3)
        a3 = rng.random() < (0.9 if is_match else 0.1)
        rows.append((a1, a2, a3))
    pairs = spark.createDataFrame(
        rows, ["agree_name", "agree_seg", "agree_bal"]
    )
    est = estimate_fs_parameters(
        pairs, ["agree_name", "agree_seg", "agree_bal"], iterations=500
    )
    assert est["converged"]
    assert abs(est["p"] - 0.2) < 0.03
    m1, u1 = est["params"]["agree_name"]
    m2, u2 = est["params"]["agree_seg"]
    m3, u3 = est["params"]["agree_bal"]
    assert abs(m1 - 0.95) < 0.05 and abs(u1 - 0.05) < 0.03
    assert abs(m2 - 0.8) < 0.08 and abs(u2 - 0.3) < 0.05
    assert abs(m3 - 0.9) < 0.06 and abs(u3 - 0.1) < 0.04
    # The estimated params drive the scorer end-to-end.
    from home_credit_data_engineering_spark.operators.linkage import (
        fellegi_sunter_score,
    )

    scored = fellegi_sunter_score(
        pairs,
        [
            ("name", F.col("agree_name"), *est["params"]["agree_name"]),
            ("seg", F.col("agree_seg"), *est["params"]["agree_seg"]),
        ],
    )
    # full agreement must outscore full disagreement
    hi = scored.filter(F.col("agree_name") & F.col("agree_seg"))
    lo = scored.filter(~F.col("agree_name") & ~F.col("agree_seg"))
    assert hi.first()["fs_score"] > lo.first()["fs_score"]


def test_entity_index_serving_prunes_partitions(spark, sf_dir, tmp_path):
    from home_credit_data_engineering_spark.operators.linkage import (
        entity_bucket,
        entity_profile,
        write_entity_index,
    )

    state = REGISTRY["er_resolved_entities"].build(spark, sf_dir)
    idx = str(tmp_path / "er_index")
    write_entity_index(
        state.select("c_custkey", "entity_id"), idx, "c_custkey", n_buckets=8
    )
    # Pick a record from a multi-member entity.
    probe = (
        state.filter(F.col("entity_size") > 1)
        .orderBy("c_custkey")
        .limit(1)
        .collect()[0]
    )
    members = entity_profile(
        spark, idx, probe["c_custkey"], "c_custkey", n_buckets=8
    )
    got = {r["c_custkey"] for r in members.collect()}
    want = {
        r["c_custkey"]
        for r in state.filter(
            F.col("entity_id") == probe["entity_id"]
        ).collect()
    }
    assert got == want and len(got) > 1
    # The member read must partition-prune to one ebucket.
    plan = members._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "ebucket" in plan.split("PartitionFilters: ")[1].splitlines()[0]
    # Miss path: unknown id returns an empty frame with the state schema.
    assert (
        entity_profile(spark, idx, -999, "c_custkey", n_buckets=8).count()
        == 0
    )


def test_entity_safe_split_never_straddles(spark, sf_dir):
    # The leakage guarantee itself: every entity's records land in ONE
    # split, and multi-record entities exist in the data (else the test
    # is vacuous).
    df = REGISTRY["er_entity_safe_split"].build(spark, sf_dir)
    agg = df.groupBy("entity_id").agg(
        F.countDistinct("split").alias("n_splits"),
        F.count(F.lit(1)).alias("n"),
    )
    assert agg.filter(F.col("n_splits") > 1).count() == 0
    assert agg.filter(F.col("n") > 1).count() > 0


def _lev1_matcher(pairs):
    return pairs.filter(
        F.levenshtein(F.col("name_a"), F.col("name_b")) <= 1
    )


def test_incremental_resolve_merges_existing_entities(spark):
    from home_credit_data_engineering_spark.operators.linkage import (
        incremental_resolve_entities,
        resolve_entities,
        blocked_pairs,
        score_name_pairs,
    )

    # State: {1,2} one entity (smith~smyth), {5} singleton (smythe is
    # lev-2 from both). New record 4 "smythx" matches 2 (smyth) AND 5
    # (smythe) -> ALL FOUR must merge into entity 1, relabeling 5's
    # entity even though no state-state pair is ever re-generated.
    state = spark.createDataFrame(
        [
            (1, 1, "B", "smith"),
            (2, 1, "B", "smyth"),
            (5, 5, "B", "smythe"),
        ],
        ["id", "entity_id", "blk", "name"],
    )
    batch = spark.createDataFrame([(4, "B", "smythx")], ["id", "blk", "name"])
    out = incremental_resolve_entities(
        state, batch, "id", ["blk"], ["name"], _lev1_matcher
    )
    rows = {r["id"]: r["entity_id"] for r in out.collect()}
    assert rows == {1: 1, 2: 1, 4: 1, 5: 1}


def test_incremental_resolve_equals_full_recompute(spark, sf_dir):
    from home_credit_data_engineering_spark.operators.linkage import (
        blocked_pairs,
        incremental_resolve_entities,
        resolve_entities,
        score_name_pairs,
    )
    from home_credit_data_engineering_spark.sources.readers import (
        read_testdata,
    )

    cust = (
        read_testdata(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_nationkey").alias("nat"),
            F.substring("c_name", 1, 15).alias("pre"),
            F.col("c_name").alias("name"),
        )
    )
    # Three arrival waves by custkey mod 3.
    state = None
    for k in range(3):
        batch = cust.filter(F.col("id") % 3 == k)
        if state is None:
            pairs = blocked_pairs(
                batch, "id", ["nat", "pre"], carry_cols=["name"]
            )
            state = resolve_entities(
                batch, _lev1_matcher(pairs), "id", "id_a", "id_b"
            ).join(batch, on="id").select(
                "id", "entity_id", "nat", "pre", "name"
            )
        else:
            state = incremental_resolve_entities(
                state, batch, "id", ["nat", "pre"], ["name"], _lev1_matcher
            )
        state = state.localCheckpoint(eager=True)
    full_pairs = blocked_pairs(cust, "id", ["nat", "pre"], carry_cols=["name"])
    full = resolve_entities(
        cust, _lev1_matcher(full_pairs), "id", "id_a", "id_b"
    )
    got = {r["id"]: r["entity_id"] for r in state.collect()}
    want = {r["id"]: r["entity_id"] for r in full.collect()}
    assert got == want


def test_er_plans_are_blocked_joins_jvm_side(spark, sf_dir):
    # Candidate generation must plan as an equi-join on the block key —
    # a cartesian here means blocking silently degenerated — and the
    # whole pipeline (levenshtein included) stays JVM-side.
    for name in (
        "er_candidate_pairs",
        "er_resolved_entities",
        "er_sorted_neighborhood",
    ):
        df = REGISTRY[name].build(spark, sf_dir)
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        # Row-at-a-time Python is banned everywhere; the SNM query's
        # Jaro-Winkler comparator is a documented Arrow-batched
        # exception (Spark has no JW builtin) and must plan as
        # ArrowEvalPython, never BatchEvalPython.
        assert "BatchEvalPython" not in plan, name
        if name == "er_sorted_neighborhood":
            assert "ArrowEvalPython" in plan, name
        else:
            assert "ArrowEvalPython" not in plan, name


def test_jaro_winkler_reference_values(spark):
    from home_credit_data_engineering_spark.operators.linkage import (
        jaro_winkler,
        jaro_winkler_pairs,
    )

    # Classic textbook values + edge cases.
    assert round(jaro_winkler("MARTHA", "MARHTA"), 6) == 0.961111
    assert round(jaro_winkler("DIXON", "DICKSONX"), 6) == 0.813333
    assert jaro_winkler("", "anything") == 0.0
    assert jaro_winkler("same", "same") == 1.0
    # sub-threshold jaro gets NO prefix boost (DuckDB-compatible)
    assert round(jaro_winkler("dr", "ds"), 6) == 0.666667
    df = spark.createDataFrame(
        [("MARTHA", "MARHTA"), ("dr", "ds"), (None, "x")], ["a", "b"]
    )
    got = {
        None if r["jw_sim"] is None else round(r["jw_sim"], 6)
        for r in jaro_winkler_pairs(df, "a", "b").collect()
    }
    assert got == {0.961111, 0.666667, None}


# ---------------------------------------------------------------------------
# Clerical-review loop (r11)
# ---------------------------------------------------------------------------


def _resolved_state(spark):
    """Entities {1: [1,2], 3: [3], 7: [7,8]} with a block/compare col."""
    return spark.createDataFrame(
        [
            (1, 1, "B1", "ann smith"),
            (2, 1, "B1", "ann smyth"),
            (3, 3, "B1", "zoe quinn"),
            (7, 7, "B2", "bob ray"),
            (8, 7, "B2", "bob raye"),
        ],
        ["id", "entity_id", "blk", "name"],
    )


def test_fold_match_edges_equals_full_recompute(spark):
    from home_credit_data_engineering_spark.operators.linkage import (
        fold_match_edges,
    )

    state = _resolved_state(spark)
    # cross-entity edge (2, 7): merges entity 1 and entity 7 entirely
    edges = spark.createDataFrame([(2, 7)], ["id_a", "id_b"])
    got = {
        r["id"]: r["entity_id"]
        for r in fold_match_edges(state, edges, "id", "id_a", "id_b").collect()
    }
    # full recompute truth: original intra-entity edges + the new one
    records = state.select("id", "blk", "name")
    all_edges = spark.createDataFrame(
        [(1, 2), (7, 8), (2, 7)], ["id_a", "id_b"]
    )
    want = {
        r["id"]: r["entity_id"]
        for r in resolve_entities(
            records, all_edges, "id", "id_a", "id_b"
        ).collect()
    }
    assert got == want
    assert got[7] == got[8] == got[1] == got[2] == 1  # whole entity absorbed
    assert got[3] == 3  # untouched entity keeps its label
    # non-id columns survive the relabel
    out = fold_match_edges(state, edges, "id", "id_a", "id_b")
    assert set(out.columns) == {"id", "entity_id", "blk", "name"}


def test_fold_review_decisions_accept_only_and_idempotent(spark):
    from home_credit_data_engineering_spark.operators.linkage import (
        fold_review_decisions,
    )

    state = _resolved_state(spark)
    decisions = spark.createDataFrame(
        [(2, 7, "accept"), (3, 7, "reject"), (1, 3, "skip")],
        ["id_a", "id_b", "decision"],
    )
    once = fold_review_decisions(state, decisions, "id", "id_a", "id_b")
    got = {r["id"]: r["entity_id"] for r in once.collect()}
    assert got == {1: 1, 2: 1, 7: 1, 8: 1, 3: 3}  # only the accept folded
    # replaying the same decisions against the updated state is a no-op
    twice = fold_review_decisions(once, decisions, "id", "id_a", "id_b")
    assert {r["id"]: r["entity_id"] for r in twice.collect()} == got


def test_review_queue_roundtrip_and_point_lookup(spark, tmp_path):
    from home_credit_data_engineering_spark.operators.linkage import (
        fellegi_sunter_score,
        fs_decision,
        reviews_for_record,
        write_review_queue,
    )

    pairs = blocked_pairs(
        _records(spark), id_col="id", block_cols=["blk"], carry_cols=["name"]
    )
    scored = fellegi_sunter_score(
        pairs,
        [("name", F.levenshtein("name_a", "name_b") <= 1, 0.9, 0.1)],
    ).withColumn(
        "fs_decision", fs_decision(F.col("fs_score"), 10.0, -10.0)
    )
    # with these thresholds every scored pair is "possible"
    queue_path = str(tmp_path / "queue")
    write_review_queue(scored, queue_path, "id_a", "id_b", n_buckets=4)
    n_pairs = scored.count()
    import os

    assert os.path.isdir(f"{queue_path}/by_a")
    assert os.path.isdir(f"{queue_path}/by_b")
    assert spark.read.parquet(f"{queue_path}/by_a").count() == n_pairs

    # record 3 appears as id_a in (3,4) and as id_b in (1,3),(2,3)
    got = reviews_for_record(spark, queue_path, 3, "id_a", "id_b", n_buckets=4)
    touching = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert touching == {(3, 4), (1, 3), (2, 3)}
    # evidence columns ride along for the reviewer
    assert {"fs_score", "agree_name", "fs_decision"} <= set(got.columns)
    # partition pruning: both legs carry a PartitionFilters probe
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(abucket" in plan
    assert "PartitionFilters: [isnotnull(bbucket" in plan


def test_sorted_neighborhood_shard_stats(spark):
    from home_credit_data_engineering_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    rows = [(i, f"a{i}" if i <= 6 else f"b{i}") for i in range(1, 10)]
    df = spark.createDataFrame(rows, ["id", "k"])
    stats: dict = {}
    pairs = sorted_neighborhood_pairs(
        df, id_col="id", key_col="k", window=3, shard_prefix_len=1,
        stats=stats,
    )
    assert stats == {"n_shards": 2, "max_shard_rows": 6, "rows": 9}
    assert pairs.count() == 15  # stats pass must not perturb the pairs
    # a degenerate prefix (constant stem) collapses to one shard — the
    # failure mode the stats exist to surface
    const = spark.createDataFrame(
        [(i, f"Customer#{i:04d}") for i in range(1, 8)], ["id", "k"]
    )
    stats2: dict = {}
    sorted_neighborhood_pairs(
        const, id_col="id", key_col="k", window=2, shard_prefix_len=4,
        stats=stats2,
    ).count()
    assert stats2["n_shards"] == 1
    assert stats2["max_shard_rows"] == stats2["rows"] == 7


def test_tune_blocking_finds_known_optimal_key(spark):
    from home_credit_data_engineering_spark.operators.linkage import (
        tune_blocking,
    )

    # Matches: (1,2) "smith"~"smyth" (diverge at char 3) and (3,4)
    # "brown"~"browne". "sister" shares only prefix-1 with the smiths.
    # Known frontier: prefix_2 is optimal (full recall, fewest pairs);
    # prefix_1 pays an extra pair for the same recall; prefix_3 loses
    # the (1,2) match.
    records = spark.createDataFrame(
        [
            (1, "smith"),
            (2, "smyth"),
            (3, "brown"),
            (4, "browne"),
            (5, "zzzz"),
            (6, "sister"),
        ],
        ["id", "name"],
    )

    def match(pairs):
        return pairs.filter(
            F.levenshtein(F.col("name_a"), F.col("name_b")) <= 1
        )

    report = tune_blocking(
        records,
        "id",
        {
            f"prefix_{n}": [F.substring("name", 1, n)]
            for n in (1, 2, 3)
        },
        match,
        carry_cols=["name"],
    )
    rows = {r["scheme"]: r for r in report.collect()}
    assert rows["prefix_1"]["n_pairs"] == 4  # {1,2,6} -> 3, {3,4} -> 1
    assert rows["prefix_2"]["n_pairs"] == 2
    assert rows["prefix_3"]["n_pairs"] == 1
    assert rows["prefix_1"]["recall_proxy"] == 1.0
    assert rows["prefix_2"]["recall_proxy"] == 1.0
    assert rows["prefix_3"]["recall_proxy"] == 0.5
    assert rows["prefix_2"]["n_matched"] == 2
    # frontier order: best trade first
    ordered = [r["scheme"] for r in report.collect()]
    assert ordered[0] == "prefix_2"
    # pair_fraction vs C(6,2) = 15
    assert rows["prefix_2"]["pair_fraction"] == round(2 / 15, 9)


def test_refresh_entity_index_equals_full_rewrite(spark, tmp_path):
    """Incremental index refresh must produce the same serving tables as
    a full rewrite while rewriting ONLY the touched partitions."""
    import glob
    import os

    from home_credit_data_engineering_spark.operators.linkage import (
        entity_profile,
        refresh_entity_index,
        write_entity_index,
    )

    n_buckets = 8
    prior = _resolved_state(spark)  # {1:[1,2], 3:[3], 7:[7,8]}
    idx = str(tmp_path / "idx")
    write_entity_index(prior, idx, "id", n_buckets=n_buckets)
    before_files = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{idx}/by_*/[re]bucket=*/*.parquet")
    }

    # new state: record 9 arrives and merges entity 7 into entity 1
    # (relabels 7 and 8), entity 3 untouched
    new_state = spark.createDataFrame(
        [
            (1, 1, "B1", "ann smith"),
            (2, 1, "B1", "ann smyth"),
            (3, 3, "B1", "zoe quinn"),
            (7, 1, "B2", "bob ray"),
            (8, 1, "B2", "bob raye"),
            (9, 1, "B2", "bob rayz"),
        ],
        ["id", "entity_id", "blk", "name"],
    )
    rep = refresh_entity_index(new_state, prior, idx, "id", n_buckets=n_buckets)
    assert rep["changed_rows"] == 3  # 7, 8 relabeled; 9 new

    full = str(tmp_path / "full")
    write_entity_index(new_state, full, "id", n_buckets=n_buckets)
    for leg, part in (("by_record", "rbucket"), ("by_entity", "ebucket")):
        a = sorted(
            map(tuple, spark.read.parquet(f"{idx}/{leg}").drop(part).collect())
        )
        b = sorted(
            map(tuple, spark.read.parquet(f"{full}/{leg}").drop(part).collect())
        )
        assert a == b and len(a) == 6

    # untouched partitions kept their original files
    touched_parts = {f"rbucket={b}" for b in rep["rbuckets"]} | {
        f"ebucket={b}" for b in rep["ebuckets"]
    }
    for p, mtime in before_files.items():
        part = os.path.basename(os.path.dirname(p))
        if part not in touched_parts:
            assert os.path.exists(p) and os.path.getmtime(p) == mtime, p
    # and at least one bucket was genuinely untouched (3's) while the
    # relabeled entity's buckets were rewritten
    assert touched_parts
    assert len(touched_parts) < 2 * n_buckets

    # serving still works end-to-end on the refreshed index
    members = entity_profile(spark, idx, 9, "id", n_buckets=n_buckets)
    assert {r["id"] for r in members.collect()} == {1, 2, 7, 8, 9}


def test_refresh_entity_index_noop_when_unchanged(spark, tmp_path):
    import glob
    import os

    from home_credit_data_engineering_spark.operators.linkage import (
        refresh_entity_index,
        write_entity_index,
    )

    state = _resolved_state(spark)
    idx = str(tmp_path / "idx")
    write_entity_index(state, idx, "id", n_buckets=4)
    before = sorted(glob.glob(f"{idx}/by_*/*/*.parquet"))
    mtimes = [os.path.getmtime(p) for p in before]
    rep = refresh_entity_index(state, state, idx, "id", n_buckets=4)
    assert rep == {"changed_rows": 0, "rbuckets": [], "ebuckets": []}
    after = sorted(glob.glob(f"{idx}/by_*/*/*.parquet"))
    assert after == before
    assert [os.path.getmtime(p) for p in after] == mtimes


def test_refresh_entity_index_pins_n_buckets(spark, tmp_path):
    """A refresh under a different modulus than the index was built with
    must raise — it would rewrite some partitions while stale rows
    survive under the old bucket layout."""
    import pytest

    from home_credit_data_engineering_spark.operators.linkage import (
        refresh_entity_index,
        write_entity_index,
    )

    state = _resolved_state(spark)
    idx = str(tmp_path / "idx")
    write_entity_index(state, idx, "id", n_buckets=4)
    with pytest.raises(ValueError, match="n_buckets=4"):
        refresh_entity_index(state, state, idx, "id", n_buckets=8)
