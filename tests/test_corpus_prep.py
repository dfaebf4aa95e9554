"""Exact-substring span dedup, sequence packing, and chunking.

Semantics pinned with planted fixtures (exact span boundaries, strip
round-trips, packing arithmetic, chunk coverage); cross-engine parity of
the declared queries runs in test_oracle_parity.py. The production
xxhash64 span path and the md5 twin are asserted equal — spans depend
only on window equality, so the two must agree short of a 64-bit
collision.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.text import token_count
from home_credit_data_engineering_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
)
from home_credit_data_engineering_spark.operators.spans import (
    duplicated_spans,
    duplicated_spans_md5,
    strip_spans,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d e f g h i j unique1 tail1 tail2"),
            (2, "x y a b c d e f g h i j z w unique2"),
            (3, "solo words only here nothing shared at all ok fine"),
            (4, "rep rep rep rep rep rep rep rep rep rep rep rep"),
            (5, "short doc"),
            (6, ""),
        ],
        ["doc_id", "text"],
    )


def test_planted_span_boundaries(spark, corpus):
    rows = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(corpus, "doc_id", "text", k=5).collect()
    }
    # docs 1 & 2 share the 10-token passage a..j (doc1 pos 0-9, doc2 pos
    # 2-11); doc 4 is a 12-token self-repeat (every 5-window duplicated
    # within the doc). Docs 3/5/6 contribute nothing.
    assert rows == {(1, 0, 9, 10), (2, 2, 11, 10), (4, 0, 11, 12)}


def test_adjacent_windows_merge_to_one_maximal_span(spark, corpus):
    spans = duplicated_spans(corpus, "doc_id", "text", k=5)
    per_doc = (
        spans.groupBy("doc_id").count().orderBy("doc_id").collect()
    )
    # each planted duplication yields exactly ONE maximal span, not
    # one row per duplicated window
    assert all(r["count"] == 1 for r in per_doc)


def test_md5_twin_matches_production(spark, sf_dir):
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    docs = read_testdata(spark, sf_dir, "documents")
    prod = sorted(
        map(tuple, duplicated_spans(docs, "doc_id", "text", k=8).collect())
    )
    twin = sorted(
        map(tuple, duplicated_spans_md5(docs, "doc_id", "text", k=8).collect())
    )
    assert prod == twin and len(prod) > 0


def test_strip_spans_removes_exactly_covered_tokens(spark, corpus):
    spans = duplicated_spans(corpus, "doc_id", "text", k=5)
    out = {
        r.doc_id: (r.text_clean, r.removed_tokens)
        for r in strip_spans(corpus, spans, "doc_id", "text").collect()
    }
    assert out[1] == ("unique1 tail1 tail2", 10)
    assert out[2] == ("x y z w unique2", 10)
    assert out[3] == ("solo words only here nothing shared at all ok fine", 0)
    assert out[4] == ("", 12)  # fully-covered doc strips to empty
    assert out[5] == ("short doc", 0)
    assert out[6] == ("", 0)  # blank doc passes through untouched


def test_span_guards(spark, corpus):
    with pytest.raises(ValueError):
        duplicated_spans(corpus, "doc_id", "text", k=1)
    with pytest.raises(ValueError):
        duplicated_spans(corpus, "doc_id", "text", k=5, min_count=1)
    with pytest.raises(ValueError):
        duplicated_spans_md5(corpus, "doc_id", "text", k=1)


def test_min_count_raises_duplication_bar(spark):
    # passage appears twice -> reported at min_count=2, absent at 3
    docs = spark.createDataFrame(
        [(1, "p q r s t u"), (2, "p q r s t u"), (3, "v w x y z zz")],
        ["doc_id", "text"],
    )
    two = duplicated_spans(docs, "doc_id", "text", k=5, min_count=2)
    three = duplicated_spans(docs, "doc_id", "text", k=5, min_count=3)
    assert two.count() == 2 and three.count() == 0


def test_spans_plan_no_python(spark, corpus):
    plan = (
        duplicated_spans(corpus, "doc_id", "text", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# sequence packing


def test_pack_sequences_arithmetic(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(c))) for i, c in
         [(1, 5), (2, 12), (3, 3), (4, 0), (5, 7), (6, 25)]],
        ["doc_id", "text"],
    )
    rows = pack_sequences(
        docs.withColumn("n", token_count("text")), "doc_id", "n",
        budget=10, shards=2,
    ).collect()
    assert 4 not in {r.doc_id for r in rows}  # zero-token doc excluded
    for r in rows:
        assert r.seq_first == r.start_offset // 10
        assert r.seq_last == (r.start_offset + r.token_count - 1) // 10
        assert r.n_seqs == r.seq_last - r.seq_first + 1
    # within each shard: offsets abut exactly (no gaps, no overlaps)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.start_offset)
        pos = 0
        for r in shard_rows:
            assert r.start_offset == pos
            pos += r.token_count


def test_pack_sequences_deterministic_across_partitionings(spark):
    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.lit(7).alias("n"),
    )
    a = pack_sequences(docs, "doc_id", "n", budget=64, shards=4)
    b = pack_sequences(docs.repartition(13), "doc_id", "n", budget=64, shards=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_guards(spark):
    docs = spark.range(1).select(F.col("id").alias("doc_id"), F.lit(1).alias("n"))
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "n", budget=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "n", budget=10, shards=0)


# ---------------------------------------------------------------------------
# chunking


def test_chunk_coverage_and_overlap(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{j}" for j in range(25)))], ["doc_id", "text"]
    )
    rows = sorted(
        chunk_documents(docs, "doc_id", "text", chunk_tokens=6, stride=4).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts at every stride while inside the doc
    assert [r.chunk_start for r in rows] == list(range(0, 25, 4))
    covered = set()
    for r in rows:
        toks = r.chunk_text.split()
        assert len(toks) == r.chunk_len <= 6
        assert toks == [f"t{j}" for j in range(r.chunk_start, r.chunk_start + r.chunk_len)]
        covered.update(range(r.chunk_start, r.chunk_start + r.chunk_len))
    assert covered == set(range(25))  # every token in >= 1 chunk


def test_chunk_non_overlapping_reassembles_text(spark):
    text = " ".join(f"t{j}" for j in range(23))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(docs, "doc_id", "text", chunk_tokens=8, stride=8).collect(),
        key=lambda r: r.chunk_id,
    )
    assert " ".join(r.chunk_text for r in rows) == text


def test_chunk_empty_and_blank_docs_yield_no_rows(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one")], ["doc_id", "text"]
    )
    rows = chunk_documents(docs, "doc_id", "text", 4, 2).collect()
    assert {(r.doc_id, r.chunk_text) for r in rows} == {(3, "one")}


def test_chunk_guards(spark):
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=4, stride=0)


def test_chunk_plan_no_shuffle_no_python(spark, sf_dir):
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    docs = read_testdata(spark, sf_dir, "documents")
    plan = (
        chunk_documents(docs, "doc_id", "text", 32, 16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # narrow explode: embarrassingly parallel
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# property: spans == brute-force reference on random tiny-vocab corpora


def _brute_force_spans(texts: dict[int, str], k: int) -> set[tuple]:
    """O(n²) reference: count every k-token window, merge duplicated
    positions into maximal spans."""
    from collections import Counter

    windows: dict[int, list[tuple[int, tuple]]] = {}
    counts: Counter = Counter()
    for doc, text in texts.items():
        toks = text.split()
        windows[doc] = [
            (p, tuple(toks[p : p + k])) for p in range(len(toks) - k + 1)
        ]
        for _, w in windows[doc]:
            counts[w] += 1
    out = set()
    for doc, ws in windows.items():
        dup_pos = sorted(p for p, w in ws if counts[w] >= 2)
        run: list[int] = []
        for p in dup_pos + [None]:
            if run and (p is None or p != run[-1] + 1):
                out.add((doc, run[0], run[-1] + k - 1, run[-1] - run[0] + k))
                run = []
            if p is not None:
                run.append(p)
    return out


def test_spans_match_brute_force_on_random_corpora(spark):
    import random

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(6)]  # tiny vocab -> dense collisions
    for trial in range(5):
        texts = {
            doc: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 18)))
            for doc in range(12)
        }
        expected = _brute_force_spans(texts, k=4)
        df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
        got = {
            tuple(r)
            for r in duplicated_spans(df, "doc_id", "text", k=4).collect()
        }
        assert got == expected, f"trial {trial}"


# ---------------------------------------------------------------------------
# incremental spans: O(delta) daily job == full recompute (new docs)


def test_incremental_spans_equal_full_recompute_on_new_docs(spark):
    from home_credit_data_engineering_spark.operators.spans import (
        incremental_spans,
        window_hash_state,
    )

    old = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "iota kappa lam mu nu xi omicron pi"),
            (3, "rho sigma tau upsilon phi chi psi omega"),
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            # repeats doc 1's passage -> history-only duplication
            (10, "intro words alpha beta gamma delta epsilon zeta end"),
            # duplicated within today's batch only
            (11, "fresh one two three four five six seven"),
            (12, "padding fresh one two three four five six closing"),
            # nothing repeated
            (13, "totally novel content appearing nowhere else at all"),
        ],
        ["doc_id", "text"],
    )
    k = 5
    state = window_hash_state(old, "doc_id", "text", k=k)
    inc = incremental_spans(new, state, "doc_id", "text", k=k)
    got = sorted(map(tuple, inc["spans"].collect()))

    full = duplicated_spans(old.unionByName(new), "doc_id", "text", k=k)
    expected = sorted(
        map(tuple, full.filter(F.col("doc_id") >= 10).collect())
    )
    assert got == expected
    assert len(got) >= 3  # history dup (10) + intra-batch pair (11, 12)
    assert 13 not in {r[0] for r in got}

    # merged state must equal the state a from-scratch build would give
    rebuilt = window_hash_state(
        old.unionByName(new), "doc_id", "text", k=k
    )
    assert sorted(map(tuple, inc["state"].collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_incremental_spans_empty_history(spark):
    from home_credit_data_engineering_spark.operators.spans import (
        incremental_spans,
        window_hash_state,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "z a b c d e f")], ["doc_id", "text"]
    )
    state = window_hash_state(empty, "doc_id", "text", k=5)
    inc = incremental_spans(new, state, "doc_id", "text", k=5)
    got = sorted(map(tuple, inc["spans"].collect()))
    expected = sorted(
        map(tuple, duplicated_spans(new, "doc_id", "text", k=5).collect())
    )
    assert got == expected and len(got) == 2


def test_incremental_spans_random_splits_match_full(spark):
    import random

    from home_credit_data_engineering_spark.operators.spans import (
        incremental_spans,
        window_hash_state,
    )

    rng = random.Random(20260814)
    vocab = [f"v{i}" for i in range(8)]
    for trial in range(3):
        rows = [
            (doc, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
            for doc in range(16)
        ]
        cut = rng.randint(1, 15)
        old = spark.createDataFrame(rows[:cut], ["doc_id", "text"])
        new = spark.createDataFrame(rows[cut:], ["doc_id", "text"])
        state = window_hash_state(old, "doc_id", "text", k=4)
        inc = incremental_spans(new, state, "doc_id", "text", k=4)
        got = sorted(map(tuple, inc["spans"].collect()))
        full = duplicated_spans(
            spark.createDataFrame(rows, ["doc_id", "text"]), "doc_id", "text", k=4
        )
        new_ids = {r[0] for r in rows[cut:]}
        expected = sorted(
            r for r in map(tuple, full.collect()) if r[0] in new_ids
        )
        assert got == expected, f"trial {trial} cut {cut}"


# ---------------------------------------------------------------------------
# token-budget mixing


def test_token_budget_mix_respects_budgets(spark):
    from home_credit_data_engineering_spark.operators.packing import (
        token_budget_mix,
    )

    docs = spark.createDataFrame(
        [(i, src, 10) for i, src in enumerate(
            ["web"] * 20 + ["code"] * 20 + ["forum"] * 20)],
        ["doc_id", "source", "ntok"],
    )
    out = token_budget_mix(
        docs, "doc_id", "ntok", "source", budgets={"web": 55, "code": 0}
    ).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # forum has no budget -> dropped entirely; code budget 0 -> nothing
    assert set(by_src) == {"web"}
    # 10-token docs against budget 55: kept while start < 55 -> 6 docs
    # (offsets 0..50), overshoot bounded by the one boundary doc
    kept = sorted(r.start_offset for r in by_src["web"])
    assert kept == [0, 10, 20, 30, 40, 50]


def test_token_budget_mix_deterministic_and_guarded(spark):
    from home_credit_data_engineering_spark.operators.packing import (
        token_budget_mix,
    )
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(i, "a", 5 + i % 3) for i in range(50)], ["doc_id", "source", "n"]
    )
    a = token_budget_mix(docs, "doc_id", "n", "source", {"a": 100})
    b = token_budget_mix(
        docs.repartition(9), "doc_id", "n", "source", {"a": 100}
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    with _pytest.raises(ValueError):
        token_budget_mix(docs, "doc_id", "n", "source", {})
    with _pytest.raises(ValueError):
        token_budget_mix(docs, "doc_id", "n", "source", {"a": -1})


def test_token_budget_mix_matches_python_reference(spark):
    """Randomized cross-check of the window logic against a pure-Python
    reimplementation of the md5 permutation + exclusive cumsum."""
    import hashlib
    import random

    from home_credit_data_engineering_spark.operators.packing import (
        token_budget_mix,
    )

    rng = random.Random(20260814)
    for trial in range(3):
        rows = [
            (i, rng.choice(["a", "b", "c"]), rng.randint(0, 9))
            for i in range(60)
        ]
        budgets = {"a": rng.randint(1, 120), "b": rng.randint(1, 120)}

        def perm(doc_id: int) -> str:
            return hashlib.md5(f"s42:{doc_id}".encode()).hexdigest()

        expected = set()
        for src in budgets:
            stream = sorted(
                (r for r in rows if r[1] == src and r[2] >= 1),
                key=lambda r: (perm(r[0]), r[0]),
            )
            pos = 0
            for doc_id, _, n in stream:
                if pos < budgets[src]:
                    expected.add((doc_id, src, n, pos))
                pos += n

        df = spark.createDataFrame(rows, "doc_id long, source string, n long")
        got = {
            tuple(r)
            for r in token_budget_mix(
                df, "doc_id", "n", "source", budgets
            ).collect()
        }
        assert got == expected, f"trial {trial}"


def test_token_budget_mix_cumsum_is_sharded(spark):
    """No single window partition may span a whole source.

    The per-document running sum must be partitioned by (source, shard),
    not source alone — otherwise one source's entire metadata lands on a
    single task at mixture scale. Plan-level: every per-row window in the
    optimized plan carries ``__shard`` in its partition spec, and the
    shard column actually spreads rows (>1 distinct shard for a 500-doc
    source at the default 64 shards).
    """
    from home_credit_data_engineering_spark.operators.packing import (
        token_budget_mix,
    )

    docs = spark.createDataFrame(
        [(i, "web", 3) for i in range(500)], ["doc_id", "source", "n"]
    )
    out = token_budget_mix(docs, "doc_id", "n", "source", {"web": 10**9})
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re

    row_windows = [
        line
        for line in plan.splitlines()
        if "windowspecdefinition" in line and "__ord" in line
    ]
    assert row_windows, "expected the per-row cumsum window in the plan"
    assert all("__shard" in line for line in row_windows), (
        "per-row cumsum window is not sharded:\n" + "\n".join(row_windows)
    )
    assert not re.search(
        r"windowspecdefinition\(source#\d+[,)]\s*__ord", plan
    ), "found a source-only window over the md5 order key"
    n_shards = out.select("start_offset").count()  # force execution path
    distinct_shards = (
        docs.selectExpr(
            "floor(conv(substring(md5(concat('s42:', cast(doc_id as string))),"
            " 1, 4), 16, 10) * 64 / 65536) AS s"
        )
        .distinct()
        .count()
    )
    assert n_shards == 500 and distinct_shards > 1


def test_contaminated_spans_detects_benchmark_overlap(spark):
    from home_credit_data_engineering_spark.operators.spans import (
        contaminated_spans,
        strip_spans,
    )

    bench = spark.createDataFrame(
        [(100, "what is the capital of france paris obviously")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            # leaks the benchmark question verbatim mid-document
            (1, "intro text what is the capital of france paris obviously end"),
            (2, "completely unrelated training material with no overlap here"),
            # train-internal duplication must NOT count — only benchmark
            # overlap does
            (3, "completely unrelated training material with no overlap here"),
        ],
        ["doc_id", "text"],
    )
    spans = contaminated_spans(train, bench, "doc_id", "text", k=5)
    rows = {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()}
    assert rows == {(1, 2, 9)}  # exactly the leaked question, nothing else

    cleaned = {
        r.doc_id: r.text_clean
        for r in strip_spans(train, spans, "doc_id", "text").collect()
    }
    assert cleaned[1] == "intro text end"
    assert cleaned[2].startswith("completely unrelated")


def test_pack_documents_whole_ffd_invariants(spark):
    """Whole-doc FFD packing: python-reference exact assignment,
    capacity respected, first-fit half-empty invariant, determinism
    under repartitioning, and the oversized-document raise."""
    import hashlib

    import pytest as _pytest

    from home_credit_data_engineering_spark.operators.packing import (
        pack_documents_whole,
    )

    rows = [(i, 10 + (i * 13) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    cap = 128
    out = pack_documents_whole(df, "doc_id", "n", budget=cap, shards=4)
    got = {(r["doc_id"]): (r["shard"], r["bin_id"]) for r in out.collect()}
    assert len(got) == 200

    # python reference: same shard hash, same FFD order
    def perm(doc_id):
        return hashlib.md5(f"s42:{doc_id}".encode()).hexdigest()

    def shard_of(doc_id):
        return int(perm(doc_id)[:8], 16) % 4

    expected = {}
    for s in range(4):
        docs = sorted(
            ((n, perm(i), i) for i, n in rows if shard_of(i) == s),
            key=lambda t: (-t[0], t[1], t[2]),
        )
        remaining = []
        for n, _, i in docs:
            for b, rem in enumerate(remaining):
                if n <= rem:
                    remaining[b] = rem - n
                    expected[i] = (s, b)
                    break
            else:
                remaining.append(cap - n)
                expected[i] = (s, len(remaining) - 1)
    assert got == expected

    # invariants over the actual assignment
    fills: dict[tuple, int] = {}
    for r in out.collect():
        fills[(r["shard"], r["bin_id"])] = (
            fills.get((r["shard"], r["bin_id"]), 0) + r["token_count"]
        )
    assert all(v <= cap for v in fills.values())
    from collections import Counter

    half_empty = Counter()
    for (s, _b), v in fills.items():
        half_empty[s] += v <= cap / 2
    assert all(c <= 1 for c in half_empty.values())

    # partitioning-invariant
    again = {
        (r["doc_id"]): (r["shard"], r["bin_id"])
        for r in pack_documents_whole(
            df.repartition(7), "doc_id", "n", budget=cap, shards=4
        ).collect()
    }
    assert again == got

    # oversized docs must raise, not truncate
    big = spark.createDataFrame([(1, 500)], "doc_id long, n long")
    with _pytest.raises(Exception, match="more than budget"):
        pack_documents_whole(big, "doc_id", "n", budget=100).collect()


def _naive_first_fit(sizes: list[int], cap: int) -> list[int]:
    remaining: list[int] = []
    assigned = []
    for s in sizes:
        for b, rem in enumerate(remaining):
            if s <= rem:
                remaining[b] = rem - s
                assigned.append(b)
                break
        else:
            remaining.append(cap - s)
            assigned.append(len(remaining) - 1)
    return assigned


def test_ffd_segment_tree_equals_naive_randomized(spark):
    # the r6 segment-tree first-fit must be bit-identical to the linear
    # scan it replaced, for every (sizes, capacity)
    import random

    from home_credit_data_engineering_spark.operators.packing import (
        pack_documents_whole,
    )

    rng = random.Random(7)
    for trial in range(3):
        cap = rng.choice([17, 64, 257])
        rows = [(i, rng.randint(1, cap)) for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, n long")
        out = pack_documents_whole(
            df, "doc_id", "n", budget=cap, shards=3, seed=trial
        ).collect()
        by_shard: dict[int, list] = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r)
        # reconstruct each shard's FFD order (desc n, md5 perm, id) via
        # the operator's own sort keys and replay the naive first-fit
        import hashlib

        def perm(doc_id, seed=trial):
            return hashlib.md5(f"s{seed}:{doc_id}".encode()).hexdigest()

        n_of = dict(rows)
        for shard, members in by_shard.items():
            order = sorted(
                members,
                key=lambda r: (-r["token_count"], perm(r[0]), r[0]),
            )
            got = [r["bin_id"] for r in order]
            want = _naive_first_fit([r["token_count"] for r in order], cap)
            assert got == want, (shard, got[:20], want[:20])
        assert len(out) == 400


def test_ffd_many_small_docs_completes_fast(spark):
    # the r5 quadratic corner: 200k unit docs into a 10^6 budget opens
    # ~1 bin but previously scanned every open bin per doc; worst case
    # (distinct bins) is now O(docs log bins). Must finish in seconds.
    import time

    from home_credit_data_engineering_spark.operators.packing import (
        pack_documents_whole,
    )

    df = spark.range(200_000).select(
        F.col("id").alias("doc_id"), F.lit(3).alias("n")
    )
    start = time.time()
    out = pack_documents_whole(df, "doc_id", "n", budget=1_000_000, shards=2)
    total = out.groupBy().agg(F.sum("token_count").alias("t")).collect()[0]["t"]
    elapsed = time.time() - start
    assert total == 600_000
    # each shard packs ~100k unit docs into ~1 bin (333333 docs/bin)
    n_bins = out.select("shard", "bin_id").distinct().count()
    assert n_bins <= 4
    assert elapsed < 60, f"FFD too slow: {elapsed:.1f}s"


def test_line_dedup_planted_boilerplate(spark):
    # C4/RefinedWeb-style: the cookie banner repeats across docs and
    # within a doc; only its GLOBAL first occurrence survives. Blank
    # lines and unique lines are untouched.
    from home_credit_data_engineering_spark.operators.spans import (
        duplicated_lines,
        strip_lines,
    )

    banner = "accept all cookies to continue"
    rows = [
        (1, f"{banner}\nunique article one\n\nmore unique text"),
        (2, f"intro two\n{banner}\nunique article two"),
        (3, f"{banner}\n{banner}\nunique article three"),
        (4, "no boilerplate here at all"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    removals = {
        (r["doc_id"], r["line_pos"])
        for r in duplicated_lines(df, "doc_id", "text").collect()
    }
    # first occurrence is (1, 0); all other banner copies removed
    assert removals == {(2, 1), (3, 0), (3, 1)}

    out = {
        r["doc_id"]: (r["text_clean"], r["n_lines"], r["removed_lines"])
        for r in strip_lines(
            df, duplicated_lines(df, "doc_id", "text"), "doc_id", "text"
        ).collect()
    }
    assert out[1] == (rows[0][1], 4, 0)  # keeps the first banner + blank
    assert out[2] == ("intro two\nunique article two", 3, 1)
    assert out[3] == ("unique article three", 3, 2)
    assert out[4] == (rows[3][1], 1, 0)
    assert out[5] == ("", 1, 0)


def test_line_dedup_min_count_threshold(spark):
    from home_credit_data_engineering_spark.operators.spans import (
        duplicated_lines,
    )
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc"), (3, "a\nb")], "doc_id long, text string"
    )
    # 'a' x3, 'b' x2: min_count=3 only strips copies of 'a'
    got = {
        (r["doc_id"], r["line_pos"])
        for r in duplicated_lines(df, "doc_id", "text", min_count=3).collect()
    }
    assert got == {(2, 0), (3, 0)}
    with _pytest.raises(ValueError, match="min_count"):
        duplicated_lines(df, "doc_id", "text", min_count=1)


def test_line_dedup_shuffles_metadata_only(spark, sf_dir):
    # the removal-selection pipeline must never put line text or
    # document text into an Exchange — (doc_id, line_pos, hash8) only
    from home_credit_data_engineering_spark.operators.spans import (
        duplicated_lines,
    )
    from home_credit_data_engineering_spark.sources.readers import (
        read_testdata,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    rem = duplicated_lines(docs, "doc_id", "text")
    rem.count()
    plan = rem._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for seg in plan.split("Exchange ")[1:]:
        head = seg.split("\n")[0]
        assert "text#" not in head and "__line#" not in head, head


def test_temperature_mix_budgets_properties(spark):
    from home_credit_data_engineering_spark.operators.packing import (
        temperature_budgets_dict,
        temperature_mix_budgets,
        token_budget_mix,
    )
    import pytest as _pytest

    rows = (
        [(i, "big", 100) for i in range(90)]
        + [(i + 1000, "small", 100) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")

    nat = {
        r["source"]: r["weight"]
        for r in temperature_mix_budgets(
            df, "source", "n", total_budget=1000, alpha=1.0
        ).collect()
    }
    assert abs(nat["big"] - 0.9) < 1e-6 and abs(nat["small"] - 0.1) < 1e-6

    temp = {
        r["source"]: r
        for r in temperature_mix_budgets(
            df, "source", "n", total_budget=1000, alpha=0.5
        ).collect()
    }
    # temperature upsamples the small source, never past uniform
    assert 0.1 < temp["small"]["weight"] < 0.5
    assert temp["big"]["weight"] + temp["small"]["weight"] == _pytest.approx(
        1.0, abs=1e-5
    )
    assert temp["big"]["n_tokens"] == 9000

    # budgets feed token_budget_mix end to end
    budgets = temperature_budgets_dict(
        temperature_mix_budgets(df, "source", "n", total_budget=1000)
    )
    mixed = token_budget_mix(df, "doc_id", "n", "source", budgets)
    taken = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source")
        .agg(F.sum("token_count").alias("n"))
        .collect()
    }
    # within one boundary document of each budget
    for src, b in budgets.items():
        assert taken[src] <= b + 100

    with _pytest.raises(ValueError, match="alpha"):
        temperature_mix_budgets(df, "source", "n", total_budget=10, alpha=0)
    with _pytest.raises(ValueError, match="total_budget"):
        temperature_mix_budgets(df, "source", "n", total_budget=0)
    with _pytest.raises(ValueError, match="sources"):
        temperature_budgets_dict(
            temperature_mix_budgets(df, "source", "n", total_budget=10),
            max_sources=1,
        )


def test_incremental_line_removals_equals_full(spark):
    # full-corpus recompute restricted to the new batch == incremental
    # judgment against persisted state (monotone-id contract), and the
    # merged state equals the full corpus state
    from home_credit_data_engineering_spark.operators.spans import (
        duplicated_lines,
        incremental_line_removals,
        line_hash_state,
    )

    old = [
        (1, "banner line\nold unique one"),
        (2, "old unique two\nbanner line"),
        (3, "thrice\nthrice\nold text"),
    ]
    new = [
        (10, "banner line\nfresh text"),       # historical dup -> removed
        (11, "brand new dup\nanother fresh"),
        (12, "brand new dup\nlast fresh"),     # batch dup: 11 keeps first
        (13, "thrice\nclosing text"),
    ]
    old_df = spark.createDataFrame(old, "doc_id long, text string")
    new_df = spark.createDataFrame(new, "doc_id long, text string")
    full_df = old_df.unionByName(new_df)

    state = line_hash_state(old_df, "doc_id", "text")
    inc = incremental_line_removals(new_df, state, "doc_id", "text")
    got = {
        (r["doc_id"], r["line_pos"]) for r in inc["removals"].collect()
    }
    full = {
        (r["doc_id"], r["line_pos"])
        for r in duplicated_lines(full_df, "doc_id", "text").collect()
        if r["doc_id"] >= 10
    }
    assert got == full
    assert (10, 0) in got and (12, 0) in got and (13, 0) in got
    assert (11, 0) not in got  # batch-first of a brand-new dup survives

    merged = {
        (r["__fp"], r["n_occurrences"])
        for r in inc["state"].collect()
    }
    want_state = {
        (r["__fp"], r["n_occurrences"])
        for r in line_hash_state(full_df, "doc_id", "text").collect()
    }
    assert merged == want_state
