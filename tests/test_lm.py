"""CCNet-style LM perplexity (operators/lm.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.lm import (
    lm_perplexity,
    perplexity_buckets,
    train_unigram_lm,
)


def _python_ppl(rows, alpha=0.5):
    """Pure-Python reimplementation: same rounding discipline."""
    from collections import Counter

    counts: Counter = Counter()
    for _, text in rows:
        counts.update(text.split())
    t, v = sum(counts.values()), len(counts)
    logp = {
        tok: round(math.log((c + alpha) / (t + alpha * v)), 9)
        for tok, c in counts.items()
    }
    out = {}
    for doc_id, text in rows:
        toks = text.split()
        if not toks:
            continue
        ll = sum(logp[tok] for tok in toks)  # exact: 9-dp decimals
        out[doc_id] = (len(toks), round(math.exp(-ll / len(toks)), 4))
    return out


def test_self_scored_perplexity_matches_python(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "zxqv flurm blat zxqv"),
        (4, "the the the the"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["ppl"])
        for r in lm_perplexity(df, "doc_id", "text").collect()
    }
    expected = _python_ppl(rows)
    assert set(got) == set(expected)  # empty doc excluded
    for doc_id, (n, ppl) in expected.items():
        assert got[doc_id][0] == n
        assert got[doc_id][1] == pytest.approx(ppl, abs=1e-9)
    # the all-repeated-token doc is the most predictable of its corpus
    assert got[4][1] == min(p for _, p in got.values())


def test_external_model_scoring_and_unseen_floor(spark):
    train = spark.createDataFrame(
        [(1, "a b a b a"), (2, "b c b c")], "doc_id long, text string"
    )
    model = train_unigram_lm(train, "doc_id", "text")
    floor = -10.0
    target = spark.createDataFrame(
        [(9, "a b"), (10, "zz zz")], "doc_id long, text string"
    )
    scored = {
        r["doc_id"]: r["ppl"]
        for r in lm_perplexity(
            target, "doc_id", "text", model=model, unseen_logp=floor
        ).collect()
    }
    # all-OOV doc scores exactly exp(-floor)
    assert scored[10] == pytest.approx(round(math.exp(10.0), 4))
    assert scored[9] < scored[10]
    with pytest.raises(ValueError, match="unseen_logp"):
        lm_perplexity(target, "doc_id", "text", model=model)
    with pytest.raises(ValueError, match="alpha"):
        train_unigram_lm(train, "doc_id", "text", alpha=0.0)


def test_perplexity_buckets_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common common") for i in range(30)],
        "doc_id long, text string",
    )
    scored = lm_perplexity(df, "doc_id", "text")
    a = perplexity_buckets(scored).collect()
    b = perplexity_buckets(scored.repartition(7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    from collections import Counter

    sizes = Counter(r["bucket"] for r in a)
    assert set(sizes) == {1, 2, 3} and max(sizes.values()) - min(
        sizes.values()
    ) <= 1
    with pytest.raises(ValueError, match="n_buckets"):
        perplexity_buckets(scored, n_buckets=0)


def test_lm_plan_is_jvm_only(spark, sf_dir):
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    docs = read_testdata(spark, sf_dir, "documents")
    scored = lm_perplexity(docs, "doc_id", "text")
    scored.count()
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # the model totals ride a broadcast, not a driver collect
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_approx_buckets_track_exact_split(spark):
    from home_credit_data_engineering_spark.operators.lm import (
        perplexity_buckets_approx,
    )

    # (29, 31) coprime count pattern -> essentially unique ppl per doc;
    # NTILE splits exact-tie groups across buckets while thresholds
    # can't, so tie-free data isolates the sketch-boundary error band.
    rows = [
        (
            i,
            " ".join(
                ["the"] * (1 + i % 29)
                + ["of"] * (1 + (i * 7) % 31)
                + [f"w{i}"]
            ),
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scored = lm_perplexity(df, "doc_id", "text")
    exact = {
        r["doc_id"]: r["bucket"] for r in perplexity_buckets(scored).collect()
    }
    approx_df = perplexity_buckets_approx(scored)
    approx = {r["doc_id"]: r["bucket"] for r in approx_df.collect()}
    assert set(approx) == set(exact)
    agree = sum(1 for d in exact if exact[d] == approx[d]) / len(exact)
    # disagreement only at tie/boundary docs
    assert agree >= 0.9, f"agreement {agree}"
    # no single-task global sort in the plan: no ntile window, and the
    # only all-to-one step is the sketch aggregate
    plan = approx_df._jdf.queryExecution().optimizedPlan().toString()
    assert "ntile(" not in plan.lower()  # (percentile_approx contains 'ntile')
    assert "windowspecdefinition" not in plan.lower()
    from collections import Counter

    sizes = Counter(approx.values())
    assert set(sizes) <= {1, 2, 3}
    assert max(sizes.values()) <= 2 * min(sizes.values()) + 10


def test_stupid_backoff_matches_python(spark):
    from home_credit_data_engineering_spark.operators.lm import (
        stupid_backoff_perplexity,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the log"),
        (3, "a cat a dog a cat"),
        (4, "singleton"),
        (5, ""),
    ]
    from collections import Counter

    uni: Counter = Counter()
    big: Counter = Counter()
    for _, text in rows:
        toks = text.split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n = sum(uni.values())

    def s_uni(v):
        return uni[v] / n

    expected = {}
    for doc_id, text in rows:
        toks = text.split()
        if not toks:
            continue
        lps = [round(math.log(s_uni(toks[0])), 9)]
        for u, v in zip(toks, toks[1:]):
            if big[(u, v)] > 0:
                lps.append(round(math.log(big[(u, v)] / uni[u]), 9))
            else:
                lps.append(round(math.log(0.4) + math.log(s_uni(v)), 9))
        expected[doc_id] = (
            len(toks),
            round(math.exp(-sum(lps) / len(toks)), 4),
        )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["ppl"])
        for r in stupid_backoff_perplexity(df, "doc_id", "text").collect()
    }
    assert set(got) == set(expected)
    for doc_id, (nt, ppl) in expected.items():
        assert got[doc_id][0] == nt
        assert got[doc_id][1] == pytest.approx(ppl, abs=1e-9)
    # seen-bigram docs are more predictable than the backoff-only doc
    assert got[1][1] < got[4][1]
    with pytest.raises(ValueError, match="backoff"):
        stupid_backoff_perplexity(df, "doc_id", "text", backoff=0.0)


def test_incremental_counts_reproduce_full_model(spark):
    """full-corpus model ≡ model from merge(history state, delta counts)
    — the O(delta) refresh contract, including randomized splits."""
    import random

    from home_credit_data_engineering_spark.operators.lm import (
        merge_unigram_counts,
        unigram_count_state,
        unigram_lm_from_counts,
    )

    rng = random.Random(20260814)
    rows = [
        (i, " ".join(rng.choice(["a", "b", "c", "dd", "ee"]) for _ in range(8)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {
        (r["token"], r["logp"])
        for r in unigram_lm_from_counts(
            unigram_count_state(df, "doc_id", "text")
        ).collect()
    }
    for cut in (1, 13, 39):
        old = df.filter(F.col("doc_id") < cut)
        new = df.filter(F.col("doc_id") >= cut)
        merged = merge_unigram_counts(
            unigram_count_state(old, "doc_id", "text"),
            unigram_count_state(new, "doc_id", "text"),
        )
        got = {
            (r["token"], r["logp"])
            for r in unigram_lm_from_counts(merged).collect()
        }
        assert got == full, f"cut {cut}"


def _py_stupid_backoff(docs: dict, order: int, backoff: float) -> dict:
    """Pure-Python n-gram Stupid Backoff reference (per-doc ppl)."""
    import math
    from collections import Counter

    toks = {d: t.split() for d, t in docs.items()}
    counts = [Counter() for _ in range(order + 1)]  # counts[k] = k-gram
    total = 0
    for seq in toks.values():
        total += len(seq)
        for k in range(1, order + 1):
            for i in range(len(seq) - k + 1):
                counts[k][tuple(seq[i : i + k])] += 1

    def score(seq, i):
        m = min(i, order - 1)  # available context length
        pen = 0
        for k in range(m + 1, 1, -1):
            gram = tuple(seq[i - k + 1 : i + 1])
            if counts[k][gram] > 0:
                ctx = gram[:-1]
                return pen * math.log(backoff) + math.log(
                    counts[k][gram] / counts[k - 1][ctx]
                )
            pen += 1
        return pen * math.log(backoff) + math.log(
            counts[1][(seq[i],)] / total
        )

    out = {}
    for d, seq in toks.items():
        if not seq:
            continue
        ll = sum(round(score(seq, i), 9) for i in range(len(seq)))
        out[d] = (len(seq), round(math.exp(-ll / len(seq)), 4))
    return out


def test_ngram_backoff_matches_python_reference(spark):
    from home_credit_data_engineering_spark.operators.lm import (
        ngram_backoff_perplexity,
    )

    docs = {
        1: "the cat sat on the mat",
        2: "the cat sat on the hat",
        3: "the dog sat on the mat",
        4: "a dog barks",
        5: "the cat sat",
        6: "mat the on sat cat the",
        7: "one",
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    for order in (2, 3, 4):
        got = {
            r["doc_id"]: (r["n_tokens"], r["ppl"])
            for r in ngram_backoff_perplexity(
                df, "doc_id", "text", order=order
            ).collect()
        }
        want = _py_stupid_backoff(docs, order, 0.4)
        assert got == want, f"order={order}: {got} != {want}"


def test_ngram_order2_equals_bigram_operator(spark, sf_dir):
    from home_credit_data_engineering_spark.operators.lm import (
        ngram_backoff_perplexity,
        stupid_backoff_perplexity,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {
        r["doc_id"]: (r["n_tokens"], r["ppl"])
        for r in ngram_backoff_perplexity(
            docs, "doc_id", "text", order=2
        ).collect()
    }
    b = {
        r["doc_id"]: (r["n_tokens"], r["ppl"])
        for r in stupid_backoff_perplexity(docs, "doc_id", "text").collect()
    }
    assert a == b


def test_ngram_backoff_guards(spark):
    import pytest as _pytest

    from home_credit_data_engineering_spark.operators.lm import (
        ngram_backoff_perplexity,
    )

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="order"):
        ngram_backoff_perplexity(df, "doc_id", "text", order=1)
    with _pytest.raises(ValueError, match="backoff"):
        ngram_backoff_perplexity(df, "doc_id", "text", backoff=0.0)


# ---------------------------------------------------------------------------
# corpus_divergence
# ---------------------------------------------------------------------------

from home_credit_data_engineering_spark.operators.lm import corpus_divergence


def _div_ref(docs_a, docs_b, alpha=1.0):
    """Pure-python replica of corpus_divergence's exact arithmetic."""
    import math
    from collections import Counter

    ca = Counter(t for d in docs_a for t in d.split())
    cb = Counter(t for d in docs_b for t in d.split())
    vocab = sorted(set(ca) | set(cb))
    ta, tb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    la = {t: round(math.log((ca[t] + alpha) / (ta + alpha * v)), 9) for t in vocab}
    lb = {t: round(math.log((cb[t] + alpha) / (tb + alpha * v)), 9) for t in vocab}
    lm_ = {
        t: round(
            math.log(
                ((ca[t] + alpha) / (ta + alpha * v)
                 + (cb[t] + alpha) / (tb + alpha * v)) / 2
            ),
            9,
        )
        for t in vocab
    }
    saa = sum(ca[t] * la[t] for t in vocab)
    sab = sum(ca[t] * lb[t] for t in vocab)
    sbb = sum(cb[t] * lb[t] for t in vocab)
    sba = sum(cb[t] * la[t] for t in vocab)
    sam = sum(ca[t] * lm_[t] for t in vocab)
    sbm = sum(cb[t] * lm_[t] for t in vocab)
    return {
        "tokens_a": ta, "tokens_b": tb, "vocab": v,
        "ce_ab": round(-sab / ta, 6),
        "kl_ab": round((saa - sab) / ta, 6),
        "kl_ba": round((sbb - sba) / tb, 6),
        "js": round(0.5 * (saa - sam) / ta + 0.5 * (sbb - sbm) / tb, 6),
    }


def _div_df(spark, docs_a, docs_b):
    rows = [(t, "a") for t in docs_a] + [(t, "b") for t in docs_b]
    return spark.createDataFrame(rows, schema="text string, src string")


def test_divergence_matches_python_reference(spark):
    docs_a = ["the cat sat on the mat", "the dog ran", "cat cat dog"]
    docs_b = ["a dog barked at the moon", "the moon rose", "dog moon"]
    df = _div_df(spark, docs_a, docs_b)
    [row] = corpus_divergence(df, "text", "src", "a", "b").collect()
    ref = _div_ref(docs_a, docs_b)
    for k, v in ref.items():
        assert row[k] == pytest.approx(v, abs=2e-6), k


def test_divergence_identical_corpora_is_zero(spark):
    docs = ["x y z", "x x y", "z z z y"]
    df = _div_df(spark, docs, docs)
    [row] = corpus_divergence(df, "text", "src", "a", "b").collect()
    assert row["kl_ab"] == 0.0 and row["kl_ba"] == 0.0 and row["js"] == 0.0
    assert row["ce_ab"] > 0


def test_divergence_disjoint_exceeds_overlapping(spark):
    a = ["alpha beta gamma"] * 3
    near = ["alpha beta delta"] * 3
    far = ["omega psi chi"] * 3
    [r_near] = corpus_divergence(
        _div_df(spark, a, near), "text", "src", "a", "b"
    ).collect()
    [r_far] = corpus_divergence(
        _div_df(spark, a, far), "text", "src", "a", "b"
    ).collect()
    assert r_far["js"] > r_near["js"] > 0
    assert r_far["kl_ab"] > r_near["kl_ab"]


def test_divergence_ignores_other_splits(spark):
    rows = [("x y", "a"), ("x z", "b"), ("junk junk", "c")]
    df = spark.createDataFrame(rows, schema="text string, src string")
    [row] = corpus_divergence(df, "text", "src", "a", "b").collect()
    assert row["tokens_a"] == 2 and row["tokens_b"] == 2
    assert row["vocab"] == 3  # x, y, z — no junk


def test_divergence_rejects_bad_alpha(spark):
    df = _div_df(spark, ["x"], ["y"])
    with pytest.raises(ValueError):
        corpus_divergence(df, "text", "src", "a", "b", alpha=0.0)


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def _pmi_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], schema="doc_id bigint, text string"
    )


def test_pmi_collocations_hand_computed(spark):
    import math

    from home_credit_data_engineering_spark.operators.lm import pmi_collocations

    # "new york" always adjacent (strong collocation); "a b" weak filler.
    texts = ["new york a b"] * 3 + ["a new b york a b"]
    df = _pmi_docs(spark, texts)
    rows = {
        (r.w1, r.w2): r
        for r in pmi_collocations(df, "text", min_count=3, k=10).collect()
    }
    ny = rows[("new", "york")]
    # unigrams: new=4, york=4, a=5, b=5 -> Nu=18; bigrams total Nb=14,
    # c(new,york)=3.
    assert (ny.c_bigram, ny.c_w1, ny.c_w2) == (3, 4, 4)
    expect = (
        math.log(3 / 14) - math.log(4 / 18) - math.log(4 / 18)
    )
    assert ny.pmi == pytest.approx(expect, abs=1e-6)
    assert ny.npmi == pytest.approx(expect / -math.log(3 / 14), abs=1e-6)
    # min_count=3 drops every pair seen fewer than 3 times
    assert all(r.c_bigram >= 3 for r in rows.values())


def test_pmi_collocations_ranking_total_order(spark):
    from home_credit_data_engineering_spark.operators.lm import pmi_collocations

    df = _pmi_docs(spark, ["x y x y x y", "p q p q p q"])
    got = pmi_collocations(df, "text", min_count=2, k=2).collect()
    assert len(got) == 2
    # equal PMI -> (w1, w2) ascending tie-break
    pmis = [r.pmi for r in got]
    if pmis[0] == pmis[1]:
        assert (got[0].w1, got[0].w2) < (got[1].w1, got[1].w2)


def test_pmi_collocations_adjacent_only_and_validation(spark):
    from home_credit_data_engineering_spark.operators.lm import pmi_collocations

    # "x z" never adjacent (always separated by y) -> absent
    df = _pmi_docs(spark, ["x y z"] * 5)
    pairs = {
        (r.w1, r.w2)
        for r in pmi_collocations(df, "text", min_count=1, k=50).collect()
    }
    assert pairs == {("x", "y"), ("y", "z")}
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(df, "text", min_count=0)
    with pytest.raises(ValueError, match="k"):
        pmi_collocations(df, "text", k=0)


def test_pmi_collocations_blank_and_single_token_docs(spark):
    from home_credit_data_engineering_spark.operators.lm import pmi_collocations

    df = _pmi_docs(spark, ["", "   ", "solo", "a b", "a b"])
    rows = pmi_collocations(df, "text", min_count=2, k=10).collect()
    assert [(r.w1, r.w2, r.c_bigram) for r in rows] == [("a", "b", 2)]
