"""Multinomial Naive Bayes (operators/classify.py): python-reference
equality (train + score + argmax), OOV handling on unseen text, and
determinism guards."""

from __future__ import annotations

import math

import pytest

from home_credit_data_engineering_spark.operators.classify import (
    nb_predict,
    nb_score,
    nb_train,
)

TRAIN = [
    (1, "en", "the cat sat on the mat"),
    (2, "en", "a dog is in the garden"),
    (3, "en", "the birds sing a song"),
    (4, "de", "der hund ist in dem garten"),
    (5, "de", "die katze ist nicht der hund"),
    (6, "de", "das lied und der vogel"),
]


def _py_nb(train, alpha=0.5):
    from collections import Counter, defaultdict

    cnt = defaultdict(Counter)
    dcnt = Counter()
    for _, label, text in train:
        dcnt[label] += 1
        for t in text.split():
            cnt[label][t] += 1
    vocab = sorted({t for c in cnt.values() for t in c})
    v = len(vocab)
    nd = sum(dcnt.values())
    model = {}
    for label, c in cnt.items():
        t = sum(c.values())
        model[label] = {
            "prior": round(math.log(dcnt[label] / nd), 9),
            "logp": {
                tok: round(math.log((c[tok] + alpha) / (t + alpha * v)), 9)
                for tok in vocab
            },
            "oov": round(math.log(alpha / (t + alpha * v)), 9),
        }
    return model, set(vocab)


def _py_score(model, vocab, text):
    out = {}
    toks = text.split()
    for label, m in model.items():
        s = m["prior"]
        for t in toks:
            s += m["logp"][t] if t in vocab else m["oov"]
        out[label] = round(s, 9)
    return out


def test_nb_matches_python_reference(spark):
    df = spark.createDataFrame(TRAIN, "doc_id long, lang string, text string")
    model = nb_train(df, "lang", "text", alpha=0.5)
    ref_model, vocab = _py_nb(TRAIN)

    got = {
        (r["doc_id"], r["label"]): float(r["score"])
        for r in nb_score(df, model, "doc_id", "text").collect()
    }
    for doc_id, _, text in TRAIN:
        want = _py_score(ref_model, vocab, text)
        for label, s in want.items():
            assert got[(doc_id, label)] == pytest.approx(s, abs=1e-9)

    preds = {
        r["doc_id"]: r["pred"]
        for r in nb_predict(df, model, "doc_id", "text").collect()
    }
    for doc_id, _, text in TRAIN:
        want = _py_score(ref_model, vocab, text)
        best = min(sorted(want), key=lambda l: (-want[l], l))
        assert preds[doc_id] == best
    # self-classification on separable data recovers the labels
    assert preds == {i: label for i, label, _ in TRAIN}


def test_nb_scores_unseen_text_with_oov_floor(spark):
    df = spark.createDataFrame(TRAIN, "doc_id long, lang string, text string")
    model = nb_train(df, "lang", "text", alpha=0.5)
    new = spark.createDataFrame(
        [
            (100, "the cat zzz qqq www"),       # 2 in-vocab en + 3 OOV
            (101, "der hund xxx"),               # de evidence + 1 OOV
            (102, "zzz qqq zzz"),                # ALL-OOV (VERDICT r6 #1)
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["pred"], r["n_tokens"])
        for r in nb_predict(new, model, "doc_id", "text").collect()
    }
    assert out[100][0] == "en" and out[100][1] == 5
    assert out[101][0] == "de" and out[101][1] == 3
    # the all-OOV doc must NOT vanish: it scores logprior + 3*oov_logp
    # per label and predicts deterministically
    assert 102 in out and out[102][1] == 3

    ref_model, vocab = _py_nb(TRAIN)
    got = {
        (r["doc_id"], r["label"]): float(r["score"])
        for r in nb_score(new, model, "doc_id", "text").collect()
    }
    cases = [
        (100, "the cat zzz qqq www"),
        (101, "der hund xxx"),
        (102, "zzz qqq zzz"),
    ]
    for doc_id, text in cases:
        want = _py_score(ref_model, vocab, text)
        for label, s in want.items():
            assert got[(doc_id, label)] == pytest.approx(s, abs=1e-9)
    # argmax over the floor scores matches the python reference too
    want102 = _py_score(ref_model, vocab, "zzz qqq zzz")
    best102 = min(sorted(want102), key=lambda l: (-want102[l], l))
    assert out[102][0] == best102


def test_nb_guards(spark):
    df = spark.createDataFrame(TRAIN, "doc_id long, lang string, text string")
    with pytest.raises(ValueError, match="alpha"):
        nb_train(df, "lang", "text", alpha=0)


# ---------------------------------------------------------------------------
# token_label_association (chi-square / log-odds feature selection)
# ---------------------------------------------------------------------------


def _assoc_docs(spark, rows):
    return spark.createDataFrame(rows, schema="label string, text string")


def test_token_label_chi2_hand_computed(spark):
    import math

    from home_credit_data_engineering_spark.operators.classify import (
        token_label_association,
    )

    # 'hola' exclusive to es, 'the' exclusive to en, 'x' shared evenly.
    df = _assoc_docs(
        spark,
        [("en", "the x"), ("en", "the x"), ("es", "hola x"), ("es", "hola x")],
    )
    rows = {
        (r.label, r.token): r
        for r in token_label_association(
            df, "label", "text", min_count=1, k_per_label=10
        ).collect()
    }
    # N=8 occurrences, N_en=4, c(the)=2, c(the,en)=2:
    # a=2 b=0 c=2 d=4 -> chi2 = 8*(2*4-0*2)^2/(2*6*4*4) = 512/192 = 8/3
    r = rows[("en", "the")]
    assert (r.c_tl, r.c_t) == (2, 2)
    assert r.chi2 == pytest.approx(8 / 3, abs=1e-6)
    assert r.log_odds == pytest.approx(
        math.log((2.5 * 4.5) / (0.5 * 2.5)), abs=1e-6
    )
    # shared token: a=1... per label 'x': a=2,b=2,c=2,d=2 -> chi2=0
    assert rows[("en", "x")].chi2 == 0.0
    assert rows[("es", "x")].chi2 == 0.0
    # exclusive tokens rank first in their label
    assert rows[("en", "the")].rank == 1
    assert rows[("es", "hola")].rank == 1


def test_token_label_assoc_min_count_and_k(spark):
    from home_credit_data_engineering_spark.operators.classify import (
        token_label_association,
    )

    df = _assoc_docs(spark, [("a", "p p p q"), ("b", "r r r q")])
    out = token_label_association(
        df, "label", "text", min_count=3, k_per_label=1
    ).collect()
    # q (count 2) filtered by min_count; one row per label survives k=1
    toks = {(r.label, r.token) for r in out}
    assert toks == {("a", "p"), ("b", "r")}
    assert all(r.rank == 1 for r in out)


def test_token_label_assoc_validation(spark):
    from home_credit_data_engineering_spark.operators.classify import (
        token_label_association,
    )

    df = _assoc_docs(spark, [("a", "x")])
    with pytest.raises(ValueError, match="min_count"):
        token_label_association(df, "label", "text", min_count=0)
    with pytest.raises(ValueError, match="k_per_label"):
        token_label_association(df, "label", "text", k_per_label=0)


def test_token_label_counts_merge_equals_full(spark):
    from home_credit_data_engineering_spark.operators.classify import (
        merge_token_label_counts,
        token_label_association,
        token_label_association_from_counts,
        token_label_counts,
    )

    rows = [
        ("en", "the cat the dog"), ("en", "the bird"),
        ("de", "der hund der"), ("de", "die katze"),
    ]
    schema = "label string, text string"
    full = spark.createDataFrame(rows, schema)
    d1 = spark.createDataFrame(rows[:2], schema)
    d2 = spark.createDataFrame(rows[2:], schema)
    merged = merge_token_label_counts(
        token_label_counts(d1, "label"), token_label_counts(d2, "label")
    )
    got = {
        (r.label, r.token): (r.c_tl, r.c_t, r.chi2, r.log_odds, r.rank)
        for r in token_label_association_from_counts(
            merged, min_count=1, k_per_label=50
        ).collect()
    }
    expect = {
        (r.label, r.token): (r.c_tl, r.c_t, r.chi2, r.log_odds, r.rank)
        for r in token_label_association(
            full, "label", "text", min_count=1, k_per_label=50
        ).collect()
    }
    assert got == expect and got
