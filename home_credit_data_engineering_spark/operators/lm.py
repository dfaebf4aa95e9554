"""Corpus language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", arXiv:1911.00359).

Production CCNet scores documents with a 5-gram KenLM trained on
Wikipedia; the KenLM artifact and its tokenizer are external binaries.
What belongs in the ENGINE is the distributed shape of the computation:
train token statistics over one corpus, score every document of another
(or the same) corpus by mean log-probability, and bucket the result into
head/middle/tail for mixture construction. This module implements that
shape with an additively-smoothed unigram model — fully engine-portable
(counts + one ln per vocab row), exactly the plan a KenLM-backed variant
would use with a different per-token score column.

Scale posture (100 TB): token statistics are one hash-aggregate with
map-side partial combine ((doc, token) pairs first, so a token repeated
1000x in one document contributes ONE row to the token shuffle); the
score join is an equi-join on token between the pair table and the
aggregated vocabulary (1 row per distinct token — the build side of any
skew-split AQE performs); the per-document reduce is a second hash
aggregate. No window spans more than one document, nothing collects to
the driver, and no Python runs.

Float discipline (cross-engine oracle): per-token log-probabilities are
rounded to 9 decimals and accumulated as DECIMAL(28,9) — exact,
order-independent sums (the `_stable.py` rule) — so the only
engine-library float ops are one ln per vocab row and one exp per
document, each on bit-identical inputs. Reference for the quality-filter
family it joins: /root/reference/spark/gold/processor.py:81-88 keeps
aggregate-threshold flags; this is the corpus-level analogue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from home_credit_data_engineering_spark.functions.text import tokens

__all__ = [
    "train_unigram_lm",
    "unigram_count_state",
    "merge_unigram_counts",
    "unigram_lm_from_counts",
    "lm_perplexity",
    "stupid_backoff_perplexity",
    "perplexity_buckets",
    "perplexity_buckets_approx",
    "corpus_divergence",
]

#: Decimal type of a per-token log-probability: 9 fractional digits
#: (matches the per-token rounding). Kept at precision 18 so the
#: count-weighted product decimal(10,0) x decimal(18,9) ->
#: decimal(29,9) stays EXACT under Spark's 38-digit cap (a wider type
#: would silently truncate the product scale). The sum then widens to
#: decimal(38,9) — order-independent exact accumulation.
_ACC = "decimal(18,9)"


def _doc_token_counts(
    df: DataFrame, id_col: str, text_col: str | Column
) -> DataFrame:
    """(doc_id, __tok, __cnt) — one row per distinct token per document.

    The pre-aggregation that makes everything downstream cheap: repeated
    tokens collapse before any token-keyed shuffle, and the per-document
    reduce can weight by ``__cnt`` instead of re-touching raw tokens.
    """
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(text_col)).alias("__tok"),
        )
        .filter(F.length("__tok") > 0)
        .groupBy("doc_id", "__tok")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )


def unigram_count_state(
    df: DataFrame, id_col: str, text_col: str | Column
) -> DataFrame:
    """(token, c) — the mergeable sufficient statistic of the unigram
    model. Persist it with ``write_parquet`` and the daily refresh is
    O(delta): count the NEW batch only and :func:`merge_unigram_counts`
    — never rescan the corpus to retrain the quality LM (same contract
    as ``operators/spans.py:window_hash_state`` and
    ``minhash_incremental_pairs``)."""
    return (
        _doc_token_counts(df, id_col, text_col)
        .groupBy("__tok")
        .agg(F.sum("__cnt").alias("c"))
        .select(F.col("__tok").alias("token"), "c")
    )


def merge_unigram_counts(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two (token, c) count tables — counts are a sum monoid, so
    full-corpus counts ≡ merge(history state, delta counts) exactly."""
    return (
        state.unionByName(delta)
        .groupBy("token")
        .agg(F.sum("c").alias("c"))
    )


def unigram_lm_from_counts(counts: DataFrame, alpha: float = 0.5) -> DataFrame:
    """(token, logp) from a (token, c) count table — the smoothing/log
    step of :func:`train_unigram_lm`, split out so incrementally
    maintained counts produce the IDENTICAL model as full retraining."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (unseen mass), got {alpha}")
    totals = counts.agg(
        F.sum("c").alias("__t"), F.count(F.lit(1)).alias("__v")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "token",
        F.round(
            F.log(
                (F.col("c") + F.lit(alpha))
                / (F.col("__t") + F.lit(alpha) * F.col("__v"))
            ),
            9,
        )
        .cast(_ACC)
        .alias("logp"),
    )


def train_unigram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str | Column,
    alpha: float = 0.5,
) -> DataFrame:
    """(token, logp) — additively-smoothed unigram log-probabilities.

    ``p(t) = (c(t) + alpha) / (T + alpha * V)`` over whitespace tokens of
    the training corpus (T = total tokens, V = vocabulary size). ``logp``
    is ``ln p(t)`` rounded to 9 decimals (see module float discipline).

    The totals ride a broadcast single-row cross join, not a driver
    collect — the whole model stays a lazy DataFrame that can be
    persisted with ``write_parquet`` and served later. For incremental
    maintenance persist :func:`unigram_count_state` instead and derive
    the model with :func:`unigram_lm_from_counts`.
    """
    return unigram_lm_from_counts(
        unigram_count_state(df, id_col, text_col), alpha=alpha
    )


def lm_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str | Column,
    alpha: float = 0.5,
    model: DataFrame | None = None,
    unseen_logp: float | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, ppl) — per-document unigram perplexity.

    ``ppl = exp(-sum(c_doc(t) * logp(t)) / n_tokens)`` — lower is more
    fluent/typical relative to the training corpus; boilerplate and
    gibberish land in the tail. With ``model=None`` the model is trained
    on ``df`` itself (every token is in-vocabulary by construction —
    the self-scoring CCNet setup). Pass a persisted ``(token, logp)``
    frame to score against an external corpus; tokens absent from it
    get ``unseen_logp`` (required in that case — by convention the
    model's smoothed floor ``ln(alpha / (T + alpha * V))``).

    ``ppl`` is rounded to 4 decimals. Join strategy note: the model side
    is 1 row per distinct token, so hot tokens ("the") skew only the
    probe side — AQE's skew-join split handles that without salting.
    """
    doc_tok = _doc_token_counts(df, id_col, text_col)
    if model is None:
        model = train_unigram_lm(df, id_col, text_col, alpha=alpha)
        joined = doc_tok.join(
            model.select(F.col("token").alias("__tok"), "logp"), "__tok"
        )
    else:
        if unseen_logp is None:
            raise ValueError(
                "scoring against an external model needs unseen_logp "
                "(the smoothed out-of-vocabulary floor)"
            )
        joined = doc_tok.join(
            model.select(F.col("token").alias("__tok"), "logp"),
            "__tok",
            "left",
        ).withColumn(
            "logp",
            F.coalesce(
                F.col("logp"),
                F.lit(round(unseen_logp, 9)).cast(_ACC),
            ),
        )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("__cnt").alias("n_tokens"),
            # decimal(10,0) x decimal(18,9) -> decimal(29,9): exact
            F.sum(
                F.col("__cnt").cast("decimal(10,0)") * F.col("logp")
            ).alias("__ll"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(
                F.exp(
                    -(F.col("__ll").cast("double"))
                    / F.col("n_tokens").cast("double")
                ),
                4,
            ).alias("ppl"),
        )
    )


def stupid_backoff_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str | Column,
    backoff: float = 0.4,
) -> DataFrame:
    """(doc_id, n_tokens, ppl) under corpus-trained bigram Stupid
    Backoff (Brants et al., "Large Language Models in Machine
    Translation", EMNLP 2007 — the distributed count-based LM):

    - ``S(v | u) = f(uv) / f(u)`` when the bigram was seen, else
      ``backoff * S(v)`` with ``S(v) = f(v) / N`` (raw relative
      frequencies — Stupid Backoff deliberately skips normalization;
      that is what makes it computable as pure distributed counts);
    - a document's first token scores ``S(w1)``; perplexity is
      ``exp(-mean log S)`` over all positions.

    Distributed shape: one ``lag()`` window per document builds the
    (prev, token) event stream; per-(doc, prev, token) pre-aggregation
    collapses repeats before any corpus-level shuffle; bigram and
    unigram count tables come off that same stream; scoring is two
    equi-joins (bigram pair, unigram) against 1-row-per-key count
    tables. Same exact-decimal accumulation discipline as
    :func:`lm_perplexity`.

    Scale note: the bigram shuffles carry token-pair STRINGS (what keeps
    this exactly SQL-oracle-able); at the 100 TB tier substitute
    ``xxhash64(prev, token)`` join keys the way the dedup surface pairs
    every xxhash fast path with an md5 oracle twin — the score
    arithmetic is unchanged, only the join key narrows to 8 bytes.
    """
    from pyspark.sql.window import Window as W

    if not 0 < backoff <= 1:
        raise ValueError(f"backoff must be in (0, 1], got {backoff}")
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens(text_col)).alias("__pos", "__tok"),
        )
        .filter(F.length("__tok") > 0)
    )
    w = W.partitionBy("doc_id").orderBy("__pos")
    ev = toks.select(
        "doc_id", F.lag("__tok").over(w).alias("__prev"), "__tok"
    )
    # every token occurrence is exactly one (prev, token) event, so the
    # per-(doc, prev, token) counts reconstruct unigram totals too
    doc_ev = ev.groupBy("doc_id", "__prev", "__tok").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    uni = doc_ev.groupBy("__tok").agg(F.sum("__cnt").alias("__c"))
    tot = uni.agg(F.sum("__c").alias("__nn"))
    big = (
        doc_ev.filter(F.col("__prev").isNotNull())
        .groupBy("__prev", "__tok")
        .agg(F.sum("__cnt").alias("__cuv"))
    )
    scored = (
        doc_ev.join(
            uni.withColumnRenamed("__c", "__cv").crossJoin(F.broadcast(tot)),
            "__tok",
        )
        .join(
            uni.select(
                F.col("__tok").alias("__prev"), F.col("__c").alias("__cu")
            ),
            "__prev",
            "left",
        )
        .join(big, ["__prev", "__tok"], "left")
    )
    s_uni = F.log(F.col("__cv") / F.col("__nn"))
    logp = F.round(
        F.when(F.col("__prev").isNull(), s_uni)
        .when(
            F.col("__cuv").isNotNull(), F.log(F.col("__cuv") / F.col("__cu"))
        )
        .otherwise(F.log(F.lit(float(backoff))) + s_uni),
        9,
    ).cast(_ACC)
    return (
        scored.select("doc_id", "__cnt", logp.alias("__logp"))
        .groupBy("doc_id")
        .agg(
            F.sum("__cnt").alias("n_tokens"),
            F.sum(F.col("__cnt").cast("decimal(10,0)") * F.col("__logp")).alias(
                "__ll"
            ),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(
                F.exp(
                    -(F.col("__ll").cast("double"))
                    / F.col("n_tokens").cast("double")
                ),
                4,
            ).alias("ppl"),
        )
    )


def ngram_backoff_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str | Column,
    order: int = 3,
    backoff: float = 0.4,
) -> DataFrame:
    """(doc_id, n_tokens, ppl) under ``order``-gram Stupid Backoff — the
    general form of :func:`stupid_backoff_perplexity` (Brants et al.
    EMNLP 2007 is an n-gram method; CCNet's KenLM runs 5-gram):

    ``S(w | ctx_k) = f(ctx_k·w) / f(ctx_k)`` for the longest seen
    ``k``-gram context, each back-off step multiplying ``backoff``
    (relative frequencies, deliberately unnormalized — that is what
    keeps the model pure distributed counts). A position with only
    ``m < order-1`` preceding tokens scores from the ``(m+1)``-gram
    down. ``order=2`` is bit-identical to the bigram operator.

    Distributed shape: ONE window ( ``order-1`` lag() columns off the
    same sorted run) builds the event stream; per-(doc, context, token)
    pre-aggregation; ALL ``order`` count tables come off that one
    pre-aggregated stream (the k-gram ending at a position is its last
    ``k`` event columns, so no second corpus pass); scoring is a chain
    of ``2(order-1)`` equi-joins against 1-row-per-key count tables,
    each join key the gram string tuple. The join chain stays FLAT in
    corpus size — count tables shrink relative to events as k grows
    only the cardinality changes — and the same exact-decimal logp
    accumulation makes it SQL-oracle verifiable. Same hashed-join-key
    scale note as the bigram form (``xxhash64(ctx)`` narrows keys to 8
    bytes at the 100 TB tier; score arithmetic unchanged).
    """
    from pyspark.sql.window import Window as W

    if not 0 < backoff <= 1:
        raise ValueError(f"backoff must be in (0, 1], got {backoff}")
    if not 2 <= order <= 6:
        raise ValueError(f"order must be in [2, 6], got {order}")
    n = order
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("__pos", "__tok"),
    ).filter(F.length("__tok") > 0)
    w = W.partitionBy("doc_id").orderBy("__pos")
    prevs = [f"__p{i}" for i in range(1, n)]  # __p1 = previous token, ...
    ev = toks.select(
        "doc_id",
        *[F.lag("__tok", i).over(w).alias(f"__p{i}") for i in range(1, n)],
        "__tok",
    )
    doc_ev = ev.groupBy("doc_id", *prevs, "__tok").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    grams: dict[int, DataFrame] = {
        1: doc_ev.groupBy("__tok").agg(F.sum("__cnt").alias("__c1"))
    }
    for k in range(2, n + 1):
        cols = [f"__p{i}" for i in range(k - 1, 0, -1)] + ["__tok"]
        grams[k] = (
            doc_ev.filter(F.col(f"__p{k-1}").isNotNull())
            .groupBy(*cols)
            .agg(F.sum("__cnt").alias(f"__c{k}"))
        )
    tot = grams[1].agg(F.sum("__c1").alias("__nn"))
    scored = doc_ev.join(grams[1], "__tok").crossJoin(F.broadcast(tot))
    for k in range(2, n + 1):
        keys = [f"__p{i}" for i in range(k - 1, 0, -1)] + ["__tok"]
        scored = scored.join(grams[k], keys, "left")
        # context count f(ctx_{k-1}) = the (k-1)-gram table with its
        # columns shifted one position into the past
        if k == 2:
            ctx = grams[1].select(
                F.col("__tok").alias("__p1"), F.col("__c1").alias("__x2")
            )
        else:
            ctx = grams[k - 1].select(
                *[
                    F.col(f"__p{i}").alias(f"__p{i+1}")
                    for i in range(k - 2, 0, -1)
                ],
                F.col("__tok").alias("__p1"),
                F.col(f"__c{k-1}").alias(f"__x{k}"),
            )
        scored = scored.join(
            ctx, [f"__p{i}" for i in range(k - 1, 0, -1)], "left"
        )
    avail = None
    for m in range(n - 1, 0, -1):
        cond = F.col(f"__p{m}").isNotNull()
        avail = (
            F.when(cond, m) if avail is None else avail.when(cond, m)
        )
    avail = avail.otherwise(0)
    log_b = F.log(F.lit(float(backoff)))
    expr = None
    for k in range(n, 1, -1):
        s_k = F.log(F.col(f"__c{k}").cast("double") / F.col(f"__x{k}"))
        branch = (avail + 1 - k).cast("double") * log_b + s_k
        cond = F.col(f"__c{k}").isNotNull()
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    s_1 = F.log(F.col("__c1").cast("double") / F.col("__nn"))
    expr = expr.otherwise(avail.cast("double") * log_b + s_1)
    logp = F.round(expr, 9).cast(_ACC)
    return (
        scored.select("doc_id", "__cnt", logp.alias("__logp"))
        .groupBy("doc_id")
        .agg(
            F.sum("__cnt").alias("n_tokens"),
            F.sum(
                F.col("__cnt").cast("decimal(10,0)") * F.col("__logp")
            ).alias("__ll"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(
                F.exp(
                    -(F.col("__ll").cast("double"))
                    / F.col("n_tokens").cast("double")
                ),
                4,
            ).alias("ppl"),
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    n_buckets: int = 3,
    ppl_col: str = "ppl",
    id_col: str = "doc_id",
) -> DataFrame:
    """Add CCNet's head/middle/tail split: ``bucket`` = NTILE over
    ascending perplexity (1 = head = most fluent), ties broken by
    ``id_col`` so the split is deterministic and engine-portable.

    NTILE is a GLOBAL-sort window: every (already-reduced, one row per
    document) score lands on one task. That is the oracle-exact twin,
    acceptable into the tens of millions of documents; the production
    path at corpus scale is :func:`perplexity_buckets_approx`, which
    buckets by sketched percentile thresholds with no global sort —
    the same exact-twin / scale-path split the md5-vs-xxhash dedup
    surface uses.
    """
    from pyspark.sql.window import Window as W

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    w = W.orderBy(F.col(ppl_col).asc(), F.col(id_col).asc())
    return scored.withColumn("bucket", F.ntile(n_buckets).over(w))


def perplexity_buckets_approx(
    scored: DataFrame,
    n_buckets: int = 3,
    ppl_col: str = "ppl",
    accuracy: int = 10_000,
) -> DataFrame:
    """Scale path for the head/middle/tail split: thresholds from one
    ``percentile_approx`` aggregate (a mergeable KLL-style sketch),
    broadcast back, bucket = 1 + #thresholds strictly below the score.

    No global sort, no single-task window — the only all-to-one step is
    the sketch merge (bytes, not rows). Buckets agree with the exact
    NTILE split except for documents whose score ties or falls within
    the sketch's rank-error band of a boundary; sizes are approximately
    equal rather than exactly balanced.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if n_buckets == 1:
        return scored.withColumn("bucket", F.lit(1))
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    thresholds = scored.agg(
        F.percentile_approx(
            ppl_col, F.array(*[F.lit(f) for f in fracs]), accuracy
        ).alias("__th")
    )
    ppl = F.col(ppl_col)
    bucket = (
        F.lit(1)
        + F.size(F.filter(F.col("__th"), lambda t: ppl > t))
    ).cast("int")
    return (
        scored.join(F.broadcast(thresholds))
        .withColumn("bucket", bucket)
        .drop("__th")
    )


def corpus_divergence(
    df: DataFrame,
    text_col: str | Column,
    split_col: str,
    a_value: str,
    b_value: str,
    alpha: float = 1.0,
) -> DataFrame:
    """Distribution drift between two sub-corpora: cross-entropy, both
    KL directions, and a Jensen-Shannon-style symmetric divergence over
    whitespace-token unigram distributions — the mixture-tuning /
    domain-shift diagnostic a training-data pipeline runs before
    blending sources (is src_new's token distribution close enough to
    the reference corpus? how much does each language shift the mix?).

    Definitions (A = rows with ``split_col == a_value``, B likewise;
    ``c_A(t)``/``T_A`` raw counts/totals, ``V`` the union vocabulary,
    smoothed models ``p̂_X(t) = (c_X(t)+alpha)/(T_X+alpha*V)``):

    * ``ce_ab   = -(1/T_A) * Σ_t c_A(t) * ln p̂_B(t)`` — cross-entropy
      of corpus A under B's smoothed model (``exp(ce_ab)`` is A's
      perplexity under B);
    * ``kl_ab   =  (1/T_A) * Σ_t c_A(t) * (ln p̂_A - ln p̂_B)`` (and
      ``kl_ba`` symmetrically);
    * ``js      =  0.5*(1/T_A)*Σ c_A*(ln p̂_A - ln m̂)
                 + 0.5*(1/T_B)*Σ c_B*(ln p̂_B - ln m̂)`` with
      ``m̂ = (p̂_A + p̂_B)/2`` — bounded, symmetric, 0 iff identical.

    Output: one row ``(tokens_a, tokens_b, vocab, ce_ab, kl_ab, kl_ba,
    js)``, divergences rounded to 6.

    Cross-engine exactness (the module's float discipline): every ln is
    rounded to 9 and accumulated count-weighted as exact decimals
    (order-independent); each output is one fixed double formula over
    those exact sums, rounded to 6 — so a DuckDB twin writing the same
    text is hash-identical modulo sub-rounding libm drift (the
    ``text_lm_perplexity`` precedent).

    100 TB posture: one token-keyed hash aggregate over (split, token)
    pairs — pre-aggregated per document first would change nothing
    semantically; counts collapse map-side — then a vocab-sized frame
    carrying six decimal sums through ONE 1-row aggregate. Totals ride
    a broadcast cross join; nothing collects.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    toks = (
        df.filter(F.col(split_col).isin(a_value, b_value))
        .select(
            F.col(split_col).alias("__s"),
            F.explode(tokens(text_col)).alias("__tok"),
        )
        .filter(F.length("__tok") > 0)
    )
    vocab = toks.groupBy("__tok").agg(
        F.sum(F.when(F.col("__s") == a_value, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("__s") == b_value, 1).otherwise(0)).alias("cb"),
    )
    totals = vocab.agg(
        F.sum("ca").alias("__ta"),
        F.sum("cb").alias("__tb"),
        F.count(F.lit(1)).alias("__v"),
    )
    pa = (F.col("ca") + F.lit(alpha)) / (
        F.col("__ta") + F.lit(alpha) * F.col("__v")
    )
    pb = (F.col("cb") + F.lit(alpha)) / (
        F.col("__tb") + F.lit(alpha) * F.col("__v")
    )
    la = F.round(F.log(pa), 9).cast(_ACC)
    lb = F.round(F.log(pb), 9).cast(_ACC)
    lm_ = F.round(F.log((pa + pb) / 2), 9).cast(_ACC)
    sums = (
        vocab.crossJoin(F.broadcast(totals))
        .select(
            "ca",
            "cb",
            (F.col("ca").cast("decimal(12,0)") * la).alias("__saa"),
            (F.col("ca").cast("decimal(12,0)") * lb).alias("__sab"),
            (F.col("cb").cast("decimal(12,0)") * lb).alias("__sbb"),
            (F.col("cb").cast("decimal(12,0)") * la).alias("__sba"),
            (F.col("ca").cast("decimal(12,0)") * lm_).alias("__sam"),
            (F.col("cb").cast("decimal(12,0)") * lm_).alias("__sbm"),
        )
        .agg(
            F.sum("ca").alias("tokens_a"),
            F.sum("cb").alias("tokens_b"),
            F.count(F.lit(1)).alias("vocab"),
            F.sum("__saa").alias("saa"),
            F.sum("__sab").alias("sab"),
            F.sum("__sbb").alias("sbb"),
            F.sum("__sba").alias("sba"),
            F.sum("__sam").alias("sam"),
            F.sum("__sbm").alias("sbm"),
        )
    )
    ta = F.col("tokens_a").cast("double")
    tb = F.col("tokens_b").cast("double")
    return sums.select(
        F.col("tokens_a").cast("bigint").alias("tokens_a"),
        F.col("tokens_b").cast("bigint").alias("tokens_b"),
        "vocab",
        F.round(-F.col("sab").cast("double") / ta, 6).alias("ce_ab"),
        F.round(
            (F.col("saa") - F.col("sab")).cast("double") / ta, 6
        ).alias("kl_ab"),
        F.round(
            (F.col("sbb") - F.col("sba")).cast("double") / tb, 6
        ).alias("kl_ba"),
        F.round(
            F.lit(0.5) * (F.col("saa") - F.col("sam")).cast("double") / ta
            + F.lit(0.5) * (F.col("sbb") - F.col("sbm")).cast("double") / tb,
            6,
        ).alias("js"),
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual information
    (the word2phrase / Mikolov et al. 2013 phrase-mining statistic).

    Output: ``(w1, w2, c_bigram, c_w1, c_w2, pmi, npmi)`` — the ``k``
    highest-PMI adjacent token pairs with corpus bigram count >=
    ``min_count``, ties broken ``(w1, w2)`` ascending so the ranking is
    a total order. With unigram totals ``Nu`` and bigram totals ``Nb``::

        pmi  = ln(c12/Nb) - ln(c1/Nu) - ln(c2/Nu)
        npmi = pmi / -ln(c12/Nb)            (normalized to [-1, 1])

    both ``round(·, 6)`` — the three-ln form keeps every operand well
    inside double range at any corpus size (no count products), and the
    pinned operand order makes both engines produce the identical
    double before rounding.

    Scale: the bigram stream is built JVM-side from the token array
    (``transform`` over a slice — no window, no Python, no per-doc
    state) and immediately hash-aggregated with map-side combine, so
    the shuffle carries (w1, w2, count) triples bounded by the bigram
    vocabulary, not the corpus. The ``min_count`` filter applies before
    the unigram joins; unigram counts join on each side of the pair
    (broadcast when small, shuffle joins on the bigram-vocab frame
    otherwise); totals ride as 1-row cross joins. Top-k is
    TakeOrderedAndProject, never a full sort.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = docs.select(tokens(text_col).alias("__toks")).filter(
        F.length(F.trim(F.col(text_col))) > 0
    )
    uni = (
        toks.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(slice(__toks, 1, size(__toks) - 1),"
                    " (t, i) -> struct(t AS w1, __toks[i + 1] AS w2))"
                )
            ).alias("__bg")
        )
        .select("__bg.w1", "__bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_bigram"))
    )
    nu = uni.agg(F.sum("c").alias("__nu"))
    nb = bi.agg(F.sum("c_bigram").alias("__nb"))
    scored = (
        bi.filter(F.col("c_bigram") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_w2")), "w2")
        .join(F.broadcast(nu), how="cross")
        .join(F.broadcast(nb), how="cross")
    )
    p12 = F.log(F.col("c_bigram").cast("double") / F.col("__nb"))
    pmi_raw = (
        p12
        - F.log(F.col("c_w1").cast("double") / F.col("__nu"))
        - F.log(F.col("c_w2").cast("double") / F.col("__nu"))
    )
    out = scored.select(
        "w1",
        "w2",
        "c_bigram",
        "c_w1",
        "c_w2",
        F.round(pmi_raw, 6).alias("pmi"),
        # npmi is pmi / -ln(p12); when the pair is the ONLY bigram
        # (p12 = 1, ln = 0) the limit is 1 — the standard convention.
        F.when(F.col("c_bigram") == F.col("__nb"), F.lit(1.0))
        .otherwise(F.round(pmi_raw / -p12, 6))
        .alias("npmi"),
    )
    return out.orderBy(F.col("pmi").desc(), F.col("w1"), F.col("w2")).limit(k)
