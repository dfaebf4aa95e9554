"""Exact-substring (span-level) deduplication.

Whole-document dedup (exact / MinHash / SimHash — ``operators/dedup.py``)
misses the dominant contamination mode in web-scale LLM corpora:
*passages* duplicated across otherwise-distinct documents (boilerplate,
licenses, quoted news wire). Lee et al., "Deduplicating Training Data
Makes Language Models Better" (arXiv:2107.06499) remove every substring
of >= 50 tokens that appears more than once in the corpus, using a
suffix array — a data structure with no distributed analogue at 100 TB.

This module re-expresses the operator Spark-first at *window*
granularity: a ``k``-token sliding window is duplicated iff its content
occurs more than once in the corpus (in another document or at another
position of the same document); maximal runs of consecutive duplicated
windows merge into spans. Any duplicated substring of >= k tokens is
covered by a maximal span, and every reported span is genuinely
duplicated text — the same guarantee direction as winnowing
(``dedup.py:winnowing_fingerprints``) but with exact span *boundaries*,
which is what the removal stage needs.

Plan shape (all whole-stage-codegen, no Python):

1. ``kgram_hash_stream`` — posexplode → per-token hash → lead()-combined
   window hash (one shuffle, on doc_id, hash+position only);
2. duplicated-hash set — hash-aggregate ``count > 1`` on the 8-byte
   window hash (one shuffle, map-side partial combine);
3. left-semi join windows → duplicated hashes (shuffle on the hash;
   ids+positions only, never text);
4. islands: ``pos - row_number() over (doc_id order by pos)`` groups
   consecutive duplicated positions; min/max per island → span (one
   shuffle on doc_id).

At 100 TB nothing but (doc_id, pos, hash8) ever rides a shuffle, and
step 2's partial aggregation collapses the long tail of unique windows
map-side. The reference has no counterpart operator (its dedup surface
is dropDuplicates-style exact matching only — see SURVEY §2.5 / A7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

from home_credit_data_engineering_spark.functions.text import tokens
from home_credit_data_engineering_spark.operators.dedup import kgram_hash_stream

__all__ = [
    "duplicated_spans",
    "duplicated_spans_md5",
    "strip_spans",
    "window_hash_state",
    "incremental_spans",
    "contaminated_spans",
]


def _spans_from_windows(hits: DataFrame, k: int) -> DataFrame:
    """(doc_id, __pos) of duplicated windows → maximal merged spans.

    Consecutive window positions overlap (windows at p and p+1 share
    k-1 tokens), so a run of duplicated positions [p1..p2] certifies one
    duplicated token span [p1, p2+k-1]. Runs are grouped with the
    islands-and-gaps trick; the group key is position minus rank, which
    is constant exactly on consecutive runs.
    """
    w = W.partitionBy("doc_id").orderBy("__pos")
    islands = hits.select(
        "doc_id",
        "__pos",
        (F.col("__pos") - F.row_number().over(w)).alias("__island"),
    )
    return (
        islands.groupBy("doc_id", "__island")
        .agg(
            F.min("__pos").alias("span_start"),
            (F.max("__pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def _duplicated(grams: DataFrame, min_count: int) -> DataFrame:
    """Filter a (doc_id, __pos, __fp) window stream to duplicated rows."""
    dup = (
        grams.groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__occ"))
        .filter(F.col("__occ") >= min_count)
        .select("__fp")
    )
    return grams.join(dup, on="__fp", how="left_semi")


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens) — maximal duplicated
    token spans, Lee et al. (arXiv:2107.06499) at window granularity.

    A span is reported iff every length-``k`` window inside it occurs at
    least ``min_count`` times in the corpus (other documents or other
    positions of the same document count). ``span_start``/``span_end``
    are 0-based token offsets, inclusive; ``span_tokens >= k`` always.

    Production path: windows are ``xxhash64`` combinations of per-token
    hashes (``kgram_hash_stream``) — no window strings are materialized.
    Because spans are defined by window *equality*, the output is
    hash-function-independent modulo 64-bit collisions (~n²/2⁶⁵ — nil
    below petascale), so the md5 twin's SQL oracle verifies THIS path's
    output exactly; :func:`duplicated_spans_md5` exists for engines that
    need a reproducible hash end-to-end.

    Raise ``k`` to tighten what counts as duplication (Lee et al. use
    50); with a tiny vocabulary and a small k almost every window
    collides and spans degenerate to whole documents.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    grams = kgram_hash_stream(
        df, id_col, text_col, k=k, short_doc_fallback=False
    ).withColumnRenamed("__sh", "__fp")
    return _spans_from_windows(_duplicated(grams, min_count), k)


def duplicated_spans_md5(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Cross-engine twin of :func:`duplicated_spans`: windows are md5
    digests of the space-joined k-token string, bit-identical in any SQL
    engine. Same output contract; ~4× more shuffle bytes (32-char hex vs
    8-byte longs), so the xxhash64 path stays production.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("__pos", "__t"),
    )
    w = W.partitionBy("doc_id").orderBy("__pos")
    leads = [F.lead("__t", j).over(w) for j in range(1, k)]
    grams = (
        toks.select(
            "doc_id",
            "__pos",
            F.md5(F.concat_ws(" ", F.col("__t"), *leads)).alias("__fp"),
            leads[-1].alias("__last"),
        )
        .filter(F.col("__last").isNotNull())
        .select("doc_id", "__pos", "__fp")
    )
    return _spans_from_windows(_duplicated(grams, min_count), k)


def strip_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str = "text_clean",
) -> DataFrame:
    """Remove span-covered tokens from each document's text.

    Returns ``df``'s id column plus ``out_col`` (surviving tokens
    re-joined with single spaces; empty string when a span covers the
    whole document) and ``removed_tokens`` (count of dropped tokens).

    Plan shape: spans collapse to one small array per document (shuffle
    of (doc_id, start, end) triples only), then token filtering happens
    inside a single projection via nested higher-order functions —
    ``filter(tokens, (t, i) -> !exists(spans, s -> covers(s, i)))`` —
    and no Python runs. Whether the document TEXT rides a shuffle
    depends on the join strategy: while the per-document span arrays fit
    the broadcast threshold (typical: spans are (int, int) pairs for the
    flagged subset only), the join broadcasts and text stays put. On
    boilerplate-heavy web corpora where most documents carry spans, the
    span side outgrows the threshold and the equi-join hash-partitions
    BOTH sides on doc_id — including the text. The 100 TB posture for
    that regime is storage-level co-location: write the corpus bucketed
    on the id (``sources/sinks.py:write_bucketed``) and the text side
    plans with ZERO exchanges — only the tiny span aggregate shuffles to
    meet the bucket partitioning (plan-asserted in
    ``tests/test_bucketing.py::test_strip_spans_bucketed_corpus``).
    Span arrays are per-document and bounded by tokens/k, so the
    per-row struct array never explodes; overlapping or duplicate spans
    in the input are harmless (coverage is a union).
    """
    span_arr = spans.groupBy(F.col("doc_id").alias("__sid")).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("__spans")
    )
    joined = df.join(span_arr, on=df[id_col] == span_arr["__sid"], how="left")
    toks = tokens(text_col)
    # index-aware filter: token i survives iff no span [s, e] covers i
    covered = lambda i: F.exists(  # noqa: E731
        F.col("__spans"), lambda sp: (i >= sp["s"]) & (i <= sp["e"])
    )
    kept = F.filter(toks, lambda t, i: ~covered(i))
    return joined.select(
        F.col(id_col),
        F.when(F.col("__spans").isNull(), F.col(text_col))
        .otherwise(F.concat_ws(" ", kept))
        .alias(out_col),
        F.when(F.col("__spans").isNull(), F.lit(0))
        .otherwise(F.size(toks) - F.size(kept))
        .cast("int")
        .alias("removed_tokens"),
    )


def window_hash_state(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 10,
) -> DataFrame:
    """(__fp, n_occurrences) — the persisted window-hash count table that
    makes substring dedup incremental (same role ``lsh_bucket_state``
    plays for MinHash dedup, ``dedup.py:1450``).

    One hash-aggregate over the corpus's k-token window stream; at 100 TB
    the state is bounded by distinct windows (8-byte hash + count), is
    mergeable by addition, and lives as a parquet/bucketed table between
    daily runs.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    grams = kgram_hash_stream(
        df, id_col, text_col, k=k, short_doc_fallback=False
    )
    return grams.groupBy(F.col("__sh").alias("__fp")).agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def incremental_spans(
    new_docs: DataFrame,
    state: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 10,
    min_count: int = 2,
) -> dict:
    """O(delta) daily substring dedup: spans for the NEW documents only,
    judged against the full corpus history.

    Returns ``{"spans", "state"}``: ``spans`` has the
    :func:`duplicated_spans` schema restricted to ``new_docs`` — a new
    document's window counts as duplicated when historical occurrences
    (``state``) plus today's batch reach ``min_count``, exactly the
    criterion a full recompute over old ∪ new would apply, so
    ``duplicated_spans(old ∪ new)`` restricted to new ids ≡ this output
    (asserted in tests). ``state`` is the merged count table to persist
    for tomorrow.

    The one semantic a full recompute has that this doesn't: a window
    that today's batch promotes from unique to duplicated also creates a
    span in the OLD document carrying its first occurrence — incremental
    runs leave already-shipped documents untouched (the same
    new-rows-only contract as ``minhash_incremental_pairs``); schedule a
    full :func:`duplicated_spans` sweep when retroactive cleanup
    matters.

    Cost: every stage is sized by the delta — new-doc grams, one
    aggregate over them, a left-semi-scoped join against ``state``
    (touched hashes only), and per-new-doc islands.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    grams = kgram_hash_stream(
        new_docs, id_col, text_col, k=k, short_doc_fallback=False
    ).withColumnRenamed("__sh", "__fp")
    new_counts = grams.groupBy("__fp").agg(
        F.count(F.lit(1)).alias("__n_new")
    )
    # history is consulted only for hashes today's batch touches
    touched_history = state.join(
        new_counts.select("__fp"), on="__fp", how="left_semi"
    )
    totals = (
        new_counts.join(touched_history, on="__fp", how="left")
        .select(
            "__fp",
            (
                F.col("__n_new") + F.coalesce(F.col("n_occurrences"), F.lit(0))
            ).alias("__total"),
        )
    )
    dup = totals.filter(F.col("__total") >= min_count).select("__fp")
    hits = grams.join(dup, on="__fp", how="left_semi")
    spans = _spans_from_windows(hits, k)

    merged_state = (
        state.unionByName(
            new_counts.select("__fp", F.col("__n_new").alias("n_occurrences"))
        )
        .groupBy("__fp")
        .agg(F.sum("n_occurrences").alias("n_occurrences"))
    )
    return {"spans": spans, "state": merged_state}


def contaminated_spans(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 10,
) -> DataFrame:
    """Benchmark-decontamination spans: maximal token spans in TRAIN
    documents whose every ``k``-token window also occurs somewhere in
    ``benchmark`` (GPT-3 appendix C / Lee et al. style eval-overlap
    removal, at window granularity like :func:`duplicated_spans`).

    Output schema matches :func:`duplicated_spans` (doc_id, span_start,
    span_end, span_tokens — ids/positions refer to ``train``), so
    :func:`strip_spans` applies unchanged: detect → strip is the full
    decontamination pass.

    Plan shape: the benchmark side collapses to its DISTINCT window-hash
    set (one aggregate — benchmarks are tiny next to a training corpus,
    so at 100 TB this side broadcasts); train windows left-semi join it,
    then the same islands/span merge. Text never rides a shuffle on
    either side.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    train_grams = kgram_hash_stream(
        train, id_col, text_col, k=k, short_doc_fallback=False
    ).withColumnRenamed("__sh", "__fp")
    bench_hashes = (
        kgram_hash_stream(
            benchmark, id_col, text_col, k=k, short_doc_fallback=False
        )
        .select(F.col("__sh").alias("__fp"))
        .distinct()
    )
    hits = train_grams.join(bench_hashes, on="__fp", how="left_semi")
    return _spans_from_windows(hits, k)


def duplicated_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 2,
) -> DataFrame:
    """(doc_id, line_pos) — occurrences of corpus-duplicated LINES to
    remove, C4/RefinedWeb-style (Raffel et al. arXiv:1910.10683 §2.2
    dedups repeated spans; RefinedWeb/Gopher pipelines apply it at line
    granularity for boilerplate like cookie banners and nav text).

    A line participates when its trimmed form is non-empty and its exact
    text occurs at least ``min_count`` times corpus-wide (any document,
    any position). The GLOBAL first occurrence (smallest (doc_id,
    line_pos)) is kept; every other occurrence is emitted for removal —
    content is preserved once, boilerplate copies disappear.

    Plan shape: lines hash to ``xxhash64`` in the same narrow projection
    as the explode, so only (doc_id, line_pos, hash8) ever rides an
    Exchange — one count/min aggregate on the hash plus one equi-join
    back. Output depends only on line EQUALITY, so the md5-based SQL
    oracle verifies this path exactly (same hash-independence argument
    as :func:`duplicated_spans`). Blank lines never match (removing
    them would mangle formatting, and every document would tie on "").
    """
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "line_pos", "__line"
        ),
    )
    keyed = lines.filter(F.trim(F.col("__line")) != "").select(
        "doc_id", "line_pos", F.xxhash64("__line").alias("__fp")
    )
    agg = keyed.groupBy("__fp").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(F.struct("doc_id", "line_pos")).alias("__first"),
    )
    dups = agg.filter(F.col("__cnt") >= min_count).select("__fp", "__first")
    return (
        keyed.join(dups, "__fp")
        .filter(
            ~(
                (F.col("doc_id") == F.col("__first.doc_id"))
                & (F.col("line_pos") == F.col("__first.line_pos"))
            )
        )
        .select("doc_id", "line_pos")
    )


def strip_lines(
    df: DataFrame,
    removals: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str = "text_clean",
) -> DataFrame:
    """Remove the lines :func:`duplicated_lines` flagged, preserving
    order and untouched blank lines; returns the id column, ``out_col``
    (surviving lines re-joined with newlines), ``n_lines``, and
    ``removed_lines``.

    Same join regime as :func:`strip_spans`: per-document removal
    position arrays are tiny, so the join broadcasts while they fit the
    threshold, and the bucketed-corpus layout gives the zero-Exchange
    plan past it; the line filter itself is one nested higher-order
    projection, no Python.
    """
    rem_arr = removals.groupBy(F.col("doc_id").alias("__rid")).agg(
        F.collect_list("line_pos").alias("__rpos")
    )
    joined = df.join(rem_arr, on=df[id_col] == rem_arr["__rid"], how="left")
    arr = F.split(F.col(text_col), "\n", -1)
    kept = F.filter(
        arr, lambda l, i: ~F.exists(F.col("__rpos"), lambda p: p == i)
    )
    return joined.select(
        F.col(id_col),
        F.when(F.col("__rpos").isNull(), F.col(text_col))
        .otherwise(F.concat_ws("\n", kept))
        .alias(out_col),
        F.size(arr).cast("int").alias("n_lines"),
        F.when(F.col("__rpos").isNull(), F.lit(0))
        .otherwise(F.size(arr) - F.size(kept))
        .cast("int")
        .alias("removed_lines"),
    )


def line_hash_state(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(__fp, n_occurrences) — the persisted line-hash count table that
    makes :func:`duplicated_lines` incremental (the line-granularity
    sibling of :func:`window_hash_state`). Non-blank lines only, keyed
    by ``xxhash64``; mergeable by addition; bounded by distinct lines.
    """
    lines = df.select(
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "__lp", "__line"
        )
    )
    return (
        lines.filter(F.trim(F.col("__line")) != "")
        .groupBy(F.xxhash64("__line").alias("__fp"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


def incremental_line_removals(
    new_docs: DataFrame,
    state: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 2,
) -> dict:
    """O(delta) daily duplicate-line removal: removal positions for the
    NEW documents only, judged against the full corpus history.

    Returns ``{"removals", "state"}``. A new occurrence is removed when
    historical + batch occurrences reach ``min_count`` AND it is not
    the corpus-global first — which is the historical first if the line
    was ever seen (hist ≥ 1 → every new occurrence is removed; the
    keeper already shipped), else the batch's smallest (doc_id,
    line_pos). Under the monotone-id contract (new doc_ids sort after
    history's, the same new-rows-only contract as
    :func:`incremental_spans` / ``minhash_incremental_pairs``) this
    equals ``duplicated_lines(old ∪ new)`` restricted to new ids
    (asserted in tests). ``state`` is the merged count table to persist.

    Cost: sized by the delta — the batch's line stream, one aggregate,
    a left-semi-scoped history probe (touched hashes only), one join
    back.
    """
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    lines = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "line_pos", "__line"
        ),
    )
    keyed = lines.filter(F.trim(F.col("__line")) != "").select(
        "doc_id", "line_pos", F.xxhash64("__line").alias("__fp")
    )
    new_counts = keyed.groupBy("__fp").agg(
        F.count(F.lit(1)).alias("__n_new"),
        F.min(F.struct("doc_id", "line_pos")).alias("__first"),
    )
    touched = state.join(new_counts.select("__fp"), "__fp", "left_semi")
    totals = new_counts.join(touched, "__fp", "left").select(
        "__fp",
        "__first",
        F.coalesce(F.col("n_occurrences"), F.lit(0)).alias("__hist"),
        (F.col("__n_new") + F.coalesce(F.col("n_occurrences"), F.lit(0)))
        .alias("__total"),
    )
    dup = totals.filter(F.col("__total") >= min_count)
    removals = (
        keyed.join(dup, "__fp")
        .filter(
            (F.col("__hist") >= 1)
            | ~(
                (F.col("doc_id") == F.col("__first.doc_id"))
                & (F.col("line_pos") == F.col("__first.line_pos"))
            )
        )
        .select("doc_id", "line_pos")
    )
    merged_state = (
        state.unionByName(
            keyed.groupBy("__fp").agg(F.count(F.lit(1)).alias("n_occurrences"))
        )
        .groupBy("__fp")
        .agg(F.sum("n_occurrences").alias("n_occurrences"))
    )
    return {"removals": removals, "state": merged_state}
