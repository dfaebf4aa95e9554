"""Text-analysis functions for large-scale corpus pipelines (north-star).

All pure ``pyspark.sql.functions`` compositions over a string column —
tokenization, token statistics, stopword ratios, a deterministic language-ID
heuristic, quality scoring, and document fingerprinting. No Python in the
row path: every expression stays JVM-side in whole-stage codegen, so these
run at scan speed over a 100 TB corpus.

No reference counterpart (the reference has no string functions on data,
SURVEY §2.9); semantics follow standard corpus-pipeline practice
(length/stopword/punctuation heuristics, MD5 content fingerprints).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Stopword profiles for the language-ID heuristic. Deliberately small and
#: deterministic — the operator contract is "same text → same label", not
#: linguistic accuracy (swap in fastText/CLD3 via a pandas UDF for real
#: corpora; the Spark-side plumbing is identical).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "in", "to", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "la", "los", "las", "es", "y", "un"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
}

#: Tie-break priority when two profiles score equal (deterministic argmax).
LANG_PRIORITY: tuple[str, ...] = ("en", "de", "es", "fr")


#: GPT-2-style BPE *pre-tokenization* pattern: contraction suffixes,
#: space-prefixed letter runs, space-prefixed digit runs, space-prefixed
#: punctuation runs, whitespace runs. Matches are the units a byte-pair
#: vocabulary would merge within — counting them approximates LLM token
#: counts to within the subword-merge factor, with zero vocabulary shipped.
#: The character classes are Unicode (\\p{L}/\\p{N}) and behave identically
#: under Java regex (Spark) and RE2 (DuckDB), which the oracle relies on.
BPE_PRETOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_pretoken_count(col: Column | str) -> Column:
    """Number of BPE pre-tokenization units (GPT-2 split rules) — the
    regex-based LLM-token-count estimator from the training-data-pipeline
    surface. Pure ``regexp_count``: JVM-side, codegen, no vocabulary."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_PRETOKEN_RE))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization: ``split(trim(text), '\\s+')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """Number of whitespace tokens (0 for empty/blank text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(tokens(c)))


def unique_token_count(col: Column | str) -> Column:
    """Number of distinct tokens."""
    return F.size(F.array_distinct(tokens(col)))


def total_token_length(col: Column | str) -> Column:
    """Sum of token lengths (text length excluding whitespace)."""
    return F.aggregate(
        F.transform(tokens(col), lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def stopword_count(col: Column | str, stopwords: tuple[str, ...]) -> Column:
    """Count of tokens that are stopwords (array filter, JVM-side)."""
    return F.size(F.filter(tokens(col), lambda t: t.isin(*stopwords)))


def lang_id(col: Column | str) -> Column:
    """Deterministic language-ID: argmax of per-language stopword hits,
    ties broken by :data:`LANG_PRIORITY` order, no hits at all → 'und'."""
    counts = {
        lang: stopword_count(col, words) for lang, words in LANG_STOPWORDS.items()
    }
    best = None
    for lang in LANG_PRIORITY:
        score = counts[lang]
        # strictly-greater-than-all-earlier keeps the priority tie-break
        cond = score > 0
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            earlier = LANG_PRIORITY.index(other) < LANG_PRIORITY.index(lang)
            cond = cond & (
                (score > counts[other]) if earlier else (score >= counts[other])
            )
        branch = F.when(cond, F.lit(lang))
        best = branch if best is None else best.when(cond, F.lit(lang))
    return best.otherwise(F.lit("und"))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: mean of
    (a) length score ``least(1, n_chars/100)`` — saturates at 100 chars,
    no upper-bound penalty (very long docs score 1 on this component),
    (b) mean token length in [3, 10] (1 inside the band, else 0),
    (c) non-empty content.
    Deterministic arithmetic only, so SQL oracles can replicate it exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_tok = token_count(c)
    mean_tok_len = F.when(n_tok > 0, total_token_length(c) / n_tok).otherwise(F.lit(0.0))
    length_score = F.least(F.lit(1.0), n_chars / F.lit(100.0))
    tok_len_score = F.when(
        (mean_tok_len >= 3) & (mean_tok_len <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    nonempty = F.when(n_tok > 0, F.lit(1.0)).otherwise(F.lit(0.0))
    return (length_score + tok_len_score + nonempty) / F.lit(3.0)


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of lowercased, trimmed text. Engine-portable
    (md5 is identical everywhere) — the key for exact deduplication."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(c)))


def canonical_fingerprint(col: Column | str) -> Column:
    """Canonical-form fingerprint: md5 after lowercasing, stripping
    non-alphanumerics, and collapsing whitespace runs — so case,
    punctuation, and spacing VARIANTS of the same content share a key.
    The cluster key for policy-based dedup (keep the best variant),
    one normalization step stronger than :func:`fingerprint`.

    The whitespace class is spelled explicitly (``[ \\t\\n\\r\\f]``)
    rather than ``\\s`` because Java's ``\\s`` includes U+000B while
    RE2's does not — a vertical tab would canonicalize differently per
    engine and break the oracle twin (ADVICE r5).

    Text with NO ASCII alphanumerics (non-Latin scripts, emoji- or
    punctuation-only docs) canonicalizes to the empty string; clustering
    all such unrelated documents together would silently drop non-Latin
    content in a keep-one-survivor pipeline, so the empty form falls
    back to the raw-text :func:`fingerprint` (ADVICE r5)."""
    c = F.col(col) if isinstance(col, str) else col
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^a-z0-9 \t\n\r\f]", ""),
            r"[ \t\n\r\f]+",
            " ",
        )
    )
    return F.when(canon == "", fingerprint(c)).otherwise(F.md5(canon))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles: overlapping k-grams of the token sequence, the
    standard unit for near-duplicate detection (MinHash/Jaccard). Texts
    shorter than k tokens yield a single shingle of the whole text.

    Performance caveat: as an inline expression the tokenizer is
    re-evaluated for each ``element_at`` inside the lambda (Catalyst
    inlines the sub-expression), costing O(k · positions) re-splits per
    row. Fine for small/verification paths; hot paths should use
    :func:`with_shingles` (materialized token column) or the all-codegen
    hash pipeline in ``operators.dedup.minhash_signatures``."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(
        n <= k,
        F.array(F.concat_ws(" ", toks)),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),  # positions 0..n-k → n-k+1 shingles
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
            ),
        )
    )


def with_shingles(df, id_col: str, text_col: str, k: int = 3, out_col: str = "shingles"):
    """(doc_id, shingles array<string>) — the fast shingle materialization.

    Plan: posexplode tokens → shingle strings via window ``lead`` concat
    (whole-stage codegen; ``concat_ws`` skips the null leads at the tail,
    which also yields the short-document whole-text fallback naturally) →
    ``collect_list`` back to a per-doc array. One shuffle on doc_id;
    measured ~8× faster than the inline :func:`word_shingles` expression,
    whose lambda re-tokenizes the text per element. Same output as
    ``word_shingles`` for every document.
    """
    from pyspark.sql.window import Window as W

    toked = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("__pos", "__t"),
    )
    w = W.partitionBy("doc_id").orderBy("__pos")
    lead_cols = [F.lead("__t", j).over(w) for j in range(1, k)]
    n_tok = F.count(F.lit(1)).over(W.partitionBy("doc_id"))
    shingled = toked.select(
        "doc_id",
        "__pos",
        F.concat_ws(" ", F.col("__t"), *lead_cols).alias("__sh"),
        lead_cols[-1].alias("__last"),
        n_tok.alias("__n"),
    ).filter(
        F.col("__last").isNotNull() | ((F.col("__n") < k) & (F.col("__pos") == 0))
    )
    return (
        shingled.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__sh"))),
                lambda s: s["__sh"],
            ).alias(out_col)
        )
    )


def symbol_ratio(col: Column | str) -> Column:
    """Fraction of characters that are neither alphanumeric nor whitespace
    — a Gopher-style quality signal (machine-generated/boilerplate text
    skews symbol-heavy). 0.0 for empty text. Pure regexp_count — codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    return F.when(
        n > 0, F.regexp_count(c, F.lit("[^A-Za-z0-9\\s]")).cast("double") / n
    ).otherwise(F.lit(0.0))


def digit_ratio(col: Column | str) -> Column:
    """Fraction of characters that are digits (ids/tables/logs score
    high). 0.0 for empty text."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    return F.when(
        n > 0, F.regexp_count(c, F.lit("[0-9]")).cast("double") / n
    ).otherwise(F.lit(0.0))


def repeated_bigram_fraction(col: Column | str) -> Column:
    """1 − distinct/total word bigrams — the Gopher repetition signal
    (templated/spun text repeats n-grams).

    Bigrams are built with ``zip_with(tokens, slice(tokens, 2, n−1))`` —
    the lambda touches only its element arguments, so the tokenizer runs
    once per row (the ``element_at(tokens, i)``-in-a-lambda form re-splits
    the text per element). 0.0 for docs with fewer than 2 tokens.
    """
    c = F.col(col) if isinstance(col, str) else col
    t = tokens(c)
    n = F.size(t)
    bigrams = F.slice(
        F.zip_with(t, F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
                   lambda a, b: F.concat_ws(" ", a, b)),
        1,
        F.greatest(n - 1, F.lit(0)),
    )
    frac = F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast("double") / F.size(
        bigrams
    )
    return F.when(n >= 2, frac).otherwise(F.lit(0.0))


def max_token_length(col: Column | str) -> Column:
    """Longest token in characters (URLs/base64 blobs produce extreme
    tokens — a cheap anomaly signal)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_max(F.transform(tokens(c), lambda x: F.length(x))).cast("int")


def normalize_unicode(col: Column | str, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the canonicalization
    step web-crawl text needs before hashing/dedup: composed ``é`` and
    decomposed ``e + COMBINING ACUTE`` are different byte strings (so
    different md5 fingerprints, different shingles) for identical text.

    Spark SQL has no normalization built-in, so this is a deliberate
    Arrow-batched pandas UDF over ``unicodedata.normalize`` — a narrow
    per-row projection, no shuffle impact; run it ONCE at ingest and
    every downstream hash-based operator (``fingerprint``,
    ``canonical_fingerprint``, MinHash shingles, span windows) sees one
    canonical form. Agrees with DuckDB's ``nfc_normalize`` for
    ``form='NFC'`` (both implement the Unicode standard; asserted in
    ``tests/test_operators_unit.py``). Nulls pass through.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"form must be NFC/NFKC/NFD/NFKD, got {form!r}")
    c = F.col(col) if isinstance(col, str) else col

    # explicit annotations (this module uses `from __future__ import
    # annotations`, which would stringify hints pyspark can't resolve)
    def _norm_impl(s):
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize(form, v) if v is not None else None
        )

    _norm_impl.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_norm_impl, "string")(c)


#: Named entities :func:`strip_html` decodes — the five XML predefined
#: entities plus nbsp; a full HTML entity table belongs to a real
#: extractor (trafilatura/bs4 via mapInPandas), this is the scan-speed
#: JVM subset. Numeric character references are handled generically.
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

#: One pattern matching every entity :func:`strip_html` decodes: numeric
#: decimal (``&#233;``), numeric hex (``&#xE9;``), and the named subset.
#: No backreferences — Java and RE2 agree.
HTML_ENTITY_RE = (
    r"&(?:#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6}|nbsp|lt|gt|quot|apos|amp);"
)


def _decode_entity(e: Column) -> Column:
    """Decode ONE matched entity string. Numeric references resolve for
    codepoints 9/10/13 and 32..255 (the ASCII/Latin-1 range both
    engines' codepoint→char agree on — Spark's ``char`` wraps mod 256
    above that); anything else passes through verbatim."""
    named = None
    for entity, repl in HTML_ENTITIES:
        branch = F.when(e == entity, F.lit(repl))
        named = branch if named is None else named.when(e == entity, F.lit(repl))
    hex_digits = F.regexp_extract(e, r"^&#[xX]([0-9a-fA-F]+);$", 1)
    dec_digits = F.regexp_extract(e, r"^&#([0-9]+);$", 1)
    val = F.when(
        hex_digits != "", F.conv(hex_digits, 16, 10).cast("bigint")
    ).when(dec_digits != "", dec_digits.cast("bigint"))
    char_ok = val.isin(9, 10, 13) | ((val >= 32) & (val <= 255))
    return named.when(char_ok, F.char(val)).otherwise(e)


def strip_html(col: Column | str) -> Column:
    """Markup-to-text extraction: drop ``<script>``/``<style>`` blocks
    (their CONTENT is code, not prose), strip remaining tags and HTML
    comments, decode entities, and collapse whitespace.

    Entity decoding (r6) is a SINGLE simultaneous pass — split on
    :data:`HTML_ENTITY_RE`, decode each match, reassemble — covering
    numeric character references (``&#NNN;`` / ``&#xNN;``, the
    ASCII/Latin-1 range; crawl text is full of them) alongside the
    named subset, with browser-correct no-double-decode semantics
    (``&amp;lt;`` → ``&lt;``, never ``<``) that a sequential replace
    chain cannot guarantee in general. Everything stays JVM-side
    (regexp split + higher-order array fold), codegen, scan-speed over
    100 TB of crawl HTML. Java and RE2 agree on every pattern used (no
    backreferences), so the DuckDB twin replays it exactly
    (tests/test_operators_unit.py). For DOM-aware extraction
    (boilerplate removal, main-content detection) swap in a real
    extractor behind ``mapInPandas`` — the surrounding plan is
    unchanged.
    """
    c = F.col(col) if isinstance(col, str) else col
    # two patterns, not one with a </\1> backreference: RE2 (the DuckDB
    # oracle's engine) has no backreferences, and mismatched nesting like
    # <script>..</style>..</script> should not end the block early anyway
    out = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script\s*>", " ")
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style\s*>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]+>", " ")
    segs = F.split(out, HTML_ENTITY_RE, -1)
    ents = F.regexp_extract_all(out, F.lit(HTML_ENTITY_RE), 0)
    # interleave: segs[1] + dec(ents[1]) + segs[2] + ... (1-based); the
    # size guard matters — sequence(1, 0) would count DOWN, not empty
    decoded = F.when(F.size(ents) == 0, out).otherwise(
        F.aggregate(
            F.sequence(F.lit(1), F.size(ents)),
            F.element_at(segs, 1),
            lambda acc, i: F.concat(
                acc,
                _decode_entity(F.element_at(ents, i)),
                F.element_at(segs, i + F.lit(1)),
            ),
        )
    )
    return F.trim(F.regexp_replace(decoded, r"\s+", " "))
