"""Real byte-level BPE tokenization (Sennrich et al. 2016, the GPT-2
byte-level variant) — token counts in ACTUAL tokenizer tokens, not
pre-tokenization units.

Every token-denominated operator in this engine (``pack_sequences``,
``token_budget_mix``, ``chunk_tokens``, perplexity normalization) takes a
token-count COLUMN, so they budget in whatever unit that column carries.
This module supplies the real unit: a pinned merges fixture
(``data/bpe_merges_v1.txt``) plus an Arrow-batched pandas UDF that
applies the merges per pre-tokenization unit. Determinism: the merge
table is data, committed and versioned — same text + same merges → same
count on every engine, run, and partitioning.

Spark posture at 100 TB: the merges table is tiny (hundreds of pairs →
a few KB) and ships inside the UDF closure to every executor once per
task batch; encoding is a narrow per-row map with NO shuffle, so the
scan stays embarrassingly parallel. The per-unit LRU-style cache makes
the common case (Zipfian unit distribution) a dict hit, not a merge
loop. This is a deliberate Python path — byte-pair merging is an
iterative data-dependent loop no Catalyst expression expresses; the
Arrow batch transfer keeps it vectorized at the transport layer.

No reference counterpart (`/root/reference` has no tokenizer surface;
SURVEY §2.9): semantics follow the public BPE algorithm. The fixture is
trained by :func:`train_bpe_merges` on the repo's synthetic testdata —
it is a UNIT, not a linguistic claim; swap in a production merges file
(same two-symbols-per-line format) for real corpora.
"""

from __future__ import annotations

import os
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.text import BPE_PRETOKEN_RE

#: Path of the pinned merges fixture (rank = line order).
DEFAULT_MERGES_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "bpe_merges_v1.txt"
)

_INF = float("inf")


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte↔printable-unicode map: the 188 printable
    latin-1 bytes map to themselves, the rest to U+0100.. — so byte
    sequences become strings with no whitespace/control chars, which
    keeps the merges file line-oriented and the symbols splittable."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_BYTE_MAP = bytes_to_unicode()


def _pretokenize(text: str) -> list[str]:
    """Split into GPT-2-style pre-tokenization units — the SAME pattern
    ``functions.text.BPE_PRETOKEN_RE`` counts JVM-side (the cross-engine
    bounds certificate in the declared query depends on this identity)."""
    import regex

    return regex.findall(BPE_PRETOKEN_RE, text)


def _byte_symbols(unit: str) -> tuple[str, ...]:
    return tuple(_BYTE_MAP[b] for b in unit.encode("utf-8"))


def _bpe_word(
    word: tuple[str, ...], ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Merge loop for one unit: repeatedly merge the lowest-ranked
    adjacent pair (all leftmost-non-overlapping occurrences at once)
    until no adjacent pair is in the table — the standard BPE encode."""
    while len(word) > 1:
        best = min(zip(word, word[1:]), key=lambda p: ranks.get(p, _INF))
        if best not in ranks:
            break
        out: list[str] = []
        i = 0
        while i < len(word):
            if i < len(word) - 1 and (word[i], word[i + 1]) == best:
                out.append(word[i] + word[i + 1])
                i += 2
            else:
                out.append(word[i])
                i += 1
        word = tuple(out)
    return word


def bpe_encode(
    text: str,
    ranks: dict[tuple[str, str], int],
    _cache: dict[str, tuple[str, ...]] | None = None,
) -> list[str]:
    """Pure-Python reference encoder: byte-map each pre-tokenization
    unit, apply the merge loop, concatenate. The UDF and every test
    verify against THIS function."""
    cache = _cache if _cache is not None else {}
    out: list[str] = []
    for unit in _pretokenize(text):
        toks = cache.get(unit)
        if toks is None:
            toks = _bpe_word(_byte_symbols(unit), ranks)
            if len(cache) < 100_000:  # bound the per-batch memo
                cache[unit] = toks
        out.extend(toks)
    return out


def load_merges(path: str | None = None) -> list[tuple[str, str]]:
    """Read a merges file (one ``left right`` pair per line, rank =
    order; ``#`` lines are comments)."""
    merges: list[tuple[str, str]] = []
    with open(path or DEFAULT_MERGES_PATH, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            left, sep, right = line.partition(" ")
            if not sep or not left or not right:
                raise ValueError(f"malformed merges line: {line!r}")
            merges.append((left, right))
    return merges


def merge_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}


def bpe_token_count_col(
    text_col: Column | str, merges: list[tuple[str, str]] | None = None
) -> Column:
    """Column of REAL BPE token counts for ``text_col`` under ``merges``
    (default: the pinned fixture). Arrow-batched pandas UDF; NULL text
    counts as 0. Feed the result column to ``pack_sequences`` /
    ``token_budget_mix`` / ``chunk_tokens`` to budget in real tokens."""
    from pyspark.sql.functions import pandas_udf

    ranks = merge_ranks(merges if merges is not None else load_merges())

    @pandas_udf("bigint")
    def _count(s: pd.Series) -> pd.Series:
        cache: dict[str, tuple[str, ...]] = {}
        return s.map(
            lambda t: 0 if t is None else len(bpe_encode(t, ranks, cache))
        ).astype("int64")

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _count(c)


def with_bpe_token_count(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]] | None = None,
    out_col: str = "bpe_token_count",
) -> DataFrame:
    """``df`` plus a real-BPE token-count column — the opt-in token
    source for the packing/mixing/chunking operators."""
    return df.withColumn(out_col, bpe_token_count_col(text_col, merges))


def vocab_from_merges(
    merges: list[tuple[str, str]] | None = None,
) -> dict[str, int]:
    """Deterministic symbol → token-id vocabulary implied by a merges
    table (the GPT-2 convention): ids 0-255 are the 256 base byte
    symbols with ``id = byte value`` under :func:`bytes_to_unicode`,
    and each merge's concatenated symbol gets ``256 + rank``. A pure
    function of the merges list, so the SAME merges file always yields
    the SAME ids on every engine and run. (If two merge rules produced
    an identical concatenated string — which a well-formed BPE table
    never does — the later rank would win, still deterministically.)"""
    vocab = {_BYTE_MAP[b]: b for b in range(256)}
    for i, (left, right) in enumerate(merges if merges is not None else load_merges()):
        vocab[left + right] = 256 + i
    return vocab


def bpe_encode_ids(
    text: str,
    ranks: dict[tuple[str, str], int],
    vocab: dict[str, int],
    _cache: dict[str, tuple[str, ...]] | None = None,
) -> list[int]:
    """Pure-Python reference: :func:`bpe_encode` mapped through the
    merges-implied vocabulary — the token-ID sequence a trainer
    consumes. The UDF and the packed-corpus tests verify against THIS."""
    return [vocab[s] for s in bpe_encode(text, ranks, _cache)]


def bpe_token_ids_col(
    text_col: Column | str, merges: list[tuple[str, str]] | None = None
) -> Column:
    """``array<int>`` column of REAL BPE token ids for ``text_col``
    under ``merges`` (default: the pinned fixture). Arrow-batched
    pandas UDF with the same per-batch unit memo as
    :func:`bpe_token_count_col`; NULL text encodes to an empty array.
    ``size()`` of this column equals ``bpe_token_count_col`` by
    construction — the count operators and the packed-corpus writer
    budget in the same unit."""
    from pyspark.sql.functions import pandas_udf

    m = merges if merges is not None else load_merges()
    ranks = merge_ranks(m)
    vocab = vocab_from_merges(m)

    @pandas_udf("array<int>")
    def _ids(s: pd.Series) -> pd.Series:
        cache: dict[str, tuple[str, ...]] = {}
        return s.map(
            lambda t: []
            if t is None
            else [vocab[sym] for sym in bpe_encode(t, ranks, cache)]
        )

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _ids(c)


def with_bpe_token_ids(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]] | None = None,
    out_col: str = "bpe_token_ids",
) -> DataFrame:
    """``df`` plus the real token-ID sequence column — the input to
    ``operators/packing.py:packed_corpus_frame`` / the packed-shard
    writer."""
    return df.withColumn(out_col, bpe_token_ids_col(text_col, merges))


def train_bpe_merges(
    df: DataFrame,
    text_col: str,
    num_merges: int = 256,
    max_docs: int = 20_000,
) -> list[tuple[str, str]]:
    """Learn a merge table greedily (Sennrich et al. 2016): repeatedly
    merge the most frequent adjacent symbol pair over the sample's
    pre-tokenization units. Ties break to the lexicographically smallest
    pair, and the sample is the ``max_docs`` texts FIRST in md5 order —
    both choices make training a pure function of (data, params), so a
    committed fixture is reproducible.

    Scale posture: training is a FIT step over a bounded sample (like
    k-means codebook training in ``operators/quantization.py``), not a
    corpus pass — the driver collects at most ``max_docs`` texts
    (raising beyond a hard cap) and loops in Python. Apply-side
    (:func:`bpe_token_count_col`) is the part that must scale, and does.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    if max_docs < 1 or max_docs > 200_000:
        raise ValueError(
            f"max_docs must be in [1, 200000] (driver-side sample), got {max_docs}"
        )
    c = F.col(text_col)
    rows = (
        df.select(c.alias("t"))
        .filter(c.isNotNull())
        .orderBy(F.md5(c), c)
        .limit(max_docs)
        .collect()
    )
    word_counts: Counter[tuple[str, ...]] = Counter()
    for r in rows:
        for unit in _pretokenize(r["t"]):
            word_counts[_byte_symbols(unit)] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter[tuple[str, str]] = Counter()
        for word, cnt in word_counts.items():
            for pair in zip(word, word[1:]):
                pair_counts[pair] += cnt
        if not pair_counts:
            break
        top = max(pair_counts.values())
        best = min(p for p, cnt in pair_counts.items() if cnt == top)
        merges.append(best)
        ranks = {best: 0}
        rewritten: Counter[tuple[str, ...]] = Counter()
        for word, cnt in word_counts.items():
            if best in zip(word, word[1:]):
                word = _bpe_word(word, ranks)
            rewritten[word] += cnt
        word_counts = rewritten
    return merges


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("# byte-level BPE merges (rank = line order)\n")
        for left, right in merges:
            fh.write(f"{left} {right}\n")
