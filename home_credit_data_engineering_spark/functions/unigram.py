"""Unigram-LM (SentencePiece-style) tokenizer: distributed EM trainer +
Viterbi encoder (Kudo 2018, arXiv:1804.10959) — the second real
tokenizer family next to byte-level BPE (``functions/bpe.py``), since
dominant open tokenizers (LLaMA, T5, mT5) are unigram-LM.

Algorithm (faithful to the paper, with two documented simplifications):

1. **Seed vocabulary**: all substrings of the corpus's whitespace
   pre-tokenization units up to ``max_piece_len``, scored by occurrence
   count × piece length, top ``max_seed_pieces`` kept — plus EVERY
   single character (so any unit always has a segmentation).
2. **EM rounds**: the E-step computes each piece's expected occurrence
   count over the corpus with forward-backward dynamic programming per
   unit under the current piece probabilities; the M-step re-normalizes.
3. **Prune**: after each round, drop the lowest-expected-count pieces
   (never single characters) down to ``shrink`` × current size, until
   ``vocab_size`` — the paper prunes by likelihood-loss; expected-count
   pruning is the standard cheap surrogate and keeps the trainer a pure
   function of (data, params).

Simplifications vs SentencePiece proper: whitespace pre-tokenization
(the repo-wide unit, ``functions/text.py:tokens``) instead of the ▁
whole-sentence scheme, and count-based pruning (above). Both are
parameters of the tokenizer FAMILY, not the algorithm.

**Determinism / cross-engine discipline** (what makes the distributed
trainer bit-equal to the pure-Python reference, asserted in
``tests/test_unigram.py``): the per-unit E-step runs the SAME Python
function (:func:`_unit_expected_counts`) on the driver and inside the
Arrow-batched UDF, so every double is IEEE-identical; each unit's
expected counts are scaled to integer MICRO-counts (``round(x * 1e9)``)
before any aggregation, so the distributed sum is an exact, order-free
bigint fold — the `_stable.py` rule applied to EM. Ties everywhere
break lexicographically.

Spark posture at 100 TB: training folds the corpus ONCE into a
(unit, count) frame (one hash aggregate, map-side combined — Zipf makes
this frame the distinct-unit vocabulary, orders of magnitude smaller
than the corpus); every EM pass is an Arrow-batched map over that frame
plus one combinable bigint aggregate bounded by |pieces|. The model
(piece table) is driver-held and broadcast via the UDF closure — a few
hundred KB. Apply-side (:func:`unigram_token_ids_col`) is a narrow
per-row map with no shuffle, exactly like the BPE encoder.

No reference counterpart (`/root/reference` has no tokenizer surface);
semantics follow the public unigram-LM algorithm.
"""

from __future__ import annotations

import math
import os
import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Path of the pinned vocab fixture (same role as the BPE merges
#: fixture): trained by :func:`train_unigram` on the repo's sf0.001
#: synthetic documents with (vocab_size=512, num_iters=4,
#: max_piece_len=6, max_seed_pieces=4096) — a UNIT for deterministic
#: tests/oracles, not a linguistic claim; swap in a production vocab
#: (same piece\tlogprob format) for real corpora.
DEFAULT_UNIGRAM_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "unigram_vocab_v1.txt"
)

#: Micro-count scale: expected counts quantize at 1e-9 before summing.
#: Exactness bound: bigint overflows past ~9.2e18 micro-units = ~9.2e9
#: expected token occurrences; corpora beyond that should train on a
#: sample (tokenizer fits never need the full corpus) or lower _MICRO —
#: the trade is quantization granularity, not correctness of the fold.
_MICRO = 1_000_000_000
#: Marker for characters unseen at training time (token id 0). Contains
#: a SPACE so it can never collide with a learned piece: pieces are
#: substrings of whitespace-split units, so no piece contains whitespace
#: — a corpus that literally contains "<unk>" would otherwise learn a
#: piece that shadows the reserved id (review r9 finding).
UNK_PIECE = "<unk >"

#: Whitespace, pinned to the ASCII class Java's \s matches — i.e.
#: EXACTLY what Spark ``tokens()`` splits on, including \x0b (VT).
#: Python's ``str.split`` splits on UNICODE whitespace (NBSP,
#: U+2000-200A, ...), which would desync the reference trainer /
#: encoder / coverage certificate from the engine paths on non-ASCII
#: corpora — the same class-pinning as ``functions/text.py:
#: canonical_fingerprint`` (ADVICE r5). NOTE: RE2's \s does NOT match
#: \x0b, so the DuckDB coverage oracles spell this class out
#: explicitly ('[ \t\n\x0b\f\r]+') instead of using \s (r10
#: review finding — a bare \s oracle silently desyncs on VT text).
_WS_RE = re.compile("[ \t\n\x0b\f\r]+")


def _units(text: str) -> list[str]:
    """Whitespace-split pre-tokenization units under the pinned class."""
    return [u for u in _WS_RE.split(text) if u]


# ---------------------------------------------------------------------------
# Shared per-unit math (driver AND executor run THIS code)
# ---------------------------------------------------------------------------


def _unit_expected_counts(
    unit: str, logp: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """Forward-backward expected piece counts for ONE pre-tokenization
    unit under current piece log-probabilities. Pure function; the
    distributed E-step and the reference trainer both call it, which is
    what makes their doubles bit-identical."""
    n = len(unit)
    # forward: alpha[i] = total prob of segmenting unit[:i]
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            lp = logp.get(unit[i:j])
            if lp is None or alpha[i] == -math.inf:
                continue
            alpha[j] = _logaddexp(alpha[j], alpha[i] + lp)
    if alpha[n] == -math.inf:  # unit cannot be segmented (no single char)
        return {}
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            lp = logp.get(unit[i:j])
            if lp is None or beta[j] == -math.inf:
                continue
            beta[i] = _logaddexp(beta[i], lp + beta[j])
    z = alpha[n]
    out: dict[str, float] = {}
    for i in range(n):
        if alpha[i] == -math.inf:
            continue
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            piece = unit[i:j]
            lp = logp.get(piece)
            if lp is None or beta[j] == -math.inf:
                continue
            out[piece] = out.get(piece, 0.0) + math.exp(
                alpha[i] + lp + beta[j] - z
            )
    return out


def _logaddexp(a: float, b: float) -> float:
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


def _unit_micro_counts(
    unit: str, cnt: int, logp: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """Integer micro-counts of one (unit, count): the exact, order-free
    contribution this unit adds to the E-step aggregate."""
    return {
        piece: round(e * cnt * _MICRO)
        for piece, e in _unit_expected_counts(unit, logp, max_piece_len).items()
    }


def _m_step_and_prune(
    micro: dict[str, int],
    logp: dict[str, float],
    vocab_size: int,
    shrink: float,
    final_round: bool,
) -> dict[str, float]:
    """Re-normalize probabilities from exact micro-counts, then prune the
    lowest-count multi-char pieces (count asc, piece desc drops first) to
    ``shrink`` x current size — never below ``vocab_size``, never single
    characters. Driver-side over the |pieces|-bounded table."""
    counts = {p: micro.get(p, 0) for p in logp}
    keep = dict(counts)
    # zero-expected-count multi-char pieces are dead weight: EM can never
    # revive a piece whose posterior mass already rounded to zero (its
    # next E-step weight is exp(-100) ~ 1e-44 -> micro 0 forever), so
    # dropping them is a forward no-op that keeps the vocab clean
    for p in [p for p in keep if len(p) > 1 and counts[p] == 0]:
        del keep[p]
    multi = [p for p in keep if len(p) > 1]
    n_single = len(keep) - len(multi)
    target = max(vocab_size, int(len(keep) * shrink)) if not final_round else (
        vocab_size
    )
    target = max(target, n_single)
    if len(keep) > target:
        # drop lowest expected count first; ties drop the
        # lexicographically LARGER piece first (keep is deterministic)
        multi.sort(key=lambda p: (counts[p], [-ord(c) for c in p]))
        for p in multi[: len(keep) - target]:
            del keep[p]
    total = sum(keep.values())
    if total <= 0:
        raise ValueError("degenerate E-step: zero total expected count")
    # one double division per piece over exact integers — same expression
    # on every engine
    return {p: math.log(c / total) if c > 0 else -100.0 for p, c in keep.items()}


# ---------------------------------------------------------------------------
# Training: distributed (Spark) and reference (pure Python)
# ---------------------------------------------------------------------------


def _seed_logp(seed_counts: dict[str, int]) -> dict[str, float]:
    total = sum(seed_counts.values())
    return {p: math.log(c / total) for p, c in seed_counts.items() if c > 0}


def _seed_from_unit_counts(
    unit_counts: list[tuple[str, int]],
    max_piece_len: int,
    max_seed_pieces: int,
) -> dict[str, int]:
    """Top substrings by (count desc, piece asc), single chars always in."""
    sub: Counter[str] = Counter()
    for unit, cnt in unit_counts:
        n = len(unit)
        for i in range(n):
            for j in range(i + 1, min(n, i + max_piece_len) + 1):
                sub[unit[i:j]] += cnt
    singles = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )
    seed = dict(singles)
    for p, c in multi[: max(0, max_seed_pieces - len(singles))]:
        seed[p] = c
    return seed


def train_unigram_reference(
    texts: list[str],
    vocab_size: int = 512,
    num_iters: int = 4,
    max_piece_len: int = 6,
    max_seed_pieces: int = 4096,
    shrink: float = 0.75,
) -> list[tuple[str, float]]:
    """Pure-Python reference trainer — the ground truth the distributed
    trainer must match bit-for-bit. Returns (piece, logprob) sorted by
    piece."""
    units: Counter[str] = Counter()
    for t in texts:
        if t:
            units.update(_units(t))
    unit_counts = sorted(units.items())
    logp = _seed_logp(
        _seed_from_unit_counts(unit_counts, max_piece_len, max_seed_pieces)
    )
    for it in range(num_iters):
        micro: dict[str, int] = {}
        for unit, cnt in unit_counts:
            for piece, m in _unit_micro_counts(
                unit, cnt, logp, max_piece_len
            ).items():
                micro[piece] = micro.get(piece, 0) + m
        logp = _m_step_and_prune(
            micro, logp, vocab_size, shrink, final_round=(it == num_iters - 1)
        )
    return sorted(logp.items())


def train_unigram(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 512,
    num_iters: int = 4,
    max_piece_len: int = 6,
    max_seed_pieces: int = 4096,
    shrink: float = 0.75,
    max_distinct_units: int = 2_000_000,
) -> list[tuple[str, float]]:
    """Distributed unigram-LM trainer. Returns (piece, logprob) sorted by
    piece — bit-identical to :func:`train_unigram_reference` on the same
    corpus (asserted in tests).

    Plan shape per EM round: ONE Arrow-batched map over the persisted
    (unit, count) frame emitting (piece, micro_count) rows, then ONE
    combinable bigint hash aggregate bounded by |pieces|; the collect is
    the |pieces|-sized model, guarded. Corpus text is folded into the
    unit frame exactly once, up front.

    100 TB posture: the unit frame is the distinct-unit vocabulary
    (Zipf-bounded); ``max_distinct_units`` raises rather than silently
    ballooning the driver's seed step — beyond it, raise
    ``max_piece_len``/sampling upstream, the model itself stays small.
    """
    from pyspark import StorageLevel
    from home_credit_data_engineering_spark.functions.text import tokens

    units = (
        df.select(F.explode(tokens(text_col)).alias("u"))
        .filter(F.col("u") != "")
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        n_units = units.count()
        if n_units > max_distinct_units:
            raise ValueError(
                f"{n_units} distinct units exceeds max_distinct_units="
                f"{max_distinct_units}"
            )
        # Seed: substring explode JVM-side (no Python until the E-step),
        # top-(count desc, piece asc) + all single chars.
        subs = (
            units.select(
                F.explode(
                    F.flatten(
                        F.expr(
                            f"""transform(sequence(1, length(u)), i ->
                           transform(sequence(i, least(i + {max_piece_len - 1},
                                                        length(u))), j ->
                             substring(u, i, j - i + 1)))"""
                        )
                    )
                ).alias("piece"),
                F.col("cnt"),
            )
            .groupBy("piece")
            .agg(F.sum("cnt").alias("c"))
            # both seed collects read this aggregate; persist so the
            # substring explosion (the priciest non-EM pass) runs once
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        singles = {
            r["piece"]: int(r["c"])
            for r in subs.filter(F.length("piece") == 1).collect()
        }
        multi_rows = (
            subs.filter(F.length("piece") > 1)
            .orderBy(F.col("c").desc(), F.col("piece"))
            .limit(max(0, max_seed_pieces - len(singles)))
            .collect()
        )
        subs.unpersist()
        seed = dict(singles)
        for r in multi_rows:
            seed[r["piece"]] = int(r["c"])
        logp = _seed_logp(seed)

        for it in range(num_iters):
            logp_b = dict(logp)  # ships in the UDF closure
            mpl = max_piece_len

            def e_step(batches):
                for pdf in batches:
                    pieces: list[str] = []
                    micros: list[int] = []
                    for unit, cnt in zip(pdf["u"], pdf["cnt"]):
                        for piece, m in _unit_micro_counts(
                            unit, int(cnt), logp_b, mpl
                        ).items():
                            pieces.append(piece)
                            micros.append(m)
                    yield pd.DataFrame({"piece": pieces, "micro": micros})

            agg = (
                units.mapInPandas(e_step, "piece string, micro bigint")
                .groupBy("piece")
                .agg(F.sum("micro").alias("micro"))
            )
            micro = {r["piece"]: int(r["micro"]) for r in agg.collect()}
            logp = _m_step_and_prune(
                micro, logp, vocab_size, shrink,
                final_round=(it == num_iters - 1),
            )
        return sorted(logp.items())
    finally:
        units.unpersist()


# ---------------------------------------------------------------------------
# Encoding (Viterbi) + vocabulary utilities
# ---------------------------------------------------------------------------


def unigram_encode(
    text: str, logp: dict[str, float], max_piece_len: int = 6
) -> list[str]:
    """Viterbi segmentation of each whitespace unit: the most probable
    piece sequence; ties prefer the LONGER piece at each boundary (then
    the DP's left-to-right structure makes the result unique). Characters
    absent from the vocabulary emit :data:`UNK_PIECE`."""
    out: list[str] = []
    for unit in _units(text):
        n = len(unit)
        best = [(-math.inf, 0)] * (n + 1)  # (score, start_of_last_piece)
        best[0] = (0.0, 0)
        for j in range(1, n + 1):
            for i in range(max(0, j - max_piece_len), j):
                lp = logp.get(unit[i:j])
                if lp is None or best[i][0] == -math.inf:
                    continue
                score = best[i][0] + lp
                # strictly better, or equal score with an EARLIER start
                # (= longer final piece) wins
                if score > best[j][0] or (
                    score == best[j][0] and i < best[j][1]
                ):
                    best[j] = (score, i)
            if best[j][0] == -math.inf:
                # unreachable position: unknown char at j-1 — emit UNK for
                # it and restart the lattice after it
                best[j] = (best[j - 1][0], -1)
        pieces: list[str] = []
        j = n
        while j > 0:
            i = best[j][1]
            if i == -1:
                pieces.append(UNK_PIECE)
                j -= 1
            else:
                pieces.append(unit[i:j])
                j = i
        out.extend(reversed(pieces))
    return out


def unigram_vocab_ids(logp: dict[str, float]) -> dict[str, int]:
    """piece → token id: UNK_PIECE gets 0, then pieces in sorted order —
    a pure function of the piece set, so the same vocab always yields
    the same ids everywhere."""
    ids = {UNK_PIECE: 0}
    for i, piece in enumerate(sorted(logp)):
        ids[piece] = i + 1
    return ids


def unigram_encode_ids(
    text: str,
    logp: dict[str, float],
    ids: dict[str, int],
    max_piece_len: int = 6,
) -> list[int]:
    return [ids[p] for p in unigram_encode(text, logp, max_piece_len)]


def unigram_token_ids_col(
    text_col: Column | str,
    vocab: list[tuple[str, float]],
    max_piece_len: int = 6,
) -> Column:
    """``array<int>`` column of unigram token ids — the drop-in
    equivalent of ``bpe.bpe_token_ids_col`` for the packing operators
    (``write_packed_corpus(..., ids_col=...)`` and the pack CLI consume
    it unchanged). Arrow-batched; NULL text encodes to an empty array."""
    from pyspark.sql.functions import pandas_udf

    logp = dict(vocab)
    ids = unigram_vocab_ids(logp)

    @pandas_udf("array<int>")
    def _ids(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: []
            if t is None
            else unigram_encode_ids(t, logp, ids, max_piece_len)
        )

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _ids(c)


def unigram_stats_col(
    text_col: Column | str,
    vocab: list[tuple[str, float]],
    max_piece_len: int = 6,
) -> Column:
    """``struct<coverage_chars bigint, n_tokens bigint>`` from the REAL
    Viterbi encoding of each row: ``coverage_chars`` sums piece lengths
    (UNK counts as its one covered character) and must equal the row's
    non-whitespace character count — the lossless-partition invariant,
    which an independent engine can compute WITHOUT running Viterbi.
    That is the cross-engine certificate the ``combo_text_terms``
    unigram leg and ``text_unigram_token_stats`` ride."""
    from pyspark.sql.functions import pandas_udf

    logp = dict(vocab)

    @pandas_udf("struct<coverage_chars: bigint, n_tokens: bigint>")
    def _stats(s: pd.Series) -> pd.DataFrame:
        cov: list[int] = []
        ntok: list[int] = []
        for t in s:
            if t is None:
                cov.append(0)
                ntok.append(0)
                continue
            pieces = unigram_encode(t, logp, max_piece_len)
            cov.append(
                sum(1 if p == UNK_PIECE else len(p) for p in pieces)
            )
            ntok.append(len(pieces))
        return pd.DataFrame({"coverage_chars": cov, "n_tokens": ntok})

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _stats(c)


def save_unigram(vocab: list[tuple[str, float]], path: str) -> None:
    """``piece<TAB>logprob`` per line (piece order = id order - 1)."""
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("# unigram-LM vocab: piece\\tlogprob (repr round-trip)\n")
        for piece, lp in vocab:
            fh.write(f"{piece}\t{lp!r}\n")


def load_unigram(path: str | None = None) -> list[tuple[str, float]]:
    vocab: list[tuple[str, float]] = []
    with open(path or DEFAULT_UNIGRAM_PATH, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            piece, sep, lp = line.partition("\t")
            if not sep:
                # comment = a TABLESS line starting with '#'. Data lines
                # always carry a tab, so a learned piece '#' (count-kept:
                # single chars are never pruned) round-trips instead of
                # being swallowed as a comment (review r9 finding).
                if line.startswith("#"):
                    continue
                raise ValueError(f"malformed unigram vocab line: {line!r}")
            vocab.append((piece, float(lp)))
    return vocab
