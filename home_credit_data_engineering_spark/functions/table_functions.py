"""Python UDTF surface (SURVEY §2.11 — empty in the reference).

User-defined TABLE functions are the last-resort extension point for
one-row-to-many-rows logic that needs a Python library (a real
tokenizer, a format parser). They run Python per input row (Arrow-ferried
here via ``useArrow=True``), which is 10-100× slower than whole-stage
codegen — so every operator this engine ships expresses its expansion
with built-ins instead (``chunk_documents`` is sequence+explode+slice;
shingles are ``lead()`` windows). This module exists to certify the API
surface and its correct usage pattern, and the test suite pins a UDTF
against its built-in twin so the two can never drift.

Usage (SQL lateral join — the UDTF-idiomatic shape)::

    spark.udtf.register("chunk_text", ChunkText)
    spark.sql("SELECT d.doc_id, c.* FROM docs d, "
              "LATERAL chunk_text(d.text, 64, 32) c")
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

__all__ = ["ChunkText", "register_table_functions"]


@udtf(
    returnType="chunk_id int, chunk_start int, chunk_len int, chunk_text string",
    useArrow=True,
)
class ChunkText:
    """Overlapping token-window chunks of one document — the Python twin
    of :func:`~..operators.packing.chunk_documents` (same contract:
    chunk ``i`` covers ``[i*stride, i*stride + chunk_tokens)``, trailing
    partials kept, blank text yields no rows). Production code uses the
    built-in operator; this UDTF exists as the §2.11 surface
    demonstration, equality-pinned in ``tests/test_udtf.py``."""

    def eval(self, text: str, chunk_tokens: int, stride: int):
        if chunk_tokens is None or chunk_tokens < 1:
            raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
        if stride is None or stride < 1:
            raise ValueError(f"stride must be >= 1, got {stride}")
        toks = (text or "").split()
        for i, start in enumerate(range(0, len(toks), stride)):
            window = toks[start : start + chunk_tokens]
            yield i, start, len(window), " ".join(window)


def register_table_functions(spark) -> None:
    """Register every UDTF under its SQL name (idempotent)."""
    spark.udtf.register("chunk_text", ChunkText)
