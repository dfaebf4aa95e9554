"""Multimodal (binary) column plumbing (north-star extension).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched pandas functions over ``mapInPandas``
— the pattern for decode / feature-extract / resize / frame-sample stages
in a 100 TB multimodal pipeline:

- the binary payload never round-trips through Python row-by-row (Arrow
  moves whole batches);
- output schema is declared up front, so downstream plans stay columnar;
- partitioning is preserved (mapInPandas is a narrow transformation — no
  shuffle).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
:func:`decode_stub` is a clearly-marked deterministic fake: it derives
"metadata" from the byte content alone. The Spark-side plumbing — schema,
batch iteration, UDF signature — is real and tested; swap ``_fake_decode``
for a real decoder without touching the plan. Real-decoder entry points
raise ``NotImplementedError`` by design.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the (stub) decoder — what a real image decoder would
#: emit as typed metadata next to the payload.
DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic fake 'decode': metadata derived from byte length only.
    Replicable in ANSI SQL, which lets the oracle check the mapInPandas
    plumbing end-to-end."""
    n = len(payload)
    return n, 64 + n % 576, 48 + n % 432, 1 + n % 8


def decode_stub(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Arrow-batched 'decode' of a binary column via mapInPandas.

    Narrow transformation: each input batch yields one output batch; no
    shuffle, no driver involvement. Replace ``_fake_decode`` with a real
    codec (behind the same signature) for production.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[binary_col].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": meta.map(lambda m: m[0]),
                    "width": meta.map(lambda m: m[1]),
                    "height": meta.map(lambda m: m[2]),
                    "n_frames": meta.map(lambda m: m[3]),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(decode_batches, DECODE_SCHEMA)


def decode_image(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Real image decode — requires PIL, not present in this container."""
    raise NotImplementedError(
        "Image codecs are not available in this environment; use decode_stub "
        "for plumbing tests and swap in a PIL/libvips decoder in production."
    )


def resize_frames(df: DataFrame, binary_col: str, width: int, height: int) -> DataFrame:
    """Real resize — requires an image library, not present here."""
    raise NotImplementedError(
        "Resize requires an image library; the mapInPandas pattern matches "
        "decode_stub (binary in → binary out with declared schema)."
    )


def with_binary_payload(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Materialize a binary column from text (UTF-8 bytes) — the stand-in
    for reading real media bytes; gives tests a genuine BinaryType column."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))
