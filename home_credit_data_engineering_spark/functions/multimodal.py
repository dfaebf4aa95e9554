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
            # Vectorized over the whole Arrow batch: one len() pass, then
            # numpy arithmetic (a per-row decode lambda costs ~4× more).
            n = pdf[binary_col].map(len).to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n,
                    "width": 64 + n % 576,
                    "height": 48 + n % 432,
                    "n_frames": 1 + n % 8,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(decode_batches, DECODE_SCHEMA)


#: Output schema of the (stub) feature extractor: a fixed-dim embedding
#: per payload.
FEATURE_DIM = 16
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def extract_features_stub(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Arrow-batched 'feature extraction': payload bytes → fixed-dim vector.

    The fake featurizer is a deterministic byte histogram (16 buckets,
    L1-normalized) — stands in for an image/audio embedding model while
    keeping the real pipeline shape: binary column in, `array<double>`
    out, batch-at-a-time, no shuffle. Downstream this feeds the similarity
    operators exactly like a real embedding column (see
    tests/test_multimodal.py).
    """

    def featurize(batches):
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf[binary_col]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(
                    "float64"
                )
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col], "feature": feats})

    return df.select(id_col, binary_col).mapInPandas(featurize, FEATURE_SCHEMA)


def sample_frames_stub(
    df: DataFrame, id_col: str, binary_col: str, every_n: int = 4
) -> DataFrame:
    """Arrow-batched 'frame sampling': one output row per sampled frame.

    The fake frame decoder treats each 64-byte block of the payload as a
    'frame' and emits every ``every_n``-th block — the 1→N row expansion
    shape of real video frame sampling (mapInPandas may yield more output
    rows than input rows; schema declared, partitioning preserved).
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("frame_index", T.LongType(), True),
            T.StructField("frame_bytes", T.BinaryType(), True),
        ]
    )

    def sample(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                blocks = [
                    payload[i : i + 64] for i in range(0, len(payload), 64)
                ]
                for j in range(0, len(blocks), every_n):
                    ids.append(doc_id)
                    idxs.append(j)
                    frames.append(blocks[j])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_index": idxs, "frame_bytes": frames}
            )

    return df.select(id_col, binary_col).mapInPandas(sample, out_schema)


def resize_stub(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    width: int = 8,
    height: int = 8,
) -> DataFrame:
    """Arrow-batched 'resize': payload bytes → fixed ``width*height``-byte
    payload (binary in → binary out, the real resize signature).

    The fake resampler is deterministic nearest-neighbor over the byte
    stream: ``width*height`` taps at evenly-spaced source offsets (empty
    payloads resize to zero bytes). Stands in for a PIL/libvips resize
    while keeping the production plumbing honest: declared output
    schema, batch-at-a-time, no shuffle, 1→1 rows.
    """
    if width < 1 or height < 1:
        raise ValueError(f"width/height must be >= 1, got {width}x{height}")
    n_out = width * height
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("resized", T.BinaryType(), True),
            T.StructField("out_width", T.IntegerType(), True),
            T.StructField("out_height", T.IntegerType(), True),
        ]
    )

    def resample(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for payload in pdf[binary_col]:
                src = np.frombuffer(payload, dtype=np.uint8)
                if len(src) == 0:
                    out.append(b"")
                    continue
                taps = (np.arange(n_out) * len(src)) // n_out
                out.append(src[taps].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "resized": out,
                    "out_width": width,
                    "out_height": height,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(resample, out_schema)


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
