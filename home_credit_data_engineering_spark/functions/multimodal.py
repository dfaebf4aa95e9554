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

Codec-FREE raster formats (uncompressed 24-bit BMP, binary PPM) decode
and resize for REAL here — pure struct+numpy, no image library
(:func:`decode_image`, :func:`resize_frames`). Compressed formats
(JPEG/PNG/video) genuinely require codecs (PIL/ffmpeg/torchaudio) that
are NOT in this container: for those, :func:`decode_stub` is a
clearly-marked deterministic fake deriving "metadata" from byte content
alone, and the real entry points raise ``NotImplementedError`` when
handed such a payload. The Spark-side plumbing — schema, batch
iteration, UDF signature — is identical either way, so a production
codec swaps in without touching the plan.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
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


# ---------------------------------------------------------------------------
# REAL decode/resize for codec-free raster formats (BMP BI_RGB 24-bit,
# binary PPM "P6"). Pure struct+numpy — no PIL — in the same
# mapInPandas shape as the stubs, so the plumbing (schema, batching,
# no-shuffle) is identical whether the decoder is this one or libvips.
# Compressed formats (JPEG/PNG/...) still require a codec library and
# raise NotImplementedError — that surface is now genuinely codec-only.
# ---------------------------------------------------------------------------


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as an uncompressed 24-bit
    BI_RGB BMP (BITMAPINFOHEADER, rows bottom-up, 4-byte row padding) —
    the planting half of the decode tests/oracle."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got {pixels.shape}")
    stride = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = pixels[r][:, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (stride - len(row))
    size = 14 + 40 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(body)


def encode_ppm(pixels: "np.ndarray") -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as binary PPM (P6,
    maxval 255, rows top-down, no padding)."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got {pixels.shape}")
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.tobytes()


def _decode_bmp(payload: bytes) -> tuple[str, "np.ndarray"]:
    """Uncompressed 24-bit BI_RGB BMP → (h, w, 3) RGB uint8 (top-down)."""
    if len(payload) < 54:
        raise ValueError("BMP truncated before headers")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bits = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bits != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BI_RGB BMP is codec-free "
            f"(got bits={bits}, compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(payload) < offset + stride * h:
        raise ValueError("BMP truncated before pixel data end")
    rows = (
        np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
        .reshape(h, stride)[:, : w * 3]
        .reshape(h, w, 3)
    )
    if bottom_up:
        rows = rows[::-1]
    return "bmp", rows[:, :, ::-1]  # BGR -> RGB


def _decode_ppm(payload: bytes) -> tuple[str, "np.ndarray"]:
    """Binary PPM (P6, maxval <= 255) → (h, w, 3) RGB uint8."""
    # header: magic, width, height, maxval as whitespace-separated
    # tokens, '#' comments allowed, ONE whitespace byte before pixels
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM (maxval > 255) not supported")
    n = w * h * 3
    if len(payload) < pos + n:
        raise ValueError("PPM truncated before pixel data end")
    return "ppm", np.frombuffer(
        payload, dtype=np.uint8, count=n, offset=pos
    ).reshape(h, w, 3)


def _decode_raster(payload: bytes) -> tuple[str, "np.ndarray"]:
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise NotImplementedError(
        "payload is not a codec-free raster (BMP/PPM); JPEG/PNG/... "
        "require an image library (PIL/libvips) not present here"
    )


#: Output schema of the real decoder: typed metadata + two checksums.
#: ``pixel_sum`` is byte-order-insensitive; ``top_row_sum`` is not — a
#: decoder that forgets BMP's bottom-up row order or miscounts row
#: padding produces the right pixel_sum with the wrong top_row_sum /
#: n_pixel_bytes, so the pair certifies real parsing, not length math.
DECODE_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("channels", T.LongType(), True),
        T.StructField("n_pixel_bytes", T.LongType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("top_row_sum", T.LongType(), True),
    ]
)


def decode_image(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """REAL image decode for codec-free rasters (24-bit BI_RGB BMP,
    binary PPM) via mapInPandas: binary in → typed metadata + pixel
    checksums out. Same narrow, Arrow-batched plan shape as
    :func:`decode_stub`; payloads in compressed formats raise
    ``NotImplementedError`` (JPEG/PNG genuinely need a codec library)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                fmt, px = _decode_raster(bytes(payload))
                rows.append(
                    (
                        doc_id,
                        fmt,
                        px.shape[1],
                        px.shape[0],
                        px.shape[2],
                        int(px.size),
                        int(px.sum(dtype="int64")),
                        int(px[0].sum(dtype="int64")),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODE_IMAGE_SCHEMA.fields]
            )

    return df.select(id_col, binary_col).mapInPandas(
        decode_batches, DECODE_IMAGE_SCHEMA
    )


def resize_frames(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    width: int,
    height: int,
) -> DataFrame:
    """REAL nearest-neighbor resize for codec-free rasters: decode
    (BMP/PPM), resample to ``width × height`` with floor-tap nearest
    neighbor (``src_r = r * h // height``), re-encode as PPM P6.
    Binary in → binary out, 1→1 rows, declared schema, no shuffle —
    the production resize signature with a real resampler behind it."""
    if width < 1 or height < 1:
        raise ValueError(f"width/height must be >= 1, got {width}x{height}")
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("resized", T.BinaryType(), True),
            T.StructField("out_width", T.IntegerType(), True),
            T.StructField("out_height", T.IntegerType(), True),
        ]
    )

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                _fmt, px = _decode_raster(bytes(payload))
                h, w, _ = px.shape
                taps_r = (np.arange(height) * h) // height
                taps_c = (np.arange(width) * w) // width
                outs.append(encode_ppm(px[taps_r][:, taps_c]))
                ids.append(doc_id)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "resized": outs,
                    "out_width": width,
                    "out_height": height,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(resample, out_schema)


def encode_wav(samples: "np.ndarray", sample_rate: int = 16000) -> bytes:
    """Encode an ``(n_samples,)`` or ``(n_samples, n_channels)`` int16
    array as a PCM WAV (RIFF/WAVE, fmt chunk 16, audio format 1)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    hdr = (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16
        )
        + struct.pack("<4sI", b"data", len(data))
    )
    return hdr + data


#: Output schema of the real WAV decoder: typed audio metadata + sample
#: checksums. ``sample_sum`` is position-insensitive; ``first_frame_sum``
#: pins channel interleaving and data-chunk offset.
DECODE_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_channels", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_sum", T.LongType(), True),
        T.StructField("first_frame_sum", T.LongType(), True),
    ]
)


def _decode_wav(payload: bytes) -> tuple[dict, "np.ndarray"]:
    """PCM 16-bit WAV → (meta dict, (n_samples, n_channels) int16).
    Walks the RIFF chunk list (fmt may be followed by LIST/fact chunks
    before data); compressed/float formats raise — they need a codec."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "payload is not a RIFF/WAVE container; compressed audio "
            "(mp3/ogg/aac) requires a codec library not present here"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"data" and pos + 8 + size > len(payload):
            # the chunk size field is untrusted input: a data chunk
            # declaring more bytes than the payload holds would silently
            # truncate samples (wrong n_samples/duration) — raise, the
            # same contract as the BMP/PPM 'truncated before pixel data
            # end' guards
            raise ValueError(
                f"WAV data chunk declares {size} bytes but payload ends "
                f"{pos + 8 + size - len(payload)} bytes short — truncated"
            )
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _brate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV is codec-free (got format={audio_fmt}, "
            f"bits={bits})"
        )
    if ch < 1 or rate < 1:
        # corrupt fmt chunk: raise the module's descriptive contract,
        # not a ZeroDivisionError deep in a task
        raise ValueError(
            f"corrupt WAV fmt chunk: channels={ch}, sample_rate={rate}"
        )
    n = len(data) // (ch * 2)
    samples = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
    return {"sample_rate": rate, "n_channels": ch}, samples


def decode_audio(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """REAL audio decode for PCM WAV via mapInPandas — the audio twin of
    :func:`decode_image`: binary in → typed metadata + sample checksums
    out, Arrow-batched, no shuffle. Compressed audio raises."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                meta, s = _decode_wav(bytes(payload))
                rows.append(
                    (
                        doc_id,
                        "wav",
                        meta["sample_rate"],
                        s.shape[1],
                        s.shape[0],
                        s.shape[0] * 1000 // meta["sample_rate"],
                        int(s.sum(dtype="int64")),
                        int(s[0].sum(dtype="int64")) if len(s) else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODE_AUDIO_SCHEMA.fields]
            )

    return df.select(id_col, binary_col).mapInPandas(
        decode_batches, DECODE_AUDIO_SCHEMA
    )


def resample_audio(
    df: DataFrame, id_col: str, binary_col: str, target_rate: int
) -> DataFrame:
    """REAL nearest-neighbor resample for PCM WAV: decode, pick source
    frames at ``src_i = i * rate // target_rate``, re-encode at the
    target rate — binary in → binary out, 1→1 rows, the audio twin of
    :func:`resize_frames` (a production pipeline swaps the tap-picker
    for a windowed-sinc kernel behind the same signature)."""
    if target_rate < 1:
        raise ValueError(f"target_rate must be >= 1, got {target_rate}")
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("resampled", T.BinaryType(), True),
            T.StructField("out_rate", T.IntegerType(), True),
        ]
    )

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                meta, s = _decode_wav(bytes(payload))
                rate = meta["sample_rate"]
                n_out = int(len(s)) * target_rate // rate
                taps = (np.arange(n_out) * rate) // target_rate
                outs.append(encode_wav(s[taps], sample_rate=target_rate))
                ids.append(doc_id)
            yield pd.DataFrame(
                {"doc_id": ids, "resampled": outs, "out_rate": target_rate}
            )

    return df.select(id_col, binary_col).mapInPandas(resample, out_schema)


def with_binary_payload(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Materialize a binary column from text (UTF-8 bytes) — the stand-in
    for reading real media bytes; gives tests a genuine BinaryType column."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))
