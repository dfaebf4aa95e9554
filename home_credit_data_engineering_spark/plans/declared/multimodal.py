"""Multimodal declared queries: binary-column decode plumbing via
mapInPandas — the stub decoder (deterministic byte-length arithmetic)
for the codec-requiring formats, and the REAL BMP/PPM decode+resize
(struct+numpy, see functions/multimodal.py) over planted payloads whose
pixel checksums have closed forms the oracle recomputes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.multimodal import (
    decode_stub,
    with_binary_payload,
)
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata


@register(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(64 + octet_length(encode(text)) % 576 AS BIGINT) AS width,
           CAST(48 + octet_length(encode(text)) % 432 AS BIGINT) AS height,
           CAST(1 + octet_length(encode(text)) % 8 AS BIGINT) AS n_frames
    FROM documents
    """,
    operators=("M-ext:decode",),
    doc="Binary-column decode plumbing: text → UTF-8 binary payload → "
    "Arrow-batched mapInPandas 'decoder' emitting typed metadata. The "
    "decode itself is a deterministic stub (codecs absent here); the "
    "schema/batching/partitioning path is the real thing.",
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs, "text")
    return decode_stub(payloads, "doc_id", "payload")


def _plant_rasters(batches):
    """Planting half of the real-decode certificate: per doc_id, an
    actual BMP (even ids) or PPM (odd ids) payload, width 4 + id%5,
    height 3 + id%4, image row r filled with byte (id%200 + r) — the
    row-VARYING fill makes BMP's bottom-up row order and 4-byte row
    padding visible in top_row_sum/n_pixel_bytes, so the decoder must
    really parse, not just measure lengths. (1e9 divides every modulus,
    so the planted shapes survive the 10x replica id shift.)"""
    import numpy as np
    import pandas as pd

    from home_credit_data_engineering_spark.functions.multimodal import (
        encode_bmp,
        encode_ppm,
    )

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h, base = 4 + d % 5, 3 + d % 4, d % 200
            px = np.tile(
                np.arange(base, base + h, dtype=np.uint8).reshape(h, 1, 1),
                (1, w, 3),
            )
            payloads.append(encode_bmp(px) if d % 2 == 0 else encode_ppm(px))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


@register(
    "multimodal_decode_real",
    # FULL oracle: every planted payload's dimensions and pixel
    # checksums in closed form. pixel_sum = 3w * (h*base + h(h-1)/2)
    # (row r contributes 3w*(base+r)); top_row_sum = 3w*base certifies
    # BMP's bottom-up row order was honored; the resized leg re-decodes
    # the 6x4 nearest-neighbor PPM whose row r' samples source row
    # (r'*h)//4.
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS format,
           CAST(4 + doc_id % 5 AS BIGINT) AS width,
           CAST(3 + doc_id % 4 AS BIGINT) AS height,
           CAST(3 * (4 + doc_id % 5) * (3 + doc_id % 4) AS BIGINT)
             AS n_pixel_bytes,
           CAST(3 * (4 + doc_id % 5)
                * ((3 + doc_id % 4) * (doc_id % 200)
                   + ((3 + doc_id % 4) * (3 + doc_id % 4 - 1)) // 2)
             AS BIGINT) AS pixel_sum,
           CAST(3 * (4 + doc_id % 5) * (doc_id % 200) AS BIGINT)
             AS top_row_sum,
           CAST(18 * list_sum(list_transform(range(4),
                r -> doc_id % 200 + (r * (3 + doc_id % 4)) // 4))
             AS BIGINT) AS r_pixel_sum
    FROM documents
    WHERE doc_id % 3 = 0
    """,
    operators=("M-ext:decode",),
    doc="REAL image decode + resize for codec-free rasters "
    "(functions/multimodal.py:decode_image/resize_frames — pure "
    "struct+numpy, no PIL): planted 24-bit BI_RGB BMPs (bottom-up rows, "
    "4-byte padding) and binary PPMs decode to true dimensions and "
    "pixel checksums, then nearest-neighbor resize to 6x4 re-encodes "
    "as PPM and re-decodes. The oracle recomputes every value in "
    "closed form, so a decoder that miscounts padding, ignores the "
    "bottom-up order, or fakes the resample hash-mismatches. JPEG/PNG "
    "remain honestly NotImplementedError (codecs absent).",
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.multimodal import (
        decode_image,
        resize_frames,
    )

    docs = (
        read_testdata(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
    )
    planted = docs.mapInPandas(_plant_rasters, "doc_id long, payload binary")
    dec = decode_image(planted, "doc_id", "payload")
    resized = resize_frames(planted, "doc_id", "payload", width=6, height=4)
    rdec = decode_image(resized, "doc_id", "resized").select(
        "doc_id", F.col("pixel_sum").alias("r_pixel_sum")
    )
    return dec.join(rdec, "doc_id").select(
        "doc_id",
        "format",
        "width",
        "height",
        "n_pixel_bytes",
        "pixel_sum",
        "top_row_sum",
        "r_pixel_sum",
    )


def _plant_wavs(batches):
    """Planting half of the real audio-decode certificate: per doc_id a
    PCM WAV at 8 kHz, 1 + id%2 channels, 50 + id%40 frames, frame i
    holding value (id%100 + i) on every channel — frame-varying values
    pin the data-chunk offset and channel interleaving. (1e9 divides
    every modulus, so shapes survive the 10x replica id shift.)"""
    import numpy as np
    import pandas as pd

    from home_credit_data_engineering_spark.functions.multimodal import (
        encode_wav,
    )

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            ch, n, base = 1 + d % 2, 50 + d % 40, d % 100
            frames = np.tile(
                np.arange(base, base + n, dtype=np.int16).reshape(n, 1),
                (1, ch),
            )
            payloads.append(encode_wav(frames, sample_rate=8000))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


@register(
    "multimodal_audio_real",
    # FULL oracle: dimensions, duration, and sample checksums of every
    # planted WAV in closed form — sample_sum = ch*(n*base + n(n-1)/2)
    # (frame i contributes ch*(base+i)); the resampled leg re-decodes
    # the 4 kHz nearest-neighbor output whose frame i samples source
    # frame 2i, so r_sample_sum = ch*((n//2)*base + (n//2)*((n//2)-1)).
    oracle="""
    SELECT doc_id, 'wav' AS format,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
           CAST(50 + doc_id % 40 AS BIGINT) AS n_samples,
           CAST((50 + doc_id % 40) * 1000 // 8000 AS BIGINT) AS duration_ms,
           CAST((1 + doc_id % 2)
                * ((50 + doc_id % 40) * (doc_id % 100)
                   + ((50 + doc_id % 40) * (50 + doc_id % 40 - 1)) // 2)
             AS BIGINT) AS sample_sum,
           CAST((1 + doc_id % 2) * (doc_id % 100) AS BIGINT)
             AS first_frame_sum,
           CAST((1 + doc_id % 2)
                * (((50 + doc_id % 40) // 2) * (doc_id % 100)
                   + ((50 + doc_id % 40) // 2)
                     * (((50 + doc_id % 40) // 2) - 1))
             AS BIGINT) AS r_sample_sum
    FROM documents WHERE doc_id % 3 = 1
    """,
    operators=("M-ext:decode",),
    doc="REAL audio decode + resample for PCM WAV "
    "(functions/multimodal.py:decode_audio/resample_audio — pure "
    "struct+numpy RIFF chunk walker, word-aligned chunk skipping, no "
    "torchaudio): planted 8 kHz mono/stereo WAVs decode to true "
    "rate/channels/frames/duration and sample checksums (frame-varying "
    "values pin data-chunk offset and interleaving), then "
    "nearest-neighbor resample to 4 kHz re-encodes and re-decodes. "
    "Every value recomputed in closed form by the oracle; compressed "
    "audio (mp3/ogg/aac) honestly raises — codec-only surface.",
)
def multimodal_audio_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.multimodal import (
        decode_audio,
        resample_audio,
    )

    docs = (
        read_testdata(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .select("doc_id")
    )
    planted = docs.mapInPandas(_plant_wavs, "doc_id long, payload binary")
    dec = decode_audio(planted, "doc_id", "payload")
    res = resample_audio(planted, "doc_id", "payload", target_rate=4000)
    rdec = decode_audio(res, "doc_id", "resampled").select(
        "doc_id", F.col("sample_sum").alias("r_sample_sum")
    )
    return dec.join(rdec, "doc_id").select(
        "doc_id",
        "format",
        "sample_rate",
        "n_channels",
        "n_samples",
        "duration_ms",
        "sample_sum",
        "first_frame_sum",
        "r_sample_sum",
    )
