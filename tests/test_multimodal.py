"""Multimodal plumbing tests: binary payloads through mapInPandas stages
(decode metadata, feature extraction, frame sampling) and the handoff into
the similarity operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_image,
    decode_stub,
    extract_features_stub,
    sample_frames_stub,
    with_binary_payload,
)
from home_credit_data_engineering_spark.sources.readers import read_testdata


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    docs = read_testdata(spark, sf_dir, "documents").limit(50)
    return with_binary_payload(docs, "text")


def test_binary_column_type(payloads):
    assert dict(payloads.dtypes)["payload"] == "binary"


def test_decode_stub_metadata(payloads):
    rows = decode_stub(payloads, "doc_id", "payload").collect()
    assert len(rows) == 50
    for r in rows:
        assert r["width"] == 64 + r["n_bytes"] % 576
        assert r["height"] == 48 + r["n_bytes"] % 432
        assert 1 <= r["n_frames"] <= 8


def test_feature_extraction_feeds_similarity(spark, payloads):
    feats = extract_features_stub(payloads, "doc_id", "payload")
    rows = feats.collect()
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows)
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-9 for r in rows)  # L1-normalized

    # The extracted features behave as an embedding column downstream.
    from home_credit_data_engineering_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = feats.select(
        F.col("doc_id").alias("vec_id"),
        F.col("feature").cast("array<float>").alias("embedding"),
    )
    top = brute_force_topk(emb, emb.limit(5), k=3)
    got = top.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in got)


def test_frame_sampling_expands_rows(payloads):
    frames = sample_frames_stub(payloads, "doc_id", "payload", every_n=2)
    rows = frames.collect()
    assert len(rows) > 50  # 1→N expansion
    assert all(r["frame_index"] % 2 == 0 for r in rows)
    assert all(len(r["frame_bytes"]) <= 64 for r in rows)


def test_real_decoder_rejects_codec_formats(payloads):
    # text payloads are not codec-free rasters: the real decoder must
    # refuse them loudly (execution-time, per-payload) instead of
    # emitting fake metadata — the honest boundary of the no-PIL decode
    with pytest.raises(Exception, match="codec-free raster"):
        decode_image(payloads, "doc_id", "payload").collect()


def test_real_decode_bmp_ppm_and_resize(spark):
    import numpy as np

    from home_credit_data_engineering_spark.functions.multimodal import (
        encode_bmp,
        encode_ppm,
        resize_frames,
    )

    rng = np.random.RandomState(7)
    px1 = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
    px2 = rng.randint(0, 256, (3, 4, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(px1))), (2, bytearray(encode_ppm(px2)))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in decode_image(df, "doc_id", "payload").collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("bmp", 7, 5)
    assert got[1]["pixel_sum"] == int(px1.sum())
    assert got[1]["top_row_sum"] == int(px1[0].sum())  # bottom-up honored
    assert got[1]["n_pixel_bytes"] == 7 * 5 * 3  # padding excluded
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("ppm", 4, 3)
    assert got[2]["pixel_sum"] == int(px2.sum())

    resized = resize_frames(df, "doc_id", "payload", width=4, height=2)
    rdec = {
        r["doc_id"]: r
        for r in decode_image(resized, "doc_id", "resized").collect()
    }
    taps_r = (np.arange(2) * 5) // 2
    taps_c = (np.arange(4) * 7) // 4
    assert rdec[1]["width"] == 4 and rdec[1]["height"] == 2
    assert rdec[1]["pixel_sum"] == int(px1[taps_r][:, taps_c].sum())


def test_resize_stub_fixed_output_size(spark):
    from home_credit_data_engineering_spark.functions.multimodal import (
        resize_stub,
        with_binary_payload,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 200), (2, "short"), (3, "")], ["doc_id", "text"]
    )
    payloads = with_binary_payload(docs, "text")
    out = {r.doc_id: r for r in resize_stub(payloads, "doc_id", "payload", 4, 4).collect()}
    assert len(out[1].resized) == 16 and len(out[2].resized) == 16
    assert out[3].resized == b""  # empty payload -> empty resize
    assert all(r.out_width == 4 and r.out_height == 4 for r in out.values())
    # deterministic nearest-neighbor: same input -> same bytes
    again = {r.doc_id: r.resized
             for r in resize_stub(payloads, "doc_id", "payload", 4, 4).collect()}
    assert {k: v.resized for k, v in out.items()} == again


def test_real_wav_decode_and_resample(spark):
    import numpy as np

    from home_credit_data_engineering_spark.functions.multimodal import (
        decode_audio,
        encode_wav,
        resample_audio,
    )

    rng = np.random.RandomState(3)
    mono = rng.randint(-32768, 32768, (160, 1)).astype(np.int16)
    stereo = rng.randint(-32768, 32768, (101, 2)).astype(np.int16)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(mono, 16000))),
            (2, bytearray(encode_wav(stereo, 44100))),
        ],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in decode_audio(df, "doc_id", "payload").collect()}
    assert (got[1]["sample_rate"], got[1]["n_channels"], got[1]["n_samples"]) == (
        16000, 1, 160,
    )
    assert got[1]["duration_ms"] == 10
    assert got[1]["sample_sum"] == int(mono.sum(dtype="int64"))
    assert got[2]["n_channels"] == 2
    assert got[2]["first_frame_sum"] == int(stereo[0].sum(dtype="int64"))

    res = resample_audio(df, "doc_id", "payload", target_rate=8000)
    rdec = {
        r["doc_id"]: r
        for r in decode_audio(res, "doc_id", "resampled").collect()
    }
    assert rdec[1]["sample_rate"] == 8000 and rdec[1]["n_samples"] == 80
    taps = (np.arange(80) * 16000) // 8000
    assert rdec[1]["sample_sum"] == int(mono[taps].sum(dtype="int64"))
    # compressed audio refuses loudly
    bad = spark.createDataFrame(
        [(9, bytearray(b"ID3\x03not-actually-pcm"))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="RIFF/WAVE"):
        decode_audio(bad, "doc_id", "payload").collect()


def test_wav_truncated_data_chunk_raises(spark):
    """The RIFF data-chunk size field is untrusted: declaring more bytes
    than the payload holds must raise (like the image decoders'
    truncation guards), not silently shorten n_samples/duration."""
    import struct

    import numpy as np

    from home_credit_data_engineering_spark.functions.multimodal import (
        decode_audio,
        encode_wav,
    )

    rng = np.random.RandomState(7)
    good = bytes(encode_wav(rng.randint(-100, 100, (40, 1)).astype(np.int16), 8000))
    # find the data chunk and inflate its declared size past the payload
    i = good.index(b"data")
    (size,) = struct.unpack_from("<I", good, i + 4)
    bad = good[: i + 4] + struct.pack("<I", size + 64) + good[i + 8 :]
    df = spark.createDataFrame(
        [(1, bytearray(bad))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="truncated"):
        decode_audio(df, "doc_id", "payload").collect()
