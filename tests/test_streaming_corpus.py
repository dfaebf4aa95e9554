"""Streaming corpus prep: stream==batch for the stateless passes.

The quality-flag and chunking streams run the same expressions as their
batch twins, so driving a file-source stream over the documents table
must reproduce the batch output exactly — rows, not just counts.
"""

from __future__ import annotations

from home_credit_data_engineering_spark.operators.packing import chunk_documents
from home_credit_data_engineering_spark.plans.quality_filter import (
    QualityThresholds,
    _flag,
    quality_rules,
)
from home_credit_data_engineering_spark.sources.readers import read_testdata
from home_credit_data_engineering_spark.streaming.corpus import (
    chunk_stream,
    quality_flag_stream,
    read_document_stream,
)
from home_credit_data_engineering_spark.streaming.windows import run_to_memory_sink


def _doc_stream(spark, sf_dir, tmp_path, trigger_files=1):
    # file streams read directories; land the documents table as FOUR
    # parquet files and trigger one per micro-batch, so the test covers
    # multi-batch concatenation, not the single-batch degenerate case
    src = str(tmp_path / "docs_stream_src")
    read_testdata(spark, sf_dir, "documents").repartition(4).write.parquet(src)
    return read_document_stream(
        spark, src, max_files_per_trigger=trigger_files
    )


def test_quality_flag_stream_equals_batch(spark, sf_dir, tmp_path):
    t = QualityThresholds()
    out = quality_flag_stream(_doc_stream(spark, sf_dir, tmp_path), thresholds=t).select(
        "doc_id", "kept", "failed_rules"
    )
    run_to_memory_sink(out, "q_flags")
    got = {
        r["doc_id"]: (r["kept"], tuple(r["failed_rules"]))
        for r in spark.sql("SELECT * FROM q_flags").collect()
    }

    docs = read_testdata(spark, sf_dir, "documents")
    flagged = _flag(docs, quality_rules("text", "lang", t))
    expected = {
        r["doc_id"]: (len(r["failed_rules"]) == 0, tuple(r["failed_rules"]))
        for r in flagged.collect()
    }
    assert got == expected
    assert any(not kept for kept, _ in got.values()) or len(got) == 500


def test_chunk_stream_equals_batch(spark, sf_dir, tmp_path):
    out = chunk_stream(_doc_stream(spark, sf_dir, tmp_path), chunk_tokens=32, stride=16)
    run_to_memory_sink(out, "chunks_stream")
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM chunks_stream").collect())
    )

    docs = read_testdata(spark, sf_dir, "documents")
    expected = sorted(
        map(tuple, chunk_documents(docs, "doc_id", "text", 32, 16).collect())
    )
    assert got == expected and len(got) > 0


def test_quality_stream_partitioned_file_sink(spark, sf_dir, tmp_path):
    """The documented production route: stream → quality flags → ONE
    partitioned file sink on the keep verdict (same single-write shape
    as the batch quality_filter_single_pass job)."""
    out = str(tmp_path / "q_sink")
    ckpt = str(tmp_path / "q_ckpt")
    flagged = quality_flag_stream(_doc_stream(spark, sf_dir, tmp_path)).select(
        "doc_id", "kept"
    )
    q = (
        flagged.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .partitionBy("kept")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    back = spark.read.parquet(out)
    docs = read_testdata(spark, sf_dir, "documents")
    assert back.count() == docs.count()
    # partition pruning serves the kept side without touching dropped
    kept_files = list((__import__("pathlib").Path(out) / "kept=true").glob("*.parquet"))
    assert kept_files, "expected kept=true partition directories"


def test_foreach_batch_perplexity_stream_equals_batch(spark, sf_dir, tmp_path):
    """Streamed per-batch scoring against a persisted history model must
    reproduce batch scoring of the same documents against the same
    model — documents arrive whole, so the scores are exact."""
    import math

    from home_credit_data_engineering_spark.operators.lm import (
        lm_perplexity,
        train_unigram_lm,
        unigram_count_state,
    )
    from home_credit_data_engineering_spark.streaming.corpus import (
        foreach_batch_perplexity,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    model_path = str(tmp_path / "lm_model")
    train_unigram_lm(docs, "doc_id", "text").write.parquet(model_path)
    counts = unigram_count_state(docs, "doc_id", "text")
    tot = counts.groupBy().sum("c").collect()[0][0]
    v = counts.count()
    floor = math.log(0.5 / (tot + 0.5 * v))

    out_path = str(tmp_path / "scored_stream")
    foreach_batch_perplexity(
        _doc_stream(spark, sf_dir, tmp_path),
        model_path=model_path,
        output_path=out_path,
        checkpoint_dir=str(tmp_path / "ckpt_ppl"),
        unseen_logp=floor,
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["ppl"])
        for r in spark.read.parquet(out_path).collect()
    }
    expected = {
        r["doc_id"]: (r["n_tokens"], r["ppl"])
        for r in lm_perplexity(
            docs,
            "doc_id",
            "text",
            model=spark.read.parquet(model_path),
            unseen_logp=floor,
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_bpe_count_stream_equals_batch(spark, sf_dir, tmp_path):
    from home_credit_data_engineering_spark.functions.bpe import (
        with_bpe_token_count,
    )
    from home_credit_data_engineering_spark.streaming.corpus import (
        bpe_count_stream,
    )

    out = bpe_count_stream(_doc_stream(spark, sf_dir, tmp_path)).select(
        "doc_id", "bpe_token_count"
    )
    run_to_memory_sink(out, "bpe_stream")
    got = {
        r["doc_id"]: r["bpe_token_count"]
        for r in spark.sql("SELECT * FROM bpe_stream").collect()
    }

    docs = read_testdata(spark, sf_dir, "documents")
    expected = {
        r["doc_id"]: r["bpe_token_count"]
        for r in with_bpe_token_count(docs, "text").collect()
    }
    assert got == expected and len(got) > 0


def test_foreach_batch_corpus_pipeline_stream_equals_increments(
    spark, tmp_path
):
    """A 2-micro-batch document stream through the composed-pipeline
    bridge produces the same cleaned corpus as the full recompute (the
    batches ARE increments; the same fixture as the batch equivalence
    test), and a second run of the same stream is a no-op (replay
    markers)."""
    import os

    from pyspark.sql import types as T

    from home_credit_data_engineering_spark.streaming.corpus import (
        foreach_batch_corpus_pipeline,
    )
    from tests.test_corpus_pipeline import _BENCH, _DOCS, _EXPECTED_TEXTS

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    batch1 = [d for d in _DOCS if d[0] in (1, 4, 6, 8)]
    batch2 = [d for d in _DOCS if d[0] in (2, 3, 5, 7)]
    # one parquet FILE per day -> maxFilesPerTrigger=1 makes each day one
    # micro-batch (file order follows write order)
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        src + "/day1"
    )
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        src + "/day2"
    )
    import glob
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, day in enumerate(("day1", "day2")):
        part = glob.glob(src + f"/{day}/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/{i:02d}.parquet")
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(_BENCH, "doc_id bigint, text string").write.parquet(
        bench_path
    )
    state = str(tmp_path / "state")
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .load(flat)
    )
    foreach_batch_corpus_pipeline(
        stream, bench_path, state, out_root, ckpt, budget=512, shards=4
    )

    batch_dirs = sorted(
        d for d in os.listdir(out_root) if d.startswith("batch=")
    )
    assert len(batch_dirs) == 2
    clean = None
    for d in batch_dirs:
        part = spark.read.parquet(f"{out_root}/{d}/clean")
        clean = part if clean is None else clean.unionByName(part)
    got = {r.doc_id: r.text for r in clean.collect()}
    assert got == _EXPECTED_TEXTS  # == the full recompute's clean corpus
    # markers recorded, keyed by batch CONTENT (id range) so a fresh
    # checkpoint replaying the same stream touches nothing while a fresh
    # checkpoint feeding NEW ids is never skipped
    markers = set(os.listdir(f"{state}/batches"))
    assert markers == {"batch_1_8", "batch_2_7"}
    fp_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{state}/fingerprints")
        .count()
    )
    stream2 = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(flat)
    )
    foreach_batch_corpus_pipeline(
        stream2, bench_path, state, out_root, str(tmp_path / "ckpt2"),
        budget=512, shards=4,
    )
    assert (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{state}/fingerprints")
        .count()
        == fp_rows
    )
