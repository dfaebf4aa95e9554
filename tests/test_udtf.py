"""Python UDTF surface (§2.11): the UDTF twin must equal the built-in.

The engine's position is that UDTFs are the slow-path escape hatch —
chunking ships as a zero-shuffle built-in plan (`chunk_documents`). This
test keeps the demonstration UDTF honest: identical output on the real
documents table, including trailing partials and blank-doc behavior.
"""

from __future__ import annotations

from home_credit_data_engineering_spark.functions.table_functions import (
    register_table_functions,
)
from home_credit_data_engineering_spark.operators.packing import chunk_documents
from home_credit_data_engineering_spark.sources.readers import read_testdata


def test_chunk_udtf_equals_builtin(spark, sf_dir):
    register_table_functions(spark)
    docs = read_testdata(spark, sf_dir, "documents").limit(100)
    docs.createOrReplaceTempView("__udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.chunk_start, c.chunk_len, c.chunk_text "
        "FROM __udtf_docs d, LATERAL chunk_text(d.text, 32, 16) c"
    )
    via_builtin = chunk_documents(docs, "doc_id", "text", 32, 16)
    got = sorted(map(tuple, via_udtf.collect()))
    expected = sorted(map(tuple, via_builtin.collect()))
    assert got == expected and len(got) > 0


def test_chunk_udtf_blank_and_edge_rows(spark):
    register_table_functions(spark)
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, "a b c d e")], ["doc_id", "text"]
    )
    df.createOrReplaceTempView("__udtf_edge")
    rows = spark.sql(
        "SELECT d.doc_id, c.* FROM __udtf_edge d, LATERAL chunk_text(d.text, 4, 2) c"
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 1 not in by_doc and 2 not in by_doc  # blank docs: no rows
    assert [r.chunk_text for r in by_doc[3]] == ["one"]
    assert [r.chunk_text for r in sorted(by_doc[4], key=lambda r: r.chunk_id)] == [
        "a b c d",
        "c d e",
        "e",
    ]
