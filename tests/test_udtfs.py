"""Python UDTF surface: SQL LATERAL chunking must equal the native
Catalyst chunker row-for-row."""

from __future__ import annotations

from scripts_toolkit_spark.functions.udtfs import register_udtfs
from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.plans.corpus_demos import document_chunks


def test_chunk_document_udtf_matches_native(spark, sf_dir):
    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").limit(50).createOrReplaceTempView("_docs_u")
    via_sql = spark.sql(
        """
        SELECT d.doc_id, c.chunk_no, c.n_chunk_tokens, c.chunk_text
        FROM _docs_u d, LATERAL chunk_document(doc_id, text, 64, 16) c
        """
    )
    got = {
        (r["doc_id"], r["chunk_no"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in via_sql.collect()
    }
    ids = {k[0] for k in got}
    native = {
        (r["doc_id"], r["chunk_no"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in document_chunks(spark, sf_dir).collect()
        if r["doc_id"] in ids
    }
    assert got == native and len(got) > 50


def test_chunk_document_rejects_bad_window_params():
    import pytest

    from scripts_toolkit_spark.functions.udtfs import ChunkDocument

    chunker = ChunkDocument.func()  # unwrap the @udtf-decorated class
    for size, overlap in [(16, 16), (8, 16), (0, 0), (-4, 0), (8, -1)]:
        with pytest.raises(ValueError, match="overlap"):
            list(chunker.eval(1, "a b c", size, overlap))
    # valid params still chunk
    assert list(chunker.eval(1, "a b c d", 2, 1))
