"""Python UDTFs (Spark 4 user-defined TABLE functions) — the SQL-facing
packaging for one-row→many-rows Python logic, complementing the DataSource
API (io/datasources.py) on the source side.

`ChunkDocument` exposes the token-window chunker to SQL:

    spark.udtf.register("chunk_document", ChunkDocument)
    SELECT c.* FROM documents, LATERAL chunk_document(doc_id, text, 64, 16) c

The DataFrame-native form (`plans/corpus_demos.document_chunks`) remains
the hot path — it is pure Catalyst, zero Python. The UDTF exists for the
SQL-user surface and for logic that genuinely needs Python per row; its
output is tested equal to the native form so either entry point gives the
same chunks.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

TOKEN_RE = re.compile(r"[A-Za-z0-9]+|[^A-Za-z0-9 \t\n]")


@udtf(returnType="chunk_no int, n_chunk_tokens int, chunk_text string")
class ChunkDocument:
    """Token-window chunking: windows of `size` tokens advancing
    `size - overlap`; short docs yield one (possibly empty) chunk —
    identical semantics to plans/corpus_demos.document_chunks."""

    def eval(self, doc_id: int, text: str, size: int = 64, overlap: int = 16):  # noqa: ARG002
        if size <= 0 or overlap < 0 or size <= overlap:
            raise ValueError(
                f"chunk_document requires 0 <= overlap < size, got "
                f"size={size} overlap={overlap}"
            )
        toks = TOKEN_RE.findall(text or "")
        stride = size - overlap
        n_chunks = max(-(-(len(toks) - overlap) // stride), 1)
        for i in range(n_chunks):
            window = toks[i * stride : i * stride + size]
            yield i, len(window), " ".join(window)


def register_udtfs(spark) -> None:
    """Register all engine UDTFs on a session (idempotent)."""
    spark.udtf.register("chunk_document", ChunkDocument)
