"""Boundary property tests for every n-gram / substring / window operator
(round-5 verdict Next #5): docs of length 0 / 1 / k−1 / k / k+1 pin the
Spark-vs-DuckDB edge semantics that caused the charngram_lang_id hazard —
Spark `sequence(1, 0)` counts DOWN ([1, 0], emitting bogus grams) where
DuckDB `range(1, 1)` is EMPTY. Every gram producer must therefore
short-circuit short inputs explicitly; these tests run each producer on
degenerate inputs and, where the repo ships a SQL oracle idiom, replay the
DuckDB side on the same rows and require identical gram sets.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_spark_sequence_descends_below_start(spark):
    """The hazard itself, pinned: if this ever changes upstream the guards
    can be simplified; until then every data-dependent sequence(1, n)
    needs an explicit emptiness guard for n < 1."""
    row = spark.range(1).select(F.sequence(F.lit(1), F.lit(0)).alias("s")).first()
    assert row["s"] == [1, 0]  # descending, NOT empty
    assert duckdb.sql("SELECT range(1, 1) AS s").fetchone()[0] == []


# --------------------------------------------------------- char trigrams --
def test_charngram_trigrams_short_docs(spark):
    """The guarded trigram expression from charngram_lang_id: 0/1/2-char
    docs yield NO grams (DuckDB parity), 3 chars yield exactly one."""
    docs = [(0, ""), (1, "a"), (2, "ab"), (3, "abc"), (4, "abcd")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    t = F.lower("text")
    grams = F.when(
        F.length(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 2),
            lambda i: F.substring(t, i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    got = {r["doc_id"]: r["g"] for r in df.select("doc_id", grams.alias("g")).collect()}
    assert got == {0: [], 1: [], 2: [], 3: ["abc"], 4: ["abc", "bcd"]}
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES " +
                ",".join(f"({i}, '{t}')" for i, t in docs) + ") AS v(doc_id, text)")
    oracle = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT doc_id, list_transform(range(1, greatest(length(lower(text)) - 2, 0) + 1),"
            " i -> substr(lower(text), i, 3)) FROM d"
        ).fetchall()
    }
    assert got == oracle


# --------------------------------------------------------- word shingles --
def test_word_shingles_boundaries(spark):
    from scripts_toolkit_spark.ext.dedup import word_shingles

    docs = [(0, ""), (1, "a"), (2, "a b"), (3, "a b c"), (4, "a b c d")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", word_shingles("text", k=3).alias("s")).collect()
    }
    # NB: split("", " ") is [""] — a 1-element array — so the k-guard, not
    # an emptiness check, is what protects the empty doc
    assert got == {
        0: [],
        1: [],
        2: [],
        3: ["a b c"],
        4: ["a b c", "b c d"],
    }


# ------------------------------------------------------------- k-grams ----
def test_kgram_hashes_boundaries_match_duckdb(spark):
    """kgram_hashes on 0 / k−1 / k / k+1 char docs: empty below k (the old
    greatest(…,0) clamp emitted two bogus hashes via the descending
    sequence), and hash-identical to the DuckDB md5 idiom at ≥ k."""
    from scripts_toolkit_spark.ext.text import kgram_hashes

    k = 4
    docs = [(0, ""), (1, "abc"), (2, "abcd"), (3, "abcde")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", kgram_hashes("text", k=k).alias("h")).collect()
    }
    assert got[0] == [] and got[1] == []
    assert len(got[2]) == 1 and len(got[3]) == 2
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES " +
                ",".join(f"({i}, '{t}')" for i, t in docs) + ") AS v(doc_id, text)")
    # the repo's oracle idiom (WINNOW_OVERLAP_PAIRS_SQL): '0x' || hex cast
    oracle = {
        r[0]: r[1]
        for r in con.execute(
            f"""SELECT doc_id, list_transform(range(1, greatest(length(text) - {k - 1}, 0) + 1),
                 i -> CAST(('0x' || substr(md5(substr(text, i, {k})), 1, 8)) AS BIGINT))
               FROM d"""
        ).fetchall()
    }
    assert got == oracle


def test_winnow_min_hashes_boundaries(spark):
    """Winnowing selection on hash sequences of size 0 / w−1 / w / w+1:
    empty below the window (no substring-match guarantee is possible —
    the empty-shingle NaN lesson), one fingerprint at exactly w."""
    from scripts_toolkit_spark.ext.text import winnow_min_hashes

    w = 4
    rows = [
        (0, []),
        (1, [5, 3, 9]),
        (2, [5, 3, 9, 7]),
        (3, [5, 3, 9, 7, 1]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, h array<long>")
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", winnow_min_hashes(F.col("h"), window=w).alias("fp")
        ).collect()
    }
    assert got[0] == [] and got[1] == []
    assert got[2] == [3]
    assert got[3] == [3, 1]  # two frames: min(5,3,9,7)=3, min(3,9,7,1)=1


# ------------------------------------------------------------------ BPE ----
def test_bpe_word_boundaries(spark):
    """words_of never emits empty words (so word_symbols' sequence(1, len)
    always ascends), punctuation-only text tokenizes to nothing, and the
    symbol string round-trips 1-char and k-char words."""
    from scripts_toolkit_spark.ext.bpe import symbols_to_tokens, word_symbols, words_of

    df = spark.createDataFrame(
        [(0, ""), (1, "!!! ???"), (2, "a"), (3, "a  double  space")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["w"] for r in df.select("doc_id", words_of("text").alias("w")).collect()}
    assert got[0] == [] and got[1] == []
    assert got[2] == ["a"]
    assert got[3] == ["a", "double", "space"]  # no empty tokens from runs
    sym = spark.createDataFrame([("a",), ("ab",)], "w string").select(
        F.col("w"), word_symbols(F.col("w")).alias("s")
    )
    rows = {r["w"]: r["s"] for r in sym.collect()}
    assert rows["a"] == "||a||"
    assert rows["ab"] == "||a||b||"
    back = spark.createDataFrame([(s,) for s in rows.values()], "s string").select(
        symbols_to_tokens(F.col("s")).alias("t")
    )
    assert sorted(tuple(r["t"]) for r in back.collect()) == [("a",), ("a", "b")]


# ------------------------------------------------------------- chunking ----
def test_document_chunks_degenerate_docs(spark, tmp_path):
    """Chunking a 0-token and a below-window doc must yield exactly ONE
    chunk each (n_chunks clamps to 1 in both engines), never a descending
    window sweep."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["", "only three tokens", "x " * 70]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "quality": pa.array([1.0] * 3),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["document_chunks"](spark, str(tmp_path)).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_chunk_tokens"] == 0
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 3
    assert len(by_doc[3]) == 2  # 70 tokens, 64-window/48-stride -> 2 chunks
