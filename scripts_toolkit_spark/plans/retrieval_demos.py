"""Sparse retrieval + record-linkage + weighted-sampling demonstrations
(SURVEY.md §2.12 [extension]): BM25 ranking, inverted-index posting lists,
blocked edit-distance entity matching, and weighted sampling without
replacement — four operations a training-data/eval pipeline runs beside
dedup, none expressible in the reference's exact-equality toolkit.

Determinism contract (README Design rules #6): ln is rounded to 6 dp the
moment it is computed; cross-term reductions go through DECIMAL; ranking
keys are either exact ints/decimals or ordered with an id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scripts_toolkit_spark.ext import retrieval as R
from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.operators.linkage import blocked_levenshtein_join
from scripts_toolkit_spark.materialize import materialize as _materialize

# Mid-frequency corpus terms (the synthetic vocabulary is closed, so these
# exist at every SF).
BM25_TERMS = ["spark", "vector", "hash"]


def bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a 3-term query (ext/retrieval.bm25_scores):
    one filtered explode → tf, query-term-sized df/idf, per-row saturation,
    DECIMAL cross-term sum; ranked with a doc_id tiebreak."""
    from scripts_toolkit_spark.operators.topk import global_topk

    d = load_table(spark, sf_dir, "documents")
    scored = R.bm25_scores(d, BM25_TERMS)
    return global_topk(scored, [F.desc("score"), F.asc("doc_id")], 20).select(
        "doc_id", "score", F.col("rank").cast("int").alias("rank")
    )


BM25_TOP_DOCS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
),
dl AS (
  SELECT doc_id, len(string_split(lower(text), ' ')) AS dl FROM documents
),
consts AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM tok WHERE token IN ('spark', 'vector', 'hash')
  GROUP BY doc_id, token
),
dfreq AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
),
idf AS (
  SELECT token,
    round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                   / (CAST(df AS DOUBLE) + 0.5)), 6) AS idf,
    avgdl
  FROM dfreq, consts
),
scored AS (
  SELECT tf.doc_id,
    CAST(round(idf * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)), 6)
         AS DECIMAL(18,6)) AS contrib
  FROM tf JOIN idf USING (token) JOIN dl USING (doc_id)
),
summed AS (
  SELECT doc_id, CAST(CAST(SUM(contrib) AS DECIMAL(28,6)) AS DOUBLE) AS score
  FROM scored GROUP BY doc_id
)
SELECT doc_id, score, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank FROM summed
)
WHERE rank <= 20
"""


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list construction (ext/retrieval.inverted_index): per token
    df, total tf, and the first 20 doc ids comma-joined — the one-scan
    explode → two-level hash aggregate that builds a search index shard at
    any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return R.inverted_index(d)


INVERTED_INDEX_POSTINGS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
),
per_doc AS (
  SELECT token, doc_id, COUNT(*) AS tf FROM tok GROUP BY token, doc_id
)
SELECT token,
  COUNT(*) AS doc_freq,
  CAST(SUM(tf) AS BIGINT) AS total_tf,
  array_to_string(
    list_transform((list(doc_id ORDER BY doc_id))[1:20], x -> CAST(x AS VARCHAR)),
    ',') AS postings_prefix
FROM per_doc
GROUP BY token
"""


def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage over part names (operators/linkage): block on the
    name's second token, prune by length band, verify with native
    levenshtein ≤ 2 — typo-tolerant matching with zero cartesian product.
    Matches surface pairs like 'cold widget' ↔ 'old widget' (distance 1)
    with per-name row counts as linkage weights."""
    p = load_table(spark, sf_dir, "part")
    names = (
        p.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("noun", F.split(F.col("p_name"), " ").getItem(1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("cnt").alias("cnt_a"), F.col("noun").alias("noun_a")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("cnt").alias("cnt_b"), F.col("noun").alias("noun_b")
    )
    return (
        blocked_levenshtein_join(
            a, b, "name_a", "name_b", [(F.col("noun_a"), F.col("noun_b"))], max_dist=2
        )
        .where(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b", F.col("lev_dist").cast("int").alias("lev_dist"), "cnt_a", "cnt_b")
    )


FUZZY_NAME_MATCHES_SQL = """
WITH names AS (
  SELECT p_name, split_part(p_name, ' ', 2) AS noun, COUNT(*) AS cnt
  FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev_dist,
  a.cnt AS cnt_a, b.cnt AS cnt_b
FROM names a JOIN names b ON a.noun = b.noun
WHERE abs(len(a.p_name) - len(b.p_name)) <= 2
  AND levenshtein(a.p_name, b.p_name) <= 2
  AND a.p_name < b.p_name
"""


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, top-50 by n_chars weight —
    the A-ES scheme (Efraimidis-Spirakis, public): each row draws an
    md5-uniform u ∈ (0,1] and ranks by ln(u)/weight (the monotone image of
    u^(1/w)); the global top-k under that key IS a weighted sample without
    replacement. Deterministic under reruns/repartitioning; the ranking
    key never leaves the plan (only ids and exact ints are output), so
    last-ulp ln wobble has no hashable surface and order flips would need
    two keys within ~1e-16 — not observable at these row counts.

    Scale shape: one narrow projection + a two-stage `global_topk`
    (per-partition partial top-k, then a k·P-row final merge) — no
    single-task sort of the corpus; candidate volume is k per partition."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ws|"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        + F.lit(1)
    ).cast("double") / F.lit(float(1 << 32))
    key = F.log(u) / F.col("n_chars").cast("double")
    from scripts_toolkit_spark.operators.topk import global_topk

    return global_topk(
        d.select("doc_id", "source", "n_chars"), [F.desc(key), F.asc("doc_id")], 50
    ).select("doc_id", "source", "n_chars", F.col("rank").cast("int").alias("rank"))


WEIGHTED_SAMPLE_DOCS_SQL = """
WITH keyed AS (
  SELECT doc_id, source, n_chars,
    ln((CAST(('0x' || substr(md5('ws|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
       / 4294967296.0) / CAST(n_chars AS DOUBLE) AS k
  FROM documents
)
SELECT doc_id, source, n_chars, CAST(rank AS INT) AS rank
FROM (
  SELECT doc_id, source, n_chars,
    row_number() OVER (ORDER BY k DESC, doc_id ASC) AS rank
  FROM keyed
)
WHERE rank <= 50
"""


def entity_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution capstone: fuzzy pairs (the blocked levenshtein
    join) → connected components (operators/graph — min-label propagation
    with pointer halving, O(log diameter) rounds) → one GOLDEN RECORD per
    entity cluster (highest row count, name tiebreak). The full
    dedupe-and-survive pipeline a master-data system runs, with every
    pairing equi-keyed; the oracle replays clustering as a recursive
    transitive closure."""
    from pyspark.sql.window import Window

    from scripts_toolkit_spark.operators.graph import connected_components

    p = load_table(spark, sf_dir, "part")
    names = (
        p.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("noun", F.split(F.col("p_name"), " ").getItem(1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("noun").alias("noun_a")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("noun").alias("noun_b")
    )
    pairs = (
        blocked_levenshtein_join(
            a, b, "name_a", "name_b", [(F.col("noun_a"), F.col("noun_b"))], max_dist=2
        )
        .where(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
    )
    comp = connected_components(pairs, "name_a", "name_b")
    mem = comp.join(names.withColumnRenamed("p_name", "node"), "node").select(
        "node", "component", "cnt"
    )
    wg = Window.partitionBy("component").orderBy(F.desc("cnt"), F.asc("node"))
    golden = (
        mem.withColumn("rn", F.row_number().over(wg))
        .where(F.col("rn") == 1)
        .select("component", F.col("node").alias("golden_name"))
    )
    stats = mem.groupBy("component").agg(
        F.count(F.lit(1)).alias("size"), F.sum("cnt").alias("total_rows")
    )
    return (
        stats.join(golden, "component")
        .select(F.col("component").alias("cluster_id"), "size", "golden_name", "total_rows")
    )


ENTITY_GOLDEN_RECORDS_SQL = """
WITH RECURSIVE names AS (
  SELECT p_name, split_part(p_name, ' ', 2) AS noun, COUNT(*) AS cnt
  FROM part GROUP BY p_name
),
pairs AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b
  FROM names a JOIN names b ON a.noun = b.noun
  WHERE abs(len(a.p_name) - len(b.p_name)) <= 2
    AND levenshtein(a.p_name, b.p_name) <= 2
    AND a.p_name < b.p_name
),
und AS (
  SELECT name_a AS u, name_b AS v FROM pairs
  UNION
  SELECT name_b, name_a FROM pairs
),
reach(src, dst) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM und)
  UNION
  SELECT r.src, e.v FROM reach r JOIN und e ON r.dst = e.u
),
comp AS (SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src),
mem AS (
  SELECT c.node, c.component, n.cnt FROM comp c JOIN names n ON c.node = n.p_name
),
golden AS (
  SELECT component, node AS golden_name FROM mem
  QUALIFY row_number() OVER (PARTITION BY component ORDER BY cnt DESC, node ASC) = 1
)
SELECT m.component AS cluster_id, COUNT(*) AS size,
  any_value(g.golden_name) AS golden_name,
  CAST(SUM(m.cnt) AS BIGINT) AS total_rows
FROM mem m JOIN golden g ON m.component = g.component
GROUP BY m.component
"""


def name_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration on the fuzzy-name similarity graph — the
    oriented edge-join pattern (each edge stored once as a < b; triangles
    found by joining (a,b)⋈(b,c) then closing with (a,c)), the shape that
    makes triangle counting a pair of equi-joins instead of a cubic scan.
    Uses distance ≤ 3 so the 8×8 adjective grid actually closes
    triangles; a structural-graph demo, not a linkage threshold."""
    p = load_table(spark, sf_dir, "part")
    names = (
        p.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("noun", F.split(F.col("p_name"), " ").getItem(1))
    )
    a = names.select(F.col("p_name").alias("name_a"), F.col("noun").alias("noun_a"))
    b = names.select(F.col("p_name").alias("name_b"), F.col("noun").alias("noun_b"))
    edges = (
        blocked_levenshtein_join(
            a, b, "name_a", "name_b", [(F.col("noun_a"), F.col("noun_b"))], max_dist=3
        )
        .where(F.col("name_a") < F.col("name_b"))
        .select(F.col("name_a").alias("u"), F.col("name_b").alias("v"))
        .transform(_materialize)
    )
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    return (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .select("a", "b", "c")
    )


NAME_GRAPH_TRIANGLES_SQL = """
WITH names AS (
  SELECT p_name, split_part(p_name, ' ', 2) AS noun FROM part GROUP BY p_name
),
edges AS (
  SELECT a.p_name AS u, b.p_name AS v
  FROM names a JOIN names b ON a.noun = b.noun
  WHERE abs(len(a.p_name) - len(b.p_name)) <= 3
    AND levenshtein(a.p_name, b.p_name) <= 3
    AND a.p_name < b.p_name
)
SELECT e1.u AS a, e1.v AS b, e2.v AS c
FROM edges e1
JOIN edges e2 ON e1.v = e2.u
JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
"""


# ----------------------------------------------------- hybrid RRF fusion ---
# Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09 — the standard
# hybrid-search combiner): rrf(d) = Σ_legs 1/(K + rank_leg(d)), K = 60.
_RRF_K = 60
_RRF_MAX_QUERIES = 64  # absolute, SF-independent query cap (linearity guard)
_RRF_LEG_K = 20  # per-leg depth
_RRF_TOP = 10  # fused results per query


def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval for a BOUNDED query batch (id < 64, ids that exist
    in BOTH `documents` and `embeddings`): fuse a LEXICAL leg (character-
    5-gram Jaccard over the corpus-wide MinHash-banded candidates — the
    char_ngram_jaccard machinery, per-query top-20) with a DENSE leg
    (exact cosine top-20 over the embeddings corpus — the bounded
    ann_topk_cosine shape) by reciprocal-rank fusion. A candidate missing
    from one leg simply contributes nothing from it — exactly how hybrid
    search degrades when a doc has no embedding (at sf0.1, 3 in 5 docs
    don't) or no lexical overlap.

    Scale shape: the lexical leg is the banded equi-join (no all-pairs);
    the dense leg is bounded-queries × corpus (allowlisted, linear in
    corpus); fusion is a per-(query, candidate) full-outer join of two
    ≤20-row-per-query lists. Deterministic: exact Jaccard ratios,
    sequential-fold cosine, fixed two-term RRF sum (lex + dense in that
    literal order), every rank tiebroken on the candidate id; the output
    score is rounded to 6 dp (repo float rule)."""
    from scripts_toolkit_spark.ext import dedup as DD

    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # ---- lexical leg: char-5-gram Jaccard via corpus-wide banding -------
    def grams(c):
        t = F.col(c)
        n = F.length(t) - 4
        idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))
        return F.array_distinct(
            F.when(
                F.length(t) >= 5,
                F.transform(idx, lambda i: t.substr(i, F.lit(5))),
            ).otherwise(F.array(t))
        )

    parallelism = spark.sparkContext.defaultParallelism
    g = (
        d.repartition(parallelism)
        .select("doc_id", grams("text").alias("gset"))
        .select(
            "doc_id",
            "gset",
            DD.lsh_bands(DD.minhash_signature(F.col("gset"), 8), 4, 2).alias("bands"),
        )
        .transform(_materialize)
    )
    banded = g.select("doc_id", F.explode("bands").alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    qside = banded.where(F.col("doc_id") < _RRF_MAX_QUERIES).withColumnsRenamed(
        {"doc_id": "query_id"}
    )
    lex_cand = (
        qside.join(banded.withColumnsRenamed({"doc_id": "cand_id"}), ["band", "key"])
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    sets = g.select("doc_id", "gset")
    lex_scored = (
        lex_cand.join(
            sets.withColumnsRenamed({"doc_id": "query_id", "gset": "gq"}), "query_id"
        )
        .join(sets.withColumnsRenamed({"doc_id": "cand_id", "gset": "gc"}), "cand_id")
        .select(
            "query_id",
            "cand_id",
            (
                F.size(F.array_intersect("gq", "gc")).cast("double")
                / F.size(F.array_union("gq", "gc")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.2)
    )
    wl = Window.partitionBy("query_id").orderBy(F.desc("jaccard"), F.asc("cand_id"))
    lex = (
        lex_scored.withColumn("lex_rank", F.row_number().over(wl))
        .where(F.col("lex_rank") <= _RRF_LEG_K)
        .select("query_id", "cand_id", "lex_rank")
    )

    # ---- dense leg: bounded exact cosine over the embeddings corpus ----
    from scripts_toolkit_spark.ext.similarity import brute_force_topk

    dense = brute_force_topk(
        emb.where(F.col("vec_id") < _RRF_MAX_QUERIES), emb, k=_RRF_LEG_K
    ).select(
        "query_id",
        F.col("neighbor_id").alias("cand_id"),
        F.col("rank").alias("dense_rank"),
    )

    # ---- fuse ----------------------------------------------------------
    fused = (
        lex.join(dense, ["query_id", "cand_id"], "full_outer")
        .select(
            "query_id",
            "cand_id",
            "lex_rank",
            "dense_rank",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("dense_rank")), F.lit(0.0)
                )
            ).alias("rrf"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("cand_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .where(F.col("rank") <= _RRF_TOP)
        .select(
            "query_id",
            "cand_id",
            "lex_rank",
            "dense_rank",
            F.round("rrf", 6).alias("rrf_score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


HYBRID_RRF_SEARCH_SQL = f"""
WITH g AS (
  SELECT doc_id,
    list_distinct(CASE WHEN length(text) >= 5
      THEN list_transform(range(1, length(text) - 3), i -> substr(text, i, 5))
      ELSE [text] END) AS gset
  FROM documents
),
sig AS (
  SELECT doc_id, gset,
    [list_min(list_transform(gset, s -> md5(CAST(p AS VARCHAR) || '|' || s)))
     FOR p IN range(8)] AS sig
  FROM g
),
banded AS (
  SELECT doc_id, b AS band,
    md5(array_to_string(sig[b * 2 + 1 : b * 2 + 2], '#')) AS key
  FROM sig, UNNEST(range(4)) AS t(b)
),
lex_cand AS (
  SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS cand_id
  FROM banded q JOIN banded c USING (band, key)
  WHERE q.doc_id < {_RRF_MAX_QUERIES} AND q.doc_id <> c.doc_id
),
lex_scored AS (
  SELECT query_id, cand_id,
    CAST(len(list_intersect(a.gset, b.gset)) AS DOUBLE)
      / len(list_distinct(list_concat(a.gset, b.gset))) AS jaccard
  FROM lex_cand
  JOIN g a ON a.doc_id = query_id
  JOIN g b ON b.doc_id = cand_id
),
lex AS (
  SELECT query_id, cand_id, lex_rank FROM (
    SELECT query_id, cand_id,
      row_number() OVER (PARTITION BY query_id ORDER BY jaccard DESC, cand_id) AS lex_rank
    FROM lex_scored WHERE jaccard >= 0.2
  ) WHERE lex_rank <= {_RRF_LEG_K}
),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
    list_reduce(list_transform(range(1, 65),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y) AS dot,
    sqrt(list_reduce(list_transform(range(1, 65),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), (x, y) -> x + y)) AS na,
    sqrt(list_reduce(list_transform(range(1, 65),
      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y)) AS nb
  FROM embeddings a, embeddings b
  WHERE a.vec_id < {_RRF_MAX_QUERIES} AND a.vec_id <> b.vec_id
),
dense AS (
  SELECT query_id, cand_id, dense_rank FROM (
    SELECT query_id, cand_id,
      row_number() OVER (PARTITION BY query_id ORDER BY dot / (na * nb) DESC, cand_id) AS dense_rank
    FROM pairs
  ) WHERE dense_rank <= {_RRF_LEG_K}
),
fused AS (
  SELECT
    coalesce(l.query_id, d.query_id) AS query_id,
    coalesce(l.cand_id, d.cand_id) AS cand_id,
    l.lex_rank, d.dense_rank,
    -- CAST to DOUBLE: a bare 1.0 is DECIMAL in DuckDB (decimal division)
    -- where Spark's lit(1.0) is double
    coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K} + l.lex_rank), CAST(0.0 AS DOUBLE))
      + coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K} + d.dense_rank), CAST(0.0 AS DOUBLE)) AS rrf
  FROM lex l FULL OUTER JOIN dense d
    ON l.query_id = d.query_id AND l.cand_id = d.cand_id
)
SELECT query_id, cand_id, lex_rank, dense_rank,
  ROUND(rrf, 6) AS rrf_score, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, cand_id) AS rank
  FROM fused
) WHERE rank <= {_RRF_TOP}
"""
