"""Sparse-retrieval operators for corpus pipelines: BM25 ranking and
inverted-index (posting-list) construction (SURVEY.md §2.12 [extension],
north star: BASELINE.json — the reference's text tooling stops at cleaning;
a training-data engine also needs the retrieval side for dedup triage and
eval-set mining).

Scale shape (100 TB corpus):
- tokenization is a native `split`/`explode` projection (no Python);
- term statistics (tf, df, postings) are ONE explode → hash-aggregate
  chain, map-side combinable, shuffled on the term key only;
- corpus constants (N, avgdl) are one-row aggregates broadcast by AQE;
- BM25 scoring joins the per-(doc, term) tf rows against a
  query-term-sized df frame — the fact side never fans out beyond the
  number of query-term hits, and the df side is KB-scale.

Cross-engine determinism (oracle-checked):
- tf/df/dl/N are exact integers; avgdl and the tf saturation ratio are
  per-row IEEE +,-,*,/ chains (correctly rounded, engine-independent);
- the only transcendental, ln in idf, is rounded to 6 dp immediately
  (repo determinism rule; see `plans/corpus_demos.unigram_nll_scores`);
- per-term scores are rounded to 6 dp and summed as DECIMAL(18,6), so the
  cross-term reduction is order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def tokens(text: Column | str) -> Column:
    """Corpus tokenizer shared with `plans/corpus_demos` vocabulary stats:
    lowercase, split on single spaces (the synthetic corpus is
    space-delimited; swap for `ext/text.TOKEN_PATTERN` on real text)."""
    c = text if isinstance(text, Column) else F.col(text)
    return F.split(F.lower(c), " ")


def doc_tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, token) exploded view — the one corpus scan every term
    statistic below derives from."""
    return docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("token"))


def term_frequencies(docs: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id, token, tf) for the given query terms only — the explode is
    filtered BEFORE the aggregate, so the shuffle carries only hits."""
    tok = doc_tokens(docs)
    return (
        tok.where(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-document BM25 score over `terms`: (doc_id, score).

    idf = round(ln(1 + (N - df + 0.5)/(df + 0.5)), 6)   [Robertson-Sparck
    Jones, +1 so it stays positive]; per-term contribution
    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), rounded to 6 dp and
    summed as DECIMAL(18,6) (order-independent)."""
    tf = term_frequencies(docs, terms)
    # document length + corpus constants: dl is exact; avgdl = sum/count is
    # one IEEE division of exact integers
    dl = docs.select(F.col("doc_id"), F.size(tokens("text")).alias("dl"))
    consts = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    # no broadcast hints anywhere below: both small legs (the one-row
    # consts frame, the query-term-sized idf frame) have lineage reaching
    # the SF-linear documents scan, so the repo lint forbids forcing them —
    # AQE broadcasts KB frames on its own (CLAUDE.md rule)
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.crossJoin(consts).select(
        "token",
        "n_docs",
        "avgdl",
        F.round(
            F.log(
                F.lit(1.0)
                + (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
            ),
            6,
        ).alias("idf"),
    )
    tfn = F.col("tf").cast("double")
    dln = F.col("dl").cast("double")
    sat = (tfn * F.lit(k1 + 1.0)) / (
        tfn + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dln / F.col("avgdl"))
    )
    contrib = F.round(F.col("idf") * sat, 6).cast("decimal(18,6)")
    return (
        tf.join(idf, "token")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(contrib).cast("decimal(28,6)").cast("double").alias("score"))
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_cap: int = 20,
) -> DataFrame:
    """Posting lists: per token, document frequency, total term frequency
    and the first `postings_cap` doc ids (ascending, comma-joined STRING so
    the oracle hash-compares a scalar).

    One explode feeds both aggregates; the per-token collect is bounded by
    the df, and the emitted prefix by `postings_cap` — at open-vocabulary
    scale, cap df growth by bucketing the term key (the groupBy shuffles on
    token, AQE handles the stopword skew)."""
    tok = doc_tokens(docs, id_col, text_col)
    per_doc = tok.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
        F.array_join(
            F.transform(
                F.slice(F.array_sort(F.collect_list("doc_id")), 1, postings_cap),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings_prefix"),
    )
