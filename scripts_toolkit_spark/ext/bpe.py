"""Deterministic subword (BPE) tokenization
(SURVEY.md §2.12 [extension]; round-4 verdict Next #7 — put real
subword tokens behind the token-based corpus operators).

Algorithm: byte-pair encoding per Sennrich et al., ACL 2016 (public) —
start from characters, repeatedly merge the most frequent adjacent
symbol pair, tokenize by replaying the learned merges in rank order.

Distributed-training compromise (documented, deliberate): classic BPE
recounts pair frequencies after EVERY merge — a serial dependency chain
of corpus passes. `train_bpe_merges` instead runs `rounds` passes and
admits the top `per_round` pairs per pass from ONE frozen frequency
count (tiebreak: count desc, then left/right lexicographic). Within a
round the admitted rules are applied sequentially in rank order, so
later rounds merge the previous rounds' symbols into longer units —
the same greedy mechanics, O(rounds) corpus passes instead of
O(n_merges).

Encoding mechanics — engine-portable string rewriting: a word's symbol
sequence is a DOUBLE-pipe-delimited string `||c1||c2||…||`. Applying
merge (l, r) is `replace(seq, '|l||r|', '|lr|')`: every boundary has
two pipes, each match consumes ONE pipe from each side, so consecutive
occurrences still match (a single-delimiter encoding misses every
second occurrence because replace() consumes the shared boundary), and
the outer pipes make whole-symbol matches unambiguous (no substring
false positives). `replace` rewrites all non-overlapping occurrences
left-to-right identically in Spark, DuckDB, and Python `str.replace`,
so the THREE encoder paths (Catalyst expression, SQL oracle, Arrow
mapInPandas) are token-for-token identical — pinned by pytest.

Scale notes: training is explode → hash-count → TakeOrdered (no global
sort); the expression encoder inlines the merge chain into the plan and
suits demo-sized rule sets; the Arrow encoder (`encode_with_merges`)
broadcasts the merges table to every worker once and is the production
path for real vocabularies (a 50k-rule replace chain is not a
reasonable expression tree)."""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# lowercased alnum words; the pattern intentionally has no '|' so the
# pipe-delimited symbol encoding can never be confused by input text
WORD_PATTERN = "[a-z0-9]+"


def words_of(text: Column | str) -> Column:
    c = text if isinstance(text, Column) else F.col(text)
    return F.regexp_extract_all(F.lower(c), F.lit(WORD_PATTERN), 0)


def word_symbols(word: Column) -> Column:
    """`||c1||c2||…||` char-level symbol string (see module docstring)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, F.lit(1))
    )
    return F.concat(F.lit("||"), F.array_join(chars, "||"), F.lit("||"))


def apply_merges(seq: Column, merges: list[tuple[str, str]]) -> Column:
    """Chained replace in rank order — plan-time literal patterns."""
    for left, right in merges:
        seq = F.replace(
            seq, F.lit(f"|{left}||{right}|"), F.lit(f"|{left}{right}|")
        )
    return seq


def symbols_to_tokens(seq: Column) -> Column:
    """Split the delimited symbol string back into tokens (the leading /
    trailing delimiters split to empty strings — dropped)."""
    return F.filter(F.split(seq, r"\|+"), lambda x: x != F.lit(""))


def encode_tokens_expr(text: Column | str, merges: list[tuple[str, str]]) -> Column:
    """array<string> of BPE tokens per row, document order preserved —
    the pure-expression encoder (oracle-replayable)."""
    return F.flatten(
        F.transform(
            words_of(text),
            lambda w: symbols_to_tokens(apply_merges(word_symbols(w), merges)),
        )
    )


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = 2,
    per_round: int = 12,
) -> list[tuple[str, str, str, int]]:
    """Learn a ranked merge table from the corpus. Returns
    [(left, right, merged, pair_count)] in application (rank) order —
    deterministic: counts are exact, ranking ties break on
    (left asc, right asc). KB-scale control plane (rounds × per_round
    rows), collected driver-side like the ANN centroid picks."""
    merges: list[tuple[str, str, str, int]] = []
    w = docs.select(F.explode(words_of(text_col)).alias("w"))
    for _ in range(rounds):
        seq = apply_merges(word_symbols(F.col("w")), [(m[0], m[1]) for m in merges])
        syms = symbols_to_tokens(seq)
        n = F.size(syms)
        pairs = F.when(
            n >= 2,
            F.zip_with(
                F.slice(syms, 1, n - 1),
                F.slice(syms, 2, n - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            ),
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        top = (
            w.select(F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(per_round)
            .collect()
        )
        merges.extend((r["l"], r["r"], r["l"] + r["r"], int(r["cnt"])) for r in top)
    return merges


def encode_with_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) via an Arrow `mapInPandas`
    encoder — the production path for big merge tables: the ranked rules
    ship once per worker inside the serialized closure (broadcast-sized:
    a vocabulary is MBs), and each batch is encoded in plain Python
    without growing the query plan. Token-for-token identical to
    `encode_tokens_expr` (str.replace == Spark/DuckDB replace: all
    non-overlapping occurrences, left-to-right) — pinned by pytest."""
    import re

    rules = [(f"|{l}||{r}|", f"|{l}{r}|") for l, r in merges]
    word_re = re.compile(WORD_PATTERN)
    schema = f"{id_col} long, tokens array<string>, n_tokens int"

    def encode(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out_ids, out_toks = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for word in word_re.findall(str(text).lower()):
                    seq = "||" + "||".join(word) + "||"
                    for pat, rep in rules:
                        seq = seq.replace(pat, rep)
                    toks.extend(t for t in seq.split("|") if t)
                out_ids.append(did)
                out_toks.append(toks)
            yield pd.DataFrame(
                {
                    id_col: out_ids,
                    "tokens": out_toks,
                    "n_tokens": [len(t) for t in out_toks],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(encode, schema)
