"""Text-analysis operators for training-data pipelines
(SURVEY.md §2.12 [extension], north star: BASELINE.json).

All native Catalyst expressions — tokenization, counting, scoring and
fingerprinting run JVM-side with zero Python in the data plane, so a
100 TB documents table is scanned once at parquet bandwidth.

Cross-engine determinism notes (these operators are oracle-checked):
- hashes derive from md5 hex (identical everywhere), converted via base-16
  `conv`;
- per-row double arithmetic (ratios, weighted scores) is IEEE-deterministic;
  no cross-row float summation leaves these expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish token pattern: alnum runs OR single non-space symbols (kept RE2-
# and Java-regex compatible for oracle parity).
TOKEN_PATTERN = "[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n]"

STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "los", "y", "que"),
    "fr": ("le", "les", "et", "des", "une"),
    "de": ("der", "die", "das", "und", "nicht"),
    "zh": ("的", "是", "了"),
}


def words(c: Column | str) -> Column:
    return F.split(c if isinstance(c, Column) else F.col(c), " ")


def token_count(c: Column | str) -> Column:
    """BPE-ish token count: alnum runs + standalone symbols."""
    col = c if isinstance(c, Column) else F.col(c)
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), 0))


def word_count(c: Column | str) -> Column:
    return F.size(words(c))


def stopword_ratio(c: Column | str, lang: str = "en") -> Column:
    w = words(c)
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    hits = F.size(F.filter(w, lambda x: F.array_contains(sw, F.lower(x))))
    return hits.cast("double") / F.greatest(F.size(w), F.lit(1)).cast("double")


def avg_word_len(c: Column | str) -> Column:
    w = words(c)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.greatest(F.size(w), F.lit(1)).cast("double")


def alnum_ratio(c: Column | str) -> Column:
    col = c if isinstance(c, Column) else F.col(c)
    alnum = F.length(F.regexp_replace(col, "[^A-Za-z0-9]", ""))
    return alnum.cast("double") / F.greatest(F.length(col), F.lit(1)).cast("double")


def quality_score(c: Column | str) -> Column:
    """Composite [0,1]-ish quality heuristic: length sweet-spot, average
    word length sanity, stopword presence, alphanumeric density. Per-row
    double math only (deterministic)."""
    col = c if isinstance(c, Column) else F.col(c)
    n = F.length(col).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    awl = avg_word_len(col)
    awl_score = F.when((awl >= 3.0) & (awl <= 10.0), 1.0).otherwise(0.3)
    sw_score = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    return (
        F.lit(0.3) * len_score
        + F.lit(0.25) * awl_score
        + F.lit(0.2) * sw_score
        + F.lit(0.25) * alnum_ratio(col)
    )


def lang_scores(c: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit ratios (n-gram-free heuristic language ID
    suited to whitespace-tokenized text)."""
    return {lang: stopword_ratio(c, lang) for lang in STOPWORDS}


def predict_lang(c: Column | str) -> Column:
    """argmax over language scores; deterministic alphabetical tiebreak
    (ties broken toward the lexicographically first language code)."""
    scores = lang_scores(c)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(STOPWORDS)
        ]
    )
    # array_max on (score, lang) structs orders by score then lang — to make
    # ties pick the FIRST lang alphabetically, invert: take max score, then
    # filter for it and take the min lang.
    best = F.array_max(F.transform(pairs, lambda p: p["score"]))
    return F.array_min(
        F.transform(F.filter(pairs, lambda p: p["score"] == best), lambda p: p["lang"])
    )


def kgram_hashes(c: Column | str, k: int = 8) -> Column:
    """32-bit md5-derived hash per character k-gram (positions
    1..len−k+1) — engine-portable (md5 hex prefix via base-16 conv).

    Short-doc guard (round-6, same class as charngram_lang_id): Spark's
    sequence(1, 0) counts DOWN ([1, 0]) where DuckDB's range(1, 1) is
    empty, so docs shorter than k chars must short-circuit to an empty
    array — the old greatest(…, 0) clamp still emitted two bogus hashes
    (dormant only because every caller winnows with window ≥ 3)."""
    col = c if isinstance(c, Column) else F.col(c)
    hashes = F.transform(
        F.sequence(F.lit(1), F.length(col) - (k - 1)),
        lambda i: F.conv(
            F.substring(F.md5(F.substring(col, i, F.lit(k))), 1, 4 * 2), 16, 10
        ).cast("long"),
    )
    return F.when(F.length(col) >= k, hashes).otherwise(F.array().cast("array<long>"))


def winnowed_fingerprints(c: Column | str, k: int = 8, window: int = 16) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the MOSS document-fingerprinting algorithm, public): slide a
    `window`-wide frame over the k-gram hash sequence and keep each
    frame's MINIMUM hash; distinct selected hashes are the fingerprint
    set. Guarantee: two documents sharing any exact substring of at
    least window + k − 1 characters contain an identical frame of
    k-gram hashes, hence select at least one common fingerprint.
    Selection is by hash VALUE only (no positional tiebreak), so it is
    position-independent and identical across engines. Docs shorter
    than window + k − 1 chars yield an empty set (no guarantee possible
    — callers must not bucket them; cf. the empty-shingle NaN lesson).

    Performance: pass the k-gram array through `winnow_min_hashes` over
    a MATERIALIZED column when scanning a corpus — this convenience form
    re-inlines the md5-per-position array once per reference."""
    return winnow_min_hashes(kgram_hashes(c, k), window)


def winnow_min_hashes(h: Column, window: int = 16) -> Column:
    """Winnowing selection over an existing hash-sequence column (see
    `winnowed_fingerprints`)."""
    n = F.size(h)
    return F.when(
        n >= window,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (window - 1)),
                lambda i: F.array_min(F.slice(h, i, window)),
            )
        ),
    ).otherwise(F.array().cast("array<long>"))


def doc_fingerprint(c: Column | str, modulus: int = 2_147_483_647) -> Column:
    """Order-sensitive document fingerprint: md5-derived per-(word, position)
    hashes summed mod 2^31-1. Commutative sum + positional salt ⇒ identical
    in any engine and any evaluation order, yet sensitive to word order."""
    w = words(c)
    idx = F.sequence(F.lit(1), F.size(w))
    h = F.transform(
        idx,
        lambda i: F.conv(
            F.substring(F.md5(F.concat(F.get(w, i - 1), F.lit("@"), i.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long"),
    )
    return F.aggregate(h, F.lit(0).cast("long"), lambda acc, x: (acc + x) % modulus)
