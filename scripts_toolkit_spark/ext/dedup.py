"""Deduplication operators for training-data pipelines
(SURVEY.md §2.12 [extension], north star: BASELINE.json).

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup, all built from
engine-portable md5-derived hashes (cross-engine deterministic — the DuckDB
oracle recomputes identical signatures) and shuffle-frugal plans:

- exact: hash-groupBy on the full text (or a digest at scale);
- MinHash+LSH: signatures are per-row array expressions (no shuffle);
  banding explodes to (band, key) and ONE groupBy-join finds candidates —
  the classic shingle→minhash→band→bucket-join pipeline. Candidate pairs
  are then verified with exact Jaccard over distinct shingles;
- SimHash: 16-bit sign-of-sums fingerprint, Hamming-ball pairing via
  bit_count(xor);
- at 100 TB the only all-to-all operation is the bucket join on band keys,
  whose fan-in is controlled by (bands, rows-per-band) — the standard
  s-curve tuning knobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- exact ----
def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """D1/exact: one survivor per distinct key set (first by a stable
    tiebreak id is the scalable form of pandas drop_duplicates)."""
    return df.dropDuplicates(cols)


def duplicate_groups(df: DataFrame, key: Column, id_col: str = "doc_id") -> DataFrame:
    """Exact-dup group report: key → group size + member ids (hash-groupBy;
    at scale `key` is md5(text) so the shuffle moves 16-byte digests, not
    documents)."""
    return (
        df.groupBy(key.alias("dup_key"))
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.array_sort(F.collect_list(id_col)).alias("members"),
        )
        .where(F.col("group_size") > 1)
    )


# ------------------------------------------------------------- shingles ----
def word_shingles(c: Column | str, k: int = 3) -> Column:
    """k-word shingles as an array column. Empty-safe: Spark's
    sequence(1, 0) counts DOWN ([1, 0]), so docs shorter than k words must
    short-circuit to an empty array explicitly."""
    w = F.split(c if isinstance(c, Column) else F.col(c), " ")
    n = F.size(w)
    shingles = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", *[F.get(w, i + j - 1) for j in range(k)]),
    )
    return F.when(n >= k, shingles).otherwise(F.array().cast("array<string>"))


# -------------------------------------------------------------- minhash ----
def minhash_signature(shingles: Column, perms: int = 16) -> Column:
    """MinHash signature: per permutation p, min over shingles of
    md5(p || '|' || shingle). Lexicographic min over fixed-width hex ==
    numeric min; md5 makes the signature engine-portable."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{p}|"), s)))
            )
            for p in range(perms)
        ]
    )


def lsh_bands(signature: Column, bands: int, rows: int) -> Column:
    """Band keys: md5 over each contiguous `rows`-slice of the signature."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("#", F.slice(signature, b * rows + 1, rows))).alias("key"),
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    perms: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → band → bucket self-join →
    exact-Jaccard verification. Returns (id_a, id_b, jaccard) with
    id_a < id_b and jaccard >= threshold."""
    rows = perms // bands
    # Materialization boundary: the signature expression tree is referenced
    # once per band slice AND once per self-join leg — left lazy, Catalyst
    # inlines it ~(bands × 2)× and the md5 work multiplies (measured 10×
    # wall-clock at sf0.1). Repartition spreads the signature computation
    # across cores (single-file inputs arrive as one partition);
    # localCheckpoint materializes it exactly once and cuts lineage.
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    sig = (
        docs.repartition(parallelism)
        .select(F.col(id_col), word_shingles(text_col, k).alias("shingles"))
        .select(
            F.col(id_col),
            F.array_distinct("shingles").alias("sset"),
            lsh_bands(minhash_signature(F.col("shingles"), perms), bands, rows).alias("bands"),
        )
        # docs shorter than k words have NO shingles: their band keys all
        # collapse to md5('') so they'd pair with each other, and the
        # verify ratio is 0/0 — NULL in Spark but NaN (> threshold) in a
        # DuckDB replay. Exclude them before banding; they can never be
        # near-dups of anything.
        .where(F.size("sset") > 0)
        .localCheckpoint()
    )

    banded = sig.select(id_col, F.explode("bands").alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
        )
        .distinct()
    )

    sets = sig.select(F.col(id_col), "sset")
    verified = (
        cand.join(sets.withColumnsRenamed({id_col: "id_a", "sset": "set_a"}), "id_a")
        .join(sets.withColumnsRenamed({id_col: "id_b", "sset": "set_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("set_a", "set_b")).cast("double")
            / F.size(F.array_union("set_a", "set_b")).cast("double"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def minhash_containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    perms: int = 16,
    bands: int = 4,
    containment_threshold: float = 0.8,
) -> DataFrame:
    """CONTAINMENT dedup — catches doc-inside-doc duplication that
    symmetric Jaccard misses (a paragraph quoted whole inside a larger
    page has low Jaccard but containment ≈ 1). Same banded-minhash
    candidate generation as `minhash_lsh_pairs` (equi-join on band keys,
    no cartesian), then DIRECTIONAL verification:
    containment(a→b) = |shingles(a) ∩ shingles(b)| / |shingles(a)|.
    Returns pairs where either direction crosses the threshold.

    Caveat (documented scale path): minhash bands approximate JACCARD, so
    an extreme small-in-huge containment pair may not collide in any
    band; production containment at 100 TB uses one-sided shingle
    sampling for candidates. At the near-dup ratios this demo targets the
    band recall is the same as the Jaccard pipeline's."""
    rows = perms // bands
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    sig = (
        docs.repartition(parallelism)
        .select(F.col(id_col), word_shingles(text_col, k).alias("shingles"))
        .select(
            F.col(id_col),
            F.array_distinct("shingles").alias("sset"),
            lsh_bands(minhash_signature(F.col("shingles"), perms), bands, rows).alias("bands"),
        )
        # empty shingle sets: band keys collapse to md5('') and containment
        # is 0/0 (NULL in Spark, NaN-in-DuckDB divergence) — exclude
        .where(F.size("sset") > 0)
        .localCheckpoint()
    )
    banded = sig.select(id_col, F.explode("bands").alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b"))
        .distinct()
    )
    sets = sig.select(F.col(id_col), "sset")
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("double")
    return (
        cand.join(sets.withColumnsRenamed({id_col: "id_a", "sset": "set_a"}), "id_a")
        .join(sets.withColumnsRenamed({id_col: "id_b", "sset": "set_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (inter / F.size("set_a").cast("double")).alias("containment_ab"),
            (inter / F.size("set_b").cast("double")).alias("containment_ba"),
        )
        .where(
            (F.col("containment_ab") >= containment_threshold)
            | (F.col("containment_ba") >= containment_threshold)
        )
    )


# -------------------------------------------------------------- simhash ----
def simhash16(shingles: Column) -> Column:
    """16-bit SimHash: per shingle take the first 16 bits of md5, sum ±1 per
    bit position, fingerprint bit = (sum > 0). Engine-portable via hex conv.

    Single-pass shape: one md5 per shingle (values array), ONE fold carrying
    a 16-long accumulator array. Sixteen separate per-bit folds would
    re-inline the shingle/md5 expression tree 16× (Catalyst copies
    subexpression trees per reference — measured 50s → 2s at sf0.1)."""
    vals = F.transform(shingles, lambda s: F.conv(F.substring(F.md5(s), 1, 4), 16, 10).cast("long"))
    zeros = F.array_repeat(F.lit(0).cast("long"), 16)
    # shiftright needs a literal count, but the bit index is the lambda
    # position — zip against a plan-time literal array of 2^j divisors;
    # floor(x / 2^j) % 2 is exact for x < 2^16 in double math
    powers = F.array(*[F.lit(float(1 << j)) for j in range(16)])
    bit_sums = F.aggregate(
        vals,
        zeros,
        lambda acc, x: F.zip_with(
            acc,
            powers,
            lambda a, p: a + (F.floor(x / p).cast("long") % 2) * 2 - 1,
        ),
    )
    # fingerprint = Σ (bit_sum[j] > 0) << j — built as a base-2 string so the
    # shift amount can be the lambda index (shiftleft needs a literal)
    bits_msb_first = F.transform(
        F.reverse(bit_sums), lambda a: F.when(a > 0, F.lit("1")).otherwise(F.lit("0"))
    )
    return F.conv(F.array_join(bits_msb_first, ""), 2, 10).cast("long")


def simhash64(shingles: Column) -> Column:
    """64-bit SimHash as a struct(fp_hi, fp_lo) of two 32-bit halves — the
    corpus-scale fingerprint width (the 16-bit form saturates at ~10^5
    docs: 65,536 distinct values means every bucket collides and
    Hamming ≤ r pairs nearly everything; 64 bits keep random pairs at
    E[hamming] = 32, far outside any real-dup ball).

    Two-halves representation instead of one signed 64-bit value: every
    intermediate stays < 2^32, so `conv`/bit-ops never touch the sign bit
    in Spark (ANSI overflow) and the DuckDB replay never needs HUGEINT —
    identical bit layout in both engines. Bit j of the logical fingerprint
    lives in fp_lo for j < 32, fp_hi bit (j−32) otherwise; per shingle the
    md5's first 8 hex chars feed the hi half, chars 9-16 the lo half.

    Same single-pass shape as `simhash16`: one md5 per shingle, ONE fold
    carrying a 64-long accumulator (per-bit folds would re-inline the
    shingle expression tree 64×)."""
    def _half_sums(hex_start: int) -> Column:
        # One fold per half with a 32-long accumulator: a single 64-wide
        # fold with a `when(j < 32, lo, hi)` branch per element costs an
        # extra conditional on every one of the 64 updates (measured ~25%
        # of the fingerprint stage); two branch-free 32-wide folds do the
        # same total updates. floor(x / 2^b) % 2 is exact: x < 2^32 is
        # exactly representable and dividing by a power of two only shifts
        # the exponent.
        vals = F.transform(
            shingles,
            lambda s: F.conv(F.substring(F.md5(s), hex_start, 8), 16, 10).cast("long"),
        )
        zeros = F.array_repeat(F.lit(0).cast("long"), 32)
        # plan-time literal 2^j divisors: pow() per element update was the
        # next-largest cost after the when-branch
        powers = F.array(*[F.lit(float(1 << j)) for j in range(32)])
        return F.aggregate(
            vals,
            zeros,
            lambda acc, x: F.zip_with(
                acc,
                powers,
                lambda a, p: a + (F.floor(x / p).cast("long") % 2) * 2 - 1,
            ),
        )

    def _half(sums: Column) -> Column:
        bits_msb_first = F.transform(
            F.reverse(sums), lambda a: F.when(a > 0, F.lit("1")).otherwise(F.lit("0"))
        )
        return F.conv(F.array_join(bits_msb_first, ""), 2, 10).cast("long")

    return F.struct(
        _half(_half_sums(1)).alias("fp_hi"),
        _half(_half_sums(9)).alias("fp_lo"),
    )


def simhash64_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs over 64-bit SimHash (hi/lo halves), Hamming ≤ r,
    paired by the same PIGEONHOLE equi-join as `simhash_pairs`: split the
    64 logical bits into (r+1) contiguous pieces — within Hamming r at
    least one piece matches exactly — explode to (piece_idx, piece)
    sub-keys, self-equi-join, exact-Hamming verify. Recall 1.0 by
    construction; candidate volume bounded by sub-key bucket sizes.
    Piece extraction masks/shifts the halves (a piece straddling the
    lo/hi boundary combines both), so every value stays < 2^32."""
    pieces = max_hamming + 1
    degenerate = pieces > 64
    if degenerate:
        pieces = 1
    base, rem = divmod(64, pieces)
    widths = [base + (1 if p < rem else 0) for p in range(pieces)]
    offsets = [sum(widths[:p]) for p in range(pieces)]

    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    fp = (
        docs.repartition(parallelism)
        .select(F.col(id_col), simhash64(word_shingles(text_col)).alias("f"))
        .select(id_col, F.col("f.fp_hi").alias("fp_hi"), F.col("f.fp_lo").alias("fp_lo"))
        .localCheckpoint()
    )

    def _piece(o: int, w: int) -> Column:
        if degenerate:
            return F.lit(0).cast("long")
        if o >= 32:
            return F.shiftright("fp_hi", o - 32).bitwiseAND(F.lit((1 << w) - 1))
        if o + w <= 32:
            return F.shiftright("fp_lo", o).bitwiseAND(F.lit((1 << w) - 1))
        lo_w = 32 - o
        lo_part = F.shiftright("fp_lo", o).bitwiseAND(F.lit((1 << lo_w) - 1))
        hi_part = F.col("fp_hi").bitwiseAND(F.lit((1 << (o + w - 32)) - 1))
        return F.shiftleft(hi_part, lo_w).bitwiseOR(lo_part)

    piece_keys = F.array(
        *[
            F.struct(
                F.lit(p).alias("piece_idx"),
                _piece(offsets[p], widths[p]).alias("piece"),
            )
            for p in range(pieces)
        ]
    )
    ex = fp.select(id_col, "fp_hi", "fp_lo", F.explode(piece_keys).alias("pc")).select(
        id_col,
        "fp_hi",
        "fp_lo",
        F.col("pc.piece_idx").alias("piece_idx"),
        F.col("pc.piece").alias("piece"),
    )
    a = ex.select(
        F.col(id_col).alias("id_a"),
        F.col("fp_hi").alias("ha"),
        F.col("fp_lo").alias("la"),
        "piece_idx",
        "piece",
    )
    b = ex.select(
        F.col(id_col).alias("id_b"),
        F.col("fp_hi").alias("hb"),
        F.col("fp_lo").alias("lb"),
        "piece_idx",
        "piece",
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) + F.bit_count(
        F.col("la").bitwiseXOR(F.col("lb"))
    )
    return (
        a.join(b, ["piece_idx", "piece"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs: Hamming distance over 16-bit SimHash ≤ r, paired by
    PIGEONHOLE equi-join — exact results, no all-pairs plan.

    Split the fingerprint into (r+1) contiguous bit pieces: two fingerprints
    within Hamming distance r differ in at most r bit positions, so at least
    one piece matches EXACTLY. Explode each doc to its (piece_idx, piece)
    sub-keys, self-equi-join on them, dedup pairs that collide on several
    pieces, then apply the exact Hamming filter. Recall is 1.0 by
    construction (identical output to the all-pairs theta join), and the
    plan is a shuffled hash equi-join on (piece_idx, piece) — candidate
    volume per reducer is bounded by the sub-key bucket sizes, which is what
    survives 100 TB where a BroadcastNestedLoopJoin over N² pairs cannot.
    """
    pieces = max_hamming + 1
    degenerate = pieces > 16
    if degenerate:
        # Hamming ball covers the whole 16-bit space: every pair qualifies,
        # so the sub-key must be a CONSTANT (lit 0) — slicing the full
        # fingerprint would only pair identical fingerprints and break the
        # recall-1.0 guarantee.
        pieces = 1
    base, rem = divmod(16, pieces)
    widths = [base + (1 if p < rem else 0) for p in range(pieces)]
    offsets = [sum(widths[:p]) for p in range(pieces)]

    # Materialization boundary: the fingerprint expression tree (shingle +
    # md5 fold) feeds `pieces` sub-key slices AND both join legs — left
    # lazy, Catalyst would inline it per reference.
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    fp = (
        docs.repartition(parallelism)
        .select(F.col(id_col), simhash16(word_shingles(text_col)).alias("fingerprint"))
        .localCheckpoint()
    )

    piece_keys = F.array(
        *[
            F.struct(
                F.lit(p).alias("piece_idx"),
                (
                    F.lit(0)
                    if degenerate
                    else F.shiftright("fingerprint", offsets[p]).bitwiseAND(
                        F.lit((1 << widths[p]) - 1)
                    )
                ).alias("piece"),
            )
            for p in range(pieces)
        ]
    )
    ex = fp.select(id_col, "fingerprint", F.explode(piece_keys).alias("pc")).select(
        id_col,
        "fingerprint",
        F.col("pc.piece_idx").alias("piece_idx"),
        F.col("pc.piece").alias("piece"),
    )
    a = ex.select(
        F.col(id_col).alias("id_a"), F.col("fingerprint").alias("fa"), "piece_idx", "piece"
    )
    b = ex.select(
        F.col(id_col).alias("id_b"), F.col("fingerprint").alias("fb"), "piece_idx", "piece"
    )
    return (
        a.join(b, ["piece_idx", "piece"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )
