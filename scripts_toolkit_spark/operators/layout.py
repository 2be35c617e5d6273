"""Z-order (Morton) data layout — multi-column data skipping at rest.

Range-partitioning a 100 TB table by ONE column gives perfect pruning on
that column and none on any other: every file spans the full domain of
the second column, so a predicate on it reads everything. Interleaving
the bits of two (bucketed) columns into a MORTON key and
range-partitioning on that key instead tiles the 2-D domain into
near-square boxes: each file covers ~√P of each dimension, so
single-column predicates on EITHER column skip ~1−1/√P of the files,
and conjunctive box predicates skip almost everything
(`tests/test_storage.py::test_zorder_layout_skips_files_on_second_column`
pins the behavior via per-file parquet min/max footprints).

The key is a plain codegen expression (literal shifts/masks), so the
layout write is `repartitionByRange(n, morton).write.parquet` — one
range shuffle, no UDFs, no clustering service. This is the
delta-OPTIMIZE-ZORDER technique expressed in stock Spark (public:
Morton 1966; widely documented for lakehouse file skipping).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` of two NON-NEGATIVE int columns
    (a's bit j → key bit 2j, b's → 2j+1). Callers bucket raw values into
    [0, 2^bits) first — rank, hash, or linear scaling; the key only
    needs to be ORDER-compatible with the tiling, not reversible."""
    key = F.lit(0).cast("long")
    for j in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(a, j).bitwiseAND(F.lit(1)).cast("long"), 2 * j)
        )
        key = key.bitwiseOR(
            F.shiftleft(
                F.shiftright(b, j).bitwiseAND(F.lit(1)).cast("long"), 2 * j + 1
            )
        )
    return key


def scale_to_bits(c: Column, lo: Column, hi: Column, bits: int = 16) -> Column:
    """Linear-scale a numeric column into [0, 2^bits) given (lo, hi)
    bounds — the simplest bucketing for `morton_key`."""
    span = (hi - lo).cast("double")
    frac = (c.cast("double") - lo.cast("double")) / F.when(span > 0, span).otherwise(
        F.lit(1.0)
    )
    scaled = F.floor(frac * F.lit(float((1 << bits) - 1))).cast("int")
    return F.greatest(F.lit(0), F.least(scaled, F.lit((1 << bits) - 1)))


def zorder_write(
    df: DataFrame,
    path: str,
    a: Column,
    b: Column,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write `df` as parquet tiled by the Morton key of (a, b): one range
    shuffle into `n_files` contiguous morton ranges ⇒ ~√n_files × √n_files
    2-D boxes, each file carrying tight min/max footer stats on BOTH
    columns."""
    df.withColumn("__z", morton_key(a, b, bits)).repartitionByRange(
        n_files, "__z"
    ).drop("__z").write.mode("overwrite").parquet(path)
