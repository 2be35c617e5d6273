"""Scalable global top-k: per-partition partial top-k, then a tiny final
ranking — the pattern the repo's docstrings promise for open-ended corpora
(`token_frequencies` / `weighted_sample_docs` notes).

A bare `Window.orderBy(...)` with no partition key moves the ENTIRE input
to one task (Spark warns "No Partition Defined"). For top-k that is never
necessary: each global top-k row is by definition inside its own
partition's top-k, so

  1) rank within `spark_partition_id()` and keep k rows per partition
     (narrow: no shuffle at all — the sort is per-partition), then
  2) rank the ≤ k·P survivors globally (single partition, but k·P rows —
     KB-scale for any sane k).

The result is identical to the naive global window for ANY partitioning of
the input (correctness does not depend on how rows are distributed), and
deterministic when `order_cols` is a total order (add an id tiebreak).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_topk(df: DataFrame, order_cols: list[Column], k: int, rank_col: str = "rank") -> DataFrame:
    """Top-k rows of `df` under `order_cols` (use F.desc/F.asc columns;
    must total-order the rows), with a 1-based `rank_col`. Two-stage plan:
    partial top-k per input partition, final top-k over survivors."""
    wpart = Window.partitionBy(F.spark_partition_id()).orderBy(*order_cols)
    survivors = (
        df.withColumn("__prank", F.row_number().over(wpart))
        .where(F.col("__prank") <= k)
        .drop("__prank")
    )
    # lit(0) partition: the final ranking intentionally runs in ONE
    # partition — its input is the ≤ k·P survivors, KB-scale — and the
    # explicit constant key records that intent instead of tripping
    # Spark's "No Partition Defined" warning on every query (r13). The
    # plan lint treats all-literal partition specs as partition-less, so
    # this is no escape hatch for unbounded sorts.
    wfinal = Window.partitionBy(F.lit(0)).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_col, F.row_number().over(wfinal))
        .where(F.col(rank_col) <= k)
    )


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Per-GROUP top-k with the same two-stage shape: a naive
    `Window.partitionBy(group)` moves each group to ONE task — a skew
    bottleneck when groups are few and large (a 5-language corpus puts
    N/5 rows in one task at 100 TB). Stage 1 ranks within
    (spark_partition_id, group) — narrow, no shuffle — and keeps k rows
    per (input-partition, group); stage 2 ranks the ≤ k·P survivors per
    group. Identical to the naive per-group window for any input
    distribution; deterministic when `order_cols` totally order rows
    within a group."""
    wpart = Window.partitionBy(F.spark_partition_id(), *group_cols).orderBy(*order_cols)
    survivors = (
        df.withColumn("__prank", F.row_number().over(wpart))
        .where(F.col("__prank") <= k)
        .drop("__prank")
    )
    wfinal = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_col, F.row_number().over(wfinal))
        .where(F.col(rank_col) <= k)
    )
