"""Mergeable deterministic quantile sketch (SURVEY §2 [extension] —
third member of the oracle-replayable sketch family next to the md5 HLL
(plans/ext_demos2.py:474) and the Count-Min monitor
(streaming/cms_stream.py)).

Exact per-group quantiles at 100 TB need a full sort (or Spark's
engine-private Greenwald-Khanna `percentile_approx`, which no other
engine can replay bit-for-bit). This sketch is the classic BOTTOM-K
RANK SAMPLE with md5 priorities:

    state(group) = the k rows with the SMALLEST md5(row key) —
    a uniform-without-replacement sample, deterministic, and MERGEABLE:
    bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B)),

so shard/day/batch sketches union and re-prune to the identical state a
one-shot pass produces (pinned by tests/test_quantiles.py::
test_bottomk_merge_equals_oneshot) — the property that lets a 100 TB
pipeline keep per-partition state and answer any quantile later without
re-scanning. The quantile estimate is the sample's own order statistic
(element ceil(q·n) of the sorted sample values — exact stored doubles,
no interpolation, no libm), so every engine replays the estimate
BIT-FOR-BIT and the DuckDB oracle gate applies to an approximate
algorithm. Standard error is the rank-sample bound ~1/(2√k) on the rank
(k=256 ⇒ ±3 rank points at 95%), pinned empirically by
test_bottomk_quantile_rank_error.

Scale shape: the per-group bottom-k routes through the two-stage
`grouped_topk` (operators/topk.py) — stage 1 prunes to k rows per
(input partition, group) with NO shuffle, stage 2 ranks the ≤ k·P
survivors — never a single-task-per-group global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scripts_toolkit_spark.operators.topk import grouped_topk

_PRIORITY = "__pr"


def bottomk_sample(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """(group…, value, __pr): the k rows with the smallest md5(key) per
    group — the sketch state. `key_col` must identify rows uniquely for
    the uniform-sample interpretation (md5 ties break on value, so the
    result is total-order deterministic regardless). Null values are
    excluded, matching percentile/quantile_cont semantics."""
    pr = F.md5(F.col(key_col).cast("string"))
    rows = df.where(F.col(value_col).isNotNull()).select(
        *group_cols, F.col(value_col), pr.alias(_PRIORITY)
    )
    return grouped_topk(
        rows, group_cols, [F.asc(_PRIORITY), F.asc(value_col)], k, rank_col="__rk"
    ).drop("__rk")


def merge_bottomk(
    parts: list[DataFrame],
    group_cols: list[str],
    value_col: str,
    k: int,
) -> DataFrame:
    """Union shard states and re-prune to k — the sketch merge. Equals the
    one-shot state over the union of the shards' inputs (bottom-k is a
    prefix of the global md5 order, and each shard state contains its
    own prefix)."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return grouped_topk(
        u, group_cols, [F.asc(_PRIORITY), F.asc(value_col)], k, rank_col="__rk"
    ).drop("__rk")


def sample_quantiles(
    sample: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: dict[str, float],
) -> DataFrame:
    """One row per group: n_sample + one column per requested quantile,
    each the sample's ceil(q·n)-th order statistic (an EXACT stored
    value — cross-engine replayable with no float interpolation)."""
    agg = sample.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(value_col)).alias("__vs"),
        F.count(F.lit(1)).alias("n_sample"),
    )

    def est(q: float) -> Column:
        idx = F.greatest(
            F.lit(1), F.ceil(F.lit(q) * F.col("n_sample")).cast("int")
        )
        return F.element_at("__vs", idx)

    return agg.select(
        *group_cols,
        F.col("n_sample").cast("bigint").alias("n_sample"),
        *[est(q).alias(name) for name, q in qs.items()],
    )
