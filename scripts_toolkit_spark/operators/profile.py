"""Column type profiler (SURVEY.md §2.4 A1–A3).

Re-expresses the reference's per-column heuristics
(converter.py:23-94: bool_detector / int_detector / type_detector) as ONE
distributed aggregation pass over all columns, instead of the reference's
O(columns) separate filter+dedup passes (converter.py:271).

Reference semantics preserved exactly:
- dtype object ⇒ 'str' (converter.py:87-88) — here: Spark string columns.
- bool ⇔ distinct non-null set == {0.0, 1.0} (converter.py:39-51);
  equivalently count_distinct == 2 ∧ min == 0 ∧ max == 1. Documented
  false-positive/negative caveats (all-zeros column is NOT bool; a {0,1}
  genuine-int column IS bool) are inherited deliberately.
- int ⇔ sum(distinct non-null) % 1 == 0 (converter.py:54-73), including the
  empty-column edge (sum of nothing = 0 ⇒ int) and the documented
  false-positive (fractional values summing to a whole).
- NaN counts as null (pandas pd.isnull) — doubles are NaN-normalized first.

Scale note: the single `agg` computes 2 distinct-style aggregates per
column; Catalyst plans multi-distinct aggregation with an Expand (one
row-multiplication per distinct group). For very wide matrices (thousands
of MDRM columns) this is still one shuffle-light job and beats per-column
scans by orders of magnitude; if needed, columns can be profiled in batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType, BooleanType


def profile_types(
    df: DataFrame, exclude: tuple[str, ...] = (), batch_size: int = 64
) -> dict[str, str]:
    """Return {column → 'bool'|'int'|'float'|'str'} per reference semantics.

    One aggregation job per `batch_size` numeric columns. Multi-distinct
    aggregation plans an Expand (one row replica per distinct group, 4 per
    column) — unbatched, a 5,000-column bank matrix would multiply every
    row 20,000×; batches cap the blowup at 4×batch_size per scan while
    keeping the job count O(columns/batch), still orders of magnitude
    fewer passes than the reference's per-column loops. `exclude` columns
    (ids, dates) are skipped.
    """
    numeric_cols: list[str] = []
    result: dict[str, str] = {}
    for field in df.schema.fields:
        if field.name in exclude:
            continue
        if isinstance(field.dataType, StringType):
            result[field.name] = "str"
        elif isinstance(field.dataType, BooleanType):
            result[field.name] = "bool"
        elif isinstance(field.dataType, NumericType):
            numeric_cols.append(field.name)
        else:
            # timestamps/arrays/etc. have no reference analog; treat as str
            result[field.name] = "str"

    if not numeric_cols:
        return result

    for start in range(0, len(numeric_cols), batch_size):
        batch = numeric_cols[start : start + batch_size]
        aggs = []
        for c in batch:
            # NaN → null to mirror pd.isnull (converter.py:39, 67)
            v = (
                F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c))
                if _is_floating(df, c)
                else F.col(c)
            )
            aggs += [
                F.count_distinct(v).alias(f"{c}__nd"),
                F.min(v).alias(f"{c}__mn"),
                F.max(v).alias(f"{c}__mx"),
                F.sum_distinct(v).alias(f"{c}__sd"),
            ]
        row = df.agg(*aggs).collect()[0]

        for c in batch:
            nd, mn, mx, sd = (row[f"{c}__nd"], row[f"{c}__mn"], row[f"{c}__mx"], row[f"{c}__sd"])
            if nd == 2 and mn == 0 and mx == 1:
                result[c] = "bool"
            elif (sd or 0) % 1 == 0:
                result[c] = "int"
            else:
                result[c] = "float"
    return result


def _is_floating(df: DataFrame, col: str) -> bool:
    return dict(df.dtypes)[col] in ("float", "double")


def column_stats(df: DataFrame, cols: list[str], sum_decimal: str = "decimal(18,2)") -> DataFrame:
    """One-pass per-column summary statistics (the data-profiling companion
    to `profile_types`): rows of (column_name, n, n_null, n_distinct, vmin,
    vmax, vsum). Implemented as unpivot → single grouped aggregate, so the
    input is scanned ONCE regardless of column count — the shape that holds
    for a 5,000-column bank matrix.

    `vsum` accumulates in decimal (exact) and is returned as double."""
    melted = df.unpivot(
        [], [F.col(c).cast("double").alias(c) for c in cols], "column_name", "value"
    )
    return melted.groupBy("column_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").isNull().cast("bigint")).alias("n_null"),
        F.count_distinct("value").alias("n_distinct"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.sum(F.col("value").cast(sum_decimal)).cast("double").alias("vsum"),
    )
