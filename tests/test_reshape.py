"""Profiler + melt/pivot semantics vs the reference's documented behavior
(converter.py:23-94 detectors, :130-182 melt null rules)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from scripts_toolkit_spark.operators.profile import profile_types
from scripts_toolkit_spark.operators.reshape import melt_to_eav, pivot_from_eav
from scripts_toolkit_spark.plans.xport import wide_to_eav


def _wide(spark):
    rows = [
        # entity, DATE,      b,    zeros, two_ints, ints, floats, s
        (1, 20220630.0, 0.0, 0.0, 3.0, 10.0, 1.5, "a"),
        (2, 20220630.0, 1.0, 0.0, 5.0, None, 2.25, None),
        (3, 20220630.0, None, 0.0, 3.0, 7.0, None, "c"),
        (4, 20220630.0, 1.0, 0.0, 5.0, 7.0, float("nan"), "d"),
    ]
    return spark.createDataFrame(
        rows,
        "entity long, DATE double, b double, zeros double, two_ints double, "
        "ints double, floats double, s string",
    )


def test_profiler_reference_edge_cases(spark):
    tm = profile_types(_wide(spark), exclude=("entity", "DATE"))
    assert tm["b"] == "bool"  # {0,1} exactly
    assert tm["zeros"] == "int"  # all-zeros: NOT bool (len(set)==1), sum 0 → int
    assert tm["two_ints"] == "int"  # {3,5}: two values but != {0,1} → not bool
    assert tm["ints"] == "int"  # whole floats, sum distinct 17 → int
    assert tm["floats"] == "float"  # 1.5+2.25=3.75 → float; NaN ignored
    assert tm["s"] == "str"


def test_melt_null_semantics(spark):
    eav = wide_to_eav(_wide(spark))
    rows = {(r["rssd"], r["mdrm"]): r for r in eav.collect()}

    # bool: ALWAYS emitted; null → False
    assert rows[(1, "b")]["bool_data"] is False
    assert rows[(2, "b")]["bool_data"] is True
    assert rows[(3, "b")]["bool_data"] is False  # null bool still emitted
    assert rows[(2, "b")]["data_type"] == "bool"

    # int: nulls skipped; cast truncates
    assert (2, "ints") not in rows
    assert rows[(1, "ints")]["int_data"] == 10

    # float: nulls AND NaN skipped
    assert (3, "floats") not in rows
    assert (4, "floats") not in rows  # NaN treated as null (pd.isnull)
    assert rows[(2, "floats")]["float_data"] == 2.25

    # str: nulls skipped
    assert (2, "s") not in rows
    assert rows[(3, "s")]["str_data"] == "c"

    # quarter extracted from constant DATE column
    assert rows[(1, "b")]["quarter"] == 20220630

    # exactly one typed column non-null per row
    for r in rows.values():
        non_null = sum(
            r[c] is not None for c in ("bool_data", "int_data", "float_data", "str_data")
        )
        assert non_null == 1, r


def test_pivot_round_trip(spark):
    eav = wide_to_eav(_wide(spark))
    wide = pivot_from_eav(
        eav.where(F.col("data_type") == "float"), ["floats"], "float_data"
    ).collect()
    by_id = {r["rssd"]: r["floats"] for r in wide}
    assert by_id[1] == 1.5 and by_id[2] == 2.25


def test_profile_types_batching_equivalence(spark):
    """Batched profiling (the wide-matrix scale path) must return exactly
    the single-pass result regardless of batch size."""
    from pyspark.sql import functions as F
    from scripts_toolkit_spark.operators.profile import profile_types

    # 101 rows: an odd count of +0.5 offsets keeps sum_distinct fractional,
    # dodging the documented int-detector false-positive (profile.py:21)
    df = spark.range(101).select(
        *[
            (F.col("id") * (i + 1) + (0.5 if i % 4 == 2 else 0)).alias(f"c{i}")
            for i in range(20)
        ],
        (F.col("id") % 2).cast("double").alias("flag"),
    )
    full = profile_types(df)
    for bs in (1, 3, 7, 64):
        assert profile_types(df, batch_size=bs) == full
    assert full["flag"] == "bool" and full["c2"] == "float" and full["c0"] == "int"

    # and with MORE real columns than the default batch size, so the
    # default path actually crosses a batch boundary (70 cols → 2 batches)
    wide = spark.range(31).select(
        *[
            (F.col("id") * (i + 1) + (0.5 if i % 3 == 1 else 0)).alias(f"w{i}")
            for i in range(70)
        ]
    )
    assert profile_types(wide) == profile_types(wide, batch_size=200)


def test_melt_chunked_unpivot_equivalence(spark, monkeypatch):
    """r10 wide-path fix: past _UNPIVOT_CHUNK columns the melt chunks its
    unpivot into a union of narrow Expands (a single 600-col Expand falls
    off whole-stage codegen, ~4x per-row cost — scale_probe melt). The
    chunked form must be ROW-IDENTICAL to the single-unpivot form on a
    mixed-type 150-column frame, at several chunk widths including one
    that leaves a ragged tail."""
    from pyspark.sql import functions as F

    from scripts_toolkit_spark.operators import reshape as R

    n_each = 50  # 150 value columns: 50 float, 50 int, 50 str
    df = spark.range(40).select(
        F.col("id").alias("rssd"),
        *[
            F.when((F.col("id") + i) % 7 != 0, F.col("id") * 1.5 + i).alias(f"f{i}")
            for i in range(n_each)
        ],
        *[
            F.when((F.col("id") + i) % 5 != 0, F.col("id") * 3 + i).alias(f"i{i}")
            for i in range(n_each)
        ],
        *[
            F.when((F.col("id") + i) % 3 != 0, F.concat(F.lit("s"), F.col("id") + i)).alias(
                f"s{i}"
            )
            for i in range(n_each)
        ],
    )
    type_map = (
        {f"f{i}": "float" for i in range(n_each)}
        | {f"i{i}": "int" for i in range(n_each)}
        | {f"s{i}": "str" for i in range(n_each)}
    )

    def rows(chunk):
        monkeypatch.setattr(R, "_UNPIVOT_CHUNK", chunk)
        return sorted(
            tuple(r) for r in R.melt_to_eav(df, type_map, 20240630).collect()
        )

    single = rows(10_000)  # one unpivot per family — the pre-r10 shape
    assert single, "degenerate: empty melt"
    for chunk in (64, 7):  # default-sized and ragged-tail chunking
        assert rows(chunk) == single, f"chunk={chunk} diverged"
