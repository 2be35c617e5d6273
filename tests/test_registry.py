"""Registry-wide contract lints.

The driver's correctness gate canonicalizes each result with pandas
(sort_values over every column, then value-hash). ARRAY/MAP/STRUCT cells
arrive as Python lists/dicts — unhashable — and crash the gate even when
the values are correct (round-2 `near_dup_clusters` failure). These lints
build every registered query's plan once (no action beyond what the plan
builders themselves run) so the class of bug cannot recur.
"""

from __future__ import annotations

from pyspark.sql import types as T

from scripts_toolkit_spark import contract

COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_registry_schema_lints(spark, sf_dir):
    oracles = contract.oracle_sql()
    complex_offenders: list[str] = []
    dupe_offenders: list[str] = []
    for name, fn in sorted(contract.queries().items()):
        df = fn(spark, sf_dir)
        cols = df.columns
        if len(cols) != len(set(cols)):
            dupe_offenders.append(f"{name}: {cols}")
        if name in oracles:
            for field in df.schema.fields:
                if isinstance(field.dataType, COMPLEX):
                    complex_offenders.append(
                        f"{name}.{field.name}: {field.dataType.simpleString()}"
                    )
    assert not complex_offenders, (
        "oracle-gated queries must emit only scalar columns "
        "(driver canonicalizer cannot sort/hash list/dict cells): "
        + str(complex_offenders)
    )
    assert not dupe_offenders, (
        f"queries with duplicate column names: {dupe_offenders}"
    )


def test_oracle_sql_keys_subset_of_queries():
    qs = set(contract.queries())
    extra = set(contract.oracle_sql()) - qs
    assert not extra, f"oracle entries without a matching query: {sorted(extra)}"
