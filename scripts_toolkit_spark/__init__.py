"""scripts_toolkit_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference toolkit (call-report/scripts-toolkit): ingest
heterogeneous regulatory-data formats, normalize into flat / long-typed-EAV /
hierarchical shapes, clean, profile, reshape, enrich via joins, traverse
hierarchies, run ordered stateful scans — plus the large-scale
training-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns).

Design stance (SURVEY.md §7):
- DataFrame / SQL API exclusively; no RDDs.
- Native Catalyst expressions first; Python only behind Arrow-vectorized
  `mapInPandas` / `pandas_udf` for format decoders.
- No custom Catalyst rules: every optimization the reference lacks
  (projection fusion, pushdown, broadcast joins, AQE) comes built-in once the
  plan is declared lazily.
- Long typed-EAV parquet partitioned by `quarter` is the canonical fact
  layout; wide matrices are pivoted views.
"""

__version__ = "0.1.0"

from scripts_toolkit_spark.session import get_spark  # noqa: F401
