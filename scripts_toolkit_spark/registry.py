"""All driver-contract query registrations, grouped by SURVEY.md §2 area.

One `register(...)` call per implemented operator demonstration. This file
is the single auditable map from the §2 inventory to runnable queries.
"""

from __future__ import annotations

from scripts_toolkit_spark.contract import register
from scripts_toolkit_spark.plans import analytics

# ---- headline join/aggregate queries (J1/J4 broadcast enrichment, A5-ish
# grouped aggregation, §2.7/§2.4) -------------------------------------------
register("pricing_summary", analytics.pricing_summary, analytics.PRICING_SUMMARY_SQL)
register("revenue_by_nation", analytics.revenue_by_nation, analytics.REVENUE_BY_NATION_SQL)
register("top_unshipped_orders", analytics.top_unshipped_orders, analytics.TOP_UNSHIPPED_ORDERS_SQL)
register("order_priority_counts", analytics.order_priority_counts, analytics.ORDER_PRIORITY_COUNTS_SQL)
