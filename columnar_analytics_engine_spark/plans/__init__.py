"""Plan inspection: assert pushdown/broadcast/codegen properties of plans."""

from columnar_analytics_engine_spark.plans.explain import (
    formatted_plan,
    has_pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
)

__all__ = [
    "formatted_plan",
    "has_pushed_filters",
    "read_schema_columns",
    "uses_broadcast_join",
]
