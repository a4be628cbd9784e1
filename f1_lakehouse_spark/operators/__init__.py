"""Operator inventory (SURVEY.md §2) — importing this package registers
every query implementation into ``f1_lakehouse_spark.registry.REGISTRY``."""

from f1_lakehouse_spark.operators import (  # noqa: F401
    aggregations,
    composites,
    copilot_queries,
    events_analytics,
    extensions,
    gold,
    joins,
    pandas_variants,
    projection,
    round5_stats,
    round6_stats,
    scalars,
    setops,
    skew,
    sorts,
    tpch_extra,
    windows,
)
