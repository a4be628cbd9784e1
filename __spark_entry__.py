"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001;
``queries()`` / ``oracle_sql()`` expose every registered operator from
``f1_lakehouse_spark`` (SURVEY.md §2 inventory + pipeline extensions) for
the driver's DuckDB differential gate at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from f1_lakehouse_spark.operators.gold import flagship_supplier_summary

    return flagship_supplier_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from f1_lakehouse_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column aliases)."""
    from f1_lakehouse_spark.registry import all_oracles

    return all_oracles()
