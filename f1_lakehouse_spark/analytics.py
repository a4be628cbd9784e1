"""The dashboard/notebook analytics query set (SURVEY.md §3.3, §2 P7/A5–A10/
O1–O3) as a parameterized library over the medallion tables — the engine
twin of the reference Streamlit app's five queries (reference
``dashboard/app.py:130-242``) plus the S9 client-materialization helper.

Each function returns a lazy DataFrame; filters are real parameters (the
reference's DuckDB ``$param`` binding) that Catalyst folds into pushed
predicates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.functions.expressions import date_fmt
from f1_lakehouse_spark.tables import load_table


def _lineitem_year(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.year("l_shipdate") == F.lit(year))


def session_date(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    """dashboard/app.py:130-137: MIN(timestamp) of the selected scope,
    formatted yyyy-MM-dd."""
    return _lineitem_year(spark, sf_dir, year).agg(
        date_fmt(F.min("l_shipdate")).alias("session_date")
    )


def kpis(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    """dashboard/app.py:145-158: scope KPI row (counts + distincts + best)."""
    return _lineitem_year(spark, sf_dir, year).agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.min("l_extendedprice").alias("best_price"),
    )


def fastest_topk(
    spark: SparkSession, sf_dir: str, year: int, k: int = 50
) -> DataFrame:
    """dashboard/app.py:169-189: top-k cheapest lines, engine-side."""
    return (
        _lineitem_year(spark, sf_dir, year)
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .limit(k)
    )


def team_summary_view(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    """dashboard/app.py:196-205: per-group rollup of the scope."""
    return (
        _lineitem_year(spark, sf_dir, year)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.min("l_extendedprice").alias("best_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def pace_curve(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    """dashboard/app.py:231-242: exact MEDIAN measure per sequence position."""
    return (
        _lineitem_year(spark, sf_dir, year)
        .groupBy("l_linenumber")
        .agg(F.median("l_quantity").alias("median_qty"))
        .orderBy("l_linenumber")
    )


def to_client(df: DataFrame, max_rows: int = 10_000) -> pd.DataFrame:
    """S9 (reference dashboard/app.py `.df()` calls): Arrow-backed pandas
    materialization, always behind a row cap."""
    return df.limit(max_rows).toPandas()
