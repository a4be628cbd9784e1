"""Projection / filter / predicate operators (SURVEY.md §2.2 P1–P10).

Each query re-expresses a reference pattern over the synthetic tables.
All of these compile to a single parquet scan with pushed filters and a
pruned ReadSchema — verify with ``df.explain("formatted")``; none shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table


# --- P2+P3: `* EXCLUDE(keys)` + typed re-projection of partition keys ------
# (reference transform/models/silver/laps.sql:5-9: drop raw partition cols,
# re-add try_cast'ed versions, rename session → session_code)


@register(
    "p2_p3_silver_reprojection",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       CAST(year(o_orderdate) AS INTEGER)  AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       o_orderpriority AS priority_code
FROM orders
""",
    doc="EXCLUDE + typed key re-projection + rename (silver model shape)",
    tags=("P2", "P3"),
)
def p2_p3_silver_reprojection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    keep = [c for c in o.columns if c not in ("o_orderdate", "o_orderpriority")]
    return o.select(
        *keep,
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.col("o_orderpriority").alias("priority_code"),
    )


# --- P3/F1: try_cast null-on-failure semantics ------------------------------
# (reference models/silver/laps.sql:5-6 `try_cast(season as integer)`)


@register(
    "p3_try_cast",
    oracle="""
SELECT doc_id,
       TRY_CAST(substr(source, 4) AS INTEGER) AS source_num,
       TRY_CAST(lang AS INTEGER)              AS lang_num
FROM documents
""",
    doc="try_cast: null on failure (lang is never numeric → NULL column)",
    tags=("P3", "F1"),
)
def p3_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring("source", 4, 2_147_483_647).try_cast("int").alias("source_num"),
        F.col("lang").try_cast("int").alias("lang_num"),
    )


# --- P5: IS NOT NULL filter (driver_session_summary.sql:4) ------------------


@register(
    "p5_filter_not_null",
    oracle="""
SELECT l_orderkey, l_linenumber, l_suppkey, NULLIF(l_tax, 0) AS tax_nz
FROM lineitem
WHERE NULLIF(l_tax, 0) IS NOT NULL
""",
    doc="NULL predicate over a nullable measure",
    tags=("P5",),
)
def p5_filter_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    tax_nz = F.nullif(F.col("l_tax"), F.lit(0.0))
    return li.select(
        "l_orderkey", "l_linenumber", "l_suppkey", tax_nz.alias("tax_nz")
    ).filter(F.col("tax_nz").isNotNull())


# --- P6: IN-list predicate (team_event_summary.sql:5) ------------------------


@register(
    "p6_in_list",
    oracle="""
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
GROUP BY 1, 2
""",
    doc="IN-list predicate + group count",
    tags=("P6", "A1"),
)
def p6_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


# --- P7: parameterized equality predicates (dashboard/app.py:131-242) -------


@register(
    "p7_param_eq",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_returnflag = 'R' AND l_linestatus = 'F'
""",
    doc="two-key parameterized equality filter (dashboard $param analog)",
    tags=("P7",),
)
def p7_param_eq(
    spark: SparkSession, sf_dir: str, returnflag: str = "R", linestatus: str = "F"
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == F.lit(returnflag))
        & (F.col("l_linestatus") == F.lit(linestatus))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# --- P8: COALESCE/NULLIF key repair (driver_session_summary.sql:12) ---------


@register(
    "p8_coalesce_nullif",
    oracle="""
SELECT c_custkey,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), CAST(c_nationkey AS VARCHAR))
           AS segment_repaired
FROM customer
""",
    doc="COALESCE(NULLIF(key, sentinel), fallback-cast) repair",
    tags=("P8", "F2", "F3"),
)
def p8_coalesce_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
            F.col("c_nationkey").cast("string"),
        ).alias("segment_repaired"),
    )


# --- P9: CASE WHEN boolean→int (transform/macros/safe.sql:1-3) ---------------


@register(
    "p9_case_when",
    oracle="""
SELECT event_id, event_type,
       CASE WHEN value > 50 THEN 1 ELSE 0 END AS is_high
FROM events
""",
    doc="CASE WHEN cond THEN 1 ELSE 0 (bool_to_int macro)",
    tags=("P9",),
)
def p9_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.when(F.col("value") > 50, 1).otherwise(0).alias("is_high"),
    )


# --- P10: NULL-% profiling scan (notebook cell 14) ---------------------------


@register(
    "p10_null_profile",
    oracle="""
SELECT AVG(CASE WHEN l_orderkey      IS NULL THEN 1.0 ELSE 0.0 END) AS l_orderkey_null_frac,
       AVG(CASE WHEN l_quantity      IS NULL THEN 1.0 ELSE 0.0 END) AS l_quantity_null_frac,
       AVG(CASE WHEN l_extendedprice IS NULL THEN 1.0 ELSE 0.0 END) AS l_extendedprice_null_frac,
       AVG(CASE WHEN NULLIF(l_tax, 0) IS NULL THEN 1.0 ELSE 0.0 END) AS tax_nz_null_frac
FROM lineitem
""",
    doc="per-column null-fraction data-quality scan (one pass, no shuffle)",
    tags=("P10",),
)
def p10_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def frac(c: F.Column, name: str) -> F.Column:
        return F.avg(c.isNull().cast("double")).alias(name)

    return li.agg(
        frac(F.col("l_orderkey"), "l_orderkey_null_frac"),
        frac(F.col("l_quantity"), "l_quantity_null_frac"),
        frac(F.col("l_extendedprice"), "l_extendedprice_null_frac"),
        frac(F.nullif(F.col("l_tax"), F.lit(0.0)), "tax_nz_null_frac"),
    )
