"""Set operations (SURVEY.md §2.7 — absent in the reference, provided as
Spark-native extensions: UNION ALL / UNION / INTERSECT / EXCEPT)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table


@register(
    "set_union_all_entities",
    oracle="""
SELECT 'customer' AS kind, c_custkey AS entity_key, c_acctbal AS acctbal FROM customer
UNION ALL
SELECT 'supplier' AS kind, s_suppkey AS entity_key, s_acctbal AS acctbal FROM supplier
""",
    doc="UNION ALL of two conformant projections",
    tags=("setop",),
)
def set_union_all_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("entity_key"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionAll(s)


@register(
    "set_intersect_active_years",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS y FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT CAST(year(o_orderdate) AS INTEGER) AS y FROM orders WHERE o_orderstatus = 'O'
""",
    doc="INTERSECT (distinct semantics) of two filtered projections",
    tags=("setop",),
)
def set_intersect_active_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f_years = o.filter(F.col("o_orderstatus") == "F").select(
        F.year("o_orderdate").alias("y")
    )
    o_years = o.filter(F.col("o_orderstatus") == "O").select(
        F.year("o_orderdate").alias("y")
    )
    return f_years.intersect(o_years)


@register(
    "set_except_inactive_customers",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
""",
    doc="EXCEPT (distinct semantics): customers minus finalized-order customers",
    tags=("setop",),
)
def set_except_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o)
