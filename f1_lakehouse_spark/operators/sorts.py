"""Sort / limit / top-k operators (SURVEY.md §2.6 O1–O5).

Every ORDER BY ... LIMIT here carries unique tiebreak columns so the k-row
result is a deterministic set (the driver hashes values order-insensitively,
but a *different subset* under ties would still mismatch). Spark executes
these as TakeOrderedAndProject — no global sort materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table


# --- O1: multi-key mixed-direction ORDER BY + LIMIT (check_gold.sh:19-22) -----


@register(
    "o1_latest_best_sample",
    oracle="""
WITH best AS (
    SELECT CAST(year(l_shipdate) AS INTEGER)  AS y,
           CAST(month(l_shipdate) AS INTEGER) AS m,
           l_suppkey,
           MIN(l_extendedprice) AS best_price
    FROM lineitem GROUP BY 1, 2, 3
)
SELECT y, m, l_suppkey, best_price
FROM best
ORDER BY y DESC, m DESC, best_price ASC, l_suppkey
LIMIT 5
""",
    doc="ORDER BY y DESC, m DESC, price LIMIT 5 (latest-best sample)",
    tags=("O1",),
)
def o1_latest_best_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    best = li.groupBy(
        F.year("l_shipdate").alias("y"),
        F.month("l_shipdate").alias("m"),
        "l_suppkey",
    ).agg(F.min("l_extendedprice").alias("best_price"))
    return best.orderBy(
        F.col("y").desc(), F.col("m").desc(), F.col("best_price").asc(), "l_suppkey"
    ).limit(5)


# --- O2: presentation ORDER BY (full result) -----------------------------------


@register(
    "o2_order_by_presentation",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey
FROM nation ORDER BY n_regionkey, n_name
""",
    doc="plain multi-key ORDER BY for presentation",
    tags=("O2",),
)
def o2_order_by_presentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.select("n_nationkey", "n_name", "n_regionkey").orderBy(
        "n_regionkey", "n_name"
    )


# --- O3: top-k pushed into the engine (dashboard/app.py:183-189) ---------------


@register(
    "o3_topk_cheapest_lines",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber
LIMIT 50
""",
    doc="engine-side top-50 (TakeOrderedAndProject, not client-side head())",
    tags=("O3",),
)
def o3_topk_cheapest_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").asc(), "l_orderkey", "l_linenumber")
        .limit(50)
    )


# --- O5: LIMIT 1 existence probe (dashboard/app.py:31) --------------------------


@register(
    "o5_existence_probe",
    oracle="SELECT COUNT(*) AS table_exists FROM (SELECT 1 AS one FROM lineitem LIMIT 1) t",
    doc="SELECT 1 FROM t LIMIT 1 existence probe (as a countable row)",
    tags=("O5",),
)
def o5_existence_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(F.lit(1).alias("one"))
        .limit(1)
        .agg(F.count("*").alias("table_exists"))
    )


# --- O6 (beyond ref): keyset-stable pagination ---------------------------------------
# LIMIT/OFFSET pagination over a TOTAL order (unique c_custkey tiebreak, so
# page boundaries are deterministic under parallel execution). Spark
# compiles ORDER BY + OFFSET + LIMIT into a single global-limit plan — but
# at scale OFFSET still sorts/skips the whole prefix, so the docstring
# contract for deep pages is keyset pagination (WHERE key > last_seen ORDER
# BY key LIMIT n, i.e. o5's probe shape); this query is the page-2 form.


@register(
    "o6_pagination_offset",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 20 OFFSET 40
""",
    doc="ordered pagination: page 3 of the balance leaderboard via "
    "LIMIT 20 OFFSET 40 over a total order",
    tags=("O6", "sort", "pagination"),
)
def o6_pagination_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .offset(40)
        .limit(20)
    )
