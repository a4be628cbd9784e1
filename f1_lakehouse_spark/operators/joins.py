"""Join operators (SURVEY.md §2.3 J1–J2) + Spark-native join extensions.

J1 (compound-key LEFT JOIN) lives in ``operators.gold`` inside the flagship.
Here: the pace×weather analytical join (J2), the broadcast star join that a
100 TB fact table demands, semi/anti joins, and a TPC-H Q3-shaped
select-join-agg-topk.

Scale notes: dimension sides (nation/region/customer at reference scale)
are broadcast — no shuffle of the fact table for enrichment. Fact-to-fact
joins pre-aggregate both sides to the join key before joining (shuffle the
small aggregates, not the raw rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.operators.aggregations import (
    DAVG,
    DSUM,
    davg_i,
    dsum_i,
)
from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table


# --- J2: pace × weather analytical LEFT JOIN (notebook cell 25) --------------
# Per-month best lineitem price joined to the month's order-level "conditions"
# aggregate — the reference's per-session best lap × weather join shape.


@register(
    "j2_pace_conditions_join",
    oracle=f"""
WITH pace AS (
    SELECT CAST(year(l_shipdate) AS INTEGER)  AS y,
           CAST(month(l_shipdate) AS INTEGER) AS m,
           MIN(l_extendedprice) AS best_price,
           COUNT(*) AS n_lines
    FROM lineitem GROUP BY 1, 2
), conditions AS (
    SELECT CAST(year(o_orderdate) AS INTEGER)  AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           {DAVG("o_totalprice")} AS avg_order_value,
           MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS had_final
    FROM orders GROUP BY 1, 2
)
SELECT p.y, p.m, p.best_price, p.n_lines, c.avg_order_value, c.had_final
FROM pace p LEFT JOIN conditions c USING (y, m)
""",
    doc="per-key aggregate LEFT JOIN aggregate (pace × weather shape)",
    tags=("J2", "A3", "A8", "A9"),
)
def j2_pace_conditions_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    pace = li.groupBy(
        F.year("l_shipdate").alias("y"), F.month("l_shipdate").alias("m")
    ).agg(F.min("l_extendedprice").alias("best_price"), F.count("*").alias("n_lines"))
    conditions = o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(
        davg_i("o_totalprice", 2).alias("avg_order_value"),
        F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("had_final"),
    )
    return pace.join(conditions, on=["y", "m"], how="left").select(
        "y", "m", "best_price", "n_lines", "avg_order_value", "had_final"
    )


# --- Broadcast star join: fact → dim → dim chain ------------------------------


@register(
    "join_star_broadcast",
    oracle=f"""
SELECT r.r_name AS region, n.n_name AS nation,
       COUNT(*) AS n_customers,
       {DSUM("c.c_acctbal")} AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""",
    doc="star-schema enrichment with explicitly broadcast dims (no fact shuffle pre-agg)",
    tags=("join", "broadcast"),
)
def join_star_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            dsum_i("c_acctbal", 2).alias("total_acctbal"),
        )
    )


# --- Semi / anti joins (EXISTS / NOT EXISTS) ----------------------------------
# Absent in the reference (SURVEY §2.3) — included as the Spark-native way to
# express its existence probes at scale.


@register(
    "join_semi_customers_with_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
    doc="LEFT SEMI join (EXISTS)",
    tags=("join", "semi"),
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_anti_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
    doc="LEFT ANTI join (NOT EXISTS): customers with no very-large order",
    tags=("join", "anti"),
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


# --- TPC-H Q3 shape: 3-way join + agg + deterministic top-k -------------------


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
       {DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY 1, 3, 4
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3 shape: filtered 3-way join, group agg, total-order top-10",
    tags=("join", "bench", "O3"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_i(revenue, 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --- TPC-H Q5 shape: multi-way star join with regional filter ----------------------


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n.n_name AS nation, {DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
""",
    doc="TPC-H Q5 shape: 6-table star join, broadcast dims, regional pushdown",
    tags=("join", "bench"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum_i(revenue, 4).alias("revenue"))
    )


# --- TPC-H Q6 shape: pure filter + aggregate (pushdown showcase) --------------------


@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {DSUM("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 shape: all predicates pushed to the parquet scan, single agg",
    tags=("bench",),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum_i(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --- TPC-H Q10 shape: returned-item reporting (join + agg + top-k w/ details) -------


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       c.c_acctbal, n.n_name AS nation
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1, 2, 4, 5
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 shape: returned-item revenue per customer, top-20 with dims",
    tags=("join", "bench", "O3"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation")
        )
        .agg(dsum_i(revenue, 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- TPC-H Q18 shape: large-volume customers (agg subquery semi-filter) -------------


@register(
    "q18_large_volume_customers",
    oracle=f"""
WITH big AS (
    SELECT l_orderkey
    FROM lineitem GROUP BY 1
    HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 150
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       {DSUM("l.l_quantity")} AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY 1, 2, 3, 4, 5
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    doc="TPC-H Q18 shape: IN-subquery over a HAVING aggregate (semi-join), top-25",
    tags=("join", "bench", "A11"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # r11 optimization (guide §2.3/§2.4): the HAVING aggregate already IS
    # the final per-order quantity sum — dsum(l_quantity) grouped by the
    # final key set degenerates to one row per qualifying order because
    # o_orderkey is unique in orders and c_custkey in customer. So instead
    # of semi-joining lineitem back and re-aggregating it (two lineitem
    # passes + a pair-key shuffle of every qualifying line), join the tiny
    # qualifying-order aggregate straight to orders and customer: one
    # lineitem scan, no semi join, no re-aggregation. Result-identical to
    # the oracle's IN-subquery formulation (kept verbatim); the semi-join
    # operator exemplar lives on in q4_order_priority_check.
    # integer-scaled exact sum (see aggregations.dsum_i): l_quantity is a
    # verified <=2-decimal domain, so rint(qty*100) summed as compact
    # decimal is value-identical to the decimal(27,6) accumulation; the
    # HAVING threshold compares in the same x100 integer domain
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(
                F.rint(F.col("l_quantity") * F.lit(100.0))
                .cast("long")
                .cast("decimal(20,0)")
            ).alias("_qcents")
        )
        .filter(F.col("_qcents") > 15000)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            (F.col("_qcents") * F.lit(0.01).cast("decimal(3,2)"))
            .cast("double")
            .alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


# --- TPC-H Q4 shape: EXISTS + priority count ----------------------------------------


@register(
    "q4_order_priority_check",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY 1
""",
    doc="TPC-H Q4 shape: EXISTS semi-join + priority counts",
    tags=("join", "semi", "bench"),
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --- TPC-H Q12 shape: join + dual conditional counts --------------------------------


@register(
    "q12_priority_shipping",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
""",
    doc="TPC-H Q12 shape: fact join + priority-class conditional counts",
    tags=("join", "A2", "bench"),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- TPC-H Q14 shape: conditional-sum ratio (scalar result) -------------------------


@register(
    "q14_promo_revenue_ratio",
    oracle=f"""
SELECT 100.0 * {DSUM("CASE WHEN p.p_type LIKE 'PROMO%' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
             / {DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
""",
    doc="TPC-H Q14 shape: ratio of conditional revenue sums (broadcast part dim)",
    tags=("join", "A2", "bench"),
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    joined = li.join(p, li["l_partkey"] == p["p_partkey"])
    return joined.agg(
        (
            F.lit(100.0)
            * dsum_i(promo_rev, 4)
            / dsum_i(rev, 4)
        ).alias("promo_revenue_pct")
    )


# --- TPC-H Q19 shape: disjunctive multi-column predicates ---------------------------


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
SELECT {DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue, COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 50)
""",
    doc="TPC-H Q19 shape: OR-of-ANDs predicate across both join sides",
    tags=("join", "predicates", "bench"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(dsum_i(rev, 4).alias("revenue"), F.count("*").alias("n_lines"))
    )


# --- TPC-H Q22 shape: scalar subquery threshold + anti-join -------------------------


@register(
    "q22_global_sales_opportunity",
    oracle=f"""
WITH avg_bal AS (
    SELECT {DAVG("c_acctbal")} AS v FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment, COUNT(*) AS n_customers, {DSUM("c.c_acctbal")} AS total_bal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.v
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY 1
""",
    doc="TPC-H Q22 shape: above-average balance + no-urgent-order anti-join",
    tags=("join", "anti", "subquery", "bench"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # uncorrelated scalar: exact decimal avg, crossJoin-broadcast the 1-row frame
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(27,6)")).cast("double")
                / F.count("c_acctbal")
            ).alias("v")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("v"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            c["c_custkey"] == o["o_custkey"],
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"), dsum_i("c_acctbal", 2).alias("total_bal"))
    )


# --- TPC-H Q7 shape: nation-pair volume (same dim joined twice) ---------------------


@register(
    "q7_nation_pair_volume",
    oracle=f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       {DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
WHERE ns.n_regionkey <> nc.n_regionkey
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
""",
    doc="TPC-H Q7 shape: the nation dim joined twice (supplier- and "
    "customer-side aliases), cross-region trade only",
    tags=("join", "bench"),
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"),
        F.col("n_name").alias("supp_nation"),
        F.col("n_regionkey").alias("ns_region"),
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"),
        F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("nc_region"),
    )
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("ns_region") != F.col("nc_region"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(dsum_i(rev, 4).alias("revenue"))
    )


# --- interval-overlap join, bucketed decomposition ---------------------------------
# The non-equi join Spark can't hash: "which pairs of intervals overlap".
# A conditional join would be a per-key cartesian; the scalable plan maps
# each interval to the week-buckets it spans (bounded fan-out:
# ceil(len/bucket)+1 rows per interval), EQUI-joins on (key, bucket), then
# verifies exact overlap and de-duplicates pairs matched in several
# buckets. Semantics proven against the naive overlap-join oracle.
# At 100 TB: fan-out is a small constant, the join is a plain shuffled
# equi-join on (custkey, bucket), and no executor ever materializes a
# cartesian block — the same decomposition Flink/KDB interval joins use.

_INTERVAL_DAYS = 30
_BUCKET_DAYS = 7
_EPOCH = "1992-01-01"


@register(
    "join_interval_overlap_bucketed",
    oracle=f"""
WITH o AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE) + {_INTERVAL_DAYS} AS e
  FROM orders
)
SELECT a.o_custkey AS custkey,
       a.o_orderkey AS okey_a, b.o_orderkey AS okey_b,
       date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) AS overlap_days
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
 AND a.s < b.e AND b.s < a.e
""",
    doc="interval-overlap self-join via week-bucket equi-join decomposition "
    "(oracle: naive non-equi overlap join)",
    tags=("join", "interval", "extension"),
)
def join_interval_overlap_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(F.col("o_orderdate").cast("date"), _INTERVAL_DAYS).alias("e"),
    )
    epoch = F.lit(_EPOCH).cast("date")
    # half-open [s, e): last bucket is the one containing e-1
    buckets = o.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.datediff(F.col("s"), epoch) / _BUCKET_DAYS),
                F.floor(F.datediff(F.date_sub(F.col("e"), 1), epoch) / _BUCKET_DAYS),
            )
        ).alias("bucket"),
    )
    # self-join on a derived frame: persist AND materialize first
    buckets = buckets.persist()
    buckets.count()
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .filter(
            (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e"))
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("okey_a"),
            F.col("b.o_orderkey").alias("okey_b"),
            F.datediff(
                F.least(F.col("a.e"), F.col("b.e")),
                F.greatest(F.col("a.s"), F.col("b.s")),
            ).alias("overlap_days"),
        )
        .distinct()  # a pair can meet in several shared buckets
    )
    out = pairs.persist()
    out.count()
    buckets.unpersist()
    return out


# --- sideways information passing: collected-bound prefilter join ------------------
# The explicit form of a runtime filter (a.k.a. semi-join reduction /
# Bloom-less DSI): aggregate the SELECTIVE build side to [min,max] key
# bounds (one tiny driver row), inject them as LITERAL predicates on the
# probe scan — they show up in the parquet scan's PushedFilters, so row
# groups outside the bound never leave storage — then run the exact join.
# Sound for any data (bounds only widen the semi-join), so the oracle is
# the plain join. Pruning power depends on key-range clustering: on this
# synthetic corpus urgent orders span the whole key range (the scan prunes
# little), but with time-ordered ingest at 100 TB each file's key range is
# tight and the bound skips most of the fact table. Spark's own
# InjectRuntimeFilter does this adaptively; the explicit form works on any
# deployment and composes with static partition pruning.

_PREFILTER_BUILD_PRED = "o_orderpriority = '1-URGENT' AND o_orderdate >= DATE '1997-06-01'"


@register(
    "join_minmax_prefilter",
    oracle=f"""
SELECT l.l_returnflag,
       COUNT(*) AS n_lines,
       {DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE {_PREFILTER_BUILD_PRED}
GROUP BY 1
""",
    doc="runtime-filter join: build-side [min,max] key bounds pushed into "
    "the probe parquet scan, then exact join (sideways information passing)",
    tags=("J2", "prefilter", "runtime-filter"),
)
def join_minmax_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    build = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-06-01").cast("date"))
    ).select("o_orderkey")
    lo, hi = build.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    if lo is None:  # empty build side -> provably empty join
        lo, hi = 0, -1
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey").between(F.lit(lo), F.lit(hi))
    )
    return (
        li.join(build, li["l_orderkey"] == build["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            dsum_i(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
        )
    )


# --- full outer join: two-sided reconciliation ---------------------------------------
# The audit shape every warehouse needs: two independently-derived per-key
# aggregates FULL OUTER joined so rows present on only one side surface
# explicitly (the reconciliation report). Both sides pre-aggregate to one
# row per key BEFORE the join — the full-outer shuffle carries |keys|, not
# |facts| — and the presence classification is a null-pattern CASE, so the
# whole report is one sort-merge pass after two partial aggregations.


@register(
    "join_full_outer_reconcile",
    oracle="""
WITH o AS (SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY 1),
e AS (SELECT user_id AS k, COUNT(*) AS n_events FROM events GROUP BY 1)
SELECT COALESCE(o.k, e.k) AS custkey,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(e.n_events, 0) AS n_events,
       CASE WHEN o.k IS NULL THEN 'events_only'
            WHEN e.k IS NULL THEN 'orders_only'
            ELSE 'both' END AS presence
FROM o FULL OUTER JOIN e ON o.k = e.k
""",
    doc="two-sided reconciliation: per-key order counts FULL OUTER joined "
    "with per-key event counts, one-sided keys classified — aggregates "
    "collapse to |keys| rows before the outer shuffle",
    tags=("J2", "join", "full-outer"),
)
def join_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("ko"))
        .agg(F.count("*").alias("n_orders"))
    )
    e = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("ke"))
        .agg(F.count("*").alias("n_events"))
    )
    j = o.join(e, o["ko"] == e["ke"], "full_outer")
    return j.select(
        F.coalesce("ko", "ke").alias("custkey"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.when(F.col("ko").isNull(), F.lit("events_only"))
        .when(F.col("ke").isNull(), F.lit("orders_only"))
        .otherwise(F.lit("both"))
        .alias("presence"),
    )


# --- Bloom-filter runtime join filter (semi-join reduction by membership) -----------
# The hash-membership complement to join_minmax_prefilter: [min,max] bounds
# prune NOTHING when the build side's keys span the whole key range (the
# usual case for a predicate uncorrelated with key order), but a Bloom
# filter prunes by membership regardless of key distribution — this is
# Spark's own InjectRuntimeFilter / bloom_filter_agg made explicit, and the
# same sideways-information-passing trick every warehouse engine ships.
# Build: the SELECTIVE side's distinct keys fold into ONE aggregate row
# (k hashed bit positions per key -> bit_or per 64-bit word -> sparse
# map<word,bits>; Kirsch-Mitzenmacher double hashing off two md5 halves,
# the engine-wide deterministic-hash convention in pipeline/hashing.py).
# Probe: the one-row frame is cross-joined (aggregated -> broadcastable)
# and each fact row tests its k bits map-side BEFORE the join shuffle, so
# non-matching fact rows never enter the exchange. False positives cost
# shuffle bytes only — the exact equi-join behind the filter keeps
# semantics identical to the plain join (the oracle). False negatives
# cannot happen: every build key set its own bits. m auto-sizes from the
# observed build cardinality (constants are floors — CLAUDE.md sizing
# rule) and is capped: at the cap, fp rises but the filter stays sound.
# At 100 TB: the build side is the already-selective dimension filter, the
# bloom is O(m) bytes independent of the fact table, and the fact scan
# gains a map-side filter where the minmax variant degenerates to a no-op.

_BLOOM_JOIN_K = 4
_BLOOM_JOIN_BITS_PER_KEY = 16
_BLOOM_JOIN_M_FLOOR = 1 << 10
_BLOOM_JOIN_M_CAP = 1 << 22

_BLOOM_JOIN_BUILD_PRED = (
    "o_totalprice >= 400000 AND o_orderpriority = '1-URGENT'"
)


def _bloom_hash_halves(key: Column) -> tuple[Column, Column]:
    """Two independent 64-bit integers for the double-hash probe scheme.

    r11: xxhash64 (native, whole-stage-codegen) instead of md5 + two conv
    string parses — FilterExec does no common-subexpression elimination,
    so the probe condition re-evaluated the md5/conv chain once per probe
    bit (8× per row; measured ~2.4 s of the probe pass at sf0.1). The
    Bloom filter is result-transparent (no false negatives under ANY hash
    family; the oracle is the plain join), so the hash choice is purely an
    execution detail — unlike pipeline.hashing's md5 keys, these bits
    never surface in a result or an oracle. Probe-side masking keeps the
    mixed values non-degenerate; pmod keeps positions non-negative."""
    h1 = F.xxhash64(key)
    h2 = F.xxhash64(key, F.lit(0x9E3779B9))
    return h1, h2


def bloom_filter_frame(keys: DataFrame, col: str, n_keys: int) -> DataFrame:
    """ONE-row Bloom filter over ``keys[col]`` as ``(m, words: map<long,
    long>)``, built fully distributed (k exploded bit positions per
    distinct key, ``bit_or`` per 64-bit word, one sparse-map fold).
    ``n_keys`` sizes ``m`` (pow2 in [floor, cap]); pass the build side's
    observed count. An empty build side folds to one row with an empty
    map, which rejects every probe — the correct inner-join limit."""
    m = _BLOOM_JOIN_M_FLOOR
    while m < n_keys * _BLOOM_JOIN_BITS_PER_KEY and m < _BLOOM_JOIN_M_CAP:
        m *= 2
    h1, h2 = _bloom_hash_halves(F.col("_k"))
    pos = F.pmod(h1 + F.col("_i").cast("long") * h2, F.lit(m).cast("long"))
    return (
        keys.select(F.col(col).alias("_k"))
        .filter(F.col("_k").isNotNull())
        .distinct()
        .withColumn("_i", F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_JOIN_K - 1))))
        .withColumn("_pos", pos)
        .select(
            (F.col("_pos") / 64).cast("long").alias("word"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(pmod(_pos, 64) as int))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("word", "bits")))
            ).alias("_bloom_words")
        )
        .select(F.lit(m).cast("long").alias("_bloom_m"), "_bloom_words")
    )


def bloom_prefilter(fact: DataFrame, fact_key: str, bloom: DataFrame) -> DataFrame:
    """``fact`` rows whose ``fact_key`` passes the one-row Bloom ``bloom``
    (from :func:`bloom_filter_frame`) — a MAP-SIDE semi-join reduction
    evaluated before any join shuffle. No false negatives, so following
    with the exact equi-join reproduces the plain join row-for-row.

    r11 (guide §5 / §3.2): the bloom row is COLLECTED to the driver (one
    row, <= 512 KB at the m cap — the k-means-centroid convention:
    model-sized state embeds as literals), densified to a word array in
    Python, and embedded as a constant-folded array literal. The previous
    crossJoin(broadcast(bloom)) carried the words as a per-row MAP column:
    Spark's map element_at is a linear scan per lookup (O(rows × k ×
    words)), and the join output copied the whole structure into every
    probe row's UnsafeRow — together ~5 s per probe pass at sf0.1 (600k
    rows). Now the probe is a pure map-side Filter: O(1) ``element_at``
    on a folded literal (the index is provably in [1, m/64] — pmod(·, m)
    div 64 + 1 — so plain element_at never hits its ANSI out-of-bounds
    path), measured ~1 s."""
    row = bloom.collect()[0]  # 1-row aggregate: the trained filter
    m = int(row["_bloom_m"])
    dense = [0] * (m // 64)
    for w, bits in row["_bloom_words"].items():
        dense[int(w)] = int(bits)
    # one parser round-trip instead of m/64 py4j literal calls
    words = F.expr("array(" + ",".join(f"{b}L" for b in dense) + ")")
    h1, h2 = _bloom_hash_halves(F.col(fact_key))
    probe = fact.withColumn("_bw", words)  # folded literal: dropped below
    cond = F.lit(True)
    for i in range(_BLOOM_JOIN_K):
        probe = probe.withColumn(
            f"_rf_pos{i}",
            F.pmod(h1 + F.lit(i).cast("long") * h2, F.lit(m).cast("long")),
        )
        # array is 1-indexed and dense: word w lives at position w+1, O(1)
        hit = F.expr(
            f"(element_at(_bw, cast(_rf_pos{i} div 64 as int) + 1) "
            f"& shiftleft(cast(1 as bigint), cast(pmod(_rf_pos{i}, 64) as int)"
            f")) != 0"
        )
        cond = cond & hit
    return probe.filter(cond).drop(
        "_bw", *[f"_rf_pos{i}" for i in range(_BLOOM_JOIN_K)]
    )


@register(
    "join_bloom_runtime_filter",
    oracle=f"""
SELECT l.l_linestatus,
       COUNT(*) AS n_lines,
       {DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE {_BLOOM_JOIN_BUILD_PRED}
GROUP BY 1
""",
    doc="Bloom-filter runtime join filter (semi-join reduction by hash "
    "membership — Spark's InjectRuntimeFilter made explicit): the "
    "selective order predicate's keys fold into one sparse Bloom row, "
    "every lineitem row tests its k bits MAP-SIDE before the join "
    "shuffle, then the exact equi-join runs behind the filter. Prunes "
    "where join_minmax_prefilter cannot (build keys spanning the full "
    "key range); oracle is the plain join — false positives cost shuffle "
    "bytes, never rows.",
    tags=("join", "prefilter", "runtime-filter"),
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    build = o.filter(
        (F.col("o_totalprice") >= 400000)
        & (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_orderkey")
    # one cheap action on the already-filtered build side sizes m
    n_keys = build.count()
    bloom = bloom_filter_frame(build, "o_orderkey", max(n_keys, 1))
    li = load_table(spark, sf_dir, "lineitem")
    pruned = bloom_prefilter(li, "l_orderkey", bloom)
    return (
        pruned.join(build, pruned["l_orderkey"] == build["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n_lines"),
            dsum_i(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
        )
    )
