"""TPC-H shapes q2/q8/q9/q11/q13/q15/q16/q17/q20/q21, completing the suite.

The testdata is a reduced TPC-H (no ``partsupp``, no
``l_commitdate``/``l_receiptdate``, no comment columns), so each query keeps
the *structural* pattern of its TPC-H namesake — correlated-min join-back,
double-aliased dims, scalar-subquery thresholds, outer-join distributions,
EXISTS/NOT-EXISTS self-joins — with surrogate predicates over the columns
that exist. ``lineitem``'s distinct (partkey, suppkey) pairs stand in for
``partsupp``.

Determinism (driver hash-compares vs DuckDB): every double SUM/AVG goes
through exact DECIMAL accumulation (see ``aggregations.dsum``); every top-k
ORDER BY carries a unique tiebreaker; join-backs compare decimal-derived
doubles (exact in both engines), never re-accumulated floats.

Scale notes: dims broadcast; fact-side filters sit directly on the parquet
scan; the q21 flagged set is persisted once and shared by both self-join
probes (one shuffle each on l_orderkey).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.operators.aggregations import (
    DAVG,
    DSUM,
    davg_i,
    dsum_i,
)
from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table


# --- Q2 shape: correlated MIN subquery + join-back (min-cost supplier) --------
# TPC-H q2 finds, per part, the supplier with minimum ps_supplycost; here the
# surrogate "cost" is the minimum l_extendedprice observed for the part, and
# MIN(l_suppkey) breaks ties among lines that achieve it (total order).


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH minp AS (
    SELECT l_partkey, MIN(l_extendedprice) AS min_price
    FROM lineitem GROUP BY 1
), best AS (
    SELECT l.l_partkey AS p_key, m.min_price, MIN(l.l_suppkey) AS best_suppkey
    FROM lineitem l
    JOIN minp m ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.min_price
    GROUP BY 1, 2
)
SELECT p.p_partkey, p.p_brand, p.p_type, b.min_price, b.best_suppkey,
       s.s_name, n.n_name AS supp_nation
FROM best b
JOIN part p     ON p.p_partkey = b.p_key
JOIN supplier s ON s.s_suppkey = b.best_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_size BETWEEN 10 AND 30
ORDER BY b.min_price, p.p_partkey
LIMIT 100
""",
    doc="TPC-H Q2 shape: per-group MIN subquery joined back to pick the "
    "achieving supplier (unique tiebreaker), dim enrichment, top-100",
    tags=("join", "subquery", "bench"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size").between(10, 30))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    minp = li.groupBy(F.col("l_partkey").alias("mp_key")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    best = (
        li.join(
            minp,
            (li["l_partkey"] == F.col("mp_key"))
            & (li["l_extendedprice"] == F.col("min_price")),
        )
        .groupBy(F.col("mp_key").alias("p_key"), "min_price")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )
    return (
        best.join(p, best["p_key"] == p["p_partkey"])
        .join(s, best["best_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            "p_partkey",
            "p_brand",
            "p_type",
            "min_price",
            "best_suppkey",
            "s_name",
            F.col("n_name").alias("supp_nation"),
        )
        .orderBy("min_price", "p_partkey")
        .limit(100)
    )


# --- Q8 shape: market share (nation's fraction of regional import revenue) ----


@register(
    "q8_market_share",
    oracle=f"""
WITH t AS (
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           l.l_extendedprice * (1 - l.l_discount) AS rev,
           ns.n_name AS supp_nation
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE r.r_name = 'AMERICA'
      AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       {DSUM("CASE WHEN supp_nation = 'NATION_1' THEN rev ELSE 0 END")}
           / {DSUM("rev")} AS mkt_share
FROM t GROUP BY 1
""",
    doc="TPC-H Q8 shape: nation market share — 8-table join, nation dim "
    "aliased twice, conditional-revenue ratio per year",
    tags=("join", "bench"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    nat_rev = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum_i(nat_rev, 4) / dsum_i(rev, 4)).alias("mkt_share"))
    )


# --- Q9 shape: product-type profit by nation and year -------------------------
# ps_supplycost does not exist; the surrogate unit cost is 0.8*p_retailprice
# (same per-row arithmetic in both engines: ((0.8*price)*qty), left-to-right).


@register(
    "q9_product_profit",
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       {DSUM("l.l_extendedprice * (1 - l.l_discount) - 0.8 * p.p_retailprice * l.l_quantity", 4)} AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""",
    doc="TPC-H Q9 shape: profit (revenue minus cost surrogate) per supplier "
    "nation per year, part-name LIKE filter",
    tags=("join", "bench"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) - F.lit(
        0.8
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum_i(profit, 4).alias("sum_profit"))
    )


# --- Q11 shape: important stock (group value vs global-threshold subquery) ----


@register(
    "q11_important_stock",
    oracle=f"""
WITH flt AS (
    SELECT l.l_partkey, l.l_extendedprice
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_2'
), tot AS (
    SELECT {DSUM("l_extendedprice")} * 0.002 AS thr FROM flt
)
SELECT f.l_partkey AS partkey, {DSUM("f.l_extendedprice")} AS part_value
FROM flt f, tot
GROUP BY 1, tot.thr
HAVING {DSUM("f.l_extendedprice")} > tot.thr
""",
    doc="TPC-H Q11 shape: per-part value within one nation's suppliers, "
    "kept only above a scalar-subquery fraction (0.2%) of the total",
    tags=("join", "subquery", "A11", "bench"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    # per_part and total both consume flt (the 3-table join): persist AND
    # materialize before the threshold join (CLAUDE.md convention; q15 is
    # the compliant template for this scalar-threshold shape)
    flt = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("l_partkey", "l_extendedprice")
        .persist()
    )
    flt.count()
    per_part = flt.groupBy(F.col("l_partkey").alias("partkey")).agg(
        dsum_i("l_extendedprice", 2).alias("part_value")
    )
    total = flt.agg((dsum_i("l_extendedprice", 2) * F.lit(0.002)).alias("thr"))
    out = (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("thr"))
        .select("partkey", "part_value")
    )
    out = out.persist()
    out.count()
    flt.unpersist()
    return out


# --- Q13 shape: customer order-count distribution (filtered LEFT JOIN) --------


@register(
    "q13_customer_distribution",
    oracle="""
WITH c_orders AS (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
           ON c.c_custkey = o.o_custkey
          AND o.o_orderpriority <> '1-URGENT'
    GROUP BY 1
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders GROUP BY 1
""",
    doc="TPC-H Q13 shape: LEFT OUTER join with predicate in the ON clause "
    "(customers with zero orders kept), two-level count distribution",
    tags=("join", "bench"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c_orders = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- Q15 shape: top supplier (aggregate view + scalar MAX join-back) ----------


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           {DSUM("l_extendedprice * (1 - l_discount)")} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    doc="TPC-H Q15 shape: quarterly revenue view, scalar MAX subquery "
    "join-back (decimal-derived doubles compare exactly in both engines)",
    tags=("join", "subquery", "bench"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    # used twice (MAX probe + join side): persist AND materialize first
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum_i(rev, 4).alias("total_revenue"))
        .persist()
    )
    revenue.count()
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    out = (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
        .persist()
    )
    out.count()
    revenue.unpersist()
    return out


# --- Q16 shape: supplier-count distribution with NOT-IN exclusion -------------
# Distinct lineitem (partkey, suppkey) pairs stand in for partsupp; suppliers
# with negative account balance stand in for the "complaints" exclusion.


@register(
    "q16_parts_supplier_counts",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
    doc="TPC-H Q16 shape: distinct part-supplier pairs, NOT-IN supplier "
    "exclusion (anti-join), COUNT(DISTINCT) per part attribute triple",
    tags=("join", "anti", "A5", "bench"),
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    )
    excl = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(excl, ps["l_suppkey"] == excl["s_suppkey"], "left_anti")
        .join(p, ps["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q17 shape: small-quantity-order revenue (correlated AVG per part) --------


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
WITH pa AS (
    SELECT l_partkey, 0.2 * ({DAVG("l_quantity")}) AS qty_thr
    FROM lineitem GROUP BY 1
)
SELECT {DSUM("l.l_extendedprice")} / 7.0 AS avg_yearly, COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa     ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < pa.qty_thr
""",
    doc="TPC-H Q17 shape: per-part 20%%-of-average quantity threshold "
    "(correlated AVG decorrelated to a join), brand-filtered revenue",
    tags=("join", "subquery", "bench"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    pa = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (F.lit(0.2) * davg_i("l_quantity", 2)).alias("qty_thr")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(pa, li["l_partkey"] == F.col("pa_key"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            (dsum_i("l_extendedprice", 2) / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


# --- Q20 shape: excess-supply suppliers (nested semi-join chain) --------------


@register(
    "q20_excess_supply_suppliers",
    oracle="""
WITH target_parts AS (
    SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
), heavy AS (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM target_parts)
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 50
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
  AND s.s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
""",
    doc="TPC-H Q20 shape: nested IN-subqueries — parts by name, per "
    "(supplier, part) shipped quantity over a threshold, region gate",
    tags=("join", "semi", "subquery", "bench"),
)
def q20_excess_supply_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    target = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    nat = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 2)
        .select("n_nationkey")
    )
    heavy = (
        li.join(target, li["l_partkey"] == target["p_partkey"], "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
    )
    # heavy is (suppkey, partkey)-grained → SF-proportional: no broadcast
    # hint (r7 lint: a hinted scaling-key aggregate dies at the 8 GB cap at
    # 100 TB; AQE still picks broadcast at bench scale where it fits)
    return (
        s.join(heavy, s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .join(F.broadcast(nat), s["s_nationkey"] == nat["n_nationkey"], "left_semi")
        .select("s_suppkey", "s_name")
    )


# --- Q21 shape: suppliers who kept orders waiting (EXISTS + NOT EXISTS) -------
# No l_receiptdate/l_commitdate in the testdata: a line is "late" when it
# shipped more than 90 days after the order date. The q21 skeleton is intact:
# multi-supplier orders (EXISTS another supplier's line) where ONLY this
# supplier was late (NOT EXISTS another supplier's late line).


@register(
    "q21_waiting_orders",
    oracle="""
WITH flagged AS (
    SELECT l.l_orderkey, l.l_suppkey,
           CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                THEN 1 ELSE 0 END AS late
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, COUNT(*) AS numwait
FROM flagged f1
JOIN supplier s ON s.s_suppkey = f1.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE f1.late = 1
  AND n.n_regionkey = 1
  AND EXISTS (SELECT 1 FROM flagged f2
              WHERE f2.l_orderkey = f1.l_orderkey
                AND f2.l_suppkey <> f1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM flagged f3
                  WHERE f3.l_orderkey = f1.l_orderkey
                    AND f3.l_suppkey <> f1.l_suppkey
                    AND f3.late = 1)
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 25
""",
    doc="TPC-H Q21 shape: EXISTS + NOT-EXISTS self-joins on a derived "
    "late-line set; sole-late-supplier detection, top-25",
    tags=("join", "semi", "anti", "bench"),
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    flagged = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                1,
            )
            .otherwise(0)
            .alias("late"),
        )
        # both EXISTS probes self-join this frame: persist + materialize
        .persist()
    )
    flagged.count()
    f1 = flagged.filter(F.col("late") == 1).alias("f1")
    f2 = flagged.alias("f2")
    f3 = flagged.filter(F.col("late") == 1).alias("f3")
    out = (
        f1.join(
            f2,
            (F.col("f2.l_orderkey") == F.col("f1.l_orderkey"))
            & (F.col("f2.l_suppkey") != F.col("f1.l_suppkey")),
            "left_semi",
        )
        .join(
            f3,
            (F.col("f3.l_orderkey") == F.col("f1.l_orderkey"))
            & (F.col("f3.l_suppkey") != F.col("f1.l_suppkey")),
            "left_anti",
        )
        .join(s, F.col("f1.l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"], "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
        .persist()
    )
    out.count()
    flagged.unpersist()
    return out
