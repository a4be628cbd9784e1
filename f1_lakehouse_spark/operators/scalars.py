"""Scalar-function queries (SURVEY.md §2.8 F1–F12) exercising the
``functions.expressions`` library against the DuckDB oracle.

These prove the Column-expression implementations (slugify, ns-pretty-print,
date formatting, zero-pad, safe_text) are bit-compatible with the SQL the
reference's consumers would run — all JVM-side, no UDFs.
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


# --- F6: slugify (fastf1_ingest.py:75) -----------------------------------------


@register(
    "f6_slugify",
    oracle="""
SELECT p_partkey,
       regexp_replace(
           regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'),
           '(^-)|(-$)', '', 'g') AS slug
FROM part
""",
    doc="slugify: lower + non-alnum→'-' + strip edge dashes",
    tags=("F6",),
)
def f6_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", slugify("p_name").alias("slug"))


# --- F8+F9: ns→seconds and ns→mm:ss.mmm (dashboard/app.py:48-58) ----------------


@register(
    "f8_f9_duration_format",
    oracle="""
WITH d AS (
    SELECT event_id, CAST(value * 1e9 AS BIGINT) AS dur_ns FROM events
), ms AS (
    SELECT event_id, dur_ns, dur_ns // 1000000 AS total_ms FROM d
)
SELECT event_id, dur_ns,
       dur_ns / 1e9 AS dur_s,
       printf('%02d:%02d.%03d',
              total_ms // 60000,
              (total_ms % 60000) // 1000,
              total_ms % 1000) AS dur_pretty
FROM ms
""",
    doc="int64-ns duration → seconds + mm:ss.mmm pretty print (codegen, no UDF)",
    tags=("F8", "F9"),
)
def f8_f9_duration_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # DuckDB CAST(double AS BIGINT) rounds half away from zero; Spark cast
    # truncates. round() first matches DuckDB; values are non-negative here.
    dur_ns = F.round(F.col("value") * F.lit(1e9), 0).cast("long")
    d = e.select("event_id", dur_ns.alias("dur_ns"))
    return d.select(
        "event_id",
        "dur_ns",
        ns_to_seconds("dur_ns").alias("dur_s"),
        ns_to_mmss("dur_ns").alias("dur_pretty"),
    )


# --- F10: timestamp parse with epoch-ns fallback (dashboard/app.py:61-68) --------


@register(
    "f10_timestamp_roundtrip",
    oracle="""
SELECT event_id,
       TRY_CAST(CAST(ts AS VARCHAR) AS TIMESTAMP) AS ts_parsed,
       make_timestamp(epoch_us(ts)) AS ts_from_us
FROM events
""",
    doc="string→timestamp parse + numeric-epoch fallback path",
    tags=("F10",),
)
def f10_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.try_to_timestamp(F.col("ts").cast("string")).alias("ts_parsed"),
        F.timestamp_micros(F.unix_micros("ts")).alias("ts_from_us"),
    )


# --- F11+F12: strftime date format + zero-pad (dashboard/app.py:140, ingest :19) -


@register(
    "f11_f12_date_format_pad",
    oracle="""
SELECT DISTINCT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       'round=' || lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0') AS round_dir
FROM orders
""",
    doc="date_format yyyy-MM-dd + zero-padded partition-dir naming",
    tags=("F11", "F12"),
)
def f11_f12_date_format_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        date_fmt("o_orderdate").alias("order_date"),
        F.concat(F.lit("round="), zero_pad(F.month("o_orderdate"))).alias("round_dir"),
    ).distinct()


# --- F4: safe_text blank-to-null repair (compat.sql:6, quoting bug fixed) --------


@register(
    "f4_safe_text",
    oracle="""
SELECT doc_id,
       NULLIF(TRIM(CAST(CASE WHEN lang = 'en' THEN '   ' ELSE source END
                        AS VARCHAR)), '') AS source_safe
FROM documents
""",
    doc="nullif(trim(cast(x as string)), '') blank repair",
    tags=("F4",),
)
def f4_safe_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    messy = F.when(F.col("lang") == "en", F.lit("   ")).otherwise(F.col("source"))
    return d.select("doc_id", safe_text(messy).alias("source_safe"))
