"""Skew mitigation utilities: salting for hot keys.

AQE's skew-join splitting (enabled session-wide) covers joins; hot-key
AGGREGATION skew needs salting — the classic two-phase decomposition:

    groupBy(key)  →  groupBy(key, salt) partial  →  groupBy(key) final

Any algebraic aggregate (SUM/COUNT/MIN/MAX) decomposes exactly, so the
salted plan is value-identical to the direct one while spreading each hot
key over ``n_salts`` reducers. Registered as a query whose oracle is the
UNsalted SQL — proving the decomposition is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table


def salted_sum_count(
    df: DataFrame,
    key: str,
    measure: Column,
    n_salts: int = 8,
    measure_name: str = "total",
) -> DataFrame:
    """Two-phase salted SUM + COUNT per key (exact decimal accumulation so
    the re-aggregation stays order-independent)."""
    salted = df.withColumn("_salt", F.pmod(F.crc32(F.col(key).cast("string")), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(measure.cast("decimal(27,6)")).alias("_psum"),
        F.count("*").alias("_pcnt"),
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").cast("double").alias(measure_name),
        F.sum("_pcnt").alias("n_rows"),
    )


@register(
    "skew_salted_aggregate",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total,
       COUNT(*) AS n_rows
FROM events GROUP BY 1
""",
    doc="salted two-phase aggregation == direct aggregation (hot-key spread "
    "over 8 reducers; oracle is the unsalted query)",
    tags=("skew", "salting", "extension"),
)
def skew_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # event_type has only 5 values — exactly the hot-key shape (every key
    # is "hot"); salting fans each one out 8-ways before the final combine.
    e = load_table(spark, sf_dir, "events")
    return salted_sum_count(e, "event_type", F.col("value"), n_salts=8)
