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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    spread_col: str | None = None,
) -> DataFrame:
    """Skewed large-large equi-join via salting: the skewed (left) side gets a
    deterministic salt in [0, n_salts) derived from ``spread_col`` (any
    per-row column — only its distribution matters, never the result), and
    the right side is replicated once per salt with ``explode(sequence(...))``.
    Joining on (key, salt) splits each hot key across ``n_salts`` reducers.

    Result == plain ``left.join(right, key)`` exactly: the salt routes rows,
    it never selects them. AQE's skew-join split handles this adaptively;
    this is the explicit form for engines/plans where AQE can't see the skew
    (e.g. skew introduced by an upstream transform AQE stats miss).

    At 100 TB: replication costs n_salts× the right side — use for
    mid-sized right tables; for broadcast-sized ones broadcast() already
    avoids the shuffle, and for two huge sides prefer AQE.
    """
    spread = F.col(spread_col) if spread_col else F.monotonically_increasing_id()
    salted_left = left.withColumn(
        "_salt", F.pmod(F.crc32(spread.cast("string")), F.lit(n_salts)).cast("int")
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return salted_left.join(salted_right, [key, "_salt"]).drop("_salt")


@register(
    "skew_salted_join",
    oracle="""
SELECT o.o_orderpriority,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(27,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
    doc="salted large-large join == plain join (right side replicated per "
    "salt, hot join keys spread over 8 reducers; oracle is the unsalted join)",
    tags=("skew", "salting", "join", "extension"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, "l_orderkey", n_salts=8, spread_col="l_linenumber")
    return joined.groupBy("o_orderpriority").agg(
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                "decimal(27,6)"
            )
        )
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )
