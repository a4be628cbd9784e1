"""The reference's model tree on its own schema, Spark-first.

Semantics re-expressed (never copied) from the reference:

- silver: recursive hive-partitioned scan, ``SELECT * EXCLUDE`` of the four
  partition keys re-added with types, ``session`` → ``session_code``
  (reference ``transform/models/silver/laps.sql:1-9``, same for
  results/weather).
- gold ``driver_session_summary`` (from the compiled artifact semantics —
  the source Jinja is corrupted, SURVEY.md §2.11 D1): filter timed laps,
  driver-key repair ``COALESCE(NULLIF(driver,''), CAST(drivernumber AS
  VARCHAR))``, personal-best ROW_NUMBER window ASC NULLS LAST, conditional
  pit-lane aggregates, 7-key LEFT JOIN + COALESCE(...,0)
  (``driver_session_summary.sql:4,12,20-35,40-41,46-59``).
- gold ``team_event_summary``: race/quali/sprint IN-filter + re-aggregation
  (``team_event_summary.sql:5,7-15``).
- the 17 not_null contract columns (``models/silver/schema.yml:5-29``,
  ``models/gold/schema.yml:5-24``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_lakehouse_spark.functions.expressions import to_snake_df

DSS_KEYS = [
    "season",
    "round",
    "grand_prix",
    "session_code",
    "driver",
    "driver_number",
    "team",
]

# not_null contracts (silver schema.yml: 3 keys x 3 tables; gold schema.yml)
SILVER_NOT_NULL = ["season", "round", "session_code"]
GOLD_DSS_NOT_NULL = ["season", "round", "session_code", "driver"]
GOLD_TES_NOT_NULL = ["season", "round", "session_code", "team"]


def silver_from_bronze(spark: SparkSession, bronze_path: str) -> DataFrame:
    """silver model shape shared by laps/results/weather: snake_case the
    open schema, re-type the partition keys, rename session→session_code."""
    raw = to_snake_df(spark.read.parquet(bronze_path))
    keep = [c for c in raw.columns if c not in ("season", "round", "session")]
    return raw.select(
        *keep,
        F.col("season").cast("int").alias("season"),
        F.col("round").cast("int").alias("round"),
        F.col("session").cast("string").alias("session_code"),
    ).withColumn("grand_prix", F.col("grand_prix").cast("string"))


def driver_session_summary(silver_laps: DataFrame) -> DataFrame:
    """Reference ``driver_session_summary.sql`` (compiled artifact):
    driver_base renames drivernumber → driver_number (line 11); pitstops
    counts ``pitintime IS NOT NULL OR pitouttime IS NOT NULL`` (line 39);
    laps_on_track is the NULL-and-NULL complement (line 38)."""
    timed = (
        silver_laps.filter(F.col("laptime").isNotNull())
        .withColumn(
            "driver",
            F.coalesce(
                F.nullif(F.col("driver"), F.lit("")),
                F.col("drivernumber").cast("string"),
            ),
        )
        .withColumnRenamed("drivernumber", "driver_number")
    )
    w = Window.partitionBy(*DSS_KEYS).orderBy(
        F.col("laptime").asc_nulls_last(), "lapnumber"
    )
    on_track = F.col("pitintime").isNull() & F.col("pitouttime").isNull()
    pit_lap = F.col("pitintime").isNotNull() | F.col("pitouttime").isNotNull()
    # r11 (same fusion as flagship_supplier_summary, guide §2.4): the
    # personal-best window count groups by the same keys over the same
    # frame as the conditional aggregates, so the reference's agg-LEFT
    # JOIN-agg collapses into window → ONE aggregate on the window's own
    # 7-key shuffle — one scan, one Exchange, no join. Result-identical
    # (the oracle keeps the reference's two-CTE formulation): row_number()
    # assigns rn=1 exactly once per non-empty group, and every aggregate
    # group is non-empty, so the old LEFT JOIN always matched.
    return (
        timed.withColumn("rn", F.row_number().over(w))
        .groupBy(*DSS_KEYS)
        .agg(
            F.count("*").alias("laps_total"),
            F.sum(F.when(on_track, 1).otherwise(0)).alias("laps_on_track"),
            F.sum(F.when(pit_lap, 1).otherwise(0)).alias("pitstops"),
            F.min("laptime").alias("best_lap_time"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("_pb_laps"),
        )
        .select(
            *DSS_KEYS,
            "laps_total",
            "laps_on_track",
            "pitstops",
            "best_lap_time",
            F.coalesce(F.col("_pb_laps"), F.lit(0)).alias("personal_best_laps"),
        )
    )


def team_event_summary(dss: DataFrame) -> DataFrame:
    """Reference ``team_event_summary.sql:7-15``: emits team_-prefixed
    aggregate names (team_laps_on_track / team_pitstops / team_best_lap_time)."""
    return (
        dss.filter(F.col("session_code").isin("R", "Q", "S"))
        .groupBy("season", "round", "grand_prix", "session_code", "team")
        .agg(
            F.sum("laps_on_track").alias("team_laps_on_track"),
            F.sum("pitstops").alias("team_pitstops"),
            F.min("best_lap_time").alias("team_best_lap_time"),
        )
    )
