"""The reference dashboard's five queries + the notebook analytics on the
F1 schema (reference ``dashboard/app.py:130-242``, notebook cells 17/24/25),
as lazy parameterized DataFrame functions."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_lakehouse_spark.functions.expressions import date_fmt, ns_to_mmss, ns_to_seconds


def session_date(silver_laps: DataFrame, season: int, session_code: str) -> DataFrame:
    """dashboard/app.py:130-137: MIN(lapstartdate) formatted."""
    return (
        silver_laps.filter(
            (F.col("season") == season) & (F.col("session_code") == session_code)
        )
        .agg(F.min("lapstartdate").alias("session_ts"))
        .select(date_fmt("session_ts").alias("session_date"))
    )


def session_kpis(silver_laps: DataFrame, season: int, session_code: str) -> DataFrame:
    """dashboard/app.py:145-158: laps, distinct drivers/teams, best lap."""
    return silver_laps.filter(
        (F.col("season") == season) & (F.col("session_code") == session_code)
    ).agg(
        F.count("*").alias("laps"),
        F.countDistinct("driver").alias("drivers"),
        F.countDistinct("team").alias("teams"),
        F.min("laptime").alias("best_lap_ns"),
    )


def fastest_laps(
    dss: DataFrame, season: int, session_code: str, k: int | None = 50
) -> DataFrame:
    """dashboard/app.py:169-189: top-k by best lap, pretty-printed engine-side
    (the reference formats client-side with pandas — F8/F9 as Column exprs).

    The ORDER BY covers every non-derived output column (best_lap_time,
    driver, team — best_lap_s/pretty are functions of best_lap_time), so any
    remaining ties are between fully-identical rows and the top-k result is
    a deterministic MULTISET at every scale, not just while k covers the
    slice. ``k=None`` skips the limit and returns the whole slice with a
    presentation sort (range-partitioned; no single-partition CollectLimit),
    which is the scale-free shape the registered query uses."""
    out = (
        dss.filter(
            (F.col("season") == season) & (F.col("session_code") == session_code)
        )
        .select(
            "driver",
            "team",
            "best_lap_time",
            ns_to_seconds("best_lap_time").alias("best_lap_s"),
            ns_to_mmss("best_lap_time").alias("best_lap_pretty"),
        )
        .orderBy("best_lap_time", "driver", "team")
    )
    return out if k is None else out.limit(k)


def pace_curve(silver_laps: DataFrame, season: int, session_code: str) -> DataFrame:
    """dashboard/app.py:231-242: exact median laptime by lapnumber."""
    return (
        silver_laps.filter(
            (F.col("season") == season)
            & (F.col("session_code") == session_code)
            & F.col("laptime").isNotNull()
        )
        .groupBy("lapnumber")
        .agg(F.median("laptime").alias("median_laptime"))
        .orderBy("lapnumber")
    )


def weather_pace_join(dss: DataFrame, silver_weather: DataFrame) -> DataFrame:
    """notebook cell 25: per-session best race lap LEFT JOIN weather aggs
    (AVG temps, had_rain flag — cell 24)."""
    pace = (
        dss.filter(F.col("session_code") == "R")
        .groupBy("season", "round", "session_code")
        .agg(F.min("best_lap_time").alias("best_lap_ns"))
    )
    weather = silver_weather.groupBy("season", "round", "session_code").agg(
        F.avg("tracktemp").alias("avg_track_temp"),
        F.avg("airtemp").alias("avg_air_temp"),
        F.max(F.when(F.col("rainfall"), 1).otherwise(0)).alias("had_rain"),
    )
    return pace.join(weather, ["season", "round", "session_code"], "left")


def driver_alias_audit(silver_laps: DataFrame) -> DataFrame:
    """notebook cell 17: drivers mapped to >1 number or team (HAVING)."""
    return (
        silver_laps.groupBy("season", "driver")
        .agg(
            F.countDistinct("drivernumber").alias("n_numbers"),
            F.countDistinct("team").alias("n_teams"),
        )
        .filter((F.col("n_numbers") > 1) | (F.col("n_teams") > 1))
    )


def latest_best_sample(dss: DataFrame, k: int = 5) -> DataFrame:
    """scripts/check_gold.sh:19-22: latest best-laps sample."""
    return dss.orderBy(
        F.col("season").desc(), F.col("round").desc(), "best_lap_time", "driver"
    ).limit(k)


def team_points(silver_results: DataFrame, season: int) -> DataFrame:
    """notebook cells 27/29: points per team per season from results."""
    return (
        silver_results.filter(F.col("season") == season)
        .groupBy("teamname")
        .agg(
            F.sum("points").alias("total_points"),
            F.count("*").alias("classified_entries"),
        )
        .orderBy(F.col("total_points").desc(), "teamname")
    )


def classification_breakdown(silver_results: DataFrame) -> DataFrame:
    """results status distribution: finished / retired / lapped etc."""
    return silver_results.groupBy("season", "status").agg(
        F.count("*").alias("n_results")
    )
