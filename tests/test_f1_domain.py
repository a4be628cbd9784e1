"""F1-domain parity: generate deterministic bronze laps/results/weather in
the reference's layout (hive-partitioned, CamelCase FastF1 columns,
FIXTURES.md schema), build silver/gold with the engine, and differentially
verify gold against DuckDB executing the reference's model semantics on the
SAME bronze files. Plus the 17-column not_null contract and the dashboard
query set."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from f1_lakehouse_spark.f1 import analytics as f1a
from f1_lakehouse_spark.f1.models import (
    GOLD_DSS_NOT_NULL,
    GOLD_TES_NOT_NULL,
    SILVER_NOT_NULL,
    driver_session_summary,
    silver_from_bronze,
    team_event_summary,
)
from f1_lakehouse_spark.quality.checks import run_not_null_suite

BRONZE_SCHEMA = StructType(
    [
        StructField("Driver", StringType()),
        StructField("DriverNumber", IntegerType()),
        StructField("Team", StringType()),
        StructField("LapNumber", IntegerType()),
        StructField("Stint", IntegerType()),
        StructField("LapTime", LongType()),  # int64 ns
        StructField("Sector1Time", LongType()),
        StructField("PitInTime", LongType()),
        StructField("PitOutTime", LongType()),
        StructField("Compound", StringType()),
        StructField("FreshTyre", BooleanType()),
        StructField("LapStartDate", TimestampType()),
        StructField("season", IntegerType()),
        StructField("round", IntegerType()),
        StructField("grand_prix", StringType()),
        StructField("session", StringType()),
    ]
)

WEATHER_SCHEMA = StructType(
    [
        StructField("AirTemp", StringType()),
        StructField("TrackTemp", StringType()),
        StructField("Rainfall", BooleanType()),
        StructField("season", IntegerType()),
        StructField("round", IntegerType()),
        StructField("grand_prix", StringType()),
        StructField("session", StringType()),
    ]
)


def _gen_bronze(spark, root: str) -> None:
    """Deterministic synthetic season: 2 seasons x 2 rounds x {Q,R} x 4
    drivers x 12 laps, with the reference's edge cases: NULL laptimes
    (in/out laps), blank driver codes, pit in/out times."""
    import datetime as dt

    rng = random.Random(42)
    drivers = [("VER", 1, "Red Bull"), ("HAM", 44, "Mercedes"),
               ("", 16, "Ferrari"), ("NOR", 4, "McLaren")]  # '' → repair path
    laps, weather = [], []
    for season in (2023, 2024):
        for rnd, gp in ((1, "bahrain-grand-prix"), (2, "jeddah-grand-prix")):
            for session in ("Q", "R"):
                base = dt.datetime(season, 3, rnd * 7, 14, 0, 0)
                for drv, num, team in drivers:
                    for lap in range(1, 13):
                        pit_out = int(2.1e10) if lap in (1, 7) else None
                        pit_in = int(2.3e10) if lap in (6, 12) else None
                        laptime = (
                            None
                            if (pit_in or pit_out) and rng.random() < 0.7
                            else int(8.8e10 + rng.randint(0, int(7e9)))
                        )
                        laps.append(
                            (drv, num, team, lap, 1 + lap // 7, laptime,
                             int(2.9e10), pit_in, pit_out,
                             rng.choice(["SOFT", "MEDIUM", "HARD"]),
                             lap < 7, base + dt.timedelta(minutes=lap * 2),
                             season, rnd, gp, session)
                        )
                for minute in range(10):
                    weather.append(
                        (str(20 + rng.random() * 10), str(30 + rng.random() * 15),
                         rng.random() < 0.1, season, rnd, gp, session)
                    )
    part_cols = ["season", "round", "grand_prix", "session"]
    spark.createDataFrame(laps, BRONZE_SCHEMA).write.mode("overwrite").partitionBy(
        *part_cols
    ).parquet(f"{root}/laps")
    spark.createDataFrame(weather, WEATHER_SCHEMA).write.mode(
        "overwrite"
    ).partitionBy(*part_cols).parquet(f"{root}/weather")


@pytest.fixture(scope="module")
def f1_bronze(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("f1_bronze"))
    _gen_bronze(spark, root)
    return root


# DuckDB oracle: the reference's compiled model semantics on the same files
# (re-expressed per SURVEY.md §2 — driver_session_summary.sql:4,12,20-59).
_DSS_ORACLE = """
WITH src AS (
    SELECT TRY_CAST(season AS INTEGER) AS season,
           TRY_CAST(round AS INTEGER) AS round,
           CAST(grand_prix AS VARCHAR) AS grand_prix,
           CAST(session AS VARCHAR) AS session_code,
           COALESCE(NULLIF(Driver, ''), CAST(DriverNumber AS VARCHAR)) AS driver,
           DriverNumber AS driver_number, Team AS team, LapNumber AS lapnumber,
           LapTime AS laptime, PitInTime AS pitintime, PitOutTime AS pitouttime
    FROM read_parquet('{root}/laps/**/*.parquet', hive_partitioning=1)
    WHERE LapTime IS NOT NULL
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY season, round, grand_prix, session_code, driver, driver_number, team
        ORDER BY laptime ASC NULLS LAST, lapnumber) AS rn
    FROM src
), pb AS (
    SELECT season, round, grand_prix, session_code, driver, driver_number, team,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS personal_best_laps
    FROM ranked GROUP BY 1,2,3,4,5,6,7
), agg AS (
    SELECT season, round, grand_prix, session_code, driver, driver_number, team,
           COUNT(*) AS laps_total,
           CAST(SUM(CASE WHEN pitintime IS NULL AND pitouttime IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS laps_on_track,
           CAST(SUM(CASE WHEN pitintime IS NOT NULL OR pitouttime IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS pitstops,
           MIN(laptime) AS best_lap_time
    FROM src GROUP BY 1,2,3,4,5,6,7
)
SELECT a.*, COALESCE(pb.personal_best_laps, 0) AS personal_best_laps
FROM agg a LEFT JOIN pb USING
    (season, round, grand_prix, session_code, driver, driver_number, team)
"""


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(str(r[i]) for i in order) for r in rows])


def test_driver_session_summary_matches_reference_semantics(spark, f1_bronze):
    silver = silver_from_bronze(spark, f"{f1_bronze}/laps")
    dss = driver_session_summary(silver)
    s_rows = [tuple(r) for r in dss.collect()]

    con = duckdb.connect()
    res = con.execute(_DSS_ORACLE.format(root=f1_bronze))
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(dss.columns) == sorted(d_cols)
    assert _multiset(dss.columns, s_rows) == _multiset(d_cols, d_rows)
    # the degenerate invariant the reference preserves (SURVEY §2.5 note)
    assert all(r["personal_best_laps"] == 1 for r in dss.collect())


def test_team_event_summary_reaggregation(spark, f1_bronze):
    silver = silver_from_bronze(spark, f"{f1_bronze}/laps")
    dss = driver_session_summary(silver)
    tes = team_event_summary(dss)
    rows = tes.collect()
    assert len(rows) > 0
    # SUM of SUMs / MIN of MINs consistency vs the driver level
    one = rows[0]
    drv = dss.filter(
        (F.col("season") == one["season"])
        & (F.col("round") == one["round"])
        & (F.col("session_code") == one["session_code"])
        & (F.col("team") == one["team"])
    ).agg(
        F.sum("laps_on_track").alias("lot"), F.min("best_lap_time").alias("blt")
    ).collect()[0]
    assert one["team_laps_on_track"] == drv["lot"]
    assert one["team_best_lap_time"] == drv["blt"]
    # only R/Q/S sessions contribute
    assert {r["session_code"] for r in rows} <= {"R", "Q", "S"}


def test_not_null_contract_17_columns(spark, f1_bronze):
    silver = silver_from_bronze(spark, f"{f1_bronze}/laps")
    dss = driver_session_summary(silver)
    tes = team_event_summary(dss)
    weather = silver_from_bronze(spark, f"{f1_bronze}/weather")
    failures = {}
    failures.update(run_not_null_suite(silver, SILVER_NOT_NULL))
    failures.update(run_not_null_suite(weather, SILVER_NOT_NULL))
    failures.update({f"dss.{k}": v for k, v in run_not_null_suite(dss, GOLD_DSS_NOT_NULL).items()})
    failures.update({f"tes.{k}": v for k, v in run_not_null_suite(tes, GOLD_TES_NOT_NULL).items()})
    assert all(v == 0 for v in failures.values()), failures


def test_dashboard_queries_on_f1_schema(spark, f1_bronze):
    silver = silver_from_bronze(spark, f"{f1_bronze}/laps")
    dss = driver_session_summary(silver)
    sd = f1a.session_date(silver, 2024, "R").collect()[0][0]
    assert sd.startswith("2024-03-")
    kpi = f1a.session_kpis(silver, 2024, "R").collect()[0]
    assert kpi["drivers"] == 4 and kpi["teams"] == 4
    fl = f1a.fastest_laps(dss, 2024, "R", k=10).collect()
    assert len(fl) > 0
    # ns → mm:ss.mmm formatting of a ~90s lap
    assert fl[0]["best_lap_pretty"].startswith("01:2") or fl[0][
        "best_lap_pretty"
    ].startswith("01:3")
    curve = f1a.pace_curve(silver, 2024, "R").collect()
    assert [r["lapnumber"] for r in curve] == sorted(r["lapnumber"] for r in curve)
    sample = f1a.latest_best_sample(dss, k=5).collect()
    assert len(sample) == 5 and all(r["season"] == 2024 for r in sample)
    audit = f1a.driver_alias_audit(silver).collect()
    assert audit == []  # consistent synthetic mapping


def test_weather_pace_join(spark, f1_bronze):
    silver = silver_from_bronze(spark, f"{f1_bronze}/laps")
    weather_raw = silver_from_bronze(spark, f"{f1_bronze}/weather")
    # weather readings arrive as strings (FastF1 quirk) — silver re-types
    weather = weather_raw.withColumns(
        {
            "tracktemp": F.col("tracktemp").cast("double"),
            "airtemp": F.col("airtemp").cast("double"),
        }
    )
    dss = driver_session_summary(silver)
    out = f1a.weather_pace_join(dss, weather).collect()
    assert len(out) == 4  # 2 seasons x 2 rounds, race sessions
    assert all(r["avg_track_temp"] is not None for r in out)


def test_copilot_ask_flow_on_f1_warehouse(spark, f1_bronze):
    """The reference's /ask endpoint shape end-to-end (ai/rag_api/app.py
    :190-225): catalog schema-doc → NL→SQL translator → guardrails →
    spark.sql, against the F1 gold tables."""
    from f1_lakehouse_spark.copilot.guardrails import (
        GuardrailError,
        TemplateTranslator,
        ask,
    )
    from f1_lakehouse_spark.sources.catalog import schema_doc

    silver = silver_from_bronze(spark, f"{f1_bronze}/laps")
    dss = driver_session_summary(silver)
    silver.createOrReplaceTempView("f1_silver_laps")
    dss.createOrReplaceTempView("f1_gold_driver_session_summary")

    doc = schema_doc(spark, databases=["default"])
    assert "f1_gold_driver_session_summary(" in doc
    assert "personal_best_laps bigint" in doc

    translator = TemplateTranslator(
        {
            "fastest": """```sql
SELECT driver, team, best_lap_time
FROM f1_gold_driver_session_summary
WHERE season = 2024 AND session_code = 'R'
ORDER BY best_lap_time, driver
```""",
            "drop everything": "DROP TABLE f1_silver_laps",
        }
    )
    df = ask(spark, "Who set the fastest laps?", translator, schema_doc=doc, max_rows=3)
    rows = df.collect()
    assert len(rows) == 3  # LIMIT wrap applied
    assert rows[0]["best_lap_time"] <= rows[1]["best_lap_time"]
    # mutating template is rejected by the guardrail, not executed
    import pytest as _pytest

    with _pytest.raises(GuardrailError):
        ask(spark, "please drop everything", translator, schema_doc=doc)
    assert spark.catalog.tableExists("f1_silver_laps")


RESULTS_SCHEMA = StructType(
    [
        StructField("DriverNumber", IntegerType()),
        StructField("BroadcastName", StringType()),
        StructField("TeamName", StringType()),
        StructField("Position", IntegerType()),
        StructField("ClassifiedPosition", StringType()),
        StructField("Status", StringType()),
        StructField("Points", LongType()),
        StructField("season", IntegerType()),
        StructField("round", IntegerType()),
        StructField("grand_prix", StringType()),
        StructField("session", StringType()),
    ]
)


def test_results_table_and_points(spark, f1_bronze):
    """Third bronze table (FIXTURES.md results schema): silver typing +
    the notebook's team-points and classification queries."""
    points_map = [25, 18, 15, 12]
    rows = []
    for season in (2023, 2024):
        for rnd, gp in ((1, "bahrain-grand-prix"), (2, "jeddah-grand-prix")):
            for pos, (name, num, team) in enumerate(
                [("M VERSTAPPEN", 1, "Red Bull"), ("L HAMILTON", 44, "Mercedes"),
                 ("C LECLERC", 16, "Ferrari"), ("L NORRIS", 4, "McLaren")],
                start=1,
            ):
                status = "Finished" if pos < 4 else "+1 Lap"
                rows.append(
                    (num, name, team, pos, str(pos), status,
                     points_map[pos - 1], season, rnd, gp, "R")
                )
    spark.createDataFrame(rows, RESULTS_SCHEMA).write.mode("overwrite").partitionBy(
        "season", "round", "grand_prix", "session"
    ).parquet(f"{f1_bronze}/results")

    silver_results = silver_from_bronze(spark, f"{f1_bronze}/results")
    assert run_not_null_suite(silver_results, SILVER_NOT_NULL) == {
        "season": 0, "round": 0, "session_code": 0
    }
    pts = f1a.team_points(silver_results, 2024).collect()
    assert pts[0]["teamname"] == "Red Bull" and pts[0]["total_points"] == 50
    assert [r["teamname"] for r in pts] == ["Red Bull", "Mercedes", "Ferrari", "McLaren"]
    breakdown = {
        (r["season"], r["status"]): r["n_results"]
        for r in f1a.classification_breakdown(silver_results).collect()
    }
    assert breakdown[(2024, "Finished")] == 6 and breakdown[(2024, "+1 Lap")] == 2
