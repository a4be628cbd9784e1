"""Dashboard analytics library (§3.3) + API-source ingestion (S1/S2)."""

from __future__ import annotations

import tempfile

import pandas as pd
from pyspark.sql import functions as F

from f1_lakehouse_spark import analytics
from f1_lakehouse_spark.sources.api_ingest import CachedFetcher, ingest_tasks
from f1_lakehouse_spark.sources.parquet_io import (
    read_partitioned,
    write_partitioned_idempotent,
)
from tests.conftest import SF_DIR

YEAR = 1995


def test_dashboard_query_set(spark):
    sd = analytics.session_date(spark, SF_DIR, YEAR).collect()[0][0]
    assert sd.startswith("1995-")
    k = analytics.kpis(spark, SF_DIR, YEAR).collect()[0]
    assert k["n_lines"] > 0 and k["n_suppliers"] > 0
    top = analytics.fastest_topk(spark, SF_DIR, YEAR, k=5).collect()
    assert len(top) == 5
    prices = [r["l_extendedprice"] for r in top]
    assert prices == sorted(prices)
    team = analytics.team_summary_view(spark, SF_DIR, YEAR).collect()
    assert sum(r["n_lines"] for r in team) == k["n_lines"]
    curve = analytics.pace_curve(spark, SF_DIR, YEAR).collect()
    assert all(r["median_qty"] > 0 for r in curve)


def test_to_client_caps_rows(spark):
    from f1_lakehouse_spark.tables import load_table

    pdf = analytics.to_client(load_table(spark, SF_DIR, "lineitem"), max_rows=17)
    assert isinstance(pdf, pd.DataFrame) and len(pdf) == 17


def test_ingest_tasks_parallel_fetch_with_fault_isolation(spark):
    # defined inline so cloudpickle ships it by value (test modules aren't
    # importable from executor workers)
    def _fake_fetch(task: dict) -> pd.DataFrame:
        if task["round"] == "03":  # simulate one failing fetch unit
            raise RuntimeError("upstream API error")
        n = int(task["round"])
        return pd.DataFrame(
            {
                "driver": [f"D{i}" for i in range(n)],
                "laptime_ns": [7e10 + i for i in range(n)],
            }
        )

    tasks = [{"season": "2024", "round": f"{r:02d}"} for r in (1, 2, 3, 4)]
    out = ingest_tasks(
        spark,
        tasks,
        _fake_fetch,
        result_schema="driver string, laptime_ns double, season string, round string",
    )
    rows = out.collect()
    # round 03 failed → isolated; 1+2+4 = 7 rows
    assert len(rows) == 7
    assert {r["round"] for r in rows} == {"01", "02", "04"}
    # end-to-end: land in the partitioned bronze sink
    with tempfile.TemporaryDirectory() as tmp:
        write_partitioned_idempotent(out, f"{tmp}/laps", ["season", "round"])
        back = read_partitioned(spark, f"{tmp}/laps")
        assert back.count() == 7
        assert back.filter(F.col("round") == "04").count() == 4


def test_cached_fetcher_hits_cache(tmp_path):
    calls = []

    def fetch(task):
        calls.append(task["round"])
        return pd.DataFrame({"x": [1, 2]})

    cf = CachedFetcher(fetch, str(tmp_path / "cache"))
    a = cf({"season": "2024", "round": "01"})
    b = cf({"season": "2024", "round": "01"})  # served from cache
    assert len(calls) == 1
    assert a.equals(b)
