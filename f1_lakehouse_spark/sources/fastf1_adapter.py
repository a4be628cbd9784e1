"""Concrete FastF1-shaped ingestion adapter (SURVEY.md §2.1 S1).

The reference's ingestion job (``ingestion/src/ingestion/fastf1_ingest.py``)
loops seasons → schedule rows → session codes on the driver, loading each
session from the FastF1 API and writing three bronze tables (laps, weather,
results) into ``season=/round=NN/grand_prix=slug/session=`` partition dirs
(``fastf1_ingest.py:14,15-22,53-60,80-84``). This adapter re-expresses
that concrete shape on the generic distributed fan-out
(``api_ingest.ingest_tasks``):

- the *schedule fetch* stays driver-side (one tiny HTTP call per season —
  reference ``:56``), producing a task list of (season, round, gp_slug,
  session_code);
- the *per-session load* — the expensive, parallelizable part — runs on
  executors via ``mapInPandas``, one task per partition, with the
  reference's log-and-skip fault isolation (``:82-84``: a session that
  404s yields nothing and never aborts the job);
- each table lands via dynamic-partition-overwrite (idempotent re-runs,
  the Spark-safe version of the reference's dir-exists skip ``:92-95``).

The FastF1 client itself is injectable (this sandbox has no network and no
``fastf1`` package); ``tests/test_sources.py`` drives the adapter with a
deterministic fake client, and a real client only needs the two methods of
:class:`ScheduleClient`.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from f1_lakehouse_spark.functions.expressions import to_snake_df  # noqa: F401  (silver step)
from f1_lakehouse_spark.sources.api_ingest import ingest_tasks
from f1_lakehouse_spark.sources.parquet_io import write_partitioned_idempotent

# reference fastf1_ingest.py:13 — Sprint (S) + Race (R)
SESSION_CODES = ("FP1", "FP2", "FP3", "Q", "S", "R")

BRONZE_TABLES = ("laps", "weather", "results")

PARTITION_COLS = ["season", "round", "grand_prix", "session"]


def slugify_name(name: str) -> str:
    """Driver-side twin of functions.expressions.slugify (reference uses
    python-slugify on the event name, ``fastf1_ingest.py:77``)."""
    import re

    slug = re.sub(r"[^a-z0-9]+", "-", name.lower())
    return slug.strip("-")


class ScheduleClient(Protocol):
    """The two calls the adapter needs from a FastF1-like client."""

    def get_event_schedule(self, season: int) -> pd.DataFrame:
        """Rows with RoundNumber + EventName (reference ``:56,63-64``)."""
        ...

    def load_session(self, season: int, round_no: int, code: str) -> dict[str, pd.DataFrame]:
        """Load one session; returns {table: frame} for whatever of
        laps/weather/results the session has (reference ``:80-84`` session
        load + per-table getattr)."""
        ...


def build_session_tasks(
    client: ScheduleClient, seasons: list[int]
) -> list[dict]:
    """Schedule fetch → task list. Mirrors the reference's driver loop
    including its fault tolerance: a season whose schedule fetch fails is
    skipped (``:57-59``), a malformed schedule row is skipped (``:66-73``)."""
    tasks: list[dict] = []
    for season in seasons:
        try:
            schedule = client.get_event_schedule(season)
        except Exception:
            continue
        for _, ev in schedule.iterrows():
            try:
                round_no = int(ev["RoundNumber"])
                gp_name = str(ev["EventName"])
            except Exception:
                continue
            gp_slug = slugify_name(gp_name or f"round-{round_no}")
            for code in SESSION_CODES:
                tasks.append(
                    {
                        "season": season,
                        "round": round_no,
                        "grand_prix": gp_slug,
                        "session": code,
                    }
                )
    return tasks


@dataclass
class _SessionTableFetcher:
    """Executor-side fetch of ONE bronze table for one session task.
    Picklable closure over the injectable client; any load failure yields
    an empty frame (per-task fault isolation, reference ``:82-84``)."""

    client: ScheduleClient
    table: str

    def __call__(self, task: dict) -> pd.DataFrame:
        frames = self.client.load_session(
            int(task["season"]), int(task["round"]), str(task["session"])
        )
        out = frames.get(self.table)
        return out if out is not None else pd.DataFrame()


def ingest_seasons(
    spark: SparkSession,
    client: ScheduleClient,
    seasons: list[int],
    bronze_root: str,
    result_schemas: dict[str, str],
    tables: tuple[str, ...] = BRONZE_TABLES,
    write: bool = True,
) -> dict[str, DataFrame]:
    """The full reference ingestion job, Spark-first: schedule → task list
    → distributed per-session load → idempotent partitioned bronze write.

    ``result_schemas[table]`` is the Spark schema string of that table's
    records INCLUDING the four partition columns. Returns the (lazy)
    DataFrame per table; with ``write=True`` each is also materialized to
    ``{bronze_root}/{table}``.
    """
    tasks = build_session_tasks(client, seasons)
    if not tasks:
        return {}
    out: dict[str, DataFrame] = {}
    tasks_schema = "season int, round int, grand_prix string, session string"
    for table in tables:
        df = ingest_tasks(
            spark,
            tasks,
            _SessionTableFetcher(client, table),
            result_schema=result_schemas[table],
            tasks_schema=tasks_schema,
        )
        if write:
            write_partitioned_idempotent(
                df, f"{bronze_root}/{table}", PARTITION_COLS
            )
            out[table] = spark.read.parquet(f"{bronze_root}/{table}")
        else:
            out[table] = df
    return out


def default_client() -> ScheduleClient:
    """Real FastF1 client if the package is installed (it is not in this
    sandbox — the adapter is exercised with an injected fake)."""
    try:
        import fastf1  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover - no network/package here
        raise NotImplementedError(
            "fastf1 is not installed; inject a ScheduleClient instead"
        ) from exc

    class _Real:  # pragma: no cover
        def get_event_schedule(self, season: int) -> pd.DataFrame:
            return fastf1.get_event_schedule(season, include_testing=False)

        def load_session(self, season, round_no, code):
            sess = fastf1.get_session(season, round_no, code)
            sess.load(laps=True, telemetry=False, weather=True)
            frames = {}
            laps = getattr(sess, "laps", None)
            if laps is not None and not laps.empty:
                frames["laps"] = pd.DataFrame(laps)
            weather = getattr(sess, "weather_data", None)
            if weather is not None and not weather.empty:
                frames["weather"] = pd.DataFrame(weather)
            results = getattr(sess, "results", None)
            if results is not None and not getattr(results, "empty", True):
                frames["results"] = pd.DataFrame(results)
            return frames

    return _Real()
