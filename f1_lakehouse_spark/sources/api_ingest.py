"""API-source ingestion (SURVEY.md §2.1 S1–S2).

The reference pulls (season, round, session) payloads from the FastF1 HTTP
API on the driver, one pandas frame at a time, with an on-disk response
cache (reference ``ingestion/src/ingestion/fastf1_ingest.py:56,80-81``,
cache at ``:51``). The Spark-native shape generalizes that:

- a *task list* of fetch units (the reference's (season, round, session)
  triples) distributed via ``spark.createDataFrame(tasks)`` +
  ``mapInPandas(fetch)`` so N executors fetch in parallel — the reference's
  serial driver loop becomes the unit of parallelism/retry;
- the fetcher is injected (no network dependency in tests; a real client
  drops in);
- per-task fault isolation: a failing fetch yields zero rows and is
  recorded, it does not abort the job (reference ``fastf1_ingest.py:82-84``
  logs-and-skips);
- an optional driver-side response cache directory (S2) for the injected
  fetcher to use.

The fetched frames land in the bronze partitioned sink
(``parquet_io.write_partitioned_idempotent``) keyed by the task columns.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# A fetcher maps one task row (as a dict) to a pandas DataFrame of records.
# It runs on executors — it must be picklable and self-contained.
FetchFn = Callable[[dict], pd.DataFrame]


@dataclass
class CachedFetcher:
    """S2: wrap a fetcher with a filesystem response cache (JSON records).

    The cache key is the task dict; executors sharing a filesystem (or a
    fuse-mounted object store) reuse responses across runs — the analog of
    the reference's on-disk HTTP cache.
    """

    fetch: FetchFn
    cache_dir: str

    def __call__(self, task: dict) -> pd.DataFrame:
        key = "_".join(f"{k}-{task[k]}" for k in sorted(task)) + ".json"
        path = os.path.join(self.cache_dir, key)
        if os.path.exists(path):
            with open(path) as f:
                return pd.DataFrame(json.load(f))
        out = self.fetch(task)
        os.makedirs(self.cache_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out.to_dict(orient="records"), f, default=str)
        os.replace(tmp, path)
        return out


def ingest_tasks(
    spark: SparkSession,
    tasks: list[dict],
    fetch: FetchFn,
    result_schema: str,
    tasks_schema: str | None = None,
) -> DataFrame:
    """S1: distribute the fetch task list across executors.

    ``result_schema`` must include the task columns so every record stays
    attributable to its partition (the reference writes one file per task
    directory). Returns the lazy union of all fetched frames.
    """
    task_cols = list(tasks[0].keys())
    tdf = spark.createDataFrame(
        [tuple(t[c] for c in task_cols) for t in tasks],
        tasks_schema or ", ".join(f"{c} string" for c in task_cols),
    )
    # one task per input row; mapInPandas streams Arrow batches back
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                task = row.to_dict()
                try:
                    out = fetch(task)
                except Exception:
                    # per-task fault isolation: skip, yield nothing
                    continue
                if out.empty:
                    continue
                for c in task_cols:
                    out[c] = task[c]
                yield out

    # spread tasks across the cluster; one partition per task keeps retry
    # granularity at the task level like the reference's per-session loop
    return tdf.repartition(len(tasks)).mapInPandas(run, schema=result_schema)
