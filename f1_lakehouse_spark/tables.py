"""Loaders for the synthetic test tables (TESTDATA.md).

The driver generates a TPC-H-ish star schema plus ``events`` (stream-shaped),
``documents`` (text corpus) and ``embeddings`` (vector) tables at
``/root/testdata/sf{0.001,0.01,0.1}``. Every operator in the engine takes its
inputs from these loaders, so tests/bench/correctness all share one path.

Scale note: ``spark.read.parquet`` gives Catalyst a DSv2 scan with column
pruning + predicate pushdown; at 100 TB the same call over a partitioned
table root picks up partition pruning automatically — no code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any scale factor the reference
# contemplates; used by operators to hint broadcast joins.
SMALL_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _pin_session_confs(spark: SparkSession) -> None:
    """Oracle-parity confs the engine requires, set on EVERY load so they hold
    under the driver's VANILLA session, not just our session factory:

    - ``ansi.enabled=false``: PySpark 4.x defaults ANSI mode ON; the DuckDB
      oracles assume non-ANSI cast/overflow/element_at semantics.
    - ``session.timeZone=UTC``: timestamp formatting/extraction must not
      depend on the host timezone (DuckDB reads parquet timestamps as-is).

    Both are runtime-settable (no session restart needed)."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# (application-id, sf_dir) pairs whose input volume has already sized
# spark.sql.shuffle.partitions — one FileSystem content summary per input
# root per session, not one per table load
_AUTOSIZED: set[tuple[str, str]] = set()


def _autosize_for(spark: SparkSession, sf_dir: str) -> None:
    """Derive ``spark.sql.shuffle.partitions`` from the input root's actual
    on-disk volume (``session.autosize_shuffle_partitions``), once per
    (session, sf_dir). load_table is the engine's session-owning choke
    point under the driver's VANILLA session — without this call the
    prefix-sum family's ``_prefix_parts`` would read Spark's static default
    (200) at every scale, i.e. ~500 GB per range task at the 100 TB framing
    (r7 ADVICE, medium).

    Explicit wins (the repo's size-knob rule): a session whose conf differs
    from Spark's untouched static default (200) was deliberately tuned —
    by our own session factory, the tests, or a user — and is left alone.
    Only the unowned default is replaced with the input-derived count."""
    from f1_lakehouse_spark.session import autosize_shuffle_partitions  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    if key in _AUTOSIZED:
        return
    _AUTOSIZED.add(key)
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            autosize_shuffle_partitions(spark, [sf_dir])
    except Exception:
        # sizing is a perf knob, never correctness; an unreadable path
        # (e.g. a mocked FileSystem) keeps the session's value
        pass


# DataFrame HANDLE memo (r11, optimization guide §5 "the driver should do
# almost no data work"): ``spark.read.parquet`` re-lists the path and
# re-reads the parquet footer on the single-threaded driver at EVERY call
# (~70 ms here; minutes at 100 TB directory sizes) — and every query fn
# calls load_table 1-6 times per run. The memo stores the lazy DataFrame
# (an unresolved plan object), never data: every action still scans the
# parquet files, so bench/oracle runs keep computing from the inputs. This
# is the path-read analog of Spark's own filesourcePartitionFileCache; like
# that cache it assumes the test inputs are immutable within a session.
_DF_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    _pin_session_confs(spark)
    _autosize_for(spark, sf_dir)
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); Spark refuses it unless
        # surfaced as LongType. Set the conf here (not only in our session
        # factory) so the engine also works under a caller-built session —
        # on every call, so the memoized frame is never executed (or first
        # built) without it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    app_id = spark.sparkContext.applicationId
    key = (app_id, os.path.abspath(sf_dir), name)
    hit = _DF_MEMO.get(key)
    if hit is not None:
        return hit
    for old_key in list(_DF_MEMO):
        if old_key[0] != app_id:  # new session: drop stale handles
            del _DF_MEMO[old_key]
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = _normalize_event_ts(df)
    _DF_MEMO[key] = df
    return df


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to TimestampType regardless of how the generator
    wrote it:

    - parquet TIMESTAMP(NANOS) + ``nanosAsLong=true`` → LongType epoch-ns:
      integer-divide to µs and rebuild (``div`` is exact on longs; a float
      divide would round through a 53-bit double and corrupt epoch-ns).
    - parquet timestamp[us] with isAdjustedToUTC=false → TIMESTAMP_NTZ:
      cast to TIMESTAMP. Value-preserving because load_table pins the
      session timezone to UTC, and it matches DuckDB, which reads the same
      naive µs values into its (naive) TIMESTAMP type.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL entry points)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
