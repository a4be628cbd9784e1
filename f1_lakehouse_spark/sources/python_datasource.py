"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API): the
engine's native-source extension point, re-expressing the reference's
"pull from an external API" ingestion (reference
``ingestion/src/ingestion/fastf1_ingest.py:56,80-84``) as a first-class
``spark.read.format(...)`` source instead of a driver-side loop.

``synthetic_telemetry`` generates deterministic sensor readings:

- ``partitions()`` declares one InputPartition per session slice, so the
  fan-out is EXECUTOR-side (each partition's rows are produced on a
  worker, exactly how a real API/connector source scales out: N
  partitions = N concurrent fetchers, no driver bottleneck).
- Rows are md5-derived from (partition, row index) — rerunning the read
  yields byte-identical data on any cluster layout, which is what makes
  the source testable and the downstream pipeline idempotent.
- A ``SimpleDataSourceStreamReader`` twin exposes the same generator as
  an unbounded stream with offset bookkeeping (``initialOffset`` /
  ``read(start)`` -> (rows, next_offset)), the micro-batch contract.

Options: ``rows_per_partition`` (default 100), ``partitions`` (default 4),
``sensors`` (default 8). Registered via ``register_telemetry_source``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TELEMETRY_SCHEMA = StructType(
    [
        StructField("reading_id", LongType()),
        StructField("sensor", StringType()),
        StructField("reading", DoubleType()),
    ]
)


# id-space stride per partition: rows_per_partition is validated against it
# so reading_id = part * stride + idx can never collide across partitions
# (and the stream twin's global counter stays inside partition 0's range)
ID_STRIDE = 1_000_000


def _telemetry_row(part: int, idx: int, n_sensors: int) -> tuple[int, str, float]:
    """Deterministic reading for (partition, index): md5 of the coordinate
    drives both the sensor assignment and the value, so any executor
    produces the identical row."""
    h = hashlib.md5(f"telemetry:{part}:{idx}".encode()).hexdigest()
    v = int(h[:12], 16)
    reading_id = part * ID_STRIDE + idx
    sensor = f"s{v % n_sensors}"
    reading = (v % 100_000) / 1000.0
    return (reading_id, sensor, reading)


class TelemetryDataSource(DataSource):
    """``spark.read.format("synthetic_telemetry")`` batch + stream source."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_telemetry"

    def schema(self) -> StructType:
        return TELEMETRY_SCHEMA

    def reader(self, schema: StructType) -> "TelemetryReader":
        return TelemetryReader(self.options)

    def simpleStreamReader(
        self, schema: StructType
    ) -> "TelemetryStreamReader":
        return TelemetryStreamReader(self.options)


class TelemetryReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows_per_partition", 100))
        if self.rows > ID_STRIDE:
            raise ValueError(
                f"rows_per_partition={self.rows} exceeds the id stride "
                f"({ID_STRIDE}); reading_ids would collide across partitions"
            )
        self.parts = int(options.get("partitions", 4))
        self.sensors = int(options.get("sensors", 8))

    def partitions(self) -> Sequence[InputPartition]:
        # one InputPartition per slice -> Spark schedules each read() on an
        # executor; this list is the only thing the driver materializes
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        part = partition.value
        for idx in range(self.rows):
            yield _telemetry_row(part, idx, self.sensors)


class TelemetryStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch twin: offset = global row index; each ``read`` serves a
    bounded batch and advances the offset (the at-least-once contract the
    engine's checkpointing turns into exactly-once)."""

    def __init__(self, options: dict) -> None:
        self.batch = int(options.get("rows_per_batch", 50))
        self.sensors = int(options.get("sensors", 8))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["idx"]
        hi = lo + self.batch
        rows = iter(
            [_telemetry_row(0, i, self.sensors) for i in range(lo, hi)]
        )
        return rows, {"idx": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay path after a restart: offsets fully determine the data
        return iter(
            [
                _telemetry_row(0, i, self.sensors)
                for i in range(start["idx"], end["idx"])
            ]
        )


def register_telemetry_source(spark: SparkSession) -> None:
    spark.dataSource.register(TelemetryDataSource)
