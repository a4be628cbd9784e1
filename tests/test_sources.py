"""Bronze parquet sink/source: partitioned write, dynamic-partition-overwrite
idempotency, partition discovery + pruning."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from f1_lakehouse_spark.sources.parquet_io import (
    partition_exists,
    read_partitioned,
    write_partitioned,
    write_partitioned_idempotent,
)
from f1_lakehouse_spark.tables import load_table
from tests.conftest import SF_DIR


def _typed_orders(spark):
    return load_table(spark, SF_DIR, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )


def test_partitioned_write_and_discovery(spark):
    o = _typed_orders(spark)
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/orders"
        write_partitioned(o, path, ["order_year"], mode="overwrite")
        assert partition_exists(path, order_year=1995)
        back = read_partitioned(spark, path)
        assert back.count() == o.count()
        # partition pruning: filter on the partition key only lists one dir
        pruned = back.filter(F.col("order_year") == 1995)
        assert pruned.count() == o.filter(F.col("order_year") == 1995).count()
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(order_year" in plan


def test_dynamic_partition_overwrite_idempotent(spark):
    o = _typed_orders(spark)
    y95 = o.filter(F.col("order_year") == 1995)
    y96 = o.filter(F.col("order_year") == 1996)
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/orders"
        write_partitioned_idempotent(y95, path, ["order_year"])
        n95 = read_partitioned(spark, path).count()
        # re-run same load: counts unchanged (idempotent, S4)
        write_partitioned_idempotent(y95, path, ["order_year"])
        assert read_partitioned(spark, path).count() == n95
        # load a second partition: first partition untouched
        write_partitioned_idempotent(y96, path, ["order_year"])
        back = read_partitioned(spark, path)
        assert back.filter(F.col("order_year") == 1995).count() == y95.count()
        assert back.filter(F.col("order_year") == 1996).count() == y96.count()
