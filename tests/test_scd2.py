"""MERGE-emulation + SCD2 history semantics on plain DataFrames."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_lakehouse_spark.sources.scd2 import OPEN_END, merge_upsert, scd2_apply


def test_merge_upsert(spark):
    current = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string")
    out = {r["k"]: r["v"] for r in merge_upsert(current, updates, "k").collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "d"}


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "k long, team string, valid_from timestamp, valid_to timestamp"
    ).withColumns(
        {
            "valid_from": F.col("valid_from"),
            "valid_to": F.col("valid_to"),
        }
    )


def test_scd2_apply_versions_changes_only(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    openend = dt.datetime(9999, 12, 31)
    history = _hist(
        spark,
        [
            (1, "Red Bull", t0, openend),
            (2, "Mercedes", t0, openend),
            (3, "Ferrari", t0, openend),
        ],
    )
    changes = spark.createDataFrame(
        [(1, "Red Bull"),  # unchanged → no new version
         (2, "McLaren"),   # changed → close + insert
         (9, "Haas")],     # new key → insert
        "k long, team string",
    )
    eff = F.lit("2024-06-01 00:00:00")
    out = scd2_apply(history, changes, "k", ["team"], eff)
    rows = sorted(
        [(r["k"], r["team"], str(r["valid_to"])) for r in out.collect()]
    )
    assert rows == sorted(
        [
            (1, "Red Bull", str(openend)),           # untouched open row
            (2, "Mercedes", "2024-06-01 00:00:00"),  # closed
            (2, "McLaren", str(openend)),            # new open version
            (3, "Ferrari", str(openend)),            # untouched (no change row)
            (9, "Haas", str(openend)),               # first version
        ]
    )
    # exactly one open row per key
    opens = out.filter(F.col("valid_to") == F.lit(OPEN_END).cast("timestamp"))
    per_key = opens.groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in per_key)


def test_scd2_apply_is_idempotent_for_unchanged_batch(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    openend = dt.datetime(9999, 12, 31)
    history = _hist(spark, [(1, "Red Bull", t0, openend)])
    changes = spark.createDataFrame([(1, "Red Bull")], "k long, team string")
    out = scd2_apply(history, changes, "k", ["team"], F.lit("2024-06-01 00:00:00"))
    assert out.count() == 1  # replaying the same state adds nothing


# --- Delta-gated ACID twins (sources/delta_ops.py) -----------------------------------
# The sandbox ships no Delta jar, so the live-equivalence tests skip here
# and run wherever the jar exists; the gate itself is tested everywhere.

import pytest  # noqa: E402

from f1_lakehouse_spark.sources.formats import delta_available  # noqa: E402


def test_delta_ops_gate_raises_cleanly_without_jar(spark):
    from f1_lakehouse_spark.sources import delta_ops

    if delta_available(spark):
        pytest.skip("Delta jar present - gate cannot fire")
    updates = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(delta_ops.DeltaUnavailableError, match="scd2"):
        delta_ops.delta_merge_upsert(spark, "/tmp/nowhere", updates, "k")
    with pytest.raises(delta_ops.DeltaUnavailableError):
        delta_ops.delta_history(spark, "/tmp/nowhere")


def _delta_skip(spark):
    return pytest.mark.skipif(
        not delta_available(spark), reason="Delta jar not on classpath"
    )


def test_delta_merge_upsert_equals_parquet_emulation(spark, tmp_path):
    if not delta_available(spark):
        pytest.skip("Delta jar not on classpath")
    from f1_lakehouse_spark.sources import delta_ops

    current = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string")
    path = str(tmp_path / "t")
    delta_ops.delta_write_table(current, path)
    delta_ops.delta_merge_upsert(spark, path, updates, "k")
    got = {
        r["k"]: r["v"]
        for r in spark.read.format("delta").load(path).collect()
    }
    want = {r["k"]: r["v"] for r in merge_upsert(current, updates, "k").collect()}
    assert got == want
    # time travel: version 0 is the pre-merge table
    v0 = {
        r["k"]: r["v"]
        for r in delta_ops.delta_time_travel(spark, path, 0).collect()
    }
    assert v0 == {1: "a", 2: "b", 3: "c"}
    hist = delta_ops.delta_history(spark, path)
    assert hist.count() == 2  # write + merge


def test_delta_scd2_merge_equals_parquet_emulation(spark, tmp_path):
    if not delta_available(spark):
        pytest.skip("Delta jar not on classpath")
    from f1_lakehouse_spark.sources import delta_ops

    history = _hist(
        spark,
        [
            (1, "red", "2024-01-01 00:00:00", OPEN_END),
            (2, "blue", "2024-01-01 00:00:00", OPEN_END),
        ],
    )
    changes = spark.createDataFrame(
        [(1, "green"), (2, "blue"), (3, "silver")], "k long, team string"
    )
    eff = F.lit("2024-06-01 00:00:00")
    path = str(tmp_path / "scd2")
    delta_ops.delta_write_table(history, path)
    delta_ops.delta_scd2_merge(spark, path, changes, "k", ["team"], eff)
    key = lambda r: (r["k"], r["team"], str(r["valid_from"]), str(r["valid_to"]))  # noqa: E731
    got = sorted(
        key(r) for r in spark.read.format("delta").load(path).collect()
    )
    want = sorted(
        key(r)
        for r in scd2_apply(history, changes, "k", ["team"], eff).collect()
    )
    assert got == want


def test_iceberg_gate_raises_cleanly_without_jar(spark):
    from f1_lakehouse_spark.sources import delta_ops
    from f1_lakehouse_spark.sources.formats import iceberg_available

    if iceberg_available(spark):
        pytest.skip("Iceberg jar present - gate cannot fire")
    updates = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(delta_ops.IcebergUnavailableError, match="scd2"):
        delta_ops.iceberg_merge_upsert(spark, "nowhere.t", updates, "k")
    with pytest.raises(delta_ops.IcebergUnavailableError):
        delta_ops.iceberg_time_travel(spark, "nowhere.t", 1)
