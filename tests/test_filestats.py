"""Manifest-level column-stats file skipping (sources/filestats.py, r11).

The driver row (stats_skipping_roundtrip) certifies the happy path
differentially; these tests pin the CONSERVATIVE edges the row can't
reach on clean data: unknown stats (all-null chunks) never prune, a
missing sidecar falls back to the full scan, typed (date) bounds compare
natively, and the empty-prune frame keeps the schema contract.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from f1_lakehouse_spark.sources.filestats import (
    STATS_DIR,
    attach_table_stats,
    collect_file_stats,
    pruned_files,
    read_pruned,
    read_table_pruned,
)
from f1_lakehouse_spark.sources.txn import publish_tables, read_manifest


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _write_clustered(spark, path, n=400, files=4):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.date_add(F.lit(datetime.date(2024, 1, 1)), (F.col("id") % 60).cast("int")).alias("d"),
    )
    df.repartitionByRange(files, "k").write.mode("overwrite").parquet(path)
    return df


def test_prune_equals_full_filter(spark, tmp_path):
    path = str(tmp_path / "t1")
    _write_clustered(spark, path)
    n = collect_file_stats(spark, path, ["k"])
    assert n >= 2
    pred = [("k", 90, 140)]
    surv = pruned_files(spark, path, pred)
    assert surv is not None and 0 < len(surv) < n
    got = _rows(read_pruned(spark, path, pred))
    want = _rows(spark.read.parquet(path).filter(F.col("k").between(90, 140)))
    assert got == want and len(want) == 51


def test_beyond_range_prunes_to_zero_with_schema(spark, tmp_path):
    path = str(tmp_path / "t2")
    _write_clustered(spark, path)
    collect_file_stats(spark, path, ["k"])
    assert pruned_files(spark, path, [("k", 10_000, 10_001)]) == []
    out = read_pruned(spark, path, [("k", 10_000, 10_001)])
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "grp", "d"]


def test_missing_sidecar_falls_back_to_full_scan(spark, tmp_path):
    path = str(tmp_path / "t3")
    _write_clustered(spark, path)
    assert pruned_files(spark, path, [("k", 0, 10)]) is None
    got = _rows(read_pruned(spark, path, [("k", 0, 10)]))
    want = _rows(spark.read.parquet(path).filter(F.col("k").between(0, 10)))
    assert got == want and len(want) == 11


def test_unknown_stats_never_pruned(spark, tmp_path):
    path = str(tmp_path / "t4")
    # one file with values 0..99, one whose stat column is ALL NULL —
    # its min/max are unknown, so no predicate may ever drop it
    spark.range(100).select(F.col("id").alias("k")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    spark.range(5).select(F.lit(None).cast("long").alias("k")).coalesce(
        1
    ).write.mode("append").parquet(path)
    n = collect_file_stats(spark, path, ["k"])
    assert n == 2
    surv = pruned_files(spark, path, [("k", 1_000_000, 1_000_001)])
    assert surv is not None and len(surv) == 1  # the null file survives
    # residual filter still yields zero rows (NULL never matches a range)
    assert read_pruned(spark, path, [("k", 1_000_000, 1_000_001)]).count() == 0


def test_date_bounds_compare_natively(spark, tmp_path):
    path = str(tmp_path / "t5")
    _write_clustered(spark, path)
    collect_file_stats(spark, path, ["d"])
    lo, hi = datetime.date(2024, 1, 10), datetime.date(2024, 1, 20)
    got = _rows(read_pruned(spark, path, [("d", lo, hi)]))
    want = _rows(
        spark.read.parquet(path).filter(F.col("d").between(F.lit(lo), F.lit(hi)))
    )
    assert got == want and len(want) > 0


def test_conjunction_and_sidecar_hidden_from_data_scans(spark, tmp_path):
    path = str(tmp_path / "t6")
    df = _write_clustered(spark, path)
    collect_file_stats(spark, path, ["k", "grp"])
    assert os.path.isdir(os.path.join(path, STATS_DIR))
    # the sidecar must be invisible to a plain data scan of the directory
    assert spark.read.parquet(path).count() == df.count()
    pred = [("k", 50, 250), ("grp", 2, 4)]
    got = _rows(read_pruned(spark, path, pred))
    want = _rows(
        spark.read.parquet(path)
        .filter(F.col("k").between(50, 250) & F.col("grp").between(2, 4))
    )
    assert got == want and len(want) > 0


def test_txn_snapshot_integration(spark, tmp_path):
    root = str(tmp_path / "root")
    df1 = spark.range(100).select(F.col("id").alias("k"))
    publish_tables(spark, root, {"t": df1}, txn_id=1)
    attach_table_stats(spark, root, "t", ["k"])
    m1 = read_manifest(root)
    # second publish shifts the data; the OLD snapshot's sidecar must keep
    # describing the OLD version dir (stats participate in isolation)
    publish_tables(
        spark, root, {"t": spark.range(500, 600).select(F.col("id").alias("k"))},
        txn_id=2,
    )
    attach_table_stats(spark, root, "t", ["k"])
    assert read_table_pruned(spark, root, "t", [("k", 0, 50)], manifest=m1).count() == 51
    assert read_table_pruned(spark, root, "t", [("k", 0, 50)]).count() == 0
    assert read_table_pruned(spark, root, "t", [("k", 550, 560)]).count() == 11


# --- Bloom-filter equality skipping -------------------------------------------


def test_bloom_point_lookup_prunes_to_one_file(spark, tmp_path):
    from f1_lakehouse_spark.sources.filestats import (
        bloom_pruned_files,
        collect_file_blooms,
        read_pruned_eq,
    )

    path = str(tmp_path / "b1")
    spark.range(2000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v")) \
        .repartition(4, "k").write.mode("overwrite").parquet(path)
    m = collect_file_blooms(spark, path, "k")
    assert m >= 1024
    surv = bloom_pruned_files(spark, path, "k", 137)
    # the key lives in exactly ONE hash partition; allow fp slack of 1
    assert surv is not None and 1 <= len(surv) <= 2
    got = _rows(read_pruned_eq(spark, path, "k", 137))
    want = _rows(spark.read.parquet(path).filter(F.col("k") == 137))
    assert got == want and len(want) == 1
    # absent key: residual guarantees zero rows; bloom keeps <=1 fp file
    absent = bloom_pruned_files(spark, path, "k", -5)
    assert absent is not None and len(absent) <= 1
    assert read_pruned_eq(spark, path, "k", -5).count() == 0


def test_bloom_missing_sidecar_falls_back(spark, tmp_path):
    from f1_lakehouse_spark.sources.filestats import (
        bloom_pruned_files,
        read_pruned_eq,
    )

    path = str(tmp_path / "b2")
    spark.range(50).select(F.col("id").alias("k")).write.mode(
        "overwrite"
    ).parquet(path)
    assert bloom_pruned_files(spark, path, "k", 7) is None
    assert read_pruned_eq(spark, path, "k", 7).count() == 1


def test_bloom_string_keys(spark, tmp_path):
    from f1_lakehouse_spark.sources.filestats import (
        bloom_pruned_files,
        collect_file_blooms,
        read_pruned_eq,
    )

    path = str(tmp_path / "b3")
    spark.range(500).select(
        F.concat(F.lit("user-"), F.col("id")).alias("u"), F.col("id").alias("v")
    ).repartition(4, "u").write.mode("overwrite").parquet(path)
    collect_file_blooms(spark, path, "u")
    surv = bloom_pruned_files(spark, path, "u", "user-42")
    assert surv is not None and 1 <= len(surv) <= 2
    got = _rows(read_pruned_eq(spark, path, "u", "user-42"))
    want = _rows(spark.read.parquet(path).filter(F.col("u") == "user-42"))
    assert got == want and len(want) == 1


# --- property tests: pruning is EXACTLY the filter, for any layout ------------


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60
    ),
    files=st.integers(min_value=1, max_value=5),
    lo=st.integers(min_value=-1100, max_value=1100),
    span=st.integers(min_value=0, max_value=600),
    by_range=st.booleans(),
)
def test_prop_range_prune_is_exact(spark, tmp_path_factory, vals, files, lo, span, by_range):
    path = str(tmp_path_factory.mktemp("fsprop") / "t")
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    part = df.repartitionByRange(files, "k") if by_range else df.repartition(files, "k")
    part.write.mode("overwrite").parquet(path)
    collect_file_stats(spark, path, ["k"])
    hi = lo + span
    got = sorted(r["k"] for r in read_pruned(spark, path, [("k", lo, hi)]).collect())
    want = sorted(v for v in vals if lo <= v <= hi)
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.sets(
        st.integers(min_value=-5000, max_value=5000), min_size=1, max_size=50
    ),
    probe=st.integers(min_value=-5000, max_value=5000),
    files=st.integers(min_value=1, max_value=4),
)
def test_prop_bloom_never_false_negative(spark, tmp_path_factory, keys, probe, files):
    from f1_lakehouse_spark.sources.filestats import (
        collect_file_blooms,
        read_pruned_eq,
    )

    path = str(tmp_path_factory.mktemp("blprop") / "t")
    df = spark.createDataFrame([(k,) for k in sorted(keys)], "k long")
    df.repartition(files, "k").write.mode("overwrite").parquet(path)
    collect_file_blooms(spark, path, "k")
    got = [r["k"] for r in read_pruned_eq(spark, path, "k", probe).collect()]
    # a false POSITIVE costs a file read (invisible here); a false
    # NEGATIVE would drop the row — the one thing blooms must never do
    assert got == ([probe] if probe in keys else [])
