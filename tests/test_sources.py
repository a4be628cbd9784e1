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


# --- FastF1-shaped adapter (reference fastf1_ingest.py, network-free fake) ----


def _fake_f1_client():
    """Deterministic stand-in for fastf1: 2 rounds/season, laps+weather for
    every session, results only for races; round 2's Q session raises (the
    fault-isolation path). Defined inside a function so cloudpickle ships
    the class by VALUE to executors (a module-level test class would be
    pickled by reference and fail to import on the Python workers)."""

    class _FakeF1Client:
        def get_event_schedule(self, season):
            import pandas as pd

            return pd.DataFrame(
                {"RoundNumber": [1, 2],
                 "EventName": ["Bahrain Grand Prix!", "Jeddah GP"]}
            )

        def load_session(self, season, round_no, code):
            import pandas as pd

            if round_no == 2 and code == "Q":
                raise RuntimeError("session not available")  # 404 analog
            if code in ("FP1", "FP2", "FP3", "S"):
                return {}  # no data for these in the fake
            frames = {
                "laps": pd.DataFrame(
                    {
                        "Driver": ["VER", "HAM"],
                        "LapTime": [88_000_000_000 + round_no, 89_000_000_000],
                    }
                ),
                "weather": pd.DataFrame({"AirTemp": [25.5], "Rainfall": [False]}),
            }
            if code == "R":
                frames["results"] = pd.DataFrame(
                    {"DriverNumber": [1, 44], "Points": [25, 18]}
                )
            return frames

    return _FakeF1Client()


def test_fastf1_adapter_tasks_and_slug():
    from f1_lakehouse_spark.sources.fastf1_adapter import (
        SESSION_CODES,
        build_session_tasks,
        slugify_name,
    )

    assert slugify_name("Bahrain Grand Prix!") == "bahrain-grand-prix"
    tasks = build_session_tasks(_fake_f1_client(), [2024])
    assert len(tasks) == 2 * len(SESSION_CODES)
    assert tasks[0] == {
        "season": 2024,
        "round": 1,
        "grand_prix": "bahrain-grand-prix",
        "session": "FP1",
    }


def test_fastf1_adapter_end_to_end(spark):
    import tempfile

    from f1_lakehouse_spark.sources.fastf1_adapter import ingest_seasons

    schemas = {
        "laps": "Driver string, LapTime long, "
        "season int, round int, grand_prix string, session string",
        "weather": "AirTemp double, Rainfall boolean, "
        "season int, round int, grand_prix string, session string",
        "results": "DriverNumber int, Points long, "
        "season int, round int, grand_prix string, session string",
    }
    with tempfile.TemporaryDirectory() as tmp:
        out = ingest_seasons(
            spark, _fake_f1_client(), [2024], tmp, result_schemas=schemas
        )
        laps = out["laps"]
        # Q+R for round 1, R only for round 2 (round 2 Q raised -> skipped)
        sessions = {
            (r["round"], r["session"])
            for r in laps.select("round", "session").distinct().collect()
        }
        assert sessions == {(1, "Q"), (1, "R"), (2, "R")}
        assert laps.count() == 6  # 3 sessions x 2 laps
        # results only exist for race sessions
        res_sessions = {
            r["session"] for r in out["results"].select("session").distinct().collect()
        }
        assert res_sessions == {"R"}
        # partition dirs follow the reference layout
        import os

        assert os.path.isdir(
            f"{tmp}/laps/season=2024/round=1/grand_prix=bahrain-grand-prix/session=R"
        )
        # re-run is idempotent (dynamic overwrite)
        ingest_seasons(spark, _fake_f1_client(), [2024], tmp, result_schemas=schemas)
        assert spark.read.parquet(f"{tmp}/laps").count() == 6


# --- physical layout: compaction + Z-order -----------------------------------


def test_compact_parquet_reduces_file_count(spark):
    import glob
    import tempfile

    from f1_lakehouse_spark.sources.layout import compact_parquet

    li = load_table(spark, SF_DIR, "lineitem")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/li"
        li.repartition(40).write.parquet(path)  # small-file mess
        before = len(glob.glob(f"{path}/*.parquet"))
        assert before == 40
        n = compact_parquet(spark, path, target_file_mb=128)
        after = glob.glob(f"{path}/*.parquet")
        assert len(after) == n < before
        back = spark.read.parquet(path)
        assert back.count() == li.count()
        assert sorted(back.columns) == sorted(li.columns)


def _files_covering(path, col, value):
    """How many parquet files' [min, max] for `col` cover `value` — the
    files a predicate-pushdown scan must read."""
    import glob

    import pyarrow.parquet as pq

    n = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None and lo <= value <= hi:
            n += 1
    return n


def test_zorder_prunes_on_every_clustered_column(spark):
    import tempfile

    from f1_lakehouse_spark.sources.layout import write_zordered

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    n_files = 8
    with tempfile.TemporaryDirectory() as tmp:
        naive, zpath = f"{tmp}/naive", f"{tmp}/zorder"
        # naive layout: hash-shuffled -> every file spans the full domain
        li.repartition(n_files).write.parquet(naive)
        write_zordered(li, zpath, ["l_orderkey", "l_partkey"], n_files=n_files)
        assert spark.read.parquet(zpath).count() == li.count()
        mid_ok = li.approxQuantile("l_orderkey", [0.5], 0.01)[0]
        mid_pk = li.approxQuantile("l_partkey", [0.5], 0.01)[0]
        for col, v in [("l_orderkey", mid_ok), ("l_partkey", mid_pk)]:
            n_naive = _files_covering(naive, col, v)
            n_z = _files_covering(zpath, col, v)
            assert n_naive == n_files, f"naive layout should not prune {col}"
            assert n_z < n_naive, (
                f"z-order must tighten {col} file stats: {n_z} vs {n_naive}"
            )


# --- custom Python DataSource (Spark 4 pyspark.sql.datasource) -----------------


def test_python_datasource_batch_deterministic(spark):
    from f1_lakehouse_spark.sources.python_datasource import (
        _telemetry_row,
        register_telemetry_source,
    )

    register_telemetry_source(spark)
    df = (
        spark.read.format("synthetic_telemetry")
        .option("rows_per_partition", 50)
        .option("partitions", 3)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 150
    # partition fan-out happens executor-side: one task per InputPartition
    assert df.rdd.getNumPartitions() == 3
    # byte-identical regeneration: the source is a pure function of options
    expected = {_telemetry_row(p, i, 8) for p in range(3) for i in range(50)}
    assert {(r.reading_id, r.sensor, r.reading) for r in rows} == expected
    # engine composes on top like any native source
    agg = df.groupBy("sensor").count()
    assert agg.count() <= 8 and sum(r["count"] for r in agg.collect()) == 150


def test_python_datasource_stream_offsets(spark, tmp_path):
    from f1_lakehouse_spark.sources.python_datasource import (
        _telemetry_row,
        register_telemetry_source,
    )

    register_telemetry_source(spark)
    sdf = (
        spark.readStream.format("synthetic_telemetry")
        .option("rows_per_batch", 20)
        .load()
    )
    assert sdf.isStreaming
    out = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(processingTime="0 seconds")
        .start()
    )
    # the source is unbounded (every read() advances the offset), so wait
    # for >= 2 committed micro-batches instead of processAllAvailable()
    import time

    try:
        deadline = time.time() + 60
        while time.time() < deadline and len(q.recentProgress) < 2:
            time.sleep(0.5)
        assert len(q.recentProgress) >= 2, "no micro-batch committed in 60s"
    finally:
        q.stop()
    got = spark.read.parquet(out)
    n = got.count()
    # at least one 20-row micro-batch committed, offsets advanced contiguously
    assert n >= 20 and n % 20 == 0
    first = {
        (r.reading_id, r.sensor, r.reading)
        for r in got.filter("reading_id < 20").collect()
    }
    assert first == {_telemetry_row(0, i, 8) for i in range(20)}


def test_autosize_shuffle_partitions_scales_with_volume(spark):
    """partitions = clamp(bytes/128MB, defaultParallelism, cap): small
    inputs stay at the core-count floor; the rule kicks in once volume
    crosses floor*128MB (verified arithmetically — the testdata is far
    below the floor threshold, so the floor binds here)."""
    from f1_lakehouse_spark import session as sess_mod

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        sz = sess_mod.input_bytes(spark, ["/root/testdata/sf0.01"])
        assert sz > 0
        chosen = sess_mod.autosize_shuffle_partitions(
            spark, ["/root/testdata/sf0.01"]
        )
        floor = int(spark.sparkContext.defaultParallelism)
        assert chosen == floor  # testdata << floor*128MB
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(chosen)
        # the rule itself, without 100 TB on disk: pure arithmetic
        tb100 = 100 * (1 << 40)
        n = tb100 // sess_mod.TARGET_SHUFFLE_PARTITION_BYTES
        assert min(n, sess_mod.SHUFFLE_PARTITIONS_CAP) == sess_mod.SHUFFLE_PARTITIONS_CAP
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_load_table_autosizes_vanilla_session_only(spark):
    """load_table is the session-owning choke point under the driver's
    VANILLA session (r7 ADVICE, medium): when spark.sql.shuffle.partitions
    still holds Spark's untouched static default (200) it is replaced with
    the input-derived count; an explicitly tuned value is left alone."""
    from f1_lakehouse_spark import tables as tbl_mod

    before = spark.conf.get("spark.sql.shuffle.partitions")
    key = (spark.sparkContext.applicationId, __import__("os").path.abspath(
        "/root/testdata/sf0.001"))
    try:
        # vanilla default → autosized to the floor (testdata << floor*128MB)
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        tbl_mod._AUTOSIZED.discard(key)
        tbl_mod.load_table(spark, "/root/testdata/sf0.001", "region")
        floor = int(spark.sparkContext.defaultParallelism)
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(floor)
        # explicit wins: a tuned value survives a fresh autosize pass
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        tbl_mod._AUTOSIZED.discard(key)
        tbl_mod.load_table(spark, "/root/testdata/sf0.001", "region")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        # and the pass is once-per-(session, dir): no re-sizing on reload
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        tbl_mod.load_table(spark, "/root/testdata/sf0.001", "region")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "200"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        tbl_mod._AUTOSIZED.discard(key)


def test_training_shards_deterministic_manifest_and_verify(spark, tmp_path):
    """Shard writer contract: same input -> identical manifest (membership
    is key-hash-derived, checksums order-independent); the consumer-side
    verifier passes on intact output and localizes a corrupted shard."""
    import json

    from f1_lakehouse_spark.sources.shards import (
        MANIFEST_NAME,
        verify_training_shards,
        write_training_shards,
    )
    from f1_lakehouse_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "source"
    )
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = write_training_shards(d, out1, "doc_id", n_shards=4)
    m2 = write_training_shards(d, out2, "doc_id", n_shards=4)
    assert m1 == m2  # deterministic rebuild
    assert m1["total_rows"] == d.count()
    assert set(m1["shards"]) == {"0", "1", "2", "3"}

    assert verify_training_shards(spark, out1)["ok"]

    # corrupt one shard: drop a file's rows by rewriting shard=0 with a subset
    sub = spark.read.parquet(out1).filter("shard = 0").limit(1).drop("shard")
    sub.write.mode("overwrite").parquet(f"{out1}/shard=0")
    res = verify_training_shards(spark, out1)
    assert not res["ok"] and res["mismatched_shards"] == ["0"]

    # manifest survives on disk as the handoff artifact
    with open(f"{out2}/{MANIFEST_NAME}") as f:
        assert json.load(f) == m2


def test_write_bucketed_table_join_has_no_exchange_and_preserves_content(spark):
    from f1_lakehouse_spark.sources.parquet_io import write_bucketed_table

    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus")
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    with tempfile.TemporaryDirectory() as tmp:
        try:
            write_bucketed_table(
                orders, "t_bkt_orders", f"{tmp}/o", "o_orderkey", 4
            )
            write_bucketed_table(
                lineitem, "t_bkt_lineitem", f"{tmp}/l", "l_orderkey", 4
            )
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            o, l = spark.table("t_bkt_orders"), spark.table("t_bkt_lineitem")
            joined = o.join(l, o["o_orderkey"] == l["l_orderkey"])
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning(o_orderkey" not in plan
            assert "Exchange hashpartitioning(l_orderkey" not in plan
            # content survives the bucketed round-trip exactly
            assert o.count() == orders.count()
            assert joined.count() == lineitem.join(
                orders, orders["o_orderkey"] == lineitem["l_orderkey"]
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
            spark.sql("DROP TABLE IF EXISTS t_bkt_lineitem")


def test_delete_rows_partition_scoped_removes_fully_emptied_partitions(spark):
    """Dynamic partition overwrite only replaces partitions present in the
    written frame — the helper must explicitly remove partitions the delete
    fully empties, and leave out-of-scope partitions byte-identical."""
    import os

    from f1_lakehouse_spark.sources.parquet_io import (
        delete_rows_partition_scoped,
        write_partitioned,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "id long, part string, v long",
    )
    with tempfile.TemporaryDirectory() as tmp:
        tbl = f"{tmp}/t"
        write_partitioned(df, tbl, ["part"])
        before_c = {
            f: os.path.getsize(os.path.join(tbl, "part=c", f))
            for f in os.listdir(f"{tbl}/part=c")
            if f.endswith(".parquet")
        }
        # delete ALL of partition b and PART of partition a; c out of scope
        n = delete_rows_partition_scoped(
            spark,
            tbl,
            "part",
            F.col("part").isin("a", "b"),
            F.col("id") >= 2,
        )
        assert n == 2
        back = spark.read.parquet(tbl)
        assert sorted(r["id"] for r in back.collect()) == [1, 4]
        assert not os.path.isdir(f"{tbl}/part=b")  # fully emptied -> removed
        after_c = {
            f: os.path.getsize(os.path.join(tbl, "part=c", f))
            for f in os.listdir(f"{tbl}/part=c")
            if f.endswith(".parquet")
        }
        assert after_c == before_c  # out-of-scope partition untouched


def test_delete_rows_partition_scoped_zero_match_is_safe(spark):
    """A delete whose row predicate matches nothing must rewrite the
    selected partitions without changing content, and one whose partition
    predicate selects nothing must touch zero partitions."""
    from f1_lakehouse_spark.sources.parquet_io import (
        delete_rows_partition_scoped,
        write_partitioned,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, part string, v long"
    )
    with tempfile.TemporaryDirectory() as tmp:
        tbl = f"{tmp}/t"
        write_partitioned(df, tbl, ["part"])
        n = delete_rows_partition_scoped(
            spark, tbl, "part", F.col("part") == "a", F.col("id") > 99
        )
        assert n == 1  # partition read+rewritten, nothing deleted
        assert sorted(r["id"] for r in spark.read.parquet(tbl).collect()) == [1, 2]
        n = delete_rows_partition_scoped(
            spark, tbl, "part", F.col("part") == "zzz", F.col("id") > 0
        )
        assert n == 0  # no partition selected -> no-op
        assert sorted(r["id"] for r in spark.read.parquet(tbl).collect()) == [1, 2]


def test_compact_parquet_is_idempotent(spark):
    from f1_lakehouse_spark.sources.layout import compact_parquet

    df = load_table(spark, SF_DIR, "orders")
    with tempfile.TemporaryDirectory() as tmp:
        tbl = f"{tmp}/t"
        df.repartition(8).write.parquet(tbl)
        n1 = compact_parquet(spark, tbl, target_file_mb=128)
        rows = spark.read.parquet(tbl).count()
        n2 = compact_parquet(spark, tbl, target_file_mb=128)
        assert n1 == n2
        assert spark.read.parquet(tbl).count() == rows


def test_delete_rows_partition_scoped_null_predicate_keeps_row(spark):
    """SQL DELETE semantics: a NULL row predicate KEEPS the row (it is not
    TRUE) — a bare filter(~pred) would silently delete it."""
    from f1_lakehouse_spark.sources.parquet_io import (
        delete_rows_partition_scoped,
        write_partitioned,
    )

    df = spark.createDataFrame(
        [(None, "a", 1), (7, "a", 2), (2, "a", 3)],
        "uid long, part string, rowid long",
    )
    with tempfile.TemporaryDirectory() as tmp:
        tbl = f"{tmp}/t"
        write_partitioned(df, tbl, ["part"])
        n = delete_rows_partition_scoped(
            spark, tbl, "part", F.col("part") == "a", F.col("uid") % 2 == 0
        )
        assert n == 1
        kept = sorted(
            ((r["uid"], r["rowid"]) for r in spark.read.parquet(tbl).collect()),
            key=lambda t: t[1],
        )
        # uid=2 deleted (predicate TRUE); uid=7 kept (FALSE); uid=NULL kept
        assert kept == [(None, 1), (7, 2)]
