"""Unit tests for the r6 scale-hygiene helpers.

- ``pinning.pin_small_result`` must pass results under its declared bound
  through value-identically, and must REFUSE a result that exceeds it
  (that refusal is the guard that keeps the next data-proportional pin
  from silently adopting the driver-sized idiom).
- ``pinning.pin_checkpoint`` must survive the upstream frame's
  unpersist() — the exact failure mode the collect-pin existed to avoid.
- ``session.parse_byte_size`` must accept Spark's ByteUnit grammar
  ('128m', '100MB'), plain numbers, and fall back (not raise) on garbage
  — ADVICE r5: the old int(str(v).removesuffix('b')) crashed on any
  user-tuned unit-suffixed session conf.
- ``quality.plan_lint.broadcast_hint_offenders`` must flag a hint on an
  SF-scaling scan, stay quiet without the hint, honour the size-bounding
  exemptions (Aggregate, Limit), and (ADVICE r6) NOT misfire on
  non-broadcast join-strategy hints (merge / shuffle_hash).
- ``quality.plan_lint.global_window_offenders`` (r6 verdict item 3) must
  flag a partition-less Window over an unbounded SF-scaling scan, stay
  quiet for partitioned windows and for global windows over
  Aggregate/Limit-bounded frames.
- ``operators.extensions.grouped_prefix_rank`` + ``_ntile_from_rank_cols``
  must reproduce ROW_NUMBER / NTILE semantics per group exactly —
  including n < k groups and multi-range dominant groups.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from f1_lakehouse_spark.pinning import pin_checkpoint, pin_small_result
from f1_lakehouse_spark.quality.plan_lint import (
    broadcast_hint_offenders,
    global_window_offenders,
)
from f1_lakehouse_spark.session import parse_byte_size
from f1_lakehouse_spark.tables import load_table
from tests.conftest import SF_DIR


def test_pin_small_result_roundtrip(spark):
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    pinned = pin_small_result(df, 10)
    assert [r.asDict() for r in pinned.orderBy("id").collect()] == [
        {"id": i, "v": 2 * i} for i in range(10)
    ]
    assert pinned.schema == df.schema


def test_pin_small_result_refuses_data_proportional(spark):
    df = spark.range(100)
    with pytest.raises(AssertionError, match="pin_checkpoint"):
        pin_small_result(df, 99)


def test_pin_checkpoint_survives_upstream_unpersist(spark):
    base = spark.range(1000).withColumn("v", F.col("id") % 7)
    base = base.persist()
    base.count()
    out = base.groupBy("v").agg(F.count("*").alias("n"))
    pinned = pin_checkpoint(out)
    base.unpersist(blocking=True)
    assert pinned.agg(F.sum("n")).collect()[0][0] == 1000


@pytest.mark.parametrize(
    ("value", "want"),
    [
        ("134217728", 134217728),
        (134217728, 134217728),
        ("128m", 128 << 20),
        ("100MB", 100 << 20),
        ("1g", 1 << 30),
        ("64k", 64 << 10),
        ("  2tb ", 2 << 40),
        ("1.5k", 1536),
        ("garbage", 128 << 20),
        ("", 128 << 20),
    ],
)
def test_parse_byte_size(value, want):
    assert parse_byte_size(value) == want


def test_lint_flags_hinted_sf_scaling_scan(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey")
    bad = o.join(F.broadcast(li), o["o_orderkey"] == li["l_orderkey"])
    assert broadcast_hint_offenders(bad) != []


def test_lint_quiet_without_hint(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey")
    ok = o.join(li, o["o_orderkey"] == li["l_orderkey"])
    assert broadcast_hint_offenders(ok) == []


def test_lint_exempts_bounded_aggregate_and_limit(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus")
    # model-sized aggregate (3 flag values) — legal broadcast
    agg = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    assert (
        broadcast_hint_offenders(
            o.join(F.broadcast(agg), o["o_orderstatus"] == agg["l_returnflag"])
        )
        == []
    )
    capped = li.select("l_orderkey").limit(5)
    assert (
        broadcast_hint_offenders(
            o.join(F.broadcast(capped), o["o_orderkey"] == capped["l_orderkey"])
        )
        == []
    )


def test_lint_flags_scaling_key_aggregate_broadcast(spark):
    """r7 tightening: an aggregate KEYED by a scaling-cardinality column
    (one row per order) is data-proportional, not model-sized — a
    broadcast hint on it must flag instead of being exempted."""
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey")
    agg = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    assert (
        broadcast_hint_offenders(
            o.join(F.broadcast(agg), o["o_orderkey"] == agg["l_orderkey"])
        )
        != []
    )
    # and the same shape under a partition-less window trips rule 2
    from pyspark.sql import Window as W

    ranked = agg.withColumn(
        "rn", F.row_number().over(W.orderBy("n", "l_orderkey"))
    )
    assert global_window_offenders(ranked) != []


def test_lint_exempts_bounded_dims(spark):
    n = load_table(spark, SF_DIR, "nation")
    c = load_table(spark, SF_DIR, "customer")
    df = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    assert broadcast_hint_offenders(df) == []


def test_lint_ignores_non_broadcast_hints(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey")
    merged = o.join(li.hint("merge"), o["o_orderkey"] == li["l_orderkey"])
    assert broadcast_hint_offenders(merged) == []
    shuffled = o.join(li.hint("shuffle_hash"), o["o_orderkey"] == li["l_orderkey"])
    assert broadcast_hint_offenders(shuffled) == []


def test_lint_flags_mapjoin_alias(spark):
    """MAPJOIN / BROADCASTJOIN are broadcast-strategy aliases and must trip
    the lint like the canonical name (r7 ADVICE, low)."""
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey")
    for alias in ("mapjoin", "broadcastjoin"):
        hinted = o.join(li.hint(alias), o["o_orderkey"] == li["l_orderkey"])
        assert broadcast_hint_offenders(hinted) != [], alias

    # the UnresolvedHint branch (a hint that survives un-resolved into the
    # walked plan) must also match the full alias set — duck-typed node
    from f1_lakehouse_spark.quality.plan_lint import _is_broadcast_hint

    class _FakeNode:
        def __init__(self, name):
            self._name = name

        def name(self):
            return self._name

    for alias in ("MAPJOIN", "BROADCASTJOIN", "BROADCAST", "broadcast"):
        assert _is_broadcast_hint(_FakeNode(alias), "UnresolvedHint"), alias
    for alias in ("MERGE", "SHUFFLE_HASH", "SHUFFLE_REPLICATE_NL"):
        assert not _is_broadcast_hint(_FakeNode(alias), "UnresolvedHint"), alias


def test_global_window_lint_flags_partitionless_over_scan(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber")
    w = Window.orderBy("l_orderkey", "l_linenumber")
    bad = li.withColumn("rn", F.row_number().over(w))
    assert global_window_offenders(bad) != []


def test_global_window_lint_quiet_for_partitioned_and_bounded(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber")
    wp = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    ok = li.withColumn("rn", F.row_number().over(wp))
    assert global_window_offenders(ok) == []
    # a global window over a MODEL-SIZED aggregate (3 flag values) is
    # legal; a scaling-key aggregate is not (see
    # test_lint_flags_scaling_key_aggregate_broadcast)
    lif = load_table(spark, SF_DIR, "lineitem")
    agg = lif.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    wg = Window.orderBy("n", "l_returnflag")
    assert (
        global_window_offenders(agg.withColumn("rn", F.row_number().over(wg))) == []
    )
    capped = li.limit(7)
    assert (
        global_window_offenders(
            capped.withColumn(
                "rn", F.row_number().over(Window.orderBy("l_orderkey", "l_linenumber"))
            )
        )
        == []
    )


def test_grouped_prefix_rank_matches_window_semantics(spark):
    from f1_lakehouse_spark.operators.extensions import (
        _ntile_from_rank_cols,
        grouped_prefix_rank,
    )

    # skewed groups: 'a' dominant (401 rows: spans multiple ranges at
    # n_parts=4), 'b' mid (37), 'c' has n < k (2 rows)
    rows = (
        [("a", i) for i in range(401)]
        + [("b", 1000 + i) for i in range(37)]
        + [("c", 5000), ("c", 5001)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    ranked, release = grouped_prefix_rank(
        spark, df, ["g"], [F.col("v").asc()], n_parts=4
    )
    got = ranked.select(
        "g", "v", "rank", "n_g", _ntile_from_rank_cols(F.col("rank"), F.col("n_g"), 3).alias("b3")
    )
    w = Window.partitionBy("g").orderBy("v")
    want = df.select(
        "g",
        "v",
        F.row_number().over(w).cast("long").alias("rank"),
        F.count("*").over(Window.partitionBy("g")).alias("n_g"),
        F.ntile(3).over(w).cast("long").alias("b3"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    release()


def test_grouped_prefix_rank_rejects_high_cardinality_group(spark):
    """The bounded-group-cardinality contract is runtime-enforced: a group
    key with too many distinct values fails loudly (naming the scale-safe
    alternative) instead of silently collecting an unbounded offset table
    to the driver (r7 verdict 'what's wrong' #2)."""
    import pytest

    from f1_lakehouse_spark.operators.extensions import grouped_prefix_rank

    # every row its own group: offset table = n rows, way over the ceiling
    df = spark.range(64).selectExpr("CAST(id AS STRING) AS g", "id AS v")
    with pytest.raises(AssertionError, match="Window.partitionBy"):
        grouped_prefix_rank(
            spark, df, ["g"], [F.col("v").asc()], n_parts=4, max_offset_rows=16
        )
