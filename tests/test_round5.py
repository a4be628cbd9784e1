"""Round-5 plan assertions + exactness properties.

The global lint (test_plan_lint.py) bans anti-patterns everywhere; these
tests pin the POSITIVE plan properties the round-5 SCALE.md notes claim,
so a refactor can't silently regress them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_lakehouse_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def _plan(spark, name: str) -> str:
    return REGISTRY[name].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_triangle_count_closing_join_is_broadcast(spark):
    """Wedges must never cross an exchange: both the wedge join and the
    closing-edge join are broadcast, and the role counts partially
    aggregate before the single vertex-keyed shuffle."""
    plan = _plan(spark, "graph_triangle_count")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan


def test_fisher_index_basket_join_is_broadcast(spark):
    from f1_lakehouse_spark.operators.round5_stats import _fisher_lazy

    cells, out = _fisher_lazy(spark, SF_DIR)
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
    finally:
        cells.unpersist()


def test_phash_band_join_is_broadcast_and_build_is_wide(spark):
    from f1_lakehouse_spark.pipeline.multimodal import _phash_candidates_lazy

    ph, out = _phash_candidates_lazy(spark, SF_DIR)
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # band-bucket candidates
        assert "CartesianProduct" not in plan
    finally:
        ph.unpersist()


def test_knn_shapley_sample_is_takeordered(spark):
    """The md5 sample pick must be a distributed TakeOrdered, never a
    global sort."""
    from f1_lakehouse_spark.pipeline.hashing import spark_md5_hash48
    from f1_lakehouse_spark.tables import load_table

    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", spark_md5_hash48(F.col("vec_id").cast("string")).alias("h")
    )
    plan = (
        e.orderBy("h", "vec_id")
        .limit(264)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_position_attribution_credits_sum_to_one_million_per_user(spark):
    """The largest-remainder ppm rule must make every converting user's
    credits sum to EXACTLY 1e6 — the invariant that makes channel totals
    exact BIGINT sums."""
    from f1_lakehouse_spark.operators.events_analytics import AB_CONV_VALUE
    from f1_lakehouse_spark.tables import load_table

    e = load_table(spark, SF_DIR, "events")
    conv = (
        e.where(
            (F.col("event_type") == "purchase") & (F.col("value") > AB_CONV_VALUE)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    n_users_with_touches = (
        e.where(F.col("event_type").isin("click", "view"))
        .join(conv, "user_id")
        .where(F.col("ts") < F.col("conv_ts"))
        .select("user_id")
        .distinct()
        .count()
    )
    total_ppm = sum(
        r["credit_ppm"]
        for r in REGISTRY["events_position_attribution"].fn(spark, SF_DIR).collect()
    )
    assert total_ppm == n_users_with_touches * 1_000_000


def test_isotonic_rates_are_monotone_nondecreasing(spark):
    rows = sorted(
        REGISTRY["scoring_isotonic_calibration"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["bin"],
    )
    rates = [r["iso_rate"] for r in rows]
    assert rates == sorted(rates)
    assert len(rows) > 3


def test_brier_murphy_identity(spark):
    r = REGISTRY["scoring_brier_decomposition"].fn(spark, SF_DIR).collect()[0]
    assert abs(r["brier"] - (r["reliability"] - r["resolution"] + r["uncertainty"])) < 1e-9


def test_bom_rollup_root_conservation(spark):
    """Every part's cost lands in exactly one root subtree: the sum of
    root (single-digit) subtree costs equals the total part cost."""
    rows = REGISTRY["part_bom_subtree_rollup"].fn(spark, SF_DIR).collect()
    total_own = sum(r["own_cents"] for r in rows)
    root_subtrees = sum(r["subtree_cents"] for r in rows if r["level"] == 1)
    assert root_subtrees == total_own
