"""Round-6 plan assertions + exactness/statistical properties.

The global lint (test_plan_lint.py) bans anti-patterns everywhere; these
tests pin the POSITIVE plan properties the round-6 SCALE.md notes claim
(map-side combines, bounded broadcasts, TakeOrdered top-k, prefix-rank
machinery instead of single-partition windows) and the mathematical
invariants the statistics must satisfy regardless of data.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from f1_lakehouse_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def _plan(spark, name: str) -> str:
    return (
        REGISTRY[name].fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    )


def _row(spark, name: str):
    return REGISTRY[name].fn(spark, SF_DIR).collect()[0]


# --- plan shape ------------------------------------------------------------------------


def test_welch_is_single_partial_aggregate(spark):
    """One pass, map-side combine, no join, no window."""
    plan = _plan(spark, "events_welch_ttest")
    assert "partial" in plan.lower()
    assert "SortMergeJoin" not in plan and "Window" not in plan


def test_permutation_explode_collapses_map_side(spark):
    """The PERM_B fan-out must partial-aggregate before the shuffle —
    the exchange carries per-task perm cells, not user rows."""
    from f1_lakehouse_spark.operators.round6_stats import _permutation_lazy

    buyers, out = _permutation_lazy(spark, SF_DIR)
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "partial" in plan.lower()
        assert "CartesianProduct" not in plan
    finally:
        buyers.unpersist()


def test_mad_topk_is_takeordered(spark):
    from f1_lakehouse_spark.operators.round6_stats import _mad_lazy

    rev, out = _mad_lazy(spark, SF_DIR)
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
    finally:
        rev.unpersist()


def test_radius_search_is_map_only_broadcast(spark):
    """The query fingerprint broadcasts; the corpus never shuffles."""
    plan = _plan(spark, "mm_phash_radius_search")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_ips_is_single_cell_aggregate(spark):
    plan = _plan(spark, "events_ips_offpolicy")
    assert "partial" in plan.lower()
    assert "SortMergeJoin" not in plan


# --- statistical invariants -------------------------------------------------------------


def test_ks_d_in_unit_interval_and_z_consistent(spark):
    r = _row(spark, "events_ks_two_sample")
    assert 0.0 <= r["d_stat"] <= 1.0
    expect_z = r["d_stat"] * math.sqrt(
        r["n_a"] * r["n_b"] / (r["n_a"] + r["n_b"])
    )
    assert r["ks_z"] == expect_z  # identical double tree, not approx


def test_welch_df_bounds(spark):
    """Welch-Satterthwaite df lies in [min(na,nb)-1, na+nb-2]."""
    r = _row(spark, "events_welch_ttest")
    assert r["var_a"] > 0 and r["var_b"] > 0
    lo = min(r["n_a"], r["n_b"]) - 1
    hi = r["n_a"] + r["n_b"] - 2
    assert lo - 1e-9 <= r["welch_df"] <= hi + 1e-9


def test_permutation_p_value_range_and_count(spark):
    from f1_lakehouse_spark.operators.round6_stats import PERM_B

    r = _row(spark, "events_permutation_test")
    assert r["n_perms"] == PERM_B
    assert 0 <= r["n_ge"] <= PERM_B
    assert r["p_value"] == (1.0 + r["n_ge"]) / (1.0 + float(PERM_B))
    # a null split (hash-reassigned labels on synthetic data) should not be
    # extreme: p strictly inside (0, 1]
    assert 0.0 < r["p_value"] <= 1.0


def test_quantile_sketch_contract_holds_and_is_monotone(spark):
    rows = sorted(
        REGISTRY["orders_quantile_sketch_contract"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["q"],
    )
    assert [r["within_bound"] for r in rows] == [True] * len(rows)
    exacts = [r["exact_cents"] for r in rows]
    assert exacts == sorted(exacts)  # higher q, higher order statistic
    for r in rows:
        assert 0 <= r["est_cents"] - r["exact_cents"] <= r["bin_width"] - 1


def test_mad_outliers_z_ranked_and_finite(spark):
    rows = REGISTRY["supplier_mad_outliers"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    zs = [abs(r["robust_z"]) for r in rows]
    assert zs == sorted(zs, reverse=True)
    assert all(math.isfinite(z) for z in zs)
    assert all(r["mad_rev"] > 0 for r in rows)


def test_propensity_att_matched_subset(spark):
    r = _row(spark, "scoring_propensity_nn_att")
    assert 0 < r["n_matched"] <= r["n_treated"]
    assert r["avg_abs_gap"] >= 0.0


def test_kappa_cells_partition_and_range(spark):
    r = _row(spark, "scoring_cohens_kappa")
    assert r["n11"] + r["n10"] + r["n01"] + r["n00"] == r["n_docs"]
    assert -1.0 - 1e-9 <= r["kappa"] <= 1.0 + 1e-9
    assert 0.0 <= r["po"] <= 1.0 and 0.0 <= r["pe"] <= 1.0


def test_ips_ess_bounded_by_eval_count(spark):
    r = _row(spark, "events_ips_offpolicy")
    # ESS = (sum w)^2 / sum w^2 <= number of eval rows with pi>0 <= n_eval
    assert 0 < r["ess"] <= r["n_eval"]
    assert r["ips_value"] > 0 and r["snips_value"] > 0


def test_spc_limits_bracket_grand_mean(spark):
    rows = REGISTRY["orders_spc_control_chart"].fn(spark, SF_DIR).collect()
    assert all(r["lcl"] < r["grand_mean"] < r["ucl"] for r in rows)
    assert all(r["n_days"] >= 2 for r in rows)
    for r in rows:
        assert r["out_of_control"] == (
            r["xbar"] > r["ucl"] or r["xbar"] < r["lcl"]
        )


def test_acf_lag_table_shape_and_q_monotone(spark):
    from f1_lakehouse_spark.operators.round6_stats import ACF_LAGS

    rows = sorted(
        REGISTRY["orders_acf_ljung_box"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["lag"],
    )
    assert [r["lag"] for r in rows] == list(range(1, ACF_LAGS + 1))
    assert all(-1.0 - 1e-9 <= r["acf_value"] <= 1.0 + 1e-9 for r in rows)
    qs = [r["ljung_box_q"] for r in rows]
    assert all(b >= a - 1e-12 for a, b in zip(qs, qs[1:]))  # cumulative


def test_ks_boundary_independence(spark):
    """The KS prefix statistic must not depend on partition count —
    rebuild with a different shuffle width and compare bit-for-bit."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    base = _row(spark, "events_ks_two_sample")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = _row(spark, "events_ks_two_sample")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == alt
