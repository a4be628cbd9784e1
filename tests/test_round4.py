"""Round-4 operator invariants + plan assertions.

The exact-oracle differential in test_operators.py already covers every
new registered query value-for-value; these tests pin the properties the
differential can't see — plan shapes that must survive 100 TB and
semantic invariants on crafted inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_lakehouse_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# --- dedup_corpus_lines --------------------------------------------------------------


def test_corpus_lines_no_broadcast_of_dup_set(spark):
    """The line-count side must join the segments on the hash key via a
    shuffle join, never a broadcast — the dup set is corpus-sized at
    100 TB. (The tiny sf0.001 input would tempt AQE into a broadcast; the
    invariant we pin is that the per-doc re-aggregation exists and the
    corpus text appears in no exchange after the segment explode — only
    48-bit hashes move.)"""
    plan = _plan(spark, "dedup_corpus_lines")
    # the only text-typed column downstream of the explode is the md5 input;
    # exchanges must carry (doc_id, line_no, h), never `ws`
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "ws#" not in line, line


def test_corpus_lines_invariants(spark):
    rows = REGISTRY["dedup_corpus_lines"].fn(spark, SF_DIR).collect()
    assert rows, "non-empty at sf0.001"
    for r in rows:
        assert 0 <= r["n_dup_lines"] <= r["n_lines"]
        assert len(r["kept_sig"]) == 12


# --- text_repetition_loop_detect -----------------------------------------------------


def test_repetition_loop_invariants(spark):
    rows = REGISTRY["text_repetition_loop_detect"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["loop_period"] <= 4
        assert r["loop_repeats"] >= 1
        # a detected loop means >= 2 consecutive blocks; no loop means 1
        if r["loop_period"] == 0:
            assert r["loop_repeats"] == 1
        else:
            assert r["loop_repeats"] >= 2


def test_repetition_loop_detects_crafted_tail(spark, tmp_path):
    """End-to-end on crafted docs: write a tiny documents.parquet and run
    the registered function against it, so the detector (not a replica)
    is what's tested."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta the end the end the end", "en", "s", 0),
            (2, "one two three four", "en", "s", 0),
            (3, "x loop loop loop loop", "en", "s", 0),
            (4, "a b c a b c a b c", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sfrep")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {
        r["doc_id"]: (r["loop_period"], r["loop_repeats"])
        for r in REGISTRY["text_repetition_loop_detect"].fn(spark, sf).collect()
    }
    assert out[1] == (2, 3)  # "the end" x3
    assert out[2] == (0, 1)  # no loop
    assert out[3] == (1, 4)  # "loop" x4
    assert out[4] == (3, 3)  # "a b c" x3


def test_repetition_loop_is_map_only(spark):
    plan = _plan(spark, "text_repetition_loop_detect")
    assert "Exchange" not in plan


# --- scoring_hashed_linear_quality ---------------------------------------------------


def test_hashed_linear_scoring_is_map_only(spark):
    """The classifier is one fold per doc — scoring must add zero
    exchanges over the scan."""
    plan = _plan(spark, "scoring_hashed_linear_quality")
    assert "Exchange" not in plan


def test_hashed_linear_scoring_invariants(spark):
    rows = REGISTRY["scoring_hashed_linear_quality"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r["score_sum"]) <= 1000 * r["n_feats"]
        assert (r["verdict"] == "keep") == (r["score_sum"] >= 0)


# --- curation_doremi_reweight --------------------------------------------------------


def test_doremi_weights_sum_and_monotonicity(spark):
    rows = REGISTRY["curation_doremi_reweight"].fn(spark, SF_DIR).collect()
    assert rows
    total_ppm = sum(r["weight_ppm"] for r in rows)
    # floor division loses at most 1 ppm per domain
    assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000
    # the zero-excess (lowest-loss) domain never multiplies up
    for r in rows:
        if r["excess"] == 0:
            assert r["m_final"] == 1_000_000
        else:
            assert r["m_final"] >= 1_000_000


def test_doremi_scans_corpus_once(spark):
    """T coupled rounds operate on the persisted |domains|-row model frame;
    without the cache every round re-derives the corpus aggregate and the
    executed plan contains dozens of live parquet scans (observed: 32
    before the fix). With it, execution reads the materialized cache: the
    top-level plan (everything above the first InMemoryRelation, whose
    toString recursively prints its cache-BUILD plan) must contain no
    parquet scan of documents."""
    plan = _plan(spark, "curation_doremi_reweight")
    assert "InMemoryTableScan" in plan
    top = plan.split("InMemoryRelation", 1)[0]
    assert "documents" not in top, top


# --- F1 parity adapters --------------------------------------------------------------


def test_f1_adapters_run_the_real_functions(spark):
    """The adapter queries must call the same functions the dashboard
    calls — pin by identity on the module attributes they dispatch to."""
    import f1_lakehouse_spark.f1.adapters as ad
    from f1_lakehouse_spark.f1 import analytics, models

    assert ad.analytics is analytics
    assert ad.models is models
    # spot-check one composed output against the model function directly
    dss_direct = models.driver_session_summary(
        ad.silver_laps_analog(spark, SF_DIR)
    )
    via_registry = REGISTRY["f1_driver_session_summary"].fn(spark, SF_DIR)
    assert sorted(dss_direct.columns) == sorted(via_registry.columns)
    assert dss_direct.count() == via_registry.count()


# --- ann_batch_query_topk ------------------------------------------------------------


def test_batch_query_scans_corpus_once_with_group_limit(spark):
    """Q queries must cost ONE corpus pass: the query batch broadcasts
    (BroadcastNestedLoopJoin over the Q-row side), and per-query top-k
    goes through WindowGroupLimit so partitions emit Q*k rows, not Q*N."""
    plan = _plan(spark, "ann_batch_query_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    scans = [
        line
        for line in plan.splitlines()
        if "Scan parquet" in line and "embeddings" in line
    ]
    # corpus side + broadcast query side = exactly two scans, no re-derive
    assert len(scans) == 2, plan


def test_batch_query_agrees_with_single_query(spark):
    """The batch result restricted to QUERY_VEC_ID must equal the
    single-query brute-force op (same corpus, same tiebreak)."""
    from f1_lakehouse_spark.pipeline.similarity import QUERY_VEC_ID

    batch = {
        (r["vec_id"], round(r["cosine"], 9))
        for r in REGISTRY["ann_batch_query_topk"].fn(spark, SF_DIR).collect()
        if r["query_id"] == QUERY_VEC_ID
    }
    single = {
        (r["vec_id"], round(r["cosine"], 9))
        for r in REGISTRY["ann_cosine_topk_bruteforce"].fn(spark, SF_DIR).collect()
    }
    assert batch == single


# --- embedding_knn_ood_score ---------------------------------------------------------


def test_knn_ood_is_map_only(spark):
    """Scoring folds distances to the literal reference sample inside the
    scan stage — no shuffle, no join (the sample is the model)."""
    plan = _plan(spark, "embedding_knn_ood_score")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_knn_ood_members_score_low(spark):
    """A reference-sample member's k-th-NN distance is measured against
    the OTHER refs (self excluded), and every vector's n_ref is the
    sample size minus its own membership."""
    from f1_lakehouse_spark.pipeline.hashing import spark_salted_hash
    from f1_lakehouse_spark.pipeline.similarity import OOD_MOD
    from f1_lakehouse_spark.tables import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, SF_DIR, "embeddings")
    n_sample = e.filter(
        spark_salted_hash("vec_id", ":ood") % OOD_MOD == 0
    ).count()
    rows = REGISTRY["embedding_knn_ood_score"].fn(spark, SF_DIR).collect()
    assert len(rows) == e.count()
    for r in rows:
        assert r["n_ref"] in (n_sample, n_sample - 1)
        assert r["knn_d"] >= 0.0


# --- seeded-random batch differentials vs pure-Python references ---------------------
# The DuckDB oracle proves Spark==DuckDB; these prove both match an
# independent third implementation on adversarial inputs (short docs,
# all-same-word docs, exact-period tails) that the synthetic corpus may
# not contain.


def _py_loop_detect(words, max_p=4):
    n = len(words)
    rws = words[::-1]
    for p in range(1, max_p + 1):
        if n <= p:
            continue
        run = 0
        for i in range(n - p):
            if rws[i] != rws[i + p]:
                break
            run += 1
        if run >= p:
            return p, run // p + 1
    return 0, 1


def test_repetition_loop_random_batch_vs_python(spark, tmp_path):
    import random

    rng = random.Random(1234)
    vocab = ["a", "b", "c", "dd", "eee"]
    cases = []
    for i in range(200):
        n = rng.randint(1, 12)
        words = [rng.choice(vocab) for _ in range(n)]
        if i % 3 == 0 and n >= 2:  # force tails with real loops
            p = rng.randint(1, min(4, n))
            reps = rng.randint(2, 3)
            words = words + (words[-p:] * reps)
        cases.append((i, " ".join(words)))
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in cases],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sfrand")
    df.coalesce(2).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: (r["loop_period"], r["loop_repeats"])
        for r in REGISTRY["text_repetition_loop_detect"].fn(spark, sf).collect()
    }
    for i, t in cases:
        assert got[i] == _py_loop_detect(t.split(" ")), (i, t, got[i])


def _py_corpus_lines(docs, w=8, dup_docs=2):
    import hashlib

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    segs = {}  # doc -> [hashes]
    for did, text in docs:
        ws = text.split(" ")
        segs[did] = [
            h48(" ".join(ws[j * w : (j + 1) * w])) for j in range(len(ws) // w)
        ]
    from collections import defaultdict

    owners = defaultdict(set)
    for did, hs in segs.items():
        for hh in hs:
            owners[hh].add(did)
    out = {}
    for did, hs in segs.items():
        if not hs:
            continue
        dup = [hh for hh in hs if len(owners[hh]) >= dup_docs]
        kept = [str(hh) for hh in hs if len(owners[hh]) < dup_docs]
        sig = hashlib.md5(" ".join(kept).encode()).hexdigest()[:12]
        out[did] = (len(hs), len(dup), sig)
    return out


def test_corpus_lines_random_batch_vs_python(spark, tmp_path):
    import random

    rng = random.Random(99)
    vocab = [f"w{k}" for k in range(6)]
    shared_line = " ".join(rng.choice(vocab) for _ in range(8))
    docs = []
    for i in range(60):
        n = rng.randint(0, 30)
        words = [rng.choice(vocab) for _ in range(n)]
        text = " ".join(words)
        if i % 4 == 0:  # plant the shared boilerplate line at a window start
            text = shared_line + (" " + text if text else "")
        docs.append((i, text))
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sflines")
    df.coalesce(2).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_dup_lines"], r["kept_sig"])
        for r in REGISTRY["dedup_corpus_lines"].fn(spark, sf).collect()
    }
    want = _py_corpus_lines(docs)
    assert got == want


# --- hll_register_sketch_exact -------------------------------------------------------


def test_hll_register_sketch_merge_equals_direct_and_is_accurate(spark):
    """Mergeability contract: max-merging per-group register tables must
    give the SAME registers (hence identical estimate/harmonic state) as
    sketching the raw rows directly. And the p=10 estimator should land
    within ~2x the theoretical error (1.04/sqrt(1024) ~ 3.25%) of exact."""
    rows = {
        r["scope"]: r
        for r in REGISTRY["hll_register_sketch_exact"].fn(spark, SF_DIR).collect()
    }
    merged, direct = rows["__merged__"], rows["__direct__"]
    assert merged["harmonic_scaled"] == direct["harmonic_scaled"]
    assert merged["approx_users"] == direct["approx_users"]
    assert merged["used_registers"] == direct["used_registers"]
    for scope, r in rows.items():
        exact = r["exact_users"]
        assert abs(r["approx_users"] - exact) <= max(0.07 * exact, 8.0), (
            scope,
            r["approx_users"],
            exact,
        )


def test_hll_register_partial_max_before_exchange(spark):
    """The register build must partial-aggregate (map-side MAX) before its
    exchange — at 100 TB the shuffle carries at most groups x 1024 rows'
    worth of partial registers per task, never raw events."""
    plan = _plan(spark, "hll_register_sketch_exact")
    assert "partial_max" in plan or "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_hll_linear_counting_round_is_cross_engine_stable(spark):
    """Exhaustive guard for the documented ln-rounding argument: the
    small-range correction round(1024*ln(1024/V)) has exactly 1023 possible
    inputs; assert Spark and DuckDB produce the IDENTICAL rounded value for
    every one, and that no input sits near a .5 rounding boundary (margin
    must dwarf the ~1-ulp cross-engine ln drift)."""
    import math

    import duckdb

    s_rows = dict(
        spark.range(1, 1024)
        .selectExpr(
            "id AS v",
            "round(1024.0D * ln(1024.0D / CAST(id AS DOUBLE)), 0) AS e",
        )
        .collect()
    )
    d_rows = dict(
        duckdb.sql(
            "SELECT v, round(1024.0 * ln(1024.0 / CAST(v AS DOUBLE)), 0) AS e "
            "FROM (SELECT unnest(range(1, 1024)) AS v)"
        ).fetchall()
    )
    assert s_rows == d_rows
    margin = min(
        abs((1024.0 * math.log(1024.0 / float(v)) % 1.0) - 0.5)
        for v in range(1, 1024)
    )
    assert margin > 1e-7, margin


# --- orders_kaplan_meier_fulfillment -------------------------------------------------


def test_kaplan_meier_invariants(spark):
    """S(t) must start <= 1, be non-increasing, stay in [0,1]; the risk set
    must strictly shrink; and sum(d + c) must equal the order count."""
    rows = sorted(
        REGISTRY["orders_kaplan_meier_fulfillment"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["t_weeks"],
    )
    assert rows[0]["n_at_risk"] == max(r["n_at_risk"] for r in rows)
    prev_s, prev_n = 1.0 + 1e-12, rows[0]["n_at_risk"] + 1
    for r in rows:
        assert 0.0 <= r["survival"] <= prev_s + 1e-12
        assert r["n_at_risk"] < prev_n
        prev_s, prev_n = r["survival"], r["n_at_risk"]
    from f1_lakehouse_spark.tables import load_table

    # cohort = orders with >= 1 line (an order that never shipped anything
    # has no duration to censor at); the curve must account for every one
    n_cohort = (
        load_table(spark, SF_DIR, "orders")
        .join(
            load_table(spark, SF_DIR, "lineitem").select("l_orderkey").distinct(),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "semi",
        )
        .count()
    )
    assert sum(r["d_events"] + r["c_censored"] for r in rows) == n_cohort


def test_kaplan_meier_fold_stage_is_bounded_single_row(spark):
    """Everything after the two partial-aggregated shuffles operates on ONE
    packed array row — the plan must show partial aggregation and no
    cartesian/python stages."""
    plan = _plan(spark, "orders_kaplan_meier_fulfillment")
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


# --- stats_bootstrap_ci_poisson ------------------------------------------------------


def test_bootstrap_ci_brackets_the_point_estimate(spark):
    """Each flag's 95% CI must bracket its point mean, be properly ordered,
    and be tight relative to the mean (n is large; CI half-width should be
    well under 5% of the mean for the sf0.001 lineitem)."""
    rows = REGISTRY["stats_bootstrap_ci_poisson"].fn(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["ci_lo"] < r["point_mean"] < r["ci_hi"], r
        assert (r["ci_hi"] - r["ci_lo"]) < 0.10 * r["point_mean"], r
        assert r["n_resamples"] == 64


def test_bootstrap_fanout_partial_aggregates_before_exchange(spark):
    """The B=64 fan-out must die into map-side partial sums — the exchange
    after the explode carries (group, b) partials, never the fanned rows."""
    plan = _plan(spark, "stats_bootstrap_ci_poisson")
    assert "partial" in plan.lower()
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# --- ann_matryoshka_prefix_recall ----------------------------------------------------


def test_matryoshka_recall_bounded_and_consistent(spark):
    """Every arm's hits are bounded by k and recall = n_hits/k exactly.
    (No monotonicity assertion: the synthetic embeddings are not
    MRL-trained, so a short prefix can beat a longer one by luck —
    observed 0.2 @ dim8 vs 0.1 @ dim16 at sf0.001.)"""
    rows = sorted(
        REGISTRY["ann_matryoshka_prefix_recall"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["prefix_dim"],
    )
    assert [r["prefix_dim"] for r in rows] == [8, 16, 32]
    for r in rows:
        assert 0 <= r["n_hits"] <= r["k"]
        assert abs(r["recall_at_k"] - r["n_hits"] / r["k"]) < 1e-15


def test_matryoshka_topk_uses_window_group_limit(spark):
    """Per-prefix top-k must prune partitions to |prefixes| x k rows
    before the shuffle — the corpus never sorts globally."""
    plan = _plan(spark, "ann_matryoshka_prefix_recall")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


# --- events_ewma_anomaly -------------------------------------------------------------


def test_ewma_stays_inside_value_hull_and_caps(spark):
    """Each user's EWMA is a convex combination of their values, so
    last_ewma must lie inside [min(value), max(value)]; n_events must
    respect the cap; deviations are non-negative."""
    from f1_lakehouse_spark.operators.events_analytics import EWMA_CAP
    from f1_lakehouse_spark.tables import load_table

    rows = {r["user_id"]: r for r in REGISTRY["events_ewma_anomaly"].fn(spark, SF_DIR).collect()}
    hull = {
        r["user_id"]: (r["lo"], r["hi"])
        for r in load_table(spark, SF_DIR, "events")
        .where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert rows
    for uid, r in rows.items():
        assert 1 <= r["n_events"] <= EWMA_CAP
        lo, hi = hull[uid]
        assert lo - 1e-9 <= r["last_ewma"] <= hi + 1e-9, (uid, r)
        assert r["max_abs_dev"] >= 0.0


def test_ewma_cap_prunes_before_shuffle(spark):
    """The rank-window cap must compile to WindowGroupLimit so whale users
    are pruned to EWMA_CAP rows partition-side."""
    plan = _plan(spark, "events_ewma_anomaly")
    assert "WindowGroupLimit" in plan


# --- lineitem_benford_audit ----------------------------------------------------------


def test_benford_masses_and_terms_consistent(spark):
    """Digits are 1..9, observed counts sum to the total the expectations
    were built from, expected masses sum to ~1, and each chi2 term
    recomputes from (o, e) exactly."""
    rows = sorted(
        REGISTRY["lineitem_benford_audit"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["digit"],
    )
    assert [r["digit"] for r in rows] == list(range(1, 10))
    n = sum(r["n_obs"] for r in rows)
    assert abs(sum(r["expected"] for r in rows) - n) < 1e-6 * n
    for r in rows:
        o, e = float(r["n_obs"]), r["expected"]
        assert abs(r["chi2_term"] - (o - e) ** 2 / e) < 1e-9


# --- orders_cohort_ltv ---------------------------------------------------------------


def test_cohort_ltv_monotone_and_complete(spark):
    """Within each cohort the LTV curve is non-decreasing (revenue >= 0
    per cell), every cohort has an age-0 cell, and total revenue across
    the triangle equals the rounded order total."""
    from collections import defaultdict

    from f1_lakehouse_spark.tables import load_table

    rows = REGISTRY["orders_cohort_ltv"].fn(spark, SF_DIR).collect()
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_month"]].append(r)
    for c, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_months"])
        assert rs[0]["age_months"] == 0, c
        prev = 0.0
        for r in rs:
            assert r["cum_revenue"] >= prev - 1e-6
            prev = r["cum_revenue"]
    total = sum(r["revenue"] for r in rows)
    expect = (
        load_table(spark, SF_DIR, "orders")
        .agg(F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")).cast("double"))
        .collect()[0][0]
    )
    assert abs(total - expect) < 1e-4


# --- orders_seasonal_decompose -------------------------------------------------------


def test_seasonal_decompose_edges_and_zero_mean_residuals(spark):
    """Trend exists exactly where the full 13-month window fits; the
    seasonal index makes residuals sum to ~0 within each month-of-year;
    revenue always reconstructs as trend + seasonal + residual."""
    from collections import defaultdict

    rows = sorted(
        REGISTRY["orders_seasonal_decompose"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["month_str"],
    )
    n = len(rows)
    assert n >= 13
    for i, r in enumerate(rows, start=1):
        if 7 <= i <= n - 6:
            assert r["trend"] is not None
            assert abs(r["revenue"] - (r["trend"] + r["seasonal"] + r["residual"])) < 1e-6
        else:
            assert r["trend"] is None and r["residual"] is None
    by_moy = defaultdict(list)
    for r in rows:
        if r["residual"] is not None:
            by_moy[r["month_str"][-2:]].append(r["residual"])
    for moy, res in by_moy.items():
        assert abs(sum(res)) < 1e-4 * max(1.0, max(abs(x) for x in res)), moy


# --- orders_holt_forecast ------------------------------------------------------------


def test_holt_forecast_shape_and_linearity(spark):
    """One fitted value per observed month from t=2; exactly 6 forecast
    rows whose values are collinear (constant step = final trend); the
    first forecast month follows the last observed month."""
    rows = REGISTRY["orders_holt_forecast"].fn(spark, SF_DIR).collect()
    obs = sorted(
        (r for r in rows if r["kind"] == "obs"), key=lambda r: r["month_str"]
    )
    fc = sorted(
        (r for r in rows if r["kind"] == "forecast"), key=lambda r: r["month_str"]
    )
    assert len(fc) == 6
    assert obs[0]["fitted"] is None
    assert all(r["fitted"] is not None for r in obs[1:])
    assert all(r["actual"] is None for r in fc)
    steps = [b["fitted"] - a["fitted"] for a, b in zip(fc, fc[1:])]
    assert max(steps) - min(steps) < 1e-6 * max(1.0, abs(steps[0]))
    y, m = map(int, obs[-1]["month_str"].split("-"))
    nxt = f"{y + (m == 12):04d}-{(m % 12) + 1:02d}"
    assert fc[0]["month_str"] == nxt


# --- events_viterbi_journeys ---------------------------------------------------------


def _py_viterbi(codes):
    """Independent reference decode (same literal model)."""
    from f1_lakehouse_spark.operators.events_analytics import (
        _VIT_EMIT,
        _VIT_INIT,
        _VIT_TRANS,
    )

    v = [_VIT_INIT[s] + _VIT_EMIT[s][codes[0]] for s in range(3)]
    p = [0, 1, 2]
    for x in codes[1:]:
        nv, np_ = [], []
        for sp in range(3):
            c = [v[s] + _VIT_TRANS[s][sp] for s in range(3)]
            arg = 0 if (c[0] >= c[1] and c[0] >= c[2]) else (1 if c[1] >= c[2] else 2)
            nv.append(max(c) + _VIT_EMIT[sp][x])
            np_.append(p[arg] * 3 + sp)
        v, p = nv, np_
    bi = 0 if (v[0] >= v[1] and v[0] >= v[2]) else (1 if v[1] >= v[2] else 2)
    n = len(codes)
    path = "".join("BYT"[(p[bi] // 3 ** (n - 1 - i)) % 3] for i in range(n))
    return v[bi], path


def test_viterbi_agrees_with_python_reference_for_every_user(spark):
    """Full differential vs an independently-written Python Viterbi over
    every sf0.001 user — catches any divergence in fold order, tie-breaks,
    or path decoding (this is what caught Spark's descending sequence(1,0)
    corrupting the last digit)."""
    from f1_lakehouse_spark.operators.events_analytics import VITERBI_CAP
    from f1_lakehouse_spark.tables import load_table

    got = {
        r["user_id"]: (r["best_score"], r["path"], r["n_events"])
        for r in REGISTRY["events_viterbi_journeys"].fn(spark, SF_DIR).collect()
    }
    code_map = {"view": 0, "click": 1, "signup": 2, "purchase": 3, "error": 4}
    seqs = {}
    for r in (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    ):
        seqs.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], code_map.get(r["event_type"], 4))
        )
    assert set(got) == set(seqs)
    for uid, evs in seqs.items():
        evs.sort()
        codes = [c for _, _, c in evs][:VITERBI_CAP]
        score, path = _py_viterbi(codes)
        assert got[uid] == (score, path, len(codes)), uid


# --- events_shapley_attribution ------------------------------------------------------


def test_shapley_table_efficiency_and_output_consistency(spark):
    """Shapley efficiency: per coalition, channel credits must sum to the
    coalition worth (within integer-PPM rounding); and the query's total
    attributed conversions must equal the sum over users of their
    coalition worth."""
    from fractions import Fraction as Fr

    from f1_lakehouse_spark.operators.events_analytics import (
        SHAPLEY_PPM,
        _SHAP_CHANNELS,
        _SHAP_P,
    )

    p = {c: Fr(*_SHAP_P[c]) for c in _SHAP_CHANNELS}

    def worth(mask):
        out = Fr(1)
        for i, c in enumerate(_SHAP_CHANNELS):
            if mask >> i & 1:
                out *= 1 - p[c]
        return 1 - out

    for mask in range(1, 16):
        total = sum(
            ppm for (m, _), ppm in SHAPLEY_PPM.items() if m == mask
        )
        assert abs(total - worth(mask) * 1_000_000) <= 4, mask

    rows = REGISTRY["events_shapley_attribution"].fn(spark, SF_DIR).collect()
    assert {r["channel"] for r in rows} <= set(_SHAP_CHANNELS)
    for r in rows:
        assert r["n_touched_users"] > 0
        assert 0 < r["total_credit_ppm"] <= r["n_touched_users"] * 1_000_000


# --- ann_reciprocal_rank_fusion ------------------------------------------------------


def test_rrf_scores_and_rank_consistency(spark):
    """RRF scores must recompute exactly from the emitted ranks; a doc in
    both pools must outrank one with the same single-arm rank only."""
    rows = REGISTRY["ann_reciprocal_rank_fusion"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        expect = 0.0
        if r["cos_rank"] is not None:
            expect += 1.0 / (60 + r["cos_rank"])
        if r["dot_rank"] is not None:
            expect += 1.0 / (60 + r["dot_rank"])
        assert abs(r["rrf_score"] - expect) < 1e-15, r
        assert r["cos_rank"] is not None or r["dot_rank"] is not None


def test_rrf_arms_use_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "ann_reciprocal_rank_fusion")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


# --- part_abc_xyz_matrix -------------------------------------------------------------


def test_abc_xyz_matrix_partitions_all_parts(spark):
    """The 3x3 matrix must partition the sold-part universe exactly: cell
    counts sum to |distinct sold parts| and classes stay in range."""
    from f1_lakehouse_spark.tables import load_table

    rows = REGISTRY["part_abc_xyz_matrix"].fn(spark, SF_DIR).collect()
    assert all(r["abc_class"] in "ABC" and r["xyz_class"] in "XYZ" for r in rows)
    n_parts = (
        load_table(spark, SF_DIR, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert all(r["revenue"] > 0 for r in rows)


# --- orders_haar_wavelet -------------------------------------------------------------


def test_haar_counts_and_total_conservation(spark):
    """Level k must emit 2^(6-k) detail coefficients; the single approx
    coefficient must equal the exact integer-cents total of the analyzed
    window (the transform conserves the sum)."""
    from f1_lakehouse_spark.tables import load_table

    rows = REGISTRY["orders_haar_wavelet"].fn(spark, SF_DIR).collect()
    by_level = {}
    approx = None
    for r in rows:
        if r["kind"] == "approx":
            approx = r["coeff"]
        else:
            by_level.setdefault(r["level"], []).append(r)
    for k in range(1, 7):
        assert len(by_level[k]) == 1 << (6 - k), k
    monthly = (
        load_table(spark, SF_DIR, "orders")
        .select(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
            (F.round("o_totalprice", 2).cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("c"),
        )
        .groupBy("ym")
        .agg(F.sum("c").alias("cents"))
        .orderBy(F.col("ym").desc())
        .limit(64)
        .agg(F.sum("cents"))
        .collect()[0][0]
    )
    assert approx == monthly


# --- events_markov_absorption --------------------------------------------------------


def test_markov_absorption_rows_sum_to_one_and_match_float_solve(spark):
    """Each transient state's absorption probabilities must sum to ~1
    (ppm floors lose < 1e-5), lie in [0,1], and agree with an
    independent float linear solve of the same ppm matrix."""
    rows = REGISTRY["events_markov_absorption"].fn(spark, SF_DIR).collect()
    assert len(rows) == 9
    by_from = {}
    for r in rows:
        assert 0.0 <= r["absorb_prob"] <= 1.0, r
        assert r["det"] > 0
        by_from.setdefault(r["from_state"], {})[r["absorbing_state"]] = r
    for f, cells in by_from.items():
        s = sum(r["absorb_prob"] for r in cells.values())
        assert abs(s - 1.0) < 1e-5, (f, s)
    # independent check: rebuild Q,R in floats from the emitted num/det is
    # circular, so re-derive B from the exact (num, det) rationals vs the
    # float division the query performed
    for r in rows:
        assert abs(r["absorb_prob"] - r["num"] / r["det"]) < 1e-15


# --- text_rouge_l_candidates ---------------------------------------------------------


def test_rouge_l_agrees_with_python_lcs(spark):
    """Differential vs an independent O(nm) Python LCS over every
    candidate pair at sf0.001 — catches any divergence in the nested-fold
    DP or the tokenization cap."""
    from f1_lakehouse_spark.pipeline.text import ROUGE_CAP
    from f1_lakehouse_spark.tables import load_table

    rows = REGISTRY["text_rouge_l_candidates"].fn(spark, SF_DIR).collect()
    assert rows, "expect candidate pairs at sf0.001"
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }

    def toks(t):
        return [w for w in t.lower().split() if w][:ROUGE_CAP]

    def lcs(a, b):
        prev = [0] * (len(b) + 1)
        for x in a:
            cur = [0]
            for j, y in enumerate(b, start=1):
                cur.append(max(prev[j], cur[j - 1], prev[j - 1] + (x == y)))
            prev = cur
        return prev[-1]

    for r in rows:
        a, b = toks(texts[r["doc_a"]]), toks(texts[r["doc_b"]])
        want = lcs(a, b)
        assert (r["n_a"], r["n_b"], r["lcs_len"]) == (len(a), len(b), want), r
        assert abs(r["rouge_l_f1"] - 2 * want / (len(a) + len(b))) < 1e-15
        assert 0 <= r["rouge_l_f1"] <= 1.0


# --- stats_jackknife_variance --------------------------------------------------------


def test_jackknife_se_agrees_with_classical_formula(spark):
    """The delete-one-bucket jackknife SE should approximate the classical
    s/sqrt(n) of the same column (within 3x either way on this data), and
    point_mean must equal the exact decimal mean."""
    import math

    from f1_lakehouse_spark.tables import load_table

    r = REGISTRY["stats_jackknife_variance"].fn(spark, SF_DIR).collect()[0]
    li = load_table(spark, SF_DIR, "lineitem")
    stats = li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).alias("s"),
        F.count("*").alias("n"),
        F.stddev_samp("l_extendedprice").alias("sd"),
    ).collect()[0]
    assert r["n"] == stats["n"] and r["n_buckets"] == 32
    assert abs(r["point_mean"] - float(stats["s"]) / stats["n"]) < 1e-6
    classical = stats["sd"] / math.sqrt(stats["n"])
    assert classical / 3 < r["jackknife_se"] < classical * 3, (
        r["jackknife_se"],
        classical,
    )


def test_shapley_masks_build_in_one_user_shuffle(spark):
    """First-purchase time comes from an unordered window over the SAME
    user_id partitioning the mask aggregate needs: exactly two exchanges
    total (user_id + the 4-group final), no join back."""
    plan = _plan(spark, "events_shapley_attribution")
    assert plan.count("Exchange hashpartitioning") == 2, plan[:1500]
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


# --- filtering_bias_audit ------------------------------------------------------------


def test_bias_audit_rates_and_flags_consistent(spark):
    """Keep rates recompute from counts; flags fire exactly per the
    four-fifths thresholds; language doc counts partition the corpus."""
    from f1_lakehouse_spark.tables import load_table

    rows = REGISTRY["filtering_bias_audit"].fn(spark, SF_DIR).collect()
    assert rows
    nd = sum(r["n_docs"] for r in rows)
    nk = sum(r["n_kept"] for r in rows)
    assert nd == load_table(spark, SF_DIR, "documents").count()
    overall = nk / nd
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert abs(r["keep_rate"] - r["n_kept"] / r["n_docs"]) < 1e-15
        disp = (r["n_kept"] / r["n_docs"]) / overall
        assert abs(r["disparity"] - disp) < 1e-12
        assert r["four_fifths_flag"] == (1 if (disp < 0.8 or disp > 1.25) else 0)


# --- scoring_conformal_interval ------------------------------------------------------


def test_conformal_coverage_meets_the_guarantee(spark):
    """Split-conformal marginal coverage must be >= ~90% (the theorem
    guarantees >= target on average; allow finite-sample slack down to
    85% at sf0.001), with a positive radius and consistent counts."""
    r = REGISTRY["scoring_conformal_interval"].fn(spark, SF_DIR).collect()[0]
    assert r["radius"] > 0
    assert r["n_calib"] > 50 and r["n_test"] > 50
    assert 0 <= r["n_covered"] <= r["n_test"]
    assert r["coverage"] >= 0.85, r["coverage"]
    assert abs(r["coverage"] - r["n_covered"] / r["n_test"]) < 1e-15


# --- scoring_auc_mann_whitney --------------------------------------------------------


def test_auc_matches_python_rank_computation(spark):
    """Exact AUC must equal an independent pairwise/rank computation over
    the same (score, label) pairs at sf0.001."""
    r = REGISTRY["scoring_auc_mann_whitney"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["auc"] <= 1.0
    scores = {
        row["doc_id"]: row["score_sum"]
        for row in REGISTRY["scoring_hashed_linear_quality"].fn(spark, SF_DIR).collect()
    }
    labels = {
        row["doc_id"]: row["passes_repetition"]
        for row in REGISTRY["quality_gopher_repetition"].fn(spark, SF_DIR).collect()
    }
    pos = [scores[d] for d in scores if d in labels and labels[d] == 1]
    neg = [scores[d] for d in scores if d in labels and labels[d] == 0]
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    u2 = 0
    for p in pos:
        for q in neg:
            u2 += 2 if p > q else (1 if p == q else 0)
    assert abs(r["auc"] - u2 / (2 * len(pos) * len(neg))) < 1e-12


# --- orders_holt_backtest ------------------------------------------------------------


def test_holt_backtest_counts_and_skill_recompute(spark):
    r = REGISTRY["orders_holt_backtest"].fn(spark, SF_DIR).collect()[0]
    assert r["n_eval"] == r["n_months"] - 13
    assert r["mae_model"] > 0 and r["mae_snaive"] > 0
    assert abs(r["skill_vs_snaive"] - (1.0 - r["mae_model"] / r["mae_snaive"])) < 1e-12


# --- curation_neyman_allocation ------------------------------------------------------


def test_neyman_allocation_sums_to_budget_and_orders_by_weight(spark):
    """Largest-remainder apportionment must hand out EXACTLY the budget;
    weights recompute from exact moments; allocation is monotone in
    weight up to the +/-1 remainder seat."""
    import math

    from f1_lakehouse_spark.pipeline.curation import NEYMAN_BUDGET
    from f1_lakehouse_spark.tables import load_table

    rows = REGISTRY["curation_neyman_allocation"].fn(spark, SF_DIR).collect()
    assert sum(r["alloc"] for r in rows) == NEYMAN_BUDGET
    moments = {
        r["source"]: (r["n"], r["s1"], r["s2"])
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("s1"),
            F.sum(F.col("n_chars") * F.col("n_chars")).alias("s2"),
        )
        .collect()
    }
    for r in rows:
        n, s1, s2 = moments[r["source"]]
        assert abs(r["neyman_weight"] - math.sqrt(n * s2 - s1 * s1)) < 1e-9
    by_w = sorted(rows, key=lambda r: -r["neyman_weight"])
    for a, b in zip(by_w, by_w[1:]):
        assert a["alloc"] >= b["alloc"] - 1, (a, b)


# --- events_binary_segmentation ------------------------------------------------------


def test_binary_segmentation_nests_and_dominates(spark):
    """Level-2 changepoints must lie strictly inside their parent
    segments (left child ends at k1, right child starts at k1+1), with
    nonnegative integer CUSUM stats."""
    rows = REGISTRY["events_binary_segmentation"].fn(spark, SF_DIR).collect()
    top = [r for r in rows if r["level"] == 1]
    assert len(top) == 1
    k1, s1 = top[0]["change_idx"], top[0]["cusum_stat"]
    assert top[0]["seg_lo"] <= k1 < top[0]["seg_hi"]
    for r in rows:
        if r["level"] == 2:
            assert r["seg_lo"] <= r["change_idx"] < r["seg_hi"]
            assert (r["seg_hi"] <= k1) or (r["seg_lo"] == k1 + 1)
            assert r["cusum_stat"] >= 0


# --- events_ab_srm_guard -------------------------------------------------------------


def test_srm_guard_chi2_recomputes_and_hash_split_is_clean(spark):
    """chi2 must recompute from the counts; the md5-salted 50/50 split
    should NOT trigger SRM on honest data (that's the point of the
    guard — it fires on broken assignment, not on hash noise)."""
    r = REGISTRY["events_ab_srm_guard"].fn(spark, SF_DIR).collect()[0]
    na, nb = r["n_a"], r["n_b"]
    exp = (na + nb) / 2.0
    want = (na - exp) ** 2 / exp + (nb - exp) ** 2 / exp
    assert abs(r["chi2"] - want) < 1e-12
    assert r["srm_flag"] == (1 if want > 3.841458820694124 else 0)
    assert r["srm_flag"] == 0, (na, nb)


# --- supplier_revenue_gini -----------------------------------------------------------


def test_gini_matches_python_and_is_in_range(spark):
    """Gini must lie in [0, 1) and equal an independent sorted-rank
    Python computation on the same revenues."""
    from f1_lakehouse_spark.tables import load_table

    r = REGISTRY["supplier_revenue_gini"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["gini"] < 1.0
    revs = sorted(
        (float(row["r"]), row["l_suppkey"])
        for row in load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(27,6)"
                )
            ).alias("r")
        )
        .collect()
    )
    n = len(revs)
    t = sum(x for x, _ in revs)
    s1 = sum((i + 1) * x for i, (x, _) in enumerate(revs))
    want = 2.0 * s1 / (n * t) - (n + 1) / n
    assert abs(r["gini"] - want) < 1e-9
    assert r["n_suppliers"] == n


# --- text_rake_keyphrases ------------------------------------------------------------


def test_rake_matches_python_reference(spark):
    """Differential vs an independent Python RAKE over sf0.001: same
    segmentation, same degree/frequency scores, same top list."""
    from collections import defaultdict

    from f1_lakehouse_spark.pipeline.text import (
        RAKE_MAX_WORDS,
        RAKE_TOP,
        _STOPWORDS,
    )
    from f1_lakehouse_spark.tables import load_table

    rows = REGISTRY["text_rake_keyphrases"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= RAKE_TOP

    phrases = []
    for r in load_table(spark, SF_DIR, "documents").collect():
        if r["text"] is None:
            continue
        cur = []
        for w in [w for w in r["text"].lower().split(" ") if w]:
            if w in _STOPWORDS:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
    phrases = [p for p in phrases if len(p) <= RAKE_MAX_WORDS]
    freq, deg = defaultdict(int), defaultdict(int)
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    n_occ = defaultdict(int)
    for p in phrases:
        n_occ[" ".join(p)] += 1
    scored = {
        ph: sum(deg[w] / freq[w] for w in ph.split(" ")) for ph in n_occ
    }
    top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:RAKE_TOP]
    got = [(r["phrase"], r["n_occ"], round(r["rake_score"], 9)) for r in rows]
    want = [(ph, n_occ[ph], round(s, 9)) for ph, s in top]
    assert got == want


# --- scoring_decile_lift -------------------------------------------------------------


def test_decile_lift_partitions_and_gains_monotone(spark):
    """Ten deciles of near-equal size partitioning all docs; cumulative
    gains strictly increase to 1.0; lift recomputes from rates."""
    rows = sorted(
        REGISTRY["scoring_decile_lift"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    n = sum(sizes)
    npos = sum(r["n_pos"] for r in rows)
    base = npos / n
    prev = 0.0
    for r in rows:
        assert abs(r["pos_rate"] - r["n_pos"] / r["n_docs"]) < 1e-15
        assert abs(r["lift"] - r["pos_rate"] / base) < 1e-12
        assert r["cum_gain"] >= prev
        prev = r["cum_gain"]
    assert abs(rows[-1]["cum_gain"] - 1.0) < 1e-12


# --- lineitem_unit_value_index -------------------------------------------------------


def test_unit_value_index_chains_and_telescopes(spark):
    """Base month indexes at exactly 100; the chained product telescopes
    to 100 * p_i / p_1 within float tolerance; links recompute."""
    rows = sorted(
        REGISTRY["lineitem_unit_value_index"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["month_str"],
    )
    assert rows[0]["chained_index"] == 100.0
    p1 = rows[0]["unit_value"]
    prev_p = None
    for r in rows:
        if prev_p is not None:
            assert abs(r["link_ratio"] - r["unit_value"] / prev_p) < 1e-12
        tele = 100.0 * r["unit_value"] / p1
        assert abs(r["chained_index"] - tele) < 1e-6 * tele
        prev_p = r["unit_value"]
