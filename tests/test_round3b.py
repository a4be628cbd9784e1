"""Invariant tests for the round-3 second-batch operators — properties the
DuckDB differential can't express (the differential itself is covered by
test_operators.py picking every registered query up automatically)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from f1_lakehouse_spark.operators.extensions import RFM_K, _ntile_from_rank
from f1_lakehouse_spark.registry import REGISTRY, _ensure_loaded
from f1_lakehouse_spark.tables import load_table
from tests.conftest import SF_DIR

_ensure_loaded()


def _py_ntile(rank: int, n: int, k: int) -> int:
    """Reference NTILE semantics: first n%k buckets hold ceil(n/k) rows."""
    base, rem = n // k, n % k
    cut = rem * (base + 1)
    if rank <= cut:
        return (rank - 1) // (base + 1) + 1
    return rem + (rank - cut - 1) // max(base, 1) + 1


@given(n=st.integers(min_value=1, max_value=5000), k=st.integers(min_value=1, max_value=10))
@settings(max_examples=200, deadline=None)
def test_ntile_formula_partitions_correctly(n: int, k: int):
    """The closed-form bucket assignment must produce exactly NTILE's
    bucket sizes: first n%k buckets ceil(n/k), rest floor(n/k), monotone
    non-decreasing in rank."""
    buckets = [_py_ntile(i, n, k) for i in range(1, n + 1)]
    assert buckets == sorted(buckets)
    sizes = [buckets.count(b) for b in range(1, min(k, n) + 1)]
    base, rem = n // k, n % k
    expected = [base + 1] * rem + [base] * (k - rem)
    expected = [s for s in expected if s > 0]
    assert sizes == expected


def test_ntile_spark_formula_matches_python(spark):
    """The Column expression mirrors the python reference over a grid that
    crosses every branch (rank<=cut, rank>cut, base=0)."""
    from pyspark.sql import functions as F

    cases = [(n, k) for n in (1, 4, 5, 7, 100, 101) for k in (1, 3, 5)]
    for n, k in cases:
        df = spark.range(1, n + 1).select(
            F.col("id").alias("rank"),
            _ntile_from_rank(F.col("id"), n, k).alias("bucket"),
        )
        got = {r["rank"]: r["bucket"] for r in df.collect()}
        want = {i: _py_ntile(i, n, k) for i in range(1, n + 1)}
        assert got == want, (n, k)


def test_dsir_target_language_scores_highest(spark):
    """DSIR importance weights must rank the target domain (en) above the
    per-language average of every other language — the scoring is trained
    to prefer target-like text, so this is the semantic smoke test."""
    out = REGISTRY["dsir_importance_weights"].fn(spark, SF_DIR).collect()
    by_lang: dict[str, list[int]] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["score_bits"])
    means = {lang: sum(v) / len(v) for lang, v in by_lang.items() if v}
    assert "en" in means
    for lang, m in means.items():
        if lang != "en":
            assert means["en"] > m, (lang, means)


def test_kcenter_min_dist_monotone_nonincreasing(spark):
    """Greedy farthest-point picks: each later pick's min-distance can't
    exceed an earlier one's (the covered radius shrinks), and picks are
    distinct."""
    rows = sorted(
        REGISTRY["curation_kcenter_diversity"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["pick_order"],
    )
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == len(ids)
    dists = [r["min_dist"] for r in rows[1:]]  # pick 0 is the seed (0.0)
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists


def test_regression_r2_in_unit_interval(spark):
    out = REGISTRY["regression_nation_trend"].fn(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert 0.0 <= r["r2"] <= 1.0 + 1e-9, r
        assert r["n"] >= 2


def test_decay_score_bounded_by_recent_total(spark):
    """Decayed score <= plain sum of values (weights <= 1), and > 0 when a
    user has any positive-value event on the anchor day."""
    from pyspark.sql import functions as F

    from f1_lakehouse_spark.tables import load_table

    out = {
        r["user_id"]: r["decayed_score"]
        for r in REGISTRY["events_time_decay_engagement"].fn(spark, SF_DIR).collect()
    }
    totals = {
        r["user_id"]: r["tot"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("tot"))
        .collect()
    }
    assert set(out) == set(totals)
    for uid, score in out.items():
        assert score <= totals[uid] + 1e-6, uid


def test_mahalanobis_scores_positive_and_sorted(spark):
    rows = REGISTRY["embedding_mahalanobis_outliers"].fn(spark, SF_DIR).collect()
    scores = [r["maha_sq"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_ivf_pq_subset_of_probed_cell(spark):
    """Every IVF-PQ result must come from ONE cell (the probed one)."""
    rows = REGISTRY["ann_ivf_pq"].fn(spark, SF_DIR).collect()
    assert rows
    assert len({r["label"] for r in rows}) == 1


def test_top2_pc_orthogonal_to_top_pc(spark):
    """Deflation must yield a direction ~orthogonal to the learned top PC
    (2 iterations: not converged, but the v1 component is projected out —
    tolerance reflects the fixed iteration count)."""
    top = {
        r["dim"]: r["loading"]
        for r in REGISTRY["embedding_top_pc_power_iter"].fn(spark, SF_DIR).collect()
    }
    second = {
        r["dim"]: r["loading2"]
        for r in REGISTRY["embedding_top2_pc_deflation"].fn(spark, SF_DIR).collect()
    }
    dot = sum(top[d] * second[d] for d in top)
    assert abs(dot) < 1e-6, dot  # orthogonal by construction (round-9 loadings)
    n2 = sum(x * x for x in second.values())
    assert abs(n2 - 1.0) < 1e-6


def test_band_curve_monotone_in_bands(spark):
    """More, narrower bands can only ADD candidate pairs (a pair colliding
    on a wide band also collides on one of its sub-bands? — not in general,
    but candidates must be monotone in the banding threshold: 8x2 is the
    loosest, 2x8 the strictest; verified counts are subsets of candidates)."""
    rows = {
        r["cfg"]: r
        for r in REGISTRY["dedup_minhash_band_curve"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {"b2r8", "b4r4", "b8r2"}
    for r in rows.values():
        assert r["n_verified"] <= r["n_candidates"]
        assert 0.0 <= r["precision_est"] <= 1.0
    # recall ordering: the loose config can't find fewer TRUE pairs than
    # the strict one (every 8-row band match implies both 2-row halves and
    # all four 2-row quarters match)
    assert rows["b8r2"]["n_verified"] >= rows["b4r4"]["n_verified"]
    assert rows["b4r4"]["n_verified"] >= rows["b2r8"]["n_verified"]


def test_nprobe_sweep_monotone(spark):
    rows = sorted(
        REGISTRY["ann_ivf_nprobe_sweep"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["nprobe"],
    )
    scanned = [r["n_scanned"] for r in rows]
    hits = [r["n_hit"] for r in rows]
    assert scanned == sorted(scanned)  # more probes scan more
    assert hits == sorted(hits)  # probed cells are nested => recall monotone
    assert all(0 <= h <= 10 for h in hits)


def test_cdc_chunks_reassemble_byte_totals(spark):
    """Distinct bytes <= total bytes; total chunk bytes must equal the
    corpus bytes of the chunked docs (chunking is a partition, not a
    sample)."""
    from pyspark.sql import functions as F

    from f1_lakehouse_spark.pipeline.multimodal import CDC_W
    from f1_lakehouse_spark.tables import load_table

    row = REGISTRY["mm_payload_cdc_chunks"].fn(spark, SF_DIR).collect()[0]
    assert row["distinct_chunks"] <= row["total_chunks"]
    assert row["distinct_bytes"] <= row["total_bytes"]
    corpus_bytes = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") >= CDC_W))
        .agg(F.sum(F.length("text")))
        .collect()[0][0]
    )
    assert row["total_bytes"] == corpus_bytes


def test_chi2_nonnegative(spark):
    rows = REGISTRY["text_source_drift_chi2"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["chi2"] >= 0.0


def test_oversample_majority_lang_single_copy(spark):
    """The majority language must get factor 1 (no replication); every
    factor >= 1; copy ids run 1..n_copies."""
    rows = REGISTRY["curation_minority_oversample"].fn(spark, SF_DIR).collect()
    by_lang: dict[str, set[int]] = {}
    for r in rows:
        assert r["n_copies"] >= 1
        assert 1 <= r["copy_id"] <= r["n_copies"]
        by_lang.setdefault(r["lang"], set()).add(r["n_copies"])
    assert all(len(v) == 1 for v in by_lang.values())  # factor is per-lang
    assert min(min(v) for v in by_lang.values()) == 1  # majority unreplicated


def test_cluster_safe_split_no_straddle(spark):
    """A near-dup cluster must land entirely inside one split — the
    leakage-safety property the operator exists for — and every document
    must be assigned exactly once."""
    from pyspark.sql import functions as F  # noqa: F401

    rows = REGISTRY["curation_cluster_safe_split"].fn(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert len(rows) == n_docs
    splits_per_cluster: dict[int, set[str]] = {}
    for r in rows:
        splits_per_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(v) == 1 for v in splits_per_cluster.values())
    # multi-doc clusters exist at this SF (otherwise the test is vacuous)
    from collections import Counter

    sizes = Counter(r["cluster_id"] for r in rows)
    assert max(sizes.values()) >= 2


def test_intradoc_span_dedup_bounds(spark):
    """Removed tokens are bounded by total tokens; a doc with zero dup
    spans removes zero tokens and its clean_sig equals the md5 prefix of
    the original text."""
    import hashlib

    from pyspark.sql import functions as F

    out = {
        r["doc_id"]: r
        for r in REGISTRY["text_intradoc_span_dedup"].fn(spark, SF_DIR).collect()
    }
    docs = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
        .collect()
    )
    assert len(out) == len(docs)
    checked_clean = 0
    for d in docs:
        r = out[d["doc_id"]]
        assert 0 <= r["n_tokens_removed"] <= r["n_tokens"]
        if r["n_dup_spans"] == 0:
            assert r["n_tokens_removed"] == 0
            assert (
                r["clean_sig"]
                == hashlib.md5(d["text"].encode()).hexdigest()[:12]
            )
            checked_clean += 1
    assert checked_clean >= 1
