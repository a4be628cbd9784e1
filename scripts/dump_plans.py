"""Regenerate docs/PLANS.md: the formatted physical plan of each headline
query, so plan quality (pushdown, broadcast, partial agg, single-shuffle
windows) is reviewable without running anything.

Usage: python scripts/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from f1_lakehouse_spark.registry import REGISTRY, _ensure_loaded
from f1_lakehouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# query -> the scale property its plan must exhibit
SHOWCASE: dict[str, str] = {
    "q1_pricing_summary": "Filter pushed to the parquet scan (PushedFilters), "
    "7-column pruned ReadSchema, map-side partial_sum, exactly one Exchange.",
    "flagship_supplier_summary": "Window and aggregate FUSED on one 4-key "
    "shuffle (r11): single lineitem scan, single Exchange, no join — the "
    "personal-best count folds into the same aggregate.",
    "join_star_broadcast": "Every dimension broadcast — the 100 TB fact "
    "table is never shuffled for enrichment.",
    "o3_topk_cheapest_lines": "Global top-k compiles to "
    "TakeOrderedAndProject — no full sort, no single-partition collapse.",
    "join_interval_overlap_bucketed": "Non-equi overlap join decomposed to "
    "an equi SortMergeJoin on (custkey, bucket); no nested-loop anywhere.",
    "skew_salted_join": "Join key extended with _salt: hot keys spread "
    "over 8 reducers before the final combine.",
    "dedup_minhash_lsh": "16 minhashes in ONE hash-aggregate, banded "
    "self-join confined to (band, band_hash) buckets.",
    "dedup_incremental_minhash": "New-batch bands BROADCAST against the "
    "corpus band index (BroadcastHashJoin); corpus side never shuffles "
    "for candidate generation.",
    "graph_pagerank_suppliers": "3 Pregel-shaped iterations over a cached "
    "edge frame (InMemoryTableScan), int64 fixed-point ranks.",
    "text_lm_surprisal": "Trigram model + totals broadcast; one doc_id "
    "shuffle for the per-doc sum.",
    "text_chunk_sliding": "Map-only: explode + substr, zero Exchanges.",
    "ann_pq_codes": "Encoding is map-only against literal codebooks after "
    "driver-held training on tiny per-subspace means.",
    "w_sessionize_events": "Sessionization = one shuffle on user_id; gaps "
    "via lag window, session ids via running sum over the same partitioning.",
    "w_topk_per_group_limit": "Rank filter compiles to partial+final "
    "WindowGroupLimit: per-group top-k pruned map-side before the exchange.",
    "dedup_jaccard_prefix_filter": "Only the rare prefix shingles enter the "
    "candidate index; verify is doc_id-keyed equi-joins on full sets.",
    "dedup_sorted_neighborhood": "One exchange (block hash + in-partition "
    "sort), zero joins: neighbor compare via window leads.",
    "bloom_prefilter_stats": "Fixed-size bit_or sketch, partial-agg folded; "
    "membership probe is a BroadcastHashJoin on word index.",
    "skyline_price_size": "Two-phase frontier: salted local cummin windows, "
    "tiny global pass, frontier broadcast back.",
    "ann_hard_negatives": "Anchors broadcast over the corpus; per-anchor "
    "top-k via WindowGroupLimit.",
    "pareto_abc_parts": "Global cumulative share via two-phase prefix sum: "
    "range repartition + pid-keyed windows + broadcast driver offsets — "
    "no single-partition global window.",
    "ann_range_search": "Threshold retrieval: broadcast nested-loop of the "
    "1-row query, zero corpus shuffle.",
    "events_rolling_distinct_users": "Sliding DISTINCT via bounded "
    "covering-window fan-out after (user, day) dedup.",
    "embedding_top_pc_power_iter": "Matrix-free power iteration: per-dim "
    "scaled-int partial sums, model-sized driver hop per iteration.",
    "orders_rfm_segmentation": "Three exact NTILE(5) scores with zero "
    "single-partition windows: distributed prefix-sum ranks (range "
    "repartition + pid windows) through the closed-form bucket formula.",
    "dsir_importance_weights": "Both hashed-n-gram count models broadcast "
    "(bucket-sized); the corpus never shuffles for the model lookup.",
    "ann_ivf_pq": "IVF cell prune (1-row broadcast filter) + PQ ADC "
    "scoring as literal lookup CASEs over the probed cell, TakeOrdered "
    "top-k — the FAISS IndexIVFPQ shape.",
    "embedding_mahalanobis_outliers": "Per-dim stats broadcast (DIM rows); "
    "decimal-accumulated z-squared sums; TakeOrdered outliers.",
    "join_asof_tolerance": "Union + carry-forward as-of: exactly one "
    "exchange, no join operator; tolerance guard in integer microseconds.",
    # round 4
    "dedup_corpus_lines": "Line-stage dedup: only 48-bit hashes cross "
    "exchanges (text never re-shuffles); count + mark-back co-partitioned "
    "on the hash key; no broadcast of the corpus-sized dup set.",
    "scoring_hashed_linear_quality": "Entire classifier is one map-side "
    "integer fold per doc: zero Exchanges over the scan.",
    "curation_doremi_reweight": "Coupled fixed-point rounds over the "
    "persisted |domains|-row model frame — corpus scanned once "
    "(InMemoryTableScan in every round), 1-row totals broadcast.",
    "ann_batch_query_topk": "Q queries in ONE corpus pass: query batch "
    "broadcast (BroadcastNestedLoopJoin), per-query top-k through "
    "WindowGroupLimit — partitions emit Q*k rows, not Q*N.",
    "graph_triangle_count": "Wedges never cross an exchange: both probe "
    "sides broadcast, role explode + partial_count pipeline inside one "
    "map stage; the only shuffle is one row per vertex.",
    "mm_phash_hadamard_neardup": "Integer Walsh-Hadamard butterfly (6 "
    "materialized projections) inside the scan stage; candidates via "
    "BroadcastHashJoin on 21-bit band buckets; no CartesianProduct.",
    "lineitem_fisher_price_index": "Top-100 basket broadcast into the "
    "relational month-pair self-join; per-month sums fold over "
    "partkey-sorted arrays (the only row-scale stage is the cell build).",
    "part_bom_subtree_rollup": "Recursion as a level-synchronous loop: "
    "one parent-keyed partial-agg shuffle per digit level over the "
    "CURRENT level only — the WITH RECURSIVE closure is never "
    "materialized.",
    "hll_register_sketch_exact": "From-scratch HLL: register build "
    "partial-MAXes map-side before its exchange; rollups read register "
    "tables (groups x 1024 rows), never raw events.",
    "events_viterbi_journeys": "Viterbi DP as a fold: WindowGroupLimit "
    "caps users partition-side; state is six int64s per user; no "
    "exchange after the single user_id shuffle.",
    "stats_bootstrap_ci_poisson": "Poisson bootstrap: B=64 fan-out dies "
    "into map-side partial sums — the exchange carries (group, b) "
    "partials, never fanned rows.",
    "events_markov_absorption": "Integer adjugate linear solve: two "
    "windows share one user_id shuffle; the algebra runs on a "
    "single-row 18-column aggregate.",
    "scoring_conformal_interval": "Conformal radius via the two-phase "
    "prefix sum: range repartition + pid offsets — the k-th order "
    "statistic without a global sort.",
    "f1_driver_session_summary": "The reference gold model over the mapped "
    "driver tables: window + aggregates share one 7-key shuffle, "
    "personal-best side broadcast back (flagship shape).",
    # round 6
    "events_ks_two_sample": "Integer-exact two-sample KS: per-value signed "
    "cells partial-agg map-side; the running statistic is ONE "
    "range-repartitioned prefix sum (pid windows + driver offsets), "
    "never a single-partition window.",
    "orders_quantile_sketch_contract": "Mergeable fixed-width histogram "
    "(<= 4096 cells at any row count, partial-agg map-side) + one "
    "prefix-rank pass for the exact audit quantiles.",
    "nation_grouped_quantile_sketch": "Per-nation sketches with GLOBAL bin "
    "edges (mergeable under any regrouping); cumulative and exact-rank "
    "windows partition by nation — group-bounded, never global.",
    "scoring_propensity_nn_att": "1-D nearest matching as two exclusive "
    "prefix-max passes over the score-ordered stream; rep attach is a "
    "score-keyed equi-join — no quadratic pair set.",
    "events_permutation_test": "B=128 hash relabelings explode over "
    "USER-level aggregates and die into map-side partials — the exchange "
    "carries 2B cells, never fanned rows.",
    "supplier_eb_rate_shrinkage": "Posterior is a per-row double tree over "
    "exact counts (1-row pooled broadcast); top movers via "
    "TakeOrderedAndProject.",
    # round 10 — keep LAST: the lazy override leaves the broadcast
    # threshold disabled and its external tables registered for the rest
    # of the process (see _bucketed_join_frame)
    "bucketed_join_roundtrip": "Co-located bucketed join (r9 headline "
    "capability): both fact tables pre-bucketed on the join key — the "
    "SortMergeJoin has NO Exchange on either input; at 100 TB the "
    "per-query shuffle of two fact tables is pre-paid once by the "
    "bucketed write (plan property CI-gated by "
    "tests/test_plans.py::test_bucketed_join_eliminates_shuffle and "
    "asserted inside the registered round-trip).",
}


# ops that materialize via collect() internally: dump the LAZY frame the
# plan property actually lives in (the registered fn would show only an
# ExistingRDD scan)
def _fisher_frame(spark, sf_dir):
    from f1_lakehouse_spark.operators.round5_stats import _fisher_lazy

    cells, out = _fisher_lazy(spark, sf_dir)
    return out


def _phash_frame(spark, sf_dir):
    from f1_lakehouse_spark.pipeline.multimodal import _phash_candidates_lazy

    ph, out = _phash_candidates_lazy(spark, sf_dir)
    return out


def _bucketed_join_frame(spark, sf_dir):
    """bucketed_join_roundtrip's certified join, reconstructed LAZILY for
    the plan dump (the registered query pins its result, so its own plan
    is an ExistingRDD). Leaves the two external tables registered and the
    broadcast threshold disabled for the remainder of the process — this
    override must stay the LAST showcase entry."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from f1_lakehouse_spark.sources.parquet_io import write_bucketed_table
    from f1_lakehouse_spark.tables import load_table

    base = tempfile.mkdtemp(prefix="f1ls_dumpplans_bucketed_")
    token = os.path.basename(base).rsplit("_", 1)[-1].lower()
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    t_o, t_l = f"f1ls_plans_orders_{token}", f"f1ls_plans_lineitem_{token}"
    write_bucketed_table(orders, t_o, os.path.join(base, "orders"), "o_orderkey", 8)
    write_bucketed_table(
        lineitem, t_l, os.path.join(base, "lineitem"), "l_orderkey", 8
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    o, li = spark.table(t_o), spark.table(t_l)
    joined = o.join(li, o["o_orderkey"] == li["l_orderkey"])
    rev = F.col("l_extendedprice").cast("decimal(28,9)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,9)")
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum(rev), 3).cast("double").alias("revenue"),
    )


LAZY_OVERRIDE = {
    "lineitem_fisher_price_index": _fisher_frame,
    "mm_phash_hadamard_neardup": _phash_frame,
    "bucketed_join_roundtrip": _bucketed_join_frame,
}


def main() -> None:
    _ensure_loaded()
    spark = get_spark(app_name="dump_plans")
    out = [
        "# Physical plans (generated by scripts/dump_plans.py)",
        "",
        f"Scale factor: `{SF_DIR}`. Each section states the property the",
        "plan must exhibit (enforced by tests/test_plans.py where noted),",
        "followed by the `explain(formatted)` output.",
        "",
    ]
    for name, why in SHOWCASE.items():
        df = (LAZY_OVERRIDE.get(name) or REGISTRY[name].fn)(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", why, "", "```", plan.rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "docs", "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
