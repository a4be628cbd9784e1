"""Physical-plan assertions: the properties that make these queries scale
(pushdown, pruning, broadcast, top-k, partial aggregation) are contracts —
if a refactor loses one, these fail."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_lakehouse_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_and_schema_pruned(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # 7 needed columns only — pruned ReadSchema must not include l_orderkey
    assert "l_orderkey" not in plan.split("ReadSchema")[-1]


def test_q1_partial_aggregation_before_exchange(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "partial_sum" in plan  # map-side combine
    assert plan.count("Exchange") == 1  # exactly one shuffle


def test_star_join_broadcasts_dims(spark):
    plan = _plan(spark, "join_star_broadcast")
    assert plan.count("BroadcastHashJoin") >= 2  # nation AND region broadcast
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "o3_topk_cheapest_lines")
    assert "TakeOrderedAndProject" in plan  # no global sort materialization


def test_projection_queries_do_not_shuffle(spark):
    for name in ("p2_p3_silver_reprojection", "p9_case_when", "f6_slugify"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, f"{name} unexpectedly shuffles"


def test_semi_anti_joins_stay_joins_not_aggregates(spark):
    for name in (
        "join_semi_customers_with_orders",
        "join_anti_customers_without_orders",
    ):
        plan = _plan(spark, name)
        assert "LeftSemi" in plan or "LeftAnti" in plan, name


def test_minhash_has_no_row_blowup_join(spark):
    # the 16 hash functions must be aggregate expressions, not a 16x join
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan  # map-side partial minima


def test_ann_materialized_probe_prunes_partitions(spark):
    """The materialized LSH index probe must resolve the bucket filter at
    the file listing (PartitionFilters on the hive partition key), not as a
    post-scan row filter — the property that makes the probe O(corpus/2^8)."""
    plan = _plan(spark, "ann_lsh_materialized")
    seg = plan.split("PartitionFilters")
    assert len(seg) > 1, "no PartitionFilters in probe scan"
    assert "bucket" in seg[-1].split("]")[0]


def test_bucketed_join_eliminates_shuffle(spark):
    """bucketBy co-location: joining two tables bucketed on the same key
    must not exchange either side (the 100 TB co-located join strategy)."""
    from f1_lakehouse_spark.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("o_bucketed")

    # the auto-bucketed-scan heuristic may fall back to a plain scan; pin
    # bucketed scans on for the assertion (cluster deployments tune this)
    prev_scan = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    # at this tiny SF Catalyst would (rightly) broadcast; force the
    # sort-merge path to demonstrate the bucket co-location property
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("o_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev_scan)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, (
        "bucketed join should not shuffle"
    )
    assert "SortMergeJoin" in plan
    # and it computes the right thing
    n = joined.count()
    plain = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert n == plain


def test_decontam_broadcasts_benchmark(spark):
    """Decontamination must broadcast the (tiny) benchmark gram set — the
    corpus side never shuffles for the join. At 100 TB the benchmark is MBs;
    a shuffle join here would move the whole corpus."""
    plan = _plan(spark, "decontam_ngram_overlap")
    assert "BroadcastHashJoin" in plan


def test_repetition_filter_is_map_only(spark):
    """Gopher repetition stats are per-row array folds — any Exchange in the
    plan means a refactor broke the no-shuffle contract."""
    plan = _plan(spark, "quality_gopher_repetition")
    assert "Exchange" not in plan


def test_pii_scrub_is_map_only(spark):
    plan = _plan(spark, "pii_scrub_redact")
    assert "Exchange" not in plan


def test_dynamic_partition_pruning_on_hive_fact(spark, tmp_path_factory):
    """Joining a date-partitioned fact to a filtered dim must inject a
    dynamic-pruning subquery into the fact scan's PartitionFilters — the
    fact reads only the partitions the dim filter selects, decided at
    runtime. At 100 TB this is the difference between scanning 3 days and
    scanning 3 years."""
    from f1_lakehouse_spark.tables import load_table

    tmp = str(tmp_path_factory.mktemp("dpp")) + "/events_by_date"
    e = load_table(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    e.write.partitionBy("event_date").mode("overwrite").parquet(tmp)
    fact = spark.read.parquet(tmp)
    dim = (
        e.select("event_date").distinct()
        .withColumn("is_campaign_day", F.dayofmonth("event_date") <= 3)
    )
    joined = fact.join(dim, "event_date").where(F.col("is_campaign_day"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    n = joined.count()
    exact = e.where(F.dayofmonth("event_date") <= 3).count()
    assert n == exact and n > 0


def test_runtime_bloom_filter_join(spark):
    """With a selective dim filter, the runtime bloom-filter optimization
    must stamp a bloom_filter_might_contain predicate onto the fact scan —
    rows that cannot join are dropped before the shuffle. (Size thresholds
    are production-scale; pinned down so the tiny test data qualifies.)"""
    from f1_lakehouse_spark.tables import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # broadcast would bypass the bloom path at this SF; force shuffle join
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        opt = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt and "might_contain" in opt, opt[:2000]
        assert joined.count() == 1
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_interval_overlap_join_is_equi_not_nested_loop(spark):
    """The bucketed decomposition must compile to a hash/merge equi-join —
    the whole point is avoiding the per-key cartesian a non-equi overlap
    condition would force."""
    plan = _plan(spark, "join_interval_overlap_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_pagerank_iterations_reuse_edge_cache(spark):
    """All three iterations must read edges from the InMemoryRelation, not
    recompute the order-pair expansion."""
    plan = _plan(spark, "graph_pagerank_suppliers")
    assert "InMemoryTableScan" in plan


def test_lm_surprisal_model_broadcasts(spark):
    """The trigram model/totals are codebook-sized — they must broadcast;
    only the doc-side gram stream and the per-doc sum may shuffle."""
    plan = _plan(spark, "text_lm_surprisal")
    assert "BroadcastHashJoin" in plan


def test_chunking_is_map_only(spark):
    plan = _plan(spark, "text_chunk_sliding")
    assert "Exchange" not in plan  # explode + substr: zero shuffles


def test_salted_join_spreads_before_final_agg(spark):
    plan = _plan(spark, "skew_salted_join")
    # the join key includes the salt: hash partitioning on (key, salt)
    assert "_salt" in plan
    assert "partial_sum" in plan  # map-side combine still applies post-join


def test_incremental_dedup_broadcasts_new_batch(spark):
    """New-vs-corpus candidate join must broadcast the (small) new-batch
    bands — the corpus index side is probed in place, never shuffled — and
    the split must stay a map-side hash predicate, not a doc_id join."""
    plan = _plan(spark, "dedup_incremental_minhash")
    assert "BroadcastHashJoin" in plan


def test_priority_sample_uses_take_ordered(spark):
    """Weighted top-k must compile to distributed TakeOrderedAndProject;
    the rank window then runs over only the k survivors (single tiny
    partition of PRIORITY_K rows, not a global-sort of the corpus)."""
    plan = _plan(spark, "curation_priority_sample")
    assert "TakeOrderedAndProject" in plan


def test_shuffle_shard_single_exchange(spark):
    """Epoch shuffle = one hash partition by shard + in-partition sort:
    exactly one Exchange, no global ordering anywhere."""
    plan = _plan(spark, "curation_global_shuffle_shard")
    assert plan.count("Exchange") == 1


def test_minmax_prefilter_bounds_reach_probe_scan(spark):
    """join_minmax_prefilter's collected build-side bounds must be pushed
    into the lineitem parquet scan (the whole point of the sideways pass),
    and the reduced build side must broadcast."""
    plan = _plan(spark, "join_minmax_prefilter")
    assert "GreaterThanOrEqual(l_orderkey" in plan and "LessThanOrEqual(l_orderkey" in plan
    assert "BroadcastHashJoin" in plan


def test_topk_per_group_uses_window_group_limit(spark):
    """row_number()<=k must compile to partial+final WindowGroupLimit so each
    map task prunes to its local per-group top-k BEFORE the window shuffle."""
    plan = _plan(spark, "w_topk_per_group_limit")
    assert plan.count("WindowGroupLimit") >= 2, plan[:2000]


def test_bloom_sketch_is_fixed_size_broadcast(spark):
    """The native Bloom words table must reach the probe side as a broadcast
    (fixed-size sketch), never a shuffle of the probe rows against it."""
    plan = _plan(spark, "bloom_prefilter_stats")
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_prefix_filter_verify_has_no_cartesian(spark):
    """Prefix-filtered Jaccard must stay equi-join end to end: candidate
    generation is array-side, verification joins on doc_id."""
    plan = _plan(spark, "dedup_jaccard_prefix_filter")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_sorted_neighborhood_single_sort_no_pair_shuffle(spark):
    """SNM compares via window leads: exactly one exchange (the block/sort
    shuffle) and no join at all — the zero-candidate-materialization shape."""
    plan = _plan(spark, "dedup_sorted_neighborhood")
    assert "Join" not in plan, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]


def test_skyline_global_pass_sees_only_survivors(spark):
    """Skyline phase 2 must be a window over local survivors with the tiny
    frontier broadcast back — never a cartesian dominance self-join."""
    plan = _plan(spark, "skyline_price_size")
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_nearest_asof_windows_share_one_shuffle(spark):
    """Both mirrored carry windows must reuse a single hash exchange on the
    key — the one-shuffle as-of contract, bidirectional."""
    plan = _plan(spark, "join_asof_nearest_order")
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


def test_mips_is_map_only_plus_take_ordered(spark):
    """MIPS scoring must be map-side (anchor + max-norm broadcast) with the
    top-k as TakeOrderedAndProject — zero hash exchanges of the corpus."""
    plan = _plan(spark, "ann_mips_norm_augment")
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "Exchange hashpartitioning" not in plan, plan[:2000]


def test_containment_no_cartesian(spark):
    """Containment candidates come from the capped shingle buckets — never a
    corpus-level cross join."""
    plan = _plan(spark, "dedup_containment")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_range_search_broadcast_no_corpus_shuffle(spark):
    """Threshold retrieval is a map-only broadcast filter: the 1-row query
    broadcasts (nested-loop against ONE row is free), and the corpus side
    must not shuffle — no Exchange above the scan on the big side."""
    plan = _plan(spark, "ann_range_search")
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]
    # only exchanges allowed are broadcast exchanges (of the 1-row query)
    import re

    non_broadcast = re.findall(r"(?<!Broadcast)Exchange hashpartitioning", plan)
    assert non_broadcast == [], plan[:2000]


def test_gaps_islands_window_reuses_distinct_partitioning(spark):
    """distinct-day, the row_number window, and the island aggregate all
    key on user_id — one hash exchange total; everything downstream reuses
    the partitioning."""
    plan = _plan(spark, "events_gaps_islands")
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:2000]
    assert "CartesianProduct" not in plan


def test_dim_moments_partial_aggregation(spark):
    """The per-dimension moment aggregate must combine map-side: shuffle
    carries DIM partial rows per task, not the exploded row stream."""
    plan = _plan(spark, "embedding_dim_moments")
    assert "partial_" in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


def test_pareto_prefix_sum_is_range_partitioned_not_global_window(spark):
    """The global cumulative share must come from the two-phase prefix sum:
    a range repartition on the cum order + per-partition windows — the plan
    must show range partitioning, and the only single-partition exchange
    allowed is the 1-row grand-total aggregate."""
    plan = _plan(spark, "pareto_abc_parts")
    assert "rangepartitioning" in plan, plan[:2000]
    # the window itself runs partitioned (by pid), not over one partition:
    # spark_partition_id appears as the window's partition key
    assert "SPARK_PARTITION_ID" in plan or "spark_partition_id" in plan, plan[:2000]


def test_snm_multipass_no_joins_bounded_exchanges(spark):
    """Both SNM passes stay window-lead compares (no join anywhere); the
    only exchanges are the two block-sorts + the final DISTINCT."""
    plan = _plan(spark, "dedup_snm_multipass")
    assert "Join" not in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") <= 3, plan[:2000]


def test_peak_concurrency_uses_range_partitioned_sweep(spark):
    """The sweep's global running sum must come from the distributed
    prefix sum (range partitioning present), not a single-partition
    window over the whole delta stream."""
    plan = _plan(spark, "events_peak_concurrency")
    assert "rangepartitioning" in plan, plan[:2000]
    assert "SPARK_PARTITION_ID" in plan or "spark_partition_id" in plan, plan[:2000]


def test_rfm_ntile_is_range_partitioned_not_global_window(spark):
    """All three RFM quintile scores must come from the distributed prefix
    sum (range partitioning + pid-keyed windows), never a single-partition
    NTILE window over the whole customer set."""
    plan = _plan(spark, "orders_rfm_segmentation")
    assert "rangepartitioning" in plan, plan[:2000]
    assert "SPARK_PARTITION_ID" in plan or "spark_partition_id" in plan
    assert "ntile" not in plan.lower()  # closed-form bucket math, no window ntile


def test_dsir_models_broadcast_corpus_never_shuffles_for_lookup(spark):
    """Both DSIR count models are bucket-sized: the feats->model lookups
    must be broadcast joins, never sort-merge."""
    plan = _plan(spark, "dsir_importance_weights")
    assert plan.count("BroadcastHashJoin") >= 2  # raw + target models
    assert "SortMergeJoin" not in plan


def test_mahalanobis_broadcast_stats_and_takeordered(spark):
    """Per-dim stats are DIM broadcast rows; top-k outliers via
    TakeOrdered, no global sort materialization."""
    plan = _plan(spark, "embedding_mahalanobis_outliers")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_ivf_pq_probed_cell_broadcast_no_cartesian_scoring(spark):
    """IVF-PQ: the 1-row best-cell filter must broadcast, ADC scoring is
    map-only over the probed cell (lookup tables are literals, not joins),
    and top-k is TakeOrdered."""
    plan = _plan(spark, "ann_ivf_pq")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_asof_tolerance_single_shuffle_on_key(spark):
    """Union+carry-forward as-of with tolerance: exactly one exchange (the
    user_id window), no join operator at all."""
    plan = _plan(spark, "join_asof_tolerance")
    assert "Join" not in plan
    assert plan.count("Exchange") == 1, plan[:2000]


def test_perplexity_buckets_window_partitioned_by_lang(spark):
    """The CCNet ntile runs through the grouped distributed prefix rank
    (r7): range-partitioned pid×lang windows — no single-partition window
    exchange even though lang is a skewed key."""
    plan = _plan(spark, "quality_perplexity_buckets")
    assert "SinglePartition" not in plan, plan[:2000]
    assert "rangepartitioning" in plan, plan[:2000]
    assert "SPARK_PARTITION_ID" in plan or "spark_partition_id" in plan


def test_rank_dense_ntile_quartile_is_prefix_sum_shape(spark):
    """The global NTILE(4) quartile must be the two-phase prefix shape
    (range repartition + pid-keyed windows + broadcast offsets), never a
    single-partition global sort (r6 verdict item 2)."""
    plan = _plan(spark, "w_rank_dense_ntile")
    assert "SinglePartition" not in plan, plan[:2000]
    assert "rangepartitioning" in plan, plan[:2000]
    assert "SPARK_PARTITION_ID" in plan or "spark_partition_id" in plan


def test_late_data_audit_running_max_is_range_partitioned(spark):
    """The global exclusive running max must be the two-phase prefix shape
    (range repartition + pid-keyed windows), never one global window."""
    plan = _plan(spark, "events_late_data_audit")
    assert "rangepartitioning" in plan, plan[:2000]
    assert "SPARK_PARTITION_ID" in plan or "spark_partition_id" in plan


def test_ratio_to_report_window_not_single_partition(spark):
    """Share-of-total runs partitioned by nation; supplier dim broadcasts."""
    plan = _plan(spark, "w_ratio_to_report")
    assert "SinglePartition" not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan


def test_vocab_entropy_totals_broadcast(spark):
    """The |sources|-row totals join back as a broadcast, not a shuffle."""
    plan = _plan(spark, "text_source_vocab_entropy")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_training_data_card_no_cartesian_partial_agg(spark):
    plan = _plan(spark, "pipeline_training_data_card")
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_sum" in plan  # map-side combine


def test_intradoc_span_dedup_map_only(spark):
    """In-doc span removal is pure array higher-order functions — any
    Exchange means a refactor introduced a shuffle into a scan-speed op."""
    plan = _plan(spark, "text_intradoc_span_dedup")
    assert "Exchange" not in plan, plan[:2000]


def test_pairwise_sim_hist_broadcasts_sample(spark):
    """The hash-sampled embedding subset self-joins via broadcast; the
    corpus-sized side never shuffles and the pair join is never a
    cartesian product over the full table."""
    plan = _plan(spark, "embedding_pairwise_sim_hist")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_epoch_schedule_broadcast_totals_partial_agg(spark):
    """One corpus scan with map-side partial aggregation; the 1-row totals
    frame joins back as a broadcast."""
    plan = _plan(spark, "curation_epoch_repeat_schedule")
    assert "partial_sum" in plan or "partial_count" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_decontam_provenance_broadcasts_benchmark(spark):
    """Provenance joins the corpus gram stream against the BROADCAST
    benchmark grams — same no-corpus-shuffle contract as decontam."""
    plan = _plan(spark, "decontam_provenance")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
