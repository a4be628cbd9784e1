"""Scale-stress harness: replicate the sf0.1 testdata K-fold (default 10x,
~6M-row lineitem — an sf1 equivalent) with key-offset copies that preserve
join relationships, then time the headline queries at both scales.

The point is empirical evidence for docs/SCALE.md: a query whose plan is
scale-safe (one shuffle, partial aggregation, broadcast dims, bounded
buckets) should scale ~linearly in rows; anything super-linear indicates a
hidden all-pairs or skew problem. Run:

    python scripts/scale_stress.py            # 10x, default query set
    SCALE_K=20 python scripts/scale_stress.py

Writes the replica to /tmp/spark_graft_scale_x{K} (reused if present).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from f1_lakehouse_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from f1_lakehouse_spark.session import get_spark  # noqa: E402
from f1_lakehouse_spark.tables import load_table, table_path  # noqa: E402

BASE = os.environ.get("SCALE_BASE_DIR", "/root/testdata/sf0.1")
K = int(os.environ.get("SCALE_K", "10"))
OUT = f"/tmp/spark_graft_scale_x{K}"

# key columns to offset per replica so fact/dim relationships survive
OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": [],  # shared dims: suppliers/parts/nation/region stay global
    "part": [],
    "nation": [],
    "region": [],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = {"supplier", "part", "nation", "region"}

QUERIES = [
    "flagship_supplier_summary",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q18_large_volume_customers",
    "join_asof_latest_order",
    "w_sessionize_events",
    "dedup_minhash_verified",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "ann_knn_self_join",
    "ann_knn_12planes",
    "decontam_ngram_overlap",
    "quality_gopher_repetition",
    "curation_pack_sequences",
    "events_multires_rollup",
    "dedup_incremental_minhash",
    "curation_priority_sample",
    "curation_global_shuffle_shard",
    "dedup_jaccard_prefix_filter",
    "dedup_sorted_neighborhood",
    "dedup_containment",
    "join_asof_nearest_order",
    "skyline_price_size",
    "bloom_prefilter_stats",
    "dsir_importance_weights",
    "ann_ivf_pq",
    "orders_rfm_segmentation",
    "embedding_mahalanobis_outliers",
    "events_time_decay_engagement",
    "text_intradoc_span_dedup",
    "text_bpe_encode",
    # round 4
    "dedup_corpus_lines",
    "scoring_hashed_linear_quality",
    "text_repetition_loop_detect",
    "ann_batch_query_topk",
    "curation_doremi_reweight",
    # round 4, continuation session (measured ratios 0.16-2.17 at 10x)
    "hll_register_sketch_exact",
    "orders_kaplan_meier_fulfillment",
    "stats_bootstrap_ci_poisson",
    "ann_matryoshka_prefix_recall",
    "events_ewma_anomaly",
    "lineitem_benford_audit",
    "orders_cohort_ltv",
    "orders_seasonal_decompose",
    "orders_holt_forecast",
    "events_viterbi_journeys",
    # round 8 (measured ratios 0.24-1.45 at 10x)
    "incremental_gold_refresh_roundtrip",
    "training_shards_roundtrip",
    "bm25_replica_terms",  # text_bm25_retrieval with replica-survivable terms
    "curation_curriculum_interleave",
    # round 8, second batch
    "text_zipf_alpha",
    "scoring_psi_drift",
    "embedding_random_projection_jl",
    "orders_newsvendor_quantile",
    "lineitem_price_elasticity",
    "orders_bass_diffusion",
    "scoring_youden_j_threshold",
    "w_range_interval_frame",
    "events_hill_tail_index",
    "text_bm25_ndcg_eval",
    "scoring_platt_scaling",
    "text_lang_id_macro_f1",
    "orders_weibull_quantile_fit",
    # round 9 (lifecycle/layout round-trips)
    "incremental_silver_merge_roundtrip",
    "compaction_zorder_roundtrip",
    "scd2_history_roundtrip",
    "schema_evolution_roundtrip",
    "partition_prune_roundtrip",
    "bucketed_join_roundtrip",
    "dynamic_partition_prune_roundtrip",
    "row_level_delete_roundtrip",
    "curated_shards_roundtrip",
    # round 10 (multi-table txn, version GC, stats/CBO)
    "atomic_publish_roundtrip",
    "version_gc_roundtrip",
    "cbo_stats_broadcast_roundtrip",
    "snapshot_time_travel_roundtrip",
    "wap_publish_roundtrip",
    "streaming_multitable_roundtrip",
    "cbo_join_reorder_roundtrip",
    "mor_delete_roundtrip",
    "change_data_feed_roundtrip",
    # round 11 (refs, concurrency, CDF consumer, MoR upsert, retention)
    "branch_wap_roundtrip",
    "occ_concurrent_writers_roundtrip",
    "cdf_incremental_consumer",
    "mor_upsert_roundtrip",
    "expire_history_roundtrip",
    "tag_pinned_time_travel_roundtrip",
    "streaming_cdf_consumer_roundtrip",
    "vacuum_orphans_roundtrip",
    # round 11, third batch (file skipping)
    "stats_skipping_roundtrip",
    "bloom_skipping_roundtrip",
]


def build_replica(spark) -> None:
    if os.path.isdir(OUT):
        print(f"replica exists: {OUT}", file=sys.stderr)
        return
    os.makedirs(OUT, exist_ok=True)
    for name, keys in OFFSETS.items():
        src = load_table(spark, BASE, name)
        if name in SHARED:
            out = src
        else:
            max_keys = {
                k: src.agg(F.max(k)).collect()[0][0] + 1 for k in keys
            }
            rep = spark.range(K).withColumnRenamed("id", "__rep")
            out = src.crossJoin(F.broadcast(rep))
            for k, mx in max_keys.items():
                out = out.withColumn(k, F.col(k) + F.col("__rep") * F.lit(mx))
            # Density-preserving perturbation: without it every row has K-1
            # perfect copies, so near-dup PAIR counts grow ~K^2 — measuring
            # the replica, not the algorithm.
            if name == "documents":
                # per-replica word prefix: within-replica shingle structure
                # is preserved exactly; across replicas no shingle matches
                out = out.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda w: F.concat(
                                F.lit("r"),
                                F.col("__rep").cast("string"),
                                F.lit("_"),
                                w,
                            ),
                        ),
                        " ",
                    ),
                ).withColumn("n_chars", F.length("text"))
            if name == "embeddings":
                # per-replica rotation: all within-replica pairwise cosines
                # unchanged (same permutation); cross-replica decorrelated
                out = out.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(
                            "embedding",
                            F.col("__rep").cast("int") + 1,
                            F.size("embedding"),
                        ),
                        F.slice("embedding", 1, F.col("__rep").cast("int")),
                    ),
                )
            out = out.drop("__rep")
        out.write.mode("overwrite").parquet(table_path(OUT, name))
        print(f"  built {name}", file=sys.stderr)


def _knn_with_planes(n_planes: int):
    """kNN variant with a wider LSH signature — the sizing rule
    (bits ≈ log2(N / target_bucket_size)) says bucket bits must grow with
    the corpus; this lets the experiment show 8-bit vs 12-bit at 10x."""

    def run(spark, sf_dir):
        from pyspark.sql import Window

        from f1_lakehouse_spark.pipeline.similarity import (
            KNN_K,
            _plane,
            _spark_cosine,
            spark_signature_planes,
        )

        planes = [_plane(j) for j in range(n_planes)]
        e = load_table(spark, sf_dir, "embeddings")
        sigs = e.select(
            "vec_id",
            "embedding",
            spark_signature_planes(F.col("embedding"), planes).alias("bucket"),
        ).persist()
        sigs.count()
        a, b = sigs.alias("a"), sigs.alias("b")
        pairs = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            _spark_cosine(F.col("a.embedding"), F.col("b.embedding")).alias(
                "cosine"
            ),
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        out = (
            pairs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= KNN_K)
        )
        out = out.persist()
        out.count()
        sigs.unpersist()
        return out

    return run


def _bm25_replica_terms(spark, sf_dir):
    """BM25 against the replica: the density-preserving perturbation
    prefixes every replica word with r{k}_, so the plain query terms only
    exist in the base corpus. Pass replica-0's terms explicitly for the
    x10 run — the cost the stress measures (one tokenize scan + scalar
    aggregate + map-side score) is term-independent, and r0-terms keep the
    result non-degenerate."""
    import f1_lakehouse_spark.pipeline.text as t

    terms = t.BM25_QUERY_TERMS
    if "spark_graft_scale_x" in sf_dir:
        terms = tuple(f"r0_{w}" for w in terms)
    return t.text_bm25_retrieval(spark, sf_dir, terms=terms)


EXTRA = {
    "ann_knn_12planes": _knn_with_planes(12),
    "bm25_replica_terms": _bm25_replica_terms,
}


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for name in QUERIES:
        fn = EXTRA.get(name) or REGISTRY[name].fn
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {times[name]}s ({n} rows)", file=sys.stderr)
    return times


def main() -> None:
    global QUERIES
    only = os.environ.get("SCALE_QUERIES")
    if only:
        QUERIES = [q.strip() for q in only.split(",")]
    _ensure_loaded()
    # shuffle partitions must scale with data volume (AQE coalesces small
    # partitions but never splits oversized non-skew-join ones) — expose the
    # knob so the experiment can show its effect
    parts = os.environ.get("SCALE_SHUFFLE_PARTITIONS")
    spark = get_spark("scale-stress", shuffle_partitions=parts)
    build_replica(spark)
    print(f"-- base ({BASE}) --", file=sys.stderr)
    base = time_queries(spark, BASE)
    print(f"-- x{K} ({OUT}) --", file=sys.stderr)
    big = time_queries(spark, OUT)
    ratios = {q: round(big[q] / base[q], 2) for q in QUERIES}
    print(
        json.dumps(
            {"k": K, "base_sec": base, "xk_sec": big, "ratio": ratios},
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
