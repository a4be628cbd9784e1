"""Query registry: every implemented operator registers (name, fn, oracle).

``fn(spark, sf_dir) -> DataFrame`` is the Spark implementation;
``oracle`` is the equivalent ANSI SQL that DuckDB runs on the same parquet
tables (views pre-registered by the harness: region nation customer supplier
part orders lineitem events documents embeddings). The driver's correctness
gate compares row-count + schema + order-insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- window/topk orderings are TOTAL (unique tiebreakers) so results are
  deterministic under parallel execution;
- double-typed SUMs go through DECIMAL so the value is order-independent.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


# The external driver differentially checks only the FIRST 50 entries of
# ``queries()``, so the dict is emitted in an explicit priority order.
# Rotation policy (round 4): 4 always-keep anchors + `events_date_spine_ffill`
# (the one r3 red row — oracle windowed SUM now CAST to BIGINT; it stays in
# the window until it has a green driver row) + 45 queries with NO driver row
# in any CORRECTNESS_r01/r02/r03, prioritized per the r3 verdict: the
# prefix-sum family, the composed IVF-PQ retrieval chain, experimentation
# (CUPED/AB), the training-data card, and the families whose machinery has
# never been driver-exercised (text/curation/embedding diagnostics, CDC,
# cluster-safe split). Every entry below is exact-oracle and pre-verified
# via `DRIVE_ONLY=... python scripts/drive_contract.py` (the documented
# convention), so rotation grows driver-verified unique coverage 142 → ~188
# with no risk to the gate. `hll_mergeable_distinct` (rows-only by nature)
# and `approx_sketches` stay OUT of the window per the r2 verdict.
DRIVER_WINDOW = 50

PRIORITY: tuple[str, ...] = (
    # --- anchors (re-verified every round) ---
    "flagship_supplier_summary",
    "q1_pricing_summary",
    "join_asof_latest_order",
    "dedup_minhash_verified",  # dedup anchor: exercises shingle→minhash→band→verify
    # --- r3 red row, fixed this round; held until green ---
    "events_date_spine_ffill",
    # --- global prefix-sum family (range repartition + pid offsets) ---
    "pareto_abc_parts",
    "weighted_percentile_price",
    "events_peak_concurrency",
    "orders_rfm_segmentation",
    # --- composed IVF-PQ retrieval chain ---
    "ann_ivf_pq",
    "ann_ivfpq_recall",
    "ann_ivf_nprobe_sweep",
    # --- experimentation / event analytics ---
    "events_cuped_adjusted_lift",
    "events_ab_test_lift",
    "events_gaps_islands",
    "events_cusum_changepoint",
    "events_funnel_time_bound",
    "events_dau_wau_stickiness",
    "events_bot_heuristic",
    "join_asof_tolerance",
    # --- F1 parity layer (r3 verdict item 6: the dashboard/model functions
    # themselves, run over the documented lineitem→silver mapping) ---
    "f1_driver_session_summary",
    "f1_fastest_laps",
    # --- dedup machinery never driver-exercised ---
    "dedup_snm_multipass",
    "dedup_best_representative",
    "dedup_minhash_band_curve",
    "dedup_lsh_candidate_recall",
    "dedup_edit_distance",
    "curation_cluster_safe_split",
    # --- text / scoring ---
    "text_bigram_pmi_top",
    "text_intradoc_span_dedup",
    "text_bpe_encode",
    "text_source_vocab_entropy",
    "text_tokenizer_fertility",
    "text_phrase_search_postings",
    "quality_perplexity_buckets",
    "dsir_resample",
    # --- embedding diagnostics ---
    "embedding_top_pc_power_iter",
    "embedding_top2_pc_deflation",
    "embedding_pairwise_sim_hist",
    "embedding_mahalanobis_outliers",
    "embedding_quantize_int8",
    "embedding_drift_centroid_shift",
    # --- curation ---
    "curation_epoch_repeat_schedule",
    "curation_greedy_coverage",
    "curation_kcenter_diversity",
    "curation_shard_balance_audit",
    "curation_global_shuffle_shard",
    # --- multimodal / filtering / report ---
    "mm_payload_cdc_chunks",
    "decontam_provenance",
    "pipeline_training_data_card",
)


def _ordered_names() -> list[str]:
    names = [n for n in PRIORITY if n in REGISTRY]
    tail = [n for n in REGISTRY if n not in set(names)]
    return names + tail


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


_LOADED = False


def _ensure_loaded() -> None:
    """Import every operator module so registrations run."""
    global _LOADED
    if _LOADED:
        return
    import f1_lakehouse_spark.operators  # noqa: F401
    from f1_lakehouse_spark.f1 import adapters  # noqa: F401
    from f1_lakehouse_spark.pipeline import (  # noqa: F401
        curation,
        dedup,
        filtering,
        graph,
        incremental,
        multimodal,
        scoring,
        similarity,
        text,
    )

    _LOADED = True
