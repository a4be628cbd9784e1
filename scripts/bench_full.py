#!/usr/bin/env python
"""One-time full-suite timing sweep (r4 verdict item 2): time EVERY
registered query at $SPARK_GRAFT_SF_DIR (default sf0.1) and write
BENCH_FULL.json with per-query seconds, the machine-speed calibration
block, and a `flagged` list of anything slower than FLAG_SEC — so no query
can hide a pathological constant by never appearing in a bench snapshot.

The 25-query headline in bench.py is untouched (round-over-round
comparability); this artifact is breadth, not trend.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from f1_lakehouse_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from f1_lakehouse_spark.session import get_spark  # noqa: E402
from f1_lakehouse_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
# Absolute flag threshold at REFERENCE machine speed; the effective
# threshold scales with the run's jvm_sum calibration (r9 verdict item:
# w1_personal_best_applyinpandas — the deliberate Arrow exemplar, ~4.5 s
# on a nominal VM — false-flagged at 5.22 s on a session whose jvm_sum
# calib ran 0.446 s vs the usual ~0.33; a fixed wall-clock bar measures
# the VM, not the query). Never scaled DOWN below the base: a fast VM
# must not loosen the gate.
FLAG_BASE_SEC = 5.0
JVM_SUM_REF_SEC = 0.33  # typical warm jvm_sum_100m calibration

# Standing notes for flagged entries whose cost is INHERENT CPU, not a plan
# smell — recorded next to the flag so a future round doesn't "fix" a
# correct plan (r6 verdict item 6).
FLAG_NOTES = {
    "stats_bootstrap_ci_poisson": (
        "inherent B=64 map-side Poisson-bootstrap fan-out dying into "
        "partial sums — ~64x CPU at any scale factor by construction; the "
        "plan is THE distributed bootstrap (extensions.py), no scale-killer"
    ),
    "scd2_history_roundtrip": (
        "inherent many-small-jobs profile, not a plan smell: three "
        "SEQUENTIAL epoch applications, each a join+union with a "
        "localCheckpoint barrier (the 4^3 re-evaluation guard), so the "
        "wall clock tracks per-job scheduler/disk latency rather than "
        "data volume (change-batch-bounded at any SF). Cross-verified in "
        "r10: the r9 tree reproduces the identical time on the same VM "
        "(git-worktree A/B), while the r9 artifact's 3.24 s came from a "
        "VM with lower per-job latency despite a slower CPU calib — the "
        "jvm_sum scaling cannot normalize latency-bound queries"
    ),
    "w1_personal_best_applyinpandas": (
        "the deliberate Arrow/pandas applyInPandas EXEMPLAR (SURVEY §2.10 "
        "UDF surface) — pays the Python round-trip by design to exercise "
        "that path; the native-window twin (operators/windows.py W1) is "
        "the production plan and runs ~10x faster. Borderline vs the 5 s "
        "absolute threshold, so it flags only on slow-VM sessions "
        "(tracks the jvm_sum calibration)"
    ),
    "streaming_cdf_consumer_roundtrip": (
        "inherent many-small-jobs profile like the other streaming "
        "round-trips: per-row cost is two availableNow stream startups + "
        "N micro-batch commits of three tables each (the third table IS "
        "the certification — the incrementally-maintained mart), all "
        "entity/taxonomy-bounded frames, so the wall clock tracks per-job "
        "scheduler latency, not data volume. Already trimmed: in-batch "
        "silver persist barrier, size-derived write-file counts "
        "(streaming/ingest._medallion_cdf_commit); the residual is "
        "Structured Streaming machinery shared with "
        "streaming_multitable_roundtrip"
    ),
    "dedup_edit_distance": (
        "inherent exact-verify CPU, not a plan smell (r11 audit): the "
        "q-gram count filter bounds candidates sub-quadratically (10.3k "
        "pairs at sf0.1), but each surviving pair pays an exact O(len_a x "
        "len_b) levenshtein — ~1e9 DP cells at sf0.1's ~300-char docs — in "
        "native JVM codegen. The oracle emits edit_distance for EVERY "
        "candidate, so no threshold short-circuit is admissible; that IS "
        "the string-similarity-join verify step"
    ),
    "branch_wap_roundtrip": (
        "latency-bound lifecycle certification like scd2/streaming "
        "round-trips: sequential manifest commits + branch/tag/ "
        "fast-forward filesystem swaps with read-back asserts — "
        "entity-bounded data, wall clock tracks per-job and per-fsync "
        "latency, not volume (r11 audit)"
    ),
    "mor_upsert_roundtrip": (
        "latency-bound lifecycle certification: sequential O_EXCL "
        "fragment commits + compaction + byte-identity asserts over "
        "entity-bounded frames (r11 audit; same class as "
        "mor_delete_roundtrip and scd2)"
    ),
    "semdedup_cluster_prune": (
        "sweep-position artifact, not a plan smell (r11 close audit): "
        "the first call pays the session's shared embedding/cluster cache "
        "build plus JIT; isolated steady state on the same VM is "
        "1.1-1.3 s (21 s cold, 1.1 s warm). Flags only when the sweep's "
        "best-of-2 lands both runs on a slow-VM phase"
    ),
    "stats_skipping_roundtrip": (
        "latency-bound lifecycle certification like the other skipping "
        "round-trips: the N-file range write IS the file-skipping test "
        "fixture, followed by manifest-stats pruning asserts; isolated "
        "steady state 3.0-3.5 s on this VM (r11 close audit)"
    ),
}


def main() -> None:
    _ensure_loaded()
    spark = get_spark(app_name="f1_lakehouse_spark_bench_full")
    warm = load_table(spark, SF_DIR, "lineitem")
    warm.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    spark.range(1000).selectExpr("sum(id)").collect()

    t0 = time.perf_counter()
    spark.range(100_000_000).selectExpr("sum(id)").collect()
    jvm_sum = time.perf_counter() - t0
    t0 = time.perf_counter()
    load_table(spark, SF_DIR, "lineitem").count()
    scan_count = time.perf_counter() - t0

    # effective threshold: scaled UP on slow VMs (jvm_sum above reference),
    # floored at the base on fast ones
    flag_sec = round(FLAG_BASE_SEC * max(1.0, jvm_sum / JVM_SUM_REF_SEC), 3)

    times: dict[str, float] = {}
    for i, name in enumerate(sorted(REGISTRY)):
        fn = REGISTRY[name].fn
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        print(f"[{i + 1}/{len(REGISTRY)}] {name}: {times[name]}s", flush=True)

    # end-of-run calibration: the sweep takes ~10-15 min and the shared VM's
    # speed oscillates on minute scales — a start-only calib can certify a
    # run whose tail ran 2-3x slow (r11: events_ks_two_sample read 17 s in
    # a sweep, 2.0 s isolated). Divergent start/end calib marks the total
    # as polluted evidence.
    t0 = time.perf_counter()
    spark.range(100_000_000).selectExpr("sum(id)").collect()
    jvm_sum_end = time.perf_counter() - t0

    payload = {
        "metric": "full_suite_total_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "n_queries": len(times),
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "runs_best_of": RUNS,
        "calib": {
            "jvm_sum_100m_sec": round(jvm_sum, 3),
            "lineitem_count_sec": round(scan_count, 3),
            "jvm_sum_100m_sec_end": round(jvm_sum_end, 3),
        },
        "flag_threshold_sec": flag_sec,
        "flag_threshold_base_sec": FLAG_BASE_SEC,
        "flag_calib_scale": round(flag_sec / FLAG_BASE_SEC, 3),
        "flagged": {n: t for n, t in sorted(times.items(), key=lambda kv: -kv[1]) if t > flag_sec},
        "flag_notes": {
            n: FLAG_NOTES[n]
            for n in sorted(times)
            if times[n] > flag_sec and n in FLAG_NOTES
        },
        "queries": times,
    }
    spark.stop()
    with open(os.path.join(REPO, "BENCH_FULL.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: payload[k] for k in ("metric", "value", "n_queries", "flagged")}))


if __name__ == "__main__":
    main()
