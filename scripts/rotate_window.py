"""Compute the driver rotation window (registry.PRIORITY) and rewrite the
generated block in f1_lakehouse_spark/registry.py.

The external driver differentially checks only the first
``registry.DRIVER_WINDOW`` entries of ``queries()``. Rotation policy
(r3+ verdicts, automated here per the r4 verdict item 4):

- 4 always-keep ANCHORS (flagship, TPC-H q1, as-of join, one dedup) are
  re-verified every round;
- the remaining slots are filled with queries that have NEVER had a driver
  row in ANY prior ``CORRECTNESS_r*.json`` (any row counts — green, red, or
  ``no_oracle`` — so a red row stays visible in the artifact history and is
  deliberately re-windowed by adding it to LEAD, as r4 did for
  events_date_spine_ffill);
- fill order: the hand-curated LEAD list first (the current round's verdict
  priorities), then registry order;
- only exact-oracle queries are eligible (the driver can't hash-check a
  rows-only entry).

Run ``python scripts/rotate_window.py`` to rewrite the block,
``--check`` to exit 1 if the committed block is stale. The invariants are
CI-enforced by tests/test_rotate_window.py.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ANCHORS: tuple[str, ...] = (
    "flagship_supplier_summary",
    "q1_pricing_summary",
    "join_asof_latest_order",
    "dedup_minhash_verified",
)

# Round-5 verdict priorities: the 28 round-4 stats/eval operators (the only
# substantial code never driver-exercised), the remaining f1_* parity
# queries, and the two formerly rows-only sketch queries now that they carry
# exact oracles (hll_mergeable_distinct never had a driver row; approx_
# sketches had no_oracle rows in r01/r02 so it re-enters via this LEAD list).
LEAD: tuple[str, ...] = (
    "hll_register_sketch_exact",
    "orders_kaplan_meier_fulfillment",
    "stats_bootstrap_ci_poisson",
    "stats_jackknife_variance",
    "scoring_conformal_interval",
    "scoring_auc_mann_whitney",
    "scoring_decile_lift",
    "events_shapley_attribution",
    "events_viterbi_journeys",
    "events_markov_absorption",
    "events_ewma_anomaly",
    "text_rouge_l_candidates",
    "text_rake_keyphrases",
    "supplier_revenue_gini",
    "lineitem_unit_value_index",
    "orders_holt_forecast",
    "orders_holt_backtest",
    "orders_seasonal_decompose",
    "orders_haar_wavelet",
    "orders_cohort_ltv",
    "lineitem_benford_audit",
    "part_abc_xyz_matrix",
    "filtering_bias_audit",
    "curation_neyman_allocation",
    "events_binary_segmentation",
    "events_ab_srm_guard",
    "ann_matryoshka_prefix_recall",
    "ann_reciprocal_rank_fusion",
    "f1_team_event_summary",
    "f1_session_kpis",
    "f1_pace_curve",
    "f1_session_date",
    "hll_mergeable_distinct",
)

BEGIN = "# --- BEGIN GENERATED WINDOW (scripts/rotate_window.py; do not edit) ---"
END = "# --- END GENERATED WINDOW ---"


def driver_checked_names(repo: Path = REPO) -> set[str]:
    """Every query name with ANY row in any CORRECTNESS_r*.json."""
    checked: set[str] = set()
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        checked |= set(json.loads(p.read_text()).keys())
    return checked


def compute_window() -> list[str]:
    from f1_lakehouse_spark.registry import DRIVER_WINDOW, REGISTRY, _ensure_loaded

    _ensure_loaded()
    checked = driver_checked_names()
    missing_lead = [n for n in ANCHORS + LEAD if n not in REGISTRY]
    if missing_lead:
        raise SystemExit(f"LEAD/ANCHOR names not registered: {missing_lead}")

    def eligible(name: str) -> bool:
        q = REGISTRY[name]
        return q.oracle is not None and name not in checked and name not in ANCHORS

    fill: list[str] = [n for n in LEAD if eligible(n)]
    for n in REGISTRY:  # registration order: deterministic module import order
        if len(fill) >= DRIVER_WINDOW - len(ANCHORS):
            break
        if n not in fill and eligible(n):
            fill.append(n)
    window = list(ANCHORS) + fill[: DRIVER_WINDOW - len(ANCHORS)]
    if len(window) < DRIVER_WINDOW:
        # fewer never-checked queries remain than slots: top up with the
        # least-recently-verified greens (registry order as a stable proxy)
        for n in REGISTRY:
            if len(window) >= DRIVER_WINDOW:
                break
            if n not in window and REGISTRY[n].oracle is not None:
                window.append(n)
    return window


def render_block(window: list[str]) -> str:
    lines = [BEGIN]
    lines.append("PRIORITY: tuple[str, ...] = (")
    for i, n in enumerate(window):
        suffix = "  # anchor" if n in ANCHORS else ""
        lines.append(f'    "{n}",{suffix}')
        if i == len(ANCHORS) - 1:
            lines.append("    # --- never-driver-checked fill (rotates each round) ---")
    lines.append(")")
    lines.append(END)
    return "\n".join(lines)


def main(check_only: bool = False) -> int:
    reg_path = REPO / "f1_lakehouse_spark" / "registry.py"
    src = reg_path.read_text()
    block = render_block(compute_window())
    pattern = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.DOTALL)
    if not pattern.search(src):
        raise SystemExit(f"sentinels not found in {reg_path}")
    new_src = pattern.sub(lambda _: block, src)
    if check_only:
        if new_src != src:
            print("registry.PRIORITY is stale; run: python scripts/rotate_window.py")
            return 1
        print("registry.PRIORITY is current")
        return 0
    if new_src != src:
        reg_path.write_text(new_src)
        print(f"rewrote PRIORITY ({len(compute_window())} entries)")
    else:
        print("PRIORITY already current")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(check_only="--check" in sys.argv[1:]))
