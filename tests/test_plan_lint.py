"""Global plan lint over EVERY registered query (the anti-pattern sweep
the round judges run by hand, made CI-enforced).

Two markers are banned outright in any executed plan at sf0.001:

- ``CartesianProduct`` — a non-broadcast nested-loop join. Every crossJoin
  in this engine is against a 1-row or model-sized broadcast side
  (BroadcastNestedLoopJoin); a plain CartesianProduct means a broadcast
  hint was lost and the shape is O(N*M) shuffle at scale.
- ``BatchEvalPython`` — a row-at-a-time Python UDF. Policy (SURVEY §2.10):
  Python executes only through Arrow-vectorized forms (ArrowEvalPython /
  mapInPandas / grouped-agg pandas), each with a native twin.

Plus two logical-plan rules (r5 verdict item 1; r6 verdict item 3):

- no explicit BROADCAST hint may reach an SF-scaling base-table scan
  without a size-bounding node (Aggregate / Deduplicate / Limit) between
  the hint and the scan — an explicit hint bypasses
  autoBroadcastJoinThreshold and Spark hard-fails broadcasts >8 GB, so
  such a plan dies at the 100 TB framing;
- no partition-less Window may sit over an unbounded SF-scaling scan —
  Spark plans it as Exchange SinglePartition + one-task sort; global
  cumulative anything goes through global_prefix_sum / grouped_prefix_rank.

See f1_lakehouse_spark/quality/plan_lint.py.

~2 minutes for all plans; marked slow-ish but always-on — the cost of
a silent CartesianProduct regression at 100 TB dwarfs it.
"""

from __future__ import annotations

from f1_lakehouse_spark.quality.plan_lint import all_plan_offenders
from f1_lakehouse_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()

BANNED = ("CartesianProduct", "BatchEvalPython")


def test_no_cartesian_product_or_rowwise_python_anywhere(spark):
    offenders: dict[str, list[str]] = {}
    for name, q in sorted(REGISTRY.items()):
        df = q.fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        found = [m for m in BANNED if m in plan]
        found += all_plan_offenders(df)
        if found:
            offenders[name] = found
    assert not offenders, offenders
