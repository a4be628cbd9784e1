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

~2 minutes for all 258 plans; marked slow-ish but always-on — the cost of
a silent CartesianProduct regression at 100 TB dwarfs it.
"""

from __future__ import annotations

from f1_lakehouse_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()

BANNED = ("CartesianProduct", "BatchEvalPython")


def test_no_cartesian_product_or_rowwise_python_anywhere(spark):
    offenders: dict[str, list[str]] = {}
    for name, q in sorted(REGISTRY.items()):
        plan = (
            q.fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        )
        found = [m for m in BANNED if m in plan]
        if found:
            offenders[name] = found
    assert not offenders, offenders
