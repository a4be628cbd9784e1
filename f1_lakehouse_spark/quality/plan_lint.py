"""Logical-plan lint: ban explicit broadcast hints on SF-scaling scans.

An explicit ``F.broadcast()`` hint bypasses
``spark.sql.autoBroadcastJoinThreshold`` entirely, and Spark hard-fails any
broadcast exceeding 8 GB — so a hint on a table that grows with the scale
factor (customer/supplier/part/orders/lineitem/documents/embeddings/events)
is a plan that dies at the 100 TB framing even though it is fast at sf0.1.
Meanwhile the hint buys nothing at bench scale that AQE's runtime
sort-merge→broadcast conversion (or the static threshold, for statted
parquet scans) wouldn't already do. Policy (r5 verdict item 1):

- **No ``ResolvedHint`` may reach an SF-scaling base-table scan** without a
  size-bounding node (Aggregate / Deduplicate / Limit) between the hint and
  the scan.
- Hints on genuinely bounded frames stay legal: nation/region (25/5 rows at
  every SF), DISTINCT projections of low-cardinality attributes, and
  post-aggregate model frames.

The walk runs on the ANALYZED logical plan (the optimizer folds hints into
join nodes, which would hide the subtree) via py4j TreeNode traversal — no
job execution. Enforced for every registered query by
``tests/test_plan_lint.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: A leaf relation is "SF-scaling" iff its output contains one of these
#: signature columns (each unique to one synthetic table that grows with SF).
SF_SCALING_MARKERS: frozenset[str] = frozenset(
    {
        "c_custkey",  # customer
        "s_suppkey",  # supplier
        "p_partkey",  # part
        "o_orderkey",  # orders
        "l_linenumber",  # lineitem
        "doc_id",  # documents
        "vec_id",  # embeddings
        "event_id",  # events
    }
)

#: Node classes that bound the size of everything above them: an aggregate
#: output is model-sized by this repo's conventions, a limit is explicit.
_SIZE_BOUNDING = ("Aggregate", "Deduplicate", "GlobalLimit", "LocalLimit")

#: Leaf classes that scan a base relation.
_LEAF_SCANS = ("LogicalRelation", "LogicalRDD", "LocalRelation")


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _output_names(node) -> list[str]:
    out = node.output()
    return [out.apply(i).name() for i in range(out.size())]


def _walk(node, under_hint: bool, offenders: list[str]) -> None:
    cls = _cls(node)
    if any(cls.startswith(b) for b in _SIZE_BOUNDING):
        under_hint = False  # everything below is size-bounded at this node
    if cls.startswith("ResolvedHint") or cls.startswith("UnresolvedHint"):
        under_hint = True
    if cls in _LEAF_SCANS and under_hint:
        names = set(_output_names(node))
        hit = sorted(names & SF_SCALING_MARKERS)
        if hit:
            offenders.append(f"{cls}[{','.join(hit)}]")
    kids = node.children()
    for i in range(kids.size()):
        _walk(kids.apply(i), under_hint, offenders)
    # Subqueries (scalar / IN) hang off expressions, not children.
    inner = node.subqueries()
    for i in range(inner.size()):
        _walk(inner.apply(i), under_hint, offenders)


def broadcast_hint_offenders(df: DataFrame) -> list[str]:
    """SF-scaling scans reachable from a broadcast hint in df's plan.

    Empty list == compliant. Each entry names the leaf class and the
    signature column(s) that identified the scaling table.
    """
    plan = df._jdf.queryExecution().analyzed()
    offenders: list[str] = []
    _walk(plan, False, offenders)
    return offenders
