"""Logical-plan lint: two scale rules over the analyzed plan.

Rule 1 — no explicit broadcast hint on an SF-scaling scan.
Rule 2 — no partition-less Window over an unbounded SF-scaling scan
(``global_window_offenders``): Spark plans an empty partition spec as
Exchange SinglePartition + a one-task sort, the exact shape the
``global_prefix_sum`` / ``grouped_prefix_rank`` idioms exist to avoid.

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

import re

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

#: Columns whose CARDINALITY scales with the scale factor. An Aggregate or
#: Deduplicate keyed by one of these is data-proportional, NOT model-sized
#: — groupBy(doc_id) over the corpus has one row per document — so it must
#: not exempt the subtree from either rule (r7 review finding #1). The set
#: extends the per-table signature markers with the scaling foreign keys.
SF_SCALING_KEY_COLS: frozenset[str] = SF_SCALING_MARKERS | frozenset(
    {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "o_custkey",
        "ps_partkey",
        "ps_suppkey",
        "user_id",
    }
)

_KEY_RE = re.compile(r"\b(" + "|".join(sorted(SF_SCALING_KEY_COLS)) + r")\b")


def _bounds_subtree(node, cls: str) -> bool:
    """Limits always bound. Aggregate/Deduplicate bound ONLY when their
    grouping/dedup keys reference no SF-scaling-cardinality column (a
    conservative string scan of the key expressions: a derived bounded
    bucket like pmod(hash(doc_id), 64) would also trip it — acceptable,
    the fix is to alias the bucket before the aggregate)."""
    try:
        if cls.startswith("Aggregate"):
            keys = node.groupingExpressions().toString()
        elif cls.startswith("Deduplicate"):
            keys = node.keys().toString()
        else:
            return True  # GlobalLimit / LocalLimit
        return not _KEY_RE.search(keys)
    except Exception:  # pragma: no cover - py4j API drift: fail closed
        return False

#: Leaf classes that scan a base relation.
_LEAF_SCANS = ("LogicalRelation", "LogicalRDD", "LocalRelation")


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _output_names(node) -> list[str]:
    out = node.output()
    return [out.apply(i).name() for i in range(out.size())]


def _is_broadcast_hint(node, cls: str) -> bool:
    """True only for BROADCAST-strategy hints: a merge/shuffle_hash/
    shuffle_replicate_nl hint on a scaling scan is legal (it never hits the
    8 GB broadcast cap), so it must not trip this rule."""
    try:
        if cls.startswith("ResolvedHint"):
            # HintInfo.toString renders "(strategy=broadcast)" for
            # BROADCAST; other strategies render their own names.
            return "broadcast" in node.hints().toString().lower()
        # UnresolvedHint: the substring covers BROADCAST and BROADCASTJOIN;
        # MAPJOIN is the one broadcast-strategy alias it misses (r7 ADVICE)
        name = node.name().lower()
        return "broadcast" in name or name == "mapjoin"
    except Exception:  # pragma: no cover - py4j API drift: fail closed
        return True


def _walk(node, under_hint: bool, under_gwin: bool, off_h: list, off_w: list) -> None:
    cls = _cls(node)
    if any(cls.startswith(b) for b in _SIZE_BOUNDING) and _bounds_subtree(node, cls):
        # everything below is size-bounded at this node
        under_hint = False
        under_gwin = False
    if (
        cls.startswith("ResolvedHint") or cls.startswith("UnresolvedHint")
    ) and _is_broadcast_hint(node, cls):
        under_hint = True
    if cls == "Window" and node.partitionSpec().size() == 0:
        under_gwin = True
    if cls in _LEAF_SCANS:
        names = set(_output_names(node))
        hit = sorted(names & SF_SCALING_MARKERS)
        if hit:
            if under_hint:
                off_h.append(f"{cls}[{','.join(hit)}]")
            if under_gwin:
                off_w.append(f"{cls}[{','.join(hit)}]")
    kids = node.children()
    for i in range(kids.size()):
        _walk(kids.apply(i), under_hint, under_gwin, off_h, off_w)
    # Subqueries (scalar / IN) hang off expressions, not children.
    inner = node.subqueries()
    for i in range(inner.size()):
        _walk(inner.apply(i), under_hint, under_gwin, off_h, off_w)


def _offenders(df: DataFrame) -> tuple[list[str], list[str]]:
    plan = df._jdf.queryExecution().analyzed()
    off_h: list[str] = []
    off_w: list[str] = []
    _walk(plan, False, False, off_h, off_w)
    return off_h, off_w


def broadcast_hint_offenders(df: DataFrame) -> list[str]:
    """SF-scaling scans reachable from a broadcast hint in df's plan.

    Empty list == compliant. Each entry names the leaf class and the
    signature column(s) that identified the scaling table.
    """
    return _offenders(df)[0]


def all_plan_offenders(df: DataFrame) -> list[str]:
    """Both rules in one py4j walk, entries prefixed with the rule name."""
    off_h, off_w = _offenders(df)
    return [f"broadcast-hint:{o}" for o in off_h] + [
        f"global-window:{o}" for o in off_w
    ]


def global_window_offenders(df: DataFrame) -> list[str]:
    """SF-scaling scans feeding a partition-less Window in df's plan.

    A ``Window`` node with an empty partition spec executes as ONE task
    (Spark plans it as an Exchange SinglePartition + sort): correct at any
    SF, but a scale killer on an unbounded input. Global cumulative
    anything must go through ``operators.extensions.global_prefix_sum`` /
    ``grouped_prefix_rank`` instead (CLAUDE.md rule; r6 verdict item 3
    turns it into this standing gate). Aggregate / Deduplicate / Limit
    below the window exempt the subtree — partition-less windows over
    model-sized frames (calendar months, top-k pools, k-means cells) stay
    legal. Empty list == compliant.
    """
    return _offenders(df)[1]
