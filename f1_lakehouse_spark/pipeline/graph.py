"""Iterative graph analytics over the relational tables: PageRank.

Complements the connected-components operator (pipeline/dedup.py) with the
other canonical iterative-propagation workload. The graph is derived
relationally — suppliers are vertices, and an (undirected, deduplicated)
edge links two suppliers that co-supply at least one order — so the whole
pipeline (graph construction + iteration) stays inside the DataFrame API.

Determinism: ranks are FIXED-POINT int64 (scaled by 10^12) and every
update uses integer division, so each iteration is bit-exact across
engines, partitionings, and runs — no floating-point accumulation order
anywhere. The DuckDB oracle unrolls the same three iterations as CTEs,
which makes the *iterative algorithm itself* differentially checked, like
the recursive-CTE oracle for dedup_clusters.

Scale notes (the 100 TB lens):
- Graph construction: the order→pair expansion is bounded by
  lines-per-order (a small constant), so edge generation is linear in
  lineitem with one shuffle on l_orderkey; the DISTINCT edge collapse
  shuffles on the pair key.
- Each iteration is the Pregel shape: one join of edges (E rows) against
  ranks (V rows) and one groupBy(dst) — a shuffle on vertex key per
  iteration. V ≪ E, so at cluster scale the rank side is broadcast and
  the per-iteration cost is one map-side join + one aggregation over E.
- Fixed iteration count (3) keeps the lazy plan bounded; a convergence
  loop would checkpoint between iterations to cut lineage instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table

SCALE_FP = 10**12  # fixed-point scale: rank 1.0 == 10^12
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an integer ratio
N_ITER = 3

_PAGERANK_ORACLE = f"""
WITH lines AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM lines a JOIN lines b USING (l_orderkey)
  WHERE a.l_suppkey <> b.l_suppkey
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
params AS (
  SELECT COUNT(*) AS n_v,
         CAST({SCALE_FP} // COUNT(*) AS BIGINT) AS r_init,
         CAST(({DAMP_DEN - DAMP_NUM} * {SCALE_FP}) // ({DAMP_DEN} * COUNT(*)) AS BIGINT) AS base
  FROM deg
),
r0 AS (SELECT src AS v, r_init AS r FROM deg, params),
i1 AS (
  SELECT e.dst AS v,
         CAST((SELECT base FROM params)
              + ({DAMP_NUM} * SUM(r.r // d.outdeg)) // {DAMP_DEN} AS BIGINT) AS r
  FROM edges e JOIN r0 r ON r.v = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst
),
i2 AS (
  SELECT e.dst AS v,
         CAST((SELECT base FROM params)
              + ({DAMP_NUM} * SUM(r.r // d.outdeg)) // {DAMP_DEN} AS BIGINT) AS r
  FROM edges e JOIN i1 r ON r.v = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst
),
i3 AS (
  SELECT e.dst AS v,
         CAST((SELECT base FROM params)
              + ({DAMP_NUM} * SUM(r.r // d.outdeg)) // {DAMP_DEN} AS BIGINT) AS r
  FROM edges e JOIN i2 r ON r.v = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst
)
SELECT s.s_suppkey, s.s_name, r.r AS pagerank_fp,
       r.r / {SCALE_FP}.0 AS pagerank
FROM i3 r JOIN supplier s ON s.s_suppkey = r.v
ORDER BY s_suppkey
"""


@register(
    "graph_pagerank_suppliers",
    oracle=_PAGERANK_ORACLE,
    doc="3-iteration fixed-point PageRank on the supplier co-supply graph",
    tags=("graph", "iterative"),
)
def graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over suppliers that co-supply orders.

    Fixed-point int64 ranks (SCALE_FP) + integer division make every
    iteration bit-exact vs the unrolled-CTE oracle. 3 iterations, d=0.85.
    """
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select("l_orderkey", "l_suppkey").distinct()
    # self-join on a derived frame: persist AND materialize first
    lines = lines.persist()
    lines.count()
    edges = (
        lines.alias("a")
        .join(lines.alias("b"), "l_orderkey")
        .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .distinct()
    )
    # edges feed degree counts AND every iteration's join — cache once
    edges = edges.persist()
    edges.count()
    lines.unpersist()

    # rename the degree key so `src` exists ONLY in edges — the iteration
    # joins edges against frames derived from edges, and shared column
    # lineage would otherwise trip Spark's ambiguous-self-join check
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).select(
        F.col("src").alias("dv"), "outdeg"
    )
    deg = deg.persist()
    n_v = deg.count()  # single scalar; mirrors the oracle's params CTE

    r_init = SCALE_FP // n_v
    base = (DAMP_DEN - DAMP_NUM) * SCALE_FP // (DAMP_DEN * n_v)

    ranks = deg.select(F.col("dv").alias("v"), F.lit(r_init).cast("long").alias("r"))
    for _ in range(N_ITER):
        # contribution of each vertex: rank // outdeg (exact integer split)
        contrib = ranks.join(deg, F.col("v") == F.col("dv")).select(
            F.col("v").alias("u"), F.expr("r div outdeg").alias("c")
        )
        ranks = (
            edges.join(contrib, F.col("src") == F.col("u"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("v"),
                (F.lit(base) + F.expr(f"({DAMP_NUM} * s) div {DAMP_DEN}"))
                .cast("long")
                .alias("r"),
            )
        )

    sup = load_table(spark, sf_dir, "supplier")
    out = (
        ranks.join(sup, ranks["v"] == sup["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.col("r").alias("pagerank_fp"),
            (F.col("r") / F.lit(float(SCALE_FP))).alias("pagerank"),
        )
        .orderBy("s_suppkey")
    )
    out = out.persist()
    out.count()  # materialize before releasing the iteration caches
    edges.unpersist()
    deg.unpersist()
    return out


# --- triangle counting ----------------------------------------------------------------
# The third canonical graph workload (after propagation and components):
# per-vertex triangle participation on the supplier co-supply graph.
# Canonicalized (u < v) edges make each triangle materialize exactly once
# as (a < b < c): one two-hop join confined to edge endpoints + one
# closing-edge semi-check. At real scale the standard refinement is
# degree-ordering (orient edges from low- to high-degree vertex) so the
# two-hop fan-out is bounded by the SMALLER endpoint degree; the co-supply
# graph here is degree-bounded by orders-per-supplier so the plain
# canonical orientation suffices.

_TRIANGLE_ORACLE = """
WITH lines AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
und AS (
  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
  FROM lines a JOIN lines b USING (l_orderkey)
  WHERE a.l_suppkey < b.l_suppkey
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
member AS (
  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_triangles
FROM member m JOIN supplier s ON s.s_suppkey = m.v
GROUP BY 1, 2
"""


@register(
    "graph_triangle_count",
    oracle=_TRIANGLE_ORACLE,
    doc="per-supplier triangle participation on the co-supply graph: "
    "canonical (u<v) edges, one two-hop join + closing-edge check — each "
    "triangle counted exactly once",
    tags=("graph", "triangles"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select("l_orderkey", "l_suppkey").distinct()
    lines = lines.persist()
    lines.count()
    und = (
        lines.alias("a")
        .join(lines.alias("b"), "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
        .distinct()
    )
    und = und.persist()
    und.count()
    lines.unpersist()
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    # The dense co-supply graph yields ~C(k,3)-scale triangle rows (124M at
    # sf0.1) — NEVER materialize them: explode the three member roles
    # inline so the count partially aggregates map-side within the join
    # stage; the only triangle-scale data lives inside tasks and the
    # shuffle carries one row per vertex. (The previous persist + 3-way
    # unionAll wrote the 124M rows to cache and read them three times:
    # 18.7s -> the join cost alone.)
    # Broadcast both probe sides: the edge set is |E| rows of two longs
    # (~7 MB at sf0.1 — the dense-1000-vertex worst case), so the ~1.7e8
    # wedge stream never crosses an exchange — wedge build, closing-edge
    # check, role explode and partial aggregation all pipeline inside ONE
    # map stage, and the only shuffle carries one row per vertex. At
    # cluster scale this holds while |E| fits the broadcast budget
    # (~billions of edges per 8 GB); beyond that, fall back to the
    # degree-ordered shuffle join (see SCALE.md).
    tri = e1.join(F.broadcast(e2), "b").join(F.broadcast(e3), ["a", "c"])
    member = tri.select(F.explode(F.array("a", "b", "c")).alias("v"))
    counts = member.groupBy("v").agg(F.count("*").alias("n_triangles"))
    s = load_table(spark, sf_dir, "supplier")
    out = counts.join(s, counts["v"] == s["s_suppkey"]).select(
        "s_suppkey", "s_name", "n_triangles"
    )
    out = out.persist()
    out.count()
    und.unpersist()
    return out
