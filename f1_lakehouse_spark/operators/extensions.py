"""Spark-native operator extensions beyond the reference's surface
(SURVEY.md §2 notes these as absent-but-available): as-of join, range
(non-equi) join, pivot/unpivot, cube/rollup grouping sets, and approximate
sketches. Each is a first-class ``queries()`` entry; the approximate ops are
rows-only checked (no exact oracle exists by construction).
"""

from __future__ import annotations
from f1_lakehouse_spark.pinning import pin_small_result

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_lakehouse_spark.operators.aggregations import DSUM, dsum_i
from f1_lakehouse_spark.pipeline.hashing import (
    spark_salted_hash,
    sql_indexed_hash48,
    sql_md5_hash48,
    sql_salted_hash,
)
from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table


# --- as-of join -----------------------------------------------------------------
# Spark lacks a native AS OF join (DuckDB has one — which makes a perfect
# oracle). Composition: union both sides tagged, one window sorted by
# (key, ts) carrying last_value(ignorenulls) of the right side forward, then
# keep left rows. One shuffle on the key — the classic scalable shape; no
# per-group pandas needed.


@register(
    "join_asof_latest_order",
    oracle="""
WITH o1 AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS last_orderkey,
       o.o_orderdate AS last_orderdate
FROM events e
ASOF LEFT JOIN o1 o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
    doc="as-of join: each event matched to the user's latest order at-or-before "
    "ts. Determinism under ASOF ties (duplicate (custkey, orderdate) orders) "
    "comes from the window's TOTAL order (ts, side, o_orderkey): the "
    "carry-forward last() then always lands on MAX(o_orderkey) — same result "
    "as the oracle's pre-collapsed CTE, with no extra groupBy shuffle on the "
    "Spark side (one shuffle on the key total).",
    tags=("join", "asof", "extension"),
)
def join_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("k"), "ts"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
        "o_orderdate",
    )
    left = e.withColumns(
        {"side": F.lit(1), "o_orderkey": F.lit(None).cast("long"),
         "o_orderdate": F.lit(None).cast("timestamp")}
    )
    right = o.withColumns({"side": F.lit(0), "event_id": F.lit(None).cast("long")})
    unioned = left.select(
        "k", "ts", "side", "event_id", "o_orderkey", "o_orderdate"
    ).unionByName(right.select("k", "ts", "side", "event_id", "o_orderkey", "o_orderdate"))
    # right rows sort before left rows at equal ts (side 0 < 1) so ts-equality
    # means "at-or-before" — matching ASOF's >= semantics; o_orderkey as the
    # final sort key makes the order TOTAL, so among duplicate (k, ts) orders
    # the carried row is deterministically the max o_orderkey (right rows are
    # never partially null, so both carried columns come from that same row)
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "side", F.col("o_orderkey").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumns(
        {
            "last_orderkey": F.last("o_orderkey", ignorenulls=True).over(w),
            "last_orderdate": F.last("o_orderdate", ignorenulls=True).over(w),
        }
    )
    return (
        carried.filter(F.col("side") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            "ts",
            "last_orderkey",
            "last_orderdate",
        )
    )


# --- range (non-equi) join -------------------------------------------------------


@register(
    "join_range_value_to_size",
    oracle=f"""
SELECT p.p_size, COUNT(*) AS n_events, {DSUM("e.value")} AS total_value
FROM events e
JOIN (SELECT DISTINCT p_size FROM part) p
  ON e.value >= p.p_size - 0.5 AND e.value < p.p_size + 0.5
GROUP BY 1
""",
    doc="range join: events bucketed into part-size bands (broadcast nested loop)",
    tags=("join", "range", "extension"),
)
def join_range_value_to_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    p = load_table(spark, sf_dir, "part").select("p_size").distinct()
    joined = e.join(
        F.broadcast(p),
        (e["value"] >= p["p_size"] - 0.5) & (e["value"] < p["p_size"] + 0.5),
    )
    return joined.groupBy("p_size").agg(
        F.count("*").alias("n_events"), dsum_i("value", 2).alias("total_value")
    )


# --- pivot / unpivot -------------------------------------------------------------


@register(
    "pivot_status_by_flag",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(l_quantity AS DECIMAL(27,6)) END) AS DOUBLE) AS qty_F,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(l_quantity AS DECIMAL(27,6)) END) AS DOUBLE) AS qty_O
FROM lineitem GROUP BY 1
""",
    doc="pivot: l_linestatus values to columns (conditional-agg equivalent)",
    tags=("pivot", "extension"),
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double"))
        .withColumnsRenamed({"F": "qty_F", "O": "qty_O"})
    )


@register(
    "unpivot_customer_measures",
    oracle="""
SELECT c_custkey, 'acctbal' AS measure, c_acctbal AS val FROM customer
UNION ALL
SELECT c_custkey, 'nationkey' AS measure, CAST(c_nationkey AS DOUBLE) AS val FROM customer
""",
    doc="unpivot/melt: wide measures to (key, measure, val) long form",
    tags=("unpivot", "extension"),
)
def unpivot_customer_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "measure", "val")


# --- grouping sets: CUBE / ROLLUP -------------------------------------------------


@register(
    "cube_flag_status",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    doc="CUBE grouping sets (all 4 combinations, NULL = total)",
    tags=("cube", "extension"),
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@register(
    "rollup_year_month",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
       CAST(month(o_orderdate) AS INTEGER) AS m,
       COUNT(*) AS n
FROM orders GROUP BY ROLLUP (y, m)
""",
    doc="ROLLUP hierarchy (year, year+month, grand total)",
    tags=("rollup", "extension"),
)
def rollup_year_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .rollup("y", "m")
        .agg(F.count("*").alias("n"))
    )


# --- approximate sketches (exact-oracle via accuracy-contract booleans) ---

_APPROX_SKETCHES_ORACLE = """
SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(DISTINCT l_suppkey) AS exact_suppliers,
       TRUE AS parts_within_8pct,
       TRUE AS suppliers_within_8pct,
       TRUE AS p50_rank_within_1pct,
       TRUE AS p95_rank_within_1pct,
       TRUE AS p99_rank_within_1pct
FROM lineitem
"""


@register(
    "approx_sketches",
    oracle=_APPROX_SKETCHES_ORACLE,
    doc="approx_count_distinct (HLL++) + percentile_approx (GK sketch), "
    "hash-checkable: the estimator internals are engine-native, so the "
    "query emits the EXACT distinct counts plus the approximation "
    "accuracy contract as boolean columns (ACD within 8% rel. err "
    "[default rsd 5%, measured <=3% at sf0.001-0.1]; each approx "
    "percentile's true rank fraction within +-0.01 of its target "
    "[accuracy=10000 => rank err ~1e-4]). The oracle computes the exact "
    "counts and pins the contract columns TRUE.",
    tags=("approx", "extension"),
)
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch pass + a contract-check pass joined on a 1-row broadcast.

    100 TB shape: two scans of one column set; the sketch aggregate is a
    single row, broadcast to the rank-check scan. Nothing about the check
    grows with input size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sk = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_suppliers"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias("_q"),
    )
    probe = li.select("l_extendedprice").crossJoin(F.broadcast(sk))
    fracs = probe.agg(
        F.first("approx_parts").alias("approx_parts"),
        F.first("approx_suppliers").alias("approx_suppliers"),
        F.first("exact_parts").alias("exact_parts"),
        F.first("exact_suppliers").alias("exact_suppliers"),
        *[
            (
                F.sum(
                    F.when(
                        F.col("l_extendedprice") <= F.element_at("_q", i + 1), 1
                    ).otherwise(0)
                )
                / F.count("*")
            ).alias(f"_f{int(t * 100)}")
            for i, t in enumerate((0.5, 0.95, 0.99))
        ],
    )

    def _within(approx: str, exact: str, tol: float):
        a, e = F.col(approx).cast("double"), F.col(exact).cast("double")
        return F.abs(a - e) <= F.lit(tol) * e

    return fracs.select(
        "exact_parts",
        "exact_suppliers",
        _within("approx_parts", "exact_parts", 0.08).alias("parts_within_8pct"),
        _within("approx_suppliers", "exact_suppliers", 0.08).alias(
            "suppliers_within_8pct"
        ),
        *[
            (F.abs(F.col(f"_f{int(t * 100)}") - F.lit(t)) <= F.lit(0.01)).alias(
                f"p{int(t * 100)}_rank_within_1pct"
            )
            for t in (0.5, 0.95, 0.99)
        ],
    )


# --- mergeable HLL sketches (partial -> union re-aggregation) ----------------------


_HLL_MERGE_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS approx_within_5pct,
       TRUE AS union_within_2pct_of_direct
FROM events GROUP BY event_type
UNION ALL
SELECT '__all__' AS event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS approx_within_5pct,
       TRUE AS union_within_2pct_of_direct
FROM events
"""


@register(
    "hll_mergeable_distinct",
    oracle=_HLL_MERGE_ORACLE,
    doc="Datasketches HLL (lgK=12): per-group user sketches + a grand-total "
    "row re-aggregated by UNIONING the partial sketches (never rescanning "
    "raw rows). Hash-checkable: emits exact counts plus the accuracy "
    "contract as booleans (estimate within 5% of exact ~ 3x rsd at lgK=12, "
    "measured <=0.8% at sf0.001-0.1; union-of-partials estimate within 2% "
    "of the direct whole-table sketch — union through a target-lgK union "
    "object loses a little precision vs direct, measured 0.73% at sf0.1, "
    "so bit-equality is NOT the contract). The oracle computes exact counts "
    "and pins the contract columns TRUE. Bit-exact register twin: "
    "hll_register_sketch_exact.",
    tags=("approx", "extension", "hll"),
)
def hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB distinct-count pattern: materialize one small HLL sketch
    per (group), answer rollups by sketch UNION — each re-aggregation is
    O(groups × sketch bytes), not O(raw rows). Sketch union is commutative
    and the underlying hash deterministic, so estimates are stable under any
    partitioning/merge order; the contract booleans make them hash-gate safe.
    The direct whole-table sketch (for the mergeability check) is one extra
    1-row aggregate over the same scan."""
    e = load_table(spark, sf_dir, "events")
    partials = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 12).alias("sk"),
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    ok = lambda a, x: F.abs(a - x.cast("double")) <= F.lit(0.05) * x.cast("double")  # noqa: E731
    per_group = partials.select(
        "event_type",
        "n_events",
        "exact_users",
        ok(F.hll_sketch_estimate("sk"), F.col("exact_users")).alias(
            "approx_within_5pct"
        ),
        F.lit(True).alias("union_within_2pct_of_direct"),
    )
    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12)).alias("direct_est")
    )
    total = (
        partials.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("union_est"),
            F.sum("n_events").alias("n_events"),
        )
        .crossJoin(F.broadcast(direct))
        .crossJoin(
            F.broadcast(e.agg(F.countDistinct("user_id").alias("exact_users")))
        )
        .select(
            F.lit("__all__").alias("event_type"),
            F.col("n_events").cast("long").alias("n_events"),
            "exact_users",
            ok(F.col("union_est"), F.col("exact_users")).alias("approx_within_5pct"),
            (
                F.abs(F.col("union_est") - F.col("direct_est"))
                <= F.lit(0.02) * F.col("direct_est")
            ).alias("union_within_2pct_of_direct"),
        )
    )
    return per_group.unionByName(total)


# --- correlated scalar subquery (Catalyst decorrelation showcase) -------------------


_CORR_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM {orders} o
WHERE o_totalprice = (SELECT MAX(o2.o_totalprice)
                      FROM {orders} o2
                      WHERE o2.o_custkey = o.o_custkey)
"""


@register(
    "correlated_subquery_max_order",
    oracle=_CORR_SQL.format(orders="orders"),
    doc="correlated scalar subquery — Catalyst decorrelates to join+agg "
    "(SURVEY §4 'subquery decorrelation': delegated to the optimizer)",
    tags=("subquery", "extension", "sql-api"),
)
def correlated_subquery_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_corr")
    return spark.sql(_CORR_SQL.format(orders="orders_corr"))


_GSETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER)
           AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18, 2))) AS DOUBLE) AS sum_qty
FROM {lineitem}
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register(
    "grouping_sets_mixed",
    oracle=_GSETS_SQL.format(lineitem="lineitem"),
    doc="explicit GROUPING SETS (pair, partial, grand total) + GROUPING() "
    "disambiguator — distinct from CUBE/ROLLUP: only the requested sets "
    "materialize, one Expand + one shuffle; decimal-accumulated sum",
    tags=("grouping-sets", "extension", "sql-api"),
)
def grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(_GSETS_SQL.format(lineitem="lineitem_gs"))


@register(
    "json_roundtrip_events",
    oracle="""
WITH j AS (
    SELECT event_id,
           to_json(struct_pack(event_id := event_id,
                               event_type := event_type,
                               user_id := user_id))::VARCHAR AS payload
    FROM events
)
SELECT event_id,
       CAST(length(payload) AS INTEGER) AS json_len,
       json_extract_string(payload, '$.event_type') AS parsed_type,
       CAST(json_extract(payload, '$.user_id') AS BIGINT) AS parsed_user
FROM j
""",
    doc="semi-structured round-trip: struct -> JSON string -> field "
    "extraction (to_json / get_json_object). Int+string fields only — "
    "float JSON rendering differs across engines; JSON path extraction is "
    "JVM-native (Jackson), scan-speed",
    tags=("json", "extension"),
)
def json_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    j = e.select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type", "user_id")).alias("payload"),
    )
    return j.select(
        "event_id",
        F.length("payload").alias("json_len"),
        F.get_json_object("payload", "$.event_type").alias("parsed_type"),
        F.get_json_object("payload", "$.user_id").cast("long").alias("parsed_user"),
    )


# --- VARIANT semi-structured analytics (Spark 4) -----------------------------------


@register(
    "variant_events_extract",
    oracle="""
SELECT event_id,
       event_type AS vtype,
       user_id AS vuser,
       CAST(user_id % 5 AS BIGINT) AS vcode2,
       CAST(json_extract(props, '$.k') AS BIGINT) AS props_k
FROM events
""",
    doc="Spark 4 VARIANT path: struct -> JSON -> parse_json VARIANT -> "
    "typed variant_get extraction (nested object + array index), plus the "
    "real `props` JSON column through the same VARIANT path. The oracle "
    "recomputes every extracted value from the RAW columns, so the gate "
    "proves round-trip fidelity through the VARIANT encoding. At scale "
    "VARIANT is the semi-structured scan format: binary-encoded, "
    "shreddable, path access without per-row string re-parsing",
    tags=("json", "variant", "extension"),
)
def variant_events_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    payload = F.to_json(
        F.struct(
            F.col("event_id"),
            F.col("event_type"),
            F.struct(
                F.col("user_id"),
                F.array(F.col("event_id") % 7, F.col("user_id") % 5).alias("codes"),
            ).alias("meta"),
        )
    )
    j = e.select("event_id", "props", F.parse_json(payload).alias("v"))
    return j.select(
        "event_id",
        F.variant_get(F.col("v"), "$.event_type", "string").alias("vtype"),
        F.variant_get(F.col("v"), "$.meta.user_id", "long").alias("vuser"),
        F.variant_get(F.col("v"), "$.meta.codes[1]", "long").alias("vcode2"),
        F.variant_get(F.parse_json("props"), "$.k", "long").alias("props_k"),
    )


# --- CountMin sketch, built natively (distributed, mergeable, exact-checked) --------
# The third mergeable sketch family (HLL distinct / percentile digest /
# CountMin frequency). Implemented as pure DataFrame ops: each row fans
# out to CMS_D (row, bucket) cells, ONE partially-aggregated groupBy
# collapses them to the d x w cell table (<= 2048 rows regardless of
# corpus size — that aggregate IS the mergeable sketch), and point
# estimates are min over d cells via a broadcast join against the tiny
# sketch. Every step is deterministic md5-derived integer arithmetic, so
# unlike library sketches this one is EXACTLY differentially checked:
# the oracle rebuilds the identical sketch in SQL, including the
# guaranteed-overestimate property (cms_estimate >= exact_count).

CMS_D = 4  # hash rows
CMS_W = 512  # buckets per row


@register(
    "cms_heavy_hitters",
    oracle=f"""
WITH cells AS (
    SELECT i, {sql_indexed_hash48("i", "user_id", ":")}
               % {CMS_W} AS bucket,
           COUNT(*) AS c
    FROM events, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS i)
    GROUP BY 1, 2
),
exact AS (
    SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY 1
),
topk AS (
    SELECT user_id, exact_count FROM exact
    ORDER BY exact_count DESC, user_id LIMIT 10
),
est AS (
    SELECT t.user_id, MIN(c.c) AS cms_estimate
    FROM topk t, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS i) ii
    JOIN cells c
      ON c.i = ii.i
     AND c.bucket = {sql_indexed_hash48("ii.i", "t.user_id", ":")} % {CMS_W}
    GROUP BY 1
)
SELECT t.user_id, CAST(t.exact_count AS BIGINT) AS exact_count,
       CAST(e.cms_estimate AS BIGINT) AS cms_estimate,
       CAST(e.cms_estimate - t.exact_count AS BIGINT) AS overestimate
FROM topk t JOIN est e USING (user_id)
""",
    doc=f"CountMin sketch built natively: {CMS_D}x{CMS_W} cell table from ONE "
    "partially-aggregated groupBy (the mergeable sketch — bounded size at "
    "any corpus scale), heavy-hitter estimates = min over rows via "
    "broadcast join; deterministic hashing makes the whole sketch "
    "exact-oracle-checked, overestimate >= 0 guaranteed",
    tags=("approx", "sketch", "extension"),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_lakehouse_spark.pipeline.hashing import spark_indexed_hash48  # noqa: PLC0415

    e = load_table(spark, sf_dir, "events").select("user_id")

    def bucket(i_col, key_col):
        return spark_indexed_hash48(i_col, key_col, ":") % CMS_W

    rows = F.sequence(F.lit(0), F.lit(CMS_D - 1))
    # bucket aliased in a Project BEFORE the aggregate: the sketch is
    # (CMS_D x CMS_W)-bounded regardless of corpus size, and the aggregate
    # keyed on the pre-aliased bucket lets the plan lint see that (a
    # grouping expression referencing user_id inline would read as a
    # scaling-key aggregate)
    cells = (
        e.select("user_id", F.explode(rows).alias("i"))
        .select("i", bucket(F.col("i"), F.col("user_id")).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("c"))
    )
    exact = e.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    topk = exact.orderBy(F.desc("exact_count"), F.asc("user_id")).limit(10)
    probes = topk.select(
        "user_id", "exact_count", F.explode(rows).alias("i")
    ).select(
        "user_id",
        "exact_count",
        "i",
        bucket(F.col("i"), F.col("user_id")).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        "user_id",
        F.col("exact_count").cast("long").alias("exact_count"),
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
        (F.col("cms_estimate") - F.col("exact_count"))
        .cast("long")
        .alias("overestimate"),
    )


# --- XML round-trip + XPath (Spark 4 native XML) ------------------------------------


@register(
    "xml_roundtrip_events",
    oracle="""
SELECT event_id,
       event_type AS xml_type,
       user_id AS xml_user,
       user_id % 10 AS xpath_slot
FROM events
""",
    doc="native XML path: struct -> to_xml -> from_xml typed re-projection "
    "(StaxXmlParser, scan-speed JVM streaming parse). Oracle recomputes "
    "from RAW columns (round-trip fidelity proof, same gate as the "
    "VARIANT twin). Deliberately NOT xpath_*: the xpath functions build "
    "a DOM per row (~50x slower, measured 30 s vs 0.6 s on 100 k rows at "
    "sf0.1) — from_xml is the scale path; xpath stays covered by a "
    "small-frame pytest (test_xpath_matches_from_xml)",
    tags=("xml", "extension"),
)
def xml_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    x = e.select(
        "event_id",
        F.to_xml(
            F.struct(
                F.col("event_type"),
                F.col("user_id"),
                (F.col("user_id") % 10).alias("slot"),
            )
        ).alias("x"),
    )
    parsed = x.select(
        "event_id",
        F.from_xml("x", "event_type string, user_id bigint, slot bigint").alias("s"),
    )
    return parsed.select(
        "event_id",
        F.col("s.event_type").alias("xml_type"),
        F.col("s.user_id").alias("xml_user"),
        F.col("s.slot").alias("xpath_slot"),
    )


# --- native Bloom filter (semi-join prefilter sketch) --------------------------------
# Complements the sketch family (CMS above, HLL) and the runtime-filter
# joins (join_minmax_prefilter; the built-in bloom path is plan-asserted in
# tests/test_plans.py::test_runtime_bloom_filter_join): a Bloom filter built
# NATIVELY as K bit-positions per build key, OR-combined into W 32-bit words
# with one partially-aggregated groupBy — a fixed-size (W rows) mergeable
# sketch no matter how large the build side, broadcast to the probe side as
# the pre-shuffle membership test. Deterministic md5-derived positions make
# the whole sketch — including its false positives — exactly reproducible in
# DuckDB, so the FP accounting below is oracle-checked, not estimated.
# At 100 TB the pattern is: build the W-word bitmap from the dim-side keys
# (partial agg → W-row exchange), broadcast it, and drop non-member fact
# rows BEFORE the join shuffle; the exact join then clears false positives.

BLOOM_K = 3  # hash functions per key
BLOOM_WORDS = 512  # 32-bit words -> 16384 bits
BLOOM_BITS = BLOOM_WORDS * 32

_BLOOM_BUILD_PRED = "o_orderpriority = '1-URGENT'"


def _sql_bloom_pos(i_expr: str, key_expr: str) -> str:
    return sql_indexed_hash48(i_expr, key_expr, "#") + f" % {BLOOM_BITS}"


@register(
    "bloom_prefilter_stats",
    oracle=f"""
WITH build AS (
    SELECT DISTINCT o_custkey FROM orders WHERE {_BLOOM_BUILD_PRED}
),
bits AS (
    SELECT ({_sql_bloom_pos('i', 'o_custkey')}) AS bitpos
    FROM build, (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS i)
),
words AS (
    SELECT bitpos // 32 AS word, bit_or(1::BIGINT << (bitpos % 32)) AS w
    FROM bits GROUP BY 1
),
probe AS (
    SELECT c.c_custkey, i.i,
           ({_sql_bloom_pos('i.i', 'c.c_custkey')}) AS bitpos
    FROM customer c, (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS i) i
),
checks AS (
    SELECT p.c_custkey,
           CASE WHEN (COALESCE(w.w, 0) & (1::BIGINT << (p.bitpos % 32)))
                     = (1::BIGINT << (p.bitpos % 32))
                THEN 1 ELSE 0 END AS hit
    FROM probe p LEFT JOIN words w ON w.word = p.bitpos // 32
),
flags AS (
    SELECT ch.c_custkey,
           CASE WHEN SUM(ch.hit) = {BLOOM_K} THEN 1 ELSE 0 END AS bloom_pass,
           CASE WHEN MAX(b.o_custkey) IS NOT NULL THEN 1 ELSE 0 END AS member
    FROM checks ch LEFT JOIN build b ON b.o_custkey = ch.c_custkey
    GROUP BY 1
),
fill AS (SELECT SUM(bit_count(w)) AS n_set_bits FROM words)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
       CAST(SUM(bloom_pass) AS BIGINT) AS bloom_passed,
       CAST(SUM(member) AS BIGINT) AS true_members,
       CAST(SUM(CASE WHEN bloom_pass = 1 AND member = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS false_positives,
       CAST((SELECT n_set_bits FROM fill) AS BIGINT) AS n_set_bits
FROM flags
""",
    doc=f"native Bloom filter: {BLOOM_K} md5-derived bit positions per build "
    f"key OR-folded into {BLOOM_WORDS} 32-bit words by one partial-agg "
    "groupBy (fixed-size mergeable sketch), broadcast membership probe, "
    "exact-oracle-checked false-positive accounting",
    tags=("approx", "sketch", "prefilter", "extension"),
)
def bloom_prefilter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_lakehouse_spark.pipeline.hashing import spark_indexed_hash48  # noqa: PLC0415

    def bitpos(i_col, key_col):
        return spark_indexed_hash48(i_col, key_col, "#") % BLOOM_BITS

    ks = F.sequence(F.lit(0), F.lit(BLOOM_K - 1))

    # build feeds the words lineage, the member join and (via words) the
    # fill aggregate — persist both reused frames so the orders scan and
    # the bit_or fold run once (CLAUDE.md derived-frame join convention)
    build = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
        .persist()
    )
    build.count()
    # the sketch: one groupBy over word index — at most BLOOM_WORDS rows out
    # of the exchange regardless of build-side cardinality (map-side partial
    # bit_or does the folding)
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bitpos % 32 AS INT))")
    words = (
        build.select(F.explode(ks).alias("i"), "o_custkey")
        .select(bitpos(F.col("i"), F.col("o_custkey")).alias("bitpos"))
        .groupBy((F.col("bitpos") / 32).cast("long").alias("word"))
        .agg(F.bit_or(mask).alias("w"))
        .persist()
    )
    words.count()
    probe = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", F.explode(ks).alias("i"))
        .select("c_custkey", bitpos(F.col("i"), F.col("c_custkey")).alias("bitpos"))
    )
    checks = probe.join(
        F.broadcast(words),
        (F.col("bitpos") / 32).cast("long") == F.col("word"),
        "left",
    ).select(
        "c_custkey",
        (
            (F.coalesce(F.col("w"), F.lit(0)).bitwiseAND(mask)) == mask
        ).cast("int").alias("hit"),
    )
    # ground-truth membership join WITHOUT a broadcast hint: the distinct
    # build-key set is customer-proportional — forcing it into a broadcast
    # is exactly the scale mistake the Bloom sketch exists to avoid (the
    # SKETCH broadcasts, fixed-size; the exact set shuffles; AQE may still
    # broadcast it at bench scale where it fits)
    flags = (
        checks.groupBy("c_custkey")
        .agg((F.sum("hit") == BLOOM_K).cast("int").alias("bloom_pass"))
        .join(
            build.withColumn("member", F.lit(1)),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .select("bloom_pass", F.coalesce("member", F.lit(0)).alias("member"))
    )
    fill = words.agg(F.sum(F.bit_count("w")).alias("n_set_bits"))
    out = (
        flags.agg(
            F.count("*").cast("long").alias("n_probe"),
            F.sum("bloom_pass").cast("long").alias("bloom_passed"),
            F.sum("member").cast("long").alias("true_members"),
            F.sum(
                ((F.col("bloom_pass") == 1) & (F.col("member") == 0)).cast("int")
            ).cast("long").alias("false_positives"),
        )
        .crossJoin(F.broadcast(fill.select(F.col("n_set_bits").cast("long").alias("n_set_bits"))))
    )
    out = out.persist()
    out.count()
    words.unpersist()
    build.unpersist()
    return out


# --- skyline (Pareto frontier) --------------------------------------------------------
# The classic OLAP skyline operator (Borzsony/Kossmann/Stocker, ICDE'01):
# all parts not dominated on (minimize p_retailprice, minimize p_size).
# Distributed shape exploits skyline(S) = skyline(union of skyline(S_i)):
# phase 1 collapses each price to its min size (one shuffle) and computes a
# LOCAL frontier inside every hash partition via a per-partition sorted
# cummin window; phase 2 runs the same cummin over the few local survivors
# (frontier size << N) in a single ordered pass, then the tiny frontier
# broadcasts back to tag the original rows. No single-partition sort ever
# sees more than the survivor set; all comparisons are exact (no
# arithmetic), so the oracle can use the orthogonal NOT EXISTS dominance
# definition directly.

_SKYLINE_PARTS = 16  # phase-1 local-frontier parallelism


@register(
    "skyline_price_size",
    oracle="""
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
)
""",
    doc="Pareto frontier of parts on (min retailprice, min size): two-phase "
    "distributed skyline — per-partition sorted-cummin local frontiers, "
    "then one small global pass over survivors; oracle is the NOT EXISTS "
    "dominance definition (a different algorithm entirely)",
    tags=("extension", "skyline", "analytics"),
)
def skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    # collapse: within equal price only the min size can survive (equal-x
    # dominance); distinct prices make every window row's predecessors
    # strictly cheaper
    perx = p.groupBy("p_retailprice").agg(F.min("p_size").alias("min_size"))
    salt = (F.hash("p_retailprice") % _SKYLINE_PARTS + _SKYLINE_PARTS) % _SKYLINE_PARTS

    def frontier(df: DataFrame, part_cols: list) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy("p_retailprice")
            .rowsBetween(Window.unboundedPreceding, -1)
            if part_cols
            else Window.orderBy("p_retailprice").rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        prev = F.min("min_size").over(w)
        return df.withColumn("prev_min", prev).filter(
            F.col("prev_min").isNull() | (F.col("prev_min") > F.col("min_size"))
        ).drop("prev_min")

    local = frontier(perx.withColumn("slt", salt), ["slt"]).drop("slt")
    # survivors derive from the same part table being probed: persist AND
    # materialize the tiny frontier before building the join back
    # (CLAUDE.md derived-frame convention) so part is scanned once per side
    survivors = frontier(local, []).select(
        F.col("p_retailprice").alias("sky_price"),
        F.col("min_size").alias("sky_size"),
    ).persist()
    survivors.count()
    return (
        p.join(
            F.broadcast(survivors),
            (F.col("p_retailprice") == F.col("sky_price"))
            & (F.col("p_size") == F.col("sky_size")),
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


# --- nearest as-of join --------------------------------------------------------------
# The bidirectional variant of join_asof_latest_order: match each event to
# the user's TEMPORALLY CLOSEST order (before or after), the alignment
# telemetry pipelines need when sensors lag in either direction. DuckDB has
# no NEAREST asof, so the oracle is a LATERAL argmin (per-row sort over the
# user's orders — fine at oracle scale, quadratic at ours); the Spark shape
# stays the scalable one-shuffle union trick run in BOTH directions: one
# window carries the last order at-or-before, its mirror (same sort
# reversed) carries the first at-or-after, then an integer epoch-microsecond
# comparison picks the closer side (tie -> the earlier order, matching the
# oracle's ORDER BY). Same total-order discipline as the forward as-of:
# per-(custkey, date) orders pre-collapse to MAX(o_orderkey) inside the
# window via the o_orderkey tiebreak.


@register(
    "join_asof_nearest_order",
    oracle="""
WITH o1 AS (
  SELECT o_custkey,
         CAST(o_orderdate AS TIMESTAMP) + INTERVAL 27 YEAR AS aligned_ts,
         MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       n.o_orderkey AS nearest_orderkey,
       n.aligned_ts AS nearest_order_ts
FROM events e LEFT JOIN LATERAL (
    SELECT o.o_orderkey, o.aligned_ts
    FROM o1 o
    WHERE o.o_custkey = e.user_id
    ORDER BY abs(epoch_us(e.ts) - epoch_us(o.aligned_ts)), o.aligned_ts
    LIMIT 1
) n ON TRUE
""",
    doc="nearest as-of join: each event matched to the user's temporally "
    "closest order in either direction — two mirrored carry-forward windows "
    "over one union (one shuffle on the key), microsecond-exact integer "
    "distance pick, earlier-order tiebreak; oracle is a LATERAL argmin. "
    "Order dates are shifted +27y onto the events' time domain so orders "
    "exist on BOTH sides of every event and the differential gate "
    "exercises the before/after pick and its midpoint tie rule (without "
    "the shift the testdata's orders all predate every event and the "
    "after-side would be dead code under the gate)",
    tags=("join", "asof", "extension"),
)
def join_asof_nearest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("k"), "ts"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        (F.col("o_orderdate").cast("timestamp") + F.expr("INTERVAL 27 YEAR"))
        .alias("ts"),
        "o_orderkey",
    ).withColumn("aligned_ts", F.col("ts"))
    left = e.withColumns(
        {"side": F.lit(1), "o_orderkey": F.lit(None).cast("long"),
         "aligned_ts": F.lit(None).cast("timestamp")}
    )
    right = o.withColumns({"side": F.lit(0), "event_id": F.lit(None).cast("long")})
    cols = ["k", "ts", "side", "event_id", "o_orderkey", "aligned_ts"]
    unioned = left.select(*cols).unionByName(right.select(*cols))
    # before-window: right rows (side 0) sort ahead of the event at equal ts,
    # so at-or-before includes same-instant orders; o_orderkey tiebreak makes
    # the carried row the MAX orderkey of duplicate (k, date) orders
    wb = (
        Window.partitionBy("k")
        .orderBy("ts", "side", F.col("o_orderkey").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # after-window: the exact mirror (all sort keys reversed), so the carried
    # row is the first order at-or-after — with MAX orderkey on date ties
    wa = (
        Window.partitionBy("k")
        .orderBy(
            # ts/side mirrored; o_orderkey stays ASC so the carried row of a
            # duplicate-(k, date) block is still the MAX orderkey (the block's
            # last row in frame order), matching the oracle's pre-collapse
            F.col("ts").desc(), F.col("side").desc(),
            F.col("o_orderkey").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumns(
        {
            "bk": F.last("o_orderkey", ignorenulls=True).over(wb),
            "bd": F.last("aligned_ts", ignorenulls=True).over(wb),
            "ak": F.last("o_orderkey", ignorenulls=True).over(wa),
            "ad": F.last("aligned_ts", ignorenulls=True).over(wa),
        }
    ).filter(F.col("side") == 1)
    # microsecond-exact integer distances: unix_timestamp() truncates to
    # whole seconds and can flip the pick vs the oracle's exact epoch at
    # sub-second midpoints — unix_micros matches epoch_us bit-for-bit
    ets = F.unix_micros("ts")
    diff_b = ets - F.unix_micros("bd")
    diff_a = F.unix_micros("ad") - ets
    # pick the closer side; ties (diff_b == diff_a, distinct dates) go to
    # the earlier order — identical to the oracle's (abs, o_orderdate) sort
    use_before = F.col("ad").isNull() | (
        F.col("bd").isNotNull() & (diff_b <= diff_a)
    )
    return carried.select(
        "event_id",
        F.col("k").alias("user_id"),
        "ts",
        F.when(use_before, F.col("bk")).otherwise(F.col("ak")).alias("nearest_orderkey"),
        F.when(use_before, F.col("bd")).otherwise(F.col("ad")).alias("nearest_order_ts"),
    )


# --- Pareto / ABC classification (distributed global prefix sum) --------------------
# "Which parts make up the top 80% of revenue?" — the warehouse ABC
# analysis. The hard part at scale is the GLOBAL cumulative sum: a naive
# window over a global ORDER BY collapses to one partition. The two-phase
# prefix-sum shape used here stays parallel:
#
#   1. revenue per part (one shuffle, map-side combine), kept in DECIMAL
#      end-to-end so every later sum is exact and order-independent;
#   2. repartitionByRange on the cum order (rev DESC, partkey) — range
#      boundaries come from sampling and are NOT deterministic, but the
#      RESULT is: per-partition window cumsums + driver-side prefix
#      offsets of the per-partition totals (#partitions rows, a model-
#      sized collect) reconstruct the exact global cumsum under any
#      boundary placement because the order itself is total (unique
#      partkey tiebreak) and decimal addition is associative.
#
# Class thresholds apply to cum_share = cum/total, one double division at
# the end (identical inputs → identical IEEE result in both engines).

PARETO_A = 0.80
PARETO_B = 0.95
_PARETO_PARTS = 8


def _prefix_parts(spark: SparkSession, n_parts: int | None) -> int:
    """Range-partition count for the prefix-sum family. Explicit wins;
    otherwise the session's ``spark.sql.shuffle.partitions`` — which
    ``tables._autosize_for`` (invoked on every ``load_table``, so it also
    fires under the driver's vanilla session) derives from input volume
    via ``session.autosize_shuffle_partitions`` whenever the conf still
    holds Spark's untouched static default — with ``_PARETO_PARTS`` as the
    floor (the repo's size-knob rule: derive from input, constants are
    floors). A FIXED 8 would be a scale bug: at the 100 TB framing each
    range would hold terabytes for one task's sort. The conf value is
    clamped to ``session.SHUFFLE_PARTITIONS_CAP`` (a user-tuned conf above
    the cap must not balloon the driver hop), so the driver-side offsets
    stay O(cap) rows for the global helpers and O(cap x |groups|) for
    ``grouped_prefix_rank`` — the latter is why grouped callers need
    bounded group cardinality."""
    from f1_lakehouse_spark.session import SHUFFLE_PARTITIONS_CAP  # noqa: PLC0415

    if n_parts is not None:
        return n_parts
    try:
        conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # pragma: no cover - conf missing/non-numeric
        conf = 0
    return max(_PARETO_PARTS, min(conf, SHUFFLE_PARTITIONS_CAP))


def global_prefix_sum(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    order_cols: list,
    n_parts: int | None = None,
):
    """Exact distributed global cumulative sum of a DECIMAL column under a
    TOTAL order (callers must include a unique tiebreaker in
    ``order_cols``): range-repartition on the order, per-partition window
    cumsums, driver-side prefix offsets of the ``n_parts`` per-partition
    totals (a model-sized collect) broadcast back. Pure COUNT weights
    (rank passes) should be LONG ones, not decimal: long sums are exact
    for counts, shuffle 8 fewer bytes/row and accumulate in codegen; the
    returned ``cum`` is decimal(38,6) either way (long cum + decimal
    offset promotes identically), so consumers see the same dtype. Range boundaries come
    from sampling and are nondeterministic; the result is exact under any
    placement because the order is total and decimal addition associative.

    Returns ``(frame_with_cum, release, total)``: the frame carries the
    input columns plus ``cum``; ``total`` is the exact decimal grand total
    (the offsets loop's final accumulator — callers needing SUM(value)
    must NOT re-scan the source for it); call ``release()`` once
    downstream results have materialized (the range-partitioned input is
    persisted for its two derived uses, per the CLAUDE.md discipline)."""
    from decimal import Decimal  # noqa: PLC0415

    n_parts = _prefix_parts(spark, n_parts)
    r = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "pid", F.spark_partition_id()
    )
    r = r.persist()
    r.count()
    # structurally bounded collect: groupBy(pid) yields <= n_parts rows,
    # and n_parts <= SHUFFLE_PARTITIONS_CAP by _prefix_parts
    ptots = {
        row["pid"]: row["ptot"]
        for row in r.groupBy("pid")
        .agg(F.sum(value_col).alias("ptot"))
        .collect()
    }
    acc = Decimal(0)
    offsets = []
    for pid in range(n_parts):
        offsets.append((pid, acc))
        acc += ptots.get(pid, Decimal(0))
    offdf = spark.createDataFrame(offsets, "pid int, offset decimal(38,6)")
    w = Window.partitionBy("pid").orderBy(*order_cols)
    cum = (
        r.withColumn("cum_in", F.sum(value_col).over(w))
        .join(F.broadcast(offdf), "pid")
        .withColumn("cum", F.col("cum_in") + F.col("offset"))
        .drop("cum_in", "offset", "pid")
    )
    return cum, r.unpersist, acc


def grouped_prefix_rank(
    spark: SparkSession,
    df: DataFrame,
    group_cols: list,
    order_cols: list,
    n_parts: int | None = None,
    max_offset_rows: int = 4_000_000,
):
    """Exact per-group 1-based row rank under a TOTAL within-group order
    (callers must include a unique tiebreaker in ``order_cols``) — the
    grouped generalization of :func:`global_prefix_sum`, for SKEWED group
    keys where ``Window.partitionBy(group)`` would hand the dominant group
    (e.g. the majority language of a web corpus, ~half the rows) to one
    task.

    Shape: range-repartition on ``group_cols + order_cols`` (a big group
    spans several consecutive ranges, so no task ever sorts a whole
    dominant group); per-``(pid, group)`` ROW_NUMBER windows; driver-side
    prefix offsets of the per-``(pid, group)`` COUNTS. The offset table is
    ``n_parts x |groups|`` rows — callers must have BOUNDED group
    cardinality (it is collected and broadcast back, same contract as the
    per-partition totals in ``global_prefix_sum``). The contract is
    RUNTIME-ENFORCED: the collect is capped at ``max_offset_rows`` (a
    semantics-derived ceiling, generous for any bounded-cardinality
    caller: cap 20k partitions x a few hundred groups) and fails loudly —
    naming the scale-safe alternative — instead of silently OOMing the
    driver at 100 TB if a future caller passes a high-cardinality group.
    Boundaries come from sampling and are nondeterministic; the rank is
    exact under any placement because the within-group order is total.

    Returns ``(frame, release)``: the frame carries the input columns plus
    ``rank`` (1-based within group, LONG) and ``n_g`` (exact group size,
    LONG); call ``release()`` once downstream results have materialized.
    """
    from pyspark.sql.types import (  # noqa: PLC0415
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    group_cols = list(group_cols)
    n_parts = _prefix_parts(spark, n_parts)
    r = df.repartitionByRange(n_parts, *group_cols, *order_cols).withColumn(
        "pid", F.spark_partition_id()
    )
    r = r.persist()
    r.count()
    # limit(max+1) bounds the DRIVER TRANSFER itself (not just a post-hoc
    # check): a high-cardinality group key trips the assert after at most
    # max_offset_rows+1 rows cross, never an unbounded collect
    cnt_rows = (
        r.groupBy("pid", *group_cols).count().limit(max_offset_rows + 1).collect()
    )
    if len(cnt_rows) > max_offset_rows:
        r.unpersist()
        raise AssertionError(
            f"grouped_prefix_rank: offset table exceeds {max_offset_rows} rows "
            f"({n_parts} partitions x too many groups) — the group key is "
            "high-cardinality, which violates this helper's bounded-groups "
            "contract. High-cardinality groups do not skew: use a plain "
            "Window.partitionBy(*group_cols).orderBy(*order_cols) with "
            "row_number() instead (each group is small relative to the data, "
            "so the partitioned window distributes fine)."
        )
    per_group: dict[tuple, list] = {}
    for row in cnt_rows:
        per_group.setdefault(tuple(row[c] for c in group_cols), []).append(
            (row["pid"], row["count"])
        )
    off_rows, tot_rows = [], []
    # None-safe driver sort (a NULL group key is a legal group); order is
    # cosmetic — offsets are keyed, not positional
    for key, pairs in sorted(
        per_group.items(), key=lambda kv: tuple((v is None, v) for v in kv[0])
    ):
        acc = 0
        for pid, c in sorted(pairs):
            off_rows.append((pid, *key, acc))
            acc += c
        tot_rows.append((*key, acc))
    gfields = list(df.select(*group_cols).schema.fields)
    offdf = spark.createDataFrame(
        off_rows,
        StructType(
            [StructField("pid", IntegerType())]
            + gfields
            + [StructField("_rank_off", LongType())]
        ),
    )
    ngdf = spark.createDataFrame(
        tot_rows, StructType(gfields + [StructField("n_g", LongType())])
    )
    # join back on a STRUCT surrogate of the group key: struct equality is
    # null-safe field-wise, so rows of a NULL group are not silently
    # dropped the way a plain equi-join on the raw columns would drop them
    gk = F.struct(*group_cols)
    offdf = offdf.withColumn("_gk", gk).drop(*group_cols)
    ngdf = ngdf.withColumn("_gk", gk).drop(*group_cols)
    w = Window.partitionBy("pid", *group_cols).orderBy(*order_cols)
    ranked = (
        r.withColumn("_gk", gk)
        .withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(offdf), ["pid", "_gk"])
        .join(F.broadcast(ngdf), ["_gk"])
        .withColumn("rank", (F.col("_rn") + F.col("_rank_off")).cast("long"))
        .drop("_rn", "_rank_off", "pid", "_gk")
    )
    return ranked, r.unpersist


def _intdiv(a, b):
    """Exact integer division of LONG columns via ``(a - a % b) / b``.

    PRECONDITION: ``a - a % b`` < 2^53. The numerator is exactly divisible,
    but it passes through an int64→double conversion BEFORE the division,
    which itself rounds above 2^53 — so exactness holds only below that
    bound. All callers here divide ranks/row counts (≤ total row count;
    ~1e12 rows at the 100 TB framing, four orders of magnitude inside the
    9.0e15 bound), never free-form int64s (r7 ADVICE, low)."""
    return ((a - a % b) / b).cast("long")


def _ntile_from_rank_cols(rank, n, k: int):
    """SQL NTILE(k) bucket from a 1-based ``rank`` column and a per-group
    size COLUMN ``n`` — the column twin of :func:`_ntile_from_rank` (whose
    n is a Python int): the first n%k buckets hold ceil(n/k) rows."""
    kk = F.lit(k).cast("long")
    base = _intdiv(n, kk)
    rem = n % kk
    cut = rem * (base + F.lit(1))
    return F.when(rank <= cut, _intdiv(rank - 1, base + F.lit(1)) + 1).otherwise(
        rem + _intdiv(rank - cut - 1, F.greatest(base, F.lit(1))) + 1
    )


@register(
    "pareto_abc_parts",
    oracle=f"""
WITH rev AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS rev
    FROM lineitem GROUP BY 1
),
tot AS (SELECT SUM(rev) AS total FROM rev),
cum AS (
    SELECT l_partkey, rev,
           SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS c
    FROM rev
)
SELECT cum.l_partkey,
       CAST(cum.rev AS DOUBLE) AS revenue,
       CAST(cum.c AS DOUBLE) / CAST(t.total AS DOUBLE) AS cum_share,
       CASE WHEN CAST(cum.c AS DOUBLE) / CAST(t.total AS DOUBLE) <= {PARETO_A}
            THEN 'A'
            WHEN CAST(cum.c AS DOUBLE) / CAST(t.total AS DOUBLE) <= {PARETO_B}
            THEN 'B' ELSE 'C' END AS abc_class
FROM cum, tot t
""",
    doc="ABC/Pareto revenue classification per part: exact global "
    "cumulative share via the two-phase distributed prefix sum (range "
    "repartition + per-partition window + driver prefix offsets) — never "
    "a single-partition global window",
    tags=("extensions", "pareto", "prefix-sum"),
)
def pareto_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(27,6)"
            )
        ).alias("rev")
    )
    cum, release, total = global_prefix_sum(
        spark, rev, "rev", [F.col("rev").desc(), F.col("l_partkey").asc()]
    )
    # total is the prefix-sum's own exact decimal grand total — re-scanning
    # the source for SUM(rev) would be a whole extra aggregation of lineitem
    shared = cum.select(
        "l_partkey",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("cum").cast("double") / F.lit(total).cast("double")).alias(
            "cum_share"
        ),
    )
    out = shared.select(
        "l_partkey",
        "revenue",
        "cum_share",
        F.when(F.col("cum_share") <= PARETO_A, "A")
        .when(F.col("cum_share") <= PARETO_B, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    out = out.persist()
    out.count()
    release()
    return out


# --- weighted percentiles (second consumer of the distributed prefix sum) -----------
# Quantity-weighted price percentiles: the smallest price p whose
# cumulative weight reaches q of the total — inventory/pricing's
# "half the volume moves at or below this price". Exact and
# engine-lockstep with NO fractional arithmetic: the threshold test
# k*cum >= m*total uses integer-scaled decimal comparison only
# (q = m/k, e.g. 2*cum >= 1*total for p50), so no float rounding can
# disagree between engines. Same two-phase prefix-sum machinery as
# pareto_abc_parts; the order is total via (price, orderkey, linenumber).


@register(
    "weighted_percentile_price",
    oracle="""
WITH w AS (
    SELECT l_extendedprice AS price,
           CAST(l_quantity AS DECIMAL(27,6)) AS wt,
           l_orderkey, l_linenumber
    FROM lineitem
),
tot AS (SELECT SUM(wt) AS total FROM w),
cum AS (
    SELECT price,
           SUM(wt) OVER (ORDER BY price, l_orderkey, l_linenumber) AS c
    FROM w
)
SELECT 50 AS pct, MIN(price) AS price
FROM cum, tot t WHERE 2 * cum.c >= t.total
UNION ALL
SELECT 90 AS pct, MIN(price) AS price
FROM cum, tot t WHERE 10 * cum.c >= 9 * t.total
""",
    doc="quantity-weighted p50/p90 of price: distributed two-phase prefix "
    "sum (shared global_prefix_sum helper), integer-scaled decimal "
    "threshold tests — zero float comparisons",
    tags=("extensions", "percentile", "prefix-sum"),
)
def weighted_percentile_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("decimal(27,6)").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    cum, release, total = global_prefix_sum(
        spark,
        w,
        "wt",
        [F.col("price").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
    )
    # total comes back from the prefix sum itself (exact decimal) — no
    # second scan of lineitem for SUM(wt)
    tot_lit = F.lit(total)
    p50 = (
        cum.filter(2 * F.col("cum") >= tot_lit)
        .agg(F.min("price").alias("price"))
        .select(F.lit(50).alias("pct"), "price")
    )
    p90 = (
        cum.filter(10 * F.col("cum") >= 9 * tot_lit)
        .agg(F.min("price").alias("price"))
        .select(F.lit(90).alias("pct"), "price")
    )
    out = p50.unionByName(p90)
    out = out.persist()
    out.count()
    release()
    return out


# --- market-basket co-occurrence (association mining) -------------------------------
# Frequent part PAIRS across orders with support / confidence / lift — the
# association-rule primitive (recommendations, "bought together" analytics,
# and in corpus work the co-occurrence backbone of PMI embeddings). Pair
# generation stays inside each order: orders average a handful of lines, so
# the per-order pair fan-out is bounded by lines²/2 (map-only after one
# orderkey grouping); the oracle's a.partkey < b.partkey self-join is the
# quadratic single-node equivalent. Counts are exact integers; the three
# ratios are single IEEE divisions of identical inputs. Top pairs by
# support with a (pk_a, pk_b) tiebreak — a total order, TakeOrdered shape.

BASKET_TOP = 25


@register(
    "orders_market_basket",
    oracle=f"""
WITH per_order AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM per_order),
item AS (SELECT l_partkey, COUNT(*) AS item_n FROM per_order GROUP BY 1),
pairs AS (
    SELECT a.l_partkey AS pk_a, b.l_partkey AS pk_b, COUNT(*) AS pair_n
    FROM per_order a JOIN per_order b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
)
SELECT p.pk_a, p.pk_b, p.pair_n,
       CAST(p.pair_n AS DOUBLE) / t.n AS support,
       CAST(p.pair_n AS DOUBLE) / ia.item_n AS confidence_a_b,
       CAST(p.pair_n AS DOUBLE) * t.n / (ia.item_n * ib.item_n) AS lift
FROM pairs p
JOIN item ia ON ia.l_partkey = p.pk_a
JOIN item ib ON ib.l_partkey = p.pk_b
CROSS JOIN n_orders t
ORDER BY p.pair_n DESC, p.pk_a, p.pk_b
LIMIT {BASKET_TOP}
""",
    doc=f"market-basket pair mining: top-{BASKET_TOP} co-purchased part "
    "pairs with support/confidence/lift — in-order pair fan-out bounded "
    "by lines-per-order, shuffled item-count joins (AQE broadcasts when "
    "small), TakeOrdered",
    tags=("extensions", "basket", "association"),
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.select("l_orderkey", "l_partkey").distinct()
    per_order = per_order.persist()
    per_order.count()
    n_orders = per_order.agg(
        F.countDistinct("l_orderkey").alias("n")
    )
    item = per_order.groupBy("l_partkey").agg(F.count("*").alias("item_n"))
    # in-order pair generation: collect each order's part set (bounded by
    # lines-per-order), emit ordered pairs array-side — no self-join of the
    # full line table
    baskets = per_order.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("pks")
    )
    pairs_arr = F.filter(
        F.flatten(
            F.transform(
                F.col("pks"),
                lambda a: F.transform(
                    F.col("pks"), lambda b: F.struct(a.alias("pk_a"), b.alias("pk_b"))
                ),
            )
        ),
        lambda s: s["pk_a"] < s["pk_b"],
    )
    pairs = (
        baskets.select(F.explode(pairs_arr).alias("p"))
        .groupBy(F.col("p.pk_a").alias("pk_a"), F.col("p.pk_b").alias("pk_b"))
        .agg(F.count("*").alias("pair_n"))
    )
    ia = item.select(F.col("l_partkey").alias("pk_a"), F.col("item_n").alias("ia_n"))
    ib = item.select(F.col("l_partkey").alias("pk_b"), F.col("item_n").alias("ib_n"))
    # item counts are one row per DISTINCT part — unbounded at corpus
    # scale, so no broadcast hint: pairs is already shuffled on these keys
    # and AQE still broadcasts when the side is actually small
    out = (
        pairs.join(ia, "pk_a")
        .join(ib, "pk_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pk_a",
            "pk_b",
            "pair_n",
            (F.col("pair_n").cast("double") / F.col("n")).alias("support"),
            (F.col("pair_n").cast("double") / F.col("ia_n")).alias(
                "confidence_a_b"
            ),
            (
                F.col("pair_n").cast("double")
                * F.col("n")
                / (F.col("ia_n") * F.col("ib_n"))
            ).alias("lift"),
        )
        .orderBy(F.col("pair_n").desc(), "pk_a", "pk_b")
        .limit(BASKET_TOP)
    )
    out = out.persist()
    out.count()
    per_order.unpersist()
    return out


# --- Herfindahl–Hirschman concentration ---------------------------------------------
# Market-concentration analytics: per nation, the HHI of supplier revenue
# shares, sum((rev_i/T)^2). Fully INTEGER-EXACT: price*(1-discount) has
# exactly 4 decimal places, so per-supplier revenue in 1e-4 units is an
# exact BIGINT (a pure decimal scale shift, no rounding anywhere);
# squares run in wide integers (Spark decimal(38,0) multiply, DuckDB
# HUGEINT — both exact for values < 1e25) and only the final three
# numbers become doubles, from identical exact integers. Two earlier
# attempts are documented trap evidence: decimal-native squaring
# (Spark silently reduces scale past precision 38; DuckDB's int64-backed
# multiply overflows) and double->decimal(38,6) casts (Spark converts
# the double's shortest decimal representation, DuckDB the exact binary
# expansion — they disagree past 15 significant digits). One supplier-keyed aggregate + one
# nation-keyed aggregate; scale-free.


@register(
    "nation_revenue_hhi",
    oracle="""
WITH rev AS (
    SELECT s.s_nationkey, l.l_suppkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(19,4))) * 10000 AS BIGINT) AS ri
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY 1, 2
)
SELECT s_nationkey,
       COUNT(*) AS n_suppliers,
       CAST(SUM(ri) AS DOUBLE) / 10000 AS total_rev,
       CAST(SUM(CAST(ri AS HUGEINT) * CAST(ri AS HUGEINT)) AS DOUBLE)
           / (CAST(SUM(ri) AS DOUBLE) * CAST(SUM(ri) AS DOUBLE)) AS hhi
FROM rev GROUP BY 1
""",
    doc="supplier-revenue concentration (HHI) per nation: decimal-exact "
    "revenue squares over an exact total — one supplier aggregate + one "
    "nation aggregate, broadcast dim join",
    tags=("extensions", "concentration", "hhi"),
)
def nation_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            (
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(19,4)"
                    )
                )
                * 10000
            )
            .cast("long")
            .alias("ri")
        )
    )
    ri_wide = F.col("ri").cast("decimal(20,0)")
    tot = F.sum("ri").cast("double")
    sq = F.sum(ri_wide * ri_wide).cast("double")
    return rev.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        (tot / 10000).alias("total_rev"),
        (sq / (tot * tot)).alias("hhi"),
    )


# --- sweep-line: peak concurrent sessions -------------------------------------------
# "What was our peak concurrency, and when?" — the classic interval
# sweep: every session contributes +1 at its start and -1 at its end,
# the running sum over the GLOBAL time order is the instantaneous
# concurrency, and the answer is its argmax. The global running sum is
# the third consumer of `global_prefix_sum` (after Pareto shares and
# weighted percentiles) — never a single-partition window. Total order:
# (ts, delta DESC, user_id, session_id) — at an instant where one
# session ends and another starts, +1 processes first, i.e. touching
# sessions count as concurrent (closed intervals); ties broken by the
# unique (user, session) pair. Argmax tiebreak: earliest instant, then
# smallest user/session.

SESSION_GAP_US = 1_800_000_000  # 30 min, same as w_sessionize_events


@register(
    "events_peak_concurrency",
    oracle=f"""
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  OR LAG(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id,
           CAST(SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT) AS session_id,
           ts
    FROM flagged
),
bounds AS (
    SELECT user_id, session_id, MIN(ts) AS s0, MAX(ts) AS s1
    FROM sess GROUP BY 1, 2
),
deltas AS (
    SELECT user_id, session_id, s0 AS at_ts, 1 AS delta FROM bounds
    UNION ALL
    SELECT user_id, session_id, s1 AS at_ts, -1 AS delta FROM bounds
),
swept AS (
    SELECT at_ts, user_id, session_id,
           SUM(delta) OVER (ORDER BY at_ts, delta DESC, user_id, session_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS conc
    FROM deltas
)
SELECT CAST(conc AS BIGINT) AS peak_concurrency, at_ts
FROM swept
ORDER BY conc DESC, at_ts, user_id, session_id
LIMIT 1
""",
    doc="peak concurrent 30-min-gap sessions + the instant it happened: "
    "interval sweep (+1/-1 deltas) with the global running sum via the "
    "distributed prefix-sum helper — no single-partition window",
    tags=("extensions", "sweep", "prefix-sum"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_lakehouse_spark.tables import load_table as _lt

    e = _lt(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w_user))
                > SESSION_GAP_US
            )
            | F.lag("ts").over(w_user).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w_cum = w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.select(
        "user_id",
        F.sum("new_session").over(w_cum).cast("long").alias("session_id"),
        "ts",
    )
    bounds = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s0"), F.max("ts").alias("s1")
    )
    deltas = bounds.select(
        "user_id", "session_id", F.col("s0").alias("at_ts"), F.lit(1).alias("delta")
    ).unionByName(
        bounds.select(
            "user_id",
            "session_id",
            F.col("s1").alias("at_ts"),
            F.lit(-1).alias("delta"),
        )
    ).withColumn("delta_dec", F.col("delta").cast("decimal(27,6)"))
    cum, release, _total = global_prefix_sum(
        spark,
        deltas,
        "delta_dec",
        [
            F.col("at_ts").asc(),
            F.col("delta").desc(),
            F.col("user_id").asc(),
            F.col("session_id").asc(),
        ],
    )
    out = (
        cum.orderBy(
            F.col("cum").desc(),
            F.col("at_ts").asc(),
            F.col("user_id").asc(),
            F.col("session_id").asc(),
        )
        .limit(1)
        .select(F.col("cum").cast("long").alias("peak_concurrency"), "at_ts")
    )
    out = out.persist()
    out.count()
    release()
    return out

# --- RFM segmentation (distributed exact NTILE) -------------------------------------
# Classic customer segmentation: quintile scores for Recency / Frequency /
# Monetary. The textbook formulation is three NTILE(5) windows over GLOBAL
# orders — three single-partition sorts at cluster scale. Here each score
# comes from a distributed exact rank (the same range-partition + offset
# prefix-sum machinery as pareto_abc_parts, summing literal 1s) plus the
# closed-form NTILE bucket formula; the oracle keeps the plain NTILE
# windows, proving the distributed formulation bit-identical. Ranks order
# ascending with the unique custkey tiebreaker, so score 5 = most recent /
# most frequent / highest spend.

RFM_K = 5


def _ntile_from_rank(rank, n: int, k: int):
    """SQL NTILE(k) bucket for 1-based ``rank`` of ``n`` rows (driver-known
    Python int n): delegates to the column twin so the bucket formula
    lives in exactly one place (Catalyst constant-folds the literal n)."""
    return _ntile_from_rank_cols(rank, F.lit(n).cast("long"), k)


@register(
    "orders_rfm_segmentation",
    oracle=f"""
WITH rfm AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_ts, COUNT(*) AS freq,
         SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS monetary_d
  FROM orders GROUP BY 1
)
SELECT o_custkey, last_ts, freq, CAST(monetary_d AS DOUBLE) AS monetary,
       NTILE({RFM_K}) OVER (ORDER BY last_ts, o_custkey) AS r_score,
       NTILE({RFM_K}) OVER (ORDER BY freq, o_custkey) AS f_score,
       NTILE({RFM_K}) OVER (ORDER BY monetary_d, o_custkey) AS m_score
FROM rfm
""",
    doc="RFM quintile segmentation per customer: three exact NTILE(5) "
    "scores computed WITHOUT single-partition global windows — each rank "
    "is a distributed prefix sum of ones over a range-partitioned total "
    "order, mapped through the closed-form NTILE bucket formula",
    tags=("extensions", "rfm", "prefix-sum"),
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_ts"),
            F.count("*").alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("monetary_d"),
        )
        .withColumn("one", F.lit(1).cast("long"))
    )
    rfm = rfm.persist()
    rfm.count()  # materialize before the three derived prefix-sum scans

    def score(order_col: str, out_name: str) -> tuple[DataFrame, callable]:
        cum, release, total = global_prefix_sum(
            spark, rfm, "one", [F.col(order_col).asc(), F.col("o_custkey").asc()]
        )
        n = int(total)
        ranked = cum.select(
            "o_custkey",
            _ntile_from_rank(F.col("cum").cast("long"), n, RFM_K).alias(out_name),
        )
        return ranked, release

    r_s, rel_r = score("last_ts", "r_score")
    f_s, rel_f = score("freq", "f_score")
    m_s, rel_m = score("monetary_d", "m_score")
    out = (
        rfm.select(
            "o_custkey",
            "last_ts",
            "freq",
            F.col("monetary_d").cast("double").alias("monetary"),
        )
        .join(r_s, "o_custkey")
        .join(f_s, "o_custkey")
        .join(m_s, "o_custkey")
    )
    out = out.persist()
    out.count()
    rel_r(); rel_f(); rel_m()
    rfm.unpersist()
    return out


# --- year-over-year growth ----------------------------------------------------------
# Revenue per nation-year with LAG-based growth: the window partitions on
# nation (parallel across the grouping key, never global). Revenue stays
# DECIMAL through the aggregate; the growth ratio is one double division of
# exact inputs, IEEE-identical across engines.


@register(
    "nation_yoy_growth",
    oracle="""
WITH rev AS (
  SELECT n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS yr,
         SUM(CAST(o.o_totalprice AS DECIMAL(27,6))) AS rev_d
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, yr, CAST(rev_d AS DOUBLE) AS revenue,
       CAST(LAG(rev_d) OVER (PARTITION BY n_name ORDER BY yr) AS DOUBLE)
           AS prev_revenue,
       (CAST(rev_d AS DOUBLE)
        - CAST(LAG(rev_d) OVER (PARTITION BY n_name ORDER BY yr) AS DOUBLE))
       / CAST(LAG(rev_d) OVER (PARTITION BY n_name ORDER BY yr) AS DOUBLE)
           AS yoy_growth
FROM rev
""",
    doc="year-over-year revenue growth per nation: orders->customer shuffle "
    "join + broadcast nation dim, decimal-exact yearly revenue, LAG window "
    "partitioned by nation (no global sort)",
    tags=("extensions", "window", "yoy"),
)
def nation_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("rev_d"))
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag("rev_d").over(w).cast("double")
    return rev.select(
        "n_name",
        "yr",
        F.col("rev_d").cast("double").alias("revenue"),
        prev.alias("prev_revenue"),
        ((F.col("rev_d").cast("double") - prev) / prev).alias("yoy_growth"),
    )


# --- tolerance-bounded as-of join (attribution window) ------------------------------
# Same union+carry-forward shape as join_asof_latest_order, with a max-gap
# guard: each click is attributed to the user's latest prior purchase ONLY
# if it happened within the last 24 h. The gap test is integer microseconds
# (unix_micros / epoch_us) on both engines — no float time arithmetic.

ASOF_TOL_US = 86_400_000_000  # 24 h


@register(
    "join_asof_tolerance",
    oracle=f"""
WITH p1 AS (
  SELECT user_id, ts, MAX(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts,
       CASE WHEN epoch_us(c.ts) - epoch_us(p.ts) <= {ASOF_TOL_US}
            THEN p.purchase_id END AS attributed_purchase,
       CASE WHEN epoch_us(c.ts) - epoch_us(p.ts) <= {ASOF_TOL_US}
            THEN p.ts END AS purchase_ts
FROM clicks c
ASOF LEFT JOIN p1 p ON c.user_id = p.user_id AND c.ts >= p.ts
""",
    doc="as-of join with tolerance: click -> latest prior purchase within "
    "24 h, else NULL. One shuffle on user_id (union both sides + one "
    "carry-forward window); gap test in integer epoch-microseconds",
    tags=("join", "asof", "extension"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    left = clicks.withColumns(
        {"side": F.lit(1), "purchase_id": F.lit(None).cast("long"),
         "p_ts": F.lit(None).cast("timestamp")}
    )
    right = purchases.withColumns(
        {"side": F.lit(0), "event_id": F.lit(None).cast("long"),
         "p_ts": F.col("ts")}
    )
    cols = ["user_id", "ts", "side", "event_id", "purchase_id", "p_ts"]
    unioned = left.select(*cols).unionByName(right.select(*cols))
    # side 0 < 1 puts purchases first at equal ts (>= semantics); purchase_id
    # as last key totals the order so ties carry MAX(event_id), matching the
    # oracle's pre-collapsed p1 CTE
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", F.col("purchase_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumns(
        {
            "last_pid": F.last("purchase_id", ignorenulls=True).over(w),
            "last_pts": F.last("p_ts", ignorenulls=True).over(w),
        }
    )
    in_tol = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_pts"))
    ) <= ASOF_TOL_US
    return carried.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        "ts",
        F.when(in_tol, F.col("last_pid")).alias("attributed_purchase"),
        F.when(in_tol, F.col("last_pts")).alias("purchase_ts"),
    )


# --- distributed OLS trend (sufficient statistics) ----------------------------------
# Per-nation linear trend of daily revenue: OLS fitted from sufficient
# statistics (n, Sx, Sy, Sx2, Sxy, Sy2). Exactness discipline: x is an
# integer day index and every revenue-bearing statistic is scaled to a
# scale-0 integer decimal (x1e6; y² exactly as rev6², never a float
# floor — Spark's floor(double) returns LONG and saturates past 2^63), so the
# normal-equation numerators/denominators are computed EXACTLY in integer
# decimals (no decimal-scale inference differences between engines), then
# slope/intercept/r2 are a fixed tree of double ops on exact inputs
# (IEEE-identical). Two map-side-combined aggregates; output is
# model-sized (|nations| rows).

REG_EPOCH = "1995-01-01"


@register(
    "regression_nation_trend",
    oracle=f"""
WITH daily AS (
  SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
         SUM(CAST(o.o_totalprice AS DECIMAL(27,6))) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
st AS (
  SELECT n_name,
         COUNT(*) AS n,
         SUM(CAST(day - DATE '{REG_EPOCH}' AS BIGINT)) AS sx,
         SUM(CAST(day - DATE '{REG_EPOCH}' AS BIGINT)
             * CAST(day - DATE '{REG_EPOCH}' AS BIGINT)) AS sxx,
         SUM(CAST(rev * 1000000 AS DECIMAL(38,0))) AS sy6,
         SUM(CAST(day - DATE '{REG_EPOCH}' AS BIGINT)
             * CAST(rev * 1000000 AS DECIMAL(38,0))) AS sxy6,
         SUM(CAST(rev * 1000000 AS HUGEINT)
             * CAST(rev * 1000000 AS HUGEINT)) AS syy12
  FROM daily GROUP BY 1
),
ex AS (
  SELECT n_name, n, sx, sy6,
         CAST(CAST(n AS HUGEINT) * CAST(sxy6 AS HUGEINT)
              - CAST(sx AS HUGEINT) * CAST(sy6 AS HUGEINT) AS DOUBLE) AS num6,
         CAST(n * sxx - sx * sx AS DOUBLE) AS den,
         CAST(CAST(n AS HUGEINT) * syy12
              - CAST(sy6 AS HUGEINT) * CAST(sy6 AS HUGEINT) AS DOUBLE) AS deny12
  FROM st
)
SELECT n_name, n,
       round(num6 / (den * 1e6), 6) AS slope,
       round((CAST(sy6 AS DOUBLE) / 1e6
        - (num6 / (den * 1e6)) * CAST(sx AS DOUBLE)) / n, 6) AS intercept,
       round((num6 * num6) / (den * deny12), 9) AS r2
FROM ex
""",
    doc="per-nation OLS trend of daily revenue from sufficient statistics: "
    "scale-0 decimal-exact normal equations (no cross-engine decimal "
    "inference), fixed double op tree for slope/intercept/r2, two "
    "map-side-combined aggregates, model-sized output",
    tags=("extensions", "regression", "stats"),
)
def regression_nation_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    daily = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(nat), c["c_nationkey"] == nat["n_nationkey"])
        .groupBy("n_name", F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("rev"))
    )
    x = F.datediff(F.col("day"), F.lit(REG_EPOCH).cast("date")).cast("long")
    rev6 = (F.col("rev") * F.lit(1000000)).cast("decimal(38,0)")
    st = daily.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(rev6).alias("sy6"),
        F.sum(x * rev6).alias("sxy6"),
        F.sum(rev6 * rev6).alias("syy12"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    # every difference of near-equal statistics is computed EXACTLY in
    # scale-0 decimal (int128-class) BEFORE the one double cast — a double
    # subtraction of ~equal 1e30-range casts would cancel catastrophically
    # and diverge across engines (observed at sf0.1)
    num6 = (nd * F.col("sxy6") - F.col("sx").cast("decimal(38,0)") * F.col("sy6")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num6 / (den * F.lit(1e6))
    sy_d = F.col("sy6").cast("double")
    deny12 = (nd * F.col("syy12") - F.col("sy6") * F.col("sy6")).cast("double")
    return st.select(
        "n_name",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            (sy_d / F.lit(1e6) - slope * F.col("sx").cast("double")) / F.col("n"), 6
        ).alias("intercept"),
        F.round((num6 * num6) / (den * deny12), 9).alias("r2"),
    )


# --- exponential time-decay engagement score ----------------------------------------
# Recency-weighted per-user engagement: sum of value * 2^(-age_days), the
# feature-engineering staple for churn/propensity models. Exactness trick:
# the decay base is 2 with an INTEGER day exponent, so instead of dividing
# (whose decimal quantization rounds differently across engines at
# half-ulp ties), each term is SCALED UP by 2^(MAX-age) — value * 2^m is
# an exact IEEE double op, and the true product has exactly the value's 2
# decimals, so the decimal(38,2) cast is tie-free and engine-identical.
# The aggregate is then exact; one final division by the power-of-two
# constant (an exact IEEE op) recovers the score. Map-only terms + one
# user-keyed aggregate.

DECAY_ANCHOR = "2024-01-31"
DECAY_MAX_DAYS = 62  # 1 << k must stay in int64


@register(
    "events_time_decay_engagement",
    oracle=f"""
SELECT user_id,
       COUNT(*) AS n_events,
       round(CAST(SUM(CAST(round(value * 100, 0) AS DECIMAL(38,0))
                      * CAST(1 << ({DECAY_MAX_DAYS} - least(
                            CAST(DATE '{DECAY_ANCHOR}' - CAST(ts AS DATE) AS BIGINT),
                            {DECAY_MAX_DAYS})) AS BIGINT))
                  AS DOUBLE) / 100.0 / 4611686018427387904, 9)
           AS decayed_score
FROM events
GROUP BY 1
""",
    doc="per-user exponentially time-decayed engagement (half-life 1 day): "
    "power-of-two weights with integer day exponents, terms scaled to "
    "tie-free decimal(38,2) integers times the value's own scale - exact "
    "order-independent aggregate, one exact final division by 2^62",
    tags=("extensions", "events", "feature"),
)
def events_time_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    age = F.least(
        F.datediff(F.lit(DECAY_ANCHOR).cast("date"), F.col("ts").cast("date")).cast(
            "long"
        ),
        F.lit(DECAY_MAX_DAYS).cast("long"),
    )
    ev = ev.withColumn("m_exp", (F.lit(DECAY_MAX_DAYS) - age).cast("int"))
    # value has 2-decimal source data: round(value*100) is the exact integer
    # cents (tie-free), and cents * 2^m is exact in decimal(38,0)
    cents = F.round(F.col("value") * F.lit(100), 0).cast("decimal(38,0)")
    term = cents * F.expr("shiftleft(1L, m_exp)")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(term).cast("double") / F.lit(100.0) / F.lit(float(1 << 62)), 9
        ).alias("decayed_score"),
    )


# --- day-of-week seasonality index --------------------------------------------------
# Revenue seasonality: mean daily revenue per ISO weekday over the overall
# mean daily revenue. Exact decimal daily totals; the index is a ratio of
# two exact averages (identical double trees). ISO weekday avoids the
# engines' differing default week numbering (Spark dayofweek: Sun=1;
# DuckDB dow: Sun=0) — Spark weekday()+1 == DuckDB isodow.


@register(
    "orders_dow_seasonality",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS rev
  FROM orders GROUP BY 1
),
by_dow AS (
  SELECT CAST(isodow(day) AS INTEGER) AS iso_dow,
         COUNT(*) AS n_days, SUM(rev) AS rev_d
  FROM daily GROUP BY 1
),
tot AS (SELECT COUNT(*) AS n_all, SUM(rev) AS rev_all FROM daily)
SELECT iso_dow, n_days,
       round((CAST(rev_d AS DOUBLE) / n_days)
             / (CAST(rev_all AS DOUBLE) / n_all), 9) AS seasonality_index
FROM by_dow, tot
""",
    doc="ISO-weekday revenue seasonality index (mean daily revenue over "
    "overall mean): two decimal-exact aggregates, 7-row output, 1-row "
    "grand total broadcast back",
    tags=("extensions", "seasonality"),
)
def orders_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("rev")
    )
    daily = daily.persist()
    daily.count()  # two derived aggregates (CLAUDE.md)
    by_dow = daily.groupBy(
        (F.weekday("day") + F.lit(1)).cast("int").alias("iso_dow")
    ).agg(F.count("*").alias("n_days"), F.sum("rev").alias("rev_d"))
    tot = daily.agg(F.count("*").alias("n_all"), F.sum("rev").alias("rev_all"))
    out = by_dow.crossJoin(F.broadcast(tot)).select(
        "iso_dow",
        "n_days",
        F.round(
            (F.col("rev_d").cast("double") / F.col("n_days"))
            / (F.col("rev_all").cast("double") / F.col("n_all")),
            9,
        ).alias("seasonality_index"),
    )
    out = out.persist()
    out.count()
    daily.unpersist()
    return out


# --- log2 value histogram -----------------------------------------------------------
# Stream-health monitoring: the log2 histogram of event values (integer
# cents, binary-length buckets — engine-exact, no float log). Map-only
# bucketing + one aggregate; |buckets| output rows at any volume.


@register(
    "events_value_histogram_log2",
    oracle="""
SELECT CAST(CASE WHEN CAST(round(value * 100, 0) AS BIGINT) <= 0 THEN -1
            ELSE length(bin(CAST(round(value * 100, 0) AS BIGINT))) - 1
            END AS INTEGER) AS log2_cents,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM events
GROUP BY 1
""",
    doc="log2 histogram of event values (exact integer cents, binary-length "
    "buckets, no float log): map-only bucketing, |buckets| output rows",
    tags=("extensions", "events", "diagnostics"),
)
def events_value_histogram_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * F.lit(100), 0).cast("long")
    bucket = F.when(cents <= 0, F.lit(-1)).otherwise(
        F.length(F.bin(cents)) - F.lit(1)
    )
    return ev.groupBy(bucket.cast("int").alias("log2_cents")).agg(
        F.count("*").alias("n"),
        F.sum(cents).cast("long").alias("total_cents"),
    )


# --- ratio-to-report window ---------------------------------------------------------
# The share-of-total window vocabulary: each supplier's revenue share
# within its nation — SUM() OVER (PARTITION BY nation) as the denominator,
# no join. Decimal-exact partition sums; one double division. Partitioned
# by nation: parallel across nations at any scale.


@register(
    "w_ratio_to_report",
    oracle="""
WITH srev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6)))
             AS rev
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
)
SELECT s_nationkey, l_suppkey,
       CAST(rev AS DOUBLE) AS revenue,
       round(CAST(rev AS DOUBLE)
             / CAST(SUM(rev) OVER (PARTITION BY s_nationkey) AS DOUBLE), 9)
           AS nation_share
FROM srev
""",
    doc="ratio-to-report: supplier revenue share within nation via a "
    "PARTITION BY window sum (no self-join), decimal-exact partition "
    "totals, parallel across nations",
    tags=("window", "ratio", "extension"),
)
def w_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    srev = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(27,6)"
                )
            ).alias("rev")
        )
    )
    w = Window.partitionBy("s_nationkey")
    return srev.select(
        "s_nationkey",
        "l_suppkey",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w).cast("double"), 9
        ).alias("nation_share"),
    )


# --- watermark late-data audit (distributed global running max) ---------------------
# Streaming-semantics audit run as a batch query: treating event_id as the
# ARRIVAL order, an event would be dropped by a Structured Streaming
# watermark of W if its event time is older than (max event time seen
# before it) - W. The global exclusive running max is the same two-phase
# shape as global_prefix_sum: range-repartition on arrival order,
# per-partition exclusive-max windows, driver-side prefix maxima of the
# per-partition totals broadcast back — never a single-partition window.
# Max is associative+commutative, so the result is exact under any range
# boundary placement.

WATERMARK_US = 600_000_000  # 10 min
NET_DELAY_S = 1800  # simulated arrival jitter: 0..30 min


def global_prefix_max(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    order_cols: list,
    n_parts: int | None = None,
):
    """Exact distributed EXCLUSIVE global running max of an int64 column
    under a TOTAL order: the frame gains ``excl_max`` (NULL for the global
    first row). Returns (frame, release). ``n_parts`` defaults to the
    session's (autosized) shuffle-partition count via ``_prefix_parts``."""
    n_parts = _prefix_parts(spark, n_parts)
    r = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "pid", F.spark_partition_id()
    )
    r = r.persist()
    r.count()
    # structurally bounded collect: groupBy(pid) yields <= n_parts rows,
    # and n_parts <= SHUFFLE_PARTITIONS_CAP by _prefix_parts
    ptots = {
        row["pid"]: row["pmax"]
        for row in r.groupBy("pid").agg(F.max(value_col).alias("pmax")).collect()
    }
    run = None
    offsets = []  # (pid, max over all earlier partitions)
    for pid in range(n_parts):
        offsets.append((pid, run))
        cur = ptots.get(pid)
        if cur is not None and (run is None or cur > run):
            run = cur
    offdf = spark.createDataFrame(offsets, "pid int, offset long")
    w = (
        Window.partitionBy("pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        r.withColumn("local_excl", F.max(value_col).over(w))
        .join(F.broadcast(offdf), "pid")
        .withColumn("excl_max", F.greatest("local_excl", "offset"))
        .drop("local_excl", "offset", "pid")
    )
    return out, r.unpersist


@register(
    "events_late_data_audit",
    oracle=f"""
WITH arr AS (
  SELECT event_id, event_type, epoch_us(ts) AS ts_us,
         epoch_us(ts) + ({sql_salted_hash("event_id", ":net")} % {NET_DELAY_S})
           * 1000000 AS arrival_us
  FROM events
),
wm AS (
  SELECT event_id, event_type, ts_us,
         MAX(ts_us) OVER (ORDER BY arrival_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS excl_max
  FROM arr
)
SELECT event_type,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN excl_max - {WATERMARK_US} > ts_us
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(MAX(CASE WHEN excl_max > ts_us THEN excl_max - ts_us
                     ELSE 0 END) AS BIGINT) AS max_lateness_us
FROM wm GROUP BY 1
""",
    doc=f"watermark late-data audit ({WATERMARK_US // 60_000_000} min): "
    "events that a Structured Streaming watermark would drop, via an "
    "exact DISTRIBUTED exclusive running max over arrival order "
    "(range repartition + pid windows + driver prefix maxima — no "
    "single-partition window); per-type drop counts and max lateness",
    tags=("extensions", "events", "streaming-audit", "prefix-sum"),
)
def events_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    # deterministic simulated network delay (0..30 min, salted hash):
    # events in this synthetic stream are generated in time order, so with
    # arrival == event order no watermark ever drops — the jitter recreates
    # the out-of-order arrival a real collector sees, reproducibly
    e = e.withColumn(
        "arrival_us",
        F.col("ts_us")
        + (spark_salted_hash("event_id", ":net") % NET_DELAY_S) * F.lit(1_000_000),
    )
    wm, release = global_prefix_max(
        spark, e, "ts_us", [F.col("arrival_us").asc(), F.col("event_id").asc()]
    )
    dropped = F.when(
        F.col("excl_max") - F.lit(WATERMARK_US) > F.col("ts_us"), 1
    ).otherwise(0)
    lateness = F.when(
        F.col("excl_max") > F.col("ts_us"), F.col("excl_max") - F.col("ts_us")
    ).otherwise(F.lit(0))
    out = wm.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(dropped).cast("long").alias("n_dropped"),
        F.max(lateness).cast("long").alias("max_lateness_us"),
    )
    out = out.persist()
    out.count()
    release()
    return out


# --- inter-arrival median gap -------------------------------------------------------
# Per-customer median days between consecutive orders (reorder cadence).
# Gaps via a LAG window partitioned per customer; the median is exact —
# integer day gaps, and the even-count midpoint average of two int64s is
# an exact IEEE double in both engines. Window + aggregate share the
# customer partitioning: one shuffle total.


@register(
    "orders_interarrival_median",
    oracle="""
WITH gaps AS (
  SELECT o_custkey,
         CAST(CAST(o_orderdate AS DATE)
              - LAG(CAST(o_orderdate AS DATE))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS gap_d
  FROM orders
)
SELECT o_custkey, COUNT(gap_d) AS n_gaps,
       MEDIAN(gap_d) AS median_gap_days,
       CAST(MAX(gap_d) AS BIGINT) AS max_gap_days
FROM gaps
WHERE gap_d IS NOT NULL
GROUP BY 1
""",
    doc="per-customer median/max days between consecutive orders: LAG "
    "window + aggregate on one customer shuffle; integer day gaps make "
    "the even-count median midpoint an exact IEEE average",
    tags=("extensions", "window", "median"),
)
def orders_interarrival_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        (
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            )
        )
        .cast("long")
        .alias("gap_d"),
    ).filter(F.col("gap_d").isNotNull())
    return gaps.groupBy("o_custkey").agg(
        F.count("gap_d").alias("n_gaps"),
        F.median("gap_d").alias("median_gap_days"),
        F.max("gap_d").cast("long").alias("max_gap_days"),
    )


# --- event-rate spike detection -----------------------------------------------------
# Peak minutes: top-5 minutes by event count — the on-call "when did it
# spike" query. Minute truncation map-side, one count aggregate,
# TakeOrdered with the minute as tiebreaker.

SPIKE_TOP = 5


@register(
    "events_top_minute_rate",
    oracle=f"""
SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
ORDER BY n_events DESC, minute
LIMIT {SPIKE_TOP}
""",
    doc=f"top-{SPIKE_TOP} spike minutes by event count: map-side minute "
    "truncation + one combined count + TakeOrdered",
    tags=("extensions", "events", "diagnostics"),
)
def events_top_minute_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.col("n_events").desc(), F.col("minute").asc())
        .limit(SPIKE_TOP)
    )


# --- Wilson-interval reliability ranking --------------------------------------------
# Rank suppliers by return rate with small-sample honesty: the Wilson score
# lower bound, not the raw rate (a supplier with 1/2 returns must not
# outrank one with 40/100). Determinism: counts are exact integers; the
# interval is a FIXED tree of double ops on them — sqrt is IEEE
# correctly-rounded in both engines, so identical inputs give identical
# bounds; output rounded to 9 (bounds are in [0,1], well inside double
# precision). One broadcast-dim join + one aggregate.

WILSON_Z = 1.959963984540054  # 97.5th normal quantile, pinned literal
WILSON_TOP = 25


@register(
    "supplier_return_rate_wilson",
    oracle=f"""
WITH per_s AS (
  SELECT l_suppkey,
         COUNT(*) AS n_lines,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returns
  FROM lineitem GROUP BY 1
)
SELECT l_suppkey, n_lines, n_returns,
       round(CAST(n_returns AS DOUBLE) / n_lines, 9) AS return_rate,
       round(((CAST(n_returns AS DOUBLE) / n_lines)
              + {WILSON_Z} * {WILSON_Z} / (2 * n_lines)
              - {WILSON_Z} * sqrt(((CAST(n_returns AS DOUBLE) / n_lines)
                                   * (1 - CAST(n_returns AS DOUBLE) / n_lines)
                                   + {WILSON_Z} * {WILSON_Z} / (4 * n_lines * n_lines))
                                  / n_lines))
             / (1 + {WILSON_Z} * {WILSON_Z} / n_lines), 9) AS wilson_low
FROM per_s
ORDER BY wilson_low DESC, l_suppkey
LIMIT {WILSON_TOP}
""",
    doc=f"top-{WILSON_TOP} suppliers by Wilson lower bound of the return "
    "rate (small-sample-honest ranking): exact integer counts, fixed "
    "double tree with correctly-rounded sqrt, TakeOrdered",
    tags=("extensions", "stats", "ranking"),
)
def supplier_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_s = li.groupBy("l_suppkey").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("n_returns"),
    )
    z = F.lit(WILSON_Z)
    n = F.col("n_lines")
    p = F.col("n_returns").cast("double") / n
    low = (
        p
        + z * z / (2 * n)
        - z * F.sqrt((p * (1 - p) + z * z / (4 * n * n)) / n)
    ) / (1 + z * z / n)
    return (
        per_s.select(
            "l_suppkey",
            "n_lines",
            "n_returns",
            F.round(p, 9).alias("return_rate"),
            F.round(low, 9).alias("wilson_low"),
        )
        .orderBy(F.col("wilson_low").desc(), F.col("l_suppkey").asc())
        .limit(WILSON_TOP)
    )


# --- deterministic HLL: from-scratch register sketch with an EXACT oracle -----------
# The datasketches ops above (`approx_sketches`, `hll_mergeable_distinct`)
# hash-check their accuracy CONTRACT (exact counts + oracle-pinned booleans)
# because their estimator internals are engine-native. This op closes even
# that gap — a from-scratch HyperLogLog whose
# whole computation is cross-engine EXACT: md5-derived 48-bit hashes, integer
# register indexes/ranks (via the unpadded `bin()` both engines share), the
# harmonic denominator kept as a scaled BIGINT (every 2^-M term is dyadic,
# so the scaled sum is exact integer arithmetic), and an estimate built from
# IEEE-only ops (one divide, two multiplies — no transcendentals), which is
# therefore bit-identical in Spark and DuckDB.
#
# 100 TB shape: one shuffle to (group, register) with map-side partial MAX;
# the register table is <= groups x 1024 rows regardless of input size, and
# every rollup after that is over register tables, never raw rows. The
# `__merged__` row is computed by max-merging the per-group register tables
# and provably equals the `__direct__` row computed from raw rows — the
# mergeability contract, checked by the oracle as data.

_HLL_P = 10           # 2^10 = 1024 registers
_HLL_M = 1 << _HLL_P
_HLL_RHO_MAX = 39     # 48-bit hash - 10 index bits = 38 value bits, rho in [1, 39]
_HLL_SCALE = 1 << _HLL_RHO_MAX  # 549755813888: harmonic sum scaled to integers

_HLL_EST = (
    "(0.7213 / (1.0 + 1.079 / 1024.0)) * 1048576.0 * 549755813888.0"
    " / CAST({h} AS DOUBLE)"
)
# Small-range (linear counting) correction. `ln` is NOT bit-stable across
# engines (JVM Math.log vs libm differ in the last ulp on 82 of the 1023
# possible inputs), so the corrected estimate is rounded to an integer:
# the closest any of the 1023 possible ln inputs comes to a .5 rounding
# boundary is 6.7e-6 (exhaustively checked in tests/test_round4.py), six
# orders of magnitude above the 1-ulp drift — rounding is provably stable.
_HLL_CORRECTED = (
    "CASE WHEN " + _HLL_EST + " <= 2560.0 AND {u} < 1024"
    " THEN round(1024.0 * ln(1024.0 / CAST(1024 - {u} AS DOUBLE)), 0)"
    " ELSE " + _HLL_EST + " END"
)


def _hll_sql_est(present: str, used: str) -> str:
    h = f"({present} + (1024 - {used}) * CAST({_HLL_SCALE} AS BIGINT))"
    return _HLL_CORRECTED.format(h=h, u=used)


_HLL_ORACLE = f"""
WITH base AS (
  SELECT event_type,
         {sql_md5_hash48("CAST(user_id AS VARCHAR)")} AS h
  FROM events WHERE user_id IS NOT NULL
), bits AS (
  SELECT event_type, h & {_HLL_M - 1} AS idx, h >> {_HLL_P} AS rest FROM base
), rhos AS (
  SELECT event_type, idx,
         CASE WHEN rest = 0 THEN {_HLL_RHO_MAX}
              ELSE {_HLL_RHO_MAX} - length(bin(rest)) END AS rho
  FROM bits
), regs AS (
  SELECT event_type, idx, MAX(rho) AS m FROM rhos GROUP BY event_type, idx
), stats AS (
  SELECT event_type AS scope,
         CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_RHO_MAX} - m)) AS BIGINT) AS present_scaled,
         COUNT(*) AS used_registers
  FROM regs GROUP BY event_type
  UNION ALL
  SELECT '__merged__' AS scope,
         CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_RHO_MAX} - m)) AS BIGINT) AS present_scaled,
         COUNT(*) AS used_registers
  FROM (SELECT idx, MAX(m) AS m FROM regs GROUP BY idx)
  UNION ALL
  SELECT '__direct__' AS scope,
         CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_RHO_MAX} - m)) AS BIGINT) AS present_scaled,
         COUNT(*) AS used_registers
  FROM (SELECT idx, MAX(rho) AS m FROM rhos GROUP BY idx)
), exacts AS (
  SELECT event_type AS scope, COUNT(DISTINCT user_id) AS exact_users
  FROM events WHERE user_id IS NOT NULL GROUP BY event_type
  UNION ALL
  SELECT s AS scope, (SELECT COUNT(DISTINCT user_id) FROM events WHERE user_id IS NOT NULL) AS exact_users
  FROM (VALUES ('__merged__'), ('__direct__')) t(s)
)
SELECT s.scope,
       {_hll_sql_est("s.present_scaled", "s.used_registers")} AS approx_users,
       e.exact_users,
       s.used_registers,
       CAST(s.present_scaled + ({_HLL_M} - s.used_registers) * CAST({_HLL_SCALE} AS BIGINT) AS BIGINT)
         AS harmonic_scaled
FROM stats s JOIN exacts e ON s.scope = e.scope
"""


@register(
    "hll_register_sketch_exact",
    oracle=_HLL_ORACLE,
    doc="from-scratch HyperLogLog (p=10) whose estimate is cross-engine "
    "EXACT: md5 48-bit hash, integer register ranks, scaled-BIGINT harmonic "
    "sum, IEEE-only estimator. Emits per-group sketches plus __merged__ "
    "(max-merge of per-group registers) and __direct__ (raw-row) rollups, "
    "which are equal — the mergeability contract as checkable data.",
    tags=("approx", "sketch", "hll", "extension"),
)
def hll_register_sketch_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HLL register sketch; see _HLL_ORACLE for the exact twin.

    Reference parity: the reference answers distinct-user questions with
    plain COUNT(DISTINCT) (dbt gold models); this provides the 100 TB
    mergeable-sketch path with an exactness guarantee the native
    datasketches ops cannot offer.
    """
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
    )
    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    base = e.select(
        "event_type",
        h.bitwiseAND(F.lit(_HLL_M - 1)).alias("idx"),
        F.shiftright(h, _HLL_P).alias("rest"),
    )
    rhos = base.select(
        "event_type",
        "idx",
        F.when(F.col("rest") == 0, F.lit(_HLL_RHO_MAX))
        .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.bin(F.col("rest"))))
        .cast("int")
        .alias("rho"),
    )
    regs = rhos.groupBy("event_type", "idx").agg(F.max("rho").alias("m"))

    scale = F.lit(_HLL_SCALE).cast("long")
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - m)")

    def _stats(frame: DataFrame, keys: list[str]) -> DataFrame:
        g = frame.groupBy(*keys) if keys else frame.groupBy()
        agg = g.agg(
            F.sum(term).alias("present_scaled"),
            F.count("*").alias("used_registers"),
        )
        harmonic = (
            F.col("present_scaled")
            + (F.lit(_HLL_M) - F.col("used_registers")) * scale
        ).cast("long")
        alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(1024.0))
        raw = (
            alpha
            * F.lit(float(_HLL_M * _HLL_M))
            * F.lit(float(_HLL_SCALE))
            / harmonic.cast("double")
        )
        # small-range (linear counting) correction, rounded to an integer —
        # see _HLL_CORRECTED: ln drifts a final ulp between engines, but no
        # possible input lands within 6.7e-6 of a rounding boundary
        # (exhaustively pinned in tests/test_round4.py).
        zeros = F.lit(_HLL_M) - F.col("used_registers")
        est = F.when(
            (raw <= F.lit(2560.0)) & (zeros > 0),
            F.round(
                F.lit(1024.0) * F.log(F.lit(1024.0) / zeros.cast("double")), 0
            ),
        ).otherwise(raw)
        return agg.select(
            *keys,
            est.alias("approx_users"),
            F.col("used_registers").cast("long").alias("used_registers"),
            harmonic.alias("harmonic_scaled"),
        )

    exact_g = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    per_group = (
        _stats(regs, ["event_type"])
        .join(exact_g, "event_type")
        .select(
            F.col("event_type").alias("scope"),
            "approx_users",
            "exact_users",
            "used_registers",
            "harmonic_scaled",
        )
    )

    merged_regs = regs.groupBy("idx").agg(F.max("m").alias("m"))
    direct_regs = rhos.groupBy("idx").agg(F.max("rho").alias("m"))
    exact_all = e.agg(F.countDistinct("user_id").alias("exact_users"))
    rolls = (
        _stats(merged_regs, [])
        .select(F.lit("__merged__").alias("scope"), "*")
        .unionByName(
            _stats(direct_regs, []).select(F.lit("__direct__").alias("scope"), "*")
        )
        .crossJoin(F.broadcast(exact_all))
        .select(
            "scope", "approx_users", "exact_users", "used_registers", "harmonic_scaled"
        )
    )
    return per_group.unionByName(rolls)


# --- Kaplan-Meier survival over order fulfillment latency ---------------------------
# Survival analysis as a first-class distributed op. Duration = weeks from
# o_orderdate to the order's FIRST shipped line; orders not yet fully
# filled (o_orderstatus <> 'F') are right-censored at their duration. The
# KM product-limit estimator is computed window-free: the per-duration
# (d_i, c_i) table is bounded by the *date span* (~700 week buckets at any
# SF, never row count), so risk sets and the survival product are exact
# left-folds over one bounded array — the same materialize-then-fold
# discipline as the other bounded-cardinality ops (no single-partition
# window, no O(n^2) re-evaluation: every array is a column before any
# element_at touches it).
#
# Determinism: d_i, n_i are integers; each factor 1 - d/n and the running
# product use only IEEE ops in the identical fold order both engines —
# bit-identical without any rounding step.

_KM_ORACLE = """
WITH fs AS (
  SELECT o.o_orderkey,
         CAST(floor(CAST(date_diff('day', o.o_orderdate, MIN(l.l_shipdate)) AS DOUBLE) / 7.0) AS BIGINT) AS t_weeks,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_event
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus
), counts AS (
  SELECT t_weeks,
         CAST(SUM(is_event) AS BIGINT) AS d_events,
         CAST(SUM(1 - is_event) AS BIGINT) AS c_censored
  FROM fs GROUP BY t_weeks
), packed AS (
  SELECT list(struct_pack(t := t_weeks, d := d_events, c := c_censored) ORDER BY t_weeks) AS arr
  FROM counts
), step1 AS (
  SELECT arr, list_transform(arr, s -> s.d + s.c) AS td FROM packed
), step2 AS (
  SELECT arr, td,
         list_reduce(list_prepend(CAST(0 AS BIGINT), td), (a, b) -> a + b) AS total,
         list_transform(range(1, len(arr) + 1),
            i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(td, 1, i - 1)), (a, b) -> a + b)) AS pfx
  FROM step1
), step3 AS (
  SELECT arr, total, pfx,
         list_transform(range(1, len(arr) + 1),
            i -> CAST(1.0 AS DOUBLE) - CAST(arr[i].d AS DOUBLE) / CAST(total - pfx[i] AS DOUBLE)) AS fct
  FROM step2
), rows_out AS (
  SELECT unnest(range(1, len(arr) + 1)) AS i, arr, fct, total, pfx FROM step3
)
SELECT arr[i].t AS t_weeks,
       CAST(total - pfx[i] AS BIGINT) AS n_at_risk,
       arr[i].d AS d_events,
       arr[i].c AS c_censored,
       list_reduce(list_prepend(CAST(1.0 AS DOUBLE), list_slice(fct, 1, i)), (a, b) -> a * b) AS survival
FROM rows_out
"""


@register(
    "orders_kaplan_meier_fulfillment",
    oracle=_KM_ORACLE,
    doc="Kaplan-Meier product-limit survival of order fulfillment latency "
    "(weeks to first ship; non-'F' orders right-censored). Window-free: "
    "risk sets and the survival product are exact left-folds over one "
    "date-span-bounded array — deterministic IEEE fold, no rounding.",
    tags=("stats", "survival", "extension"),
)
def orders_kaplan_meier_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival curve S(t) = prod_{j<=i} (1 - d_j/n_j) over fulfillment
    weeks. The heavy work is two partial-aggregated shuffles (first-ship
    per order — co-keyed with the join — then the per-week (d, c) table);
    everything after operates on ONE array bounded by the date span."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    fs = l.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    base = o.join(fs, o["o_orderkey"] == fs["l_orderkey"]).select(
        F.floor(
            F.datediff(F.col("first_ship"), F.col("o_orderdate")).cast("double")
            / F.lit(7.0)
        )
        .cast("long")
        .alias("t_weeks"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_event"),
    )
    counts = base.groupBy("t_weeks").agg(
        F.sum("is_event").cast("long").alias("d_events"),
        F.sum(F.lit(1) - F.col("is_event")).cast("long").alias("c_censored"),
    )
    zero = F.lit(0).cast("long")
    packed = counts.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("t_weeks").alias("t"),
                                    F.col("d_events").alias("d"),
                                    F.col("c_censored").alias("c")))
        ).alias("arr")
    )
    step1 = packed.select(
        "arr", F.transform("arr", lambda s: s["d"] + s["c"]).alias("td")
    )
    step2 = step1.select(
        "arr",
        "td",
        F.aggregate("td", zero, lambda a, b: a + b).alias("total"),
        F.transform(
            F.sequence(F.lit(1), F.size("arr")),
            lambda i: F.aggregate(
                F.slice("td", F.lit(1), i - F.lit(1)), zero, lambda a, b: a + b
            ),
        ).alias("pfx"),
    )
    step3 = step2.select(
        "arr",
        "total",
        "pfx",
        F.transform(
            F.sequence(F.lit(1), F.size("arr")),
            lambda i: F.lit(1.0)
            - F.element_at("arr", i)["d"].cast("double")
            / (F.col("total") - F.element_at("pfx", i)).cast("double"),
        ).alias("fct"),
    )
    rows_out = step3.select(
        F.explode(F.sequence(F.lit(1), F.size("arr"))).alias("i"),
        "arr",
        "fct",
        "total",
        "pfx",
    )
    return rows_out.select(
        F.element_at("arr", F.col("i"))["t"].alias("t_weeks"),
        (F.col("total") - F.element_at("pfx", F.col("i")))
        .cast("long")
        .alias("n_at_risk"),
        F.element_at("arr", F.col("i"))["d"].alias("d_events"),
        F.element_at("arr", F.col("i"))["c"].alias("c_censored"),
        F.aggregate(
            F.slice("fct", F.lit(1), F.col("i")),
            F.lit(1.0),
            lambda a, b: a * b,
        ).alias("survival"),
    )


# --- deterministic Poisson bootstrap: confidence intervals at corpus scale ----------
# The classic bootstrap (sample N rows WITH replacement, B times) does not
# distribute — it needs a global row index. The *Poisson bootstrap* does:
# each row independently receives a Poisson(1) weight per resample, so the
# whole procedure is a map-side fan-out (row, b) with partial aggregation —
# shuffle rows = B x groups x partitions, never raw data. Weights come from
# the md5-salted hash (deterministic, engine-identical); the Poisson draw
# is an inverse-CDF walk over literal thresholds (truncated at k=4,
# P(k>4) ~ 0.37%, documented); resample means use the decimal-accumulation
# discipline so they are order-independent; the CI bounds are nearest-rank
# picks from the sorted 64-vector of means (unique b tiebreaker), so the
# entire output is exact cross-engine — no rounding step.

_BOOT_B = 64
# Poisson(1) inverse-CDF thresholds: P(X<=k) for k=0..3 (k=4 is the tail)
_BOOT_T = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
)
_BOOT_MODF = "1000000007.0"  # affine-rehash modulus as a double literal

_BOOT_ORACLE = f"""
WITH keyed AS (
  SELECT l_returnflag, l_extendedprice,
         CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
              CAST(l_linenumber AS VARCHAR)), 1, 12)) AS BIGINT) % 1000000007 AS x
  FROM lineitem
), fanout AS (
  SELECT k.l_returnflag, k.l_extendedprice, b.b,
         ((2 * b.b + 3) * k.x + 7919 * (b.b + 1)) % 1000000007 AS h
  FROM keyed k CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b) b
), weighted AS (
  SELECT l_returnflag, l_extendedprice, b,
         CASE WHEN CAST(h AS DOUBLE) / {_BOOT_MODF} < {_BOOT_T[0]} THEN 0
              WHEN CAST(h AS DOUBLE) / {_BOOT_MODF} < {_BOOT_T[1]} THEN 1
              WHEN CAST(h AS DOUBLE) / {_BOOT_MODF} < {_BOOT_T[2]} THEN 2
              WHEN CAST(h AS DOUBLE) / {_BOOT_MODF} < {_BOOT_T[3]} THEN 3
              ELSE 4 END AS w
  FROM fanout
), resample_means AS (
  SELECT l_returnflag, b,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6)) * w) AS DOUBLE)
           / CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE) AS mean_b
  FROM weighted GROUP BY l_returnflag, b
), packed AS (
  SELECT l_returnflag,
         list(struct_pack(m := mean_b, b := b) ORDER BY mean_b, b) AS arr
  FROM resample_means GROUP BY l_returnflag
), point AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS point_mean,
         COUNT(*) AS n_lines
  FROM lineitem GROUP BY l_returnflag
)
SELECT p.l_returnflag, p.point_mean,
       k.arr[2].m AS ci_lo,
       k.arr[{_BOOT_B - 1}].m AS ci_hi,
       p.n_lines,
       CAST({_BOOT_B} AS BIGINT) AS n_resamples
FROM point p JOIN packed k ON p.l_returnflag = k.l_returnflag
"""


@register(
    "stats_bootstrap_ci_poisson",
    oracle=_BOOT_ORACLE,
    doc="Poisson-bootstrap 95% CI for mean extended price per return flag: "
    "B=64 Poisson(1) weights per row from ONE md5 + affine re-hash, map-side "
    "fan-out + partial aggregation (shuffle carries B x groups rows), "
    "nearest-rank CI picks from the sorted resample means — exact "
    "cross-engine, no rounding.",
    tags=("stats", "bootstrap", "extension"),
)
def stats_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _BOOT_ORACLE. At 100 TB: the fan-out is map-only (B copies per
    row die into partial sums inside the task); no global resample index
    ever exists — the reason Poisson bootstrap is THE distributed
    bootstrap. Truncating Poisson(1) at k=4 drops 0.37% tail mass,
    identically on both engines (it's a fixed threshold walk)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    x = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "_",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(1_000_000_007)
    )
    keyed = li.withColumn("x", x)
    # the B-fold fan-out is pure map work: make sure it runs wide even when
    # the input is one small file (at 100 TB the scan is already parallel
    # and this branch is a no-op). Width is derived from input size vs the
    # scan-split config — no .rdd touch, which would force plan analysis on
    # the driver just to read a partition count.
    from f1_lakehouse_spark.session import input_bytes, maxpartition_bytes
    from f1_lakehouse_spark.tables import table_path

    par = spark.sparkContext.defaultParallelism
    max_split = maxpartition_bytes(spark)
    scan_tasks = -(-input_bytes(spark, [table_path(sf_dir, "lineitem")]) // max_split)
    if scan_tasks < par:
        keyed = keyed.repartition(par)
    # hoist the double->decimal cast ABOVE the explode but AFTER the
    # small-input repartition: the cast (Double.toString + BigDecimal
    # parse) runs once per SOURCE row and the Generate copies the decimal,
    # instead of 64 casts per row inside the aggregate below (guide §1.2
    # per-task work; r11 A/B result-identical) — while the repartition
    # shuffle still moves the 8-byte double, not a 16-byte decimal
    fan = keyed.withColumn(
        "pd", F.col("l_extendedprice").cast("decimal(27,6)")
    ).withColumn(
        "b", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1)))
    )
    h = (
        (F.lit(2) * F.col("b") + F.lit(3)) * F.col("x")
        + F.lit(7919) * (F.col("b") + F.lit(1))
    ) % F.lit(1_000_000_007)
    u = h.cast("double") / F.lit(1000000007.0)
    w = (
        F.when(u < float(_BOOT_T[0]), 0)
        .when(u < float(_BOOT_T[1]), 1)
        .when(u < float(_BOOT_T[2]), 2)
        .when(u < float(_BOOT_T[3]), 3)
        .otherwise(4)
    )
    weighted = fan.select("l_returnflag", "pd", "b", w.alias("w"))
    means = weighted.groupBy("l_returnflag", "b").agg(
        (
            F.sum(F.col("pd") * F.col("w")).cast(
                "double"
            )
            / F.sum("w").cast("long").cast("double")
        ).alias("mean_b")
    )
    packed = means.groupBy("l_returnflag").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("mean_b").alias("m"), F.col("b").alias("b")))
        ).alias("arr")
    )
    point = li.groupBy("l_returnflag").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double")
            / F.count("*").cast("double")
        ).alias("point_mean"),
        F.count("*").alias("n_lines"),
    )
    return point.join(packed, "l_returnflag").select(
        "l_returnflag",
        "point_mean",
        F.element_at("arr", 2)["m"].alias("ci_lo"),
        F.element_at("arr", _BOOT_B - 1)["m"].alias("ci_hi"),
        "n_lines",
        F.lit(_BOOT_B).cast("long").alias("n_resamples"),
    )


# --- Benford first-digit audit ------------------------------------------------------
# The forensic-accounting screen: first significant digits of naturally
# occurring amounts follow log10(1 + 1/d); a per-digit chi-square term
# localizes which digit band deviates (fabricated or clamped data shows
# up immediately). Digit extraction is integer/string only (floor ->
# BIGINT -> first char — float formatting never touches the value, which
# keeps both engines identical); expected masses are literal doubles, so
# every output is exact cross-engine. One partial-aggregated shuffle of
# at most 9 digit groups; the total joins back as a broadcast 1-row frame.

_BENFORD_P = (
    "0.3010299956639812",
    "0.17609125905568124",
    "0.12493873660829992",
    "0.09691001300805642",
    "0.07918124604762482",
    "0.06694678963061322",
    "0.05799194697768673",
    "0.05115252244738129",
    "0.04575749056067514",
)

_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in enumerate(_BENFORD_P, start=1))
    + " END"
)

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM lineitem WHERE l_extendedprice > 0
), counts AS (
  SELECT digit, COUNT(*) AS n_obs FROM digits GROUP BY digit
), total AS (
  SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM counts
)
SELECT c.digit,
       c.n_obs,
       CAST(t.n AS DOUBLE) * {_BENFORD_CASE} AS expected,
       (CAST(c.n_obs AS DOUBLE) - CAST(t.n AS DOUBLE) * {_BENFORD_CASE})
         * (CAST(c.n_obs AS DOUBLE) - CAST(t.n AS DOUBLE) * {_BENFORD_CASE})
         / (CAST(t.n AS DOUBLE) * {_BENFORD_CASE}) AS chi2_term
FROM counts c CROSS JOIN total t
"""


@register(
    "lineitem_benford_audit",
    oracle=_BENFORD_ORACLE,
    doc="Benford first-digit audit of extended price: per-digit observed "
    "vs log10(1+1/d) expected mass with a chi-square term per digit — "
    "integer/string digit extraction, literal expected masses, exact "
    "cross-engine; one 9-group shuffle.",
    tags=("stats", "audit", "extension"),
)
def lineitem_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_extendedprice") > 0)
    digit = F.substring(
        F.floor(F.col("l_extendedprice")).cast("long").cast("string"), 1, 1
    ).cast("long")
    counts = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n_obs")
    )
    total = counts.agg(F.sum("n_obs").cast("long").alias("n"))
    p = F.col("digit")
    expected_mass = F.when(p == 1, float(_BENFORD_P[0]))
    for d in range(2, 10):
        expected_mass = expected_mass.when(p == d, float(_BENFORD_P[d - 1]))
    joined = counts.crossJoin(F.broadcast(total))
    e = F.col("n").cast("double") * expected_mass
    o = F.col("n_obs").cast("double")
    return joined.select(
        "digit",
        "n_obs",
        e.alias("expected"),
        ((o - e) * (o - e) / e).alias("chi2_term"),
    )


# --- classical seasonal decomposition of the monthly revenue series -----------------
# Trend = centered 13-month moving sum / 13 (defined only where the full
# window exists); seasonal index = per-month-of-year mean of the detrended
# residual; residual = series - trend - seasonal. The monthly series is
# calendar-bounded (~84 cells at any SF), so the sliding windows are
# slice-folds over ONE packed array (the Kaplan-Meier discipline) — no
# global window. Money is integer CENTS end-to-end (decimal-rounded once
# at the source, then BIGINT): every sum is exact integer arithmetic and
# the three final divisions are single IEEE ops — exact cross-engine.

_SEAS_ORACLE = """
WITH monthly AS (
  SELECT (CAST(year(o_orderdate) AS BIGINT) * 12 + CAST(month(o_orderdate) AS BIGINT)) AS ym,
         strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month_str,
         CAST(month(o_orderdate) AS BIGINT) AS moy,
         CAST(SUM(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2, 3
), packed AS (
  SELECT list(struct_pack(ym := ym, month_str := month_str, moy := moy, cents := cents)
              ORDER BY ym) AS arr
  FROM monthly
), step1 AS (
  SELECT arr, list_transform(arr, s -> s.cents) AS ca, len(arr) AS n FROM packed
), step2 AS (
  SELECT arr, ca, n,
         list_transform(range(1, n + 1),
            i -> CASE WHEN i >= 7 AND i <= n - 6
                 THEN list_reduce(list_slice(ca, i - 6, i + 6), (a, b) -> a + b)
                 ELSE NULL END) AS ts
  FROM step1
), rows_out AS (
  SELECT unnest(range(1, n + 1)) AS i, arr, ca, ts FROM step2
), months AS (
  SELECT arr[i].month_str AS month_str, arr[i].moy AS moy,
         ca[i] AS cents, ts[i] AS trend_cents13
  FROM rows_out
), seasonal AS (
  SELECT moy,
         CAST(SUM(13 * cents - trend_cents13) AS BIGINT) AS sr,
         COUNT(trend_cents13) AS cnt
  FROM months WHERE trend_cents13 IS NOT NULL GROUP BY moy
)
SELECT m.month_str,
       CAST(m.cents AS DOUBLE) / 100.0 AS revenue,
       CAST(m.trend_cents13 AS DOUBLE) / 1300.0 AS trend,
       CAST(s.sr AS DOUBLE) / (1300.0 * CAST(s.cnt AS DOUBLE)) AS seasonal,
       CAST(m.cents AS DOUBLE) / 100.0
         - CAST(m.trend_cents13 AS DOUBLE) / 1300.0
         - CAST(s.sr AS DOUBLE) / (1300.0 * CAST(s.cnt AS DOUBLE)) AS residual
FROM months m LEFT JOIN seasonal s ON m.moy = s.moy
"""


@register(
    "orders_seasonal_decompose",
    oracle=_SEAS_ORACLE,
    doc="classical seasonal decomposition of monthly revenue: centered "
    "13-month trend, month-of-year seasonal index, residual — integer-"
    "cents arithmetic over one calendar-bounded packed array, exact "
    "cross-engine",
    tags=("stats", "timeseries", "extension"),
)
def orders_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _SEAS_ORACLE. The raw-row work is ONE partial-aggregated
    shuffle to ~84 month cells; every sliding computation after that is a
    bounded slice-fold; the seasonal join is a broadcast of <= 12 rows."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    cents = (
        F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)") * 100
    ).cast("long")
    monthly = o.select(
        (F.year("o_orderdate").cast("long") * 12 + F.month("o_orderdate").cast("long")).alias("ym"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM").alias(
            "month_str"
        ),
        F.month("o_orderdate").cast("long").alias("moy"),
        cents.alias("c"),
    ).groupBy("ym", "month_str", "moy").agg(F.sum("c").alias("cents"))
    packed = monthly.agg(
        F.sort_array(
            F.collect_list(F.struct("ym", "month_str", "moy", "cents"))
        ).alias("arr")
    )
    step1 = packed.select(
        "arr",
        F.transform("arr", lambda s: s["cents"]).alias("ca"),
        F.size("arr").alias("n"),
    )
    zero = F.lit(0).cast("long")
    step2 = step1.select(
        "arr",
        "ca",
        "n",
        F.transform(
            F.sequence(F.lit(1), F.col("n")),
            lambda i: F.when(
                (i >= 7) & (i <= F.col("n") - 6),
                F.aggregate(
                    F.slice("ca", i - F.lit(6), F.lit(13)), zero, lambda a, b: a + b
                ),
            ).otherwise(F.lit(None).cast("long")),
        ).alias("ts"),
    )
    rows_out = step2.select(
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i"), "arr", "ca", "ts"
    )
    months = rows_out.select(
        F.element_at("arr", F.col("i"))["month_str"].alias("month_str"),
        F.element_at("arr", F.col("i"))["moy"].alias("moy"),
        F.element_at("ca", F.col("i")).alias("cents"),
        F.try_element_at("ts", F.col("i")).alias("trend_cents13"),
    )
    seasonal = (
        months.where(F.col("trend_cents13").isNotNull())
        .groupBy("moy")
        .agg(
            F.sum(F.lit(13) * F.col("cents") - F.col("trend_cents13"))
            .cast("long")
            .alias("sr"),
            F.count("trend_cents13").alias("cnt"),
        )
    )
    rev = F.col("cents").cast("double") / F.lit(100.0)
    trend = F.col("trend_cents13").cast("double") / F.lit(1300.0)
    seas = F.col("sr").cast("double") / (F.lit(1300.0) * F.col("cnt").cast("double"))
    return months.join(F.broadcast(seasonal), "moy", "left").select(
        "month_str",
        rev.alias("revenue"),
        trend.alias("trend"),
        seas.alias("seasonal"),
        (rev - trend - seas).alias("residual"),
    )


# --- Holt linear-trend forecast of monthly revenue ----------------------------------
# Double exponential smoothing (level + trend), the standard short-horizon
# business forecast. Same calendar-bounded packed-array discipline as the
# seasonal decomposition: one partial-aggregated shuffle to ~84 month
# cells, per-index prefix folds for the fitted one-step-ahead values, and
# 6 forecast rows extrapolated from the final state. The fold state is a
# 2-element DOUBLE list [level, trend] — NOT a struct: DuckDB 1.0's
# list_reduce computes struct-typed accumulators incorrectly (verified:
# identical lambda gives b=0.141 vs the true 0.170 at step 2), while
# list-typed accumulators fold exactly; both engines run the literally
# isomorphic lambda (elements wrapped as [v, 0.0] so the fold list is
# homogeneous), making every output bit-identical.

_HOLT_ALPHA = "0.25"   # dyadic
_HOLT_BETA = "0.125"   # dyadic
_HOLT_H = 6

_HOLT_STEP_SQL = (
    "(acc, x) -> ["
    f"CAST({_HOLT_ALPHA} AS DOUBLE) * x[1] + (CAST(1.0 AS DOUBLE) - CAST({_HOLT_ALPHA} AS DOUBLE)) * (acc[1] + acc[2]), "
    f"CAST({_HOLT_BETA} AS DOUBLE) * (CAST({_HOLT_ALPHA} AS DOUBLE) * x[1] + (CAST(1.0 AS DOUBLE) - CAST({_HOLT_ALPHA} AS DOUBLE)) * (acc[1] + acc[2]) - acc[1]) "
    f"+ (CAST(1.0 AS DOUBLE) - CAST({_HOLT_BETA} AS DOUBLE)) * acc[2]"
    "]"
)

_HOLT_ORACLE = f"""
WITH monthly AS (
  SELECT (CAST(year(o_orderdate) AS BIGINT) * 12 + CAST(month(o_orderdate) AS BIGINT) - 1) AS ym0,
         strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month_str,
         CAST(SUM(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
), packed AS (
  SELECT list(struct_pack(ym0 := ym0, month_str := month_str,
                          v := CAST(cents AS DOUBLE) / 100.0) ORDER BY ym0) AS arr
  FROM monthly
), step1 AS (
  SELECT arr, list_transform(arr, s -> [s.v, CAST(0.0 AS DOUBLE)]) AS va,
         len(arr) AS n
  FROM packed
), step2 AS (
  SELECT arr, va, n,
         list_transform(range(1, n + 1),
            i -> list_reduce(
                   list_prepend([arr[1].v, arr[2].v - arr[1].v],
                                list_slice(va, 2, i)),
                   {_HOLT_STEP_SQL})) AS st
  FROM step1
), obs AS (
  SELECT arr[i].month_str AS month_str,
         'obs' AS kind,
         arr[i].v AS actual,
         CASE WHEN i >= 2 THEN st[i - 1][1] + st[i - 1][2] ELSE NULL END AS fitted
  FROM (SELECT unnest(range(1, n + 1)) AS i, arr, st FROM step2)
), fc AS (
  SELECT printf('%04d-%02d', (arr[n].ym0 + h) // 12, (arr[n].ym0 + h) % 12 + 1) AS month_str,
         'forecast' AS kind,
         CAST(NULL AS DOUBLE) AS actual,
         st[n][1] + CAST(h AS DOUBLE) * st[n][2] AS fitted
  FROM step2, (SELECT unnest(range(1, {_HOLT_H} + 1)) AS h)
)
SELECT * FROM obs UNION ALL SELECT * FROM fc
"""


@register(
    "orders_holt_forecast",
    oracle=_HOLT_ORACLE,
    doc=f"Holt linear-trend smoothing of monthly revenue (alpha={_HOLT_ALPHA}, "
    f"beta={_HOLT_BETA}) with one-step-ahead fitted values and a "
    f"{_HOLT_H}-month forecast — list-state prefix folds over one "
    "calendar-bounded packed array, bit-exact cross-engine",
    tags=("stats", "timeseries", "forecast", "extension"),
)
def orders_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _HOLT_ORACLE and the struct-accumulator warning above — the
    fold state is a DOUBLE list in BOTH engines, lambdas isomorphic."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    cents = (
        F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)") * 100
    ).cast("long")
    monthly = (
        o.select(
            (
                F.year("o_orderdate").cast("long") * 12
                + F.month("o_orderdate").cast("long")
                - 1
            ).alias("ym0"),
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM").alias(
                "month_str"
            ),
            cents.alias("c"),
        )
        .groupBy("ym0", "month_str")
        .agg(F.sum("c").alias("cents"))
    )
    packed = monthly.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "ym0",
                    "month_str",
                    (F.col("cents").cast("double") / F.lit(100.0)).alias("v"),
                )
            )
        ).alias("arr")
    )
    step1 = packed.select(
        "arr",
        F.transform("arr", lambda s: F.array(s["v"], F.lit(0.0))).alias("va"),
        F.size("arr").alias("n"),
    )
    alpha, beta = F.lit(0.25), F.lit(0.125)

    def holt_step(acc, x):
        lvl = alpha * F.element_at(x, 1) + (F.lit(1.0) - alpha) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        tr = beta * (
            alpha * F.element_at(x, 1)
            + (F.lit(1.0) - alpha)
            * (F.element_at(acc, 1) + F.element_at(acc, 2))
            - F.element_at(acc, 1)
        ) + (F.lit(1.0) - beta) * F.element_at(acc, 2)
        return F.array(lvl, tr)

    init = F.array(
        F.element_at(F.col("arr"), 1)["v"],
        F.element_at(F.col("arr"), 2)["v"] - F.element_at(F.col("arr"), 1)["v"],
    )
    step2 = step1.select(
        "arr",
        "n",
        F.transform(
            F.sequence(F.lit(1), F.col("n")),
            lambda i: F.aggregate(
                F.slice("va", F.lit(2), i - F.lit(1)), init, holt_step
            ),
        ).alias("st"),
    )
    rows_out = step2.select(
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i"), "arr", "st", "n"
    )
    obs = rows_out.select(
        F.element_at("arr", F.col("i"))["month_str"].alias("month_str"),
        F.lit("obs").alias("kind"),
        F.element_at("arr", F.col("i"))["v"].alias("actual"),
        F.when(
            F.col("i") >= 2,
            F.element_at(F.try_element_at("st", F.col("i") - 1), 1)
            + F.element_at(F.try_element_at("st", F.col("i") - 1), 2),
        ).alias("fitted"),
    )
    fc = (
        step2.select(
            F.explode(F.sequence(F.lit(1), F.lit(_HOLT_H))).alias("h"), "arr", "st", "n"
        )
        .select(
            F.format_string(
                "%04d-%02d",
                ((F.element_at("arr", F.col("n"))["ym0"] + F.col("h")) / 12).cast(
                    "long"
                ),
                (
                    (F.element_at("arr", F.col("n"))["ym0"] + F.col("h")) % 12 + 1
                ).cast("long"),
            ).alias("month_str"),
            F.lit("forecast").alias("kind"),
            F.lit(None).cast("double").alias("actual"),
            (
                F.element_at(F.element_at("st", F.col("n")), 1)
                + F.col("h").cast("double")
                * F.element_at(F.element_at("st", F.col("n")), 2)
            ).alias("fitted"),
        )
    )
    return obs.unionByName(fc)


# --- ABC x XYZ inventory segmentation matrix ----------------------------------------
# The planner's 3x3: ABC = revenue concentration (exact distributed
# prefix sum, as in pareto_abc_parts), XYZ = demand variability — the
# coefficient of variation of monthly demand, with silent months counted
# as zero demand. CV classes are decided by INTEGER cross-multiplication
# (cv^2 < 1/4 <=> 4*(n*S2 - S1^2) < S1^2, quantities in exact
# thousandths), so no float ever touches a class boundary. ONE lineitem
# scan feeds both sides: the (part, month) cells aggregate to per-part
# decimal revenue + integer moment sums. Int64 headroom: per-part demand
# is scale-factor-independent in TPC-H-style scaling (part count grows
# with data), so S1^2 and n*S2 stay far below 2^63 at any corpus size.

# cv^2 class thresholds as integers (X: cv^2 < 3, Y: cv^2 < 4): textbook
# retail cuts (0.5/1.0) assume steady movers; this corpus's sparse demand
# (mostly-zero months) centers cv ~1.9, so the cuts sit at the observed
# terciles — the classification machinery is the point, the cuts are data
_XYZ_X2, _XYZ_Y2 = "3", "4"

_ABC_XYZ_ORACLE = f"""
WITH pm AS (
  SELECT l_partkey,
         (CAST(year(l_shipdate) AS BIGINT) * 12 + CAST(month(l_shipdate) AS BIGINT)) AS ym,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,3)) * 1000 AS BIGINT)) AS BIGINT) AS qmil,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS rev
  FROM lineitem GROUP BY 1, 2
), nm AS (
  SELECT COUNT(DISTINCT ym) AS n_months FROM pm
), per_part AS (
  SELECT l_partkey,
         SUM(rev) AS rev,
         CAST(SUM(qmil) AS BIGINT) AS s1,
         CAST(SUM(qmil * qmil) AS BIGINT) AS s2
  FROM pm GROUP BY l_partkey
), xyz AS (
  SELECT p.l_partkey, p.rev,
         CASE WHEN (n.n_months * p.s2 - p.s1 * p.s1) < {_XYZ_X2} * p.s1 * p.s1 THEN 'X'
              WHEN (n.n_months * p.s2 - p.s1 * p.s1) < {_XYZ_Y2} * p.s1 * p.s1 THEN 'Y'
              ELSE 'Z' END AS xyz_class
  FROM per_part p CROSS JOIN nm n
), tot AS (SELECT SUM(rev) AS total FROM per_part),
cum AS (
  SELECT l_partkey, rev,
         SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS c
  FROM per_part
), abc AS (
  SELECT cum.l_partkey,
         CASE WHEN CAST(cum.c AS DOUBLE) / CAST(t.total AS DOUBLE) <= {{pa}}
              THEN 'A'
              WHEN CAST(cum.c AS DOUBLE) / CAST(t.total AS DOUBLE) <= {{pb}}
              THEN 'B' ELSE 'C' END AS abc_class
  FROM cum, tot t
)
SELECT a.abc_class, x.xyz_class,
       COUNT(*) AS n_parts,
       CAST(SUM(x.rev) AS DOUBLE) AS revenue
FROM abc a JOIN xyz x ON a.l_partkey = x.l_partkey
GROUP BY a.abc_class, x.xyz_class
"""


@register(
    "part_abc_xyz_matrix",
    oracle=_ABC_XYZ_ORACLE.format(pa=PARETO_A, pb=PARETO_B),
    doc="ABC (revenue concentration, distributed prefix sum) x XYZ "
    "(demand-variability CV classes via integer cross-multiplication, "
    "zero months included) inventory segmentation matrix — one lineitem "
    "scan feeds both sides, exact cross-engine",
    tags=("extensions", "pareto", "prefix-sum", "inventory"),
)
def part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qmil = (F.col("l_quantity").cast("decimal(18,3)") * 1000).cast("long")
    pm = (
        li.select(
            "l_partkey",
            (
                F.year("l_shipdate").cast("long") * 12
                + F.month("l_shipdate").cast("long")
            ).alias("ym"),
            qmil.alias("q"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(27,6)")
            .alias("r"),
        )
        .groupBy("l_partkey", "ym")
        .agg(F.sum("q").cast("long").alias("qmil"), F.sum("r").alias("rev"))
    )
    pm = pm.persist()
    pm.count()  # two consumers below (per-part + month count): materialize once
    try:
        nm = pm.agg(F.countDistinct("ym").alias("n_months"))
        per_part = pm.groupBy("l_partkey").agg(
            F.sum("rev").alias("rev"),
            F.sum("qmil").cast("long").alias("s1"),
            F.sum(F.col("qmil") * F.col("qmil")).cast("long").alias("s2"),
        )
        num = F.col("n_months") * F.col("s2") - F.col("s1") * F.col("s1")
        den = F.col("s1") * F.col("s1")
        xyz = per_part.crossJoin(F.broadcast(nm)).select(
            "l_partkey",
            "rev",
            F.when(num < F.lit(int(_XYZ_X2)) * den, "X")
            .when(num < F.lit(int(_XYZ_Y2)) * den, "Y")
            .otherwise("Z")
            .alias("xyz_class"),
        )
        cum, release, total = global_prefix_sum(
            spark,
            per_part.select("l_partkey", "rev"),
            "rev",
            [F.col("rev").desc(), F.col("l_partkey").asc()],
        )
        share = F.col("cum").cast("double") / F.lit(total).cast("double")
        abc = cum.select(
            "l_partkey",
            F.when(share <= PARETO_A, "A")
            .when(share <= PARETO_B, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
        out = (
            abc.join(xyz, "l_partkey")
            .groupBy("abc_class", "xyz_class")
            .agg(
                F.count("*").alias("n_parts"),
                F.sum("rev").cast("double").alias("revenue"),
            )
        )
        out = out.persist()
        out.count()
        release()
    finally:
        pm.unpersist()
    return out


# --- Haar wavelet decomposition of monthly revenue ----------------------------------
# Multiresolution signal analysis: the unnormalized Haar transform
# (pairwise sums = approximations, pairwise differences = details) over
# the last 64 months of revenue, 6 levels deep. Every coefficient is
# integer-cents sums/differences — exact at any scale — and localizes
# WHEN at WHAT timescale revenue shifted (detail level k spans 2^k
# months), the transform behind wavelet-based change detection and
# compressed series storage. Calendar-bounded single packed array; the
# raw-row work is one partial-aggregated shuffle to month cells.

_HAAR_N = 64  # 2^6 months
_HAAR_LEVELS = 6


def _haar_pairs_sql(src: str, op: str) -> str:
    return (
        f"list_transform(range(1, len({src}) // 2 + 1), "
        f"i -> {src}[2 * i - 1] {op} {src}[2 * i])"
    )


def _haar_oracle() -> str:
    lvls = []
    prev = "a0"
    steps = []
    for k in range(1, _HAAR_LEVELS + 1):
        steps.append(
            f"s{k} AS (SELECT *, {_haar_pairs_sql(prev, '+')} AS a{k}, "
            f"{_haar_pairs_sql(prev, '-')} AS d{k} FROM s{k - 1 if k > 1 else '0'})"
        )
        prev = f"a{k}"
        lvls.append(
            f"SELECT {k} AS level, CAST(i AS BIGINT) AS idx, 'detail' AS kind, "
            f"d{k}[i] AS coeff FROM s{_HAAR_LEVELS}, "
            f"(SELECT unnest(range(1, {1 << (_HAAR_LEVELS - k)} + 1)) AS i)"
        )
    lvls.append(
        f"SELECT {_HAAR_LEVELS} AS level, CAST(1 AS BIGINT) AS idx, "
        f"'approx' AS kind, a{_HAAR_LEVELS}[1] AS coeff FROM s{_HAAR_LEVELS}"
    )
    return f"""
WITH monthly AS (
  SELECT (CAST(year(o_orderdate) AS BIGINT) * 12 + CAST(month(o_orderdate) AS BIGINT)) AS ym,
         CAST(SUM(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), ranked AS (
  SELECT ym, cents, row_number() OVER (ORDER BY ym DESC) AS rn FROM monthly
), s0 AS (
  SELECT list(cents ORDER BY ym) AS a0
  FROM ranked WHERE rn <= {_HAAR_N}
), {", ".join(steps)}
{" UNION ALL ".join(lvls)}
"""


@register(
    "orders_haar_wavelet",
    oracle=_haar_oracle(),
    doc=f"unnormalized Haar wavelet transform of the last {_HAAR_N} months "
    f"of revenue ({_HAAR_LEVELS} levels): detail coefficients localize "
    "revenue shifts per timescale — pure integer-cents arithmetic over "
    "one calendar-bounded array, exact cross-engine",
    tags=("stats", "timeseries", "wavelet", "extension"),
)
def orders_haar_wavelet(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    cents = (
        F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)") * 100
    ).cast("long")
    monthly = o.select(
        (
            F.year("o_orderdate").cast("long") * 12
            + F.month("o_orderdate").cast("long")
        ).alias("ym"),
        cents.alias("c"),
    ).groupBy("ym").agg(F.sum("c").alias("cents"))
    w = Window.orderBy(F.col("ym").desc())
    # the month table is calendar-bounded (~84 rows): the global rank
    # window here orders an aggregated bounded frame, not raw data
    last = monthly.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _HAAR_N
    )
    cur = last.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ym", "cents"))),
            lambda s: s["cents"],
        ).alias("a0")
    )

    def pairs(src: str, plus: bool):
        return F.transform(
            F.sequence(F.lit(1), (F.size(src) / F.lit(2)).cast("int")),
            lambda i: F.element_at(F.col(src), (2 * i - 1).cast("int"))
            + (1 if plus else -1) * F.element_at(F.col(src), (2 * i).cast("int")),
        )

    for k in range(1, _HAAR_LEVELS + 1):
        prev = f"a{k - 1}"
        cur = cur.withColumn(f"a{k}", pairs(prev, True)).withColumn(
            f"d{k}", pairs(prev, False)
        )
    arms = []
    for k in range(1, _HAAR_LEVELS + 1):
        arms.append(
            cur.select(
                F.lit(k).alias("level"),
                F.explode(
                    F.sequence(F.lit(1), F.lit(1 << (_HAAR_LEVELS - k)))
                ).alias("idx0"),
                F.lit("detail").alias("kind"),
                F.col(f"d{k}"),
            ).select(
                F.col("level"),
                F.col("idx0").cast("long").alias("idx"),
                F.col("kind"),
                F.col(f"d{k}"),
            ).select(
                "level",
                "idx",
                "kind",
                F.try_element_at(F.col(f"d{k}"), F.col("idx").cast("int")).alias(
                    "coeff"
                ),
            )
        )
    arms.append(
        cur.select(
            F.lit(_HAAR_LEVELS).alias("level"),
            F.lit(1).cast("long").alias("idx"),
            F.lit("approx").alias("kind"),
            F.element_at(F.col(f"a{_HAAR_LEVELS}"), 1).alias("coeff"),
        )
    )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


# --- jackknife standard error from one pass -----------------------------------------
# The bootstrap's frugal sibling: delete-one-BUCKET jackknife over H=32
# hash buckets. Everything derives from per-bucket (count, decimal sum)
# partials in ONE scan: each leave-one-out mean is (S - s_h)/(N - n_h)
# — exact decimal subtraction, one double division — and the jackknife
# variance folds over the H-vector in bucket order (ordered left-folds,
# deterministic). Against stats_bootstrap_ci_poisson's B-fold fan-out,
# this is the O(1)-overhead uncertainty estimate: same scan cost as the
# plain mean.

_JK_H = 32

_JK_ORACLE = f"""
WITH b AS (
  SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
       CAST(l_linenumber AS VARCHAR)), 1, 12)) AS BIGINT) % {_JK_H} AS h,
         l_extendedprice AS x
  FROM lineitem
), per AS (
  SELECT h, COUNT(*) AS n_h, SUM(CAST(x AS DECIMAL(27,6))) AS s_h
  FROM b GROUP BY h
), tot AS (
  SELECT CAST(SUM(n_h) AS BIGINT) AS n, SUM(s_h) AS s FROM per
), loo AS (
  SELECT list(struct_pack(
           h := h,
           m := CAST(t.s - p.s_h AS DOUBLE) / CAST(t.n - p.n_h AS DOUBLE)
         ) ORDER BY h) AS arr,
         CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE) AS mean_all,
         t.n AS n
  FROM per p CROSS JOIN tot t
  GROUP BY t.s, t.n
), folded AS (
  SELECT n, mean_all, arr, len(arr) AS hh,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list_transform(arr, s -> s.m)), (a, b) -> a + b)
           / CAST(len(arr) AS DOUBLE) AS mbar
  FROM loo
)
SELECT n,
       mean_all AS point_mean,
       sqrt((CAST(hh - 1 AS DOUBLE) / CAST(hh AS DOUBLE))
            * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(arr, s -> (s.m - mbar) * (s.m - mbar))), (a, b) -> a + b))
         AS jackknife_se,
       CAST(hh AS BIGINT) AS n_buckets
FROM folded
"""


@register(
    "stats_jackknife_variance",
    oracle=_JK_ORACLE,
    doc=f"delete-one-bucket jackknife standard error of the mean price "
    f"(H={_JK_H} hash buckets): one scan, per-bucket decimal partials, "
    "ordered left-folds over the H-vector — exact cross-engine, "
    "O(1) overhead vs the plain mean",
    tags=("stats", "jackknife", "extension"),
)
def stats_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "_",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(_JK_H)
    )
    per = (
        li.select(h.alias("h"), F.col("l_extendedprice").alias("x"))
        .groupBy("h")
        .agg(
            F.count("*").alias("n_h"),
            F.sum(F.col("x").cast("decimal(27,6)")).alias("s_h"),
        )
    )
    tot = per.agg(
        F.sum("n_h").cast("long").alias("n"), F.sum("s_h").alias("s")
    )
    loo = per.crossJoin(F.broadcast(tot)).select(
        "n",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("mean_all"),
        F.struct(
            F.col("h").alias("h"),
            (
                (F.col("s") - F.col("s_h")).cast("double")
                / (F.col("n") - F.col("n_h")).cast("double")
            ).alias("m"),
        ).alias("st"),
    )
    packed = loo.groupBy("n", "mean_all").agg(
        F.sort_array(F.collect_list("st")).alias("arr")
    )
    zero = F.lit(0.0)
    ms = F.transform("arr", lambda s: s["m"])
    folded = packed.select(
        "n",
        "mean_all",
        "arr",
        F.size("arr").alias("hh"),
        (
            F.aggregate(ms, zero, lambda a, b: a + b)
            / F.size("arr").cast("double")
        ).alias("mbar"),
    )
    sq = F.transform(
        "arr", lambda s: (s["m"] - F.col("mbar")) * (s["m"] - F.col("mbar"))
    )
    return folded.select(
        "n",
        F.col("mean_all").alias("point_mean"),
        F.sqrt(
            ((F.col("hh") - 1).cast("double") / F.col("hh").cast("double"))
            * F.aggregate(sq, zero, lambda a, b: a + b)
        ).alias("jackknife_se"),
        F.col("hh").cast("long").alias("n_buckets"),
    )


# --- rolling-origin backtest of the Holt forecast -----------------------------------
# Forecast evaluation done honestly: every month's one-step-ahead Holt
# fit (the prefix states ARE the rolling origins) is scored against the
# actual, and the model only earns a positive skill score if it beats
# the seasonal-naive baseline (v_{t-12}) on the SAME months. Error sums
# fold over the packed array in index order (deterministic doubles);
# baseline errors are exact integer cents. Same calendar-bounded
# machinery as orders_holt_forecast.

_HBT_ORACLE = f"""
WITH monthly AS (
  SELECT (CAST(year(o_orderdate) AS BIGINT) * 12 + CAST(month(o_orderdate) AS BIGINT) - 1) AS ym0,
         CAST(SUM(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), packed AS (
  SELECT list(CAST(cents AS DOUBLE) / 100.0 ORDER BY ym0) AS v FROM monthly
), step1 AS (
  SELECT v, list_transform(v, x -> [x, CAST(0.0 AS DOUBLE)]) AS va, len(v) AS n
  FROM packed
), step2 AS (
  SELECT v, n,
         list_transform(range(1, n + 1),
            i -> list_reduce(
                   list_prepend([v[1], v[2] - v[1]], list_slice(va, 2, i)),
                   {_HOLT_STEP_SQL})) AS st
  FROM step1
), errs AS (
  SELECT n,
         list_transform(range(14, n + 1), i -> abs(v[i] - (st[i - 1][1] + st[i - 1][2]))) AS em,
         list_transform(range(14, n + 1), i -> abs(v[i] - v[i - 12])) AS es
  FROM step2
)
SELECT CAST(n AS BIGINT) AS n_months,
       CAST(len(em) AS BIGINT) AS n_eval,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), em), (a, b) -> a + b)
         / CAST(len(em) AS DOUBLE) AS mae_model,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), es), (a, b) -> a + b)
         / CAST(len(es) AS DOUBLE) AS mae_snaive,
       1.0 - (list_reduce(list_prepend(CAST(0.0 AS DOUBLE), em), (a, b) -> a + b)
              / CAST(len(em) AS DOUBLE))
           / (list_reduce(list_prepend(CAST(0.0 AS DOUBLE), es), (a, b) -> a + b)
              / CAST(len(es) AS DOUBLE)) AS skill_vs_snaive
FROM errs
"""


@register(
    "orders_holt_backtest",
    oracle=_HBT_ORACLE,
    doc="rolling-origin backtest of the Holt forecast: one-step-ahead "
    "errors from the prefix states vs the seasonal-naive baseline on the "
    "same months (t >= 14), MAE + skill score — deterministic index-order "
    "folds, exact cross-engine",
    tags=("stats", "timeseries", "forecast", "eval", "extension"),
)
def orders_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    cents = (
        F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)") * 100
    ).cast("long")
    monthly = (
        o.select(
            (
                F.year("o_orderdate").cast("long") * 12
                + F.month("o_orderdate").cast("long")
                - 1
            ).alias("ym0"),
            cents.alias("c"),
        )
        .groupBy("ym0")
        .agg(F.sum("c").alias("cents"))
    )
    packed = monthly.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ym0", "cents"))),
            lambda s: s["cents"].cast("double") / F.lit(100.0),
        ).alias("v")
    )
    step1 = packed.select(
        "v",
        F.transform("v", lambda x: F.array(x, F.lit(0.0))).alias("va"),
        F.size("v").alias("n"),
    )
    alpha, beta = F.lit(0.25), F.lit(0.125)

    def holt_step(acc, x):
        lvl = alpha * F.element_at(x, 1) + (F.lit(1.0) - alpha) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        tr = beta * (
            alpha * F.element_at(x, 1)
            + (F.lit(1.0) - alpha)
            * (F.element_at(acc, 1) + F.element_at(acc, 2))
            - F.element_at(acc, 1)
        ) + (F.lit(1.0) - beta) * F.element_at(acc, 2)
        return F.array(lvl, tr)

    init = F.array(
        F.element_at(F.col("v"), 1),
        F.element_at(F.col("v"), 2) - F.element_at(F.col("v"), 1),
    )
    step2 = step1.select(
        "v",
        "n",
        F.transform(
            F.sequence(F.lit(1), F.col("n")),
            lambda i: F.aggregate(
                F.slice("va", F.lit(2), i - F.lit(1)), init, holt_step
            ),
        ).alias("st"),
    )
    em = F.transform(
        F.sequence(F.lit(14), F.col("n")),
        lambda i: F.abs(
            F.element_at(F.col("v"), i)
            - (
                F.element_at(F.try_element_at("st", i - F.lit(1)), 1)
                + F.element_at(F.try_element_at("st", i - F.lit(1)), 2)
            )
        ),
    )
    es = F.transform(
        F.sequence(F.lit(14), F.col("n")),
        lambda i: F.abs(
            F.element_at(F.col("v"), i) - F.element_at(F.col("v"), i - F.lit(12))
        ),
    )
    errs = step2.select("n", em.alias("em"), es.alias("es"))
    zero = F.lit(0.0)
    mae_m = F.aggregate("em", zero, lambda a, b: a + b) / F.size("em").cast(
        "double"
    )
    mae_s = F.aggregate("es", zero, lambda a, b: a + b) / F.size("es").cast(
        "double"
    )
    return errs.select(
        F.col("n").cast("long").alias("n_months"),
        F.size("em").cast("long").alias("n_eval"),
        mae_m.alias("mae_model"),
        mae_s.alias("mae_snaive"),
        (F.lit(1.0) - mae_m / mae_s).alias("skill_vs_snaive"),
    )


# --- supplier revenue Gini coefficient ----------------------------------------------
# The inequality complement to nation_revenue_hhi: Gini over supplier
# revenue, computed exactly at scale with the distributed prefix-sum
# rank — G = 2*sum(rank_i * x_i) / (n * sum(x)) - (n + 1)/n with ranks
# ascending by (revenue, suppkey). rank*revenue products stay DECIMAL
# (exact); the two final casts round to scale 0 first so the
# decimal->double hop is exact below 2^53 of units (documented boundary:
# beyond ~10^15 revenue-rank units, compute per-stratum Ginis).

_GINI_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS r
  FROM lineitem GROUP BY l_suppkey
), ranked AS (
  SELECT l_suppkey, r,
         CAST(ROW_NUMBER() OVER (ORDER BY r, l_suppkey) AS BIGINT) AS rk
  FROM rev
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(round(SUM(r), 0) AS DOUBLE) AS t,
         CAST(round(SUM(rk * r), 0) AS DOUBLE) AS s1
  FROM ranked
)
SELECT n AS n_suppliers,
       t AS total_revenue,
       2.0 * s1 / (CAST(n AS DOUBLE) * t) - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)
         AS gini
FROM agg
"""


@register(
    "supplier_revenue_gini",
    oracle=_GINI_ORACLE,
    doc="Gini coefficient of supplier revenue: ranks via the distributed "
    "prefix sum (never a single-partition window), rank*revenue kept "
    "DECIMAL-exact, scale-0 rounding before the only double casts",
    tags=("stats", "inequality", "prefix-sum", "extension"),
)
def supplier_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(27,6)"
            )
        ).alias("r")
    )
    rev = rev.withColumn("one", F.lit(1).cast("long"))
    cum, release, total_n = global_prefix_sum(
        spark, rev, "one", [F.col("r").asc(), F.col("l_suppkey").asc()]
    )
    ranked = cum.withColumn("rk", F.col("cum").cast("long"))
    agg = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("r"), 0).cast("double").alias("t"),
        F.round(F.sum(F.col("rk") * F.col("r")), 0).cast("double").alias("s1"),
    )
    out = agg.select(
        F.col("n").alias("n_suppliers"),
        F.col("t").alias("total_revenue"),
        (
            F.lit(2.0) * F.col("s1") / (F.col("n").cast("double") * F.col("t"))
            - (F.col("n") + 1).cast("double") / F.col("n").cast("double")
        ).alias("gini"),
    )
    out = pin_small_result(out, 16)
    release()
    return out


# --- chained unit-value price index --------------------------------------------------
# The Drobisch unit-value index: monthly price level = total revenue /
# total quantity, month-over-month link ratios, chained to a base-100
# series — the inflation readout procurement teams actually track. Both
# numerator (cents) and denominator (quantity thousandths) are exact
# integers per month; each link is two exact casts + one division; the
# chain is a prefix product folded in month order (the Kaplan-Meier
# discipline). Calendar-bounded array; one partial-aggregated shuffle.

_UVI_ORACLE = """
WITH monthly AS (
  SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month_str,
         (CAST(year(l_shipdate) AS BIGINT) * 12 + CAST(month(l_shipdate) AS BIGINT)) AS ym,
         CAST(SUM(CAST(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,3)) * 1000 AS BIGINT)) AS BIGINT) AS qmil
  FROM lineitem GROUP BY 1, 2
), packed AS (
  SELECT list(struct_pack(m := month_str, c := cents, q := qmil) ORDER BY ym) AS arr
  FROM monthly
), uv AS (
  SELECT arr,
         list_transform(arr, s -> CAST(s.c AS DOUBLE) / CAST(s.q AS DOUBLE)) AS p,
         len(arr) AS n
  FROM packed
), links AS (
  SELECT arr, p, n,
         list_transform(range(1, n + 1),
            i -> CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE) ELSE p[i] / p[i - 1] END) AS lk
  FROM uv
)
SELECT arr[i].m AS month_str,
       p[i] AS unit_value,
       lk[i] AS link_ratio,
       100.0 * list_reduce(list_prepend(CAST(1.0 AS DOUBLE), list_slice(lk, 1, i)),
                           (a, b) -> a * b) AS chained_index
FROM (SELECT unnest(range(1, n + 1)) AS i, arr, p, lk FROM links)
"""


@register(
    "lineitem_unit_value_index",
    oracle=_UVI_ORACLE,
    doc="chained unit-value (Drobisch) price index of shipped lines: "
    "exact integer monthly revenue/quantity, IEEE link ratios, base-100 "
    "chain folded in month order — calendar-bounded, exact cross-engine",
    tags=("stats", "timeseries", "index", "extension"),
)
def lineitem_unit_value_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = (
        F.round(F.col("l_extendedprice"), 2).cast("decimal(18,2)") * 100
    ).cast("long")
    qmil = (F.col("l_quantity").cast("decimal(18,3)") * 1000).cast("long")
    monthly = (
        li.select(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
                "month_str"
            ),
            (
                F.year("l_shipdate").cast("long") * 12
                + F.month("l_shipdate").cast("long")
            ).alias("ym"),
            cents.alias("c0"),
            qmil.alias("q0"),
        )
        .groupBy("month_str", "ym")
        .agg(
            F.sum("c0").cast("long").alias("cents"),
            F.sum("q0").cast("long").alias("qmil"),
        )
    )
    packed = monthly.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("ym").alias("ym"),
                    F.col("month_str").alias("m"),
                    F.col("cents").alias("c"),
                    F.col("qmil").alias("q"),
                )
            )
        ).alias("arr")
    )
    uv = packed.select(
        "arr",
        F.transform(
            "arr", lambda s: s["c"].cast("double") / s["q"].cast("double")
        ).alias("p"),
        F.size("arr").alias("n"),
    )
    links = uv.select(
        "arr",
        "p",
        "n",
        F.transform(
            F.sequence(F.lit(1), F.col("n")),
            lambda i: F.when(i == 1, F.lit(1.0)).otherwise(
                F.element_at(F.col("p"), i)
                / F.try_element_at(F.col("p"), (i - F.lit(1)).cast("int"))
            ),
        ).alias("lk"),
    )
    rows = links.select(
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i"), "arr", "p", "lk"
    )
    return rows.select(
        F.element_at("arr", F.col("i"))["m"].alias("month_str"),
        F.element_at("p", F.col("i")).alias("unit_value"),
        F.element_at("lk", F.col("i")).alias("link_ratio"),
        (
            F.lit(100.0)
            * F.aggregate(
                F.slice("lk", F.lit(1), F.col("i")),
                F.lit(1.0),
                lambda a, b: a * b,
            )
        ).alias("chained_index"),
    )
