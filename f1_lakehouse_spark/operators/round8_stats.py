"""Round-8 operations-research / econometrics operators over the TPC-H-ish
star schema: newsvendor service-level quantiles, log-log price elasticity,
and a Bass diffusion fit — the demand-planning trio a lakehouse analytics
layer runs next to its forecasting family (Holt / Croston / hierarchical
reconcile in round5/6_stats).

Determinism contract (CLAUDE.md): order statistics go through the
distributed grouped prefix rank (never a scaling-partition window sort);
every cross-row float reduction is a left fold over a packed, explicitly
sorted, BOUNDED array (price buckets, calendar months); decimal sums of
raw parquet doubles use low scales (2-3) so both engines' casts agree; the
only transcendentals (ln / sqrt) apply to identical doubles in identical
expression order, with round(,9) absorbing the last ulp on output (the
BM25 idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.pinning import pin_small_result
from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table

# --- newsvendor service-level quantile ----------------------------------------------
# The classic single-period inventory policy: stock to the q-th quantile
# of demand where q = cu/(cu+co) is the critical fractile. Here q = 0.8
# over order values per customer nation — the EXACT per-group order
# statistic (percentile_disc semantics: smallest value whose rank reaches
# ceil(q*n)), computed with the distributed grouped prefix rank (nation is
# a bounded-cardinality, potentially SKEWED group key; a per-nation window
# sort would hand the largest nation to one task at 100 TB).

NEWSVENDOR_PCT_NUM = 4  # q = 4/5 = 0.8 critical fractile
NEWSVENDOR_PCT_DEN = 5


@register(
    "orders_newsvendor_quantile",
    oracle=f"""
WITH j AS (
  SELECT n.n_name, o.o_totalprice, o.o_orderkey
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
r AS (
  SELECT n_name, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY o_totalprice, o_orderkey) AS rk,
         COUNT(*) OVER (PARTITION BY n_name) AS n_g
  FROM j
)
SELECT n_name, CAST(n_g AS BIGINT) AS n_orders,
       CAST(0.8 AS DOUBLE) AS service_level,
       o_totalprice AS newsvendor_price
FROM r
WHERE rk = ({NEWSVENDOR_PCT_NUM} * n_g + {NEWSVENDOR_PCT_DEN - 1})
          // {NEWSVENDOR_PCT_DEN}
""",
    doc="newsvendor stocking quantile per customer nation: exact 0.8 "
    "critical-fractile order statistic of order value (percentile_disc "
    "semantics, integer rank arithmetic) via the distributed grouped "
    "prefix rank — skew-safe, never a per-nation window sort",
    tags=("stats", "inventory", "quantile"),
)
def orders_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_lakehouse_spark.operators.extensions import (  # noqa: PLC0415
        grouped_prefix_rank,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select("n_name", "o_totalprice", "o_orderkey")
    )
    ranked, release = grouped_prefix_rank(
        spark, j, ["n_name"], [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    )
    # ceil(q*n) = (num*n + den-1) div den on exact integers
    target = F.expr(
        f"({NEWSVENDOR_PCT_NUM} * n_g + {NEWSVENDOR_PCT_DEN - 1}) "
        f"div {NEWSVENDOR_PCT_DEN}"
    )
    out = ranked.filter(F.col("rank") == target).select(
        "n_name",
        F.col("n_g").alias("n_orders"),
        F.lit(0.8).alias("service_level"),
        F.col("o_totalprice").alias("newsvendor_price"),
    )
    out = pin_small_result(out, 25)  # one row per nation
    release()
    return out


# --- log-log price elasticity of demand ---------------------------------------------
# Elasticity = d ln(quantity) / d ln(price), the canonical demand-curve
# readout. The raw scan collapses to (returnflag x price-bucket) cells
# with exact decimal sums (map-side combine, bounded ~22 buckets per
# flag); cell means take ONE exact int->double conversion each (decimal
# sums rounded to scale 0 — bit-identical at any magnitude, CLAUDE trap
# #3); the OLS of ln(mean_qty) on ln(mean_price) folds over the packed
# bucket array in bucket order.

ELASTICITY_BUCKET_WIDTH = 5_000  # l_extendedprice in [900, 105k] -> <=22 cells


def _elast_fold_sql(term: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(a, g -> {term})), (x, y) -> x + y)"
    )


_ELAST_LNP = "ln(CAST(g.sp AS DOUBLE) / CAST(g.n AS DOUBLE))"
_ELAST_LNQ = "ln(CAST(g.sq AS DOUBLE) / CAST(g.n AS DOUBLE))"


@register(
    "lineitem_price_elasticity",
    oracle=f"""
WITH cells AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice / {ELASTICITY_BUCKET_WIDTH}.0) AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,3))), 0) AS BIGINT) AS sq,
         CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 0) AS BIGINT) AS sp
  FROM lineitem GROUP BY 1, 2
),
packed AS (
  SELECT l_returnflag,
         list(struct_pack(bucket := bucket, n := n, sq := sq, sp := sp)
              ORDER BY bucket) AS a,
         CAST(SUM(n) AS BIGINT) AS n_lines
  FROM cells GROUP BY 1
),
sums AS (
  SELECT l_returnflag, n_lines, CAST(len(a) AS DOUBLE) AS k,
         {_elast_fold_sql(_ELAST_LNP)} AS sx,
         {_elast_fold_sql(_ELAST_LNQ)} AS sy,
         {_elast_fold_sql(f"{_ELAST_LNP} * {_ELAST_LNQ}")} AS sxy,
         {_elast_fold_sql(f"{_ELAST_LNP} * {_ELAST_LNP}")} AS sxx
  FROM packed
)
SELECT l_returnflag, CAST(k AS BIGINT) AS n_buckets, n_lines,
       CASE WHEN k >= 2 AND (k * sxx - sx * sx) <> CAST(0.0 AS DOUBLE)
            THEN round((k * sxy - sx * sy) / (k * sxx - sx * sx), 9)
            END AS elasticity,
       CASE WHEN k >= 2 AND (k * sxx - sx * sx) <> CAST(0.0 AS DOUBLE)
            THEN round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k, 9)
            END AS ln_c
FROM sums
""",
    doc="log-log price elasticity of demand per returnflag: OLS of "
    "ln(mean qty) on ln(mean price) across exact-decimal price-bucket "
    "cells — one map-side-combined cell aggregate, bounded per-flag folds",
    tags=("stats", "econometrics"),
)
def lineitem_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") / ELASTICITY_BUCKET_WIDTH)
        .cast("long")
        .alias("bucket"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,3)")), 0)
        .cast("long")
        .alias("sq"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 0)
        .cast("long")
        .alias("sp"),
    )
    packed = cells.groupBy("l_returnflag").agg(
        F.sort_array(
            F.collect_list(F.struct("bucket", "n", "sq", "sp"))
        ).alias("a"),
        F.sum("n").cast("long").alias("n_lines"),
    )

    def fold(term):
        return F.aggregate(F.transform("a", term), F.lit(0.0), lambda x, y: x + y)

    lnp = lambda g: F.log(g["sp"].cast("double") / g["n"].cast("double"))  # noqa: E731
    lnq = lambda g: F.log(g["sq"].cast("double") / g["n"].cast("double"))  # noqa: E731
    sums = packed.select(
        "l_returnflag",
        "n_lines",
        F.size("a").cast("double").alias("k"),
        fold(lambda g: lnp(g)).alias("sx"),
        fold(lambda g: lnq(g)).alias("sy"),
        fold(lambda g: lnp(g) * lnq(g)).alias("sxy"),
        fold(lambda g: lnp(g) * lnp(g)).alias("sxx"),
    )
    k, sx, sy, sxy, sxx = (F.col(c) for c in ("k", "sx", "sy", "sxy", "sxx"))
    det = k * sxx - sx * sx
    slope = (k * sxy - sx * sy) / det
    ok = (k >= 2) & (det != F.lit(0.0))
    return sums.select(
        "l_returnflag",
        F.col("k").cast("long").alias("n_buckets"),
        "n_lines",
        F.when(ok, F.round(slope, 9)).alias("elasticity"),
        F.when(ok, F.round((sy - slope * sx) / k, 9)).alias("ln_c"),
    )


# --- Bass diffusion fit --------------------------------------------------------------
# Bass (1969) new-product adoption: n_t = p*M + (q-p)*N_{t-1} - (q/M)*N²,
# fit by the standard discrete-time OLS n_t = a + b*N + c*N² over monthly
# first-order ("adoption") counts, then p/q/M recovered from the roots of
# c*M² + b*M + a = 0. Months are CALENDAR-BOUNDED (~80), so the cumulative
# N_{t-1} builds with per-position slice folds over the packed month array
# (the sanctioned bounded-array exception, cf. orders_acf_ljung_box), and
# the 3x3 normal equations solve by Cramer's rule in fixed-order double
# arithmetic — bit-identical cross-engine.

_BASS_CUM = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(a[1:i-1], g -> CAST(g.cnt AS DOUBLE))), (x, y) -> x + y)"
)


def _bass_fold_sql(term: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(pts, g -> {term})), (x, y) -> x + y)"
    )


_BASS_ORACLE = f"""
WITH adopt AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_dt FROM orders GROUP BY 1
),
monthly AS (
  SELECT CAST((year(first_dt) - 1995) * 12 + month(first_dt) - 1 AS BIGINT) AS midx,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM adopt GROUP BY 1
),
packed AS (
  SELECT list(struct_pack(midx := midx, cnt := cnt) ORDER BY midx) AS a FROM monthly
),
pts_t AS (
  SELECT len(a) AS t,
         CASE WHEN len(a) >= 2 THEN
           list_transform(generate_series(2, len(a)),
             i -> struct_pack(y := CAST(a[i].cnt AS DOUBLE), x := {_BASS_CUM}))
         ELSE [] END AS pts
  FROM packed
),
sums AS (
  SELECT CAST(t AS BIGINT) AS n_months,
         CAST(len(pts) AS DOUBLE) AS s0,
         {_bass_fold_sql('g.x')} AS s1,
         {_bass_fold_sql('g.x * g.x')} AS s2,
         {_bass_fold_sql('g.x * g.x * g.x')} AS s3,
         {_bass_fold_sql('g.x * g.x * g.x * g.x')} AS s4,
         {_bass_fold_sql('g.y')} AS sy,
         {_bass_fold_sql('g.x * g.y')} AS sxy,
         {_bass_fold_sql('g.x * g.x * g.y')} AS sx2y
  FROM pts_t
),
solved AS (
  SELECT n_months, s0,
         (s0 * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s3 * s2)
          + s2 * (s1 * s3 - s2 * s2)) AS det,
         (sy * (s2 * s4 - s3 * s3) - s1 * (sxy * s4 - s3 * sx2y)
          + s2 * (sxy * s3 - s2 * sx2y)) AS det_a,
         (s0 * (sxy * s4 - sx2y * s3) - sy * (s1 * s4 - s3 * s2)
          + s2 * (s1 * sx2y - s2 * sxy)) AS det_b,
         (s0 * (s2 * sx2y - s3 * sxy) - s1 * (s1 * sx2y - sxy * s2)
          + sy * (s1 * s3 - s2 * s2)) AS det_c
  FROM sums
),
coefs AS (
  SELECT n_months,
         CASE WHEN s0 >= 3 AND det <> CAST(0.0 AS DOUBLE) THEN det_a / det END AS a,
         CASE WHEN s0 >= 3 AND det <> CAST(0.0 AS DOUBLE) THEN det_b / det END AS b,
         CASE WHEN s0 >= 3 AND det <> CAST(0.0 AS DOUBLE) THEN det_c / det END AS c
  FROM solved
),
roots AS (
  SELECT n_months, a, b, c,
         CASE WHEN c IS NOT NULL AND c <> CAST(0.0 AS DOUBLE)
                   AND b * b - 4.0 * a * c >= CAST(0.0 AS DOUBLE)
              THEN (-b - sqrt(b * b - 4.0 * a * c)) / (2.0 * c) END AS m
  FROM coefs
)
SELECT n_months,
       round(a, 9) AS a, round(b, 9) AS b, round(c, 9) AS c,
       round(m, 9) AS m_total,
       CASE WHEN m IS NOT NULL AND m <> CAST(0.0 AS DOUBLE)
            THEN round(a / m, 9) END AS p_coef,
       CASE WHEN m IS NOT NULL AND m <> CAST(0.0 AS DOUBLE)
            THEN round(a / m + b, 9) END AS q_coef
FROM roots
"""


@register(
    "orders_bass_diffusion",
    oracle=_BASS_ORACLE,
    doc="Bass (1969) diffusion fit over monthly first-order adoption "
    "counts: discrete-time OLS n_t = a + b*N + c*N^2 (3x3 Cramer solve) "
    "with innovation p / imitation q / market size M recovered from the "
    "quadratic root — one customer aggregate + one calendar-bounded "
    "month aggregate, folds over the packed month array",
    tags=("stats", "forecast", "econometrics"),
)
def orders_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    adopt = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    monthly = adopt.groupBy(
        ((F.year("first_dt") - 1995) * 12 + F.month("first_dt") - 1)
        .cast("long")
        .alias("midx")
    ).agg(F.count("*").cast("long").alias("cnt"))
    packed = monthly.agg(
        F.sort_array(F.collect_list(F.struct("midx", "cnt"))).alias("a")
    )
    # N_{i-1}: fold over the slice a[1:i-1] — slice of a MATERIALIZED
    # column (would-be-empty-range rule); the whole array is
    # calendar-bounded (~80 months), the sanctioned O(T^2) exception
    cum = lambda i: F.aggregate(  # noqa: E731
        F.transform(
            F.slice("a", F.lit(1), i - F.lit(1)), lambda g: g["cnt"].cast("double")
        ),
        F.lit(0.0),
        lambda x, y: x + y,
    )
    t = F.size("a")
    pts_expr = F.when(
        t >= 2,
        F.transform(
            F.sequence(F.lit(2), t),
            lambda i: F.struct(
                F.element_at("a", i)["cnt"].cast("double").alias("y"),
                cum(i).alias("x"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<y:double,x:double>>"))
    pts_t = packed.select(t.cast("long").alias("n_months"), pts_expr.alias("pts"))

    def fold(term):
        return F.aggregate(F.transform("pts", term), F.lit(0.0), lambda x, y: x + y)

    sums = pts_t.select(
        "n_months",
        F.size("pts").cast("double").alias("s0"),
        fold(lambda g: g["x"]).alias("s1"),
        fold(lambda g: g["x"] * g["x"]).alias("s2"),
        fold(lambda g: g["x"] * g["x"] * g["x"]).alias("s3"),
        fold(lambda g: g["x"] * g["x"] * g["x"] * g["x"]).alias("s4"),
        fold(lambda g: g["y"]).alias("sy"),
        fold(lambda g: g["x"] * g["y"]).alias("sxy"),
        fold(lambda g: g["x"] * g["x"] * g["y"]).alias("sx2y"),
    )
    s0, s1, s2, s3, s4 = (F.col(c) for c in ("s0", "s1", "s2", "s3", "s4"))
    sy, sxy, sx2y = (F.col(c) for c in ("sy", "sxy", "sx2y"))
    det = s0 * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s3 * s2) + s2 * (
        s1 * s3 - s2 * s2
    )
    det_a = sy * (s2 * s4 - s3 * s3) - s1 * (sxy * s4 - s3 * sx2y) + s2 * (
        sxy * s3 - s2 * sx2y
    )
    det_b = s0 * (sxy * s4 - sx2y * s3) - sy * (s1 * s4 - s3 * s2) + s2 * (
        s1 * sx2y - s2 * sxy
    )
    det_c = s0 * (s2 * sx2y - s3 * sxy) - s1 * (s1 * sx2y - sxy * s2) + sy * (
        s1 * s3 - s2 * s2
    )
    okd = (s0 >= 3) & (det != F.lit(0.0))
    coefs = sums.select(
        "n_months",
        F.when(okd, det_a / det).alias("a"),
        F.when(okd, det_b / det).alias("b"),
        F.when(okd, det_c / det).alias("c"),
    )
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    disc = b * b - F.lit(4.0) * a * c
    roots = coefs.select(
        "n_months",
        "a",
        "b",
        "c",
        F.when(
            c.isNotNull() & (c != F.lit(0.0)) & (disc >= F.lit(0.0)),
            (-b - F.sqrt(disc)) / (F.lit(2.0) * c),
        ).alias("m"),
    )
    m = F.col("m")
    return roots.select(
        "n_months",
        F.round("a", 9).alias("a"),
        F.round("b", 9).alias("b"),
        F.round("c", 9).alias("c"),
        F.round(m, 9).alias("m_total"),
        F.when(m.isNotNull() & (m != F.lit(0.0)), F.round(a / m, 9)).alias("p_coef"),
        F.when(m.isNotNull() & (m != F.lit(0.0)), F.round(a / m + b, 9)).alias(
            "q_coef"
        ),
    )


# --- RANGE-interval window frame ------------------------------------------------------
# The time-interval window frame the SQL surface was still missing: a
# per-customer rolling 28-day spend via RANGE BETWEEN 27 PRECEDING AND
# CURRENT ROW over integer epoch days — peers at the same day aggregate
# identically in both engines (RANGE, not ROWS, so no tiebreak ambiguity
# exists to begin with). Window partitions are per-customer (bounded ~25
# orders each at any SF — key COUNT scales, partition SIZE does not), and
# the spend accumulates in DECIMAL (order-independent) with one exact
# decimal->double conversion on output (scale-2 unscaled value is a
# 28-day single-customer total — nowhere near 2^53).


@register(
    "w_range_interval_frame",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(COUNT(*) OVER w AS BIGINT) AS rolling_n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
         AS rolling_spend
FROM (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS d,
         o_totalprice
  FROM orders
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY d
             RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
""",
    doc="per-customer rolling 28-day order count + spend via a RANGE "
    "interval frame over integer epoch days (peer rows aggregate "
    "set-wise — no ordering ambiguity), decimal-accumulated spend; "
    "per-customer partitions stay bounded at any SF",
    tags=("windows", "frames"),
)
def w_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price_dec"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("d")
        .rangeBetween(-27, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.count("*").over(w).cast("long").alias("rolling_n"),
        F.sum("price_dec").over(w).cast("double").alias("rolling_spend"),
    )


# --- Hill tail-index estimator --------------------------------------------------------
# The standard heavy-tail diagnostic for a value distribution (revenue,
# latency, token counts): over the top-k order statistics,
#     alpha_hat = k / sum_{i<=k} ln(x_(i) / x_(k+1)),
# the Hill (1975) MLE of the Pareto tail exponent — the companion to the
# mean-excess EVT curve (lineitem_mean_excess_evt) from the estimation
# side. Top-(k+1) comes from TakeOrderedAndProject (plan-visible bound,
# never a global sort); the fold runs over the packed, explicitly sorted
# (k+1)-element array; ln applies to one double division per element in
# rank order (the BM25 idiom, round(,9) on output).

HILL_K = 200


@register(
    "events_hill_tail_index",
    oracle=f"""
WITH topk AS (
  SELECT value, event_id
  FROM events
  WHERE event_type = 'purchase' AND value > 0
  ORDER BY value DESC, event_id
  LIMIT {HILL_K + 1}
),
packed AS (
  SELECT list(value ORDER BY value DESC, event_id) AS xs,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM topk
),
folded AS (
  SELECT m, xs[{HILL_K + 1}] AS x_threshold,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(xs[1:{HILL_K}], x -> ln(x / (xs[{HILL_K + 1}])))),
           (a, b) -> a + b) AS lnsum
  FROM packed WHERE m = {HILL_K + 1}
)
SELECT CAST({HILL_K} AS BIGINT) AS k, x_threshold,
       round(lnsum, 9) AS sum_log_excess,
       CASE WHEN lnsum > CAST(0.0 AS DOUBLE)
            THEN round(CAST({HILL_K} AS DOUBLE) / lnsum, 9) END AS hill_alpha,
       CASE WHEN lnsum > CAST(0.0 AS DOUBLE)
            THEN round(lnsum / CAST({HILL_K} AS DOUBLE), 9) END AS tail_gamma
FROM folded
""",
    doc=f"Hill tail-index MLE of the purchase-value distribution over the "
    f"top-{HILL_K} order statistics (TakeOrdered bound, packed-array fold, "
    "ln of per-element ratios in rank order) — the heavy-tail exponent "
    "companion to the mean-excess EVT curve",
    tags=("stats", "tail", "events"),
)
def events_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    )
    topk = (
        e.select("value", "event_id")
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(HILL_K + 1)
    )
    packed = topk.agg(
        # (value desc, event_id asc) via sort on (-value, event_id): a
        # plain reverse(sort_array) would flip the event_id tiebreak too
        F.sort_array(
            F.collect_list(
                F.struct((-F.col("value")).alias("nv"), F.col("event_id").alias("eid"))
            )
        ).alias("ordered"),
        F.count("*").cast("long").alias("m"),
    )
    xs = F.transform("ordered", lambda g: -g["nv"])
    packed = packed.select(xs.alias("xs"), "m").where(F.col("m") == HILL_K + 1)
    xk1 = F.element_at("xs", HILL_K + 1)
    # element_at over the unmaterialized xs transform inside the fold is
    # the sanctioned CONSTANT-BOUNDED exception (CLAUDE.md): xs is exactly
    # HILL_K+1 = 201 elements by the m filter, so CollapseProject's
    # re-evaluation is a fixed ~200x201 of cheap negations — document it
    # here so a future HILL_K raise re-audits this site.
    # Also: single-arg lambda, closure capture — a default arg would make
    # this the two-arg (value, index) form and hand xk1 the ELEMENT INDEX
    # (the CLAUDE.md arity trap)
    lnsum = F.aggregate(
        F.transform(F.slice("xs", 1, HILL_K), lambda x: F.log(x / xk1)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    folded = packed.select(
        xk1.alias("x_threshold"), lnsum.alias("lnsum")
    )
    ok = F.col("lnsum") > F.lit(0.0)
    return folded.select(
        F.lit(HILL_K).cast("long").alias("k"),
        "x_threshold",
        F.round("lnsum", 9).alias("sum_log_excess"),
        F.when(ok, F.round(F.lit(float(HILL_K)) / F.col("lnsum"), 9)).alias(
            "hill_alpha"
        ),
        F.when(ok, F.round(F.col("lnsum") / F.lit(float(HILL_K)), 9)).alias(
            "tail_gamma"
        ),
    )


# --- Weibull quantile fit of fulfillment durations -----------------------------------
# Reliability-engineering readout: fit Weibull(k, lambda) to order
# fulfillment durations by the two-quantile estimator
#     k = [ln(-ln(0.25)) - ln(-ln(0.75))] / [ln(x75) - ln(x25)]
#     lambda = x50 / (ln 2)^(1/k)
# (linearized CDF through the exact 25/50/75th order statistics). The
# durations are CALENDAR-BOUNDED integers (days), so the exact quantiles
# come from a bounded duration histogram folded once with a DOUBLE-list
# accumulator [cum, q25, q50, q75] (the Holt-pattern state list) — no
# global sort, no prefix machinery needed. The only transcendentals are
# the final ln/exp chain on exact integer-valued doubles, with every
# literal CAST AS DOUBLE in the oracle (DuckDB decimal-literal trap).

_WEIB_FOLD_INIT = "[CAST(0.0 AS DOUBLE), -1.0, -1.0, -1.0]"


@register(
    "orders_weibull_quantile_fit",
    oracle=f"""
WITH dur AS (
  SELECT o.o_orderkey,
         CAST(date_diff('day', o.o_orderdate, MAX(l.l_shipdate)) + 1 AS BIGINT) AS d
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
),
hist AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt FROM dur GROUP BY 1),
packed AS (
  SELECT list(struct_pack(d := d, cnt := cnt) ORDER BY d) AS a,
         CAST(SUM(cnt) AS BIGINT) AS n
  FROM hist
),
folded AS (
  SELECT n,
    list_reduce(
      list_prepend({_WEIB_FOLD_INIT},
        list_transform(a, g -> [CAST(g.d AS DOUBLE), CAST(g.cnt AS DOUBLE),
                                0.0, 0.0])),
      (acc, e) -> [
        acc[1] + e[2],
        CASE WHEN acc[2] >= CAST(0.0 AS DOUBLE) THEN acc[2]
             WHEN acc[1] + e[2] >= CAST((n + 3) // 4 AS DOUBLE) THEN e[1]
             ELSE -1.0 END,
        CASE WHEN acc[3] >= CAST(0.0 AS DOUBLE) THEN acc[3]
             WHEN acc[1] + e[2] >= CAST((n + 1) // 2 AS DOUBLE) THEN e[1]
             ELSE -1.0 END,
        CASE WHEN acc[4] >= CAST(0.0 AS DOUBLE) THEN acc[4]
             WHEN acc[1] + e[2] >= CAST((3 * n + 3) // 4 AS DOUBLE) THEN e[1]
             ELSE -1.0 END]
    ) AS st
  FROM packed
),
qs AS (
  SELECT n, st[2] AS x25, st[3] AS x50, st[4] AS x75 FROM folded
),
fit AS (
  SELECT n, x25, x50, x75,
         CASE WHEN x75 > x25 AND x25 > CAST(0.0 AS DOUBLE)
              THEN (ln(-ln(CAST(0.25 AS DOUBLE))) - ln(-ln(CAST(0.75 AS DOUBLE))))
                   / (ln(x75) - ln(x25)) END AS k
  FROM qs
)
SELECT n AS n_orders,
       CAST(x25 AS BIGINT) AS q25_days,
       CAST(x50 AS BIGINT) AS q50_days,
       CAST(x75 AS BIGINT) AS q75_days,
       round(k, 9) AS weibull_k,
       CASE WHEN k IS NOT NULL AND k <> CAST(0.0 AS DOUBLE)
            THEN round(x50 / exp(ln(ln(CAST(2.0 AS DOUBLE))) / k), 9)
            END AS weibull_lambda
FROM fit
""",
    doc="Weibull(k, lambda) fit of order fulfillment durations via the "
    "two-quantile linearized-CDF estimator over EXACT 25/50/75th order "
    "statistics — calendar-bounded duration histogram folded once with a "
    "DOUBLE-list accumulator, no global sort; single-row output",
    tags=("stats", "reliability", "survival"),
)
def orders_weibull_quantile_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dur = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(o["o_orderkey"], o["o_orderdate"])
        .agg(F.max("l_shipdate").alias("ship"))
        .select(
            (F.datediff(F.col("ship"), F.col("o_orderdate")) + 1)
            .cast("long")
            .alias("d")
        )
    )
    hist = dur.groupBy("d").agg(F.count("*").cast("long").alias("cnt"))
    packed = hist.agg(
        F.sort_array(F.collect_list(F.struct("d", "cnt"))).alias("a"),
        F.sum("cnt").cast("long").alias("n"),
    )
    k25 = F.expr("(n + 3) div 4").cast("double")
    k50 = F.expr("(n + 1) div 2").cast("double")
    k75 = F.expr("(3 * n + 3) div 4").cast("double")

    def merge(acc, e):
        cum = F.element_at(acc, 1) + e["cnt"].cast("double")

        def pick(slot, k_thr):
            prev = F.element_at(acc, slot)
            return F.when(prev >= F.lit(0.0), prev).otherwise(
                F.when(cum >= k_thr, e["d"].cast("double")).otherwise(F.lit(-1.0))
            )

        return F.array(cum, pick(2, k25), pick(3, k50), pick(4, k75))

    init = F.array(F.lit(0.0), F.lit(-1.0), F.lit(-1.0), F.lit(-1.0))
    st = F.aggregate("a", init, merge)
    qs = packed.select(
        "n",
        F.element_at(st, 2).alias("x25"),
        F.element_at(st, 3).alias("x50"),
        F.element_at(st, 4).alias("x75"),
    )
    y_hi = F.log(-F.log(F.lit(0.25)))
    y_lo = F.log(-F.log(F.lit(0.75)))
    x25, x50, x75 = F.col("x25"), F.col("x50"), F.col("x75")
    k = F.when(
        (x75 > x25) & (x25 > F.lit(0.0)),
        (y_hi - y_lo) / (F.log(x75) - F.log(x25)),
    )
    fit = qs.select("n", "x25", "x50", "x75", k.alias("k"))
    kk = F.col("k")
    return fit.select(
        F.col("n").alias("n_orders"),
        x25.cast("long").alias("q25_days"),
        x50.cast("long").alias("q50_days"),
        x75.cast("long").alias("q75_days"),
        F.round(kk, 9).alias("weibull_k"),
        F.when(
            kk.isNotNull() & (kk != F.lit(0.0)),
            F.round(x50 / F.exp(F.log(F.log(F.lit(2.0))) / kk), 9),
        ).alias("weibull_lambda"),
    )
