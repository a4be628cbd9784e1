"""Round-5 statistical operators: robust trend tests, bilateral price
indexes, and cumulative-hazard survival — all exact cross-engine.

Shared discipline (established by orders_holt_forecast /
orders_kaplan_meier_fulfillment, extensions.py): the distributed work is
one partial-aggregated shuffle to a CALENDAR-BOUNDED cell table (~84
months / ~700 week buckets at any SF); everything after is exact integer
arithmetic or IEEE-only left folds over one packed array that both engines
execute isomorphically. No transcendentals except sqrt (correctly rounded
by IEEE-754, hence bit-identical).

Reference parity: the reference ships no statistics beyond AVG/MIN/MAX
(dbt gold models); these provide the trend/inflation/survival readouts a
lakehouse team computes downstream, as first-class distributed operators.
"""

from __future__ import annotations
from f1_lakehouse_spark.pinning import pin_checkpoint, pin_small_result

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table

# --- shared monthly revenue cells (cents-exact, calendar-bounded) -------------------

_MONTHLY_SQL = """
  SELECT (CAST(year(o_orderdate) AS BIGINT) * 12 + CAST(month(o_orderdate) AS BIGINT) - 1) AS ym0,
         CAST(SUM(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
"""


def _monthly_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    cents = (F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)") * 100).cast("long")
    return (
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


# --- Theil-Sen robust trend ----------------------------------------------------------
# Median-of-pairwise-slopes over monthly revenue: robust to outlier months
# where OLS (regression_nation_trend) is not. Pair enumeration is over the
# ~84-month packed array — CALENDAR-bounded (3.5k pairs), independent of
# row count, so the op costs one shuffle at any SF. Slopes divide exact
# cent-integers by exact month gaps; the median picks/averages sorted
# doubles — identical in both engines.

_SEN_MED = (
    "CASE WHEN len({a}) % 2 = 1 THEN {a}[(len({a}) + 1) // 2] "
    "ELSE ({a}[len({a}) // 2] + {a}[len({a}) // 2 + 1]) / CAST(2.0 AS DOUBLE) END"
)

_THEIL_SEN_ORACLE = f"""
WITH monthly AS ({_MONTHLY_SQL}),
packed AS (
  SELECT list(struct_pack(t := ym0, v := CAST(cents AS DOUBLE) / 100.0) ORDER BY ym0) AS arr
  FROM monthly
), slopes AS (
  SELECT arr, len(arr) AS n,
         list_sort(flatten(list_transform(range(1, len(arr) + 1),
            i -> list_transform(range(i + 1, len(arr) + 1),
                   j -> (arr[j].v - arr[i].v) / CAST(arr[j].t - arr[i].t AS DOUBLE))))) AS sl
  FROM packed
), fit AS (
  SELECT arr, n, sl, {_SEN_MED.format(a="sl")} AS slope FROM slopes
), resid AS (
  SELECT n, sl, slope,
         list_sort(list_transform(arr, s -> s.v - slope * CAST(s.t AS DOUBLE))) AS rs
  FROM fit
)
SELECT CAST(n AS BIGINT) AS n_months,
       CAST(len(sl) AS BIGINT) AS n_pairs,
       slope AS sen_slope,
       {_SEN_MED.format(a="rs")} AS sen_intercept,
       slope * 12.0 AS trend_per_year
FROM resid
"""


def _spark_med(a):
    n = F.size(a)
    odd = F.try_element_at(a, ((n + 1) / 2).cast("int"))
    ev = (
        F.try_element_at(a, (n / 2).cast("int"))
        + F.try_element_at(a, (n / 2 + 1).cast("int"))
    ) / F.lit(2.0)
    return F.when(n % 2 == 1, odd).otherwise(ev)


@register(
    "orders_theil_sen_trend",
    oracle=_THEIL_SEN_ORACLE,
    doc="Theil-Sen robust trend of monthly revenue: median of all pairwise "
    "slopes + median-residual intercept. Pairs are calendar-bounded "
    "(~3.5k at any SF); slopes divide exact cent-integers; the median "
    "picks from one sorted array — bit-identical cross-engine.",
    tags=("stats", "trend", "robust", "extension"),
)
def orders_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-slopes estimator; see _THEIL_SEN_ORACLE for the twin.
    100 TB: one partial-aggregated shuffle to ~84 month cells; the O(n²)
    pair set is over months, never rows."""
    monthly = _monthly_cents(spark, sf_dir)
    packed = monthly.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("ym0").alias("t"),
                    (F.col("cents").cast("double") / F.lit(100.0)).alias("v"),
                )
            )
        ).alias("arr")
    )
    arr = F.col("arr")
    slopes = packed.select(
        "arr",
        F.size("arr").alias("n"),
        F.array_sort(
            F.flatten(
                F.transform(
                    # outer i stops at n-1: sequence(n+1, n) is DESCENDING in
                    # Spark, not empty (CLAUDE.md trap), so i=n must not occur
                    F.sequence(F.lit(1), F.size("arr") - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, F.size(arr)),
                        lambda j: (
                            F.element_at(arr, j)["v"] - F.element_at(arr, i)["v"]
                        )
                        / (
                            F.element_at(arr, j)["t"] - F.element_at(arr, i)["t"]
                        ).cast("double"),
                    ),
                )
            )
        ).alias("sl"),
    )
    fit = slopes.select("arr", "n", "sl", _spark_med(F.col("sl")).alias("slope"))
    resid = fit.select(
        "n",
        "sl",
        "slope",
        F.array_sort(
            F.transform(
                "arr", lambda s: s["v"] - F.col("slope") * s["t"].cast("double")
            )
        ).alias("rs"),
    )
    return resid.select(
        F.col("n").cast("long").alias("n_months"),
        F.size("sl").cast("long").alias("n_pairs"),
        F.col("slope").alias("sen_slope"),
        _spark_med(F.col("rs")).alias("sen_intercept"),
        (F.col("slope") * F.lit(12.0)).alias("trend_per_year"),
    )


# --- Mann-Kendall trend test (all-integer S and variance) ----------------------------
# S = sum of sign(v_j - v_i) over i<j computed on exact CENT integers, the
# tie correction from a relational tie-group aggregate (also integers), so
# S, the x18-scaled variance, and the continuity-corrected z are
# deterministic at any parallelism. Only tau and z are doubles (one
# division / one IEEE sqrt each).

_MK_ORACLE = f"""
WITH monthly AS ({_MONTHLY_SQL}),
packed AS (
  SELECT list(cents ORDER BY ym0) AS v, COUNT(*) AS n FROM monthly
), s_stat AS (
  SELECT n, v,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           flatten(list_transform(range(1, len(v) + 1),
             i -> list_transform(range(i + 1, len(v) + 1),
                    j -> CAST(CASE WHEN v[j] > v[i] THEN 1
                                   WHEN v[j] < v[i] THEN -1 ELSE 0 END AS BIGINT))))),
           (a, b) -> a + b) AS s
  FROM packed
), ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
  FROM (SELECT COUNT(*) AS t FROM monthly GROUP BY cents) g
  WHERE t > 1
)
SELECT CAST(n AS BIGINT) AS n_months,
       s AS s_stat,
       CAST(n * (n - 1) * (2 * n + 5) - tie_term AS BIGINT) AS var_s_x18,
       CAST(2.0 AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) AS kendall_tau,
       CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0)
            WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0)
            ELSE CAST(0.0 AS DOUBLE) END AS z_stat
FROM s_stat, ties
"""


@register(
    "orders_mann_kendall_trend",
    oracle=_MK_ORACLE,
    doc="Mann-Kendall monotone-trend test on monthly revenue: S from "
    "pairwise signs over exact cent-integers, tie-corrected variance "
    "emitted x18-scaled (pure BIGINT), Kendall tau and the "
    "continuity-corrected z as the only doubles (IEEE divide + sqrt).",
    tags=("stats", "trend", "extension"),
)
def orders_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric companion to orders_theil_sen_trend (same month
    cells); the pair scan is calendar-bounded, the tie table relational."""
    monthly = _monthly_cents(spark, sf_dir)
    packed = monthly.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ym0"), F.col("cents")))
        ).alias("tv"),
        F.count("*").alias("n"),
    ).select(F.transform("tv", lambda s: s["cents"]).alias("v"), "n")
    v = F.col("v")
    zero = F.lit(0).cast("long")
    s_stat = packed.select(
        "n",
        F.aggregate(
            F.flatten(
                F.transform(
                    # i stops at n-1 — see the descending-sequence note above
                    F.sequence(F.lit(1), F.size("v") - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, F.size(v)),
                        lambda j: F.when(
                            F.element_at(v, j) > F.element_at(v, i), F.lit(1)
                        )
                        .when(F.element_at(v, j) < F.element_at(v, i), F.lit(-1))
                        .otherwise(F.lit(0))
                        .cast("long"),
                    ),
                )
            ),
            zero,
            lambda a, b: a + b,
        ).alias("s"),
    )
    ties = (
        monthly.groupBy("cents")
        .agg(F.count("*").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (F.lit(2) * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    n, s, tie = F.col("n"), F.col("s"), F.col("tie_term")
    var18 = (n * (n - 1) * (F.lit(2) * n + 5) - tie).cast("long")
    sd = F.sqrt(var18.cast("double") / F.lit(18.0))
    return s_stat.crossJoin(F.broadcast(ties)).select(
        n.cast("long").alias("n_months"),
        s.alias("s_stat"),
        var18.alias("var_s_x18"),
        (F.lit(2.0) * s.cast("double") / (n * (n - 1)).cast("double")).alias(
            "kendall_tau"
        ),
        F.when(s > 0, (s - 1).cast("double") / sd)
        .when(s < 0, (s + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
        .alias("z_stat"),
    )


# --- Fisher chained price index over a fixed basket ----------------------------------
# Bilateral Laspeyres / Paasche links between consecutive months over a
# FIXED top-K revenue basket (the CPI design: the basket bounds the fold,
# not the part count — at 100 TB the basket is still 100 parts). The
# part×month cell build is one partial-aggregated shuffle; the month-pair
# terms come from a RELATIONAL self-join of the tiny cell table on
# (partkey, consecutive month) — no per-row lookups, no maps; each month's
# four sums are exact left-folds over its partkey-sorted term array, and
# the chain is a second fold over months. Unit values divide exact
# cent/milli-quantity integers; sqrt is IEEE-exact — every output
# bit-identical. Complements lineitem_unit_value_index (Drobisch on the
# all-parts unit value) with the basket-weighted bilateral form.

_BASKET_K = 100

_FISHER_ORACLE = f"""
WITH cells AS (
  SELECT l_partkey AS pk,
         (CAST(year(l_shipdate) AS BIGINT) * 12 + CAST(month(l_shipdate) AS BIGINT) - 1) AS ym0,
         CAST(SUM(CAST(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,3)) * 1000 AS BIGINT)) AS BIGINT) AS qmil
  FROM lineitem GROUP BY 1, 2
), basket AS (
  SELECT pk FROM (
    SELECT pk, SUM(cents) AS tot FROM cells GROUP BY pk
    ORDER BY tot DESC, pk ASC LIMIT {_BASKET_K}
  )
), pairs AS (
  SELECT c.ym0 AS ym0, c.pk AS pk,
         CAST(c.cents AS DOUBLE) / CAST(c.qmil AS DOUBLE) AS u_cur,
         CAST(p.cents AS DOUBLE) / CAST(p.qmil AS DOUBLE) AS u_prev,
         CAST(c.qmil AS DOUBLE) AS q_cur,
         CAST(p.qmil AS DOUBLE) AS q_prev
  FROM cells c
  JOIN cells p ON c.pk = p.pk AND c.ym0 = p.ym0 + 1
  JOIN basket b ON c.pk = b.pk
), month_terms AS (
  SELECT ym0,
         list(struct_pack(ln := u_cur * q_prev, ld := u_prev * q_prev,
                          pn := u_cur * q_cur,  pd := u_prev * q_cur) ORDER BY pk) AS tm,
         COUNT(*) AS n_parts
  FROM pairs GROUP BY ym0
), links AS (
  SELECT ym0, n_parts,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(tm, s -> s.ln)), (a, b) -> a + b)
           / list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(tm, s -> s.ld)), (a, b) -> a + b) AS laspeyres,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(tm, s -> s.pn)), (a, b) -> a + b)
           / list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(tm, s -> s.pd)), (a, b) -> a + b) AS paasche
  FROM month_terms
), packed AS (
  SELECT list(struct_pack(ym0 := ym0, n_parts := n_parts, l := laspeyres,
                          p := paasche, f := sqrt(laspeyres * paasche)) ORDER BY ym0) AS arr
  FROM links
)
SELECT printf('%04d-%02d', arr[i].ym0 // 12, arr[i].ym0 % 12 + 1) AS month_str,
       CAST(arr[i].n_parts AS BIGINT) AS n_basket_parts,
       arr[i].l AS laspeyres_link,
       arr[i].p AS paasche_link,
       arr[i].f AS fisher_link,
       100.0 * list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
                 list_transform(list_slice(arr, 1, i), s -> s.f)), (a, b) -> a * b) AS fisher_chained
FROM (SELECT unnest(range(1, len(arr) + 1)) AS i, arr FROM packed)
"""


@register(
    "lineitem_fisher_price_index",
    oracle=_FISHER_ORACLE,
    doc=f"chained Fisher price index (geometric mean of Laspeyres and "
    f"Paasche links) between consecutive ship months over the fixed "
    f"top-{_BASKET_K} revenue basket — relational month-pair join on the "
    "part×month cell table, per-month sums as partkey-ordered folds, "
    "sqrt IEEE-exact; bit-identical cross-engine.",
    tags=("stats", "index", "economics", "extension"),
)
def lineitem_fisher_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral index links L_t, P_t, F_t=sqrt(L_t·P_t) and the chained
    Fisher index. 100 TB: the only row-scale work is the part×month
    aggregate; the basket join broadcasts {_BASKET_K} keys; everything
    after is over <=basket×months rows."""
    cells, out = _fisher_lazy(spark, sf_dir)
    out = pin_small_result(out, 4096)
    cells.unpersist()
    return out


def _fisher_lazy(spark: SparkSession, sf_dir: str):
    """(persisted cell frame, lazy index frame) — split so tests can
    assert the basket-broadcast plan behind the collect barrier."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"
    )
    cents = (F.round(F.col("l_extendedprice"), 2).cast("decimal(18,2)") * 100).cast(
        "long"
    )
    qmil = (F.col("l_quantity").cast("decimal(18,3)") * 1000).cast("long")
    cells = (
        li.select(
            F.col("l_partkey").alias("pk"),
            (
                F.year("l_shipdate").cast("long") * 12
                + F.month("l_shipdate").cast("long")
                - 1
            ).alias("ym0"),
            cents.alias("c"),
            qmil.alias("q"),
        )
        .groupBy("pk", "ym0")
        .agg(F.sum("c").alias("cents"), F.sum("q").alias("qmil"))
    )
    cells = cells.persist()
    cells.count()  # self-join on a derived frame: materialize the barrier
    basket = (
        cells.groupBy("pk")
        .agg(F.sum("cents").alias("tot"))
        .orderBy(F.col("tot").desc(), F.col("pk").asc())
        .limit(_BASKET_K)
        .select(F.col("pk").alias("bpk"))
    )
    # pre-filter BOTH self-join sides by the broadcast basket (guide §3.2):
    # joining first and filtering after would self-join the full SF-scaling
    # cell frame (~all parts x months) only to keep the basket's ~100 parts;
    # p.pk == c.pk ∈ basket, so filtering prev too is result-identical.
    # cb re-evaluates per side, but its lineage below the join is the
    # PERSISTED cells frame + a 100-key broadcast probe (the barrier the
    # derived-self-join rule protects is already materialized).
    cb = cells.join(F.broadcast(basket), F.col("pk") == F.col("bpk")).drop("bpk")
    cur, prev = cb.alias("c"), cb.alias("p")
    pairs = (
        cur.join(
            prev,
            (F.col("c.pk") == F.col("p.pk"))
            & (F.col("c.ym0") == F.col("p.ym0") + 1),
        )
        .select(
            F.col("c.ym0").alias("ym0"),
            F.col("c.pk").alias("part_key"),
            (F.col("c.cents").cast("double") / F.col("c.qmil").cast("double")).alias(
                "u_cur"
            ),
            (F.col("p.cents").cast("double") / F.col("p.qmil").cast("double")).alias(
                "u_prev"
            ),
            F.col("c.qmil").cast("double").alias("q_cur"),
            F.col("p.qmil").cast("double").alias("q_prev"),
        )
    )
    month_terms = pairs.groupBy("ym0").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("part_key").alias("pk"),
                    (F.col("u_cur") * F.col("q_prev")).alias("ln"),
                    (F.col("u_prev") * F.col("q_prev")).alias("ld"),
                    (F.col("u_cur") * F.col("q_cur")).alias("pn"),
                    (F.col("u_prev") * F.col("q_cur")).alias("pd"),
                )
            )
        ).alias("tm"),
        F.count("*").alias("n_parts"),
    )
    dzero = F.lit(0.0)

    def fsum(field):
        return F.aggregate(
            F.transform("tm", lambda s: s[field]), dzero, lambda a, b: a + b
        )

    links = month_terms.select(
        "ym0",
        "n_parts",
        (fsum("ln") / fsum("ld")).alias("laspeyres"),
        (fsum("pn") / fsum("pd")).alias("paasche"),
    )
    packed = links.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "ym0",
                    "n_parts",
                    F.col("laspeyres").alias("l"),
                    F.col("paasche").alias("p"),
                    F.sqrt(F.col("laspeyres") * F.col("paasche")).alias("f"),
                )
            )
        ).alias("arr")
    )
    rows = packed.select(
        F.explode(F.sequence(F.lit(1), F.size("arr"))).alias("i"), "arr"
    )
    el = F.element_at("arr", F.col("i"))
    out = rows.select(
        F.format_string(
            "%04d-%02d", (el["ym0"] / 12).cast("long"), el["ym0"] % 12 + 1
        ).alias("month_str"),
        el["n_parts"].cast("long").alias("n_basket_parts"),
        el["l"].alias("laspeyres_link"),
        el["p"].alias("paasche_link"),
        el["f"].alias("fisher_link"),
        (
            F.lit(100.0)
            * F.aggregate(
                F.transform(
                    F.slice("arr", F.lit(1), F.col("i")), lambda s: s["f"]
                ),
                F.lit(1.0),
                lambda a, b: a * b,
            )
        ).alias("fisher_chained"),
    )
    return cells, out


# --- Nelson-Aalen cumulative hazard ---------------------------------------------------
# The estimator companion to orders_kaplan_meier_fulfillment (same
# (d, c)-per-week cell table, extensions.py:2506): cumulative hazard
# H(t) = sum_{j<=t} d_j/n_j with variance sum d_j/n_j^2 — additive where
# KM is multiplicative, hence the natural base for hazard-ratio readouts.
# Exact: integer risk sets, IEEE-only division/addition folds in index
# order.

_NA_ORACLE = """
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
            i -> CAST(arr[i].d AS DOUBLE) / CAST(total - pfx[i] AS DOUBLE)) AS hz,
         list_transform(range(1, len(arr) + 1),
            i -> CAST(arr[i].d AS DOUBLE) / (CAST(total - pfx[i] AS DOUBLE) * CAST(total - pfx[i] AS DOUBLE))) AS hv
  FROM step2
)
SELECT arr[i].t AS t_weeks,
       CAST(total - pfx[i] AS BIGINT) AS n_at_risk,
       arr[i].d AS d_events,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_slice(hz, 1, i)), (a, b) -> a + b) AS cum_hazard,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_slice(hv, 1, i)), (a, b) -> a + b) AS cum_hazard_var
FROM (SELECT unnest(range(1, len(arr) + 1)) AS i, arr, total, pfx, hz, hv FROM step3)
"""


@register(
    "orders_nelson_aalen_hazard",
    oracle=_NA_ORACLE,
    doc="Nelson-Aalen cumulative hazard of order fulfillment latency "
    "(additive companion to the Kaplan-Meier curve over the same "
    "date-span-bounded (d, c) week cells): H(t) = sum d_j/n_j with "
    "variance sum d_j/n_j^2 — exact integer risk sets, IEEE index-order "
    "folds.",
    tags=("stats", "survival", "extension"),
)
def orders_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same two partial-aggregated shuffles as orders_kaplan_meier_
    fulfillment (extensions.py:2555); the estimator swap is fold-level."""
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
        F.when(F.col("o_orderstatus") == "F", F.lit(1)).otherwise(F.lit(0)).alias(
            "is_event"
        ),
    )
    counts = base.groupBy("t_weeks").agg(
        F.sum("is_event").cast("long").alias("d_events"),
        F.sum(F.lit(1) - F.col("is_event")).cast("long").alias("c_censored"),
    )
    zero, dzero = F.lit(0).cast("long"), F.lit(0.0)
    packed = counts.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("t_weeks").alias("t"),
                    F.col("d_events").alias("d"),
                    F.col("c_censored").alias("c"),
                )
            )
        ).alias("arr")
    )
    step1 = packed.select("arr", F.transform("arr", lambda s: s["d"] + s["c"]).alias("td"))
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
    nrisk = lambda i: (F.col("total") - F.element_at("pfx", i)).cast("double")  # noqa: E731
    step3 = step2.select(
        "arr",
        "total",
        "pfx",
        F.transform(
            F.sequence(F.lit(1), F.size("arr")),
            lambda i: F.element_at("arr", i)["d"].cast("double") / nrisk(i),
        ).alias("hz"),
        F.transform(
            F.sequence(F.lit(1), F.size("arr")),
            lambda i: F.element_at("arr", i)["d"].cast("double")
            / (nrisk(i) * nrisk(i)),
        ).alias("hv"),
    )
    rows = step3.select(
        F.explode(F.sequence(F.lit(1), F.size("arr"))).alias("i"),
        "arr",
        "total",
        "pfx",
        "hz",
        "hv",
    )
    fold = lambda col: F.aggregate(  # noqa: E731
        F.slice(col, F.lit(1), F.col("i")), dzero, lambda a, b: a + b
    )
    return rows.select(
        F.element_at("arr", F.col("i"))["t"].alias("t_weeks"),
        (F.col("total") - F.element_at("pfx", F.col("i"))).cast("long").alias(
            "n_at_risk"
        ),
        F.element_at("arr", F.col("i"))["d"].alias("d_events"),
        fold("hz").alias("cum_hazard"),
        fold("hv").alias("cum_hazard_var"),
    )


# --- Lorenz curve deciles over supplier revenue ---------------------------------------
# The tabular readout behind supplier_revenue_gini (extensions.py:3785):
# exact revenue deciles via the distributed prefix-sum rank (never a
# single-partition window), per-decile decimal revenue rounded to scale 0
# BEFORE the only double casts (exact integers < 2^53), cumulative shares
# folded over the 10-row packed array in decile order.

_LORENZ_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS r
  FROM lineitem GROUP BY l_suppkey
), ranked AS (
  SELECT l_suppkey, r,
         CAST(ROW_NUMBER() OVER (ORDER BY r, l_suppkey) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM rev
), per AS (
  SELECT CAST((rk - 1) * 10 // n + 1 AS BIGINT) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(round(SUM(r), 0) AS DOUBLE) AS revenue
  FROM ranked GROUP BY 1
), packed AS (
  SELECT list(struct_pack(d := decile, ns := n_suppliers, rv := revenue) ORDER BY decile) AS arr,
         CAST(SUM(n_suppliers) AS BIGINT) AS n_tot,
         SUM(revenue) AS r_tot
  FROM per
)
SELECT arr[i].d AS decile,
       arr[i].ns AS n_suppliers,
       arr[i].rv AS revenue,
       list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(arr, 1, i), s -> s.ns)), (a, b) -> a + b)
         / CAST(n_tot AS DOUBLE) AS cum_supplier_share,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_slice(arr, 1, i), s -> s.rv)), (a, b) -> a + b)
         / r_tot AS cum_revenue_share
FROM (SELECT unnest(range(1, len(arr) + 1)) AS i, arr, n_tot, r_tot FROM packed)
"""


@register(
    "supplier_lorenz_curve",
    oracle=_LORENZ_ORACLE,
    doc="Lorenz-curve decile table for supplier revenue (the tabular "
    "companion to supplier_revenue_gini): exact deciles via the "
    "distributed prefix-sum rank, scale-0-rounded decimal revenue, "
    "cumulative shares folded over the 10-row packed array.",
    tags=("stats", "inequality", "prefix-sum", "extension"),
)
def supplier_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one supplier aggregate shuffle + the range-repartitioned
    prefix rank; the Lorenz table itself is 10 rows."""
    from f1_lakehouse_spark.operators.extensions import global_prefix_sum

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
    n_tot = int(total_n)
    per = (
        cum.select(
            (((F.col("cum").cast("long") - 1) * 10 / F.lit(n_tot)).cast("long") + 1).alias(
                "decile"
            ),
            "r",
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.round(F.sum("r"), 0).cast("double").alias("revenue"),
        )
    )
    packed = per.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("decile").alias("d"),
                    F.col("n_suppliers").alias("ns"),
                    F.col("revenue").alias("rv"),
                )
            )
        ).alias("arr"),
        F.sum("n_suppliers").cast("long").alias("n_tot2"),
        F.sum("revenue").alias("r_tot"),
    )
    rows = packed.select(
        F.explode(F.sequence(F.lit(1), F.size("arr"))).alias("i"),
        "arr",
        "n_tot2",
        "r_tot",
    )
    el = F.element_at("arr", F.col("i"))
    zero_l, zero_d = F.lit(0).cast("long"), F.lit(0.0)
    cum_ns = F.aggregate(
        F.transform(F.slice("arr", F.lit(1), F.col("i")), lambda s: s["ns"]),
        zero_l,
        lambda a, b: a + b,
    )
    cum_rv = F.aggregate(
        F.transform(F.slice("arr", F.lit(1), F.col("i")), lambda s: s["rv"]),
        zero_d,
        lambda a, b: a + b,
    )
    out = rows.select(
        el["d"].alias("decile"),
        el["ns"].alias("n_suppliers"),
        el["rv"].alias("revenue"),
        (cum_ns / F.col("n_tot2").cast("double")).alias("cum_supplier_share"),
        (cum_rv / F.col("r_tot")).alias("cum_revenue_share"),
    )
    out = pin_small_result(out, 64)
    release()
    return out


# --- winsorized robust A/B lift -------------------------------------------------------
# Heavy-tailed revenue metrics make the plain difference-in-means lift
# (events_ab_test_lift) whale-sensitive; the standard fix is winsorizing
# each arm at its own [p05, p95] before comparing means. Clip bounds are
# exact DISTRIBUTED order statistics: one global prefix-sum rank over
# (variant, revenue, user) — within-variant rank = global rank minus the
# variant offset (a 2-row collect) — then a 4-row collect of the bound
# values. Per-user revenue stays DECIMAL end-to-end; the winsorized sums
# round to scale 3 before their only double cast (CLAUDE.md decimal->
# double discipline).

_WINSOR_LO_NUM, _WINSOR_HI_NUM = 1, 19  # p05 / p95 in twentieths


def _winsor_ks(n: int) -> tuple[int, int]:
    return (_WINSOR_LO_NUM * n + 19) // 20, (_WINSOR_HI_NUM * n + 19) // 20


_WINSOR_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         {{vh}} % 2 AS variant,
         COALESCE(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(28,9)) END),
                  CAST(0 AS DECIMAL(28,9))) AS urev
  FROM events GROUP BY user_id
), ranked AS (
  SELECT variant, urev,
         CAST(ROW_NUMBER() OVER (PARTITION BY variant ORDER BY urev, user_id) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY variant) AS BIGINT) AS nv
  FROM users
), bounds AS (
  SELECT variant,
         MIN(CASE WHEN rk = ({_WINSOR_LO_NUM} * nv + 19) // 20 THEN urev END) AS lo,
         MIN(CASE WHEN rk = ({_WINSOR_HI_NUM} * nv + 19) // 20 THEN urev END) AS hi,
         CAST(MAX(nv) AS BIGINT) AS nv
  FROM ranked GROUP BY variant
), clipped AS (
  SELECT r.variant, b.nv, b.lo, b.hi,
         CASE WHEN r.urev < b.lo THEN b.lo
              WHEN r.urev > b.hi THEN b.hi
              ELSE r.urev END AS w
  FROM ranked r JOIN bounds b ON r.variant = b.variant
), arms AS (
  SELECT variant, CAST(MAX(nv) AS BIGINT) AS nv,
         CAST(round(MAX(lo), 3) AS DOUBLE) AS lo,
         CAST(round(MAX(hi), 3) AS DOUBLE) AS hi,
         CAST(round(SUM(w), 3) AS DOUBLE) AS ws
  FROM clipped GROUP BY variant
)
SELECT a.nv AS n_a, b.nv AS n_b,
       a.lo AS lo_a, a.hi AS hi_a, b.lo AS lo_b, b.hi AS hi_b,
       a.ws / CAST(a.nv AS DOUBLE) AS win_mean_a,
       b.ws / CAST(b.nv AS DOUBLE) AS win_mean_b,
       b.ws / CAST(b.nv AS DOUBLE) - a.ws / CAST(a.nv AS DOUBLE) AS win_lift
FROM (SELECT * FROM arms WHERE variant = 0) a,
     (SELECT * FROM arms WHERE variant = 1) b
"""


@register(
    "events_winsorized_lift",
    oracle=None,  # composed at module end (needs the salted-hash SQL twin)
    doc="winsorized A/B lift of per-user purchase revenue: each arm "
    "clipped at its own exact distributed [p05, p95] order statistics "
    "(one global prefix-sum rank + 2-row/4-row collects), per-user "
    "revenue DECIMAL end-to-end, scale-3 rounding before the only "
    "double casts — the whale-robust experiment readout.",
    tags=("events", "experiment", "robust", "prefix-sum", "extension"),
)
def events_winsorized_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one user aggregate + the range-repartitioned prefix rank;
    every collect is O(1) rows (variant counts, clip bounds)."""
    from f1_lakehouse_spark.operators.extensions import global_prefix_sum
    from f1_lakehouse_spark.pipeline.hashing import spark_salted_hash

    e = load_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(28,9)"),
                )
            ),
            F.lit(0).cast("decimal(28,9)"),
        ).alias("urev")
    ).select(
        "user_id",
        (spark_salted_hash("user_id", ":ab") % 2).alias("variant"),
        "urev",
        F.lit(1).cast("long").alias("one"),
    )
    cum, release, _total = global_prefix_sum(
        spark,
        users,
        "one",
        [F.col("variant").asc(), F.col("urev").asc(), F.col("user_id").asc()],
    )
    cum = cum.withColumn("grk", F.col("cum").cast("long"))
    counts = {
        r["variant"]: r["n"]
        for r in cum.groupBy("variant").agg(F.count("*").alias("n")).collect()
    }
    n_a, n_b = int(counts.get(0, 0)), int(counts.get(1, 0))
    ka_lo, ka_hi = _winsor_ks(n_a)
    kb_lo, kb_hi = _winsor_ks(n_b)
    rk = F.when(F.col("variant") == 0, F.col("grk")).otherwise(
        F.col("grk") - F.lit(n_a)
    )
    ranked = cum.withColumn("rk", rk)
    brows = ranked.where(
        ((F.col("variant") == 0) & F.col("rk").isin(ka_lo, ka_hi))
        | ((F.col("variant") == 1) & F.col("rk").isin(kb_lo, kb_hi))
    ).select("variant", "rk", "urev").collect()
    bv = {(r["variant"], r["rk"]): r["urev"] for r in brows}
    lo_a, hi_a = bv[(0, ka_lo)], bv[(0, ka_hi)]
    lo_b, hi_b = bv[(1, kb_lo)], bv[(1, kb_hi)]
    lo = F.when(F.col("variant") == 0, F.lit(lo_a)).otherwise(F.lit(lo_b)).cast(
        "decimal(28,9)"
    )
    hi = F.when(F.col("variant") == 0, F.lit(hi_a)).otherwise(F.lit(hi_b)).cast(
        "decimal(28,9)"
    )
    w = F.when(F.col("urev") < lo, lo).when(F.col("urev") > hi, hi).otherwise(
        F.col("urev")
    )
    arms = {
        r["variant"]: r["ws"]
        for r in ranked.groupBy("variant")
        .agg(F.round(F.sum(w), 3).cast("double").alias("ws"))
        .collect()
    }
    release()
    d = lambda x: F.lit(float(x))  # noqa: E731
    wm_a = float(arms[0]) / n_a
    wm_b = float(arms[1]) / n_b
    out = spark.createDataFrame(
        [
            (
                n_a,
                n_b,
                float(round(lo_a, 3)),
                float(round(hi_a, 3)),
                float(round(lo_b, 3)),
                float(round(hi_b, 3)),
                wm_a,
                wm_b,
                wm_b - wm_a,
            )
        ],
        "n_a long, n_b long, lo_a double, hi_a double, lo_b double, hi_b double, "
        "win_mean_a double, win_mean_b double, win_lift double",
    )
    return out


_WINSOR_FINAL_ORACLE = None  # composed below once hashing is importable


def _compose_winsor_oracle() -> str:
    from f1_lakehouse_spark.pipeline.hashing import sql_salted_hash

    return _WINSOR_ORACLE.format(vh=sql_salted_hash("user_id", ":ab"))


from f1_lakehouse_spark.registry import REGISTRY as _REG  # noqa: E402

_REG["events_winsorized_lift"].oracle = _compose_winsor_oracle()


# --- Benjamini-Hochberg FDR over segment experiments ----------------------------------
# The multiple-testing layer over the A/B machinery: one experiment read
# out across (event_type x user-hash-bucket) segments needs a false-
# discovery-rate guard before anyone ships a "segment X reacted!" claim.
# P-values that are exact cross-engine: the Chebyshev bound
# p = min(1, 1/z^2) (documented conservative — no normal CDF, hence no
# transcendentals), from decimal-exact moments. The BH step-up runs as a
# left fold over the m-segment packed array (m is analyst-bounded, never
# row-scale): k* = max{k : p_(k) <= k*alpha/m}, reject p <= p_(k*).

_BH_ALPHA = 0.25  # dyadic: k*alpha/m stays an exact IEEE product/quotient
_BH_BUCKETS = 4


def _bh_oracle() -> str:
    from f1_lakehouse_spark.pipeline.hashing import sql_salted_hash

    vh = sql_salted_hash("user_id", ":ab")
    bh = sql_salted_hash("user_id", ":seg")
    return f"""
WITH base AS (
  SELECT event_type,
         {bh} % {_BH_BUCKETS} AS bucket,
         {vh} % 2 AS variant,
         CAST(value AS DECIMAL(28,9)) AS v
  FROM events WHERE value IS NOT NULL
), m AS (
  SELECT event_type, bucket, variant,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(round(SUM(v), 3) AS DOUBLE) AS s1,
         CAST(round(SUM(v * v), 3) AS DOUBLE) AS s2
  FROM base GROUP BY 1, 2, 3
), arms AS (
  SELECT event_type, bucket,
         MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
         MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
         MAX(CASE WHEN variant = 0 THEN s1 END) AS s1_a,
         MAX(CASE WHEN variant = 1 THEN s1 END) AS s1_b,
         MAX(CASE WHEN variant = 0 THEN s2 END) AS s2_a,
         MAX(CASE WHEN variant = 1 THEN s2 END) AS s2_b
  FROM m GROUP BY 1, 2
), stats AS (
  SELECT event_type, bucket, n_a, n_b,
         s1_b / CAST(n_b AS DOUBLE) - s1_a / CAST(n_a AS DOUBLE) AS diff,
         ((s2_a - s1_a * s1_a / CAST(n_a AS DOUBLE)) / CAST(n_a - 1 AS DOUBLE)) / CAST(n_a AS DOUBLE)
         + ((s2_b - s1_b * s1_b / CAST(n_b AS DOUBLE)) / CAST(n_b - 1 AS DOUBLE)) / CAST(n_b AS DOUBLE) AS var_diff
  FROM arms
), pvals AS (
  SELECT event_type, bucket, n_a, n_b, diff,
         diff * diff / var_diff AS z2,
         CASE WHEN diff * diff / var_diff <= 1.0 THEN CAST(1.0 AS DOUBLE)
              ELSE var_diff / (diff * diff) END AS p_cheb
  FROM stats
), packed AS (
  SELECT list(struct_pack(et := event_type, b := bucket, na := n_a, nb := n_b,
                          diff := diff, z2 := z2, p := p_cheb)
              ORDER BY p_cheb, event_type, bucket) AS arr
  FROM pvals
), cut AS (
  SELECT arr, len(arr) AS mm,
         list_reduce(list_prepend(CAST(0 AS BIGINT), range(1, len(arr) + 1)),
           (acc, k) -> CASE WHEN arr[k].p <= CAST(k AS DOUBLE) * {_BH_ALPHA} / CAST(len(arr) AS DOUBLE)
                            THEN k ELSE acc END) AS k_max
  FROM packed
)
SELECT arr[i].et AS event_type,
       arr[i].b AS bucket,
       arr[i].na AS n_a, arr[i].nb AS n_b,
       arr[i].diff AS mean_diff,
       arr[i].z2 AS z2,
       arr[i].p AS p_chebyshev,
       CAST(i AS BIGINT) AS bh_rank,
       CAST(k_max AS BIGINT) AS bh_k_max,
       i <= k_max AS rejected
FROM (SELECT unnest(range(1, len(arr) + 1)) AS i, arr, k_max FROM cut)
"""


@register(
    "events_bh_fdr_segments",
    oracle=None,  # composed below (salted-hash SQL twin)
    doc=f"Benjamini-Hochberg FDR over {_BH_BUCKETS * 5}-ish segment A/B "
    "readouts (event_type x user-hash bucket): Chebyshev-bound p-values "
    "(1/z^2 — conservative, transcendental-free, exact) from "
    "decimal-exact moments, BH step-up as a left fold over the packed "
    "segment array, rejected flags as data.",
    tags=("events", "experiment", "fdr", "extension"),
)
def events_bh_fdr_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one (segment, variant) aggregate with map-side combine;
    the BH fold runs over the analyst-bounded segment array."""
    from f1_lakehouse_spark.pipeline.hashing import spark_salted_hash

    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    base = e.select(
        "event_type",
        (spark_salted_hash("user_id", ":seg") % _BH_BUCKETS).alias("bucket"),
        (spark_salted_hash("user_id", ":ab") % 2).alias("variant"),
        F.col("value").cast("decimal(28,9)").alias("v"),
    )
    m = base.groupBy("event_type", "bucket", "variant").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("v"), 3).cast("double").alias("s1"),
        F.round(F.sum(F.col("v") * F.col("v")), 3).cast("double").alias("s2"),
    )
    pick = lambda var, col: F.max(F.when(F.col("variant") == var, F.col(col)))  # noqa: E731
    arms = m.groupBy("event_type", "bucket").agg(
        pick(0, "n").alias("n_a"),
        pick(1, "n").alias("n_b"),
        pick(0, "s1").alias("s1_a"),
        pick(1, "s1").alias("s1_b"),
        pick(0, "s2").alias("s2_a"),
        pick(1, "s2").alias("s2_b"),
    )
    nd = lambda c: F.col(c).cast("double")  # noqa: E731
    diff = F.col("s1_b") / nd("n_b") - F.col("s1_a") / nd("n_a")
    var_diff = (
        (F.col("s2_a") - F.col("s1_a") * F.col("s1_a") / nd("n_a"))
        / (F.col("n_a") - 1).cast("double")
        / nd("n_a")
    ) + (
        (F.col("s2_b") - F.col("s1_b") * F.col("s1_b") / nd("n_b"))
        / (F.col("n_b") - 1).cast("double")
        / nd("n_b")
    )
    stats = arms.select(
        "event_type", "bucket", "n_a", "n_b", diff.alias("diff"),
        var_diff.alias("var_diff"),
    )
    z2 = F.col("diff") * F.col("diff") / F.col("var_diff")
    pvals = stats.select(
        "event_type",
        "bucket",
        "n_a",
        "n_b",
        "diff",
        z2.alias("z2"),
        F.when(z2 <= 1.0, F.lit(1.0))
        .otherwise(F.col("var_diff") / (F.col("diff") * F.col("diff")))
        .alias("p_cheb"),
    )
    packed = pvals.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("p_cheb").alias("p"),
                    F.col("event_type").alias("et"),
                    F.col("bucket").alias("b"),
                    F.col("n_a").alias("na"),
                    F.col("n_b").alias("nb"),
                    F.col("diff").alias("diff"),
                    F.col("z2").alias("z2"),
                )
            )
        ).alias("arr")
    )
    cut = packed.select(
        "arr",
        F.aggregate(
            F.sequence(F.lit(1), F.size("arr")),
            F.lit(0).cast("long"),
            lambda acc, k: F.when(
                F.element_at("arr", k.cast("int"))["p"]
                <= k.cast("double") * F.lit(_BH_ALPHA) / F.size("arr").cast("double"),
                k.cast("long"),
            ).otherwise(acc),
        ).alias("k_max"),
    )
    rows = cut.select(
        F.explode(F.sequence(F.lit(1), F.size("arr"))).alias("i"), "arr", "k_max"
    )
    el = F.element_at("arr", F.col("i"))
    return rows.select(
        el["et"].alias("event_type"),
        el["b"].alias("bucket"),
        el["na"].alias("n_a"),
        el["nb"].alias("n_b"),
        el["diff"].alias("mean_diff"),
        el["z2"].alias("z2"),
        el["p"].alias("p_chebyshev"),
        F.col("i").cast("long").alias("bh_rank"),
        F.col("k_max").cast("long").alias("bh_k_max"),
        (F.col("i") <= F.col("k_max")).alias("rejected"),
    )


_REG["events_bh_fdr_segments"].oracle = _bh_oracle()


# --- Croston intermittent-demand forecast ---------------------------------------------
# Sparse SKUs (most months have zero demand) break plain exponential
# smoothing; Croston's method smooths demand SIZE and inter-demand
# INTERVAL separately and forecasts their ratio, with the Syntetos-Boylan
# (1 - alpha/2) bias correction. Cohort: the 8 parts with the smallest
# md5 hash (deterministic at any SF — a fixed-size analyst sample, like
# the Fisher basket). Per part the fold runs over its DEMAND months only
# (gaps carry the interval), state is a homogeneous DOUBLE list [z, p]
# (the orders_holt_forecast list-accumulator discipline); alpha dyadic.

_CROSTON_ALPHA = "0.25"
_CROSTON_PARTS = 8

_CROSTON_STEP = (
    "(acc, x) -> ["
    f"CASE WHEN x[2] > CAST(0.0 AS DOUBLE) THEN CAST({_CROSTON_ALPHA} AS DOUBLE) * x[2]"
    f" + (CAST(1.0 AS DOUBLE) - CAST({_CROSTON_ALPHA} AS DOUBLE)) * acc[1] ELSE acc[1] END, "
    f"CASE WHEN x[2] > CAST(0.0 AS DOUBLE) THEN CAST({_CROSTON_ALPHA} AS DOUBLE) * x[1]"
    f" + (CAST(1.0 AS DOUBLE) - CAST({_CROSTON_ALPHA} AS DOUBLE)) * acc[2] ELSE acc[2] END"
    "]"
)


def _croston_oracle() -> str:
    from f1_lakehouse_spark.pipeline.hashing import sql_md5_hash48

    return f"""
WITH cells AS (
  SELECT l_partkey AS pk,
         (CAST(year(l_shipdate) AS BIGINT) * 12 + CAST(month(l_shipdate) AS BIGINT) - 1) AS ym0,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,3)) * 1000 AS BIGINT)) AS BIGINT) AS qmil
  FROM lineitem GROUP BY 1, 2
), cohort AS (
  SELECT pk FROM (
    SELECT DISTINCT pk, {sql_md5_hash48("CAST(pk AS VARCHAR)")} AS h FROM cells
  ) ORDER BY h, pk LIMIT {_CROSTON_PARTS}
), series AS (
  SELECT c.pk, list(struct_pack(ym := c.ym0, q := c.qmil) ORDER BY c.ym0) AS arr
  FROM cells c JOIN cohort t ON c.pk = t.pk
  GROUP BY c.pk
), obs AS (
  SELECT pk, arr, len(arr) AS nd,
         list_transform(range(2, len(arr) + 1),
            i -> [CAST(arr[i].ym - arr[i - 1].ym AS DOUBLE),
                  CAST(arr[i].q AS DOUBLE) / 1000.0]) AS steps
  FROM series WHERE len(arr) >= 2
), folded AS (
  SELECT pk, nd, arr,
         list_reduce(
           list_prepend([CAST(arr[1].q AS DOUBLE) / 1000.0,
                         CAST(arr[2].ym - arr[1].ym AS DOUBLE)], steps),
           {_CROSTON_STEP}) AS st
  FROM obs
)
SELECT pk AS part_key,
       CAST(nd AS BIGINT) AS n_demand_months,
       CAST(arr[nd].ym - arr[1].ym + 1 AS BIGINT) AS span_months,
       st[1] AS z_size,
       st[2] AS p_interval,
       st[1] / st[2] AS croston_rate,
       (CAST(1.0 AS DOUBLE) - CAST({_CROSTON_ALPHA} AS DOUBLE) / CAST(2.0 AS DOUBLE))
         * (st[1] / st[2]) AS sbc_rate
FROM folded
"""


@register(
    "orders_croston_intermittent",
    oracle=None,  # composed below (md5-hash SQL twin)
    doc=f"Croston intermittent-demand forecast (alpha={_CROSTON_ALPHA}, "
    "Syntetos-Boylan corrected) for a deterministic md5-sampled "
    f"{_CROSTON_PARTS}-part cohort: demand size and inter-demand interval "
    "smoothed separately by one [z, p] DOUBLE-list fold per part over its "
    "demand months only — bit-exact cross-engine.",
    tags=("stats", "timeseries", "forecast", "extension"),
)
def orders_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one (part, month) partial-aggregated shuffle; the cohort
    pick is a TakeOrdered over distinct parts; folds are per-part arrays
    bounded by the calendar."""
    from f1_lakehouse_spark.pipeline.hashing import spark_md5_hash48

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    )
    cells = (
        li.select(
            F.col("l_partkey").alias("pk"),
            (
                F.year("l_shipdate").cast("long") * 12
                + F.month("l_shipdate").cast("long")
                - 1
            ).alias("ym0"),
            (F.col("l_quantity").cast("decimal(18,3)") * 1000).cast("long").alias("q"),
        )
        .groupBy("pk", "ym0")
        .agg(F.sum("q").alias("qmil"))
    )
    cells = cells.persist()
    cells.count()  # two consumers (cohort pick + series build)
    cohort = (
        cells.select("pk")
        .distinct()
        .select("pk", spark_md5_hash48(F.col("pk").cast("string")).alias("h"))
        .orderBy("h", "pk")
        .limit(_CROSTON_PARTS)
        .select(F.col("pk").alias("cpk"))
    )
    series = (
        cells.join(F.broadcast(cohort), F.col("pk") == F.col("cpk"))
        .groupBy("pk")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("ym0").alias("ym"), F.col("qmil").alias("q")))
            ).alias("arr")
        )
    )
    obs = series.where(F.size("arr") >= 2).select(
        "pk",
        "arr",
        F.size("arr").alias("nd"),
        F.transform(
            F.sequence(F.lit(2), F.size("arr")),
            lambda i: F.array(
                (
                    F.element_at("arr", i)["ym"]
                    - F.element_at("arr", i - F.lit(1))["ym"]
                ).cast("double"),
                F.element_at("arr", i)["q"].cast("double") / F.lit(1000.0),
            ),
        ).alias("steps"),
    )
    alpha = F.lit(0.25)

    def croston_step(acc, x):
        nz = F.element_at(x, 2) > F.lit(0.0)
        z = F.when(
            nz,
            alpha * F.element_at(x, 2) + (F.lit(1.0) - alpha) * F.element_at(acc, 1),
        ).otherwise(F.element_at(acc, 1))
        p = F.when(
            nz,
            alpha * F.element_at(x, 1) + (F.lit(1.0) - alpha) * F.element_at(acc, 2),
        ).otherwise(F.element_at(acc, 2))
        return F.array(z, p)

    init = F.array(
        F.element_at("arr", 1)["q"].cast("double") / F.lit(1000.0),
        (F.element_at("arr", 2)["ym"] - F.element_at("arr", 1)["ym"]).cast("double"),
    )
    folded = obs.select(
        "pk",
        "nd",
        "arr",
        F.aggregate("steps", init, croston_step).alias("st"),
    )
    rate = F.element_at("st", 1) / F.element_at("st", 2)
    out = folded.select(
        F.col("pk").alias("part_key"),
        F.col("nd").cast("long").alias("n_demand_months"),
        (
            F.element_at("arr", F.col("nd").cast("int"))["ym"]
            - F.element_at("arr", 1)["ym"]
            + 1
        )
        .cast("long")
        .alias("span_months"),
        F.element_at("st", 1).alias("z_size"),
        F.element_at("st", 2).alias("p_interval"),
        rate.alias("croston_rate"),
        ((F.lit(1.0) - F.lit(0.25) / F.lit(2.0)) * rate).alias("sbc_rate"),
    )
    out = pin_small_result(out, 64)
    cells.unpersist()
    return out


_REG["orders_croston_intermittent"].oracle = _croston_oracle()


# --- extreme-value mean-excess + GPD moment fit ----------------------------------------
# Tail-risk diagnostics on line prices without transcendentals: exceedance
# thresholds are exact DISTRIBUTED order statistics (one global prefix-sum
# rank serves all four probe quantiles), the mean-excess curve e(u) =
# E[X-u | X>u] uses DECIMAL excess sums (l_extendedprice is exact
# DECIMAL(18,2)), and the generalized-Pareto shape/scale come from the
# method of moments — xi = (1 - m^2/s^2)/2, sigma = m*(1 + m^2/s^2)/2 —
# pure IEEE ratios of scale-3-rounded decimal moments.

_EVT_PROBES = ((9, 10), (19, 20), (39, 40), (99, 100))  # p90 p95 p975 p99


_EVT_ORACLE = """
WITH px AS (
  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS x,
         l_orderkey, l_linenumber
  FROM lineitem
), ranked AS (
  SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x, l_orderkey, l_linenumber) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM px
), thresholds AS (
  SELECT p_num, p_den,
         MIN(CASE WHEN rk = (p_num * n + p_den - 1) // p_den THEN x END) AS u
  FROM ranked
  CROSS JOIN (VALUES {probes}) pr(p_num, p_den)
  GROUP BY p_num, p_den
), stats AS (
  SELECT t.p_num, t.p_den, t.u,
         CAST(COUNT(*) AS BIGINT) AS n_exceed,
         CAST(round(SUM(r.x - t.u), 3) AS DOUBLE) AS s1,
         CAST(round(SUM(CAST((r.x - t.u) * (r.x - t.u) AS DECIMAL(38,4))), 0) AS DOUBLE) AS s2
  FROM ranked r JOIN thresholds t ON r.x > t.u
  GROUP BY 1, 2, 3
)
SELECT CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE) AS quantile,
       CAST(u AS DOUBLE) AS threshold,
       n_exceed,
       s1 / CAST(n_exceed AS DOUBLE) AS mean_excess,
       (CAST(1.0 AS DOUBLE) - (s1 / CAST(n_exceed AS DOUBLE)) * (s1 / CAST(n_exceed AS DOUBLE))
          / (s2 / CAST(n_exceed AS DOUBLE) - (s1 / CAST(n_exceed AS DOUBLE)) * (s1 / CAST(n_exceed AS DOUBLE))))
         / CAST(2.0 AS DOUBLE) AS gpd_xi_mom,
       ((s1 / CAST(n_exceed AS DOUBLE)) * (CAST(1.0 AS DOUBLE)
          + (s1 / CAST(n_exceed AS DOUBLE)) * (s1 / CAST(n_exceed AS DOUBLE))
          / (s2 / CAST(n_exceed AS DOUBLE) - (s1 / CAST(n_exceed AS DOUBLE)) * (s1 / CAST(n_exceed AS DOUBLE)))))
         / CAST(2.0 AS DOUBLE) AS gpd_sigma_mom
FROM stats
""".format(probes=", ".join(f"({a}, {b})" for a, b in _EVT_PROBES))


@register(
    "lineitem_mean_excess_evt",
    oracle=_EVT_ORACLE,
    doc="extreme-value tail diagnostics for line prices: exact distributed "
    "order-statistic thresholds at p90/p95/p97.5/p99 (one prefix-sum rank "
    "serves all four), DECIMAL-exact mean-excess curve, and "
    "transcendental-free GPD shape/scale by the method of moments.",
    tags=("stats", "evt", "prefix-sum", "extension"),
)
def lineitem_mean_excess_evt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one prefix-sum rank + a 4-row threshold broadcast into one
    exceedance aggregate with map-side combine."""
    from f1_lakehouse_spark.operators.extensions import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("decimal(18,2)").alias("x"),
        "l_orderkey",
        "l_linenumber",
        F.lit(1).cast("long").alias("one"),
    )
    cum, release, total = global_prefix_sum(
        spark,
        li,
        "one",
        [F.col("x").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
    )
    n = int(total)
    cum = cum.withColumn("rk", F.col("cum").cast("long"))
    ks = {(a, b): (a * n + b - 1) // b for a, b in _EVT_PROBES}
    th = {
        r["rk"]: r["x"]
        for r in cum.where(F.col("rk").isin(*ks.values())).select("rk", "x").collect()
    }
    release()
    probes = spark.createDataFrame(
        [(a, b, th[k]) for (a, b), k in ks.items()],
        "p_num long, p_den long, u decimal(18,2)",
    )
    base = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("decimal(18,2)").alias("x")
    )
    ex = (F.col("x") - F.col("u"))
    stats = (
        base.join(F.broadcast(probes), F.col("x") > F.col("u"))
        .groupBy("p_num", "p_den", "u")
        .agg(
            F.count("*").cast("long").alias("n_exceed"),
            F.round(F.sum(ex), 3).cast("double").alias("s1"),
            # scale-0 round: a scale-0 decimal→double is one int→double
            # conversion, exact at any magnitude (see supplier_revenue_anova)
            F.round(F.sum((ex * ex).cast("decimal(38,4)")), 0)
            .cast("double")
            .alias("s2"),
        )
    )
    m = F.col("s1") / F.col("n_exceed").cast("double")
    v = F.col("s2") / F.col("n_exceed").cast("double") - m * m
    return stats.select(
        (F.col("p_num").cast("double") / F.col("p_den").cast("double")).alias(
            "quantile"
        ),
        F.col("u").cast("double").alias("threshold"),
        "n_exceed",
        m.alias("mean_excess"),
        ((F.lit(1.0) - m * m / v) / F.lit(2.0)).alias("gpd_xi_mom"),
        ((m * (F.lit(1.0) + m * m / v)) / F.lit(2.0)).alias("gpd_sigma_mom"),
    )


# --- Spearman rank correlation (tie-average ranks) -------------------------------------
# Monotone association between monthly revenue and monthly order volume:
# tie-average ranks computed positionally inside the ~84-cell packed month
# array (rank(x) = #less + (#equal + 1)/2 — integer counts, one exact
# division), then the Pearson formula on rank doubles with month-ordered
# folds and one IEEE sqrt. Calendar-bounded like the Theil-Sen pair scan.

_SPEAR_RANK = (
    "list_transform({v}, x -> "
    "CAST(len(list_filter({v}, e -> e < x)) AS DOUBLE)"
    " + CAST(len(list_filter({v}, e -> e = x)) + 1 AS DOUBLE) / CAST(2.0 AS DOUBLE))"
)

_SPEARMAN_ORACLE = f"""
WITH monthly AS (
  SELECT (CAST(year(o_orderdate) AS BIGINT) * 12 + CAST(month(o_orderdate) AS BIGINT) - 1) AS ym0,
         CAST(SUM(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
), packed AS (
  SELECT list(cents ORDER BY ym0) AS xv, list(n_orders ORDER BY ym0) AS yv,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM monthly
), ranks AS (
  SELECT n, {_SPEAR_RANK.format(v="xv")} AS rx, {_SPEAR_RANK.format(v="yv")} AS ry
  FROM packed
), sums AS (
  SELECT n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), rx), (a, b) -> a + b) AS sx,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ry), (a, b) -> a + b) AS sy,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(rx, e -> e * e)), (a, b) -> a + b) AS sxx,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(ry, e -> e * e)), (a, b) -> a + b) AS syy,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1, len(rx) + 1), i -> rx[i] * ry[i])), (a, b) -> a + b) AS sxy
  FROM ranks
)
SELECT CAST(n AS BIGINT) AS n_months,
       (CAST(n AS DOUBLE) * sxy - sx * sy)
         / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))
         AS spearman_rho
FROM sums
"""


@register(
    "orders_spearman_price_volume",
    oracle=_SPEARMAN_ORACLE,
    doc="Spearman rank correlation between monthly revenue and monthly "
    "order volume with tie-average ranks — positional rank counts inside "
    "the calendar-bounded month array, Pearson-on-ranks with ordered "
    "folds and IEEE sqrt; bit-exact cross-engine.",
    tags=("stats", "correlation", "extension"),
)
def orders_spearman_price_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same one-shuffle month-cell reduction as orders_theil_sen_trend."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    cents = (F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)") * 100).cast("long")
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
        .agg(F.sum("c").alias("cents"), F.count("*").cast("long").alias("n_orders"))
    )
    packed = monthly.agg(
        F.array_sort(
            F.collect_list(F.struct("ym0", "cents", "n_orders"))
        ).alias("tv"),
        F.count("*").cast("long").alias("n"),
    ).select(
        F.transform("tv", lambda s: s["cents"]).alias("xv"),
        F.transform("tv", lambda s: s["n_orders"]).alias("yv"),
        "n",
    )

    def rankv(col_name: str):
        v = F.col(col_name)
        return F.transform(
            v,
            lambda x: F.size(F.filter(v, lambda e: e < x)).cast("double")
            + (F.size(F.filter(v, lambda e: e == x)) + 1).cast("double")
            / F.lit(2.0),
        )

    ranks = packed.select("n", rankv("xv").alias("rx"), rankv("yv").alias("ry"))
    dz = F.lit(0.0)
    fsum = lambda arr: F.aggregate(arr, dz, lambda a, b: a + b)  # noqa: E731
    sums = ranks.select(
        "n",
        fsum(F.col("rx")).alias("sx"),
        fsum(F.col("ry")).alias("sy"),
        fsum(F.transform("rx", lambda e: e * e)).alias("sxx"),
        fsum(F.transform("ry", lambda e: e * e)).alias("syy"),
        fsum(
            F.transform(
                F.sequence(F.lit(1), F.size("rx")),
                lambda i: F.element_at("rx", i.cast("int"))
                * F.element_at("ry", i.cast("int")),
            )
        ).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    return sums.select(
        F.col("n").alias("n_months"),
        (
            (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(nd * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(nd * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("spearman_rho"),
    )


# --- Qini uplift curve ------------------------------------------------------------------
# The uplift-model evaluation readout: rank users by a targeting score,
# then per score decile compare treated-vs-control conversion and
# accumulate the Qini statistic Q(k) = cumconv_t(k) - cumconv_c(k) *
# cumn_t(k)/cumn_c(k). The score here is the deterministic engagement
# proxy (# view events); the treatment split is the salted-hash variant
# shared with events_ab_test_lift. Deciles are EXACT via the distributed
# prefix-sum rank; everything after is a 10-cell integer fold.

_QINI_ORACLE_TMPL = """
WITH users AS (
  SELECT user_id,
         {vh} % 2 AS variant,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS score,
         MAX(CASE WHEN event_type = 'purchase' AND value > {conv} THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), ranked AS (
  SELECT variant, converted,
         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, user_id ASC) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM users
), per AS (
  SELECT CAST((rk - 1) * 10 // n + 1 AS BIGINT) AS decile,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_t,
         CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_c
  FROM ranked GROUP BY 1
), arr AS (
  SELECT list(struct_pack(d := decile, nt := n_t, nc := n_c, ct := conv_t, cc := conv_c)
              ORDER BY decile) AS a
  FROM per
), cumulated AS (
  SELECT a[i].d AS decile, a[i].nt AS n_t, a[i].nc AS n_c,
         a[i].ct AS conv_t, a[i].cc AS conv_c,
         list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(a, 1, i), s -> s.nt)), (x, y) -> x + y) AS cnt,
         list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(a, 1, i), s -> s.nc)), (x, y) -> x + y) AS cnc,
         list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(a, 1, i), s -> s.ct)), (x, y) -> x + y) AS cct,
         list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(a, 1, i), s -> s.cc)), (x, y) -> x + y) AS ccc
  FROM (SELECT unnest(range(1, len(a) + 1)) AS i, a FROM arr)
)
SELECT decile, n_t, n_c, conv_t, conv_c,
       CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)
         - CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS uplift,
       CAST(cct AS DOUBLE) - CAST(ccc AS DOUBLE) * (CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE)) AS qini
FROM cumulated
"""


@register(
    "events_qini_uplift_curve",
    oracle=None,  # composed below
    doc="Qini uplift curve over exact engagement-score deciles: treated "
    "vs control conversion per decile plus the cumulative Qini statistic "
    "— integer counts through a 10-cell fold, prefix-sum deciles, the "
    "uplift-targeting evaluation exact cross-engine.",
    tags=("events", "experiment", "uplift", "prefix-sum", "extension"),
)
def events_qini_uplift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one user aggregate + the distributed prefix rank; the Qini
    fold is 10 cells."""
    from f1_lakehouse_spark.operators.events_analytics import AB_CONV_VALUE
    from f1_lakehouse_spark.operators.extensions import global_prefix_sum
    from f1_lakehouse_spark.pipeline.hashing import spark_salted_hash

    e = load_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > AB_CONV_VALUE),
                1,
            ).otherwise(0)
        ).alias("converted"),
    ).select(
        "user_id",
        (spark_salted_hash("user_id", ":ab") % 2).alias("variant"),
        "score",
        "converted",
        F.lit(1).cast("long").alias("one"),
    )
    cum, release, total = global_prefix_sum(
        spark, users, "one", [F.col("score").desc(), F.col("user_id").asc()]
    )
    n_all = int(total)
    per = (
        cum.select(
            (((F.col("cum").cast("long") - 1) * 10 / F.lit(n_all)).cast("long") + 1).alias(
                "decile"
            ),
            "variant",
            "converted",
        )
        .groupBy("decile")
        .agg(
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("long").alias("n_t"),
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("long").alias("n_c"),
            F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
            .cast("long")
            .alias("conv_t"),
            F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
            .cast("long")
            .alias("conv_c"),
        )
    )
    packed = per.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("decile").alias("d"),
                    F.col("n_t").alias("nt"),
                    F.col("n_c").alias("nc"),
                    F.col("conv_t").alias("ct"),
                    F.col("conv_c").alias("cc"),
                )
            )
        ).alias("a")
    )
    rows = packed.select(
        F.explode(F.sequence(F.lit(1), F.size("a"))).alias("i"), "a"
    )
    el = F.element_at("a", F.col("i"))
    zero = F.lit(0).cast("long")
    cume = lambda fld: F.aggregate(  # noqa: E731
        F.transform(F.slice("a", F.lit(1), F.col("i")), lambda s: s[fld]),
        zero,
        lambda x, y: x + y,
    )
    out = rows.select(
        el["d"].alias("decile"),
        el["nt"].alias("n_t"),
        el["nc"].alias("n_c"),
        el["ct"].alias("conv_t"),
        el["cc"].alias("conv_c"),
        (
            el["ct"].cast("double") / el["nt"].cast("double")
            - el["cc"].cast("double") / el["nc"].cast("double")
        ).alias("uplift"),
        (
            cume("ct").cast("double")
            - cume("cc").cast("double")
            * (cume("nt").cast("double") / cume("nc").cast("double"))
        ).alias("qini"),
    )
    out = pin_small_result(out, 64)
    release()
    return out


def _compose_qini_oracle() -> str:
    from f1_lakehouse_spark.operators.events_analytics import AB_CONV_VALUE
    from f1_lakehouse_spark.pipeline.hashing import sql_salted_hash

    return _QINI_ORACLE_TMPL.format(
        vh=sql_salted_hash("user_id", ":ab"), conv=AB_CONV_VALUE
    )


_REG["events_qini_uplift_curve"].oracle = _compose_qini_oracle()


# --- Wald-Wolfowitz runs test -----------------------------------------------------------
# Randomness check on monthly revenue: runs of above/below-median months
# vs the exact null moments. Median from the sorted cent array, the run
# count a single ordered fold over the +/- sign sequence (equal-to-median
# months excluded, the standard convention); mean/variance of the run
# count are rational in (n1, n2); z needs one IEEE sqrt.

_RUNS_ORACLE = f"""
WITH monthly AS ({_MONTHLY_SQL}),
packed AS (
  SELECT list(cents ORDER BY ym0) AS v, list_sort(list(cents)) AS sv,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM monthly
), med AS (
  SELECT v, n,
         CASE WHEN n % 2 = 1 THEN CAST(sv[(n + 1) // 2] AS DOUBLE)
              ELSE (CAST(sv[n // 2] AS DOUBLE) + CAST(sv[n // 2 + 1] AS DOUBLE)) / CAST(2.0 AS DOUBLE)
         END AS m
  FROM packed
), signs AS (
  SELECT list_transform(list_filter(v, x -> CAST(x AS DOUBLE) <> m),
                        x -> CASE WHEN CAST(x AS DOUBLE) > m THEN 1 ELSE 0 END) AS s
  FROM med
), counts AS (
  SELECT s,
         CAST(len(list_filter(s, x -> x = 1)) AS BIGINT) AS n1,
         CAST(len(list_filter(s, x -> x = 0)) AS BIGINT) AS n2,
         CAST(1 + list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(2, len(s) + 1),
              i -> CASE WHEN s[i] <> s[i - 1] THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
            (a, b) -> a + b) AS BIGINT) AS r
  FROM signs
)
SELECT n1, n2, r AS n_runs,
       CAST(1.0 AS DOUBLE) + CAST(2 * n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) AS expected_runs,
       CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS DOUBLE)
         / (CAST((n1 + n2) * (n1 + n2) AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)) AS var_runs,
       (CAST(r AS DOUBLE) - (CAST(1.0 AS DOUBLE) + CAST(2 * n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)))
         / sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS DOUBLE)
                / (CAST((n1 + n2) * (n1 + n2) AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))) AS z_stat
FROM counts
"""


@register(
    "orders_runs_test",
    oracle=_RUNS_ORACLE,
    doc="Wald-Wolfowitz runs test on monthly revenue vs its median: run "
    "count from one ordered fold over the calendar-bounded sign sequence, "
    "rational null moments in (n1, n2), one IEEE sqrt for z.",
    tags=("stats", "trend", "extension"),
)
def orders_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = _monthly_cents(spark, sf_dir)
    packed = monthly.agg(
        F.array_sort(F.collect_list(F.struct("ym0", "cents"))).alias("tv"),
        F.count("*").cast("long").alias("n"),
    ).select(
        F.transform("tv", lambda s: s["cents"]).alias("v"),
        F.array_sort(F.transform("tv", lambda s: s["cents"])).alias("sv"),
        "n",
    )
    med = packed.select(
        "v",
        "n",
        _spark_med(F.transform("sv", lambda x: x.cast("double"))).alias("m"),
    )
    signs = med.select(
        F.transform(
            F.filter("v", lambda x: x.cast("double") != F.col("m")),
            lambda x: F.when(x.cast("double") > F.col("m"), 1).otherwise(0),
        ).alias("s")
    )
    zero = F.lit(0).cast("long")
    counts = signs.select(
        F.size(F.filter("s", lambda x: x == 1)).cast("long").alias("n1"),
        F.size(F.filter("s", lambda x: x == 0)).cast("long").alias("n2"),
        (
            F.lit(1).cast("long")
            + F.aggregate(
                F.transform(
                    F.sequence(F.lit(2), F.size("s")),
                    lambda i: F.when(
                        F.element_at("s", i.cast("int"))
                        != F.element_at("s", (i - F.lit(1)).cast("int")),
                        F.lit(1),
                    )
                    .otherwise(F.lit(0))
                    .cast("long"),
                ),
                zero,
                lambda a, b: a + b,
            )
        ).alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    exp_r = F.lit(1.0) + (2 * n1 * n2).cast("double") / (n1 + n2).cast("double")
    var_r = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)).cast("double") / (
        ((n1 + n2) * (n1 + n2)).cast("double") * (n1 + n2 - 1).cast("double")
    )
    return counts.select(
        "n1",
        "n2",
        r.alias("n_runs"),
        exp_r.alias("expected_runs"),
        var_r.alias("var_runs"),
        ((r.cast("double") - exp_r) / F.sqrt(var_r)).alias("z_stat"),
    )


# --- one-way ANOVA of supplier revenue by nation ------------------------------------------
# "Does supplier revenue differ BY NATION more than within nations?" —
# the classic between/within variance decomposition, exact: per-supplier
# revenue rounds to DECIMAL(18,3) once (so the square fits precision 37 —
# a (19,3) square needs 39 digits and Spark's 38-cap silently loses
# exactness; the DuckDB twin widens its operands to (19,3) because its
# int64 physical type overflows first), squares stay DECIMAL(38,6)
# (exact), and group moments round to SCALE 0 before their only double
# casts: a scale-0 decimal→double is ONE int→double conversion —
# bit-identical in both engines at ANY magnitude, where any scale>0 cast
# double-rounds in DuckDB past 2^53 (the supplier_revenue_gini
# discipline). The F statistic and eta-squared are IEEE ratios.

_ANOVA_ORACLE = """
WITH rev AS (
  SELECT s.s_nationkey AS nk,
         CAST(round(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6))), 3) AS DECIMAL(18,3)) AS x
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY l.l_suppkey, s.s_nationkey
), grp AS (
  SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(round(SUM(x), 0) AS DOUBLE) AS s1,
         CAST(round(SUM(CAST(x AS DECIMAL(19,3)) * CAST(x AS DECIMAL(19,3))), 0) AS DOUBLE) AS s2
  FROM rev GROUP BY nk
), packed AS (
  SELECT list(struct_pack(nk := nk, n := n, s1 := s1, s2 := s2) ORDER BY nk) AS a,
         CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM grp
), folded AS (
  SELECT n_tot, k,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(a, g -> g.s1)), (p, q) -> p + q) AS st,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(a, g -> g.s2)), (p, q) -> p + q) AS sqt,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(a, g -> g.s1 * g.s1 / CAST(g.n AS DOUBLE))), (p, q) -> p + q) AS sb
  FROM packed
)
SELECT k AS k_groups, n_tot AS n_suppliers,
       sb - st * st / CAST(n_tot AS DOUBLE) AS ss_between,
       sqt - sb AS ss_within,
       ((sb - st * st / CAST(n_tot AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
         / ((sqt - sb) / CAST(n_tot - k AS DOUBLE)) AS f_stat,
       (sb - st * st / CAST(n_tot AS DOUBLE))
         / (sqt - st * st / CAST(n_tot AS DOUBLE)) AS eta_squared
FROM folded
"""


@register(
    "supplier_revenue_anova",
    oracle=_ANOVA_ORACLE,
    doc="one-way ANOVA of supplier revenue by nation: DECIMAL-exact group "
    "moments (scale-3 rounding before the only double casts), "
    "between/within decomposition folded over the 25-nation packed "
    "array, F statistic and eta-squared as IEEE ratios.",
    tags=("stats", "anova", "extension"),
)
def supplier_revenue_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one (supplier, nation) aggregate + one nation aggregate,
    both with map-side combine; the decomposition is a 25-cell fold."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(su, li["l_suppkey"] == su["s_suppkey"])
        .groupBy("l_suppkey", "s_nationkey")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(27,6)"
                    )
                ),
                3,
            )
            .cast("decimal(18,3)")
            .alias("x")
        )
        .select(F.col("s_nationkey").alias("nk"), "x")
    )
    grp = rev.groupBy("nk").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("x"), 0).cast("double").alias("s1"),
        F.round(F.sum((F.col("x") * F.col("x")).cast("decimal(38,6)")), 0)
        .cast("double")
        .alias("s2"),
    )
    packed = grp.agg(
        F.sort_array(F.collect_list(F.struct("nk", "n", "s1", "s2"))).alias("a"),
        F.sum("n").cast("long").alias("n_tot"),
        F.count("*").cast("long").alias("k"),
    )
    dz = F.lit(0.0)
    fsum = lambda arr: F.aggregate(arr, dz, lambda p, q: p + q)  # noqa: E731
    folded = packed.select(
        "n_tot",
        "k",
        fsum(F.transform("a", lambda g: g["s1"])).alias("st"),
        fsum(F.transform("a", lambda g: g["s2"])).alias("sqt"),
        fsum(
            F.transform("a", lambda g: g["s1"] * g["s1"] / g["n"].cast("double"))
        ).alias("sb"),
    )
    nt = F.col("n_tot").cast("double")
    ssb = F.col("sb") - F.col("st") * F.col("st") / nt
    ssw = F.col("sqt") - F.col("sb")
    sst = F.col("sqt") - F.col("st") * F.col("st") / nt
    return folded.select(
        F.col("k").alias("k_groups"),
        F.col("n_tot").alias("n_suppliers"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        (
            (ssb / (F.col("k") - 1).cast("double"))
            / (ssw / (F.col("n_tot") - F.col("k")).cast("double"))
        ).alias("f_stat"),
        (ssb / sst).alias("eta_squared"),
    )


# --- recursive hierarchy (BOM-style) subtree rollup --------------------------------------
# The classic warehouse recursion Spark famously lacks as syntax (no
# WITH RECURSIVE): roll a cost up a part hierarchy. Hierarchy is derived
# deterministically (parent(pk) = pk div 10; depth = digit count, so the
# recursion depth is log10(|parts|) — 5 levels at a billion parts). The
# Spark side runs the LEVEL-SYNCHRONOUS bottom-up loop — one
# child-sum-join per level with a persist barrier (the iterative-lineage
# rule), shuffle keyed on parent — while the DuckDB oracle is a real
# WITH RECURSIVE transitive closure, so the recursion SEMANTICS are
# differentially checked, not just the arithmetic. All integer cents.

_BOM_ORACLE = """
WITH RECURSIVE parts AS (
  SELECT p_partkey AS pk,
         CAST(CAST(round(p_retailprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM part
), closure(root, node) AS (
  SELECT pk, pk FROM parts
  UNION ALL
  SELECT c.root, p.pk
  FROM closure c JOIN parts p ON p.pk // 10 = c.node AND p.pk >= 10
)
SELECT c.root AS p_partkey,
       CAST(length(CAST(c.root AS VARCHAR)) AS BIGINT) AS level,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_descendants,
       CAST(MAX(CASE WHEN c.node = c.root THEN p.cents END) AS BIGINT) AS own_cents,
       CAST(SUM(p.cents) AS BIGINT) AS subtree_cents
FROM closure c JOIN parts p ON p.pk = c.node
GROUP BY c.root
"""


@register(
    "part_bom_subtree_rollup",
    oracle=_BOM_ORACLE,
    doc="recursive BOM-style subtree cost rollup over the derived part "
    "hierarchy (parent = pk div 10): Spark runs the level-synchronous "
    "bottom-up loop (one parent-keyed shuffle per digit level, persist "
    "barrier per round); the oracle is a genuine WITH RECURSIVE closure "
    "— recursion semantics differentially checked. Integer cents.",
    tags=("hierarchy", "recursive", "extension"),
)
def part_bom_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: depth = log10(|parts|) (5 rounds at 1e9 parts); each round
    is one groupBy(parent) with map-side combine over the CURRENT level
    only, never the whole closure — the closure table the oracle builds
    is exactly what this loop avoids materializing."""
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"),
        (F.round(F.col("p_retailprice"), 2).cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    base = p.select(
        "pk",
        F.expr("pk div 10").alias("parent"),
        F.length(F.col("pk").cast("string")).cast("int").alias("lvl"),
        "cents",
    )
    base = base.persist()
    max_lvl = base.agg(F.max("lvl")).collect()[0][0]
    # sub(p) accumulates the subtree sum bottom-up, level-synchronously
    sub = base.select(
        "pk",
        "parent",
        "lvl",
        F.col("cents").alias("own_cents"),
        F.col("cents").alias("subtree_cents"),
        F.lit(1).cast("long").alias("n_nodes"),
    )
    prev = None
    for lvl in range(int(max_lvl), 1, -1):
        child = (
            sub.where((F.col("lvl") == lvl) & (F.col("pk") >= 10))
            .groupBy("parent")
            .agg(
                F.sum("subtree_cents").alias("c_cents"),
                F.sum("n_nodes").alias("c_nodes"),
            )
            .select(
                F.col("parent").alias("cpk"),  # rename: child derives from sub
                "c_cents",
                "c_nodes",
            )
        )
        sub = (
            sub.join(child, F.col("pk") == F.col("cpk"), "left")
            .select(
                "pk",
                "parent",
                "lvl",
                "own_cents",
                (
                    F.col("subtree_cents") + F.coalesce(F.col("c_cents"), F.lit(0))
                ).alias("subtree_cents"),
                (F.col("n_nodes") + F.coalesce(F.col("c_nodes"), F.lit(0))).alias(
                    "n_nodes"
                ),
            )
        )
        sub = sub.persist()
        sub.count()  # barrier: each round's join must not re-derive lineage
        if prev is not None:
            prev.unpersist()
        prev = sub
    out = sub.select(
        F.col("pk").alias("p_partkey"),
        F.col("lvl").cast("long").alias("level"),
        (F.col("n_nodes") - 1).cast("long").alias("n_descendants"),
        "own_cents",
        "subtree_cents",
    )
    out = pin_checkpoint(out)
    if prev is not None:
        prev.unpersist()
    base.unpersist()
    return out


# --- hierarchical forecast reconciliation -------------------------------------------------
# Nation-level Holt forecasts disagree with the global one; the two
# classic reconciliations are BOTTOM-UP (sum the children) and TOP-DOWN
# (split the global forecast by historical proportions). Emits both per
# nation plus the __total__ row, so the coherence gap is data. Exact:
# per-series Holt folds reuse the orders_holt_forecast list-state
# discipline (cents-exact cells, DOUBLE-list [level, trend] state); the
# bottom-up sum folds over the nation-sorted 25-cell array; proportions
# are ratios of exact cent integers.

_HF_ALPHA, _HF_BETA = "0.25", "0.125"  # dyadic, same as orders_holt_forecast

_HF_STEP_SQL = (
    "(acc, x) -> ["
    f"CAST({_HF_ALPHA} AS DOUBLE) * x[1] + (CAST(1.0 AS DOUBLE) - CAST({_HF_ALPHA} AS DOUBLE)) * (acc[1] + acc[2]), "
    f"CAST({_HF_BETA} AS DOUBLE) * (CAST({_HF_ALPHA} AS DOUBLE) * x[1] + (CAST(1.0 AS DOUBLE) - CAST({_HF_ALPHA} AS DOUBLE)) * (acc[1] + acc[2]) - acc[1]) "
    f"+ (CAST(1.0 AS DOUBLE) - CAST({_HF_BETA} AS DOUBLE)) * acc[2]"
    "]"
)

_HF_ORACLE = f"""
WITH cells AS (
  SELECT c.c_nationkey AS nk,
         (CAST(year(o.o_orderdate) AS BIGINT) * 12 + CAST(month(o.o_orderdate) AS BIGINT) - 1) AS ym0,
         CAST(SUM(CAST(CAST(round(o.o_totalprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), spine AS (
  SELECT nk, list(struct_pack(ym := ym0, v := CAST(cents AS DOUBLE) / 100.0) ORDER BY ym0) AS arr,
         CAST(SUM(cents) AS BIGINT) AS hist_cents
  FROM cells GROUP BY nk
), fitted AS (
  SELECT nk, hist_cents, len(arr) AS n,
         list_reduce(
           list_prepend([arr[1].v, arr[2].v - arr[1].v],
                        list_transform(list_slice(arr, 2, len(arr)), s -> [s.v, CAST(0.0 AS DOUBLE)])),
           {_HF_STEP_SQL}) AS st
  FROM spine WHERE len(arr) >= 2
), nation_fc AS (
  SELECT nk, hist_cents, st[1] + st[2] AS fc FROM fitted
), tot AS (
  SELECT ym0, CAST(SUM(cents) AS BIGINT) AS cents FROM cells GROUP BY ym0
), tot_spine AS (
  SELECT list(struct_pack(ym := ym0, v := CAST(cents AS DOUBLE) / 100.0) ORDER BY ym0) AS arr,
         CAST(SUM(cents) AS BIGINT) AS hist_cents
  FROM tot
), tot_fc AS (
  SELECT hist_cents,
         list_reduce(
           list_prepend([arr[1].v, arr[2].v - arr[1].v],
                        list_transform(list_slice(arr, 2, len(arr)), s -> [s.v, CAST(0.0 AS DOUBLE)])),
           {_HF_STEP_SQL}) AS st
  FROM tot_spine
), bu AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(list(struct_pack(nk := nk, fc := fc) ORDER BY nk), s -> s.fc)),
           (a, b) -> a + b) AS bottom_up
  FROM nation_fc
)
SELECT CAST(n.nk AS BIGINT) AS nationkey,
       n.fc AS holt_forecast,
       (CAST(n.hist_cents AS DOUBLE) / CAST(t.hist_cents AS DOUBLE)) * (t.st[1] + t.st[2]) AS top_down_forecast,
       t.st[1] + t.st[2] AS global_forecast,
       b.bottom_up AS bottom_up_total
FROM nation_fc n, tot_fc t, bu b
UNION ALL
SELECT CAST(-1 AS BIGINT) AS nationkey,
       b.bottom_up AS holt_forecast,
       t.st[1] + t.st[2] AS top_down_forecast,
       t.st[1] + t.st[2] AS global_forecast,
       b.bottom_up AS bottom_up_total
FROM tot_fc t, bu b
"""


@register(
    "orders_hier_forecast_reconcile",
    oracle=_HF_ORACLE,
    doc="hierarchical forecast reconciliation: per-nation Holt one-step "
    "forecasts vs BOTTOM-UP (nation-sorted fold of the 25 children) and "
    "TOP-DOWN (global Holt split by exact historical cent proportions); "
    "the __total__(-1) row carries the coherence gap as data. Same "
    "list-state fold discipline as orders_holt_forecast.",
    tags=("stats", "timeseries", "forecast", "hierarchy", "extension"),
)
def orders_hier_forecast_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one (nation, month) partial-aggregated shuffle; 26 Holt
    folds over calendar-bounded arrays; the reconciliation itself is a
    25-cell fold."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cents = (F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)") * 100).cast("long")
    cells = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_nationkey").alias("nk"),
            (
                F.year("o_orderdate").cast("long") * 12
                + F.month("o_orderdate").cast("long")
                - 1
            ).alias("ym0"),
            cents.alias("cval"),
        )
        .groupBy("nk", "ym0")
        .agg(F.sum("cval").alias("cents"))
    )
    cells = cells.persist()
    cells.count()  # two consumers: per-nation spines and the global spine

    alpha, beta = F.lit(0.25), F.lit(0.125)

    def holt_step(acc, x):
        lvl = alpha * F.element_at(x, 1) + (F.lit(1.0) - alpha) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        tr = beta * (
            alpha * F.element_at(x, 1)
            + (F.lit(1.0) - alpha) * (F.element_at(acc, 1) + F.element_at(acc, 2))
            - F.element_at(acc, 1)
        ) + (F.lit(1.0) - beta) * F.element_at(acc, 2)
        return F.array(lvl, tr)

    def holt_fc(frame, keys):
        packed = frame.groupBy(*keys).agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("ym0").alias("ym"),
                        (F.col("cents").cast("double") / F.lit(100.0)).alias("v"),
                    )
                )
            ).alias("arr"),
            F.sum("cents").cast("long").alias("hist_cents"),
        )
        init = F.array(
            F.element_at("arr", 1)["v"],
            F.element_at("arr", 2)["v"] - F.element_at("arr", 1)["v"],
        )
        steps = F.transform(
            F.slice("arr", F.lit(2), F.size("arr") - 1),
            lambda s: F.array(s["v"], F.lit(0.0)),
        )
        st = F.aggregate(steps, init, holt_step)
        return packed.where(F.size("arr") >= 2).select(
            *keys,
            "hist_cents",
            (F.element_at(st, 1) + F.element_at(st, 2)).alias("fc"),
        )

    nation_fc = holt_fc(cells, ["nk"])
    tot_cells = cells.groupBy("ym0").agg(F.sum("cents").alias("cents"))
    tot_fc = holt_fc(tot_cells.select(F.lit(0).alias("g"), "ym0", "cents"), ["g"]).select(
        F.col("hist_cents").alias("g_hist"), F.col("fc").alias("g_fc")
    )
    bu = nation_fc.agg(
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("nk"), F.col("fc")))
                ),
                lambda s: s["fc"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("bottom_up")
    )
    per_nation = (
        nation_fc.crossJoin(F.broadcast(tot_fc))
        .crossJoin(F.broadcast(bu))
        .select(
            F.col("nk").cast("long").alias("nationkey"),
            F.col("fc").alias("holt_forecast"),
            (
                (F.col("hist_cents").cast("double") / F.col("g_hist").cast("double"))
                * F.col("g_fc")
            ).alias("top_down_forecast"),
            F.col("g_fc").alias("global_forecast"),
            F.col("bottom_up").alias("bottom_up_total"),
        )
    )
    total_row = (
        tot_fc.crossJoin(F.broadcast(bu))
        .select(
            F.lit(-1).cast("long").alias("nationkey"),
            F.col("bottom_up").alias("holt_forecast"),
            F.col("g_fc").alias("top_down_forecast"),
            F.col("g_fc").alias("global_forecast"),
            F.col("bottom_up").alias("bottom_up_total"),
        )
    )
    out = per_nation.unionByName(total_row)
    out = pin_small_result(out, 64)
    cells.unpersist()
    return out


# --- distribution-free median confidence interval -----------------------------------------
# The nonparametric 95% CI for the median of fulfillment latency: order
# statistics at n/2 -+ z*sqrt(n)/2 (z = 1.959964 — a shared literal; sqrt
# and floor/ceil are IEEE-deterministic, so both engines pick the SAME
# ranks). One distributed prefix-sum rank serves all three picks — the
# k-th-order-statistic machinery (scoring_conformal_interval) applied to
# the estimator people actually report.

_MCI_Z = "1.959964"

_MEDIAN_CI_ORACLE = f"""
WITH fs AS (
  SELECT o.o_orderkey,
         CAST(date_diff('day', o.o_orderdate, MIN(l.l_shipdate)) AS BIGINT) AS t_days
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
), ranked AS (
  SELECT t_days, o_orderkey,
         CAST(ROW_NUMBER() OVER (ORDER BY t_days, o_orderkey) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM fs
), ks AS (
  SELECT n,
         CAST(floor((CAST(n AS DOUBLE) - {_MCI_Z} * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT) AS k_lo,
         (n + 1) // 2 AS k_med,
         CAST(ceil(1.0 + (CAST(n AS DOUBLE) + {_MCI_Z} * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT) AS k_hi
  FROM (SELECT MAX(n) AS n FROM ranked)
)
SELECT k.n AS n_orders,
       MIN(CASE WHEN r.rk = k.k_lo THEN r.t_days END) AS ci_lo_days,
       MIN(CASE WHEN r.rk = k.k_med THEN r.t_days END) AS median_days,
       MIN(CASE WHEN r.rk = k.k_hi THEN r.t_days END) AS ci_hi_days
FROM ranked r CROSS JOIN ks k
GROUP BY k.n
"""


@register(
    "orders_median_ci",
    oracle=_MEDIAN_CI_ORACLE,
    doc="distribution-free 95% CI for median fulfillment latency: order "
    "statistics at n/2 -+ z*sqrt(n)/2 picked by ONE distributed "
    "prefix-sum rank (never a global sort to the driver); z, sqrt, "
    "floor/ceil are IEEE-deterministic so both engines pick identical "
    "ranks.",
    tags=("stats", "order-statistics", "prefix-sum", "extension"),
)
def orders_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_lakehouse_spark.operators.extensions import global_prefix_sum

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    fs = l.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    base = o.join(fs, o["o_orderkey"] == fs["l_orderkey"]).select(
        "o_orderkey",
        F.datediff(F.col("first_ship"), F.col("o_orderdate"))
        .cast("long")
        .alias("t_days"),
        F.lit(1).cast("long").alias("one"),
    )
    cum, release, total = global_prefix_sum(
        spark, base, "one", [F.col("t_days").asc(), F.col("o_orderkey").asc()]
    )
    import math

    n = int(total)
    z = float(_MCI_Z)
    k_lo = int(math.floor((float(n) - z * math.sqrt(float(n))) / 2.0))
    k_med = (n + 1) // 2
    k_hi = int(math.ceil(1.0 + (float(n) + z * math.sqrt(float(n))) / 2.0))
    cum = cum.withColumn("rk", F.col("cum").cast("long"))
    picks = {
        r["rk"]: r["t_days"]
        for r in cum.where(F.col("rk").isin(k_lo, k_med, k_hi))
        .select("rk", "t_days")
        .collect()
    }
    release()
    return spark.createDataFrame(
        [(n, picks[k_lo], picks[k_med], picks[k_hi])],
        "n_orders long, ci_lo_days long, median_days long, ci_hi_days long",
    )


# --- CR-k concentration ratios ---------------------------------------------------------------
# Market-concentration readout to pair with nation_revenue_hhi: the share
# of total revenue held by the top-4 and top-8 suppliers (CR4/CR8).
# Decimal-exact revenue, scale-0 rounding before the only double casts,
# top-k via TakeOrdered with a unique tiebreak; the k-fold sums fold over
# the tiny sorted top-k array.

_CRK_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))), 0) AS DOUBLE) AS r
  FROM lineitem GROUP BY l_suppkey
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers, SUM(r) AS t FROM rev
), topk AS (
  SELECT list(struct_pack(r := r, k := l_suppkey)
              ORDER BY r DESC, l_suppkey ASC)[1:8] AS arr
  FROM rev
)
SELECT tot.n_suppliers,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(list_slice(arr, 1, 4), s -> s.r)), (a, b) -> a + b) / tot.t AS cr4,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(list_slice(arr, 1, 8), s -> s.r)), (a, b) -> a + b) / tot.t AS cr8
FROM topk, tot
"""


@register(
    "supplier_cr_concentration",
    oracle=_CRK_ORACLE,
    doc="CR4/CR8 supplier revenue concentration ratios (the HHI "
    "companion): decimal-exact revenue with scale-0 rounding, top-8 via "
    "TakeOrdered with unique tiebreaks, shares folded over the 8-cell "
    "array.",
    tags=("stats", "concentration", "extension"),
)
def supplier_cr_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(27,6)"
                )
            ),
            0,
        )
        .cast("double")
        .alias("r")
    )
    rev = rev.persist()
    rev.count()  # two consumers: totals + top-k
    tot = rev.agg(
        F.count("*").cast("long").alias("n_suppliers"), F.sum("r").alias("t")
    )
    topk = (
        rev.orderBy(F.col("r").desc(), F.col("l_suppkey").asc())
        .limit(8)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct((-F.col("r")).alias("nr"), F.col("l_suppkey").alias("k"), F.col("r"))
                )
            ).alias("arr")
        )
    )
    dz = F.lit(0.0)
    crk = lambda k: F.aggregate(  # noqa: E731
        F.transform(F.slice("arr", F.lit(1), F.lit(k)), lambda s: s["r"]),
        dz,
        lambda a, b: a + b,
    )
    out = topk.crossJoin(F.broadcast(tot)).select(
        "n_suppliers",
        (crk(4) / F.col("t")).alias("cr4"),
        (crk(8) / F.col("t")).alias("cr8"),
    )
    out = pin_small_result(out, 16)
    rev.unpersist()
    return out
