"""Window operators (SURVEY.md §2.5 W1) + frame/rank/lag extensions.

W1 — the reference's single window function — is ROW_NUMBER with NULLS LAST
(reference transform/models/gold/driver_session_summary.sql:20-35). Spark's
default ASC ordering is nulls-FIRST, so `asc_nulls_last()` is load-bearing.

Every window ordering here is TOTAL (unique tiebreakers) so results are
deterministic under parallel execution — a requirement for the value-hash
correctness gate and good hygiene at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_lakehouse_spark.operators.aggregations import DSUM, dsum_i
from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table


# --- W1: ROW_NUMBER ASC NULLS LAST, personal-best flag ------------------------


@register(
    "w1_row_number_nulls_last",
    oracle="""
WITH src AS (
    SELECT user_id, event_id, ts, NULLIF(value, 0) AS v
    FROM events
), ranked AS (
    SELECT user_id, event_id, v,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY v ASC NULLS LAST, ts, event_id) AS rn
    FROM src
)
SELECT user_id, event_id, v, rn FROM ranked WHERE rn <= 3
""",
    doc="ROW_NUMBER ASC NULLS LAST + top-3 per group (personal-best shape)",
    tags=("W1",),
)
def w1_row_number_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.nullif(F.col("value"), F.lit(0.0)).alias("v")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("v").asc_nulls_last(), "ts", "event_id"
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "v", "rn")
    )


# --- RANK / DENSE_RANK / NTILE (extensions; absent in reference §2.5) ---------


@register(
    "w_rank_dense_ntile",
    oracle="""
SELECT s_suppkey, s_nationkey, s_acctbal,
       RANK()       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rnk,
       DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS drnk,
       NTILE(4)     OVER (ORDER BY s_acctbal DESC, s_suppkey) AS quartile
FROM supplier
""",
    doc="RANK/DENSE_RANK per partition + global NTILE quartiles — the "
    "quartile is a distributed exact prefix-sum rank mapped through the "
    "closed-form NTILE bucket formula (orders_rfm_segmentation idiom), "
    "never a single-partition global sort; the oracle keeps plain NTILE, "
    "proving the formulation bit-identical",
    tags=("window", "rank", "prefix-sum"),
)
def w_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lazy import: a module-level one would reorder registry imports and
    # churn the rotation window (see memory note / rotate_window.py)
    from f1_lakehouse_spark.operators.extensions import (  # noqa: PLC0415
        _ntile_from_rank,
        global_prefix_sum,
    )

    s = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .withColumn("one", F.lit(1).cast("long"))
    )
    cum, release, total = global_prefix_sum(
        spark, s, "one", [F.col("s_acctbal").desc(), F.col("s_suppkey").asc()]
    )
    n = int(total)
    wp = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), "s_suppkey"
    )
    out = cum.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.rank().over(wp).alias("rnk"),
        F.dense_rank().over(wp).alias("drnk"),
        _ntile_from_rank(F.col("cum").cast("long"), n, 4).alias("quartile"),
    )
    out = out.persist()
    out.count()
    release()
    return out


# --- LAG/LEAD + gap sessionization (common OLAP pattern) -----------------------


@register(
    "w_sessionize_events",
    oracle="""
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id, event_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
    FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess GROUP BY 1, 2
""",
    doc="gap-based sessionization: LAG + cumulative SUM + per-session agg",
    tags=("window", "lag", "sessionization"),
)
def w_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(cum))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# --- tumbling time-window aggregation (batch twin of the streaming query) ------


@register(
    "events_tumbling_window",
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       {DSUM("value")} AS total_value
FROM events GROUP BY 1, 2
""",
    doc="1-hour tumbling-window counts/sums (batch twin of streaming agg)",
    tags=("window", "time", "streaming-twin"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum_i("value", 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --- Running total with explicit frame (rowsBetween) ---------------------------


@register(
    "w_running_total",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend
FROM orders
""",
    doc="running per-customer spend: explicit ROWS frame, exact decimal accumulation",
    tags=("window", "frame"),
)
def w_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


# --- LAG/LEAD/FIRST_VALUE + RANGE frame (time-based rolling window) ------------
# The navigation functions need a TOTAL order (ts, event_id); the RANGE frame
# orders by epoch-µs alone — peers (equal timestamps) enter the frame together
# in both engines, and the framed SUM accumulates in exact DECIMAL, so the
# result is deterministic without a tiebreaker.


@register(
    "w_lag_lead_frames",
    oracle="""
SELECT event_id, user_id, ts,
       LAG(value)        OVER w1 AS prev_value,
       LEAD(event_type)  OVER w1 AS next_type,
       FIRST_VALUE(ts)   OVER w1 AS first_ts,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS rolling_1h_sum
FROM events
WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    doc="LAG/LEAD/FIRST_VALUE navigation + time-based RANGE frame "
    "(1-hour rolling sum per user)",
    tags=("window", "frame", "events"),
)
def w_lag_lead_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("value").over(w1).alias("prev_value"),
        F.lead("event_type").over(w1).alias("next_type"),
        F.first("ts").over(w1).alias("first_ts"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(wr)
        .cast("double")
        .alias("rolling_1h_sum"),
    )


# --- multi-resolution continuous aggregate (hypertable-rollup shape) -----------
# The TimescaleDB continuous-aggregate pattern: 15-minute base buckets, with
# hour and day levels RE-AGGREGATED FROM the 15-minute partials (never from
# raw events). At 100 TB only the base level scans the fact table; each
# coarser level re-aggregates the (tiny) finer aggregate — count/sum compose
# associatively, and the decimal accumulation keeps the re-aggregated sums
# exactly equal to a direct aggregate. One scan, three resolutions.


@register(
    "events_multires_rollup",
    oracle=f"""
WITH b15 AS (
    /* to_timestamp() yields TIMESTAMPTZ; cast back to naive like every
       other timestamp here */
    SELECT CAST(to_timestamp(floor(epoch(ts) / 900) * 900) AS TIMESTAMP)
               AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           SUM(CAST(value AS DECIMAL(27,6))) AS sum_value
    FROM events GROUP BY 1, 2
),
hourly AS (
    SELECT date_trunc('hour', bucket_start) AS bucket_start, event_type,
           SUM(n_events) AS n_events, SUM(sum_value) AS sum_value
    FROM b15 GROUP BY 1, 2
),
daily AS (
    SELECT date_trunc('day', bucket_start) AS bucket_start, event_type,
           SUM(n_events) AS n_events, SUM(sum_value) AS sum_value
    FROM hourly GROUP BY 1, 2
)
SELECT '15min' AS resolution, bucket_start, event_type,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(sum_value AS DOUBLE) AS total_value FROM b15
UNION ALL
SELECT 'hour', bucket_start, event_type,
       CAST(n_events AS BIGINT), CAST(sum_value AS DOUBLE) FROM hourly
UNION ALL
SELECT 'day', bucket_start, event_type,
       CAST(n_events AS BIGINT), CAST(sum_value AS DOUBLE) FROM daily
""",
    doc="hypertable-style multi-resolution rollup: 15min base buckets from "
    "one fact scan; hour/day levels re-aggregate the finer partials "
    "(associative count + exact decimal sum), never re-scanning raw events",
    tags=("window", "time", "rollup"),
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    b15 = (
        e.groupBy(
            F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / 900) * 900
            ).alias("bucket_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).alias("sum_value"),
        )
    )
    # re-aggregate partials (the continuous-aggregate refresh path); persist
    # the base level so the three resolutions share one fact scan
    b15 = b15.persist()
    b15.count()
    hourly = b15.groupBy(
        F.date_trunc("hour", "bucket_start").alias("bucket_start"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("sum_value").alias("sum_value"))
    daily = hourly.groupBy(
        F.date_trunc("day", "bucket_start").alias("bucket_start"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("sum_value").alias("sum_value"))

    def lvl(df, name):
        return df.select(
            F.lit(name).alias("resolution"),
            "bucket_start",
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("sum_value").cast("double").alias("total_value"),
        )

    return lvl(b15, "15min").unionAll(lvl(hourly, "hour")).unionAll(lvl(daily, "day"))


# --- distribution windows: PERCENT_RANK / CUME_DIST -------------------------------


@register(
    "w_percentrank_cumedist",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       PERCENT_RANK() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal, c_custkey) AS pct_rank,
       CUME_DIST()    OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal, c_custkey) AS cume,
       CASE WHEN CUME_DIST() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal, c_custkey) >= 0.9
            THEN 1 ELSE 0 END AS top_decile
FROM customer
""",
    doc="distribution windows: PERCENT_RANK + CUME_DIST per nation with "
    "unique (c_acctbal, c_custkey) total order; both are rank/count "
    "ratios — integer-derived doubles, hash-exact across engines",
    tags=("window", "distribution"),
)
def w_percentrank_cumedist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    cume = F.cume_dist().over(w)
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        cume.alias("cume"),
        F.when(cume >= 0.9, 1).otherwise(0).alias("top_decile"),
    )


# --- sliding event-time windows (overlap semantics) -------------------------------


@register(
    "events_sliding_window",
    oracle=f"""
WITH assigned AS (
    SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                   time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
               AS window_start,
           event_type, value
    FROM events
)
SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
       event_type, COUNT(*) AS n_events, {{DSUM}} AS total_value
FROM assigned GROUP BY 1, 2, 3
""".format(DSUM=DSUM("value")),
    doc="sliding event-time windows (1 h duration / 30 min slide): each "
    "event lands in duration/slide = 2 overlapping windows via Spark's "
    "window() fan-out — the batch twin of the streaming sliding aggregate; "
    "oracle replicates the assignment with time_bucket + unnest",
    tags=("window", "event-time"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), dsum_i("value", 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --- top-k per group via WindowGroupLimit --------------------------------------------
# The rank-filter idiom `row_number() <= k` is special-cased by Spark's
# WindowGroupLimit optimization: each map task keeps only its local top-k
# rows PER GROUP before the window exchange (a partial WindowGroupLimit
# below the shuffle, a final one above — both asserted in
# tests/test_plans.py::test_topk_per_group_uses_window_group_limit). At
# 100 TB this is the difference between shuffling k rows per group per task
# and shuffling the entire fact table into the window sort. The ordering
# carries o_orderkey as the unique tiebreaker so top-3 is total-order
# deterministic (repo determinism convention).

TOPK_PER_GROUP = 3


@register(
    "w_topk_per_group_limit",
    oracle=f"""
SELECT o_orderpriority, o_orderkey, o_totalprice, rn
FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
) t
WHERE rn <= {TOPK_PER_GROUP}
""",
    doc="top-3 orders by totalprice per priority class via the rank-filter "
    "idiom Spark compiles to partial+final WindowGroupLimit (map-side "
    "per-group pruning before the window shuffle)",
    tags=("W1", "window", "topk"),
)
def w_topk_per_group_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK_PER_GROUP)
    )


# --- engine-native session windows ----------------------------------------------------
# The same sessionization expressed through Spark's built-in
# ``session_window`` aggregate (the construct the streaming path uses for
# watermarked session aggs) — verified against the INDEPENDENT lag+running-
# sum construction in the oracle. Semantics pinned precisely: session_window
# is end-exclusive, so a gap of EXACTLY the 30-minute threshold starts a new
# session (>=, where w_sessionize_events' lag formulation uses >), and every
# emitted session_end_ext is last-event + gap. One shuffle on the grouping
# key, same as the window formulation.


@register(
    "w_session_window_native",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
                  OR LAG(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end_ext,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, session_id
""",
    doc="sessionization via the engine-native session_window aggregate, "
    "differentially checked against the independent lag+running-sum "
    "construction (gap >= threshold splits; end = last event + gap)",
    tags=("window", "sessionization", "native"),
)
def w_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end_ext"),
            "n_events",
        )
    )


# --- date-spine gap fill --------------------------------------------------------------
# The dbt_utils.date_spine pattern the reference's dbt stack would reach
# for: per-user daily activity densified onto a complete calendar between
# the user's first and last day (absent days are REAL zero rows, so
# downstream moving averages/retention math see gaps), plus the running
# cumulative count over the same partitioning. Spine generation is
# array-side (sequence + explode per user — no driver loop, no cross join
# against a global calendar), the fill is one left join on (user, day),
# and the cumulative rides the join's own hash partitioning.


@register(
    "events_date_spine_ffill",
    oracle="""
WITH per AS (
    SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
rng AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
    FROM events GROUP BY 1
),
spine AS (
    SELECT user_id,
           CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
    FROM rng
)
SELECT s.user_id, s.day,
       COALESCE(p.n, 0) AS n_events,
       CAST(SUM(COALESCE(p.n, 0)) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events
FROM spine s LEFT JOIN per p ON p.user_id = s.user_id AND p.day = s.day
""",
    doc="per-user daily activity densified onto a complete date spine "
    "(sequence+explode, array-side) with zero-filled gap days and a "
    "running cumulative count — the dbt date_spine pattern, one join + "
    "one window on the same key",
    tags=("window", "spine", "gap-fill"),
)
def events_date_spine_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    per = e.groupBy("user_id", "day").agg(F.count("*").alias("n"))
    rng = e.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = rng.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    filled = spine.join(per, ["user_id", "day"], "left").select(
        "user_id", "day", F.coalesce("n", F.lit(0)).alias("n_events")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.withColumn("cum_events", F.sum("n_events").over(w))


# --- last-touch attribution -----------------------------------------------------------
# The marketing-analytics op none of the sequence queries cover: every
# purchase is credited to the user's most recent PRIOR touch (click/view),
# then credit aggregates per touch type. This is a stream-to-ITSELF as-of:
# one carry-forward window over the event stream ordered by
# (ts, touch-before-purchase, event_id) — same-instant touches credit the
# purchase (at-or-before), the unique event_id keeps the carry total-order
# deterministic. One shuffle on user_id; no self-join of the event table.


@register(
    "events_last_touch_attribution",
    oracle="""
WITH tagged AS (
    SELECT user_id, ts, event_id, event_type, value,
           CASE WHEN event_type IN ('click', 'view') THEN event_type END
               AS touch_type,
           CASE WHEN event_type IN ('click', 'view') THEN 0 ELSE 1 END AS side
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
),
carried AS (
    SELECT user_id, ts, event_id, event_type, value,
           last_value(touch_type IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS credited_touch
    FROM tagged
)
SELECT COALESCE(credited_touch, 'untouched') AS credited_touch,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS attributed_value
FROM carried
WHERE event_type = 'purchase'
GROUP BY 1
""",
    doc="last-touch attribution: each purchase credited to the user's most "
    "recent prior click/view via ONE carry-forward window over the event "
    "stream itself (no self-join), credit totals per touch type with "
    "decimal-exact value sums; purchases with no prior touch bucket as "
    "'untouched'",
    tags=("window", "attribution", "sessionization"),
)
def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    tagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(
            F.col("event_type").isin("click", "view"), F.col("event_type")
        ).alias("touch_type"),
        F.when(F.col("event_type").isin("click", "view"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "credited_touch", F.last("touch_type", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("credited_touch", F.lit("untouched")).alias("credited_touch")
        )
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(27,6)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


# --- linear interpolation over the date spine ----------------------------------------
# The gap-fill twin of the forward-fill spine: absent days get LINEARLY
# interpolated values between the surrounding present days (sensor/
# metrics series where zero-fill is wrong and step-fill biases trends).
# The series is deliberately SPARSE — daily totals of high-value
# purchases per user-hash bucket — because the raw stream has an event
# every few minutes and a dense series would never exercise the
# interpolation branch (at sf0.01 over 100 of ~150 spine rows are real
# gaps). Same array-side spine; prev/next anchors come from two mirrored
# carry windows over the SAME bucket partitioning (one shuffle total);
# the interpolation is pure arithmetic on identical inputs in both
# engines (DSUM daily values, integer day distances, one IEEE
# multiply-add per gap row). Spine bounds are the series' own min/max
# days, so every gap has both anchors — no extrapolation branch.

INTERP_VALUE_MIN = 200
INTERP_BUCKETS = 8


@register(
    "events_spine_linear_interp",
    oracle=f"""
WITH daily AS (
    SELECT user_id % {INTERP_BUCKETS} AS bucket, CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS v
    FROM events
    WHERE event_type = 'purchase' AND value > {INTERP_VALUE_MIN}
    GROUP BY 1, 2
),
rng AS (
    SELECT bucket, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
),
spine AS (
    SELECT bucket,
           CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
    FROM rng
),
j AS (
    SELECT s.bucket, s.day, d.v
    FROM spine s LEFT JOIN daily d
      ON d.bucket = s.bucket AND d.day = s.day
),
anchored AS (
    SELECT bucket, day, v,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY bucket ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
           last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY bucket ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
           first_value(v IGNORE NULLS) OVER (
               PARTITION BY bucket ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
           first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY bucket ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
    FROM j
)
SELECT bucket, day,
       CASE WHEN v IS NOT NULL THEN v
            ELSE prev_v + (next_v - prev_v)
                 * date_diff('day', prev_d, day)
                 / date_diff('day', prev_d, next_d) END AS value_filled,
       CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_interpolated
FROM anchored
""",
    doc="linear interpolation over a sparse per-bucket date spine: mirrored "
    "ignore-nulls carry windows supply both anchors on one shuffle; "
    "gap rows get prev + slope*distance, present rows pass through",
    tags=("window", "spine", "interpolation"),
)
def events_spine_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase")
        & (F.col("value") > INTERP_VALUE_MIN)
    ).select(
        (F.col("user_id") % INTERP_BUCKETS).alias("bucket"),
        F.to_date("ts").alias("day"),
        "value",
    )
    daily = e.groupBy("bucket", "day").agg(
        F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("v")
    )
    # spine derives from daily (via rng) and joins back onto daily:
    # persist + materialize first (CLAUDE.md) so the filtered events
    # aggregate runs once
    daily = daily.persist()
    daily.count()
    rng = daily.groupBy("bucket").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = rng.select(
        "bucket", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    j = spine.join(daily, ["bucket", "day"], "left")
    w_prev = (
        Window.partitionBy("bucket")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("bucket")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    present_day = F.when(F.col("v").isNotNull(), F.col("day"))
    anchored = j.select(
        "bucket",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(present_day, ignorenulls=True).over(w_prev).alias("prev_d"),
        F.first("v", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(present_day, ignorenulls=True).over(w_next).alias("next_d"),
    )
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * F.datediff(
        F.col("day"), F.col("prev_d")
    ) / F.datediff(F.col("next_d"), F.col("prev_d"))
    out = anchored.select(
        "bucket",
        "day",
        F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp).alias(
            "value_filled"
        ),
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("is_interpolated"),
    )
    out = out.persist()
    out.count()
    daily.unpersist()
    return out


# --- NTH_VALUE / LAST_VALUE with explicit frames ------------------------------------
# The remaining window-navigation vocabulary: LAST_VALUE and NTH_VALUE are
# frame-sensitive (the SQL default frame stops at CURRENT ROW, silently
# turning LAST_VALUE into "current value") — both here use the explicit
# full-partition frame, plus a centered ROWS frame moving average.
# Partitioned by user_id: parallel across users at any scale, never a
# global sort. The (ts, event_id) order is total, and the moving average
# is decimal-accumulated before the one double division.


@register(
    "w_first_last_nth",
    oracle="""
SELECT event_id, user_id, ts,
       FIRST_VALUE(value) OVER wfull AS first_v,
       LAST_VALUE(value)  OVER wfull AS last_v,
       NTH_VALUE(value, 3) OVER wfull AS third_v,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER wc AS DOUBLE)
            / COUNT(*) OVER wc AS DOUBLE) AS centered_avg
FROM events
WINDOW
  wfull AS (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
  wc    AS (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
""",
    doc="FIRST/LAST/NTH_VALUE over the explicit full-partition frame plus a "
    "centered 3-row moving average (decimal-accumulated): the "
    "frame-sensitive navigation vocabulary, partitioned per user",
    tags=("window", "frame", "events"),
)
def w_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wfull = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-1, 1)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.first("value").over(wfull).alias("first_v"),
        F.last("value").over(wfull).alias("last_v"),
        F.nth_value("value", 3).over(wfull).alias("third_v"),
        (
            F.sum(F.col("value").cast("decimal(18,6)")).over(wc).cast("double")
            / F.count("*").over(wc)
        )
        .cast("double")
        .alias("centered_avg"),
    )
