"""Event-stream analytics: ordered funnel + weekly cohort retention.

The standard product-analytics shapes over an events table, expressed as
joins/aggregates (no per-user collect): the funnel is three cascaded
min-timestamp joins (each stage only sees users who completed the prior
stage *earlier in time*); retention is first-seen cohorting by truncated
week × activity week.

Scale notes: every stage is a groupBy(user) aggregate (combiner-friendly)
joined to the prior stage's 1-row-per-user frame; nothing is ordered
globally. Week arithmetic stays in exact integer seconds.
"""

from __future__ import annotations
from f1_lakehouse_spark.pinning import pin_small_result

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table


@register(
    "events_funnel_ordered",
    oracle="""
WITH s AS (
    SELECT user_id, MIN(ts) AS signup_ts
    FROM events WHERE event_type = 'signup' GROUP BY 1
), v AS (
    SELECT e.user_id, MIN(e.ts) AS view_ts
    FROM events e JOIN s ON s.user_id = e.user_id AND e.ts > s.signup_ts
    WHERE e.event_type = 'view' GROUP BY 1
), p AS (
    SELECT e.user_id, MIN(e.ts) AS purchase_ts
    FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.view_ts
    WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM s) AS n_signup,
       (SELECT COUNT(*) FROM v) AS n_signup_view,
       (SELECT COUNT(*) FROM p) AS n_signup_view_purchase
""",
    doc="ordered 3-step funnel (signup -> later view -> later purchase)",
    tags=("events", "funnel"),
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(v.agg(F.count("*").alias("n_signup_view")))
        .crossJoin(p.agg(F.count("*").alias("n_signup_view_purchase")))
    )


@register(
    "events_cohort_retention",
    oracle="""
WITH firsts AS (
    /* DuckDB date_trunc('week') yields DATE; cast to TIMESTAMP to match
       Spark's timestamp-typed truncation */
    SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
    FROM events GROUP BY 1
), activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
    FROM events
)
SELECT f.cohort_week,
       CAST((epoch_us(a.active_week) - epoch_us(f.cohort_week)) / 604800000000
            AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS active_users
FROM activity a JOIN firsts f ON a.user_id = f.user_id
GROUP BY 1, 2
""",
    doc="weekly cohort retention matrix (first-seen week x activity-week offset)",
    tags=("events", "cohort"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    # truncated weeks are whole microseconds; the division is exact
    offset = (
        (F.unix_micros("active_week") - F.unix_micros("cohort_week"))
        / F.lit(604_800_000_000)
    ).cast("long")
    return (
        activity.join(firsts, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# --- behavioral sequence analytics --------------------------------------------------
# MATCH_RECOGNIZE-style sequence work without a dedicated operator: (a) the
# Markov transition matrix of consecutive event types per user, (b) regex
# pattern detection over per-user path strings. Total order everywhere is
# (ts, event_id) — event_id is unique, so both engines sequence identically.
# Scale: one shuffle on user_id for the window/path build; the transition
# matrix is |types|² rows; path strings are bounded by events-per-user (use
# a slice cap upstream for power users at real scale).


@register(
    "events_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
pairs AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS t FROM pairs GROUP BY 1)
SELECT p.from_type, p.to_type, p.n, p.n / t.t AS p_transition
FROM pairs p JOIN tot t USING (from_type)
""",
    doc="per-user consecutive event-type transition matrix with "
    "probabilities (LEAD over total order)",
    tags=("events", "sequence"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    pairs = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("t"))
    return (
        pairs.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n") / F.col("t")).alias("p_transition"),
        )
    )


@register(
    "events_path_regex_conversion",
    oracle="""
WITH paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN regexp_matches(path, 'signup.*purchase')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM paths
""",
    doc="regex over ordered per-user event-path strings (signup->...->purchase)",
    tags=("events", "sequence", "regex"),
)
def events_path_regex_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ordered = F.transform(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ),
        lambda s: s["event_type"],
    )
    paths = e.groupBy("user_id").agg(
        F.array_join(ordered, ">").alias("path")
    )
    return paths.agg(
        F.count("*").alias("n_users"),
        F.sum(
            F.when(F.col("path").rlike("signup.*purchase"), 1).otherwise(0)
        ).alias("n_converted"),
    )


# --- anomaly scoring against fleet statistics ----------------------------------------
# The "score every row against population stats" shape: per-type mean/std
# derive from DECIMAL-exact moment sums (order-independent — the
# stats_moments recipe), the tiny per-type stats table BROADCASTS back over
# the stream, and each event gets a z-score + outlier flag map-side. At
# 100 TB: one map-side-combined aggregate over the fact + one broadcast
# join — the fact table never shuffles.

Z_THRESH = 2.5


@register(
    "events_anomaly_zscore",
    oracle=f"""
WITH m AS (
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,9))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(value * value AS DECIMAL(28,9))) AS DOUBLE) AS s2
    FROM events GROUP BY 1
),
stats AS (
    SELECT event_type,
           s1 / n AS mean_v,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std_v
    FROM m
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - s.mean_v) / s.std_v AS zscore,
       CASE WHEN abs((e.value - s.mean_v) / s.std_v) > {Z_THRESH}
            THEN 1 ELSE 0 END AS is_anomaly
FROM events e JOIN stats s USING (event_type)
""",
    doc=f"per-type z-score anomaly flags (|z| > {Z_THRESH}): decimal-exact "
    "moment sums -> broadcast stats join -> map-side scoring; the event "
    "stream never shuffles",
    tags=("events", "stats", "anomaly"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    m = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v.cast("decimal(28,9)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(28,9)")).cast("double").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    stats = m.select(
        "event_type",
        (s1 / n).alias("mean_v"),
        F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("std_v"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.col("std_v")
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            z.alias("zscore"),
            F.when(F.abs(z) > Z_THRESH, 1).otherwise(0).alias("is_anomaly"),
        )
    )


@register(
    "events_dedup_adjacent",
    oracle="""
WITH lagged AS (
    SELECT event_id, user_id, event_type, ts,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
)
SELECT event_id, user_id, event_type, ts
FROM lagged
WHERE prev_type IS NULL OR prev_type <> event_type
""",
    doc="adjacent-duplicate suppression: drop events repeating the "
    "previous event_type per user (the debounce/stream-cleaning "
    "primitive) — one user_id shuffle, LAG over a total order "
    "(ts, event_id), map-side filter",
    tags=("events", "dedup"),
)
def events_dedup_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    lagged = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return lagged.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("event_id", "user_id", "event_type", "ts")


# --- gaps and islands ---------------------------------------------------------------
# The classic difference-of-row_numbers trick: a user's consecutive-DAY
# activity runs collapse to one group key (day - dense day-rank), no
# iterative logic and no self-join. Complements sessionization: sessions
# split on a TIME GAP threshold inside a day-scale stream; islands are
# calendar-granular streak analytics (DAU streaks, retention runs).
# Scale: distinct day per user (one shuffle), one window over (user, day)
# partitions bounded by days-per-user, final per-island aggregate — no
# operator wider than a user's activity span.


@register(
    "events_gaps_islands",
    oracle="""
WITH days AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
    FROM events
),
ranked AS (
    SELECT user_id, d,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
    FROM days
),
islands AS (
    SELECT user_id, d, d - CAST(rn AS INTEGER) AS grp FROM ranked
)
SELECT user_id,
       MIN(d) AS streak_start,
       MAX(d) AS streak_end,
       COUNT(*) AS streak_days
FROM islands
GROUP BY user_id, grp
""",
    doc="gaps-and-islands: per-user consecutive-day activity streaks via "
    "the difference-of-row_numbers group key — no self-join, no iteration",
    tags=("events", "windows", "islands"),
)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id",
        "d",
        F.date_sub("d", F.row_number().over(w)).alias("grp"),
    )
    return islands.groupBy("user_id", "grp").agg(
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
        F.count("*").alias("streak_days"),
    ).drop("grp")


# --- rolling 7-day distinct users ---------------------------------------------------
# Rolling MAU/WAU-style distinct counts: for every active day, the number
# of distinct users seen in the trailing 7 days. DISTINCT does not
# partial-aggregate across sliding windows, so the scale-correct exact
# shape is the covering-window fan-out: dedup to (user, day) FIRST (the
# fact stream collapses to at most users x days rows), then each (user,
# day) row contributes to the <=7 window-end days it covers — a bounded
# map-only explode — and one (window_day) aggregate counts distinct users.
# Fan-out is bounded by the window/granularity ratio (7), independent of
# corpus size; the approximate twin at larger ratios is day-level HLL
# sketches merged across the window (hll_mergeable_distinct shows the
# sketch algebra).

ROLL_DAYS = 7


@register(
    "events_rolling_distinct_users",
    oracle=f"""
WITH ud AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
    FROM events
),
bounds AS (SELECT MAX(d) AS max_d FROM ud),
fan AS (
    SELECT ud.user_id, CAST(ud.d + CAST(t.i AS INTEGER) AS DATE) AS w
    FROM ud, range(0, {ROLL_DAYS}) t(i), bounds b
    WHERE ud.d + CAST(t.i AS INTEGER) <= b.max_d
)
SELECT w AS window_day, COUNT(DISTINCT user_id) AS rolling_users
FROM fan GROUP BY 1
""",
    doc=f"rolling {ROLL_DAYS}-day distinct users per day via covering-window "
    "fan-out: (user, day) dedup first, bounded x7 map-only explode, one "
    "window-day aggregate — the exact shape for sliding DISTINCT, which "
    "never partial-aggregates",
    tags=("events", "windows", "distinct"),
)
def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    # bounds and fan both derive from ud: persist + materialize before the
    # join (CLAUDE.md) so the events scan + dedup shuffle run once
    ud = ud.persist()
    ud.count()
    bounds = ud.agg(F.max("d").alias("max_d"))
    fan = (
        ud.select(
            "user_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(ROLL_DAYS - 1)),
                    lambda i: F.date_add(F.col("d"), i),
                )
            ).alias("w"),
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("w") <= F.col("max_d"))
    )
    out = fan.groupBy(F.col("w").alias("window_day")).agg(
        F.count_distinct("user_id").alias("rolling_users")
    )
    out = out.persist()
    out.count()
    ud.unpersist()
    return out


# --- A/B experiment lift ------------------------------------------------------------
# Experimentation analytics: users hash-assigned to two variants (salted
# md5 — independent of every other hash decision, reproducible across
# engines/runs, the same property the curation splits rely on), conversion
# = the user produced a HIGH-VALUE purchase (value > AB_CONV_VALUE — in
# this synthetic stream every user purchases eventually, so the raw
# purchase flag is degenerate at 100%), lift = rate_b - rate_a. All counts
# exact integers; the rates and lift are single IEEE divisions/subtractions
# of identical inputs in both engines. Scale: one (user) dedup shuffle +
# one map-side-combined global aggregate — the event stream never joins.


AB_CONV_VALUE = 150  # ~p95 of purchase values: non-degenerate conversion rates


from f1_lakehouse_spark.pipeline.hashing import sql_salted_hash  # noqa: E402


@register(
    "events_ab_test_lift",
    oracle=f"""
WITH users AS (
    SELECT user_id,
           {sql_salted_hash("user_id", ":ab")} % 2 AS variant,
           MAX(CASE WHEN event_type = 'purchase' AND value > {AB_CONV_VALUE}
               THEN 1 ELSE 0 END) AS converted
    FROM events GROUP BY 1
)
SELECT
    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
    CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b,
    CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS DOUBLE)
        / SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS rate_a,
    CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS DOUBLE)
        / SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS rate_b,
    CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS DOUBLE)
        / SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
    - CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS DOUBLE)
        / SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS abs_lift
FROM users
""",
    doc="A/B lift: salted-hash variant assignment per user, purchase "
    "conversion, absolute lift — exact counts, one user dedup + one "
    "global aggregate, no joins",
    tags=("events", "experiment", "ab"),
)
def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_lakehouse_spark.pipeline.hashing import spark_salted_hash

    e = load_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > AB_CONV_VALUE),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (spark_salted_hash("user_id", ":ab") % 2).alias("variant"),
        "converted",
    )
    agg = users.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    return agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        (rate_b - rate_a).alias("abs_lift"),
    )


# --- CUSUM changepoint detection ----------------------------------------------------
# Drift detection over the daily event-count series: the classic CUSUM
# statistic max_k |sum_{i<=k}(c_i - mean)| locates the day the rate
# shifted. Made INTEGER-EXACT by scaling out the mean division:
# n*S_k - k*T (S_k = running count sum, T = total, n = #days) equals
# n * sum_{i<=k}(c_i - T/n) — all int64, no float accumulation anywhere,
# so both engines agree bit-for-bit. One shuffle on event_type; window
# partitions bounded by days-per-type; argmax via a total-order
# ROW_NUMBER (stat DESC, day ASC).


@register(
    "events_cusum_changepoint",
    oracle="""
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
           COUNT(*) AS c
    FROM events GROUP BY 1, 2
),
tot AS (
    SELECT event_type, CAST(SUM(c) AS BIGINT) AS t, COUNT(*) AS n
    FROM daily GROUP BY 1
),
cum AS (
    SELECT daily.event_type, d,
           CAST(SUM(c) OVER (PARTITION BY daily.event_type ORDER BY d)
                AS BIGINT) AS s,
           CAST(ROW_NUMBER() OVER (PARTITION BY daily.event_type ORDER BY d)
                AS BIGINT) AS k
    FROM daily
),
stat AS (
    SELECT cum.event_type, d, abs(tot.n * cum.s - cum.k * tot.t) AS cusum
    FROM cum JOIN tot ON tot.event_type = cum.event_type
)
SELECT event_type, d AS change_day, cusum FROM (
    SELECT event_type, d, cusum,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY cusum DESC, d) AS rk
    FROM stat
) WHERE rk = 1
""",
    doc="integer-exact CUSUM changepoint per event_type: argmax_k of "
    "|n*S_k - k*T| over the daily count series — scaled-out mean, zero "
    "float accumulation, one event_type shuffle",
    tags=("events", "stats", "changepoint"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.count("*").alias("c"))
    daily = daily.persist()
    daily.count()
    tot = daily.groupBy("event_type").agg(
        F.sum("c").alias("t"), F.count("*").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    cum = daily.select(
        "event_type",
        "d",
        F.sum("c").over(w).alias("s"),
        F.row_number().over(w).cast("long").alias("k"),
    )
    stat = cum.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "d",
        F.abs(F.col("n") * F.col("s") - F.col("k") * F.col("t")).alias("cusum"),
    )
    rk = Window.partitionBy("event_type").orderBy(F.col("cusum").desc(), "d")
    out = (
        stat.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("d").alias("change_day"), "cusum")
    )
    out = out.persist()
    out.count()
    daily.unpersist()
    return out


# --- time-bounded funnel ------------------------------------------------------------
# The ordered funnel with a conversion-window constraint: each later step
# must land within 48 h of the prior step — the form product analytics
# actually runs ("viewed within 2 days of signing up"). Same two
# hash-join + aggregate stages as events_funnel_ordered; the gap guard is
# an integer epoch-microsecond compare pushed into the join filter.

FUNNEL_WINDOW_US = 172_800_000_000  # 48 h


@register(
    "events_funnel_time_bound",
    oracle=f"""
WITH s AS (
    SELECT user_id, MIN(ts) AS signup_ts
    FROM events WHERE event_type = 'signup' GROUP BY 1
), v AS (
    SELECT e.user_id, MIN(e.ts) AS view_ts
    FROM events e JOIN s ON s.user_id = e.user_id
        AND e.ts > s.signup_ts
        AND epoch_us(e.ts) - epoch_us(s.signup_ts) <= {FUNNEL_WINDOW_US}
    WHERE e.event_type = 'view' GROUP BY 1
), p AS (
    SELECT e.user_id, MIN(e.ts) AS purchase_ts
    FROM events e JOIN v ON v.user_id = e.user_id
        AND e.ts > v.view_ts
        AND epoch_us(e.ts) - epoch_us(v.view_ts) <= {FUNNEL_WINDOW_US}
    WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM s) AS n_signup,
       (SELECT COUNT(*) FROM v) AS n_view_48h,
       (SELECT COUNT(*) FROM p) AS n_purchase_48h
""",
    doc="ordered 3-step funnel with a 48 h per-step conversion window "
    "(integer epoch-microsecond gap guard in the join filter)",
    tags=("events", "funnel"),
)
def events_funnel_time_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def within(ts_col: str, base_col: str):
        return (F.col(ts_col) > F.col(base_col)) & (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col(base_col))
            <= FUNNEL_WINDOW_US
        )

    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(within("ts", "signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(within("ts", "view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(v.agg(F.count("*").alias("n_view_48h")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_48h")))
    )


# --- top event-type trigram paths ---------------------------------------------------
# "What do users actually do?" — the most frequent 3-step event-type
# sequences across the stream. Per-user LEAD windows (parallel across
# users), then one count aggregate and TakeOrdered top-k with the path
# string itself as the total-order tiebreaker.

PATHS_TOP = 5


@register(
    "events_trigram_paths",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
FROM seq WHERE e3 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT {PATHS_TOP}
""",
    doc=f"top-{PATHS_TOP} 3-step event-type paths: per-user LEAD windows + "
    "one map-side-combined count + TakeOrdered (path tiebreak)",
    tags=("events", "paths"),
)
def events_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(PATHS_TOP)
    )


# --- DAU/WAU stickiness -------------------------------------------------------------
# The engagement-health ratio: daily actives over 7-day rolling actives.
# Same covering-window fan-out as events_rolling_distinct_users (sliding
# DISTINCT never partial-aggregates, so dedup to (user, day) FIRST, then a
# bounded x7 map-only explode) — here both granularities aggregate from
# ONE persisted (user, day) frame, and the ratio is a single double
# division of exact counts.

STICKY_DAYS = 7


@register(
    "events_dau_wau_stickiness",
    oracle=f"""
WITH ud AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
    FROM events
),
bounds AS (SELECT MAX(d) AS max_d FROM ud),
dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY 1),
fan AS (
    SELECT ud.user_id, CAST(ud.d + CAST(t.i AS INTEGER) AS DATE) AS w
    FROM ud, range(0, {STICKY_DAYS}) t(i), bounds b
    WHERE ud.d + CAST(t.i AS INTEGER) <= b.max_d
),
wau AS (SELECT w, COUNT(DISTINCT user_id) AS wau FROM fan GROUP BY 1)
SELECT dau.d AS day, dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
FROM dau JOIN wau ON wau.w = dau.d
""",
    doc="DAU/WAU stickiness per day: one (user, day) dedup feeds both "
    "granularities; WAU via the bounded x7 covering-window fan-out; ratio "
    "is one double division of exact counts",
    tags=("events", "windows", "distinct"),
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    ud = ud.persist()
    ud.count()  # three derived uses: dau, fan, bounds (CLAUDE.md)
    bounds = ud.agg(F.max("d").alias("max_d"))
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    fan = (
        ud.select(
            "user_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(STICKY_DAYS - 1)),
                    lambda i: F.date_add(F.col("d"), i),
                )
            ).alias("w"),
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("w") <= F.col("max_d"))
    )
    wau = fan.groupBy("w").agg(F.count_distinct("user_id").alias("wau"))
    out = dau.join(wau, dau["d"] == wau["w"]).select(
        F.col("d").alias("day"),
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
    )
    out = out.persist()
    out.count()
    ud.unpersist()
    return out


# --- alert debounce (cooldown rate limiting) ----------------------------------------
# Ops-pipeline staple: collapse bursts of error events into one alert per
# burst — keep an error only if the user's previous error is more than
# DEBOUNCE_US away (or there is none). Session-gap semantics via one LAG
# window partitioned per user; the gap test is integer epoch-microseconds.
# NOTE this is the MARKED-first-of-burst form (lag > cooldown), i.e. gap
# sessionization — not a stateful "since last EMITTED" filter; for bursts
# shorter than the cooldown the two agree, and this form needs no
# iteration. One shuffle on user_id.

DEBOUNCE_US = 3_600_000_000  # 1 h cooldown


@register(
    "events_error_debounce",
    oracle=f"""
WITH errs AS (
  SELECT event_id, user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events WHERE event_type = 'error'
)
SELECT event_id, user_id, ts
FROM errs
WHERE prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > {DEBOUNCE_US}
""",
    doc="alert debounce: keep the first error of each >1 h-gap burst per "
    "user (LAG window + integer-microsecond gap test, one user_id shuffle)",
    tags=("events", "sessionize", "alerting"),
)
def events_error_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    errs = e.select(
        "event_id", "user_id", "ts", F.lag("ts").over(w).alias("prev_ts")
    )
    return errs.filter(
        F.col("prev_ts").isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts")) > DEBOUNCE_US)
    ).select("event_id", "user_id", "ts")


# --- bot / abuse heuristic ----------------------------------------------------------
# Training-data hygiene for behavioral streams: flag users whose activity
# is superhumanly dense or suspiciously regular. Features are exact
# integers (events, active minutes, min gap in µs); the density ratio is
# one double division. The flag thresholds are explicit constants — the
# point is the FEATURE computation shape (one user-keyed pass: aggregate +
# lag window share the same shuffle).

BOT_EPM = 2.0  # events per active minute considered superhuman here
BOT_MIN_GAP_US = 5_000_000  # any gap under 5 s is bot-like


@register(
    "events_bot_heuristic",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, ts,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id))
             AS gap_us
  FROM events
),
per_u AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         COUNT(DISTINCT date_trunc('minute', ts)) AS active_minutes,
         MIN(gap_us) AS min_gap_us
  FROM gaps GROUP BY 1
)
SELECT user_id, n_events, active_minutes,
       CAST(n_events AS DOUBLE) / active_minutes AS events_per_minute,
       CAST(min_gap_us AS BIGINT) AS min_gap_us,
       CASE WHEN CAST(n_events AS DOUBLE) / active_minutes > {BOT_EPM}
              OR min_gap_us < {BOT_MIN_GAP_US}
            THEN 1 ELSE 0 END AS bot_flag
FROM per_u
""",
    doc="bot/abuse heuristic per user: exact integer features (events, "
    "active minutes, min inter-event gap) from one user-keyed pass — "
    "the behavioral-data hygiene filter",
    tags=("events", "quality", "diagnostics"),
)
def events_bot_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        "ts",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    )
    per_u = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_distinct(F.date_trunc("minute", "ts")).alias("active_minutes"),
        F.min("gap_us").alias("min_gap_us"),
    )
    epm = F.col("n_events").cast("double") / F.col("active_minutes")
    return per_u.select(
        "user_id",
        "n_events",
        "active_minutes",
        epm.alias("events_per_minute"),
        F.col("min_gap_us").cast("long").alias("min_gap_us"),
        F.when(
            (epm > BOT_EPM) | (F.col("min_gap_us") < BOT_MIN_GAP_US), 1
        )
        .otherwise(0)
        .alias("bot_flag"),
    )


# --- CUPED variance-reduced lift --------------------------------------------------------
# The experimentation-platform upgrade to events_ab_test_lift: CUPED
# (Deng et al., controlled-experiment variance reduction) regresses the
# experiment-period metric on the PRE-period metric and removes the
# explained variance: theta = cov(x,y)/var(x) pooled across arms,
# adjusted arm mean = mean(y) - theta*(mean(x) - mean(x_all)). The
# pre/post boundary is the integer epoch-microsecond midpoint of the
# event window. Determinism: the per-user covariates stay DECIMAL end to
# end (rescaled to (18,6) so the cross product (37,12) fits), every
# cross-user moment is an exact decimal sum, and doubles appear only in
# the final 1-row select where IEEE arithmetic is engine-identical.
# (Squaring a DOUBLE and casting the product to DECIMAL is NOT
# engine-stable — Spark rounds the product's shortest decimal repr,
# DuckDB rounds the true binary expansion, and they disagree on edge
# values; measured on this exact op at sf0.001.)
# Shape at 100 TB: one broadcast of the 1-row bounds, one user-keyed
# aggregate (map-side combined), one global 1-row aggregate — the stream
# shuffles once.


@register(
    "events_cuped_adjusted_lift",
    oracle=f"""
WITH b AS (
    SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS cutoff FROM events
),
users AS (
    SELECT e.user_id,
           {sql_salted_hash("e.user_id", ":ab")} % 2 AS variant,
           CAST(SUM(CASE WHEN epoch_us(e.ts) <= b.cutoff
                         THEN CAST(e.value AS DECIMAL(28,9))
                         ELSE CAST(0 AS DECIMAL(28,9)) END) AS DECIMAL(19,6)) AS x,
           CAST(SUM(CASE WHEN epoch_us(e.ts) > b.cutoff
                         THEN CAST(e.value AS DECIMAL(28,9))
                         ELSE CAST(0 AS DECIMAL(28,9)) END) AS DECIMAL(19,6)) AS y
    FROM events e, b GROUP BY 1, 2
),
m AS (
    SELECT COUNT(*) AS n,
           CAST(round(SUM(x), 3) AS DOUBLE) AS sx,
           CAST(round(SUM(y), 3) AS DOUBLE) AS sy,
           CAST(round(SUM(x * x), 3) AS DOUBLE) AS sxx,
           CAST(round(SUM(x * y), 3) AS DOUBLE) AS sxy,
           CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(round(SUM(CASE WHEN variant = 0 THEN x
                         ELSE CAST(0 AS DECIMAL(19,6)) END), 3) AS DOUBLE) AS sx_a,
           CAST(round(SUM(CASE WHEN variant = 1 THEN x
                         ELSE CAST(0 AS DECIMAL(19,6)) END), 3) AS DOUBLE) AS sx_b,
           CAST(round(SUM(CASE WHEN variant = 0 THEN y
                         ELSE CAST(0 AS DECIMAL(19,6)) END), 3) AS DOUBLE) AS sy_a,
           CAST(round(SUM(CASE WHEN variant = 1 THEN y
                         ELSE CAST(0 AS DECIMAL(19,6)) END), 3) AS DOUBLE) AS sy_b
    FROM users
)
SELECT n_a, n_b,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
       sy_b / n_b - sy_a / n_a AS lift_raw,
       (sy_b / n_b - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                      * (sx_b / n_b - sx / n))
       - (sy_a / n_a - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                        * (sx_a / n_a - sx / n)) AS lift_cuped
FROM m
""",
    doc="CUPED variance-reduced A/B lift: pre-period covariate from the "
    "epoch-midpoint split, pooled theta from decimal-exact moments "
    "(covariates held in DECIMAL through the cross products), adjusted "
    "arm means — one user aggregate + one 1-row aggregate",
    tags=("events", "experiment", "ab"),
)
def events_cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_lakehouse_spark.pipeline.hashing import spark_salted_hash

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    bounds = e.agg(
        F.min(us).alias("minu"), F.max(us).alias("maxu")
    ).select(F.expr("(minu + maxu) div 2").alias("cutoff"))
    dec0 = F.lit(0).cast("decimal(28,9)")
    dec0_6 = F.lit(0).cast("decimal(16,6)")
    v = F.col("value")
    users = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(us <= F.col("cutoff"), v.cast("decimal(28,9)")).otherwise(dec0)
            )
            .cast("decimal(16,6)")
            .alias("x"),
            F.sum(
                F.when(us > F.col("cutoff"), v.cast("decimal(28,9)")).otherwise(dec0)
            )
            .cast("decimal(16,6)")
            .alias("y"),
        )
        .select(
            (spark_salted_hash("user_id", ":ab") % 2).alias("variant"), "x", "y"
        )
    )
    x, y = F.col("x"), F.col("y")
    is_a, is_b = F.col("variant") == 0, F.col("variant") == 1
    m = users.agg(
        F.count("*").alias("n"),
        F.sum(x).cast("decimal(38,3)").cast("double").alias("sx"),
        F.sum(y).cast("decimal(38,3)").cast("double").alias("sy"),
        F.sum(x * x).cast("decimal(38,3)").cast("double").alias("sxx"),
        F.sum(x * y).cast("decimal(38,3)").cast("double").alias("sxy"),
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(is_a, x).otherwise(dec0_6)).cast("decimal(38,3)").cast("double").alias("sx_a"),
        F.sum(F.when(is_b, x).otherwise(dec0_6)).cast("decimal(38,3)").cast("double").alias("sx_b"),
        F.sum(F.when(is_a, y).otherwise(dec0_6)).cast("decimal(38,3)").cast("double").alias("sy_a"),
        F.sum(F.when(is_b, y).otherwise(dec0_6)).cast("decimal(38,3)").cast("double").alias("sy_b"),
    )
    n = F.col("n")
    sx, sy, sxx, sxy = F.col("sx"), F.col("sy"), F.col("sxx"), F.col("sxy")
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    mean_y_a, mean_y_b = F.col("sy_a") / F.col("n_a"), F.col("sy_b") / F.col("n_b")
    mean_x_a, mean_x_b = F.col("sx_a") / F.col("n_a"), F.col("sx_b") / F.col("n_b")
    mean_x = sx / n
    adj_a = mean_y_a - theta * (mean_x_a - mean_x)
    adj_b = mean_y_b - theta * (mean_x_b - mean_x)
    return m.select(
        "n_a",
        "n_b",
        theta.alias("theta"),
        (mean_y_b - mean_y_a).alias("lift_raw"),
        (adj_b - adj_a).alias("lift_cuped"),
    )


# --- per-user EWMA anomaly score ----------------------------------------------------
# Exponentially weighted moving average over each user's ordered value
# stream — the classic online smoother / anomaly baseline. Distributed
# shape: ONE shuffle on user_id where a rank window caps each user to the
# last EWMA_CAP events (compiles to WindowGroupLimit, so a whale user
# contributes EWMA_CAP rows to the shuffle, not their history); the fold
# itself runs on a per-user array bounded by the cap. alpha = 1/4 is
# dyadic, and the fold is the identical left-fold in both engines
# (DuckDB's no-init list_reduce == Spark aggregate seeded with x1), so
# every output double is bit-exact — no rounding step.

EWMA_CAP = 64
_EWMA_ALPHA = "0.25"  # dyadic: 1/4

_EWMA_ORACLE = f"""
WITH capped AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE value IS NOT NULL
), packed AS (
  SELECT user_id,
         list(value ORDER BY ts, event_id) AS vals
  FROM capped WHERE rn <= {EWMA_CAP}
  GROUP BY user_id
), folded AS (
  SELECT user_id, vals,
         list_transform(range(1, len(vals) + 1),
            i -> list_reduce(list_slice(vals, 1, i),
                             (acc, v) -> acc + {_EWMA_ALPHA} * (v - acc))) AS ew
  FROM packed
)
SELECT user_id,
       CAST(len(vals) AS BIGINT) AS n_events,
       ew[len(vals)] AS last_ewma,
       CASE WHEN len(vals) < 2 THEN 0.0
            ELSE list_aggregate(
                   list_transform(range(2, len(vals) + 1),
                      i -> abs(vals[i] - ew[i - 1])), 'max')
       END AS max_abs_dev
FROM folded
"""


@register(
    "events_ewma_anomaly",
    oracle=_EWMA_ORACLE,
    doc=f"per-user EWMA (alpha=1/4, last {EWMA_CAP} events) + max absolute "
    "one-step deviation — the online-smoothing anomaly baseline as one "
    "WindowGroupLimit-capped shuffle plus bounded per-user folds, "
    "bit-exact cross-engine",
    tags=("events", "timeseries", "extension"),
)
def events_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _EWMA_ORACLE. At 100 TB the cap is the whale guard: the rank
    window prunes each user to EWMA_CAP rows BEFORE rows move (group-limit
    pushdown), and every post-shuffle array is cap-bounded."""
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    capped = (
        e.select("user_id", "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= EWMA_CAP)
    )
    packed = capped.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", F.col("value").alias("v")))
            ),
            lambda s: s["v"],
        ).alias("vals")
    )
    alpha = F.lit(0.25)
    folded = packed.select(
        "user_id",
        "vals",
        F.transform(
            F.sequence(F.lit(1), F.size("vals")),
            lambda i: F.aggregate(
                F.slice("vals", F.lit(2), i - F.lit(1)),
                F.element_at(F.col("vals"), 1),
                lambda acc, v: acc + alpha * (v - acc),
            ),
        ).alias("ew"),
    )
    return folded.select(
        "user_id",
        F.size("vals").cast("long").alias("n_events"),
        F.element_at(F.col("ew"), F.size("vals")).alias("last_ewma"),
        F.when(F.size("vals") < 2, F.lit(0.0))
        .otherwise(
            F.array_max(
                F.transform(
                    F.sequence(F.lit(2), F.size("vals")),
                    lambda i: F.abs(
                        F.element_at(F.col("vals"), i)
                        - F.element_at(F.col("ew"), i - F.lit(1))
                    ),
                )
            )
        )
        .alias("max_abs_dev"),
    )


# --- cohort LTV triangle ------------------------------------------------------------
# The subscription-analytics workhorse: customers cohorted by first-order
# month, revenue accumulated along cohort age — the "LTV triangle" whose
# diagonal is the calendar. Heavy work is two partial-aggregated shuffles
# (first order per customer — co-keyed with the join back — then the
# (cohort, age) cell aggregate); the cumulative runs in a window
# PARTITIONED BY cohort whose frames are calendar-bounded (<= ~85 ages),
# never a global window. Money stays DECIMAL(18,2) end-to-end (rounded
# once at the source, where both engines agree on positive HALF-UP), so
# the windowed cumsum is exact integer arithmetic and the final
# decimal->double cast is exact (unscaled cents < 2^53).

_LTV_ORACLE = """
WITH firsts AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_dt
  FROM orders GROUP BY o_custkey
), tagged AS (
  SELECT strftime(date_trunc('month', f.first_dt), '%Y-%m') AS cohort_month,
         (CAST(year(o.o_orderdate) AS BIGINT) * 12 + CAST(month(o.o_orderdate) AS BIGINT))
           - (CAST(year(f.first_dt) AS BIGINT) * 12 + CAST(month(f.first_dt) AS BIGINT)) AS age_months,
         CAST(round(o.o_totalprice, 2) AS DECIMAL(18,2)) AS rev,
         o.o_custkey
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
), cells AS (
  SELECT cohort_month, age_months,
         COUNT(*) AS n_orders,
         COUNT(DISTINCT o_custkey) AS n_active_customers,
         SUM(rev) AS rev_d
  FROM tagged GROUP BY cohort_month, age_months
)
SELECT cohort_month, age_months, n_orders, n_active_customers,
       CAST(rev_d AS DOUBLE) AS revenue,
       CAST(SUM(rev_d) OVER (PARTITION BY cohort_month ORDER BY age_months
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS cum_revenue
FROM cells
"""


@register(
    "orders_cohort_ltv",
    oracle=_LTV_ORACLE,
    doc="cohort LTV triangle: first-order-month cohorts x age-in-months "
    "with per-cell orders/actives/revenue and the cumulative LTV curve — "
    "decimal-exact money end-to-end, cohort-partitioned (calendar-bounded) "
    "cumulative window",
    tags=("events", "cohort", "extension"),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _LTV_ORACLE. At 100 TB: both shuffles key on o_custkey /
    (cohort, age); the window's partitions are cohorts (bounded by the
    calendar, so frames never exceed ~85 rows) — parallelism comes from
    cohort count x upstream cells, with no global ordering anywhere."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    firsts = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    mo = lambda c: F.year(c).cast("long") * 12 + F.month(c).cast("long")  # noqa: E731
    tagged = o.join(firsts, "o_custkey").select(
        F.date_format(F.date_trunc("month", F.col("first_dt")), "yyyy-MM").alias(
            "cohort_month"
        ),
        (mo(F.col("o_orderdate")) - mo(F.col("first_dt"))).alias("age_months"),
        F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)").alias("rev"),
        "o_custkey",
    )
    cells = tagged.groupBy("cohort_month", "age_months").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_active_customers"),
        F.sum("rev").alias("rev_d"),
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.select(
        "cohort_month",
        "age_months",
        "n_orders",
        "n_active_customers",
        F.col("rev_d").cast("double").alias("revenue"),
        F.sum("rev_d").over(w).cast("double").alias("cum_revenue"),
    )


# --- Viterbi HMM decode of user journeys --------------------------------------------
# Max-product dynamic programming as a distributed fold: each user's
# event-type sequence is decoded into hidden journey states
# (B)rowse / bu(Y) / (T)rouble under a literal integer-scored HMM.
# Everything is int64 arithmetic — scores are integer "millibit" log
# probabilities and the per-state best PATH is carried as a base-3
# integer (cap 39 events: 3^39 < 2^63), so the whole decode is exact in
# both engines. Fold state is a 6-long BIGINT LIST [v0,v1,v2,p0,p1,p2]
# per the documented DuckDB struct-accumulator trap; argmax ties break
# to the lowest state via the identical fixed comparison order. Shape:
# one WindowGroupLimit-capped shuffle on user_id, then cap-bounded folds.

VITERBI_CAP = 39  # 3^39 = 4.05e18 < 2^63-1: the path integer never overflows
_VIT_STATES = "BYT"
# event codes: 0=view 1=click 2=signup 3=purchase 4=error
_VIT_EMIT = (
    (30, 30, 10, 0, 0),   # Browse
    (10, 15, 5, 40, 0),   # buY
    (5, 5, 0, 0, 40),     # Trouble
)
_VIT_TRANS = (
    (20, 10, 5),
    (5, 20, 5),
    (5, 5, 20),
)
_VIT_INIT = (10, 0, 0)

_VIT_CODE_SQL = (
    "CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 "
    "WHEN 'signup' THEN 2 WHEN 'purchase' THEN 3 ELSE 4 END"
)


def _vit_emit_sql(s: int, code: str) -> str:
    e = _VIT_EMIT[s]
    return (
        f"(CASE {code} WHEN 0 THEN {e[0]} WHEN 1 THEN {e[1]} WHEN 2 THEN {e[2]} "
        f"WHEN 3 THEN {e[3]} ELSE {e[4]} END)"
    )


def _vit_step_sql() -> str:
    """The (acc, x) lambda: acc = [v0,v1,v2,p0,p1,p2], x = [code,0,...]."""
    outs = []
    for sp in range(3):
        c = [f"(acc[{s + 1}] + {_VIT_TRANS[s][sp]})" for s in range(3)]
        outs.append(
            f"greatest({c[0]}, {c[1]}, {c[2]}) + {_vit_emit_sql(sp, 'x[1]')}"
        )
    for sp in range(3):
        c = [f"(acc[{s + 1}] + {_VIT_TRANS[s][sp]})" for s in range(3)]
        pick = (
            f"(CASE WHEN {c[0]} >= {c[1]} AND {c[0]} >= {c[2]} THEN acc[4] "
            f"WHEN {c[1]} >= {c[2]} THEN acc[5] ELSE acc[6] END)"
        )
        outs.append(f"{pick} * 3 + {sp}")
    return "(acc, x) -> [" + ", ".join(outs) + "]"


_VIT_INIT_SQL = (
    "["
    + ", ".join(
        f"CAST({_VIT_INIT[s]} + {_vit_emit_sql(s, 'ca[1]')} AS BIGINT)"
        for s in range(3)
    )
    + ", CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)]"
)

_VIT_ORACLE = f"""
WITH capped AS (
  SELECT user_id, ts, event_id, {_VIT_CODE_SQL} AS code,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), packed AS (
  SELECT user_id, list(CAST(code AS BIGINT) ORDER BY ts, event_id) AS ca
  FROM capped WHERE rn <= {VITERBI_CAP}
  GROUP BY user_id
), folded AS (
  SELECT user_id, ca, len(ca) AS n,
         list_reduce(
           list_prepend({_VIT_INIT_SQL},
                        list_transform(list_slice(ca, 2, len(ca)),
                                       v -> [v, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                                             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)])),
           {_vit_step_sql()}) AS st
  FROM packed
), picked AS (
  SELECT user_id, n,
         greatest(st[1], st[2], st[3]) AS best_score,
         (CASE WHEN st[1] >= st[2] AND st[1] >= st[3] THEN st[4]
               WHEN st[2] >= st[3] THEN st[5] ELSE st[6] END) AS p,
         list_reduce(list_prepend(CAST(1 AS BIGINT), list_transform(range(1, n), i -> CAST(3 AS BIGINT))),
                     (a, b) -> a * b) AS ignore_full_pow,
         list_transform(range(1, n + 1),
            i -> list_reduce(list_prepend(CAST(1 AS BIGINT),
                                          list_transform(range(1, i), j -> CAST(3 AS BIGINT))),
                             (a, b) -> a * b)) AS pow3
  FROM folded
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       best_score,
       list_reduce(
         list_transform(range(1, n + 1),
            i -> substr('{_VIT_STATES}', CAST((p // pow3[n - i + 1]) % 3 AS INTEGER) + 1, 1)),
         (a, b) -> a || b) AS path
FROM picked
"""


@register(
    "events_viterbi_journeys",
    oracle=_VIT_ORACLE,
    doc="Viterbi decode of each user's event sequence under a literal "
    "integer-scored 3-state HMM (Browse/buY/Trouble) — max-product DP as "
    f"a cap-bounded list-state fold (first {VITERBI_CAP} events; base-3 "
    "path integers), exact int64 arithmetic cross-engine",
    tags=("events", "hmm", "dp", "extension"),
)
def events_viterbi_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _VIT_ORACLE; matrices are the shared module constants. At
    100 TB: the rank window caps each user partition-side (group-limit
    pushdown), the fold carries six int64s of state per user, and path
    decode is an O(cap^2) integer transform over a bounded array."""
    e = load_table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "view", 0)
        .when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "signup", 2)
        .when(F.col("event_type") == "purchase", 3)
        .otherwise(4)
        .cast("long")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (
        e.select("user_id", "ts", "event_id", code.alias("code"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= VITERBI_CAP)
    )
    packed = capped.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "code"))),
            lambda s: s["code"],
        ).alias("ca")
    )

    zero = F.lit(0).cast("long")

    def emit(sp, c):
        e_ = _VIT_EMIT[sp]
        return (
            F.when(c == 0, e_[0])
            .when(c == 1, e_[1])
            .when(c == 2, e_[2])
            .when(c == 3, e_[3])
            .otherwise(e_[4])
            .cast("long")
        )

    def vit_step(acc, x):
        c = F.element_at(x, 1)
        vs, ps = [], []
        for sp in range(3):
            cand = [
                F.element_at(acc, s + 1) + F.lit(_VIT_TRANS[s][sp]).cast("long")
                for s in range(3)
            ]
            vs.append(F.greatest(*cand) + emit(sp, c))
            ps.append(
                F.when(
                    (cand[0] >= cand[1]) & (cand[0] >= cand[2]),
                    F.element_at(acc, 4),
                )
                .when(cand[1] >= cand[2], F.element_at(acc, 5))
                .otherwise(F.element_at(acc, 6))
                * 3
                + F.lit(sp).cast("long")
            )
        return F.array(*vs, *ps)

    first = F.element_at(F.col("ca"), 1)
    init = F.array(
        *[
            (F.lit(_VIT_INIT[s]).cast("long") + emit(s, first))
            for s in range(3)
        ],
        zero,
        F.lit(1).cast("long"),
        F.lit(2).cast("long"),
    )
    folded = packed.select(
        "user_id",
        "ca",
        F.size("ca").alias("n"),
        F.aggregate(
            F.transform(
                F.slice("ca", F.lit(2), F.size("ca") - 1),
                lambda v: F.array(v, zero, zero, zero, zero, zero),
            ),
            init,
            vit_step,
        ).alias("st"),
    )
    st = F.col("st")
    best = F.greatest(
        F.element_at(st, 1), F.element_at(st, 2), F.element_at(st, 3)
    )
    p = (
        F.when(
            (F.element_at(st, 1) >= F.element_at(st, 2))
            & (F.element_at(st, 1) >= F.element_at(st, 3)),
            F.element_at(st, 4),
        )
        .when(F.element_at(st, 2) >= F.element_at(st, 3), F.element_at(st, 5))
        .otherwise(F.element_at(st, 6))
    )
    picked = folded.select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        best.alias("best_score"),
        p.alias("p"),
        # NOTE: F.sequence(1, 0) yields a DESCENDING [1, 0] in Spark (it
        # auto-steps -1), not an empty list — powers must come from slices
        # of a materialized constant array, where slice(_, 1, 0) is empty
        F.transform(
            F.sequence(F.lit(1), F.col("n")),
            lambda i: F.aggregate(
                F.slice(
                    F.array_repeat(F.lit(3).cast("long"), F.col("n")),
                    F.lit(1),
                    i - F.lit(1),
                ),
                F.lit(1).cast("long"),
                lambda a, b: a * b,
            ),
        ).alias("pow3"),
    )
    # the path integer reaches 3^39 > 2^53, so digit extraction MUST use
    # integer `div` (a double divide would round); Spark's Column API has
    # no floor-div, so the decode is one SQL expression — the same shape
    # as the oracle's
    path = F.expr(
        f"aggregate(transform(sequence(1, cast(n_events AS INT)), "
        f"i -> substr('{_VIT_STATES}', "
        f"cast((p div element_at(pow3, cast(n_events - i + 1 AS INT))) % 3 AS INT) + 1, 1)), "
        f"'', (a, b) -> concat(a, b))"
    )
    return picked.select("user_id", "n_events", "best_score", path.alias("path"))


# --- Shapley-value marketing attribution --------------------------------------------
# Game-theoretic credit assignment for conversions: each converting
# user's pre-purchase touch SET (subset of view/click/signup/error) is a
# coalition; each channel is credited its exact Shapley value under a
# literal independent-probability worth function v(S) = 1 - prod(1-p_c).
# With 4 channels there are only 15 coalitions, so the entire Shapley
# computation happens ONCE at import time in exact rational arithmetic
# (fractions), scaled to integer PPM — the engines only ever do bitmask
# set-building (BIT_OR aggregate) and integer lookups/sums, so the result
# is exact cross-engine with no float in sight. Shape: one groupBy(user)
# shuffle with map-side partial BIT_OR; credits explode 4-way from the
# per-user frame and die into a 4-group aggregate.

_SHAP_CHANNELS = ("view", "click", "signup", "error")
_SHAP_P = {"view": (1, 5), "click": (2, 5), "signup": (1, 4), "error": (1, 20)}


def _shapley_table() -> dict[tuple[int, str], int]:
    """Exact Shapley PPM credit for every (coalition mask, channel)."""
    from fractions import Fraction as Fr
    from itertools import combinations
    from math import factorial

    p = {c: Fr(*_SHAP_P[c]) for c in _SHAP_CHANNELS}

    def v(s: frozenset) -> "Fr":
        out = Fr(1)
        for c in s:
            out *= 1 - p[c]
        return 1 - out

    table: dict[tuple[int, str], int] = {}
    for mask in range(1, 16):
        s = [c for i, c in enumerate(_SHAP_CHANNELS) if mask >> i & 1]
        k = len(s)
        for c in s:
            rest = [x for x in s if x != c]
            phi = Fr(0)
            for t in range(len(rest) + 1):
                for sub in combinations(rest, t):
                    w = Fr(factorial(t) * factorial(k - t - 1), factorial(k))
                    phi += w * (v(frozenset(sub) | {c}) - v(frozenset(sub)))
            table[(mask, c)] = int(round(phi * 1_000_000))
    return table


SHAPLEY_PPM = _shapley_table()


def _shap_case_sql(channel: str) -> str:
    whens = " ".join(
        f"WHEN {mask} THEN {ppm}"
        for (mask, c), ppm in sorted(SHAPLEY_PPM.items())
        if c == channel
    )
    return f"(CASE mask {whens} ELSE 0 END)"


_SHAP_BIT_SQL = (
    "CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 "
    "WHEN 'signup' THEN 4 WHEN 'error' THEN 8 ELSE 0 END"
)

_SHAP_ORACLE = f"""
WITH fp AS (
  SELECT user_id, MIN(ts) AS first_purchase
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), masks AS (
  SELECT e.user_id, CAST(bit_or({_SHAP_BIT_SQL}) AS BIGINT) AS mask
  FROM events e JOIN fp ON e.user_id = fp.user_id
  WHERE e.ts < fp.first_purchase AND e.event_type <> 'purchase'
  GROUP BY e.user_id
)
{" UNION ALL ".join(
    f'''SELECT '{c}' AS channel,
           COUNT(*) AS n_touched_users,
           CAST(SUM({_shap_case_sql(c)}) AS BIGINT) AS total_credit_ppm,
           CAST(CAST(SUM({_shap_case_sql(c)}) AS BIGINT) AS DOUBLE) / 1000000.0 AS conversions_attributed
    FROM masks WHERE (mask & {1 << i}) > 0'''
    for i, c in enumerate(_SHAP_CHANNELS)
)}
"""


@register(
    "events_shapley_attribution",
    oracle=_SHAP_ORACLE,
    doc="Shapley-value conversion attribution over pre-purchase touch "
    "sets: coalition worths and exact Shapley credits precomputed once in "
    "rational arithmetic (integer PPM), engines do only BIT_OR set "
    "building and integer sums — exact cross-engine",
    tags=("events", "attribution", "extension"),
)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _SHAP_ORACLE. At 100 TB: one partial-aggregated BIT_OR shuffle
    on user_id (the join with first-purchase times is co-keyed), a 4-way
    explode of the per-user masks, and a 4-group final aggregate."""
    e = load_table(spark, sf_dir, "events")
    bit = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "error", 8)
        .otherwise(0)
    )
    # first-purchase time via an UNORDERED full-partition window min: the
    # same user_id shuffle the mask aggregate needs anyway — one shuffle
    # total instead of groupBy + join back
    wu = Window.partitionBy("user_id")
    masks = (
        e.select("user_id", "ts", "event_type", bit.alias("b"))
        .withColumn(
            "first_purchase",
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).over(wu),
        )
        .filter(
            (F.col("ts") < F.col("first_purchase"))
            & (F.col("event_type") != "purchase")
        )
        .groupBy("user_id")
        .agg(F.bit_or(F.col("b")).cast("long").alias("mask"))
    )

    def credit(c: str):
        expr = F.when(F.lit(False), 0)
        for (mask, ch), ppm in sorted(SHAPLEY_PPM.items()):
            if ch == c:
                expr = expr.when(F.col("mask") == mask, ppm)
        return expr.otherwise(0).cast("long")

    fan = masks.select(
        "mask",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("channel"),
                        F.lit(1 << i).alias("bit"),
                        credit(c).alias("ppm"),
                    )
                    for i, c in enumerate(_SHAP_CHANNELS)
                ]
            )
        ).alias("t"),
    ).filter(F.col("mask").bitwiseAND(F.col("t.bit")) > 0)
    return fan.groupBy(F.col("t.channel").alias("channel")).agg(
        F.count("*").alias("n_touched_users"),
        F.sum("t.ppm").cast("long").alias("total_credit_ppm"),
        (
            F.sum("t.ppm").cast("long").cast("double") / F.lit(1000000.0)
        ).alias("conversions_attributed"),
    )


# --- absorbing-Markov conversion analysis -------------------------------------------
# The funnel question "starting from state i, what fraction of journeys
# END in purchase vs error vs silent exit?" answered exactly: B =
# (I-Q)^{-1} R over the user-journey Markov chain with transient states
# {view, click, signup} and absorbing {purchase, error, exit}. The
# inverse is computed by INTEGER adjugate/determinant over ppm-scaled
# transition counts — no iteration, no float until one final division —
# so the whole linear solve is exact cross-engine. ppm scaling bounds
# every intermediate below 2^63 at ANY corpus size (probabilities, not
# counts, enter the matrix). The det/adjugate/numerator expressions are
# ONE set of generated strings evaluated by both engines.

_MK_T = ("view", "click", "signup")            # transient
_MK_A = ("purchase", "error", "exit")          # absorbing


def _mk_det3(m) -> str:
    """det of [[m[0][0..2]],[m[1]],[m[2]]] given entry-name matrix."""
    return (
        f"{m[0][0]}*({m[1][1]}*{m[2][2]} - {m[1][2]}*{m[2][1]})"
        f" - {m[0][1]}*({m[1][0]}*{m[2][2]} - {m[1][2]}*{m[2][0]})"
        f" + {m[0][2]}*({m[1][0]}*{m[2][1]} - {m[1][1]}*{m[2][0]})"
    )


def _mk_adj3(m, i: int, j: int) -> str:
    """adj(M)[i][j] = cofactor C[j][i] (2x2 minor det with sign)."""
    rows = [r for r in range(3) if r != j]
    cols = [c for c in range(3) if c != i]
    a, b = rows
    c, d = cols
    det2 = f"({m[a][c]}*{m[b][d]} - {m[a][d]}*{m[b][c]})"
    return det2 if (i + j) % 2 == 0 else f"(-{det2})"


_MK_M = [[f"m{i}{j}" for j in range(3)] for i in range(3)]
_MK_DET_SQL = _mk_det3(_MK_M)
# numerator of B[i][a]: sum_k adj[i][k] * r_{k a}
_MK_NUM_SQL = {
    (i, a): " + ".join(
        f"{_mk_adj3(_MK_M, i, k)}*r{k}{a}" for k in range(3)
    )
    for i in range(3)
    for a in range(3)
}

_MK_PREFIX_SQL = f"""
WITH seq0 AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), seq AS (
  SELECT *, MIN(CASE WHEN event_type IN ('purchase', 'error') THEN rn END)
              OVER (PARTITION BY user_id) AS fa
  FROM seq0
), kept AS (
  SELECT user_id, event_type, ts, event_id FROM seq
  WHERE fa IS NULL OR rn <= fa
), pairs AS (
  SELECT event_type AS f,
         COALESCE(LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                  'exit') AS t
  FROM kept
), cnt AS (
  SELECT {", ".join(
      f"CAST(SUM(CASE WHEN f = '{ft}' AND t = '{tt}' THEN 1 ELSE 0 END) AS BIGINT) AS c{i}{j}"
      for i, ft in enumerate(_MK_T)
      for j, tt in enumerate((*_MK_T, *_MK_A))
  )}
  FROM pairs WHERE f IN ('view', 'click', 'signup')
), ppm AS (
  SELECT {", ".join(
      f"CASE WHEN ({' + '.join(f'c{i}{j}' for j in range(6))}) = 0 THEN CAST(0 AS BIGINT) "
      f"ELSE c{i}{j} * 1000000 // ({' + '.join(f'c{i}{j}' for j in range(6))}) END AS p{i}{j}"
      for i in range(3)
      for j in range(6)
  )}
  FROM cnt
), mat AS (
  SELECT {", ".join(
      f"CAST({'1000000 - ' if i == j else '0 - '}p{i}{j} AS BIGINT) AS m{i}{j}"
      for i in range(3)
      for j in range(3)
  )},
  {", ".join(f"p{i}{3 + a} AS r{i}{a}" for i in range(3) for a in range(3))}
  FROM ppm
)
"""

_MK_ORACLE = (
    _MK_PREFIX_SQL
    + "SELECT * FROM (\n"
    + " UNION ALL ".join(
        f"SELECT '{_MK_T[i]}' AS from_state, '{_MK_A[a]}' AS absorbing_state, "
        f"CAST({_MK_NUM_SQL[(i, a)]} AS BIGINT) AS num, "
        f"CAST({_MK_DET_SQL} AS BIGINT) AS det, "
        f"CAST(CAST({_MK_NUM_SQL[(i, a)]} AS BIGINT) AS DOUBLE) / CAST(CAST({_MK_DET_SQL} AS BIGINT) AS DOUBLE) AS absorb_prob "
        f"FROM mat"
        for i in range(3)
        for a in range(3)
    )
    + "\n)"
)


@register(
    "events_markov_absorption",
    oracle=_MK_ORACLE,
    doc="absorbing-Markov journey analysis: P(end in purchase/error/exit "
    "| start state) via B = (I-Q)^{-1} R, solved EXACTLY by integer "
    "adjugate/determinant over ppm-scaled transition probabilities — one "
    "generated expression set for both engines, one float division at "
    "the very end",
    tags=("events", "markov", "linear-algebra", "extension"),
)
def events_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _MK_ORACLE. At 100 TB: two windows sharing one user_id
    shuffle build the absorbed-prefix pairs; everything after is a
    single-row 18-column aggregate and literal-generated integer algebra
    (ppm scaling keeps every product below 2^63 at any corpus size)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wu = Window.partitionBy("user_id")
    seq = e.select("user_id", "event_type", "ts", "event_id").withColumn(
        "rn", F.row_number().over(w)
    )
    seq = seq.withColumn(
        "fa",
        F.min(
            F.when(F.col("event_type").isin("purchase", "error"), F.col("rn"))
        ).over(wu),
    )
    kept = seq.filter(F.col("fa").isNull() | (F.col("rn") <= F.col("fa")))
    pairs = kept.select(
        F.col("event_type").alias("f"),
        F.coalesce(F.lead("event_type").over(w), F.lit("exit")).alias("t"),
    ).filter(F.col("f").isin(*_MK_T))
    alltos = (*_MK_T, *_MK_A)
    cnt = pairs.agg(
        *[
            F.sum(
                F.when((F.col("f") == ft) & (F.col("t") == tt), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"c{i}{j}")
            for i, ft in enumerate(_MK_T)
            for j, tt in enumerate(alltos)
        ]
    )
    rowtot = lambda i: " + ".join(f"c{i}{j}" for j in range(6))  # noqa: E731
    ppm = cnt.select(
        *[
            F.expr(
                f"CASE WHEN ({rowtot(i)}) = 0 THEN CAST(0 AS BIGINT) "
                f"ELSE c{i}{j} * 1000000 div ({rowtot(i)}) END"
            ).alias(f"p{i}{j}")
            for i in range(3)
            for j in range(6)
        ]
    )
    mat = ppm.select(
        *[
            F.expr(
                f"CAST({'1000000 - ' if i == j else '0 - '}p{i}{j} AS BIGINT)"
            ).alias(f"m{i}{j}")
            for i in range(3)
            for j in range(3)
        ],
        *[F.col(f"p{i}{3 + a}").alias(f"r{i}{a}") for i in range(3) for a in range(3)],
    )
    arms = []
    for i in range(3):
        for a in range(3):
            arms.append(
                mat.select(
                    F.lit(_MK_T[i]).alias("from_state"),
                    F.lit(_MK_A[a]).alias("absorbing_state"),
                    F.expr(f"CAST({_MK_NUM_SQL[(i, a)]} AS BIGINT)").alias("num"),
                    F.expr(f"CAST({_MK_DET_SQL} AS BIGINT)").alias("det"),
                    F.expr(
                        f"CAST(CAST({_MK_NUM_SQL[(i, a)]} AS BIGINT) AS DOUBLE)"
                        f" / CAST(CAST({_MK_DET_SQL} AS BIGINT) AS DOUBLE)"
                    ).alias("absorb_prob"),
                )
            )
    out = arms[0]
    for fr in arms[1:]:
        out = out.unionByName(fr)
    return out


# --- multi-changepoint detection: binary segmentation --------------------------------
# events_cusum_changepoint finds ONE shift; real series have several.
# Binary segmentation (fixed depth 2 -> up to 3 changepoints) recursively
# re-runs the integer CUSUM argmax inside each split segment. Everything
# is exact int64 on a calendar-bounded packed array: the argmax is a
# [best_stat, best_k] BIGINT-list fold with strict-> comparison (smallest
# k wins ties), segment statistics derive from one prefix array, and
# depth is a fixed unroll — no data-dependent iteration. stat magnitudes:
# len * count-sums <= days^2 * total_events, far under 2^63 at any SF
# because the day count is calendar-bounded.

_BSEG_MIN_LEN = 4  # segments shorter than this produce no changepoint


def _bseg_sql_argmax(lo: str, hi: str) -> str:
    """DuckDB [best_stat, best_k] fold over k in [lo, hi-1]."""
    # pfx is 1-based with a prepended 0: pfx[i+1] = sum of first i
    stat = (
        f"abs(({hi} - {lo} + 1) * (pfx[k[1] + 1] - pfx[{lo}]) "
        f"- (k[1] - {lo} + 1) * (pfx[{hi} + 1] - pfx[{lo}]))"
    )
    return (
        f"list_reduce(list_prepend(CAST([-1, -1] AS BIGINT[]), "
        f"list_transform(range({lo}, {hi}), kk -> CAST([kk, 0] AS BIGINT[]))), "
        f"(acc, k) -> CASE WHEN {stat} > acc[1] THEN [{stat}, k[1]] ELSE acc END)"
    )


_BSEG_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), packed AS (
  SELECT list(struct_pack(d := d, c := c) ORDER BY d) AS arr FROM daily
), pre AS (
  SELECT arr, len(arr) AS n,
         list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, len(arr) + 1),
             i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(list_slice(arr, 1, i), s -> s.c)), (a, b) -> a + b)))
           AS pfx
  FROM packed
), l1 AS (
  SELECT arr, n, pfx, {_bseg_sql_argmax('1', 'n')} AS a1 FROM pre
), l2 AS (
  SELECT arr, n, pfx, a1,
         CASE WHEN a1[2] - 1 + 1 >= {_BSEG_MIN_LEN}
              THEN {_bseg_sql_argmax('1', 'a1[2]')} ELSE CAST([-1, -1] AS BIGINT[]) END AS a2a,
         CASE WHEN n - a1[2] >= {_BSEG_MIN_LEN}
              THEN {_bseg_sql_argmax('(a1[2] + 1)', 'n')} ELSE CAST([-1, -1] AS BIGINT[]) END AS a2b
  FROM l1
)
SELECT * FROM (
  SELECT 1 AS level, CAST(1 AS BIGINT) AS seg_lo, n AS seg_hi,
         a1[2] AS change_idx, arr[a1[2]].d AS change_day, a1[1] AS cusum_stat
  FROM l2
  UNION ALL
  SELECT 2, CAST(1 AS BIGINT), a1[2], a2a[2], arr[a2a[2]].d, a2a[1]
  FROM l2 WHERE a2a[2] > 0
  UNION ALL
  SELECT 2, a1[2] + 1, n, a2b[2], arr[a2b[2]].d, a2b[1]
  FROM l2 WHERE a2b[2] > 0
)
"""


@register(
    "events_binary_segmentation",
    oracle=_BSEG_ORACLE,
    doc="multi-changepoint detection by depth-2 binary segmentation of "
    "the daily event series: the integer CUSUM argmax re-run inside each "
    "split segment via [stat, k] BIGINT-list folds — exact int64 on a "
    "calendar-bounded array, up to 3 changepoints",
    tags=("events", "stats", "changepoint", "extension"),
)
def events_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    packed = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "c"))).alias("arr")
    )
    zero = F.lit(0).cast("long")
    pre = packed.select(
        "arr",
        F.size("arr").alias("n"),
        F.concat(
            F.array(zero),
            F.transform(
                F.sequence(F.lit(1), F.size("arr")),
                lambda i: F.aggregate(
                    F.transform(
                        F.slice("arr", F.lit(1), i), lambda s: s["c"]
                    ),
                    zero,
                    lambda a, b: a + b,
                ),
            ),
        ).alias("pfx"),
    )

    def argmax(lo, hi):
        def stat(k):
            return F.abs(
                (hi - lo + 1)
                * (
                    F.try_element_at(F.col("pfx"), (k + 1).cast("int"))
                    - F.try_element_at(F.col("pfx"), lo.cast("int"))
                )
                - (k - lo + 1)
                * (
                    F.try_element_at(F.col("pfx"), (hi + 1).cast("int"))
                    - F.try_element_at(F.col("pfx"), lo.cast("int"))
                )
            )

        return F.aggregate(
            F.transform(
                F.sequence(lo.cast("int"), (hi - 1).cast("int")),
                lambda kk: F.array(kk.cast("long"), zero),
            ),
            F.array(F.lit(-1).cast("long"), F.lit(-1).cast("long")),
            lambda acc, k: F.when(
                stat(F.element_at(k, 1)) > F.element_at(acc, 1),
                F.array(stat(F.element_at(k, 1)), F.element_at(k, 1)),
            ).otherwise(acc),
        )

    one = F.lit(1).cast("long")
    l1 = pre.select("arr", "n", "pfx", argmax(one, F.col("n").cast("long")).alias("a1"))
    k1 = F.element_at(F.col("a1"), 2)
    neg = F.array(F.lit(-1).cast("long"), F.lit(-1).cast("long"))
    l2 = l1.select(
        "arr",
        "n",
        "pfx",
        "a1",
        F.when(k1 >= _BSEG_MIN_LEN, argmax(one, k1)).otherwise(neg).alias("a2a"),
        F.when(
            F.col("n").cast("long") - k1 >= _BSEG_MIN_LEN,
            argmax(k1 + 1, F.col("n").cast("long")),
        )
        .otherwise(neg)
        .alias("a2b"),
    )
    l2 = l2.persist()
    l2.count()  # one-row frame, three arms below
    try:

        def arm(level, lo, hi, a):
            kk = F.element_at(F.col(a), 2)
            return l2.select(
                F.lit(level).alias("level"),
                lo.alias("seg_lo"),
                hi.alias("seg_hi"),
                kk.alias("change_idx"),
                F.try_element_at(F.col("arr"), kk.cast("int"))["d"].alias(
                    "change_day"
                ),
                F.element_at(F.col(a), 1).alias("cusum_stat"),
            ).where(kk > 0)

        out = (
            arm(1, one, F.col("n").cast("long"), "a1")
            .unionByName(arm(2, one, k1, "a2a"))
            .unionByName(arm(2, k1 + 1, F.col("n").cast("long"), "a2b"))
        )
        out = pin_small_result(out, 16)
    finally:
        l2.unpersist()
    return out


# --- sample-ratio-mismatch guard for the A/B assignment -----------------------------
# The first thing a trustworthy experimentation platform checks: do the
# observed variant counts match the intended 50/50 split? A significant
# chi-square here means the assignment or logging is broken and the lift
# readout is untrustworthy. Exact arithmetic: counts are integers, the
# expected cell is n/2.0 (exact halving in doubles), the chi-square is
# two IEEE terms, and the flag compares against the literal df=1
# critical value — engine-identical. Same one-aggregate shape as the
# lift query it guards.

_SRM_CRIT_95 = "3.841458820694124"  # chi2(df=1) 95% critical value

_SRM_ORACLE = f"""
WITH users AS (
    SELECT user_id, {sql_salted_hash("user_id", ":ab")} % 2 AS variant
    FROM events GROUP BY user_id, 2
), counts AS (
    SELECT
      CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
    FROM users
)
SELECT n_a, n_b,
       (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
         * (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
         / (CAST(n_a + n_b AS DOUBLE) / 2.0)
       + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
         * (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
         / (CAST(n_a + n_b AS DOUBLE) / 2.0) AS chi2,
       CASE WHEN
         (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
           * (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
           / (CAST(n_a + n_b AS DOUBLE) / 2.0)
         + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
           * (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
           / (CAST(n_a + n_b AS DOUBLE) / 2.0) > {_SRM_CRIT_95}
       THEN 1 ELSE 0 END AS srm_flag
FROM counts
"""


@register(
    "events_ab_srm_guard",
    oracle=_SRM_ORACLE,
    doc="sample-ratio-mismatch guard for the hash A/B assignment: exact "
    "variant counts, chi-square vs the intended 50/50 with the literal "
    "df=1 critical value — the trust gate in front of events_ab_test_lift",
    tags=("events", "experiment", "ab", "guard"),
)
def events_ab_srm_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_lakehouse_spark.pipeline.hashing import spark_salted_hash

    e = load_table(spark, sf_dir, "events")
    users = (
        e.select(
            "user_id", (spark_salted_hash("user_id", ":ab") % 2).alias("variant")
        )
        .groupBy("user_id", "variant")
        .agg(F.lit(1).alias("_one"))
    )
    counts = users.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    exp = (na + nb) / F.lit(2.0)
    chi2 = (na - exp) * (na - exp) / exp + (nb - exp) * (nb - exp) / exp
    return counts.select(
        "n_a",
        "n_b",
        chi2.alias("chi2"),
        F.when(chi2 > float(_SRM_CRIT_95), 1).otherwise(0).alias("srm_flag"),
    )


# --- U-shaped (position-based) attribution ----------------------------------------------
# Completes the attribution family (last-touch: windows.py; Shapley:
# above): 40/20/40 position-based credit over each converting user's
# pre-conversion touch sequence. Exact-by-construction: credit is INTEGER
# ppm with the largest-remainder rule (the curation_neyman_allocation
# discipline) — first and last touch get 400,000 ppm, the middle 200,000
# ppm splits evenly with the remainder going to the earliest middles — so
# every user's credits sum to exactly 1,000,000 and channel totals are
# BIGINT sums, deterministic at any parallelism.

_POS_ATTR_ORACLE = f"""
WITH conv AS (
  SELECT user_id, MIN(ts) AS conv_ts
  FROM events WHERE event_type = 'purchase' AND value > {AB_CONV_VALUE}
  GROUP BY user_id
), touches AS (
  SELECT e.user_id,
         list(struct_pack(et := e.event_type, ts := e.ts, eid := e.event_id)
              ORDER BY e.ts, e.event_id) AS tl
  FROM events e JOIN conv c ON e.user_id = c.user_id
  WHERE e.event_type IN ('click', 'view') AND e.ts < c.conv_ts
  GROUP BY e.user_id
), credited AS (
  SELECT user_id, len(tl) AS k,
         list_transform(range(1, len(tl) + 1),
           i -> struct_pack(
             ch := tl[i].et,
             ppm := CASE
               WHEN len(tl) = 1 THEN 1000000
               WHEN len(tl) = 2 THEN 500000
               WHEN i = 1 OR i = len(tl) THEN 400000
               ELSE 200000 // (len(tl) - 2)
                    + CASE WHEN i - 1 <= 200000 % (len(tl) - 2) THEN 1 ELSE 0 END
             END)) AS cr
  FROM touches
), exploded AS (
  SELECT user_id, u.ch AS channel, u.ppm AS ppm
  FROM credited, unnest(cr) AS t(u)
)
SELECT channel,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_credited,
       CAST(SUM(ppm) AS BIGINT) AS credit_ppm,
       CAST(SUM(ppm) AS DOUBLE)
         / (SELECT CAST(SUM(ppm) AS DOUBLE) FROM exploded) AS credit_share
FROM exploded GROUP BY channel
"""


@register(
    "events_position_attribution",
    oracle=_POS_ATTR_ORACLE,
    doc="U-shaped (40/20/40) position-based conversion attribution over "
    "each converting user's pre-conversion touch sequence — INTEGER ppm "
    "credits with the largest-remainder rule (each user sums to exactly "
    "1e6 ppm), so channel totals are exact BIGINT sums.",
    tags=("events", "attribution", "extension"),
)
def events_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one conversion aggregate + one touch collect per
    converting user (arrays bounded by per-user activity), one exploded
    channel aggregate with map-side combine."""
    e = load_table(spark, sf_dir, "events")
    conv = (
        e.where((F.col("event_type") == "purchase") & (F.col("value") > AB_CONV_VALUE))
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    touches = (
        e.where(F.col("event_type").isin("click", "view"))
        .join(conv, "user_id")
        .where(F.col("ts") < F.col("conv_ts"))
        .groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("ts"), F.col("event_id").alias("eid"), F.col("event_type").alias("et"))
                )
            ).alias("tl")
        )
    )
    credited = touches.select(
        "user_id",
        F.size("tl").alias("k"),
        F.transform(
            F.sequence(F.lit(1), F.size("tl")),
            lambda i: F.struct(
                F.element_at("tl", i.cast("int"))["et"].alias("ch"),
                F.when(F.size("tl") == 1, F.lit(1000000))
                .when(F.size("tl") == 2, F.lit(500000))
                .when((i == 1) | (i == F.size("tl")), F.lit(400000))
                .otherwise(
                    (F.lit(200000) / (F.size("tl") - 2)).cast("int")
                    + F.when(
                        i - 1 <= F.lit(200000) % (F.size("tl") - 2), F.lit(1)
                    ).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("ppm"),
            ),
        ).alias("cr"),
    )
    exploded = credited.select(
        "user_id", F.explode("cr").alias("u")
    ).select("user_id", F.col("u.ch").alias("channel"), F.col("u.ppm").alias("ppm"))
    tot = exploded.agg(F.sum("ppm").cast("double").alias("tot_ppm"))
    return (
        exploded.groupBy("channel")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users_credited"),
            F.sum("ppm").cast("long").alias("credit_ppm"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "n_users_credited",
            "credit_ppm",
            (F.col("credit_ppm").cast("double") / F.col("tot_ppm")).alias(
                "credit_share"
            ),
        )
    )


# --- difference-in-differences lift --------------------------------------------------------
# The pre/post × treated/control 2x2: period split at the exact calendar
# midpoint (integer MICROsecond midpoint — Spark's events ts is µs-
# truncated by the loader, so the oracle compares epoch_us), variant from
# the shared salted hash, cell means from decimal-exact value sums
# (scale-3 rounded before their only double casts). DiD = (post_t -
# pre_t) - (post_c - pre_c). One events scan + one 4-cell aggregate.


def _did_oracle() -> str:
    from f1_lakehouse_spark.pipeline.hashing import sql_salted_hash

    vh = sql_salted_hash("user_id", ":ab")
    return f"""
WITH rng AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events
), cells AS (
  SELECT {vh} % 2 AS variant,
         CASE WHEN epoch_us(e.ts) > r.mid THEN 1 ELSE 0 END AS post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(round(SUM(CAST(e.value AS DECIMAL(28,9))), 3) AS DOUBLE) AS s1
  FROM events e CROSS JOIN rng r WHERE e.value IS NOT NULL
  GROUP BY 1, 2
), wide AS (
  SELECT
    MAX(CASE WHEN variant = 1 AND post = 0 THEN s1 / CAST(n AS DOUBLE) END) AS pre_t,
    MAX(CASE WHEN variant = 1 AND post = 1 THEN s1 / CAST(n AS DOUBLE) END) AS post_t,
    MAX(CASE WHEN variant = 0 AND post = 0 THEN s1 / CAST(n AS DOUBLE) END) AS pre_c,
    MAX(CASE WHEN variant = 0 AND post = 1 THEN s1 / CAST(n AS DOUBLE) END) AS post_c,
    CAST(SUM(n) AS BIGINT) AS n_events
  FROM cells
)
SELECT n_events, pre_t, post_t, pre_c, post_c,
       (post_t - pre_t) - (post_c - pre_c) AS did_estimate
FROM wide
"""


@register(
    "events_did_lift",
    oracle=None,  # composed below
    doc="difference-in-differences: pre/post split at the exact integer-"
    "microsecond calendar midpoint (unix_micros / epoch_us in the oracle), "
    "treated/control from the shared salted "
    "hash, 2x2 cell means from decimal-exact sums; the causal-inference "
    "companion to events_cuped_adjusted_lift.",
    tags=("events", "experiment", "extension"),
)
def events_did_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One events scan + one 4-cell aggregate (the midpoint is a 1-row
    broadcast)."""
    from f1_lakehouse_spark.pipeline.hashing import spark_salted_hash

    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    us = F.unix_micros(F.col("ts"))
    rng = e.agg(
        F.expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").alias("mid")
    )
    cells = (
        e.crossJoin(F.broadcast(rng))
        .select(
            (spark_salted_hash("user_id", ":ab") % 2).alias("variant"),
            F.when(us > F.col("mid"), 1).otherwise(0).alias("post"),
            F.col("value").cast("decimal(28,9)").alias("v"),
        )
        .groupBy("variant", "post")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("v"), 3).cast("double").alias("s1"),
        )
    )
    mean = F.col("s1") / F.col("n").cast("double")
    pick = lambda var, po: F.max(  # noqa: E731
        F.when((F.col("variant") == var) & (F.col("post") == po), mean)
    )
    wide = cells.agg(
        pick(1, 0).alias("pre_t"),
        pick(1, 1).alias("post_t"),
        pick(0, 0).alias("pre_c"),
        pick(0, 1).alias("post_c"),
        F.sum("n").cast("long").alias("n_events"),
    )
    return wide.select(
        "n_events",
        "pre_t",
        "post_t",
        "pre_c",
        "post_c",
        (
            (F.col("post_t") - F.col("pre_t")) - (F.col("post_c") - F.col("pre_c"))
        ).alias("did_estimate"),
    )


from f1_lakehouse_spark.registry import REGISTRY as _REG_DID  # noqa: E402

_REG_DID["events_did_lift"].oracle = _did_oracle()
