"""Round-6 statistical operators: two-sample hypothesis testing, sketch
quantiles with an accuracy contract, robust outlier scoring, and matching
estimators — all exact cross-engine.

Shared discipline (round5_stats.py): distributed work is partial-aggregated
shuffles to model-sized or domain-bounded cell tables; global order
statistics go through ``extensions.global_prefix_sum`` (range repartition +
pid windows + driver prefix offsets — never a single-partition window);
sums are DECIMAL end-to-end with scale-0 rounding before the only double
casts (a scale-0 decimal→double is ONE int→double conversion, bit-identical
at any magnitude); the only transcendental is sqrt (IEEE correctly rounded,
hence engine-identical); every double expression tree is written with the
SAME structure in the Spark code and the DuckDB oracle.

Reference parity: the reference ships no statistics beyond AVG/MIN/MAX
(dbt gold models, /root/reference/transform — see BASELINE.md); these are
the experiment-readout and data-quality tests a lakehouse team runs
downstream, as first-class distributed operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.pinning import pin_small_result
from f1_lakehouse_spark.pipeline.hashing import (
    spark_md5_hash48,
    spark_salted_hash,
    sql_md5_hash48,
    sql_salted_hash,
)
from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table

# Exact integer cents for the double `value` column — the proven
# round→DECIMAL(18,2)→×100 idiom from round5_stats._MONTHLY_SQL.
_SQL_CENTS = "CAST(CAST(round(value, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _cents(col):
    return (F.round(col, 2).cast("decimal(18,2)") * 100).cast("long")


# --- two-sample Kolmogorov-Smirnov -----------------------------------------------------
# D = max_x |F_A(x) - F_B(x)| between the purchase-value distributions of
# two hash-split user cohorts. Made INTEGER-EXACT by clearing denominators:
# D = max |n_b*C_A(x) - n_a*C_B(x)| / (n_a*n_b), so the running statistic
# is one exact decimal prefix sum over per-distinct-value signed cells
# (cum of a linear combination = linear combination of cums) and the only
# float ops are the final two divisions and one sqrt — identical trees in
# both engines. Cell table is bounded by the VALUE DOMAIN (distinct cents),
# and the prefix sum is the distributed global_prefix_sum machinery, so
# nothing assumes the domain is small.

_KS_ORACLE = f"""
WITH per AS (
  SELECT {sql_salted_hash("user_id", ":ks")} % 2 AS g, {_SQL_CENTS} AS v
  FROM events WHERE event_type = 'purchase'
), cells AS (
  SELECT v,
         CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM per GROUP BY v
), tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM cells
), cum AS (
  SELECT CAST(SUM(CAST(t.nb AS DECIMAL(19,0)) * CAST(c.ca AS DECIMAL(19,0))
               - CAST(t.na AS DECIMAL(19,0)) * CAST(c.cb AS DECIMAL(19,0)))
              OVER (ORDER BY c.v) AS DECIMAL(38,0)) AS s
  FROM cells c CROSS JOIN tot t
), dnum AS (
  SELECT CAST(MAX(abs(s)) AS DECIMAL(38,0)) AS d_num FROM cum
)
SELECT t.na AS n_a, t.nb AS n_b,
       CAST(d.d_num AS DOUBLE)
         / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)) AS d_stat,
       (CAST(d.d_num AS DOUBLE)
         / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)))
         * sqrt(CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)
                / (CAST(t.na AS DOUBLE) + CAST(t.nb AS DOUBLE))) AS ks_z
FROM dnum d CROSS JOIN tot t
"""


@register(
    "events_ks_two_sample",
    oracle=_KS_ORACLE,
    doc="two-sample Kolmogorov-Smirnov D between hash-split cohorts' "
    "purchase-value distributions: denominators cleared so the running "
    "statistic is ONE exact decimal prefix sum over per-value signed "
    "cells (distributed global_prefix_sum, never a single-partition "
    "window); D and the KS z-score are the only float ops.",
    tags=("stats", "hypothesis-test", "prefix-sum", "extension"),
)
def events_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one (value-cents) cell aggregate with map-side combine, one
    range-repartitioned prefix pass over the cell table (domain-bounded,
    but correct at any cardinality), O(1)-row collects only."""
    from f1_lakehouse_spark.operators.extensions import global_prefix_sum

    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    per = e.select(
        (spark_salted_hash("user_id", ":ks") % 2).alias("g"),
        _cents(F.col("value")).alias("v"),
    )
    cells = per.groupBy("v").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long").alias("cb"),
    )
    tot = cells.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    ).collect()[0]
    na, nb = int(tot["na"]), int(tot["nb"])
    signed = cells.select(
        "v",
        (
            F.lit(nb).cast("decimal(19,0)") * F.col("ca").cast("decimal(19,0)")
            - F.lit(na).cast("decimal(19,0)") * F.col("cb").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("s"),
    )
    cum, release, _total = global_prefix_sum(spark, signed, "s", [F.col("v").asc()])
    d_num = cum.agg(F.max(F.abs(F.col("cum"))).cast("decimal(38,0)").alias("d"))
    na_d = F.lit(na).cast("double")
    nb_d = F.lit(nb).cast("double")
    d_stat = F.col("d").cast("double") / (na_d * nb_d)
    out = d_num.select(
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
        d_stat.alias("d_stat"),
        (d_stat * F.sqrt(na_d * nb_d / (na_d + nb_d))).alias("ks_z"),
    )
    out = pin_small_result(out, 16)
    release()
    return out


# --- Welch's t-test --------------------------------------------------------------------
# Unequal-variance t between the same two cohorts' purchase values. The
# six sufficient statistics (n, sum, sum-of-squares per arm) are exact
# DECIMAL(38,0) integers (cents; Spark squares DECIMAL(18,0) —
# 18+18+1=37 <= 38 so the product is exact; the oracle widens ITS
# operands to DECIMAL(19,0) so DuckDB squares in int128 — a plain
# BIGINT*BIGINT would error past ~3e9 cents, CLAUDE.md trap 4; DuckDB
# sums spill to HUGEINT and are cast back); every downstream double — means,
# sample variances, t, Welch-Satterthwaite df — is the SAME expression
# tree over those six numbers in both engines.

_WELCH_ORACLE = f"""
WITH per AS (
  SELECT {sql_salted_hash("user_id", ":ks")} % 2 AS g, {_SQL_CENTS} AS v
  FROM events WHERE event_type = 'purchase'
), s AS (
  SELECT
    CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN g = 0 THEN v ELSE 0 END) AS DECIMAL(38,0)) AS s_a,
    CAST(SUM(CASE WHEN g = 1 THEN v ELSE 0 END) AS DECIMAL(38,0)) AS s_b,
    CAST(SUM(CASE WHEN g = 0 THEN CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)) ELSE 0 END) AS DECIMAL(38,0)) AS q_a,
    CAST(SUM(CASE WHEN g = 1 THEN CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)) ELSE 0 END) AS DECIMAL(38,0)) AS q_b
  FROM per
)
SELECT n_a, n_b,
       CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
       CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
       (CAST(q_a AS DOUBLE) - (CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) AS var_a,
       (CAST(q_b AS DOUBLE) - (CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) AS var_b,
       (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
         / sqrt(((CAST(q_a AS DOUBLE) - (CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)) / CAST(n_a AS DOUBLE)
                + ((CAST(q_b AS DOUBLE) - (CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)) / CAST(n_b AS DOUBLE)) AS t_stat,
       ((((CAST(q_a AS DOUBLE) - (CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)) / CAST(n_a AS DOUBLE)
         + ((CAST(q_b AS DOUBLE) - (CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)) / CAST(n_b AS DOUBLE))
        * (((CAST(q_a AS DOUBLE) - (CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)) / CAST(n_a AS DOUBLE)
           + ((CAST(q_b AS DOUBLE) - (CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)) / CAST(n_b AS DOUBLE)))
       / ((((CAST(q_a AS DOUBLE) - (CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)) / CAST(n_a AS DOUBLE))
          * (((CAST(q_a AS DOUBLE) - (CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)) / CAST(n_a AS DOUBLE))
          / (CAST(n_a AS DOUBLE) - 1.0)
          + (((CAST(q_b AS DOUBLE) - (CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)) / CAST(n_b AS DOUBLE))
          * (((CAST(q_b AS DOUBLE) - (CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)) / CAST(n_b AS DOUBLE))
          / (CAST(n_b AS DOUBLE) - 1.0)) AS welch_df
FROM s
"""


@register(
    "events_welch_ttest",
    oracle=_WELCH_ORACLE,
    doc="Welch's unequal-variance t-test between hash-split cohorts' "
    "purchase values: six exact DECIMAL sufficient statistics from ONE "
    "map-side-combined aggregate; t and the Welch-Satterthwaite df are "
    "identical double expression trees over those six numbers.",
    tags=("stats", "hypothesis-test", "extension"),
)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one pass, one 1-row aggregate with map-side combine — the
    cheapest possible shape; nothing downstream touches rows."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    per = e.select(
        (spark_salted_hash("user_id", ":ks") % 2).alias("g"),
        _cents(F.col("value")).alias("v"),
    )
    vd = F.col("v").cast("decimal(18,0)")
    s = per.agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("g") == 0, vd).otherwise(F.lit(0).cast("decimal(18,0)")))
        .cast("decimal(38,0)")
        .alias("s_a"),
        F.sum(F.when(F.col("g") == 1, vd).otherwise(F.lit(0).cast("decimal(18,0)")))
        .cast("decimal(38,0)")
        .alias("s_b"),
        F.sum(
            F.when(F.col("g") == 0, vd * vd).otherwise(F.lit(0).cast("decimal(37,0)"))
        )
        .cast("decimal(38,0)")
        .alias("q_a"),
        F.sum(
            F.when(F.col("g") == 1, vd * vd).otherwise(F.lit(0).cast("decimal(37,0)"))
        )
        .cast("decimal(38,0)")
        .alias("q_b"),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    mean_a = F.col("s_a").cast("double") / n_a
    mean_b = F.col("s_b").cast("double") / n_b
    var_a = (
        F.col("q_a").cast("double")
        - (F.col("s_a").cast("double") * F.col("s_a").cast("double")) / n_a
    ) / (n_a - F.lit(1.0))
    var_b = (
        F.col("q_b").cast("double")
        - (F.col("s_b").cast("double") * F.col("s_b").cast("double")) / n_b
    ) / (n_b - F.lit(1.0))
    sa2 = var_a / n_a
    sb2 = var_b / n_b
    return s.select(
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        var_a.alias("var_a"),
        var_b.alias("var_b"),
        ((mean_b - mean_a) / F.sqrt(sa2 + sb2)).alias("t_stat"),
        (
            ((sa2 + sb2) * (sa2 + sb2))
            / (sa2 * sa2 / (n_a - F.lit(1.0)) + sb2 * sb2 / (n_b - F.lit(1.0)))
        ).alias("welch_df"),
    )


# --- Monte-Carlo permutation test --------------------------------------------------------
# Does mean purchase value differ between users who hit errors and users
# who don't? The permutation p-value re-randomizes the group label
# PERM_B times via salted md5 hashes (deterministic, engine-identical
# "randomness"), recomputes the mean difference per replicate from exact
# decimal per-user sums, and counts replicates at least as extreme as the
# observed split. The explode is over USER-level aggregates (never raw
# events) and collapses map-side to 2*PERM_B cells — CPU is PERM_B x
# |users| hash evaluations, shuffle is constant.

PERM_B = 128


def _perm_diff_sql(s1: str, n1: str, s0: str, n0: str) -> str:
    return (
        f"CAST({s1} AS DOUBLE) / CAST({n1} AS DOUBLE)"
        f" - CAST({s0} AS DOUBLE) / CAST({n0} AS DOUBLE)"
    )


_PERM_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN {_SQL_CENTS} ELSE 0 END) AS BIGINT) AS su,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cnt,
         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS grp
  FROM events GROUP BY user_id
), buyers AS (
  SELECT * FROM users WHERE cnt > 0
), obs AS (
  SELECT {_perm_diff_sql(
      "SUM(CASE WHEN grp = 1 THEN su ELSE 0 END)",
      "SUM(CASE WHEN grp = 1 THEN cnt ELSE 0 END)",
      "SUM(CASE WHEN grp = 0 THEN su ELSE 0 END)",
      "SUM(CASE WHEN grp = 0 THEN cnt ELSE 0 END)")} AS d_obs
  FROM buyers
), perms AS (
  SELECT b.b,
         {_perm_diff_sql(
      "SUM(CASE WHEN " + sql_md5_hash48("CAST(u.user_id AS VARCHAR) || ':perm' || CAST(b.b AS VARCHAR)") + " % 2 = 1 THEN u.su ELSE 0 END)",
      "SUM(CASE WHEN " + sql_md5_hash48("CAST(u.user_id AS VARCHAR) || ':perm' || CAST(b.b AS VARCHAR)") + " % 2 = 1 THEN u.cnt ELSE 0 END)",
      "SUM(CASE WHEN " + sql_md5_hash48("CAST(u.user_id AS VARCHAR) || ':perm' || CAST(b.b AS VARCHAR)") + " % 2 = 0 THEN u.su ELSE 0 END)",
      "SUM(CASE WHEN " + sql_md5_hash48("CAST(u.user_id AS VARCHAR) || ':perm' || CAST(b.b AS VARCHAR)") + " % 2 = 0 THEN u.cnt ELSE 0 END)")} AS d_b
  FROM buyers u CROSS JOIN (SELECT unnest(generate_series(0, {PERM_B - 1})) AS b) b
  GROUP BY b.b
)
SELECT o.d_obs AS diff_obs,
       CAST({PERM_B} AS BIGINT) AS n_perms,
       CAST(SUM(CASE WHEN abs(p.d_b) >= abs(o.d_obs) THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
       (1.0 + CAST(SUM(CASE WHEN abs(p.d_b) >= abs(o.d_obs) THEN 1 ELSE 0 END) AS DOUBLE))
         / (1.0 + CAST({PERM_B} AS DOUBLE)) AS p_value
FROM perms p CROSS JOIN obs o
GROUP BY o.d_obs
"""


@register(
    "events_permutation_test",
    oracle=_PERM_ORACLE,
    doc="Monte-Carlo permutation test of mean purchase value between "
    "error-hit and error-free users: PERM_B deterministic salted-hash "
    "relabelings over per-user exact decimal sums, replicate diffs from "
    "one 2xPERM_B-cell aggregate, p = (1+#extreme)/(1+B).",
    tags=("stats", "hypothesis-test", "permutation", "extension"),
)
def events_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: user aggregate (map-side combined), then a PERM_B-way
    explode over USER rows only, collapsing map-side to 2*PERM_B cells —
    CPU linear with constant PERM_B, shuffle constant-size."""
    buyers, out = _permutation_lazy(spark, sf_dir)
    out = pin_small_result(out, 16)
    buyers.unpersist()
    return out


def _permutation_lazy(spark: SparkSession, sf_dir: str):
    """(persisted per-user frame, lazy result) — separated so tests can
    assert the fan-out plan (the registered fn pins through
    pin_small_result, which hides it behind an ExistingRDD)."""
    e = load_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", _cents(F.col("value"))).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("su"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("cnt"),
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("grp"),
    )
    buyers = users.where(F.col("cnt") > 0)
    buyers = buyers.persist()
    buyers.count()  # two derived uses (obs + perms): materialize once

    sud = F.col("su").cast("decimal(38,0)")

    def diff(s1, n1, s0, n0):
        return s1.cast("double") / n1.cast("double") - s0.cast("double") / n0.cast(
            "double"
        )

    obs = buyers.agg(
        F.sum(F.when(F.col("grp") == 1, sud).otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("decimal(38,0)")
        .alias("s1"),
        F.sum(F.when(F.col("grp") == 1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("grp") == 0, sud).otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("decimal(38,0)")
        .alias("s0"),
        F.sum(F.when(F.col("grp") == 0, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("c0"),
    ).select(diff(F.col("s1"), F.col("c1"), F.col("s0"), F.col("c0")).alias("d_obs"))

    fan = buyers.select(
        "su",
        "cnt",
        F.explode(F.sequence(F.lit(0), F.lit(PERM_B - 1))).alias("b"),
        F.col("user_id"),
    ).select(
        "b",
        "su",
        "cnt",
        (
            spark_md5_hash48(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit(":perm"),
                    F.col("b").cast("string"),
                )
            )
            % 2
        ).alias("pg"),
    )
    perms = fan.groupBy("b").agg(
        F.sum(
            F.when(F.col("pg") == 1, F.col("su").cast("decimal(38,0)")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        )
        .cast("decimal(38,0)")
        .alias("s1"),
        F.sum(F.when(F.col("pg") == 1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(
            F.when(F.col("pg") == 0, F.col("su").cast("decimal(38,0)")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        )
        .cast("decimal(38,0)")
        .alias("s0"),
        F.sum(F.when(F.col("pg") == 0, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("c0"),
    ).select(diff(F.col("s1"), F.col("c1"), F.col("s0"), F.col("c0")).alias("d_b"))

    out = (
        perms.crossJoin(F.broadcast(obs))
        .agg(
            F.max("d_obs").alias("diff_obs"),
            F.sum(
                F.when(F.abs(F.col("d_b")) >= F.abs(F.col("d_obs")), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_ge"),
        )
        .select(
            "diff_obs",
            F.lit(PERM_B).cast("long").alias("n_perms"),
            "n_ge",
            (
                (F.lit(1.0) + F.col("n_ge").cast("double"))
                / (F.lit(1.0) + F.lit(float(PERM_B)))
            ).alias("p_value"),
        )
        .select("diff_obs", "n_perms", "n_ge", "p_value")
    )
    return buyers, out


# --- mergeable histogram quantile sketch with an accuracy contract ---------------------
# The distributed-quantile pattern for 100 TB: a fixed-width integer
# histogram (<= QSK_BINS cells) is MERGEABLE (per-partition histograms
# sum), so the sketch costs one map-side-combined aggregate; the estimate
# for rank k is the upper edge of the first bin whose cumulative count
# reaches k, and the deterministic guarantee 0 <= est - exact <= width-1
# is emitted as a BOOLEAN the oracle pins TRUE (the hll_register_sketch
# contract discipline). The exact order statistics come from ONE
# global_prefix_sum rank pass serving all three quantiles, so the op is
# also its own accuracy audit.

QSK_BINS = 4096
QSK_QS = ((1, 2), (9, 10), (99, 100))  # exact rational quantiles

_QSK_ORACLE = f"""
WITH v AS (
  SELECT CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         o_orderkey
  FROM orders
), mm AS (
  SELECT MIN(c) AS lo, MAX(c) AS hi, CAST(COUNT(*) AS BIGINT) AS n,
         (MAX(c) - MIN(c) + {QSK_BINS}) // {QSK_BINS} AS w
  FROM v
), hist AS (
  SELECT (v.c - mm.lo) // mm.w AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM v CROSS JOIN mm GROUP BY 1
), cum AS (
  SELECT bin, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cc FROM hist
), ks AS (
  SELECT t.qn, t.qd, (mm.n * t.qn + t.qd - 1) // t.qd AS k, mm.lo, mm.w
  FROM (VALUES {", ".join(f"({qn}, {qd})" for qn, qd in QSK_QS)}) AS t(qn, qd)
  CROSS JOIN mm
), est AS (
  SELECT k.qn, k.qd, k.lo + (MIN(c2.bin) + 1) * k.w - 1 AS est_c, k.w
  FROM ks k JOIN cum c2 ON c2.cc >= k.k
  GROUP BY k.qn, k.qd, k.lo, k.w
), ranked AS (
  SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c, o_orderkey) AS BIGINT) AS rk FROM v
), exact AS (
  SELECT k.qn, k.qd, MIN(r.c) AS exact_c
  FROM ks k JOIN ranked r ON r.rk = k.k
  GROUP BY k.qn, k.qd
)
SELECT CAST(e.qn AS DOUBLE) / CAST(e.qd AS DOUBLE) AS q,
       e.est_c AS est_cents,
       x.exact_c AS exact_cents,
       e.w AS bin_width,
       (e.est_c - x.exact_c BETWEEN 0 AND e.w - 1) AS within_bound
FROM est e JOIN exact x ON e.qn = x.qn AND e.qd = x.qd
ORDER BY q
"""


@register(
    "orders_quantile_sketch_contract",
    oracle=_QSK_ORACLE,
    doc="mergeable fixed-width histogram quantile sketch over order value "
    "cents with its deterministic accuracy contract (0 <= est - exact "
    "<= width-1) pinned as a boolean: one map-side-combined histogram "
    "aggregate, one global_prefix_sum rank pass for the exact order "
    "statistics, integer arithmetic end-to-end.",
    tags=("stats", "sketch", "quantile", "prefix-sum", "extension"),
)
def orders_quantile_sketch_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: histogram cells cap at QSK_BINS regardless of rows (the
    mergeable-sketch shape); driver work is one <=QSK_BINS-cell fold (the
    model-sized-collect convention, same class as global_prefix_sum's
    offsets); exact ranks are one range-repartitioned prefix pass."""
    from f1_lakehouse_spark.operators.extensions import global_prefix_sum

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    v = o.select(
        (F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c"),
        "o_orderkey",
    )
    v = v.persist()
    mm = v.agg(
        F.min("c").alias("lo"), F.max("c").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    lo, hi, n = int(mm["lo"]), int(mm["hi"]), int(mm["n"])
    w = (hi - lo + QSK_BINS) // QSK_BINS
    hist = (
        v.groupBy(F.expr(f"(c - {lo}) div {w}").alias("bin"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    )  # <= QSK_BINS cells: model-sized by construction
    ks = {qn_qd: (n * qn_qd[0] + qn_qd[1] - 1) // qn_qd[1] for qn_qd in QSK_QS}
    cum = 0
    est: dict[tuple[int, int], int] = {}
    for row in sorted(hist, key=lambda r: r["bin"]):
        cum += row["cnt"]
        for qq, k in ks.items():
            if qq not in est and cum >= k:
                est[qq] = lo + (int(row["bin"]) + 1) * w - 1
    one = v.withColumn("one", F.lit(1).cast("long"))
    ranked, release, _tot = global_prefix_sum(
        spark, one, "one", [F.col("c").asc(), F.col("o_orderkey").asc()]
    )
    ranked = ranked.withColumn("rk", F.col("cum").cast("long"))
    picks = {
        int(r["rk"]): int(r["c"])
        for r in ranked.where(F.col("rk").isin(*ks.values()))
        .select("rk", "c")
        .collect()
    }
    release()
    v.unpersist()
    rows = [
        (
            float(qn) / float(qd),
            est[(qn, qd)],
            picks[ks[(qn, qd)]],
            w,
            0 <= est[(qn, qd)] - picks[ks[(qn, qd)]] <= w - 1,
        )
        for qn, qd in QSK_QS
    ]
    return spark.createDataFrame(
        rows,
        "q double, est_cents long, exact_cents long, bin_width long, "
        "within_bound boolean",
    )


# --- MAD robust z-score outliers -------------------------------------------------------
# Median absolute deviation outlier scoring over supplier revenue: the
# robust twin of z-scoring (median/MAD instead of mean/stddev, 50%
# breakdown point vs 0%). Both medians are exact distributed order
# statistics — kept INTEGER by carrying med2 = r[k_lo] + r[k_hi] (twice
# the median) and mad4 = d[k_lo] + d[k_hi] over d = |2r - med2| (four
# times the MAD), so the only doubles are the final z/median/MAD ratios
# with identical expression trees in both engines. Two prefix-rank
# passes + one TakeOrdered top-k.

_MAD_K = 10
_MAD_C = "1.4826"  # the classic consistency constant (shared literal)

_MAD_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))), 0) AS BIGINT) AS r
  FROM lineitem GROUP BY l_suppkey
), st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rev
), rr AS (
  SELECT r, l_suppkey, CAST(ROW_NUMBER() OVER (ORDER BY r, l_suppkey) AS BIGINT) AS rk
  FROM rev
), med AS (
  SELECT (SELECT r FROM rr, st WHERE rk = (n + 1) // 2)
       + (SELECT r FROM rr, st WHERE rk = n // 2 + 1) AS med2
), dev AS (
  SELECT l_suppkey, r, abs(2 * r - med.med2) AS d FROM rev CROSS JOIN med
), dr AS (
  SELECT d, l_suppkey, CAST(ROW_NUMBER() OVER (ORDER BY d, l_suppkey) AS BIGINT) AS rk
  FROM dev
), mad AS (
  SELECT (SELECT d FROM dr, st WHERE rk = (n + 1) // 2)
       + (SELECT d FROM dr, st WHERE rk = n // 2 + 1) AS mad4
)
SELECT v.l_suppkey AS s_suppkey,
       v.r AS revenue_units,
       2.0 * CAST(2 * v.r - med.med2 AS DOUBLE)
         / ({_MAD_C} * CAST(mad.mad4 AS DOUBLE)) AS robust_z,
       CAST(med.med2 AS DOUBLE) / 2.0 AS median_rev,
       CAST(mad.mad4 AS DOUBLE) / 4.0 AS mad_rev
FROM rev v CROSS JOIN med CROSS JOIN mad
ORDER BY abs(2 * v.r - med.med2) DESC, v.l_suppkey ASC
LIMIT {_MAD_K}
"""


@register(
    "supplier_mad_outliers",
    oracle=_MAD_ORACLE,
    doc="MAD robust z-score outliers over supplier revenue: median and "
    "MAD as exact distributed order statistics (two global_prefix_sum "
    "rank passes, integers doubled/quadrupled to avoid fractional "
    "medians), top-k by integer |2r - med2| with unique tiebreak, one "
    "identical double tree for the z ratio.",
    tags=("stats", "robust", "order-statistics", "prefix-sum", "extension"),
)
def supplier_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: supplier revenue is one map-side-combined aggregate; each
    median is a range-repartitioned prefix-rank pass with O(1)-row
    collects; the final top-k is TakeOrdered (no global sort)."""
    rev, out = _mad_lazy(spark, sf_dir)
    out = pin_small_result(out, _MAD_K)
    rev.unpersist()
    return out


def _mad_lazy(spark: SparkSession, sf_dir: str):
    """(persisted revenue frame, lazy top-k result) — separated so tests
    can assert the TakeOrdered plan (the registered fn pins through
    pin_small_result, which hides it behind an ExistingRDD)."""
    from f1_lakehouse_spark.operators.extensions import global_prefix_sum

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
        .cast("long")
        .alias("r")
    )
    rev = rev.persist()
    n = rev.count()
    k_lo, k_hi = (n + 1) // 2, n // 2 + 1

    def pick2(df: DataFrame, col: str, tiebreak: str) -> int:
        one = df.withColumn("one", F.lit(1).cast("long"))
        ranked, release, _t = global_prefix_sum(
            spark, one, "one", [F.col(col).asc(), F.col(tiebreak).asc()]
        )
        ranked = ranked.withColumn("rk", F.col("cum").cast("long"))
        picks = {
            int(row["rk"]): int(row[col])
            for row in ranked.where(F.col("rk").isin(k_lo, k_hi))
            .select("rk", col)
            .collect()
        }
        release()
        return picks[k_lo] + picks[k_hi]

    med2 = pick2(rev, "r", "l_suppkey")
    dev = rev.select(
        "l_suppkey", "r", F.abs(2 * F.col("r") - F.lit(med2)).alias("d")
    )
    mad4 = pick2(dev, "d", "l_suppkey")
    out = (
        rev.select(
            F.col("l_suppkey").alias("s_suppkey"),
            F.col("r").alias("revenue_units"),
            (
                F.lit(2.0) * (2 * F.col("r") - F.lit(med2)).cast("double")
                / (F.lit(float(_MAD_C)) * F.lit(mad4).cast("double"))
            ).alias("robust_z"),
            (F.lit(med2).cast("double") / F.lit(2.0)).alias("median_rev"),
            (F.lit(mad4).cast("double") / F.lit(4.0)).alias("mad_rev"),
        )
        .orderBy(
            F.abs(2 * F.col("revenue_units") - F.lit(med2)).desc(),
            F.col("s_suppkey").asc(),
        )
        .limit(_MAD_K)
    )
    return rev, out


# --- propensity nearest-neighbor matching (ATT) ------------------------------------------
# The matching-estimator shape: every "treated" document (fails the gopher
# repetition gate) is matched to the control (passes) with the NEAREST
# hashed-linear quality score, and the average treated-minus-matched-control
# difference in n_chars is the ATT readout. 1-D nearest matching
# distributes as TWO exclusive prefix-max passes over the score-ordered
# stream (global_prefix_max — never a single-partition window): controls
# seen so far under ascending order give the nearest score below; the same
# machinery over descending order with negated scores gives the nearest
# above; ties at equal gap resolve to the below match. The matched control
# representative per score is arg_max(n_chars, doc_id) — unique doc_id
# makes it deterministic. All gaps/diffs are exact integers; the two
# output ratios are identical double trees.

_ATT_ORACLE = """
WITH scores AS ({score_q}),
labels AS ({label_q}),
base AS (
  SELECT s.doc_id, s.score_sum AS sc, l.passes_repetition AS y, d.n_chars
  FROM scores s
  JOIN labels l ON s.doc_id = l.doc_id
  JOIN documents d ON d.doc_id = s.doc_id
),
wm AS (
  SELECT doc_id, sc, y, n_chars,
         MAX(CASE WHEN y = 1 THEN sc END)
           OVER (ORDER BY sc ASC, y DESC, doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS below_sc,
         MAX(CASE WHEN y = 1 THEN -sc END)
           OVER (ORDER BY sc DESC, y DESC, doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS neg_above
  FROM base
),
matched AS (
  SELECT doc_id, sc, n_chars,
         CASE WHEN below_sc IS NULL AND neg_above IS NULL THEN NULL
              WHEN neg_above IS NULL THEN below_sc
              WHEN below_sc IS NULL THEN -neg_above
              WHEN sc - below_sc <= (-neg_above) - sc THEN below_sc
              ELSE -neg_above END AS m_sc
  FROM wm WHERE y = 0
),
reps AS (
  SELECT sc AS r_sc, arg_max(n_chars, doc_id) AS rep_chars
  FROM base WHERE y = 1 GROUP BY sc
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
       CAST(COUNT(m.m_sc) AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN m.m_sc IS NOT NULL THEN abs(m.sc - m.m_sc) END) AS BIGINT) AS sum_abs_gap,
       CAST(CAST(SUM(CASE WHEN m.m_sc IS NOT NULL THEN abs(m.sc - m.m_sc) END) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(m.m_sc) AS DOUBLE) AS avg_abs_gap,
       CAST(CAST(SUM(CASE WHEN m.m_sc IS NOT NULL THEN m.n_chars - r.rep_chars END) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(m.m_sc) AS DOUBLE) AS att_chars
FROM matched m LEFT JOIN reps r ON m.m_sc = r.r_sc
"""


@register(
    "scoring_propensity_nn_att",
    oracle=None,  # composed at module end (needs the registered sub-oracles)
    doc="propensity nearest-neighbor matching ATT: each gate-failing doc "
    "matched to the nearest-scoring passing doc via TWO distributed "
    "exclusive prefix-max passes (ascending for below, descending with "
    "negated scores for above; equal-gap ties take below), control "
    "representative per score by arg_max(n_chars, doc_id), integer gaps, "
    "identical double ratio trees.",
    tags=("pipeline", "scoring", "matching", "prefix-max", "extension"),
)
def scoring_propensity_nn_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: two range-repartitioned prefix-max passes (model-sized
    offset collects) + one score-keyed rep join; nothing quadratic, no
    global sort to the driver."""
    from f1_lakehouse_spark.operators.extensions import global_prefix_max
    from f1_lakehouse_spark.pipeline.filtering import quality_gopher_repetition
    from f1_lakehouse_spark.pipeline.scoring import scoring_hashed_linear_quality

    s = scoring_hashed_linear_quality(spark, sf_dir).select("doc_id", "score_sum")
    lab = quality_gopher_repetition(spark, sf_dir).select(
        "doc_id", "passes_repetition"
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    base = (
        s.join(lab, "doc_id")
        .join(d, "doc_id")
        .select(
            "doc_id",
            F.col("score_sum").alias("sc"),
            F.col("passes_repetition").alias("y"),
            "n_chars",
        )
    )
    base = base.persist()
    base.count()  # three derived uses (two prefix passes + reps)

    below_in = base.withColumn(
        "cv", F.when(F.col("y") == 1, F.col("sc")).cast("long")
    )
    below_f, rel1 = global_prefix_max(
        spark,
        below_in,
        "cv",
        [F.col("sc").asc(), F.col("y").desc(), F.col("doc_id").asc()],
    )
    below_f = below_f.withColumnRenamed("excl_max", "below_sc").drop("cv")

    above_in = below_f.withColumn(
        "cvn", F.when(F.col("y") == 1, -F.col("sc")).cast("long")
    )
    above_f, rel2 = global_prefix_max(
        spark,
        above_in,
        "cvn",
        [F.col("sc").desc(), F.col("y").desc(), F.col("doc_id").asc()],
    )
    above_f = above_f.withColumnRenamed("excl_max", "neg_above").drop("cvn")

    matched = above_f.where(F.col("y") == 0).select(
        "doc_id",
        "sc",
        "n_chars",
        F.when(
            F.col("below_sc").isNull() & F.col("neg_above").isNull(), F.lit(None)
        )
        .when(F.col("neg_above").isNull(), F.col("below_sc"))
        .when(F.col("below_sc").isNull(), -F.col("neg_above"))
        .when(
            F.col("sc") - F.col("below_sc") <= (-F.col("neg_above")) - F.col("sc"),
            F.col("below_sc"),
        )
        .otherwise(-F.col("neg_above"))
        .alias("m_sc"),
    )
    reps = (
        base.where(F.col("y") == 1)
        .groupBy(F.col("sc").alias("r_sc"))
        .agg(F.max_by("n_chars", "doc_id").alias("rep_chars"))
    )
    joined = matched.join(reps, matched["m_sc"] == reps["r_sc"], "left")
    agg = joined.agg(
        F.count("*").cast("long").alias("n_treated"),
        F.count("m_sc").cast("long").alias("n_matched"),
        F.sum(
            F.when(F.col("m_sc").isNotNull(), F.abs(F.col("sc") - F.col("m_sc")))
        )
        .cast("long")
        .alias("sum_abs_gap"),
        F.sum(
            F.when(
                F.col("m_sc").isNotNull(), F.col("n_chars") - F.col("rep_chars")
            )
        )
        .cast("long")
        .alias("sum_diff"),
    )
    out = agg.select(
        "n_treated",
        "n_matched",
        "sum_abs_gap",
        (
            F.col("sum_abs_gap").cast("double") / F.col("n_matched").cast("double")
        ).alias("avg_abs_gap"),
        (F.col("sum_diff").cast("double") / F.col("n_matched").cast("double")).alias(
            "att_chars"
        ),
    )
    out = pin_small_result(out, 16)
    rel2()
    rel1()
    base.unpersist()
    return out


# wire the composed oracle (the sub-oracles register on module import;
# text must load before filtering->dedup so the chain registers under ANY
# module import order — the scoring.py convention)
import f1_lakehouse_spark.pipeline.scoring  # noqa: E402,F401
import f1_lakehouse_spark.pipeline.filtering  # noqa: E402,F401

from f1_lakehouse_spark.registry import REGISTRY as _REG  # noqa: E402

_REG["scoring_propensity_nn_att"].oracle = _ATT_ORACLE.format(
    score_q=_REG["scoring_hashed_linear_quality"].oracle,
    label_q=_REG["quality_gopher_repetition"].oracle,
)


# --- X-bar/S statistical process control chart --------------------------------------------
# The manufacturing-quality readout applied to daily revenue: subgroups
# are months, the subgroup statistic is the mean/stddev of DAILY revenue
# within the month, and the 3-sigma control limits flag months whose mean
# drifted. Per-subgroup sufficient statistics are exact decimals (daily
# cents; squares through DECIMAL(18,0)^2 = (37,0), exact); the grand
# means fold over ONE calendar-bounded packed array in ym0 order with a
# DOUBLE-LIST accumulator (the orders_holt_forecast fold discipline —
# DuckDB list_reduce computes struct accumulators incorrectly, lists fold
# exactly, and init/elements must share the list type). Simplified
# Shewhart limits (no c4 small-sample correction — a shared convention,
# not an approximation mismatch; both engines use the identical formula).

_SPC_ORACLE = """
WITH daily AS (
  SELECT (CAST(year(o_orderdate) AS BIGINT) * 12 + CAST(month(o_orderdate) AS BIGINT) - 1) AS ym0,
         strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month_str,
         CAST(SUM(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS dc
  FROM orders GROUP BY 1, 2, o_orderdate
), grp AS (
  SELECT ym0, month_str,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dc) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(dc AS DECIMAL(19,0)) * CAST(dc AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS qx
  FROM daily GROUP BY 1, 2
), stats AS (
  SELECT ym0, month_str, n,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS xbar,
         sqrt((CAST(qx AS DOUBLE) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) / 100.0 AS s
  FROM grp WHERE n >= 2
), packed AS (
  SELECT list(struct_pack(ym0 := ym0, xbar := xbar, s := s) ORDER BY ym0) AS arr,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM stats
), grand AS (
  SELECT list_reduce(
           list_prepend([CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
                        list_transform(arr, t -> [t.xbar, t.s])),
           (a, b) -> [a[1] + b[1], a[2] + b[2]]) AS f,
         m
  FROM packed
)
SELECT st.month_str, st.n AS n_days, st.xbar, st.s,
       g.f[1] / CAST(g.m AS DOUBLE) AS grand_mean,
       g.f[2] / CAST(g.m AS DOUBLE) AS s_bar,
       g.f[1] / CAST(g.m AS DOUBLE)
         + 3.0 * (g.f[2] / CAST(g.m AS DOUBLE)) / sqrt(CAST(st.n AS DOUBLE)) AS ucl,
       g.f[1] / CAST(g.m AS DOUBLE)
         - 3.0 * (g.f[2] / CAST(g.m AS DOUBLE)) / sqrt(CAST(st.n AS DOUBLE)) AS lcl,
       (st.xbar > g.f[1] / CAST(g.m AS DOUBLE)
          + 3.0 * (g.f[2] / CAST(g.m AS DOUBLE)) / sqrt(CAST(st.n AS DOUBLE))
        OR st.xbar < g.f[1] / CAST(g.m AS DOUBLE)
          - 3.0 * (g.f[2] / CAST(g.m AS DOUBLE)) / sqrt(CAST(st.n AS DOUBLE))) AS out_of_control
FROM stats st CROSS JOIN grand g
"""


@register(
    "orders_spc_control_chart",
    oracle=_SPC_ORACLE,
    doc="X-bar/S Shewhart control chart of daily revenue by month: exact "
    "decimal subgroup sufficient statistics, grand means via a "
    "DOUBLE-list fold over one calendar-bounded packed array, 3-sigma "
    "limits and out-of-control flags from identical double trees.",
    tags=("stats", "timeseries", "quality-control", "extension"),
)
def orders_spc_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one (month, day) partial-aggregated shuffle, then a second
    aggregate to ~84 month cells; the grand fold runs over the packed
    array — row-scale work is one scan, everything after is
    calendar-bounded."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    cents = (F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)") * 100).cast(
        "long"
    )
    daily = (
        o.select(
            (
                F.year("o_orderdate").cast("long") * 12
                + F.month("o_orderdate").cast("long")
                - 1
            ).alias("ym0"),
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM").alias(
                "month_str"
            ),
            F.col("o_orderdate").alias("d"),
            cents.alias("c"),
        )
        .groupBy("ym0", "month_str", "d")
        .agg(F.sum("c").alias("dc"))
    )
    dcd = F.col("dc").cast("decimal(19,0)")
    grp = daily.groupBy("ym0", "month_str").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dc").cast("decimal(38,0)").alias("sx"),
        F.sum(dcd * dcd).cast("decimal(38,0)").alias("qx"),
    )
    # subgroup stddev needs >= 2 observations: a 1-day partial month at the
    # calendar edge otherwise divides by zero (NULL in DuckDB, NaN in Spark)
    grp = grp.where(F.col("n") >= 2)
    n_d = F.col("n").cast("double")
    stats = grp.select(
        "ym0",
        "month_str",
        "n",
        (F.col("sx").cast("double") / n_d / F.lit(100.0)).alias("xbar"),
        (
            F.sqrt(
                (
                    F.col("qx").cast("double")
                    - (F.col("sx").cast("double") * F.col("sx").cast("double")) / n_d
                )
                / (n_d - F.lit(1.0))
            )
            / F.lit(100.0)
        ).alias("s"),
    )
    stats = stats.persist()
    stats.count()  # two derived uses (grand fold + per-month output)
    packed = stats.agg(
        F.sort_array(
            F.collect_list(F.struct("ym0", "xbar", "s"))
        ).alias("arr"),
        F.count("*").cast("long").alias("m"),
    )
    grand = packed.select(
        F.aggregate(
            F.transform("arr", lambda t: F.array(t["xbar"], t["s"])),
            F.array(F.lit(0.0), F.lit(0.0)),
            lambda a, b: F.array(
                F.element_at(a, 1) + F.element_at(b, 1),
                F.element_at(a, 2) + F.element_at(b, 2),
            ),
        ).alias("f"),
        "m",
    )
    m_d = F.col("m").cast("double")
    gmean = F.element_at(F.col("f"), 1) / m_d
    sbar = F.element_at(F.col("f"), 2) / m_d
    nd2 = F.col("n").cast("double")
    ucl = gmean + F.lit(3.0) * sbar / F.sqrt(nd2)
    lcl = gmean - F.lit(3.0) * sbar / F.sqrt(nd2)
    out = stats.crossJoin(F.broadcast(grand)).select(
        "month_str",
        F.col("n").alias("n_days"),
        "xbar",
        "s",
        gmean.alias("grand_mean"),
        sbar.alias("s_bar"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((F.col("xbar") > ucl) | (F.col("xbar") < lcl)).alias("out_of_control"),
    )
    out = pin_small_result(out, 4096)
    stats.unpersist()
    return out


# --- autocorrelation function + Ljung-Box portmanteau -------------------------------------
# Is monthly revenue white noise after detrending by its mean? ACF at
# lags 1..ACF_LAGS over the ~84-month packed array plus the cumulative
# Ljung-Box Q — the residual-diagnostics companion to the Holt/seasonal
# forecasters. The array is calendar-bounded, so the O(lags x months)
# fold work is constant at any SF; every sum is a LEFT FOLD in index
# order (IEEE-identical both engines); the demeaned series is a
# MATERIALIZED column before element_at touches it (HOF re-evaluation
# trap). Assumes months > ACF_LAGS + 1, which the fixed synthetic
# calendar (~84 months at every SF) guarantees.

ACF_LAGS = 12

_ACF_ORACLE = f"""
WITH monthly AS (
  SELECT (CAST(year(o_orderdate) AS BIGINT) * 12 + CAST(month(o_orderdate) AS BIGINT) - 1) AS ym0,
         CAST(SUM(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), packed AS (
  SELECT list(CAST(cents AS DOUBLE) / 100.0 ORDER BY ym0) AS arr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM monthly
), demeaned AS (
  SELECT n, arr,
         list_transform(arr, v -> v - list_reduce(list_prepend(CAST(0.0 AS DOUBLE), arr), (a, b) -> a + b) / CAST(n AS DOUBLE)) AS e
  FROM packed
), den AS (
  SELECT n, e,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list_transform(e, v -> v * v)), (a, b) -> a + b) AS d
  FROM demeaned
), acfs AS (
  SELECT n, d,
         list_transform(range(1, {ACF_LAGS} + 1),
           k -> list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(k + 1, n + 1),
                    t -> e[CAST(t AS INTEGER)] * e[CAST(t - k AS INTEGER)])),
                  (a, b) -> a + b) / d) AS acf
  FROM den
)
SELECT CAST(lag AS BIGINT) AS lag,
       acf[CAST(lag AS INTEGER)] AS acf_value,
       CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
         * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, lag + 1),
               j -> acf[CAST(j AS INTEGER)] * acf[CAST(j AS INTEGER)]
                    / (CAST(n AS DOUBLE) - CAST(j AS DOUBLE)))),
             (a, b) -> a + b) AS ljung_box_q
FROM acfs, (SELECT unnest(range(1, {ACF_LAGS} + 1)) AS lag)
"""


@register(
    "orders_acf_ljung_box",
    oracle=_ACF_ORACLE,
    doc=f"autocorrelation of monthly revenue at lags 1..{ACF_LAGS} with "
    "the cumulative Ljung-Box Q: calendar-bounded packed-array index "
    "folds (left fold order, IEEE-identical), demeaned series "
    "materialized before element_at, no transcendentals.",
    tags=("stats", "timeseries", "diagnostics", "extension"),
)
def orders_acf_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one partial-aggregated shuffle to ~84 month cells; the
    O(lags x months) DP is constant-size at any row count."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    cents = (F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)") * 100).cast(
        "long"
    )
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
        F.array_sort(
            F.collect_list(
                F.struct("ym0", (F.col("cents").cast("double") / F.lit(100.0)).alias("v"))
            )
        ).alias("sarr"),
        F.count("*").cast("long").alias("n"),
    ).select(F.transform("sarr", lambda s: s["v"]).alias("arr"), "n")
    n_d = F.col("n").cast("double")

    def fold_sum(arr_col):
        return F.aggregate(arr_col, F.lit(0.0), lambda a, b: a + b)

    demeaned = packed.select(
        "n",
        F.transform(
            "arr", lambda v: v - fold_sum(F.col("arr")) / n_d
        ).alias("e"),
    )
    # NOTE: `e` is a lazy projection — CollapseProject may inline the
    # transform into each lagged element_at lookup below (the CLAUDE.md
    # O(n^2) HOF trap). That re-evaluation is ACCEPTABLE here because the
    # array is calendar-bounded (~84 monthly points, not data-scaled), so
    # the worst case is 84^2 scalar ops per row of a months-sized frame.
    den = demeaned.select(
        "n",
        "e",
        fold_sum(F.transform("e", lambda v: v * v)).alias("d"),
    )
    acfs = den.select(
        "n",
        F.transform(
            F.sequence(F.lit(1), F.lit(ACF_LAGS)),
            lambda k: F.aggregate(
                F.sequence(k + 1, F.col("n").cast("int")),
                F.lit(0.0),
                lambda a, t: a
                + F.element_at("e", t.cast("int"))
                * F.element_at("e", (t - k).cast("int")),
            )
            / F.col("d"),
        ).alias("acf"),
    )
    out = acfs.select(
        F.explode(F.sequence(F.lit(1), F.lit(ACF_LAGS))).alias("lagi"), "acf", "n"
    ).select(
        F.col("lagi").cast("long").alias("lag"),
        F.element_at("acf", F.col("lagi").cast("int")).alias("acf_value"),
        (
            n_d
            * (n_d + F.lit(2.0))
            * F.aggregate(
                F.sequence(F.lit(1), F.col("lagi")),
                F.lit(0.0),
                lambda a, j: a
                + F.element_at("acf", j.cast("int"))
                * F.element_at("acf", j.cast("int"))
                / (n_d - j.cast("double")),
            )
        ).alias("ljung_box_q"),
    )
    return out


# --- Cohen's kappa inter-rater agreement ---------------------------------------------------
# Do the expensive gopher repetition gate and the cheap hashed-linear
# score agree beyond chance? Rater A = the gate; rater B = score >= the
# score's own low-median (the rank-(n+1)//2 order statistic — a single
# distributed prefix-rank pick, deterministic in both engines because the
# rank and the (sc, doc_id) total order are identical). kappa =
# (po - pe)/(1 - pe) from the exact 2x2 integer cells; the chance-
# agreement products go through DECIMAL(18,0)^2 (exact at any corpus
# size) before the only double casts.

_KAPPA_ORACLE = """
WITH scores AS ({score_q}),
labels AS ({label_q}),
base AS (
  SELECT s.doc_id, s.score_sum AS sc, l.passes_repetition AS y
  FROM scores s JOIN labels l ON s.doc_id = l.doc_id
),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
ranked AS (
  SELECT sc, CAST(ROW_NUMBER() OVER (ORDER BY sc, doc_id) AS BIGINT) AS rk FROM base
),
med AS (SELECT sc AS m FROM ranked, st WHERE rk = (n + 1) // 2),
cells AS (
  SELECT
    CAST(SUM(CASE WHEN y = 1 AND sc >= med.m THEN 1 ELSE 0 END) AS BIGINT) AS n11,
    CAST(SUM(CASE WHEN y = 1 AND sc <  med.m THEN 1 ELSE 0 END) AS BIGINT) AS n10,
    CAST(SUM(CASE WHEN y = 0 AND sc >= med.m THEN 1 ELSE 0 END) AS BIGINT) AS n01,
    CAST(SUM(CASE WHEN y = 0 AND sc <  med.m THEN 1 ELSE 0 END) AS BIGINT) AS n00
  FROM base CROSS JOIN med
)
SELECT st.n AS n_docs, c.n11, c.n10, c.n01, c.n00,
       CAST(c.n11 + c.n00 AS DOUBLE) / CAST(st.n AS DOUBLE) AS po,
       CAST(CAST(c.n11 + c.n10 AS DECIMAL(18,0)) * CAST(c.n11 + c.n01 AS DECIMAL(18,0))
            + CAST(c.n01 + c.n00 AS DECIMAL(18,0)) * CAST(c.n10 + c.n00 AS DECIMAL(18,0)) AS DOUBLE)
         / (CAST(st.n AS DOUBLE) * CAST(st.n AS DOUBLE)) AS pe,
       (CAST(c.n11 + c.n00 AS DOUBLE) / CAST(st.n AS DOUBLE)
        - CAST(CAST(c.n11 + c.n10 AS DECIMAL(18,0)) * CAST(c.n11 + c.n01 AS DECIMAL(18,0))
               + CAST(c.n01 + c.n00 AS DECIMAL(18,0)) * CAST(c.n10 + c.n00 AS DECIMAL(18,0)) AS DOUBLE)
          / (CAST(st.n AS DOUBLE) * CAST(st.n AS DOUBLE)))
       / (1.0 - CAST(CAST(c.n11 + c.n10 AS DECIMAL(18,0)) * CAST(c.n11 + c.n01 AS DECIMAL(18,0))
                     + CAST(c.n01 + c.n00 AS DECIMAL(18,0)) * CAST(c.n10 + c.n00 AS DECIMAL(18,0)) AS DOUBLE)
            / (CAST(st.n AS DOUBLE) * CAST(st.n AS DOUBLE))) AS kappa
FROM cells c CROSS JOIN st
"""


@register(
    "scoring_cohens_kappa",
    oracle=None,  # composed at module end
    doc="Cohen's kappa between the gopher repetition gate and the "
    "median-thresholded hashed-linear score: one distributed prefix-rank "
    "median pick, exact 2x2 integer cells from one aggregate, "
    "chance-agreement products through DECIMAL(18,0)^2, identical "
    "double trees for po/pe/kappa.",
    tags=("pipeline", "scoring", "agreement", "prefix-sum", "extension"),
)
def scoring_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: score/label join + one prefix-rank pass + one 1-row
    aggregate; collects are O(1) rows (n, the median pick)."""
    from f1_lakehouse_spark.operators.extensions import global_prefix_sum
    from f1_lakehouse_spark.pipeline.filtering import quality_gopher_repetition
    from f1_lakehouse_spark.pipeline.scoring import scoring_hashed_linear_quality

    s = scoring_hashed_linear_quality(spark, sf_dir).select("doc_id", "score_sum")
    lab = quality_gopher_repetition(spark, sf_dir).select(
        "doc_id", "passes_repetition"
    )
    base = s.join(lab, "doc_id").select(
        "doc_id", F.col("score_sum").alias("sc"), F.col("passes_repetition").alias("y")
    )
    base = base.persist()
    n = base.count()
    k = (n + 1) // 2
    one = base.withColumn("one", F.lit(1).cast("long"))
    ranked, release, _t = global_prefix_sum(
        spark, one, "one", [F.col("sc").asc(), F.col("doc_id").asc()]
    )
    ranked = ranked.withColumn("rk", F.col("cum").cast("long"))
    m = int(
        ranked.where(F.col("rk") == k).select("sc").collect()[0]["sc"]
    )
    release()
    cells = base.agg(
        F.sum(F.when((F.col("y") == 1) & (F.col("sc") >= m), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
        F.sum(F.when((F.col("y") == 1) & (F.col("sc") < m), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when((F.col("y") == 0) & (F.col("sc") >= m), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when((F.col("y") == 0) & (F.col("sc") < m), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
    )
    n_d = F.lit(n).cast("double")
    pe_num = (
        (F.col("n11") + F.col("n10")).cast("decimal(18,0)")
        * (F.col("n11") + F.col("n01")).cast("decimal(18,0)")
        + (F.col("n01") + F.col("n00")).cast("decimal(18,0)")
        * (F.col("n10") + F.col("n00")).cast("decimal(18,0)")
    ).cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / n_d
    pe = pe_num / (n_d * n_d)
    out = cells.select(
        F.lit(n).cast("long").alias("n_docs"),
        "n11",
        "n10",
        "n01",
        "n00",
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )
    out = pin_small_result(out, 16)
    base.unpersist()
    return out


# --- inverse-propensity-scored off-policy evaluation ---------------------------------------
# "What would the average event value be under a policy that served only
# purchase/click, 50/50?" — answered from LOGGED data alone, the
# counterfactual-eval shape behind recsys/RLHF reward audits. Behavior
# propensities are empirical action shares estimated on a salted-hash
# TRAIN split; IPS / self-normalized IPS / effective sample size are
# evaluated on the disjoint EVAL split (estimating propensities on the
# evaluation data itself would make SNIPS collapse to IPS identically).
# Everything reduces to per-action-type cells (<= |event types|): exact
# integer counts and decimal cent sums, then identical double trees.

IPS_TARGET = ("purchase", "click")  # target policy: uniform over these


_IPS_ORACLE = f"""
WITH tagged AS (
  SELECT event_type, value,
         {sql_salted_hash("event_id", ":ips")} % 2 AS split
  FROM events
), cells AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(SUM(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ce,
         CAST(SUM(CASE WHEN split = 1 THEN {_SQL_CENTS} ELSE 0 END) AS DECIMAL(38,0)) AS sv
  FROM tagged GROUP BY event_type
), tot AS (
  SELECT CAST(SUM(ct) AS BIGINT) AS n_train, CAST(SUM(ce) AS BIGINT) AS n_eval FROM cells
), t AS (
  SELECT
    MAX(CASE WHEN event_type = '{IPS_TARGET[0]}' THEN ct END) AS ct_p,
    MAX(CASE WHEN event_type = '{IPS_TARGET[0]}' THEN ce END) AS ce_p,
    MAX(CASE WHEN event_type = '{IPS_TARGET[0]}' THEN sv END) AS sv_p,
    MAX(CASE WHEN event_type = '{IPS_TARGET[1]}' THEN ct END) AS ct_c,
    MAX(CASE WHEN event_type = '{IPS_TARGET[1]}' THEN ce END) AS ce_c,
    MAX(CASE WHEN event_type = '{IPS_TARGET[1]}' THEN sv END) AS sv_c
  FROM cells
)
SELECT tot.n_train, tot.n_eval,
       (CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_p AS DOUBLE)) * (CAST(t.sv_p AS DOUBLE) / 100.0)
        + CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_c AS DOUBLE)) * (CAST(t.sv_c AS DOUBLE) / 100.0))
         / CAST(tot.n_eval AS DOUBLE) AS ips_value,
       (CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_p AS DOUBLE)) * (CAST(t.sv_p AS DOUBLE) / 100.0)
        + CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_c AS DOUBLE)) * (CAST(t.sv_c AS DOUBLE) / 100.0))
         / (CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_p AS DOUBLE)) * CAST(t.ce_p AS DOUBLE)
            + CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_c AS DOUBLE)) * CAST(t.ce_c AS DOUBLE)) AS snips_value,
       (CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_p AS DOUBLE)) * CAST(t.ce_p AS DOUBLE)
        + CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_c AS DOUBLE)) * CAST(t.ce_c AS DOUBLE))
       * (CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_p AS DOUBLE)) * CAST(t.ce_p AS DOUBLE)
          + CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_c AS DOUBLE)) * CAST(t.ce_c AS DOUBLE))
       / (CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_p AS DOUBLE))
            * (CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_p AS DOUBLE))) * CAST(t.ce_p AS DOUBLE)
          + CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_c AS DOUBLE))
            * (CAST(tot.n_train AS DOUBLE) / (2.0 * CAST(t.ct_c AS DOUBLE))) * CAST(t.ce_c AS DOUBLE)) AS ess
FROM tot CROSS JOIN t
"""


@register(
    "events_ips_offpolicy",
    oracle=_IPS_ORACLE,
    doc="off-policy evaluation of a uniform purchase/click target policy "
    "via IPS, self-normalized IPS, and effective sample size: empirical "
    "propensities from a salted-hash train split, value estimated on the "
    "disjoint eval split, everything from per-action-type cells (exact "
    "counts + decimal cent sums) through identical double trees.",
    tags=("events", "counterfactual", "off-policy", "extension"),
)
def events_ips_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one pass, one |event-types|-cell aggregate with map-side
    combine; the estimator math runs over <= 5 cells."""
    e = load_table(spark, sf_dir, "events")
    tagged = e.select(
        "event_type",
        (spark_salted_hash("event_id", ":ips") % 2).alias("split"),
        _cents(F.col("value")).alias("v"),
    )
    cells = tagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("split") == 0, 1).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(F.col("split") == 1, 1).otherwise(0)).cast("long").alias("ce"),
        # summand cast BEFORE the sum: the accumulator is decimal end-to-end
        # (a long accumulator would wrap silently at extreme scale while the
        # oracle's BIGINT sum spills to exact HUGEINT — ADVICE r6)
        F.sum(
            F.when(
                F.col("split") == 1, F.col("v").cast("decimal(18,0)")
            ).otherwise(F.lit(0).cast("decimal(18,0)"))
        )
        .cast("decimal(38,0)")
        .alias("sv"),
    )
    t = cells.agg(
        F.sum("ct").cast("long").alias("n_train"),
        F.sum("ce").cast("long").alias("n_eval"),
        F.max(F.when(F.col("event_type") == IPS_TARGET[0], F.col("ct"))).alias("ct_p"),
        F.max(F.when(F.col("event_type") == IPS_TARGET[0], F.col("ce"))).alias("ce_p"),
        F.max(F.when(F.col("event_type") == IPS_TARGET[0], F.col("sv"))).alias("sv_p"),
        F.max(F.when(F.col("event_type") == IPS_TARGET[1], F.col("ct"))).alias("ct_c"),
        F.max(F.when(F.col("event_type") == IPS_TARGET[1], F.col("ce"))).alias("ce_c"),
        F.max(F.when(F.col("event_type") == IPS_TARGET[1], F.col("sv"))).alias("sv_c"),
    )
    ntr = F.col("n_train").cast("double")
    w_p = ntr / (F.lit(2.0) * F.col("ct_p").cast("double"))
    w_c = ntr / (F.lit(2.0) * F.col("ct_c").cast("double"))
    wv = w_p * (F.col("sv_p").cast("double") / F.lit(100.0)) + w_c * (
        F.col("sv_c").cast("double") / F.lit(100.0)
    )
    sumw = w_p * F.col("ce_p").cast("double") + w_c * F.col("ce_c").cast("double")
    sumw2 = w_p * w_p * F.col("ce_p").cast("double") + w_c * w_c * F.col(
        "ce_c"
    ).cast("double")
    return t.select(
        "n_train",
        "n_eval",
        (wv / F.col("n_eval").cast("double")).alias("ips_value"),
        (wv / sumw).alias("snips_value"),
        (sumw * sumw / sumw2).alias("ess"),
    )


# wire the kappa composed oracle (the scoring/filtering imports above the
# propensity section already registered the sub-oracles)
from f1_lakehouse_spark.registry import REGISTRY as _REG6  # noqa: E402

_REG6["scoring_cohens_kappa"].oracle = _KAPPA_ORACLE.format(
    score_q=_REG6["scoring_hashed_linear_quality"].oracle,
    label_q=_REG6["quality_gopher_repetition"].oracle,
)


# --- empirical-Bayes shrinkage of per-supplier return rates ---------------------------------
# The small-sample-honest point estimate to pair with the Wilson-bound
# RANKING (supplier_return_rate_wilson): shrink each supplier's raw
# return rate toward the pooled rate with a fixed-strength beta prior —
# posterior = (x_i + M*pbar) / (n_i + M), the additive-smoothing /
# beta-binomial shape every rate dashboard needs once per-unit counts get
# small. pbar = X/N is an exact integer ratio; every posterior is a
# per-row double tree over exact counts — no cross-supplier float sums,
# so the op is deterministic at any supplier cardinality (a method-of-
# moments prior would need exactly such a sum; the fixed-M prior is the
# scale-safe variant). Output: the top movers — suppliers the shrinkage
# corrects hardest — via TakeOrdered on |raw - posterior|.

EB_PRIOR_M = 50  # prior strength in pseudo-lines (fixed literal)
_EB_K = 15

_EB_ORACLE = f"""
WITH per AS (
  SELECT l_suppkey,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returns
  FROM lineitem GROUP BY l_suppkey
), tot AS (
  SELECT CAST(SUM(n_lines) AS BIGINT) AS nn, CAST(SUM(n_returns) AS BIGINT) AS xx FROM per
)
SELECT p.l_suppkey AS s_suppkey, p.n_lines, p.n_returns,
       CAST(p.n_returns AS DOUBLE) / CAST(p.n_lines AS DOUBLE) AS raw_rate,
       CAST(t.xx AS DOUBLE) / CAST(t.nn AS DOUBLE) AS pooled_rate,
       (CAST(p.n_returns AS DOUBLE) + {EB_PRIOR_M}.0 * (CAST(t.xx AS DOUBLE) / CAST(t.nn AS DOUBLE)))
         / (CAST(p.n_lines AS DOUBLE) + {EB_PRIOR_M}.0) AS shrunk_rate,
       abs(CAST(p.n_returns AS DOUBLE) / CAST(p.n_lines AS DOUBLE)
           - (CAST(p.n_returns AS DOUBLE) + {EB_PRIOR_M}.0 * (CAST(t.xx AS DOUBLE) / CAST(t.nn AS DOUBLE)))
             / (CAST(p.n_lines AS DOUBLE) + {EB_PRIOR_M}.0)) AS shrinkage
FROM per p CROSS JOIN tot t
ORDER BY abs(CAST(p.n_returns AS DOUBLE) / CAST(p.n_lines AS DOUBLE)
             - (CAST(p.n_returns AS DOUBLE) + {EB_PRIOR_M}.0 * (CAST(t.xx AS DOUBLE) / CAST(t.nn AS DOUBLE)))
               / (CAST(p.n_lines AS DOUBLE) + {EB_PRIOR_M}.0)) DESC, p.l_suppkey ASC
LIMIT {_EB_K}
"""


@register(
    "supplier_eb_rate_shrinkage",
    oracle=_EB_ORACLE,
    doc=f"fixed-strength (M={EB_PRIOR_M}) beta-prior shrinkage of "
    "per-supplier return rates toward the pooled rate: exact integer "
    "counts, per-row double trees (no cross-supplier float sums — "
    "deterministic at any cardinality), top movers by |raw - posterior| "
    "via TakeOrdered.",
    tags=("stats", "bayes", "shrinkage", "extension"),
)
def supplier_eb_rate_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one map-side-combined supplier aggregate + a 1-row pooled
    broadcast + TakeOrdered — no global sort, no float accumulation."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_suppkey").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("n_returns"),
    )
    per = per.persist()
    per.count()  # two derived uses (pooled totals + per-row posteriors)
    tot = per.agg(
        F.sum("n_lines").cast("long").alias("nn"),
        F.sum("n_returns").cast("long").alias("xx"),
    )
    m = F.lit(float(EB_PRIOR_M))
    raw = F.col("n_returns").cast("double") / F.col("n_lines").cast("double")
    pooled = F.col("xx").cast("double") / F.col("nn").cast("double")
    shrunk = (F.col("n_returns").cast("double") + m * pooled) / (
        F.col("n_lines").cast("double") + m
    )
    out = (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "n_lines",
            "n_returns",
            raw.alias("raw_rate"),
            pooled.alias("pooled_rate"),
            shrunk.alias("shrunk_rate"),
            F.abs(raw - shrunk).alias("shrinkage"),
        )
        .orderBy(F.col("shrinkage").desc(), F.col("s_suppkey").asc())
        .limit(_EB_K)
    )
    out = pin_small_result(out, _EB_K)
    per.unpersist()
    return out


# --- post-stratified A/B lift ------------------------------------------------------------
# The variance-reduction companion to CUPED: stratify users by their
# pre-period activity (log2 bucket of first-half event count — a
# pre-treatment covariate under the hash assignment), estimate the lift
# as the stratum-share-weighted mean difference, and report the
# variance-reduction ratio vs the unstratified estimator. Strata are
# log2 buckets (<= ~20 cells at ANY scale), so the cross-stratum sums
# fold over ONE packed array in bucket order — the calendar-bounded fold
# discipline applied to a bounded covariate domain. Sufficient statistics
# per (stratum, arm) are exact decimal cents.

_PS_ORACLE = f"""
WITH bounds AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events
), users AS (
  SELECT user_id,
         {sql_salted_hash("user_id", ":ps")} % 2 AS arm,
         CAST(SUM(CASE WHEN epoch_us(ts) < b.mid THEN 1 ELSE 0 END) AS BIGINT) AS pre_n,
         CAST(SUM(CASE WHEN epoch_us(ts) >= b.mid THEN {_SQL_CENTS} ELSE 0 END) AS BIGINT) AS post_cents
  FROM events CROSS JOIN bounds b GROUP BY 1, 2
), strat AS (
  SELECT CASE WHEN pre_n <= 0 THEN -1
              ELSE CAST(length(bin(pre_n)) - 1 AS BIGINT) END AS stratum,
         arm, pre_n, post_cents
  FROM users
), cells AS (
  SELECT stratum,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN arm = 1 THEN post_cents ELSE 0 END) AS DECIMAL(38,0)) AS st,
         CAST(SUM(CASE WHEN arm = 0 THEN post_cents ELSE 0 END) AS DECIMAL(38,0)) AS sc
  FROM strat GROUP BY stratum
  HAVING SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) > 0
     AND SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) > 0
), packed AS (
  SELECT list(struct_pack(stratum := stratum, nt := nt, nc := nc,
                          st := st, sc := sc) ORDER BY stratum) AS arr
  FROM cells
), folded AS (
  SELECT len(arr) AS n_strata,
         list_reduce(list_prepend([CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
           list_transform(arr, c -> [
             CAST(c.nt + c.nc AS DOUBLE),
             CAST(c.nt + c.nc AS DOUBLE)
               * (CAST(c.st AS DOUBLE) / 100.0 / CAST(c.nt AS DOUBLE)
                  - CAST(c.sc AS DOUBLE) / 100.0 / CAST(c.nc AS DOUBLE)),
             CAST(0.0 AS DOUBLE)])),
           (a, b) -> [a[1] + b[1], a[2] + b[2], CAST(0.0 AS DOUBLE)]) AS f
  FROM packed
), unstrat AS (
  SELECT CAST(SUM(CASE WHEN arm = 1 THEN post_cents ELSE 0 END) AS DECIMAL(38,0)) AS st,
         CAST(SUM(CASE WHEN arm = 0 THEN post_cents ELSE 0 END) AS DECIMAL(38,0)) AS sc,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc
  FROM strat
)
SELECT f.n_strata,
       u.nt AS n_treat, u.nc AS n_control,
       CAST(u.st AS DOUBLE) / 100.0 / CAST(u.nt AS DOUBLE)
         - CAST(u.sc AS DOUBLE) / 100.0 / CAST(u.nc AS DOUBLE) AS lift_unstratified,
       f.f[2] / f.f[1] AS lift_poststratified
FROM folded f CROSS JOIN unstrat u
"""


@register(
    "events_poststratified_lift",
    oracle=_PS_ORACLE,
    doc="post-stratified A/B lift (the design-based variance-reduction "
    "companion to CUPED): strata = log2 buckets of pre-period activity "
    "(bounded domain at any scale), stratum-share-weighted mean "
    "difference folded over ONE bucket-ordered packed array, exact "
    "decimal cents per (stratum, arm) cell.",
    tags=("events", "experiment", "variance-reduction", "extension"),
)
def events_poststratified_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one user aggregate + one <=~20-cell stratum aggregate; the
    weighted fold runs over the packed bounded-domain array."""
    e = load_table(spark, sf_dir, "events")
    mid_row = e.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("mid")
    ).collect()[0]
    mid = int(mid_row["mid"])
    users = e.groupBy("user_id").agg(
        F.sum(F.when(F.unix_micros("ts") < mid, 1).otherwise(0))
        .cast("long")
        .alias("pre_n"),
        F.sum(
            F.when(F.unix_micros("ts") >= mid, _cents(F.col("value"))).otherwise(0)
        )
        .cast("long")
        .alias("post_cents"),
    ).select(
        (spark_salted_hash("user_id", ":ps") % 2).alias("arm"),
        "pre_n",
        "post_cents",
    )
    strat = users.select(
        F.when(F.col("pre_n") <= 0, F.lit(-1))
        .otherwise((F.length(F.bin("pre_n")) - 1).cast("long"))
        .alias("stratum"),
        "arm",
        "post_cents",
    )
    strat = strat.persist()
    strat.count()  # two derived uses (stratified cells + unstratified totals)
    cells = (
        strat.groupBy("stratum")
        .agg(
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("nt"),
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("nc"),
            F.sum(
                F.when(
                    F.col("arm") == 1, F.col("post_cents").cast("decimal(18,0)")
                ).otherwise(F.lit(0).cast("decimal(18,0)"))
            )
            .cast("decimal(38,0)")
            .alias("st"),
            F.sum(
                F.when(
                    F.col("arm") == 0, F.col("post_cents").cast("decimal(18,0)")
                ).otherwise(F.lit(0).cast("decimal(18,0)"))
            )
            .cast("decimal(38,0)")
            .alias("sc"),
        )
        .where((F.col("nt") > 0) & (F.col("nc") > 0))
    )
    packed = cells.agg(
        F.sort_array(F.collect_list(F.struct("stratum", "nt", "nc", "st", "sc"))).alias(
            "arr"
        )
    )
    folded = packed.select(
        F.size("arr").cast("long").alias("n_strata"),
        F.aggregate(
            F.transform(
                "arr",
                lambda c: F.array(
                    (c["nt"] + c["nc"]).cast("double"),
                    (c["nt"] + c["nc"]).cast("double")
                    * (
                        c["st"].cast("double") / F.lit(100.0) / c["nt"].cast("double")
                        - c["sc"].cast("double") / F.lit(100.0) / c["nc"].cast("double")
                    ),
                    F.lit(0.0),
                ),
            ),
            F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0)),
            lambda a, b: F.array(
                F.element_at(a, 1) + F.element_at(b, 1),
                F.element_at(a, 2) + F.element_at(b, 2),
                F.lit(0.0),
            ),
        ).alias("f"),
    )
    unstrat = strat.agg(
        F.sum(
            F.when(
                F.col("arm") == 1, F.col("post_cents").cast("decimal(18,0)")
            ).otherwise(F.lit(0).cast("decimal(18,0)"))
        )
        .cast("decimal(38,0)")
        .alias("st"),
        F.sum(
            F.when(
                F.col("arm") == 0, F.col("post_cents").cast("decimal(18,0)")
            ).otherwise(F.lit(0).cast("decimal(18,0)"))
        )
        .cast("decimal(38,0)")
        .alias("sc"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("nt"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("nc"),
    )
    out = folded.crossJoin(F.broadcast(unstrat)).select(
        "n_strata",
        F.col("nt").alias("n_treat"),
        F.col("nc").alias("n_control"),
        (
            F.col("st").cast("double") / F.lit(100.0) / F.col("nt").cast("double")
            - F.col("sc").cast("double") / F.lit(100.0) / F.col("nc").cast("double")
        ).alias("lift_unstratified"),
        (F.element_at("f", 2) / F.element_at("f", 1)).alias("lift_poststratified"),
    )
    out = pin_small_result(out, 16)
    strat.unpersist()
    return out


# --- grouped quantile sketch with per-group accuracy contracts ------------------------------
# The production generalization of orders_quantile_sketch_contract: one
# MERGEABLE fixed-width histogram per nation (grouped per-partition
# histograms sum — a single map-side-combined (nation, bin) aggregate),
# per-nation p50/p90 estimates from the bin cumulative, and the same
# deterministic 0 <= est - exact <= width-1 contract pinned per (nation,
# q). Bin edges are GLOBAL (one 1-row min/max) so every group's sketch is
# mergeable with every other's — the property that lets a 1000-executor
# rollup combine sketches across any regrouping. The exact audit
# quantiles use nation-partitioned windows — group-bounded (25 nations),
# never a global single-partition window.

GQ_BINS = 2048
GQ_QS = ((1, 2), (9, 10))

_GQ_ORACLE = f"""
WITH v AS (
  SELECT c.c_nationkey AS nk,
         CAST(CAST(round(o.o_totalprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         o.o_orderkey
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), mm AS (
  SELECT MIN(c) AS lo, (MAX(c) - MIN(c) + {GQ_BINS}) // {GQ_BINS} AS w FROM v
), hist AS (
  SELECT v.nk, (v.c - mm.lo) // mm.w AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM v CROSS JOIN mm GROUP BY 1, 2
), cum AS (
  SELECT nk, bin, CAST(SUM(cnt) OVER (PARTITION BY nk ORDER BY bin) AS BIGINT) AS cc
  FROM hist
), nn AS (
  SELECT nk, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY nk
), ks AS (
  SELECT nn.nk, t.qn, t.qd, (nn.n * t.qn + t.qd - 1) // t.qd AS k
  FROM nn CROSS JOIN (VALUES {", ".join(f"({qn}, {qd})" for qn, qd in GQ_QS)}) AS t(qn, qd)
), est AS (
  SELECT k.nk, k.qn, k.qd, mm.lo + (MIN(c2.bin) + 1) * mm.w - 1 AS est_c, mm.w
  FROM ks k JOIN cum c2 ON c2.nk = k.nk AND c2.cc >= k.k CROSS JOIN mm
  GROUP BY k.nk, k.qn, k.qd, mm.lo, mm.w
), ranked AS (
  SELECT nk, c,
         CAST(ROW_NUMBER() OVER (PARTITION BY nk ORDER BY c, o_orderkey) AS BIGINT) AS rk
  FROM v
), exact AS (
  SELECT k.nk, k.qn, k.qd, MIN(r.c) AS exact_c
  FROM ks k JOIN ranked r ON r.nk = k.nk AND r.rk = k.k
  GROUP BY k.nk, k.qn, k.qd
)
SELECT e.nk AS nationkey,
       CAST(e.qn AS DOUBLE) / CAST(e.qd AS DOUBLE) AS q,
       e.est_c AS est_cents,
       x.exact_c AS exact_cents,
       e.w AS bin_width,
       (e.est_c - x.exact_c BETWEEN 0 AND e.w - 1) AS within_bound
FROM est e JOIN exact x ON e.nk = x.nk AND e.qn = x.qn AND e.qd = x.qd
"""


@register(
    "nation_grouped_quantile_sketch",
    oracle=_GQ_ORACLE,
    doc="per-nation mergeable histogram quantile sketch (global bin "
    "edges, one map-side-combined (nation, bin) aggregate) with the "
    "0 <= est - exact <= width-1 contract pinned per (nation, q); exact "
    "audit quantiles via nation-partitioned (group-bounded) windows.",
    tags=("stats", "sketch", "quantile", "grouped", "extension"),
)
def nation_grouped_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: histogram cells cap at |nations| x GQ_BINS regardless of
    rows; the cumulative and the exact-rank windows partition by nation
    (25 groups — bounded, never a single global partition); estimates
    and audit join on (nation, bin)-sized frames only."""
    from pyspark.sql import Window  # noqa: PLC0415

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    v = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_nationkey").alias("nk"),
        (F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c"),
        "o_orderkey",
    )
    v = v.persist()
    mm = v.agg(F.min("c").alias("lo"), F.max("c").alias("hi")).collect()[0]
    lo, hi = int(mm["lo"]), int(mm["hi"])
    w = (hi - lo + GQ_BINS) // GQ_BINS
    hist = v.groupBy("nk", F.expr(f"(c - {lo}) div {w}").alias("bin")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    wcum = Window.partitionBy("nk").orderBy("bin")
    cum = hist.withColumn(
        "cc", F.sum("cnt").over(wcum).cast("long")
    ).select("nk", "bin", "cc")
    nn = v.groupBy("nk").agg(F.count("*").cast("long").alias("n"))
    qframe = spark.createDataFrame(list(GQ_QS), "qn long, qd long")
    ks = nn.crossJoin(F.broadcast(qframe)).select(
        "nk",
        "qn",
        "qd",
        ((F.col("n") * F.col("qn") + F.col("qd") - 1) / F.col("qd"))
        .cast("long")
        .alias("k"),
    )
    est = (
        ks.join(cum, (ks["nk"] == cum["nk"]) & (cum["cc"] >= ks["k"]))
        .groupBy(ks["nk"].alias("e_nk"), "qn", "qd")
        .agg((F.lit(lo) + (F.min("bin") + 1) * F.lit(w) - 1).alias("est_c"))
    )
    wrk = Window.partitionBy("nk").orderBy("c", "o_orderkey")
    ranked = v.withColumn("rk", F.row_number().over(wrk).cast("long"))
    exact = (
        ks.join(ranked, (ks["nk"] == ranked["nk"]) & (ranked["rk"] == ks["k"]))
        .groupBy(ks["nk"].alias("x_nk"), ks["qn"].alias("x_qn"), ks["qd"].alias("x_qd"))
        .agg(F.min("c").alias("exact_c"))
    )
    out = (
        est.join(
            exact,
            (F.col("e_nk") == F.col("x_nk"))
            & (F.col("qn") == F.col("x_qn"))
            & (F.col("qd") == F.col("x_qd")),
        )
        .select(
            F.col("e_nk").alias("nationkey"),
            (F.col("qn").cast("double") / F.col("qd").cast("double")).alias("q"),
            "est_c",
            "exact_c",
            F.lit(w).cast("long").alias("bin_width"),
            (
                (F.col("est_c") - F.col("exact_c") >= 0)
                & (F.col("est_c") - F.col("exact_c") <= w - 1)
            ).alias("within_bound"),
        )
        .withColumnRenamed("est_c", "est_cents")
        .withColumnRenamed("exact_c", "exact_cents")
    )
    out = pin_small_result(out, 25 * len(GQ_QS) * 2)
    v.unpersist()
    return out


# --- minimum detectable effect (experiment power planning) ---------------------------------
# "How small a lift could the purchase-value experiment detect at 80%
# power?" — the planning readout every A/B program computes before
# launching: MDE = (z_alpha/2 + z_beta) * sqrt(var_a/n_a + var_b/n_b),
# from the same six exact sufficient statistics as the Welch test. z
# values are shared dyadic-free literals (the standard 1.959964 /
# 0.841621 — both engines parse the same decimal literal to the same
# double); everything else is the identical double tree discipline.

_MDE_Z_ALPHA = "1.959964"  # two-sided 5%
_MDE_Z_BETA = "0.841621"   # 80% power

_MDE_ORACLE = f"""
WITH per AS (
  SELECT {sql_salted_hash("user_id", ":ks")} % 2 AS g, {_SQL_CENTS} AS v
  FROM events WHERE event_type = 'purchase'
), s AS (
  SELECT
    CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN g = 0 THEN v ELSE 0 END) AS DECIMAL(38,0)) AS s_a,
    CAST(SUM(CASE WHEN g = 1 THEN v ELSE 0 END) AS DECIMAL(38,0)) AS s_b,
    CAST(SUM(CASE WHEN g = 0 THEN CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)) ELSE 0 END) AS DECIMAL(38,0)) AS q_a,
    CAST(SUM(CASE WHEN g = 1 THEN CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)) ELSE 0 END) AS DECIMAL(38,0)) AS q_b
  FROM per
)
SELECT n_a, n_b,
       (CAST({_MDE_Z_ALPHA} AS DOUBLE) + CAST({_MDE_Z_BETA} AS DOUBLE))
         * sqrt(((CAST(q_a AS DOUBLE) - (CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)) / CAST(n_a AS DOUBLE)
                + ((CAST(q_b AS DOUBLE) - (CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)) / CAST(n_b AS DOUBLE)) AS mde_cents,
       (CAST({_MDE_Z_ALPHA} AS DOUBLE) + CAST({_MDE_Z_BETA} AS DOUBLE))
         * sqrt(((CAST(q_a AS DOUBLE) - (CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)) / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)) / CAST(n_a AS DOUBLE)
                + ((CAST(q_b AS DOUBLE) - (CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)) / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)) / CAST(n_b AS DOUBLE))
         / (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)) AS mde_relative
FROM s
"""


@register(
    "events_mde_power_analysis",
    oracle=_MDE_ORACLE,
    doc="minimum detectable effect at 5%/80% for the purchase-value "
    "experiment: (z_a + z_b) * SE from the Welch sufficient statistics "
    "— one 1-row aggregate, shared z literals, identical double trees; "
    "reported absolute (cents) and relative to the control mean.",
    tags=("events", "experiment", "power", "extension"),
)
def events_mde_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: identical shape to events_welch_ttest — one pass, one
    map-side-combined 1-row aggregate."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    per = e.select(
        (spark_salted_hash("user_id", ":ks") % 2).alias("g"),
        _cents(F.col("value")).alias("v"),
    )
    vd = F.col("v").cast("decimal(18,0)")
    s = per.agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("g") == 0, vd).otherwise(F.lit(0).cast("decimal(18,0)")))
        .cast("decimal(38,0)")
        .alias("s_a"),
        F.sum(F.when(F.col("g") == 1, vd).otherwise(F.lit(0).cast("decimal(18,0)")))
        .cast("decimal(38,0)")
        .alias("s_b"),
        F.sum(
            F.when(F.col("g") == 0, vd * vd).otherwise(F.lit(0).cast("decimal(37,0)"))
        )
        .cast("decimal(38,0)")
        .alias("q_a"),
        F.sum(
            F.when(F.col("g") == 1, vd * vd).otherwise(F.lit(0).cast("decimal(37,0)"))
        )
        .cast("decimal(38,0)")
        .alias("q_b"),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    var_a = (
        F.col("q_a").cast("double")
        - (F.col("s_a").cast("double") * F.col("s_a").cast("double")) / n_a
    ) / (n_a - F.lit(1.0))
    var_b = (
        F.col("q_b").cast("double")
        - (F.col("s_b").cast("double") * F.col("s_b").cast("double")) / n_b
    ) / (n_b - F.lit(1.0))
    zsum = F.lit(float(_MDE_Z_ALPHA)) + F.lit(float(_MDE_Z_BETA))
    mde = zsum * F.sqrt(var_a / n_a + var_b / n_b)
    return s.select(
        "n_a",
        "n_b",
        mde.alias("mde_cents"),
        (mde / (F.col("s_a").cast("double") / n_a)).alias("mde_relative"),
    )


# --- interrupted time series (segmented regression) ----------------------------------------
# The causal-inference companion to events_did_lift when there is no
# control group: fit separate OLS lines to monthly revenue BEFORE and
# AFTER the calendar-midpoint cutoff and report the level and slope
# discontinuities — the segmented-regression ITS readout. Month indexes
# are small integers and the cell sums are exact decimals, so both
# segments' normal equations (n, Σt, Σt², Σy, Σty) are exact; slopes /
# intercepts / changes are identical double trees. Spark keeps the
# Σt·y products exact via DECIMAL multiplication; DuckDB widens its
# operands to int128 (the CLAUDE.md trap-4 discipline).

_ITS_ORACLE = """
WITH monthly AS (
  SELECT (CAST(year(o_orderdate) AS BIGINT) * 12 + CAST(month(o_orderdate) AS BIGINT) - 1) AS ym0,
         CAST(SUM(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), mm AS (
  SELECT MIN(ym0) AS base, CAST(COUNT(*) AS BIGINT) AS n FROM monthly
), cells AS (
  SELECT m.ym0 - mm.base AS t, m.cents, (m.ym0 - mm.base >= mm.n // 2) AS post,
         mm.n // 2 AS t0
  FROM monthly m CROSS JOIN mm
), seg AS (
  SELECT
    CAST(SUM(CASE WHEN NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n0,
    CAST(SUM(CASE WHEN NOT post THEN t ELSE 0 END) AS BIGINT) AS st0,
    CAST(SUM(CASE WHEN NOT post THEN t * t ELSE 0 END) AS BIGINT) AS stt0,
    CAST(SUM(CASE WHEN NOT post THEN cents ELSE 0 END) AS DECIMAL(38,0)) AS sy0,
    CAST(SUM(CASE WHEN NOT post THEN CAST(t AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0)) ELSE 0 END) AS DECIMAL(38,0)) AS sty0,
    CAST(SUM(CASE WHEN post THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN post THEN t ELSE 0 END) AS BIGINT) AS st1,
    CAST(SUM(CASE WHEN post THEN t * t ELSE 0 END) AS BIGINT) AS stt1,
    CAST(SUM(CASE WHEN post THEN cents ELSE 0 END) AS DECIMAL(38,0)) AS sy1,
    CAST(SUM(CASE WHEN post THEN CAST(t AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0)) ELSE 0 END) AS DECIMAL(38,0)) AS sty1,
    MAX(t0) AS t0
  FROM cells
)
SELECT n0 AS n_pre, n1 AS n_post,
       (CAST(n0 AS DOUBLE) * CAST(sty0 AS DOUBLE) - CAST(st0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
         / (CAST(n0 AS DOUBLE) * CAST(stt0 AS DOUBLE) - CAST(st0 AS DOUBLE) * CAST(st0 AS DOUBLE)) / 100.0 AS slope_pre,
       (CAST(n1 AS DOUBLE) * CAST(sty1 AS DOUBLE) - CAST(st1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
         / (CAST(n1 AS DOUBLE) * CAST(stt1 AS DOUBLE) - CAST(st1 AS DOUBLE) * CAST(st1 AS DOUBLE)) / 100.0 AS slope_post,
       (CAST(sy0 AS DOUBLE) / 100.0
          - ((CAST(n0 AS DOUBLE) * CAST(sty0 AS DOUBLE) - CAST(st0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
             / (CAST(n0 AS DOUBLE) * CAST(stt0 AS DOUBLE) - CAST(st0 AS DOUBLE) * CAST(st0 AS DOUBLE)) / 100.0)
            * CAST(st0 AS DOUBLE)) / CAST(n0 AS DOUBLE) AS intercept_pre,
       (CAST(sy1 AS DOUBLE) / 100.0
          - ((CAST(n1 AS DOUBLE) * CAST(sty1 AS DOUBLE) - CAST(st1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
             / (CAST(n1 AS DOUBLE) * CAST(stt1 AS DOUBLE) - CAST(st1 AS DOUBLE) * CAST(st1 AS DOUBLE)) / 100.0)
            * CAST(st1 AS DOUBLE)) / CAST(n1 AS DOUBLE) AS intercept_post,
       ((CAST(sy1 AS DOUBLE) / 100.0
          - ((CAST(n1 AS DOUBLE) * CAST(sty1 AS DOUBLE) - CAST(st1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
             / (CAST(n1 AS DOUBLE) * CAST(stt1 AS DOUBLE) - CAST(st1 AS DOUBLE) * CAST(st1 AS DOUBLE)) / 100.0)
            * CAST(st1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
        + ((CAST(n1 AS DOUBLE) * CAST(sty1 AS DOUBLE) - CAST(st1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
           / (CAST(n1 AS DOUBLE) * CAST(stt1 AS DOUBLE) - CAST(st1 AS DOUBLE) * CAST(st1 AS DOUBLE)) / 100.0)
          * CAST(t0 AS DOUBLE))
       - ((CAST(sy0 AS DOUBLE) / 100.0
          - ((CAST(n0 AS DOUBLE) * CAST(sty0 AS DOUBLE) - CAST(st0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
             / (CAST(n0 AS DOUBLE) * CAST(stt0 AS DOUBLE) - CAST(st0 AS DOUBLE) * CAST(st0 AS DOUBLE)) / 100.0)
            * CAST(st0 AS DOUBLE)) / CAST(n0 AS DOUBLE)
        + ((CAST(n0 AS DOUBLE) * CAST(sty0 AS DOUBLE) - CAST(st0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
           / (CAST(n0 AS DOUBLE) * CAST(stt0 AS DOUBLE) - CAST(st0 AS DOUBLE) * CAST(st0 AS DOUBLE)) / 100.0)
          * CAST(t0 AS DOUBLE)) AS level_change,
       (CAST(n1 AS DOUBLE) * CAST(sty1 AS DOUBLE) - CAST(st1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
         / (CAST(n1 AS DOUBLE) * CAST(stt1 AS DOUBLE) - CAST(st1 AS DOUBLE) * CAST(st1 AS DOUBLE)) / 100.0
       - (CAST(n0 AS DOUBLE) * CAST(sty0 AS DOUBLE) - CAST(st0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
         / (CAST(n0 AS DOUBLE) * CAST(stt0 AS DOUBLE) - CAST(st0 AS DOUBLE) * CAST(st0 AS DOUBLE)) / 100.0 AS slope_change
FROM seg
"""


@register(
    "orders_interrupted_time_series",
    oracle=_ITS_ORACLE,
    doc="segmented-regression interrupted time series at the calendar "
    "midpoint: per-segment OLS from exact integer normal equations "
    "(month indexes x decimal cents), level and slope discontinuities "
    "at the cutoff — the no-control-group causal companion to DiD.",
    tags=("stats", "timeseries", "causal", "extension"),
)
def orders_interrupted_time_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one partial-aggregated shuffle to ~84 month cells, one
    1-row conditional aggregate — the cheapest causal readout."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    cents = (F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)") * 100).cast(
        "long"
    )
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
    monthly = monthly.persist()
    mm = monthly.agg(
        F.min("ym0").alias("base"), F.count("*").cast("long").alias("n")
    ).collect()[0]
    base, nm = int(mm["base"]), int(mm["n"])
    t0 = nm // 2
    cells = monthly.select(
        (F.col("ym0") - F.lit(base)).alias("t"),
        "cents",
        ((F.col("ym0") - F.lit(base)) >= F.lit(t0)).alias("post"),
    )
    td = F.col("t").cast("decimal(19,0)")
    cd = F.col("cents").cast("decimal(19,0)")
    zero38 = F.lit(0).cast("decimal(38,0)")

    def seg(post_val: bool, suffix: str):
        cond = F.col("post") if post_val else ~F.col("post")
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n{suffix}"),
            F.sum(F.when(cond, F.col("t")).otherwise(0)).cast("long").alias(f"st{suffix}"),
            F.sum(F.when(cond, F.col("t") * F.col("t")).otherwise(0))
            .cast("long")
            .alias(f"stt{suffix}"),
            F.sum(F.when(cond, F.col("cents")).otherwise(0))
            .cast("decimal(38,0)")
            .alias(f"sy{suffix}"),
            F.sum(F.when(cond, td * cd).otherwise(zero38))
            .cast("decimal(38,0)")
            .alias(f"sty{suffix}"),
        ]

    segf = cells.agg(*(seg(False, "0") + seg(True, "1")))

    def fit(suffix: str):
        n = F.col(f"n{suffix}").cast("double")
        st = F.col(f"st{suffix}").cast("double")
        stt = F.col(f"stt{suffix}").cast("double")
        sy = F.col(f"sy{suffix}").cast("double")
        sty = F.col(f"sty{suffix}").cast("double")
        slope = (n * sty - st * sy) / (n * stt - st * st) / F.lit(100.0)
        intercept = (sy / F.lit(100.0) - slope * st) / n
        return slope, intercept

    s0, i0 = fit("0")
    s1, i1 = fit("1")
    t0d = F.lit(float(t0))
    out = segf.select(
        F.col("n0").alias("n_pre"),
        F.col("n1").alias("n_post"),
        s0.alias("slope_pre"),
        s1.alias("slope_post"),
        i0.alias("intercept_pre"),
        i1.alias("intercept_post"),
        ((i1 + s1 * t0d) - (i0 + s0 * t0d)).alias("level_change"),
        (s1 - s0).alias("slope_change"),
    )
    out = pin_small_result(out, 16)
    monthly.unpersist()
    return out


# --- process capability index (Cp / Cpk) vs a baseline-year spec -----------------------------
# "Is daily revenue still inside the spec the process established in its
# first year?" — the Cpk drift audit: spec limits = baseline-year mean
# ± 3 baseline sigma (exact decimal sufficient statistics), capability of
# the FULL series against them. Two conditional aggregates in one pass;
# every ratio is an identical double tree; sqrt only.

_CPK_ORACLE = """
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS dc
  FROM orders GROUP BY 1, 2
), y0 AS (
  SELECT MIN(yr) AS yr0 FROM daily
), s AS (
  SELECT
    CAST(SUM(CASE WHEN d2.yr = y0.yr0 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
    CAST(SUM(CASE WHEN d2.yr = y0.yr0 THEN d2.dc ELSE 0 END) AS DECIMAL(38,0)) AS sb,
    CAST(SUM(CASE WHEN d2.yr = y0.yr0 THEN CAST(d2.dc AS DECIMAL(19,0)) * CAST(d2.dc AS DECIMAL(19,0)) ELSE 0 END) AS DECIMAL(38,0)) AS qb,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(d2.dc) AS DECIMAL(38,0)) AS sa,
    CAST(SUM(CAST(d2.dc AS DECIMAL(19,0)) * CAST(d2.dc AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS qa
  FROM daily d2 CROSS JOIN y0
), f AS (
  SELECT nb, n,
         CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
         sqrt((CAST(qb AS DOUBLE) - (CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0)) AS sigb,
         CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         sqrt((CAST(qa AS DOUBLE) - (CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS sig
  FROM s
)
SELECT nb AS n_baseline_days, n AS n_days,
       mb / 100.0 AS baseline_mean,
       sigb / 100.0 AS baseline_sigma,
       mu / 100.0 AS process_mean,
       sig / 100.0 AS process_sigma,
       ((mb + 3.0 * sigb) - (mb - 3.0 * sigb)) / (6.0 * sig) AS cp,
       least((mb + 3.0 * sigb) - mu, mu - (mb - 3.0 * sigb)) / (3.0 * sig) AS cpk
FROM f
"""


@register(
    "orders_cpk_capability",
    oracle=_CPK_ORACLE,
    doc="Cp/Cpk process capability of daily revenue against the baseline "
    "first-year spec (mean ± 3 sigma): exact decimal sufficient "
    "statistics from one conditional aggregate, identical double trees, "
    "sqrt only — the drift audit companion to the Shewhart chart.",
    tags=("stats", "quality-control", "extension"),
)
def orders_cpk_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one (day) partial-aggregated shuffle + one 1-row
    conditional aggregate — same class as the Welch shape."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    cents = (F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)") * 100).cast(
        "long"
    )
    daily = (
        o.select(
            F.col("o_orderdate").alias("d"),
            F.year("o_orderdate").cast("long").alias("yr"),
            cents.alias("c"),
        )
        .groupBy("d", "yr")
        .agg(F.sum("c").alias("dc"))
    )
    daily = daily.persist()
    yr0 = int(daily.agg(F.min("yr").alias("y")).collect()[0]["y"])
    dcd = F.col("dc").cast("decimal(19,0)")
    isb = F.col("yr") == yr0
    s = daily.agg(
        F.sum(F.when(isb, 1).otherwise(0)).cast("long").alias("nb"),
        F.sum(F.when(isb, F.col("dc")).otherwise(0)).cast("decimal(38,0)").alias("sb"),
        F.sum(F.when(isb, dcd * dcd).otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("decimal(38,0)")
        .alias("qb"),
        F.count("*").cast("long").alias("n"),
        F.sum("dc").cast("decimal(38,0)").alias("sa"),
        F.sum(dcd * dcd).cast("decimal(38,0)").alias("qa"),
    )
    nb = F.col("nb").cast("double")
    n = F.col("n").cast("double")
    mb = F.col("sb").cast("double") / nb
    sigb = F.sqrt(
        (
            F.col("qb").cast("double")
            - (F.col("sb").cast("double") * F.col("sb").cast("double")) / nb
        )
        / (nb - F.lit(1.0))
    )
    mu = F.col("sa").cast("double") / n
    sig = F.sqrt(
        (
            F.col("qa").cast("double")
            - (F.col("sa").cast("double") * F.col("sa").cast("double")) / n
        )
        / (n - F.lit(1.0))
    )
    usl = mb + F.lit(3.0) * sigb
    lsl = mb - F.lit(3.0) * sigb
    out = s.select(
        F.col("nb").alias("n_baseline_days"),
        F.col("n").alias("n_days"),
        (mb / F.lit(100.0)).alias("baseline_mean"),
        (sigb / F.lit(100.0)).alias("baseline_sigma"),
        (mu / F.lit(100.0)).alias("process_mean"),
        (sig / F.lit(100.0)).alias("process_sigma"),
        ((usl - lsl) / (F.lit(6.0) * sig)).alias("cp"),
        (F.least(usl - mu, mu - lsl) / (F.lit(3.0) * sig)).alias("cpk"),
    )
    out = pin_small_result(out, 16)
    daily.unpersist()
    return out
