"""Training-data curation operators over ``documents`` / ``embeddings``:
the steps between "deduped corpus" and "training shards" in an LLM data
pipeline — deterministic splits, stratified downsampling, per-source
quotas, token-length bucketing, sequence packing, class-balance weights.

All assignment decisions derive from md5-based integer hashing
(pipeline.hashing) so they are reproducible across engines, runs, and
cluster layouts — the property a training pipeline needs so a re-run
produces the same shards.

Scale notes (the 100 TB lens):
- split / bucketing are map-only (no shuffle).
- stratified sampling and source quotas use per-group ROW_NUMBER windows;
  group keys (lang, source) are low-cardinality so the partitions are the
  skew risk — at real scale you pre-filter with a per-group hash threshold
  (keep hash < K/N_g quantile) before the exact window, shrinking the
  window input to ~K rows per group. The exact window IS the semantics;
  the pre-filter is an optimization that does not change the result.
- sequence packing is inherently order-dependent, so it is parallelized
  the way production packers do it: the corpus is hash-sharded and each
  shard packs independently (cumsum window per shard) — shard count scales
  with the cluster, no global ordering anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_lakehouse_spark.pipeline.hashing import (
    spark_md5_hash48,
    spark_salted_hash,
    sql_md5_hash48,
    sql_salted_hash,
)
from f1_lakehouse_spark.pipeline.text import SQL_WORD_TRIGRAMS_CTE
from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table

TRAIN_PCT = 80
VAL_PCT = 10  # test = remainder
STRATA_K = 40  # stratified sample: keep K docs per lang
SOURCE_QUOTA = 10  # per-source document cap
PACK_WINDOW = 512  # context-window token budget per packed sequence
# bin_id uses an exact integer shift; keep the two in lockstep
PACK_SHIFT = PACK_WINDOW.bit_length() - 1
assert PACK_WINDOW == 1 << PACK_SHIFT
PACK_SHARDS = 8  # independent packing shards


# the 0..99 split bucket of a doc id, salted with a constant tag so the
# split is independent of any other hash-derived decision on the same key.
# (The Spark twin is built lazily inside the query fn — Column construction
# needs an active session; SQL strings don't.)
_SPLIT_SQL = sql_md5_hash48("CAST(doc_id AS VARCHAR) || ':split'") + " % 100"




@register(
    "curation_train_val_test_split",
    oracle=f"""
SELECT doc_id,
       CASE WHEN {_SPLIT_SQL} < {TRAIN_PCT} THEN 'train'
            WHEN {_SPLIT_SQL} < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    doc="deterministic hash-based train/val/test assignment (80/10/10): "
    "reproducible across engines and cluster layouts, map-only at scale",
    tags=("pipeline", "curation", "split"),
)
def curation_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = spark_salted_hash("doc_id", ":split") % 100
    return d.select(
        "doc_id",
        F.when(h < TRAIN_PCT, "train")
        .when(h < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "curation_stratified_sample",
    oracle=f"""
SELECT doc_id, lang, rk FROM (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {sql_md5_hash48("CAST(doc_id AS VARCHAR) || ':strat'")},
                        doc_id) AS rk
    FROM documents
) WHERE rk <= {STRATA_K}
""",
    doc=f"stratified downsample: keep {STRATA_K} docs per lang, chosen by "
    "deterministic hash order (uniform within stratum, reproducible); "
    "doc_id tiebreaker makes the window a total order",
    tags=("pipeline", "curation", "sample"),
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = spark_salted_hash("doc_id", ":strat")
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= STRATA_K)
    )


@register(
    "curation_source_quota",
    oracle=f"""
SELECT source, doc_id, rk FROM (
    SELECT source, doc_id,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {sql_md5_hash48("CAST(doc_id AS VARCHAR) || ':quota'")},
                        doc_id) AS rk
    FROM documents
) WHERE rk <= {SOURCE_QUOTA}
""",
    doc=f"per-source quota: keep at most {SOURCE_QUOTA} docs per source "
    "(domain-cap / anti-overrepresentation step), hash-ordered so the "
    "kept subset is unbiased and reproducible",
    tags=("pipeline", "curation", "quota"),
)
def curation_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = spark_salted_hash("doc_id", ":quota")
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= SOURCE_QUOTA)
    )


# whitespace token count — matches text.text_token_count's convention
_SQL_NTOK = "len(string_split(text, ' '))"


@register(
    "curation_token_length_buckets",
    oracle=f"""
SELECT CASE WHEN {_SQL_NTOK} < 16 THEN '<16'
            WHEN {_SQL_NTOK} < 32 THEN '16-31'
            WHEN {_SQL_NTOK} < 64 THEN '32-63'
            WHEN {_SQL_NTOK} < 128 THEN '64-127'
            WHEN {_SQL_NTOK} < 256 THEN '128-255'
            ELSE '256+' END AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM({_SQL_NTOK}) AS BIGINT) AS total_tokens
FROM documents GROUP BY 1
""",
    doc="token-length histogram over power-of-two buckets — the batch-shape "
    "statistic packing/batching decisions read; one scan + tiny aggregate",
    tags=("pipeline", "curation", "stats"),
)
def curation_token_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " ")).cast("long")
    bucket = (
        F.when(ntok < 16, "<16")
        .when(ntok < 32, "16-31")
        .when(ntok < 64, "32-63")
        .when(ntok < 128, "64-127")
        .when(ntok < 256, "128-255")
        .otherwise("256+")
    )
    return (
        d.select(bucket.alias("bucket"), ntok.alias("ntok"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").alias("total_tokens"),
        )
    )


@register(
    "curation_pack_sequences",
    oracle=f"""
WITH toks AS (
    SELECT doc_id,
           {sql_md5_hash48("CAST(doc_id AS VARCHAR) || ':shard'")} % {PACK_SHARDS}
               AS shard,
           CAST({_SQL_NTOK} AS BIGINT) AS n_tokens
    FROM documents
),
packed AS (
    SELECT doc_id, shard, n_tokens,
           CAST((SUM(n_tokens) OVER (
                     PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens) // {PACK_WINDOW} AS BIGINT) AS bin_id
    FROM toks
)
SELECT doc_id, shard, n_tokens, bin_id FROM packed
""",
    doc=f"sequence packing: corpus hash-sharded {PACK_SHARDS} ways, each "
    f"shard packs docs into {PACK_WINDOW}-token bins by exclusive running "
    "sum — the contiguous-packing shape production packers parallelize "
    "by shard (no global ordering; shard count scales with the cluster)",
    tags=("pipeline", "curation", "packing"),
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    shard = (
        spark_md5_hash48(F.concat(F.col("doc_id").cast("string"), F.lit(":shard")))
        % PACK_SHARDS
    )
    toks = d.select(
        "doc_id",
        shard.alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    excl_cumsum = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        # integer division via shift (PACK_WINDOW = 2^9), not
        # floor(double /): the running token sum can pass 2^53 at corpus
        # scale, where double division drifts off the oracle's exact `//`
        F.shiftright(excl_cumsum, PACK_SHIFT).cast("long").alias("bin_id"),
    )


# --- weighted priority sampling ------------------------------------------------------
# Priority sampling (Duffield, Lund & Thorup): each item gets priority
# q_i = w_i / u_i with u_i uniform(0,1]; the k items with the largest q form
# an (approximately) weight-proportional sample without replacement, with
# unbiased subset-sum estimators. Determinism across engines: u is the
# 48-bit md5 hash (+1 to avoid zero), and q is computed in INTEGER
# arithmetic as (w * 2^48) div (h + 1) — exact int64 in both engines (the
# token weights here keep w * 2^48 far below 2^63), so the ordering can
# never drift by a float ulp.

PRIORITY_K = 50


@register(
    "curation_priority_sample",
    oracle=f"""
WITH prio AS (
    SELECT doc_id,
           CAST({_SQL_NTOK} AS BIGINT) AS n_tokens,
           (CAST({_SQL_NTOK} AS BIGINT) * {1 << 48})
               // ({sql_md5_hash48("CAST(doc_id AS VARCHAR) || ':prio'")} + 1)
               AS priority
    FROM documents
)
SELECT doc_id, n_tokens, priority, rk FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS rk
    FROM prio
) WHERE rk <= {PRIORITY_K}
""",
    doc=f"weighted priority sample (Duffield-Lund-Thorup): q = w/u with "
    "integer-exact q = (n_tokens * 2^48) div (hash48 + 1); top-"
    f"{PRIORITY_K} by q — longer docs proportionally likelier, "
    "reproducible across engines; top-k is TakeOrderedAndProject, the "
    "rank window runs over only the k survivors",
    tags=("pipeline", "curation", "sample"),
)
def curation_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " ")).cast("long")
    h = spark_salted_hash("doc_id", ":prio")
    prio = d.select(
        "doc_id", ntok.alias("n_tokens"), (h + F.lit(1)).alias("hp")
    ).select(
        "doc_id",
        "n_tokens",
        F.expr(f"(n_tokens * {1 << 48}) div hp").alias("priority"),
    )
    # distributed top-k (TakeOrderedAndProject), THEN rank the k-row result —
    # the global window never sees more than PRIORITY_K rows
    topk = prio.orderBy(F.col("priority").desc(), F.col("doc_id").asc()).limit(
        PRIORITY_K
    )
    w = Window.orderBy(F.col("priority").desc(), F.col("doc_id").asc())
    return topk.select(
        "doc_id", "n_tokens", "priority", F.row_number().over(w).alias("rk")
    )


# --- deterministic global shuffle + sharding -----------------------------------------
# The "epoch shuffle" a training pipeline runs before writing shards: every
# doc gets a pseudorandom position, independent of input order, identical
# on every re-run. Shard = hash band (not round-robin) so assignment needs
# no global coordination; position ranks within shard — each shard's window
# is independent, so parallelism scales with the shard count. The writer
# twin is `repartition(N, shard) + sortWithinPartitions(hkey)` into one
# file per shard.

N_SHUFFLE_SHARDS = 16


@register(
    "curation_global_shuffle_shard",
    oracle=f"""
SELECT doc_id, shard, pos FROM (
    SELECT doc_id,
           hkey % {N_SHUFFLE_SHARDS} AS shard,
           ROW_NUMBER() OVER (PARTITION BY hkey % {N_SHUFFLE_SHARDS}
                              ORDER BY hkey, doc_id) AS pos
    FROM (SELECT doc_id,
                 {sql_md5_hash48("CAST(doc_id AS VARCHAR) || ':shuffle'")}
                     AS hkey
          FROM documents)
)
""",
    doc=f"deterministic epoch shuffle: hash-derived pseudorandom order, "
    f"{N_SHUFFLE_SHARDS} hash-band shards, per-shard position — "
    "reproducible training-data ordering with per-shard (not global) "
    "sort windows",
    tags=("pipeline", "curation", "shuffle"),
)
def curation_global_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = spark_salted_hash("doc_id", ":shuffle")
    base = d.select(
        "doc_id", (h % N_SHUFFLE_SHARDS).alias("shard"), h.alias("hkey")
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("hkey").asc(), F.col("doc_id").asc()
    )
    return base.select(
        "doc_id", "shard", F.row_number().over(w).alias("pos")
    )


# --- temperature-scaled domain mixture ----------------------------------------------
# The multilingual/multi-domain sampling recipe (alpha-temperature mixing,
# alpha=0.5): p_source ∝ n_source^alpha, flattening the head and boosting
# the tail. Determinism across engines: sqrt is IEEE-correctly-rounded in
# both (bit-identical), per-source sqrt is rounded to 9 decimals and summed
# through DECIMAL so the denominator is order-independent, and the final
# ratio is a double division of identical inputs.


@register(
    "curation_domain_mixture",
    oracle="""
WITH counts AS (
    SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
),
scaled AS (
    SELECT source, n_docs,
           CAST(round(sqrt(CAST(n_docs AS DOUBLE)), 9) AS DECIMAL(28, 9)) AS s
    FROM counts
),
tot AS (SELECT SUM(s) AS total FROM scaled)
SELECT c.source, c.n_docs,
       round(CAST(c.s AS DOUBLE) / CAST(t.total AS DOUBLE), 9) AS mix_weight
FROM scaled c, tot t
""",
    doc="temperature-scaled (alpha=0.5) domain-mixture weights per source: "
    "p ∝ sqrt(n) / sum(sqrt(n)) — head-flattening sampling table; two tiny "
    "aggregates, decimal-summed denominator for order independence",
    tags=("pipeline", "curation", "mixture"),
)
def curation_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    scaled = counts.select(
        "source",
        "n_docs",
        F.round(F.sqrt(F.col("n_docs").cast("double")), 9)
        .cast("decimal(28,9)")
        .alias("s"),
    )
    # tot aggregates the same derived frame scaled joins against: persist
    # AND materialize first (CLAUDE.md convention) so the documents scan
    # plus groupBy run once
    scaled = scaled.persist()
    scaled.count()
    tot = scaled.agg(F.sum("s").alias("total"))
    out = scaled.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(
            F.col("s").cast("double") / F.col("total").cast("double"), 9
        ).alias("mix_weight"),
    )
    out = out.persist()
    out.count()
    scaled.unpersist()
    return out


@register(
    "curation_class_balance_weights",
    oracle="""
WITH counts AS (
    SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS k FROM counts)
SELECT c.label, c.n AS n_examples,
       CAST(t.total AS DOUBLE) / (t.k * c.n) AS weight
FROM counts c, tot t
""",
    doc="inverse-frequency class weights per label (total / (k * n_label)) "
    "— the loss-reweighting table for imbalanced training sets; two tiny "
    "aggregates, label cardinality is bounded so this never shuffles big",
    tags=("pipeline", "curation", "weights"),
)
def curation_class_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    counts = e.groupBy("label").agg(F.count("*").alias("n_examples")).persist()
    counts.count()  # tot aggregates the frame counts joins against
    tot = counts.agg(
        F.sum("n_examples").alias("total"), F.count("*").alias("k")
    )
    out = counts.crossJoin(F.broadcast(tot)).select(
        "label",
        "n_examples",
        (
            F.col("total").cast("double") / (F.col("k") * F.col("n_examples"))
        ).alias("weight"),
    )
    out = out.persist()
    out.count()
    counts.unpersist()
    return out


# --- greedy max-coverage selection (submodular subset curation) ---------------------
# Diverse-subset selection: pick K documents greedily maximizing NEW word-
# trigram coverage — the facility-location/max-coverage family behind
# "select a small, maximally diverse seed set" (dedup-aware data selection,
# eval-set seeding, active-learning pool picks). Greedy is the classic
# (1 - 1/e) approximation; each step is fully distributed: one anti-join of
# the gram frame against the covered set + one per-doc count + a global
# argmax (TakeOrdered 1, a bounded driver hop exactly like the k-means
# model), K steps total. The covered set grows by <= grams-per-doc per
# step and lives as a persisted frame, never on the driver.
# The oracle unrolls the SAME greedy steps in SQL CTEs (the text_bpe_merges
# discipline applied to coverage instead of pair frequency).

COVERAGE_K = 3


def _sql_cov_step(step: int, covered: str | None) -> str:
    """One greedy step: argmax over docs of |grams \\ covered|."""
    anti = (
        f"SELECT doc_id, g FROM grams WHERE g NOT IN (SELECT g FROM {covered})"
        if covered
        else "SELECT doc_id, g FROM grams"
    )
    prev_cov = f"SELECT g FROM {covered} UNION " if covered else ""
    return f"""
gain{step} AS (
    SELECT doc_id, COUNT(*) AS gain
    FROM ({anti}) a GROUP BY 1
),
pick{step} AS (
    SELECT doc_id, gain FROM gain{step}
    ORDER BY gain DESC, doc_id LIMIT 1
),
cov{step} AS (
    {prev_cov}SELECT DISTINCT g FROM grams
    WHERE doc_id IN (SELECT doc_id FROM pick{step})
)"""


@register(
    "curation_greedy_coverage",
    oracle=f"""
WITH {SQL_WORD_TRIGRAMS_CTE},{_sql_cov_step(1, None)},{_sql_cov_step(2, "cov1")},{_sql_cov_step(3, "cov2")}
SELECT 1 AS step, doc_id, gain FROM pick1
UNION ALL SELECT 2, doc_id, gain FROM pick2
UNION ALL SELECT 3, doc_id, gain FROM pick3
""",
    doc=f"greedy max-coverage selection of {COVERAGE_K} docs by new word-"
    "trigram coverage (submodular (1-1/e) greedy, each step one anti-join "
    "+ per-doc count + bounded argmax); oracle unrolls the same steps",
    tags=("pipeline", "curation", "coverage"),
)
def curation_greedy_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared Spark/SQL word-trigram pair (pipeline/text.py) — one guard,
    # one gram shape, two oracles that cannot drift apart
    from f1_lakehouse_spark.pipeline.text import (  # noqa: PLC0415
        spark_word_trigram_frame,
    )

    d = load_table(spark, sf_dir, "documents")
    grams = spark_word_trigram_frame(d)
    grams = grams.persist()
    grams.count()

    covered = None  # DataFrame["g"] of already-covered grams
    picks: list[tuple[int, int, int]] = []
    for step in range(1, COVERAGE_K + 1):
        cand = grams if covered is None else grams.join(covered, "g", "left_anti")
        rows = (
            cand.groupBy("doc_id")
            .agg(F.count("*").alias("gain"))
            .orderBy(F.col("gain").desc(), "doc_id")
            .limit(1)
            .collect()  # 1 row: the greedy argmax (bounded driver hop)
        )
        if not rows:
            # every remaining doc is fully covered: the oracle's pickN CTE
            # is empty and its UNION contributes no row — stop, same shape
            break
        top = rows[0]
        picks.append((step, int(top["doc_id"]), int(top["gain"])))
        step_cov = grams.filter(F.col("doc_id") == top["doc_id"]).select("g")
        new_cov = (
            step_cov if covered is None else covered.unionByName(step_cov)
        ).distinct()
        # the covered frame is re-joined next step: persist + materialize
        new_cov = new_cov.persist()
        new_cov.count()
        if covered is not None:
            covered.unpersist()
        covered = new_cov
    if covered is not None:
        covered.unpersist()
    grams.unpersist()
    return spark.createDataFrame(picks, "step int, doc_id long, gain long")


# --- shard balance audit ------------------------------------------------------------
# Training-shard health monitoring: per-shard doc and token totals plus the
# global max/min doc-count skew ratio — the number an epoch scheduler
# watches (a skewed shard is a straggler every epoch). Integer totals with
# map-side combine; the 1-row global extremes broadcast back over the
# |shards|-row frame.


@register(
    "curation_shard_balance_audit",
    oracle=f"""
WITH sh AS (
  SELECT {sql_salted_hash("doc_id", ":shuffle")} % {N_SHUFFLE_SHARDS} AS shard,
         COUNT(*) AS n_docs,
         CAST(SUM(CASE WHEN text IS NULL THEN 0
                       ELSE len(string_split(text, ' ')) END) AS BIGINT)
             AS total_tokens
  FROM documents GROUP BY 1
),
g AS (SELECT MAX(n_docs) AS mx, MIN(n_docs) AS mn FROM sh)
SELECT shard, n_docs, total_tokens,
       CAST(g.mx AS DOUBLE) / g.mn AS doc_skew_ratio
FROM sh, g
""",
    doc="per-shard doc/token totals + global max/min skew ratio for the "
    "deterministic shuffle-shard assignment: integer totals map-side "
    "combined to |shards| rows, 1-row extremes broadcast back",
    tags=("pipeline", "curation", "diagnostics"),
)
def curation_shard_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.when(
        F.col("text").isNull(), F.lit(0)
    ).otherwise(F.size(F.split("text", " ")))
    sh = d.groupBy(
        (spark_salted_hash("doc_id", ":shuffle") % N_SHUFFLE_SHARDS).alias("shard")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).cast("long").alias("total_tokens"),
    )
    g = sh.agg(F.max("n_docs").alias("mx"), F.min("n_docs").alias("mn"))
    return sh.crossJoin(F.broadcast(g)).select(
        "shard",
        "n_docs",
        "total_tokens",
        (F.col("mx").cast("double") / F.col("mn")).alias("doc_skew_ratio"),
    )


# qualified twin of _SPLIT_SQL for use after a join (bare doc_id would be
# ambiguous); same hash, same tag — identical assignment
_SPLIT_D_SQL = sql_md5_hash48("CAST(d.doc_id AS VARCHAR) || ':split'") + " % 100"


# --- training-data card (end-to-end pipeline composition) ---------------------------
# The report a training run ships with: per (lang, split, quality gate),
# surviving doc and token counts AFTER exact dedup + quality filtering +
# the deterministic split assignment — every stage the same semantics as
# its standalone operator (dedup_exact keep rule, text_quality_score gate,
# curation_train_val_test_split hash). One dedup aggregate + one
# broadcast-keep semi join + map-only features + one final aggregate;
# model-sized output.


@register(
    "pipeline_training_data_card",
    oracle=f"""
WITH keep AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
feats AS (
  SELECT d.doc_id, d.lang,
         CASE WHEN {_SPLIT_D_SQL} < {TRAIN_PCT} THEN 'train'
              WHEN {_SPLIT_D_SQL} < {TRAIN_PCT + VAL_PCT} THEN 'val'
              ELSE 'test' END AS split,
         CASE WHEN len(string_split(d.text, ' ')) >= 20
               AND CAST(len(regexp_extract_all(d.text, '[^a-zA-Z0-9\\s]'))
                        AS DOUBLE) / length(d.text) < 0.1
               AND CAST(length(d.text) AS DOUBLE)
                     / len(string_split(d.text, ' ')) BETWEEN 3 AND 12
              THEN 1 ELSE 0 END AS passes_quality,
         len(string_split(d.text, ' ')) AS toks
  FROM documents d JOIN keep k ON d.doc_id = k.doc_id
  WHERE d.text IS NOT NULL
)
SELECT lang, split, passes_quality,
       COUNT(*) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS total_tokens
FROM feats GROUP BY 1, 2, 3
""",
    doc="training-data card: surviving doc/token counts per (lang, split, "
    "quality gate) after exact dedup + quality filter + deterministic "
    "split — the end-to-end composition of the standalone stages, "
    "model-sized output",
    tags=("pipeline", "curation", "composition"),
)
def pipeline_training_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    keep = d.groupBy(F.md5("text").alias("k")).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    h = spark_salted_hash("doc_id", ":split") % 100
    words = F.split("text", " ")
    n_words = F.size(words)
    punct_ratio = (
        F.size(F.regexp_extract_all("text", F.lit("[^a-zA-Z0-9\\s]"), 0)).cast(
            "double"
        )
        / F.length("text")
    )
    mwl = F.length("text").cast("double") / n_words
    feats = (
        d.join(keep, "doc_id")
        .filter(F.col("text").isNotNull())
        .select(
            "lang",
            F.when(h < TRAIN_PCT, "train")
            .when(h < TRAIN_PCT + VAL_PCT, "val")
            .otherwise("test")
            .alias("split"),
            F.when(
                (n_words >= 20) & (punct_ratio < 0.1) & mwl.between(3, 12), 1
            )
            .otherwise(0)
            .alias("passes_quality"),
            n_words.alias("toks"),
        )
    )
    return feats.groupBy("lang", "split", "passes_quality").agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").cast("long").alias("total_tokens"),
    )


# --- minority-language oversampling -------------------------------------------------
# The replication dual of class-balance weights: each doc is emitted
# ceil(max_lang_count / lang_count) times (epoch-level oversampling of
# minority languages). Deterministic integer replication factors from one
# |langs|-row broadcast; the fan-out is a map-only explode of a sequence —
# no shuffle beyond the counting aggregate.


@register(
    "curation_minority_oversample",
    oracle="""
WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
mx AS (SELECT MAX(n) AS mxn FROM counts),
factors AS (
  SELECT lang, CAST((mxn + n - 1) // n AS INTEGER) AS n_copies
  FROM counts, mx
)
SELECT d.doc_id, d.lang, f.n_copies, t.copy_id
FROM documents d
JOIN factors f USING (lang),
     unnest(generate_series(1, f.n_copies)) AS t(copy_id)
""",
    doc="minority-language oversampling: ceil(max/n) integer replication "
    "factors from a |langs|-row broadcast, map-only sequence explode — "
    "deterministic epoch-level class balancing",
    tags=("pipeline", "curation", "balance"),
)
def curation_minority_oversample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n"))
    mx = counts.agg(F.max("n").alias("mxn"))
    factors = counts.crossJoin(F.broadcast(mx)).select(
        "lang",
        F.expr("(mxn + n - 1) div n").cast("int").alias("n_copies"),
    )
    return (
        d.join(F.broadcast(factors), "lang")
        .select(
            "doc_id",
            "lang",
            "n_copies",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_id"),
        )
    )


# --- token-budget epoch/repeat schedule ------------------------------------------------
# The data-schedule step between mixture weights and the actual sampler:
# given a total training token budget (here 2 passes over the corpus) split
# uniformly across sources, each source's repeat factor is
# budget_share / source_tokens, capped at 4 epochs (the standard
# "repeat small sources a few times, never dozens" rule from data-
# constrained scaling guidance). Everything is 64-bit integer arithmetic
# (factors carried as x100 fixed-point, floor division) so the schedule is
# bit-identical across engines and runs: two tiny aggregates over a
# per-source frame — the corpus scans once, the totals broadcast back.
# At 100 TB: corpus tokens ~2e13 → budget*100 ~4e15 < 2^63, no overflow.

REPEAT_CAP_X100 = 400  # ≤ 4 epochs per source


@register(
    "curation_epoch_repeat_schedule",
    oracle=f"""
WITH toks AS (
    SELECT source,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n_tokens) * 2 AS BIGINT) AS budget,
           COUNT(*) AS n_sources
    FROM toks
),
fac AS (
    SELECT t.source, t.n_tokens,
           least({REPEAT_CAP_X100},
                 (b.budget * 100) // (b.n_sources * t.n_tokens))
               AS repeat_factor_x100
    FROM toks t, tot b
)
SELECT source, n_tokens, repeat_factor_x100,
       (n_tokens * repeat_factor_x100) // 100 AS planned_tokens
FROM fac
""",
    doc="token-budget epoch/repeat schedule per source (2-pass budget, "
    "uniform share, 4-epoch cap): integer fixed-point factors, one "
    "corpus scan + broadcast totals",
    tags=("pipeline", "curation", "schedule"),
)
def curation_epoch_repeat_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # NULL text contributes 0 tokens (DuckDB SUM skips NULL; Spark size()
    # on a null array is -1, so guard explicitly)
    tok_len = F.when(
        F.col("text").isNotNull(), F.size(F.split("text", " "))
    ).otherwise(F.lit(0))
    toks = d.groupBy("source").agg(
        F.sum(tok_len).cast("long").alias("n_tokens")
    )
    # totals aggregate the same derived frame they broadcast back onto:
    # persist AND materialize first (CLAUDE.md convention)
    toks = toks.persist()
    toks.count()
    tot = toks.agg(
        (F.sum("n_tokens") * 2).cast("long").alias("budget"),
        F.count("*").alias("n_sources"),
    )
    fac = toks.crossJoin(F.broadcast(tot)).withColumn(
        "repeat_factor_x100",
        F.least(
            F.lit(REPEAT_CAP_X100).cast("long"),
            F.expr("(budget * 100) div (n_sources * n_tokens)"),
        ),
    )
    out = fac.select(
        "source",
        "n_tokens",
        "repeat_factor_x100",
        F.expr("(n_tokens * repeat_factor_x100) div 100").alias(
            "planned_tokens"
        ),
    )
    out = out.persist()
    out.count()
    toks.unpersist()
    return out


# --- leakage-safe (cluster-aware) split ------------------------------------------------
# The plain hash split up top assigns DOCUMENTS independently — two near-
# duplicates can land in train and test, and the eval silently measures
# memorization. The leakage-safe variant hashes the near-dup CLUSTER
# (connected components over MinHash-LSH pairs, `dedup_clusters`;
# singletons are their own cluster), so an entire duplicate family moves
# as one unit and no cluster ever straddles the split boundary — the
# standard eval-hygiene requirement for LLM corpora. Costs exactly the
# cluster pass plus a map-only hash; the cluster frame is corpus-sized
# but the pairs it derives from are LSH-bounded (see dedup_clusters).


def _cluster_safe_split_oracle() -> str:
    # dedup registers before this statement runs (plain import, no cycle:
    # dedup does not import curation)
    from f1_lakehouse_spark.pipeline import dedup as _dedup  # noqa: F401
    from f1_lakehouse_spark.registry import REGISTRY as _R

    clusters = _R["dedup_clusters"].oracle
    h = sql_salted_hash("cl.cluster_id", ":clsplit")
    return f"""
WITH clus AS ({clusters}),
full_map AS (
    SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN clus c ON c.doc_id = d.doc_id
)
SELECT cl.doc_id, cl.cluster_id,
       CASE WHEN {h} % 100 < {TRAIN_PCT} THEN 'train'
            WHEN {h} % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM full_map cl
"""


@register(
    "curation_cluster_safe_split",
    oracle=_cluster_safe_split_oracle(),
    doc="leakage-safe train/val/test split: the near-dup cluster (not the "
    "document) is the unit of assignment, so duplicate families never "
    "straddle the eval boundary; cluster pass + map-only salted hash",
    tags=("pipeline", "curation", "split"),
)
def curation_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_lakehouse_spark.pipeline.dedup import dedup_clusters

    clus = dedup_clusters(spark, sf_dir).withColumnRenamed(
        "cluster_id", "cl_id"
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    full = d.join(clus, "doc_id", "left").select(
        "doc_id", F.coalesce("cl_id", "doc_id").alias("cluster_id")
    )
    h = spark_salted_hash("cluster_id", ":clsplit") % 100
    return full.select(
        "doc_id",
        "cluster_id",
        F.when(h < TRAIN_PCT, "train")
        .when(h < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


# --- DoReMi-style domain reweighting (coupled fixed-point rounds) --------------------
# The mixture-optimization step between "measure per-domain loss" and
# "set sampling weights" (DoReMi, Group DRO): domains whose excess loss is
# high AND whose current mixture share is low get their weight multiplied
# up; the coupling through the share term means each round depends on the
# previous round's normalized weights — a genuine fixed-point iteration,
# not a closed form. Everything is int64 fixed-point (ppm shares,
# milli-factors, floor division) so T unrolled rounds are bit-identical
# across engines and cluster topologies — the same discipline as
# curation_epoch_repeat_schedule.
#
# Scale: one corpus aggregate produces the |domains|-row model frame; each
# round is a broadcast of a 1-row sum into that model frame. The corpus is
# scanned ONCE regardless of T.

DOREMI_ROUNDS = 3
DOREMI_PPM = 1_000_000
DOREMI_M0 = 1_000_000
DOREMI_ECAP = 1000  # cap excess so a round's factor stays <= 2x


def _doremi_round_sql(prev: str, out: str) -> str:
    return f"""
{out}_tot AS (SELECT SUM(m) AS tot FROM {prev}),
{out} AS (
    SELECT p.source, p.n_docs, p.loss, p.ec,
           (p.m * (1000 + (p.ec * ({DOREMI_PPM} - (p.m * {DOREMI_PPM} // t.tot))
                           // {DOREMI_PPM}))) // 1000 AS m
    FROM {prev} p, {out}_tot t
)"""


@register(
    "curation_doremi_reweight",
    oracle=f"""
WITH base AS (
    SELECT source, COUNT(*) AS n_docs,
           SUM(n_chars) // COUNT(*) AS loss
    FROM documents GROUP BY 1
),
lmin AS (SELECT MIN(loss) AS l0 FROM base),
r0 AS (
    SELECT b.source, b.n_docs, b.loss,
           least(b.loss - m.l0, {DOREMI_ECAP}) AS ec,
           CAST({DOREMI_M0} AS BIGINT) AS m
    FROM base b, lmin m
),{_doremi_round_sql("r0", "r1")},{_doremi_round_sql("r1", "r2")},{_doremi_round_sql("r2", "r3")},
fin AS (SELECT SUM(m) AS tot FROM r3)
SELECT r.source,
       CAST(r.n_docs AS BIGINT) AS n_docs,
       CAST(r.loss AS BIGINT) AS loss,
       CAST(r.ec AS BIGINT) AS excess,
       CAST(r.m AS BIGINT) AS m_final,
       CAST(r.m * {DOREMI_PPM} // f.tot AS BIGINT) AS weight_ppm
FROM r3 r, fin f
""",
    doc=f"DoReMi-style domain mixture reweighting: {DOREMI_ROUNDS} coupled "
    "fixed-point rounds where high-excess low-share domains multiply up, "
    "all int64 ppm arithmetic (bit-identical across engines/topologies); "
    "one corpus scan, then model-frame-only rounds",
    tags=("pipeline", "curation", "mixture"),
)
def curation_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.expr("sum(n_chars) div count(*)").alias("loss"),
    )
    # persist + materialize the |domains|-row model frame BEFORE the coupled
    # rounds: every round's sum and the final plan re-derive their lineage,
    # which without the cache re-runs the corpus aggregate dozens of times
    # (each round doubles the scan count). With it, the corpus is scanned
    # exactly once — the property test pins this.
    base = base.persist()
    base.count()
    lmin = base.agg(F.min("loss").alias("l0"))
    f = (
        base.crossJoin(F.broadcast(lmin))
        .select(
            "source",
            "n_docs",
            "loss",
            F.least(F.col("loss") - F.col("l0"), F.lit(DOREMI_ECAP)).alias("ec"),
            F.lit(DOREMI_M0).cast("long").alias("m"),
        )
    )
    for _ in range(DOREMI_ROUNDS):
        tot = f.agg(F.sum("m").alias("tot"))
        f = (
            f.crossJoin(F.broadcast(tot))
            .select(
                "source",
                "n_docs",
                "loss",
                "ec",
                F.expr(
                    f"(m * (1000 + (ec * ({DOREMI_PPM} - (m * {DOREMI_PPM} div tot))"
                    f" div {DOREMI_PPM}))) div 1000"
                ).alias("m"),
            )
        )
    fin = f.agg(F.sum("m").alias("tot"))
    res = f.crossJoin(F.broadcast(fin)).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("loss").cast("long").alias("loss"),
        F.col("ec").cast("long").alias("excess"),
        F.col("m").cast("long").alias("m_final"),
        F.expr(f"m * {DOREMI_PPM} div tot").cast("long").alias("weight_ppm"),
    )
    # materialize the |domains|-row result, then release the model cache
    res = res.persist()
    res.count()
    base.unpersist()
    return res


# --- Neyman allocation of a labeling budget -----------------------------------------
# Survey-sampling's optimal allocation, aimed at the training-data
# question "which sources get the human-labeling budget?": n_h ~ N_h *
# sigma_h minimizes the variance of the stratified estimate. The
# arithmetic is engineered exact: N_h*sigma_h = sqrt(n_h*S2_h - S1_h^2)
# — an integer under the sqrt, so the weight is one correctly-rounded
# IEEE op; integer seats assign by floor + LARGEST-REMAINDER
# apportionment (remainder sort with a unique source tiebreak), so the
# allocations are integers that sum to the budget EXACTLY. One keyed
# aggregate; everything after runs on a <= |sources| packed array.

NEYMAN_BUDGET = 10_000

_NEYMAN_ORACLE = f"""
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s1,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents GROUP BY source
), packed AS (
  SELECT list(struct_pack(source := source, n := n, s1 := s1, s2 := s2)
              ORDER BY source) AS arr
  FROM per
), wts AS (
  SELECT arr,
         list_transform(arr, s -> sqrt(CAST(s.n * s.s2 - s.s1 * s.s1 AS DOUBLE))) AS w,
         len(arr) AS k
  FROM packed
), tot AS (
  SELECT arr, w, k,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), w), (a, b) -> a + b) AS wsum
  FROM wts
), seats AS (
  SELECT arr, w, k, wsum,
         list_transform(range(1, k + 1),
            i -> CAST(floor({NEYMAN_BUDGET}.0 * w[i] / wsum) AS BIGINT)) AS base,
         list_transform(range(1, k + 1),
            i -> {NEYMAN_BUDGET}.0 * w[i] / wsum
                 - floor({NEYMAN_BUDGET}.0 * w[i] / wsum)) AS rem
  FROM tot
), leftover AS (
  SELECT arr, w, k, base, rem,
         {NEYMAN_BUDGET} - list_reduce(list_prepend(CAST(0 AS BIGINT), base), (a, b) -> a + b) AS l
  FROM seats
), winners AS (
  SELECT arr, w, k, base, l,
         list_transform(
           list_slice(list_sort(list_transform(range(1, k + 1),
             i -> struct_pack(negrem := 0.0 - rem[i], src := arr[i].source, i := i))), 1, l),
           s -> s.i) AS win
  FROM leftover
)
SELECT arr[i].source AS source,
       arr[i].n AS n_docs,
       w[i] AS neyman_weight,
       CAST(base[i] + CASE WHEN list_contains(win, i) THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM (SELECT unnest(range(1, k + 1)) AS i, arr, w, base, win FROM winners)
"""


@register(
    "curation_neyman_allocation",
    oracle=_NEYMAN_ORACLE,
    doc=f"Neyman-optimal allocation of a {NEYMAN_BUDGET}-unit labeling "
    "budget across sources (n_h ~ N_h*sigma_h with the weight exact as "
    "sqrt of an integer), integer seats via largest-remainder "
    "apportionment — allocations sum to the budget exactly",
    tags=("pipeline", "curation", "sampling", "extension"),
)
def curation_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    per = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("s2"),
    )
    packed = per.agg(
        F.sort_array(F.collect_list(F.struct("source", "n", "s1", "s2"))).alias(
            "arr"
        )
    )
    wts = packed.select(
        "arr",
        F.transform(
            "arr",
            lambda s: F.sqrt(
                (s["n"] * s["s2"] - s["s1"] * s["s1"]).cast("double")
            ),
        ).alias("w"),
        F.size("arr").alias("k"),
    )
    zero_d, zero_l = F.lit(0.0), F.lit(0).cast("long")
    B = F.lit(float(NEYMAN_BUDGET))
    tot = wts.select(
        "arr", "w", "k", F.aggregate("w", zero_d, lambda a, b: a + b).alias("wsum")
    )
    seats = tot.select(
        "arr",
        "w",
        "k",
        "wsum",
        F.transform(
            F.sequence(F.lit(1), F.col("k")),
            lambda i: F.floor(B * F.element_at(F.col("w"), i) / F.col("wsum")).cast(
                "long"
            ),
        ).alias("base"),
        F.transform(
            F.sequence(F.lit(1), F.col("k")),
            lambda i: B * F.element_at(F.col("w"), i) / F.col("wsum")
            - F.floor(B * F.element_at(F.col("w"), i) / F.col("wsum")),
        ).alias("rem"),
    )
    leftover = seats.select(
        "arr",
        "w",
        "k",
        "base",
        "rem",
        (
            F.lit(NEYMAN_BUDGET).cast("long")
            - F.aggregate("base", zero_l, lambda a, b: a + b)
        ).alias("l"),
    )
    winners = leftover.select(
        "arr",
        "w",
        "k",
        "base",
        "l",
        F.transform(
            F.slice(
                F.sort_array(
                    F.transform(
                        F.sequence(F.lit(1), F.col("k")),
                        lambda i: F.struct(
                            (F.lit(0.0) - F.element_at(F.col("rem"), i)).alias(
                                "negrem"
                            ),
                            F.element_at(F.col("arr"), i)["source"].alias("src"),
                            i.alias("i"),
                        ),
                    )
                ),
                F.lit(1),
                F.col("l").cast("int"),
            ),
            lambda s: s["i"],
        ).alias("win"),
    )
    rows = winners.select(
        F.explode(F.sequence(F.lit(1), F.col("k"))).alias("i"),
        "arr",
        "w",
        "base",
        "win",
    )
    return rows.select(
        F.element_at("arr", F.col("i"))["source"].alias("source"),
        F.element_at("arr", F.col("i"))["n"].alias("n_docs"),
        F.element_at("w", F.col("i")).alias("neyman_weight"),
        (
            F.try_element_at("base", F.col("i"))
            + F.when(F.array_contains("win", F.col("i")), 1)
            .otherwise(0)
            .cast("long")
        )
        .cast("long")
        .alias("alloc"),
    )


# --- curriculum interleave (round 8) -------------------------------------------------
# Curriculum training orders data easy->hard, but a pure sort front-loads
# one difficulty regime; the standard fix interleaves difficulty deciles so
# every training window sees the full mixture while the WITHIN-decile order
# stays easy->hard. Emitted schedule_pos = (pos_in_decile - 1) * k + decile
# is exactly that round-robin.
#
# Scale (100 TB): the global difficulty rank comes from the distributed
# prefix-sum spine (range repartition + pid windows + driver offsets of
# n_parts totals — never a single-partition ORDER BY); decile AND position
# within decile are then CLOSED-FORM integer arithmetic on that one rank
# (the NTILE bucket formula and its bucket-start inverse), so the whole
# schedule costs ONE range shuffle. The oracle keeps plain NTILE +
# partitioned ROW_NUMBER, proving the closed form bit-identical.

CURRICULUM_K = 10


@register(
    "curation_curriculum_interleave",
    oracle=f"""
WITH ranked AS (
    SELECT doc_id, n_chars,
           ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rk,
           CAST(NTILE({CURRICULUM_K}) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
               AS decile
    FROM documents
), pos AS (
    SELECT doc_id, n_chars, decile,
           ROW_NUMBER() OVER (PARTITION BY decile ORDER BY n_chars, doc_id)
               AS pos_in_decile
    FROM ranked
)
SELECT doc_id, n_chars, decile, pos_in_decile,
       CAST((pos_in_decile - 1) * {CURRICULUM_K} + decile AS BIGINT)
           AS schedule_pos
FROM pos
""",
    doc="Curriculum interleave: difficulty deciles (proxy: n_chars) with "
    "round-robin schedule positions — every training window sees all "
    "difficulty regimes, within-decile order stays easy->hard. Decile and "
    "position derive in closed form from ONE distributed prefix-sum rank; "
    "the oracle's plain NTILE + partitioned ROW_NUMBER proves the "
    "arithmetic identical.",
    tags=("pipeline", "curation", "curriculum", "prefix-sum"),
)
def curation_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_lakehouse_spark.operators.extensions import (  # noqa: PLC0415
        _ntile_from_rank,
        global_prefix_sum,
    )

    k = CURRICULUM_K
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .withColumn("one", F.lit(1).cast("decimal(27,6)"))
    )
    cum, release, total = global_prefix_sum(
        spark, d, "one", [F.col("n_chars").asc(), F.col("doc_id").asc()]
    )
    n = int(total)
    q, r = divmod(n, k)
    rank = F.col("cum").cast("long")
    # decile via the exact NTILE bucket formula; its 1-based start rank is
    # then pure integer COLUMN arithmetic (no division): buckets 1..r hold
    # q+1 rows, buckets r+1..k hold q rows.
    decile = _ntile_from_rank(rank, n, k).cast("long")
    cut = r * (q + 1)
    start = F.when(
        decile <= F.lit(r), (decile - 1) * F.lit(q + 1) + 1
    ).otherwise(F.lit(cut) + (decile - 1 - F.lit(r)) * F.lit(q) + 1)
    pos = (rank - start + F.lit(1)).cast("long")
    out = cum.select(
        "doc_id",
        "n_chars",
        decile.alias("decile"),
        pos.alias("pos_in_decile"),
        ((pos - 1) * F.lit(k) + decile).cast("long").alias("schedule_pos"),
    )
    out = out.persist()
    out.count()
    release()
    return out
