"""Incremental corpus maintenance: dedup a NEW ingest batch against the
EXISTING corpus without ever recomputing corpus-vs-corpus pairs.

This is the production shape of dedup at 100 TB: the corpus's MinHash band
signatures (and per-doc shingle sets) are materialized once at ingest
(exactly :func:`dedup.minhash_band_signatures`, cf. `ann_lsh_materialized`
for the ANN twin of the same idea), bucket-partitioned by (band, band_hash).
Each new batch — orders of magnitude smaller than the corpus — computes its
own signatures, BROADCASTS them against the corpus index (no corpus
shuffle), and exact-verifies only the candidate pairs. Cost per ingest is
O(batch + candidates), independent of corpus size except for the pruned
index probe.

Here both sides derive from one `documents` scan split by a deterministic
doc_id hash (~10% "new batch", 90% "corpus") so the operator is
oracle-checkable; the split predicate is a pure function of doc_id, so it
is recomputed map-side wherever needed — never joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.pipeline.dedup import (
    BAND_SIZE,
    JACCARD_THRESHOLD,
    MINHASH_PARAMS,
    _SQL_BAND_CTES,
    _SQL_SHINGLE_KEYS,
    _spark_shingle_keys,
    minhash_band_signatures,
)
from f1_lakehouse_spark.pipeline.hashing import spark_md5_hash48, sql_md5_hash48
from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table

# doc_id-hash % 10 == 0 → "new batch" (~10% of docs); salt tag ':inc' keeps
# the split independent of every other hash-derived decision on doc_id.
NEW_BATCH_MOD = 10

# The ingest batch is a WORKLOAD, not a corpus property (same rule as
# similarity.BATCH_Q_MAX / HARD_NEG_MAX_ANCHORS): the simulated hash split
# alone yields N/10 batch docs, which grows with the corpus and would push
# the batch-bands broadcast past Spark's 8 GB hard cap at the 100 TB
# framing. The cap bounds batch docs to those with
# doc_id < NEW_BATCH_MOD * INCR_BATCH_MAX_DOCS = 250_000 — far above every
# test SF's max doc_id (49_999 at the 10x stress replica), so results are
# unchanged wherever the driver or the stress harness checks; a production
# ingest passes an explicitly bounded batch frame
# (ingest_batch_with_dedup). Mirrored verbatim in the oracle.
#
# KNOWN BIAS (deliberate, r7 ADVICE low): once the corpus outgrows the
# bound, the capped batch is a doc_id PREFIX of the hash split, not a
# uniform sample — the simulated-batch semantics narrow to the oldest ids
# with corpus growth. A uniform alternative (hash-mod predicate) would
# need a data-dependent modulus to stay no-op at test SFs, costing an
# extra corpus scan; since the capped query only demos the ingest path
# (production uses ingest_batch_with_dedup with a real bounded batch),
# the cheap prefix bound is the right trade.
INCR_BATCH_MAX_DOCS = 25_000
_BATCH_DOC_ID_BOUND = NEW_BATCH_MOD * INCR_BATCH_MAX_DOCS

def ingest_batch_with_dedup(
    batch: DataFrame, index_path: str, pairs_path: str, batch_id: int | None = None
) -> None:
    """One ingest step of the streaming dedup pipeline: probe the
    accumulated band index with this batch's signatures (batch side
    broadcast, index probed in place), append the discovered
    (new_doc, corpus_doc) candidate pairs, then append the batch's own
    signatures to the index. New-vs-index only — within-batch pairs are
    deliberately out of scope (they surface when either doc meets the
    index in a later probe of a re-ingest; a production ingest would add
    one batch-local self-join if same-batch dups matter).

    Crash-replay safety: the probe anti-joins the index against the
    batch's own doc_ids, so a replayed batch (whose signatures may
    already sit in the index from the pre-crash attempt) reproduces the
    pre-crash pair set exactly — no self-pairs, no within-batch pairs;
    with ``batch_id`` both writes go to a batch_id= partition under
    dynamic overwrite, so a replay REPLACES its own partition instead of
    appending duplicates (true exactly-once; plain appends otherwise)."""
    from pyspark.errors import AnalysisException  # noqa: PLC0415

    sess = batch.sparkSession
    shh = _spark_shingle_keys(batch, distinct=False)
    bands = minhash_band_signatures(
        shh.select("doc_id", F.col("sk").alias("x"))
    ).persist()
    bands.count()
    try:
        try:
            idx = sess.read.parquet(index_path)
        except AnalysisException as e:
            # ONLY a missing path means "first batch": any other read
            # failure must surface, else the probe is silently skipped
            # while the signatures still get appended (permanent pair loss)
            if "PATH_NOT_FOUND" not in str(e):
                raise
            idx = None
        if idx is not None:
            own = bands.select("doc_id").distinct()
            probe_idx = idx.select("doc_id", "band", "band_hash").join(
                F.broadcast(own), "doc_id", "left_anti"
            )
            cand = (
                probe_idx.withColumnRenamed("doc_id", "corpus_doc")
                .join(
                    F.broadcast(bands.withColumnRenamed("doc_id", "new_doc")),
                    ["band", "band_hash"],
                )
                .select("new_doc", "corpus_doc")
                .distinct()
            )
            _idempotent_append(cand, pairs_path, batch_id)
        _idempotent_append(
            bands.select("doc_id", "band", "band_hash"), index_path, batch_id
        )
    finally:
        bands.unpersist()


def _idempotent_append(df: DataFrame, path: str, batch_id: int | None) -> None:
    """Append semantics that survive foreachBatch replay: with a batch_id,
    write into a batch_id= partition under dynamic partition overwrite (a
    replay overwrites its own partition, never duplicating rows); without
    one, a plain append."""
    if batch_id is None:
        df.write.mode("append").parquet(path)
    else:
        (
            df.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )


def stream_documents_ingest_with_dedup(
    spark: SparkSession,
    docs_dir: str,
    index_path: str,
    pairs_path: str,
    checkpoint: str,
) -> None:
    """Streaming twin of :func:`dedup_incremental_minhash`: a file-source
    stream of document batches, each micro-batch probing and then growing
    the persistent MinHash band index inside ``foreachBatch``. Exactly-once
    across restarts comes from the checkpoint (a replayed batch re-appends
    the same deterministic signatures; the pair set is DISTINCT per probe).
    Proven equal to the batch cross-batch candidate pairs in
    test_streaming.py."""
    static = spark.read.parquet(docs_dir)
    src = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_batch_with_dedup(batch_df, index_path, pairs_path, batch_id)

    q = (
        src.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _spark_is_new(doc_id_col):
    return (
        spark_md5_hash48(F.concat(doc_id_col.cast("string"), F.lit(":inc")))
        % NEW_BATCH_MOD
        == 0
    )


@register(
    "dedup_incremental_minhash",
    oracle=f"""
WITH {_SQL_BAND_CTES},
tagged AS (
    SELECT doc_id,
           ({sql_md5_hash48("CAST(doc_id AS VARCHAR) || ':inc'")}
            % {NEW_BATCH_MOD} = 0) AS is_new
    FROM documents
),
cand AS (
    SELECT DISTINCT n.doc_id AS new_doc, c.doc_id AS corpus_doc
    FROM bands n
    JOIN tagged tn ON tn.doc_id = n.doc_id AND tn.is_new
                  AND tn.doc_id < {_BATCH_DOC_ID_BOUND}
    JOIN bands c ON c.band = n.band AND c.band_hash = n.band_hash
    JOIN tagged tc ON tc.doc_id = c.doc_id AND NOT tc.is_new
),
shk AS ({_SQL_SHINGLE_KEYS}),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shk GROUP BY 1),
common AS (
    SELECT cand.new_doc, cand.corpus_doc, COUNT(*) AS n_common
    FROM cand
    JOIN shk a ON a.doc_id = cand.new_doc
    JOIN shk b ON b.doc_id = cand.corpus_doc AND b.sk = a.sk
    GROUP BY 1, 2
)
SELECT c.new_doc, c.corpus_doc,
       CAST(c.n_common AS DOUBLE) / (sa.sz + sb.sz - c.n_common) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.new_doc
JOIN sizes sb ON sb.doc_id = c.corpus_doc
WHERE CAST(c.n_common AS DOUBLE) / (sa.sz + sb.sz - c.n_common)
      >= {JACCARD_THRESHOLD}
""",
    doc="incremental dedup: new-batch MinHash bands broadcast against the "
    "corpus band index (new-vs-corpus only, never corpus-vs-corpus), "
    "candidates exact-verified by shingle Jaccard — O(batch) per ingest",
    tags=("pipeline", "dedup", "minhash", "incremental"),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11: borrow the session's shared DISTINCT shingle cache (as in
    # dedup_minhash_verified) instead of a private per-call corpus re-hash —
    # MIN minhashes and collect_set doc sets are duplicate-insensitive, and
    # the oracle's own band/sizes CTEs read the DISTINCT shingle CTE.
    # Borrowed frame: never unpersisted here.
    from f1_lakehouse_spark.pipeline.dedup import shingle_keys_frame

    shk_raw = shingle_keys_frame(spark, sf_dir)
    bands = minhash_band_signatures(
        shk_raw.select("doc_id", F.col("sk").alias("x"))
    ).withColumn("is_new", _spark_is_new(F.col("doc_id")))
    bands = bands.persist()
    bands.count()  # materialize BEFORE both filter branches read it
    # plan-visible batch bound: the doc_id predicate caps batch docs at
    # _BATCH_DOC_ID_BOUND, so the limit (docs x 4 bands) NEVER truncates —
    # it is a deterministic marker that lets the plan lint prove the
    # broadcast side bounded (CLAUDE.md: .limit(k) after the bounding
    # filter)
    n_bands = len(MINHASH_PARAMS) // BAND_SIZE
    new_b = (
        bands.filter(
            F.col("is_new") & (F.col("doc_id") < F.lit(_BATCH_DOC_ID_BOUND))
        )
        .select(F.col("doc_id").alias("new_doc"), "band", "band_hash")
        .limit(_BATCH_DOC_ID_BOUND * n_bands)
    )
    corpus_b = bands.filter(~F.col("is_new")).select(
        F.col("doc_id").alias("corpus_doc"), "band", "band_hash"
    )
    # the new batch is the small side by construction: broadcast it so the
    # corpus index is probed in place (at scale: a bucket-pruned scan of the
    # materialized index, zero corpus shuffle)
    cand = (
        corpus_b.join(F.broadcast(new_b), ["band", "band_hash"])
        .select("new_doc", "corpus_doc")
        .distinct()
        .persist()
    )
    cand.count()
    # exact verify: one doc_id shuffle folds shingle sets, candidates fetch
    # both sides' sets and compute the overlap inside the row
    docsets = shk_raw.groupBy("doc_id").agg(F.collect_set("sk").alias("ds"))
    sa = docsets.select(F.col("doc_id").alias("a_id"), F.col("ds").alias("ds_a"))
    sb = docsets.select(F.col("doc_id").alias("b_id"), F.col("ds").alias("ds_b"))
    n_common = F.size(F.array_intersect("ds_a", "ds_b"))
    jaccard = n_common.cast("double") / (
        F.size("ds_a") + F.size("ds_b") - n_common
    )
    out = (
        cand.join(sa, F.col("a_id") == F.col("new_doc"))
        .join(sb, F.col("b_id") == F.col("corpus_doc"))
        .select("new_doc", "corpus_doc", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    out = out.persist()
    out.count()
    bands.unpersist()
    cand.unpersist()
    return out
