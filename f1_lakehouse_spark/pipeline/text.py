"""Text-analysis operators for training-data pipelines over ``documents``:
token counting, quality scoring, document fingerprinting, and a
profile-based language classifier. All built from JVM-side regex/array
functions — no Python in the hot path — so a 100 TB corpus runs at scan
speed and every operator has an exact DuckDB oracle.
"""

from __future__ import annotations
from f1_lakehouse_spark.pinning import pin_small_result

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_lakehouse_spark.pipeline.hashing import (
    spark_poly_hash,
    sql_md5_hash48,
    sql_poly_hash,
)
from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table

# --- token counting ------------------------------------------------------------
# whitespace tokens + a BPE-ish regex segmentation (letter runs / digits /
# single punctuation), the standard pre-tokenizer shape.

_BPEISH = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"


@register(
    "text_token_count",
    oracle=f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '{_BPEISH}')) AS bpeish_tokens,
       length(text) AS n_chars
FROM documents
""",
    doc="whitespace + BPE-ish regex token counts per document",
    tags=("pipeline", "text"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPEISH), 0)).alias("bpeish_tokens"),
        F.length("text").alias("n_chars"),
    )


# --- quality scoring -------------------------------------------------------------
# length / punctuation-ratio / stopword-ratio / mean-word-length heuristics
# (the usual Gopher/C4-style quality-filter features).

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "it")


@register(
    "text_quality_score",
    oracle=f"""
WITH feats AS (
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_words,
           len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct,
           len(list_filter(string_split(text, ' '),
                           w -> list_contains({list(_STOPWORDS)!r}, w))) AS n_stop
    FROM documents
)
SELECT doc_id, n_chars, n_words,
       CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
       CAST(n_stop  AS DOUBLE) / n_words AS stopword_ratio,
       CAST(n_chars AS DOUBLE) / n_words AS mean_word_len,
       CASE WHEN n_words >= 20
             AND CAST(n_punct AS DOUBLE) / n_chars < 0.1
             AND CAST(n_chars AS DOUBLE) / n_words BETWEEN 3 AND 12
            THEN 1 ELSE 0 END AS passes_quality
FROM feats
""",
    doc="quality-filter features + pass/fail gate per document",
    tags=("pipeline", "text"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    feats = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(words).alias("n_words"),
        F.size(F.regexp_extract_all("text", F.lit("[^a-zA-Z0-9\\s]"), 0)).alias("n_punct"),
        F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))).alias("n_stop"),
    )
    punct_ratio = F.col("n_punct").cast("double") / F.col("n_chars")
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_words")
    mwl = F.col("n_chars").cast("double") / F.col("n_words")
    return feats.select(
        "doc_id",
        "n_chars",
        "n_words",
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mwl.alias("mean_word_len"),
        F.when(
            (F.col("n_words") >= 20) & (punct_ratio < 0.1) & mwl.between(3, 12), 1
        )
        .otherwise(0)
        .alias("passes_quality"),
    )


# --- document fingerprint ---------------------------------------------------------


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id, {sql_poly_hash("text")} AS fingerprint
FROM documents
""",
    doc="rolling polynomial content fingerprint (exact-dup key)",
    tags=("pipeline", "text", "hash"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", spark_poly_hash("text").alias("fingerprint"))


# --- language identification --------------------------------------------------------
# Profile-based n-gram/stopword classifier: build a top-K word profile per
# labeled language from the corpus itself, score each document by profile
# overlap, argmax with deterministic tiebreaks. (On a real corpus the
# profiles are trained offline; the operator shape — broadcast profile join +
# overlap argmax — is identical.)

_PROFILE_K = 8


@register(
    "text_lang_id_confusion",
    oracle=f"""
WITH words AS (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
    FROM documents
), doc_words AS (
    SELECT DISTINCT doc_id, lang, w FROM words
), freq AS (
    SELECT lang AS profile_lang, w, COUNT(*) AS cnt
    FROM words GROUP BY 1, 2
), profile AS (
    SELECT profile_lang, w FROM (
        SELECT profile_lang, w,
               ROW_NUMBER() OVER (PARTITION BY profile_lang
                                  ORDER BY cnt DESC, w) AS rk
        FROM freq
    ) WHERE rk <= {_PROFILE_K}
), scores AS (
    SELECT d.doc_id, d.lang, p.profile_lang, COUNT(*) AS overlap
    FROM doc_words d JOIN profile p ON d.w = p.w
    GROUP BY 1, 2, 3
), best AS (
    SELECT doc_id, lang, profile_lang AS predicted_lang FROM (
        SELECT doc_id, lang, profile_lang,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY overlap DESC, profile_lang) AS rk
        FROM scores
    ) WHERE rk = 1
)
SELECT lang, predicted_lang, COUNT(*) AS n_docs
FROM best GROUP BY 1, 2
""",
    doc="profile-based language-ID confusion matrix (broadcast profile join)",
    tags=("pipeline", "text", "langid"),
)
def text_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered entry: the (session, sf_dir)-cached PINNED confusion
    frame. The matrix is |langs|^2 rows but costs a full corpus classify
    to build, and it has two registered consumers (this query and
    text_lang_id_macro_f1) — the shared-cache roster pattern. The cache
    stores a pin_small_result LocalRelation, so unlike the persisted
    frames there is nothing to unpersist on rollover."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _CONFUSION_CACHE.get(key)
    if hit is None:
        _CONFUSION_CACHE.clear()
        hit = pin_small_result(_confusion_build(spark, sf_dir), 64)
        _CONFUSION_CACHE[key] = hit
    return hit


_CONFUSION_CACHE: dict[tuple[str, str], DataFrame] = {}


def _confusion_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    doc_words = words.distinct()
    freq = words.groupBy(F.col("lang").alias("profile_lang"), "w").agg(
        F.count("*").alias("cnt")
    )
    rk = Window.partitionBy("profile_lang").orderBy(F.col("cnt").desc(), "w")
    profile = (
        freq.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= _PROFILE_K)
        .select("profile_lang", "w")
    )
    scores = (
        doc_words.join(F.broadcast(profile), "w")
        .groupBy("doc_id", "lang", "profile_lang")
        .agg(F.count("*").alias("overlap"))
    )
    best_w = Window.partitionBy("doc_id").orderBy(
        F.col("overlap").desc(), "profile_lang"
    )
    best = (
        scores.withColumn("rk", F.row_number().over(best_w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang", F.col("profile_lang").alias("predicted_lang"))
    )
    return best.groupBy("lang", "predicted_lang").agg(F.count("*").alias("n_docs"))


# --- character-n-gram language-ID variant -----------------------------------------
# The classic Cavnar–Trenkle shape: per-language char-trigram profiles,
# classify by profile overlap. Complements the word-profile classifier above
# (same broadcast-profile-join + argmax plan, different feature space).


# --- shared char-trigram frame ------------------------------------------------------
# Both trained-model text queries (chargram lang-ID profiles, trigram-LM
# surprisal — and any future model-based filter) start from the identical
# exploded (doc_id, lang, g) frame; building it twice costs a full corpus
# scan + explode each. One persisted, materialized frame is shared through
# a single-entry cache (keyed by session + sf_dir; switching inputs
# unpersists the previous frame, so executor storage holds at most one
# corpus's grams — no session-lifetime leak across datasets).


_TRIGRAM_CACHE: dict[tuple[str, str], DataFrame] = {}


def char_trigram_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded char-trigram frame (doc_id, lang, g), persisted + shared.

    Docs shorter than a trigram contribute no rows — pinned explicitly
    because Spark's sequence(1, n) runs DESCENDING for n < 1 and would
    fabricate phantom grams where DuckDB's generate_series is empty (same
    guard as _spark_shingle_keys)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _TRIGRAM_CACHE.get(key)
    if hit is not None:
        return hit
    for old_key in list(_TRIGRAM_CACHE):
        _TRIGRAM_CACHE.pop(old_key).unpersist()
    d = load_table(spark, sf_dir, "documents")
    grams_arr = F.transform(
        F.sequence(F.lit(1), F.length("text") - F.lit(2)),
        lambda i: F.col("text").substr(i, F.lit(3)),
    )
    grams_arr = F.when(F.length("text") >= 3, grams_arr).otherwise(
        F.array().cast("array<string>")
    )
    grams = d.select("doc_id", "lang", F.explode(grams_arr).alias("g")).persist()
    grams.count()  # materialize: every consumer self-joins against it
    _TRIGRAM_CACHE[key] = grams
    return grams


@register(
    "text_lang_id_chargram",
    oracle=f"""
WITH grams AS (
    SELECT doc_id, lang,
           unnest([substr(text, i, 3)
                   FOR i IN generate_series(1, length(text) - 2)]) AS g
    FROM documents
), doc_grams AS (
    SELECT DISTINCT doc_id, lang, g FROM grams
), freq AS (
    SELECT lang AS profile_lang, g, COUNT(*) AS cnt FROM grams GROUP BY 1, 2
), profile AS (
    SELECT profile_lang, g FROM (
        SELECT profile_lang, g,
               ROW_NUMBER() OVER (PARTITION BY profile_lang
                                  ORDER BY cnt DESC, g) AS rk
        FROM freq
    ) WHERE rk <= {_PROFILE_K * 4}
), scores AS (
    SELECT d.doc_id, d.lang, p.profile_lang, COUNT(*) AS overlap
    FROM doc_grams d JOIN profile p ON d.g = p.g
    GROUP BY 1, 2, 3
), best AS (
    SELECT doc_id, lang, profile_lang AS predicted_lang FROM (
        SELECT doc_id, lang, profile_lang,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY overlap DESC, profile_lang) AS rk
        FROM scores
    ) WHERE rk = 1
)
SELECT lang, predicted_lang, COUNT(*) AS n_docs
FROM best GROUP BY 1, 2
""",
    doc="char-trigram language-ID confusion matrix (Cavnar-Trenkle shape)",
    tags=("pipeline", "text", "langid"),
)
def text_lang_id_chargram(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams = char_trigram_frame(spark, sf_dir)
    doc_grams = grams.distinct()
    freq = grams.groupBy(F.col("lang").alias("profile_lang"), "g").agg(
        F.count("*").alias("cnt")
    )
    rk = Window.partitionBy("profile_lang").orderBy(F.col("cnt").desc(), "g")
    profile = (
        freq.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= _PROFILE_K * 4)
        .select("profile_lang", "g")
    )
    scores = (
        doc_grams.join(F.broadcast(profile), "g")
        .groupBy("doc_id", "lang", "profile_lang")
        .agg(F.count("*").alias("overlap"))
    )
    best_w = Window.partitionBy("doc_id").orderBy(
        F.col("overlap").desc(), "profile_lang"
    )
    best = (
        scores.withColumn("rk", F.row_number().over(best_w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang", F.col("profile_lang").alias("predicted_lang"))
    )
    return best.groupBy("lang", "predicted_lang").agg(F.count("*").alias("n_docs"))


# --- text cleaning / normalization --------------------------------------------------
# The C4-style cleanup transform: lowercase, strip non-alphanumerics,
# collapse whitespace — pure regexp Column ops, scan-speed.


@register(
    "text_clean_normalize",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                           ' +', ' ', 'g')) AS clean_text,
       length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                  ' +', ' ', 'g'))) AS clean_len
FROM documents
""",
    doc="C4-style cleanup: lowercase, strip non-alnum, collapse whitespace",
    tags=("pipeline", "text", "clean"),
)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return d.select(
        "doc_id", clean.alias("clean_text"), F.length(clean).alias("clean_len")
    )


# --- TF-IDF -------------------------------------------------------------------------
# Classic sparse representation: tf(doc, term) x ln(N / df(term)). JVM and
# DuckDB libm ln() differ by ~1 ulp, so the EMITTED score is rounded to 9
# decimals (ranking is unaffected: within each engine equal (tf, df) pairs
# give exactly equal scores, and sub-ulp cross-term collisions don't occur).


@register(
    "text_tfidf_top_terms",
    oracle="""
WITH words AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), tf AS (
    SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY 1, 2
), df AS (
    SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.w,
           tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
    FROM tf JOIN df USING (w), n
)
SELECT doc_id, w, round(tfidf, 9) AS tfidf FROM (
    SELECT doc_id, w, tfidf,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, w) AS rk
    FROM scored
) WHERE rk <= 3
""",
    doc="TF-IDF with top-3 terms per document (tf join idf, windowed top-k)",
    tags=("pipeline", "text", "tfidf"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    tf = words.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    df = words.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()
    scored = tf.join(df, "w").select(
        "doc_id",
        "w",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf"),
    )
    w_rk = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "w")
    return (
        scored.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "w", F.round("tfidf", 9).alias("tfidf"))
    )


# --- trigram-LM surprisal (model-based quality filter) ------------------------------
# The model-based corpus-quality signal: train a per-language character
# trigram LM on the corpus itself, then score each document by its average
# surprisal under that model — the cheap stand-in for the "perplexity vs a
# reference LM" filter in LLM data pipelines (CCNet/Gopher style).
#
# Determinism: surprisal is quantized to WHOLE BITS with pure integer
# arithmetic — bits(tri) = floor(log2(tot/cnt)) = length(bin(tot div cnt))-1
# — so the per-document sum is an exact int64 in both engines; no libm, no
# float accumulation. The only double is the final avg (one IEEE division).
#
# Scale: the trigram model is tiny (≤ alphabet³ rows per language) →
# broadcast; the doc-side explode is linear in corpus chars; one shuffle on
# (lang, g) for counts and one on doc_id for the per-doc sum.


@register(
    "text_lm_surprisal",
    oracle="""
WITH docs AS (SELECT doc_id, lang, text FROM documents WHERE length(text) >= 3),
grams AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, length(text) - 2),
                               i -> substr(text, i, 3))) AS g
  FROM docs
),
model AS (SELECT lang, g, COUNT(*) AS cnt FROM grams GROUP BY 1, 2),
tot AS (SELECT lang, COUNT(*) AS tot FROM grams GROUP BY 1)
SELECT gr.doc_id, gr.lang,
       COUNT(*) AS n_trigrams,
       CAST(SUM(length(bin(t.tot // m.cnt)) - 1) AS BIGINT) AS surprisal_bits,
       CAST(SUM(length(bin(t.tot // m.cnt)) - 1) AS BIGINT) / COUNT(*) AS avg_bits
FROM grams gr
JOIN model m ON m.lang = gr.lang AND m.g = gr.g
JOIN tot t ON t.lang = gr.lang
GROUP BY 1, 2
""",
    doc="per-doc avg trigram surprisal (integer-quantized bits) under a "
    "self-trained per-language char-trigram LM",
    tags=("pipeline", "text", "lm"),
)
def text_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shared frame is already persisted + materialized (model and
    # totals both re-read grams, and grams joins back against them); docs
    # shorter than a trigram contribute no rows, subsuming the old
    # length-filter
    grams = char_trigram_frame(spark, sf_dir)
    model = grams.groupBy("lang", "g").agg(F.count("*").alias("cnt"))
    tot = grams.groupBy("lang").agg(F.count("*").alias("tot"))
    bits = F.length(F.bin(F.expr("tot div cnt"))) - F.lit(1)
    out = (
        grams.join(F.broadcast(model), ["lang", "g"])
        .join(F.broadcast(tot), "lang")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.sum(bits).alias("surprisal_bits"),
        )
        .select(
            "doc_id",
            "lang",
            "n_trigrams",
            "surprisal_bits",
            (F.col("surprisal_bits") / F.col("n_trigrams")).alias("avg_bits"),
        )
    )
    out = out.persist()
    out.count()
    # grams stays persisted: it is the shared cached frame (released when
    # the cache rolls over to another input)
    return out


# --- sliding-window chunking (RAG / long-context prep) ------------------------------
# Split long documents into fixed-size overlapping character chunks with
# provenance offsets — the step between "clean corpus" and "embedding
# index" in a RAG pipeline, and the long-document splitter for training.
# Map-only (explode of a per-doc start-offset sequence) — no shuffle at
# all; chunk fan-out is ceil(len/stride), bounded per doc.

CHUNK_SIZE = 200
CHUNK_STRIDE = 150  # 50-char overlap


@register(
    "text_chunk_sliding",
    oracle=f"""
SELECT doc_id,
       CAST((start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       start AS chunk_start,
       substr(text, start, {CHUNK_SIZE}) AS chunk_text,
       length(substr(text, start, {CHUNK_SIZE})) AS chunk_len
FROM (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text), 1), {CHUNK_STRIDE}))
           AS start
  FROM documents
)
""",
    doc="sliding-window character chunking with provenance offsets "
    "(size 200, stride 150)",
    tags=("pipeline", "text", "chunking"),
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    chunk = F.col("text").substr(F.col("chunk_start"), F.lit(CHUNK_SIZE))
    return (
        d.select("doc_id", "text", F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            ((F.col("chunk_start") - 1) / CHUNK_STRIDE)
            .cast("long")
            .alias("chunk_id"),
            "chunk_start",
            chunk.alias("chunk_text"),
            F.length(chunk).alias("chunk_len"),
        )
    )


# --- tokenizer vocabulary induction + OOV coverage ----------------------------------
# The statistic a tokenizer-training step reads: the top-V corpus words by
# frequency (the induced vocabulary) and each document's out-of-vocabulary
# token fraction against it. Scale shape: one word-count shuffle (the
# classic map-side-combined wordcount), a distributed top-V
# (TakeOrderedAndProject), the V-row vocabulary BROADCAST back, and one
# per-doc aggregate — the corpus token stream is never shuffled twice.
# Total-order vocab cut (count desc, word asc) keeps the boundary
# deterministic when frequencies tie.

VOCAB_V = 1000


@register(
    "text_vocab_coverage",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
vocab AS (
    SELECT w FROM (
        SELECT w, COUNT(*) AS n FROM toks GROUP BY 1
    ) ORDER BY n DESC, w LIMIT {VOCAB_V}
)
SELECT t.doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS oov_frac
FROM toks t LEFT JOIN vocab v USING (w)
GROUP BY 1
""",
    doc=f"vocabulary induction + coverage: top-{VOCAB_V} corpus words by "
    "frequency (total-order cut), per-doc OOV token fraction against the "
    "broadcast vocabulary — one wordcount shuffle + one per-doc aggregate",
    tags=("pipeline", "text", "vocab"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    freq = toks.groupBy("w").agg(F.count("*").alias("n"))
    vocab = (
        freq.orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(VOCAB_V)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(oov).cast("long").alias("n_oov"),
            (F.sum(oov).cast("double") / F.count("*")).alias("oov_frac"),
        )
    )


# --- BPE merge training (tokenizer induction, unrolled iterations) ------------------
# Byte-pair-encoding vocabulary induction over the corpus word-frequency
# table: K times, count adjacent symbol pairs (weighted by word frequency,
# every position counted, as in Sennrich et al.'s reference implementation)
# and merge the most frequent pair everywhere. Determinism: total-order
# pair selection (count desc, left asc, right asc); the merge applies via
# plain leftmost non-overlapping string replace over a trailing-delimiter
# symbol encoding ("a␟b␟c␟"), which is EXACTLY greedy left-to-right BPE
# merging in both engines ("a␟a␟a␟" + merge(a,a) -> "aa␟a␟").
# Scale shape: the corpus tokenizes once into a word-frequency table
# (wordcount shuffle) that is orders of magnitude smaller than the corpus;
# each iteration is one pair-count aggregate over that table + a map-only
# rewrite. Spark folds each round's winner to a literal (the same
# trained-model-broadcast pattern as ann_ivf_kmeans); the oracle unrolls
# identical iterations in SQL, so the training loop itself is
# differentially checked.

BPE_ITERS = 3
_D = chr(31)  # unit separator: never appears in the corpus text


def _sql_bpe_pairs(w: str) -> str:
    return f"""
    SELECT a, b, total FROM (
        SELECT p.a AS a, p.b AS b, SUM(cnt) AS total FROM (
            SELECT cnt,
                   unnest([struct_pack(a := ls[i], b := ls[i+1])
                           FOR i IN generate_series(1, len(ls) - 2)]) AS p
            FROM (SELECT cnt, string_split(seq, chr(31)) AS ls FROM {w})
            WHERE len(ls) >= 3
        ) GROUP BY 1, 2
    ) ORDER BY total DESC, a, b LIMIT 1
"""


def _sql_bpe_merge(w: str, p: str) -> str:
    return (
        f"SELECT word, cnt, replace(seq, {p}.a || chr(31) || {p}.b || chr(31), "
        f"{p}.a || {p}.b || chr(31)) AS seq FROM {w}, {p}"
    )


# the shared words -> w0..w3 unrolled-training CTE chain (word key carried
# through so the encode oracle can join the token stream back)
_SQL_BPE_CHAIN = f"""words AS (
    SELECT w AS word, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ) GROUP BY 1
),
w0 AS (
    SELECT word, cnt,
           array_to_string(regexp_split_to_array(word, ''), chr(31)) || chr(31)
               AS seq
    FROM words
),
p1 AS ({_sql_bpe_pairs("w0")}),
w1 AS ({_sql_bpe_merge("w0", "p1")}),
p2 AS ({_sql_bpe_pairs("w1")}),
w2 AS ({_sql_bpe_merge("w1", "p2")}),
p3 AS ({_sql_bpe_pairs("w2")}),
w3 AS ({_sql_bpe_merge("w2", "p3")})"""


# Trained-model cache, same single-entry discipline as _TRIGRAM_CACHE:
# both BPE queries (merges table, encode/apply) consume the identical
# trained vocabulary; training runs the iterative merge loop (3 actions +
# a driver round-trip each), so sharing it saves a full re-train per
# consumer. Consumers must NOT unpersist the returned frame (CLAUDE.md
# shared-frame convention); the cache rolls over on input change.
_BPE_CACHE: dict[tuple[str, str], tuple[DataFrame, list]] = {}


def bpe_trained_frame(spark: SparkSession, sf_dir: str):
    """Trained BPE state: (final (w, cnt, seq) DataFrame — persisted,
    shared, do not unpersist — and the merge list
    [(iteration, a, b, weighted_count)])."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _BPE_CACHE.get(key)
    if hit is not None:
        return hit
    for old_key in list(_BPE_CACHE):
        _BPE_CACHE.pop(old_key)[0].unpersist()
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    seqs = words.select(
        "w",
        "cnt",
        F.concat(F.array_join(F.split("w", ""), _D), F.lit(_D)).alias("seq"),
    )
    # the word-frequency table is re-read every iteration: persist once
    seqs = seqs.persist()
    seqs.count()
    merges: list[tuple[int, str, str, int]] = []
    for it in range(1, BPE_ITERS + 1):
        ls = F.split("seq", _D)  # trailing empty element: symbols = size-1
        pair_arr = F.when(
            F.size(ls) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.size(ls) - F.lit(2)),
                lambda i: F.struct(
                    F.element_at(ls, i).alias("a"),
                    F.element_at(ls, i + F.lit(1)).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        top = (
            seqs.select("cnt", F.explode(pair_arr).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.col("total").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()[0]
        )
        merges.append((it, top["a"], top["b"], int(top["total"])))
        merged = seqs.select(
            "w",
            "cnt",
            F.replace(
                F.col("seq"),
                F.lit(top["a"] + _D + top["b"] + _D),
                F.lit(top["a"] + top["b"] + _D),
            ).alias("seq"),
        ).persist()
        merged.count()
        seqs.unpersist()
        seqs = merged
    _BPE_CACHE[key] = (seqs, merges)
    return seqs, merges


@register(
    "text_bpe_merges",
    oracle=f"""
WITH {_SQL_BPE_CHAIN}
SELECT 1 AS iteration, a AS left_sym, b AS right_sym,
       CAST(total AS BIGINT) AS pair_count FROM p1
UNION ALL SELECT 2, a, b, CAST(total AS BIGINT) FROM p2
UNION ALL SELECT 3, a, b, CAST(total AS BIGINT) FROM p3
""",
    doc=f"BPE tokenizer training, {BPE_ITERS} unrolled merge iterations "
    "over the corpus word-frequency table — the merge table "
    "(iteration, pair, weighted count), differentially checked against "
    "the same iterations unrolled in SQL",
    tags=("pipeline", "text", "bpe"),
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, merges = bpe_trained_frame(spark, sf_dir)
    return spark.createDataFrame(
        merges, "iteration int, left_sym string, right_sym string, pair_count long"
    )


@register(
    "text_bpe_encode",
    oracle=f"""
WITH {_SQL_BPE_CHAIN},
toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
)
SELECT t.doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(len(string_split(w3.seq, chr(31))) - 1) AS BIGINT)
           AS n_bpe_tokens
FROM toks t JOIN w3 ON w3.word = t.w
GROUP BY 1
""",
    doc="BPE encode (apply step): per-doc token count after the trained "
    "merges — the token stream joins the BROADCAST merged-vocabulary "
    "table (symbol count per word is precomputed once per vocab entry, "
    "never per occurrence)",
    tags=("pipeline", "text", "bpe"),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    seqs, _ = bpe_trained_frame(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    vocab = seqs.select(
        "w", (F.size(F.split("seq", _D)) - F.lit(1)).alias("n_sym")
    )
    return (
        toks.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
        )
    )


# --- positional inverted index + phrase query -----------------------------------------
# The search-engine workload the tf-idf/vocab ops stop short of: a
# POSITIONAL posting list (term, doc_id, pos) and a phrase query answered
# by position-adjacency join — postings for the two phrase terms equi-join
# on (doc_id, next-position), never a scan of full texts with LIKE. At
# scale the index is the materialized table (term-bucketed, sorted by
# doc_id so the join is merge-friendly); here it is built inline from the
# same array-side explode used everywhere else (positions via transform
# over sequence — one map pass, no per-row Python). The phrase is a fixed
# query literal, so the whole pipeline — index build, selective term scan,
# adjacency join, per-doc occurrence count — is differentially checked.

PHRASE_W1 = "table"
PHRASE_W2 = "value"


@register(
    "text_phrase_search_postings",
    oracle=f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
p AS (
    SELECT doc_id, g.i AS pos, toks[g.i] AS term
    FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
)
SELECT a.doc_id, COUNT(*) AS n_occurrences
FROM p a
JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = '{PHRASE_W1}' AND b.term = '{PHRASE_W2}'
GROUP BY 1
""",
    doc=f"positional inverted index + phrase query '{PHRASE_W1} {PHRASE_W2}': "
    "(term, doc_id, pos) postings from one array-side explode, phrase hits "
    "via position-adjacency equi-join of the two terms' (selective) "
    "posting lists, per-doc occurrence counts",
    tags=("pipeline", "text", "search"),
)
def text_phrase_search_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # materialize the token array as a real column FIRST: element_at over a
    # raw split(...) expression re-runs the split per lookup (the O(n^2)
    # trap called out in CLAUDE.md / _spark_shingle_keys)
    # NULL text ⇒ size(toks) = -1 ⇒ sequence(1, -1) runs DESCENDING and
    # would fabricate phantom posting rows — same descending-sequence trap
    # guarded in text_lang_id_chargram, so same guard: no tokens, no rows.
    tokd = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    postings = tokd.select(
        "doc_id",
        F.explode(
            F.transform(
                # size(toks) >= 1 always here: text is non-null and split()
                # yields at least one element, so the sequence is ascending
                F.sequence(F.lit(1), F.size(toks)),
                lambda i: F.struct(
                    i.alias("pos"), F.element_at(toks, i).alias("term")
                ),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.pos").alias("pos"), F.col("p.term").alias("term"))
    a = postings.filter(F.col("term") == PHRASE_W1).select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    b = postings.filter(F.col("term") == PHRASE_W2).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b")
    )
    return (
        a.join(
            b,
            (a["doc_id"] == b["doc_b"]) & (b["pos_b"] == a["pos_a"] + 1),
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_occurrences"))
    )


# --- corpus n-gram novelty (dedup-aware curriculum signal) --------------------------
# Per-document novelty: the fraction of a doc's DISTINCT word trigrams
# whose FIRST corpus occurrence (min doc_id — ingestion order) is this
# document. The signal behind dedup-aware sampling / curriculum ordering:
# late documents made of already-seen n-grams are boilerplate-heavy and
# get down-weighted; high-novelty documents carry new content. (The
# per-gram min-owner attribution is the same first-writer-wins rule as
# dedup_substring_exact's representative pick.)
#
# Scale: explode is linear in corpus tokens; one shuffle on the gram for
# the min-owner aggregate, one shuffle back on doc_id for the per-doc
# ratio. No joins against anything wider than the gram frame itself and
# the min-owner side collapses to one row per distinct gram before the
# join — both sides of every shuffle are bounded by the corpus size.

NOVELTY_N = 3  # word trigrams


# One shared Spark/SQL pair for the DISTINCT word-trigram frame — the
# novelty scorer here and curation_greedy_coverage both start from it;
# two hand-kept copies of gram construction (with its descending-sequence
# guard) would let the engine-lockstep oracles drift apart.
SQL_WORD_TRIGRAMS_CTE = f"""
grams AS (
    SELECT DISTINCT doc_id,
           concat_ws(' ', ws[i], ws[i+1], ws[i+2]) AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents WHERE text IS NOT NULL) toks,
         unnest(generate_series(1, len(ws) - {NOVELTY_N - 1})) AS t(i)
    WHERE len(ws) >= {NOVELTY_N}
)"""


def spark_word_trigram_frame(d: DataFrame) -> DataFrame:
    """DISTINCT (doc_id, g) word-trigram frame; ascending-sequence guard
    (same trap as char_trigram_frame): docs with fewer than N tokens
    contribute no rows."""
    toks = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    ws = F.col("ws")
    grams_arr = F.when(
        F.size(ws) >= NOVELTY_N,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - F.lit(NOVELTY_N - 1)),
            lambda i: F.concat_ws(
                " ",
                F.element_at(ws, i),
                F.element_at(ws, i + F.lit(1)),
                F.element_at(ws, i + F.lit(2)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select("doc_id", F.explode(grams_arr).alias("g")).distinct()


@register(
    "text_ngram_novelty",
    oracle=f"""
WITH {SQL_WORD_TRIGRAMS_CTE},
first_owner AS (
    SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY 1
)
SELECT gr.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel,
       round(CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 9) AS novelty_ratio
FROM grams gr JOIN first_owner f USING (g)
GROUP BY 1
""",
    doc="per-doc novelty: fraction of distinct word trigrams first seen in "
    "this doc (min-doc_id owner) — dedup-aware curriculum/sampling signal",
    tags=("pipeline", "text", "novelty"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    grams = spark_word_trigram_frame(d)
    # self-join on a derived frame: persist + materialize first (CLAUDE.md)
    grams = grams.persist()
    grams.count()
    first_owner = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    out = (
        grams.join(first_owner, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_grams"), 9
            ).alias("novelty_ratio"),
        )
    )
    out = out.persist()
    out.count()
    grams.unpersist()
    return out


# --- tokenizer fertility by language ------------------------------------------------
# Pretraining capacity planning: tokens-per-character ("fertility") per
# language tells you how a whitespace tokenizer (or any tokenizer whose
# counts you substitute) spends sequence budget across languages. Pure
# aggregate — integer token/char totals, one double ratio at the end.


@register(
    "text_tokenizer_fertility",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) * 100.0
         / CAST(SUM(length(text)) AS BIGINT) AS tokens_per_100_chars
FROM documents
WHERE text IS NOT NULL
GROUP BY 1
""",
    doc="tokenizer fertility per language: tokens and chars are exact "
    "integer totals (map-side combined), one double ratio at the end — "
    "sequence-budget planning across languages",
    tags=("pipeline", "text", "diagnostics"),
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.size(F.split("text", " "))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).cast("long").alias("total_tokens"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        (
            F.sum(toks).cast("long") * F.lit(100.0)
            / F.sum(F.length("text")).cast("long")
        ).alias("tokens_per_100_chars"),
    )


# --- CCNet-style perplexity buckets -------------------------------------------------
# CCNet (Wenzek et al. 2020) buckets web documents into head/middle/tail by
# language-model perplexity percentile WITHIN each language, then trains
# mostly on the head. Composition: the self-trained trigram-LM surprisal
# (text_lm_surprisal's integer-quantized bits) ranked per-language with the
# grouped distributed prefix-sum rank (range repartition over
# (lang, key) + pid windows + driver offsets) mapped through the
# closed-form NTILE(3) bucket formula — lang is skewed, so a
# lang-partitioned window sort would hand the dominant language to one
# task; the doc_id tiebreaker totals the order.


@register(
    "quality_perplexity_buckets",
    oracle="""
WITH docs AS (SELECT doc_id, lang, text FROM documents WHERE length(text) >= 3),
grams AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, length(text) - 2),
                               i -> substr(text, i, 3))) AS g
  FROM docs
),
model AS (SELECT lang, g, COUNT(*) AS cnt FROM grams GROUP BY 1, 2),
tot AS (SELECT lang, COUNT(*) AS tot FROM grams GROUP BY 1),
scored AS (
  SELECT gr.doc_id, gr.lang,
         COUNT(*) AS n_trigrams,
         CAST(SUM(length(bin(t.tot // m.cnt)) - 1) AS BIGINT) AS surprisal_bits
  FROM grams gr
  JOIN model m ON m.lang = gr.lang AND m.g = gr.g
  JOIN tot t ON t.lang = gr.lang
  GROUP BY 1, 2
)
SELECT doc_id, lang, surprisal_bits,
       CASE NTILE(3) OVER (PARTITION BY lang
                           ORDER BY surprisal_bits * 1000000 // n_trigrams,
                                    doc_id)
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM scored
""",
    doc="CCNet-style head/middle/tail buckets: per-language exact NTILE(3) "
    "over integer-scaled avg trigram surprisal (micro-bits, no float "
    "ranking keys) via the grouped distributed prefix-sum rank — lang is "
    "a skewed key, so no lang-partitioned window sort",
    tags=("pipeline", "text", "quality"),
)
def quality_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams = char_trigram_frame(spark, sf_dir)
    model = grams.groupBy("lang", "g").agg(F.count("*").alias("cnt"))
    tot = grams.groupBy("lang").agg(F.count("*").alias("tot"))
    bits = F.length(F.bin(F.expr("tot div cnt"))) - F.lit(1)
    scored = (
        grams.join(F.broadcast(model), ["lang", "g"])
        .join(F.broadcast(tot), "lang")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.sum(bits).cast("long").alias("surprisal_bits"),
        )
    )
    # integer-scaled ranking key: micro-bits per trigram (exact int64 div —
    # a double avg as the ORDER BY key could tie-break differently across
    # engines at the ntile boundary). Language is a SKEWED key (the
    # dominant language is ~half the corpus), so the per-lang NTILE goes
    # through the grouped distributed prefix-sum rank + closed-form bucket
    # formula — never a lang-partitioned window sort (one task would hold
    # the whole majority language). Lazy import: module-level would churn
    # registry order (rotation window).
    from f1_lakehouse_spark.operators.extensions import (  # noqa: PLC0415
        _ntile_from_rank_cols,
        grouped_prefix_rank,
    )

    keyed = scored.withColumn(
        "rank_key", F.expr("surprisal_bits * 1000000 div n_trigrams")
    )
    ranked, release = grouped_prefix_rank(
        spark, keyed, ["lang"], [F.col("rank_key").asc(), F.col("doc_id").asc()]
    )
    nt = _ntile_from_rank_cols(F.col("rank"), F.col("n_g"), 3)
    out = ranked.select(
        "doc_id",
        "lang",
        "surprisal_bits",
        F.when(nt == 1, "head").when(nt == 2, "middle").otherwise("tail").alias(
            "bucket"
        ),
    )
    out = out.persist()
    out.count()
    release()
    return out


# --- per-source vocabulary entropy --------------------------------------------------
# Corpus-diversity monitoring: an integer-quantized Shannon entropy of the
# word distribution per source — a collapsed scrape (one page repeated)
# shows near-zero entropy, a healthy crawl sits near the corpus ceiling.
# Same no-float-log discipline as the LM surprisal: per-word surprisal is
# floor(log2(tot/cnt)) via binary length, and H_hat is the count-weighted
# mean of those integer bits (one double division at the end). Two
# word-keyed aggregates with map-side combine; model-sized output.


@register(
    "text_source_vocab_entropy",
    oracle="""
WITH words AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL
),
cnts AS (SELECT source, w, COUNT(*) AS cnt FROM words GROUP BY 1, 2),
tots AS (SELECT source, SUM(cnt) AS tot, COUNT(*) AS vocab FROM cnts GROUP BY 1)
SELECT c.source, t.vocab, CAST(t.tot AS BIGINT) AS n_tokens,
       round(CAST(SUM(c.cnt * (length(bin(t.tot // c.cnt)) - 1)) AS DOUBLE)
             / t.tot, 9) AS entropy_bits
FROM cnts c JOIN tots t USING (source)
GROUP BY 1, 2, t.tot
""",
    doc="per-source vocabulary entropy (integer-quantized bits, no float "
    "logs): count-weighted mean word surprisal — collapsed-scrape "
    "detection; two map-side-combined aggregates, |sources| output rows",
    tags=("pipeline", "text", "diagnostics"),
)
def text_source_vocab_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    cnts = words.groupBy("source", "w").agg(F.count("*").alias("cnt"))
    cnts = cnts.persist()
    cnts.count()  # two derived uses: totals + the weighted sum (CLAUDE.md)
    tots = cnts.groupBy("source").agg(
        F.sum("cnt").alias("tot"), F.count("*").alias("vocab")
    )
    bits = F.length(F.bin(F.expr("tot div cnt"))) - F.lit(1)
    out = (
        cnts.join(F.broadcast(tots), "source")
        .groupBy("source", "vocab", F.col("tot").cast("long").alias("n_tokens"))
        .agg(
            F.round(
                F.sum(F.col("cnt") * bits).cast("double") / F.first("tot"), 9
            ).alias("entropy_bits")
        )
    )
    out = out.persist()
    out.count()
    cnts.unpersist()
    return out


# --- top collocations by PMI --------------------------------------------------------
# Collocation mining: the adjacent word pairs most over-represented vs
# their unigram frequencies — tokenizer-merge candidates and stock-phrase
# detectors. Ranking is the EXACT integer floor of the PMI ratio
#     cnt_xy * tot_u^2 div (tot_b * cnt_x * cnt_y)
# (scale-0 decimals / HUGEINT — no float logs, no division rounding
# ambiguity), tie-broken by count then bigram. Unigram model broadcasts;
# one bigram aggregate + TakeOrdered.

PMI_MIN_COUNT = 5
PMI_TOP = 20


@register(
    "text_bigram_pmi_top",
    oracle=f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL
),
uni AS (
  SELECT g, COUNT(*) AS cnt FROM (SELECT unnest(ws) AS g FROM toks) GROUP BY 1
),
ut AS (SELECT SUM(cnt) AS tot_u FROM uni),
big AS (
  SELECT w1, w2, COUNT(*) AS cnt_xy FROM (
    SELECT ws[i] AS w1, ws[i + 1] AS w2
    FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
    WHERE len(ws) >= 2
  ) GROUP BY 1, 2
),
bt AS (SELECT SUM(cnt_xy) AS tot_b FROM big)
SELECT b.w1 || ' ' || b.w2 AS bigram,
       b.cnt_xy,
       CAST(CAST(b.cnt_xy AS HUGEINT) * CAST(ut.tot_u AS HUGEINT)
            * CAST(ut.tot_u AS HUGEINT)
            // (CAST(bt.tot_b AS HUGEINT) * u1.cnt * u2.cnt)
            AS BIGINT) AS pmi_ratio_floor
FROM big b
JOIN uni u1 ON u1.g = b.w1
JOIN uni u2 ON u2.g = b.w2
CROSS JOIN ut CROSS JOIN bt
WHERE b.cnt_xy >= {PMI_MIN_COUNT}
ORDER BY pmi_ratio_floor DESC, b.cnt_xy DESC, bigram
LIMIT {PMI_TOP}
""",
    doc=f"top-{PMI_TOP} collocations by exact integer-floor PMI ratio "
    "(no float logs): broadcast unigram model, one bigram aggregate, "
    "TakeOrdered — tokenizer-merge / stock-phrase mining",
    tags=("pipeline", "text", "collocation"),
)
def text_bigram_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select(F.split("text", " ").alias("ws"))
    toks = toks.persist()
    toks.count()  # feeds both the unigram and bigram extracts (CLAUDE.md)
    uni = (
        toks.select(F.explode("ws").alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("cnt"))
    )
    ws = F.col("ws")
    pairs = F.when(
        F.size(ws) >= 2,  # ascending-sequence guard
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - F.lit(1)),
            lambda i: F.struct(
                F.element_at(ws, i).alias("w1"),
                F.element_at(ws, i + F.lit(1)).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = (
        toks.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt_xy"))
    )
    big = big.persist()
    big.count()  # feeds the total and the scored join (CLAUDE.md)
    ut = uni.agg(F.sum("cnt").alias("tot_u"))
    bt = big.agg(F.sum("cnt_xy").alias("tot_b"))
    dec = "decimal(38,0)"
    u1 = uni.select(F.col("g").alias("w1"), F.col("cnt").alias("cnt_x"))
    u2 = uni.select(F.col("g").alias("w2"), F.col("cnt").alias("cnt_y"))
    score = F.expr(
        "CAST(cnt_xy AS DECIMAL(38,0)) * CAST(tot_u AS DECIMAL(38,0))"
        " * CAST(tot_u AS DECIMAL(38,0))"
        " div (CAST(tot_b AS DECIMAL(38,0)) * cnt_x * cnt_y)"
    )
    out = (
        big.filter(F.col("cnt_xy") >= PMI_MIN_COUNT)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(ut))
        .crossJoin(F.broadcast(bt))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            "cnt_xy",
            score.cast("long").alias("pmi_ratio_floor"),
        )
        .orderBy(
            F.col("pmi_ratio_floor").desc(),
            F.col("cnt_xy").desc(),
            F.col("bigram").asc(),
        )
        .limit(PMI_TOP)
    )
    out = out.persist()
    out.count()
    toks.unpersist()
    big.unpersist()
    return out


# --- within-document repeated-span removal --------------------------------------------
# The in-document half of corpus dedup (RefinedWeb/C4 run line-level and
# repeated-span removal INSIDE each page before any cross-doc pass; Lee et
# al. '22 deduplicate repeated substrings wherever they occur, including
# within one document). The cross-doc family here already covers
# minhash/simhash/substring fingerprints; this op is the per-doc TRANSFORM:
# a token 3-gram whose exact content already occurred earlier in the same
# document marks its 3-token span, every token inside any marked span is
# removed, and the cleaned text is re-joined. Everything is array
# higher-order functions on one row — map-only, zero shuffle, scan-speed;
# at 100 TB it parallelizes perfectly by split (cost is O(len^2) string
# compares per doc worst case from the first-occurrence probe, bounded by
# the corpus max doc length — the explode+window alternative trades that
# for a per-doc shuffle, the wrong trade while max doc length is bounded).
# The cleaned text itself is evidenced by an md5 signature so the oracle
# hash-checks the exact reconstruction, not just the counts.


@register(
    "text_intradoc_span_dedup",
    oracle="""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks
    FROM documents WHERE text IS NOT NULL
), g AS (
    SELECT doc_id, toks,
           CASE WHEN len(toks) >= 3 THEN
               [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                FOR i IN generate_series(1, len(toks) - 2)]
           ELSE [] END AS grams
    FROM t
), dd AS (
    SELECT doc_id, toks,
           list_filter(generate_series(1, len(grams)),
                       i -> list_position(grams, grams[i]) < i) AS dups
    FROM g
), k AS (
    SELECT doc_id, toks, dups,
           list_filter(generate_series(1, len(toks)),
                       j -> len(list_filter(dups,
                                d -> d >= j - 2 AND d <= j)) = 0) AS kept
    FROM dd
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(dups) AS BIGINT) AS n_dup_spans,
       CAST(len(toks) - len(kept) AS BIGINT) AS n_tokens_removed,
       substr(md5(array_to_string(list_transform(kept, j -> toks[j]), ' ')),
              1, 12) AS clean_sig
FROM k
""",
    doc="within-document repeated 3-gram span removal (RefinedWeb-style "
    "in-doc dedup): spans whose 3-gram occurred earlier in the same doc "
    "are cut, cleaned text evidenced via md5 signature; map-only array "
    "ops, zero shuffle",
    tags=("pipeline", "text", "dedup"),
)
def text_intradoc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # each derived array is materialized as a real column in its own
    # projection before any lambda indexes into it (the element_at-over-
    # unmaterialized-transform O(n^2) trap, CLAUDE.md)
    tokd = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    grams_arr = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(2)),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + F.lit(1)),
            F.element_at(toks, i + F.lit(2)),
        ),
    )
    # sequence(1, n) runs DESCENDING for n < 1 — same guard as everywhere
    gramd = tokd.select(
        "doc_id",
        "toks",
        F.when(F.size(toks) >= 3, grams_arr)
        .otherwise(F.array().cast("array<string>"))
        .alias("grams"),
    )
    grams = F.col("grams")
    dup_starts = F.filter(
        F.sequence(F.lit(1), F.size(grams)),
        lambda i: F.array_position(grams, F.element_at(grams, i)) < i,
    )
    dupd = gramd.select(
        "doc_id",
        "toks",
        F.when(F.size(grams) >= 1, dup_starts)
        .otherwise(F.array().cast("array<int>"))
        .alias("dups"),
    )
    dups = F.col("dups")
    kept = F.filter(
        # split() on non-null text yields >= 1 element, so this sequence
        # is always ascending
        F.sequence(F.lit(1), F.size(toks)),
        lambda j: ~F.exists(dups, lambda dd: (dd >= j - F.lit(2)) & (dd <= j)),
    )
    keptd = dupd.select("doc_id", "toks", "dups", kept.alias("kept"))
    clean_text = F.array_join(
        F.transform(F.col("kept"), lambda j: F.element_at(toks, j)), " "
    )
    return keptd.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(dups).cast("long").alias("n_dup_spans"),
        (F.size(toks) - F.size(F.col("kept"))).cast("long").alias("n_tokens_removed"),
        F.substring(F.md5(clean_text), 1, 12).alias("clean_sig"),
    )


# --- trailing repetition-loop detection ----------------------------------------------
# The degenerate-output audit for model-generated or crawler-mangled text:
# a document whose tail is the same 1..4-word block repeated over and over
# ("the end the end the end ...") poisons LM training far out of
# proportion to its token count. For each period p, the tail run length is
# the longest m with ws[n-i] == ws[n-i-p] for i in 0..m-1 (each tail word
# equals the word p earlier), found as (first mismatch - 1) — one
# array-fold per period, map-only, no shuffle at all; the smallest period
# that yields >= 2 consecutive blocks wins. All integer arithmetic, so the
# oracle is exact.

REP_MAX_PERIOD = 4


def _rep_runs_sql() -> str:
    # indices stay >= 1 by construction (greatest + reversed array); an
    # i+p beyond the list yields NULL, NULL != x is NULL, list_filter
    # drops it — identical to Spark's element_at/filter semantics
    runs = []
    for p in range(1, REP_MAX_PERIOD + 1):
        runs.append(
            f"CASE WHEN len(rws) > {p} THEN "
            f"COALESCE(list_min(list_filter(generate_series(1, greatest(len(rws)-{p}, 1)), "
            f"i -> rws[i] != rws[i+{p}])) - 1, len(rws)-{p}) "
            f"ELSE 0 END AS run{p}"
        )
    return ",\n           ".join(runs)


def _rep_best_sql(expr: str) -> str:
    clauses = " ".join(
        f"WHEN run{p} >= {p} THEN {expr.format(p=p)}"
        for p in range(1, REP_MAX_PERIOD + 1)
    )
    return f"CASE {clauses} ELSE {expr.format(p=0)} END"


@register(
    "text_repetition_loop_detect",
    oracle=f"""
WITH base AS (
    SELECT doc_id, list_reverse(string_split(text, ' ')) AS rws
    FROM documents WHERE text IS NOT NULL
),
runs AS (
    SELECT doc_id, len(rws) AS n,
           {_rep_runs_sql()}
    FROM base
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST({_rep_best_sql("{p}")} AS INTEGER) AS loop_period,
       CAST(CASE """
    + " ".join(
        f"WHEN run{p} >= {p} THEN run{p} // {p} + 1"
        for p in range(1, REP_MAX_PERIOD + 1)
    )
    + """ ELSE 1 END AS BIGINT) AS loop_repeats
FROM runs
""",
    doc="trailing repetition-loop detector (degenerate-generation audit): "
    "per period p in 1..4, tail run = longest suffix matching itself "
    "shifted by p, via one array-fold per period; smallest looping period "
    "and its block-repeat count; map-only, zero shuffle",
    tags=("pipeline", "text", "quality"),
)
def text_repetition_loop_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # reversed token array materialized as a real column (element_at-over-
    # unmaterialized-expression trap, CLAUDE.md); tail comparisons become
    # head-aligned rws[i] vs rws[i+p], so every index is >= 1 and an i+p
    # past the end returns NULL, which the filter predicate drops — no
    # descending-sequence / index-zero hazard in any branch
    base = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.reverse(F.split("text", " ")).alias("rws")
    )
    rws = F.col("rws")
    n = F.size(rws)

    # NOTE: the predicate must be a ONE-argument lambda — `lambda i, p=p:`
    # would be treated by F.filter as the documented two-arg (value, index)
    # form and the second parameter would silently receive the ARRAY INDEX
    # instead of the closure default. Capture p with a factory instead.
    def _mismatch_pred(p: int):
        return lambda i: F.try_element_at(rws, i) != F.try_element_at(
            rws, i + F.lit(p)
        )

    runs = []
    for p in range(1, REP_MAX_PERIOD + 1):
        mism = F.filter(
            F.sequence(F.lit(1), F.greatest(n - F.lit(p), F.lit(1))),
            _mismatch_pred(p),
        )
        run = F.when(
            n > p, F.coalesce(F.array_min(mism) - 1, n - F.lit(p))
        ).otherwise(F.lit(0))
        runs.append(run.alias(f"run{p}"))
    r = base.select("doc_id", n.alias("n"), *runs)
    hits = F.filter(
        F.array(
            *[
                F.struct(
                    F.lit(p).alias("p"),
                    (F.floor(F.col(f"run{p}") / F.lit(p)) + 1).alias("reps"),
                    F.col(f"run{p}").alias("run"),
                )
                for p in range(1, REP_MAX_PERIOD + 1)
            ]
        ),
        lambda s: s["run"] >= s["p"],
    )
    return r.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.when(F.size(hits) >= 1, F.element_at(hits, 1)["p"])
        .otherwise(F.lit(0))
        .cast("int")
        .alias("loop_period"),
        F.when(F.size(hits) >= 1, F.element_at(hits, 1)["reps"])
        .otherwise(F.lit(1))
        .cast("long")
        .alias("loop_repeats"),
    )


# --- ROUGE-L over near-duplicate candidate pairs ------------------------------------
# Sequence alignment as a distributed computation: for every MinHash-LSH
# candidate pair, the token-level Longest Common Subsequence — the
# statistic behind ROUGE-L (summarization eval) and order-aware near-dup
# verification (Jaccard is orderless; LCS is not). The full DP table is
# evaluated inside the row as a NESTED fold: the outer fold carries the
# previous DP row (a BIGINT list), the inner fold grows the current row
# (growing-list accumulator; both engines wrap tokens as 1-element lists
# so the fold lists stay homogeneous, per the DuckDB list_reduce typing
# rule). Tokens are md5-hashed ints capped at ROUGE_CAP per doc, so each
# pair costs <= CAP^2 integer lambda steps — candidate-bounded work, no
# quadratic corpus scan anywhere.

ROUGE_CAP = 40


def _rouge_tok_sql(col: str) -> str:
    return (
        f"list_transform(list_slice(list_transform("
        f"list_filter(regexp_split_to_array(lower({col}), '\\s+'), w -> w <> ''), "
        f"w -> {sql_md5_hash48('w')}), 1, {ROUGE_CAP}), h -> [h])"
    )


_ROUGE_LCS_SQL = """
list_reduce(
  list_prepend(pad, ta),
  (prev, arow) -> list_reduce(
      list_prepend(CAST([0] AS BIGINT[]), tb),
      (acc2, brow) -> list_append(acc2,
          greatest(prev[len(acc2) + 1], acc2[len(acc2)],
                   prev[len(acc2)] + CASE WHEN arow[1] = brow[1] THEN 1 ELSE 0 END))
  )
)[len(tb) + 1]
"""


from f1_lakehouse_spark.pipeline.dedup import MINHASH_PAIRS_SQL as _MH_PAIRS_SQL

_ROUGE_ORACLE = f"""
WITH cand AS ({_MH_PAIRS_SQL}),
toks AS (
  SELECT doc_id, {_rouge_tok_sql('text')} AS tok FROM documents
),
padded AS (
  SELECT c.doc_a, c.doc_b, a.tok AS ta, b.tok AS tb,
         list_transform(range(0, len(b.tok) + 1), i -> CAST(0 AS BIGINT)) AS pad
  FROM cand c
  JOIN toks a ON a.doc_id = c.doc_a
  JOIN toks b ON b.doc_id = c.doc_b
), scored AS (
  SELECT doc_a, doc_b,
         CAST(len(ta) AS BIGINT) AS n_a,
         CAST(len(tb) AS BIGINT) AS n_b,
         {_ROUGE_LCS_SQL} AS lcs_len
  FROM padded
)
SELECT doc_a, doc_b, n_a, n_b, lcs_len,
       2.0 * CAST(lcs_len AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS rouge_l_f1
FROM scored
"""


@register(
    "text_rouge_l_candidates",
    oracle=_ROUGE_ORACLE,
    doc=f"ROUGE-L (token LCS, cap {ROUGE_CAP}) for every MinHash-LSH "
    "candidate pair: the full DP table evaluated in-row by a nested "
    "growing-list fold — order-aware near-dup verification, exact "
    "integer DP cross-engine",
    tags=("pipeline", "text", "rouge", "dp"),
)
def text_rouge_l_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LCS DP as a nested fold; see _ROUGE_LCS_SQL for the shared shape.
    At 100 TB: candidates come from the sub-quadratic LSH pass; per-pair
    cost is a fixed <= CAP^2 integer fold; texts join to the bounded pair
    list (never pair-exploded corpus-wide)."""
    from f1_lakehouse_spark.pipeline.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(d)
    toks = d.select(
        "doc_id",
        F.slice(
            F.transform(
                F.filter(
                    F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != ""
                ),
                lambda w: F.conv(F.substring(F.md5(w), 1, 12), 16, 10).cast(
                    "long"
                ),
            ),
            1,
            ROUGE_CAP,
        ).alias("hs"),
    )
    pairs = (
        cand.join(
            toks.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha")),
            "doc_a",
        )
        .join(
            toks.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.transform("ha", lambda h: F.array(h)).alias("ta"),
            F.transform("hb", lambda h: F.array(h)).alias("tb"),
        )
        .withColumn(
            "pad", F.array_repeat(F.lit(0).cast("long"), F.size("tb") + 1)
        )
    )
    # The pair frame is tiny by BYTES (AQE coalesces it to one partition)
    # but each row costs a CAP^2 DP fold — CPU skew, not data skew: spread
    # the pairs across cores before the fold. At cluster scale the pair
    # list is large enough that this is a cheap rebalance, never a
    # bottleneck (it shuffles candidate ids + capped hash arrays only).
    pairs = pairs.repartition(spark.sparkContext.defaultParallelism, "doc_a", "doc_b")
    zero1 = F.array(F.lit(0).cast("long"))
    lcs = F.element_at(
        F.aggregate(
            F.col("ta"),
            F.col("pad"),
            lambda prev, arow: F.aggregate(
                F.col("tb"),
                zero1,
                lambda acc2, brow: F.concat(
                    acc2,
                    F.array(
                        F.greatest(
                            F.element_at(prev, F.size(acc2) + 1),
                            F.element_at(acc2, F.size(acc2)),
                            F.element_at(prev, F.size(acc2))
                            + F.when(
                                F.element_at(arow, 1) == F.element_at(brow, 1), 1
                            )
                            .otherwise(0)
                            .cast("long"),
                        )
                    ),
                ),
            ),
        ),
        F.size("tb") + 1,
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.size("ta").cast("long").alias("n_a"),
        F.size("tb").cast("long").alias("n_b"),
        lcs.alias("lcs_len"),
    ).withColumn(
        "rouge_l_f1",
        F.lit(2.0)
        * F.col("lcs_len").cast("double")
        / (F.col("n_a") + F.col("n_b")).cast("double"),
    )  # 2PR/(P+R) with P=L/n_a, R=L/n_b simplifies to 2L/(n_a+n_b)


# --- RAKE keyphrase extraction -------------------------------------------------------
# Rapid Automatic Keyword Extraction over the corpus: candidate phrases
# are maximal stopword-free word runs (segmented by an isomorphic
# growing-list fold in both engines — no regex dialect in the hot path),
# word scores are degree/frequency over all phrases, and a phrase scores
# the sum of its word scores folded IN PHRASE ORDER (deterministic
# double addition). Shapes: one scan -> per-doc array fold (map-only),
# one word-stat shuffle (vocabulary-sized), one phrase-word join, and a
# TakeOrdered top list. Phrases capped at RAKE_MAX_WORDS.

RAKE_MAX_WORDS = 4
RAKE_TOP = 15

_RAKE_STOPS_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"

_RAKE_SEG_SQL = f"""
list_filter(
  list_reduce(
    list_prepend([''], list_transform(
      list_filter(regexp_split_to_array(lower(text), ' '), w -> w <> ''),
      w -> [w])),
    (acc, x) -> CASE
      WHEN list_contains({_RAKE_STOPS_SQL}, x[1]) THEN list_append(acc, '')
      ELSE list_append(list_slice(acc, 1, len(acc) - 1),
             CASE WHEN acc[len(acc)] = '' THEN x[1]
                  ELSE acc[len(acc)] || ' ' || x[1] END)
    END),
  p -> p <> '' AND len(string_split(p, ' ')) <= {RAKE_MAX_WORDS})
"""

_RAKE_ORACLE = f"""
WITH phrases AS (
  SELECT unnest({_RAKE_SEG_SQL}) AS phrase FROM documents
), wstats AS (
  SELECT w AS word,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS deg
  FROM (
    SELECT unnest(string_split(phrase, ' ')) AS w,
           len(string_split(phrase, ' ')) AS plen
    FROM phrases
  ) GROUP BY w
), dphrase AS (
  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ FROM phrases GROUP BY phrase
), pw AS (
  SELECT d.phrase, d.n_occ, t.i AS pos, t.w AS word
  FROM dphrase d,
       LATERAL (SELECT unnest(list_transform(
                  range(1, len(string_split(d.phrase, ' ')) + 1),
                  i -> struct_pack(i := i, w := string_split(d.phrase, ' ')[i]))) AS t)
), scored AS (
  SELECT p.phrase, p.n_occ,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(s.deg AS DOUBLE) / CAST(s.freq AS DOUBLE) ORDER BY p.pos)),
           (a, b) -> a + b) AS rake_score
  FROM pw p JOIN wstats s ON p.word = s.word
  GROUP BY p.phrase, p.n_occ
)
SELECT phrase, n_occ, rake_score
FROM scored
ORDER BY rake_score DESC, phrase
LIMIT {RAKE_TOP}
"""


@register(
    "text_rake_keyphrases",
    oracle=_RAKE_ORACLE,
    doc=f"RAKE keyphrase extraction: stopword-delimited phrase runs via "
    f"isomorphic list folds, degree/frequency word scores, phrase scores "
    f"folded in phrase order — top {RAKE_TOP}, exact cross-engine",
    tags=("pipeline", "text", "keyphrase"),
)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    stops = F.array(*[F.lit(w) for w in _STOPWORDS])
    words = F.filter(F.split(F.lower(F.col("text")), " "), lambda w: w != "")
    seg = F.filter(
        F.aggregate(
            F.transform(words, lambda w: F.array(w)),
            F.array(F.lit("")),
            lambda acc, x: F.when(
                F.array_contains(stops, F.element_at(x, 1)),
                F.concat(acc, F.array(F.lit(""))),
            ).otherwise(
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(
                        F.when(
                            F.element_at(acc, F.size(acc)) == "",
                            F.element_at(x, 1),
                        ).otherwise(
                            F.concat(
                                F.element_at(acc, F.size(acc)),
                                F.lit(" "),
                                F.element_at(x, 1),
                            )
                        )
                    ),
                )
            ),
        ),
        lambda p: (p != "") & (F.size(F.split(p, " ")) <= RAKE_MAX_WORDS),
    )
    phrases = d.select(F.explode(seg).alias("phrase"))
    phrases = phrases.persist()
    phrases.count()  # two consumers: word stats + distinct phrases
    try:
        pw_all = phrases.select(
            F.explode(F.split("phrase", " ")).alias("w"),
            F.size(F.split("phrase", " ")).alias("plen"),
        )
        wstats = pw_all.groupBy("w").agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
        dphrase = phrases.groupBy("phrase").agg(
            F.count("*").cast("long").alias("n_occ")
        )
        pw = dphrase.select(
            "phrase",
            "n_occ",
            F.posexplode(F.split("phrase", " ")).alias("pos0", "word"),
        )
        scored = (
            pw.join(wstats, pw["word"] == wstats["w"])
            .groupBy("phrase", "n_occ")
            .agg(
                F.aggregate(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct(
                                    F.col("pos0").alias("p"),
                                    (
                                        F.col("deg").cast("double")
                                        / F.col("freq").cast("double")
                                    ).alias("s"),
                                )
                            )
                        ),
                        lambda st: st["s"],
                    ),
                    F.lit(0.0),
                    lambda a, b: a + b,
                ).alias("rake_score")
            )
        )
        out = scored.orderBy(
            F.col("rake_score").desc(), F.col("phrase").asc()
        ).limit(RAKE_TOP)
        out = pin_small_result(out, RAKE_TOP)
    finally:
        phrases.unpersist()
    return out


# --- vocabulary growth curve (Heaps-law readout, one-shuffle form) ---------------------
# "How fast does the vocabulary still grow as the corpus grows?" — the
# curve that says whether more data still buys new tokens. The naive form
# recounts distinct tokens for every corpus prefix (K scans); this is the
# one-shuffle form: docs land in K md5 checkpoint buckets, every token
# keeps only its MINIMUM bucket (first appearance along the growth order),
# and the curve is a K-cell cumulative fold — new_tokens[k] = #tokens
# first seen at k, cum_vocab[k] = running sum. All integers.

_VOCAB_GROWTH_K = 8


def _vocab_growth_oracle() -> str:
    from f1_lakehouse_spark.pipeline.hashing import sql_md5_hash48

    h = sql_md5_hash48("CAST(doc_id AS VARCHAR)")
    return f"""
WITH docs AS (
  SELECT doc_id, text, {h} % {_VOCAB_GROWTH_K} AS ck FROM documents
), toks AS (
  SELECT ck, unnest(string_split(text, ' ')) AS w FROM docs
), firsts AS (
  SELECT w, CAST(MIN(ck) AS BIGINT) AS first_ck FROM toks WHERE w <> '' GROUP BY w
), cells AS (
  SELECT first_ck, CAST(COUNT(*) AS BIGINT) AS new_tokens FROM firsts GROUP BY 1
), dcells AS (
  SELECT ck, CAST(COUNT(*) AS BIGINT) AS n_docs FROM docs GROUP BY 1
), packed AS (
  SELECT k,
         COALESCE((SELECT new_tokens FROM cells WHERE first_ck = k), 0) AS new_tokens,
         COALESCE((SELECT n_docs FROM dcells WHERE ck = k), 0) AS n_docs
  FROM (SELECT unnest(range(0, {_VOCAB_GROWTH_K})) AS k)
), arr AS (
  SELECT list(struct_pack(k := k, nt := new_tokens, nd := n_docs) ORDER BY k) AS a FROM packed
)
SELECT a[i].k AS checkpoint,
       a[i].nd AS n_docs,
       a[i].nt AS new_tokens,
       list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(a, 1, i), s -> s.nd)), (x, y) -> x + y) AS cum_docs,
       list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(a, 1, i), s -> s.nt)), (x, y) -> x + y) AS cum_vocab
FROM (SELECT unnest(range(1, len(a) + 1)) AS i, a FROM arr)
"""


@register(
    "text_vocab_growth_curve",
    oracle=None,  # composed below
    doc=f"vocabulary growth (Heaps-law) curve over {_VOCAB_GROWTH_K} md5 "
    "checkpoint buckets in ONE token shuffle: each token keeps only its "
    "minimum bucket (first appearance), the curve is a K-cell cumulative "
    "fold — never K distinct-count scans.",
    tags=("pipeline", "text", "analysis"),
)
def text_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one (token -> min bucket) aggregate with map-side combine
    (postings-shaped shuffle), one K-row fold."""
    from f1_lakehouse_spark.pipeline.hashing import spark_md5_hash48

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (spark_md5_hash48(F.col("doc_id").cast("string")) % _VOCAB_GROWTH_K).alias(
            "ck"
        ),
    )
    d = d.persist()
    d.count()  # two consumers: token explode + per-bucket doc counts
    toks = d.select("ck", F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    firsts = toks.groupBy("w").agg(F.min("ck").cast("long").alias("first_ck"))
    cells = firsts.groupBy("first_ck").agg(F.count("*").cast("long").alias("new_tokens"))
    dcells = d.groupBy("ck").agg(F.count("*").cast("long").alias("n_docs"))
    spine = spark.range(_VOCAB_GROWTH_K).select(F.col("id").alias("k"))
    packed = (
        spine.join(F.broadcast(cells), spine["k"] == cells["first_ck"], "left")
        .join(F.broadcast(dcells), spine["k"] == dcells["ck"], "left")
        .select(
            "k",
            F.coalesce("new_tokens", F.lit(0)).cast("long").alias("nt"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("nd"),
        )
        .agg(
            F.sort_array(
                F.collect_list(F.struct("k", "nt", "nd"))
            ).alias("a")
        )
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
        el["k"].alias("checkpoint"),
        el["nd"].alias("n_docs"),
        el["nt"].alias("new_tokens"),
        cume("nd").alias("cum_docs"),
        cume("nt").alias("cum_vocab"),
    )
    out = pin_small_result(out, 1024)
    d.unpersist()
    return out


from f1_lakehouse_spark.registry import REGISTRY as _REG_R5  # noqa: E402

_REG_R5["text_vocab_growth_curve"].oracle = _vocab_growth_oracle()


# --- MATTR lexical diversity -----------------------------------------------------------
# Type-token ratio is length-biased; the moving-average TTR (MATTR,
# Covington & McFall) fixes it by averaging distinct/window over sliding
# windows. Windows stride half a window (design constants), so the
# per-doc work is O(tokens/stride) bounded array slices — map-only, no
# shuffle at all; every count is an integer and the two divisions are the
# only doubles.

_MATTR_W = 50
_MATTR_STRIDE = 25

_MATTR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ts
  FROM documents
), base AS (
  SELECT doc_id, ts, len(ts) AS n FROM toks WHERE len(ts) > 0
), wins AS (
  SELECT doc_id, n,
         CASE WHEN n <= {_MATTR_W} THEN [CAST(len(list_distinct(ts)) AS DOUBLE) / CAST(n AS DOUBLE)]
              ELSE list_transform(range(0, (n - {_MATTR_W}) // {_MATTR_STRIDE} + 1),
                     j -> CAST(len(list_distinct(list_slice(ts, CAST(j AS INTEGER) * {_MATTR_STRIDE} + 1,
                                                            CAST(j AS INTEGER) * {_MATTR_STRIDE} + {_MATTR_W}) )) AS DOUBLE)
                          / CAST({_MATTR_W} AS DOUBLE))
         END AS ws
  FROM base
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(len(ws) AS BIGINT) AS n_windows,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ws), (a, b) -> a + b)
         / CAST(len(ws) AS DOUBLE) AS mattr
FROM wins
"""


@register(
    "text_mattr_lexical_diversity",
    oracle=_MATTR_ORACLE,
    doc=f"MATTR lexical diversity (window {_MATTR_W}, stride "
    f"{_MATTR_STRIDE}): moving-average type-token ratio per document — "
    "length-unbiased where raw TTR is not; integer distinct counts over "
    "bounded array slices, map-only.",
    tags=("pipeline", "text", "quality"),
)
def text_mattr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: zero shuffles — scales exactly like the scan."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.filter(F.split("text", " "), lambda w: w != "").alias("ts")
    )
    base = toks.where(F.size("ts") > 0).select(
        "doc_id", "ts", F.size("ts").alias("n")
    )
    w, st = _MATTR_W, _MATTR_STRIDE

    def win(j):
        start = j.cast("int") * st + 1
        return F.size(
            F.array_distinct(F.slice("ts", start, F.lit(w)))
        ).cast("double") / F.lit(float(w))

    wins = base.select(
        "doc_id",
        "n",
        F.when(
            F.col("n") <= w,
            F.array(
                F.size(F.array_distinct("ts")).cast("double")
                / F.col("n").cast("double")
            ),
        )
        .otherwise(
            F.transform(
                F.sequence(F.lit(0), ((F.col("n") - w) / st).cast("long")), win
            )
        )
        .alias("ws"),
    )
    return wins.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.size("ws").cast("long").alias("n_windows"),
        (
            F.aggregate("ws", F.lit(0.0), lambda a, b: a + b)
            / F.size("ws").cast("double")
        ).alias("mattr"),
    )


# --- Hellinger distance between source token distributions ------------------------------
# Distribution drift between corpus sources as a true METRIC (unlike the
# chi-square in text_source_drift_chi2): pairwise Hellinger distance over
# the global top-K token distribution. sqrt is correctly rounded by
# IEEE-754, so — unlike KL/JS, whose ln is engine-divergent — Hellinger is
# bit-exact cross-engine: BC = sum sqrt(p_i q_i) folds over the K-cell
# token-aligned arrays, H = sqrt(max(0, 1 - BC)).

_HELL_TOPK = 200


def _hellinger_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
), cnt AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM toks WHERE w <> '' GROUP BY 1, 2
), topk AS (
  SELECT w FROM (
    SELECT w, SUM(c) AS tc FROM cnt GROUP BY w ORDER BY tc DESC, w ASC LIMIT {_HELL_TOPK}
  )
), spine AS (
  SELECT s.source, t.w FROM (SELECT DISTINCT source FROM cnt) s CROSS JOIN topk t
), filled AS (
  SELECT sp.source, sp.w, COALESCE(c.c, 0) AS c
  FROM spine sp LEFT JOIN cnt c ON sp.source = c.source AND sp.w = c.w
), dist AS (
  SELECT source,
         list_transform(list(struct_pack(w := w, c := c) ORDER BY w), g -> g.c) AS cv,
         CAST(SUM(c) AS BIGINT) AS tot
  FROM filled GROUP BY source
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1, len(a.cv) + 1),
             i -> sqrt((CAST(a.cv[i] AS DOUBLE) / CAST(a.tot AS DOUBLE))
                       * (CAST(b.cv[i] AS DOUBLE) / CAST(b.tot AS DOUBLE))))),
           (x, y) -> x + y) AS bc
  FROM dist a JOIN dist b ON a.source < b.source
)
SELECT source_a, source_b, bc AS bhattacharyya,
       sqrt(CASE WHEN 1.0 - bc < 0.0 THEN 0.0 ELSE 1.0 - bc END) AS hellinger
FROM pairs
"""


@register(
    "text_hellinger_source_drift",
    oracle=None,  # composed below
    doc=f"pairwise Hellinger distance between source token distributions "
    f"over the global top-{_HELL_TOPK} tokens — a true drift METRIC that "
    "is bit-exact cross-engine (sqrt is IEEE-correctly-rounded; KL/JS's "
    "ln is not), folded over token-aligned K-cell arrays.",
    tags=("pipeline", "text", "analysis", "drift"),
)
def text_hellinger_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one token-count shuffle with map-side combine, a top-K
    TakeOrdered broadcast, and a |sources|-row self-join of K-cell
    arrays (persist+materialize barrier)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    cnt = toks.groupBy("source", "w").agg(F.count("*").cast("long").alias("c"))
    cnt = cnt.persist()
    cnt.count()  # three consumers: top-k, source list, fill join
    topk = (
        cnt.groupBy("w")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.col("tc").desc(), F.col("w").asc())
        .limit(_HELL_TOPK)
        .select("w")
    )
    sources = cnt.select("source").distinct()
    spine = sources.crossJoin(F.broadcast(topk))
    filled = (
        spine.alias("sp")
        .join(
            cnt.alias("c"),
            (F.col("sp.source") == F.col("c.source")) & (F.col("sp.w") == F.col("c.w")),
            "left",
        )
        .select(
            F.col("sp.source").alias("source"),
            F.col("sp.w").alias("w"),
            F.coalesce(F.col("c.c"), F.lit(0)).cast("long").alias("c"),
        )
    )
    dist = filled.groupBy("source").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("w", "c"))), lambda g: g["c"]
        ).alias("cv"),
        F.sum("c").cast("long").alias("tot"),
    )
    dist = dist.persist()
    dist.count()  # self-join on a derived frame
    a, b = dist.alias("a"), dist.alias("b")
    bc = F.aggregate(
        F.zip_with(
            F.col("a.cv"),
            F.col("b.cv"),
            lambda x, y: F.sqrt(
                (x.cast("double") / F.col("a.tot").cast("double"))
                * (y.cast("double") / F.col("b.tot").cast("double"))
            ),
        ),
        F.lit(0.0),
        lambda x, y: x + y,
    )
    out = (
        a.join(b, F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            bc.alias("bhattacharyya"),
        )
        .select(
            "source_a",
            "source_b",
            "bhattacharyya",
            F.sqrt(
                F.when(F.lit(1.0) - F.col("bhattacharyya") < 0.0, F.lit(0.0)).otherwise(
                    F.lit(1.0) - F.col("bhattacharyya")
                )
            ).alias("hellinger"),
        )
    )
    out = pin_small_result(out, 1024)
    dist.unpersist()
    cnt.unpersist()
    return out


_REG_R5["text_hellinger_source_drift"].oracle = _hellinger_oracle()


# --- token burstiness (Church-Gale variance-to-mean) ------------------------------------
# Bursty tokens (doc-clustered, content-bearing) vs uniform tokens
# (function words): the variance-to-mean ratio of per-document counts over
# ALL documents (zeros included — handled in closed form, never
# materialized: with T docs and the token present in n of them, the
# zero-padded moments are S1 and S2 of the present counts with T in the
# denominators). Integer moments, two exact divisions, one TakeOrdered.

_BURST_MIN_DOCS = 20
_BURST_TOPK = 25

_BURSTINESS_ORACLE = f"""
WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
cnt AS (
  SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1, 2
), mom AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_present,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM cnt GROUP BY w
)
SELECT w AS token, n_present, s1 AS total_count,
       CAST(s1 AS DOUBLE) / CAST(t.n_docs AS DOUBLE) AS mean_per_doc,
       (CAST(s2 AS DOUBLE) / CAST(t.n_docs AS DOUBLE)
         - (CAST(s1 AS DOUBLE) / CAST(t.n_docs AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(t.n_docs AS DOUBLE)))
         / (CAST(s1 AS DOUBLE) / CAST(t.n_docs AS DOUBLE)) AS burstiness
FROM mom, t
WHERE n_present >= {_BURST_MIN_DOCS}
ORDER BY burstiness DESC, w ASC LIMIT {_BURST_TOPK}
"""


@register(
    "text_token_burstiness",
    oracle=_BURSTINESS_ORACLE,
    doc=f"Church-Gale token burstiness (variance-to-mean of per-doc "
    f"counts, zero docs in closed form): top-{_BURST_TOPK} bursty tokens "
    f"with >= {_BURST_MIN_DOCS} doc support — integer moments, exact "
    "divisions, TakeOrdered.",
    tags=("pipeline", "text", "analysis"),
)
def text_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: one (token, doc) count + one token-moment aggregate, both
    map-side combined; zeros never materialize (closed form over T)."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # 1 scalar; the doc count is the zero-padding term
    cnt = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w", "doc_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    mom = cnt.groupBy("w").agg(
        F.count("*").cast("long").alias("n_present"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    td = F.lit(float(n_docs))
    mean = F.col("s1").cast("double") / td
    burst = (F.col("s2").cast("double") / td - mean * mean) / mean
    return (
        mom.where(F.col("n_present") >= _BURST_MIN_DOCS)
        .select(
            F.col("w").alias("token"),
            "n_present",
            F.col("s1").alias("total_count"),
            mean.alias("mean_per_doc"),
            burst.alias("burstiness"),
        )
        .orderBy(F.col("burstiness").desc(), F.col("token").asc())
        .limit(_BURST_TOPK)
    )


# --- BM25 ranked retrieval (round 8) -------------------------------------------------
# The retrieval standard the TF-IDF query stops short of: Okapi BM25 over a
# fixed benchmark query, the scoring used by retrieval-based decontamination
# and RAG-corpus construction. Reference has no retrieval surface; this is
# part of the LLM-pipeline brief's text family.
#
# Shape (the 100 TB design — see docs/SCALE.md "Round-8 additions"): for a
# FIXED small query, the classic postings pipeline (explode -> (doc, term)
# groupBy -> df join) is the wrong plan — it tokenizes the corpus once per
# derived frame and shuffles a posting per (doc, term). Instead ONE map-side
# projection computes, per document, its length and the four per-term counts
# via higher-order functions (size(filter(tokens, = t)) — JVM codegen, no
# explode, no shuffle); df/avgdl/N then come from ONE scalar aggregate row
# broadcast back; scoring is map-side arithmetic; the global top-k is
# orderBy+limit (TakeOrdered). The narrow per-doc feature frame (6 numeric
# columns, no text) is pinned via localCheckpoint so the corpus is
# TEXT-SCANNED EXACTLY ONCE even though both the aggregate and the scoring
# read it.
#
# Determinism (cross-engine hash equality):
# - every literal is CAST AS DOUBLE in the oracle (DuckDB literal arithmetic
#   is DECIMAL; Spark adds doubles — CLAUDE.md trap);
# - the per-document score adds the four per-term scores in one fixed
#   syntactic order (no float aggregation order anywhere);
# - avgdl is one double division of an exact integer sum;
# - emitted score rounded to 9 decimals (JVM vs DuckDB libm ln() differ by
#   ~1 ulp; same treatment as text_tfidf_top_terms).

BM25_QUERY_TERMS = ("hash", "join", "vector", "dup")  # generator vocab, df 25..400
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 25


def _bm25_oracle() -> str:
    feat_cols = ",\n           ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(BM25_QUERY_TERMS)
    )
    df_aggs = ",\n           ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(BM25_QUERY_TERMS))
    )
    k1p1 = f"CAST({BM25_K1 + 1.0!r} AS DOUBLE)"
    k1 = f"CAST({BM25_K1!r} AS DOUBLE)"
    b = f"CAST({BM25_B!r} AS DOUBLE)"
    terms_score = "\n         + ".join(
        f"(CASE WHEN f.tf_{i} > 0 THEN "
        f"ln((CAST(s.n AS DOUBLE) - CAST(s.df_{i} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        f" / (CAST(s.df_{i} AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))"
        f" * (CAST(f.tf_{i} AS DOUBLE) * {k1p1})"
        f" / (CAST(f.tf_{i} AS DOUBLE) + {k1} * (CAST(1 AS DOUBLE) - {b}"
        f" + {b} * CAST(f.dl AS DOUBLE) / s.avgdl))"
        f" ELSE CAST(0 AS DOUBLE) END)"
        for i in range(len(BM25_QUERY_TERMS))
    )
    any_tf = " + ".join(f"f.tf_{i}" for i in range(len(BM25_QUERY_TERMS)))
    return f"""
WITH feat AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS dl,
           {feat_cols}
    FROM documents
), stats AS (
    SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
           COUNT(*) AS n,
           {df_aggs}
    FROM feat
), scored AS (
    SELECT f.doc_id,
           {terms_score} AS bm25
    FROM feat f, stats s
    WHERE {any_tf} > 0
)
SELECT doc_id, round(bm25, 9) AS bm25, rk
FROM (
    SELECT doc_id, bm25,
           ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rk
    FROM scored
) WHERE rk <= {BM25_TOPK}
"""


def _bm25_tf(t: str):
    """Per-term token count via higher-order functions (factory per the
    CLAUDE.md lambda-capture rule; single-arg lambda, so no (value, index)
    arity surprise)."""
    return F.size(F.filter(F.split("text", " "), lambda x: x == F.lit(t)))


@register(
    "text_bm25_retrieval",
    oracle=_bm25_oracle(),
    doc="Okapi BM25 top-k retrieval for a fixed benchmark query over the "
    "documents corpus (k1=1.2, b=0.75): per-term idf ln((N-df+0.5)/(df+0.5)+1), "
    "tf saturation with length normalization against the exact average "
    "doc length, per-doc scores combined in fixed order, TakeOrdered "
    "top-25 with doc_id tiebreak. One text scan: per-doc features map-side "
    "via size(filter(tokens)), df/avgdl from one scalar aggregate.",
    tags=("pipeline", "text", "retrieval"),
)
def text_bm25_retrieval(
    spark: SparkSession,
    sf_dir: str,
    *,
    terms: tuple[str, ...] = BM25_QUERY_TERMS,
) -> DataFrame:
    from f1_lakehouse_spark.pinning import pin_checkpoint  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    nt = len(terms)
    feat = pin_checkpoint(  # narrow (no text); both consumers read it once
        d.select(
            "doc_id",
            F.size(F.split("text", " ")).alias("dl"),
            *[_bm25_tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)],
        )
    )
    stats = feat.agg(
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl"),
        F.count("*").alias("n"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(nt)
        ],
    )

    def term_score(i: int):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            (F.col("n").cast("double") - F.col(f"df_{i}").cast("double") + F.lit(0.5))
            / (F.col(f"df_{i}").cast("double") + F.lit(0.5))
            + F.lit(1.0)
        )
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0)
            - F.lit(BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
        )
        return F.when(
            F.col(f"tf_{i}") > 0, (idf * (tf * F.lit(BM25_K1 + 1.0))) / denom
        ).otherwise(F.lit(0.0))

    total = term_score(0)
    for i in range(1, nt):
        total = total + term_score(i)
    any_tf = F.col("tf_0")
    for i in range(1, nt):
        any_tf = any_tf + F.col(f"tf_{i}")
    scored = (
        feat.crossJoin(stats).where(any_tf > 0).select("doc_id", total.alias("bm25"))
    )
    top = scored.orderBy(F.col("bm25").desc(), "doc_id").limit(BM25_TOPK)
    w_rk = Window.orderBy(F.col("bm25").desc(), "doc_id")  # over <= 25 rows
    return top.withColumn("rk", F.row_number().over(w_rk)).select(
        "doc_id", F.round("bm25", 9).alias("bm25"), "rk"
    )


# --- per-source Zipf exponent -------------------------------------------------------
# Power-law diagnostics for corpus health: a natural web corpus follows
# Zipf's law (term frequency ~ C * rank^-alpha with alpha near 1); a
# template farm or collapsed scrape bends the curve (alpha far from 1, or
# a poor log-log fit). Estimated per source by OLS of ln(freq) on
# ln(rank) over the top-ZIPF_TOPK terms.
#
# Scale: the corpus collapses to a (source, term) count aggregate
# (map-side combine); the per-source top-k runs as a ROW_NUMBER window
# over that AGGREGATED frame (vocabulary-sized, sub-linear in corpus
# bytes — never the raw scan), and the OLS folds over a <=ZIPF_TOPK
# packed array per source in rank order (left fold, deterministic). The
# only float logs are ln() of exact integer-valued doubles, applied
# identically in both engines and combined in a fixed order, with
# round(,9) absorbing the last ulp on output (the BM25 idiom).

ZIPF_TOPK = 64


def _zipf_fold_sql(term: str) -> str:
    """DuckDB left fold of ``term`` (a lambda body over struct g) across
    the packed rank array — same shape as the Brier decomposition folds."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(a, g -> {term})), (x, y) -> x + y)"
    )


@register(
    "text_zipf_alpha",
    oracle=f"""
WITH words AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL
),
cnts AS (SELECT source, w, COUNT(*) AS cnt FROM words GROUP BY 1, 2),
ranked AS (
  SELECT source, cnt,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, w) AS rk
  FROM cnts
),
packed AS (
  SELECT source,
         list(struct_pack(rk := rk, cnt := cnt) ORDER BY rk) AS a
  FROM ranked WHERE rk <= {ZIPF_TOPK} GROUP BY 1
),
sums AS (
  SELECT source, CAST(len(a) AS DOUBLE) AS n,
         {_zipf_fold_sql('ln(CAST(g.rk AS DOUBLE))')} AS sx,
         {_zipf_fold_sql('ln(CAST(g.cnt AS DOUBLE))')} AS sy,
         {_zipf_fold_sql('ln(CAST(g.rk AS DOUBLE)) * ln(CAST(g.cnt AS DOUBLE))')} AS sxy,
         {_zipf_fold_sql('ln(CAST(g.rk AS DOUBLE)) * ln(CAST(g.rk AS DOUBLE))')} AS sxx
  FROM packed
)
SELECT source, CAST(n AS BIGINT) AS n_terms,
       CASE WHEN n >= 2 AND (n * sxx - sx * sx) <> CAST(0.0 AS DOUBLE)
            THEN round(-(n * sxy - sx * sy) / (n * sxx - sx * sx), 9) END AS alpha,
       CASE WHEN n >= 2 AND (n * sxx - sx * sx) <> CAST(0.0 AS DOUBLE)
            THEN round((sy + ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 9)
            END AS ln_c
FROM sums
""",
    doc=f"per-source Zipf exponent: OLS of ln(freq) on ln(rank) over the "
    f"top-{ZIPF_TOPK} terms — power-law corpus-health diagnostic "
    "(template farms / collapsed scrapes bend the rank-frequency curve); "
    "one vocab aggregate, a window over the aggregated frame, bounded "
    "per-source folds",
    tags=("pipeline", "text", "diagnostics"),
)
def text_zipf_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    cnts = words.groupBy("source", "w").agg(F.count("*").alias("cnt"))
    # window over the AGGREGATED vocab frame (sub-linear), partitioned by
    # source — never a window over the raw scan (plan-lint rule 2)
    w_rk = Window.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("w").asc())
    ranked = cnts.withColumn("rk", F.row_number().over(w_rk)).filter(
        F.col("rk") <= ZIPF_TOPK
    )
    packed = ranked.groupBy("source").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("rk").cast("long").alias("rk"), "cnt"))
        ).alias("a")
    )

    def fold(term):
        return F.aggregate(
            F.transform("a", term), F.lit(0.0), lambda x, y: x + y
        )

    lnrk = lambda g: F.log(g["rk"].cast("double"))  # noqa: E731
    lncnt = lambda g: F.log(g["cnt"].cast("double"))  # noqa: E731
    sums = packed.select(
        "source",
        F.size("a").cast("double").alias("n"),
        fold(lambda g: lnrk(g)).alias("sx"),
        fold(lambda g: lncnt(g)).alias("sy"),
        fold(lambda g: lnrk(g) * lncnt(g)).alias("sxy"),
        fold(lambda g: lnrk(g) * lnrk(g)).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    det = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / det
    ok = (n >= 2) & (det != F.lit(0.0))
    return sums.select(
        "source",
        F.col("n").cast("long").alias("n_terms"),
        F.when(ok, F.round(-slope, 9)).alias("alpha"),
        F.when(ok, F.round((sy + slope * sx) / n, 9)).alias("ln_c"),
    )


# --- nDCG@k retrieval evaluation ------------------------------------------------------
# The IR-eval companion to the BM25 query: binary relevance from the
# gopher repetition gate, DCG@k = sum rel_i / log2(i+1) over the ranked
# list, IDCG@k from the corpus-wide relevant count — so retrieval quality
# is a measured, driver-checked number, not a vibe. Both fold over
# bounded arrays (k = BM25_TOPK rows; the IDCG index range); log2 applies
# to exact small-integer doubles identically in both engines.

_NDCG_ORACLE = """
WITH ranked AS ({bm25_q}),
labels AS ({label_q}),
rels AS (
  SELECT r.rk, CAST(COALESCE(l.passes_repetition, 0) AS BIGINT) AS rel
  FROM ranked r LEFT JOIN labels l ON r.doc_id = l.doc_id
),
tot AS (
  SELECT CAST(SUM(passes_repetition) AS BIGINT) AS n_rel_total FROM labels
),
packed AS (
  SELECT list(struct_pack(rk := rk, rel := rel) ORDER BY rk) AS a,
         CAST(COUNT(*) AS BIGINT) AS n_retrieved,
         CAST(SUM(rel) AS BIGINT) AS n_rel_retrieved
  FROM rels
),
folded AS (
  SELECT p.n_retrieved, p.n_rel_retrieved, t.n_rel_total,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(a, g -> CAST(g.rel AS DOUBLE)
                                   / log2(CAST(g.rk + 1 AS DOUBLE)))),
           (x, y) -> x + y) AS dcg,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(generate_series(1, CAST(least(p.n_retrieved,
                                                         t.n_rel_total) AS BIGINT)),
                          i -> CAST(1.0 AS DOUBLE)
                               / log2(CAST(i + 1 AS DOUBLE)))),
           (x, y) -> x + y) AS idcg
  FROM packed p CROSS JOIN tot t
)
SELECT n_retrieved, n_rel_retrieved, n_rel_total,
       round(dcg, 9) AS dcg,
       round(idcg, 9) AS idcg,
       CASE WHEN idcg > CAST(0.0 AS DOUBLE) THEN round(dcg / idcg, 9) END AS ndcg
FROM folded
"""


@register(
    "text_bm25_ndcg_eval",
    oracle=None,  # composed below
    doc=f"nDCG@{BM25_TOPK} of the BM25 ranking against the gopher gate as "
    "binary relevance: DCG folds over the k-row ranked list, IDCG over "
    "the least(k, corpus-relevant) index range — retrieval quality as a "
    "driver-checked number",
    tags=("pipeline", "text", "retrieval", "eval"),
)
def text_bm25_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_lakehouse_spark.pipeline.filtering import (  # noqa: PLC0415
        quality_gopher_repetition,
    )

    ranked = text_bm25_retrieval(spark, sf_dir).select("doc_id", "rk")
    # persist: the corpus-scale gopher pipeline feeds BOTH the relevance
    # join and the total-relevant aggregate (Spark does not dedupe common
    # subplans — without this the gate computes twice per materialization)
    labels = (
        quality_gopher_repetition(spark, sf_dir)
        .select("doc_id", "passes_repetition")
        .persist()
    )
    labels.count()
    rels = ranked.join(labels, "doc_id", "left").select(
        "rk",
        F.coalesce(F.col("passes_repetition"), F.lit(0)).cast("long").alias("rel"),
    )
    tot = labels.agg(
        F.sum("passes_repetition").cast("long").alias("n_rel_total")
    )
    packed = rels.agg(
        F.sort_array(F.collect_list(F.struct("rk", "rel"))).alias("a"),
        F.count("*").cast("long").alias("n_retrieved"),
        F.sum("rel").cast("long").alias("n_rel_retrieved"),
    )
    dcg = F.aggregate(
        F.transform(
            "a", lambda g: g["rel"].cast("double") / F.log2((g["rk"] + 1).cast("double"))
        ),
        F.lit(0.0),
        lambda x, y: x + y,
    )
    # guard the would-be-empty range: Spark sequence(1, 0) yields the
    # DESCENDING [1, 0] (the CLAUDE.md trap), whose i=0 term divides by
    # log2(1)=0 — while DuckDB's generate_series(1, 0) is empty
    idcg_bound = F.least(F.col("n_retrieved"), F.col("n_rel_total")).cast("int")
    idcg = F.when(
        idcg_bound >= 1,
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), idcg_bound),
                lambda i: F.lit(1.0) / F.log2((i + 1).cast("double")),
            ),
            F.lit(0.0),
            lambda x, y: x + y,
        ),
    ).otherwise(F.lit(0.0))
    folded = packed.crossJoin(F.broadcast(tot)).select(
        "n_retrieved",
        "n_rel_retrieved",
        "n_rel_total",
        dcg.alias("dcg"),
        idcg.alias("idcg"),
    )
    ok = F.col("idcg") > F.lit(0.0)
    out = folded.select(
        "n_retrieved",
        "n_rel_retrieved",
        "n_rel_total",
        F.round("dcg", 9).alias("dcg"),
        F.round("idcg", 9).alias("idcg"),
        F.when(ok, F.round(F.col("dcg") / F.col("idcg"), 9)).alias("ndcg"),
    )
    out = pin_small_result(out, 1)  # materialize, then release the labels
    labels.unpersist()
    return out


from f1_lakehouse_spark.pipeline import filtering as _filtering  # noqa: E402, F401
from f1_lakehouse_spark.registry import REGISTRY as _REG8  # noqa: E402

_REG8["text_bm25_ndcg_eval"].oracle = _NDCG_ORACLE.format(
    bm25_q=_REG8["text_bm25_retrieval"].oracle,
    label_q=_REG8["quality_gopher_repetition"].oracle,
)


# --- macro-F1 of the language-ID classifier ------------------------------------------
# The standard multi-class evaluation readout for the profile classifier:
# per-class precision / recall / F1 from the confusion matrix, with the
# macro average carried on every row. All integer-ratio doubles (exact
# cross-engine); 0/0 cells pin to 0.0 explicitly — DuckDB yields NULL and
# Spark NaN on double zero-division, so the guard IS the contract (the
# CLAUDE.md denominator rule).

_MACRO_F1_ORACLE = """
WITH conf AS ({conf_q}),
per_true AS (
  SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS support,
         CAST(SUM(CASE WHEN predicted_lang = lang THEN n_docs ELSE 0 END) AS BIGINT)
           AS tp
  FROM conf GROUP BY 1
),
per_pred AS (
  SELECT predicted_lang AS lang, CAST(SUM(n_docs) AS BIGINT) AS pred_n
  FROM conf GROUP BY 1
),
cells AS (
  SELECT t.lang, t.support, t.tp, COALESCE(p.pred_n, 0) AS pred_n,
         CASE WHEN COALESCE(p.pred_n, 0) > 0
              THEN CAST(t.tp AS DOUBLE) / CAST(p.pred_n AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS precision,
         CASE WHEN t.support > 0
              THEN CAST(t.tp AS DOUBLE) / CAST(t.support AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS recall
  FROM per_true t LEFT JOIN per_pred p USING (lang)
),
scored AS (
  SELECT lang, support, tp, pred_n, precision, recall,
         CASE WHEN precision + recall > CAST(0.0 AS DOUBLE)
              THEN 2.0 * precision * recall / (precision + recall)
              ELSE CAST(0.0 AS DOUBLE) END AS f1
  FROM cells
),
macro AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(list(f1 ORDER BY lang), v -> v)), (x, y) -> x + y)
         / CAST(COUNT(*) AS DOUBLE) AS macro_f1
  FROM scored
)
SELECT s.lang, s.support, s.tp, s.pred_n,
       round(s.precision, 9) AS precision,
       round(s.recall, 9) AS recall,
       round(s.f1, 9) AS f1,
       round(m.macro_f1, 9) AS macro_f1
FROM scored s CROSS JOIN macro m
"""


@register(
    "text_lang_id_macro_f1",
    oracle=None,  # composed below
    doc="per-class precision/recall/F1 + macro-F1 of the profile "
    "language-ID classifier from its confusion matrix — integer-ratio "
    "doubles, 0/0 cells pinned to 0.0 in both engines; the confusion "
    "frame pins once (|langs|^2 rows) and serves all three aggregates",
    tags=("pipeline", "text", "langid", "eval"),
)
def text_lang_id_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # already the cached PINNED LocalRelation (shared-cache roster) — the
    # classifier runs once per (session, corpus), not once per consumer
    conf = text_lang_id_confusion(spark, sf_dir)
    per_true = conf.groupBy("lang").agg(
        F.sum("n_docs").cast("long").alias("support"),
        F.sum(
            F.when(F.col("predicted_lang") == F.col("lang"), F.col("n_docs")).otherwise(
                0
            )
        )
        .cast("long")
        .alias("tp"),
    )
    per_pred = conf.groupBy(F.col("predicted_lang").alias("lang")).agg(
        F.sum("n_docs").cast("long").alias("pred_n")
    )
    cells = per_true.join(per_pred, "lang", "left").select(
        "lang",
        "support",
        "tp",
        F.coalesce(F.col("pred_n"), F.lit(0)).alias("pred_n"),
        F.when(
            F.coalesce(F.col("pred_n"), F.lit(0)) > 0,
            F.col("tp").cast("double") / F.col("pred_n").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("precision"),
        F.when(
            F.col("support") > 0,
            F.col("tp").cast("double") / F.col("support").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("recall"),
    )
    pr = F.col("precision") + F.col("recall")
    scored = cells.select(
        "lang",
        "support",
        "tp",
        "pred_n",
        "precision",
        "recall",
        F.when(
            pr > F.lit(0.0),
            F.lit(2.0) * F.col("precision") * F.col("recall") / pr,
        )
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )
    scored = pin_small_result(scored, 8)  # one row per language
    # macro average as a LANG-ORDERED fold, not AVG: a cross-row float
    # AVG associates in partition order — the determinism contract wants
    # left folds over explicitly sorted arrays
    macro = scored.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("lang").alias("lg"), F.col("f1")))
        ).alias("fa"),
        F.count("*").cast("double").alias("nc"),
    ).select(
        (
            F.aggregate(
                F.transform("fa", lambda g: g["f1"]),
                F.lit(0.0),
                lambda x, y: x + y,
            )
            / F.col("nc")
        ).alias("macro_f1")
    )
    return scored.crossJoin(F.broadcast(macro)).select(
        "lang",
        "support",
        "tp",
        "pred_n",
        F.round("precision", 9).alias("precision"),
        F.round("recall", 9).alias("recall"),
        F.round("f1", 9).alias("f1"),
        F.round("macro_f1", 9).alias("macro_f1"),
    )


_REG8["text_lang_id_macro_f1"].oracle = _MACRO_F1_ORACLE.format(
    conf_q=_REG8["text_lang_id_confusion"].oracle
)
