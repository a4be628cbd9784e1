"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio libraries, so the *decode* step is stubbed
(``decode_image`` raises NotImplementedError; ``fake_decode_meta`` is the
deterministic stand-in) — but the Spark-side plumbing is real and tested:
binary payload column, struct metadata schema, ``mapInPandas`` batch
iteration, and partition-friendly shapes.

Scale notes: ``mapInPandas`` streams Arrow record batches — memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, not partition
size, which is what lets 100 GB of image bytes per task decode without OOM.
Metadata-only transforms (octet length, magic sniffing) stay JVM-side.
"""

from __future__ import annotations
from f1_lakehouse_spark.pinning import pin_checkpoint

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.pipeline.hashing import MOD, sql_md5_hash48, sql_poly_hash
from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table

META_SCHEMA = (
    "doc_id long, n_bytes long, fake_width int, fake_height int, channels int"
)


def decode_image(payload: bytes) -> object:
    """Real image decode — requires an imaging library not present in this
    environment. The pipeline shape (mapInPandas over binary) is identical;
    swap this in when PIL/opencv is available."""
    raise NotImplementedError(
        "image decoding requires an imaging library (PIL/opencv); "
        "use fake_decode_meta for the deterministic test path"
    )


def _poly_hash_bytes(payload: bytes) -> int:
    """Python twin of pipeline.hashing poly hash, over raw bytes."""
    acc = 0
    for byte in payload:
        acc = (acc * 31 + byte) % MOD
    return acc


def fake_decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: derive (width, height, channels)
    from a content hash. Same integer arithmetic is expressible in SQL, so
    the whole mapInPandas path has an exact oracle."""
    h = _poly_hash_bytes(payload)
    return (h % 1024, (h // 1024) % 1024, 3)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Make an opaque binary column (UTF-8 bytes of the text — the testdata
    has no real images; the engine treats it as an opaque payload)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


_POW31 = None  # 31^k mod MOD table, grown on demand, once per Python worker


def _pow31_table(n: int):
    """31^k % MOD for k < n as an int64 numpy array (guide §4.5: heavy
    init once per task/worker, amortised over every batch)."""
    global _POW31
    import numpy as np

    if _POW31 is None or len(_POW31) < n:
        size = max(n, 4096)
        p = np.empty(size, dtype=np.int64)
        p[0] = 1
        for i in range(1, size):
            p[i] = (p[i - 1] * 31) % MOD
        _POW31 = p
    return _POW31


def _poly_hash_batch(payloads) -> "object":
    """Vectorized batch twin of :func:`_poly_hash_bytes` (r11, guide §4.2):
    one numpy pass over the batch's concatenated bytes instead of a Python
    loop per byte. acc-fold == Σ byte_j * 31^(n-1-j) mod MOD, computed with
    a per-element exponent from the row's end offset and segment-summed via
    ``np.add.reduceat``. Exact: every term < MOD < 2^30, so int64 overflows
    only past 2^33 bytes per batch — far beyond Arrow's 2 GiB batch cap.
    """
    import numpy as np

    raw = [bytes(p) for p in payloads]
    lens = np.fromiter((len(b) for b in raw), dtype=np.int64, count=len(raw))
    total = int(lens.sum())
    if total == 0:
        return np.zeros(len(raw), dtype=np.int64), lens
    data = np.frombuffer(b"".join(raw), dtype=np.uint8).astype(np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    # exponent of each byte = (row_end - 1 - global_index)
    exps = np.repeat(ends, lens) - 1 - np.arange(total, dtype=np.int64)
    pw = _pow31_table(int(lens.max()))
    terms = (data * pw[exps]) % MOD
    out = np.zeros(len(raw), dtype=np.int64)
    nonempty = lens > 0
    if nonempty.any():
        # reduceat misbehaves on empty segments; sum only non-empty rows
        seg = np.add.reduceat(terms, starts[nonempty]) % MOD
        out[nonempty] = seg
    return out, lens


def decode_batch(it: Iterator) -> Iterator:
    """mapInPandas batch fn: binary payload → typed metadata rows."""
    for pdf in it:
        hs, lens = _poly_hash_batch(pdf["payload"])
        out = pdf[["doc_id"]].copy()
        out["n_bytes"] = lens
        out["fake_width"] = (hs % 1024).astype("int32")
        out["fake_height"] = ((hs // 1024) % 1024).astype("int32")
        out["channels"] = 3
        yield out


@register(
    "mm_binary_decode_meta",
    oracle=f"""
/* the corpus is pure ASCII, so the byte-level hash the pandas UDF computes
   equals the codepoint-level poly hash */
WITH hashed AS (
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           {{POLY}} AS h
    FROM documents
)
SELECT doc_id, n_bytes,
       CAST(h % 1024 AS INTEGER) AS fake_width,
       CAST((h // 1024) % 1024 AS INTEGER) AS fake_height,
       3 AS channels
FROM hashed
""".replace("{POLY}", sql_poly_hash("text")),
    doc="multimodal plumbing: binary payload -> mapInPandas decode-stub metadata",
    tags=("pipeline", "multimodal", "pandas-udf"),
)
def mm_binary_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = with_binary_payload(d).select("doc_id", "payload")
    return payloads.mapInPandas(decode_batch, schema=META_SCHEMA)


# --- frame sampling ------------------------------------------------------------------
# Video-style payload → sampled frame rows. Frame *indexing* is pure integer
# metadata math, so it stays JVM-side (posexplode over a stride sequence);
# only frame *decode* would go to a pandas UDF (stubbed, like decode_image).
# At scale this is the standard fan-out: one row per sampled frame, hash-
# partitionable downstream, payload sliced not copied N times.

FRAME_BYTES = 64  # fake fixed-size frames
FRAME_STRIDE = 4  # keep every 4th frame


@register(
    "mm_frame_sample",
    oracle=f"""
WITH vids AS (
    SELECT doc_id, text AS t,
           octet_length(encode(text)) // {FRAME_BYTES} AS n_frames
    FROM documents
)
SELECT doc_id, frame_idx,
       {sql_poly_hash(f"substr(t, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})")}
           AS frame_hash
FROM (
    SELECT doc_id, t,
           unnest(range(0, n_frames, {FRAME_STRIDE})) AS frame_idx
    FROM vids WHERE n_frames >= 1
)
""",
    doc=f"multimodal frame sampling: every {FRAME_STRIDE}th {FRAME_BYTES}-byte "
    "frame of the payload becomes a row (JVM-side index fan-out + slice; "
    "decode itself is the stubbed pandas step)",
    tags=("pipeline", "multimodal"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_lakehouse_spark.pipeline.hashing import spark_poly_hash

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").alias("t"),
        (F.octet_length(F.encode("text", "UTF-8")) / F.lit(FRAME_BYTES))
        .cast("long")
        .alias("n_frames"),
    )
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(FRAME_STRIDE))
    frames = d.filter(F.col("n_frames") >= 1).select(
        "doc_id", "t", F.explode(idx).alias("frame_idx")
    )
    frame = F.substring(
        F.col("t"), F.col("frame_idx") * FRAME_BYTES + 1, FRAME_BYTES
    )
    return frames.select(
        "doc_id", "frame_idx", spark_poly_hash(frame).alias("frame_hash")
    )


# --- resize (aspect-preserving, integer math) ----------------------------------------

RESIZE_TARGET = 256


def fake_resize_dims(width: int, height: int) -> tuple[int, int]:
    """Aspect-preserving fit into RESIZE_TARGET², in pure integer math so
    the pandas UDF and the SQL oracle agree bit-for-bit."""
    longest = max(width, height, 1)
    return (width * RESIZE_TARGET) // longest, (height * RESIZE_TARGET) // longest


def resize_batch(it: Iterator) -> Iterator:
    """mapInPandas: fake-decode dims, compute the resize plan. The actual
    pixel resample is the stubbed step (needs PIL/opencv); the batch shape,
    schema, and integer geometry are the real pipeline."""
    for pdf in it:
        dims = [fake_decode_meta(bytes(p))[:2] for p in pdf["payload"]]
        out = pdf[["doc_id"]].copy()
        out["in_w"] = [d[0] for d in dims]
        out["in_h"] = [d[1] for d in dims]
        resized = [fake_resize_dims(w, h) for w, h in dims]
        out["out_w"] = [r[0] for r in resized]
        out["out_h"] = [r[1] for r in resized]
        yield out


@register(
    "mm_resize_plan",
    oracle=f"""
WITH hashed AS (
    SELECT doc_id, {sql_poly_hash("text")} AS h FROM documents
),
dims AS (
    SELECT doc_id,
           CAST(h % 1024 AS INTEGER) AS in_w,
           CAST((h // 1024) % 1024 AS INTEGER) AS in_h
    FROM hashed
)
SELECT doc_id, in_w, in_h,
       CAST(in_w * {RESIZE_TARGET} // greatest(in_w, in_h, 1) AS INTEGER) AS out_w,
       CAST(in_h * {RESIZE_TARGET} // greatest(in_w, in_h, 1) AS INTEGER) AS out_h
FROM dims
""",
    doc=f"multimodal resize plan: aspect-preserving fit to {RESIZE_TARGET}px "
    "via integer math in an Arrow-batched pandas UDF (pixel resample is the "
    "stubbed library call)",
    tags=("pipeline", "multimodal", "pandas-udf"),
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = with_binary_payload(d).select("doc_id", "payload")
    return payloads.mapInPandas(
        resize_batch, schema="doc_id long, in_w int, in_h int, out_w int, out_h int"
    )


# --- feature extraction --------------------------------------------------------------
# Embedding-from-payload shape: pandas UDF emits a fixed-width feature
# vector as SCALAR columns (f0..f3 + norm), the layout a feature store
# ingests; values derive from the content hash so the whole path has an
# exact oracle. A real encoder swaps into the same batch function.

FEAT_DIM = 4
_FEAT_BASE = 4096


def fake_features(payload: bytes) -> list[float]:
    h = _poly_hash_bytes(payload)
    return [((h // (_FEAT_BASE**i)) % _FEAT_BASE) / _FEAT_BASE for i in range(FEAT_DIM)]


def feature_batch(it: Iterator) -> Iterator:
    for pdf in it:
        feats = [fake_features(bytes(p)) for p in pdf["payload"]]
        out = pdf[["doc_id"]].copy()
        for i in range(FEAT_DIM):
            out[f"f{i}"] = [f[i] for f in feats]
        out["norm2"] = [
            ((f[0] * f[0] + f[1] * f[1]) + f[2] * f[2]) + f[3] * f[3] for f in feats
        ]
        yield out


@register(
    "mm_feature_extract",
    oracle=f"""
WITH hashed AS (
    SELECT doc_id, {sql_poly_hash("text")} AS h FROM documents
),
f AS (
    SELECT doc_id,
           CAST((h // 1) % {_FEAT_BASE} AS DOUBLE) / {_FEAT_BASE} AS f0,
           CAST((h // {_FEAT_BASE}) % {_FEAT_BASE} AS DOUBLE) / {_FEAT_BASE} AS f1,
           CAST((h // {_FEAT_BASE**2}) % {_FEAT_BASE} AS DOUBLE) / {_FEAT_BASE} AS f2,
           CAST((h // {_FEAT_BASE**3}) % {_FEAT_BASE} AS DOUBLE) / {_FEAT_BASE} AS f3
    FROM hashed
)
SELECT doc_id, f0, f1, f2, f3,
       ((f0*f0 + f1*f1) + f2*f2) + f3*f3 AS norm2
FROM f
""",
    doc=f"multimodal feature extraction: {FEAT_DIM}-dim content-derived "
    "feature vector emitted as scalar columns from an Arrow-batched pandas "
    "UDF (a real encoder swaps into the same batch fn)",
    tags=("pipeline", "multimodal", "pandas-udf"),
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = with_binary_payload(d).select("doc_id", "payload")
    return payloads.mapInPandas(
        feature_batch,
        schema="doc_id long, f0 double, f1 double, f2 double, f3 double, "
        "norm2 double",
    )


# --- audio chunking ------------------------------------------------------------------
# Overlapping fixed-size windows over a waveform-style payload — the
# speech-pipeline pre-segmentation. Window arithmetic is JVM-side
# (sequence + slice); per-chunk decode would be the pandas step.

CHUNK_LEN = 100
CHUNK_STRIDE = 50


@register(
    "mm_audio_chunks",
    oracle=f"""
WITH au AS (
    SELECT doc_id, text AS t, octet_length(encode(text)) AS n FROM documents
),
chunks AS (
    /* inclusive max start = n - CHUNK_LEN + 1 (last full window), floored
       at 1 so short payloads still yield one (truncated) chunk; DuckDB
       range() is upper-exclusive so +1 */
    SELECT doc_id, t,
           unnest(range(1, greatest(n - {CHUNK_LEN} + 1, 1) + 1, {CHUNK_STRIDE}))
               AS start_off
    FROM au
)
SELECT doc_id, start_off,
       octet_length(encode(substr(t, start_off, {CHUNK_LEN}))) AS chunk_len,
       {sql_poly_hash(f"substr(t, start_off, {CHUNK_LEN})")} AS chunk_hash
FROM chunks
""",
    doc=f"multimodal audio chunking: overlapping {CHUNK_LEN}-byte windows "
    f"every {CHUNK_STRIDE} bytes (JVM window fan-out; per-chunk decode is "
    "the stubbed pandas step)",
    tags=("pipeline", "multimodal"),
)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_lakehouse_spark.pipeline.hashing import spark_poly_hash

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").alias("t"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n"),
    )
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.col("n") - F.lit(CHUNK_LEN - 1), F.lit(1)),
        F.lit(CHUNK_STRIDE),
    )
    chunks = d.select("doc_id", "t", F.explode(starts).alias("start_off"))
    chunk = F.substring(F.col("t"), F.col("start_off"), CHUNK_LEN)
    return chunks.select(
        "doc_id",
        "start_off",
        F.octet_length(F.encode(chunk, "UTF-8")).alias("chunk_len"),
        spark_poly_hash(chunk).alias("chunk_hash"),
    )


# --- content-defined chunking (CDC storage dedup) -----------------------------------
# The storage-layer dedup trick (Rabin-style): split every payload at
# positions where a rolling window hash hits a boundary pattern, so an
# insertion early in a file only changes the chunks it touches — chunk
# fingerprints then dedup ACROSS documents. Boundaries here are
# "md5-derived hash of the 4-byte window % CDC_MOD == 0" (the engines'
# shared md5 integer hash, no RNG); expected chunk length = CDC_MOD bytes.
# All array ops are per-doc and bounded by doc length (the window-hash
# pass is O(len · window)); the only shuffle is the fingerprint dedup
# aggregate. Output is the 1-row storage-savings report.

CDC_W = 4  # rolling window bytes
CDC_MOD = 64  # boundary selectivity => expected chunk ~64 bytes


@register(
    "mm_payload_cdc_chunks",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, text, length(text) AS n
  FROM documents WHERE text IS NOT NULL AND length(text) >= {CDC_W}
),
bounds AS (
  SELECT doc_id, text, n,
         list_concat(
             list_concat(
                 [CAST(1 AS BIGINT)],
                 list_filter(generate_series({CDC_W}, n),
                             i -> {sql_md5_hash48(f"substr(text, i - {CDC_W - 1}, {CDC_W})")}
                                  % {CDC_MOD} = 0)),
             [CAST(n + 1 AS BIGINT)]) AS b
  FROM docs
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(b) - 1),
                               j -> substr(text, b[j], b[j + 1] - b[j]))) AS c
  FROM bounds
),
fp AS (
  SELECT md5(c) AS f, length(c) AS clen FROM chunks WHERE length(c) > 0
)
SELECT COUNT(*) AS total_chunks,
       COUNT(DISTINCT f) AS distinct_chunks,
       CAST(SUM(clen) AS BIGINT) AS total_bytes,
       CAST(SUM(CASE WHEN rn = 1 THEN clen ELSE 0 END) AS BIGINT)
           AS distinct_bytes
FROM (SELECT f, clen,
             ROW_NUMBER() OVER (PARTITION BY f ORDER BY f) AS rn
      FROM fp)
""",
    doc="content-defined chunking dedup report: rolling-window hash "
    "boundaries (md5-derived, expected ~64-byte chunks), cross-document "
    "chunk fingerprint dedup, total vs distinct bytes — the storage-layer "
    "dedup shape for multimodal payload stores",
    tags=("pipeline", "multimodal", "dedup", "cdc"),
)
def mm_payload_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") >= CDC_W))
        .select("doc_id", "text", F.length("text").alias("n"))
    )
    # boundary positions via SQL expr (substring with a per-element start
    # needs the expr form); the window hash is the shared md5-derived int48
    d = d.withColumn(
        "b",
        F.expr(
            f"concat(array(1), "
            f"filter(sequence({CDC_W}, n), i -> "
            f"CAST(conv(substring(md5(substring(text, i - {CDC_W - 1}, {CDC_W})), 1, 12), 16, 10) AS BIGINT) % {CDC_MOD} = 0), "
            f"array(n + 1))"
        ),
    )
    chunks = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(b) - 1), "
                "j -> substring(text, element_at(b, j), "
                "element_at(b, j + 1) - element_at(b, j)))"
            )
        ).alias("c"),
    ).filter(F.length("c") > 0)
    fp = chunks.select(F.md5("c").alias("f"), F.length("c").alias("clen"))
    # r11 (guide §2.2): one groupBy(f) with map-side partial aggregation
    # replaces the row_number window (which shuffled + sorted EVERY chunk
    # row) and the count_distinct expansion. Equal fingerprints mean equal
    # chunk content hence equal clen — the very property the window's
    # rn=1-under-ties formulation already relied on — so per-fingerprint
    # (cnt, clen) reproduces every statistic exactly: total = Σ cnt·clen,
    # distinct = Σ clen. Oracle unchanged.
    per_f = fp.groupBy("f").agg(
        F.count("*").alias("cnt"), F.max("clen").alias("clen")
    )
    return per_f.agg(
        F.sum("cnt").cast("long").alias("total_chunks"),
        F.count("*").cast("long").alias("distinct_chunks"),
        F.sum(F.col("cnt") * F.col("clen")).cast("long").alias("total_bytes"),
        F.sum("clen").cast("long").alias("distinct_bytes"),
    )


# --- Walsh-Hadamard perceptual-hash near-dup -------------------------------------------
# A pHash-style perceptual fingerprint WITHOUT the DCT (cosines are not
# bit-stable cross-engine; the Walsh-Hadamard transform is pure integer
# adds/subtracts, so it is): the payload's first 64 character codes (the
# opaque-payload stand-in for decoded pixels; cycled when shorter) form an
# 8x8 grid, the 2D WHT coefficient F[u][v] = sum_{r,c}
# (-1)^(popcount(u&r) + popcount(v&c)) * g[r][c] is exact integer
# arithmetic, and the 63 AC-coefficient signs pack into one BIGINT
# fingerprint. Near-dups = 21-bit band LSH candidates (3 bands) verified
# by Hamming distance <= threshold — the classic sketch-band-verify shape:
# the fingerprint build is map-only, candidates shuffle ONLY on band
# buckets, and the verify is one integer XOR popcount per candidate.

_PHASH_HAMMING_MAX = 6
_PHASH_BANDS = 3
_PHASH_BAND_BITS = 21


def _phash_sql_cte() -> str:
    """g/f/ph fingerprint CTEs (naive O(n^2) WHT — same exact integers as
    the engine's butterfly; only evaluation strategy differs)."""
    grid = (
        "list_transform(range(0, 64), "
        "k -> ascii(substr(text, CAST(k % length(text) AS INTEGER) + 1, 1)))"
    )
    coeff = (
        "list_transform(range(0, 64), t -> "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 64), "
        "s -> CAST((1 - 2 * ((bit_count(CAST(t // 8 AS BIGINT) & CAST(s // 8 AS BIGINT))"
        " + bit_count(CAST(t % 8 AS BIGINT) & CAST(s % 8 AS BIGINT))) % 2)) AS BIGINT)"
        " * g[CAST(s AS INTEGER) + 1])), (a, b) -> a + b))"
    )
    pack = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 63), "
        "j -> CASE WHEN f[64 - CAST(j AS INTEGER)] > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)), "
        "(acc, b) -> acc * 2 + b)"
    )
    return f"""g AS (
  SELECT doc_id, {grid} AS g FROM documents WHERE length(text) > 0
), f AS (
  SELECT doc_id, {coeff} AS f FROM g
), ph AS (
  SELECT doc_id, {pack} AS phash FROM f
)"""


def _phash_oracle() -> str:
    grid = (
        "list_transform(range(0, 64), "
        "k -> ascii(substr(text, CAST(k % length(text) AS INTEGER) + 1, 1)))"
    )
    coeff = (
        "list_transform(range(0, 64), t -> "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 64), "
        "s -> CAST((1 - 2 * ((bit_count(CAST(t // 8 AS BIGINT) & CAST(s // 8 AS BIGINT))"
        " + bit_count(CAST(t % 8 AS BIGINT) & CAST(s % 8 AS BIGINT))) % 2)) AS BIGINT)"
        " * g[CAST(s AS INTEGER) + 1])), (a, b) -> a + b))"
    )
    pack = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 63), "
        "j -> CASE WHEN f[64 - CAST(j AS INTEGER)] > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)), "
        "(acc, b) -> acc * 2 + b)"
    )
    return f"""
WITH g AS (
  SELECT doc_id, {grid} AS g FROM documents WHERE length(text) > 0
), f AS (
  SELECT doc_id, {coeff} AS f FROM g
), ph AS (
  SELECT doc_id, {pack} AS phash FROM f
), bands AS (
  SELECT doc_id, phash, b,
         (phash >> (b * {_PHASH_BAND_BITS})) & {(1 << _PHASH_BAND_BITS) - 1} AS bv
  FROM ph, (SELECT unnest(range(0, {_PHASH_BANDS})) AS b)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.phash AS ph_a,
                  c.doc_id AS doc_b, c.phash AS ph_b
  FROM bands a JOIN bands c
    ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming,
       ph_a = ph_b AS same_fingerprint
FROM cand
WHERE bit_count(xor(ph_a, ph_b)) <= {_PHASH_HAMMING_MAX}
"""


@register(
    "mm_phash_hadamard_neardup",
    oracle=None,  # composed below
    doc="perceptual-hash near-dup over opaque payloads: 8x8 Walsh-Hadamard "
    "transform of the first 64 payload character codes (integer-exact — "
    "the transcendental-free pHash), 63 sign bits packed into one BIGINT, "
    "21-bit-band LSH candidates verified by Hamming <= "
    f"{_PHASH_HAMMING_MAX}.",
    tags=("pipeline", "multimodal", "dedup", "sketch"),
)
def mm_phash_hadamard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: fingerprint build is map-only (384 integer butterfly ops/doc
    inside the scan stage); the only shuffles are the band-bucket joins
    plus a DISTINCT over candidates; verify is one XOR popcount per
    candidate."""
    ph, out = _phash_candidates_lazy(spark, sf_dir)
    out = pin_checkpoint(out)
    ph.unpersist()
    return out


def _phash_frame(spark: SparkSession, sf_dir: str):
    """Lazy per-document Walsh-Hadamard fingerprint frame (doc_id, phash)
    — the shared build for the near-dup pair op and the radius search."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    # the fingerprint build is pure map CPU: make it run wide even when the
    # input is one small file (input-bytes-derived check, the
    # stats_bootstrap_ci_poisson idiom — at scale the scan is already
    # parallel and this is a no-op)
    from f1_lakehouse_spark.session import input_bytes, maxpartition_bytes
    from f1_lakehouse_spark.tables import table_path

    par = spark.sparkContext.defaultParallelism
    max_split = maxpartition_bytes(spark)
    scan_tasks = -(-input_bytes(spark, [table_path(sf_dir, "documents")]) // max_split)
    if scan_tasks < par:
        d = d.repartition(par)
    g = d.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda k: F.ascii(
                F.substring(
                    F.col("text"), (k % F.length("text")).cast("int") + F.lit(1), 1
                )
            ),
        ).alias("g"),
    )
    # Fast WHT butterfly: 6 stages of 64 adds/subs (one per index bit)
    # instead of the 64x64 naive sum — same exact integers (the transform
    # is integer arithmetic, so the DuckDB oracle can stay in the naive
    # O(n^2) form; only evaluation strategy differs), but a ~10x smaller
    # Catalyst expression tree. Each stage is its own projection so the
    # previous array is a MATERIALIZED column before element_at touches it.
    zero = F.lit(0).cast("long")

    def _butterfly(b: int):
        # factory, NOT a default-arg lambda: a two-arg lambda is silently
        # the (value, index) form and b would receive the element index
        # (CLAUDE.md HOF-arity trap)
        def step(i):
            return F.when(
                i.bitwiseAND(F.lit(b)) == 0,
                F.element_at("f", (i + 1).cast("int"))
                + F.element_at("f", (i + F.lit(b) + 1).cast("int")),
            ).otherwise(
                F.element_at("f", (i - F.lit(b) + 1).cast("int"))
                - F.element_at("f", (i + 1).cast("int"))
            )

        return step

    f = g.select("doc_id", F.transform("g", lambda x: x.cast("long")).alias("f"))
    for b in (1, 2, 4, 8, 16, 32):
        f = f.select(
            "doc_id",
            F.transform(F.sequence(F.lit(0), F.lit(63)), _butterfly(b)).alias("f"),
        )
    ph = f.select(
        "doc_id",
        F.aggregate(
            F.sequence(F.lit(0), F.lit(62)),
            zero,
            lambda acc, j: acc * 2
            + F.when(
                F.element_at("f", (F.lit(64) - j).cast("int")) > 0, F.lit(1)
            )
            .otherwise(F.lit(0))
            .cast("long"),
        ).alias("phash"),
    )
    return ph


def _phash_candidates_lazy(spark: SparkSession, sf_dir: str):
    """Build (persisted fingerprint frame, lazy candidate-pair frame) —
    separated so tests can assert the candidate plan (the registered fn
    materializes through pin_checkpoint, which hides it behind a
    LogicalRDD)."""
    ph = _phash_frame(spark, sf_dir)
    ph = ph.persist()
    ph.count()  # self-join on a derived frame: materialize the barrier
    mask = F.lit((1 << _PHASH_BAND_BITS) - 1).cast("long")
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(_PHASH_BANDS - 1))).alias("b"),
    ).select(
        "doc_id",
        "phash",
        "b",
        (
            F.expr(f"shiftright(phash, b * {_PHASH_BAND_BITS})").bitwiseAND(mask)
        ).alias("bv"),
    )
    a, c = bands.alias("a"), bands.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.b") == F.col("c.b"))
            & (F.col("a.bv") == F.col("c.bv"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.phash").alias("ph_a"),
            F.col("c.doc_id").alias("doc_b"),
            F.col("c.phash").alias("ph_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("long")
    out = cand.select(
        "doc_a",
        "doc_b",
        ham.alias("hamming"),
        (F.col("ph_a") == F.col("ph_b")).alias("same_fingerprint"),
    ).where(F.col("hamming") <= _PHASH_HAMMING_MAX)
    return ph, out


from f1_lakehouse_spark.registry import REGISTRY as _REG5  # noqa: E402

_REG5["mm_phash_hadamard_neardup"].oracle = _phash_oracle()


# --- Hamming radius search against a query fingerprint ----------------------------------
# The point-query twin of the near-dup pair sweep: every document within
# Hamming radius _PHASH_HAMMING_MAX of ONE query document's fingerprint.
# Map-only: the 1-row query fingerprint broadcasts (plan-visible limit
# under the plan-lint rule) and every corpus fingerprint answers with one
# XOR popcount inside the scan stage — zero shuffle of the corpus, the
# shape that serves "find copies of THIS image" at any scale. The result
# set is duplicate-cluster-proportional, so it pins via localCheckpoint.

_PHASH_QUERY_DOC = 8  # has radius-6 neighbors at sf0.001 and sf0.01 (non-empty gate)


@register(
    "mm_phash_radius_search",
    oracle=None,  # composed below from the shared fingerprint CTE
    doc="Hamming radius search over perceptual fingerprints: 1-row query "
    f"fingerprint broadcast, XOR popcount filter at radius "
    f"{_PHASH_HAMMING_MAX} inside the scan stage — map-only, zero corpus "
    "shuffle.",
    tags=("pipeline", "multimodal", "similarity", "sketch"),
)
def mm_phash_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: fingerprint build is the shared map-only butterfly; the
    query side is one row (limit(1) makes the broadcast bound
    plan-provable); output pins via pin_checkpoint (cluster-proportional,
    never through the driver)."""
    ph = _phash_frame(spark, sf_dir)
    ph = ph.persist()
    ph.count()  # self-join on a derived frame: materialize the barrier
    q = (
        ph.where(F.col("doc_id") == _PHASH_QUERY_DOC)
        .limit(1)
        .select(F.col("phash").alias("qph"))
    )
    ham = F.bit_count(F.col("phash").bitwiseXOR(F.col("qph"))).cast("long")
    out = (
        ph.crossJoin(F.broadcast(q))
        .where(F.col("doc_id") != _PHASH_QUERY_DOC)
        .select("doc_id", ham.alias("hamming"))
        .where(F.col("hamming") <= _PHASH_HAMMING_MAX)
        .orderBy("hamming", "doc_id")
    )
    out = pin_checkpoint(out)
    ph.unpersist()
    return out


_REG2 = __import__(
    "f1_lakehouse_spark.registry", fromlist=["REGISTRY"]
).REGISTRY
_REG2["mm_phash_radius_search"].oracle = f"""
WITH {_phash_sql_cte()},
q AS (SELECT phash AS qph FROM ph WHERE doc_id = {_PHASH_QUERY_DOC})
SELECT p.doc_id, CAST(bit_count(xor(p.phash, q.qph)) AS BIGINT) AS hamming
FROM ph p CROSS JOIN q
WHERE p.doc_id <> {_PHASH_QUERY_DOC}
  AND bit_count(xor(p.phash, q.qph)) <= {_PHASH_HAMMING_MAX}
ORDER BY hamming, p.doc_id
"""


# --- scene-change detection ----------------------------------------------------------
# Video segmentation shape: adjacent sampled-frame hash distance above a
# threshold marks a scene boundary; scene ids are a per-video running sum
# of boundaries and scenes aggregate to per-video stats. Everything after
# the (stubbed) frame hash is JVM-side window/agg — the real pipeline
# swaps a perceptual frame embedding into the SAME shape. Per-video
# windows are bounded by frames-per-video (payload length / FRAME_BYTES),
# never global — the 100 TB safe window class.

SCENE_HAMMING_T = 16  # xor popcount threshold on the ~30-bit frame hashes


@register(
    "mm_scene_change",
    oracle=f"""
WITH vids AS (
    SELECT doc_id, text AS t,
           octet_length(encode(text)) // {FRAME_BYTES} AS n_frames
    FROM documents
),
frames AS (
    SELECT doc_id, frame_idx,
           {sql_poly_hash(f"substr(t, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})")}
               AS fh
    FROM (
        SELECT doc_id, t,
               unnest(range(0, n_frames, {FRAME_STRIDE})) AS frame_idx
        FROM vids WHERE n_frames >= 1
    )
),
d AS (
    SELECT doc_id, frame_idx, fh,
           lag(fh) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS ph
    FROM frames
),
b AS (
    SELECT doc_id, frame_idx,
           CASE WHEN ph IS NULL THEN 1
                WHEN bit_count(xor(fh, ph)) >= {SCENE_HAMMING_T} THEN 1
                ELSE 0 END AS bd
    FROM d
),
s AS (
    SELECT doc_id,
           SUM(bd) OVER (PARTITION BY doc_id ORDER BY frame_idx
                         ROWS UNBOUNDED PRECEDING) AS scene_id
    FROM b
),
sl AS (
    SELECT doc_id, scene_id, COUNT(*) AS flen
    FROM s GROUP BY doc_id, scene_id
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_scenes,
       CAST(MAX(flen) AS BIGINT) AS max_scene_frames
FROM sl GROUP BY doc_id
""",
    doc="multimodal scene-change detection: adjacent sampled-frame hash "
    f"distance (xor popcount >= {SCENE_HAMMING_T}) marks a boundary; "
    "per-video running-sum scene ids aggregate to scene counts/lengths — "
    "the shot-segmentation shape with the perceptual embedding stubbed "
    "by the deterministic frame hash",
    tags=("pipeline", "multimodal"),
)
def mm_scene_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    frames = mm_frame_sample(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("frame_hash").over(w)
    boundary = F.when(prev.isNull(), F.lit(1)).otherwise(
        (
            F.bit_count(F.col("frame_hash").bitwiseXOR(prev))
            >= F.lit(SCENE_HAMMING_T)
        ).cast("int")
    )
    scenes = frames.select(
        "doc_id",
        "frame_idx",
        F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("scene_id"),
    )
    lengths = scenes.groupBy("doc_id", "scene_id").agg(
        F.count("*").alias("flen")
    )
    return lengths.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_scenes"),
        F.max("flen").cast("long").alias("max_scene_frames"),
    )
