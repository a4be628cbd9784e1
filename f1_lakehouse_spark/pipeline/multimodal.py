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

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.pipeline.hashing import MOD, sql_poly_hash
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


def decode_batch(it: Iterator) -> Iterator:
    """mapInPandas batch fn: binary payload → typed metadata rows."""
    for pdf in it:
        metas = [fake_decode_meta(bytes(p)) for p in pdf["payload"]]
        out = pdf[["doc_id"]].copy()
        out["n_bytes"] = [len(bytes(p)) for p in pdf["payload"]]
        out["fake_width"] = [m[0] for m in metas]
        out["fake_height"] = [m[1] for m in metas]
        out["channels"] = [m[2] for m in metas]
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
