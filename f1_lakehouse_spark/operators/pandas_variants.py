"""Demonstrative pandas-UDF operators (SURVEY.md §2.10).

The reference registers no UDFs — all custom logic is SQL macros or
client-side pandas (reference ``transform/macros/safe.sql:1-3``,
``dashboard/app.py:48-68``). Per the engine decision in SURVEY §2.10, the
scalar library stays native-Column; this module keeps ONE differentially
verified exemplar of each Arrow UDF kind so every Python-execution path
Spark offers is exercised against the same oracle a built-in satisfies —
proving the paths agree:

- grouped-map ``applyInPandas``   → ``w1_personal_best_applyinpandas``
- scalar ``pandas_udf`` (SERIES→SERIES) → ``scalar_pandas_udf_revenue``
- grouped-agg ``pandas_udf`` (SERIES→SCALAR) → ``a7_median_groupedagg``
  (the PySpark stand-in for a custom UDAF)
- lateral UDTF lives in ``functions.make_chunk_udtf``; Arrow
  ``mapInPandas`` in ``pipeline/multimodal.py``.

Scale note: every one of these ships rows through Arrow to Python workers —
use them only when the logic genuinely needs pandas. These queries exist to
keep the paths tested (each has a native-Column twin as the production
implementation), not because the operations need Python.

Determinism: the scalar UDF does per-row IEEE arithmetic (bit-identical in
any engine); its downstream SUM goes through decimal accumulation. The
grouped-agg UDF computes a median, which sorts its input — order-independent
by construction despite float inputs arriving in shuffle order.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table

_OUT_SCHEMA = "user_id long, event_id long, v double, rn integer"


def _rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user personal-best ranking: ASC NULLS LAST by (v, ts, event_id),
    top 3 — pandas twin of W1's row_number window."""
    pdf = pdf.sort_values(
        ["v", "ts", "event_id"], ascending=True, na_position="last"
    ).reset_index(drop=True)
    pdf["rn"] = pdf.index + 1
    return pdf.loc[pdf["rn"] <= 3, ["user_id", "event_id", "v", "rn"]]


@register(
    "w1_personal_best_applyinpandas",
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
SELECT user_id, event_id, v, CAST(rn AS INTEGER) AS rn
FROM ranked WHERE rn <= 3
""",
    doc="grouped-map applyInPandas twin of the W1 window (same oracle shape)",
    tags=("W1", "pandas-udf", "applyInPandas"),
)
def w1_personal_best_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.nullif(F.col("value"), F.lit(0.0)).alias("v")
    )
    ranked = e.groupBy("user_id").applyInPandas(_rank_group, schema=_OUT_SCHEMA)
    # pandas represents missing v as NaN; restore SQL NULL for oracle parity
    return ranked.withColumn(
        "v", F.when(F.isnan("v"), F.lit(None)).otherwise(F.col("v"))
    )


# --- scalar pandas_udf (SERIES -> SERIES, Arrow-batched) ---------------------


@pandas_udf(DoubleType())
def _disc_price(ext: pd.Series, disc: pd.Series) -> pd.Series:
    """Vectorized discounted price: one Arrow batch in, one out.

    Per-row IEEE double arithmetic — bit-identical to the JVM/DuckDB
    expression ``l_extendedprice * (1 - l_discount)``, so the twin oracle
    holds exactly.
    """
    return ext * (1.0 - disc)


@register(
    "scalar_pandas_udf_revenue",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
           AS revenue,
       COUNT(*) AS n_lines
FROM lineitem GROUP BY 1
""",
    doc="scalar Arrow pandas_udf computes the row expression; decimal-sum "
    "aggregate on top (native-Column twin: q1_pricing_summary)",
    tags=("UDF", "pandas-udf", "scalar"),
)
def scalar_pandas_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    priced = li.withColumn("disc_price", _disc_price("l_extendedprice", "l_discount"))
    return priced.groupBy("l_returnflag").agg(
        F.sum(F.col("disc_price").cast("decimal(27,6)")).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# --- grouped-agg pandas_udf (SERIES -> SCALAR; the PySpark custom-UDAF path) --


@pandas_udf(DoubleType())
def _median_agg(v: pd.Series) -> float:
    """Whole-group median in pandas. Median sorts its input, so the result
    is independent of shuffle arrival order — safe under the hash gate."""
    return float(v.median())


@register(
    "a7_median_groupedagg",
    oracle="""
SELECT l_linenumber, MEDIAN(l_quantity) AS median_qty
FROM lineitem GROUP BY 1
""",
    doc="grouped-agg pandas_udf median — custom-UDAF path, twin of the "
    "native a7_median_curve",
    tags=("A7", "pandas-udf", "grouped-agg"),
)
def a7_median_groupedagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linenumber").agg(_median_agg("l_quantity").alias("median_qty"))


# --- mapInArrow exemplar (zero-copy Arrow batches, no pandas conversion) ------------


def _arrow_token_stats(batches):
    """Per-row token/char counts computed with pyarrow.compute kernels —
    the zero-copy Arrow batch path (no pandas materialization at all).
    Split on single spaces exactly like Spark's split(text, ' ') /
    DuckDB's string_split: every delimiter produces a slot, so empty
    strings count too (list_value_length of the split list)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        t = pa.Table.from_batches([batch])
        words = pc.split_pattern(t.column("text"), pattern=" ")
        yield pa.RecordBatch.from_arrays(
            [
                t.column("doc_id").combine_chunks(),
                pc.cast(pc.list_value_length(words), pa.int64()).combine_chunks(),
                pc.cast(pc.utf8_length(t.column("text")), pa.int64()).combine_chunks(),
            ],
            names=["doc_id", "n_tokens", "n_chars"],
        )


@register(
    "maparrow_token_stats",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
    doc="mapInArrow exemplar: per-doc token/char counts via pyarrow.compute "
    "kernels on raw Arrow batches (the no-pandas Python path; completes "
    "the Arrow-UDF matrix alongside applyInPandas / pandas_udf / "
    "mapInPandas / UDTF). Native twin: text_token_count",
    tags=("pipeline", "text", "udf", "arrow"),
)
def maparrow_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        _arrow_token_stats, schema="doc_id long, n_tokens long, n_chars long"
    )
