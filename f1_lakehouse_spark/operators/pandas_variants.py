"""Demonstrative pandas-UDF operator (SURVEY.md §2.10).

The reference registers no UDFs — all custom logic is SQL macros or
client-side pandas (reference ``transform/macros/safe.sql:1-3``,
``dashboard/app.py:48-68``). Per the engine decision in SURVEY §2.10, the
scalar library stays native-Column; this module keeps ONE grouped-map
``applyInPandas`` variant of the personal-best ranking so the Arrow
grouped-UDF path is exercised and differentially verified against the same
oracle a built-in window satisfies — proving the two paths agree.

Scale note: applyInPandas shuffles whole groups to Python workers — use it
only when per-group logic genuinely needs pandas. This query exists to keep
that path tested, not because the window needs it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
