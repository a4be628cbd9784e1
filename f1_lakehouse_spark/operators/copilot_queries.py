"""Registered queries exercising the copilot guardrail path (O4) through
the real `spark.sql` execution route, so the correctness gate covers it."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from f1_lakehouse_spark.copilot.guardrails import execute_guarded
from f1_lakehouse_spark.registry import register
from f1_lakehouse_spark.tables import load_table

_INNER = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "o4_guarded_limit_wrap",
    oracle=f"SELECT * FROM ({_INNER}) AS safe_view LIMIT 200",
    doc="copilot LIMIT-wrap guardrail executed via spark.sql (O4/F13/F14)",
    tags=("O4", "F13", "F14", "copilot"),
)
def o4_guarded_limit_wrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    raw_llm_output = f"Here is the query you asked for:\n```sql\n{_INNER}\n```"
    return execute_guarded(spark, raw_llm_output, max_rows=200)
