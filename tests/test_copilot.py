"""Copilot guardrails: fence extraction, SELECT-only validation, schema
rewrite, LIMIT wrap, and the full ask() path against real tables."""

from __future__ import annotations

import pytest

from f1_lakehouse_spark.copilot.guardrails import (
    GuardrailError,
    TemplateTranslator,
    ask,
    execute_guarded,
    extract_sql,
    rewrite_schema_names,
    validate_select_only,
    wrap_limit,
)
from f1_lakehouse_spark.tables import load_table
from tests.conftest import SF_DIR


def test_extract_sql_fenced():
    assert extract_sql("junk\n```sql\nSELECT 1\n```\nmore") == "SELECT 1"
    assert extract_sql("```\nSELECT 2;\n```") == "SELECT 2"
    assert extract_sql("SELECT 3") == "SELECT 3"


@pytest.mark.parametrize(
    "bad",
    [
        "DROP TABLE lineitem",
        "INSERT INTO t VALUES (1)",
        "SELECT 1; DROP TABLE t",
        "WITH x AS (SELECT 1) DELETE FROM t",
        "UPDATE t SET a=1",
        "EXPLAIN SELECT 1",
    ],
)
def test_validate_rejects(bad):
    with pytest.raises(GuardrailError):
        validate_select_only(bad)


def test_validate_accepts():
    assert validate_select_only("SELECT * FROM t").startswith("SELECT")
    assert validate_select_only("  with x as (select 1) select * from x")


def test_schema_rewrite():
    out = rewrite_schema_names("SELECT * FROM silver.laps", {"silver": "main_silver"})
    assert out == "SELECT * FROM main_silver.laps"


def test_wrap_limit():
    assert wrap_limit("SELECT 1", 7) == "SELECT * FROM (SELECT 1) AS safe_view LIMIT 7"


def test_execute_guarded_caps_rows(spark):
    load_table(spark, SF_DIR, "nation").createOrReplaceTempView("nation_v")
    df = execute_guarded(spark, "```sql\nSELECT * FROM nation_v\n```", max_rows=10)
    assert df.count() == 10


def test_ask_end_to_end(spark):
    load_table(spark, SF_DIR, "region").createOrReplaceTempView("region_v")
    translator = TemplateTranslator(
        {"how many regions": "SELECT COUNT(*) AS n FROM region_v"}
    )
    df = ask(spark, "How many regions are there?", translator)
    assert df.collect()[0]["n"] == 5
    with pytest.raises(GuardrailError):
        ask(spark, "unmatched question", translator)
