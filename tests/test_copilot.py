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


# --- JSON payload parsing (deployed reference, app.py:154-164) ----------------


def test_parse_ai_response_plain_json():
    from f1_lakehouse_spark.copilot.guardrails import parse_ai_response

    out = parse_ai_response('{"sql": "SELECT 1", "chart_type": "bar"}')
    assert out == {"sql": "SELECT 1", "chart_type": "bar"}


def test_parse_ai_response_fenced_json():
    from f1_lakehouse_spark.copilot.guardrails import parse_ai_response

    out = parse_ai_response('```json\n{"sql": "SELECT 1"}\n```')
    assert out["sql"] == "SELECT 1"
    # bare fence without language tag too
    out = parse_ai_response('```\n{"sql": "SELECT 2"}\n```')
    assert out["sql"] == "SELECT 2"


@pytest.mark.parametrize("bad", ["not json at all", "```\nstill not json\n```", "[1,2]"])
def test_parse_ai_response_rejects(bad):
    from f1_lakehouse_spark.copilot.guardrails import parse_ai_response

    with pytest.raises(GuardrailError):
        parse_ai_response(bad)


# --- chart suggestion heuristic (main.py:90-96) -------------------------------


def test_suggest_chart_shapes(spark):
    from f1_lakehouse_spark.copilot.guardrails import suggest_chart

    line = spark.createDataFrame(
        [(1, 2.0)], "lapnumber int, median_laptime double"
    )
    assert suggest_chart(line) == "line"
    bar = spark.createDataFrame([("a", 1.0)], "team string, pts double")
    assert suggest_chart(bar) == "bar"  # numeric + 1 row <= 25
    table_wide = spark.createDataFrame(
        [(str(i),) for i in range(30)], "name string"
    )
    assert suggest_chart(table_wide) == "table"  # no numeric column
    big = spark.createDataFrame([(i, float(i)) for i in range(40)], "k int, v double")
    assert suggest_chart(big) == "table"  # numeric but > 25 rows, no trend axis


def test_ask_json_payload_and_fallback(spark):
    from f1_lakehouse_spark.copilot.guardrails import ask_json

    load_table(spark, SF_DIR, "region").createOrReplaceTempView("region_v2")
    translator = TemplateTranslator(
        {
            # deployed variant: JSON body with chart_type + justification
            "regions by key": '{"sql": "SELECT r_regionkey, r_name FROM region_v2",'
            ' "chart_type": "bar", "justification": "small lookup"}',
            # legacy variant: fenced SQL only → heuristic chart
            "region names": "```sql\nSELECT r_regionkey, r_name FROM region_v2\n```",
            # JSON present but mutating SQL → guardrail fires after parse
            "drop regions": '{"sql": "DROP TABLE region_v2"}',
        }
    )
    out = ask_json(spark, "show regions by key", translator)
    assert out["chart"] == "bar" and out["message"] == "small lookup"
    assert out["df"].count() == 5
    assert out["sql"].startswith("SELECT * FROM (")

    out2 = ask_json(spark, "list region names", translator)
    assert out2["chart"] == "bar"  # heuristic: numeric col, 5 rows
    assert out2["df"].count() == 5

    with pytest.raises(GuardrailError):
        ask_json(spark, "please drop regions", translator)
