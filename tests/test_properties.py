"""Property-based tests (hypothesis) for the driver-side pure functions:
guardrail safety invariants and name normalizers."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from f1_lakehouse_spark.copilot.guardrails import (
    GuardrailError,
    extract_sql,
    validate_select_only,
    wrap_limit,
)
from f1_lakehouse_spark.functions.expressions import snake_case

DENY = ("insert", "update", "delete", "drop", "alter", "create", "truncate")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200), st.sampled_from(DENY))
def test_guardrail_never_passes_denied_keyword(suffix, kw):
    """No input containing a standalone mutating keyword ever validates."""
    sql = f"SELECT * FROM t WHERE x = 1; {kw.upper()} TABLE t {suffix}"
    with pytest.raises(GuardrailError):
        validate_select_only(sql)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_guardrail_output_always_select_and_single_statement(text):
    """Whatever survives validation starts with SELECT/WITH and has no ';'."""
    try:
        out = validate_select_only(text)
    except GuardrailError:
        return
    assert re.match(r"(?is)^(select|with)\b", out)
    assert ";" not in out
    assert not re.search(r"(?i)\b(insert|update|delete|drop|alter|create|truncate)\b", out)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters="`"), max_size=120))
def test_extract_sql_fenced_roundtrip(sql):
    """Fencing any ;-free text and extracting returns the stripped text."""
    fenced = f"prefix\n```sql\n{sql}\n```\nsuffix"
    assert extract_sql(fenced) == sql.strip().rstrip(";").strip()


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=10**6))
def test_wrap_limit_always_caps(n):
    out = wrap_limit("SELECT 1", n)
    assert out.endswith(f"LIMIT {n}")
    assert out.startswith("SELECT * FROM (")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_snake_case_idempotent_and_clean(name):
    s = snake_case(name)
    assert snake_case(s) == s  # idempotent
    assert re.fullmatch(r"[a-z0-9_]*", s)  # clean charset
    assert not s.startswith("_") and not s.endswith("_")
