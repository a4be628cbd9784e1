"""NL→SQL copilot guardrails (SURVEY.md §2.8 F13–F15, §2.6 O4).

The reference's AI copilot prompts an LLM for SQL, then defends the
warehouse with: ```` ```sql ```` fence extraction (reference
``ai/rag_api/main.py:80-81``), a SELECT-only keyword deny-list
(``ai/rag_api/app.py:167-176``), a hard LIMIT wrap
(``ai/rag_api/app.py:177``: ``SELECT * FROM (<stmt>) AS safe_view LIMIT
n``), and a schema-prefix rewrite (``ai/rag_api/main.py:146-147``).

The LLM itself stays behind an injectable interface (``SqlTranslator``);
the engine-relevant, deterministic parts are below and execute via
``spark.sql``. Spark has no connection-level read-only mode (S7), so
SELECT-only enforcement at this layer IS the read-only guarantee.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

DEFAULT_MAX_ROWS = 200  # reference .env.example:8 AI_MAX_ROWS

_FENCE_RE = re.compile(r"```(?:sql)?\s*(.+?)```", re.DOTALL | re.IGNORECASE)
_DENY_RE = re.compile(
    r"\b(insert|update|delete|drop|alter|create|truncate|merge|grant|vacuum|call|set)\b",
    re.IGNORECASE,
)


class GuardrailError(ValueError):
    pass


def extract_sql(text: str) -> str:
    """F13: pull SQL out of a ```sql fenced block; else use text as-is."""
    m = _FENCE_RE.search(text)
    sql = (m.group(1) if m else text).strip().rstrip(";").strip()
    return sql


def validate_select_only(sql: str) -> str:
    """F14: require a leading SELECT/WITH and reject mutating keywords."""
    stripped = sql.lstrip()
    if not re.match(r"(?is)^(select|with)\b", stripped):
        raise GuardrailError("only SELECT statements are allowed")
    if _DENY_RE.search(stripped):
        raise GuardrailError("statement contains a denied keyword")
    if ";" in stripped:
        raise GuardrailError("multiple statements are not allowed")
    return stripped


def rewrite_schema_names(sql: str, mapping: dict[str, str]) -> str:
    """F15: rewrite `silver.` → resolved schema prefixes."""
    for src, dst in mapping.items():
        sql = re.sub(rf"\b{re.escape(src)}\.", f"{dst}.", sql)
    return sql


def wrap_limit(sql: str, max_rows: int = DEFAULT_MAX_ROWS) -> str:
    """O4: hard row-cap wrap — identical trick works verbatim in Spark SQL."""
    return f"SELECT * FROM ({sql}) AS safe_view LIMIT {int(max_rows)}"


def execute_guarded(
    spark: SparkSession,
    raw_text: str,
    max_rows: int = DEFAULT_MAX_ROWS,
    schema_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """Full guarded path: extract → validate → rewrite → cap → spark.sql."""
    sql = extract_sql(raw_text)
    sql = validate_select_only(sql)
    if schema_mapping:
        sql = rewrite_schema_names(sql, schema_mapping)
    return spark.sql(wrap_limit(sql, max_rows))


# --- NL→SQL translator interface (LLM stays injectable; see §3.3) -----------

SqlTranslator = Callable[[str, str], str]
"""(question, schema_doc) -> SQL text (possibly fenced)."""


@dataclass
class TemplateTranslator:
    """Deterministic, network-free stand-in for the reference's Ollama call:
    matches the question against a small template table. Tests and offline
    runs use this; a real LLM client implements the same callable."""

    templates: dict[str, str]

    def __call__(self, question: str, schema_doc: str) -> str:
        q = question.lower()
        for needle, sql in self.templates.items():
            if needle in q:
                return sql
        raise GuardrailError(f"no template matches question: {question!r}")


def ask(
    spark: SparkSession,
    question: str,
    translator: SqlTranslator,
    schema_doc: str = "",
    max_rows: int = DEFAULT_MAX_ROWS,
    schema_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """The copilot `/ask` endpoint shape (reference ai/rag_api/app.py:190-225)
    minus HTTP: translate → guard → execute."""
    raw = translator(question, schema_doc)
    return execute_guarded(spark, raw, max_rows=max_rows, schema_mapping=schema_mapping)
