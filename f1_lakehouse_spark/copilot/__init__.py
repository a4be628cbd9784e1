from f1_lakehouse_spark.copilot.guardrails import (  # noqa: F401
    GuardrailError,
    execute_guarded,
    extract_sql,
    rewrite_schema_names,
    validate_select_only,
    wrap_limit,
)
