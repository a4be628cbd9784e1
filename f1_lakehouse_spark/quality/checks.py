"""Data-quality gates (SURVEY.md §2.11 D4, §5).

The reference runs 17 dbt ``not_null`` tests compiled to
``count(*) as failures`` queries (reference ``transform/models/*/schema.yml``,
compiled test SQL under ``transform/target/compiled/.../not_null_*.sql``)
plus a row-count verification script (``scripts/check_gold.sh``).

Here: a single-pass not_null suite (ONE aggregate scan per table computing
every column's null count simultaneously — at 100 TB you cannot afford one
scan per test like dbt does) and a row-count gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_not_null(df: DataFrame, column: str) -> int:
    """dbt not_null shape: number of failing (NULL) rows; 0 = pass."""
    return df.filter(F.col(column).isNull()).count()


def run_not_null_suite(df: DataFrame, columns: list[str]) -> dict[str, int]:
    """All declared columns in ONE aggregate pass over the table."""
    if not columns:
        return {}
    row = df.agg(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(c)
            for c in columns
        ]
    ).collect()[0]
    return {c: int(row[c] or 0) for c in columns}


def check_row_counts(
    tables: dict[str, DataFrame], minimums: dict[str, int] | None = None
) -> dict[str, tuple[int, bool]]:
    """check_gold.sh analog: every table exists and is non-empty (or meets a
    declared minimum)."""
    minimums = minimums or {}
    out: dict[str, tuple[int, bool]] = {}
    for name, df in tables.items():
        n = df.count()
        out[name] = (n, n >= max(1, minimums.get(name, 1)))
    return out
