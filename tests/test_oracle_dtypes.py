"""Oracle output-dtype lint: the class fix for the r3 driver hash mismatch.

DuckDB types plain and windowed ``SUM(BIGINT)`` as HUGEINT (int128); the
driver's dtype-sensitive value hash then diverges from Spark's LongType
even when every value is identical (``events_date_spine_ffill``, r3).
This test *binds* every registered oracle in DuckDB (no execution — the
relation's output types come from the binder) over the sf0.001 views and
asserts no output column lands in a banned family.  It would have caught
the r3 bug, and catches any future oracle that forgets a CAST.

The Spark-vs-oracle *family agreement* (decimal-vs-double etc.) is
enforced at compare time by scripts/drive_contract.py, which now fails a
query on dtype-family mismatch before hashing values.
"""

from __future__ import annotations

import duckdb
import pytest

from f1_lakehouse_spark.quality.dtype_lint import (
    banned_columns,
    dtype_family,
    family_mismatches,
)
from f1_lakehouse_spark.registry import all_oracles

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_no_oracle_emits_banned_dtypes(con):
    offenders = {}
    for name, sql in all_oracles().items():
        rel = con.sql(sql)  # binds + plans; .types needs no execution
        bad = banned_columns(dict(zip(rel.columns, map(str, rel.types))))
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting hash-unstable output dtypes (wrap in CAST): "
        f"{offenders}"
    )


def test_family_mapper_pins_the_policy():
    # the exact divergence class from r3
    assert dtype_family("HUGEINT") == "hugeint"
    assert dtype_family("UHUGEINT") == "hugeint"
    # integer widths are one family
    assert dtype_family("BIGINT") == dtype_family("INTEGER") == "int"
    assert dtype_family("bigint") == dtype_family("smallint")
    # decimal and double are NOT interchangeable across engines
    assert dtype_family("DECIMAL(38,4)") != dtype_family("DOUBLE")
    assert dtype_family("double") == dtype_family("FLOAT") == "float"
    assert dtype_family("VARCHAR") == dtype_family("string")
    assert dtype_family("TIMESTAMP WITH TIME ZONE") == "timestamp"


def test_family_mismatch_reporting():
    assert family_mismatches({"a": "bigint"}, {"a": "INTEGER"}) == []
    assert family_mismatches({"a": "double"}, {"a": "DECIMAL(18,2)"}) == [
        ("a", "float", "decimal")
    ]
    assert family_mismatches({"a": "bigint"}, {"a": "HUGEINT"}) == [
        ("a", "int", "hugeint")
    ]
    # a rename surfaces as two absent rows
    assert family_mismatches({"a": "bigint"}, {"b": "BIGINT"}) == [
        ("a", "int", "<absent>"),
        ("b", "<absent>", "int"),
    ]
