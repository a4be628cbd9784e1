"""Cross-engine output-dtype policy for the DuckDB oracle gate.

The driver's value hash is dtype-sensitive, while the local comparator
historically canonicalized through ``str()`` — so an oracle whose output
schema diverges from the Spark schema in *type* (not value) could pass
locally and fail on the driver.  Round 3 hit exactly one instance:
DuckDB types a windowed ``SUM(BIGINT)`` as HUGEINT (int128) where Spark
returns LongType (``events_date_spine_ffill``).

Policy (pinned here, enforced by ``tests/test_oracle_dtypes.py`` and by
``scripts/drive_contract.py`` at compare time):

- **HUGEINT / UHUGEINT are banned** in oracle output schemas.  DuckDB
  produces them from plain and windowed ``SUM`` over BIGINT and from
  ``PRODUCT``-ish folds; every such column must be wrapped in
  ``CAST(... AS BIGINT)`` (when the Spark side is long) or
  ``CAST(... AS DOUBLE)`` / decimal (when it is not).
- **DECIMAL vs DOUBLE must agree across engines.**  A Spark double
  column with a DECIMAL oracle twin (or vice versa) hashes differently
  even when every value prints the same, so the comparator treats the
  type *family* as part of the schema.
- Integer widths (int8..int64) are one family: both engines hash them
  through 64-bit lanes, and COUNT/SUM width differences below 64 bits
  are benign.
"""

from __future__ import annotations

# Ordered: first match wins (hugeint before the generic "int" catch-all).
_FAMILY_RULES: tuple[tuple[str, str], ...] = (
    ("hugeint", "hugeint"),  # includes uhugeint
    ("decimal", "decimal"),
    ("tinyint", "int"),
    ("smallint", "int"),
    ("bigint", "int"),
    ("integer", "int"),
    ("int", "int"),
    ("double", "float"),
    ("float", "float"),
    ("real", "float"),
    ("bool", "bool"),
    ("timestamp", "timestamp"),
    ("date", "date"),
    ("interval", "interval"),
    ("varchar", "string"),
    ("string", "string"),
    ("char", "string"),
    ("binary", "binary"),
    ("blob", "binary"),
    ("array", "array"),
    ("list", "array"),
    ("struct", "struct"),
    ("map", "map"),
)

#: Families a dtype-sensitive hash can diverge on even when values match.
BANNED_FAMILIES = frozenset({"hugeint"})


def dtype_family(type_name: str) -> str:
    """Collapse a Spark or DuckDB type name to a cross-engine family."""
    t = str(type_name).lower()
    for needle, fam in _FAMILY_RULES:
        if needle in t:
            return fam
    return t


def family_mismatches(
    spark_dtypes: dict[str, str], oracle_dtypes: dict[str, str]
) -> list[tuple[str, str, str]]:
    """(col, spark_family, oracle_family) rows where the families differ.

    Missing columns are reported with family ``"<absent>"`` so a rename
    shows up here too (the schema check upstream normally catches it).
    """
    out: list[tuple[str, str, str]] = []
    for col in sorted(set(spark_dtypes) | set(oracle_dtypes)):
        sf = dtype_family(spark_dtypes[col]) if col in spark_dtypes else "<absent>"
        of = dtype_family(oracle_dtypes[col]) if col in oracle_dtypes else "<absent>"
        if sf != of:
            out.append((col, sf, of))
    return out


def banned_columns(oracle_dtypes: dict[str, str]) -> list[tuple[str, str]]:
    """(col, type) rows whose family is banned from oracle output schemas."""
    return [
        (col, str(t))
        for col, t in sorted(oracle_dtypes.items())
        if dtype_family(t) in BANNED_FAMILIES
    ]
