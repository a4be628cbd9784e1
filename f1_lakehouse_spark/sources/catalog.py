"""Catalog introspection + schema-doc rendering (SURVEY.md §2.1 S8, A12).

The reference queries ``information_schema`` to list schemas/tables/columns
and renders a ``schema.table(col type, ...)`` doc string for the LLM prompt
(reference ``dashboard/app.py:22-35``, ``ai/rag_api/app.py:63-90``,
``ai/rag_api/main.py:18-41``). Spark's catalog API provides the same
surface without SQL-dialect coupling.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class ColumnInfo:
    name: str
    data_type: str


@dataclass
class TableInfo:
    database: str
    table: str
    columns: list[ColumnInfo]

    @property
    def qualified(self) -> str:
        return f"{self.database}.{self.table}" if self.database else self.table


def list_tables(spark: SparkSession, database: str | None = None) -> list[TableInfo]:
    dbs = [database] if database else [d.name for d in spark.catalog.listDatabases()]
    out: list[TableInfo] = []
    for db in dbs:
        for t in spark.catalog.listTables(db):
            if t.tableType == "TEMPORARY" and db != dbs[0]:
                continue  # temp views are global; list them once
            qualified = f"{t.namespace[0]}.{t.name}" if t.namespace else t.name
            cols = [
                ColumnInfo(c.name, c.dataType)
                for c in spark.catalog.listColumns(qualified)
            ]
            out.append(TableInfo(t.namespace[0] if t.namespace else "", t.name, cols))
    return out


def schema_doc(spark: SparkSession, databases: list[str] | None = None) -> str:
    """Render the reference's LLM schema doc: one line per table,
    ``db.table(col type, col type, ...)``, deterministically ordered."""
    infos: list[TableInfo] = []
    for db in databases or [d.name for d in spark.catalog.listDatabases()]:
        infos.extend(list_tables(spark, db))
    lines = []
    for ti in sorted(infos, key=lambda x: x.qualified):
        cols = ", ".join(f"{c.name} {c.data_type}" for c in ti.columns)
        lines.append(f"{ti.qualified}({cols})")
    return "\n".join(lines)


def table_exists(spark: SparkSession, name: str) -> bool:
    """O5-style existence probe via the catalog (no data scan)."""
    return spark.catalog.tableExists(name)


def resolve_schema_prefix(spark: SparkSession, candidates: list[str]) -> str | None:
    """The reference probes `main_silver` vs `silver` prefixes
    (dashboard/app.py:22-35); we control naming so this usually returns the
    first hit."""
    existing = {d.name for d in spark.catalog.listDatabases()}
    for c in candidates:
        if c in existing:
            return c
    return None
