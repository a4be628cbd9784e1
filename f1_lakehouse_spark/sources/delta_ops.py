"""Delta Lake table operations — the ACID branch of the SCD2/upsert layer.

BASELINE.json's north star names "Spark SQL + Delta/Iceberg table
operations"; this module is that branch as real code, gated on
:func:`f1_lakehouse_spark.sources.formats.delta_available` (a
``Class.forName`` probe). In this sandbox the Delta jar is absent, so the
equivalence tests skip — wherever the jar exists they run live and assert
each Delta op lands on exactly the rows the parquet emulation
(``sources/scd2.py``) produces.

Semantics parity (the contract the tests pin):

- :func:`delta_merge_upsert` ≡ ``scd2.merge_upsert`` — updates win on key
  collision, unmatched rows insert. On Delta this is ONE ``MERGE INTO``
  (file-level skipping + transactional commit) instead of the emulation's
  full-table rewrite: at 100 TB the merge touches only files whose
  min/max key range intersects the change set, which is the entire point
  of adopting a table format.
- :func:`delta_scd2_merge` ≡ ``scd2.scd2_apply`` — the standard staged
  two-action MERGE (Databricks SCD2 pattern): a change row for an
  existing key stages twice — once with a null merge key (always-insert
  of the new open version) and once keyed (closes the superseded open
  row by setting ``valid_to``); unchanged keys match nothing.
- :func:`delta_time_travel` / :func:`delta_history` — version-pinned
  reads and the commit log, the audit surface parquet simply lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_lakehouse_spark.sources.formats import delta_available
from f1_lakehouse_spark.sources.scd2 import OPEN_END


class DeltaUnavailableError(RuntimeError):
    """Raised when a Delta op is requested without the Delta jar on the
    session classpath; callers fall back to the ``sources/scd2`` parquet
    emulation (identical row semantics, full-rebuild writes)."""


def _require_delta(spark: SparkSession):
    if not delta_available(spark):
        raise DeltaUnavailableError(
            "Delta jar not on the classpath - use sources/scd2.py "
            "(merge_upsert / scd2_apply) for identical row semantics on parquet"
        )
    from delta.tables import DeltaTable  # noqa: PLC0415

    return DeltaTable


def delta_write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.format("delta").mode(mode).save(path)


def delta_merge_upsert(
    spark: SparkSession, path: str, updates: DataFrame, key: str
) -> None:
    """MERGE INTO: rows from ``updates`` win on key collision; others
    insert. Row-for-row the result equals
    ``scd2.merge_upsert(current, updates, key)`` materialized to the same
    path — but as one transactional, file-skipping merge."""
    DeltaTable = _require_delta(spark)
    tgt = DeltaTable.forPath(spark, path)
    (
        tgt.alias("t")
        .merge(updates.alias("u"), f"t.{key} = u.{key}")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def delta_scd2_merge(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    tracked_cols: list[str],
    effective_ts,
) -> None:
    """SCD2 as a single staged MERGE — semantics identical to
    ``scd2.scd2_apply`` (new version only when a tracked column actually
    differs; superseded open row closes at ``effective_ts``; brand-new
    keys open their first version).

    Staging trick: every insert-worthy change row appears with
    ``_merge_key = NULL`` (matches nothing → always inserts the new open
    version) and changed-key rows ALSO appear keyed (match the open row →
    close it). One shuffle of the change set, one transactional commit.
    """
    DeltaTable = _require_delta(spark)
    tgt = DeltaTable.forPath(spark, path)
    current = tgt.toDF()

    open_rows = current.filter(
        F.col("valid_to") == F.lit(OPEN_END).cast("timestamp")
    )
    cmp = open_rows.alias("o").join(changes.alias("c"), key, "inner")
    differs = None
    for c in tracked_cols:
        d = ~(F.col(f"o.{c}").eqNullSafe(F.col(f"c.{c}")))
        differs = d if differs is None else (differs | d)
    changed_keys = cmp.filter(differs).select(key).distinct()
    new_keys = changes.join(open_rows.select(key), key, "left_anti").select(key)
    insert_keys = changed_keys.unionByName(new_keys).distinct()
    inserts = changes.join(F.broadcast(insert_keys), key)

    staged = (
        # keyed copies: close the superseded open rows (changed keys only)
        changes.join(F.broadcast(changed_keys), key)
        .withColumn("_merge_key", F.col(key))
        .unionByName(
            # null-keyed copies: always-insert the new open versions
            inserts.withColumn(
                "_merge_key", F.lit(None).cast(changes.schema[key].dataType)
            )
        )
    )
    (
        tgt.alias("t")
        .merge(
            staged.alias("s"),
            f"t.{key} = s._merge_key AND t.valid_to = '{OPEN_END}'",
        )
        .whenMatchedUpdate(set={"valid_to": effective_ts.cast("timestamp")})
        .whenNotMatchedInsert(
            values={
                key: F.col(f"s.{key}"),
                **{c: F.col(f"s.{c}") for c in tracked_cols},
                "valid_from": effective_ts.cast("timestamp"),
                "valid_to": F.lit(OPEN_END).cast("timestamp"),
            }
        )
        .execute()
    )


def delta_time_travel(
    spark: SparkSession, path: str, version: int
) -> DataFrame:
    """Read the table as of a committed version (audit / reproducible
    training snapshots); parquet has no equivalent — the pointer-versioned
    gold layout in ``streaming/ingest`` keeps only a bounded window."""
    _require_delta(spark)
    return spark.read.format("delta").option("versionAsOf", version).load(path)


def delta_history(spark: SparkSession, path: str) -> DataFrame:
    """The commit log: one row per transaction (version, timestamp,
    operation, operationMetrics)."""
    DeltaTable = _require_delta(spark)
    return DeltaTable.forPath(spark, path).history()


# --- Iceberg twins -------------------------------------------------------------------
# Same gated pattern as the Delta branch: real code wherever the runtime
# jar exists, clean error + parquet-emulation fallback here. Iceberg's
# MERGE INTO is SQL-level (no DeltaTable-style API), so the upsert twin
# issues the statement against a registered table.


class IcebergUnavailableError(RuntimeError):
    """Raised when an Iceberg op is requested without the runtime jar on
    the session classpath; callers fall back to ``sources/scd2.py``."""


def _require_iceberg(spark: SparkSession) -> None:
    from f1_lakehouse_spark.sources.formats import iceberg_available  # noqa: PLC0415

    if not iceberg_available(spark):
        raise IcebergUnavailableError(
            "Iceberg runtime jar not on the classpath - use sources/scd2.py "
            "(merge_upsert / scd2_apply) for identical row semantics on parquet"
        )


def iceberg_merge_upsert(
    spark: SparkSession, table: str, updates: DataFrame, key: str
) -> None:
    """MERGE INTO an Iceberg TABLE (name, not path — Iceberg merges are
    SQL-level): updates win on key collision, unmatched rows insert —
    row-for-row ``scd2.merge_upsert`` semantics."""
    _require_iceberg(spark)
    updates.createOrReplaceTempView("_iceberg_updates")
    spark.sql(
        f"""
        MERGE INTO {table} t
        USING _iceberg_updates u
        ON t.{key} = u.{key}
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )


def iceberg_time_travel(
    spark: SparkSession, table: str, snapshot_id: int
) -> DataFrame:
    """Snapshot-pinned read (audit / reproducible training snapshots)."""
    _require_iceberg(spark)
    return (
        spark.read.option("snapshot-id", snapshot_id).format("iceberg").load(table)
    )
