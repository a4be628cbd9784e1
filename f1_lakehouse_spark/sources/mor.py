"""Merge-on-read (MoR) equality deletes on plain parquet (r10).

The r9 row-level delete (sources/parquet_io.delete_rows_partition_scoped)
is COPY-ON-WRITE: the affected partitions are rewritten at delete time —
right when deletes are rare and reads are hot. Merge-on-read is the other
side of that trade (Iceberg v2 equality-delete files, Delta deletion
vectors): a delete commits as a tiny KEY FILE, the base data files are
never touched, and every reader applies the accumulated delete keys as an
anti-join until a compaction folds them in. At 100 TB a GDPR delete of
one user cohort is then an O(matched-keys) write instead of a
partition rewrite, at the price of a per-read anti-join whose build side
is the (bounded) delete-key set.

Layout::

    table_dir/base/*.parquet                 # immutable data files
    table_dir/deletes/d{seq:010d}.parquet    # one equality-delete key file
                                             #   per delete commit

Semantics (Iceberg equality deletes): a delete file's keys suppress EVERY
base row with a matching key, regardless of which commit wrote the row —
correct here because the base is immutable between compactions.
Compaction (:func:`mor_compact`) materializes the merged view into a new
base via a staged sibling directory + atomic swap and drops the delete
files; readers see either the old (base + deletes) view or the new
compacted base, never a half state.

Reference parity: the reference has no delete path at all (bronze is
append-only, silver/gold are full rebuilds —
/root/reference/ingestion/src/ingestion/utils.py:36-44); both delete
strategies are the lakehouse capabilities a 100 TB deployment adds on
top. Delta/Iceberg equivalent: ``DELETE FROM t WHERE ...`` with
merge-on-read table properties.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_DIR = "base"
DELETES_DIR = "deletes"


def mor_write_base(df: DataFrame, table_dir: str) -> None:
    """Materialize the immutable base files."""
    df.write.mode("overwrite").parquet(os.path.join(table_dir, BASE_DIR))


def _delete_files(table_dir: str) -> list[str]:
    ddir = os.path.join(table_dir, DELETES_DIR)
    if not os.path.isdir(ddir):
        return []
    return sorted(
        os.path.join(ddir, f)
        for f in os.listdir(ddir)
        if f.endswith(".parquet") and f.startswith("d")
    )


def mor_delete(
    spark: SparkSession, table_dir: str, key_col: str, predicate
) -> int:
    """Commit an equality delete: write the DISTINCT keys of the rows the
    predicate selects (evaluated on the current merged view, so a key
    already deleted is not re-recorded) as one new delete file. The base
    files are NOT touched — that is the whole point. Returns the number
    of keys committed. NULL predicate follows SQL DELETE tri-state
    semantics: only TRUE deletes."""
    matched = (
        mor_read(spark, table_dir, key_col)
        .filter(F.coalesce(predicate, F.lit(False)))
        .select(key_col)
        .distinct()
    )
    seq = len(_delete_files(table_dir))
    ddir = os.path.join(table_dir, DELETES_DIR)
    target = os.path.join(ddir, f"d{seq:010d}.parquet")
    # stage + rename so a reader never lists a half-written delete file
    staging = os.path.join(table_dir, f"_staging_d{seq:010d}")
    matched.coalesce(1).write.mode("overwrite").parquet(staging)
    os.makedirs(ddir, exist_ok=True)
    n = spark.read.parquet(staging).count()
    part = next(
        f for f in os.listdir(staging) if f.endswith(".parquet")
    )
    os.replace(os.path.join(staging, part), target)
    shutil.rmtree(staging, ignore_errors=True)
    return n


def mor_read(spark: SparkSession, table_dir: str, key_col: str) -> DataFrame:
    """The merged view: base rows whose key appears in NO delete file.
    The anti-join's build side is the union of delete-key files — bounded
    by what has been deleted since the last compaction, so Spark's
    threshold/AQE broadcasts it without any explicit hint (plan-lint
    rule: never hint a broadcast on an unbounded side)."""
    base = spark.read.parquet(os.path.join(table_dir, BASE_DIR))
    files = _delete_files(table_dir)
    if not files:
        return base
    keys = spark.read.parquet(*files).select(key_col).distinct()
    return base.join(keys, key_col, "left_anti")


def mor_compact(spark: SparkSession, table_dir: str, key_col: str) -> None:
    """Fold the delete files into a new base: materialize the merged view
    into a staged sibling dir, atomically swap it in as the base, then
    drop the delete files. Reader interleavings see either (old base +
    deletes) or the new base — both the same rows; the swap is the same
    staged-rename discipline as every other publish in this package."""
    merged = mor_read(spark, table_dir, key_col)
    staging = os.path.join(table_dir, BASE_DIR + ".staging")
    merged.write.mode("overwrite").parquet(staging)
    old = os.path.join(table_dir, BASE_DIR + ".old")
    base = os.path.join(table_dir, BASE_DIR)
    shutil.rmtree(old, ignore_errors=True)  # stale leftover from a crash
    os.replace(base, old)
    os.replace(staging, base)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(os.path.join(table_dir, DELETES_DIR), ignore_errors=True)
