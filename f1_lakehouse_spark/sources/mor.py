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

Layout — one GENERATION directory per compaction epoch, selected by a
pointer file (the same atomic-swap discipline as the MVCC/manifest
layers; two chained directory renames are NOT atomic and would leave a
window with no base at all)::

    table_dir/_BASE                          # names the live generation
    table_dir/g{gen}/base/*.parquet          # immutable data files
    table_dir/g{gen}/deletes/d{seq}.parquet  # one key file per delete

Delete files belong to their generation: a reader holding the old
pointer mid-compaction still sees (old base + old deletes) — the same
rows as the new compacted base — and the displaced generation survives
one compaction cycle before being pruned, exactly like every other
versioned layout in this package.

Semantics (Iceberg equality deletes): a delete file's keys suppress EVERY
base row with a matching key, regardless of which commit wrote the row —
correct here because a generation's base is immutable.

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

POINTER = "_BASE"


def _gen_name(gen: int) -> str:
    return f"g{gen:010d}"


def _live_gen(table_dir: str) -> int:
    with open(os.path.join(table_dir, POINTER)) as f:
        return int(f.read().strip().lstrip("g"))


def _swap_pointer(table_dir: str, gen: int) -> None:
    ptr = os.path.join(table_dir, POINTER)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(_gen_name(gen))
    os.replace(tmp, ptr)


def base_dir(table_dir: str) -> str:
    """The live generation's base directory (for file-level audits)."""
    return os.path.join(table_dir, _gen_name(_live_gen(table_dir)), "base")


def mor_write_base(df: DataFrame, table_dir: str) -> None:
    """Materialize generation 0 and point the table at it."""
    os.makedirs(table_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(
        os.path.join(table_dir, _gen_name(0), "base")
    )
    _swap_pointer(table_dir, 0)


def _delete_files(table_dir: str, gen: int) -> list[str]:
    ddir = os.path.join(table_dir, _gen_name(gen), "deletes")
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
    already deleted is not re-recorded) as one new delete file in the
    live generation. The base files are NOT touched — that is the whole
    point; the commit itself is one atomic file rename. Returns the
    number of keys committed. NULL predicate follows SQL DELETE tri-state
    semantics: only TRUE deletes."""
    gen = _live_gen(table_dir)
    matched = (
        mor_read(spark, table_dir, key_col)
        .filter(F.coalesce(predicate, F.lit(False)))
        .select(key_col)
        .distinct()
    )
    seq = len(_delete_files(table_dir, gen))
    ddir = os.path.join(table_dir, _gen_name(gen), "deletes")
    target = os.path.join(ddir, f"d{seq:010d}.parquet")
    # stage + rename so a reader never lists a half-written delete file
    staging = os.path.join(table_dir, f"_staging_d{gen}_{seq:010d}")
    matched.coalesce(1).write.mode("overwrite").parquet(staging)
    os.makedirs(ddir, exist_ok=True)
    n = spark.read.parquet(staging).count()
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(os.path.join(staging, part), target)
    shutil.rmtree(staging, ignore_errors=True)
    return n


def mor_read(
    spark: SparkSession, table_dir: str, key_col: str, gen: int | None = None
) -> DataFrame:
    """The merged view: base rows whose key appears in NO delete file of
    the (live, or explicitly pinned) generation. The anti-join's build
    side is the union of delete-key files — bounded by what has been
    deleted since the last compaction, so Spark's threshold/AQE
    broadcasts it without any explicit hint (plan-lint rule: never hint
    a broadcast on an unbounded side)."""
    if gen is None:
        gen = _live_gen(table_dir)
    base = spark.read.parquet(os.path.join(table_dir, _gen_name(gen), "base"))
    files = _delete_files(table_dir, gen)
    if not files:
        return base
    keys = spark.read.parquet(*files).select(key_col).distinct()
    return base.join(keys, key_col, "left_anti")


def mor_compact(spark: SparkSession, table_dir: str, key_col: str) -> None:
    """Fold the live generation's delete files into the next generation:
    materialize the merged view into ``g{gen+1}/base``, atomically swap
    the pointer, and prune generations older than the displaced one. A
    reader holding the old pointer mid-scan still has its full
    generation (base + deletes) for one compaction cycle; readers
    resolving the pointer see either the old or the new generation —
    both the same rows, never a half state."""
    gen = _live_gen(table_dir)
    merged = mor_read(spark, table_dir, key_col, gen=gen)
    merged.write.mode("overwrite").parquet(
        os.path.join(table_dir, _gen_name(gen + 1), "base")
    )
    _swap_pointer(table_dir, gen + 1)
    for entry in os.listdir(table_dir):
        if (
            entry.startswith("g")
            and entry[1:].isdigit()
            and int(entry[1:]) < gen
        ):
            shutil.rmtree(os.path.join(table_dir, entry), ignore_errors=True)
