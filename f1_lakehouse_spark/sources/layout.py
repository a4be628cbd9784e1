"""Physical data-layout utilities: small-file compaction and Z-order
(Morton-curve) clustering.

Neither exists in the reference (its warehouse is a single DuckDB file —
reference ``transform/profiles/profiles.yml``), but both are table-stakes
for a 100 TB parquet lakehouse:

- **Compaction**: streaming/incremental ingest produces many small files;
  scan cost is dominated by file/footer overhead once files drop below
  ~100 MB. `compact_parquet` rewrites a directory to size-targeted files.
- **Z-ordering**: a single-column sort prunes scans on that column only.
  Interleaving the bits of several columns' quantile ranks yields a
  layout where EVERY interleaved column has narrow per-file min/max
  ranges, so parquet row-group/file skipping works on all of them —
  Delta/Iceberg `OPTIMIZE ZORDER BY`, engine-agnostic.

Scale notes: the quantile cut points come from `approxQuantile`
(sample-based, one pass); ranking is then a pure per-row expression —
no global sort, no window. The final `repartitionByRange(z)` is the one
shuffle, exactly what any sorted write costs.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ZORDER_BITS = 4  # quantile buckets per dimension = 2^bits


def compact_parquet(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """Rewrite a parquet directory into ceil(total_bytes / target) files.
    Returns the new file count. (On Delta/Iceberg this is OPTIMIZE
    bin-packing; on raw parquet a rewrite is the only portable form.)"""
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (same filesystem)
    bak = path.rstrip("/") + "__old"
    os.rename(path, bak)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(bak)
    return n_files


def _bucket_expr(col: str, cuts: list[float]) -> Column:
    """Quantile bucket of `col` given sampled cut points: a pure per-row
    expression (sum of comparisons), no window, no sort."""
    b: Column = F.lit(0)
    for c in cuts:
        b = b + F.when(F.col(col) > F.lit(c), 1).otherwise(0)
    return b


def zorder_value(df: DataFrame, cols: list[str], bits: int = ZORDER_BITS) -> Column:
    """Morton value over `cols`: each column is quantile-bucketed to `bits`
    bits (cuts via ONE multi-column approxQuantile pass), then the bucket
    bits are interleaved so the curve preserves locality in every
    dimension."""
    if bits * len(cols) > 62:
        raise ValueError(
            f"{bits} bits x {len(cols)} cols needs {bits * len(cols)} z-bits"
            " — exceeds the 62 usable bits of the signed-long accumulator"
        )
    n_buckets = 2**bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # one action for ALL columns: approxQuantile takes a column list and
    # sketches every column in a single scan (a per-column loop would run
    # len(cols) full passes over the data)
    all_cuts = df.approxQuantile(cols, probs, 0.01)
    buckets = [_bucket_expr(c, cuts) for c, cuts in zip(cols, all_cuts)]
    # long accumulator: an INT z goes negative at bit position 31 (sign
    # bit), range-partitioning those rows before all others
    z: Column = F.lit(0).cast("long")
    for bit in range(bits):
        for dim, b in enumerate(buckets):
            pos = bit * len(buckets) + dim
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)).cast("long"), pos
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Write `df` clustered along the Z-curve of `cols`: range-partition by
    the Morton value (one shuffle), sort within partitions, drop the helper
    column. Every col in `cols` gets tight per-file min/max stats."""
    z = zorder_value(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
