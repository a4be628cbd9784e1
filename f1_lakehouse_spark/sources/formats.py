"""Multi-format sources/sinks beyond parquet.

The reference's only storage format is parquet (+ a DuckDB file warehouse);
an engine users can switch to needs the interchange formats too. All
readers take explicit schemas (schema inference is a full extra pass at
100 TB — never in production paths). Delta/Iceberg/Hudi connectors need
jars not present in this environment and are stubbed behind import-tries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CSV_OPTIONS = {"header": "true", "timestampFormat": "yyyy-MM-dd HH:mm:ss"}


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).options(**CSV_OPTIONS).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.options(**CSV_OPTIONS).schema(schema).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def delta_available(spark: SparkSession) -> bool:
    """Delta Lake needs its jar + catalog extensions; report availability
    instead of failing at import time."""
    try:
        # py4j attribute access NEVER raises on a missing class (it returns
        # a JavaPackage), so probing the attribute reports True everywhere;
        # Class.forName actually resolves the class or throws
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:
        return False


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-tolerant scan: ``mergeSchema=true`` reconciles the
    per-file footers into the union schema, so files written BEFORE a
    column existed surface it as NULL — additive lakehouse evolution
    without a rewrite. Scale note: footer merging costs one distributed
    footer-read job at planning time (not a data scan); at very large file
    counts pin the schema in the catalog instead and keep this for
    discovery/backfill reads."""
    return spark.read.option("mergeSchema", "true").parquet(path)


CORRUPT_COL = "_corrupt_record"


def read_json_tolerant(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """PERMISSIVE JSON read for dirty 100 TB feeds: malformed lines land
    whole in ``_corrupt_record`` instead of failing the job (FAILFAST
    would kill a day-long ingest for one bad line; DROPMALFORMED silently
    loses data — quarantining is the production posture). Pair with
    :func:`split_quarantine` to route rows."""
    # StructType.add MUTATES self (and returns it): build a copy so the
    # caller's schema object does not permanently grow a corrupt-record
    # field (and a second tolerant read does not produce a duplicate column)
    with_corrupt = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    return (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(clean rows without the corrupt column, quarantined raw lines, and
    the CACHED parsed frame — unpersist it once both routes are written).

    The parsed frame is cached first: since Spark 2.3, predicates that
    reference only the internal corrupt-record column of a raw JSON/CSV
    scan are disallowed (the parser would need a second pass) — caching
    materializes the parse once, which is also what you want before
    routing the same scan two ways. The cached handle is returned so the
    caller can release executor storage (``cached.unpersist()``) after
    routing — on a large dirty feed a session-lifetime pin is a leak."""
    from pyspark.sql import functions as F

    cached = df.cache()
    clean = cached.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = cached.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad, cached


def iceberg_available(spark: SparkSession) -> bool:
    """Iceberg twin of :func:`delta_available` — a real ``Class.forName``
    probe for the Spark runtime jar (py4j attribute access never raises on
    a missing class, so probing attributes reports True everywhere)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False
