from f1_lakehouse_spark.sources.parquet_io import (  # noqa: F401
    partition_exists,
    read_partitioned,
    write_partitioned,
    write_partitioned_idempotent,
)
