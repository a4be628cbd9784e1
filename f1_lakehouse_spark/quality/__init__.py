from f1_lakehouse_spark.quality.checks import (  # noqa: F401
    check_not_null,
    check_row_counts,
    run_not_null_suite,
)
