from f1_lakehouse_spark.functions.expressions import (  # noqa: F401
    bool_to_int,
    date_fmt,
    ns_to_mmss,
    ns_to_seconds,
    safe_text,
    slugify,
    snake_case,
    to_snake_df,
    zero_pad,
)
