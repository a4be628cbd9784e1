"""Scalar-function library (SURVEY.md §2.8 F6–F12) as native Column exprs.

The reference implements these as Python/pandas post-processing or Jinja
macros (reference ``ingestion/src/ingestion/utils.py:21-31`` snake_case,
``fastf1_ingest.py:75`` slugify, ``dashboard/app.py:48-68`` ns→pretty /
datetime fallback, ``transform/macros/safe.sql:1-3`` bool_to_int,
``transform/macros/compat.sql:6`` safe_text). Here they are Catalyst
Column expressions — JVM-side, whole-stage-codegen'd, zero Python in the
hot path — so they run at full scan speed on a 1000-executor cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- F6: slugify (reference fastf1_ingest.py:5,75 via python-slugify) ---


def slugify(c: Column | str) -> Column:
    """Lowercase, collapse non-alphanumerics to '-', strip edge dashes."""
    c = F.col(c) if isinstance(c, str) else c
    slug = F.regexp_replace(F.lower(c), "[^a-z0-9]+", "-")
    return F.regexp_replace(slug, "(^-)|(-$)", "")


# --- F7: snake_case column-name normalizer (reference utils.py:21-26) ---

_SNAKE_RE = re.compile(r"[^a-z0-9]+")


def snake_case(name: str) -> str:
    """Driver-side: lowercase, non-alnum runs → '_', strip edge '_'."""
    return _SNAKE_RE.sub("_", name.lower()).strip("_")


def to_snake_df(df: DataFrame) -> DataFrame:
    """Rename every column to snake_case (reference utils.py:28-31)."""
    return df.toDF(*[snake_case(c) for c in df.columns])


# --- F8: ns → seconds (reference dashboard/app.py:56-58) ---


def ns_to_seconds(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c / F.lit(1e9)


# --- F9: ns → 'mm:ss.mmm' (reference dashboard/app.py:48-53) ---


def _int_div(c: Column, d: int) -> Column:
    """Exact integer division on LongType (truncating, nonnegative inputs).

    Spark's double-division + cast truncates while DuckDB's double→int cast
    rounds — and a float divide of a large long rounds through a 53-bit
    double. Exact decimal arithmetic sidesteps both.
    """
    return ((c - (c % F.lit(d))).cast("decimal(38,0)") / F.lit(d)).cast("long")


def ns_to_mmss(c: Column | str) -> Column:
    """Pretty-print an int64-nanosecond duration as mm:ss.mmm.

    Pure integer arithmetic so it stays inside codegen (no UDF).
    """
    c = (F.col(c) if isinstance(c, str) else c).cast("long")
    total_ms = _int_div(c, 1_000_000)
    minutes = _int_div(total_ms, 60_000)
    seconds = _int_div(total_ms % 60_000, 1000)
    millis = total_ms % 1000
    return F.format_string("%02d:%02d.%03d", minutes, seconds, millis)


# --- F10: datetime parse with numeric-ns fallback (dashboard/app.py:61-68) ---


def to_timestamp_with_ns_fallback(c: Column | str) -> Column:
    """try_to_timestamp(string), else interpret as int64 epoch-ns."""
    c = F.col(c) if isinstance(c, str) else c
    parsed = F.try_to_timestamp(c.cast("string"))
    as_ns = F.timestamp_micros((c.cast("long") / F.lit(1000)).cast("long"))
    return F.coalesce(parsed, as_ns)


# --- F11: strftime-style date format (dashboard/app.py:140) ---


def date_fmt(c: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.date_format(c, fmt)


# --- F12: zero-pad int (fastf1_ingest.py:19, 'round=%02d') ---


def zero_pad(c: Column | str, width: int = 2) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.lpad(c.cast("string"), width, "0")


# --- P9/A2 helper: boolean → int (transform/macros/safe.sql:1-3) ---


def bool_to_int(cond: Column) -> Column:
    return F.when(cond, F.lit(1)).otherwise(F.lit(0))


# --- F4: safe_text (transform/macros/compat.sql:6, with its quoting bug fixed) ---


def safe_text(c: Column | str) -> Column:
    """nullif(trim(cast(x as string)), '') — blank-to-null repair."""
    c = F.col(c) if isinstance(c, str) else c
    return F.nullif(F.trim(c.cast("string")), F.lit(""))


# --- Python UDTF (PySpark 4) — the UDF-checklist's table-function entry --------
# Row-at-a-time Python is the SLOW path (SURVEY §2.10: native Columns are
# the policy), so like w1_personal_best_applyinpandas this exists as a
# checklist demonstration with a native twin: the JVM chunker in
# pipeline/multimodal (sequence + substring) is the production shape, and
# the test proves the two produce identical rows.


def make_chunk_udtf(chunk_len: int = 100, stride: int = 50):
    """Build a text-chunking UDTF: one input row -> one row per overlapping
    chunk. Returns the decorated class ready for lateral use."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="start_off int, chunk string")
    class ChunkUDTF:
        def eval(self, text: str):  # noqa: ANN001
            if text is None:
                return
            n = len(text)
            last = max(n - chunk_len + 1, 1)
            for start in range(1, last + 1, stride):
                yield start, text[start - 1 : start - 1 + chunk_len]

    return ChunkUDTF
