"""Query registry: every implemented operator registers (name, fn, oracle).

``fn(spark, sf_dir) -> DataFrame`` is the Spark implementation;
``oracle`` is the equivalent ANSI SQL that DuckDB runs on the same parquet
tables (views pre-registered by the harness: region nation customer supplier
part orders lineitem events documents embeddings). The driver's correctness
gate compares row-count + schema + order-insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- window/topk orderings are TOTAL (unique tiebreakers) so results are
  deterministic under parallel execution;
- double-typed SUMs go through DECIMAL so the value is order-independent.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every operator module so registrations run."""
    global _LOADED
    if _LOADED:
        return
    import f1_lakehouse_spark.operators  # noqa: F401
    from f1_lakehouse_spark.pipeline import (  # noqa: F401
        dedup,
        multimodal,
        similarity,
        text,
    )

    _LOADED = True
