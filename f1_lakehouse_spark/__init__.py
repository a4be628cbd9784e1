"""f1_lakehouse_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference lakehouse (Shravan-Sulikeri/f1-lakehouse, studied read-only at
/root/reference): medallion bronze→silver→gold modeling, the full relational
operator inventory of SURVEY.md §2, catalog introspection, SQL guardrails,
plus large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) designed for 100 TB-scale Spark clusters.

Everything is expressed Spark-first: declarative DataFrame/SQL plans that
Catalyst + Tungsten optimize (predicate pushdown, column pruning, broadcast
joins, whole-stage codegen, AQE). Python UDFs appear only where built-in
operators genuinely cannot express the semantics, and then always as
Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"

from f1_lakehouse_spark.session import get_spark  # noqa: F401
