from f1_lakehouse_spark.plans.registry import Model, ModelRegistry  # noqa: F401
