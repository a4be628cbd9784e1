"""The medallion DAG over the synthetic tables — bronze parquet → silver
typed/renamed → gold summaries, mirroring the reference's model tree
(laps/results/weather → driver_session_summary → team_event_summary,
reference ``transform/target/manifest.json`` dependency graph).

Silver models apply the reference's silver recipe
(``transform/models/silver/laps.sql``): keep the open schema, re-type key
columns, snake-case names. Gold models are the flagship shapes from
``operators.gold``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_lakehouse_spark.functions.expressions import to_snake_df
from f1_lakehouse_spark.plans.registry import ModelRegistry
from f1_lakehouse_spark.tables import load_table


def build_registry(spark: SparkSession, sf_dir: str) -> ModelRegistry:
    reg = ModelRegistry(source_loader=lambda name: load_table(spark, sf_dir, name))

    @reg.model(
        "silver.lineitem_typed",
        deps=("source:lineitem",),
        not_null=("l_orderkey", "l_linenumber", "ship_year"),
        description="typed/renamed lineitem: open schema + derived keys",
    )
    def silver_lineitem(inputs: dict[str, DataFrame]) -> DataFrame:
        li = to_snake_df(inputs["lineitem"])
        return li.withColumns(
            {
                "ship_year": F.year("l_shipdate").cast("int"),
                "ship_month": F.month("l_shipdate").cast("int"),
            }
        )

    @reg.model(
        "silver.orders_typed",
        deps=("source:orders",),
        not_null=("o_orderkey", "order_year"),
        description="typed/renamed orders",
    )
    def silver_orders(inputs: dict[str, DataFrame]) -> DataFrame:
        o = to_snake_df(inputs["orders"])
        return o.withColumns(
            {
                "order_year": F.year("o_orderdate").cast("int"),
                "order_month": F.month("o_orderdate").cast("int"),
            }
        )

    @reg.model(
        "gold.supplier_summary",
        deps=("silver.lineitem_typed",),
        not_null=("ship_year", "l_returnflag", "l_linestatus", "l_suppkey"),
        description="flagship driver_session_summary shape over silver",
    )
    def gold_supplier_summary(inputs: dict[str, DataFrame]) -> DataFrame:
        li = inputs["silver.lineitem_typed"]
        keys = ["ship_year", "l_returnflag", "l_linestatus", "l_suppkey"]
        net_price = F.when(
            F.col("l_discount") > 0,
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
        )
        timed = li.withColumn("net_price", net_price).filter(
            F.col("net_price").isNotNull()
        )
        w = Window.partitionBy(*keys).orderBy(
            F.col("net_price").asc_nulls_last(), "l_orderkey", "l_linenumber"
        )
        pb = (
            timed.withColumn("rn", F.row_number().over(w))
            .groupBy(*keys)
            .agg(F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("best_price_lines"))
        )
        agg = timed.groupBy(*keys).agg(
            F.count("*").alias("lines_total"),
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias(
                "discounted_lines"
            ),
            F.sum(F.when(F.col("l_tax") > 0, 1).otherwise(0)).alias("taxed_lines"),
            F.min("net_price").alias("best_price"),
        )
        return agg.join(pb, on=keys, how="left").select(
            *keys,
            "lines_total",
            "discounted_lines",
            "taxed_lines",
            "best_price",
            F.coalesce(F.col("best_price_lines"), F.lit(0)).alias("best_price_lines"),
        )

    @reg.model(
        "gold.flag_summary",
        deps=("gold.supplier_summary",),
        not_null=("ship_year", "l_returnflag"),
        description="team_event_summary shape: re-aggregation of gold",
    )
    def gold_flag_summary(inputs: dict[str, DataFrame]) -> DataFrame:
        d = inputs["gold.supplier_summary"]
        return (
            d.filter(F.col("l_returnflag").isin("A", "R"))
            .groupBy("ship_year", "l_returnflag")
            .agg(
                F.sum("lines_total").alias("lines_total"),
                F.sum("discounted_lines").alias("discounted_lines"),
                F.sum("taxed_lines").alias("taxed_lines"),
                F.min("best_price").alias("best_price"),
                F.count("*").alias("supplier_groups"),
            )
        )

    return reg
