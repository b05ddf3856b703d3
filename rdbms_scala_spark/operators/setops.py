"""Set operations — SURVEY.md §2.6.

The reference supported only UNION ALL (iterator concatenation,
Microbase.scala:289-295); bare UNION parsed to Distinct(Union) and
crashed (§8 quirk 6). Here: the full set-op surface with correct
dedup semantics matching the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.registry import register


@register(
    "union_all",
    oracle="""
    SELECT c_custkey AS key, c_name AS name, 'customer' AS side
    FROM customer WHERE c_nationkey = 3
    UNION ALL
    SELECT s_suppkey AS key, s_name AS name, 'supplier' AS side
    FROM supplier WHERE s_nationkey = 3
    """,
    tags=("U1",),
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — no dedup, pure concatenation of partitions (no
    shuffle at all in Spark: union is a metadata operation)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 3)
        .select(F.col("c_custkey").alias("key"), F.col("c_name").alias("name"), F.lit("customer").alias("side"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 3)
        .select(F.col("s_suppkey").alias("key"), F.col("s_name").alias("name"), F.lit("supplier").alias("side"))
    )
    return cust.union(supp)


@register(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop", "distinct"),
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare UNION (dedup) — the case that crashed the reference."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


@register(
    "intersect_keys",
    oracle="""
    SELECT c_custkey AS key FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT o_custkey AS key FROM orders WHERE o_totalprice > 300000
    """,
    tags=("setop", "intersect"),
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — high-balance customers who
    also placed a big order."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("key"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("key"))
    )
    return cust.intersect(orders)


@register(
    "except_keys",
    oracle="""
    SELECT c_custkey AS key FROM customer
    EXCEPT
    SELECT o_custkey AS key FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
    tags=("setop", "except"),
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — customers with no RECENT order.

    The subtracted side is date-filtered: the synthetic corpus gives
    every customer at least one order, so an unfiltered EXCEPT matches
    the oracle on zero rows and certifies nothing (round-4 verdict
    flagged that row as vacuous). Filtering orders to 1998+ leaves a
    non-empty lapsed-customer set at every gate scale.
    """
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("key"))
    )
    return cust.subtract(orders)


@register(
    "union_by_name",
    oracle="""
    SELECT key, round(amount, 2) AS amount, kind
    FROM (
        SELECT o_orderkey AS key, o_totalprice AS amount, 'order' AS kind
        FROM orders WHERE o_orderkey <= 100
        UNION ALL BY NAME
        SELECT 'customer' AS kind, c_acctbal AS amount, c_custkey AS key
        FROM customer WHERE c_custkey <= 100
    )
    ORDER BY kind, key
    """,
    tags=("setop", "union", "by-name"),
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-independent UNION (``unionByName`` / DuckDB's
    ``UNION ALL BY NAME``): the second input's columns arrive in a
    DIFFERENT order and are aligned by column name, not position —
    the schema-evolution-safe way to append heterogeneous batches
    (positional UNION would silently pair key with kind here; the
    reference's UNION was positional-only, Microbase.scala).
    Map-only: no shuffle beyond the final presentation sort."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 100)
        .select(
            F.col("o_orderkey").alias("key"),
            F.col("o_totalprice").alias("amount"),
            F.lit("order").alias("kind"),
        )
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(
            F.lit("customer").alias("kind"),
            F.col("c_acctbal").alias("amount"),
            F.col("c_custkey").cast("long").alias("key"),
        )
    )
    return (
        orders.unionByName(cust)
        .select("key", F.round("amount", 2).alias("amount"), "kind")
        .orderBy("kind", "key")
    )
