"""Subqueries — SURVEY.md §2.7.

The reference supported only FROM-clause subqueries/aliases
(``SubQueryResult`` pass-through, Microbase.scala:99-123, 720-722);
scalar/IN/EXISTS/correlated subqueries were absent. These run here
through the engine's SQL surface (``spark.sql`` over the registered
views) to exercise Catalyst's subquery decorrelation — the same text
a reference user would type into its REPL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rdbms_scala_spark.catalog import load_tables
from rdbms_scala_spark.registry import register

_TPCH = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    load_tables(spark, sf_dir, names=_TPCH)
    return spark.sql(text)


# NB: the inner per-customer sum is deliberately NOT rounded — feeding
# rounded 2-decimal values into AVG makes exact .xxxx5 ties common, and
# a tie rounds differently depending on each engine's summation order.
_FROM_SUBQUERY = """
    SELECT seg, round(avg(total_spend), 4) AS avg_spend
    FROM (
        SELECT c_mktsegment AS seg, o_custkey, sum(o_totalprice) AS total_spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_custkey
    ) per_customer
    GROUP BY seg
"""


@register("subquery_from", oracle=_FROM_SUBQUERY, tags=("Q1", "Q2"))
def subquery_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived table: aggregate over an aggregating subquery — the one
    subquery form the reference supported (Microbase.scala:99-123)."""
    return _sql(spark, sf_dir, _FROM_SUBQUERY)


_IN_SUBQUERY = """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
"""


@register("subquery_in", oracle=_IN_SUBQUERY, tags=("subquery", "semi"))
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN subquery -> left-semi join after decorrelation."""
    return _sql(spark, sf_dir, _IN_SUBQUERY)


_EXISTS_CORRELATED = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_quantity > 49)
"""


@register("subquery_exists_correlated", oracle=_EXISTS_CORRELATED, tags=("subquery", "correlated"))
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst decorrelates to a semi join; the
    reference had no decorrelation machinery at all."""
    return _sql(spark, sf_dir, _EXISTS_CORRELATED)


_SCALAR_SUBQUERY = """
    SELECT count(*) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
"""


@register("subquery_scalar", oracle=_SCALAR_SUBQUERY, tags=("subquery", "scalar"))
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in WHERE — evaluated once, broadcast as a
    literal into the filter."""
    return _sql(spark, sf_dir, _SCALAR_SUBQUERY)


_NOT_IN_SUBQUERY = """
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                            WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00')
      AND p_size > 40
"""


@register("subquery_not_in", oracle=_NOT_IN_SUBQUERY, tags=("subquery", "anti"))
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (null-aware anti join) — parts with no recent shipments."""
    return _sql(spark, sf_dir, _NOT_IN_SUBQUERY)


# The IDENTICAL text runs on Spark (4.x iterative-union execution) and
# DuckDB. Parent key = floor(custkey / 2) — an implicit binary
# hierarchy over the real customer keys (contiguous from 0, so every
# parent exists); floor() before the CAST because a bare double->int
# CAST truncates on Spark but rounds-to-nearest on DuckDB. Balances are summed as exact integer
# cents along the path.
_RECURSIVE_CTE = """
    WITH RECURSIVE walk AS (
        SELECT c_custkey AS start_key,
               c_custkey AS node,
               0 AS depth,
               CAST(round(c_acctbal * 100) AS BIGINT) AS path_cents
        FROM customer
        WHERE c_custkey BETWEEN 2 AND 101
        UNION ALL
        SELECT w.start_key,
               c.c_custkey,
               w.depth + 1,
               w.path_cents + CAST(round(c.c_acctbal * 100) AS BIGINT)
        FROM walk w
        JOIN customer c ON c.c_custkey = CAST(floor(w.node / 2) AS BIGINT)
        WHERE w.node > 1
    )
    SELECT start_key,
           CAST(max(depth) AS BIGINT) AS root_depth,
           round(CAST(max(path_cents) AS BIGINT) / 1e2, 2) AS path_acctbal
    FROM walk
    GROUP BY start_key
    ORDER BY start_key
"""


@register(
    "subquery_recursive_cte",
    oracle=_RECURSIVE_CTE,
    tags=("subquery", "recursive-cte", "hierarchy"),
)
def subquery_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4.x): ancestor walk up an implicit
    binary hierarchy over customer keys, accumulating the exact
    integer-cents balance along each path — the org-chart / BOM /
    folder-tree traversal class the reference (and pre-4.x Spark)
    could not express at all. The identical SQL text is the DuckDB
    oracle.

    Scale shape: Spark executes the recursion as an iterative
    union — each step joins only the live FRONTIER (rows that still
    have a parent) against the build side, so per-iteration work
    shrinks geometrically here (depth ≤ log2(max key)); this is the
    same frontier discipline as `dedup_connected_components`'s
    alternating-star loop, but expressed declaratively. Path sums
    are exact integer cents (house float policy).
    """
    return _sql(spark, sf_dir, _RECURSIVE_CTE)
