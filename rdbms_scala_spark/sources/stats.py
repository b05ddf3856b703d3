"""ANALYZE-style table statistics — the catalog-maintenance pass that
feeds a cost-based optimizer.

The reference keeps no table statistics at all (its planner is
rule-free: scan -> filter -> join in source order, Microbase.scala's
executeSelect); Spark's CBO, by contrast, uses per-column NDV /
null-count / min-max to reorder joins and pick build sides. This
module computes those statistics AS a query — one pass over the
table, long-format output (one row per column) — which is both the
`ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` analog and the
profiling report every ingest pipeline runs on a new 100 TB drop.

Scale shape: a single scan; COUNT/MIN/MAX combine map-side, and the
exact COUNT(DISTINCT) trio plans as one Expand (x4 rows) feeding a
two-phase distinct aggregate — the standard exact-NDV plan. At
100 TB you would swap exact NDV for approx_count_distinct (HLL++,
see `agg_approx_distinct` / `agg_hll_mergeable` for the mergeable-
sketch machinery); exact is kept here so the DuckDB oracle can
certify every cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.registry import register

# (column, expression that renders min/max as a cross-engine-stable
# string): BIGINT and VARCHAR cast verbatim; the timestamp column is
# reduced to its DATE part (both engines print ISO dates identically,
# where double/timestamp second-fraction formatting would diverge).
_STAT_COLS: list[tuple[str, str]] = [
    ("l_orderkey", "CAST({v} AS STRING)"),
    ("l_returnflag", "CAST({v} AS STRING)"),
    ("l_shipdate", "CAST(CAST({v} AS DATE) AS STRING)"),
]


def column_stats(df: DataFrame, cols: list[tuple[str, str]]) -> DataFrame:
    """One-pass per-column statistics over ``df``, long format:
    (col_name, n_rows, n_nulls, n_distinct, min_value, max_value).

    All columns' aggregates are computed in a SINGLE wide aggregation
    (one scan regardless of how many columns are profiled), then
    pivoted to long form with ``stack`` — a driver-free, purely
    relational unpivot of an already-1-row result."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, render in cols:
        aggs.extend(
            [
                F.count(F.col(c)).alias(f"{c}__nn"),
                F.count_distinct(F.col(c)).alias(f"{c}__ndv"),
                F.expr(render.format(v=f"min({c})")).alias(f"{c}__min"),
                F.expr(render.format(v=f"max({c})")).alias(f"{c}__max"),
            ]
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__ndv, {c}__min, {c}__max" for c, _ in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, __nn, n_distinct, min_value, max_value)",
        "n_rows",
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )


@register(
    "maintenance_table_stats",
    oracle="""
    SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
           count(*) - count(l_orderkey) AS n_nulls,
           count(DISTINCT l_orderkey) AS n_distinct,
           CAST(min(l_orderkey) AS VARCHAR) AS min_value,
           CAST(max(l_orderkey) AS VARCHAR) AS max_value
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag),
           CAST(min(l_returnflag) AS VARCHAR),
           CAST(max(l_returnflag) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
           count(DISTINCT l_shipdate),
           CAST(CAST(min(l_shipdate) AS DATE) AS VARCHAR),
           CAST(CAST(max(l_shipdate) AS DATE) AS VARCHAR)
    FROM lineitem
    ORDER BY col_name
    """,
    tags=("maintenance", "stats", "cbo", "scale"),
)
def maintenance_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column statistics for ``lineitem`` (key, low-cardinality flag,
    and date column — the three stat shapes a CBO consumes): row
    count, null count, exact NDV, and min/max rendered as strings.
    Gate entry for :func:`column_stats`; the oracle recomputes every
    cell per column in SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    return column_stats(li, _STAT_COLS).orderBy("col_name")
