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


_HIST_BUCKETS = 8

_HISTOGRAM_ORACLE = f"""
    WITH cents AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
    ),
    bounds AS (
        SELECT CAST(min(c) AS BIGINT) AS lo, CAST(max(c) AS BIGINT) AS hi
        FROM cents
    ),
    bucketed AS (
        SELECT least((c - lo) * {_HIST_BUCKETS} // (hi - lo + 1),
                     {_HIST_BUCKETS - 1}) AS bucket,
               c
        FROM cents CROSS JOIN bounds
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(min(c) AS DOUBLE) / 100, 2) AS bucket_min,
           round(CAST(max(c) AS DOUBLE) / 100, 2) AS bucket_max,
           round(CAST(sum(c) AS DOUBLE) / 100, 2) AS bucket_sum
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
"""


@register(
    "maintenance_column_histogram",
    oracle=_HISTOGRAM_ORACLE,
    tags=("maintenance", "stats", "histogram", "cbo"),
)
def maintenance_column_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width column histogram of ``o_totalprice`` — the
    distribution profile a CBO (and every data-quality dashboard)
    keeps per numeric column, complementing `maintenance_table_stats`'
    min/max/NDV. The money column is quantized to integer cents
    first, so bucket boundaries are EXACT integer arithmetic —
    ``(c - lo) * k // (hi - lo + 1)`` — with no float boundary to
    drift between engines (an equi-HEIGHT histogram would need
    quantile boundaries: approx_percentile's mergeable sketch at
    100 TB; see `agg_approx_percentiles`).

    Scale shape: two map-side-combinable aggregation passes (global
    min/max, then per-bucket stats with the 1-row bounds broadcast) —
    no sort, no window, no data-sized shuffle beyond the k-row
    bucket aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    bounds = cents.agg(F.min("c").alias("lo"), F.max("c").alias("hi"))
    # `div` = exact BIGINT floor division, mirroring DuckDB's `//` —
    # a double `/` + floor would lose exactness past 2^53.
    bucketed = cents.crossJoin(F.broadcast(bounds)).selectExpr(
        f"least((c - lo) * {_HIST_BUCKETS} div (hi - lo + 1), "
        f"CAST({_HIST_BUCKETS - 1} AS BIGINT)) AS bucket",
        "c",
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c").cast("double") / 100, 2).alias("bucket_min"),
            F.round(F.max("c").cast("double") / 100, 2).alias("bucket_max"),
            F.round(F.sum("c").cast("double") / 100, 2).alias("bucket_sum"),
        )
        .orderBy("bucket")
    )


_PSI_ORACLE = """
    WITH cell AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS c_sl
        FROM documents GROUP BY source, lang
    ),
    by_source AS (
        SELECT source, CAST(sum(c_sl) AS BIGINT) AS c_s FROM cell GROUP BY source
    ),
    by_lang AS (
        SELECT lang, CAST(sum(c_sl) AS BIGINT) AS c_l FROM cell GROUP BY lang
    ),
    total AS (SELECT CAST(sum(c_sl) AS BIGINT) AS c_t FROM cell),
    terms AS (
        SELECT cell.source,
               CAST(round(
                   ((CAST(c_sl AS DOUBLE) / c_s) - (CAST(c_l AS DOUBLE) / c_t)) *
                   ln((CAST(c_sl AS DOUBLE) / c_s) / (CAST(c_l AS DOUBLE) / c_t))
                   * 1e9) AS BIGINT) AS q
        FROM cell
        JOIN by_source ON cell.source = by_source.source
        JOIN by_lang ON cell.lang = by_lang.lang
        CROSS JOIN total
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_langs_observed,
           round(CAST(sum(q) AS BIGINT) / 1e9, 6) AS psi
    FROM terms
    GROUP BY source
    ORDER BY source
"""


@register(
    "maintenance_drift_psi",
    oracle=_PSI_ORACLE,
    tags=("maintenance", "drift", "stats"),
)
def maintenance_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: for each ingest
    source, PSI of its language distribution against the whole-corpus
    distribution — PSI = Σ (p_i − q_i)·ln(p_i/q_i) over observed
    cells (unsmoothed: a cell enters only where the source has mass,
    so q_i ≥ p_i·c_s/c_t > 0 and the log is finite; the conventional
    PSI≥0.2 alarm threshold applies per source). This is the
    batch-over-batch distribution-shift check every recurring 100 TB
    ingest runs before a new crawl snapshot is admitted.

    Scale shape: ONE corpus-sized map-side-combinable count to
    (source, lang) cells; every subsequent margin/join/PSI step runs
    on the tiny cell table (|sources|·|langs| rows). Per-cell terms
    are integer-quantized at 1e-9 pre-sum (house float policy).
    """
    docs = load_table(spark, sf_dir, "documents")
    cell = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c_sl"))
    by_source = cell.groupBy("source").agg(F.sum("c_sl").alias("c_s"))
    by_lang = cell.groupBy("lang").agg(F.sum("c_sl").alias("c_l"))
    total = cell.agg(F.sum("c_sl").alias("c_t"))
    p = F.col("c_sl").cast("double") / F.col("c_s")
    q = F.col("c_l").cast("double") / F.col("c_t")
    term = F.round((p - q) * F.log(p / q) * F.lit(1e9)).cast("long")
    terms = (
        cell.join(by_source, "source")
        .join(by_lang, "lang")
        .crossJoin(F.broadcast(total))
        .select("source", term.alias("q"))
    )
    return (
        terms.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_langs_observed"),
            F.round(F.sum("q") / F.lit(1e9), 6).alias("psi"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# round 7: hot-key skew report


@register(
    "maintenance_skew_report",
    oracle="""
    WITH per_key AS (
        SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM per_key
    ),
    top AS (
        SELECT key, n FROM per_key ORDER BY n DESC, key LIMIT 10
    )
    SELECT t.key, t.n,
           round(t.n / x.total, 4) AS share,
           round((t.n * 1.0 / x.total) * x.n_keys, 4) AS skew_ratio
    FROM top t CROSS JOIN tot x
    ORDER BY t.n DESC, t.key
    """,
    tags=("maintenance", "skew", "diagnostics", "scale"),
)
def maintenance_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key skew report for a join/shuffle key: the 10 heaviest
    l_suppkey values with their row share and skew ratio
    (count ÷ mean count) — the diagnostic that decides BETWEEN this
    repo's skew strategies (ratio ~1: plain shuffle; moderate: AQE
    skew split; extreme: `join_skew_salted_auto`'s salting). Shapes:
    one map-side-combinable count per key, a 2-value global
    aggregate broadcast back, and a top-10 via TakeOrderedAndProject
    — the whole report costs one pass over the fact table. The skew
    ratio divides BEFORE multiplying — (n / total) * n_keys in
    double — because the integer product n * n_keys overflows int64
    (and throws under ANSI mode) at 100 TB scales where n ~ rows/key
    and n_keys ~ distinct keys; n/total <= 1 keeps every intermediate
    in range, and double arithmetic in the same order is
    cross-engine stable."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = per_key.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = per_key.orderBy(F.col("n").desc(), "key").limit(10)
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("total"), 4).alias("share"),
            F.round((F.col("n") / F.col("total")) * F.col("n_keys"), 4).alias(
                "skew_ratio"
            ),
        )
        .orderBy(F.col("n").desc(), "key")
    )


@register(
    "maintenance_referential_audit",
    oracle="""
    WITH checks AS (
        SELECT 0 AS check_id, 'orphan_lineitems' AS check_name,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
                   AS n_violations
        UNION ALL
        SELECT 1, 'childless_orders',
               (SELECT CAST(count(*) AS BIGINT) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                  WHERE l.l_orderkey = o.o_orderkey))
        UNION ALL
        SELECT 2, 'orphan_orders',
               (SELECT CAST(count(*) AS BIGINT) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 3, 'duplicate_orderkeys',
               (SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                FROM orders)
    )
    SELECT CAST(check_id AS BIGINT) AS check_id, check_name, n_violations
    FROM checks ORDER BY check_id
    """,
    tags=("maintenance", "data-quality", "audit"),
)
def maintenance_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan facts (lineitems without
    their order), childless parents, broken FK references, and
    duplicate primary keys — the constraint checks a warehouse runs
    as assertions because distributed engines don't ENFORCE
    PK/FK (Spark and most lakehouse formats treat them as
    informational). Each check is one anti-join (LeftAnti hash join,
    broadcast when the parent side is small) collapsed to a count;
    the report is a constant four-row relation. At 100 TB this is
    the nightly conformance job whose non-zero row pages someone."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def check(cid: int, name: str, df) -> DataFrame:
        return df.select(
            F.lit(cid).cast("long").alias("check_id"),
            F.lit(name).alias("check_name"),
            F.col("n").alias("n_violations"),
        )

    n = F.count(F.lit(1)).alias("n")
    out = (
        check(
            0,
            "orphan_lineitems",
            li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti").agg(n),
        )
        .unionByName(
            check(
                1,
                "childless_orders",
                orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti").agg(n),
            )
        )
        .unionByName(
            check(
                2,
                "orphan_orders",
                orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti").agg(n),
            )
        )
        .unionByName(
            check(
                3,
                "duplicate_orderkeys",
                orders.agg(
                    (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("n")
                ),
            )
        )
    )
    return out.orderBy("check_id")
