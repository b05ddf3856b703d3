"""Modern-SQL surface pins, round 7: aggregate FILTER clauses,
ordered string aggregation, arg-extreme aggregates, boolean
aggregates, multiset set-ops (INTERSECT/EXCEPT ALL), bitwise
operators, window value functions, gaps-and-islands, and calendar
dimension generation.

The reference's surface stops at basic aggregates and UNION
(Microbase.scala §aggregate/§setop); these queries pin the modern
surface a production engine adds on top, each with a DuckDB oracle
running semantically-identical ANSI SQL (identical text where the
dialects agree). Cross-engine conventions follow the registry
docstring: identical aliases both sides, money rounded to 2, ratios
to 4, DuckDB sums cast back to BIGINT (HUGEINT otherwise), xor()
spelled as a function in DuckDB (its ``^`` is power).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.registry import register


# ---------------------------------------------------------------------------
# aggregate surface


@register(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_fulfilled,
           round(sum(round(o_totalprice, 2)) FILTER (WHERE o_orderstatus = 'O'), 2)
               AS open_value,
           CAST(count(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS n_large
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("aggregate", "filter-clause", "sql-surface"),
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-aggregate FILTER (WHERE ...) clauses — the ANSI form of
    conditional aggregation (one pass, N differently-filtered
    aggregates; the pre-SQL:2003 workaround is sum(CASE WHEN ...)).
    All four aggregates evaluate in the same hash-aggregate operator
    with map-side partials; the filters are per-row predicates inside
    the aggregate, not separate scans."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("count(*) FILTER (WHERE o_orderstatus = 'F')").alias("n_fulfilled"),
            F.round(
                F.expr(
                    "sum(round(o_totalprice, 2)) FILTER (WHERE o_orderstatus = 'O')"
                ),
                2,
            ).alias("open_value"),
            F.expr("count(*) FILTER (WHERE o_totalprice > 150000)").alias("n_large"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_string_agg",
    oracle="""
    SELECT r.r_name AS region,
           CAST(count(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nation_list
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    tags=("aggregate", "string-agg", "sql-surface"),
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): collapse a
    group to a deterministic delimited string. Spark spells it
    collect_list -> array_sort -> concat_ws; the explicit sort is
    what makes the result shuffle-order-independent (collect_list
    alone is nondeterministic under parallelism — same discipline as
    `agg_collect_sorted`). Group state is bounded by group size, so
    keep it for small dimensions (here: nations per region)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        )
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias(
                "nation_list"
            ),
        )
        .orderBy("region")
    )


@register(
    "agg_arg_extremes",
    oracle="""
    WITH c AS (
        SELECT c_nationkey, c_custkey,
               CAST(round(c_acctbal * 1e2, 0) AS BIGINT) AS cents
        FROM customer
    )
    SELECT c_nationkey,
           CAST(arg_max(c_custkey, cents * 10000000 + c_custkey) AS BIGINT)
               AS richest_custkey,
           max(cents) / 1e2 AS top_balance,
           CAST(arg_min(c_custkey, cents * 10000000 + c_custkey) AS BIGINT)
               AS poorest_custkey,
           min(cents) / 1e2 AS bottom_balance
    FROM c
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("aggregate", "arg-extremes", "sql-surface"),
)
def agg_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (DuckDB: arg_max / arg_min): the value of one
    column at another column's extreme, in ONE hash aggregate — no
    self-join back, no per-group sort (the classic top-1-per-group
    shortcut; `similarity._ivf_topk` uses the same operator on its
    corpus-sized path). Determinism: the ordering key is integer
    cents * 1e7 + custkey — unique per row, so ties cannot exist and
    both engines must agree."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        F.round(F.col("c_acctbal") * F.lit(1e2), 0).cast("long").alias("cents"),
    )
    key = F.col("cents") * F.lit(10000000) + F.col("c_custkey")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.max_by("c_custkey", key).alias("richest_custkey"),
            (F.max("cents") / F.lit(1e2)).alias("top_balance"),
            F.min_by("c_custkey", key).alias("poorest_custkey"),
            (F.min("cents") / F.lit(1e2)).alias("bottom_balance"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "agg_bool_aggs",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'P') AS any_pending,
           CAST(count(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT)
               AS n_large
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("aggregate", "boolean", "sql-surface"),
)
def agg_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates bool_and / bool_or (ANSI EVERY / ANY) plus
    count_if — the assertion-style aggregates data-quality checks are
    built from ("every row in the partition satisfies X"). All
    map-side combinable (AND/OR are associative+commutative)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
            F.count_if(F.col("o_totalprice") > 150000).alias("n_large"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# multiset set operations


@register(
    "intersect_all_keys",
    oracle="""
    SELECT k, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT c_nationkey AS k FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS k FROM supplier
    )
    GROUP BY k
    ORDER BY k
    """,
    tags=("setop", "multiset", "sql-surface"),
)
def intersect_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (each key survives
    min(n_left, n_right) times), completing the set-op family next to
    the distinct-semantics `intersect_keys`. Spark plans this as one
    aggregation counting per-side multiplicities then replicating —
    a single shuffle on the row value, no join."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    )
    return (
        cust.intersectAll(supp)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


@register(
    "except_all_keys",
    oracle="""
    SELECT k, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT c_nationkey AS k FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS k FROM supplier
    )
    GROUP BY k
    ORDER BY k
    """,
    tags=("setop", "multiset", "sql-surface"),
)
def except_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (each key survives
    max(0, n_left - n_right) times), the bag complement of
    `except_keys`' distinct semantics."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    )
    return (
        cust.exceptAll(supp)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# bitwise operator family


@register(
    "functions_bitwise",
    oracle="""
    SELECT c_custkey,
           c_custkey & 15 AS k_and,
           c_custkey | 16 AS k_or,
           xor(c_custkey, 9) AS k_xor,
           c_custkey << 2 AS k_shl,
           c_custkey >> 1 AS k_shr,
           CAST(bit_count(c_custkey) AS BIGINT) AS k_bits
    FROM customer
    WHERE c_custkey <= 64
    ORDER BY c_custkey
    """,
    tags=("functions", "bitwise", "sql-surface"),
)
def functions_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family: AND / OR / XOR / shifts / popcount —
    the toolkit for flag columns, hash mixing, and bitmap-index
    arithmetic (the repo's SimHash and count-min implementations use
    exactly these JVM-side ops). Dialect note: DuckDB's ``^`` is
    exponentiation, so XOR is the xor() function there; Spark's ``^``
    is the bitwise operator."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 64)
    return cust.select(
        "c_custkey",
        F.expr("c_custkey & 15").alias("k_and"),
        F.expr("c_custkey | 16").alias("k_or"),
        F.expr("c_custkey ^ 9").alias("k_xor"),
        F.expr("shiftleft(c_custkey, 2)").alias("k_shl"),
        F.expr("shiftright(c_custkey, 1)").alias("k_shr"),
        F.bit_count("c_custkey").cast("long").alias("k_bits"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# window value functions & gaps-and-islands


@register(
    "window_value_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2) AS price,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice) OVER w, 2) AS last_price,
           round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "value-functions", "sql-surface"),
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit
    full-partition frame — the value-function trio completing the
    ranking (`window_rank_dense`) and offset (`window_lag_lead`)
    families. The explicit ROWS UNBOUNDED...UNBOUNDED frame matters:
    last_value under the default frame (UNBOUNDED PRECEDING..CURRENT
    ROW) degenerates to the current row, the classic window-frame
    bug. Deterministic: the order key (o_orderdate, o_orderkey) is
    unique per partition."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_gaps_islands",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
        FROM events
    ),
    runs AS (
        SELECT user_id, d,
               d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
        FROM ud
    ),
    islands AS (
        SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
        FROM runs GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS max_streak,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM islands
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("window", "gaps-islands", "sql-surface"),
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-active-day streaks via
    the classic day-minus-row_number grouping constant. The window is
    PARTITIONED by user (per-key state only — contrast the global
    ntile this repo just retired from `events_rfm_segments`), so it
    scales with the per-user day count, not the corpus. Days are
    epoch-day integers so the island constant is exact integer
    arithmetic on both engines."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("d"),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    runs = ud.withColumn("grp", F.col("d") - F.row_number().over(w))
    islands = runs.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("max_streak"),
            F.sum("len").alias("active_days"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# calendar dimension generation


@register(
    "date_dim_generate",
    oracle="""
    SELECT strftime(d, '%Y-%m-%d') AS date_str,
           CAST(isodow(d) AS BIGINT) AS iso_dow,
           CAST(week(d) AS BIGINT) AS iso_week,
           CAST(month(d) AS BIGINT) AS month,
           CAST(quarter(d) AS BIGINT) AS quarter,
           d = last_day(d) AS is_month_end,
           CAST(day(last_day(d)) AS BIGINT) AS days_in_month
    FROM generate_series(DATE '2024-01-01', DATE '2024-03-31', INTERVAL 1 DAY) t(d)
    ORDER BY date_str
    """,
    tags=("date", "dimension", "generate", "sql-surface"),
)
def date_dim_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension generation from thin air: sequence() +
    explode builds the date spine every warehouse joins against
    (DuckDB/Postgres spell it generate_series) — no source table at
    all, the one relation a 100 TB pipeline materializes ONCE and
    broadcasts everywhere. ISO conventions pinned cross-engine:
    Spark weekday()+1 == DuckDB isodow (Monday=1), weekofyear ==
    week (ISO week). Dates emitted as strings per house convention
    (the driver canonicalizer hashes strings, not engine-native date
    cells)."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"), F.lit("2024-03-31").cast("date")
            )
        ).alias("d")
    )
    return spine.select(
        F.date_format("d", "yyyy-MM-dd").alias("date_str"),
        (F.weekday("d") + 1).cast("long").alias("iso_dow"),
        F.weekofyear("d").cast("long").alias("iso_week"),
        F.month("d").cast("long").alias("month"),
        F.quarter("d").cast("long").alias("quarter"),
        (F.col("d") == F.last_day("d")).alias("is_month_end"),
        F.dayofmonth(F.last_day("d")).cast("long").alias("days_in_month"),
    ).orderBy("date_str")


# ---------------------------------------------------------------------------
# round 7, batch B: multi-distinct, robust stats, star join, null ordering


@register(
    "agg_multi_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT strftime(o_orderdate, '%Y-%m')) AS BIGINT)
               AS n_months,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("aggregate", "multi-distinct", "sql-surface"),
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT ...) over DIFFERENT columns in one
    grouped aggregate — the query shape that forces Spark's Expand
    rewrite (each input row replicates once per distinct clause with
    a grouping id, then one aggregation pass dedups all clauses
    simultaneously). One shuffle despite three distinct columns;
    the naive alternative is one self-aggregation per clause."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count_distinct(F.date_format("o_orderdate", "yyyy-MM")).alias(
                "n_months"
            ),
            F.count_distinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_median_mad",
    oracle="""
    WITH cents AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 1e2, 0) AS BIGINT) AS c
        FROM orders
    ),
    med AS (
        SELECT o_orderpriority, quantile_cont(c, 0.5) AS med_c
        FROM cents GROUP BY o_orderpriority
    ),
    dev AS (
        SELECT c.o_orderpriority, abs(c.c - m.med_c) AS d, m.med_c
        FROM cents c JOIN med m ON c.o_orderpriority = m.o_orderpriority
    )
    SELECT o_orderpriority,
           round(med_c / 1e2, 2) AS median_price,
           round(quantile_cont(d, 0.5) / 1e2, 2) AS mad_price
    FROM dev
    GROUP BY o_orderpriority, med_c
    ORDER BY o_orderpriority
    """,
    tags=("aggregate", "robust-stats", "sql-surface"),
)
def agg_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust spread
    estimator that outlier detectors prefer over stddev (one whale
    order doubles a stddev band but barely moves MAD; pair with
    `events_anomaly_zscore` for the classical version). Two grouped
    exact percentiles with a broadcast join between them; prices live
    as integer cents through both so the interpolation lattice is
    engine-stable (`events_rfm_segments`' argument), with ONE final
    /1e2 display division."""
    orders = load_table(spark, sf_dir, "orders")
    cents = orders.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * F.lit(1e2), 0).cast("long").alias("c"),
    )
    med = cents.groupBy("o_orderpriority").agg(
        F.expr("percentile(c, 0.5D)").alias("med_c")
    )
    dev = cents.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority", "med_c", F.abs(F.col("c") - F.col("med_c")).alias("d")
    )
    return (
        dev.groupBy("o_orderpriority", "med_c")
        .agg(F.expr("percentile(d, 0.5D)").alias("mad_c"))
        .select(
            "o_orderpriority",
            F.round(F.col("med_c") / F.lit(1e2), 2).alias("median_price"),
            F.round(F.col("mad_c") / F.lit(1e2), 2).alias("mad_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "join_star_schema",
    oracle="""
    SELECT n.n_name AS supplier_nation, p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size < 15
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name, p.p_brand
    ORDER BY supplier_nation, brand
    """,
    tags=("join", "star-schema", "broadcast", "scale"),
)
def join_star_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical star join: one fact table against three
    dimension tables at once, every dimension explicitly broadcast —
    the fact table is scanned ONCE and never shuffled before
    aggregation (three map-side hash joins back to back inside one
    codegen stage), vs. three shuffle joins if the dims were treated
    as peers. The selective dim predicate (p_size < 15) prunes fact
    rows at the first join, before the wider dims attach — the
    manual form of the bloom-pushdown `join_bloom_pruned` pins."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supplier_nation"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("supplier_nation", "brand")
    )


@register(
    "window_nulls_ordering",
    oracle="""
    WITH c AS (
        SELECT c_custkey, c_nationkey,
               CASE WHEN c_acctbal < 0 THEN NULL
                    ELSE round(c_acctbal, 2) END AS bal
        FROM customer
    )
    SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey, bal,
           CAST(row_number() OVER (
               PARTITION BY c_nationkey
               ORDER BY bal ASC NULLS FIRST, c_custkey) AS BIGINT)
               AS rk_nulls_first,
           CAST(row_number() OVER (
               PARTITION BY c_nationkey
               ORDER BY bal ASC NULLS LAST, c_custkey) AS BIGINT)
               AS rk_nulls_last
    FROM c
    ORDER BY c_custkey
    """,
    tags=("window", "nulls-ordering", "sql-surface"),
)
def window_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS FIRST / NULLS LAST ordering pinned through window ranks
    (rank columns make ordering semantics VALUE-visible, surviving
    the driver's order-insensitive hash). Dialect trap worth pinning:
    in ascending order Spark and DuckDB both default to NULLS FIRST —
    but Postgres/Oracle default NULLS LAST, so portable SQL must say
    it explicitly; negative balances stand in as the missing data."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.round("c_acctbal", 2))
        .alias("bal"),
    )
    w_nf = W.partitionBy("nationkey").orderBy(
        F.col("bal").asc_nulls_first(), "c_custkey"
    )
    w_nl = W.partitionBy("nationkey").orderBy(
        F.col("bal").asc_nulls_last(), "c_custkey"
    )
    return cust.select(
        "c_custkey",
        "nationkey",
        "bal",
        F.row_number().over(w_nf).cast("long").alias("rk_nulls_first"),
        F.row_number().over(w_nl).cast("long").alias("rk_nulls_last"),
    ).orderBy("c_custkey")


@register(
    "functions_try_arith",
    oracle="""
    SELECT c_custkey,
           round(c_acctbal / nullif(c_custkey % 3, 0), 4) AS safe_div,
           TRY_CAST(CASE WHEN c_custkey % 2 = 0 THEN '12x'
                         ELSE CAST(c_custkey AS VARCHAR) END AS BIGINT)
               AS parsed_key,
           CAST(NULL AS BIGINT) AS overflow_add,
           [c_custkey, c_custkey * 2][CASE WHEN c_custkey % 5 = 0
                                           THEN 9 ELSE 2 END] AS maybe_elem
    FROM customer
    WHERE c_custkey <= 200
    ORDER BY c_custkey
    """,
    tags=("functions", "try-arithmetic", "ansi", "sql-surface"),
)
def functions_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The error-safe (``try_``) arithmetic family — division by
    zero, unparseable casts, bigint-overflowing addition, and
    out-of-range array access all yield NULL instead of killing the
    job. Under Spark 4's default ANSI mode the plain operators THROW
    on these inputs (the grading driver runs ANSI-on; tests/test_ansi
    exists because of exactly that), so ``try_divide`` /
    ``try_cast`` / ``try_add`` / ``try_element_at`` are the
    production idiom for dirty data. DuckDB expresses the same
    semantics as nullif-guarded division, TRY_CAST, and its natively
    NULL-on-out-of-range list indexing."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return cust.select(
        "c_custkey",
        F.round(F.expr("try_divide(c_acctbal, c_custkey % 3)"), 4).alias("safe_div"),
        F.expr(
            "try_cast(CASE WHEN c_custkey % 2 = 0 THEN '12x' "
            "ELSE CAST(c_custkey AS STRING) END AS BIGINT)"
        ).alias("parsed_key"),
        F.expr("try_add(9223372036854775807, c_custkey + 1)").alias("overflow_add"),
        F.expr(
            "try_element_at(array(c_custkey, c_custkey * 2), "
            "CASE WHEN c_custkey % 5 = 0 THEN 9 ELSE 2 END)"
        ).alias("maybe_elem"),
    ).orderBy("c_custkey")


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(round(o.o_totalprice, 2)), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("sql-surface", "pipe-syntax"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0's |> operators, from the SQL:2023-
    adjacent GoogleSQL proposal, SPARK-49555): the same
    segment-filtered revenue rollup expressed as a left-to-right
    pipeline of |> JOIN / |> WHERE / |> AGGREGATE ... GROUP BY /
    |> ORDER BY stages. Parses to the identical Catalyst plan as the
    nested form — the query certifies the modern surface, the oracle
    (plain ANSI) certifies the semantics. Reference scope: the
    reference's parser handles only SELECT-FROM-WHERE-GROUP BY
    (Microbase.scala's single query form); this is the superset
    surface growing in the same direction users are."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("pipe_orders_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("pipe_customer_v")
    return spark.sql("""
        FROM pipe_orders_v AS o
        |> JOIN pipe_customer_v AS c ON o.o_custkey = c.c_custkey
        |> WHERE c.c_mktsegment = 'BUILDING'
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(round(o.o_totalprice, 2)), 2) AS revenue
           GROUP BY o.o_orderpriority
        |> ORDER BY o_orderpriority
    """)


# ---------------------------------------------------------------------------
# round 12: CREATE FUNCTION SQL UDFs (SPARK-51809 umbrella, Spark
# 4.0) — the last modern-SQL item alongside pipe syntax / VARIANT /
# UDTFs: scalar and table functions DEFINED in SQL, planned by
# Catalyst (the body inlines into the caller's plan — no Python, no
# serialization wall), invocable from both spark.sql and the
# DataFrame API. The reference has no function-definition surface at
# all (Microbase.scala's expression grammar is fixed); these pin the
# superset direction users extend an engine without leaving SQL.


@register(
    "sql_create_function_udf",
    oracle="""
    SELECT CASE WHEN round(o_totalprice, 2) < 50000 THEN 'small'
                WHEN round(o_totalprice, 2) < 150000 THEN 'mid'
                ELSE 'large' END AS tier,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(round(o_totalprice, 2)), 2) AS revenue
    FROM orders
    GROUP BY tier
    ORDER BY tier
    """,
    tags=("sql-surface", "create-function", "sql-udf"),
)
def sql_create_function_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar SQL UDF via CREATE OR REPLACE TEMPORARY FUNCTION ...
    RETURNS ... RETURN <expr> (Spark 4.0 SQL UDFs): a price-tier
    bucketing function defined once in SQL DDL, then exercised from
    BOTH call paths — invoked through the DataFrame API (``F.expr``
    over the loaded table) to build the tier column, and through
    ``spark.sql`` for the aggregation over that relation. The body
    INLINES into the Catalyst plan (explain shows the CASE expression
    directly — whole-stage codegen, no UDF call boundary), which is
    the whole scale argument: a SQL UDF costs exactly its expression,
    unlike a Python UDF's serialization wall. Oracle replays the
    inlined body verbatim."""
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION price_tier(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN round(p, 2) < 50000 THEN 'small'
                    WHEN round(p, 2) < 150000 THEN 'mid'
                    ELSE 'large' END
    """)
    tiered = load_table(spark, sf_dir, "orders").select(
        F.expr("price_tier(o_totalprice)").alias("tier"),
        F.round("o_totalprice", 2).alias("p2"),
    )
    tiered.createOrReplaceTempView("udf_tiered_v")
    return spark.sql("""
        SELECT tier, count(*) AS n_orders, round(sum(p2), 2) AS revenue
        FROM udf_tiered_v
        GROUP BY tier
        ORDER BY tier
    """)


@register(
    "sql_create_table_function",
    oracle="""
    SELECT o.o_orderkey,
           c.c_name,
           round(o.o_totalprice, 2) AS price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    ORDER BY price DESC, o.o_orderkey
    LIMIT 10
    """,
    tags=("sql-surface", "create-function", "table-function"),
)
def sql_create_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TABLE function via CREATE OR REPLACE TEMPORARY FUNCTION ...
    RETURNS TABLE (...) RETURN SELECT ... (Spark 4.0): a parameterized
    top-N-per-segment view — the SQL-native sibling of the Python
    UDTF (`udtf_word_windows`), but with a body that inlines into the
    caller's plan as an ordinary subquery (predicate pushdown and the
    TakeOrderedAndProject top-N fusion apply as if hand-written; no
    Python boundary). Invoked positionally from spark.sql; the
    segment parameter reaches the join filter as a literal, so the
    broadcast-join + top-10 plan is identical to the inline form the
    oracle replays."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("tf_orders_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "tf_customer_v"
    )
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION segment_top_orders(seg STRING)
        RETURNS TABLE (o_orderkey BIGINT, c_name STRING, price DOUBLE)
        RETURN SELECT o.o_orderkey,
                      c.c_name,
                      round(o.o_totalprice, 2) AS price
               FROM tf_orders_v o JOIN tf_customer_v c
                    ON o.o_custkey = c.c_custkey
               WHERE c.c_mktsegment = seg
               ORDER BY price DESC, o.o_orderkey
               LIMIT 10
    """)
    return spark.sql("SELECT * FROM segment_top_orders('BUILDING')")
