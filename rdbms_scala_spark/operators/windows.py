"""Window functions — absent from the reference (SURVEY.md §2.10),
exposed as the Spark-native superset the driver mandates.

Every window below partitions by a key and orders with a unique
tiebreaker so results are deterministic across engines (ties would
otherwise make running sums/lags engine-dependent).

At scale each window is one shuffle on the partition key; rows within
a partition are sorted once and all frames evaluate in that pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.registry import register


@register(
    "window_topn_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
    FROM (
        SELECT c_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY c_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) t WHERE rn <= 3
    """,
    tags=("window", "topn"),
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number — the per-group top-k
    pattern that needs no self-join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rn")
    )


@register(
    "window_rank_dense",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           rank()       OVER (PARTITION BY s_nationkey ORDER BY round(s_acctbal, 2) DESC) AS bal_rank,
           dense_rank() OVER (PARTITION BY s_nationkey ORDER BY round(s_acctbal, 2) DESC) AS bal_dense_rank
    FROM supplier
    """,
    tags=("window", "rank"),
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank within nation by account balance."""
    supp = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.round("s_acctbal", 2).desc())
    return supp.select(
        "s_suppkey",
        "s_nationkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS days_since_prev
    FROM orders
    """,
    tags=("window", "lag"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days since the customer's previous order (lag + date diff);
    NULL for each customer's first order."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
    )


@register(
    "window_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spend
    FROM orders
    """,
    tags=("window", "frame"),
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over order history (explicit ROWS
    frame)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg_3
    FROM orders
    """,
    tags=("window", "frame"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-order moving average of spend per customer."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, W.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("moving_avg_3"),
    )


@register(
    "window_share_of_group",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / sum(l_extendedprice) OVER (PARTITION BY l_orderkey), 4)
               AS price_share
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
    tags=("window", "ratio"),
)
def window_share_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each line's share of its order total — unordered whole-partition
    frame (no ORDER BY -> frame is the full partition)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    w = W.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / F.sum("l_extendedprice").over(w), 4).alias("price_share"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(o_totalprice, 2) AS o_totalprice,
           CAST(count(*) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING
           ) AS BIGINT) AS n_similar_priced
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_custkey, o_totalprice, o_orderkey
    """,
    tags=("window", "range-frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, vs. the ROWS frames elsewhere): for
    each order, how many of the same customer's orders are priced
    within ±1000. Range frames bound by *values* need a sorted
    per-partition scan with a sliding value window — Spark executes it
    in the same single window exchange as a rows frame."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    # DataFrame-API rangeBetween only accepts long bounds; fractional
    # value frames go through the SQL window expression.
    frame = F.expr(
        "count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice "
        "RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING)"
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            frame.alias("n_similar_priced"),
        )
        .orderBy("o_custkey", "o_totalprice", "o_orderkey")
    )


@register(
    "window_distribution_ranks",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(c_acctbal, 2) AS c_acctbal,
           ntile(4) OVER w AS balance_quartile,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist() OVER w, 4) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
    tags=("window", "distribution"),
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile quartiles, percent_rank,
    cume_dist per market segment — the statistical ranking family
    (quantile bucketing for stratified sampling, percentile features).
    All three share ONE window spec, so Spark evaluates them in a
    single sort+exchange; the tie-break on c_custkey makes every rank
    deterministic cross-engine."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.ntile(4).over(w).alias("balance_quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    ).orderBy("c_custkey")


@register(
    "window_time_range_rolling",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(count(*) OVER w AS BIGINT) AS n_events_7d,
           round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w
                      AS DOUBLE) / 100, 2) AS value_7d
    FROM events
    WHERE user_id <= 200
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts_us, event_id
    """,
    tags=("window", "range-frame", "time", "scale"),
)
def window_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-interval RANGE frame: each event's trailing-7-day event
    count and value total for its user — the rolling-exposure /
    velocity feature (txn velocity checks, rate-limit audits, rolling
    spend) that ROWS frames cannot express when event cadence is
    uneven. Complements `window_range_frame` (numeric value range):
    here the frame bound is an INTERVAL over the time order.

    Cross-engine float discipline: the rolling SUM quantizes value at
    1e2 BEFORE accumulating (sliding-frame accumulation order differs
    between engines; integer addition is order-free), then divides
    once for display. RANGE peers (equal ts) are included together by
    definition, so ts ties cannot reorder results.

    Scale shape: one exchange on user_id, one sorted scan per
    partition with a sliding two-pointer frame — Spark executes the
    interval bound in the same single WindowExec as a rows frame; no
    self-join (the naive equivalent is events x events ON ts BETWEEN,
    a range join that explodes at 100 TB)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 200)
    value_q = "CAST(round(value * 100, 0) AS BIGINT)"
    over = (
        "OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)"
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.expr(f"count(*) {over}").alias("n_events_7d"),
            F.round(
                F.expr(f"sum({value_q}) {over}").cast("double") / F.lit(100), 2
            ).alias("value_7d"),
        )
        .orderBy("user_id", "ts_us", "event_id")
    )


@register(
    "window_running_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_of_type
        FROM events
        WHERE user_id <= 100
    )
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(sum(first_of_type) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS distinct_types_so_far
    FROM flagged
    ORDER BY user_id, ts_us, event_id
    """,
    tags=("window", "distinct", "running"),
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per user — how many distinct event
    types each user has touched as of every event (the
    feature-adoption / exploration-breadth curve). COUNT(DISTINCT)
    is not a legal running-window aggregate in either engine, so
    this is THE standard decomposition: flag each (user, type)'s
    first occurrence with one row_number pass, then a plain running
    SUM of flags — turning an unsupported distinct-frame into two
    ordinary window passes over two KEYED exchanges ((user, type)
    for the flag, then user for the running sum — a (user, type)
    partitioning cannot serve a per-user frame, so the second
    exchange is required; both are corpus-partitioned, no global
    state anywhere).

    All-integer arithmetic; ties broken (ts, event_id) in both
    passes, so the running value is deterministic within equal
    timestamps."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 100)
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "first_of_type",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        flagged.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.sum("first_of_type").over(w_run).alias("distinct_types_so_far"),
        )
        .orderBy("user_id", "ts_us", "event_id")
    )


@register(
    "window_rolling_median",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day, y,
           round(quantile_cont(y, 0.5) OVER (
               PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 1)
               AS rolling_median_7d
    FROM daily
    ORDER BY event_type, day
    """,
    tags=("window", "rolling", "median", "scale"),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling MEDIAN of the per-type daily count series — the
    robust smoother that (unlike window_moving_avg's mean) ignores a
    single spike day, which is exactly what you want under incident
    traffic or backfill bursts. Spark's exact `percentile` aggregate
    evaluated over a row frame and DuckDB's `quantile_cont` share the
    same definition (linear interpolation on the sorted frame — the
    sample_quality_top_fraction parity), and the frame holds <= 7
    small integers, so the interpolated value is exact in both
    engines at round-1.

    Scale shape: the corpus-sized pass is the daily aggregate; the
    window runs per event_type over the calendar-bounded daily
    relation. A per-KEY rolling median over raw events would need the
    two-heap sketch instead — at the daily-aggregate altitude the
    exact frame percentile is free."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("y"))
    w = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, W.currentRow)
    )
    return (
        daily.select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "y",
            F.round(
                F.expr("percentile(y, 0.5)").over(w), 1
            ).alias("rolling_median_7d"),
        )
        .orderBy("event_type", "day")
    )
