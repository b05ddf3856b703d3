"""Aggregation operators — SURVEY.md §2.4.

The reference's live surface was COUNT/SUM/AVG only, computed by
explicit foldLeft per group after a full materialize + groupBy
(Microbase.scala:343-416); its generic DeclarativeAggregate engine
(which would have added MIN/MAX) was dead code (303-342, 417-499).
Here: the full Spark aggregate surface with map-side partial
aggregation — each query is one shuffle on its grouping key.

ANSI deviations from the reference (§8 quirks 3/4/8) are deliberate:
AVG of ints is a double, empty SUM/AVG is NULL, COUNT(col) skips
NULLs — matching the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.registry import register


@register(
    "agg_ungrouped",
    oracle="""
    SELECT count(*)                        AS n_rows,
           CAST(sum(l_quantity) AS DOUBLE) AS total_qty,
           round(avg(l_extendedprice), 4)  AS avg_price,
           round(min(l_extendedprice), 2)  AS min_price,
           round(max(l_extendedprice), 2)  AS max_price
    FROM lineitem
    """,
    tags=("A1",),
)
def agg_ungrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped (global) aggregate — evalAgg (Microbase.scala:343-369)
    plus the MIN/MAX its dead path aspired to. Partial aggregation
    means one row per partition reaches the final reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").cast("double").alias("total_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "agg_grouped",
    oracle="""
    SELECT l_returnflag,
           count(*)                       AS n,
           round(sum(l_quantity), 2)      AS sum_qty,
           round(avg(l_discount), 4)      AS avg_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A2",),
)
def agg_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped hash aggregate — evalAggGroup (Microbase.scala:370-416)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT count(DISTINCT l_suppkey)             AS n_suppliers,
           count(DISTINCT l_partkey)             AS n_parts,
           count(DISTINCT l_returnflag)          AS n_flags
    FROM lineitem
    """,
    tags=("aggregate", "distinct"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT ...) — absent from the reference (no Distinct
    handling at all). Spark expands multi-distinct into an
    expand+two-phase aggregate; exact, not approximate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_returnflag").alias("n_flags"),
    )


@register(
    "agg_having",
    oracle="""
    SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 700
    """,
    tags=("aggregate", "having"),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — never handled by the reference (UnresolvedHaving
    unimplemented, SURVEY.md §2.4); a post-aggregation filter here."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_tq"))
        .filter(F.col("_tq") > 700)
        .select("l_suppkey", F.round("_tq", 2).alias("total_qty"))
    )


@register(
    "agg_minmax_dates",
    oracle="""
    SELECT o_orderstatus,
           strftime(min(o_orderdate), '%Y-%m-%d') AS first_order,
           strftime(max(o_orderdate), '%Y-%m-%d') AS last_order,
           min(o_orderpriority)                   AS min_priority,
           max(o_orderpriority)                   AS max_priority
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("aggregate", "minmax"),
)
def agg_minmax_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX over temporal and string columns — the ordering-based
    aggregates the reference's live path lacked entirely."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_order"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
        F.min("o_orderpriority").alias("min_priority"),
        F.max("o_orderpriority").alias("max_priority"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total) — a Spark
    superset capability; one Expand + single shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_quantity), 4)         AS var_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample stddev/variance)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
    )


@register(
    "agg_approx_distinct",
    # HLL++ estimates are engine-specific numbers, so the raw estimate
    # can't hash-match DuckDB. Instead both engines emit a
    # deterministic relation: exact distinct counts (genuinely
    # cross-checked) plus in-band booleans — Spark computes
    # |estimate - exact| <= 5*rsd empirically, DuckDB emits the
    # guarantee (TRUE). A hash match therefore certifies the HLL
    # estimates really fall inside the documented error band.
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           count(DISTINCT l_suppkey) AS exact_supps,
           TRUE AS parts_in_band,
           TRUE AS supps_in_band
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate", "approx", "scale"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB path where the
    exact expand+shuffle of COUNT DISTINCT is too expensive — fixed
    sketch memory per group, mergeable across partitions.

    Gate form co-computes the exact counts ONLY to certify the sketch:
    booleans assert each estimate within 5*rsd (rsd=0.02 -> 10%) of
    exact. Production calls use the approx aggregate alone."""
    li = load_table(spark, sf_dir, "lineitem")
    rsd = 0.02
    g = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd).alias("_ap"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_suppkey", rsd).alias("_as"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
    )
    band = 5 * rsd
    return g.select(
        "l_returnflag",
        "exact_parts",
        "exact_supps",
        (F.abs(F.col("_ap") - F.col("exact_parts")) <= band * F.col("exact_parts")).alias(
            "parts_in_band"
        ),
        (F.abs(F.col("_as") - F.col("exact_supps")) <= band * F.col("exact_supps")).alias(
            "supps_in_band"
        ),
    )


@register(
    "agg_approx_percentiles",
    # GK sketch estimates are engine-specific, so the raw quantile
    # can't hash-match DuckDB. Both engines emit a deterministic
    # relation instead: group counts (cross-checked) plus in-band
    # booleans. Spark checks its GK estimate against ITS exact
    # quantiles at p +/- delta; the oracle derives the same band from
    # quantile_cont — where the relation is the GK guarantee itself,
    # so it evaluates TRUE. A hash match certifies the estimates
    # really land inside the rank-error band.
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           quantile_cont(l_extendedprice, 0.50)
               BETWEEN quantile_cont(l_extendedprice, 0.495)
                   AND quantile_cont(l_extendedprice, 0.505) AS q50_in_band,
           quantile_cont(l_extendedprice, 0.95)
               BETWEEN quantile_cont(l_extendedprice, 0.945)
                   AND quantile_cont(l_extendedprice, 0.955) AS q95_in_band,
           quantile_cont(l_extendedprice, 0.99)
               BETWEEN quantile_cont(l_extendedprice, 0.985)
                   AND quantile_cont(l_extendedprice, 0.995) AS q99_in_band
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate", "approx", "scale"),
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna summary): the 100 TB path
    where exact percentiles' global sort per group is too expensive —
    bounded sketch memory per group, mergeable across partitions
    (map-side partials combine like any algebraic aggregate).
    Completes the sketch family: distinct -> approx_count_distinct /
    HLL, quantiles -> this.

    Gate form: accuracy=10000 bounds rank error at eps=1e-4; the
    booleans check each estimate against exact quantiles at
    p +/- 0.005 (50x margin over eps, still a tight band). The exact
    quantiles are co-computed ONLY for certification — production
    calls use the sketch alone."""
    li = load_table(spark, sf_dir, "lineitem")
    delta = 0.005
    aggs = [F.count(F.lit(1)).alias("n")]
    for tag, p in (("q50", 0.50), ("q95", 0.95), ("q99", 0.99)):
        aggs.append(
            F.percentile_approx("l_extendedprice", F.lit(p), 10000).alias(f"_{tag}_est")
        )
        aggs.append(
            F.expr(f"percentile(l_extendedprice, {p - delta})").alias(f"_{tag}_lo")
        )
        aggs.append(
            F.expr(f"percentile(l_extendedprice, {p + delta})").alias(f"_{tag}_hi")
        )
    g = li.groupBy("l_returnflag").agg(*aggs)
    return g.select(
        "l_returnflag",
        "n",
        *[
            (
                (F.col(f"_{tag}_est") >= F.col(f"_{tag}_lo"))
                & (F.col(f"_{tag}_est") <= F.col(f"_{tag}_hi"))
            ).alias(f"{tag}_in_band")
            for tag in ("q50", "q95", "q99")
        ],
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("aggregate", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of rollup/cube),
    through the SQL surface over a registered view — one shuffle
    computes all three groupings via Catalyst's Expand. The reference
    had no grouping sets of any kind (SURVEY.md §2.4)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(array_agg(DISTINCT c_nationkey)), ',') AS nations
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("aggregate", "array", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (collect_set) with an explicit sort for
    determinism — collection order is partition-arrival order on any
    distributed engine, so an unsorted collect can never be
    golden-compared. Arrays are first-class columns in the engine
    (the reference had none, SURVEY.md §1.2); the final
    concat-to-string is only for cross-engine value hashing, where
    array physical representations (numpy vs list) differ."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("c_nationkey"))).alias("nations")
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("aggregate", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`). Exact quantiles need the group's values
    materialized — at 100 TB switch to `approx_percentile` (t-digest,
    mergeable, bounded memory); this entry pins the exact path."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.90)"), 4).alias("p90"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_corr_covar",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("aggregate", "stats", "corr"),
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (Pearson corr, sample covariance) — both
    single-pass mergeable aggregates (sum/sum-of-products moments), so
    they scale exactly like SUM: partial per partition, one merge."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_hll_mergeable",
    # Sketch binaries and estimates are engine-specific; both engines
    # emit a deterministic relation instead: exact per-scope distinct
    # counts (cross-checked) plus an in-band boolean — Spark checks
    # its DataSketches estimate within 5% of exact empirically, the
    # oracle emits the guarantee (TRUE). A hash match certifies every
    # per-nation estimate AND the sketch-union ALL estimate land in
    # band — i.e. the mergeability path itself is certified.
    oracle="""
    SELECT CAST(c_nationkey AS VARCHAR) AS scope,
           count(DISTINCT c_custkey) AS exact_distinct,
           TRUE AS est_in_band
    FROM customer GROUP BY c_nationkey
    UNION ALL
    SELECT 'ALL', count(DISTINCT c_custkey), TRUE FROM customer
    """,
    tags=("aggregate", "sketch", "hll", "approx", "scale"),
)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL):
    build one sketch per nation, then union the sketches to a global
    estimate WITHOUT touching the raw data again — the property that
    makes sketches the 100 TB answer for distinct counts: per-
    partition/per-day sketches persist alongside rollups and compose
    to any coarser grouping (contrast exact COUNT DISTINCT, which
    cannot re-aggregate). Output: per-nation rows plus the merged ALL
    row; exact counts ride along only to certify the estimates (gate
    form — production persists the sketches themselves)."""
    cust = load_table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("hll_cust_v")
    per_nation = cust.groupBy("c_nationkey").agg(
        F.expr("hll_sketch_agg(c_custkey)").alias("sk"),
        F.countDistinct("c_custkey").alias("exact_distinct"),
    )
    per_nation.createOrReplaceTempView("hll_per_nation_v")
    return spark.sql(
        """
        SELECT CAST(c_nationkey AS STRING) AS scope,
               exact_distinct,
               abs(hll_sketch_estimate(sk) - exact_distinct)
                   <= 0.05 * exact_distinct AS est_in_band
        FROM hll_per_nation_v
        UNION ALL
        SELECT 'ALL',
               (SELECT count(DISTINCT c_custkey) FROM hll_cust_v),
               abs(hll_sketch_estimate(hll_union_agg(sk))
                   - (SELECT count(DISTINCT c_custkey) FROM hll_cust_v))
                   <= 0.05 * (SELECT count(DISTINCT c_custkey) FROM hll_cust_v)
                   AS est_in_band
        FROM hll_per_nation_v
        """
    )


@register(
    "agg_count_min_sketch",
    # Count-min estimates depend on the hash family, so the raw
    # estimates can't hash-match DuckDB; the established sketch-oracle
    # pattern applies (see agg_approx_distinct): exact counts are
    # genuinely cross-checked, and the booleans encode the CM
    # guarantee — no undercount ever, overcount <= eps * total — which
    # the oracle emits as its TRUE ground truth. within_eps is only
    # PROBABILISTIC (~0.7%/key failure odds for a fresh hash family)
    # but deterministic per fixture under the fixed xxhash64 seeds;
    # if a future fixture/scale change flips it, triage as data (pick
    # new seeds or widen to 2*eps), not as a code regression.
    oracle="""
    SELECT event_type, count(*) AS exact_n,
           TRUE AS no_undercount, TRUE AS within_eps
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("aggregate", "approx", "sketch", "scale"),
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch as a RELATION: frequency estimation in fixed
    memory, the streaming/heavy-hitter companion to the HLL and GK
    sketches (completing the sketch family: distinct -> HLL,
    quantiles -> GK, frequencies -> this).

    Rather than an opaque binary blob, the sketch IS a DataFrame:
    ``(row, bucket, c)`` where row indexes the DEPTH independent hash
    functions (xxhash64 seeded by row) and bucket = hash mod WIDTH.
    Building it is one map-side explode (x DEPTH) into a groupBy of
    at most DEPTH x WIDTH groups — map-side combine collapses each
    task to sketch size, so the shuffle is O(tasks x DEPTH x WIDTH),
    independent of event volume; and because it's an ordinary count
    aggregation, partial sketches MERGE by addition for free (the
    property that lets 1000 executors each sketch their shard). A
    point query is a DEPTH-row broadcast join + min.

    Guarantee (depth 5, width 2048): estimate never undercounts, and
    overcounts by more than eps*N (eps = e/width ~ 0.0013) with
    probability < e^-depth ~ 0.7% per query — deterministic here
    (fixed seeds), verified per-key by the gate booleans."""
    import math

    DEPTH, WIDTH = 5, 2048
    ev = load_table(spark, sf_dir, "events")

    def buckets(col: str):
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(WIDTH)).alias("bucket"),
                )
                for i in range(DEPTH)
            ]
        )

    sketch = (
        ev.select(F.explode(buckets("event_type")).alias("rb"))
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = ev.agg(F.count(F.lit(1)).alias("total"))
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_n"))
    key_rows = (
        exact.select("event_type", F.explode(buckets("event_type")).alias("rb"))
        .select("event_type", "rb.row", "rb.bucket")
    )
    est = (
        key_rows.join(sketch, ["row", "bucket"], "left")
        .groupBy("event_type")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est"))
    )
    eps = math.e / WIDTH
    return (
        est.join(exact, "event_type")
        .crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "exact_n",
            (F.col("est") >= F.col("exact_n")).alias("no_undercount"),
            (F.col("est") <= F.col("exact_n") + eps * F.col("total")).alias("within_eps"),
        )
        .orderBy("event_type")
    )


_GROUP_BY_ALL = """
    SELECT c_mktsegment, c_nationkey,
           count(*) AS n,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    GROUP BY ALL
    ORDER BY ALL
"""


@register(
    "agg_group_by_all",
    oracle=_GROUP_BY_ALL,
    tags=("aggregate", "group-by-all", "sql-surface"),
)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` / ``ORDER BY ALL`` (Spark 4.x, DuckDB): the
    analyzer derives the grouping keys from the non-aggregate select
    items and the final order from the full output row — the modern
    SQL ergonomics surface, identical text on both engines. Plans
    exactly like the explicit form (`agg_grouped`): one
    map-side-combined hash aggregate, one exchange on the derived
    keys."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_GROUP_BY_ALL)


_WEIGHTED_MEDIAN_ORACLE = """
    WITH w AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
               CAST(round(l_quantity) AS BIGINT) AS wt
        FROM lineitem
    ),
    cum AS (
        SELECT l_returnflag, price_c, wt,
               CAST(sum(wt) OVER (PARTITION BY l_returnflag
                                  ORDER BY price_c
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
               CAST(sum(wt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
        FROM w
    )
    SELECT l_returnflag,
           round(CAST(min(price_c) AS BIGINT) / 1e2, 2) AS weighted_median_price,
           CAST(min(tw) AS BIGINT) AS total_weight
    FROM cum
    WHERE cw * 2 >= tw
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@register(
    "agg_weighted_median",
    oracle=_WEIGHTED_MEDIAN_ORACLE,
    tags=("aggregate", "weighted-median", "quantile"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per group (price weighted by quantity): the
    lower weighted median = the smallest value whose cumulative
    weight reaches half the group total — the robust central-tendency
    statistic behind volume-weighted price analytics and
    size-weighted length statistics (neither engine ships a weighted
    median aggregate; both derive it from the same cumulative-weight
    window, so the gate certifies the derivation).

    Determinism: prices quantized to integer cents and weights to
    integer units BEFORE the cumulative sum, so every comparison
    (cw*2 >= tw) is exact integer arithmetic. Equal-price rows'
    relative order does not matter: ROWS cumulative sums differ
    within a tie run, but the FIRST row crossing half-total always
    carries the same price value, and min(price_c) over the crossing
    set is order-independent.

    Scale shape: one shuffle on the group key, one ordered window
    pass per group (the per-group sort an exact quantile inherently
    needs), then a tiny aggregate; at extreme group widths swap to
    the mergeable GK sketch (`agg_approx_percentiles`) — weighted,
    by feeding each row weight-many times or a weighted-sketch
    variant."""
    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round("l_quantity").cast("long").alias("wt"),
    )
    from pyspark.sql import Window as W

    win = W.partitionBy("l_returnflag").orderBy("price_c")
    cum = w.select(
        "l_returnflag",
        "price_c",
        F.sum("wt").over(win.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("cw"),
        F.sum("wt").over(W.partitionBy("l_returnflag")).alias("tw"),
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("price_c") / F.lit(1e2), 2).alias("weighted_median_price"),
            F.min("tw").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_hll_intersection",
    # Like agg_approx_distinct: sketch estimates are engine-specific,
    # so both engines emit the exact audience sizes (genuinely
    # cross-checked) plus an in-band boolean — Spark computes
    # |est_inter - exact_inter| <= 5*rsd*(|A| + |B| + |A∪B|)
    # empirically (inclusion-exclusion compounds the three sketch
    # errors, so the band is the sum of the three per-sketch bands),
    # DuckDB emits the guarantee (TRUE).
    oracle="""
    WITH pu AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS a_view,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b_purchase,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a_click,
               max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS b_error
        FROM events GROUP BY user_id
    )
    SELECT 'view x purchase' AS pair,
           CAST(sum(a_view) AS BIGINT) AS exact_a,
           CAST(sum(b_purchase) AS BIGINT) AS exact_b,
           CAST(sum(CASE WHEN a_view = 1 OR b_purchase = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS exact_union,
           CAST(sum(a_view * b_purchase) AS BIGINT) AS exact_inter,
           TRUE AS inter_in_band
    FROM pu
    UNION ALL
    SELECT 'click x error',
           CAST(sum(a_click) AS BIGINT),
           CAST(sum(b_error) AS BIGINT),
           CAST(sum(CASE WHEN a_click = 1 OR b_error = 1 THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(sum(a_click * b_error) AS BIGINT),
           TRUE
    FROM pu
    ORDER BY pair
    """,
    tags=("aggregate", "approx", "sketch", "scale"),
)
def agg_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate audience-overlap via HLL inclusion-exclusion:
    |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B) — the segment-overlap
    estimator (viewers who purchase, clickers who hit errors) at
    sketch cost. HLLs union losslessly but cannot intersect, so
    inclusion-exclusion is THE standard workaround; its error
    compounds (three sketches), which is exactly what the gate
    certifies: the in-band boolean asserts the estimate within the
    SUM of the three per-sketch 5*rsd bands of the exact overlap.

    Scale shape: the three sketches build in ONE corpus pass
    (CASE-gated approx_count_distinct — null inputs skipped,
    mergeable partials, fixed memory); the exact sides (audit only)
    take one per-user flag reduction. At 100 TB production drops the
    exact columns and keeps the single sketch pass."""
    ev = load_table(spark, sf_dir, "events")
    rsd = 0.02
    band = 5 * rsd

    def est(cond: str) -> F.Column:
        return F.expr(
            f"approx_count_distinct(CASE WHEN {cond} THEN user_id END, {rsd})"
        )

    pu = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("a_view"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("b_purchase"),
        F.max((F.col("event_type") == "click").cast("int")).alias("a_click"),
        F.max((F.col("event_type") == "error").cast("int")).alias("b_error"),
    )

    rows = []
    for pair, a, b, ea, eb in (
        ("view x purchase", "view", "purchase", "a_view", "b_purchase"),
        ("click x error", "click", "error", "a_click", "b_error"),
    ):
        exact = pu.agg(
            F.sum(ea).cast("long").alias("exact_a"),
            F.sum(eb).cast("long").alias("exact_b"),
            F.sum(
                ((F.col(ea) == 1) | (F.col(eb) == 1)).cast("int")
            ).cast("long").alias("exact_union"),
            F.sum(F.col(ea) * F.col(eb)).cast("long").alias("exact_inter"),
        )
        ests = ev.agg(
            est(f"event_type = '{a}'").alias("est_a"),
            est(f"event_type = '{b}'").alias("est_b"),
            est(f"event_type IN ('{a}', '{b}')").alias("est_u"),
        )
        rows.append(
            exact.crossJoin(ests).select(
                F.lit(pair).alias("pair"),
                "exact_a",
                "exact_b",
                "exact_union",
                "exact_inter",
                (
                    F.abs(
                        (F.col("est_a") + F.col("est_b") - F.col("est_u"))
                        - F.col("exact_inter")
                    )
                    <= F.lit(band)
                    * (F.col("exact_a") + F.col("exact_b") + F.col("exact_union"))
                ).alias("inter_in_band"),
            )
        )
    return rows[0].unionByName(rows[1]).orderBy("pair")


@register(
    "agg_decimal_money_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR)
               AS sum_exact,
           round(sum(l_extendedprice), 2) AS sum_double
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "decimal", "exactness"),
)
def agg_decimal_money_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL money aggregation next to the double-precision
    sum — the SURVEY §1.2 note made live: the reference stores TPC-H
    money as Float/Double (its 5-type system has no decimal;
    Microbase.scala:971-977), so every money sum it prints carries
    float addition error that grows with row count. Casting to
    DECIMAL(14,2) at the scan makes the sum EXACT (integer
    arithmetic under the hood) and order-independent — at 100 TB,
    summing 10^11 prices in doubles drifts in the cents while the
    decimal sum is bit-stable regardless of partitioning or AQE
    re-planning. Emitted side by side so the readout shows what the
    upgrade buys; the exact sum travels as its canonical decimal
    STRING so the comparison is digit-for-digit (python Decimal vs
    float64 objects would false-mismatch in raw-object comparators
    even when equal); both engines agree on each column
    independently."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(14,2)"))
            .cast("string")
            .alias("sum_exact"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_double"),
        )
        .orderBy("l_returnflag")
    )
