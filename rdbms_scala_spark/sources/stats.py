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

from functools import reduce

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
    skew split; extreme: `join_skew_salted`'s auto-threshold salting). Shapes:
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


# --- Deterministic-HLL table stats: the 100 TB NDV path -------------
#
# `maintenance_table_stats` keeps exact COUNT(DISTINCT) so every cell
# is oracle-certified, but the exact-NDV Expand is the expensive part
# of the profile pass at scale. This variant swaps NDV for a
# REPLAYABLE HyperLogLog: both engines hash each value with md5, take
# the low 10 bits as the bucket and the leading-zero count of the
# remaining 50 bits as rho, keep max(rho) per bucket, and evaluate
# the HLL estimator in integer arithmetic (harmonic sum as exact
# integers, alpha as a 1e6-scaled rational, linear counting with the
# 1e6-quantized-ln discipline from `text_char_entropy`). The estimate
# is therefore bit-identical across engines and the value hash
# certifies the ESTIMATE ITSELF — stronger than the in-band pattern
# (`agg_approx_distinct`), where only a band boolean crosses engines.
# Accuracy is still certified: the ORACLE co-computes exact NDV
# (cheap on DuckDB at gate scale) and evaluates the band check; the
# Spark side asserts the claim as a literal, so an out-of-band
# estimate hash-mismatches on that boolean.
#
# Scale shape vs the exact query: no Expand, no distinct shuffle —
# one pruned scan per column computing its md5, map-side-combined into
# 3 x 1024 (col, bucket) cells, plus the plain wide min/max pass.
# Branch rule is integer-deterministic: linear counting while >= 64
# of the 1024 buckets are empty (load factor < ~2.8), raw HLL above.

_HLL_M = 1024  # buckets (2^10); rse ~ 1.04/sqrt(m) = 3.25%
_HLL_TERM_BITS = 20  # harmonic terms quantized to 2^(20 - min(M,20))
_HLL_ALPHA_Q = 720541  # alpha_1024 = 0.7213/(1 + 1.079/1024), x 1e6
# alpha * m^2 * 2^TERM_BITS * 1e-6 pre-multiplied: fits int64
_HLL_NUM = _HLL_ALPHA_Q * _HLL_M * _HLL_M * (1 << _HLL_TERM_BITS)
_HLL_LC_MIN_EMPTY = 64  # >= this many empty buckets -> linear counting

# (column, value-as-string render, Spark hash input, DuckDB hash
# input). String renders must be byte-identical across engines: ints
# and varchars cast verbatim, the timestamp column reduced to its
# ISO date.
_SKETCH_COLS: list[tuple[str, str, str]] = [
    ("l_orderkey", "CAST(l_orderkey AS STRING)", "CAST(l_orderkey AS VARCHAR)"),
    ("l_returnflag", "CAST(l_returnflag AS STRING)", "CAST(l_returnflag AS VARCHAR)"),
    (
        "l_shipdate",
        "CAST(CAST(l_shipdate AS DATE) AS STRING)",
        "CAST(CAST(l_shipdate AS DATE) AS VARCHAR)",
    ),
]


def _hll_rho(div: str) -> str:
    """rho of the 50 bits above the bucket: 51 - bit_length, via the
    cross-engine-exact length(bin(x)) trick (events_value_log_histogram).
    ``div`` is the dialect's integer-division operator."""
    rest = f"(h {div} {_HLL_M})"
    return (
        f"CASE WHEN {rest} = 0 THEN 51 "
        f"ELSE 51 - length(bin({rest})) END"
    )


def _hll_estimate(div: str) -> str:
    """Integer HLL estimator over per-column (s, v): raw harmonic
    estimate by exact integer division, or 1e6-quantized-ln linear
    counting while >= _HLL_LC_MIN_EMPTY buckets are empty."""
    est_raw = f"({_HLL_NUM} {div} (s * 1000000))"
    lnq = (
        f"CAST(round(ln(CAST({_HLL_M} AS DOUBLE) / v) * 1000000.0, 0) "
        "AS BIGINT)"
    )
    est_lc = f"(({_HLL_M} * {lnq}) {div} 1000000)"
    return (
        f"CAST(CASE WHEN v >= {_HLL_LC_MIN_EMPTY} THEN {est_lc} "
        f"ELSE {est_raw} END AS BIGINT)"
    )


def _sketch_oracle() -> str:
    term = f"CAST((1 << ({_HLL_TERM_BITS} - least(m, {_HLL_TERM_BITS}))) AS BIGINT)"
    hashed = "\n        UNION ALL ".join(
        f"SELECT '{c}' AS col_name, "
        f"CAST(('0x' || substr(md5({duck}),1,15)) AS BIGINT) AS h "
        f"FROM lineitem WHERE {c} IS NOT NULL"
        for c, _spark, duck in _SKETCH_COLS
    )
    exact = "\n        UNION ALL ".join(
        f"SELECT '{c}' AS col_name, "
        f"CAST(count(DISTINCT {duck}) AS BIGINT) AS exact_ndv FROM lineitem"
        for c, _spark, duck in _SKETCH_COLS
    )
    # min/max aggregate on the NATIVE type, the render wraps the
    # result (string-min over a VARCHAR render would sort "100"<"99")
    wide = "\n        UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
        f"{duck.replace(c, f'min({c})', 1)} AS min_value, "
        f"{duck.replace(c, f'max({c})', 1)} AS max_value FROM lineitem"
        for c, _spark, duck in _SKETCH_COLS
    )
    return f"""
    WITH hashed AS (
        {hashed}
    ),
    sk AS (
        SELECT col_name, h % {_HLL_M} AS bucket, max({_hll_rho('//')}) AS m
        FROM hashed GROUP BY col_name, h % {_HLL_M}
    ),
    filled AS (
        SELECT c.col_name, coalesce(sk.m, 0) AS m
        FROM (SELECT DISTINCT col_name FROM hashed) c
        CROSS JOIN range({_HLL_M}) r(b)
        LEFT JOIN sk ON sk.col_name = c.col_name AND sk.bucket = r.b
    ),
    est AS (
        SELECT col_name, {_hll_estimate('//')} AS ndv_sketch
        FROM (
            SELECT col_name,
                   CAST(sum({term}) AS BIGINT) AS s,
                   CAST(count(*) FILTER (WHERE m = 0) AS BIGINT) AS v
            FROM filled GROUP BY col_name
        )
    ),
    exact AS (
        {exact}
    ),
    wide AS (
        {wide}
    )
    SELECT w.col_name, w.n_rows, w.n_nulls, e.ndv_sketch,
           abs(e.ndv_sketch - x.exact_ndv)
               <= greatest(0.15 * x.exact_ndv, 2) AS ndv_in_band,
           w.min_value, w.max_value
    FROM wide w
    JOIN est e ON e.col_name = w.col_name
    JOIN exact x ON x.col_name = w.col_name
    ORDER BY w.col_name
    """


@register(
    "maintenance_table_stats_sketch",
    oracle=_sketch_oracle(),
    tags=("maintenance", "stats", "sketch", "hll", "approx", "scale"),
)
def maintenance_table_stats_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`maintenance_table_stats` with NDV from the deterministic
    integer HLL replay (see the module-block comment above): no
    exact-distinct Expand, one pruned md5 scan per column combined
    map-side into 1024 sketch cells each (the r15 branch form — see
    the in-body comment), plus the plain one-pass min/max/null
    aggregate. `ndv_in_band` is evaluated BY THE ORACLE against its
    exact NDV (Spark asserts TRUE): an out-of-band estimate fails the
    gate on that column's hash.

    Honest cost note (round 14, after the noop-timing epoch fix):
    this pass is NOT faster than the exact pass at the measured
    scales (x64 SCALE tier: 31.1 s vs the exact pass's 12.2 s) — the
    md5-per-column hashing that buys the cross-engine deterministic
    replay costs more per row than exact NDV's native hashing, and
    the pre-r14 row claiming the opposite was a count()-pruned
    artifact. What the sketch form buys is MERGEABILITY — fixed-size
    per-partition state that composes across snapshots/increments
    (`maintenance_incremental_stats`) where the exact pass must
    re-scan history — and bounded memory per column at any NDV. A
    production profile pass drops the determinism tax by swapping
    md5 for xxhash64 (or Spark's native approx_count_distinct, which
    this module keeps as `agg_approx_distinct`); the md5 replay here
    is the price of an oracle-checkable sketch."""
    li = load_table(spark, sf_dir, "lineitem")

    # One pruned scan PER COLUMN, each map-side-combined into its own
    # 1024 buckets, unioned as (col_name, bucket, m) — replacing the
    # round-8 `stack()` form (r15 optimization, guide §1/§4): the
    # Generate node materialized 3x the rows (each tagged with a
    # per-row column-name string) through a single (string, int)-keyed
    # aggregate, measured 2.9 s vs 1.5 s for these branches on the
    # identical data, with identical output. At scale the trade is
    # byte-neutral: columnar pruning means the three single-column
    # scans read exactly the bytes the one three-column scan did,
    # while the per-branch partial aggregates keep 1024 cells each
    # instead of streaming the tripled row count into one agg.
    branches = []
    for c, sp, _duck in _SKETCH_COLS:
        h = f"CAST(conv(substr(md5({sp}),1,15),16,10) AS BIGINT)"
        branches.append(
            li.selectExpr(f"{h} AS h")
            .filter(F.col("h").isNotNull())
            .selectExpr(f"h % {_HLL_M} AS bucket", f"{_hll_rho('DIV')} AS rho")
            .groupBy("bucket")
            .agg(F.max("rho").alias("m"))
            .select(F.lit(c).alias("col_name"), "bucket", "m")
        )
    sk = reduce(lambda a, b: a.unionByName(b), branches)
    # A column whose hash is NULL on every row yields an empty branch
    # and disappears from the output entirely (no ndv-0 row) — this is
    # intentional and oracle-symmetric: DuckDB's filled CTE likewise
    # derives columns from `hashed`, so both engines drop it (ADVICE
    # r15; the pre-r15 grid form guaranteed one row per column).
    # Closed-form absent-bucket arithmetic (r15): every bucket absent
    # from sk is m=0 by construction (rho >= 1 for any present row),
    # so s gains (M - n_present) full 2^TERM_BITS terms and v IS the
    # absent count — the names x range(1024) grid + left join the
    # round-8 form materialized to say the same thing is gone (two
    # broadcast stages saved; integers identical).
    term = F.expr(
        f"CAST(shiftleft(1, {_HLL_TERM_BITS} - "
        f"least(m, {_HLL_TERM_BITS})) AS BIGINT)"
    )
    est = (
        sk.groupBy("col_name")
        .agg(F.sum(term).alias("s_present"), F.count(F.lit(1)).alias("n_present"))
        .select(
            "col_name",
            (
                F.col("s_present")
                + (F.lit(_HLL_M) - F.col("n_present")) * F.lit(1 << _HLL_TERM_BITS)
            ).alias("s"),
            (F.lit(_HLL_M) - F.col("n_present")).cast("long").alias("v"),
        )
        .selectExpr("col_name", f"{_hll_estimate('DIV')} AS ndv_sketch")
    )

    wide_aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, sp, _d in _SKETCH_COLS:
        wide_aggs.extend(
            [
                F.count(F.col(c)).alias(f"{c}__nn"),
                F.expr(sp.replace(c, f"min({c})", 1)).alias(f"{c}__min"),
                F.expr(sp.replace(c, f"max({c})", 1)).alias(f"{c}__max"),
            ]
        )
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__min, {c}__max" for c, _sp, _d in _SKETCH_COLS
    )
    wide = (
        li.agg(*wide_aggs)
        .selectExpr(
            f"stack({len(_SKETCH_COLS)}, {stack_args}) AS "
            "(col_name, __nn, min_value, max_value)",
            "n_rows",
        )
        .select(
            "col_name",
            "n_rows",
            (F.col("n_rows") - F.col("__nn")).alias("n_nulls"),
            "min_value",
            "max_value",
        )
    )
    return (
        wide.join(F.broadcast(est), "col_name")
        .select(
            "col_name",
            "n_rows",
            "n_nulls",
            "ndv_sketch",
            F.lit(True).alias("ndv_in_band"),
            "min_value",
            "max_value",
        )
        .orderBy("col_name")
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


_INCR_SPLIT_DAY = 16  # events before this day-of-month are "base"


@register(
    "maintenance_incremental_stats",
    oracle=f"""
    WITH tagged AS (
        SELECT CASE WHEN day(CAST(ts AS DATE)) < {_INCR_SPLIT_DAY}
                    THEN 'base' ELSE 'delta' END AS part,
               value, epoch_us(ts) AS ts_us
        FROM events
    ),
    parts AS (
        SELECT part,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents,
               CAST(min(ts_us) AS BIGINT) AS min_ts_us,
               CAST(max(ts_us) AS BIGINT) AS max_ts_us
        FROM tagged GROUP BY part
    )
    SELECT * FROM parts
    UNION ALL
    SELECT 'merged',
           CAST(sum(n_rows) AS BIGINT),
           CAST(sum(sum_value_cents) AS BIGINT),
           min(min_ts_us),
           max(max_ts_us)
    FROM parts
    ORDER BY part
    """,
    tags=("maintenance", "stats", "incremental", "scale"),
)
def maintenance_incremental_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental statistics maintenance: per-partition stat rows
    ('base' = history, 'delta' = the newly-landed partition) MERGED
    into table-level stats without rescanning history — the
    discipline that keeps CBO stats fresh at 100 TB, where a full
    ANALYZE after every ingest is unaffordable. Every stat here is a
    mergeable summary (count/sum/min/max fold associatively:
    merged = f(stats(base), stats(delta)), never f(rescan)); NDV
    joins the scheme as a mergeable HLL sketch — demonstrated
    separately by `agg_hll_mergeable`, whose union-then-estimate is
    exactly this merge step. Value sums are held as integer cents so
    base+delta merge is bit-exact, not float-drifting. The 'merged'
    row is derived FROM the part rows (one tiny 2-row aggregate),
    and the oracle recomputes both levels to certify the fold."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        F.when(F.dayofmonth(F.to_date("ts")) < _INCR_SPLIT_DAY, "base")
        .otherwise("delta")
        .alias("part"),
        "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    parts = tagged.groupBy("part").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "sum_value_cents"
        ),
        F.min("ts_us").alias("min_ts_us"),
        F.max("ts_us").alias("max_ts_us"),
    )
    merged = parts.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_value_cents").alias("sum_value_cents"),
        F.min("min_ts_us").alias("min_ts_us"),
        F.max("max_ts_us").alias("max_ts_us"),
    ).select(F.lit("merged").alias("part"), "*")
    return parts.unionByName(merged).orderBy("part")


# ---------------------------------------------------------------------------
# Round 15: runtime plan-metrics audit — the cost/lineage readout's
# trust anchor (the batch analog of streaming_throughput_progress's
# progress ledger, r14). Production pipelines alarm on per-query
# runtime metrics (rows scanned, rows joined, bytes shuffled) pulled
# from the executed plan's SQLMetrics; before a dashboard trusts
# those numbers, the row ACCOUNTING underneath them must be exact.
# Bytes/time metrics are host-shaped and belong to the bench rows;
# the row counts are deterministic SEMANTIC quantities a second
# engine can recompute — so they are what the oracle certifies.


def _physical_nodes(jdf) -> list:
    """Pre-order walk of the EXECUTED physical plan via py4j,
    descending through the adaptive-execution wrappers: the
    AdaptiveSparkPlanExec root (-> final plan), materialized
    QueryStageExec stage boundaries (-> their stage plan) and
    ReusedExchangeExec (-> the reused child). Returns the flat node
    list, parents before children."""
    out: list = []
    stack = [jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            stack.append(node.executedPlan())
            continue
        if cls.endswith("QueryStageExec"):
            stack.append(node.plan())
            continue
        if cls == "ReusedExchangeExec":
            stack.append(node.child())
            continue
        out.append(node)
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return out


def _node_rows(nodes: list, name_part: str, *string_parts: str) -> int:
    """numOutputRows of the first node (pre-order) whose nodeName
    contains ``name_part`` and whose simpleString contains every one
    of ``string_parts``."""
    for node in nodes:
        if name_part not in node.nodeName():
            continue
        s = node.simpleString(1000)
        if any(part not in s for part in string_parts):
            continue
        metrics = node.metrics()
        if metrics.contains("numOutputRows"):
            return int(metrics.apply("numOutputRows").value())
    raise RuntimeError(
        f"plan-metrics audit: no node matching name~'{name_part}' "
        f"string~{string_parts} with a numOutputRows metric"
    )


@register(
    "maintenance_plan_metrics_audit",
    oracle="""
    WITH filt AS (
        SELECT l_orderkey FROM lineitem WHERE l_orderkey % 7 = 0
    ),
    joined AS (
        SELECT o.o_orderpriority
        FROM filt l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT 'filter_rows' AS stage,
           CAST((SELECT count(*) FROM filt) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'join_rows', CAST(count(*) AS BIGINT) FROM joined
    UNION ALL
    SELECT 'result_groups',
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM joined
    UNION ALL
    SELECT 'result_rows',
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM joined
    ORDER BY stage
    """,
    tags=("maintenance", "metrics", "observability", "lineage"),
)
def maintenance_plan_metrics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime SQLMetrics row-accounting audit: execute a fixed
    filter -> join -> aggregate query (lineitem keys divisible by 7,
    joined to orders, grouped by order priority), then read the
    numOutputRows metric off the executed plan's Filter, Join and
    final Aggregate nodes and emit them as a (stage, n_rows) ledger
    alongside the collected result-row count. The oracle recomputes
    every stage's row count semantically, so the query certifies that
    the metrics a cost dashboard reads off `queryExecution.metrics`
    agree with ground truth — the batch analog of the streaming
    progress ledger (streaming/jobs.py, r14), and the readout the
    reference's rule-free interpreter has no surface for (its
    executeSelect pipeline, Microbase.scala:943-1088, exposes no
    per-operator counters).

    Stage identification is structural, not positional: the audited
    filter carries a deliberately parquet-UNPUSHABLE predicate
    (`l_orderkey % 7 = 0` — modulo does not translate to a parquet
    filter), so its Filter node survives as a real operator whose
    numOutputRows is the semantic post-filter count regardless of
    row-group layout or whether the table arrives cached
    (InMemoryTableScan) or scanned; it is matched by the '%' AND the
    lineitem key name in its condition string — the '%' alone is not
    unique because Catalyst's equi-join constraint propagation INFERS
    `o_orderkey % 7 = 0` on the orders side and plants a second
    modulo filter there (the first thing this audit's own metrics
    surfaced while being built), and the join's injected isnotnull
    filters never contain '%'. The final aggregate is the first
    Aggregate node in
    pre-order (nearer the root than its partial). The walk descends
    through AQE stage wrappers, so the audit holds under adaptive
    re-planning.

    Scale shape: the audited query is one broadcast-or-shuffle join
    plus a two-phase aggregate; the metric walk is driver control
    plane over an already-executed plan, and the collect is bounded
    at the group count (5 order priorities). At 100 TB the identical
    readout comes from the production query's own executed plan —
    nothing here is test-only machinery."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    audited = (
        li.filter(F.col("l_orderkey") % 7 == 0)
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    result = audited.collect()  # drives execution; populates metrics
    nodes = _physical_nodes(audited._jdf)
    ledger = [
        ("filter_rows", _node_rows(nodes, "Filter", "%", "l_orderkey")),
        ("join_rows", _node_rows(nodes, "Join")),
        ("result_groups", _node_rows(nodes, "Aggregate")),
        ("result_rows", len(result)),
    ]
    return spark.createDataFrame(
        ledger, "stage string, n_rows long"
    ).orderBy("stage")
