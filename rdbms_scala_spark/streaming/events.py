"""Event-stream operators over the `events` table (north-star
extension; the reference has no streaming at all — SURVEY.md §2.10).

Batch forms (sessionization, tumbling/hopping windows) carry DuckDB
oracles; the Structured Streaming forms in
:mod:`rdbms_scala_spark.streaming.jobs` run the same logic through
``readStream`` and are checked against the same oracles (a stream
processed to completion must agree with the batch answer).

Timestamps are compared as epoch microseconds (``unix_micros`` /
``epoch_us``) — integer-exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.registry import register

SESSION_GAP_MIN = 30


_SESSIONIZE_ORACLE = f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL {SESSION_GAP_MIN} MINUTE
                       THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ),
    sessions AS (
        SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           count(*)                 AS n_events,
           epoch_us(min(ts))        AS session_start_us,
           epoch_us(max(ts))        AS session_end_us,
           round(sum(value), 2)     AS total_value
    FROM sessions
    GROUP BY user_id, session_id
"""


@register("events_sessionize", oracle=_SESSIONIZE_ORACLE, tags=("events", "session", "window"))
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running
    sum of boundaries — the classic batch sessionize. One shuffle on
    user_id; both window passes share the same sort."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > SESSION_GAP_MIN * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


_TUMBLING_ORACLE = """
    SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
           event_type,
           count(*)            AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
"""


@register("events_tumbling", oracle=_TUMBLING_ORACLE, tags=("events", "window"))
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregate (batch form of the streaming
    groupBy(window(...)))."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_HOPPING_ORACLE = """
    WITH offs AS (SELECT unnest([0, 1800000000]) AS off)
    SELECT ((epoch_us(ts) - off) // 3600000000) * 3600000000 + off AS window_start_us,
           count(*)             AS n_events,
           round(sum(value), 2) AS total_value
    FROM events, offs
    GROUP BY 1
"""


@register("events_hopping", oracle=_HOPPING_ORACLE, tags=("events", "window"))
def events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping window: 1-hour length, 30-minute slide — every event
    lands in exactly two windows (the oracle reproduces Spark's
    window() with explicit offset arithmetic)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "total_value",
        )
    )


_SESSION_WINDOW_ORACLE = f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL {SESSION_GAP_MIN} MINUTE
                       THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ),
    sessions AS (
        SELECT *, sum(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) + {SESSION_GAP_MIN} * 60 * 1000000 AS session_end_us,
           count(*)          AS n_events
    FROM sessions
    GROUP BY user_id, session_id
"""


@register("events_session_window", oracle=_SESSION_WINDOW_ORACLE, tags=("events", "session"))
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window operator (gap-merged sessions;
    window end = last event + gap). Semantically identical to
    events_sessionize but planned as a single session-window aggregate
    — the form that also runs under Structured Streaming state."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
        )
    )


@register(
    "events_rollup_multires",
    oracle="""
    SELECT epoch_us(date_trunc('day', ts)) AS day_start_us,
           event_type,
           count(*)             AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("events", "rollup", "multires", "scale"),
)
def events_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup (the hypertable/continuous-aggregate
    pattern): the DAILY aggregate is computed by re-aggregating HOURLY
    partials, not by rescanning raw events — the oracle aggregates the
    raw table directly, proving the two routes agree.

    At 100 TB this is the materialized-rollup design: persist the
    hourly layer (24x smaller than raw), serve every coarser
    resolution (day/week/month) from it; count/sum re-aggregate
    losslessly (avg = sum/count at read time; min/max likewise —
    exact quantiles do NOT compose, use mergeable sketches there).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    return (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"), "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 2).alias("total_value"),
        )
        .select(
            F.unix_micros("day").alias("day_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("day_start_us", "event_type")
    )


_FUNNEL_ORACLE = """
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT 's1_view' AS stage, count(*) AS n_users FROM v
    UNION ALL
    SELECT 's2_click_after_view', count(*) FROM c
    UNION ALL
    SELECT 's3_purchase_after_click', count(*) FROM p
"""


@register("events_funnel", oracle=_FUNNEL_ORACLE, tags=("events", "funnel"))
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel (view -> click -> purchase): a user
    advances a stage only with a strictly-later event of the next
    type — the standard product-analytics conversion count.

    Each stage is one filtered groupBy-min on user_id plus one equi-
    join back to the events table. Stage tables shrink monotonically
    (funnels only lose users), and Spark exploits that: the plan
    broadcasts each aggregated stage into the next stage's join
    (BroadcastExchange of v into c, c into p — verified in the
    physical plan), so the big events table is never shuffled for the
    joins; only the per-stage groupBy-min exchanges on user_id
    remain. Per-stage event-type filters are pushed to the scans."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def next_stage(prev: DataFrame, etype: str, tcol: str, prev_tcol: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_tcol))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = next_stage(v, "click", "t2", "t1")
    p = next_stage(c, "purchase", "t3", "t2")
    counts = [
        v.agg(F.lit("s1_view").alias("stage"), F.count(F.lit(1)).alias("n_users")),
        c.agg(F.lit("s2_click_after_view").alias("stage"), F.count(F.lit(1)).alias("n_users")),
        p.agg(F.lit("s3_purchase_after_click").alias("stage"), F.count(F.lit(1)).alias("n_users")),
    ]
    out = counts[0]
    for df in counts[1:]:
        out = out.unionByName(df)
    return out


_RETENTION_ORACLE = """
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(a.day - f.cohort_day AS BIGINT) AS day_offset,
           count(*) AS n_active_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY f.cohort_day, a.day - f.cohort_day
"""


@register("events_retention_cohorts", oracle=_RETENTION_ORACLE, tags=("events", "cohort"))
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted
    on each later active day as an offset from their cohort — the
    standard retention triangle. Two aggregations and one join, all
    keyed on user_id (the firsts aggregate broadcasts back into the
    activity join since cohorts ≪ events); day arithmetic is
    integer-exact and the cohort day is emitted as a formatted string
    so both engines hash identically."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = ev.distinct()
    return (
        activity.join(firsts, "user_id")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


_GAP_STEP_US = 21_600_000_000  # 6-hour resampling grid, microseconds


@register(
    "events_gap_fill",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               arg_max(value, event_id) AS v
        FROM events
        WHERE value IS NOT NULL
        GROUP BY user_id, epoch_us(ts)
    ),
    bounds AS (
        SELECT user_id,
               (min(ts_us) // {_GAP_STEP_US}) * {_GAP_STEP_US} AS start_us,
               max(ts_us) AS end_us
        FROM ev GROUP BY user_id
    ),
    grid AS (
        SELECT user_id,
               unnest(range(start_us, end_us + 1, {_GAP_STEP_US})) AS grid_us
        FROM bounds
    )
    SELECT g.user_id, g.grid_us,
           (SELECT e.v FROM ev e
            WHERE e.user_id = g.user_id AND e.ts_us <= g.grid_us
            ORDER BY e.ts_us DESC LIMIT 1) AS value_ffill
    FROM grid g
    ORDER BY user_id, grid_us
    """,
    tags=("events", "timeseries", "gapfill", "scale"),
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with forward fill: every user's event
    stream becomes a regular 6-hour grid carrying the last observed
    ``value`` at each tick (NULL before the first observation) — the
    feature-engineering op that turns irregular event logs into the
    aligned matrices sequence models train on.

    NULL ``value`` rows are dropped up front ON BOTH SIDES: a NULL
    observation is "no observation", not a fill-breaking datum. This
    is load-bearing for the oracle agreement — Spark's
    last(ignorenulls) would skip a NULL the correlated subquery
    returns, and DuckDB's arg_max ignores NULL args while Spark's
    max_by does not; filtering first removes both divergences (the
    current testdata has no NULL values, but the driver regenerates
    data between rounds).

    Spark shape: events are first deduped to one value per (user,
    instant) (max_by on event_id — makes the fill deterministic when
    instants collide), per-user bounds explode into the grid map-side,
    and the fill is a UNION of grid ticks and observations under ONE
    per-user window using last(ignorenulls) with a (ts, is_grid)
    tiebreak so an observation exactly on a tick is included. No
    self-join, no per-tick probe: at 100 TB the window partitions on
    user_id (high cardinality) and each partition is a single ordered
    pass. The DuckDB oracle expresses the same semantics as a
    last-observation-before correlated subquery — a deliberately
    different paradigm proving the window formulation correct."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "value", "event_id")
    )
    dedup = ev.groupBy("user_id", "ts_us").agg(
        F.max_by("value", "event_id").alias("v")
    )
    bounds = dedup.groupBy("user_id").agg(
        F.expr(f"(min(ts_us) div {_GAP_STEP_US}) * {_GAP_STEP_US}").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("start_us", "end_us", F.lit(_GAP_STEP_US))
        ).alias("ts_us"),
    )
    unioned = dedup.select(
        "user_id", "ts_us", "v", F.lit(0).alias("is_grid")
    ).unionByName(
        grid.select("user_id", "ts_us", F.lit(None).cast("double").alias("v"), F.lit(1).alias("is_grid"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "is_grid")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn("value_ffill", F.last("v", ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select("user_id", F.col("ts_us").alias("grid_us"), "value_ffill")
        .orderBy("user_id", "grid_us")
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, d, n,
               CAST(sum(n) OVER w AS BIGINT) AS s,
               CAST(sum(n * n) OVER w AS BIGINT) AS q,
               count(*) OVER w AS w_n
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n AS n_events,
           round((n - s / w_n) / sqrt((w_n * q - s * s) / (w_n * (w_n - 1)) * 1.0), 4)
               AS zscore,
           CAST(abs((n - s / w_n) / sqrt((w_n * q - s * s) / (w_n * (w_n - 1)) * 1.0)) >= 1.8
               AS BOOLEAN) AS is_anomaly
    FROM scored
    WHERE w_n = 7 AND w_n * q - s * s > 0
    ORDER BY event_type, day
    """,
    tags=("events", "anomaly", "window"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: each (event_type, day)'s count scored
    against its own trailing 7-day window (z-score over mean/stddev),
    flagged when |z| >= 1.8 — the ingest-monitoring pass a training-
    data pipeline runs on every incoming drop (a collapsed or spiking
    source shows up here before it poisons a mixture).

    Scale shape: the daily pre-aggregation collapses the corpus to
    |types| x |days| rows BEFORE the window pass (map-side combine on
    the groupBy), so the window — per-type, time-ordered — runs over
    a vanishingly small frame no matter the event volume; partitions
    are per-type, so a 1000-executor run parallelizes across types
    and the trailing frame never re-shuffles raw events. Guards:
    full-window days only (w_n = 7) so partial leading frames don't
    emit unstable scores, sigma > 0 so constant weeks don't divide by
    zero (ANSI-safe)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("event_type").orderBy("d").rowsBetween(-6, 0)
    scored = daily.select(
        "event_type",
        "d",
        "n",
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("q"),
        F.count(F.lit(1)).over(w).alias("w_n"),
    )
    # Moments from EXACT integer window sums (the repo's quantization
    # convention, vs engine-internal avg/stddev_samp whose one-pass
    # formulations can differ in the last ulp): the discriminant
    # n*Q - S^2 is an exact integer — zero precisely for constant
    # windows (an integer guard, no epsilon) — and the z expression
    # below is the same IEEE op tree the oracle spells out, so
    # round(z, 4) and the 1.8 threshold agree bit-for-bit.
    disc = F.col("w_n") * F.col("q") - F.col("s") * F.col("s")
    z = (F.col("n") - F.col("s") / F.col("w_n")) / F.sqrt(
        disc / (F.col("w_n") * (F.col("w_n") - 1)) * F.lit(1.0)
    )
    return (
        scored.filter((F.col("w_n") == 7) & (disc > 0))
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("n").alias("n_events"),
            F.round(z, 4).alias("zscore"),
            (F.abs(z) >= 1.8).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n_transitions,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY prev_type), 4)
               AS p_next
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY prev_type, next_type
    """,
    tags=("events", "sequence", "markov"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for each user's
    time-ordered event sequence, count (previous type -> next type)
    transitions and normalize per source state — the empirical Markov
    kernel behind next-action prediction, bot detection (near-
    deterministic rows), and funnel-shape drift monitoring.

    Scale shape: the lag window shuffles once on user_id (per-user
    frames, unbounded skew handled by AQE since no user's history is
    more than their own event count), then the transition aggregation
    collapses to |types|^2 rows with map-side combine; the per-source
    normalization is a window over that tiny matrix. p_next divides
    two exact integer counts — one deterministic IEEE division, then
    round(4), stable cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wsrc = W.partitionBy("prev_type")
    return (
        counts.withColumn(
            "p_next",
            F.round(
                F.col("n_transitions") * F.lit(1.0) / F.sum("n_transitions").over(wsrc), 4
            ),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "agg_mode_per_group",
    oracle="""
    SELECT user_id, event_type AS mode_type, n AS mode_count FROM (
        SELECT user_id, event_type, count(*) AS n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, event_type) AS rn
        FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("aggregate", "mode"),
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE per group (each user's most frequent event type, ties to
    the alphabetically first) — the categorical summary statistic the
    generic-aggregate family was missing. Two-level shape: the
    (user, type) pre-aggregation combines map-side, then a max_by hash
    aggregate picks each user's winner — no per-user sort, same
    argmax-as-aggregate trick as the IVF assignment (max_by on
    (count, reversed-type) with the tie inverted via the struct
    order)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    # max_by struct: highest n, then alphabetically FIRST type; invert
    # the string ordering by using min_by with (-n, type).
    return (
        counts.groupBy("user_id")
        .agg(
            F.min_by(
                F.struct(F.col("event_type").alias("mode_type"), F.col("n").alias("mode_count")),
                F.struct((-F.col("n")).alias("neg"), F.col("event_type").alias("t")),
            ).alias("m")
        )
        .select("user_id", "m.mode_type", "m.mode_count")
        .orderBy("user_id")
    )


_PATTERN = "v.*c.*p"  # a view, later a click, later a purchase

_PATTERN_ORACLE = f"""
    WITH lettered AS (
        SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS letter
        FROM events
    ),
    journeys AS (
        SELECT user_id,
               string_agg(letter, '' ORDER BY ts, event_id) AS journey,
               CAST(count(*) AS BIGINT) AS n_events
        FROM lettered
        GROUP BY user_id
    )
    SELECT user_id, n_events,
           CASE WHEN regexp_matches(journey, '{_PATTERN}') THEN 1 ELSE 0 END
               AS matched,
           md5(journey) AS journey_sig
    FROM journeys
    ORDER BY user_id
"""


@register(
    "events_pattern_match",
    oracle=_PATTERN_ORACLE,
    tags=("events", "sequence", "match-recognize"),
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching over per-user event sequences — the
    MATCH_RECOGNIZE analog: each user's time-ordered events collapse
    to a journey string (one letter per event type; the five types
    have distinct initials) and a regular expression states the
    behavioral pattern — here ``v.*c.*p``, "a view, later a click,
    later a purchase". The full-journey md5 signature certifies the
    exact ordered sequence cross-engine, not just the match bit.

    Scale shape: one shuffle on user_id; ``collect_list`` +
    ``array_sort`` state is bounded by a single user's history —
    the same per-key state bound a MATCH_RECOGNIZE engine (or
    `streaming_stateful_user_totals`) holds; for unbounded histories
    you'd window the match per session (`events_sessionize`) first.
    The sort key (ts, event_id) is collision-free, so the journey
    string is deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    journeys = (
        ev.select(
            "user_id",
            F.struct(
                "ts", "event_id", F.substring("event_type", 1, 1).alias("letter")
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.expr("array_join(transform(array_sort(collect_list(s)), x -> x.letter), '')")
            .alias("journey"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return journeys.select(
        "user_id",
        "n_events",
        F.when(F.col("journey").rlike(_PATTERN), 1).otherwise(0).alias("matched"),
        F.md5("journey").alias("journey_sig"),
    ).orderBy("user_id")


_RFM_REF_TS = "2002-01-01 00:00:00"

_RFM_ORACLE = f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(date_diff('day', max(ts), TIMESTAMP '{_RFM_REF_TS}')
                    AS BIGINT) AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               round(sum(CASE WHEN event_type = 'purchase'
                              THEN round(value, 2) ELSE 0 END), 2) AS monetary
        FROM events
        GROUP BY user_id
    ),
    cuts AS (
        SELECT quantile_cont(-recency_days, 0.2) AS r1,
               quantile_cont(-recency_days, 0.4) AS r2,
               quantile_cont(-recency_days, 0.6) AS r3,
               quantile_cont(-recency_days, 0.8) AS r4,
               quantile_cont(frequency, 0.2) AS f1,
               quantile_cont(frequency, 0.4) AS f2,
               quantile_cont(frequency, 0.6) AS f3,
               quantile_cont(frequency, 0.8) AS f4,
               quantile_cont(monetary, 0.2) AS m1,
               quantile_cont(monetary, 0.4) AS m2,
               quantile_cont(monetary, 0.6) AS m3,
               quantile_cont(monetary, 0.8) AS m4
        FROM per_user
    ),
    scored AS (
        SELECT user_id, recency_days, frequency, monetary,
               CAST(1 + (CASE WHEN -recency_days > r1 THEN 1 ELSE 0 END)
                      + (CASE WHEN -recency_days > r2 THEN 1 ELSE 0 END)
                      + (CASE WHEN -recency_days > r3 THEN 1 ELSE 0 END)
                      + (CASE WHEN -recency_days > r4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS r_score,
               CAST(1 + (CASE WHEN frequency > f1 THEN 1 ELSE 0 END)
                      + (CASE WHEN frequency > f2 THEN 1 ELSE 0 END)
                      + (CASE WHEN frequency > f3 THEN 1 ELSE 0 END)
                      + (CASE WHEN frequency > f4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS f_score,
               CAST(1 + (CASE WHEN monetary > m1 THEN 1 ELSE 0 END)
                      + (CASE WHEN monetary > m2 THEN 1 ELSE 0 END)
                      + (CASE WHEN monetary > m3 THEN 1 ELSE 0 END)
                      + (CASE WHEN monetary > m4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS m_score
        FROM per_user CROSS JOIN cuts
    )
    SELECT user_id, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                WHEN f_score <= 2 THEN 'low_engagement'
                ELSE 'regular' END AS segment
    FROM scored
    ORDER BY user_id
"""


@register(
    "events_rfm_segments",
    oracle=_RFM_ORACLE,
    tags=("events", "rfm", "segmentation"),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) behavioral segmentation:
    per-user last-activity age, event count, and purchase value
    collapse to three quintile scores and a rule-based segment label
    — the canonical marketing/engagement cohorting that every event
    warehouse serves.

    Scale shape: ONE corpus-sized map-side-combinable aggregate to
    per-user rows, then ONE global ``percentile`` aggregate yields
    the 4 quintile cut points per metric, broadcast-cross-joined back
    so scoring is a map-side comparison — no global window touches
    the per-user table (the `sample_quality_top_fraction` pattern;
    the previous ntile(5) formulation funneled every user through a
    single-partition WindowExec three times). At extreme user counts
    swap the exact percentile for ``approx_percentile`` (same plan
    shape, sketch-merge combine). Determinism: Spark's exact
    ``percentile`` and DuckDB's ``quantile_cont`` share the same
    type-7 definition on identical inputs; recency/frequency are
    integers so ``v > cut`` comparisons carry ≥0.2-wide margins, and
    monetary cuts interpolate strictly between adjacent sorted
    values, so no data point sits within float error of a cut.
    Cut-point semantics (unlike ntile) give tied metric values tied
    scores — the behaviorally-correct choice."""
    ev = load_table(spark, sf_dir, "events")
    ref = F.lit(_RFM_REF_TS).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.datediff(ref, F.max("ts")).cast("long").alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.round("value", 2)
                ).otherwise(0.0)
            ),
            2,
        ).alias("monetary"),
    )
    qs = "array(0.2D, 0.4D, 0.6D, 0.8D)"
    cuts = per_user.agg(
        F.expr(f"percentile(-recency_days, {qs})").alias("r_cuts"),
        F.expr(f"percentile(frequency, {qs})").alias("f_cuts"),
        F.expr(f"percentile(monetary, {qs})").alias("m_cuts"),
    )

    def quintile(metric, cuts_col: str):
        score = F.lit(1)
        for i in range(1, 5):
            score = score + F.when(
                metric > F.element_at(F.col(cuts_col), i), 1
            ).otherwise(0)
        return score.cast("long")

    scored = per_user.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        quintile(-F.col("recency_days"), "r_cuts").alias("r_score"),
        quintile(F.col("frequency"), "f_cuts").alias("f_score"),
        quintile(F.col("monetary"), "m_cuts").alias("m_score"),
    )
    segment = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk")
        .when(F.col("f_score") <= 2, "low_engagement")
        .otherwise("regular")
    )
    return scored.withColumn("segment", segment).orderBy("user_id")


_FUNNEL_WINDOW_H = 48  # max hours allowed between consecutive stages

_FUNNEL_WINDOWED_ORACLE = f"""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
         AND e.ts > v.t1
         AND epoch_us(e.ts) - epoch_us(v.t1) <= CAST({_FUNNEL_WINDOW_H} AS BIGINT) * 3600 * 1000000
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
         AND e.ts > c.t2
         AND epoch_us(e.ts) - epoch_us(c.t2) <= CAST({_FUNNEL_WINDOW_H} AS BIGINT) * 3600 * 1000000
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    n AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n1,
               (SELECT CAST(count(*) AS BIGINT) FROM c) AS n2,
               (SELECT CAST(count(*) AS BIGINT) FROM p) AS n3
    )
    SELECT 's1_view' AS stage, n1 AS n_users,
           CAST(1.0 AS DOUBLE) AS conv_from_prev FROM n
    UNION ALL
    SELECT 's2_click_48h', n2, round(n2 * 1.0 / n1, 4) FROM n
    UNION ALL
    SELECT 's3_purchase_48h', n3, round(n3 * 1.0 / n2, 4) FROM n
"""


@register(
    "events_funnel_windowed",
    oracle=_FUNNEL_WINDOWED_ORACLE,
    tags=("events", "funnel", "windowed"),
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: view -> click -> purchase where each step
    must land within 48h (_FUNNEL_WINDOW_H) of the previous — the
    attribution-honest funnel (the unbounded `events_funnel` credits
    a purchase months after the view; windowed counts are what
    conversion dashboards actually report, and the delta between the
    two IS the stale-credit volume). Same chained min-aggregate
    shape: each stage is one keyed aggregate + one join against the
    previous stage's per-user row — never a per-user sort — with the
    window bound evaluated on exact integer microseconds. Conversion
    ratios are int64 count ratios rounded once."""
    ev = load_table(spark, sf_dir, "events")
    win_us = _FUNNEL_WINDOW_H * 3600 * 1_000_000
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.unix_micros("ts") - F.unix_micros("t1") <= win_us)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.unix_micros("ts") - F.unix_micros("t2") <= win_us)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n = (
        v.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n3")))
    )
    s1 = n.select(
        F.lit("s1_view").alias("stage"),
        F.col("n1").alias("n_users"),
        F.lit(1.0).cast("double").alias("conv_from_prev"),
    )
    s2 = n.select(
        F.lit("s2_click_48h").alias("stage"),
        F.col("n2").alias("n_users"),
        F.round(F.col("n2") / F.col("n1"), 4).alias("conv_from_prev"),
    )
    s3 = n.select(
        F.lit("s3_purchase_48h").alias("stage"),
        F.col("n3").alias("n_users"),
        F.round(F.col("n3") / F.col("n2"), 4).alias("conv_from_prev"),
    )
    return s1.unionByName(s2).unionByName(s3)


# ---------------------------------------------------------------------------
# Round 11: CUPED variance reduction (Deng et al. 2013) — the
# experimentation readout next to `events_ab_lift`: adjust each
# user's in-experiment outcome by their PRE-period covariate
# (Y_adj = Y - theta * (X - mean(X)), theta = cov(X, Y) / var(X)),
# which removes the between-user variance the randomization already
# balanced and tightens the same comparison ab_lift makes raw.


@register(
    "events_cuped",
    oracle="""
    WITH bounds AS (
        SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
        FROM events
    ),
    per_user AS (
        SELECT user_id,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS variant,
               CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
                                       AND epoch_us(ts) <= (SELECT mid FROM bounds)
                                      THEN CAST(round(value * 100, 0) AS BIGINT)
                                 END), 0) AS BIGINT) AS x_q,
               CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
                                       AND epoch_us(ts) > (SELECT mid FROM bounds)
                                      THEN CAST(round(value * 100, 0) AS BIGINT)
                                 END), 0) AS BIGINT) AS y_q
        FROM events GROUP BY user_id
    ),
    pooled AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x_q) AS BIGINT) AS sx,
               CAST(sum(y_q) AS BIGINT) AS sy,
               CAST(sum(x_q * x_q) AS BIGINT) AS sxx,
               CAST(sum(x_q * y_q) AS BIGINT) AS sxy
        FROM per_user
    ),
    th AS (
        SELECT n, sx,
               CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0
                    THEN 0.0
                    ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               END AS theta
        FROM pooled
    ),
    by_var AS (
        SELECT variant,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(x_q) AS BIGINT) AS sxv,
               CAST(sum(y_q) AS BIGINT) AS syv
        FROM per_user GROUP BY variant
    )
    SELECT v.variant, v.n_users,
           round(v.syv / (100.0 * v.n_users), 4) AS mean_y,
           round((v.syv - t.theta
                  * (v.sxv - v.n_users
                     * (CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE))))
                 / (100.0 * v.n_users), 4) AS mean_y_cuped,
           round(t.theta, 6) AS theta
    FROM by_var v CROSS JOIN th t
    ORDER BY v.variant
    """,
    tags=("events", "experiment", "cuped", "scale"),
)
def events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment means: variant assignment is
    `events_ab_lift`'s md5 coin, the outcome Y is each user's
    purchase value in the LATER half of the corpus time range, the
    covariate X the same metric in the earlier half (the pre-period),
    and theta is the pooled cov(X,Y)/var(X). Emits per-variant raw
    and CUPED-adjusted means plus theta — the adjusted delta is the
    same causal contrast with the pre-existing between-user spread
    removed.

    Cross-engine exactness: per-EVENT values quantize to cents before
    any summation, so X, Y and every pooled moment (n, Sx, Sy, Sxx,
    Sxy) are exact int64; theta and the adjusted means are then a
    fixed number of double ops on identical integers. Scale shape:
    one per-user combinable aggregate (the only corpus-sized step),
    one 5-counter pooled rollup, one 2-row variant rollup — the
    ab_lift plan family plus second moments; the midpoint bound rides
    in as a broadcast scalar."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        (
            (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts")))
            / F.lit(2)
        )
        .cast("long")
        .alias("mid")
    )
    v_q = F.round(F.col("value") * 100, 0).cast("long")
    is_purchase = F.col("event_type") == "purchase"
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        is_purchase & (F.unix_micros("ts") <= F.col("mid")),
                        v_q,
                    )
                ),
                F.lit(0),
            ).alias("x_q"),
            F.coalesce(
                F.sum(
                    F.when(
                        is_purchase & (F.unix_micros("ts") > F.col("mid")),
                        v_q,
                    )
                ),
                F.lit(0),
            ).alias("y_q"),
        )
        .withColumn(
            "variant",
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                    *"01234567"
                ),
                "A",
            ).otherwise("B"),
        )
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_q").alias("sx"),
        F.sum("y_q").alias("sy"),
        F.sum(F.col("x_q") * F.col("x_q")).alias("sxx"),
        F.sum(F.col("x_q") * F.col("y_q")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    denom = nd * F.col("sxx").cast("double") - sxd * sxd
    th = pooled.select(
        "n",
        "sx",
        F.when(denom == 0.0, F.lit(0.0))
        .otherwise(
            (nd * F.col("sxy").cast("double") - sxd * F.col("sy").cast("double"))
            / denom
        )
        .alias("theta"),
    )
    by_var = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x_q").alias("sxv"),
        F.sum("y_q").alias("syv"),
    )
    xbar = F.col("sx").cast("double") / F.col("n").cast("double")
    return (
        by_var.crossJoin(F.broadcast(th))
        .select(
            "variant",
            "n_users",
            F.round(F.col("syv") / (100.0 * F.col("n_users")), 4).alias("mean_y"),
            F.round(
                (
                    F.col("syv")
                    - F.col("theta") * (F.col("sxv") - F.col("n_users") * xbar)
                )
                / (100.0 * F.col("n_users")),
                4,
            ).alias("mean_y_cuped"),
            F.round("theta", 6).alias("theta"),
        )
        .orderBy("variant")
    )


# ---------------------------------------------------------------------------
# Round 11: per-variant funnel with step-level significance — the
# composition of `events_funnel` (staged min-ts chain) and
# `events_ab_lift` (md5 assignment + pooled two-proportion z): an
# experiment rarely moves the end-to-end rate without moving ONE
# step, and this readout says which.


@register(
    "events_ab_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    av AS (
        SELECT user_id,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS variant
        FROM v
    ),
    counts AS (
        SELECT a.variant,
               CAST(count(*) AS BIGINT) AS n1,
               CAST(count(c.user_id) AS BIGINT) AS n2,
               CAST(count(p.user_id) AS BIGINT) AS n3
        FROM av a
        LEFT JOIN c ON c.user_id = a.user_id
        LEFT JOIN p ON p.user_id = a.user_id
        GROUP BY a.variant
    ),
    steps AS (
        SELECT 's1_view_to_click' AS step,
               max(CASE WHEN variant = 'A' THEN n1 END) AS na,
               max(CASE WHEN variant = 'A' THEN n2 END) AS ca,
               max(CASE WHEN variant = 'B' THEN n1 END) AS nb,
               max(CASE WHEN variant = 'B' THEN n2 END) AS cb
        FROM counts
        UNION ALL
        SELECT 's2_click_to_purchase',
               max(CASE WHEN variant = 'A' THEN n2 END),
               max(CASE WHEN variant = 'A' THEN n3 END),
               max(CASE WHEN variant = 'B' THEN n2 END),
               max(CASE WHEN variant = 'B' THEN n3 END)
        FROM counts
    )
    SELECT step, na, ca, nb, cb,
           round(ca * 1.0 / na, 4) AS rate_a,
           round(cb * 1.0 / nb, 4) AS rate_b,
           CASE WHEN (ca + cb) = 0 OR (ca + cb) = (na + nb) THEN NULL
                ELSE round((ca * 1.0 / na - cb * 1.0 / nb)
                     / sqrt(((ca + cb) * 1.0 / (na + nb))
                            * (1.0 - (ca + cb) * 1.0 / (na + nb))
                            * (1.0 / na + 1.0 / nb)), 4) END AS z_score
    FROM steps ORDER BY step
    """,
    tags=("events", "funnel", "experiment", "scale"),
)
def events_ab_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-step A/B funnel: `events_funnel`'s staged view -> click ->
    purchase chain split by `events_ab_lift`'s md5 variant, with each
    step transition's per-variant conversion rate and the pooled
    two-proportion z statistic — the diagnosis layer between "the
    experiment moved the end-to-end rate" and "THIS step moved". All
    four counters per step are exact int64; the rates and z come
    from token-identical double expression trees (the ab_lift
    discipline), so cross-engine equality is structural; a step whose
    pooled conversion is 0 or 1 has zero variance and reports NULL z
    (ANSI division would raise, DuckDB would emit inf — the explicit
    guard keeps both engines honest and identical).

    Scale shape: the staged chain is `events_funnel`'s plan (stage
    tables shrink monotonically and broadcast into the next join;
    only the per-stage groupBy-min exchanges on user_id remain); the
    variant split adds two broadcast-scale LEFT joins of the stage
    tables and a 2-group rollup — nothing new touches the event
    log."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def next_stage(prev: DataFrame, etype: str, tcol: str, prev_tcol: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_tcol))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = next_stage(v, "click", "t2", "t1")
    p = next_stage(c, "purchase", "t3", "t2")
    av = v.select(
        "user_id",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                *"01234567"
            ),
            "A",
        )
        .otherwise("B")
        .alias("variant"),
    )
    counts = (
        av.join(c.select("user_id", F.lit(1).alias("hit2")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("hit3")), "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.count("hit2").alias("n2"),
            F.count("hit3").alias("n3"),
        )
    )
    s1 = counts.agg(
        F.lit("s1_view_to_click").alias("step"),
        F.max(F.when(F.col("variant") == "A", F.col("n1"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("n2"))).alias("ca"),
        F.max(F.when(F.col("variant") == "B", F.col("n1"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("n2"))).alias("cb"),
    )
    s2 = counts.agg(
        F.lit("s2_click_to_purchase").alias("step"),
        F.max(F.when(F.col("variant") == "A", F.col("n2"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("n3"))).alias("ca"),
        F.max(F.when(F.col("variant") == "B", F.col("n2"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("n3"))).alias("cb"),
    )
    return (
        s1.unionByName(s2)
        .selectExpr(
            "step",
            "na",
            "ca",
            "nb",
            "cb",
            "round(ca * 1.0D / na, 4) AS rate_a",
            "round(cb * 1.0D / nb, 4) AS rate_b",
            "CASE WHEN (ca + cb) = 0 OR (ca + cb) = (na + nb)"
            " THEN CAST(NULL AS DOUBLE)"
            " ELSE round((ca * 1.0D / na - cb * 1.0D / nb)"
            " / sqrt(((ca + cb) * 1.0D / (na + nb))"
            " * (1.0D - (ca + cb) * 1.0D / (na + nb))"
            " * (1.0D / na + 1.0D / nb)), 4) END AS z_score",
        )
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# Round 12: power / minimum-detectable-effect readout — the
# experiment-QA family's sizing member (evaluation-follows-model:
# ab_lift/cuped report the estimate, SRM the validity, this the
# SENSITIVITY). Standard two-sample normal approximation: MDE at
# alpha = 0.05 two-sided and 80% power is (z_.975 + z_.80) * SE of
# the delta; a team reads "mde_rel = 0.08" as "this experiment, as
# currently sized, cannot see lifts under 8%".

# z_{0.975} + z_{0.80} = 1.959963984540054 + 0.8416212335729143
_MDE_Z_SUM = "2.8015852181129683"


@register(
    "events_ab_mde",
    oracle=f"""
    WITH per_user AS (
        SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS variant,
               CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
                                      THEN CAST(round(value * 100, 0) AS BIGINT)
                                 END), 0) AS BIGINT) AS y_q
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT CAST(count_if(variant = 'A') AS BIGINT) AS na,
               CAST(count_if(variant = 'B') AS BIGINT) AS nb,
               CAST(sum(CASE WHEN variant = 'A' THEN y_q ELSE 0 END)
                    AS BIGINT) AS sa,
               CAST(sum(CASE WHEN variant = 'B' THEN y_q ELSE 0 END)
                    AS BIGINT) AS sb,
               CAST(sum(CASE WHEN variant = 'A' THEN y_q * y_q ELSE 0 END)
                    AS BIGINT) AS ssa,
               CAST(sum(CASE WHEN variant = 'B' THEN y_q * y_q ELSE 0 END)
                    AS BIGINT) AS ssb
        FROM per_user
    ),
    s AS (
        SELECT na, nb, sa, sb,
               (CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                    / CAST(na AS DOUBLE))
                   / CAST(nullif(na - 1, 0) AS DOUBLE) AS var_a,
               (CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                    / CAST(nb AS DOUBLE))
                   / CAST(nullif(nb - 1, 0) AS DOUBLE) AS var_b
        FROM m
    ),
    e AS (
        SELECT na, nb, sa, sb,
               sqrt(var_a / CAST(na AS DOUBLE)
                    + var_b / CAST(nb AS DOUBLE)) AS se_c
        FROM s
    )
    SELECT na AS n_a, nb AS n_b,
           round(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0, 4) AS mean_a,
           round(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0, 4) AS mean_b,
           round((CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                  - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)) / 100.0, 4)
               AS delta,
           round(se_c / 100.0, 4) AS se,
           round({_MDE_Z_SUM} * se_c / 100.0, 4) AS mde_abs,
           round({_MDE_Z_SUM} * se_c
                 / nullif(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE), 0.0), 4)
               AS mde_rel,
           round((CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                  - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
                 / nullif(se_c, 0.0), 4) AS observed_z
    FROM e
    """,
    tags=("events", "experiment", "power", "mde", "scale"),
)
def events_ab_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect + achieved z for the per-user
    purchase-value metric under `events_ab_lift`'s md5-coin
    assignment: per-variant n / mean / sample variance from EXACT
    int64 moments (per-event values quantized to cents before any
    sum — the CUPED discipline), then SE of the mean difference,
    the absolute and relative MDE at alpha = 0.05 two-sided / 80%
    power ((z_.975 + z_.80) * SE with the z-sum as one shared double
    literal), and the observed z. The one-row answer to "could this
    experiment even have seen the effect we care about?" — read
    BEFORE the lift readout, not after.

    Cross-engine exactness: the only float work is a fixed tree of
    IEEE double ops (divide/multiply/sqrt, correctly rounded) on
    identical int64 moments, rounded at 4dp. Scale shape: one
    per-user combinable aggregate (the only corpus-sized step) and a
    6-counter global rollup — the ab_lift plan family plus second
    moments. Moment overflow bound: cents x cents summed over users
    needs |users| * (per-user cents)^2 < 2^63 — at 1e9 users that
    allows ~$30k per user; past it, quantize coarser or sum ss as
    DOUBLE (the readout is float anyway)."""
    ev = load_table(spark, sf_dir, "events")
    v_q = F.round(F.col("value") * 100, 0).cast("long")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", v_q)),
                F.lit(0),
            )
            .cast("long")
            .alias("y_q")
        )
        .select(
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                    *"01234567"
                ),
                "A",
            )
            .otherwise("B")
            .alias("variant"),
            "y_q",
        )
    )
    m = per_user.agg(
        F.count_if(F.col("variant") == "A").alias("na"),
        F.count_if(F.col("variant") == "B").alias("nb"),
        F.sum(F.when(F.col("variant") == "A", F.col("y_q")).otherwise(F.lit(0)))
        .cast("long")
        .alias("sa"),
        F.sum(F.when(F.col("variant") == "B", F.col("y_q")).otherwise(F.lit(0)))
        .cast("long")
        .alias("sb"),
        F.sum(
            F.when(
                F.col("variant") == "A", F.col("y_q") * F.col("y_q")
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("ssa"),
        F.sum(
            F.when(
                F.col("variant") == "B", F.col("y_q") * F.col("y_q")
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("ssb"),
    )
    s = m.selectExpr(
        "na",
        "nb",
        "sa",
        "sb",
        "(CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)"
        " / CAST(na AS DOUBLE)) / CAST(nullif(na - 1, 0) AS DOUBLE) AS var_a",
        "(CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)"
        " / CAST(nb AS DOUBLE)) / CAST(nullif(nb - 1, 0) AS DOUBLE) AS var_b",
    ).selectExpr(
        "na",
        "nb",
        "sa",
        "sb",
        "sqrt(var_a / CAST(na AS DOUBLE) + var_b / CAST(nb AS DOUBLE)) AS se_c",
    )
    return s.selectExpr(
        "na AS n_a",
        "nb AS n_b",
        "round(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0D, 4) AS mean_a",
        "round(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0D, 4) AS mean_b",
        "round((CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)"
        " - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)) / 100.0D, 4) AS delta",
        "round(se_c / 100.0D, 4) AS se",
        f"round({_MDE_Z_SUM}D * se_c / 100.0D, 4) AS mde_abs",
        f"round({_MDE_Z_SUM}D * se_c"
        " / nullif(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE), 0.0D), 4)"
        " AS mde_rel",
        "round((CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)"
        " - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))"
        " / nullif(se_c, 0.0D), 4) AS observed_z",
    )


# ---------------------------------------------------------------------------
# Round 12 (cont.): sequential (always-valid) experiment monitoring —
# the mixture SPRT of Johari et al. "Peeking at A/B Tests" (KDD'17).
# ab_lift/cuped answer "what is the effect", events_ab_mde "could we
# even see it"; this answers "can we LOOK every day without inflating
# false positives": the always-valid p-value is a running min of
# 1/mixture-likelihood-ratio and stays a valid p-value under optional
# stopping, so a dashboard can poll it daily and stop the moment it
# crosses alpha.


@register(
    "events_ab_sequential",
    oracle="""
    WITH per_ud AS (
        SELECT CAST(ts AS DATE) AS day,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS variant,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS y_q
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE), user_id
    ),
    daily AS (
        SELECT day, variant,
               CAST(count(*) AS BIGINT) AS n_inc,
               CAST(sum(y_q) AS BIGINT) AS s_inc,
               CAST(sum(y_q * y_q) AS BIGINT) AS ss_inc
        FROM per_ud GROUP BY day, variant
    ),
    grid AS (
        SELECT d.day, v.variant
        FROM (SELECT DISTINCT day FROM daily) d
        CROSS JOIN (SELECT unnest(['A', 'B']) AS variant) v
    ),
    cum AS (
        SELECT g.day, g.variant,
               CAST(sum(COALESCE(dl.n_inc, 0)) OVER w AS BIGINT) AS n,
               CAST(sum(COALESCE(dl.s_inc, 0)) OVER w AS BIGINT) AS s,
               CAST(sum(COALESCE(dl.ss_inc, 0)) OVER w AS BIGINT) AS ss
        FROM grid g LEFT JOIN daily dl
             ON dl.day = g.day AND dl.variant = g.variant
        WINDOW w AS (PARTITION BY g.variant ORDER BY g.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    j AS (
        SELECT a.day,
               a.n AS na, a.s AS sa, a.ss AS ssa,
               b.n AS nb, b.s AS sb, b.ss AS ssb
        FROM (SELECT * FROM cum WHERE variant = 'A') a
        JOIN (SELECT * FROM cum WHERE variant = 'B') b ON a.day = b.day
    ),
    st AS (
        SELECT day, na, nb,
               CAST(sb AS DOUBLE) / CAST(nullif(nb, 0) AS DOUBLE)
                   - CAST(sa AS DOUBLE) / CAST(nullif(na, 0) AS DOUBLE)
                   AS delta_c,
               ((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                     / CAST(nullif(na, 0) AS DOUBLE))
                    / CAST(nullif(na - 1, 0) AS DOUBLE))
                   / CAST(nullif(na, 0) AS DOUBLE)
               + ((CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                     / CAST(nullif(nb, 0) AS DOUBLE))
                    / CAST(nullif(nb - 1, 0) AS DOUBLE))
                   / CAST(nullif(nb, 0) AS DOUBLE) AS v
        FROM j
    ),
    tau AS (
        SELECT day, na, nb, delta_c, v,
               first_value(v IGNORE NULLS) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS tau2
        FROM st
    ),
    ll AS (
        SELECT day, na, nb, delta_c,
               CAST(round((0.5 * ln(nullif(v, 0.0)
                                    / (nullif(v, 0.0) + nullif(tau2, 0.0)))
                           + delta_c * delta_c * nullif(tau2, 0.0)
                             / (2.0 * nullif(v, 0.0)
                                * (nullif(v, 0.0) + nullif(tau2, 0.0))))
                          * 1e6, 0)
                    AS BIGINT) AS llq
        FROM tau
    ),
    pd AS (
        SELECT day, na, nb, delta_c, llq,
               round(least(1.0, exp(-(CAST(llq AS DOUBLE) / 1e6))), 6) AS p_day
        FROM ll
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, na AS n_a, nb AS n_b,
           round(delta_c / 100.0, 4) AS delta,
           llq AS log_lambda_q,
           p_day,
           min(p_day) OVER (ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS always_valid_p
    FROM pd
    ORDER BY day
    """,
    tags=("events", "experiment", "sequential", "msprt", "scale"),
)
def events_ab_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily always-valid p-value for the per-user-day purchase metric
    under the md5-coin assignment — the mixture SPRT (mSPRT, Johari et
    al. 2017) with a unit-information normal mixture: tau^2 is the
    FIRST day's variance of the delta (the prior that one day's
    information would justify), and for each day t,

        log Lambda_t = 0.5*ln(V_t/(V_t+tau^2))
                       + delta_t^2*tau^2 / (2*V_t*(V_t+tau^2)),
        p_t = min over s<=t of min(1, exp(-log Lambda_s)),

    which remains a valid p-value under DAILY PEEKING and optional
    stopping — the property the fixed-horizon z in `events_ab_lift`
    lacks and the reason dashboards inflate false positives without
    it. Observation grain is purchasing user-days; cumulative
    per-variant moments come from exact cent-quantized int64 window
    sums over the dense day x variant grid (days with activity in
    only one variant still advance the other's cumulative row).

    Cross-engine floats: the single ln(...) result is quantized to
    1e-6 integers (the NB/unigram discipline) so log_lambda_q is
    exact int64 in both engines; p_day = exp of that quantized value
    rounded at 6dp, and the running min runs over already-rounded
    values — exact. Scale shape: one (day,user) aggregate (the only
    corpus-sized step), a (day,variant) rollup, then windows over the
    calendar-bounded daily relation (~hundreds of rows; allowlisted
    global window like orders_open_backlog)."""
    ev = load_table(spark, sf_dir, "events")
    per_ud = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.col("ts").cast("date").alias("day"),
            "user_id",
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("y_q")
        )
        .select(
            "day",
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                    *"01234567"
                ),
                "A",
            )
            .otherwise("B")
            .alias("variant"),
            "y_q",
        )
    )
    daily = per_ud.groupBy("day", "variant").agg(
        F.count(F.lit(1)).alias("n_inc"),
        F.sum("y_q").cast("long").alias("s_inc"),
        F.sum(F.col("y_q") * F.col("y_q")).cast("long").alias("ss_inc"),
    )
    grid = (
        daily.select("day")
        .distinct()
        .select(
            "day",
            F.explode(F.array(F.lit("A"), F.lit("B"))).alias("variant"),
        )
    )
    wcum = (
        W.partitionBy("variant")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = (
        grid.join(daily, ["day", "variant"], "left")
        .select(
            "day",
            "variant",
            F.sum(F.coalesce("n_inc", F.lit(0))).over(wcum).cast("long").alias("n"),
            F.sum(F.coalesce("s_inc", F.lit(0))).over(wcum).cast("long").alias("s"),
            F.sum(F.coalesce("ss_inc", F.lit(0)))
            .over(wcum)
            .cast("long")
            .alias("ss"),
        )
    )
    a = cum.filter(F.col("variant") == "A").select(
        "day",
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
        F.col("ss").alias("ssa"),
    )
    b = cum.filter(F.col("variant") == "B").select(
        F.col("day").alias("bday"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
        F.col("ss").alias("ssb"),
    )
    st = a.join(b, F.col("day") == F.col("bday")).selectExpr(
        "day",
        "na",
        "nb",
        "CAST(sb AS DOUBLE) / CAST(nullif(nb, 0) AS DOUBLE)"
        " - CAST(sa AS DOUBLE) / CAST(nullif(na, 0) AS DOUBLE) AS delta_c",
        "((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)"
        " / CAST(nullif(na, 0) AS DOUBLE))"
        " / CAST(nullif(na - 1, 0) AS DOUBLE))"
        " / CAST(nullif(na, 0) AS DOUBLE)"
        " + ((CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)"
        " / CAST(nullif(nb, 0) AS DOUBLE))"
        " / CAST(nullif(nb - 1, 0) AS DOUBLE))"
        " / CAST(nullif(nb, 0) AS DOUBLE) AS v",
    )
    wday = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    tau = st.withColumn("tau2", F.first("v", ignorenulls=True).over(wday))
    ll = tau.selectExpr(
        "day",
        "na",
        "nb",
        "delta_c",
        # Degenerate-variance guard (ADVICE r12): if all purchasing
        # user-days in both variants share identical cent totals, v=0
        # (and on day one tau2=0) — ln(0) / division by zero produce
        # -Infinity/NaN whose propagation Spark and DuckDB need not
        # agree on. nullif(...,0) makes those rows NULL identically
        # in both engines, matching the existing na=1 NULL-variance
        # path.
        "CAST(round((0.5D * ln(nullif(v, 0.0D)"
        " / (nullif(v, 0.0D) + nullif(tau2, 0.0D)))"
        " + delta_c * delta_c * nullif(tau2, 0.0D)"
        " / (2.0D * nullif(v, 0.0D)"
        " * (nullif(v, 0.0D) + nullif(tau2, 0.0D)))) * 1e6, 0)"
        " AS BIGINT) AS llq",
    )
    pd_ = ll.selectExpr(
        "day",
        "na",
        "nb",
        "delta_c",
        "llq",
        "round(least(1.0D, exp(-(CAST(llq AS DOUBLE) / 1e6))), 6) AS p_day",
    )
    return (
        pd_.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.round(F.col("delta_c") / F.lit(100.0), 4).alias("delta"),
            F.col("llq").alias("log_lambda_q"),
            "p_day",
            F.min("p_day").over(wday).alias("always_valid_p"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Round 14: heterogeneous-effect slicing — the missing A/B readout
# after sizing (events_ab_mde), monitoring (events_ab_sequential) and
# validity (events_srm_check): "the average lift is X, but WHICH
# users moved?" Per-segment Welch z over the per-user purchase-value
# metric with a Benjamini-Hochberg multiple-comparison guard, because
# slicing one experiment into m segments is m chances at a false
# positive — the per-segment p-values must be read through the BH
# ladder, not raw.

# Abramowitz & Stegun 7.1.26 erfc polynomial (|error| <= 1.5e-7,
# invisible under the query's 1e-6 p-value quantization): with
# x = |z|/sqrt(2) and t = 1/(1 + 0.3275911 x), the two-sided normal
# p-value 2*(1 - Phi(|z|)) = erfc(x) = poly(t) * exp(-x^2). The
# SAME Horner text runs on both engines, so the doubles agree
# bit-for-bit (IEEE-correctly-rounded ops + the shared libm exp).
_ERFC_P = (
    "((((1.061405429 * {t} - 1.453152027) * {t} + 1.421413741) * {t}"
    " - 0.284496736) * {t} + 0.254829592) * {t} * exp(-({x}) * ({x}))"
)


def _two_sided_p_sql(z_col: str) -> str:
    """SQL expression text for the two-sided normal p-value of
    ``z_col`` (NULL propagates), shared verbatim by the Spark
    selectExpr and the DuckDB oracle so the float trees are
    token-identical."""
    x = f"(abs({z_col}) / sqrt(2.0))"
    t = f"(1.0 / (1.0 + 0.3275911 * {x}))"
    return _ERFC_P.format(t=t, x=x)


@register(
    "events_ab_segments",
    oracle=f"""
    WITH t0 AS (
        SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    ),
    seg AS (
        SELECT e.user_id, min(e.event_type) AS segment
        FROM events e JOIN t0 ON e.user_id = t0.user_id
                             AND e.ts = t0.first_ts
        GROUP BY e.user_id
    ),
    per_user AS (
        SELECT user_id,
               CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
                                      THEN CAST(round(value * 100, 0) AS BIGINT)
                                 END), 0) AS BIGINT) AS y_q
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT s.segment,
               CASE WHEN substr(md5(CAST(s.user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS variant,
               p.y_q
        FROM seg s JOIN per_user p ON s.user_id = p.user_id
    ),
    mom AS (
        SELECT segment,
               CAST(count_if(variant = 'A') AS BIGINT) AS na,
               CAST(count_if(variant = 'B') AS BIGINT) AS nb,
               CAST(sum(CASE WHEN variant = 'A' THEN y_q ELSE 0 END)
                    AS BIGINT) AS sa,
               CAST(sum(CASE WHEN variant = 'B' THEN y_q ELSE 0 END)
                    AS BIGINT) AS sb,
               CAST(sum(CASE WHEN variant = 'A' THEN y_q * y_q ELSE 0 END)
                    AS BIGINT) AS ssa,
               CAST(sum(CASE WHEN variant = 'B' THEN y_q * y_q ELSE 0 END)
                    AS BIGINT) AS ssb
        FROM m GROUP BY segment
    ),
    stat AS (
        SELECT segment, na, nb, sa, sb,
               (CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                    / CAST(nullif(na, 0) AS DOUBLE))
                   / CAST(nullif(na - 1, 0) AS DOUBLE) AS var_a,
               (CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                    / CAST(nullif(nb, 0) AS DOUBLE))
                   / CAST(nullif(nb - 1, 0) AS DOUBLE) AS var_b
        FROM mom
    ),
    zed AS (
        SELECT segment, na, nb, sa, sb,
               (CAST(sb AS DOUBLE) / CAST(nullif(nb, 0) AS DOUBLE)
                - CAST(sa AS DOUBLE) / CAST(nullif(na, 0) AS DOUBLE))
               / nullif(sqrt(var_a / CAST(nullif(na, 0) AS DOUBLE)
                             + var_b / CAST(nullif(nb, 0) AS DOUBLE)), 0.0)
                   AS z
        FROM stat
    ),
    pq AS (
        SELECT segment, na, nb, sa, sb, z,
               CAST(round(COALESCE({_two_sided_p_sql('z')}, 1.0) * 1e9, 0)
                    AS BIGINT) AS p_q
        FROM zed
    ),
    ranked AS (
        SELECT *,
               CAST(row_number() OVER (ORDER BY p_q, segment) AS BIGINT) AS r,
               CAST(count(*) OVER () AS BIGINT) AS n_seg
        FROM pq
    ),
    bh AS (
        SELECT *,
               min(CAST(p_q AS DOUBLE) * CAST(n_seg AS DOUBLE)
                   / CAST(r AS DOUBLE))
                   OVER (ORDER BY r DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS q_min
        FROM ranked
    )
    SELECT segment, na AS n_a, nb AS n_b,
           round(CAST(sa AS DOUBLE) / CAST(nullif(na, 0) AS DOUBLE)
                 / 100.0, 4) AS mean_a,
           round(CAST(sb AS DOUBLE) / CAST(nullif(nb, 0) AS DOUBLE)
                 / 100.0, 4) AS mean_b,
           round((CAST(sb AS DOUBLE) / CAST(nullif(nb, 0) AS DOUBLE)
                  - CAST(sa AS DOUBLE) / CAST(nullif(na, 0) AS DOUBLE))
                 / 100.0, 4) AS delta,
           round(z, 4) AS z_score,
           round(CAST(p_q AS DOUBLE) / 1e9, 6) AS p_value,
           round(least(q_min / 1e9, 1.0), 6) AS p_bh,
           CAST(least(q_min / 1e9, 1.0) <= 0.05 AS BOOLEAN) AS significant
    FROM bh ORDER BY segment
    """,
    tags=("events", "experiment", "heterogeneity", "bh", "scale"),
)
def events_ab_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous treatment effects with a false-discovery guard:
    per-segment Welch z on the per-user purchase-value metric under
    `events_ab_lift`'s md5-coin assignment, segments = the user's
    FIRST event type (an acquisition-channel proxy fixed at user
    birth — slicing on a pre-treatment attribute, never on
    post-treatment behavior), p-values through the Benjamini-Hochberg
    step-up so reading m segment slices does not inflate the false
    positive rate m-fold. Completes the experiment-QA family's story:
    sizing (`events_ab_mde`), monitoring (`events_ab_sequential`),
    validity (`events_srm_check`), and now WHO moved.

    Exactness discipline (the events_ab_mde template): per-event
    values quantize to int64 cents before any sum; per-segment
    moments are exact int64; the Welch z and the two-sided normal
    p (Abramowitz-Stegun erfc polynomial, |err| <= 1.5e-7) are fixed
    double trees shared token-for-token with the oracle; the p-value
    is quantized to int64 at 1e-9 BEFORE the BH ranking, so rank
    order and the running min compare integers — a last-ulp libm
    divergence cannot flip a rank. Degenerate cells (a one-sided or
    zero-variance segment) yield NULL z and enter BH at p = 1 — no
    evidence, explicitly, instead of an ANSI division error.

    Scale shape: two per-user combinable aggregates (first-ts and
    purchase moments) plus the first-event resolution join are the
    only corpus-sized steps; everything after is a |segments|-row
    relation. The BH window is global but runs over one row per
    segment — bounded by the event-type vocabulary, not the data
    (allowlisted in scripts/plan_audit.py with that bound)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    t0 = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    seg = (
        ev.join(t0, "user_id")
        .filter(F.col("ts") == F.col("first_ts"))
        .groupBy("user_id")
        .agg(F.min("event_type").alias("segment"))
    )
    v_q = F.round(F.col("value") * 100, 0).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", v_q)), F.lit(0)
        )
        .cast("long")
        .alias("y_q")
    )
    m = seg.join(per_user, "user_id").select(
        "segment",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                *"01234567"
            ),
            "A",
        )
        .otherwise("B")
        .alias("variant"),
        "y_q",
    )
    mom = m.groupBy("segment").agg(
        F.count_if(F.col("variant") == "A").alias("na"),
        F.count_if(F.col("variant") == "B").alias("nb"),
        F.sum(F.when(F.col("variant") == "A", F.col("y_q")).otherwise(F.lit(0)))
        .cast("long")
        .alias("sa"),
        F.sum(F.when(F.col("variant") == "B", F.col("y_q")).otherwise(F.lit(0)))
        .cast("long")
        .alias("sb"),
        F.sum(
            F.when(F.col("variant") == "A", F.col("y_q") * F.col("y_q")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("ssa"),
        F.sum(
            F.when(F.col("variant") == "B", F.col("y_q") * F.col("y_q")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("ssb"),
    )
    stat = mom.selectExpr(
        "segment",
        "na",
        "nb",
        "sa",
        "sb",
        "(CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)"
        " / CAST(nullif(na, 0) AS DOUBLE))"
        " / CAST(nullif(na - 1, 0) AS DOUBLE) AS var_a",
        "(CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)"
        " / CAST(nullif(nb, 0) AS DOUBLE))"
        " / CAST(nullif(nb - 1, 0) AS DOUBLE) AS var_b",
    ).selectExpr(
        "segment",
        "na",
        "nb",
        "sa",
        "sb",
        "(CAST(sb AS DOUBLE) / CAST(nullif(nb, 0) AS DOUBLE)"
        " - CAST(sa AS DOUBLE) / CAST(nullif(na, 0) AS DOUBLE))"
        " / nullif(sqrt(var_a / CAST(nullif(na, 0) AS DOUBLE)"
        " + var_b / CAST(nullif(nb, 0) AS DOUBLE)), 0.0) AS z",
    )
    pq = stat.selectExpr(
        "segment",
        "na",
        "nb",
        "sa",
        "sb",
        "z",
        f"CAST(round(COALESCE({_two_sided_p_sql('z')}, 1.0) * 1e9, 0)"
        " AS BIGINT) AS p_q",
    )
    w_rank = W.orderBy("p_q", "segment")
    w_min = W.orderBy(F.col("r").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    ranked = pq.select(
        "*",
        F.row_number().over(w_rank).cast("long").alias("r"),
        F.count(F.lit(1)).over(W.partitionBy()).cast("long").alias("n_seg"),
    )
    bh = ranked.select(
        "*",
        F.min(
            F.col("p_q").cast("double")
            * F.col("n_seg").cast("double")
            / F.col("r").cast("double")
        )
        .over(w_min)
        .alias("q_min"),
    )
    return bh.selectExpr(
        "segment",
        "na AS n_a",
        "nb AS n_b",
        "round(CAST(sa AS DOUBLE) / CAST(nullif(na, 0) AS DOUBLE)"
        " / 100.0D, 4) AS mean_a",
        "round(CAST(sb AS DOUBLE) / CAST(nullif(nb, 0) AS DOUBLE)"
        " / 100.0D, 4) AS mean_b",
        "round((CAST(sb AS DOUBLE) / CAST(nullif(nb, 0) AS DOUBLE)"
        " - CAST(sa AS DOUBLE) / CAST(nullif(na, 0) AS DOUBLE))"
        " / 100.0D, 4) AS delta",
        "round(z, 4) AS z_score",
        "round(CAST(p_q AS DOUBLE) / 1e9, 6) AS p_value",
        "round(least(q_min / 1e9, 1.0D), 6) AS p_bh",
        "CAST(least(q_min / 1e9, 1.0D) <= 0.05D AS BOOLEAN) AS significant",
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# Round 14 (cont.): differentially-private statistics release — the
# privacy tier a training-data pipeline needs the day it publishes
# corpus statistics (per-day active users, domain mixes, quality
# histograms) outside the boundary that holds the raw data. The
# Laplace mechanism is a one-line noise add; what the engine must get
# right at scale is (a) the SENSITIVITY-BOUNDING aggregate shape
# (count DISTINCT users per day — each user contributes at most 1 to
# each released count, so per-count sensitivity is 1) and (b) a
# reproducible noise derivation, expressed here as seeded
# inverse-CDF noise keyed on the release cell.

_DP_EPS = "1.0"  # shared double literal, both engines
_DP_SEED = "dp1|"  # release-version prefix: new release => new noise


def _dp_uniform_sql(key_expr: str) -> str:
    """SQL text for a deterministic uniform in (0,1) strictly: the
    first 15 md5 hex chars of the seeded cell key as an int64 v in
    [0, 16^15), then (v + 0.5) / 16^15. Shared token-for-token with
    the oracle (the md5-prefix discipline of pipeline/sampling.py);
    only the hex->int call differs by engine and both are exact
    integer ops on the same 60-bit value."""
    hex2int = (
        f"conv(substr(md5(concat('{_DP_SEED}', {key_expr})), 1, 15), 16, 10)"
    )
    return f"(CAST({hex2int} AS DOUBLE) + 0.5) / 1152921504606846976.0"


@register(
    "events_dp_daily_counts",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS true_users
        FROM events GROUP BY 1
    ),
    noised AS (
        SELECT day, true_users,
               (CAST(('0x' || substr(md5(concat('{_DP_SEED}', day)), 1, 15))::BIGINT
                     AS DOUBLE) + 0.5) / 1152921504606846976.0 AS u
        FROM daily
    ),
    lap AS (
        SELECT day, true_users,
               -(1.0 / {_DP_EPS}) * sign(u - 0.5)
                   * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
        FROM noised
    )
    SELECT day, true_users,
           CAST(round(noise * 1e6, 0) AS BIGINT) AS noise_q,
           greatest(CAST(0 AS BIGINT),
                    true_users + CAST(round(noise, 0) AS BIGINT))
               AS dp_users,
           {_DP_EPS} + 0.0 AS eps
    FROM lap ORDER BY day
    """,
    tags=("events", "privacy", "dp", "scale"),
)
def events_dp_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism ARITHMETIC CERTIFICATION for a per-day
    active-user release at eps = 1 — NOT a private release (ADVICE
    r14). The noise here is a deterministic function of an in-source
    constant seed ('dp1|') and the public cell key, and true_users is
    emitted alongside, so anyone with the code can strip the noise
    exactly: this query certifies that the mechanism's sensitivity
    bounding, inverse-CDF arithmetic and clamping are cross-engine
    exact, which is the part an engine can certify. An actual release
    additionally needs (a) a secret, non-derivable per-release seed
    (or true randomness), (b) the true_users column dropped, and
    (c) the composition accounting below enforced — none of which
    change the query plan being certified.

    The mechanism: the aggregate counts DISTINCT users per day so each
    user's contribution to each released count is capped at 1
    (sensitivity 1 — the bounding is IN the aggregate shape, not an
    afterthought), then adds inverse-CDF Laplace noise b = 1/eps and
    clamps at zero (post-processing, privacy-free). A user active on
    d distinct days touches d released counts, so the release's
    user-level guarantee composes to d_max * eps — the event-level
    vs user-level distinction a real release must state; capping
    d_max (releasing only a user's first-k days) is one more
    groupBy upstream.

    The noise is SEEDED (md5 of a release-version prefix + the cell
    key -> uniform in strictly-(0,1) -> inverse CDF), which is what
    makes the mechanism certifiable cross-engine and reproducible
    across retries of the release job — and is exactly why this is a
    certification, not a release (see above).
    u = (v + 0.5)/16^15 can never hit 0, 0.5-exactly or
    1, so sign/ln are total. Scale shape: one distinct-aggregate
    exchange on (day, user) then a calendar-bounded per-day map —
    the noise add is free at any scale."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.col("ts").cast("date").cast("string").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("true_users"))
    )
    return (
        daily.selectExpr(
            "day",
            "true_users",
            f"{_dp_uniform_sql('day')} AS u",
        )
        .selectExpr(
            "day",
            "true_users",
            f"-(1.0D / {_DP_EPS}D) * sign(u - 0.5D)"
            " * ln(1.0D - 2.0D * abs(u - 0.5D)) AS noise",
        )
        .selectExpr(
            "day",
            "true_users",
            "CAST(round(noise * 1e6, 0) AS BIGINT) AS noise_q",
            "greatest(CAST(0 AS BIGINT),"
            " true_users + CAST(round(noise, 0) AS BIGINT)) AS dp_users",
            f"{_DP_EPS}D + 0.0D AS eps",
        )
        .orderBy("day")
    )
