"""Keyed-snapshot maintenance: MERGE/upsert without a table format.

The lakehouse MERGE INTO pattern (update matched keys, insert new
ones) expressed as plain Spark primitives — the maintenance operator a
100 TB corpus needs between full rebuilds (nightly metadata refreshes,
late-arriving corrections, incremental crawl batches). The reference
has no DML at all beyond CREATE TABLE (Microbase.scala:950-983); this
is a north-star extension.

Scale shape (the docstrings below pin the specifics): the merge itself
is one anti-join — broadcast when the update batch is small, the
overwhelmingly common case — plus a union; neither touches the base
table's payload columns with any shuffle. Landing the result uses
dynamic partition overwrite so only partitions that actually contain
touched keys are rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.registry import register


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    broadcast_updates: bool = True,
    validate_unique: bool = False,
) -> DataFrame:
    """MERGE semantics over DataFrames: every ``updates`` row wins over
    the same-key ``base`` row (matched -> replaced), unmatched update
    keys are inserted, untouched base rows pass through. Columns must
    align (unionByName).

    Spark-first shape: ``base LEFT ANTI JOIN updates ON keys`` keeps
    the survivors, then ``UNION ALL updates`` — ONE pass over the base
    table. With ``broadcast_updates`` (the common case: update batches
    are orders of magnitude smaller than the snapshot) the anti-join
    is map-only, so the whole merge is shuffle-free over the base. At
    100 TB, land the result with dynamic partition overwrite
    (``spark.sql.sources.partitionOverwriteMode=dynamic`` +
    ``write_parquet(partition_by=...)``): only partitions containing a
    touched key get rewritten, the rest of the snapshot is never read
    or written. A full-outer-join formulation would shuffle every
    payload column of both sides on the key for the same result —
    strictly worse.

    ``updates`` is referenced TWICE in the plan (anti-join build side
    + union branch) and Spark re-evaluates its lineage both times; if
    deriving the batch is expensive (filtered from the base table,
    remote reads), materialize it first — ``.localCheckpoint(True)``
    beats ``.cache()`` for one-shot merges because checkpoint blocks
    are released when the DataFrame is garbage-collected, while cache
    entries pin the CacheManager until an explicit unpersist. The
    registered ``pipeline_upsert_snapshot`` demo does exactly this.

    PRECONDITION — ``updates`` must be unique on ``keys``. SQL
    ``MERGE INTO`` raises on multiple source matches for one target
    row; this operator instead emits BOTH duplicate rows (the
    anti-join drops the base row once, the union appends every
    duplicate), silently diverging from MERGE semantics. Pass
    ``validate_unique=True`` to fail fast instead — one cheap
    aggregate over the (small) batch.
    """
    if validate_unique:
        dup = (
            updates.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"merge_upsert: updates batch has multiple rows for key "
                f"{dict((k, dup[0][k]) for k in keys)}; MERGE requires a "
                "unique source key — dedupe the batch first"
            )
    upd = F.broadcast(updates) if broadcast_updates else updates
    return base.join(upd, keys, "left_anti").unionByName(updates)


@register(
    "pipeline_upsert_snapshot",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey, 'U' AS o_orderstatus,
               round(o_totalprice + 1000.0, 2) AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT (SELECT max(o_orderkey) FROM orders) + x AS o_orderkey,
               'N' AS o_orderstatus, 100.0 AS o_totalprice
        FROM generate_series(1, 5) t(x)
    ),
    merged AS (
        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM updates
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM merged
    """,
    tags=("pipeline", "merge", "upsert", "scale"),
)
def pipeline_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert gate entry: apply a deterministic update batch to
    the orders snapshot — every 10th key's status flips to 'U' with a
    1000.0 price bump (the UPDATE path — an exact-in-double addition,
    so cross-engine rounding agrees; a multiplicative bump lands on
    .005 boundaries where Spark and DuckDB round differently) and
    five brand-new keys append (the INSERT path) — and return the
    full merged snapshot, so the oracle certifies all three row fates
    (replaced / inserted / passed through) row-by-row. See
    :func:`merge_upsert` for the scale shape."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    modified = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            F.round(F.col("o_totalprice") + 1000.0, 2).alias("o_totalprice"),
        )
    )
    inserted = (
        load_table(spark, sf_dir, "orders")
        .agg(F.max("o_orderkey").alias("mk"))
        .select(F.explode(F.sequence(F.col("mk") + 1, F.col("mk") + 5)).alias("o_orderkey"))
        .select(
            "o_orderkey",
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
        )
    )
    # The batch is DERIVED from the base table, and merge_upsert
    # references it twice (anti-join build side + union branch):
    # without materialization Spark re-evaluates the lineage at every
    # reference and the plan scans orders 5x. localCheckpoint (eager)
    # collapses the batch to a materialized RDD so the merge plan
    # scans orders exactly once — and unlike .cache() the blocks are
    # GC-released, so repeated bench invocations don't accumulate
    # CacheManager state.
    updates = modified.unionByName(inserted).localCheckpoint(eager=True)
    return merge_upsert(orders, updates, keys=["o_orderkey"], validate_unique=True)
