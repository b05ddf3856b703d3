"""Pandas UDF surface (SURVEY.md §7.3): scalar, grouped-aggregate and
grouped-map registration — the escape hatch for logic the builtin
expression library can't state.

The reference has no UDF surface at all (only Catalyst builtins via
its resolver, Microbase.scala:197-207; SURVEY.md §2.10). Policy here
mirrors the 100 TB guidance: builtins first (everything else in this
repo is JVM-side); when Python is unavoidable, *Arrow-batched* pandas
UDFs — a row-at-a-time Python UDF pays serialization per value and is
10-100x slower. Each variant below is oracle-checked against the pure
SQL equivalent, proving the UDF path computes exactly what the
declarative form would.

All closures are self-contained (no repo imports inside the UDF):
Python workers don't have this repo on sys.path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.registry import register


@register(
    "pandas_udf_scalar",
    oracle="""
    SELECT p_partkey,
           round(p_retailprice * (1.0 - 0.01 * (p_size % 10)), 4) AS tiered_price
    FROM part
    WHERE p_partkey <= 300
    ORDER BY p_partkey
    """,
    tags=("udf", "pandas-udf", "scalar"),
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: vectorized over Arrow batches — the whole
    column arrives as a pandas Series per batch, so the Python cost is
    per-batch, not per-row. (This particular formula is expressible as
    builtins — the oracle IS that expression — which is exactly what
    makes it a correctness check of the UDF transport. Rounding is
    4dp: the product has <=4 decimal digits, so neither engine hits a
    half-way case — at 2dp Spark's BigDecimal-HALF_UP and DuckDB's
    float rounding disagree on exact .xx5 products.)"""

    @pandas_udf(T.DoubleType())
    def tiered(price: pd.Series, size: pd.Series) -> pd.Series:
        # no rounding here: pandas .round() is half-even while the SQL
        # engines round half-up — final rounding stays JVM-side
        return price * (1.0 - 0.01 * (size % 10))

    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return part.select(
        "p_partkey", F.round(tiered("p_retailprice", "p_size"), 4).alias("tiered_price")
    ).orderBy("p_partkey")


@register(
    "pandas_udf_grouped_agg",
    oracle="""
    SELECT o_orderpriority,
           round(sum(o_totalprice * o_shippriority_w) / sum(o_shippriority_w), 4)
               AS weighted_avg_price
    FROM (
        SELECT o_orderpriority, o_totalprice,
               1.0 + (o_orderkey % 3) AS o_shippriority_w
        FROM orders
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("udf", "pandas-udf", "grouped-agg"),
)
def pandas_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (a UDAF): weighted average where
    the whole group's columns arrive as Series. Executes as a real
    two-phase aggregate? No — grouped-agg UDFs are single-phase (all
    group rows colocate), so at 100 TB prefer decomposing into
    builtin sum()s as the oracle does; this entry pins that both
    routes agree."""

    @pandas_udf(T.DoubleType())
    def wavg(price: pd.Series, w: pd.Series) -> float:
        # unrounded (Python round() is half-even); rounded JVM-side
        return float((price * w).sum() / w.sum())

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "w", 1.0 + (F.col("o_orderkey") % 3)
    )
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.round(wavg("o_totalprice", "w"), 4).alias("weighted_avg_price"))
        .orderBy("o_orderpriority")
    )


@register(
    "pandas_udf_grouped_map",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS bal_z
    FROM customer
    ORDER BY c_mktsegment, c_custkey
    """,
    tags=("udf", "pandas-udf", "grouped-map", "applyInPandas"),
)
def pandas_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map via applyInPandas: each segment's rows arrive as
    one pandas DataFrame; returns a per-group transformed frame
    (z-scored balances). The shape for per-group model scoring /
    fitting at scale: one shuffle on the group key, Arrow both ways,
    group size bounded by executor memory (salt oversized groups
    first). Oracle = the window-function equivalent."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame(
            {
                "c_mktsegment": pdf["c_mktsegment"],
                "c_custkey": pdf["c_custkey"],
                "bal_z": (pdf["c_acctbal"] - mu) / sd,  # rounded JVM-side
            }
        )

    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .applyInPandas(zscore, schema="c_mktsegment string, c_custkey long, bal_z double")
        .select("c_mktsegment", "c_custkey", F.round("bal_z", 4).alias("bal_z"))
        .orderBy("c_mktsegment", "c_custkey")
    )


_UDTF_ORACLE = r"""
    WITH toks AS (
        SELECT doc_id, j - 1 AS idx, toks[j] AS tok
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM documents) d,
        LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS j) s
    )
    SELECT doc_id,
           CAST(idx // 32 AS BIGINT) AS chunk_id,
           count(*) AS n_tokens,
           CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct,
           min(CASE WHEN idx % 32 = 0 THEN tok END) AS head_token
    FROM toks
    GROUP BY doc_id, idx // 32
    ORDER BY doc_id, chunk_id
"""


@register(
    "udtf_word_windows",
    oracle=_UDTF_ORACLE,
    tags=("udf", "udtf", "lateral", "chunking"),
)
def udtf_word_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4.0+): a user-defined TABLE function invoked
    with LATERAL — each document row expands to one row per 32-token
    window carrying per-window stats. This is the 1→N escape hatch
    when the expansion logic can't be said with explode/builtins
    (here it CAN — the DuckDB oracle replays it relationally — which
    is what makes the entry a transport check of the UDTF surface,
    same policy as the pandas_udf_* trio).

    Scale shape: the UDTF is map-only — no shuffle, no state; Python
    cost is per-row-batch. The declarative equivalent
    (`text_chunk_documents`) stays JVM-side and is what you'd ship at
    100 TB; this pins the API route for logic that genuinely needs
    Python (real tokenizers: BPE/sentencepiece).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id bigint, n_tokens bigint, n_distinct bigint, head_token string")
    class WordWindows:
        def eval(self, text: str):
            import re

            # Mirror the oracle's string_split_regex(trim(text), '\s+')
            # EXACTLY, including edges the fixtures don't exercise:
            # DuckDB trim() strips spaces only (not tabs/newlines) and
            # splitting '' yields [''] — a bare str.split() would
            # silently diverge on an empty or tab-prefixed document.
            toks = re.split(r"\s+", (text or "").strip(" "))
            width = 32
            for c in range((len(toks) + width - 1) // width):
                w = toks[c * width:(c + 1) * width]
                yield c, len(w), len(set(w)), w[0]

    spark.udtf.register("word_windows", WordWindows)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT doc_id, w.chunk_id, w.n_tokens, w.n_distinct, w.head_token
        FROM documents, LATERAL word_windows(text) AS w
        ORDER BY doc_id, chunk_id
        """
    )


@register(
    "pandas_udf_scalar_iter",
    oracle="""
    SELECT event_id,
           round(1.0 / (1.0 + exp(-(value - 10.0) / 5.0)), 4) AS score
    FROM events
    WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
    tags=("udf", "pandas-udf", "scalar-iter"),
)
def pandas_udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF (SCALAR_ITER): the third scalar
    UDF evaluation shape, for per-EXECUTOR amortized setup — the
    iterator form runs its preamble once per worker task and then
    streams every Arrow batch through the already-initialized state.
    That's the pattern for 'load the model once, score a million
    rows': here the 'model' is a logistic scorer whose parameters are
    'loaded' before the batch loop (a stand-in for an expensive
    weight load; the arithmetic itself is the oracle's expression,
    which is exactly what makes it a transport check, as with
    `pandas_udf_scalar`). Rounding stays JVM-side (pandas rounds
    half-even; the engines round half-up)."""
    @pandas_udf(T.DoubleType())
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        # per-task setup: runs once, not once per batch/row
        mid, scale = 10.0, 5.0
        for values in batches:
            yield 1.0 / (1.0 + np.exp(-(values - mid) / scale))

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return ev.select(
        "event_id", F.round(score("value"), 4).alias("score")
    ).orderBy("event_id")
