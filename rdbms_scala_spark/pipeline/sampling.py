"""Deterministic sampling and dataset-split assignment for
training-data pipelines (north-star extension; the reference has no
sampling surface at all).

Both operators key off ``md5(text-of-key)`` *hex-string prefixes*
rather than numeric hash conversions: md5 produces identical lowercase
hex in Spark (over UTF-8 bytes) and DuckDB (over the varchar), so the
oracles reproduce the exact row sets — and the sample is stable across
runs, engines, partitionings, and cluster sizes, which is the property
that matters for reproducible training sets (a ``TABLESAMPLE`` or
``rand()`` sample is none of those things).

Scale shape: hash sampling and split assignment are map-only passes —
a filter or a projected CASE on a per-row hash — with aggregation only
where the query itself reports distribution stats; no shuffle is
introduced by the sampling itself, so at 100 TB they run at scan
speed. The per-class cap sampler is the exception (it needs a
per-group ranking) and is evaluated as a two-level window to keep
low-cardinality group keys off single reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.registry import register


def _doc_hash():
    """Lowercase md5 hex of the doc_id rendered as text — the
    deterministic per-row coin, identical in both engines."""
    return F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8"))


@register(
    "sample_deterministic_hash",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2')
    """,
    tags=("sample", "deterministic", "scale"),
)
def sample_deterministic_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~3/16 deterministic sample of the corpus: keep rows whose md5
    hex starts with 0/1/2. Adding data never reshuffles membership of
    existing rows (unlike rand() or TABLESAMPLE), so downstream
    training sets are append-stable."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        F.substring(_doc_hash(), 1, 1).isin("0", "1", "2")
    ).select("doc_id", "lang", "source", "n_chars")


@register(
    "sample_train_val_test",
    oracle="""
    WITH assigned AS (
        SELECT lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                    THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d')
                    THEN 'val'
                    ELSE 'test' END AS split,
               n_chars
        FROM documents
    )
    SELECT lang, split, count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars
    FROM assigned
    GROUP BY lang, split
    """,
    tags=("sample", "split", "scale"),
)
def sample_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 12/2/2-sixteenths train/val/test assignment from
    the md5 hex prefix, reported as per-language split sizes — the
    leakage-proof split: a document's split is a pure function of its
    id, so no near-dup pair can straddle splits after dedup keyed on
    the same id space, and re-runs can never migrate rows."""
    docs = load_table(spark, sf_dir, "documents")
    first = F.substring(_doc_hash(), 1, 1)
    split = (
        F.when(first.isin(*"0123456789ab"), "train")
        .when(first.isin("c", "d"), "val")
        .otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


@register(
    "sample_per_group_cap",
    oracle="""
    SELECT doc_id, lang
    FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    WHERE rn <= 5
    ORDER BY lang, doc_id
    """,
    tags=("sample", "balance", "scale"),
)
def sample_per_group_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class cap: keep at most 5 documents per language, chosen by
    md5-hash order — the class-balancing sampler (caps over-represented
    languages/sources without biasing toward low ids; deterministic).

    Two-level evaluation because the group key is LOW-cardinality: a
    single window over `lang` would funnel an entire language through
    one reducer at 100 TB. Level 1 pre-caps within (lang, hash-bucket)
    — 32 parallel reducers per language, each keeping its local top-5
    by hash order; level 2 re-windows over the <= 5x32 survivors per
    language. The global top-5-by-hash is contained in the union of
    per-bucket top-5s, so the result is identical to the single-window
    form (which is what the oracle expresses)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", _doc_hash().alias("h")
    )
    bucket = F.pmod(F.xxhash64("doc_id"), F.lit(32))
    w_local = W.partitionBy("lang", bucket).orderBy("h", "doc_id")
    survivors = (
        docs.withColumn("rn_local", F.row_number().over(w_local))
        .filter(F.col("rn_local") <= 5)
        .drop("rn_local")
    )
    w_final = W.partitionBy("lang").orderBy("h", "doc_id")
    return (
        survivors.withColumn("rn", F.row_number().over(w_final))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )
