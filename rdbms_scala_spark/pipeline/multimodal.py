"""Multimodal columns: opaque binary payloads + typed metadata
(north-star extension).

The container has no image/audio libraries, so the *decode* step is
stubbed (deterministic fake features; real decoders gated behind an
import-try raising NotImplementedError) — but the Spark-side plumbing
is real and tested: binary columns, metadata structs, Arrow-batched
``mapInPandas`` with an explicit output schema, and partition-sized
batches. Swapping the fake for PIL/ffmpeg changes one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.registry import register

FEATURE_DIM = 8


@register(
    "multimodal_ingest",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))    AS n_bytes,
           sha256(text)                  AS payload_sha256,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END     AS mime
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest documents as opaque binary payloads with typed metadata —
    the storage pattern for multimodal data at scale: payload stays an
    unparsed ``binary`` column (Parquet keeps it out of row-group
    stats), metadata is a small struct that filters/partitions cheaply.
    The mime tag is synthesized deterministically (no real media in the
    testdata)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    mime = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    with_meta = docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )
    return with_meta.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
        F.col("meta.mime").alias("mime"),
    )


def _decode_real(payload: bytes, mime: str):
    """Real decoder — requires media libraries absent from this
    container. Clearly-marked stub per the build contract."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "media decode requires pillow/ffmpeg, not present in this environment"
        ) from exc
    raise NotImplementedError("real decode path not wired yet")


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake feature extractor: sha256-seeded values in
    [0, 1). Stands in for an image/audio embedding model."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


@register(
    "multimodal_features",
    oracle=None,  # fake-decoder output; tests assert shape/determinism
    tags=("multimodal", "pandas-udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    ``mapInPandas`` — the real 100 TB shape: batches stream through
    Python with fixed memory, the decode call is per-payload, and the
    output schema is declared up front. Uses the deterministic fake
    decoder (see _decode_real for the gated real path)."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    dim = FEATURE_DIM

    # NB: the UDF body must be self-contained (no references to this
    # module's globals) — Spark's Python workers unpickle it without
    # rdbms_scala_spark on their sys.path when the driver imports us
    # from a file path.
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        def fake_features(payload: bytes) -> list[float]:
            h = _hashlib.sha256(payload).digest()
            return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]

        for pdf in batches:
            feats = [fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return src.mapInPandas(extract, schema="doc_id long, n_bytes long, features array<double>")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH meta AS (
        SELECT doc_id, (doc_id % 120) + 1 AS n_frames
        FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id, n_frames, unnest(range(0, n_frames, 10)) AS frame_idx
    FROM meta
    """,
    tags=("multimodal", "video"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan for 'video' payloads: every 10th frame
    index from deterministic per-doc frame counts — the explode
    pattern that fans one video row out to its decode tasks (each
    frame_idx row becomes one decoder invocation downstream)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    meta = docs.select("doc_id", ((F.col("doc_id") % 120) + 1).alias("n_frames"))
    return meta.select(
        "doc_id",
        "n_frames",
        F.explode(F.expr("sequence(0, n_frames - 1, 10)")).alias("frame_idx"),
    )
