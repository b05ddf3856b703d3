"""Multimodal columns: opaque binary payloads + typed metadata
(north-star extension).

The decode step is REAL, stdlib-only: payloads are synthesized as
valid PNG (zlib-compressed IDAT, CRC'd chunks), WAV (RIFF/fmt/data)
and MP4 (ftyp + moov/mvhd boxes) containers whose parameters derive
deterministically from doc_id, and ``parse_media_header`` reads the
dimensions / sample rate / duration back out of the bytes — so the
decode oracle can predict every parsed field arithmetically. Only the
*embedding* half of feature extraction remains a deterministic
sha256 fake (a stand-in for an image/audio model, which no stdlib
provides); swap ``_fake_features`` for a model call to productionize.
The Spark-side plumbing is the 100 TB shape throughout: binary
columns, metadata structs, Arrow-batched ``mapInPandas`` with
explicit output schemas and partition-sized batches.
"""

from __future__ import annotations

import hashlib
import os
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.registry import register

FEATURE_DIM = 8

# Repo root, captured driver-side as a plain string: UDF closures ship
# it to Python workers (whose sys.path lacks this repo when the driver
# imported us from a file path) so they can import the codec helpers.
_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# stdlib media codecs: synthesize valid containers, parse them back


def synth_payload(doc_id: int) -> bytes:
    """Deterministic, *valid* media container for a doc_id.

    - doc_id % 3 == 0 -> PNG, grayscale, width/height from doc_id
    - doc_id % 3 == 1 -> WAV, PCM16, rate/channels/samples from doc_id
    - else            -> MP4, ftyp(isom) + moov/mvhd with ms duration
    """
    m = doc_id % 3
    if m == 0:
        width = 8 + doc_id % 24
        height = 8 + doc_id % 16

        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body))
            )

        ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        raw = b"".join(
            b"\x00" + bytes((doc_id + row) % 256 for _ in range(width))
            for row in range(height)
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
    if m == 1:
        rate = (8000, 16000, 22050, 44100)[doc_id % 4]
        channels = 1 + doc_id % 2
        n_samples = 100 + doc_id % 400
        data = b"\x00\x00" * (n_samples * channels)
        fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body
    duration_ms = 1000 + doc_id % 5000

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + tag + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"mp41")
    mvhd = box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, 1000, duration_ms) + b"\x00" * 80)
    return ftyp + box(b"moov", mvhd)


def parse_media_header(payload: bytes) -> dict:
    """Parse container metadata out of raw bytes — stdlib only.

    Returns mime plus (-1 / '' where not applicable): width, height,
    sample_rate, duration_us for audio, duration_ms for video, brand.

    Corrupt/truncated payloads (PNG shorter than its IHDR, WAV with a
    short fmt chunk, …) degrade to the octet-stream default instead of
    raising: at 100 TB one bad file must not fail the whole
    ``mapInPandas`` task, so each per-format parser is wrapped and any
    struct/bounds error falls through to the generic answer.
    """
    out = {
        "mime": "application/octet-stream",
        "width": -1,
        "height": -1,
        "sample_rate": -1,
        "duration_us": -1,
        "brand": "",
    }
    try:
        return _parse_media_header_strict(payload, out)
    except (struct.error, IndexError, ValueError):
        return out


def _parse_media_header_strict(payload: bytes, out: dict) -> dict:
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # chunk layout: len(4) tag(4) body; IHDR is first
        if payload[12:16] == b"IHDR":
            width, height = struct.unpack(">II", payload[16:24])
            out.update(mime="image/png", width=width, height=height)
        return out
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos, rate, block_align, data_len = 12, -1, -1, -1
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            if tag == b"fmt ":
                _, _, rate, _, block_align, _ = struct.unpack(
                    "<HHIIHH", payload[pos + 8 : pos + 24]
                )
            elif tag == b"data":
                data_len = size
            pos += 8 + size + (size & 1)
        if rate > 0 and block_align > 0 and data_len >= 0:
            n_samples = data_len // block_align
            out.update(
                mime="audio/wav",
                sample_rate=rate,
                duration_us=n_samples * 1_000_000 // rate,
            )
        return out
    # ISO-BMFF: walk top-level boxes, then moov's children for mvhd
    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            if size < 8:
                return
            yield buf[pos + 4 : pos + 8], pos + 8, pos + size
            pos += size

    if payload[4:8] == b"ftyp":
        out["mime"] = "video/mp4"
        out["brand"] = payload[8:12].decode("ascii", "replace")
        for tag, body_start, body_end in walk(payload, 0, len(payload)):
            if tag == b"moov":
                for t2, s2, _e2 in walk(payload, body_start, body_end):
                    if t2 == b"mvhd":
                        timescale, duration = struct.unpack(
                            ">II", payload[s2 + 12 : s2 + 20]
                        )
                        if timescale:
                            out["duration_us"] = duration * 1_000_000 // timescale
    return out


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


def _feature_seed(doc_id: int, meta: dict) -> str:
    """Canonical seed string for the fake embedding: the doc id plus
    every field the real container decode produced, '|'-joined. Built
    from *decoded* metadata (not raw payload bytes) so an ANSI-SQL
    oracle can reproduce the seed arithmetically — sha256 of this
    string is then engine-independent (DuckDB's ``sha256`` and
    hashlib agree byte-for-byte)."""
    return (
        f"{doc_id}|{meta['mime']}|{meta['width']}|{meta['height']}"
        f"|{meta['sample_rate']}|{meta['duration_us']}|{meta['brand']}"
    )


def _fake_features(seed: str, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake embedding: sha256-seeded values in [0, 1).
    Stands in for an image/audio embedding *model* (the only part of
    the pipeline with no stdlib implementation); the container decode
    that produces the seed is real (see parse_media_header)."""
    h = hashlib.sha256(seed.encode()).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


@register(
    "multimodal_decode",
    # Every parsed field is a deterministic function of doc_id, so the
    # oracle re-derives them arithmetically — proving the synthesized
    # containers round-trip through the real stdlib parsers.
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 24 ELSE -1 END AS width,
           CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 16 ELSE -1 END AS height,
           CASE WHEN doc_id % 3 = 1
                THEN [8000, 16000, 22050, 44100][(doc_id % 4) + 1]
                ELSE -1 END AS sample_rate,
           CASE WHEN doc_id % 3 = 1
                THEN (100 + doc_id % 400) * 1000000
                     // [8000, 16000, 22050, 44100][(doc_id % 4) + 1]
                WHEN doc_id % 3 = 2 THEN (1000 + doc_id % 5000) * 1000
                ELSE -1 END AS duration_us,
           CASE WHEN doc_id % 3 = 2 THEN 'isom' ELSE '' END AS brand
    FROM documents
    """,
    tags=("multimodal", "decode", "pandas-udf"),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real media decode over binary payloads: synthesize a valid
    PNG/WAV/MP4 container per document (parameters derived from
    doc_id), then parse dimensions / sample rate / duration back out
    of the *bytes* with the stdlib header parsers — all inside one
    Arrow-batched ``mapInPandas`` pass, the shape a 100 TB decode job
    takes (fixed-memory batches, per-payload decode, declared output
    schema). The reference has no binary/media types at all (its five
    scalar types: Microbase.scala:28-35); this is the north-star
    multimodal extension."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id")
    pkg_root = _PKG_ROOT

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        from rdbms_scala_spark.pipeline.multimodal import (
            parse_media_header,
            synth_payload,
        )

        for pdf in batches:
            metas = [parse_media_header(synth_payload(int(d))) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "sample_rate": [m["sample_rate"] for m in metas],
                    "duration_us": [m["duration_us"] for m in metas],
                    "brand": [m["brand"] for m in metas],
                }
            )

    return src.mapInPandas(
        decode,
        schema="doc_id long, mime string, width long, height long, "
        "sample_rate long, duration_us long, brand string",
    )


def multimodal_features_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    ``mapInPandas``: real stdlib container decode (mime + parsed
    metadata ride along with the vector) plus the deterministic fake
    embedding standing in for a model call, seeded by the decoded
    metadata (:func:`_feature_seed`).

    Library form: returns ``features array<double>`` for programmatic
    use (similarity search, training pipelines). The REGISTERED
    ``multimodal_features`` query emits the full decoded metadata and
    a hex signature of the same vector instead, so every column is a
    scalar the driver hash canonicalizes AND derivable in ANSI SQL."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id")
    pkg_root = _PKG_ROOT

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        from rdbms_scala_spark.pipeline.multimodal import (
            _fake_features,
            _feature_seed,
            parse_media_header,
            synth_payload,
        )

        for pdf in batches:
            payloads = [synth_payload(int(d)) for d in pdf["doc_id"]]
            metas = [parse_media_header(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in metas],
                    "n_bytes": [len(p) for p in payloads],
                    "features": [
                        _fake_features(_feature_seed(int(d), m))
                        for d, m in zip(pdf["doc_id"], metas)
                    ],
                }
            )

    return src.mapInPandas(
        extract,
        schema="doc_id long, mime string, n_bytes long, features array<double>",
    )


def _features_oracle() -> str:
    """Full cross-engine oracle for ``multimodal_features``: every
    metadata column re-derived arithmetically (proving the stdlib
    containers round-trip through the real parsers, as in
    ``multimodal_decode``), and the feature signature reproduced as
    sha256 over the same canonical seed — 8 big-endian uint32 hex
    chunks, exactly the bytes the fake embedding divides by 2^32."""
    chunks = ", ".join(
        f"substring(sha, {8 * i + 1}, 8)" for i in range(FEATURE_DIM)
    )
    return f"""
    WITH meta AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS mime,
               CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 24 ELSE -1 END AS width,
               CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 16 ELSE -1 END AS height,
               CASE WHEN doc_id % 3 = 1
                    THEN [8000, 16000, 22050, 44100][(doc_id % 4) + 1]
                    ELSE -1 END AS sample_rate,
               CASE WHEN doc_id % 3 = 1
                    THEN (100 + doc_id % 400) * 1000000
                         // [8000, 16000, 22050, 44100][(doc_id % 4) + 1]
                    WHEN doc_id % 3 = 2 THEN (1000 + doc_id % 5000) * 1000
                    ELSE -1 END AS duration_us,
               CASE WHEN doc_id % 3 = 2 THEN 'isom' ELSE '' END AS brand
        FROM documents
    ),
    hashed AS (
        SELECT *,
               sha256(doc_id || '|' || mime || '|' || width || '|' || height
                      || '|' || sample_rate || '|' || duration_us || '|' || brand)
               AS sha
        FROM meta
    )
    SELECT doc_id, mime,
           CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(sample_rate AS BIGINT) AS sample_rate,
           CAST(duration_us AS BIGINT) AS duration_us,
           brand,
           concat_ws(',', {chunks}) AS features_sig
    FROM hashed
    """


@register(
    "multimodal_features",
    oracle=_features_oracle(),
    tags=("multimodal", "pandas-udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate form of the multimodal feature-extraction pass: one
    Arrow-batched ``mapInPandas`` decode emits the full parsed
    metadata (real stdlib container decode) plus ``features_sig`` —
    the fake embedding's sha256 state as comma-joined 8-hex-char
    chunks (chunk i, read as a big-endian uint32 / 2^32, IS dimension
    i of :func:`multimodal_features_array`'s vector). Hex chunks
    rather than formatted floats keep the signature integer-exact, so
    the DuckDB oracle (:func:`_features_oracle`) covers every output
    column — this query was rows-only until round 7."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id")
    pkg_root = _PKG_ROOT

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        from rdbms_scala_spark.pipeline.multimodal import (
            _feature_seed,
            parse_media_header,
            synth_payload,
        )

        def sig(seed: str) -> str:
            hx = _hashlib.sha256(seed.encode()).hexdigest()
            return ",".join(hx[8 * i : 8 * i + 8] for i in range(FEATURE_DIM))

        for pdf in batches:
            metas = [parse_media_header(synth_payload(int(d))) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "sample_rate": [m["sample_rate"] for m in metas],
                    "duration_us": [m["duration_us"] for m in metas],
                    "brand": [m["brand"] for m in metas],
                    "features_sig": [
                        sig(_feature_seed(int(d), m))
                        for d, m in zip(pdf["doc_id"], metas)
                    ],
                }
            )

    return src.mapInPandas(
        extract,
        schema="doc_id long, mime string, width long, height long, "
        "sample_rate long, duration_us long, brand string, features_sig string",
    )


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
