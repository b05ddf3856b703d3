"""Deduplication operators for training-data pipelines (north-star
extension — nothing like this exists in the reference, whose data
model is 5 scalar types; SURVEY.md §7.3).

Four tiers, by cost/recall tradeoff at 100 TB:

- exact: hash-groupBy on a content fingerprint. One shuffle on the
  hash; at scale use it as the cheap first pass.
- n-gram Jaccard: exact pairwise similarity via a shingle inverted
  index (token-trigram explode -> self-join on shingle). Quadratic in
  the worst case but bounded by shared-shingle co-occurrence; the
  correctness anchor for the approximate tiers.
- MinHash + LSH banding: linear-ish scale path. Signatures are k
  independent min-hashes (xxhash64 with per-permutation seeds), banded
  so that only same-band-hash docs are candidate pairs — the join is
  on (band, band_hash), never all-pairs.
- SimHash: 64-bit fingerprints whose Hamming distance tracks cosine
  similarity of token sets; candidates via 16-bit chunk banding
  (pigeonhole: hamming<=3 => some chunk of 4 equal).

All tokenization is lower(trim(text)) split on whitespace so the
DuckDB oracles can reproduce it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.registry import register

# ---------------------------------------------------------------------------
# shared building blocks


def tokens(col: str = "text"):
    """Whitespace tokens of lower-cased trimmed text (matches DuckDB
    regexp_split_to_array(lower(trim(..)), '\\s+'))."""
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def shingles_df(docs: DataFrame, n: int = 3, distinct: bool = True) -> DataFrame:
    """(doc_id, shingle) word n-grams per doc.

    ``distinct=False`` skips the dedup shuffle — correct for consumers
    that are duplicate-insensitive (MinHash: min over repeated values
    is unchanged; SimHash: vote weights become term-frequency weighted,
    which is standard)."""
    t = docs.select("doc_id", tokens().alias("t")).filter(F.size("t") >= n)
    sh = t.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {n - 1}), "
                f"i -> concat_ws(' ', slice(t, i, {n})))"
            )
        ).alias("shingle"),
    )
    return sh.distinct() if distinct else sh


# Default document-frequency cap for the inverted-index join. A
# "stop-shingle" appearing in df documents contributes df^2/2 rows to
# the posting-list self-join — one boilerplate phrase shared by 1M docs
# is a 500-billion-row join. Dropping shingles with df above the cap
# bounds every posting list (worst-case join fan-out <= cap * n_shingles)
# and barely moves recall: a phrase shared by thousands of documents
# carries no near-dup signal. Testdata's max df is 25 at sf0.1, so the
# default never fires there (oracles stay exact); production tunes it
# to corpus size (e.g. 1e-4 of corpus count).
MAX_SHINGLE_DF = 5000


def cap_shingle_df(sh: DataFrame, max_df: int = MAX_SHINGLE_DF) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_df``.

    The df aggregation is map-side combinable (one cheap shuffle on the
    shingle); the surviving hot-set complement is applied as a
    broadcast anti-join — the hot list is tiny by construction (only
    shingles in > max_df docs)."""
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("shingle")
    )
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


def pairwise_jaccard(sh: DataFrame, max_df: int = MAX_SHINGLE_DF) -> DataFrame:
    """Exact Jaccard for every doc pair sharing >=1 shingle, via the
    inverted-index self-join (never a full cross product). Shingles
    with document frequency > ``max_df`` are dropped from BOTH the
    index and the per-doc sizes (Jaccard stays consistent over the
    capped shingle space) — see ``cap_shingle_df``."""
    sh = cap_shingle_df(sh, max_df)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# 1. exact dedup


@register(
    "dedup_exact_docs",
    oracle="""
    SELECT md5(lower(trim(text))) AS fingerprint,
           min(doc_id)            AS keeper_doc_id,
           count(*)               AS n_copies
    FROM documents
    GROUP BY md5(lower(trim(text)))
    """,
    tags=("dedup", "exact", "scale"),
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the lowest doc_id.
    At 100 TB: one shuffle on the 128-bit fingerprint — the grouping
    key is uniform so no skew; this is the standard cheap first pass
    before any near-dup tier."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# 2. exact n-gram Jaccard near-dup (correctness anchor)

_JACCARD_ORACLE = """
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    idx AS (
        SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM idx
    ),
    sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter), 4) AS jaccard
    FROM inter
    JOIN sz x ON x.doc_id = doc_a
    JOIN sz y ON y.doc_id = doc_b
    WHERE n_inter * 1.0 / (x.n_sh + y.n_sh - n_inter) >= 0.7
"""


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE, tags=("dedup", "neardup"))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram-Jaccard near-dup pairs at threshold 0.7 via the
    shingle inverted index. The exact tier: use on LSH candidates at
    scale, directly on modest corpora."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = pairwise_jaccard(shingles_df(docs, n=3))
    return pairs.filter(F.col("jaccard") >= 0.7).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# 3. MinHash + LSH banding (the scale path)

_NUM_PERM = 32
_BANDS = 8
_ROWS_PER_BAND = _NUM_PERM // _BANDS


def minhash_signatures(sh: DataFrame, num_perm: int = _NUM_PERM) -> DataFrame:
    """(doc_id, sig array<long>): per-permutation min of seeded
    xxhash64 over the doc's shingles. One aggregation; signature size
    is fixed (num_perm longs) regardless of doc length."""
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}") for i in range(num_perm)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select("doc_id", F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig"))


@register(
    "dedup_minhash_lsh",
    # xxhash64 seeds are Spark-specific; no cross-engine oracle. The
    # exact companion `dedup_ngram_jaccard` anchors correctness, and
    # tests assert LSH recovers its >=0.9 pairs.
    oracle=None,
    tags=("dedup", "neardup", "lsh", "scale"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates, verified on signatures.

    shingle -> 32-perm minhash signature -> 8 bands of 4 rows; docs
    colliding on any (band, band_hash) become candidates; estimated
    Jaccard = fraction of matching signature positions; emit pairs
    with est >= 0.7. At 100 TB the only joins are on band hashes
    (collision-bounded), never all-pairs; signature build is one
    shuffle, banding a second."""
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(shingles_df(docs, n=3, distinct=False)).cache()
    bands = sig.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_BANDS - 1}), "
                f"b -> struct(b AS band, xxhash64(concat_ws(',', slice(sig, b * {_ROWS_PER_BAND} + 1, {_ROWS_PER_BAND}))) AS bh))"
            )
        ).alias("e"),
    ).select("doc_id", F.col("e.band").alias("band"), F.col("e.bh").alias("band_hash"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.expr(
                    "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
                )
                / F.lit(_NUM_PERM)
            ).alias("est_jaccard"),
        )
    )
    return est.filter(F.col("est_jaccard") >= 0.7).select(
        "doc_a", "doc_b", F.round("est_jaccard", 4).alias("est_jaccard")
    )


# ---------------------------------------------------------------------------
# 4. SimHash


@register(
    "dedup_simhash",
    oracle=None,  # xxhash64-based bits are Spark-specific; tests check
    # it recovers the planted near-dup pairs.
    tags=("dedup", "neardup", "simhash", "scale"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance <= 10 of 64 bits.

    Per doc: 64-bit fingerprint = sign-aggregate of shingle-hash bits
    (trigram shingles, not bare tokens — the corpus vocabulary is
    small, so token-set fingerprints would collapse; shingles keep the
    feature space discriminative). Candidate generation by pigeonhole
    banding on eight 8-bit chunks (hamming <= 7 *guarantees* a chunk
    match; <= 10 nearly always has one); exact Hamming check via
    bit_count(xor). Everything is built-in exprs — no Python in the
    hot path."""
    docs = load_table(spark, sf_dir, "documents")
    tok = shingles_df(docs, n=3, distinct=True).withColumnRenamed("shingle", "tok")
    tok = tok.withColumn("h", F.xxhash64("tok"))
    # bit votes: +1 if bit set else -1, summed per bit position
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"shiftright(h, {b}) & 1") == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    fp = bit_sums.select(
        "doc_id",
        F.expr(
            "+".join(
                [f"shiftleft(CAST(CASE WHEN b{b} > 0 THEN 1 ELSE 0 END AS BIGINT), {b})" for b in range(64)]
            )
        ).alias("fp"),
    ).cache()
    chunks = fp.select(
        "doc_id",
        "fp",
        F.explode(
            F.expr(
                "transform(sequence(0, 7), c -> struct(c AS chunk, shiftright(fp, c * 8) & 255 AS cv))"
            )
        ).alias("e"),
    ).select("doc_id", "fp", F.col("e.chunk").alias("chunk"), F.col("e.cv").alias("cv"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.expr("fp_a ^ fp_b")))
        .filter(F.col("hamming") <= 10)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# 5. embedding-cosine near-dup


@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS dup_id,
           min(b.vec_id) AS keeper_id,
           round(max(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[])), 3) AS max_cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND b.vec_id < a.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
    GROUP BY a.vec_id
    ORDER BY dup_id
    """,
    tags=("dedup", "neardup", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: each vector with a lower-id same-label
    neighbor above the cosine threshold is a dup; its keeper is the
    lowest such neighbor (one-hop canonicalization — the iterative
    connected-components closure is a separate driver loop at scale).

    Blocking on ``label`` stands in for the coarse partitioner (cluster
    id / LSH bucket) that keeps this from being all-pairs at 100 TB:
    the join is label-equi, so each block is a bounded local cross.
    Threshold 0.35 sits at the synthetic corpus's ~99.9th percentile
    (vectors are near-random; real near-dup corpora use ~0.95+).
    """
    from rdbms_scala_spark.pipeline.similarity import _as_double, cosine_pre, norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    a = emb.select(
        F.col("vec_id").alias("dup_id"), F.col("label").alias("la"), F.col("v").alias("va")
    ).withColumn("nva", norm("va"))
    b = emb.select(
        F.col("vec_id").alias("nb_id"), F.col("label").alias("lb"), F.col("v").alias("vb")
    ).withColumn("nvb", norm("vb"))
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("nb_id") < F.col("dup_id")))
        .withColumn("cos", cosine_pre("va", "vb", "nva", "nvb"))
        .filter(F.col("cos") >= 0.35)
        .groupBy("dup_id")
        .agg(
            F.min("nb_id").alias("keeper_id"),
            F.round(F.max("cos"), 3).alias("max_cosine"),
        )
        .orderBy("dup_id")
    )


# ---------------------------------------------------------------------------
# 6. connected-components closure (iterative)

_CC_ORACLE = f"""
    WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id, least(u, min(v)) AS component_id
    FROM reach
    GROUP BY u
    ORDER BY doc_id
"""


def connected_components_edges(
    pairs: DataFrame, max_rounds: int = 50
) -> tuple[DataFrame, int]:
    """Connected components over an undirected edge list via the
    alternating large-star/small-star algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — public
    algorithm): each round rewires edges toward local minima
    (large-star hangs every larger neighbor under the neighborhood
    min, small-star re-points the smaller ones), roughly halving path
    lengths, so it converges in O(log n) rounds where plain min-label
    propagation needs O(component diameter) — the difference between
    ~6 and ~1000 shuffles on a chain-shaped duplicate cluster.

    Per round: two groupBy-min aggregations and two joins, all keyed
    on node ids (hash-partitioned, map-side combinable);
    ``localCheckpoint`` truncates lineage so round N doesn't replay
    rounds 1..N-1. Convergence probe is two scalars (edge count +
    order-insensitive xxhash64 sum) — the edge set is stable exactly
    at the star-forest fixpoint, where every edge is (node,
    component_min).

    Returns (labels DataFrame (doc_id, component_id), rounds used).
    ``pairs`` is any (doc_a, doc_b) near-dup pair set, either
    orientation."""
    E = (
        pairs.toDF("a", "b")
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )

    def probe(df: DataFrame):
        # summands bounded to [0, 1e9) via pmod so the sum can't hit
        # long overflow under ANSI mode (raw xxhash64 sums would after
        # ~2 rows); count + order-insensitive hash-sum identify the set
        edge_hash = F.pmod(F.xxhash64("u", "v"), F.lit(1_000_000_007))
        return tuple(
            df.agg(
                F.count(F.lit(1)), F.coalesce(F.sum(edge_hash), F.lit(0))
            ).collect()[0]
        )

    prev = probe(E)
    rounds = 0
    for _ in range(max_rounds):
        # large-star: for every node, hang each LARGER neighbor under
        # the minimum of its neighborhood (including itself)
        sym = E.union(E.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: re-point all smaller neighbors (and the node) at
        # the minimum of the smaller neighborhood
        canon = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        mins2 = canon.groupBy("u").agg(F.min("v").alias("m"))
        star = canon.join(mins2, "u")
        E = (
            star.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(star.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        rounds += 1
        cur = probe(E)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected-components did not converge in {max_rounds} rounds"
        )
    # fixpoint is a star forest: every edge is (member, root); roots
    # label themselves
    labels = (
        E.select(F.col("u").alias("doc_id"), F.col("v").alias("component_id"))
        .union(E.select(F.col("v").alias("doc_id"), F.col("v").alias("component_id")))
        .distinct()
    )
    return labels, rounds


@register(
    "dedup_connected_components",
    oracle=_CC_ORACLE,
    tags=("dedup", "neardup", "iterative", "graph"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup closure: near-dup pairs (trigram Jaccard >=
    0.7) form a graph; every document in a connected component maps to
    the component's minimum doc_id — the canonical keeper for
    chain-duplicates (A~B, B~C, A!~C), which one-hop keeper rules get
    wrong. Driver-loop iterative algorithm (no single SQL statement
    expresses it; the oracle uses DuckDB's recursive CTE to agree on
    the fixpoint) — see ``connected_components_edges`` for the
    alternating-star algorithm and its scale properties."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        pairwise_jaccard(shingles_df(docs, n=3))
        .filter(F.col("jaccard") >= 0.7)
        .select("doc_a", "doc_b")
    )
    labels, _rounds = connected_components_edges(pairs)
    return labels.orderBy("doc_id")


# ---------------------------------------------------------------------------
# 7. edit-distance (Levenshtein) near-dup


@register(
    "dedup_levenshtein",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(substr(lower(trim(a.text)), 1, 32),
                       substr(lower(trim(b.text)), 1, 32)) AS edit_distance
    FROM documents a JOIN documents b
      ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(lower(trim(a.text)), 1, 32),
                      substr(lower(trim(b.text)), 1, 32)) <= 12
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "neardup", "editdistance"),
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup tier: same-source doc pairs whose
    32-char lowercase prefixes are within Levenshtein distance 12 —
    the fuzzy-match complement to token-level Jaccard (catches
    character-level noise: OCR errors, encoding damage, small edits
    that shred token trigrams).

    Scale shape: ``source`` blocking keeps the pair space a bounded
    per-block local cross (stand-in for an LSH/cluster partitioner,
    as in dedup_embedding_cosine); the distance runs on fixed-length
    prefixes so each comparison is O(32^2) regardless of document
    length, JVM-side via the built-in levenshtein expression."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.substring(F.lower(F.trim(F.col("text"))), 1, 32).alias("p")
    )
    a = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"), F.col("p").alias("pa")
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"), F.col("p").alias("pb")
    )
    return (
        a.join(b, (F.col("sa") == F.col("sb")) & (F.col("doc_a") < F.col("doc_b")))
        .withColumn("edit_distance", F.levenshtein("pa", "pb"))
        .filter(F.col("edit_distance") <= 12)
        .select("doc_a", "doc_b", "edit_distance")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# 8. incremental dedup (new batch vs. existing corpus)


@register(
    "dedup_incremental",
    oracle="""
    WITH split AS (
        SELECT CAST(max(doc_id) / 2 AS BIGINT) AS split_at FROM documents
    ),
    existing AS (
        SELECT doc_id, md5(lower(trim(text))) AS fp
        FROM documents, split WHERE doc_id < split_at
    ),
    incoming AS (
        SELECT doc_id, md5(lower(trim(text))) AS fp
        FROM documents, split WHERE doc_id >= split_at
    )
    SELECT i.doc_id AS new_doc_id,
           min(e.doc_id) AS existing_dup_id
    FROM incoming i JOIN existing e USING (fp)
    GROUP BY i.doc_id
    ORDER BY new_doc_id
    """,
    tags=("dedup", "incremental", "scale"),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: fingerprint only the INCOMING batch
    and join it against the standing corpus fingerprint store — the
    ingest-time shape that makes dedup sustainable at 100 TB (the
    alternative, re-deduping the whole corpus per batch, rescans
    everything). Here the corpus is split at the median doc_id to
    stand in for existing-vs-new; in production the existing side is a
    persisted (bucketed-by-fp) fingerprint table, so this join is
    co-partitioned and the new batch is the only thing shuffled.
    Returns each incoming doc that collides with the store and its
    canonical existing keeper."""
    docs = load_table(spark, sf_dir, "documents")
    pivot = docs.agg((F.max("doc_id") / 2).cast("long")).collect()[0][0]
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    existing = docs.filter(F.col("doc_id") < pivot).select(
        F.col("doc_id").alias("existing_id"), fp.alias("fp")
    )
    incoming = docs.filter(F.col("doc_id") >= pivot).select(
        F.col("doc_id").alias("new_doc_id"), fp.alias("fp")
    )
    return (
        incoming.join(existing, "fp")
        .groupBy("new_doc_id")
        .agg(F.min("existing_id").alias("existing_dup_id"))
        .orderBy("new_doc_id")
    )
