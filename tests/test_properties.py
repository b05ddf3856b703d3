"""Property-based tests (hypothesis): algebraic invariants that must
hold for ANY input, not just the testdata — the adversarial
complement to the oracle comparisons (empty tables, all-duplicate
keys, hot keys, negative values).

Spark-backed properties keep max_examples small (each example pays a
createDataFrame + job round trip): the count comes from the loaded
hypothesis profile — conftest registers "ci" (6 examples,
DERANDOMIZED: committed runs are reproducible, never seed-lucky) and
"thorough" (HYPOTHESIS_PROFILE=thorough: 200 randomized examples for
round-boundary certification).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# max_examples / derandomize / deadline inherit from the profile
# conftest loaded; only the fixture health-check is pinned here.
_spark_settings = settings(
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small int tables with heavy key collisions (keys drawn from 0..3)
rows_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-100, 100)), min_size=0, max_size=12
)


@given(left=rows_strategy, right=rows_strategy)
@_spark_settings
def test_salted_join_equals_plain_join(spark, left, right):
    """Salting must never change join results — for any multiset of
    rows, including empty sides and single hot keys (the case salting
    exists for)."""
    S = 4
    ldf = spark.createDataFrame(left, "k int, lv int") if left else spark.range(0).selectExpr(
        "CAST(id AS INT) k", "CAST(id AS INT) lv"
    )
    rdf = spark.createDataFrame(right, "k int, rv int") if right else spark.range(0).selectExpr(
        "CAST(id AS INT) k", "CAST(id AS INT) rv"
    )
    plain = ldf.join(rdf.withColumnRenamed("k", "rk"), F.col("k") == F.col("rk"))
    salted_l = ldf.withColumn("salt", F.pmod(F.xxhash64("lv"), F.lit(S)))
    salted_r = rdf.withColumnRenamed("k", "rk").withColumn(
        "rsalt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(S)]))
    )
    salted = salted_l.join(
        salted_r, (F.col("k") == F.col("rk")) & (F.col("salt") == F.col("rsalt"))
    ).drop("salt", "rsalt")
    key = lambda r: (r["k"], r["lv"], r["rv"])  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(map(key, salted.collect()))


@given(rows=rows_strategy, rows2=rows_strategy)
@_spark_settings
def test_setop_algebra(spark, rows, rows2):
    """UNION ALL cardinality is additive; INTERSECT ⊆ each side;
    EXCEPT ∪ INTERSECT reassembles the distinct left side."""
    a = spark.createDataFrame(rows, "k int, v int") if rows else spark.range(0).selectExpr(
        "CAST(id AS INT) k", "CAST(id AS INT) v"
    )
    b = spark.createDataFrame(rows2, "k int, v int") if rows2 else spark.range(0).selectExpr(
        "CAST(id AS INT) k", "CAST(id AS INT) v"
    )
    assert a.union(b).count() == a.count() + b.count()
    inter = {tuple(r) for r in a.intersect(b).collect()}
    sa = {tuple(r) for r in a.collect()}
    sb = {tuple(r) for r in b.collect()}
    assert inter == sa & sb  # Spark INTERSECT is distinct by definition
    exc = {tuple(r) for r in a.exceptAll(b).collect()}
    assert (exc | inter) >= sa - (sb - inter)
    assert {tuple(r) for r in a.subtract(b).collect()} == sa - sb


@given(rows=rows_strategy)
@_spark_settings
def test_exact_dedup_idempotent(spark, rows):
    """dropDuplicates is idempotent and never increases cardinality."""
    df = spark.createDataFrame(rows, "k int, v int") if rows else spark.range(0).selectExpr(
        "CAST(id AS INT) k", "CAST(id AS INT) v"
    )
    once = df.dropDuplicates()
    twice = once.dropDuplicates()
    assert once.count() == twice.count() <= df.count()
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in df.collect()}


@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.integers(-(10**6), 10**6),
            st.text(alphabet=st.characters(codec="ascii", exclude_characters="|\n"), max_size=8),
        ),
        max_size=6,
    )
)
@settings(max_examples=50, deadline=None)
def test_format_rows_pipe_contract(vals):
    """The REPL sink renders any row as exactly n-1 pipes with NULL as
    empty (Microbase.scala:1082-1087 contract)."""
    from rdbms_scala_spark.engine import format_rows

    [line] = list(format_rows([tuple(vals)])) if vals else [""]
    if vals:
        assert line.count("|") == len(vals) - 1
        for v in vals:
            if v is not None:
                assert str(v) in line


# undirected edges over a tiny id space: forces multi-edge components,
# chains, cycles, self-loops and disconnected singletons
edges_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=14
)


@given(edges=edges_strategy)
@_spark_settings
def test_connected_components_match_union_find(spark, edges):
    """The alternating-star fixpoint must equal a reference union-find
    for ANY edge multiset (cycles, self-loops, duplicate edges,
    parallel chains)."""
    from rdbms_scala_spark.pipeline.dedup import connected_components_edges

    real_edges = [(a, b) for a, b in edges if a != b]
    if not real_edges:
        return  # query contract: pairs of distinct docs
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in real_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(n, find(n)) for n in parent}

    df = spark.createDataFrame(real_edges, "doc_a long, doc_b long")
    labels, _ = connected_components_edges(df)
    got = {(r.doc_id, r.component_id) for r in labels.collect()}
    assert got == want


@given(left=rows_strategy, right=rows_strategy, threshold=st.integers(0, 5))
@_spark_settings
def test_two_phase_skew_join_equals_plain_join(spark, left, right, threshold):
    """Hot-key splitting must never change join results, whatever the
    threshold puts on either side of the hot/cold boundary."""
    from rdbms_scala_spark.operators.joins import two_phase_skew_join

    if not left or not right:
        return  # empty-side joins are covered by the plain-salt property
    ldf = spark.createDataFrame(left, "k int, lv int")
    rdf = spark.createDataFrame(right, "rk int, rv int")
    plain = ldf.join(rdf, F.col("k") == F.col("rk"))
    two = two_phase_skew_join(ldf, rdf, "k", "rk", hot_threshold=threshold)
    key = lambda r: (r["k"], r["lv"], r["rv"])  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(map(key, two.collect()))


@given(
    toks=st.lists(st.integers(1, 300), min_size=1, max_size=25),
    budget=st.integers(16, 512),
)
@_spark_settings
def test_pack_sequences_matches_sequential_reference(spark, toks, budget):
    """Sharded packing must equal the trivially-correct sequential
    Python packer within each shard: pack_id/pack_offset are exactly
    the running-total div/mod, offsets stay inside the budget, and
    pack ids are monotone in stream order."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, n) for i, n in enumerate(toks)], "doc_id long, n_tokens long"
    ).withColumn("shard", F.pmod(F.col("doc_id"), F.lit(3)))
    w = W.partitionBy("shard").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    packed = (
        docs.withColumn("cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("pack_id", F.expr(f"cum div {budget}"))
        .withColumn("pack_offset", F.col("cum") % budget)
        .collect()
    )
    # pure-Python sequential reference per shard
    streams: dict[int, int] = {}
    expected = {}
    for i, n in enumerate(toks):
        shard = i % 3
        cum = streams.get(shard, 0)
        expected[i] = (cum // budget, cum % budget)
        streams[shard] = cum + n
    for r in packed:
        assert (r.pack_id, r.pack_offset) == expected[r.doc_id], r
        assert 0 <= r.pack_offset < budget


# (user_id, ts_us, kind) event streams: kind 0 = purchase, 1 = click.
# Tight ts range forces same-timestamp collisions and staleness edges.
asof_events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.booleans()),
    min_size=0,
    max_size=16,
)


@given(events=asof_events_strategy, tol=st.integers(1, 20))
@_spark_settings
def test_asof_tolerance_matches_reference_scan(spark, events, tol):
    """The union-then-window as-of-with-tolerance formulation (the
    join_asof_tolerance shape) must agree with the obvious O(n^2)
    reference: for each purchase, the latest strictly-earlier click of
    the same user, kept only when within `tol` — for ANY stream,
    including same-timestamp pile-ups and all-stale histories."""
    from pyspark.sql import Window as W

    purchases = [
        (i, u, t) for i, (u, t, is_click) in enumerate(events) if not is_click
    ]
    clicks = [(u, t) for (u, t, is_click) in events if is_click]

    # reference: per purchase, scan all clicks
    expect = set()
    for pid, u, t in purchases:
        earlier = [ct for (cu, ct) in clicks if cu == u and ct < t]
        if earlier:
            m = max(earlier)
            if t - m <= tol:
                expect.add((pid, t - m))

    cdf = spark.createDataFrame(
        [(u, t, 1, None, t) for (u, t) in clicks] or [(None, None, 1, None, None)],
        "user_id int, ts int, kind int, pid int, click_ts int",
    ).filter(F.col("user_id").isNotNull())
    pdf = spark.createDataFrame(
        [(u, t, 0, pid, None) for (pid, u, t) in purchases]
        or [(None, None, 0, None, None)],
        "user_id int, ts int, kind int, pid int, click_ts int",
    ).filter(F.col("user_id").isNotNull())
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = cdf.union(pdf).withColumn(
        "m", F.last("click_ts", ignorenulls=True).over(w)
    )
    got = {
        (r.pid, r.ts - r.m)
        for r in merged.filter(
            (F.col("kind") == 0)
            & F.col("m").isNotNull()
            & (F.col("ts") - F.col("m") <= tol)
        ).collect()
    }
    assert got == expect


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-2, 2, allow_nan=False, allow_infinity=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=8,
    )
)
@_spark_settings
def test_int8_quantize_reconstruction_bound(spark, vecs):
    """Per-dim affine int8 quantization (the embeddings_int8_quantize
    arithmetic) must reconstruct every component within half a
    quantization step of the original — for ANY corpus, including
    constant dimensions (mx == mn degenerates to step 0 and the code
    pins to an endpoint)."""
    import math

    dims = 4
    for d in range(dims):
        xs = [v[d] for v in vecs]
        mn, mx = min(xs), max(xs)
        if mx == mn:
            continue  # production path guards the zero-range dim
        step = (mx - mn) / 254.0
        for x in xs:
            code = round(((x - mn) * 254.0) / (mx - mn)) - 127
            assert -127 <= code <= 127
            recon = mn + ((code + 127) * (mx - mn)) / 254.0
            assert abs(x - recon) <= step / 2 + 1e-12 * max(1.0, abs(x)), (
                x, code, recon, step,
            )


# ---------------------------------------------------------------------------
# Round 9: winnowing guarantee, burstiness bounds, LPA determinism


@given(
    shared=st.lists(st.integers(0, 9), min_size=7, max_size=12),
    pre_a=st.lists(st.integers(10, 19), min_size=0, max_size=6),
    pre_b=st.lists(st.integers(20, 29), min_size=0, max_size=6),
)
@_spark_settings
def test_winnowing_shared_run_guarantee(spark, shared, pre_a, pre_b):
    """The winnowing GUARANTEE (Schleimer et al. thm, per-window-min
    selection): two documents sharing a token run of length
    >= w + k - 1 (= 7 for w=4, k=4) must share at least one selected
    fingerprint — for ANY surrounding text. The shared run yields
    >= w consecutive identical grams, so the full window starting at
    the first shared gram exists in both docs and selects the same
    min hash. Build two docs from disjoint prefixes + an identical
    shared run and assert a shared selected hash survives.

    Runs the PRODUCTION selection (winnow_fingerprints) directly —
    the round-9 falsifier was a doc whose prefix token hashed below
    every shared gram, which the old trailing-frame ``h == wmin``
    rule let swallow the whole window. (The df cap and pair threshold
    of the full query are deliberately NOT applied — the property is
    about selection.)"""
    from rdbms_scala_spark.pipeline.dedup import winnow_fingerprints

    doc_a = " ".join(f"t{x}" for x in pre_a + shared)
    doc_b = " ".join(f"t{x}" for x in pre_b + shared)
    docs = spark.createDataFrame(
        [(0, doc_a), (1, doc_b)], "doc_id long, text string"
    )
    fp = winnow_fingerprints(docs)
    a = {r["h"] for r in fp.filter(F.col("doc_id") == 0).collect()}
    b = {r["h"] for r in fp.filter(F.col("doc_id") == 1).collect()}
    assert a & b, (doc_a, doc_b)


@given(
    gaps=st.lists(st.integers(0, 10_000), min_size=2, max_size=20),
)
@_spark_settings
def test_burstiness_bounds_and_extremes(spark, gaps):
    """B = (sqrt(D) - sg) / (sqrt(D) + sg) with D = n*sgg - sg^2 must
    lie in [-1, 1) for any non-negative gap sequence, hit exactly -1
    for a constant positive sequence (sigma = 0), and be NaN-free
    unless all gaps are zero."""
    import math

    n = len(gaps)
    sg = sum(gaps)
    sgg = sum(g * g for g in gaps)
    d = n * sgg - sg * sg
    if sg == 0:
        return  # all-zero gaps: mean 0, B undefined — excluded by HAVING in-query
    b = (math.sqrt(d) - sg) / (math.sqrt(d) + sg)
    assert -1.0 <= b < 1.0
    if len(set(gaps)) == 1:
        assert b == -1.0


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=12,
    ).map(lambda es: [(a, b) for a, b in es if a != b])
)
@_spark_settings
def test_label_propagation_is_deterministic_and_closed(spark, edges):
    """3-round min-tie-break LPA must (a) be deterministic across
    repeated runs on the same edges and (b) only ever assign labels
    that are node ids of the graph — for any small random graph,
    including disconnected and multi-edge ones."""
    if not edges:
        return
    und = edges + [(b, a) for a, b in edges]
    edf = spark.createDataFrame(und, "u long, v long")
    nodes = {a for a, _ in und}

    def run():
        labels = edf.select(F.col("u").alias("doc_id")).distinct().select(
            "doc_id", F.col("doc_id").alias("label")
        )
        from pyspark.sql.window import Window as W

        for _ in range(3):
            gathered = (
                edf.join(labels, edf["u"] == labels["doc_id"])
                .groupBy(F.col("v"), F.col("label"))
                .agg(F.count(F.lit(1)).alias("c"))
            )
            w = W.partitionBy("v").orderBy(F.col("c").desc(), F.col("label"))
            labels = (
                gathered.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select(F.col("v").alias("doc_id"), "label")
            )
        return sorted((r["doc_id"], r["label"]) for r in labels.collect())

    r1, r2 = run(), run()
    assert r1 == r2
    assert all(lab in nodes for _, lab in r1)
