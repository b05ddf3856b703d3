"""Source/sink roundtrips, including the reference's pipe-delimited
headerless CSV format with date columns (Microbase.scala:950-983) and
the toy R/S/T tables from its REPL examples (FIXTURES.md)."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from rdbms_scala_spark import sources


def test_csv_reference_format_roundtrip(spark, tmp_path):
    """Pipe-delimited, headerless, int/double/date/string columns —
    the exact shape of the reference's data/*.data files."""
    raw = tmp_path / "s.data"
    raw.write_text("1|b one|2020-01-02\n2|b two|1994-12-31\n")
    df = sources.load_csv(spark, str(raw), "c int, b string, a date")
    rows = df.orderBy("c").collect()
    assert [r.c for r in rows] == [1, 2]
    assert rows[0].a == datetime.date(2020, 1, 2)
    assert rows[1].b == "b two"

    out = str(tmp_path / "out_csv")
    sources.write_csv(df, out)
    back = sources.load_csv(spark, out, "c int, b string, a date")
    assert sorted(r.c for r in back.collect()) == [1, 2]


def test_csv_with_expression_query(spark, tmp_path):
    """The reference REPL's own example: SELECT bar, bar * 15 as biz
    FROM R ORDER BY ... LIMIT (Microbase.scala:943)."""
    raw = tmp_path / "r.data"
    raw.write_text("\n".join(f"{i}|{i * 2}" for i in range(50)) + "\n")
    r = sources.load_csv(spark, str(raw), "bar int, baz int")
    out = (
        r.select("bar", (F.col("bar") * 15).alias("biz"), "baz")
        .orderBy(F.col("bar").asc(), F.col("baz").asc())
        .limit(10)
        .collect()
    )
    assert len(out) == 10
    assert out[3].biz == out[3].bar * 15


def test_json_roundtrip(spark, tmp_path):
    raw = tmp_path / "d.jsonl"
    raw.write_text('{"id": 1, "v": 1.5}\n{"id": 2, "v": null}\n')
    df = sources.load_json(spark, str(raw), "id long, v double")
    rows = {r.id: r.v for r in df.collect()}
    assert rows[1] == 1.5 and rows[2] is None


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    """Partitioned write -> reading one partition only lists that
    directory (partition pruning)."""
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    out = str(tmp_path / "nation_part")
    sources.write_parquet(nation, out, partition_by=["n_regionkey"])
    pruned = sources.load_parquet(spark, out).filter(F.col("n_regionkey") == 2)
    assert pruned.count() == nation.filter(F.col("n_regionkey") == 2).count()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "n_regionkey" in plan


def test_compact_small_files(spark, sf_dir, tmp_path):
    """64 tiny files must compact to the byte-target count with
    content preserved."""
    from rdbms_scala_spark.sources.files import compact_small_files

    src = str(tmp_path / "frag")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(64).write.parquet(src)
    import glob
    import os

    assert len(glob.glob(f"{src}/*.parquet")) == 64
    total = sum(os.path.getsize(p) for p in glob.glob(f"{src}/*.parquet"))
    dest = str(tmp_path / "compact")
    n = compact_small_files(spark, src, dest, target_file_bytes=total // 3)
    assert n <= 4  # ceil(total / (total/3)) = 3 (+1 slack for fs overhead)
    assert spark.read.parquet(dest).count() == orders.count()


def _scan_rows_read(df) -> int:
    """Execute ``df`` and return the Parquet scan's numOutputRows —
    the rows the reader actually emitted AFTER row-group/page min-max
    skipping (the post-scan Filter re-evaluates the predicate, so this
    is strictly the I/O-side count)."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    for i in range(leaves.length()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            return m.apply("numOutputRows").value()
    raise AssertionError("no scan leaf with numOutputRows metric")


def test_sorted_table_rowgroup_skipping(spark, sf_dir, tmp_path):
    """Tree-index analog (Microbase.scala:1009-1024): a range
    predicate over the sort column of a write_sorted_table layout must
    prune files/row-groups via min-max stats — the scan emits a small
    fraction of the table — while the same predicate over an unsorted
    layout reads everything."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    total = li.count()
    # narrow slice (~1/20 of the key range) regardless of scale factor
    lo, hi = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    pred = f"l_orderkey BETWEEN {lo} AND {lo + max(1, (hi - lo) // 20)}"
    expected = li.filter(pred).count()

    sorted_path = str(tmp_path / "li_sorted")
    sources.write_sorted_table(
        li, sorted_path, ["l_orderkey"], num_files=8, row_group_bytes=256 * 1024
    )
    unsorted_path = str(tmp_path / "li_unsorted")
    li.write.option("parquet.block.size", 256 * 1024).parquet(unsorted_path)

    sorted_df = spark.read.parquet(sorted_path).filter(pred)
    unsorted_df = spark.read.parquet(unsorted_path).filter(pred)
    assert sorted_df.count() == expected  # layout never changes results
    read_sorted = _scan_rows_read(sorted_df)
    read_unsorted = _scan_rows_read(unsorted_df)
    # unsorted: every row group spans the full key range -> no skipping
    assert read_unsorted == total
    # sorted: only the row groups overlapping [1, 500] survive
    assert expected <= read_sorted < total / 4, (expected, read_sorted, total)


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """Co-located bucketed layout: joining two tables bucketed on the
    join key must not shuffle either side — the persistent-layout
    analog of the reference's hash index (Microbase.scala:994-1006)."""
    from rdbms_scala_spark.catalog import load_table
    from rdbms_scala_spark.plans import physical_plan
    from rdbms_scala_spark.sources import files as src

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    try:
        src.write_bucketed_table(orders, "b_orders", bucket_by=["o_orderkey"], num_buckets=4)
        src.write_bucketed_table(li, "b_lineitem", bucket_by=["l_orderkey"], num_buckets=4)
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        # force sort-merge so a broadcast doesn't trivially hide the shuffle
        joined = bo.hint("merge").join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join should not shuffle:\n{plan}"
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_zorder_2d_skipping(spark, sf_dir, tmp_path):
    """write_zordered_table must make min/max skipping work on BOTH
    z-columns from ONE layout: a 2-D predicate reads a small fraction
    of the unsorted scan, and a predicate on the SECOND column alone
    still skips — where a single-column sort reads everything. Run at
    sf0.01+ (sf0.001's user_id range is below the demo window)."""
    from rdbms_scala_spark.catalog import load_table
    from rdbms_scala_spark.sources.files import write_zordered_table

    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    pred_2d = F.col("user_id").between(100, 200) & F.col("value").between(10.0, 20.0)
    pred_v = F.col("value").between(10.0, 20.0)
    expected = ev.filter(pred_2d).count()
    if expected == 0:
        import pytest

        pytest.skip("demo predicate empty below sf0.01")

    z_path = str(tmp_path / "ev_z")
    # 16 KB row groups: at sf0.01 each of the 8 files holds only ~1250
    # rows (~56 KB), so the default 128 KB target degenerates to ONE
    # group per file — 8 skip windows total, and the 2-D predicate box
    # straddles the 3-vs-4-file boundary (5071/10000 observed once in
    # a full-suite run vs 3672 in isolation). Finer groups restore the
    # granularity the assertion was written against.
    write_zordered_table(
        ev, z_path, ["user_id", "value"], num_files=8, row_group_bytes=16 * 1024
    )
    u_path = str(tmp_path / "ev_u")
    ev.write.option("parquet.block.size", 128 * 1024).parquet(u_path)
    s_path = str(tmp_path / "ev_s")
    # single-column sorted control: clusters user_id only
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.option("parquet.block.size", 128 * 1024)
        .parquet(s_path)
    )

    z, u, s = (spark.read.parquet(p) for p in (z_path, u_path, s_path))
    assert z.filter(pred_2d).count() == expected  # layout never changes results
    # 2-D predicate: z-order skips most row groups, the unsorted layout
    # essentially none (>= 90%, not == 100%: with 128 KB row groups an
    # occasional random group can land outside the predicate box by
    # luck — observed once in ~40 suite runs)
    assert _scan_rows_read(u.filter(pred_2d)) >= total * 9 // 10
    assert _scan_rows_read(z.filter(pred_2d)) < total / 2
    # second-column-only predicate: the user_id sort is useless (every
    # row group spans the full value range) but the z layout still skips
    assert _scan_rows_read(s.filter(pred_v)) >= total * 9 // 10
    assert _scan_rows_read(z.filter(pred_v)) < total * 3 // 4


def test_morton_spread_stride_lanes(spark):
    """_morton_spread must place bit b at position b*stride so that N
    z-columns occupy disjoint bit lanes — for 3 columns the spread
    strides by 3 (a fixed stride-2 spread would alias column 3's lanes
    onto column 1's and silently destroy its clustering)."""
    from rdbms_scala_spark.sources.files import _morton_spread

    df = spark.range(1)

    def val(x, bits, stride):
        return df.select(
            _morton_spread(F.lit(x).cast("bigint"), bits, stride).alias("v")
        ).first()[0]

    # stride 2: classic interleave lanes (bit b -> 2b)
    assert val(0b1011, 4, 2) == 0b1000101
    # stride 3: bit b -> 3b
    assert val(0b1011, 4, 3) == 0b1000001001
    # full-width identity at stride 1
    assert val(0b1011, 4, 1) == 0b1011
    # three 2-bit columns interleave into disjoint lanes
    a, b, c = (val(x, 2, 3) for x in (0b11, 0b01, 0b10))
    # lanes (pos 5..0) = c1 b1 a1 c0 b0 a0 = 1 0 1 0 1 1
    assert a | (b << 1) | (c << 2) == 0b101011


def test_orc_roundtrip(spark, tmp_path):
    """ORC write/read must round-trip values and schema exactly."""
    src = spark.createDataFrame(
        [(1, "a", 3.5), (2, "b", -1.25)], "id long, name string, v double"
    )
    path = str(tmp_path / "orc")
    src.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_compaction_gate_query_collapses_files(spark, sf_dir):
    """The registered maintenance query must leave a compacted copy
    with far fewer files than the 64-shard fragment it creates."""
    import glob

    from rdbms_scala_spark.sources.files import (
        _scratch_dir,
        maintenance_compact_small_files,
    )

    maintenance_compact_small_files(spark, sf_dir).count()
    frag = _scratch_dir(spark, sf_dir, "compact_frag")
    compact = _scratch_dir(spark, sf_dir, "compact_out")
    assert len(glob.glob(f"{frag}/*.parquet")) == 64
    assert len(glob.glob(f"{compact}/*.parquet")) <= 2


def test_column_stats_counts_nulls_and_ndv(spark):
    """column_stats on a frame with known nulls/duplicates: every cell
    is hand-checkable (the registry oracle re-proves it at table
    scale; this pins the null-count arithmetic the testdata, which is
    null-free, cannot exercise)."""
    from rdbms_scala_spark.sources.stats import column_stats

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None), (3, "a"), (None, "c")],
        "k bigint, s string",
    )
    rows = {
        r.col_name: r
        for r in column_stats(
            df, [("k", "CAST({v} AS STRING)"), ("s", "CAST({v} AS STRING)")]
        ).collect()
    }
    k, s = rows["k"], rows["s"]
    assert (k.n_rows, k.n_nulls, k.n_distinct, k.min_value, k.max_value) == (5, 1, 3, "1", "3")
    assert (s.n_rows, s.n_nulls, s.n_distinct, s.min_value, s.max_value) == (5, 1, 3, "a", "c")
