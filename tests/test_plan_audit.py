"""Pins for the scripts/plan_audit.py detectors — the registry-wide
sweep is a per-round artifact (PLANAUDIT.md), but the detectors
themselves are pinned here on live plans so a Spark upgrade or a
detector edit that silently blinds the audit fails CI, and the
committed artifact is asserted finding-free so an unjustified plan
pattern cannot land without updating the allowlists."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from plan_audit import (  # noqa: E402
    batch_eval_python,
    global_window_heads,
    sort_merge_joins,
    tree_nodes,
    unpushed_scan_filters,
)
from rdbms_scala_spark.plans import physical_plan  # noqa: E402


def test_global_window_scanner_handles_nested_parens(spark, sf_dir):
    """The r8 advice: a `[^)]*` regex stops at the first `)` inside a
    nested partition-key expression (CAST(...)) and misparses the head
    token. The paren-depth scanner must see a PARTITIONED window even
    when the key is a function call, and still flag a global one."""
    from rdbms_scala_spark.catalog import load_table
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").limit(100)
    partitioned = ev.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(F.col("user_id").cast("string")).orderBy("ts")
        ),
    )
    assert global_window_heads(physical_plan(partitioned)) == []

    global_w = ev.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("ts").cast("string")))
    )
    assert len(global_window_heads(physical_plan(global_w))) == 1


def test_batch_eval_python_detector(spark, sf_dir):
    """A deliberate row-at-a-time F.udf must trip the detector; the
    repo's Arrow paths must not."""
    from rdbms_scala_spark.catalog import load_table

    doc = load_table(spark, sf_dir, "documents").limit(10)
    slow = doc.select(F.udf(lambda s: len(s or ""), "int")(F.col("text")))
    assert batch_eval_python(physical_plan(slow))

    fast = doc.select(F.length("text"))
    assert not batch_eval_python(physical_plan(fast))


def test_udtf_runs_arrow_not_row_python(spark, sf_dir):
    """Python UDTFs are routed through Arrow (session conf
    spark.sql.execution.pythonUDTF.arrow.enabled) — the one
    BatchEvalPython hit the r9 audit found and fixed."""
    from rdbms_scala_spark.registry import all_queries

    df = all_queries()["udtf_word_windows"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert not batch_eval_python(plan)
    assert "ArrowEvalPythonUDTF" in plan


def test_unpushed_filter_detector(spark, sf_dir):
    """A normal pushed-filter scan must be silent; a scan whose
    PushedFilters is empty under a pushable predicate must fire. The
    positive case is a synthesized formatted plan (the V1 parquet
    source lists PushedFilters even with evaluation disabled, so a
    live negative plan cannot be produced from this source — the
    detector is a pure text function, pinned as such)."""
    from rdbms_scala_spark.catalog import table_path

    path = table_path(sf_dir, "orders")
    ok = spark.read.parquet(path).filter(F.col("o_orderpriority") == "1-URGENT")
    assert unpushed_scan_filters(physical_plan(ok)) == []

    bad = """== Physical Plan ==
* Filter (3)
+- * ColumnarToRow (2)
   +- Scan parquet  (1)


(1) Scan parquet
Output [2]: [o_orderkey#0L, o_orderpriority#5]
Batched: true
Location: InMemoryFileIndex [file:/x/orders.parquet]
PushedFilters: []
ReadSchema: struct<o_orderkey:bigint,o_orderpriority:string>

(2) ColumnarToRow [codegen id : 1]
Input [2]: [o_orderkey#0L, o_orderpriority#5]

(3) Filter [codegen id : 1]
Input [2]: [o_orderkey#0L, o_orderpriority#5]
Condition : (isnotnull(o_orderpriority#5) AND (o_orderpriority#5 = 1-URGENT))

"""
    assert unpushed_scan_filters(bad)


def test_tree_nodes_parses_parent_child(spark, sf_dir):
    """The indent-stack tree parser recovers Filter -> Scan adjacency
    (through ColumnarToRow) on a real formatted plan."""
    from rdbms_scala_spark.catalog import table_path

    df = spark.read.parquet(table_path(sf_dir, "orders")).filter(
        F.col("o_orderkey") > 100
    )
    nodes = tree_nodes(physical_plan(df))
    names = {name.split(" ")[0] for _nid, name, _p in nodes}
    assert "Filter" in names and "Scan" in names
    byid = {nid: (name, parent) for nid, name, parent in nodes}
    scan = next(nid for nid, (name, _p) in byid.items() if name.startswith("Scan"))
    # walking up from the scan reaches the Filter
    chain = []
    cur = scan
    while cur != -1:
        name, parent = byid[cur]
        chain.append(name.split(" ")[0])
        cur = parent
    assert "Filter" in chain


def test_final_plan_smj_counting_strips_initial_plan(spark, sf_dir):
    """The AQE-aware SMJ check counts only the final tree: tpch_q2's
    static SMJ is broadcast-converted at runtime, and the survivor
    count after execution must be zero once the `== Initial Plan ==`
    echo is stripped."""
    from rdbms_scala_spark.registry import all_queries

    df = all_queries()["tpch_q2"].fn(spark, sf_dir)
    assert sort_merge_joins(physical_plan(df)) > 0  # static plan
    df.collect()
    final = physical_plan(df).split("== Initial Plan ==")[0]
    assert sort_merge_joins(final) == 0


def test_planaudit_artifact_is_finding_free():
    """The committed PLANAUDIT.md must contain zero unjustified
    findings — regenerating it is part of the round discipline, and
    this pin stops an un-allowlisted pattern from landing silently."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "PLANAUDIT.md")
    if not os.path.exists(path):
        pytest.skip("PLANAUDIT.md not generated yet")
    text = open(path).read()
    assert "NOT ALLOWLISTED" not in text
    assert "## CartesianProduct joins found: 0" in text
    assert "## BatchEvalPython (row-at-a-time Python) found: 0" in text
