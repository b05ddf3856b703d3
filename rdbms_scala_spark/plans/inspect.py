"""Physical-plan inspection: the scale-audit toolkit.

The reference had no physical plan at all (its "optimizer" is one
pushdown rule over the logical plan, Microbase.scala:884-912). Here
every operator's plan is auditable: does the filter reach the Parquet
scan (PushedFilters)? Is the projection pruned (ReadSchema)? Did the
dim join go broadcast? How wide are the WholeStageCodegen spans?
tests/test_plans.py pins these properties so a regression that
silently un-pushes a filter or de-broadcasts a join fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def scan_pushdown(df: DataFrame) -> list[dict[str, str]]:
    """Per file-scan: pushed filters and the pruned read schema."""
    text = physical_plan(df, "formatted")
    scans = []
    for block in re.split(r"\n\n+", text):
        if "Scan parquet" in block or "Scan csv" in block:
            pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
            schema = re.search(r"ReadSchema: (struct<.*?>)", block)
            loc = re.search(r"Location:.*?\[(.*?)\]", block)
            part = re.search(r"PartitionFilters: \[(.*?)\]", block)
            scans.append(
                {
                    "location": loc.group(1) if loc else "",
                    "pushed_filters": pushed.group(1) if pushed else "",
                    "read_schema": schema.group(1) if schema else "",
                    "partition_filters": part.group(1) if part else "",
                }
            )
    return scans


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df, "simple")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions (fewer + wider = better;
    Python UDF exchanges break them)."""
    return len(re.findall(r"WholeStageCodegen", physical_plan(df, "simple")))


def plan_report(df: DataFrame) -> str:
    """Human-readable audit summary for a query plan."""
    scans = scan_pushdown(df)
    simple = physical_plan(df, "simple")
    lines = [
        f"broadcast_join: {'BroadcastHashJoin' in simple}",
        f"sort_merge_join: {'SortMergeJoin' in simple}",
        f"codegen_spans: {len(re.findall(r'WholeStageCodegen', simple))}",
        f"aqe: {'AdaptiveSparkPlan' in simple}",
    ]
    for s in scans:
        lines.append(
            f"scan {s['location'][-40:]}: pushed=[{s['pushed_filters'][:80]}] read={s['read_schema'][:80]}"
        )
    return "\n".join(lines)
