from rdbms_scala_spark.plans.inspect import (
    physical_plan,
    plan_report,
    scan_pushdown,
    uses_broadcast_join,
    wholestage_codegen_spans,
)

__all__ = [
    "physical_plan",
    "plan_report",
    "scan_pushdown",
    "uses_broadcast_join",
    "wholestage_codegen_spans",
]
