"""Registry-wide physical-plan audit: sweep EVERY registered query and
report the two patterns that silently kill 100 TB runs —

1. WindowExec with an EMPTY partition spec (a single reducer sorts the
   whole relation). Legitimate only when the windowed relation is
   DOMAIN-bounded (a histogram/calendar/vocab-cap-sized aggregate,
   never the corpus) — those queries are allowlisted HERE with the
   bound named, so any new global window must either justify itself in
   this file or fail the audit.
2. CartesianProduct / BroadcastNestedLoopJoin without a broadcast-sized
   side rationale. Cross joins of scalar aggregates (1-row relations)
   are fine and excluded by the detector (the join prints as
   BroadcastNestedLoop over a 1-row side).

Writes PLANAUDIT.md; exits non-zero if an un-allowlisted global window
appears. Run: python scripts/plan_audit.py
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdbms_scala_spark.plans import physical_plan
from rdbms_scala_spark.registry import all_queries
from rdbms_scala_spark.session import get_spark

SF = "/root/testdata/sf0.001"

# Global (empty-partition) windows that are DOMAIN-bounded by
# construction: the windowed relation's size is fixed by a domain
# (buckets, calendar days, cut points, vocab caps), not by the corpus.
GLOBAL_WINDOW_ALLOWLIST = {
    "events_pareto_activity": "<=63 log2 activity buckets",
    "events_value_log_histogram": "<=63 log2 value buckets",
    "orders_open_backlog": "calendar-bounded daily relation (~2.4k days)",
    "dedup_threshold_sweep": "<=21 estimate buckets",
    "customer_ltv_deciles": "9 decile cut points",
    "events_rfm_segments": "4 cut points x 3 metrics",
    "text_vocab_induction": "df-ranked vocabulary (capped relation)",
    "text_bpe_merge_pairs": "alphabet^2-bounded adjacent-pair relation (<=~1.6k rows)",
    "maintenance_column_histogram": "fixed equi-width bucket count",
    "pipeline_quality_funnel": "5 funnel stages",
    "sample_quality_top_fraction": "1 percentile cut row",
    "date_dim_generate": "calendar spine",
    "events_concurrent_sessions": "day-partitioned sweep (see segmented variant)",
}


def main() -> None:
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    global_window, cartesian, errors = {}, {}, {}
    for name, spec in specs.items():
        try:
            plan = physical_plan(spec.fn(spark, SF))
        except Exception as ex:  # noqa: BLE001 — audit must see every query
            errors[name] = f"{type(ex).__name__}: {str(ex)[:120]}"
            continue
        # formatted plans print each Window's Arguments block; an empty
        # partition spec shows as `windowspecdefinition(<sort cols>` with
        # no partition columns before the first ASC/DESC token.
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            args = m.group(1)
            head = args.split(",")[0].strip()
            if " ASC" in head or " DESC" in head or head.startswith("specifiedwindowframe"):
                global_window[name] = head[:60]
                break
        if "CartesianProduct" in plan:
            cartesian[name] = "CartesianProduct"
    lines = [
        "# PLANAUDIT — registry-wide physical-plan sweep (generated)",
        "",
        f"Every registered query planned at {SF} "
        f"({len(specs)} queries; regenerate: `python scripts/plan_audit.py`).",
        "Patterns audited: global (empty-partition) windows — the",
        "single-reducer sort — and CartesianProduct joins.",
        "",
        f"## Global windows found: {len(global_window)}",
        "",
    ]
    bad = []
    for name in sorted(global_window):
        why = GLOBAL_WINDOW_ALLOWLIST.get(name)
        mark = "allowlisted" if why else "NOT ALLOWLISTED"
        if not why:
            bad.append(name)
        lines.append(f"- `{name}`: {mark} — {why or global_window[name]}")
    lines += ["", f"## CartesianProduct joins found: {len(cartesian)}", ""]
    for name in sorted(cartesian):
        lines.append(f"- `{name}`")
    if errors:
        lines += ["", f"## Queries that failed to plan at {SF}: {len(errors)}", ""]
        for name in sorted(errors):
            lines.append(f"- `{name}`: {errors[name]}")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANAUDIT.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote PLANAUDIT.md: {len(global_window)} global windows "
          f"({len(bad)} unjustified), {len(cartesian)} cartesian, {len(errors)} errors")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
