"""Registry-wide physical-plan audit: sweep EVERY registered query and
report the patterns that silently kill 100 TB runs —

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
3. BatchEvalPython — the row-at-a-time Python UDF evaluator. Every
   Python path in this repo is Arrow-batched (ArrowEvalPython /
   mapInPandas / applyInPandas*), so ANY occurrence is a regression;
   there is no allowlist by design.
4. SortMergeJoin surviving AQE at the audit scale. At sf0.001 every
   relation sits far under the autoBroadcastJoinThreshold, so any SMJ
   in the STATIC plan that AQE does not convert to a broadcast join at
   runtime means the join either cannot broadcast structurally (full
   outer), is a deliberate layout (bucketed co-located join: SMJ
   WITHOUT exchanges is the point), or has a stats-opaque side AQE
   cannot size. Statically-planned SMJs are executed once and the
   FINAL adaptive plan is re-checked; only survivors are reported.
   Each survivor is allowlisted with its cause; an un-allowlisted one
   is a join that shuffle-sorts where a broadcast was available.
5. A Filter above a Parquet scan with EMPTY PushedFilters while the
   filter holds a pushable-looking predicate (plain column vs literal
   comparison). Residual Filters above a scan are normal (parquet
   pushdown is best-effort and Spark always re-checks), so only the
   empty-PushedFilters case is flagged: it means the scan reads every
   row group the predicate could have skipped.

Writes PLANAUDIT.md; exits non-zero if an un-allowlisted finding
appears in any section. Run: python scripts/plan_audit.py
The detectors are plain functions over the formatted-plan string so
tests/test_plan_audit.py can pin their behavior on live DataFrames
without sweeping the whole registry.
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

# Global (empty-partition) windows that are DOMAIN-bounded by
# construction: the windowed relation's size is fixed by a domain
# (buckets, calendar days, cut points, vocab caps), not by the corpus.
GLOBAL_WINDOW_ALLOWLIST = {
    "events_pareto_activity": "<=63 log2 activity buckets",
    "events_value_log_histogram": "<=63 log2 value buckets",
    "orders_open_backlog": "calendar-bounded daily relation (~2.4k days)",
    "events_ab_sequential": (
        "calendar-bounded daily relation (cumulative moments, "
        "first-day tau2, running-min always-valid p — ~hundreds of rows "
        "after the per-day rollup)"
    ),
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
    "events_change_point_cusum": "calendar-bounded daily relation (running CUSUM)",
    "retrieval_hybrid_rrf": "two <=15-row top-k rank lists (post-limit)",
    "dedup_simhash_hamming_histogram": "<=11 Hamming-distance buckets (cumulative over the accepted band)",
    "dedup_simhash_candidate_histogram": "<=65 Hamming-distance buckets (cumulative over the full candidate set; bounded by the 64-bit fingerprint width)",
    "events_bootstrap_ci": "64 bootstrap-replicate means (rank-selected CI endpoints)",
    "text_zipf_fit": "<=1000-row top-k vocabulary cut (rank assignment post-limit)",
    "text_quality_auc": (
        "1e-6-quantized score relation (<=1,000,001 distinct scores by "
        "construction; the cumulative rank sum runs over the per-score "
        "aggregate, never the corpus)"
    ),
    "events_ab_segments": (
        "BH rank ladder over ONE row per segment — bounded by the "
        "event-type vocabulary (5), not the data; the corpus passes "
        "are the per-user combinable aggregates upstream"
    ),
}

# SortMergeJoins (surviving AQE) that are correct-by-construction.
SORT_MERGE_ALLOWLIST = {
    "join_bucketed_colocated": (
        "the POINT of the query: both facts bucketed on the join key, "
        "SMJ with zero Exchange (plan-pinned in tests/test_plans.py)"
    ),
    "join_full_outer": (
        "FULL OUTER preserves unmatched rows of BOTH sides; broadcast "
        "hash join cannot implement it, so SMJ is the only strategy at "
        "any size — AQE correctly leaves it in place"
    ),
    "pipeline_snapshot_diff": (
        "snapshot CDC is ONE full-outer join on the key "
        "(snapshot.py:snapshot_diff) — structurally non-broadcastable, "
        "same cause as join_full_outer; at scale both snapshots "
        "shuffle once (or zero with a shared bucketed layout)"
    ),
    "join_bloom_pruned": (
        "the query DISABLES broadcast on its session clone "
        "(autoBroadcastJoinThreshold=-1) to force the shuffle-join "
        "shape runtime Bloom pruning exists for — the SMJ is the demo"
    ),
}

# Scans whose empty PushedFilters under a predicate-bearing Filter is
# explained (predicate not expressible as a parquet data filter).
UNPUSHED_FILTER_ALLOWLIST: dict[str, str] = {}


def tree_nodes(plan: str) -> list[tuple[int, str, int]]:
    """Parse the formatted plan's tree section into
    (node_id, node_name, parent_id) triples; parent_id -1 = root.

    Tree lines look like ``   +- * Filter (4)`` — indentation depth is
    the column of the node name; a stack of (indent, id) recovers the
    parent. The tree section ends at the first blank line."""
    lines = plan.split("\n")
    try:
        start = next(i for i, ln in enumerate(lines) if ln.startswith("== Physical Plan")) + 1
    except StopIteration:
        return []
    node_re = re.compile(r"^([:\s+\-*]*)([A-Za-z][\w .]*?)\s*\((\d+)\)\s*$")
    out: list[tuple[int, str, int]] = []
    stack: list[tuple[int, int]] = []  # (indent, node_id)
    for ln in lines[start:]:
        if not ln.strip():
            break
        m = node_re.match(ln)
        if not m:
            continue  # "== Initial Plan ==" separators etc.
        indent = len(m.group(1))
        name, nid = m.group(2).strip(), int(m.group(3))
        while stack and stack[-1][0] >= indent:
            stack.pop()
        parent = stack[-1][1] if stack else -1
        out.append((nid, name, parent))
        stack.append((indent, nid))
    return out


def node_detail(plan: str, nid: int) -> str:
    """The detail block ``(N) NodeName ...`` up to the next blank line."""
    m = re.search(rf"^\({nid}\) .*?(?=\n\n)", plan, re.M | re.S)
    return m.group(0) if m else ""


def global_window_heads(plan: str) -> list[str]:
    """Partition-spec-free windowspecdefinitions (single-reducer sort).

    Scans ``windowspecdefinition(...)`` with a paren-DEPTH counter —
    a character-class regex stops at the first ``)`` and misparses
    nested expressions in the partition key (e.g. CAST(x AS ...)).
    Returns the head token of each spec whose first top-level argument
    is already a sort order (ASC/DESC) or a frame — i.e. no partition
    columns."""
    heads = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        i, depth = m.end(), 1
        start = i
        args: list[str] = []
        while i < len(plan) and depth:
            c = plan[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    args.append(plan[start:i])
            elif c == "," and depth == 1:
                args.append(plan[start:i])
                start = i + 1
            i += 1
        head = args[0].strip() if args else ""
        if " ASC" in head or " DESC" in head or head.startswith("specifiedwindowframe"):
            heads.append(head[:60])
    return heads


def batch_eval_python(plan: str) -> bool:
    """True iff the plan evaluates a row-at-a-time Python UDF
    (BatchEvalPython). Arrow paths print ArrowEvalPython / *InPandas
    and are fine."""
    return "BatchEvalPython" in plan


def sort_merge_joins(plan: str) -> int:
    return len(re.findall(r"\bSortMergeJoin\b", plan))


_PUSHABLE_ATOM = re.compile(
    # a bare column ref compared to a literal: (l_quantity#12 < 24.0),
    # (c_mktsegment#5 = BUILDING), StartsWith/EndsWith/Contains(col#, lit)
    r"\(\s*\w+#\d+[L]?\s*(?:=|<=>|<|>|<=|>=)\s*[^()\s][^()]*\)"
    r"|(?:StartsWith|EndsWith|Contains)\(\w+#\d+"
    r"|\w+#\d+L?\s+IN\s+\("
)


def unpushed_scan_filters(plan: str) -> list[str]:
    """Filter directly above a Parquet scan (through ColumnarToRow /
    InputAdapter only) where the scan's PushedFilters is EMPTY yet the
    Filter condition contains a pushable-looking atom (plain column vs
    literal). Returns one description per offending scan."""
    nodes = tree_nodes(plan)
    children: dict[int, list[tuple[int, str]]] = {}
    byid: dict[int, str] = {}
    for nid, name, parent in nodes:
        byid[nid] = name
        children.setdefault(parent, []).append((nid, name))
    passthrough = {"ColumnarToRow", "InputAdapter", "WholeStageCodegen"}
    findings = []
    for nid, name, _parent in nodes:
        if name != "Filter":
            continue
        # descend through pass-through nodes to the scan (single-child
        # chains only: a Filter never has two inputs)
        cur = nid
        scan_id = None
        while True:
            kids = children.get(cur, [])
            if len(kids) != 1:
                break
            kid_id, kid_name = kids[0]
            if kid_name.startswith("Scan parquet"):
                scan_id = kid_id
                break
            if kid_name.split(" ")[0] not in passthrough:
                break
            cur = kid_id
        if scan_id is None:
            continue
        scan = node_detail(plan, scan_id)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", scan)
        if pushed is None or pushed.group(1).strip():
            continue  # something was pushed (or non-file scan)
        cond = re.search(r"Condition : (.*)", node_detail(plan, nid))
        if cond and _PUSHABLE_ATOM.search(cond.group(1)):
            findings.append(f"scan({scan_id}) pushed=[] under filter: {cond.group(1)[:80]}")
    return findings


def main() -> None:
    from rdbms_scala_spark.plans import physical_plan
    from rdbms_scala_spark.registry import all_queries
    from rdbms_scala_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    global_window, cartesian, errors = {}, {}, {}
    row_python, smj, unpushed = {}, {}, {}
    for name, spec in specs.items():
        try:
            plan = physical_plan(spec.fn(spark, SF))
        except Exception as ex:  # noqa: BLE001 — audit must see every query
            errors[name] = f"{type(ex).__name__}: {str(ex)[:120]}"
            continue
        heads = global_window_heads(plan)
        if heads:
            global_window[name] = heads[0]
        if "CartesianProduct" in plan:
            cartesian[name] = "CartesianProduct"
        if batch_eval_python(plan):
            row_python[name] = "BatchEvalPython"
        n_smj = sort_merge_joins(plan)
        if n_smj:
            # Static SMJ: execute once so AQE re-plans with runtime
            # sizes, then re-check the FINAL plan — only joins AQE
            # could not (or must not) convert to broadcast survive.
            try:
                df = spec.fn(spark, SF)
                df.collect()
                # An executed adaptive plan prints the FINAL tree first
                # and repeats the pre-AQE tree under "== Initial Plan
                # ==" — count only the final section.
                n_final = sort_merge_joins(
                    physical_plan(df).split("== Initial Plan ==")[0]
                )
                if n_final:
                    smj[name] = (
                        f"{n_final} SortMergeJoin(s) SURVIVING AQE "
                        f"({n_smj} static)"
                    )
            except Exception as ex:  # noqa: BLE001
                smj[name] = f"{n_smj} static SMJ; exec failed: {str(ex)[:80]}"
        bad_scans = unpushed_scan_filters(plan)
        if bad_scans:
            unpushed[name] = "; ".join(bad_scans)

    lines = [
        "# PLANAUDIT — registry-wide physical-plan sweep (generated)",
        "",
        f"Every registered query planned at {SF} "
        f"({len(specs)} queries; regenerate: `python scripts/plan_audit.py`).",
        "Patterns audited: global (empty-partition) windows, CartesianProduct",
        "joins, BatchEvalPython (row-at-a-time Python), static SortMergeJoin",
        "at broadcast-sized scale, and unpushed pushable scan filters.",
        "",
    ]
    bad_total = 0

    def section(title: str, found: dict, allow: dict | None) -> None:
        nonlocal bad_total
        lines.append(f"## {title}: {len(found)}")
        lines.append("")
        for name in sorted(found):
            why = allow.get(name) if allow else None
            if why:
                lines.append(f"- `{name}`: allowlisted — {why}")
            else:
                bad_total += 1
                lines.append(f"- `{name}`: NOT ALLOWLISTED — {found[name]}")
        lines.append("")

    section("Global windows found", global_window, GLOBAL_WINDOW_ALLOWLIST)
    section("CartesianProduct joins found", cartesian, None)
    section("BatchEvalPython (row-at-a-time Python) found", row_python, None)
    section("Static SortMergeJoin at broadcast scale found", smj, SORT_MERGE_ALLOWLIST)
    section("Unpushed pushable scan filters found", unpushed, UNPUSHED_FILTER_ALLOWLIST)
    if errors:
        lines += [f"## Queries that failed to plan at {SF}: {len(errors)}", ""]
        for name in sorted(errors):
            lines.append(f"- `{name}`: {errors[name]}")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANAUDIT.md"), "w") as f:
        f.write("\n".join(lines).rstrip() + "\n")
    print(
        f"wrote PLANAUDIT.md: {len(global_window)} global windows, "
        f"{len(cartesian)} cartesian, {len(row_python)} row-python, "
        f"{len(smj)} sort-merge, {len(unpushed)} unpushed-filter; "
        f"{bad_total} unjustified, {len(errors)} errors"
    )
    sys.exit(1 if bad_total else 0)


if __name__ == "__main__":
    main()
