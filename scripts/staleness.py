"""Staleness-budget report for the external correctness rotation.

POLICY (round 14, r13 verdict #2): no registered query's external
driver check may age past ``BUDGET = 8`` rounds. The driver certifies
a ~50-row prefix of the registry per round against 343 registered
queries, so a full rotation floor is ~7 rounds; the budget is floor+1.
Enforcement is structural, not aspirational: each round the registry's
``_ROTATE_LEAD`` must contain every row whose staleness has reached
``BUDGET - 1`` (it will be exactly ``BUDGET`` when the next external
gate lands), and never-checked rows are tier 0 automatically.

This script computes, from the committed ``CORRECTNESS_r*.json``
artifacts:

- per-query last-externally-checked round and current staleness
  (``current_round - last_checked``),
- the staleness histogram and the max,
- the budget check: every row at staleness >= BUDGET - 1 must sit in
  the current driver prefix (the first ``PREFIX`` names of
  ``all_queries()``), as must every never-checked row.

Output: one JSON object on stdout, embedded verbatim into
``SELFCHECK_r{N}.json`` by the round's self-certification. Exit code
1 if the budget is violated (a stale row is NOT in the prefix), so the
round's selfcheck cannot quietly skip the policy.

Usage: python scripts/staleness.py [current_round]
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET = 8
PREFIX = 50


def last_checked(repo_root: str) -> dict[str, int]:
    """name -> latest round with an external CORRECTNESS row."""
    out: dict[str, int] = {}
    for path in sorted(
        glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    ):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            for name in json.load(f):
                out[name] = rnd
    return out


def main() -> None:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = last_checked(repo_root)
    latest_artifact = max(seen.values())
    # Staleness is measured as of the LAST COMPLETED external round
    # (the latest committed artifact): a row last checked in round R
    # has staleness latest-R. Rows at the BUDGET ceiling must be in
    # the upcoming round's prefix, so the observed staleness at their
    # next check never exceeds the budget.
    current = int(sys.argv[1]) if len(sys.argv) > 1 else latest_artifact

    from rdbms_scala_spark.registry import all_queries

    names = list(all_queries())
    prefix = set(names[:PREFIX])

    stale = {n: current - seen[n] for n in names if n in seen}
    never = [n for n in names if n not in seen]
    hist: dict[int, int] = {}
    for s in stale.values():
        hist[s] = hist.get(s, 0) + 1

    # Budget check: rows AT the budget ceiling (they would exceed it
    # if skipped in the upcoming round) must be in the prefix, as must
    # never-checked rows.
    must_lead = sorted(n for n, s in stale.items() if s >= BUDGET) + never
    violations = sorted(n for n in must_lead if n not in prefix)

    report = {
        "policy": f"max external-check staleness <= {BUDGET} rounds; "
        f"rows at staleness >= {BUDGET} (as of the last completed "
        "external round) and never-checked rows must sit in the driver "
        f"prefix (first {PREFIX} of all_queries())",
        "as_of_round": current,
        "n_registered": len(names),
        "n_never_checked": len(never),
        "never_checked": never,
        "staleness_histogram": {str(k): hist[k] for k in sorted(hist)},
        "max_staleness": max(stale.values()) if stale else 0,
        "stalest": sorted(
            ((s, n) for n, s in stale.items()), reverse=True
        )[:20],
        "budget_ok": not violations,
        "violations": violations,
    }
    print(json.dumps(report, indent=1))
    if violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
