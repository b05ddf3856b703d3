"""Staleness-budget report for the external correctness rotation.

POLICY (round 14, r13 verdict #2): no registered query's external
driver check may age past ``BUDGET = 8`` rounds. The driver certifies
a ~50-row prefix of the registry per round against ~346 registered
queries, so a full rotation floor is ~7 rounds; the budget is floor+1.
Enforcement is structural, not aspirational: each round the registry's
``_ROTATE_LEAD`` must contain every row whose staleness has reached
``BUDGET`` as of the last completed external round (if skipped in the
upcoming round it would EXCEED the budget at the next artifact), and
never-checked rows are tier 0 automatically. Rows one short of the
ceiling (``BUDGET - 1``) belong in ``_ROTATE_STALE`` — tier 1 fills
the prefix after tier 0, so most are checked a round early; the
handful a 50-row prefix can't hold reach exactly ``BUDGET`` and are
then forced into the next round's lead. (ADVICE r14: this paragraph
previously claimed ``BUDGET - 1`` rows must already sit in
``_ROTATE_LEAD``, which a 50-row prefix cannot honor when the tier-1
block exceeds ~35 rows; the code's ``s >= BUDGET`` enforcement is the
policy, and the docstring now matches it.)

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

# Renamed/retired query names (r14 verdict #4): historical
# CORRECTNESS_r*.json rows recorded under an old name are credited to
# the successor, so the external-union accounting is exactly the
# registry (``checked - registered == {}``). A retired name with no
# successor maps to None and is dropped from the union.
_RETIRED: dict[str, str | None] = {
    # r11: the auto-threshold config became the production
    # join_skew_salted; the name with the _auto suffix was retired.
    "join_skew_salted_auto": "join_skew_salted",
}


def last_checked(repo_root: str) -> dict[str, int]:
    """name -> latest round with an external CORRECTNESS row (retired
    names credited to their successors via ``_RETIRED``)."""
    out: dict[str, int] = {}
    for path in sorted(
        glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    ):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            for name in json.load(f):
                name = _RETIRED.get(name, name)
                if name is None:
                    continue
                out[name] = max(rnd, out.get(name, rnd))
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

    checked_not_registered = sorted(set(seen) - set(names))
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
        # must be [] — retired names are mapped by _RETIRED, so the
        # external union is exactly the registry (r14 verdict #4)
        "checked_not_registered": checked_not_registered,
    }
    print(json.dumps(report, indent=1))
    if violations or checked_not_registered:
        sys.exit(1)


if __name__ == "__main__":
    main()
