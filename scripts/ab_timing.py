"""Count-vs-noop timing-action A/B (r14 verdict #2).

Round 14 changed bench.py's timing action from ``df.count()`` to a
noop-sink write (count() lets Catalyst prune computed columns the
final group keys don't depend on — honest-timing fix), which broke
the r13->r14 cross-round comparability of every bench row. Only
tpch_q1 had an A/B on record (0.90 count vs 0.86 noop). This script
closes the epoch conversion: for each query it measures min-of-5
under BOTH actions in one session (separate untimed warm pass per
action — the two actions compile different plans), so the per-query
conversion factor noop/count is on record and r13-epoch numbers can
be read against r14+ ones.

Methodology mirrors bench.py exactly: TPC-H tables cached up front,
per-query warm pass then 5 timed passes keeping the min, session
relations evicted between query families. Probes are skipped — the
A/B is a RATIO on one host in one session, so host speed cancels.

Usage: python scripts/ab_timing.py [sf_dir] > AB_TIMING.json
Default sf_dir: /root/testdata/sf0.1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdbms_scala_spark.catalog import load_tables
from rdbms_scala_spark.session import evict_session_relations, get_spark

# The 8 headline queries plus representative extension shapes:
# - dedup_contamination_sweep: the known count-pruning casualty
#   (positive control — the ratio should be >> 1);
# - text_quality_auc: bounded-window report shape over a corpus pass;
# - events_sessionize: window-function corpus pass, keys from data;
# - embeddings_gram_matrix: Arrow-batched numeric aggregate;
# - window_running_revenue: running window whose output IS computed
#   columns (the shape count() could prune).
QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q10", "tpch_q14", "tpch_q18",
    "dedup_contamination_sweep", "text_quality_auc",
    "events_sessionize", "embeddings_gram_matrix",
    "window_running_revenue",
]

_CACHED = ("lineitem", "orders", "customer", "part", "supplier", "nation", "region")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("rdbms_scala_spark-ab-timing")
    from rdbms_scala_spark.registry import all_queries

    specs = all_queries()
    tables = load_tables(spark, sf_dir)
    for name in _CACHED:
        if name in tables:
            tables[name].cache().count()

    def run_noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_count(df):
        df.count()

    out: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        fn = specs[name].fn
        row: dict[str, float] = {}
        for action_name, action in (("count", run_count), ("noop", run_noop)):
            action(fn(spark, sf_dir))  # untimed warm: per-action plan
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                action(fn(spark, sf_dir))
                times.append(time.perf_counter() - t0)
            row[action_name] = round(min(times), 4)
        row["noop_over_count"] = round(row["noop"] / row["count"], 3)
        out[name] = row
        print(f"# {name}: count={row['count']} noop={row['noop']} "
              f"ratio={row['noop_over_count']}", file=sys.stderr)
        evict_session_relations(spark)
        for t in _CACHED:
            if t in tables:
                tables[t].cache().count()
    print(json.dumps({"sf_dir": sf_dir, "queries": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
