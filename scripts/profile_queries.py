"""Per-query optimization profiler (round-15 optimization pass).

For each named query (or a default slow-row list), mirrors bench.py's
methodology — TPC-H tables cached, one untimed warm pass, then
min-of-3 timed noop-sink passes — and additionally splits each pass
into fn() construction time (which, for the iterative/driver-loop
queries, contains their internal collect() actions) vs the noop-sink
write of the returned DataFrame, and counts the Spark jobs each phase
launches (statusTracker job-id delta: every job is scheduling + task
overhead at sf0.1, so the job count is the fixed-cost shape). Writes
the returned plan's explain('formatted') to plans/r15/<name>_<tag>.txt.

Usage: python scripts/profile_queries.py [--tag before|after] name...
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdbms_scala_spark.catalog import load_tables
from rdbms_scala_spark.session import evict_session_relations, get_spark

DEFAULT = [
    "similarity_kmeans_parallel_init",
    "maintenance_table_stats_sketch",
    "graph_triangle_count_lsh",
    "sample_coverage_greedy",
    "dedup_semdedup",
    "embeddings_power_iteration",
    "streaming_throughput_progress",
    "embeddings_kcenter_coreset",
    "embeddings_knn_vote",
]

CACHED = ("lineitem", "orders", "customer", "part", "supplier", "nation", "region")


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    if args and args[0] == "--tag":
        tag = args[1]
        args = args[2:]
    names = args or DEFAULT

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("rdbms_scala_spark-profile")
    from rdbms_scala_spark.registry import all_queries

    specs = all_queries()
    tables = load_tables(spark, sf_dir)
    for t in CACHED:
        if t in tables:
            tables[t].cache().count()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plandir = os.path.join(
        here, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16")
    )
    os.makedirs(plandir, exist_ok=True)
    tracker = spark.sparkContext.statusTracker()

    def njobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    for name in names:
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # warm pass (codegen + family session caches)
        df = spec.fn(spark, sf_dir)
        if not df.isStreaming:
            df.write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(3):
            j0 = njobs()
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = njobs()
            if not df.isStreaming:
                df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2 = njobs()
            rec = (t2 - t0, t1 - t0, t2 - t1, j1 - j0, j2 - j1)
            if best is None or rec[0] < best[0]:
                best = rec
        tot, build, sink, jb, js = best
        print(
            f"{name}: total={tot:.3f}s build={build:.3f}s ({jb} jobs) "
            f"sink={sink:.3f}s ({js} jobs)",
            flush=True,
        )
        # Capture the plan through the public API (ADVICE r15: the
        # private PythonSQLUtils/queryExecution path breaks across
        # Spark minor versions).
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        with open(os.path.join(plandir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        evict_session_relations(spark)
        for t in CACHED:
            if t in tables:
                tables[t].cache().count()
    spark.stop()


if __name__ == "__main__":
    main()
