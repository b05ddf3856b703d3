"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Comparable to BASELINE.md: the reference ran its 8 TPC-H queries in
<7 s at SF 0.1 after fully pre-loading tables into heap; we likewise
exclude session startup and warm the input cache once (the Spark
analog of the reference's eager CREATE TABLE load,
Microbase.scala:962-983), then time each query end-to-end including
the collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rdbms_scala_spark.catalog import load_tables
from rdbms_scala_spark.session import get_spark

# Headline pack: the 8 TPC-H-shape acceptance queries (BASELINE.md)
# plus one representative of each extension family so regressions in
# the scale paths show up per-round.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q14",
    "tpch_q18",
]
EXTENSION = [
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "similarity_topk_bruteforce",
    "text_quality_score",
    "events_sessionize",
    "window_running_revenue",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    spark = get_spark("rdbms_scala_spark-bench")

    from rdbms_scala_spark.registry import all_queries

    specs = all_queries()

    # Warm: cache the fact tables once, like the reference's eager load.
    tables = load_tables(spark, sf_dir)
    for name in ("lineitem", "orders", "customer"):
        if name in tables:
            tables[name].cache().count()

    names = [n for n in HEADLINE + EXTENSION if n in specs]
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        n = df.count() if df.isStreaming is False else -1
        timings[name] = round(time.perf_counter() - t0, 4)
        _ = n
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_pack_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
