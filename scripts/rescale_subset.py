"""Targeted SCALE re-measurement: re-run a SUBSET of scale_smoke's
queries at every amplification tier and print one RESULTS JSON line,
reusing scale_smoke's amplify + calibration so the numbers are
directly comparable to the full-run table. Used when only a few
operators changed in a round and a full 85-query x 4-tier sweep
would cost hours for rows that didn't move; merge the printed
results into SCALE.md's rows by hand WITH the calibration context
(the round-12 merge note is the template).

Usage: python scripts/rescale_subset.py query1 [query2 ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scale_smoke as sm  # noqa: E402

from rdbms_scala_spark.session import get_spark  # noqa: E402


def main() -> None:
    subset = tuple(sys.argv[1:])
    if not subset:
        sys.exit("usage: rescale_subset.py query1 [query2 ...]")
    spark = get_spark("rescale-subset")
    spark.sparkContext.setLogLevel("ERROR")
    from rdbms_scala_spark.registry import all_queries

    specs = all_queries()
    unknown = [q for q in subset if q not in specs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    results = {q: {} for q in subset}
    calib = {}
    for k in sm.FACTORS:
        sf_dir = sm.amplify(spark, k)
        c0 = sm.calibration_sec(spark)
        for q in subset:
            sm._noop(specs[q].fn(spark, sf_dir))  # warm (codegen + caches)
            times = []
            reps = 3 if k <= 4 else 2
            for _ in range(reps):
                t0 = time.perf_counter()
                sm._noop(specs[q].fn(spark, sf_dir))
                times.append(time.perf_counter() - t0)
            results[q][k] = round(min(times), 3)
            print(f"x{k} {q}: {results[q][k]}s", flush=True)
        calib[k] = (c0, sm.calibration_sec(spark))
        print(f"x{k} calibration: {calib[k]}", flush=True)
    print(
        "RESULTS "
        + json.dumps(
            {"results": results, "calib": {f"x{k}": v for k, v in calib.items()}}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
