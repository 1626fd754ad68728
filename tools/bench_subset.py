"""Repeated per-key micro-bench: run the named registry keys N times
each inside ONE session and print min/median/max per key.

The full bench (bench.py) is best-of-2 per key, which dodges
single-run stalls but not the minute-scale host throttle windows this
VM documents (BENCH r10-r12: trivial-key probe 0.16 s vs 0.8 s minutes
apart at loadavg 0).  Round-13 before/after claims therefore come from
THIS harness — N >= 5 repeats, min reported — so a per-key delta is a
plan change, not a stall lottery draw.

Usage: python tools/bench_subset.py KEY [KEY...] [--n 5] [--sf DIR]
Prints one JSON line per key plus a trailing summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        help="extra runtime SQL conf k=v (repeatable) for config A/Bs",
    )
    args = ap.parse_args()

    from pfithic_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark(app="pfithic-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    for kv in args.conf:
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)
        print(f"# conf {k}={v}", flush=True)
    queries = e.queries()
    # same warmup as bench.py: JVM + parquet footers + python workers
    queries["q_agg_group"](spark, args.sf).collect()
    from pyspark.sql import functions as F

    @F.pandas_udf("double", F.PandasUDFType.SCALAR)
    def _warm(x):
        return x * 1.0

    (
        spark.range(100_000)
        .repartition(32)
        .select(F.sum(_warm(F.col("id").cast("double"))))
        .collect()
    )

    for key in args.keys:
        times = []
        for _ in range(args.n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = queries[key](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
        spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "key": key,
                    "min": min(times),
                    "median": round(statistics.median(times), 4),
                    "max": max(times),
                    "times": times,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
