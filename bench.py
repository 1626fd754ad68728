"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec", "queries":
{...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pfithic_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark(app="pfithic-bench", cpus=CPUS)
    queries = e.queries()

    # warm the JVM / parquet footers once with the flagship query
    queries["q_agg_group"](spark, SF_DIR).collect()
    # warm the Python workers (spawn + numpy/pandas import on every
    # local[N] thread) so per-query times measure steady state, not
    # one-time worker startup
    from pyspark.sql import functions as F
    import pandas as pd

    # no annotations: `from __future__ import annotations` + local pd
    # import break pandas_udf type-hint resolution
    @F.pandas_udf("double", F.PandasUDFType.SCALAR)
    def _warm(x):
        return x * 1.0

    (
        spark.range(100_000)
        .repartition(int(CPUS))
        .select(F.sum(_warm(F.col("id").cast("double"))))
        .collect()
    )

    timings: dict[str, float] = {}
    for key in sorted(queries):
        t0 = time.perf_counter()
        try:
            df = queries[key](spark, SF_DIR)
            n = df.count()
            timings[key] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # a failing query must not hide the rest
            timings[key] = -1.0
            print(f"# bench FAIL {key}: {exc}", file=sys.stderr)
        # drop cached blocks a key pinned so later keys aren't measured
        # under accumulated memory/GC pressure from earlier ones
        spark.catalog.clearCache()
    total = round(sum(t for t in timings.values() if t >= 0), 4)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
