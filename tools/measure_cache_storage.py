"""Measure the storage footprint + wall-clock of the LSH signature /
probe caches under the current cache storage level (VERDICT r13 task
7 A/B harness).

Runs the named keys once each (noop sink), snapshotting
getRDDStorageInfo() after each materialization — the peak cached
memSize/diskSize per key is printed, then min-of-N timings.

Usage: python tools/measure_cache_storage.py [--n 4] [KEY ...]
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

DEFAULT_KEYS = ["q_dedup_near", "q_dedup_simhash", "q_minhash_calibration"]


def rdd_storage(spark):
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    mem = sum(i.memSize() for i in infos)
    disk = sum(i.diskSize() for i in infos)
    return mem, disk, len(infos)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*", default=None)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    keys = args.keys or DEFAULT_KEYS

    from pfithic_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark(app="cache-storage-measure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = e.queries()
    queries["q_agg_group"](spark, args.sf).collect()

    for key in keys:
        times = []
        peak_mem = peak_disk = 0
        for _ in range(args.n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = queries[key](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
            mem, disk, _n = rdd_storage(spark)
            peak_mem, peak_disk = max(peak_mem, mem), max(peak_disk, disk)
        spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "key": key,
                    "min": min(times),
                    "median": round(statistics.median(times), 4),
                    "cached_mem_bytes": peak_mem,
                    "cached_disk_bytes": peak_disk,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
