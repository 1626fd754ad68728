"""Dump `.explain("formatted")` plans for the round-14 touched keys.

Usage: python tools/dump_r14_plans.py <suffix> [outdir] [KEY ...]
  suffix: "before" (run from the pre-round worktree) or "after"
  outdir: defaults to /root/repo/plans/r14
  KEY...: optional key subset (defaults to the full touched list)

Keys whose optimization is plan-visible are dumped at sf0.01 (plan
shape is sf-independent; sf0.01 keeps the eager construction probes
cheap).  Writes <key>_<suffix>.txt per key.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

KEYS = [
    "q_knn_graph",
    "q_kcore_census",
    "q_stratified_conformal",
    "q_quantile_sketch",
    "q_dedup_simhash",
    "q_dedup_near",
]


def main() -> None:
    suffix = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/plans/r14"
    keys = sys.argv[3:] or KEYS
    os.makedirs(outdir, exist_ok=True)
    from pfithic_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(app=f"r14-plans-{suffix}", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    for key in keys:
        df = queries[key](spark, "/root/testdata/sf0.01")
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{key}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {key}_{suffix}.txt ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
