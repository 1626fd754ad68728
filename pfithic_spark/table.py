"""Atomic-table maintenance CLI — the operational surface every
manifest-based table needs alongside the query engine:

    python -m pfithic_spark.table snapshots <path>
    python -m pfithic_spark.table vacuum <path> [--keep N] [--keep-staging]
    python -m pfithic_spark.table compact <path> [--target-files N]
    python -m pfithic_spark.table optimize <path> [--target-bytes N]
                                          [--small-file-bytes N] [--dry-run]

``snapshots`` lists committed manifests (seq, txid, file count) without
touching Spark; ``vacuum`` expires old snapshots + unreferenced data
files + crashed-writer staging dirs (io.vacuum_parquet_atomic);
``compact`` rewrites the newest snapshot into fewer files as a new
snapshot with the lost-update conflict check (io.compact_parquet_atomic,
needs a SparkSession); ``optimize`` is the INCREMENTAL form — bin-pack
only the small files, reference everything else untouched
(io.optimize_parquet_atomic, the 100 TB-viable maintenance pass).
Kept separate from the reference-shaped
``python -m pfithic_spark`` pipeline CLI so that surface stays
argument-compatible with upstream.
"""

from __future__ import annotations

import argparse
import json
import os


def _snapshots(path: str) -> list[dict]:
    from .io import list_manifests

    out = []
    for (seq, txid), name in list_manifests(path):
        with open(os.path.join(path, name)) as fh:
            m = json.load(fh)
        out.append(
            {
                "seq": seq,
                "txid": txid,
                "n_files": len(m.get("files", [])),
                "manifest": name,
            }
        )
    return out


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        prog="pfithic_spark.table", description=__doc__
    )
    sub = ap.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("snapshots", help="list committed snapshots")
    sp.add_argument("path")
    vp = sub.add_parser("vacuum", help="expire snapshots + GC files")
    vp.add_argument("path")
    vp.add_argument("--keep", type=int, default=1)
    vp.add_argument(
        "--keep-staging",
        action="store_true",
        help="do not remove orphaned staging dirs (in-flight writers)",
    )
    vp.add_argument(
        "--staging-grace",
        type=float,
        default=24 * 3600.0,
        metavar="SECONDS",
        help="only remove staging dirs whose newest mtime is older than "
        "this (default 24h; 0 = aggressive post-crash cleanup)",
    )
    cp = sub.add_parser("compact", help="rewrite newest snapshot")
    cp.add_argument("path")
    cp.add_argument("--target-files", type=int, default=1)
    op = sub.add_parser(
        "optimize", help="bin-pack small files incrementally"
    )
    op.add_argument("path")
    op.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)
    op.add_argument("--small-file-bytes", type=int, default=None)
    op.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    if args.cmd == "snapshots":
        for s in _snapshots(args.path):
            print(json.dumps(s))
    elif args.cmd == "vacuum":
        from .io import vacuum_parquet_atomic

        res = vacuum_parquet_atomic(
            args.path,
            keep_last_n=args.keep,
            remove_staging_orphans=not args.keep_staging,
            staging_grace_seconds=args.staging_grace,
        )
        print(json.dumps(res))
    elif args.cmd == "compact":
        from .io import compact_parquet_atomic
        from .session import get_spark

        spark = get_spark(app="pfithic-table-compact")
        manifest = compact_parquet_atomic(
            spark, args.path, target_files=args.target_files
        )
        print(json.dumps({"manifest": os.path.basename(manifest)}))
        spark.stop()
    elif args.cmd == "optimize":
        from .io import optimize_parquet_atomic
        from .session import get_spark

        spark = get_spark(app="pfithic-table-optimize")
        plan = optimize_parquet_atomic(
            spark,
            args.path,
            target_bytes=args.target_bytes,
            small_file_bytes=args.small_file_bytes,
            dry_run=args.dry_run,
        )
        if plan["manifest"]:
            plan["manifest"] = os.path.basename(plan["manifest"])
        print(json.dumps(plan))
        spark.stop()


if __name__ == "__main__":
    main()
