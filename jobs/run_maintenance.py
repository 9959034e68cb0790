#!/usr/bin/env python
"""Snapshot-table maintenance entrypoint (compaction + expiration).

    cd /root/repo && zip -qr /tmp/ner_app_spark.zip ner_app_spark
    spark-submit --master local[32] --py-files /tmp/ner_app_spark.zip \
        jobs/run_maintenance.py --root /data/kg_tables \
        --small-file-mb 32 --target-file-mb 128 --keep-last 2

The production counterpart of Iceberg's `rewrite_data_files` +
`expire_snapshots` + `remove_orphan_files` actions, run as a scheduled
job separate from the write path (exactly how Iceberg deployments
schedule maintenance): every snapshot table under ``--root`` (any child
directory with a ``metadata/``, e.g. the nodes/edges/triples tables
``run_pipeline.py --publish`` creates) gets its small files compacted
into target-size files, then its history pruned to ``--keep-last``
snapshots with only-expired-referenced data files deleted. Without this
job, an overwrite-per-run publisher and a foreachBatch streaming sink
retain every byte ever written and degrade scans into millions of tiny
footer reads — at 10^12 rows maintenance is what keeps both storage and
planning bounded. Prints one JSON report line per run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="directory of snapshot tables (or one table root)")
    ap.add_argument("--small-file-mb", type=float, default=32.0,
                    help="compact data files smaller than this")
    ap.add_argument("--target-file-mb", type=float, default=128.0,
                    help="compacted output file target size")
    ap.add_argument("--keep-last", type=int, default=2,
                    help="snapshots to retain per table")
    ap.add_argument("--no-expire", action="store_true",
                    help="compact only; keep full history")
    ap.add_argument("--clean-orphans", action="store_true",
                    help="also delete unreferenced data files past grace")
    ap.add_argument("--orphan-grace-sec", type=float, default=3600.0)
    args = ap.parse_args()

    from ner_app_spark.session import get_session
    from ner_app_spark.tables.icelite import IceTable

    roots = []
    if os.path.isdir(os.path.join(args.root, "metadata")):
        roots.append(args.root)
    else:
        for name in sorted(os.listdir(args.root)):
            p = os.path.join(args.root, name)
            if os.path.isdir(os.path.join(p, "metadata")):
                roots.append(p)
    if not roots:
        print(f"no snapshot tables under {args.root}", file=sys.stderr)
        return 2

    spark = get_session(app_name="kg-maintenance")
    t0 = time.time()
    report = {}
    failed = 0
    for path in roots:
        # one table's failure (e.g. lost commit races against a live
        # streaming sink) must not starve the rest of the fleet of
        # maintenance — isolate, report, continue
        t = IceTable(path)
        row = {}
        try:
            sid = t.compact(
                spark,
                small_file_bytes=int(args.small_file_mb * (1 << 20)),
                target_file_bytes=int(args.target_file_mb * (1 << 20)),
            )
            row["compacted"] = sid is not None
            row["snapshot"] = sid
            if not args.no_expire:
                row["expire"] = t.expire_snapshots(
                    keep_last=args.keep_last,
                    clean_orphans=args.clean_orphans,
                    orphan_grace_sec=args.orphan_grace_sec,
                )
            row["snapshots_retained"] = len(t.snapshots())
        except Exception as exc:  # noqa: BLE001 - reported, not hidden
            row["error"] = f"{type(exc).__name__}: {exc}"
            failed += 1
        report[os.path.basename(path)] = row
    print(json.dumps(
        {"tables": report, "wall_sec": round(time.time() - t0, 2)},
        sort_keys=True,
    ))
    return 1 if failed == len(roots) else 0


if __name__ == "__main__":
    sys.exit(main())
