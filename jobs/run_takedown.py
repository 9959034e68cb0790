#!/usr/bin/env python
"""Row-level takedown entrypoint (equality deletes on a snapshot table).

    cd /root/repo && zip -qr /tmp/ner_app_spark.zip ner_app_spark
    spark-submit --master local[32] --py-files /tmp/ner_app_spark.zip \
        jobs/run_takedown.py --table /data/kg_tables/triples \
        --keys /data/takedowns/2026-08-18.parquet

The GDPR / legal-removal shape at web scale: ``--keys`` is a parquet of
key tuples (its columns ARE the delete key columns, e.g. a single `url`
column), applied as an equality-delete commit — metadata-only, no data
file rewritten, O(minutes) regardless of table size. Rows re-appended
after the takedown are NOT affected (sequence-number semantics), and the
next scheduled `run_maintenance.py` pass physically purges the bytes
during compaction. `--expire-history N` optionally prunes time travel to
the last N snapshots right away so the deleted rows stop being readable
via old snapshot ids — and DROPS any tag pinned to a pre-delete
snapshot first (tags are expiry-exempt by design, but a legal removal
must override a release pin; dropped tags are reported). The default
report is metadata-only (the delete snapshot's own key count);
`--report-rows` additionally runs full before/after scans for an exact
removed-row count — at large table sizes that is real I/O, which is why
it is opt-in. Prints one JSON report line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="snapshot table root")
    ap.add_argument("--keys", required=True,
                    help="parquet of key tuples; columns = key columns")
    ap.add_argument("--expire-history", type=int, default=0,
                    help="if >0, drop pre-delete tags and immediately "
                    "expire to the last N snapshots (old snapshots "
                    "still see deleted rows until expired)")
    ap.add_argument("--report-rows", action="store_true",
                    help="also run full before/after scans for exact "
                    "row counts (expensive at scale)")
    args = ap.parse_args()

    from ner_app_spark.session import get_session
    from ner_app_spark.tables.icelite import IceTable

    spark = get_session(app_name="kg-takedown")
    t0 = time.time()
    t = IceTable(args.table)
    keys = spark.read.parquet(args.keys)
    n_before = t.scan(spark)[0].count() if args.report_rows else None
    sid = t.delete(spark, keys)
    last = t.snapshots()[-1]
    report = {
        "snapshot": sid,
        "key_cols": keys.columns,
        "keys_deleted": last["summary"]["deleted_key_records"],
    }
    if args.report_rows:
        n_after = t.scan(spark)[0].count()
        report.update({
            "rows_before": n_before,
            "rows_after": n_after,
            "rows_removed": n_before - n_after,
        })
    if args.expire_history > 0:
        # a legal removal overrides release pins: drop every tag that
        # does not point at the post-delete current snapshot
        cur = t.current_snapshot_id()
        dropped = [name for name, s in t.refs().items() if s != cur]
        for name in dropped:
            t.drop_tag(name)
        report["dropped_tags"] = dropped
        report["expire"] = t.expire_snapshots(keep_last=args.expire_history)
    report["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(report, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
