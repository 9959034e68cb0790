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
via old snapshot ids (takedown usually requires exactly this). Prints
one JSON report line.
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
                    help="if >0, immediately expire to the last N "
                    "snapshots (old snapshots still see deleted rows "
                    "until expired)")
    args = ap.parse_args()

    from ner_app_spark.session import get_session
    from ner_app_spark.tables.icelite import IceTable

    spark = get_session(app_name="kg-takedown")
    t0 = time.time()
    t = IceTable(args.table)
    keys = spark.read.parquet(args.keys)
    before, _ = t.scan(spark)
    n_before = before.count()
    sid = t.delete(spark, keys)
    after, _ = t.scan(spark)
    n_after = after.count()
    report = {
        "snapshot": sid,
        "key_cols": keys.columns,
        "rows_before": n_before,
        "rows_after": n_after,
        "rows_removed": n_before - n_after,
    }
    if args.expire_history > 0:
        report["expire"] = t.expire_snapshots(keep_last=args.expire_history)
    report["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(report, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
