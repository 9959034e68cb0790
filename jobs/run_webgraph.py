#!/usr/bin/env python
"""Web-structure launch entrypoint: host-level link graph + directed
PageRank over Common-Crawl-style pages — the crawl-importance prior a
curation/crawl-scheduling pipeline joins onto per-document signals.

    cd /root/repo && zip -qr /tmp/ner_app_spark.zip ner_app_spark
    spark-submit --master local[32] --py-files /tmp/ner_app_spark.zip \
        jobs/run_webgraph.py --pages 2000 --output /tmp/webgraph
    # or from real inputs:
    #   --input <pages parquet/iceberg>  |  --input-warc <warc dir>

Writes two parquet tables under --output:
  edges/  (src, dst, n_links)      — the weighted host link graph
  ranks/  (host, rank_scaled, rank) — directed fixed-point PageRank

The rank math is integer fixed-point (graphalgo.pagerank directed
mode), so re-running over the same input reproduces bit-identical
ranks at ANY parallelism level; --workdir routes the Pregel barriers
through the manifest-backed reliable checkpoint for resume."""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages table path (parquet/iceberg)")
    ap.add_argument("--input-warc", help="WARC segment file(s)/dir")
    ap.add_argument("--pages", type=int, default=2000,
                    help="synthesize N deterministic pages instead of --input")
    ap.add_argument("--output", required=True, help="edges/ranks sink root")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--workdir", help="reliable-checkpoint root (resume)")
    ap.add_argument("--parts", type=int, default=32)
    ap.add_argument("--honor-robots", action="store_true",
                    help="crawl compliance: pages carrying a nofollow "
                    "robots meta contribute no link-graph edges")
    ap.add_argument("--frontier", action="store_true",
                    help="also write frontier/ (uncrawled canonical "
                    "outlink targets with referrer evidence and the "
                    "PageRank-prior fetch priority), reusing the "
                    "materialized ranks table as the prior")
    args = ap.parse_args()

    from ner_app_spark.operators import webgraph
    from ner_app_spark.session import get_session
    from ner_app_spark.sources.pages import read_pages, synth_pages_df

    spark = get_session(app_name="webgraph")
    t0 = time.monotonic()
    if args.input_warc:
        from ner_app_spark.sources.warc import read_warc

        pages = read_warc(spark, args.input_warc)
    elif args.input:
        pages = read_pages(spark, args.input)
    else:
        pages = synth_pages_df(spark, args.pages)

    edges = webgraph.host_edges(pages, honor_nofollow=args.honor_robots)
    # one materialization: ranks consume the edge table, not the page scan
    edges.write.mode("overwrite").parquet(f"{args.output}/edges")
    edges = spark.read.parquet(f"{args.output}/edges")
    from ner_app_spark.operators.graphalgo import pagerank

    ranks = pagerank(
        edges.select("src", "dst"),
        iters=args.iters,
        directed=True,
        workdir=args.workdir,
        n_parts=args.parts,
    ).withColumnRenamed("entity", "host")
    ranks.write.mode("overwrite").parquet(f"{args.output}/ranks")
    ranks = spark.read.parquet(f"{args.output}/ranks")

    n_frontier = None
    if args.frontier:
        frontier = webgraph.crawl_frontier(pages, prior=ranks)
        frontier.write.mode("overwrite").parquet(f"{args.output}/frontier")
        n_frontier = spark.read.parquet(f"{args.output}/frontier").count()

    top = [
        (r["host"], r["rank_scaled"])
        for r in ranks.orderBy(
            ["rank_scaled", "host"], ascending=[False, True]
        ).limit(5).collect()
    ]
    wall = round(time.monotonic() - t0, 3)
    out = {
        "wall_sec": wall,
        "n_edges": edges.count(),
        "n_hosts": ranks.count(),
        "top_hosts": top,
    }
    if n_frontier is not None:
        out["n_frontier"] = n_frontier
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
