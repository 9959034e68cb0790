"""Fetch-log latest-version dedup — the CDX-style crawl-side reduction.

A Common-Crawl-style corpus carries many fetches of the same url across
crawl snapshots (re-crawls, revisits, mirror segments); the extraction
pipeline must see exactly ONE version per url — the latest — or the KG
double-counts every stable page and contradicts itself on every changed
one. At 10^12 fetch records this is the FIRST and LARGEST reduction in
the whole job, so its plan matters more than any other stage's:

* The obvious form — ``row_number() OVER (PARTITION BY url ORDER BY
  warc_ts DESC) = 1`` — sorts every url group inside a full-width
  shuffle of all fetch records (html payloads included).
* The form below is a plain ``groupBy(url)`` of declarative aggregates
  (``count``/``min``/``max``/``max_by``), which Spark partial-aggregates
  map-side: each input partition contributes at most one combiner row
  per url it sees, and only combiner outputs shuffle — hashed on url,
  the same key the pipeline's explicit url-hash repartition uses
  downstream, so AQE coalesces instead of re-exchanging.

Reference scope note: the reference app ingests each document exactly
once (/root/reference/src/views.py upload path — it has no re-fetch
concept); the fetch-log layer is web-scale crawl infrastructure the
10^12-row corpus needs in front of that ingest, same as sources/warc.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_fetches(fetches: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, n_fetches, span_sec, latest_text_md5): per-url fetch-log
    rollup — how many fetches the log holds, the first->latest fetch
    span in whole seconds, and the md5 of the LATEST fetch's text
    (``max_by`` on warc_ts; ties cannot occur in a well-formed log where
    (url, warc_ts) identifies a fetch).

    The span is a timestamp DIFFERENCE (casting both ends to epoch
    seconds), never an absolute rendered timestamp — exact integer
    arithmetic in both engines and independent of any session timezone,
    which keeps the row hash-verifiable (same rule as the fixed-point
    ranks).
    """
    return fetches.groupBy(url_col).agg(
        F.count("*").alias("n_fetches"),
        (F.max("warc_ts").cast("long") - F.min("warc_ts").cast("long")).alias(
            "span_sec"
        ),
        F.md5(F.max_by("text", "warc_ts")).alias("latest_text_md5"),
    )


def dedup_fetches(fetches: DataFrame, url_col: str = "url") -> DataFrame:
    """The full winning row per url — every non-key column taken from
    the latest fetch in ONE ``max_by(struct(...))`` aggregate (single
    partial-agg shuffle on url, no window sort, payload columns ride the
    combiner rows only). This is the frame the extraction pipeline
    chains on when its input is a raw multi-snapshot fetch log."""
    payload = [c for c in fetches.columns if c != url_col]
    winner = F.max_by(F.struct(*payload), "warc_ts").alias("__w")
    return fetches.groupBy(url_col).agg(winner).select(url_col, "__w.*")
