"""Watermarked tumbling-window aggregation over an event stream.

The late-data contract: with ``withWatermark(ts, delay)`` in append mode a
window emits once the watermark (max event time seen minus ``delay``)
passes its end, and rows later than the watermark are dropped. For a
bounded replay whose final answer must equal the batch GROUP BY (the
DuckDB-oracle requirement), two choices make the run exact and
order-independent:

* ``delay`` >= the full event-time span of the input — no real row can
  ever be dropped, whatever file order the source drains; and
* a single SENTINEL row staged as the LAST chunk, with an event time far
  enough ahead (> max_ts + delay + window) that its arrival advances the
  watermark past every real window's end, flushing them all. The
  sentinel's own window never flushes (nothing arrives after it), so the
  sink holds exactly the real windows.

At production scale the same operator runs with a realistic delay (e.g.
'2 hours' for crawl feeds) and no sentinel — continuous arrivals advance
the watermark; the state per open window is one count per (window, keys),
partitioned across the state stores.

Two-watermark subtlety (SPARK-24634, WatermarkPropagator, Spark >= 3.4):
within one micro-batch, LATE-event filtering uses the watermark computed
before the PREVIOUS batch, while state EVICTION uses the freshly updated
one — late filtering therefore lags eviction by exactly one micro-batch
(pinned in tests/test_streaming.py::test_watermark_drops_genuinely_late_
rows). This never affects the sentinel protocol above: delay >= span
means no real row is ever late, and the sentinel only needs the EVICTION
watermark, which availableNow applies in the trailing empty batch it
schedules after the last file.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"


def streaming_window_counts(
    stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    window: str = "1 day",
    delay: str = "35 days",
    group_cols: tuple[str, ...] = (),
):
    """Start (and return) the windowed-count streaming query. Emits
    (win_start, win_end, *group_cols, cnt) rows to a parquet sink in
    append mode as windows close."""
    # parquet naive timestamps arrive as TIMESTAMP_NTZ; watermarks need an
    # instant type. The session tz is UTC (session.py), so the cast keeps
    # the wall clock — same convention as the DuckDB oracle's naive ts.
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    agg = (
        stream.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, window).alias("win"), *group_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format("win.start", TS_FMT_SPARK).alias("win_start"),
            F.date_format("win.end", TS_FMT_SPARK).alias("win_end"),
            *group_cols,
            "cnt",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


_DURATION_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _duration(spec) -> dt.timedelta:
    """Parse the same '<n> <unit>' strings streaming_window_counts passes
    to withWatermark/window; ints are legacy day counts."""
    if isinstance(spec, int):
        return dt.timedelta(days=spec)
    n, unit = spec.strip().split()
    return dt.timedelta(seconds=int(n) * _DURATION_UNITS[unit.lower()])


def sentinel_ts(
    max_ts: dt.datetime, delay="35 days", window="1 day"
) -> dt.datetime:
    """Event time for the watermark-advancing sentinel row: beyond
    max_ts + delay by more than one window, so watermark = sentinel -
    delay clears every real window end while the sentinel's own window
    stays open (and thus out of the sink). ``delay``/``window`` accept
    THE SAME duration strings the caller hands streaming_window_counts —
    duplicating them as hand-synced integer day counts silently left
    windows unflushed whenever the two drifted (or the delay was
    sub-day, which a days int cannot express)."""
    return (
        max_ts + _duration(delay) + 2 * _duration(window)
        + dt.timedelta(seconds=1)
    )


def window_counts_result(spark: SparkSession, sink_dir: str) -> DataFrame:
    return spark.read.parquet(sink_dir)
