"""Streaming exact dedup: first-seen-wins by content hash, as a custom
stateful operator over ``applyInPandasWithState``.

Semantics (the training-data-pipeline shape of the reference's
md5-content-identity, /root/reference/src/utils/hash.py analog used by
operators/dedup.py): group the arriving rows by a content-hash column and
keep, per hash, the row with the smallest ``order_col`` (e.g. first crawl
id / earliest warc_ts). Per micro-batch and hash the operator compares the
batch minimum against the state and EMITS ONLY IMPROVEMENTS — so across
any micro-batch arrival order the sink holds, per hash, a monotonically
improving candidate chain whose minimum is the global minimum (the true
winner is always an improvement when it first arrives, whatever batch that
is). ``first_seen_result`` reduces the chain declaratively; the composite
stream+reduction is therefore ORDER-INDEPENDENT and equal to the batch SQL
``row_number() over (partition by hash order by order_col) = 1``, which is
exactly what the DuckDB oracle for the registry row replays.

Scale notes (10^12 docs): state is one long per distinct content hash,
hash-partitioned across ``spark.sql.shuffle.partitions`` state stores (use
the RocksDB provider on a real cluster); the emitted stream is bounded by
one row per (hash, improvement), ≤ the input; nothing collects to the
driver. Unbounded state is the real cost — pass ``ttl`` (event-time
timeout) to expire hashes not re-seen within the watermark horizon, which
bounds state at the cost of re-admitting a duplicate that recurs after the
horizon (the standard streaming-dedup trade-off; Spark's own
``dropDuplicates`` watermark dedup makes the same one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import StructType


def streaming_first_seen(
    stream: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    hash_col: str = "text_hash",
    order_col: str = "doc_id",
    payload_cols: tuple[str, ...] = (),
    ttl_ms: int | None = None,
    ts_col: str = "ts",
):
    """Start (and return) the streaming query. ``stream`` must already
    carry ``hash_col`` (e.g. ``F.md5("text")``) and a LONG ``order_col``
    unique per row. With ``ttl_ms`` set, the caller must have applied
    ``withWatermark`` upstream on ``ts_col``; state for a hash expires
    ``ttl_ms`` past max(current watermark, the hash's own latest event
    time this batch). The event-time base matters in the FIRST
    micro-batch of a fresh query, where the pre-batch watermark is 0 —
    arming against the watermark alone would stamp a ~1970 timeout and
    evict every batch-0 key on the first real watermark advance,
    regardless of how large ``ttl_ms`` is."""
    if ttl_ms is not None and ttl_ms <= 0:
        raise ValueError(
            "ttl_ms must be positive (0 would arm a timeout at the "
            "watermark itself, which the state store rejects)"
        )
    if ttl_ms is not None and ts_col not in stream.columns:
        raise ValueError(
            f"ttl_ms requires the watermark column {ts_col!r} in the stream"
        )
    out_cols = [hash_col, order_col, *payload_cols]
    out_schema = StructType(
        [stream.schema[c] for c in out_cols]
    )
    state_schema = "best long, last_ms long"
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        best_row = None
        min_ts_ms = None
        max_ts_ms = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            i = pdf[order_col].values.argmin()
            row = pdf.iloc[[i]]
            if (
                best_row is None
                or row[order_col].iloc[0] < best_row[order_col].iloc[0]
            ):
                best_row = row
            if ttl_ms is not None:
                lo, hi = pdf[ts_col].min(), pdf[ts_col].max()
                if lo is not None:
                    m = int(lo.value // 1_000_000)
                    min_ts_ms = m if min_ts_ms is None else min(min_ts_ms, m)
                    max_ts_ms = max(max_ts_ms, int(hi.value // 1_000_000))
        if best_row is not None:
            # the horizon is enforced HERE, in event time, not only via
            # the timeout: Spark never fires a timeout for a key that has
            # data in the same micro-batch, so a duplicate arriving
            # ttl_ms past the last sighting must itself reset the state
            # (it is by contract a fresh first-seen)
            stale = (
                ttl_ms is not None
                and state.exists
                and min_ts_ms is not None
                and min_ts_ms > state.get[1] + ttl_ms
            )
            v = int(best_row[order_col].iloc[0])
            if stale or not state.exists or v < state.get[0]:
                prev_last = state.get[1] if state.exists and not stale else 0
                state.update((v, max(prev_last, max_ts_ms)))
                yield best_row[out_cols].reset_index(drop=True)
            elif ttl_ms is not None:
                state.update(
                    (state.get[0], max(state.get[1], max_ts_ms))
                )
        if ttl_ms is not None and state.exists:
            base = max(state.getCurrentWatermarkMs(), max_ts_ms)
            state.setTimeoutTimestamp(base + ttl_ms)

    deduped = stream.groupBy(hash_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def first_seen_result(
    spark: SparkSession,
    sink_dir: str,
    hash_col: str = "text_hash",
    order_col: str = "doc_id",
) -> DataFrame:
    """Reduce the improving-candidate chain to the per-hash winner. One
    row per distinct hash; equals the batch first-seen answer regardless
    of how the stream was micro-batched."""
    w = Window.partitionBy(hash_col).orderBy(F.asc(order_col))
    return (
        spark.read.parquet(sink_dir)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
