"""Staging helpers that turn a batch DataFrame into a file-source stream.

A Structured Streaming file source treats each new file under the input
directory as arriving data; with ``maxFilesPerTrigger=1`` every staged
chunk becomes its own micro-batch. ``stage_chunks`` writes a DataFrame as
N ordered chunk files so tests and registry rows can simulate a
multi-batch arrival deterministically. This is simulation plumbing only —
production streams read an actual landing zone — but the chunking is done
with a distributed ``repartitionByRange`` write (no driver collect), so
the same helper works at any input size.

File-arrival order: Spark's FileStreamSource drains the listing ordered
by file modification time, so the chunks get strictly increasing mtimes
(chunk i at t0+i seconds). The streaming operators downstream are written
to be ORDER-INDEPENDENT anyway (see dedup.py — monotone state + exact
final reduction); the mtimes only make logs readable and pin the sentinel
chunk (windows.py) last, which IS required: the sentinel advances the
watermark past every real window, so it must not precede real data.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def stage_chunks(
    df: DataFrame,
    input_dir: str,
    order_col: str | list[str],
    n_chunks: int,
) -> list[str]:
    """Write ``df`` into ``input_dir`` as up to ``n_chunks`` parquet chunk
    files, contiguous ranges of ``order_col`` in file order. Returns the
    staged paths (chunk-0000.parquet, ...).

    Contiguity is the one property callers rely on for determinism: the
    globally smallest ``order_col`` row of any key group lives in the
    EARLIEST chunk that contains the group (dedup.py exploits this; the
    windowed path only needs "sentinel last").
    """
    cols = [order_col] if isinstance(order_col, str) else list(order_col)
    os.makedirs(input_dir, exist_ok=True)
    # a second wave staged into the same landing dir must not REUSE the
    # chunk-0000... names of the first (FileStreamSource keys its
    # seen-files map by path — a silently replaced file is never
    # reprocessed) and must get strictly LATER mtimes than everything
    # already staged
    existing = [
        f for f in os.listdir(input_dir)
        if f.startswith("chunk-") and f.endswith(".parquet")
    ]
    idx0 = len(existing)
    prev_mtime = max(
        (os.path.getmtime(os.path.join(input_dir, f)) for f in existing),
        default=0,
    )
    tmp = tempfile.mkdtemp(prefix="stage_", dir=input_dir)
    try:
        # repartitionByRange partition i == i-th key range, and part file
        # names embed the partition index, so lexical part order == range
        # order. sortWithinPartitions makes each chunk internally ordered
        # too (not required, but makes staged fixtures inspectable).
        (
            df.repartitionByRange(n_chunks, *cols)
            .sortWithinPartitions(*cols)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        parts = sorted(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        staged = []
        base = max(int(os.path.getmtime(tmp)), int(prev_mtime) + 1)
        for i, name in enumerate(parts):
            dst = os.path.join(
                input_dir, f"chunk-{idx0 + i:04d}.parquet"
            )
            shutil.move(os.path.join(tmp, name), dst)
            os.utime(dst, (base + i, base + i))
            staged.append(dst)
        return staged
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def add_chunk(df: DataFrame, input_dir: str, index: int) -> str:
    """Stage one more single-file chunk AFTER earlier ones (later mtime).
    Used for the windowed-agg sentinel and for restart-resume tests that
    drip extra data into a stream's input directory."""
    os.makedirs(input_dir, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="stage_", dir=input_dir)
    try:
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in sorted(os.listdir(tmp))
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = os.path.join(input_dir, f"chunk-{index:04d}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        prev = [
            os.path.getmtime(os.path.join(input_dir, f))
            for f in os.listdir(input_dir)
            if f.startswith("chunk-") and f != f"chunk-{index:04d}.parquet"
        ]
        t = (max(prev) if prev else os.path.getmtime(dst)) + 1
        os.utime(dst, (t, t))
        return dst
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
