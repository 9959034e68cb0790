"""Deterministic dataset splitting/sampling for training pipelines.

The op every training-data pipeline runs last: assign each document to
train/val/test by a HASH of its stable key, never by position or RNG —
the assignment must be reproducible across runs, stable under
repartitioning, and consistent when the corpus grows (a doc never
migrates between splits as new docs arrive, unlike randomSplit or
row_number-based slicing).

The bucket is the little-endian uint32 of the first 4 bytes of
md5(key) — md5 (not xxhash64) so a DuckDB oracle replays it exactly —
taken mod 100: bucket < 80 -> train, < 90 -> val, else test.
Entirely JVM-side expression work (md5/substring/conv inside
whole-stage codegen): no shuffle, no UDF, embarrassingly parallel at
any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: split boundaries on the 0-99 bucket: [0,80) train, [80,90) val, rest test
TRAIN_UPPER = 80
VAL_UPPER = 90


def _md5_u32_le(key: Column) -> Column:
    """Little-endian uint32 of the first 4 bytes of md5(key) — the same
    value struct.unpack('<I', md5(s).digest()[:4]) yields, and the same
    formula oracles._md5_u32_le replays digit-by-digit in SQL."""
    h = F.md5(key.cast("string"))
    byte = lambda j: F.conv(F.substring(h, 2 * j + 1, 2), 16, 10).cast("long")
    return sum(byte(j) * (256**j) for j in range(4))


def hash_split(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """(doc_id, bucket, split): stable train/val/test assignment by
    md5-hash bucket of ``key``. 80/10/10 by construction of the bucket
    boundaries (exact over the hash distribution, not a sample)."""
    bucket = (_md5_u32_le(F.col(key)) % 100).alias("bucket")
    return docs.select(F.col(key), bucket).select(
        key,
        "bucket",
        F.when(F.col("bucket") < TRAIN_UPPER, F.lit("train"))
        .when(F.col("bucket") < VAL_UPPER, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def hash_sample(docs: DataFrame, fraction: float, key: str = "doc_id") -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose md5-u32 falls
    under fraction * 2^32 (exact integer threshold, so the kept set is
    stable across runs and partitionings). Filter-only: pushes to the
    scan where the key is a stored column."""
    threshold = int(fraction * (1 << 32))
    return docs.filter(_md5_u32_le(F.col(key)) < threshold)
