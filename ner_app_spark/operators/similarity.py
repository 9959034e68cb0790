"""Similarity search over an embedding column (array<float>):
brute-force cosine top-k baseline + LSH-bucketed scale path.

Scale notes (100 TB): brute force is O(N*Q) — correct baseline and the
verification oracle for the approximate path. The scale path buckets
vectors by random-hyperplane signs (seeded, data-independent) and probes
only matching buckets: at 1000 executors the bucket join shuffles
signatures (bytes), not the full vector set, and the candidate set per
query is ~N / 2^bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"


def _dot(a: str, b: str):
    return F.expr(_DOT.format(a=a, b=b))


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.sqrt(_dot(vec_col, vec_col)))


def cosine_topk_bruteforce(vectors: DataFrame, k: int = 5) -> DataFrame:
    """(vec_id, rank, neighbor_id): exact top-k cosine neighbors per
    vector (self excluded). Output is RANKS, not scores — ranks are
    integers and stable across engines' float summation orders; ties
    break on neighbor_id asc (deterministic)."""
    v = with_norm(vectors.select("vec_id", "embedding")).select(
        "vec_id", "embedding", "norm"
    )
    a = v.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("qn"),
    )
    b = v.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("nv"),
        F.col("norm").alias("nn"),
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("qid") != F.col("nid"))
        .withColumn("cos", _dot("qv", "nv") / (F.col("qn") * F.col("nn")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("rank").cast("bigint").alias("rank"),
            F.col("nid").alias("neighbor_id"),
        )
    )


def near_dup_pairs_cosine(vectors: DataFrame, min_cos: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc-level dedup by meaning)."""
    v = with_norm(vectors.select("vec_id", "embedding"))
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"), F.col("norm").alias("na"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"), F.col("norm").alias("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", _dot("va", "vb") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= min_cos)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy RNG state — a
    hash-based construction reproducible anywhere)."""
    import hashlib
    import struct

    planes = []
    for b in range(n_bits):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{b}:{d}".encode()).digest()
            (u,) = struct.unpack("<Q", h[:8])
            row.append((u / 2**64) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_topk(
    vectors: DataFrame, k: int = 5, n_bits: int = 6, dim: int = 64, seed: int = 42
) -> DataFrame:
    """(vec_id, rank, neighbor_id): approximate top-k — candidates limited
    to the query's random-hyperplane sign bucket. The scale path: the
    bucket id is computed map-side; the join is an equi-join on bucket."""
    planes = _hyperplanes(dim, n_bits, seed)
    sig = F.lit(0).cast("long")
    for i, row in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in row])
        proj = F.expr(
            _DOT.format(a="embedding", b=f"array({', '.join(repr(x) for x in row)})")
        )
        sig = sig + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    v = with_norm(vectors.select("vec_id", "embedding")).withColumn("bucket", sig)
    a = v.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"),
        F.col("norm").alias("qn"), "bucket",
    )
    b = v.select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("nv"),
        F.col("norm").alias("nn"), "bucket",
    )
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("qid") != F.col("nid"))
        .withColumn("cos", _dot("qv", "nv") / (F.col("qn") * F.col("nn")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("rank").cast("bigint").alias("rank"),
            F.col("nid").alias("neighbor_id"),
        )
    )
