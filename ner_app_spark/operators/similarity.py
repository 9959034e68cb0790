"""Similarity search over an embedding column (array<float>):
brute-force cosine top-k baseline + LSH-bucketed scale path.

Scale notes (100 TB):
  * Brute force is O(N*Q): correct baseline and the verification oracle
    for the approximate path. It runs as a broadcast-matrix numpy matmul
    inside ``mapInPandas`` — the corpus matrix (a dimension-sized side)
    ships once per executor, the query stream is the distributed side,
    and each Arrow batch does one BLAS gemm instead of millions of
    interpreted per-pair expression evaluations. This is the chunked
    brute-force pattern; when the corpus side itself no longer fits an
    executor (beyond ~10^7 x d), the LSH-bucketed variant below (or an
    IVF coarse quantizer) is the path.
  * The LSH path buckets vectors by random-hyperplane signs (seeded,
    data-independent) and probes only matching buckets: the bucket join
    shuffles signatures, not the full vector set, and the candidate set
    per query is ~N / 2^bits.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"


def _dot(a: str, b: str):
    return F.expr(_DOT.format(a=a, b=b))


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.sqrt(_dot(vec_col, vec_col)))


def _corpus_broadcast(vectors: DataFrame):
    """Collect the corpus to a normalized float64 matrix and broadcast it.
    The corpus side of a brute-force KNN is dimension-like: it must fit in
    executor memory by construction (otherwise use the LSH/IVF path)."""
    import numpy as np

    rows = vectors.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    order = np.argsort(ids, kind="stable")
    ids, m = ids[order], m[order]
    return vectors.sparkSession.sparkContext.broadcast((ids, m))


def _default_parallelism(df: DataFrame) -> int:
    return df.sparkSession.sparkContext.defaultParallelism


def cosine_topk_bruteforce(vectors: DataFrame, k: int = 5) -> DataFrame:
    """(vec_id, rank, neighbor_id): exact top-k cosine neighbors per
    vector (self excluded). Output is RANKS, not scores — ranks are
    integers and stable across engines' float summation orders; ties
    break on neighbor_id asc (deterministic)."""
    bc = _corpus_broadcast(vectors)

    def run(batches) -> Iterator:
        import numpy as np
        import pandas as pd

        ids, m = bc.value
        for pdf in batches:
            q = np.array(list(pdf["embedding"]), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            cos = q @ m.T  # (batch, N)
            qids = pdf["vec_id"].to_numpy()
            # self-exclusion, then top-k by (-cos, neighbor_id)
            out_q, out_r, out_n = [], [], []
            for row_i, qid in enumerate(qids):
                c = cos[row_i]
                mask = ids != qid
                cand_ids, cand_c = ids[mask], c[mask]
                # lexsort: last key is primary
                order = np.lexsort((cand_ids, -cand_c))[:k]
                out_q.extend([qid] * len(order))
                out_r.extend(range(1, len(order) + 1))
                out_n.extend(cand_ids[order])
            yield pd.DataFrame(
                {"vec_id": out_q, "rank": out_r, "neighbor_id": out_n}
            )

    q = vectors.select("vec_id", "embedding").repartition(
        _default_parallelism(vectors), "vec_id"
    )
    return q.mapInPandas(
        run, schema="vec_id long, rank long, neighbor_id long"
    )


def near_dup_pairs_cosine(vectors: DataFrame, min_cos: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc-level dedup by meaning):
    same broadcast-matmul shape; emits (vec_a < vec_b, cos rounded 4)."""
    bc = _corpus_broadcast(vectors)
    thr = float(min_cos)

    def run(batches) -> Iterator:
        import numpy as np
        import pandas as pd

        ids, m = bc.value
        for pdf in batches:
            q = np.array(list(pdf["embedding"]), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            cos = q @ m.T
            qids = pdf["vec_id"].to_numpy()
            out_a, out_b, out_c = [], [], []
            for row_i, qid in enumerate(qids):
                mask = (ids > qid) & (cos[row_i] >= thr)
                out_a.extend([qid] * int(mask.sum()))
                out_b.extend(ids[mask])
                out_c.extend(np.round(cos[row_i][mask], 4))
            yield pd.DataFrame({"vec_a": out_a, "vec_b": out_b, "cos": out_c})

    q = vectors.select("vec_id", "embedding").repartition(
        _default_parallelism(vectors), "vec_id"
    )
    return q.mapInPandas(run, schema="vec_a long, vec_b long, cos double")


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
    to the query's random-hyperplane sign bucket.

    Plan shape (the scale path): bucket signatures are one numpy gemm per
    Arrow batch map-side (``mapInPandas``), then ONE shuffle on bucket and
    a per-bucket matmul top-k (``applyInPandas``). No pairwise join, no
    interpreted per-pair expressions. Bucket population is ~N / 2^bits on
    random data; a skewed bucket would show up as a straggler task —
    raise n_bits (finer buckets) or salt + second-pass merge if so."""
    import numpy as np

    planes_t = np.array(_hyperplanes(dim, n_bits, seed), dtype=np.float64).T
    weights = np.array([1 << i for i in range(n_bits)], dtype=np.int64)

    def assign(batches) -> Iterator:
        for pdf in batches:
            q = np.array(list(pdf["embedding"]), dtype=np.float64)
            bits = (q @ planes_t) > 0
            pdf = pdf[["vec_id", "embedding"]].copy()
            pdf["bucket"] = bits @ weights
            yield pdf

    def topk(pdf):
        import pandas as pd

        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        m = np.array(list(pdf["embedding"]), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        cos = m @ m.T
        out_q, out_r, out_n = [], [], []
        for i, qid in enumerate(ids):
            mask = ids != qid
            cand_ids, cand_c = ids[mask], cos[i][mask]
            order = np.lexsort((cand_ids, -cand_c))[:k]
            out_q.extend([qid] * len(order))
            out_r.extend(range(1, len(order) + 1))
            out_n.extend(cand_ids[order])
        return pd.DataFrame({"vec_id": out_q, "rank": out_r, "neighbor_id": out_n})

    base = vectors.select("vec_id", "embedding").repartition(
        _default_parallelism(vectors), "vec_id"
    )
    assigned = base.mapInPandas(
        assign, schema="vec_id long, embedding array<float>, bucket long"
    )
    return assigned.groupBy("bucket").applyInPandas(
        topk, schema="vec_id long, rank long, neighbor_id long"
    )
