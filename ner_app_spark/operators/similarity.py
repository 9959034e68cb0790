"""Similarity search over an embedding column (array<float>):
brute-force cosine top-k baseline + LSH-bucketed scale path.

Scale notes (100 TB):
  * Brute force is O(N*Q): correct baseline and the verification oracle
    for the approximate path. It runs as a broadcast-matrix numpy matmul
    inside ``mapInPandas`` — the corpus matrix (a dimension-sized side)
    ships once per executor, the query stream is the distributed side,
    and each Arrow batch does one BLAS gemm instead of millions of
    interpreted per-pair expression evaluations. This is the chunked
    brute-force pattern; ``cosine_topk_blocked`` is the same computation
    with NO driver-side collect (block-pair gemm + partial-top-k merge,
    result-identical) for corpora past executor memory; past exactness
    budgets entirely, the LSH-bucketed variant below (or an IVF coarse
    quantizer) is the path.
  * The LSH path buckets vectors by random-hyperplane signs (seeded,
    data-independent) and probes only matching buckets: the bucket join
    shuffles signatures, not the full vector set, and the candidate set
    per query is ~N / 2^bits.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _corpus_broadcast(vectors: DataFrame):
    """Collect the corpus to a normalized float64 matrix and broadcast it.
    The corpus side of a brute-force KNN is dimension-like: it must fit in
    executor memory by construction (otherwise use the LSH/IVF path).

    NOTE: the collect happens EAGERLY at DataFrame-construction time (a
    Spark broadcast must be created on the driver before the closure is
    pickled), so building or explain()-ing a brute-force query executes
    the corpus scan. This is the declared cost of the exact-oracle
    variants; the scale paths (lsh_bucket_topk / ivf_topk centroids
    aside) defer everything to execution."""
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


def _pack_blocks(
    vectors: DataFrame, n_blocks: int, block_col: str, prefix: str
) -> DataFrame:
    """(block_id, n, ids:binary, mat:binary) — each block's vectors packed
    into ONE l2-normalized float64 numpy matrix, serialized once. Block
    assignment is pmod(xxhash64(vec_id)) — data-independent, deterministic,
    resume-safe. Ids sorted within block for deterministic layout."""

    def pack(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        m = np.array(list(pdf["embedding"]), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        order = np.argsort(ids, kind="stable")
        ids, m = ids[order], m[order]
        return pd.DataFrame(
            {
                f"{prefix}b": [int(pdf[block_col].iloc[0])],
                f"{prefix}n": [int(ids.shape[0])],
                f"{prefix}ids": [ids.tobytes()],
                f"{prefix}mat": [m.tobytes()],
            }
        )

    schema = (
        f"{prefix}b long, {prefix}n long, {prefix}ids binary, {prefix}mat binary"
    )
    return (
        vectors.select("vec_id", "embedding")
        .withColumn(block_col, F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)))
        .groupBy(block_col)
        .applyInPandas(pack, schema=schema)
    )


def _default_n_blocks(vectors: DataFrame) -> int:
    """The gemm stage runs n_blocks² tasks, so ceil(sqrt(2·parallelism))
    already yields ~2 tasks per core — the per-task Python-worker
    round-trip dominates past that (measured: 32 blocks = 1024 tasks ran
    5× slower than 8 blocks = 64 tasks on a 2k-vector corpus). Callers
    raise n_blocks only to BOUND per-task memory (2 · N/n_blocks · d · 8
    bytes), which is what governs at real corpus sizes."""
    import math

    return max(2, math.ceil(math.sqrt(2 * _default_parallelism(vectors))))


def _block_pairs(vectors: DataFrame, n_blocks: int) -> DataFrame:
    """All (query-block × corpus-block) pairs with both packed payloads
    attached: the tiny n_blocks² keyspace is cross-joined FIRST, each
    payload attached by key, so every downstream task holds exactly two
    bounded block matrices."""
    sess = vectors.sparkSession
    par = _default_parallelism(vectors)
    qb = _pack_blocks(vectors, n_blocks, "__qb", "q")
    cb = _pack_blocks(vectors, n_blocks, "__cb", "c")
    return (
        sess.range(n_blocks).select(F.col("id").alias("qb"))
        .crossJoin(sess.range(n_blocks).select(F.col("id").alias("cb")))
        .join(qb, "qb")
        .join(cb, "cb")
        .repartition(max(par, n_blocks), "qb", "cb")
    )


def _unpack(row):
    import numpy as np

    qids = np.frombuffer(row["qids"], dtype=np.int64)
    qm = np.frombuffer(row["qmat"], dtype=np.float64).reshape(int(row["qn"]), -1)
    cids = np.frombuffer(row["cids"], dtype=np.int64)
    cm = np.frombuffer(row["cmat"], dtype=np.float64).reshape(int(row["cn"]), -1)
    return qids, qm, cids, cm


def cosine_topk_blocked(
    vectors: DataFrame, k: int = 5, n_blocks: int | None = None
) -> DataFrame:
    """Exact top-k cosine neighbors WITHOUT any driver-side collect: the
    100 TB shape of the brute-force path (result-identical to
    cosine_topk_bruteforce; pinned by tests/test_similarity.py).

    Plan: corpus AND queries are packed into per-block numpy matrices
    (applyInPandas — one shuffle each, block = pmod(xxhash64(vec_id))),
    the tiny (qb, cb) block-pair keyspace is cross-joined FIRST and each
    payload attached by key, so every task holds exactly two block
    matrices (~block_rows x d float64, bounded) and runs ONE gemm per
    block pair. Per-pair partial top-k rows then merge through a
    per-query window — k rows per (query, corpus-block) candidate
    stream, never the full N. Lazy end-to-end: no collect, no broadcast
    built at plan-construction time. Rank identity with the broadcast
    baseline is EMPIRICAL, pinned by tests at two block counts
    (round-3 ADVICE #2: BLAS kernel/blocking can vary with matrix
    shape, so a last-ulp drift on a near-tie could in principle flip a
    rank on another corpus; ranks-not-scores output keeps any such flip
    visible rather than hidden in float noise)."""
    n_blocks = n_blocks or _default_n_blocks(vectors)
    pairs = _block_pairs(vectors, n_blocks)

    def run(batches) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_q, out_n, out_c = [], [], []
            for _, row in pdf.iterrows():
                qids, qm, cids, cm = _unpack(row)
                cos = qm @ cm.T  # (qn, cn)
                kk = min(k + 1, cos.shape[1])  # +1 absorbs a self-match
                for i in range(cos.shape[0]):
                    c = cos[i]
                    order = np.lexsort((cids, -c))[:kk]
                    keep = order[cids[order] != qids[i]][:k]
                    out_q.extend([qids[i]] * len(keep))
                    out_n.extend(cids[keep])
                    out_c.extend(c[keep])
            yield pd.DataFrame(
                {"vec_id": out_q, "neighbor_id": out_n, "cos": out_c}
            )

    partial = pairs.mapInPandas(
        run, schema="vec_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "rank", "neighbor_id")
    )


def near_dup_pairs_blocked(
    vectors: DataFrame, min_cos: float = 0.95, n_blocks: int | None = None
) -> DataFrame:
    """Collect-free variant of ``near_dup_pairs_cosine`` (same blocked
    shape as ``cosine_topk_blocked``). Each unordered pair (a < b) lands
    in exactly ONE (block(a), block(b)) task — emitted where the query
    side holds `a` — so no dedup/window is needed; result-identical to
    the broadcast baseline (pinned in tests/test_similarity.py)."""
    n_blocks = n_blocks or _default_n_blocks(vectors)
    pairs = _block_pairs(vectors, n_blocks)
    thr = float(min_cos)

    def run(batches) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for _, row in pdf.iterrows():
                qids, qm, cids, cm = _unpack(row)
                cos = qm @ cm.T
                for i, qid in enumerate(qids):
                    mask = (cids > qid) & (cos[i] >= thr)
                    out_a.extend([qid] * int(mask.sum()))
                    out_b.extend(cids[mask])
                    out_c.extend(np.round(cos[i][mask], 4))
            yield pd.DataFrame({"vec_a": out_a, "vec_b": out_b, "cos": out_c})

    return pairs.mapInPandas(run, schema="vec_a long, vec_b long, cos double")


def _salted_group_topk(assigned: DataFrame, bucket_col: str, fn, n_salts: int) -> DataFrame:
    """Per-bucket top-k with SALT sub-partitioning (round-1 ADVICE): a
    plain ``groupBy(bucket).applyInPandas`` materializes an entire bucket
    (~N / n_buckets rows) as ONE in-memory pandas group in one task — an
    executor OOM at scale, with parallelism capped at n_buckets. Members
    are split across ``n_salts`` sub-groups by ``pmod(xxhash64(vec_id))``
    (data-derived, resume-safe) and queries are replicated to every salt,
    so per-task memory drops ~n_salts-fold (members_subset x queries) and
    parallelism rises to n_buckets * n_salts; the caller's final
    per-query window merges the per-salt partial top-ks."""
    members = assigned.filter(F.col("role") == "member").withColumn(
        "__salt", F.pmod(F.xxhash64("vec_id"), F.lit(n_salts))
    )
    queries = assigned.filter(F.col("role") == "query").withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        members.unionByName(queries)
        .groupBy(bucket_col, "__salt")
        .applyInPandas(fn, schema="vec_id long, neighbor_id long, cos double")
    )


#: IVF coarse-quantizer defaults, shared with the DuckDB oracle builder
#: (oracles.py inlines the replayed trained centroids as VALUES)
IVF_CELLS = 16
IVF_TRAIN_ITERS = 3


def _sim_batch_invariant(q, c):
    """Cosine-numerator matrix (q rows x c rows) with a BATCH-INVARIANT
    contraction: each (i, j) entry reduces one row's d elements via
    numpy's pairwise sum, independent of how many other rows share the
    call — unlike a BLAS gemm, whose kernel/blocking (and thus last-ulp
    sums) varies with matrix shape. Used for k-means ASSIGNMENT so the
    distributed trainer (arbitrary Arrow batch sizes) and the local
    oracle replay produce bit-identical argmax cells. O(n*m*d) without
    BLAS — fine for assignment against a small centroid table; the
    search-path gemms stay BLAS."""
    return (q[:, None, :] * c[None, :, :]).sum(axis=2)


def _seed_centroids(vectors: DataFrame, n_cells: int):
    """Deterministic seed codebook: the n_cells lowest vec_ids,
    l2-normalized (n_cells rows collected — a dimension, not data)."""
    import numpy as np

    crows = sorted(
        vectors.select("vec_id", "embedding").orderBy("vec_id").limit(n_cells).collect(),
        key=lambda r: r["vec_id"],
    )
    cm = np.array([r["embedding"] for r in crows], dtype=np.float64)
    cm /= np.linalg.norm(cm, axis=1, keepdims=True)
    return cm


def lloyd_centroids_local(ids, m, n_cells: int = IVF_CELLS,
                          n_iters: int = IVF_TRAIN_ITERS):
    """Local numpy replay of the distributed trainer (the oracle side and
    the bit-identity pin in tests): spherical k-means, seeded from the
    n_cells lowest vec_ids, batch-invariant assignment, per-cell mean
    over members SORTED BY vec_id (pairwise sum over the sorted rows —
    the same reduction the distributed per-cell group performs), empty
    cells keep their previous centroid."""
    import numpy as np

    order = np.argsort(ids, kind="stable")
    ids, m = np.asarray(ids)[order], np.asarray(m, dtype=np.float64)[order]
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cent = m[:n_cells].copy()
    for _ in range(n_iters):
        a = _sim_batch_invariant(m, cent).argmax(axis=1)
        new = cent.copy()
        for cell in range(n_cells):
            mem = m[a == cell]
            if len(mem) == 0:
                continue
            mu = mem.sum(axis=0) / len(mem)
            new[cell] = mu / np.linalg.norm(mu)
        cent = new
    return cent


def train_ivf_centroids(
    vectors: DataFrame, n_cells: int = IVF_CELLS, n_iters: int = IVF_TRAIN_ITERS
):
    """Distributed spherical k-means for the IVF coarse quantizer
    (round-3 VERDICT #5 — the trained codebook replacing the first-n-ids
    stand-in). Per iteration: centroids broadcast -> map-side assignment
    (mapInPandas, batch-invariant contraction) -> per-cell mean
    (applyInPandas over the cell group, members sorted by vec_id so the
    float reduction order is fixed) -> n_cells rows collected and
    re-broadcast. Deterministic BY CONSTRUCTION, so the result is
    bit-identical to ``lloyd_centroids_local`` (pinned by
    tests/test_similarity.py) and the DuckDB oracle can inline the
    replayed centroids.

    Scale notes: the shuffle per iteration carries one row per vector
    keyed by cell; at 100 TB the per-cell group would be a two-phase
    tree (salted partial sums with a fixed merge order) rather than one
    task per cell — same device as skew.py, noted in PLANS.md."""
    import numpy as np

    cent = _seed_centroids(vectors, n_cells)
    sc = vectors.sparkSession.sparkContext
    base = vectors.select("vec_id", "embedding").repartition(
        _default_parallelism(vectors), "vec_id"
    )

    def cell_mean(pdf):
        import pandas as pd

        pdf = pdf.sort_values("vec_id")
        mm = np.array(list(pdf["embedding"]), dtype=np.float64)
        mm /= np.linalg.norm(mm, axis=1, keepdims=True)
        mu = mm.sum(axis=0) / len(mm)
        mu /= np.linalg.norm(mu)
        return pd.DataFrame({"cell": [int(pdf["cell"].iloc[0])], "c": [mu.tolist()]})

    for _ in range(n_iters):
        bc = sc.broadcast(cent)

        def assign(batches, bc=bc):
            import pandas as pd

            for pdf in batches:
                q = np.array(list(pdf["embedding"]), dtype=np.float64)
                qn = q / np.linalg.norm(q, axis=1, keepdims=True)
                a = _sim_batch_invariant(qn, bc.value).argmax(axis=1)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "cell": a.astype("int32"),
                        "embedding": pdf["embedding"],
                    }
                )

        rows = (
            base.mapInPandas(
                assign, schema="vec_id long, cell int, embedding array<float>"
            )
            .groupBy("cell")
            .applyInPandas(cell_mean, schema="cell int, c array<double>")
            .collect()
        )
        new = cent.copy()
        for r in rows:
            new[r["cell"]] = np.array(r["c"], dtype=np.float64)
        cent = new
    return cent


def ivf_topk(
    vectors: DataFrame, k: int = 5, n_cells: int = IVF_CELLS, n_probe: int = 2,
    n_salts: int = 4, train_iters: int = IVF_TRAIN_ITERS,
) -> DataFrame:
    """(vec_id, rank, neighbor_id): IVF approximate top-k.

    Coarse quantizer: ``train_iters`` rounds of deterministic distributed
    Lloyd (``train_ivf_centroids``), seeded from the ``n_cells`` lowest
    vec_ids; ``train_iters=0`` falls back to the raw seed codebook. The
    training jobs run EAGERLY at DataFrame-construction time (each
    iteration collects n_cells centroid rows — a dimension, not data);
    at scale the centroid table is a separately-trained artifact this
    stands in for. Every vector is assigned to its nearest centroid cell
    map-side (one gemm per Arrow batch); each QUERY probes its
    ``n_probe`` nearest cells. The join is an equi-join on cell id, and
    ranking happens per cell with a final global window merging the
    per-cell partials — candidates per query ~ n_probe * N / n_cells.
    """
    import numpy as np

    if train_iters > 0:
        cm = train_ivf_centroids(vectors, n_cells, train_iters)
    else:
        cm = _seed_centroids(vectors, n_cells)
    bc = vectors.sparkSession.sparkContext.broadcast(cm)

    def assign(batches) -> Iterator:
        import pandas as pd

        c = bc.value
        for pdf in batches:
            q = np.array(list(pdf["embedding"]), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            sim = qn @ c.T  # (batch, n_cells)
            own = sim.argmax(axis=1)
            # member row (its own cell) + probe rows for the query role
            probes = np.argsort(-sim, axis=1)[:, :n_probe]
            out = {"vec_id": [], "cell": [], "role": [], "embedding": []}
            for i, vid in enumerate(pdf["vec_id"]):
                emb = pdf["embedding"].iloc[i]
                out["vec_id"].append(int(vid)); out["cell"].append(int(own[i]))
                out["role"].append("member"); out["embedding"].append(emb)
                for p in probes[i]:
                    out["vec_id"].append(int(vid)); out["cell"].append(int(p))
                    out["role"].append("query"); out["embedding"].append(emb)
            yield pd.DataFrame(out)

    def topk_in_cell(pdf):
        import pandas as pd

        mem = pdf[pdf["role"] == "member"]
        qry = pdf[pdf["role"] == "query"]
        if mem.empty or qry.empty:
            return pd.DataFrame({"vec_id": [], "neighbor_id": [], "cos": []}).astype(
                {"vec_id": "int64", "neighbor_id": "int64", "cos": "float64"}
            )
        m = np.array(list(mem["embedding"]), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        q = np.array(list(qry["embedding"]), dtype=np.float64)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        cos = q @ m.T
        mids = mem["vec_id"].to_numpy(dtype=np.int64)
        qids = qry["vec_id"].to_numpy(dtype=np.int64)
        out_q, out_n, out_c = [], [], []
        for i, qid in enumerate(qids):
            mask = mids != qid
            cand, cc = mids[mask], cos[i][mask]
            order = np.lexsort((cand, -cc))[:k]
            out_q.extend([qid] * len(order))
            out_n.extend(cand[order])
            out_c.extend(cc[order])
        return pd.DataFrame({"vec_id": out_q, "neighbor_id": out_n, "cos": out_c})

    base = vectors.select("vec_id", "embedding").repartition(
        _default_parallelism(vectors), "vec_id"
    )
    assigned = base.mapInPandas(
        assign, schema="vec_id long, cell int, role string, embedding array<float>"
    )
    partials = _salted_group_topk(assigned, "cell", topk_in_cell, n_salts)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        partials.dropDuplicates(["vec_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", F.col("rank").cast("bigint").alias("rank"), "neighbor_id")
    )


def kmeans_clusters(
    vectors: DataFrame, n_cells: int = IVF_CELLS, train_iters: int = IVF_TRAIN_ITERS
) -> DataFrame:
    """(vec_id, cluster, cluster_size): spherical k-means cluster
    assignment over the embedding corpus — the curation shape an LLM
    data pipeline uses for topic balancing / cluster-level filtering,
    exposed directly rather than only inside the IVF index.

    Reuses the deterministic distributed Lloyd trainer
    (``train_ivf_centroids``): centroids broadcast, one gemm per Arrow
    batch for the assignment (map-side, no shuffle), one partial-agg
    shuffle for the cluster sizes. Assignment ties break to the lowest
    cell (argmax-first == the oracle's ORDER BY sim DESC, cell ASC), and
    the batch-invariant contraction makes the assignment — hence the
    whole row — engine-exact (oracles replay the same trained codebook)."""
    import numpy as np

    cm = (
        train_ivf_centroids(vectors, n_cells, train_iters)
        if train_iters > 0
        else _seed_centroids(vectors, n_cells)
    )
    bc = vectors.sparkSession.sparkContext.broadcast(cm)

    def assign(batches) -> Iterator:
        import pandas as pd

        c = bc.value
        for pdf in batches:
            q = np.array(list(pdf["embedding"]), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            a = _sim_batch_invariant(qn, c).argmax(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cluster": a.astype("int64")}
            )

    assigned = vectors.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, cluster long"
    )
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return assigned.join(sizes, "cluster").select(
        "vec_id", "cluster", "cluster_size"
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
    vectors: DataFrame,
    k: int = 5,
    n_bits: int = 6,
    dim: int = 64,
    seed: int = 42,
    n_probe: int = 4,
    n_salts: int = 4,
) -> DataFrame:
    """(vec_id, rank, neighbor_id): approximate top-k — candidates limited
    to the query's random-hyperplane sign bucket plus its ``n_probe - 1``
    multi-probe buckets (flip the lowest-|margin| hyperplane bits — the
    standard multi-probe LSH trick; single-probe sign-LSH is near-useless
    on unstructured embeddings where true neighbors sit close to several
    hyperplanes).

    Plan shape (the scale path): bucket signatures are one numpy gemm per
    Arrow batch map-side (``mapInPandas``), then ONE shuffle on
    (bucket, salt) and a per-sub-bucket matmul top-k (``applyInPandas``
    via ``_salted_group_topk`` — members split n_salts ways, queries
    replicated, per-task memory bounded), with a final window merging the
    per-salt/per-probe partials. Bucket population is ~N / 2^bits on
    random data; raise n_bits and/or n_salts as N grows."""
    import numpy as np

    planes_t = np.array(_hyperplanes(dim, n_bits, seed), dtype=np.float64).T
    weights = np.array([1 << i for i in range(n_bits)], dtype=np.int64)

    def assign(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            q = np.array(list(pdf["embedding"]), dtype=np.float64)
            proj = q @ planes_t
            bits = proj > 0
            own = (bits @ weights).astype(np.int64)
            flip_order = np.argsort(np.abs(proj), axis=1)
            out = {"vec_id": [], "bucket": [], "role": [], "embedding": []}
            for i, vid in enumerate(pdf["vec_id"]):
                emb = pdf["embedding"].iloc[i]
                out["vec_id"].append(int(vid)); out["bucket"].append(int(own[i]))
                out["role"].append("member"); out["embedding"].append(emb)
                probes = {int(own[i])}
                for j in range(min(n_probe - 1, n_bits)):
                    probes.add(int(own[i]) ^ int(weights[flip_order[i, j]]))
                for b in sorted(probes):
                    out["vec_id"].append(int(vid)); out["bucket"].append(b)
                    out["role"].append("query"); out["embedding"].append(emb)
            yield pd.DataFrame(out)

    def topk(pdf):
        import pandas as pd

        mem = pdf[pdf["role"] == "member"]
        qry = pdf[pdf["role"] == "query"]
        if mem.empty or qry.empty:
            return pd.DataFrame({"vec_id": [], "neighbor_id": [], "cos": []}).astype(
                {"vec_id": "int64", "neighbor_id": "int64", "cos": "float64"}
            )
        m = np.array(list(mem["embedding"]), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        q = np.array(list(qry["embedding"]), dtype=np.float64)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        cos = q @ m.T
        mids = mem["vec_id"].to_numpy(dtype=np.int64)
        qids = qry["vec_id"].to_numpy(dtype=np.int64)
        out_q, out_n, out_c = [], [], []
        for i, qid in enumerate(qids):
            mask = mids != qid
            cand, cc = mids[mask], cos[i][mask]
            order = np.lexsort((cand, -cc))[:k]
            out_q.extend([qid] * len(order))
            out_n.extend(cand[order])
            out_c.extend(cc[order])
        return pd.DataFrame({"vec_id": out_q, "neighbor_id": out_n, "cos": out_c})

    base = vectors.select("vec_id", "embedding").repartition(
        _default_parallelism(vectors), "vec_id"
    )
    assigned = base.mapInPandas(
        assign, schema="vec_id long, bucket long, role string, embedding array<float>"
    )
    partials = _salted_group_topk(assigned, "bucket", topk, n_salts)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        partials.dropDuplicates(["vec_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", F.col("rank").cast("bigint").alias("rank"), "neighbor_id")
    )
