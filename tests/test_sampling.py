"""operators/sampling.py: the stability properties that make hash
splitting the right tool (and randomSplit the wrong one) — plus the
kmeans_clusters curation op (operators/similarity.py)."""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import functions as F

from ner_app_spark.operators.sampling import hash_sample, hash_split

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _py_bucket(key) -> int:
    return struct.unpack("<I", hashlib.md5(str(key).encode()).digest()[:4])[0] % 100


def test_hash_split_matches_python_md5(spark):
    rows = hash_split(_docs(spark)).collect()
    for r in rows:
        b = _py_bucket(r["doc_id"])
        assert r["bucket"] == b
        assert r["split"] == ("train" if b < 80 else "val" if b < 90 else "test")


def test_hash_split_ratios_and_coverage(spark):
    rows = hash_split(_docs(spark)).collect()
    n = len(rows)
    assert n == _docs(spark).count()
    frac_train = sum(r["split"] == "train" for r in rows) / n
    frac_val = sum(r["split"] == "val" for r in rows) / n
    # hash noise at n=500: generous but non-vacuous windows
    assert 0.70 < frac_train < 0.90
    assert 0.04 < frac_val < 0.16


def test_hash_split_stable_under_corpus_growth(spark):
    """The property randomSplit / positional slicing lack: a document's
    split NEVER changes when the corpus grows."""
    docs = _docs(spark)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_map = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    for r in hash_split(half).collect():
        assert full_map[r["doc_id"]] == r["split"]


def test_hash_sample_is_subset_and_deterministic(spark):
    docs = _docs(spark)
    kept1 = {r["doc_id"] for r in hash_sample(docs, 0.2).select("doc_id").collect()}
    kept2 = {r["doc_id"] for r in hash_sample(docs, 0.2).select("doc_id").collect()}
    assert kept1 == kept2
    n = docs.count()
    assert 0.10 * n < len(kept1) < 0.30 * n
    # monotone in fraction: a smaller sample nests inside a larger one
    kept_small = {
        r["doc_id"] for r in hash_sample(docs, 0.1).select("doc_id").collect()
    }
    assert kept_small <= kept1


def test_hash_split_plan_is_shuffle_free(spark):
    plan = (
        hash_split(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_kmeans_clusters_partitions_corpus_by_nearest_centroid(spark):
    import numpy as np
    import pyarrow.parquet as pq

    from ner_app_spark.operators.similarity import (
        kmeans_clusters,
        lloyd_centroids_local,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = kmeans_clusters(emb).collect()
    assert len(rows) == emb.count()
    # sizes agree with the actual cluster memberships
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for members in by_cluster.values():
        assert all(m["cluster_size"] == len(members) for m in members)
    # every assignment is the argmax against the locally-replayed
    # trained codebook (bit-identical trainer, pinned elsewhere)
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.array(t["vec_id"], dtype=np.int64)
    m = np.array([list(v) for v in t["embedding"].to_pylist()], dtype=np.float64)
    cent = lloyd_centroids_local(ids, m)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    order = np.argsort(ids, kind="stable")
    expect = dict(zip(ids[order], (mn[order] @ cent.T).argmax(axis=1)))
    for r in rows:
        assert r["cluster"] == expect[r["vec_id"]], r["vec_id"]
