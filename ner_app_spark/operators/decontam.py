"""Benchmark decontamination for training-data pipelines.

Every production curation pipeline removes documents that overlap the
evaluation/benchmark sets before training (verbatim n-gram collision —
the standard 13-gram rule): a training doc sharing even one long
shingle with an eval doc leaks the benchmark. The operator reuses the
dedup family's shingle machinery (operators/dedup.explode_shingles) and
is engine-portable end-to-end, so the DuckDB oracle replays it exactly.

Scale shape (100 TB corpus vs a benchmark dim): eval sets are tiny
next to the corpus (10^6-10^8 distinct shingles vs 10^12 docs), so the
collision join BROADCASTS the eval dim — the corpus-side shingle
explode is map-local, the per-doc collision count is one partial-agg
shuffle on doc_id, and no corpus-sized table is ever re-keyed by
shingle. If an eval dim ever outgrows broadcast, drop the hint and the
same plan degrades to a shuffled hash join on `sh` — semantics
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import explode_shingles

#: the standard contamination shingle width (13-gram verbatim collision)
DECONTAM_NGRAM = 13


def eval_shingle_dim(eval_docs: DataFrame, n: int = DECONTAM_NGRAM) -> DataFrame:
    """(sh): the DISTINCT n-gram shingles of the eval/benchmark corpus —
    the broadcast dimension the training corpus is screened against."""
    return explode_shingles(eval_docs, n).select("sh").distinct()


def decontaminate(
    docs: DataFrame,
    eval_shingles: DataFrame,
    n: int = DECONTAM_NGRAM,
    min_collisions: int = 1,
) -> DataFrame:
    """(doc_id, n_collisions, contaminated) for EVERY input doc:
    n_collisions = count of DISTINCT n-gram shingles the doc shares with
    the eval set; contaminated = n_collisions >= min_collisions.
    ``filter(~contaminated)`` is the decontaminated corpus (the curation
    job wires this between its quality gate and dedup —
    jobs/run_curation.py --decontam)."""
    sh = explode_shingles(docs, n).distinct()
    hits = (
        sh.join(F.broadcast(eval_shingles.select("sh")), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("__n"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("__n", F.lit(0)).cast("bigint").alias("n_collisions"),
            (F.coalesce("__n", F.lit(0)) >= min_collisions).alias("contaminated"),
        )
    )
