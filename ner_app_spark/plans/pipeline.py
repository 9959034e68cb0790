"""The end-to-end KG construction pipeline (SURVEY.md §3.1 Spark
lifecycle):

    pages -> extract_text -> phrases (mapInPandas) -> triples
          -> entity links -> canonical ids -> nodes/edges

Every heavy stage optionally checkpoints per-partition (resume with zero
recomputation of completed parts); counters mirror the reference's stats
dict (phrase_extractor.py:67-71).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.components import canonicalize
from ..operators.extract import extract_phrases, extracted_text
from ..operators.graph import mint_edges, mint_nodes
from ..operators.linking import link_mentions
from ..operators.triples import emit_triples
from ..sources.pages import alias_dict_df, morphology_df
from .checkpoint import CheckpointManager, StageMetrics


@dataclass
class PipelineOutput:
    extracted: DataFrame
    phrases: DataFrame
    triples: DataFrame
    links: DataFrame
    canon: DataFrame
    nodes: DataFrame
    edges: DataFrame
    metrics: list[StageMetrics] = field(default_factory=list)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    workdir: str | None = None,
    n_parts: int = 32,
    lang: str = "ru",
    min_link_score: float = 0.5,
) -> PipelineOutput:
    """Run the full pipeline. With ``workdir`` set, the three heavy stages
    (extracted/phrases/triples) checkpoint per-partition and resume."""
    ckpt = CheckpointManager(workdir, n_parts=n_parts) if workdir else None
    metrics: list[StageMetrics] = []

    def stage(name: str, df: DataFrame, key: str) -> DataFrame:
        if ckpt is None:
            return df
        out, m = ckpt.run_stage(spark, name, df, key)
        metrics.append(m)
        return out

    extracted = stage("extracted", extracted_text(pages), key="url")
    phrases = stage(
        "phrases",
        extract_phrases(
            extracted, lang=lang, num_partitions=n_parts, text_col="extracted"
        ),
        key="url",
    )
    morph = morphology_df(spark)
    triples = stage("triples", emit_triples(phrases, morph), key="url")

    links = link_mentions(
        phrases, alias_dict_df(spark), min_score=min_link_score
    )
    canon = canonicalize(links.select("mention", "entity_id"))

    nodes = mint_nodes(phrases)
    edges = mint_edges(triples, nodes)
    return PipelineOutput(
        extracted=extracted,
        phrases=phrases,
        triples=triples,
        links=links,
        canon=canon,
        nodes=nodes,
        edges=edges,
        metrics=metrics,
    )


def write_outputs(out: PipelineOutput, target_dir: str) -> None:
    """Materialize graph tables (production: ``writeTo(...).append()`` on
    an Iceberg catalog; local stand-in: parquet dirs)."""
    out.nodes.write.mode("overwrite").parquet(f"{target_dir}/nodes")
    out.edges.write.mode("overwrite").parquet(f"{target_dir}/edges")
    out.triples.write.mode("overwrite").parquet(f"{target_dir}/triples")
    out.links.write.mode("overwrite").parquet(f"{target_dir}/links")


def pipeline_counters(out: PipelineOutput) -> dict:
    """Aggregate counters (A4 analog): one action triggers the counts."""
    return {
        "documents": out.extracted.count(),
        "phrases": out.phrases.count(),
        "unique_phrase_types": out.phrases.select("type").distinct().count(),
        "triples": out.triples.count(),
        "links": out.links.count(),
        "nodes": out.nodes.count(),
        "edges": out.edges.count(),
    }
