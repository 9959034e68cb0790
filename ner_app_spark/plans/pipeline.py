"""The end-to-end KG construction pipeline (SURVEY.md §3.1 Spark
lifecycle):

    pages -> extract_text -> phrases (mapInPandas) -> triples
          -> entity links -> canonical ids -> nodes/edges

Every heavy stage optionally checkpoints per-partition (resume with zero
recomputation of completed parts); counters mirror the reference's stats
dict (phrase_extractor.py:67-71).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.components import canonicalize
from ..operators.extract import (
    extract_phrases_and_triples,
    extracted_text,
    fused_phrases,
    fused_triples,
)
from ..operators.graph import mint_edges, mint_nodes
from ..operators.linking import link_mentions
from ..sources.pages import alias_dict_df
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
    #: the resolved candidate-generation dictionary (curated dim, plus
    #: the web-mined anchor dim when web_aliases) — exposed so job-level
    #: consumers (e.g. --contexts) reuse the SAME dictionary the linking
    #: stage probed instead of re-deriving it
    aliases: DataFrame
    metrics: list[StageMetrics] = field(default_factory=list)
    #: scratch parquet dir backing the heavy stages of a no-workdir run
    #: (None when checkpointing to a workdir); the frames above read from
    #: it, so call cleanup() only once you are done with them.
    scratch: str | None = None

    def cleanup(self) -> None:
        import shutil

        if self.scratch:
            shutil.rmtree(self.scratch, ignore_errors=True)
            self.scratch = None


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    workdir: str | None = None,
    n_parts: int = 32,
    lang: str = "ru",
    min_link_score: float = 0.5,
    web_aliases: bool = False,
) -> PipelineOutput:
    """Run the full pipeline. With ``workdir`` set, the three heavy stages
    (extracted/phrases/triples) checkpoint per-partition and resume.

    Without ``workdir``, each heavy stage is spilled ONCE to a scratch
    parquet table and read back: the output frames fan out to ~7
    consumers (links/canon/nodes/edges + the counters), and without a
    materialization each action would re-execute the whole mapInPandas
    extract. Parquet, not ``.cache()``, deliberately — the deserialized
    cache write is DRAM-bandwidth-bound and anti-scales with cores,
    while the parquet encode is CPU-bound and scales (measured, BENCH.md
    §5); it is also the north-star shape (stages land in tables). The
    caller owns ``PipelineOutput.cleanup()``."""
    import shutil
    import tempfile

    from ..session import scratch_base

    ckpt = CheckpointManager(workdir, n_parts=n_parts) if workdir else None
    metrics: list[StageMetrics] = []
    scratch = (
        None if ckpt else tempfile.mkdtemp(prefix="ner_kg_", dir=scratch_base())
    )

    def stage(name: str, df: DataFrame, key: str) -> DataFrame:
        if ckpt is None:
            path = f"{scratch}/{name}"
            df.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)
        out, m = ckpt.run_stage(spark, name, df, key)
        metrics.append(m)
        return out

    # mid-run failure must not leak the scratch dir (repeated failed
    # no-workdir runs would exhaust /dev/shm — round-3 ADVICE #1); the
    # success path stays caller-owned via PipelineOutput.cleanup()
    try:
        extracted = stage("extracted", extracted_text(pages), key="url")
        # ONE fused mapInPandas stage emits phrases AND triples (triples
        # are per-doc local, oracle.triples_for_doc) — no posexplode/window
        # shuffle between them; emit_triples stays as the declarative
        # SQL-checkable variant (equivalence pinned in tests/test_fused.py)
        fused = stage(
            "analysis",
            extract_phrases_and_triples(
                extracted, lang=lang, num_partitions=n_parts, text_col="extracted"
            ),
            key="url",
        )
        phrases = fused_phrases(fused)
        triples = fused_triples(fused)

        # candidate-generation dictionary: the curated dim, optionally
        # unioned with the web-mined anchor dictionary (dst_host-keyed
        # entity ids minted disjoint above WEB_ENTITY_ID_BASE). The web
        # dim derives from the SAME pages scan the extract stage read —
        # at 10^12 pages its endorsement gate keeps it broadcast-sized
        # (webgraph.anchor_alias_dim docstring).
        aliases = alias_dict_df(spark)
        if web_aliases:
            from ..operators.webgraph import anchor_alias_dim

            aliases = aliases.unionByName(anchor_alias_dim(pages))
        links = link_mentions(phrases, aliases, min_score=min_link_score)
        # checkpointed runs are reliable END-TO-END: the CC rounds inside
        # canonicalize route through the same manifest-backed checkpoint
        # (subdir keeps cc_round_* manifests apart from stage manifests)
        canon = canonicalize(
            links.select("mention", "entity_id"),
            workdir=os.path.join(workdir, "cc") if workdir else None,
        )

        nodes = mint_nodes(phrases)
        edges = mint_edges(triples, nodes)
    except BaseException:
        if scratch:
            shutil.rmtree(scratch, ignore_errors=True)
        raise
    return PipelineOutput(
        extracted=extracted,
        phrases=phrases,
        triples=triples,
        links=links,
        canon=canon,
        nodes=nodes,
        edges=edges,
        aliases=aliases,
        metrics=metrics,
        scratch=scratch,
    )


def analysis_sink(phrases: DataFrame, out_dir: str) -> DataFrame:
    """S2: the reference's content-addressed analysis-JSON sink,
    distributed (/root/reference/src/services/text_service.py:8-23,
    src/routers/api.py:22-29). Per document: build the analysis payload
    {phrases: [{phrase, type, tfidf_score, length}...], total_phrases,
    unique_phrase_types}, hash it with md5(canonical_json) — byte-exact
    reference identity — and write ``analysis_{md5}.json`` ONLY if absent
    (write-iff-absent = idempotent resume). Files are written executor-
    side inside the Arrow batch pass; the returned frame carries
    (url, analysis_id, written) for auditing.

    At 100 TB the one groupBy(url) here shares the extract stage's
    url-hash partitioning (no extra shuffle after repartition); the sink
    itself is embarrassingly parallel.

    REQUIREMENT: ``out_dir`` must be a SHARED filesystem (NFS/object-store
    mount) — write-iff-absent is implemented with node-local path checks,
    which are only globally idempotent when every executor sees the same
    namespace; on a raw object store, route through a FileSystem API with
    atomic put-if-absent instead (round-2 ADVICE #4). The directory is
    created inside the executor closure so fresh worker nodes need no
    driver-side setup."""
    import json as _json
    import os

    from ..functions.jsonhash import json_hash
    per_doc = (
        phrases.groupBy("url")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("phrase", "type", "tfidf", "length"))
            ).alias("plist")
        )
    )

    def run(batches):
        import pandas as pd

        os.makedirs(out_dir, exist_ok=True)  # executor-side (shared FS)
        for pdf in batches:
            rows = {"url": [], "analysis_id": [], "written": []}
            for url, plist in zip(pdf["url"], pdf["plist"]):
                payload = {
                    "phrases": [
                        {
                            "phrase": p["phrase"],
                            "type": p["type"],
                            "tfidf_score": p["tfidf"],
                            "length": int(p["length"]),
                        }
                        for p in plist
                    ],
                    "total_phrases": len(plist),
                    "unique_phrase_types": len({p["type"] for p in plist}),
                }
                h = json_hash(payload)
                path = os.path.join(out_dir, f"analysis_{h}.json")
                wrote = False
                if not os.path.exists(path):  # write-iff-absent (S2)
                    tmp = path + ".tmp"
                    with open(tmp, "w", encoding="utf-8") as f:
                        _json.dump(payload, f, ensure_ascii=False, indent=2)
                    os.replace(tmp, path)
                    wrote = True
                rows["url"].append(url)
                rows["analysis_id"].append(h)
                rows["written"].append(wrote)
            yield pd.DataFrame(rows, columns=["url", "analysis_id", "written"])

    return per_doc.mapInPandas(
        run, schema="url string, analysis_id string, written boolean"
    )


def read_analysis(spark: SparkSession, out_dir: str, analysis_id: str) -> dict:
    """S3: analysis source — read back one content-addressed file
    (text_service.py:25-28)."""
    import json as _json

    with open(f"{out_dir}/analysis_{analysis_id}.json", encoding="utf-8") as f:
        return _json.load(f)


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
