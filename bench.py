#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

--scaling mode: runs the same KG-pipeline job at two parallelism levels
(local[8] vs local[32]) in fresh JVMs on the SAME input and reports
throughput at both plus scaling efficiency = T8/(4*T32)... see
BENCH.md. (Sandbox stand-in for the N -> 4N executor gate in
BASELINE.json — no real cluster here.)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_PER_SF = 20_000  # sf0.1 -> 2000 synthetic pages for the KG job


def _sf() -> float:
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    return float(m.group(1)) if m else 0.1


def _force(df) -> int:
    """Materialize fully without collecting (noop sink)."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def kg_pipeline_counts(spark, n_pages: int) -> dict:
    """The headline job: synth pages -> extract -> phrases -> triples ->
    links. Returns counts for throughput math."""
    from ner_app_spark.operators.extract import extract_phrases
    from ner_app_spark.operators.linking import link_mentions
    from ner_app_spark.operators.triples import emit_triples
    from ner_app_spark.sources.pages import (
        alias_dict_df,
        morphology_df,
        synth_pages_df,
    )

    pages = synth_pages_df(spark, n_pages)
    phrases = extract_phrases(pages, num_partitions=CPUS * 2).cache()
    n_phrases = phrases.count()
    n_triples = emit_triples(phrases, morphology_df(spark)).count()
    n_links = link_mentions(phrases, alias_dict_df(spark)).count()
    phrases.unpersist()
    return {"docs": n_pages, "phrases": n_phrases, "triples": n_triples, "links": n_links}


def run_bench() -> dict:
    from ner_app_spark.queries import QUERIES
    from ner_app_spark.session import get_session

    spark = get_session(app_name="bench", shuffle_partitions=CPUS * 2)
    sf = _sf()
    n_pages = max(200, int(PAGES_PER_SF * sf))
    timings: dict[str, float] = {}

    t0 = time.monotonic()
    counts = kg_pipeline_counts(spark, n_pages)
    timings["kg_pipeline"] = round(time.monotonic() - t0, 3)

    headline = [
        "tfidf_single_doc",
        "topk_terms",
        "doc_freq_idf",
        "minhash_lsh_pairs",
        "jaccard_pairs",
        "simhash",
        "ann_cosine_topk",
        "pricing_summary",
        "join_remap",
        "topk_per_group",
        "quality_score",
        "lang_id",
    ]
    for name in headline:
        t0 = time.monotonic()
        _force(QUERIES[name](spark, SF_DIR))
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_headline_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "kg_counts": counts,
        "kg_docs_per_sec": round(counts["docs"] / timings["kg_pipeline"], 2),
        "kg_triples_per_sec": round(counts["triples"] / timings["kg_pipeline"], 2),
        "cpus": CPUS,
    }
    spark.stop()
    return result


def run_scaling_child(cores: int, n_pages: int) -> dict:
    """One fresh-JVM measurement of the KG job at local[cores]."""
    from ner_app_spark.session import get_session

    spark = get_session(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
    )
    t0 = time.monotonic()
    counts = kg_pipeline_counts(spark, n_pages)
    wall = time.monotonic() - t0
    spark.stop()
    return {"cores": cores, "wall_sec": round(wall, 3), **counts}


def run_scaling() -> dict:
    """Same job, same input, local[8] vs local[32]; efficiency =
    (T_8 / T_32) / 4 — the sandbox evidence for the N->4N gate."""
    n_pages = max(200, int(PAGES_PER_SF * _sf()))
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(cores), str(n_pages)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)
    t8, t32 = results[8]["wall_sec"], results[32]["wall_sec"]
    docs = results[32]["docs"]
    return {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round((t8 / t32) / 4.0, 4),
        "unit": "efficiency",
        "sf": _sf(),
        "runs": results,
        "docs_per_sec_8": round(docs / t8, 2),
        "docs_per_sec_32": round(docs / t32, 2),
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        print(json.dumps(run_scaling_child(int(sys.argv[2]), int(sys.argv[3]))))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
