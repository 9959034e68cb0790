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


def _sink_dir() -> str:
    """Scratch dir for the kg job's materialized fused table (tmpfs-gated
    via the shared session.scratch_base helper). On a real cluster this is
    the Iceberg warehouse."""
    from ner_app_spark.session import scratch_base

    return os.path.join(scratch_base(), f"ner_app_spark_bench_sink_{os.getpid()}")


def kg_pipeline_counts(spark, n_pages: int, n_parts: int | None = None) -> dict:
    """The headline job: synth pages -> fused extract (phrases AND triples
    emitted in the SAME Arrow batch — triples are per-doc local, so fusing
    deletes the posexplode/window shuffle that dominated earlier rounds)
    -> materialize the fused table to a parquet sink -> links from the
    sink. Returns counts + per-stage walls for throughput math.

    Round-3 shape change (documented in BENCH.md): the fused frame is
    written to parquet and read back rather than `.cache()`-ed. This is
    the north-star shape (nodes/edges materialize to a table, not to
    executor heap) AND the scalable one on this box — the 11M-row
    deserialized cache write was DRAM-bandwidth-bound and anti-scaled
    past ~8 threads, while the parquet encode is CPU-bound and speeds up
    with added cores (measured 26.6 s -> 17.5 s going 8 -> 32 at 20k
    pages vs the cache's inversion).

    Stage walls: 'extract' runs the full fused compute + sink write,
    'triples' the per-kind counts from the sink, 'links' the linking
    join tree over the sink's phrase rows."""
    import shutil

    from pyspark.sql import functions as F

    from ner_app_spark.operators.extract import (
        extract_phrases_and_triples,
        fused_phrases,
    )
    from ner_app_spark.operators.linking import link_mentions
    from ner_app_spark.sources.pages import alias_dict_df, synth_pages_df

    n_parts = n_parts or CPUS * 2
    out = _sink_dir()
    try:
        t0 = time.monotonic()
        pages = synth_pages_df(spark, n_pages)
        fused = extract_phrases_and_triples(pages, num_partitions=n_parts)
        fused.write.mode("overwrite").parquet(out)
        t1 = time.monotonic()
        back = spark.read.parquet(out)
        counts = {
            r["kind"]: r["n"]
            for r in back.groupBy("kind").agg(F.count("*").alias("n")).collect()
        }
        n_phrases = int(counts.get("phrase", 0))
        n_triples = int(counts.get("triple", 0))
        t2 = time.monotonic()
        n_links = link_mentions(fused_phrases(back), alias_dict_df(spark)).count()
        t3 = time.monotonic()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return {
        "docs": n_pages,
        "phrases": n_phrases,
        "triples": n_triples,
        "links": n_links,
        "stage_sec": {
            # 'extract' = fused compute + parquet sink write (inseparable
            # without recomputing); 'triples' = per-kind counts from the
            # sink; 'links' = the linking join tree over the sink
            "extract_sink": round(t1 - t0, 3),
            "triples": round(t2 - t1, 3),
            "links": round(t3 - t2, 3),
        },
    }


#: min-of-N per headline line: this host is a shared VM with bursty
#: neighbor load (identical runs vary up to 4x within minutes); the min
#: estimates machine capability instead of neighbor noise. 2 trials
#: roughly doubles bench wall (~2 min at sf0.1) — override with
#: SPARK_GRAFT_BENCH_TRIALS=1 for a quick single pass.
BENCH_TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2"))


def run_bench() -> dict:
    from ner_app_spark.queries import QUERIES
    from ner_app_spark.session import get_session

    spark = get_session(app_name="bench", shuffle_partitions=CPUS * 2)
    sf = _sf()
    n_pages = max(200, int(PAGES_PER_SF * sf))
    timings: dict[str, float] = {}

    # untimed warmup: a ~100-page pipeline pass so trial 1 does not pay
    # Python-worker spin-up / codegen classloading (round-2 VERDICT #3 —
    # the driver's first trial was timing cold workers, not the job)
    kg_pipeline_counts(spark, 100)
    # the flagship gets 3 trials (min-of-3) unless quick mode (TRIALS=1)
    kg_trials = int(
        os.environ.get("SPARK_GRAFT_KG_TRIALS", "3" if BENCH_TRIALS > 1 else "1")
    )
    kg_walls = []
    for _ in range(kg_trials):
        t0 = time.monotonic()
        counts = kg_pipeline_counts(spark, n_pages)
        kg_walls.append(round(time.monotonic() - t0, 3))
    timings["kg_pipeline"] = min(kg_walls)

    from pyspark.sql import functions as F

    from ner_app_spark.operators import dedup, similarity

    def _docs_1k(s):
        # the synthetic word-salad corpus is degenerately self-similar
        # (every doc shares most of a ~60-word vocabulary), so all-pairs
        # doc-similarity queries are inherently quadratic on it; the
        # pair-family headline entries run on a transparent 1000-doc cap
        # (labeled *_1k) instead of silently timing a pathological input
        return (
            s.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 1000)
        )

    headline: dict[str, object] = {
        "tfidf_single_doc": QUERIES["tfidf_single_doc"],
        "topk_terms": QUERIES["topk_terms"],
        "doc_freq_idf": QUERIES["doc_freq_idf"],
        "minhash_lsh_pairs_1k": lambda s, _: dedup.minhash_lsh_candidates(_docs_1k(s)),
        # the PRODUCTION near-dup shape (Jaccard verify on LSH candidates
        # only); the quadratic all-pairs jaccard_pairs stays registry-only
        # as the declared exactness oracle (round-2 VERDICT #8)
        "near_dup_verified_1k": lambda s, _: dedup.near_dup_verified(
            _docs_1k(s), min_jaccard=0.3
        ),
        "simhash": QUERIES["simhash"],
        "ann_cosine_topk": QUERIES["ann_cosine_topk"],
        "embedding_near_dup": QUERIES["embedding_near_dup"],
        # raw operator, not the registry wrapper: the queries() entry now
        # embeds a recall-vs-bruteforce self-check (driver correctness
        # machinery), which would double-count the exact path here
        "lsh_bucket_topk": lambda s, _: similarity.lsh_bucket_topk(
            s.read.parquet(f"{SF_DIR}/embeddings.parquet"), k=5
        ),
        "similar_docs_topk": QUERIES["similar_docs_topk"],
        "pricing_summary": QUERIES["pricing_summary"],
        "join_remap": QUERIES["join_remap"],
        "topk_per_group": QUERIES["topk_per_group"],
        "quality_score": QUERIES["quality_score"],
        "lang_id": QUERIES["lang_id"],
    }
    for name, fn in headline.items():
        walls = []
        for _ in range(BENCH_TRIALS):
            t0 = time.monotonic()
            _force(fn(spark, SF_DIR))
            walls.append(round(time.monotonic() - t0, 3))
        timings[name] = min(walls)

    # graph-analytics + curation rows (late round 4): reported as
    # EXTRAS, outside the headline total, so the total stays
    # line-for-line comparable with BASELINE.md's 16-line series. Raw
    # operators, not the (memoized) registry wrappers, so every trial
    # re-runs the full job (including k-means training).
    from ner_app_spark.operators import graphalgo, similarity, webgraph
    from ner_app_spark.operators.sampling import hash_split
    from ner_app_spark.sources.pages import synth_pages_df as _spdf

    def _synth_pages(s):
        return _spdf(s, n_pages)

    def _bench_hash_split(s, _):
        return hash_split(s.read.parquet(f"{SF_DIR}/documents.parquet"))

    def _bench_kmeans(s, _):
        return similarity.kmeans_clusters(
            s.read.parquet(f"{SF_DIR}/embeddings.parquet")
        )

    def _bench_fetch_log(s):
        from pyspark.sql import functions as F

        from ner_app_spark.operators import fetchlog

        pages = _synth_pages(s).select("url", "warc_ts", "text")
        pn = F.regexp_extract("url", "page/([0-9]+)", 1).cast("int")
        re1 = pages.filter(pn % 7 == 0).select(
            "url",
            (F.col("warc_ts") + F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
            F.concat("text", F.lit(" (rev2)")).alias("text"),
        )
        re2 = pages.filter(pn % 21 == 0).select(
            "url",
            (F.col("warc_ts") + F.expr("INTERVAL 2 DAY")).alias("warc_ts"),
            F.concat("text", F.lit(" (rev3)")).alias("text"),
        )
        return fetchlog.latest_fetches(pages.unionByName(re1).unionByName(re2))

    def _bench_stratified(s):
        from ner_app_spark.operators.sampling import stratified_sample

        return stratified_sample(
            _synth_pages(s).select("url", "lang"), {"ru": 0.25}
        )

    extras_fns: dict[str, object] = {
        "dup_clusters_1k": lambda s, _: graphalgo.dup_clusters(
            _docs_1k(s), min_jaccard=0.3
        ),
        "entity_pagerank": lambda s, _: graphalgo.pagerank(
            graphalgo.cooccurrence_edges(
                s.read.parquet(f"{SF_DIR}/documents.parquet")
            ),
            iters=6,
        ),
        "triangle_count": lambda s, _: graphalgo.triangle_counts(
            graphalgo.cooccurrence_edges(
                s.read.parquet(f"{SF_DIR}/documents.parquet")
            )
        ),
        "hash_split": _bench_hash_split,
        "kmeans_clusters": _bench_kmeans,
        # round-5 curation rows (lazy registry wrappers, re-planned per
        # trial): 13-gram benchmark decontamination against the broadcast
        # eval dim; email/phone/IPv4 PII lanes + redaction length
        "decontaminate": QUERIES["decontaminate"],
        "pii_scan": QUERIES["pii_scan"],
        # host-level web link graph over the same page count as
        # kg_pipeline: codegen href/host extraction + weighted edge agg,
        # then 6 directed fixed-point PageRank iterations over the hosts
        "host_link_edges": lambda s, _: webgraph.host_edges(_synth_pages(s)),
        "host_pagerank": lambda s, _: webgraph.host_pagerank(
            _synth_pages(s), iters=6
        ),
        # crawl-side URL canonicalization over the noised registry fixture
        "url_normalize": QUERIES["url_normalize"],
        # anchor-text alias mining (salted distinct-linker counts) and
        # the endorsement-gated web alias dictionary built from it
        "anchor_aliases": lambda s, _: webgraph.anchor_aliases(_synth_pages(s)),
        "anchor_alias_dim": lambda s, _: webgraph.anchor_alias_dim(
            _synth_pages(s)
        ),
        # domain-level curation rollup: per-host quality/volume stats
        # (fixed-point mean quality) over the extracted pages
        "host_quality": lambda s, _: webgraph.host_quality(_synth_pages(s)),
        # crawl-compliance lane: noindex/nofollow flags, one codegen
        # regex over the page scan (measures ~the scan itself)
        "robots_gate": lambda s, _: webgraph.robots_directives(_synth_pages(s)),
        # the domain decision table: quality rollup ⋈ PageRank prior
        "domain_table": lambda s, _: webgraph.domain_table(_synth_pages(s), iters=6),
        # CDX-style fetch-log rollup over the same page count, with the
        # registry row's deterministic re-fetch derivation (pn%7/pn%21)
        "fetch_log_latest": lambda s, _: _bench_fetch_log(s),
        # frontier scheduling: canonicalized anti-join + salted distinct
        # referrers + broadcast PageRank prior
        "crawl_frontier": lambda s, _: webgraph.crawl_frontier(
            _synth_pages(s), iters=6
        ),
        # deterministic TransE negatives over the pipeline's triples
        # (registry wrapper: extract -> triples -> bucketed slot draw)
        "kg_negative_samples": QUERIES["kg_negative_samples"],
        # politeness wave schedule over the frontier (host-partitioned
        # ranking on top of the crawl_frontier plan)
        "frontier_waves": lambda s, _: webgraph.frontier_waves(
            webgraph.crawl_frontier(_synth_pages(s), iters=6), per_wave=2
        ),
        # per-language training-mix rebalancer (filter-only projection)
        "stratified_sample": lambda s, _: _bench_stratified(s),
        # corpus-level triple confidence (salted distinct-host evidence)
        "triple_support": QUERIES["triple_support"],
        # KG schema induction: per-pred cardinalities + PARIS
        # functionality, all rolled up from the (pred,subj,obj) pre-agg
        "predicate_stats": QUERIES["predicate_stats"],
        # temporal KG: first/last crawl observation per assertion
        # (url-keyed warc_ts join riding the extract partitioning)
        "triple_intervals": QUERIES["triple_intervals"],
        # substring-level dedup signal (Lee et al.) over sf documents
        "dup_span_fraction": QUERIES["dup_span_fraction"],
        # EL ambiguity prior: dim-side entity fan-out x salted corpus
        # exposure, semi-filtered to the alias set before the broadcast
        "alias_ambiguity": QUERIES["alias_ambiguity"],
        # concat-and-chunk packing offsets: bucket-sharded cumsum + div
        "pack_chunks": QUERIES["pack_chunks"],
        # leak-free transductive link-prediction split: provisional
        # md5 bucket + one-pass anchor repair over the train dims
        "kg_edge_split": QUERIES["kg_edge_split"],
        # disambiguation training rows: ±5-token contexts, zero-shuffle
        # (tokenize + posexplode + broadcast dims + array slices)
        "mention_contexts": QUERIES["mention_contexts"],
        # int64 id mint + encoded edge list (bucket-sharded row_number)
        "kg_encoded_triples": QUERIES["kg_encoded_triples"],
        # snapshot-growth id continuation (two-snapshot mint)
        "kg_extend_ids": QUERIES["kg_extend_ids"],
        # KG constraint audit: induced-functional predicates' violating
        # (pred, subj) groups over the distinct-pair table
        "functional_violations": QUERIES["functional_violations"],
        # deterministic sync LPA (4 rounds) over the co-occurrence graph
        "lpa_communities": QUERIES["lpa_communities"],
    }
    extras: dict[str, float] = {}
    for name, fn in extras_fns.items():
        walls = []
        for _ in range(BENCH_TRIALS):
            t0 = time.monotonic()
            _force(fn(spark, SF_DIR))
            walls.append(round(time.monotonic() - t0, 3))
        extras[name] = min(walls)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_headline_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "trials": BENCH_TRIALS,
        "kg_counts": counts,
        "kg_docs_per_sec": round(counts["docs"] / timings["kg_pipeline"], 2),
        "kg_triples_per_sec": round(counts["triples"] / timings["kg_pipeline"], 2),
        "extra_queries": extras,
        "cpus": CPUS,
    }
    spark.stop()
    return result


def run_scaling_child(cores: int, n_pages: int, stage: str = "all") -> dict:
    """One fresh-JVM measurement at local[cores]. stage='all' = the full
    KG job; stage='extract' = the mapInPandas extract stage only (the
    compute-dominant fraction — on a real multi-executor cluster every
    stage ships with its own DRAM/NIC, but on THIS single-box VM the
    shuffle stages sit on a shared-DRAM ceiling and anti-scale past ~8
    threads (BENCH.md §1 platform probes), so the extract-only number is
    the honest proxy for how added executors scale the job)."""
    from ner_app_spark.session import get_session

    spark = get_session(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
    )
    # Untimed warmup (same methodology as the headline bench, round-2
    # VERDICT #3): a ~200-page pass of the identical job shape absorbs the
    # one-time per-JVM costs — Python-worker spin-up, codegen/JIT compile
    # of the ~15-stage linking plan, broadcast machinery. Measured: the
    # FIRST linking execution in a fresh JVM costs 50-75 s at local[32]
    # vs ~3-9 s for every subsequent one (driver-side single-threaded
    # compile gaps, starved by 32 busy task threads under neighbor
    # noise); the N->4N gate is about throughput, which a 10^12-doc job
    # amortizes cold-start into nothing.
    if stage == "extract":
        from ner_app_spark.operators.extract import extract_phrases
        from ner_app_spark.sources.pages import synth_pages_df

        extract_phrases(synth_pages_df(spark, 200), num_partitions=cores).count()
    else:
        kg_pipeline_counts(spark, 200, n_parts=cores)
    t0 = time.monotonic()
    if stage == "extract":
        from ner_app_spark.operators.extract import extract_phrases
        from ner_app_spark.sources.pages import synth_pages_df

        n_phrases = extract_phrases(
            synth_pages_df(spark, n_pages), num_partitions=cores * 2
        ).count()
        counts: dict = {"docs": n_pages, "phrases": n_phrases}
    else:
        counts = kg_pipeline_counts(spark, n_pages, n_parts=cores * 2)
    wall = time.monotonic() - t0
    spark.stop()
    return {"cores": cores, "wall_sec": round(wall, 3), **counts}


def measure_host_grant(seconds: float = 8.0) -> float:
    """Measured parallel speedup this host ACTUALLY grants going 8 -> 32
    busy processes (ideal: 4.0). Pure-Python ALU spin in separate
    processes — no JVM, no shared-DRAM traffic, no GIL contention — so
    the number isolates the hypervisor/neighbor CPU grant from every
    memory-system effect the KG job adds. `lscpu` advertises 32 dedicated
    cores; the round-1 probe measured ~3.32x under neighbor load. Run in
    the SAME window as the scaling job, this turns 'efficiency vs the
    grant' from a cross-day citation into same-window data carried in the
    scaling JSON."""
    import multiprocessing as mp

    def burn(q):
        t0 = time.monotonic()
        n = 0
        while time.monotonic() - t0 < seconds:
            n += 1
        q.put(n)

    agg: dict[int, int] = {}
    for procs in (8, 32):
        q: mp.Queue = mp.Queue()
        ps = [mp.Process(target=burn, args=(q,)) for _ in range(procs)]
        for p in ps:
            p.start()
        agg[procs] = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
    return agg[32] / agg[8]


def run_scaling() -> dict:
    """Same job, same input, local[8] vs local[32]; efficiency =
    (T_8 / T_32) / 4 — the sandbox evidence for the N->4N gate.

    Two methodology notes (both reported in the output):
      * The scaling input is larger than the headline-bench input
        (SPARK_GRAFT_SCALING_PAGES, default 400k*sf pages): the gate
        measures how COMPUTE scales, so the job must be compute-dominated
        — at the headline size, fixed costs (session, Python worker
        spin-up, per-stage scheduling) dominate and no parallelism level
        can show speedup (Amdahl).
      * Each level runs `trials` times and the MINIMUM wall is used:
        this sandbox is a VM on a shared host with bursty neighbor load
        (measured steal/latency varying 10x across minutes); min-of-N
        estimates machine capability rather than neighbor noise.
    """
    sf = _sf()
    n_pages = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", max(2000, int(400_000 * sf))))
    trials = int(os.environ.get("SPARK_GRAFT_SCALING_TRIALS", "2"))

    def measure(stage: str, pages: int) -> dict[int, dict]:
        # Levels INTERLEAVED within each trial round (8,32,8,32...), not
        # blocked per level: a neighbor burst that spans one level's whole
        # block corrupts both its trials and min-of-N cannot recover the
        # comparison; interleaved, a burst hits one trial of EACH level
        # and the min at both levels comes from the same quiet window.
        runs: dict[int, list] = {8: [], 32: []}
        for _ in range(trials):
            for cores in (8, 32):
                out = subprocess.run(
                    [
                        sys.executable, __file__, "--scaling-child",
                        str(cores), str(pages), stage,
                    ],
                    capture_output=True,
                    text=True,
                    timeout=3600,
                )
                line = out.stdout.strip().splitlines()[-1]
                runs[cores].append(json.loads(line))
        results: dict[int, dict] = {}
        for cores, rs in runs.items():
            best = min(rs, key=lambda r: r["wall_sec"])
            results[cores] = {**best, "all_trials_sec": [r["wall_sec"] for r in rs]}
        return results

    results = measure("all", n_pages)
    extract = measure("extract", n_pages)
    t8, t32 = results[8]["wall_sec"], results[32]["wall_sec"]
    e8, e32 = extract[8]["wall_sec"], extract[32]["wall_sec"]
    docs = results[32]["docs"]
    # Per-stage decomposition at BOTH parallelism levels (round-3 VERDICT
    # #2: the "compute fraction scales, the residual is single-box DRAM"
    # argument as machine-checkable data, not prose). Stage walls come
    # from the min-wall full-job run at each level, so each level's
    # decomposition is internally consistent.
    stage8 = results[8].get("stage_sec", {})
    stage32 = results[32].get("stage_sec", {})
    per_stage_eff = {
        k: round((stage8[k] / stage32[k]) / 4.0, 4)
        for k in stage32
        if stage8.get(k) and stage32.get(k)
    }
    # The extract_sink stage is fused-compute + parquet-sink write; the
    # extract-only job is the same compute WITHOUT the sink. Their
    # difference isolates the sink-write residual per level — the
    # single-box DRAM term the full-job efficiency divides by. (On a
    # multi-executor cluster each executor brings its own DRAM/NIC, so
    # this residual scales with the cluster rather than sitting on one
    # memory bus.)
    sink8 = round(stage8.get("extract_sink", 0) - e8, 3)
    sink32 = round(stage32.get("extract_sink", 0) - e32, 3)
    # Same-window physical grant: the efficiency denominators above use
    # the ideal 4.0; a shared host grants less CPU than it advertises,
    # and the *_vs_grant fields report the job's speedup against what the
    # hypervisor measurably granted THIS window (burn test, no JVM/DRAM).
    grant = measure_host_grant()
    return {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round((t8 / t32) / 4.0, 4),
        "extract_only_efficiency": round((e8 / e32) / 4.0, 4),
        "stage_sec_8": stage8,
        "stage_sec_32": stage32,
        "per_stage_efficiency": per_stage_eff,
        "derived_sink_write_sec": {"8": sink8, "32": sink32},
        "host_grant_8_to_32": round(grant, 3),
        "full_eff_vs_grant": round((t8 / t32) / grant, 4),
        "extract_eff_vs_grant": round((e8 / e32) / grant, 4),
        "unit": "efficiency",
        "sf": sf,
        "scaling_pages": n_pages,
        "trials": trials,
        "method": (
            "min-of-N wall per level (shared-host noise); full job + "
            "extract-only (compute fraction — the shuffle stages sit on this "
            "single box's shared-DRAM ceiling and anti-scale past ~8 threads, "
            "see BENCH.md platform probes; multi-executor clusters add "
            "DRAM/NIC per executor)"
        ),
        "runs": results,
        "extract_runs": extract,
        "docs_per_sec_8": round(docs / t8, 2),
        "docs_per_sec_32": round(docs / t32, 2),
        "extract_docs_per_sec_8": round(docs / e8, 2),
        "extract_docs_per_sec_32": round(docs / e32, 2),
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        stage = sys.argv[4] if len(sys.argv) > 4 else "all"
        print(json.dumps(run_scaling_child(int(sys.argv[2]), int(sys.argv[3]), stage)))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
