"""Degenerate inputs through the full pipeline: zero pages, one page,
and a corpus the language gate drops entirely. These are the launch
surface's failure modes (a 10^12-row job WILL see empty partitions and
all-filtered splits); every stage must produce empty typed frames, not
exceptions."""

from __future__ import annotations

import pandas as pd

from ner_app_spark.plans.pipeline import pipeline_counters, run_pipeline
from ner_app_spark.sources.pages import synth_pages_df


def test_zero_pages(spark):
    out = run_pipeline(spark, synth_pages_df(spark, 0, num_partitions=2))
    counters = pipeline_counters(out)
    assert counters == {
        "documents": 0, "phrases": 0, "unique_phrase_types": 0,
        "triples": 0, "links": 0, "nodes": 0, "edges": 0,
    }
    out.cleanup()


def test_single_page(spark):
    out = run_pipeline(spark, synth_pages_df(spark, 1, num_partitions=2))
    counters = pipeline_counters(out)
    assert counters["documents"] == 1
    assert counters["phrases"] > 0 and counters["triples"] > 0
    out.cleanup()


def test_lang_gate_drops_everything(spark):
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["http://a", "http://b"],
                "warc_ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
                "html": [b"<p>hello</p>", b"<p>world</p>"],
                "text": ["hello there", "wide world"],
                "lang": ["en", "de"],
            }
        )
    )
    out = run_pipeline(spark, pages)  # lang='ru' default: both gated out
    counters = pipeline_counters(out)
    # text extraction is lang-agnostic (the byte-identical invariant is
    # per url); the lang gate sits on the ANALYSIS stage, so documents
    # still counts the extracted pages while everything downstream is 0
    assert counters["documents"] == 2
    assert counters["phrases"] == 0 and counters["triples"] == 0
    assert counters["links"] == 0 and counters["edges"] == 0
    out.cleanup()


def test_zero_pages_web_curation_ops(spark):
    """The web-curation layer's operators all yield empty typed frames
    (never exceptions) on zero pages — and on a pages frame whose every
    payload is text/plain (no html to match)."""
    from pyspark.sql import functions as F

    from ner_app_spark.operators import urlnorm, webgraph

    empty = synth_pages_df(spark, 0, num_partitions=2)
    assert webgraph.host_quality(empty).count() == 0
    assert webgraph.robots_directives(empty).count() == 0
    assert webgraph.indexable_pages(empty).count() == 0
    assert webgraph.host_edges(empty, honor_nofollow=True).count() == 0
    assert webgraph.anchor_aliases(empty).count() == 0
    assert urlnorm.normalize_urls(empty.select("url")).count() == 0

    plain = synth_pages_df(spark, 30).withColumn(
        "html", F.encode(F.col("text"), "UTF-8")
    )
    assert webgraph.host_edges(plain).count() == 0  # no anchors anywhere
    assert webgraph.indexable_pages(plain).count() == 30  # nothing opts out
    hq = webgraph.host_quality(plain)
    assert hq.agg(F.sum("plain_pages")).first()[0] == 30


def test_zero_pages_crawl_tail_ops(spark):
    """The crawl/training tail (round-5 final session) on zero pages and
    on an anchor-free corpus: empty typed frames, never exceptions."""
    from pyspark.sql import functions as F

    from ner_app_spark.operators import fetchlog, webgraph
    from ner_app_spark.operators.sampling import (
        negative_samples,
        stratified_sample,
    )
    from ner_app_spark.operators.triples import triple_support

    empty = synth_pages_df(spark, 0, num_partitions=2)
    assert fetchlog.latest_fetches(empty.select("url", "warc_ts", "text")).count() == 0
    assert fetchlog.dedup_fetches(empty).count() == 0
    assert webgraph.crawl_frontier(empty, iters=2).count() == 0
    assert webgraph.frontier_waves(
        webgraph.crawl_frontier(empty, iters=2)
    ).count() == 0
    assert stratified_sample(
        empty.select("url", "lang"), {"ru": 0.25}
    ).count() == 0

    empty_triples = spark.createDataFrame(
        [], "url string, subj string, pred string, obj string"
    )
    assert triple_support(empty_triples).count() == 0
    assert negative_samples(
        empty_triples.select("subj", "pred", "obj")
    ).count() == 0

    # anchor-free corpus: the frontier is empty (no outlinks at all),
    # but the fetch-log rollup still covers every url
    plain = synth_pages_df(spark, 30).withColumn(
        "html", F.encode(F.col("text"), "UTF-8")
    )
    assert webgraph.crawl_frontier(plain, iters=2).count() == 0
    assert fetchlog.latest_fetches(plain.select("url", "warc_ts", "text")).count() == 30


def test_edge_inputs_schema_temporal_spandedup_ops(spark):
    """predicate_stats / triple_intervals / dup_span_fraction on empty
    and degenerate inputs: empty typed frames (or all-zero signal rows),
    never exceptions."""
    from pyspark.sql import functions as F

    from ner_app_spark.operators.dedup import dup_span_fraction
    from ner_app_spark.operators.triples import (
        predicate_stats,
        triple_intervals,
    )

    empty_triples = spark.createDataFrame(
        [], "url string, subj string, pred string, obj string"
    )
    empty_pages = synth_pages_df(spark, 0, num_partitions=2)
    assert predicate_stats(empty_triples).count() == 0
    assert triple_intervals(empty_triples, empty_pages).count() == 0
    assert (
        triple_intervals(
            empty_triples, empty_pages, origin="2025-01-01 00:00:00"
        ).count()
        == 0
    )

    # triples whose urls are absent from the page dim: the inner join
    # drops them (no timestamps to aggregate), no null intervals leak
    orphan = spark.createDataFrame(
        [("http://nowhere/x", "a", "synonym", "b")],
        "url string, subj string, pred string, obj string",
    )
    assert triple_intervals(orphan, synth_pages_df(spark, 5)).count() == 0

    # functional predicate: one object per subject -> functionality 1.0
    fn = spark.createDataFrame(
        [("u1", "s1", "p", "o1"), ("u2", "s2", "p", "o2")],
        "url string, subj string, pred string, obj string",
    )
    row = predicate_stats(fn).first()
    assert row["functionality_micros"] == 1_000_000
    assert row["n_triples"] == 2 and row["n_obs"] == 2

    # dup_span_fraction: empty corpus -> 0 rows; docs shorter than n
    # tokens -> n_windows 0 and frac 0 (CASE guard); a verbatim copy
    # pair -> every window duplicated (frac exactly 1.0 in micros)
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert dup_span_fraction(empty_docs, n=4).count() == 0
    docs = spark.createDataFrame(
        [
            (1, "too short"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "alpha beta gamma delta epsilon zeta"),
            (4, "wholly unrelated text without any overlap here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dup_span_fraction(docs, n=4).collect()}
    assert len(out) == 4
    assert out[1]["n_windows"] == 0 and out[1]["dup_frac_micros"] == 0
    assert out[2]["dup_frac_micros"] == 1_000_000
    assert out[3]["dup_frac_micros"] == 1_000_000
    assert out[4]["n_dup_windows"] == 0 and out[4]["dup_frac_micros"] == 0


def test_edge_inputs_alias_ambiguity(spark):
    """alias_ambiguity: empty dictionary -> empty; corpus-free phrases ->
    every alias kept with zero exposure; an ambiguous alias flags."""
    from ner_app_spark.operators.linking import alias_ambiguity

    empty_dim = spark.createDataFrame(
        [], "alias string, entity_id long, canonical_name string"
    )
    empty_phrases = spark.createDataFrame([], "url string, head_noun string")
    assert alias_ambiguity(empty_phrases, empty_dim).count() == 0

    dim = spark.createDataFrame(
        [("река", 1, "РЕКА"), ("река", 2, "РЕКА_АЛЬТ"), ("гора", 3, "ГОРА")],
        "alias string, entity_id long, canonical_name string",
    )
    out = {
        r["alias"]: r
        for r in alias_ambiguity(empty_phrases, dim).collect()
    }
    assert out["река"]["n_entities"] == 2 and out["река"]["is_ambiguous"]
    assert out["река"]["n_docs"] == 0 and out["река"]["n_occurrences"] == 0
    assert out["гора"]["n_entities"] == 1 and not out["гора"]["is_ambiguous"]

    phrases = spark.createDataFrame(
        [("u1", "река"), ("u1", "река"), ("u2", "река"), ("u9", "море")],
        "url string, head_noun string",
    )
    out = {r["alias"]: r for r in alias_ambiguity(phrases, dim).collect()}
    assert out["река"]["n_docs"] == 2 and out["река"]["n_occurrences"] == 3
    assert out["гора"]["n_docs"] == 0  # unseen alias survives the left join


def test_edge_inputs_pack_chunks(spark):
    """pack_chunks: empty corpus -> empty; zero-token docs dropped; each
    bucket's sub-stream tiles [0, total) with no gaps; chunk ids are
    exactly the integer-division images of the offsets."""
    from pyspark.sql import functions as F

    from ner_app_spark.operators.sampling import pack_chunks

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_chunks(empty).count() == 0

    docs = spark.createDataFrame(
        [(i, "слово " * (40 * (i % 3)) if i % 7 else "") for i in range(60)],
        "doc_id long, text string",
    )
    out = pack_chunks(docs, chunk_tokens=64, n_buckets=4).collect()
    # zero-token docs (i%7==0 and i%3==0 rows) never appear
    zero_ids = {i for i in range(60) if i % 7 == 0 or i % 3 == 0}
    assert zero_ids.isdisjoint({r["doc_id"] for r in out})
    by_bucket: dict[int, list] = {}
    for r in out:
        assert r["end_offset"] - r["start_offset"] == r["n_tokens"]
        assert r["first_chunk"] == r["start_offset"] // 64
        assert r["last_chunk"] == (r["end_offset"] - 1) // 64
        assert r["n_chunks"] == r["last_chunk"] - r["first_chunk"] + 1 >= 1
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in rows:  # offsets tile the sub-stream without gaps
            assert r["start_offset"] == pos
            pos = r["end_offset"]


def test_edge_inputs_final_session_ops(spark):
    """edge_split / mention_contexts / label_propagation /
    functional_violations / mint_ids / extend_ids / encode_triples on
    empty typed inputs: empty frames of the right schema, never
    exceptions."""
    from ner_app_spark.operators import graphalgo
    from ner_app_spark.operators.linking import mention_contexts
    from ner_app_spark.operators.sampling import edge_split
    from ner_app_spark.operators.triples import (
        encode_triples,
        extend_ids,
        functional_violations,
        mint_ids,
    )
    from ner_app_spark.sources.pages import alias_dict_df, morphology_df

    empty_triples = spark.createDataFrame(
        [], "subj string, pred string, obj string"
    )
    split = edge_split(empty_triples)
    assert split.count() == 0
    assert set(split.columns) == {"subj", "pred", "obj", "bucket", "split"}
    assert functional_violations(empty_triples).count() == 0
    assert encode_triples(empty_triples).count() == 0

    empty_vals = spark.createDataFrame([], "entity string")
    dim = mint_ids(empty_vals)
    assert dim.count() == 0
    # empty existing dim -> extend degenerates to a fresh mint
    some = spark.createDataFrame([("x",), ("y",)], "entity string")
    ext = {r["entity"]: r["id"] for r in extend_ids(dim, some).collect()}
    fresh = {r["entity"]: r["id"] for r in mint_ids(some).collect()}
    assert ext == fresh

    empty_pages = synth_pages_df(spark, 0, num_partitions=2)
    assert mention_contexts(
        empty_pages, alias_dict_df(spark), morphology_df(spark)
    ).count() == 0

    empty_edges = spark.createDataFrame([], "src string, dst string")
    lpa = graphalgo.label_propagation(empty_edges, iters=2)
    assert lpa.count() == 0
    assert set(lpa.columns) == {"entity", "community", "community_size"}
