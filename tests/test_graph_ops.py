"""Graph CRUD semantics: mint, FK check, threshold, merge, diff
(SURVEY.md §2.6/§2.7, FIXTURES.md §6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_app_spark.operators.graph import (
    apply_threshold,
    dedupe_edges_undirected,
    diff_edges,
    fk_violations,
    merge_graphs,
    mint_edges,
    mint_nodes,
)

NODE_SCHEMA = "graph_id string, node_id long, text string, type string, phrase_type string, tfidf double, hidden boolean"
EDGE_SCHEMA = "graph_id string, src long, dst long, pred string"


def test_mint_nodes_dedupes_and_ids_stable(spark):
    phrases = spark.createDataFrame(
        [
            ("g1", "alpha", "однословное", 0.5),
            ("g1", "alpha", "однословное", 0.7),  # dup, keeps max tfidf
            ("g1", "alpha", "генитивное", 0.2),  # same text, different type
            ("g2", "alpha", "однословное", 0.5),  # same key, another graph
        ],
        "url string, phrase string, type string, tfidf double",
    )
    nodes = mint_nodes(phrases).collect()
    assert len(nodes) == 3
    a1 = [n for n in nodes if n["graph_id"] == "g1" and n["type"] == "однословное"][0]
    assert a1["tfidf"] == 0.7
    ids = {n["node_id"] for n in nodes}
    assert len(ids) == 3  # distinct across graphs and types


def test_mint_edges_drops_dangling(spark):
    phrases = spark.createDataFrame(
        [("g1", "a", "однословное", 0.5), ("g1", "b", "однословное", 0.4)],
        "url string, phrase string, type string, tfidf double",
    )
    nodes = mint_nodes(phrases)
    triples = spark.createDataFrame(
        [("g1", "a", "synonym", "b"), ("g1", "a", "synonym", "missing")],
        "url string, subj string, pred string, obj string",
    )
    edges = mint_edges(triples, nodes)
    assert edges.count() == 1


def test_threshold_and_fk_and_undirected_dedupe(spark):
    nodes = spark.createDataFrame(
        [("g", 1, "a", "t", "phrase", 0.3, False), ("g", 2, "b", "t", "phrase", 0.9, False)],
        NODE_SCHEMA,
    )
    hid = {r["node_id"]: r["hidden"] for r in apply_threshold(nodes, 0.5).collect()}
    assert hid == {1: True, 2: False}

    edges = spark.createDataFrame(
        [("g", 1, 2, "synonym"), ("g", 2, 1, "synonym"), ("g", 1, 99, "synonym")],
        EDGE_SCHEMA,
    )
    bad = fk_violations(edges, nodes).collect()
    assert len(bad) == 1 and bad[0]["dst"] == 99

    deduped = dedupe_edges_undirected(edges.filter(F.col("dst") != 99)).collect()
    assert len(deduped) == 1 and deduped[0]["src"] == 1  # deterministic keep


def test_merge_graphs_reference_semantics(spark):
    # target has (a,t) hidden; source has (a,t) dup + (c,t) new + edge a->c
    target_nodes = spark.createDataFrame(
        [("T", 10, "a", "t", "term", 0.5, True), ("T", 11, "b", "t", "term", 0.4, False)],
        NODE_SCHEMA,
    )
    target_edges = spark.createDataFrame([("T", 10, 11, "synonym")], EDGE_SCHEMA)
    source_nodes = spark.createDataFrame(
        [("S", 20, "a", "t", "term", 0.6, False), ("S", 21, "c", "t", "term", 0.3, False)],
        NODE_SCHEMA,
    )
    source_edges = spark.createDataFrame([("S", 20, 21, "definition")], EDGE_SCHEMA)

    nodes, edges = merge_graphs(
        target_nodes, target_edges, source_nodes, source_edges, "T"
    )
    ncol = nodes.collect()
    assert len(ncol) == 3  # a reused, b kept, c inserted
    assert all(not n["hidden"] for n in ncol)  # U3 unhide-all
    by_text = {n["text"]: n for n in ncol}
    assert by_text["a"]["node_id"] == 10  # J1: dedupe reuses target id

    ecol = edges.collect()
    assert len(ecol) == 2
    remapped = [e for e in ecol if e["pred"] == "definition"][0]
    assert remapped["src"] == 10  # J2: endpoint remapped to target id
    assert remapped["dst"] == by_text["c"]["node_id"]


def test_diff_edges_actions(spark):
    existing = spark.createDataFrame(
        [("g", 1, 2, "x"), ("g", 1, 3, "x")], EDGE_SCHEMA
    )
    incoming = spark.createDataFrame(
        [("g", 1, 2, "x"), ("g", 4, 5, "x")], EDGE_SCHEMA
    )
    actions = {
        (r["src"], r["dst"]): r["action"] for r in diff_edges(existing, incoming).collect()
    }
    assert actions == {(1, 2): "keep", (1, 3): "delete", (4, 5): "insert"}
