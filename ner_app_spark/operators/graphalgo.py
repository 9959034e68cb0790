"""Graph analytics over the materialized knowledge graph.

The reference materializes its graph and then *queries* it (node lists,
degree stats — /root/reference/src/services/graph_service.py); a
web-scale KG additionally needs the classic whole-graph analytics:
importance ranking (PageRank), community/cluster structure (connected
components — operators/components.py), local density (triangles), and
reachability (BFS hops). All four here are pure-DataFrame iterative
algorithms — no GraphFrames jar required — designed for the shuffle
behaviour that matters at 10^12 edges and engineered so a DuckDB SQL
oracle reproduces every output value EXACTLY:

* **PageRank** runs in integer fixed-point (rank scaled by 10^12, all
  updates via ``div`` long division). Float PageRank cannot be
  hash-compared across engines — double addition is order-dependent and
  Spark's partial aggregation order differs from DuckDB's — but integer
  sums are associative-exact, so the scaled ranks are bit-identical by
  construction, not by luck.
* **Triangle counting** orients each edge from its (degree, node)-smaller
  endpoint to the larger one before building wedges — the standard
  skew bound: per-node oriented out-degree is O(sqrt(m)), so the wedge
  self-join never explodes on celebrity nodes the way a naive
  neighbor-pair join does.
* **BFS** propagates a frontier (newly-reached nodes only), not the full
  distance table, so iteration i shuffles O(|frontier_i|) rows.
* Iterative lineage is truncated per round (``localCheckpoint``) exactly
  like operators/components.py — plans otherwise double in depth.

Node ids are strings here (entity tokens); at 10^12 scale mint int64 ids
first (xxhash64 or an id dimension) — string shuffle keys cost ~3x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for integer PageRank: rank 1.0 == 10^12. Headroom:
#: total mass is n * SCALE; int64 overflows past n ~ 9e6 nodes at this
#: scale — at larger n use SCALE 10^9 (still 9 exact digits).
PR_SCALE = 10**12


def cooccurrence_edges(
    docs: DataFrame, window: int = 2, max_positions: int = 200
) -> DataFrame:
    """Undirected token co-occurrence edges (src < dst): tokens appearing
    within ``window`` positions of each other, keeping only pairs whose
    corpus-wide co-occurrence count is >= 3/4 of the maximum pair count
    (exact integer compare ``4*cnt >= 3*max`` — no float threshold, so
    the SQL oracle replays it bit-exactly).

    The windowed definition is the standard co-occurrence graph AND the
    scale-safe one: per-doc pair generation is O(window * len), not the
    O(t^2) of doc-level co-occurrence, and ``max_positions`` caps a
    10^6-token outlier page. The positional self-join shuffles both
    sides on doc_id (co-partitioned equi-join); the relative-frequency
    threshold needs one global MAX — a 1-row aggregate broadcast, not a
    driver collect.
    """
    from .tfidf import TOKEN_SQL_RE

    arr = docs.select(
        "doc_id",
        F.expr(f"regexp_extract_all(lower(text), '{TOKEN_SQL_RE}', 0)").alias("arr"),
    )
    pos = arr.select(
        "doc_id", F.posexplode(F.slice("arr", 1, max_positions)).alias("p", "token")
    )
    a = pos.alias("a")
    b = pos.alias("b")
    pc = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.p") - F.col("a.p") >= 1)
            & (F.col("b.p") - F.col("a.p") <= window)
            & (F.col("a.token") != F.col("b.token")),
        )
        .groupBy(
            F.least("a.token", "b.token").alias("src"),
            F.greatest("a.token", "b.token").alias("dst"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    mx = pc.agg(F.max("cnt").alias("m"))
    return (
        pc.crossJoin(F.broadcast(mx))
        .filter(4 * F.col("cnt") >= 3 * F.col("m"))
        .select("src", "dst")
    )


def _bidir(edges: DataFrame) -> DataFrame:
    return (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = 6,
    scale: int = PR_SCALE,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank (damping 0.85) over the undirected graph,
    in integer fixed-point: returns (node, rank_scaled long, rank double)
    where rank = rank_scaled / scale.

    Every arithmetic step is exact long math (``div`` = floor division on
    positives), so the result is engine-independent: DuckDB replaying the
    same unrolled iterations produces identical rank_scaled values —
    which is what makes this row hash-verifiable, unlike float PageRank.

    Scale shape: per iteration one shuffle to join ranks onto edge
    sources (hash on node) and one partial-agg shuffle to sum
    contributions per destination — the canonical Pregel-style plan.
    Rank lineage grows LINEARLY per iteration (join + agg, unlike CC's
    doubling), so truncation every ``checkpoint_every`` rounds suffices:
    each localCheckpoint is a blocking materialization barrier, and
    halving the barrier count nearly halves the fixed-cost wall on small
    graphs without changing the plan depth class. In an undirected graph
    every node has out-degree >= 1, so there is no dangling-mass term.
    """
    bidir = _bidir(edges)
    deg = bidir.groupBy("src").agg(F.count("*").alias("outdeg"))
    # edge list pre-joined with source degree, reused every iteration
    ed = bidir.join(deg, "src").localCheckpoint()
    nodes = deg.select(F.col("src").alias("node"))
    n = nodes.count()
    base = (15 * scale) // (100 * n)
    ranks = nodes.select("node", F.lit(scale // n).alias("rank_scaled"))
    for i in range(iters):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("(85 * rank_scaled) div (100 * outdeg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce("c", F.lit(0))).cast("long").alias("rank_scaled"),
        )
        if (i + 1) % checkpoint_every == 0 or i == iters - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        F.col("node").alias("entity"),
        "rank_scaled",
        (F.col("rank_scaled").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts: (node, n_triangles) for every node in
    the graph (0 for triangle-free nodes).

    Degree-ordered orientation (edge points from its (degree, node)-
    smaller endpoint to the larger) bounds oriented out-degree by
    O(sqrt(m)), so the wedge join is skew-safe: a hub with 10^6
    neighbors produces wedges only from its few lower-degree-oriented
    out-edges, never 10^12 neighbor pairs. Each triangle is generated
    exactly once (its orientation-minimal vertex pivots), then exploded
    to its three corners for the per-node count.
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    bidir = _bidir(canon.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    deg = bidir.groupBy("src").agg(F.count("*").alias("d")).withColumnRenamed("src", "n")
    # orient by (degree, node): strict total order, so exactly one
    # direction survives per edge
    o = (
        bidir.join(deg.withColumnRenamed("n", "src").withColumnRenamed("d", "ds"), "src")
        .join(deg.withColumnRenamed("n", "dst").withColumnRenamed("d", "dd"), "dst")
        .filter(
            (F.col("ds") < F.col("dd"))
            | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst", "dd")
    )
    e1 = o.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("dd").alias("dv")
    )
    e2 = o.select(
        F.col("src").alias("u"), F.col("dst").alias("w"), F.col("dd").alias("dw")
    )
    wedges = e1.join(e2, "u").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    per_node = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        deg.select(F.col("n").alias("node"))
        .join(per_node, "node", "left")
        .select("node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"))
    )


def bfs_hops(edges: DataFrame, max_hops: int = 10) -> DataFrame:
    """Hop distance from the lexicographically-smallest node: (node,
    hops) for every node in the graph; hops is NULL if unreachable
    within ``max_hops``.

    Frontier-propagation BFS: round i joins ONLY the newly-reached
    frontier against the adjacency list, so the expensive edge-side work
    is O(neighbors of the frontier), not O(edges incident to everything
    reached). The seen-set anti-join does reshuffle the (reached-sized)
    distance table each round — at cluster scale hash-partition `dist`
    on node once and reuse the partitioning across rounds to make that
    side shuffle-free. Stops early when the frontier empties. The seed
    is derived in-plan (1-row min aggregate broadcast) — no driver
    round-trip beyond the loop's emptiness checks, which any iterative
    driver program needs.
    """
    bidir = _bidir(edges).localCheckpoint()
    nodes = bidir.select(F.col("src").alias("node")).distinct()
    seed_row = bidir.agg(F.min("src").alias("node"))
    dist = seed_row.select("node", F.lit(0).alias("hops")).localCheckpoint()
    frontier = dist
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(bidir, frontier["node"] == bidir["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = (
            nxt.join(dist.select("node"), "node", "left_anti")
            .select("node", F.lit(h).alias("hops"))
            .localCheckpoint()
        )
        if new.isEmpty():
            break
        dist = dist.union(new).localCheckpoint()
        frontier = new
    return nodes.join(dist, "node", "left").select(
        "node", F.col("hops").cast("long").alias("hops")
    )


def motif_census_2hop(triples: DataFrame) -> DataFrame:
    """2-hop motif census over (url, subj, pred, obj) triples: for every
    predicate pair (p1, p2), the number of within-document paths
    a -[p1]-> m -[p2]-> c (a != c) and the number of distinct pivot
    entities m. The GraphFrames-motif shape `(a)-[e1]->(m); (m)-[e2]->(c)`
    as a census (aggregate counts), not an enumeration — at 10^12 triples
    the path SET is unmaterializable, but the census is one
    url-co-partitioned self-join feeding a partial aggregation on a
    predicate-pair keyspace that is tiny by construction."""
    t1 = triples.alias("t1")
    t2 = triples.alias("t2")
    return (
        t1.join(
            t2,
            (F.col("t1.url") == F.col("t2.url"))
            & (F.col("t1.obj") == F.col("t2.subj")),
        )
        .filter(F.col("t1.subj") != F.col("t2.obj"))
        .groupBy(F.col("t1.pred").alias("p1"), F.col("t2.pred").alias("p2"))
        .agg(
            F.count("*").alias("n_paths"),
            F.countDistinct("t1.obj").alias("n_mids"),
        )
    )


def entity_degrees(triples: DataFrame) -> DataFrame:
    """Global in/out degree per entity over the DISTINCT (subj, obj) edge
    set of the triple store — the first profile query anyone runs on a
    new KG. Two partial-agg shuffles on the node key plus one full-outer
    merge; degree skew (celebrity entities) is inherent to the output
    and harmless here because count aggregation is map-side combinable."""
    edges = triples.select("subj", "obj").distinct()
    o = edges.groupBy(F.col("subj").alias("node")).agg(
        F.count("*").alias("out_degree")
    )
    i = edges.groupBy(F.col("obj").alias("node")).agg(
        F.count("*").alias("in_degree")
    )
    return o.join(i, "node", "full_outer").select(
        "node",
        F.coalesce("out_degree", F.lit(0)).cast("long").alias("out_degree"),
        F.coalesce("in_degree", F.lit(0)).cast("long").alias("in_degree"),
    )


def dup_clusters(docs: DataFrame, min_jaccard: float = 0.3) -> DataFrame:
    """Near-duplicate clustering with keeper selection — the operation an
    LLM-data pipeline actually runs after near-dup detection: group the
    verified-duplicate graph into clusters and keep one representative
    per cluster.

    Pipeline: MinHash-LSH candidates -> Jaccard verify (>= min_jaccard)
    -> connected components over the verified pairs -> cluster id = min
    doc_id of the component (singletons are their own cluster). Returns
    (doc_id, cluster_id, cluster_size, is_keeper) for EVERY document;
    ``is_keeper`` is true exactly for the cluster's min-doc_id member,
    so ``filter(is_keeper)`` is the deduplicated corpus.

    Scale shape: inherits the banded-LSH bound (never all-pairs), then
    O(log n) CC rounds (operators/components.py) over only the verified
    pairs — a tiny fraction of the corpus.
    """
    from .components import connected_components
    from .dedup import near_dup_verified

    pairs = near_dup_verified(docs, min_jaccard=min_jaccard)
    cc = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    clustered = (
        docs.select("doc_id")
        .join(cc, docs["doc_id"] == cc["id"], "left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("cluster_id"))
    )
    agg = clustered.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return clustered.join(agg, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )
