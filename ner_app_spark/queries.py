"""Query registry: every implemented operator from SURVEY.md §2 exposed
as (spark, sf_dir) -> DataFrame, with an ANSI-SQL DuckDB oracle where the
semantics are SQL-expressible.

Parity rules (the driver hashes values after sorting columns by name):
  * every computed column is aliased identically on both sides;
  * doubles that are exact on both engines (integer inputs, IEEE
    sqrt/div, index-ordered array sums) are emitted raw; libm-dependent
    (ln) or threshold-adjacent values are rounded to 6;
  * money sums go through DECIMAL(18,2) accumulation (exact, identical)
    and only then cast to DOUBLE;
  * counts are BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup, graph, search, similarity, textquality, tfidf
from .operators.components import canonicalize
from .operators.extract import extract_phrases, extracted_text
from .operators.linking import link_mentions
from .operators.multimodal import decode_features, frame_sample, synth_media_df
from .operators.triples import emit_triples
from .sources.pages import alias_dict_df, morphology_df, synth_pages_df

TOKRE = tfidf.TOKEN_SQL_RE


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _pages_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    n = {"0.001": 60, "0.01": 200, "0.1": 400}.get(sf, 100)
    return synth_pages_df(spark, n)


# ---------------------------------------------------------------- KG analogs

def q_tf_counts(spark, sf_dir):
    return tfidf.tf_counts(_t(spark, sf_dir, "documents"))


def q_tfidf_single_doc(spark, sf_dir):
    return tfidf.tfidf_single_doc(_t(spark, sf_dir, "documents"))


def q_doc_freq_idf(spark, sf_dir):
    return tfidf.doc_freq_idf(_t(spark, sf_dir, "documents"))


def q_topk_terms(spark, sf_dir):
    return tfidf.top_k_terms(_t(spark, sf_dir, "documents"), k=10)


def q_doc_stats(spark, sf_dir):
    return tfidf.doc_stats(_t(spark, sf_dir, "documents"))


def q_sentence_split(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.regexp_replace("text", "([.!?])\\s+", "$1\n"), "\n")
            ).alias("sentence"),
        )
        .withColumn("sentence", F.trim("sentence"))
        .filter(F.col("sentence") != "")
    )


def q_content_hash(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("content_hash")
    )


def q_date_format_tz(spark, sf_dir):
    # F9: UTC -> Asia/Vladivostok (+10, no DST) + reference display format
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.date_format(
            F.col("ts") + F.expr("INTERVAL 10 HOURS"), "HH:mm dd.MM.yyyy"
        ).alias("local_ts"),
    )


def q_number_clamp(spark, sf_dir):
    # F10: clamp value/500 to [0,1] with 0.001 step
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.least(
            F.greatest(F.round(F.col("value") / 500.0, 3), F.lit(0.0)), F.lit(1.0)
        ).alias("clamped"),
    )


def q_json_extract(spark, sf_dir):
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


def q_filter_project(spark, sf_dir):
    # P1/P2/P6/P7: predicate chain + projection
    e = _t(spark, sf_dir, "events")
    return e.filter(
        (F.col("event_type") == "click") & (F.col("value") > 100.0)
    ).select("event_id", "user_id", "value")


# ------------------------------------------------------------- joins / sets

def q_join_natural_key(spark, sf_dir):
    # J1: broadcast dim join by natural key
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_customers"))
    )


def q_join_remap(spark, sf_dir):
    # J2: two-hop id remap lineitem -> orders -> customer
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_lines"))
    )


def q_semi_anti_fk(spark, sf_dir):
    # J3: FK existence via semi/anti joins
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    from .session import local_df

    with_items = o.join(li, "o_orderkey", "left_semi").count()
    without = o.join(li, "o_orderkey", "left_anti").count()
    return local_df(
        spark,
        [("with_items", with_items), ("without_items", without)],
        "fk_check string, cnt long",
    )


def q_edge_diff(spark, sf_dir):
    # J4/U2: full-outer set-diff between two keyed snapshots
    o = _t(spark, sf_dir, "orders")
    existing = o.filter(F.col("o_orderdate") < F.lit("1995-01-01")).select(
        F.lit("g").alias("graph_id"),
        F.col("o_orderkey").alias("src"),
        F.col("o_custkey").alias("dst"),
        F.lit("x").alias("pred"),
    )
    incoming = o.filter(F.col("o_orderdate") >= F.lit("1993-01-01")).select(
        F.lit("g").alias("graph_id"),
        F.col("o_orderkey").alias("src"),
        F.col("o_custkey").alias("dst"),
        F.lit("x").alias("pred"),
    )
    return (
        graph.diff_edges(existing, incoming)
        .groupBy("action")
        .agg(F.count("*").alias("cnt"))
    )


def q_union_dedup(spark, sf_dir):
    # U1: union + dedupe by natural key
    p = _t(spark, sf_dir, "part")
    a = p.filter(F.col("p_size") < 20).select("p_partkey", "p_brand")
    b = p.filter(F.col("p_retailprice") > 1000).select("p_partkey", "p_brand")
    return a.unionByName(b).dropDuplicates(["p_partkey"]).groupBy("p_brand").agg(
        F.count("*").alias("n_parts")
    )


def q_summary_counts(spark, sf_dir):
    # A5: per-graph summary counts (dictionary summary analog)
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    per_cust = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    items = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_items"))
    )
    return per_cust.join(items, "o_custkey", "left").select(
        F.col("o_custkey").alias("custkey"),
        "n_orders",
        F.coalesce("n_items", F.lit(0)).alias("n_items"),
    )


def q_pricing_summary(spark, sf_dir):
    # TPC-H Q1 shape; DECIMAL accumulation for cross-engine exactness
    li = _t(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_shipping_priority(spark, sf_dir):
    # TPC-H Q3 shape: 3-way join + agg + top-10 (join order left to
    # Catalyst; DECIMAL accumulation for cross-engine exactness)
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


def q_local_supplier_volume(spark, sf_dir):
    # TPC-H Q5 shape: 6-way join through region -> nation -> customer /
    # supplier colocation; small dims broadcast
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1995-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, (li["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]))
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


def q_sort_limit3(spark, sf_dir):
    # O5: ORDER BY ... LIMIT 3 with a total order (ties broken by id)
    return (
        _t(spark, sf_dir, "events")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .limit(3)
        .select("event_id", "event_type")
    )


def q_topk_per_group(spark, sf_dir):
    # O6: top-3 per group via window
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("rank").cast("bigint").alias("rank"),
            F.col("o_orderkey").alias("orderkey"),
        )
    )


# ----------------------------------------------------- search path (§3.3)

def q_similar_docs_topk(spark, sf_dir):
    return search.similar_docs_topk(_t(spark, sf_dir, "documents"), k=3)


def q_sentence_search(spark, sf_dir):
    return search.sentence_search(_t(spark, sf_dir, "documents"), k=10)


def q_highlight_terms(spark, sf_dir):
    return search.highlight_terms(_t(spark, sf_dir, "documents"))


def q_undirected_dedup(spark, sf_dir):
    return search.undirected_dedup(
        _t(spark, sf_dir, "lineitem"), "l_partkey", "l_suppkey"
    )


def q_brat_bio(spark, sf_dir):
    from .sources.brat import brat_bio, synth_brat_df

    return brat_bio(synth_brat_df(spark, 32), num_partitions=4)


def q_subtoken_align(spark, sf_dir):
    from .sources.brat import bio_to_subtokens, brat_bio, synth_brat_df

    return bio_to_subtokens(brat_bio(synth_brat_df(spark, 32), num_partitions=4))


# ------------------------------------------------------------- dedup family

def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


def q_minhash_lsh_pairs(spark, sf_dir):
    return dedup.minhash_lsh_candidates(_t(spark, sf_dir, "documents"))


def q_jaccard_pairs(spark, sf_dir):
    return dedup.jaccard_pairs(_t(spark, sf_dir, "documents"))


def q_salted_distinct_count(spark, sf_dir):
    # skew-safe countDistinct: two-phase salted aggregation, verified
    # against the naive SQL form (salting must not change the answer)
    from .operators.skew import salted_distinct_count

    return salted_distinct_count(
        _t(spark, sf_dir, "events"), ["event_type"], "user_id", n_salts=16,
        out="n_users",
    )


def q_entity_doc_freq(spark, sf_dir):
    from .operators.skew import entity_doc_frequency

    phrases = extract_phrases(_pages_for(spark, sf_dir), num_partitions=8)
    return entity_doc_frequency(phrases)


def q_near_dup_verified(spark, sf_dir):
    return dedup.near_dup_verified(_t(spark, sf_dir, "documents"), min_jaccard=0.3)


def q_graph_merge(spark, sf_dir):
    # dictionary-merge path (J1/J2/U1/U3): two graphs minted from disjoint
    # page ranges merged under the target graph id; rows-only check
    pages = _pages_for(spark, sf_dir)
    phrases = extract_phrases(pages, num_partitions=8)
    tgt_ph = phrases.filter(F.xxhash64("url") % 2 == 0)
    src_ph = phrases.filter(F.xxhash64("url") % 2 != 0)
    tgt_nodes = graph.mint_nodes(tgt_ph.withColumn("url", F.lit("target")))
    src_nodes = graph.mint_nodes(src_ph.withColumn("url", F.lit("source")))
    tgt_edges = spark.createDataFrame([], "graph_id string, src long, dst long, pred string")
    src_tri = emit_triples(src_ph, morphology_df(spark)).withColumn("url", F.lit("source"))
    src_edges = graph.mint_edges(src_tri, src_nodes)
    nodes, edges = graph.merge_graphs(
        tgt_nodes, tgt_edges, src_nodes, src_edges, "target"
    )
    return nodes.groupBy("graph_id").agg(
        F.count("*").alias("n_nodes"),
        F.countDistinct("text").alias("n_texts"),
    ).join(
        edges.groupBy("graph_id").agg(F.count("*").alias("n_edges")),
        "graph_id",
        "left",
    )


def q_simhash(spark, sf_dir):
    return dedup.simhash(_t(spark, sf_dir, "documents"))


def q_simhash_near_dup(spark, sf_dir):
    return dedup.simhash_near_dup_pairs(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------- similarity

def q_ann_cosine_topk(spark, sf_dir):
    return similarity.cosine_topk_bruteforce(_t(spark, sf_dir, "embeddings"), k=5)


def q_embedding_near_dup(spark, sf_dir):
    return similarity.near_dup_pairs_cosine(
        _t(spark, sf_dir, "embeddings"), min_cos=0.35
    )


def q_lsh_bucket_topk(spark, sf_dir):
    return similarity.lsh_bucket_topk(_t(spark, sf_dir, "embeddings"), k=5)


def q_ivf_topk(spark, sf_dir):
    return similarity.ivf_topk(_t(spark, sf_dir, "embeddings"), k=5)


# -------------------------------------------------------------- textquality

def q_token_count(spark, sf_dir):
    return textquality.token_count(_t(spark, sf_dir, "documents"))


def q_lang_id(spark, sf_dir):
    return textquality.lang_id(_t(spark, sf_dir, "documents"))


def q_quality_score(spark, sf_dir):
    return textquality.quality_score(_t(spark, sf_dir, "documents"))


def q_fingerprint(spark, sf_dir):
    return textquality.fingerprint(_t(spark, sf_dir, "documents"))


# ------------------------------------------------ KG pipeline (non-SQL ops)

def q_kg_extracted_text(spark, sf_dir):
    pages = _pages_for(spark, sf_dir)
    ext = extracted_text(pages)
    return ext.join(pages.select("url", "text"), "url").select(
        "url", (F.col("extracted") == F.col("text")).alias("byte_identical")
    )


def q_kg_phrases(spark, sf_dir):
    return extract_phrases(_pages_for(spark, sf_dir), num_partitions=8)


def q_kg_triples(spark, sf_dir):
    phrases = extract_phrases(_pages_for(spark, sf_dir), num_partitions=8)
    return emit_triples(phrases, morphology_df(spark))


def q_kg_links(spark, sf_dir):
    phrases = extract_phrases(_pages_for(spark, sf_dir), num_partitions=8)
    return link_mentions(phrases, alias_dict_df(spark))


def q_kg_canonical(spark, sf_dir):
    phrases = extract_phrases(_pages_for(spark, sf_dir), num_partitions=8)
    links = link_mentions(phrases, alias_dict_df(spark))
    return canonicalize(links.select("mention", "entity_id"))


def q_kg_nodes(spark, sf_dir):
    phrases = extract_phrases(_pages_for(spark, sf_dir), num_partitions=8)
    return graph.mint_nodes(phrases)


def q_multimodal_features(spark, sf_dir):
    return decode_features(synth_media_df(spark, 64), num_partitions=4)


def q_frame_sample(spark, sf_dir):
    return frame_sample(synth_media_df(spark, 64))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tf_counts": q_tf_counts,
    "tfidf_single_doc": q_tfidf_single_doc,
    "doc_freq_idf": q_doc_freq_idf,
    "topk_terms": q_topk_terms,
    "doc_stats": q_doc_stats,
    "sentence_split": q_sentence_split,
    "content_hash": q_content_hash,
    "date_format_tz": q_date_format_tz,
    "number_clamp": q_number_clamp,
    "json_extract": q_json_extract,
    "filter_project": q_filter_project,
    "join_natural_key": q_join_natural_key,
    "join_remap": q_join_remap,
    "semi_anti_fk": q_semi_anti_fk,
    "edge_diff": q_edge_diff,
    "union_dedup": q_union_dedup,
    "summary_counts": q_summary_counts,
    "pricing_summary": q_pricing_summary,
    "shipping_priority": q_shipping_priority,
    "local_supplier_volume": q_local_supplier_volume,
    "sort_limit3": q_sort_limit3,
    "topk_per_group": q_topk_per_group,
    "similar_docs_topk": q_similar_docs_topk,
    "sentence_search": q_sentence_search,
    "highlight_terms": q_highlight_terms,
    "undirected_dedup": q_undirected_dedup,
    "brat_bio": q_brat_bio,
    "subtoken_align": q_subtoken_align,
    "dedup_exact": q_dedup_exact,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "jaccard_pairs": q_jaccard_pairs,
    "salted_distinct_count": q_salted_distinct_count,
    "entity_doc_freq": q_entity_doc_freq,
    "near_dup_verified": q_near_dup_verified,
    "graph_merge": q_graph_merge,
    "simhash": q_simhash,
    "simhash_near_dup": q_simhash_near_dup,
    "ann_cosine_topk": q_ann_cosine_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "lsh_bucket_topk": q_lsh_bucket_topk,
    "ivf_topk": q_ivf_topk,
    "token_count": q_token_count,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "fingerprint": q_fingerprint,
    "kg_extracted_text": q_kg_extracted_text,
    "kg_phrases": q_kg_phrases,
    "kg_triples": q_kg_triples,
    "kg_links": q_kg_links,
    "kg_canonical": q_kg_canonical,
    "kg_nodes": q_kg_nodes,
    "multimodal_features": q_multimodal_features,
    "frame_sample": q_frame_sample,
}
