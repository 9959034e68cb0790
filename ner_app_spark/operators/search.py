"""Similarity-search retrieval path (reference GET /search, SURVEY.md §3.3).

Re-expresses the reference's two-stage ranked retrieval as inverted-index
joins instead of driver-side CSR matrices:

  * J6 sparse cosine "join": /root/reference/src/analysis/tfidf.py:58-90
    (``search_phrases_with_tfidf``) — fit TF-IDF over [doc texts..., query],
    cosine(query, doc), top-k with sim > 0.  Here: explode both sides to
    (token, weight), inner equi-join on token, sum of products, divide by
    l2 norms — never materializing a vocabulary-wide vector.
  * A3 smooth idf: ln((1+n)/(1+df)) + 1 over the corpus INCLUDING the
    query document (sklearn fit over texts+[query], tfidf.py:77).
  * O6 top-k: rank on (rounded cosine desc, doc_id asc) — rounding first
    makes the order identical across engines' float summation orders.
  * J7 containment filter: /root/reference/src/analysis/tfidf.py:100-123 —
    a candidate sentence survives only if it contains the full query
    (lemma-ngram containment in the reference; token AND-containment in
    the portable SQL form).
  * F8 highlight: /root/reference/src/analysis/utils.py:27-58 — wrap query
    terms in <strong> (static alternation here; the dynamic per-row
    variant needs a pUDF and is presentation-tier).

Scale notes (100 TB): the query side is one row — Catalyst broadcasts it,
so the cosine join is a broadcast hash join against the exploded posting
list; the only shuffle is the groupBy(doc_id) partial-aggregated sum.
df/idf is a corpus-wide statistic: at web scale it would be computed once
per corpus snapshot and broadcast as a dimension, exactly like the
morphology table (SURVEY.md §4 item 3).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .tfidf import TOKEN_SQL_RE, tokens

#: deterministic benchmark/parity query (tokens frequent in the synthetic
#: documents corpus — see TESTDATA.md)
SEARCH_QUERY = "hash join fast table scan"

QUERY_DOC_ID = -1


def query_tokens(query: str = SEARCH_QUERY) -> list[str]:
    return re.findall("[a-z0-9]{2,}", query.lower())


def _tf(docs_and_query: DataFrame) -> DataFrame:
    return (
        tokens(docs_and_query)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )


def similar_docs_topk(
    docs: DataFrame, query: str = SEARCH_QUERY, k: int = 3
) -> DataFrame:
    """(doc_id, rank, cos): top-k documents by TF-IDF cosine to the query.

    The query is appended to the corpus as doc_id=-1 before fitting (the
    reference fits the vectorizer over texts + [query]); idf is rounded
    to 6 before weighting and the cosine to 6 before ranking so Spark and
    DuckDB produce bit-identical orderings.
    """
    from ..session import local_df

    spark = docs.sparkSession
    qdf = local_df(spark, [(QUERY_DOC_ID, query)], "doc_id long, text string")
    corpus = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text").unionByName(qdf)

    tf = _tf(corpus)
    n_docs = corpus.select(F.countDistinct("doc_id")).collect()[0][0]
    df_idf = (
        tf.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .withColumn(
            "idf",
            F.round(
                F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df")))
                + F.lit(1.0),
                6,
            ),
        )
        .select("token", "idf")
    )
    w = tf.join(df_idf, "token").withColumn("w", F.col("tf") * F.col("idf"))
    norm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nm"))
    wn = w.join(norm, "doc_id").select(
        "doc_id", "token", (F.col("w") / F.col("nm")).alias("wn")
    )

    q = wn.filter(F.col("doc_id") == QUERY_DOC_ID).select(
        "token", F.col("wn").alias("qw")
    )
    d = wn.filter(F.col("doc_id") != QUERY_DOC_ID)
    cos = (
        d.join(F.broadcast(q), "token")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("wn") * F.col("qw")), 6).alias("cos"))
        .filter(F.col("cos") > 0)
    )
    rank_w = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    return (
        cos.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("doc_id", F.col("rank").cast("bigint").alias("rank"), "cos")
    )


def sentence_search(
    docs: DataFrame, query: str = SEARCH_QUERY, k: int = 10
) -> DataFrame:
    """(doc_id, sent_id, score, rank): sentences containing EVERY query
    token (J7 AND-containment), scored by query-term density (occurrences
    of query tokens / sentence length), global top-k.

    Sentence split = F6 (``(?<=[.!?])\\s+``); on a punctuation-free corpus
    each document degenerates to one sentence, which is fine — the plan
    shape (split -> explode -> posting join -> rank) is what carries to
    real corpora.
    """
    qtoks = query_tokens(query)
    sent = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.posexplode(
                F.split(F.regexp_replace("text", "([.!?])\\s+", "$1\n"), "\n")
            ).alias("sent_id", "sentence"),
        )
        .withColumn("sentence", F.trim("sentence"))
        .filter(F.col("sentence") != "")
        .withColumn("sent_id", F.col("sent_id").cast("bigint"))
        .withColumn(
            "toks",
            F.expr(f"regexp_extract_all(lower(sentence), '{TOKEN_SQL_RE}', 0)"),
        )
    )
    contains_all = None
    for t in sorted(set(qtoks)):
        cond = F.array_contains("toks", t)
        contains_all = cond if contains_all is None else (contains_all & cond)
    in_list = ", ".join(f"'{t}'" for t in sorted(set(qtoks)))
    hits = F.expr(f"size(filter(toks, x -> x IN ({in_list})))")
    scored = (
        sent.filter(contains_all)
        .withColumn("n_hits", hits.cast("bigint"))
        .withColumn(
            "score", F.round(F.col("n_hits") / F.size("toks"), 6)
        )
    )
    rank_w = Window.orderBy(F.desc("score"), F.asc("doc_id"), F.asc("sent_id"))
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "sent_id", "score", F.col("rank").cast("bigint").alias("rank"))
    )


def highlight_terms(docs: DataFrame, query: str = SEARCH_QUERY) -> DataFrame:
    """F8: wrap each query term occurring in the text in <strong> tags
    (static alternation over lowercased text; the reference builds the
    alternation per row from surface forms, utils.py:36-52)."""
    # \b is the ASCII word boundary in BOTH Java regex and RE2 — the only
    # portable boundary form (RE2 has no lookaround)
    alt = "|".join(sorted(set(query_tokens(query))))
    pat = f"\\b({alt})\\b"
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.regexp_replace(F.lower("text"), pat, "<strong>$1</strong>").alias(
            "highlighted"
        ),
    )


def undirected_dedup(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """U4: collapse directed duplicates to undirected edges keyed by
    (least, greatest) — reference client-side uniqueness check
    (public/js/dictionary.js:167-175) as a distributed groupBy."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("multiplicity"))
    )
