"""Triple emission (SURVEY.md §2.28): phrases -> (url, subj, pred, obj).

Two rule families, both deterministic and pinned by the oracle goldens:
  1. Intra-phrase dependency-pattern relations: the rightmost-NOUN word is
     the head (/root/reference/src/analysis/phrase_extractor.py:73-83
     head-noun rule); every other word emits
     (head_noun, pattern_type, word).
  2. Synonym chains: distinct phrases sharing a head noun within a doc,
     sorted, consecutive pairs emit (a, 'synonym', b) — the reference's
     term<->term connection labeling (templates/search.html.jinja).

Plan shape: posexplode + broadcast morphology join (map-side, no
shuffle) -> window keyed by (url, phrase) / (url, head_noun). With the
extract stage already hash-partitioned on url, these windows cluster on
a superset of the existing keys, so Catalyst needs only local sorts —
no extra full shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_pos(df: DataFrame, morph: DataFrame, word_col: str) -> DataFrame:
    """Attach OpenCorpora POS for a lemma word column; hyphenated
    compounds fall back to their last part (provider contract,
    ner_app_spark.morphology.pos_of)."""
    direct = morph.select(
        F.col("surface").alias("__w"), F.col("pos").alias("__pos_direct")
    )
    last = morph.select(
        F.col("surface").alias("__wl"), F.col("pos").alias("__pos_last")
    )
    out = (
        df.join(F.broadcast(direct), F.col(word_col) == F.col("__w"), "left")
        .withColumn("__last_part", F.element_at(F.split(F.col(word_col), "-"), -1))
        .join(
            F.broadcast(last),
            (F.col("__pos_direct").isNull())
            & F.col(word_col).contains("-")
            & (F.col("__last_part") == F.col("__wl")),
            "left",
        )
        .withColumn("pos_tag", F.coalesce("__pos_direct", "__pos_last"))
        .drop("__w", "__wl", "__last_part", "__pos_direct", "__pos_last")
    )
    return out


def intra_phrase_triples(phrases: DataFrame, morph: DataFrame) -> DataFrame:
    multi = phrases.filter((F.col("length") >= 2) & (F.col("head_noun") != "")).select(
        "url",
        "phrase",
        "type",
        "head_noun",
        F.posexplode(F.split("phrase", " ")).alias("widx", "word"),
    )
    tagged = _with_pos(multi, morph, "word")
    w = Window.partitionBy("url", "phrase")
    tagged = tagged.withColumn(
        "head_idx",
        F.max(F.when(F.col("pos_tag") == "NOUN", F.col("widx"))).over(w),
    )
    return (
        tagged.filter(F.col("widx") != F.col("head_idx"))
        .select(
            "url",
            F.col("head_noun").alias("subj"),
            F.col("type").alias("pred"),
            F.col("word").alias("obj"),
        )
        .distinct()
    )


def synonym_triples(phrases: DataFrame) -> DataFrame:
    heads = (
        phrases.filter(F.col("head_noun") != "")
        .select("url", "head_noun", "phrase")
        .distinct()
    )
    w = Window.partitionBy("url", "head_noun").orderBy("phrase")
    return (
        heads.withColumn("__next", F.lead("phrase").over(w))
        .filter(F.col("__next").isNotNull())
        .select(
            "url",
            F.col("phrase").alias("subj"),
            F.lit("synonym").alias("pred"),
            F.col("__next").alias("obj"),
        )
    )


def emit_triples(phrases: DataFrame, morph: DataFrame) -> DataFrame:
    """Full §2.28 spec: union of both families.

    No outer distinct: each family is internally de-duplicated and the
    two can never collide — intra-phrase preds are POS pattern types
    while synonym-chain preds are the literal 'synonym', and
    synonym_triples emits (phrase, phrase) pairs with distinct lead
    semantics. Dropping the outer distinct removes a full extra shuffle
    of the whole triple set (the single biggest shuffle in the
    pipeline at scale)."""
    return intra_phrase_triples(phrases, morph).unionByName(synonym_triples(phrases))


def triple_support(triples: DataFrame, n_salts: int = 16) -> DataFrame:
    """(subj, pred, obj, n_docs, n_hosts): evidence aggregation over the
    emitted triple table — in how many documents, and on how many
    distinct HOSTS, each distinct triple was observed. This is the
    confidence signal KG construction ranks and prunes assertions by: a
    triple seen on many independent hosts is knowledge; a triple seen
    10^6 times on one host is boilerplate.

    Shapes, at 10^12-document scale:

    * ``n_docs`` is a plain COUNT(*): emit_triples produces one row per
      (url, subj, pred, obj) by construction (each family de-duplicates
      per document and the two families cannot collide — see
      emit_triples), so the row count per triple IS the document count,
      with no second distinct pass. The oracle recomputes it over its
      own DISTINCT set, so any drift in that invariant hash-mismatches
      (red-capable).
    * ``n_hosts`` is the head-entity skew case the pipeline is built
      around: popular entities concentrate enormous evidence sets on
      few triple keys, so the distinct-host count runs through the
      two-phase salted distinct (operators/skew.py — salt is a function
      of the host, each distinct host counted exactly once), the same
      device the anchor miner and crawl frontier use.

    Reference scope: the reference ranks phrases per document
    (/root/reference/src/analysis/tfidf.py) and has no cross-document
    corpus; corpus-level triple confidence is part of the web-scale
    layer, like operators/webgraph.py.
    """
    from .skew import salted_distinct_count
    from .webgraph import HOST_RE

    ev = triples.select(
        "subj",
        "pred",
        "obj",
        F.regexp_extract("url", HOST_RE, 1).alias("host"),
    )
    agg = salted_distinct_count(
        ev,
        ["subj", "pred", "obj"],
        "host",
        n_salts=n_salts,
        out="n_hosts",
        count_out="n_docs",
    )
    return agg.select(
        "subj",
        "pred",
        "obj",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_hosts").cast("long").alias("n_hosts"),
    )
