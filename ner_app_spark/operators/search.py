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
    a top-k candidate sentence survives only if its lemma n-gram list
    contains ``bound_lemma_analyzer(query)[-1]`` — the LAST generated
    n-gram, i.e. the query's trailing ``max_n``-gram (for a >=3-token
    query: its final trigram), contiguously. Filter runs AFTER top-k
    selection, exactly as the reference iterates ``top_indices``.
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

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .tfidf import TOKEN_SQL_RE, tokens

#: deterministic benchmark/parity query (tokens frequent in the synthetic
#: documents corpus — see TESTDATA.md)
SEARCH_QUERY = "hash join fast table scan"

#: sentence-search query: its trailing trigram ("agg hash window") occurs
#: contiguously in the corpus, so the J7 containment filter (which keeps
#: only top-k sentences containing that trigram) returns survivors
SENT_QUERY = "table agg hash window"

QUERY_DOC_ID = -1


def query_tokens(query: str = SEARCH_QUERY) -> list[str]:
    # ascii + cyrillic word tokens (the reference handles Russian text);
    # the parity queries are ascii so the DuckDB side is unaffected
    return re.findall("[a-z0-9а-яё]{2,}", query.lower())


def with_rank(topk: DataFrame, keys: list[tuple[str, bool]], out: str = "rank") -> DataFrame:
    """Attach ``rank`` (1-based position under the lexicographic order
    ``keys`` = [(column, descending)]) WITHOUT a Window node:
    rank = 1 + |rows sorting strictly before|, via a broadcast
    nested-loop self-join over the already-``limit(k)``-ed rows.

    Why not ``row_number()``: a global rank needs a partition-less
    Window, which funnels everything into one task (fatal at scale), and
    Catalyst constant-folds a ``partitionBy(lit(1))`` dodge right back
    into the partition-less form. Post-limit the input is <= k rows, so
    the O(k^2) comparison join is trivial and the plan stays
    TakeOrderedAndProject + BroadcastNestedLoopJoin — no Window, no
    single-partition exchange, deterministic under a total order."""
    right = topk.select(
        *[F.col(c).alias(f"__r_{c}") for c, _ in keys]
    )
    strictly_before = None
    eq_prefix = None
    for c, desc in keys:
        lt = (
            (F.col(f"__r_{c}") > F.col(c)) if desc else (F.col(f"__r_{c}") < F.col(c))
        )
        term = lt if eq_prefix is None else (eq_prefix & lt)
        strictly_before = term if strictly_before is None else (strictly_before | term)
        eq = F.col(f"__r_{c}") == F.col(c)
        eq_prefix = eq if eq_prefix is None else (eq_prefix & eq)
    first_r = f"__r_{keys[0][0]}"
    return (
        topk.join(F.broadcast(right), strictly_before, "left")
        .groupBy(*topk.columns)
        .agg((F.count(F.col(first_r)) + F.lit(1)).cast("bigint").alias(out))
    )


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
    # corpus size as a broadcast scalar subframe: the whole query stays
    # LAZY (no construction-time action — round-2 ADVICE #5 pattern); at
    # web scale this is the corpus-snapshot statistic computed once and
    # broadcast like the morphology dim
    n_docs = corpus.agg(
        F.countDistinct("doc_id").cast("double").alias("__n")
    )
    df_idf = (
        tf.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf",
            F.round(
                F.log((F.lit(1.0) + F.col("__n")) / (F.lit(1.0) + F.col("df")))
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
    # global top-k as orderBy().limit(k): plans as TakeOrderedAndProject
    # (map-side partial top-k, no single-partition funnel of the full
    # candidate set); rank attached join-wise over the <= k survivors
    # (with_rank) so no partition-less WindowExec exists anywhere in the
    # plan (asserted in tests/test_plans.py)
    topk = cos.orderBy(F.desc("cos"), F.asc("doc_id")).limit(k)
    return with_rank(topk, [("cos", True), ("doc_id", False)]).select(
        "doc_id", "rank", "cos"
    )


def _explode_ngrams(
    sent: DataFrame, toks_col: str, max_n: int, keys: list[str]
) -> DataFrame:
    """(keys..., g): surface word 1..max_n-grams from a token array —
    sklearn ``ngram_range=(1, max_n)`` over the default tokenizer's
    output. Formulated as posexplode + positional array access +
    concat_ws so the whole stage is whole-stage-codegen'd; the earlier
    ``transform(sequence(...))`` higher-order form ran on the interpreted
    expression path (~2.3x slower, BENCH.md platform probes; round-2
    VERDICT #9)."""
    pos = sent.select(
        *keys, F.col(toks_col).alias("__t"), F.posexplode(toks_col).alias("__i", "__w")
    )
    cands = [
        F.when(
            F.col("__i") + n <= F.size("__t"),
            F.concat_ws(
                " ", *[F.get("__t", F.col("__i") + j) for j in range(n)]
            ),
        )
        for n in range(1, max_n + 1)
    ]
    return (
        pos.select(*keys, F.explode(F.array(*cands)).alias("g"))
        .filter(F.col("g").isNotNull())
    )


def sentence_search(
    docs: DataFrame, query: str = SENT_QUERY, k: int = 10, max_n: int = 3
) -> DataFrame:
    """(doc_id, sent_id, cos, rank): the reference's §3.3 sentence
    retrieval (``search_sentences_in_text_with_tfidf``,
    /root/reference/src/analysis/tfidf.py:93-131), distributed:

      1. sentence split (F6), corpus = all sentences + the query appended
         as one extra document (``fit_transform(sentences + [query])``);
      2. featurization over SURFACE-form word 1..3-grams (sklearn default
         tokenizer — lowercased word runs >= 2 chars — NOT the lemma
         analyzer phrase search uses: a deliberate reference asymmetry);
      3. smooth-idf l2-normalized TF-IDF cosine(query, sentence), global
         top-k by (cos desc, doc_id, sent_id) — expressed as
         orderBy().limit(k) (TakeOrderedAndProject, no global window);
      4. J7 containment filter AFTER top-k: a ranked sentence survives
         only if it contains the query's trailing ``max_n``-gram
         contiguously (``bound_lemma_analyzer(query)[-1]``,
         tfidf.py:101,121-123).

    Scale: the idf/norm aggregations shuffle (sentence, ngram) rows once;
    the query side is one sentence — broadcast; the only global structure
    is the top-k, which is a partial-top-k reduction, not a sort.
    """
    qtoks = query_tokens(query)
    spark = docs.sparkSession
    out_schema = "doc_id long, sent_id long, cos double, rank bigint"
    if not qtoks:
        # punctuation-only / non-tokenizable query: empty result, stable
        # schema (never a None filter — see round-1 ADVICE)
        return spark.createDataFrame([], out_schema)
    from ..session import local_df

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
        .unionByName(
            local_df(
                spark,
                [(QUERY_DOC_ID, QUERY_DOC_ID, query)],
                "doc_id long, sent_id long, sentence string",
            )
        )
        .withColumn(
            "toks",
            F.expr(f"regexp_extract_all(lower(sentence), '{TOKEN_SQL_RE}', 0)"),
        )
    )
    grams = _explode_ngrams(sent, "toks", max_n, keys=["doc_id", "sent_id"])
    tf = grams.groupBy("doc_id", "sent_id", "g").agg(F.count("*").alias("tf"))
    # sentence count (incl. the query doc) as a broadcast scalar subframe —
    # keeps the whole query lazy (no construction-time count job; round-2
    # ADVICE #5): explain()/plan audits no longer execute a sentence scan
    n_docs = sent.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    idf = (
        tf.groupBy("g")
        .agg(F.count("*").alias("df"))  # tf rows are distinct per sentence
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf",
            F.round(
                F.log((F.lit(1.0) + F.col("__n")) / (F.lit(1.0) + F.col("df")))
                + F.lit(1.0),
                6,
            ),
        )
        .select("g", "idf")
    )
    w = tf.join(idf, "g").withColumn("w", F.col("tf") * F.col("idf"))
    nm = w.groupBy("doc_id", "sent_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nm")
    )
    wn = w.join(nm, ["doc_id", "sent_id"]).select(
        "doc_id", "sent_id", "g", (F.col("w") / F.col("nm")).alias("wn")
    )
    q = wn.filter(F.col("doc_id") == QUERY_DOC_ID).select(
        "g", F.col("wn").alias("qw")
    )
    cos = (
        wn.filter(F.col("doc_id") != QUERY_DOC_ID)
        .join(F.broadcast(q), "g")
        .groupBy("doc_id", "sent_id")
        .agg(F.round(F.sum(F.col("wn") * F.col("qw")), 6).alias("cos"))
    )
    topk = cos.orderBy(F.desc("cos"), F.asc("doc_id"), F.asc("sent_id")).limit(k)
    ranked = with_rank(
        topk, [("cos", True), ("doc_id", False), ("sent_id", False)]
    ).select("doc_id", "sent_id", "cos", "rank")
    # J7: trailing max_n-gram containment, checked contiguously on the
    # token stream (equivalent to membership in the sentence's n-gram list)
    tail = " ".join(qtoks[-max_n:])
    has = sent.filter(F.col("doc_id") != QUERY_DOC_ID).select(
        "doc_id",
        "sent_id",
        (
            F.instr(
                F.concat(F.lit(" "), F.concat_ws(" ", F.col("toks")), F.lit(" ")),
                f" {tail} ",
            )
            > 0
        ).alias("has_tail"),
    )
    return (
        ranked.join(has, ["doc_id", "sent_id"])
        .filter(F.col("has_tail"))
        .select("doc_id", "sent_id", "cos", "rank")
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


def highlight_phrase_in_sentence(sentence: str, lemma_phrase: str) -> str:
    """F8, FULL per-row semantics (/root/reference/src/analysis/
    utils.py:27-58): for every word of the lemmatized phrase, collect the
    surface forms present in THIS sentence whose lemma matches (falling
    back to the lemma itself), build an alternation regex joined by
    ``[\\s\\-,;:]+``, and wrap whole-phrase matches in <strong>
    (case-insensitive). Alternation order pinned sorted (the reference
    iterates a set — impl-defined)."""
    from .. import morphology as M

    words = re.findall(r"\w+", sentence)
    parts = []
    for lw in lemma_phrase.split():
        forms = {w for w in words if M.lemma_of(w) == lw}
        if not forms:
            forms = {lw}
        parts.append("(?:" + "|".join(re.escape(f) for f in sorted(forms)) + ")")
    pat = r"(\b" + r"[\s\-,;:]+".join(parts) + r"\b)"
    return re.sub(pat, r"<strong>\1</strong>", sentence, flags=re.IGNORECASE)


def highlight_dynamic(
    df: DataFrame, sentence_col: str = "sentence", phrase_col: str = "phrase"
) -> DataFrame:
    """Per-row dynamic highlight as an Arrow-vectorized pandas UDF — the
    pattern is built from each row's own (sentence, phrase) pair, which
    ``regexp_replace`` cannot express (static pattern only). Presentation
    tier: runs after retrieval on the top-k survivors, so the per-row
    Python regex cost is bounded by k, not corpus size."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def hl(sent: pd.Series, phr: pd.Series) -> pd.Series:
        return pd.Series(
            [
                highlight_phrase_in_sentence(s, p) if s is not None else None
                for s, p in zip(sent, phr)
            ],
            index=sent.index,
        )

    return df.withColumn("highlighted", hl(F.col(sentence_col), F.col(phrase_col)))


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
