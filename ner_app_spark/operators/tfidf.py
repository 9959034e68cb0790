"""DataFrame-native TF-IDF operators (A1/A2/A3, O1) over a generic
``documents(doc_id, text)`` table.

The KG pipeline computes single-doc TF-IDF inside the mapInPandas batch
(per-doc local math, no shuffle — operators/extract.py). These are the
declarative equivalents, used when the corpus-level statistics genuinely
need a shuffle (multi-doc IDF, A3) and as the SQL-checkable variants for
the DuckDB oracle gate.

Semantics:
  * A1 term frequency:  /root/reference/src/analysis/tfidf.py:46-51
  * A2 single-doc score: count / sqrt(sum count^2) per doc (tfidf.py:47-53
    with n_docs=1: idf==1, l2 norm of raw counts)
  * A3 smooth idf:      ln((1+n)/(1+df)) + 1 (sklearn smooth_idf semantics
    used by tfidf.py:71-83)
  * O1 top-k:           window row_number over (-score, token)

Tokenization here is the portable SQL form (lowercase alnum runs >= 2
chars) so Spark and DuckDB agree byte-for-byte; the Russian-morphology
tokenizer lives in functions/text.py and is pinned by the Python oracle
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# identical semantics in Spark (Java regex) and DuckDB (RE2): explicit
# character classes only — no \w / \b (engine-dependent unicode behavior)
TOKEN_SQL_RE = "[a-z0-9]{2,}"


def tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, token) — one row per token occurrence."""
    return docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_SQL_RE}', 0)")
        ).alias("token"),
    )


def tf_counts(docs: DataFrame) -> DataFrame:
    """A1: per-doc raw term counts (hash agg => map-side partials free)."""
    return (
        tokens(docs)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_single_doc(docs: DataFrame) -> DataFrame:
    """A2: count / sqrt(sum count^2) within each doc (window over doc)."""
    tf = tf_counts(docs)
    w = Window.partitionBy("doc_id")
    return tf.withColumn(
        "tfidf", F.col("tf") / F.sqrt(F.sum(F.col("tf") * F.col("tf")).over(w))
    )


def doc_freq_idf(docs: DataFrame) -> DataFrame:
    """A3: smooth idf per token over the corpus, rounded to 6 (libm ln may
    differ by 1 ulp across engines)."""
    n_docs = docs.select(F.countDistinct("doc_id")).collect()[0][0]
    df = (
        tokens(docs)
        .groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    return df.withColumn(
        "idf",
        F.round(
            F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df")))
            + F.lit(1.0),
            6,
        ),
    )


def top_k_terms(docs: DataFrame, k: int = 10) -> DataFrame:
    """O1: per-doc top-k by (-tfidf, token) — the deterministic total
    order SURVEY.md pins for the reference's unstable argsort."""
    scored = tfidf_single_doc(docs)
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "tfidf", F.col("rank").cast("bigint").alias("rank"))
    )


def doc_stats(docs: DataFrame) -> DataFrame:
    """A4 analog: total tokens + distinct tokens per doc."""
    return (
        tokens(docs)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("total_tokens"),
            F.countDistinct("token").alias("unique_tokens"),
        )
    )
