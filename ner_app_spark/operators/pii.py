"""PII detection and redaction — the stock curation stage between
quality filtering and dedup in a training-data pipeline.

Regex-class detection of the three ubiquitous lanes (email addresses,
international phone numbers, IPv4 addresses) as pure codegen
`regexp_extract_all` / `regexp_replace` expression work: no UDF, no
shuffle, embarrassingly parallel at any corpus size, and pushed into
the same scan as the rest of the quality signals.

The patterns deliberately contain NO backslash escapes or quotes
(`[.]`/`[+]` instead of `\\.`/`\\+`): Spark SQL string literals process
backslash escapes while DuckDB's do not, so a backslash-bearing pattern
would silently differ between the engine and its oracle — char-class
spellings are byte-identical on both (same device as
tfidf.TOKEN_SQL_RE).

This is detection of well-formed identifiers, not NER-grade PII
discovery: names/addresses need the transformer lane (operators/ner.py)
— the regex lanes are the cheap always-on gate a 100 TB pass can
afford.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: engine-portable (quote- and backslash-free) detection patterns
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PHONE_RE = "[+][0-9]{7,15}"
IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

#: (column suffix, pattern, redaction token) — detection and redaction
#: lanes stay in lockstep by construction
PII_LANES: tuple[tuple[str, str, str], ...] = (
    ("emails", EMAIL_RE, "[EMAIL]"),
    ("phones", PHONE_RE, "[PHONE]"),
    ("ips", IPV4_RE, "[IP]"),
)


def _count(pattern: str) -> Column:
    return (
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pattern), F.lit(0)))
        .cast("bigint")
    )


def pii_scan(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, has_pii): per-document match
    counts for each lane. One projection over the scan — the counts are
    computed in the same codegen stage as the read."""
    counts = [_count(pat).alias(f"n_{name}") for name, pat, _ in PII_LANES]
    return docs.select("doc_id", *counts).withColumn(
        "has_pii",
        sum(F.col(f"n_{name}") for name, _, _ in PII_LANES) > 0,
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Same frame with ``text_col`` rewritten: every lane match replaced
    by its redaction token ([EMAIL]/[PHONE]/[IP]), lanes applied in the
    fixed PII_LANES order (email first, so an address is never
    half-eaten by the phone lane). Spark regexp_replace is global by
    default; the DuckDB oracle passes the 'g' flag for the same
    semantics."""
    col = F.col(text_col)
    for _, pat, token in PII_LANES:
        col = F.regexp_replace(col, F.lit(pat), F.lit(token))
    return docs.withColumn(text_col, col)
