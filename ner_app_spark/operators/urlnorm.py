"""URL canonicalization: the crawl-side dedup key.

At Common-Crawl scale the same page arrives under many url spellings —
fragments, default ports, ``www.`` aliases, tracking params, case-mixed
hosts, trailing slashes. Canonicalizing BEFORE content dedup collapses
the cheap duplicates with pure string work (no shingles, no shuffle of
text), so the expensive near-dup passes see each page once.

Everything is a single whole-stage-codegen projection: ``regexp_replace``
/ ``regexp_extract`` / ``replace`` chains. Portability rules (same as
operators/pii.py): patterns are backslash- and single-quote-free, and —
additionally for THIS module — contain NO capture-group references in
replacements (Spark spells them ``$1``, DuckDB ``\\1``; a chain that
needs backrefs cannot be replayed verbatim), so each step is either a
plain ``replace`` or a group-free ``regexp_replace``. The DuckDB oracle
runs the identical chain through its own regex engine.

Normalization steps (order matters; applied exactly as listed):
  1. drop the fragment            (``#.*`` -> '')
  2. drop default ports           (``:80/``->``/``, ``:443/``->``/``,
                                   then ``:80$`` / ``:443$`` -> '')
  3. lowercase scheme and host    (path/query stay case-sensitive)
  4. drop a leading ``www.``      (host-alias collapse)
  5. drop ``utm_*`` tracking params (mid-query then trailing, then
                                   repair a dangling ``?``/``&``)
  6. drop trailing slashes        (``/+$`` -> '')
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (?i) — the one inline flag both engines' regex dialects (Java util.regex
#: in Spark, RE2 in DuckDB) spell identically; schemes/hosts arrive in any
#: case and must match before step 3 lowercases them
_SCHEME_RE = "(?i)(https?)://"
_HOST_RE = "(?i)https?://([^/?#]+)"
_TAIL_RE = "(?i)https?://[^/?#]+([/?#].*)"


def canonical_url(url: Column | str) -> Column:
    """Codegen expression computing the canonical form of ``url``."""
    u = F.col(url) if isinstance(url, str) else url
    # 1. fragment
    u = F.regexp_replace(u, "#.*", "")
    # 2. default ports (plain replaces + group-free anchors)
    u = F.replace(u, F.lit(":80/"), F.lit("/"))
    u = F.replace(u, F.lit(":443/"), F.lit("/"))
    u = F.regexp_replace(u, ":80$", "")
    u = F.regexp_replace(u, ":443$", "")
    # 3. lowercase scheme+host, reassemble with the case-sensitive tail
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    tail = F.regexp_extract(u, _TAIL_RE, 1)
    u = F.concat(scheme, F.lit("://"), host, tail)
    # 4. www. alias — (www.)+ so stacked prefixes (www.www.host) collapse
    #    in ONE pass and canonicalization stays idempotent (a crawl
    #    frontier re-canonicalizes already-canonical urls constantly);
    #    the pattern has a group but the replacement is group-free, which
    #    is what the portability rule requires
    u = F.regexp_replace(u, "://(www[.])+", "://")
    # 5. utm_* params: mid-query (keep the separator that FOLLOWS), then
    #    trailing, then a dangling '?' left by an utm-only query
    u = F.regexp_replace(u, "utm_[a-z]+=[^&#]*&", "")
    u = F.regexp_replace(u, "[?&]utm_[a-z]+=[^&#]*$", "")
    u = F.regexp_replace(u, "[?]$", "")
    # 6. trailing slashes
    u = F.regexp_replace(u, "/+$", "")
    return u


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, url_canon, n_variants, is_canonical_rep): every input url
    with its canonical form, how many distinct raw spellings share that
    form, and whether this row is the group's representative (minimum
    raw spelling — the keeper a crawl frontier would store).

    One codegen projection + one partial-agg shuffle on url_canon (the
    group table is |distinct canon| rows, joined back broadcast-or-hash
    by size); no text columns move."""
    canon = df.select(F.col(url_col).alias("url")).distinct().select(
        "url", canonical_url("url").alias("url_canon")
    )
    groups = canon.groupBy("url_canon").agg(
        F.count("*").alias("n_variants"), F.min("url").alias("rep")
    )
    return canon.join(groups, "url_canon").select(
        "url",
        "url_canon",
        F.col("n_variants").cast("long").alias("n_variants"),
        (F.col("url") == F.col("rep")).alias("is_canonical_rep"),
    )
