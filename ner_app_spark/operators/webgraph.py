"""Host-level web link graph over Common-Crawl-style pages.

The input table (BASELINE.json ``input_hint``) is web pages with raw
``html`` — at Common-Crawl scale the hyperlink structure is itself a
first-class KG signal: host-level edges drive crawl prioritisation,
spam/host-quality scoring, and the canonical importance prior
(PageRank over the host graph) that a curation pipeline joins onto
per-document quality scores. The reference app has no crawl surface
(it analyzes one pasted document, /root/reference/src/routers/views.py);
this module is part of the beyond-reference web-scale layer, like
operators/graphalgo.py.

Everything here is pure codegen expression work over the page scan —
``regexp_extract_all`` for anchor hrefs, ``regexp_extract`` for hosts,
one partial-agg shuffle for the edge weights. No UDF, no Python row
path: at 10^12 pages the link extraction is a map-local pass fused into
whatever else reads the scan (WholeStageCodegen), and the only exchange
is the (src, dst) aggregation whose key space is hosts^2 (tiny relative
to pages — ~10^8 edges for 10^6 hosts), so the agg is partial-map-side
and the shuffled volume is the *edge* table, not the page table.

Both regexes are backslash- and single-quote-free so the DuckDB oracle
replays them verbatim (oracles._HOST_EDGE_CTES; same portability rule
as operators/pii.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: absolute http(s) anchor targets; relative links (nav boilerplate) are
#: intentionally out of scope for the HOST graph
HREF_RE = '<a href="(https?://[^"]+)"'
HOST_RE = "https?://([^/]+)"


def page_links(pages: DataFrame) -> DataFrame:
    """(src_url, href): one row per absolute hyperlink on each page.

    The html column decodes as UTF-8 (cast binary->string); non-HTML
    payloads (the text/plain lane) simply match no anchors and drop out
    at the explode — no branch needed.
    """
    return pages.select(
        F.col("url").alias("src_url"),
        F.explode(
            F.expr(
                f"regexp_extract_all(cast(html as string), '{HREF_RE}', 1)"
            )
        ).alias("href"),
    )


def host_edges(pages: DataFrame) -> DataFrame:
    """(src, dst, n_links): the weighted host-level link graph.

    Self-host edges are dropped (intra-site navigation is not an
    endorsement signal); multi-links between the same host pair keep
    their multiplicity in ``n_links``.
    """
    links = page_links(pages)
    return (
        links.select(
            F.regexp_extract("src_url", HOST_RE, 1).alias("src"),
            F.regexp_extract("href", HOST_RE, 1).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_links"))
    )


def host_pagerank(pages: DataFrame, iters: int = 6, **kw) -> DataFrame:
    """(host, rank_scaled, rank): directed integer fixed-point PageRank
    over the host link graph — the crawl-importance prior. Direction is
    kept (rank flows linker -> linked); see graphalgo.pagerank
    ``directed=True`` for the pinned dangling-mass semantics."""
    from . import graphalgo

    ranks = graphalgo.pagerank(
        host_edges(pages).select("src", "dst"),
        iters=iters,
        directed=True,
        **kw,
    )
    return ranks.withColumnRenamed("entity", "host")
