"""Host-level web link graph (operators/webgraph.py): link extraction
from raw html, self-host filtering, and directed PageRank semantics —
the structural invariants the sf0.01 DuckDB parity rows
(host_link_edges / host_pagerank) cannot express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ner_app_spark.operators import graphalgo, webgraph
from ner_app_spark.sources.pages import synth_pages_df
from ner_app_spark.synth import page_outlinks, synth_pages


def _pages(spark, n=60):
    return synth_pages_df(spark, n)


def test_page_links_absolute_only(spark):
    links = webgraph.page_links(_pages(spark)).collect()
    assert links, "synth pages must carry absolute outlinks"
    for r in links:
        # relative nav links (/, /about) never surface in the host graph
        assert r["href"].startswith("https://site")


def test_page_links_match_synth_generator(spark):
    """The extractor recovers EXACTLY the deterministic outlinks the
    synthesizer authored for each html page (text/plain pages: none)."""
    got: dict[str, list[str]] = {}
    for r in webgraph.page_links(_pages(spark, 60)).collect():
        got.setdefault(r["src_url"], []).append(r["href"])
    expected = {}
    for i, p in enumerate(synth_pages(60)):
        if bytes(p["html"]).startswith(b"<html"):
            expected[p["url"]] = page_outlinks(i)
    assert {u: sorted(v) for u, v in got.items()} == {
        u: sorted(v) for u, v in expected.items()
    }


def test_host_edges_no_self_loops_and_weights(spark):
    edges = webgraph.host_edges(_pages(spark, 60)).collect()
    assert edges
    for r in edges:
        assert r["src"] != r["dst"]
        assert r["n_links"] >= 1
    # hub skew: site0-site4 must collect the hub edge per page
    indeg = {}
    for r in edges:
        indeg[r["dst"]] = indeg.get(r["dst"], 0) + r["n_links"]
    hubs = sum(v for h, v in indeg.items() if h in {f"site{k}.example" for k in range(5)})
    assert hubs >= len(indeg)  # hubs dominate the tail


def test_host_edges_plan_is_pure_codegen(spark):
    plan = webgraph.host_edges(_pages(spark, 60))._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "lambdafunction"):
        assert bad not in plan


def test_directed_pagerank_mass_flows_one_way(spark):
    # a -> b -> c chain: directed rank must strictly increase downstream,
    # and the dangling sink c must still be in the node set
    e = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    pr = {r["entity"]: r["rank_scaled"]
          for r in graphalgo.pagerank(e, iters=6, directed=True).collect()}
    assert set(pr) == {"a", "b", "c"}
    assert pr["a"] < pr["b"] < pr["c"]


def test_directed_pagerank_dedups_multi_edges_and_self_loops(spark):
    e1 = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "a"), ("b", "c")],
        "src string, dst string",
    )
    e2 = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    r1 = sorted(map(tuple, graphalgo.pagerank(e1, iters=4, directed=True)
                    .select("entity", "rank_scaled").collect()))
    r2 = sorted(map(tuple, graphalgo.pagerank(e2, iters=4, directed=True)
                    .select("entity", "rank_scaled").collect()))
    assert r1 == r2


def test_directed_pagerank_empty_edges(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert graphalgo.pagerank(e, iters=3, directed=True).count() == 0


def test_host_pagerank_hubs_outrank_tail(spark):
    ranks = {r["host"]: r["rank_scaled"]
             for r in webgraph.host_pagerank(_pages(spark, 100), iters=6).collect()}
    hubs = [v for h, v in ranks.items()
            if h in {f"site{k}.example" for k in range(5)}]
    tail = [v for h, v in ranks.items()
            if h not in {f"site{k}.example" for k in range(5)}]
    # hubs dominate on average and hold the global top spot (strict
    # min(hub) > max(tail) does NOT hold: a tail host fed by a hub's
    # stride link legitimately outranks the weakest hub)
    assert sum(hubs) / len(hubs) > 2 * sum(tail) / len(tail)
    assert max(ranks.values()) in hubs


def test_host_pagerank_deterministic_across_parallelism(spark):
    a = webgraph.host_pagerank(_pages(spark, 60), iters=4)
    b = webgraph.host_pagerank(_pages(spark, 60).repartition(13), iters=4)
    assert sorted(map(tuple, a.select("host", "rank_scaled").collect())) == sorted(
        map(tuple, b.select("host", "rank_scaled").collect())
    )


def _expected_anchor_aliases(n=60):
    """Local replay of anchor_aliases straight from the synth generator."""
    agg: dict[tuple[str, str], set] = {}
    cnt: dict[tuple[str, str], int] = {}
    for i, p in enumerate(synth_pages(n)):
        if not bytes(p["html"]).startswith(b"<html"):
            continue
        src_host = p["url"].split("://")[1].split("/")[0]
        for k, u in enumerate(page_outlinks(i)):
            dst_host = u.split("://")[1].split("/")[0]
            if dst_host == src_host:
                continue
            key = (dst_host, f"ref{k}")
            agg.setdefault(key, set()).add(src_host)
            cnt[key] = cnt.get(key, 0) + 1
    return {
        k: (cnt[k], len(srcs)) for k, srcs in agg.items()
    }


def test_anchor_aliases_match_synth_generator(spark):
    """(dst_host, alias) mention and distinct-linker counts recover the
    deterministic footer anchors (ref0/ref1/ref2) exactly — including
    dropped self-host anchors and the text/plain pages contributing
    nothing."""
    got = {
        (r["dst_host"], r["alias"]): (r["n_mentions"], r["n_src_hosts"])
        for r in webgraph.anchor_aliases(_pages(spark, 60)).collect()
    }
    assert got == _expected_anchor_aliases(60)


def test_anchor_aliases_distinct_never_exceeds_mentions(spark):
    for r in webgraph.anchor_aliases(_pages(spark, 100)).collect():
        assert 1 <= r["n_src_hosts"] <= r["n_mentions"]


def test_anchor_aliases_plan_salted_two_phase_codegen(spark):
    """The aggregation runs as the two-phase salted shape (a (key, salt)
    exchange below a key-only exchange) with zero Python eval nodes."""
    plan = (
        webgraph.anchor_aliases(_pages(spark, 60))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "lambdafunction"):
        assert bad not in plan
    assert plan.count("Exchange hashpartitioning") >= 2
    assert "__salt" in plan


def test_anchor_texts_cross_host_only(spark):
    rows = webgraph.anchor_texts(_pages(spark, 60)).collect()
    assert rows
    for r in rows:
        assert r["src_host"] != r["dst_host"]
        assert r["alias"] == r["alias"].strip().lower() != ""


def _mk_pages(spark, rows):
    """Tiny custom pages frame in the input_hint shape."""
    import datetime as dt

    return spark.createDataFrame(
        [
            (url, dt.datetime(2024, 1, 1), html.encode("utf-8"), "", "ru")
            for url, html in rows
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def test_anchor_alias_dim_gate_and_portable_mint(spark):
    """Endorsement gate keeps only >=2-host aliases; entity ids replay
    the md5 mint exactly and sit above WEB_ENTITY_ID_BASE."""
    import hashlib

    dim = {
        (r["alias"], r["canonical_name"]): r["entity_id"]
        for r in webgraph.anchor_alias_dim(_pages(spark, 60), min_src_hosts=2).collect()
    }
    full = {
        (r["dst_host"], r["alias"]): r["n_src_hosts"]
        for r in webgraph.anchor_aliases(_pages(spark, 60)).collect()
    }
    assert set(dim) == {
        (alias, host) for (host, alias), n in full.items() if n >= 2
    }
    for (alias, host), eid in dim.items():
        want = webgraph.WEB_ENTITY_ID_BASE + int(
            hashlib.md5(host.encode()).hexdigest()[:12], 16
        )
        assert eid == want


def test_web_alias_dim_unions_into_linking(spark):
    """A mention the curated dictionary does not know links through the
    web-mined dictionary; a curated mention keeps its curated entity
    (exact matches tie at score 1.0 and the lower curated id wins)."""
    from ner_app_spark import morphology as M
    from ner_app_spark.operators.linking import link_mentions
    from ner_app_spark.sources.pages import alias_dict_df

    anchor = '<a href="https://target.example/p">Виджетрон</a>'
    pages = _mk_pages(
        spark,
        [
            (f"https://src{i}.example/page", f"<html><body>{anchor}</body></html>")
            for i in range(3)
        ],
    )
    curated = alias_dict_df(spark)
    union = curated.unionByName(webgraph.anchor_alias_dim(pages, min_src_hosts=2))
    known = M.noun_lemmas()[7]
    phrases = spark.createDataFrame(
        [("u1", "виджетрон"), ("u2", known)], "url string, head_noun string"
    )
    links = {r["mention"]: r for r in link_mentions(phrases, union).collect()}
    assert links["виджетрон"]["canonical_name"] == "target.example"
    assert links["виджетрон"]["entity_id"] >= webgraph.WEB_ENTITY_ID_BASE
    assert abs(links["виджетрон"]["score"] - 1.0) < 1e-9
    curated_ids = {
        r["entity_id"] for r in curated.filter(F.col("alias") == known).collect()
    }
    assert links[known]["entity_id"] in curated_ids


def test_run_pipeline_web_aliases_noninterference(spark, tmp_path):
    """web_aliases=True over synth pages (whose anchor aliases refK never
    collide with extracted mentions) yields byte-identical links."""
    from ner_app_spark.plans.pipeline import run_pipeline

    outs = {}
    for flag in (False, True):
        out = run_pipeline(
            spark, _pages(spark, 20), n_parts=4, web_aliases=flag
        )
        outs[flag] = sorted(
            map(tuple, out.links.select("mention", "entity_id", "score").collect())
        )
        out.cleanup()
    assert outs[True] == outs[False] and outs[False]


def test_host_quality_rollup_semantics(spark):
    """The domain rollup reproduces a local recompute over the synth
    generator: page/plain-lane counts per host, token totals, and the
    fixed-point mean of the pinned quality signal (web token meter)."""
    import re

    from ner_app_spark.operators.textquality import WEB_STOPWORDS

    n = 60
    rows = {r["host"]: r for r in webgraph.host_quality(_pages(spark, n)).collect()}
    # every synth host (url = site{i%50}) with at least one page appears once
    hosts = {f"site{i % 50}.example" for i in range(n)}
    assert set(rows) == hosts
    assert sum(r["n_pages"] for r in rows.values()) == n
    # plain lane: exactly the non-<html payloads, attributed to their host
    expected_plain: dict[str, int] = {h: 0 for h in hosts}
    for i, p in enumerate(synth_pages(n)):
        if not bytes(p["html"]).startswith(b"<html"):
            expected_plain[f"site{i % 50}.example"] += 1
    assert {h: r["plain_pages"] for h, r in rows.items()} == expected_plain
    # per-doc recompute in plain Python over the AUTHORED text (byte-
    # identical to the extracted text by construction): web token meter
    # (Cyrillic-inclusive) + en∪ru stop list + the pinned formula
    tok_re = re.compile(r"[a-zа-яё0-9]{2,}")
    stop_set = set(WEB_STOPWORDS)
    agg: dict[str, list] = {h: [0, 0, 0.0, 0] for h in hosts}
    for i, p in enumerate(synth_pages(n)):
        h = f"site{i % 50}.example"
        text = p["text"]
        toks = tok_re.findall(text.lower())
        n_tok, n_ch = len(toks), len(text)
        n_stop = sum(1 for t in toks if t in stop_set)
        n_punct = sum(1 for c in text if c in ".,;:!?")
        q = (
            min(n_tok / 50.0, 1.0) * 0.5
            + (n_stop / n_tok if n_tok else 0.0) * 0.3
            + (1.0 - min((n_punct / n_ch if n_ch else 0.0) * 5.0, 1.0)) * 0.2
        )
        agg[h][0] += n_tok
        agg[h][1] += n_ch
        agg[h][2] += q * 1_000_000
        agg[h][3] += 1 if q < 0.5 else 0
    for h, r in rows.items():
        assert r["n_tokens"] == agg[h][0]
        assert r["n_chars"] == agg[h][1]
        # the local model skips the ROUND(·,6) step, so allow a micro of
        # accumulated rounding per page
        assert abs(r["mean_quality_micros"] - agg[h][2] / r["n_pages"]) <= r["n_pages"]
        assert r["low_quality_pages"] == agg[h][3]


def test_robots_directives_match_generator(spark):
    """Per-page robots flags recover exactly the deterministic directives
    the synthesizer authored: html pages at i % 13 == 0 are
    noindex,nofollow; a further i % 17 == 0 are nofollow-only; everything
    else (incl. text/plain payloads, which carry no meta) defaults to
    indexable/followable."""
    n = 120
    got = {
        r["url"]: (r["noindex"], r["nofollow"])
        for r in webgraph.robots_directives(_pages(spark, n)).collect()
    }
    assert len(got) == n
    for i, p in enumerate(synth_pages(n)):
        if not bytes(p["html"]).startswith(b"<html"):
            expected = (False, False)
        elif i % 13 == 0:
            expected = (True, True)
        elif i % 17 == 0:
            expected = (False, True)
        else:
            expected = (False, False)
        assert got[p["url"]] == expected, (i, p["url"])


def test_host_edges_honor_nofollow(spark):
    """honor_nofollow drops exactly the nofollow pages' link
    contributions; the raw default is unchanged."""
    n = 120
    raw = webgraph.host_edges(_pages(spark, n))
    gated = webgraph.host_edges(_pages(spark, n), honor_nofollow=True)
    raw_total = raw.agg(F.sum("n_links")).first()[0]
    gated_total = gated.agg(F.sum("n_links")).first()[0]
    # expected: recompute from the generator — cross-host outlinks of
    # html pages that are NOT nofollow
    def cross_host(i, p):
        host = p["url"].split("/")[2]
        return [u for u in page_outlinks(i) if u.split("/")[2] != host]

    exp_raw = exp_gated = 0
    for i, p in enumerate(synth_pages(n)):
        if not bytes(p["html"]).startswith(b"<html"):
            continue
        k = len(cross_host(i, p))
        exp_raw += k
        if not (i % 13 == 0 or i % 17 == 0):
            exp_gated += k
    assert raw_total == exp_raw
    assert gated_total == exp_gated
    assert gated_total < raw_total


def test_indexable_pages_filter(spark):
    n = 120
    kept = {r["url"] for r in webgraph.indexable_pages(_pages(spark, n)).select("url").collect()}
    for i, p in enumerate(synth_pages(n)):
        is_html = bytes(p["html"]).startswith(b"<html")
        assert (p["url"] not in kept) == (is_html and i % 13 == 0), i


def test_domain_table_joins_quality_and_rank(spark):
    """domain_table == host_quality ⋈ host_pagerank per host on the synth
    fixture; a crafted corpus host with NO cross-host links gets the
    COALESCE'd rank 0 (it earned no importance prior)."""
    n = 60
    dt = {r["host"]: r for r in webgraph.domain_table(_pages(spark, n), iters=4).collect()}
    hq = {r["host"]: r for r in webgraph.host_quality(_pages(spark, n)).collect()}
    pr = {
        r["host"]: r["rank_scaled"]
        for r in webgraph.host_pagerank(_pages(spark, n), iters=4).collect()
    }
    assert set(dt) == set(hq)
    for h, r in dt.items():
        assert r["n_pages"] == hq[h]["n_pages"]
        assert r["mean_quality_micros"] == hq[h]["mean_quality_micros"]
        assert r["rank_scaled"] == pr.get(h, 0)

    # isolated host: pages but no cross-host anchors -> rank 0, quality real
    iso = _mk_pages(
        spark,
        [
            ("https://lonely.example/p1", "<html><body><p>Alone here.</p></body></html>"),
            ("https://lonely.example/p2", "plain text no anchors"),
        ],
    )
    row = {r["host"]: r for r in webgraph.domain_table(iso, iters=2).collect()}
    assert row["lonely.example"]["rank_scaled"] == 0
    assert row["lonely.example"]["n_pages"] == 2
    assert row["lonely.example"]["plain_pages"] == 1
