"""URL canonicalization (operators/urlnorm.py): pinned edge cases the
sf0.01 parity row (url_normalize) can't isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ner_app_spark.operators import urlnorm

CASES = [
    # fragment
    ("https://a.example/p#x", "https://a.example/p"),
    ("https://a.example/p#x#y", "https://a.example/p"),
    # default ports (http and https, mid and end)
    ("http://a.example:80/p", "http://a.example/p"),
    ("https://a.example:443/p", "https://a.example/p"),
    ("https://a.example:443", "https://a.example"),
    # NON-default port survives
    ("https://a.example:8443/p", "https://a.example:8443/p"),
    # host case folds, path case survives
    ("HTTPS://A.Example/PaTh", "https://a.example/PaTh"),
    # www alias — incl. stacked prefixes (must collapse in one pass so
    # canonicalization is idempotent)
    ("https://www.a.example/p", "https://a.example/p"),
    ("https://www.www.a.example/p", "https://a.example/p"),
    # utm params: leading, middle, trailing, utm-only
    ("https://a.example/p?utm_source=x", "https://a.example/p"),
    ("https://a.example/p?utm_source=x&k=1", "https://a.example/p?k=1"),
    ("https://a.example/p?k=1&utm_source=x", "https://a.example/p?k=1"),
    ("https://a.example/p?utm_a=1&utm_b=2", "https://a.example/p"),
    # non-utm params survive untouched
    ("https://a.example/p?k=1&j=2", "https://a.example/p?k=1&j=2"),
    # trailing slashes
    ("https://a.example/p/", "https://a.example/p"),
    ("https://a.example///", "https://a.example"),
    # everything at once
    (
        "HTTP://WWW.A.Example:80/Path/?utm_c=z&k=1#frag",
        "http://a.example/Path/?k=1",
    ),
]


@pytest.fixture(scope="module")
def canon_map(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    rows = df.select("url", urlnorm.canonical_url("url").alias("c")).collect()
    return {r["url"]: r["c"] for r in rows}


@pytest.mark.parametrize("raw,expected", CASES)
def test_canonical_url(canon_map, raw, expected):
    assert canon_map[raw] == expected


def test_normalize_urls_groups_and_rep(spark):
    urls = [
        "https://a.example/p",
        "https://www.a.example/p",
        "https://a.example/p#frag",
        "https://b.example/q",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r for r in urlnorm.normalize_urls(df).collect()}
    assert all(got[u]["url_canon"] == "https://a.example/p" for u in urls[:3])
    assert all(got[u]["n_variants"] == 3 for u in urls[:3])
    # representative = min raw spelling, exactly one per group
    assert sum(got[u]["is_canonical_rep"] for u in urls[:3]) == 1
    assert got["https://a.example/p"]["is_canonical_rep"]
    assert got["https://b.example/q"]["n_variants"] == 1
    assert got["https://b.example/q"]["is_canonical_rep"]


def test_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([("https://a.example/p",)], "url string")
    plan = (
        urlnorm.normalize_urls(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "lambdafunction"):
        assert bad not in plan


def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u) over the pinned cases, the synth
    noising variants, and their pairwise stackings — the invariant a
    crawl frontier relies on when it re-canonicalizes stored urls."""
    base = [r for r, _ in CASES]
    # stack the noise kinds the registry fixture injects, in both orders
    frag, port, www, utm = "#z", ":443", "www.", "?utm_x=1&utm_y=2"
    stacked = []
    for u in ("https://B.Example/Path", "http://b.example/p/"):
        stacked += [
            u + frag,
            u.replace("://", "://" + www) + utm,
            u.replace("//b", "//b" + port.replace(":", ":")) if "//b" in u else u,
            u + utm + frag,
            "HTTPS://WWW.WWW.B.Example:443/P/" + utm + frag,
        ]
    df = spark.createDataFrame([(u,) for u in base + stacked], "url string")
    once = df.select(urlnorm.canonical_url("url").alias("c1"))
    twice = once.select("c1", urlnorm.canonical_url("c1").alias("c2"))
    bad = twice.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, [ (r["c1"], r["c2"]) for r in bad ]
