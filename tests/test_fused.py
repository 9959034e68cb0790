"""Fused analyze stage (round-3): extract_phrases_and_triples emits
phrases AND triples in one Arrow batch pass. These tests pin that the
fused path is exactly equivalent to the two independent formulations it
replaces on the hot path:

  * fused_phrases(fused)  == extract_phrases(pages)       (mapInPandas)
  * fused_triples(fused)  == emit_triples(phrases, morph) (declarative
    posexplode/window formulation, operators/triples.py — a genuinely
    different implementation, so this is a real cross-check, not a
    self-compare)
"""

from __future__ import annotations

import pytest

from ner_app_spark.operators.extract import (
    extract_phrases,
    extract_phrases_and_triples,
    fused_phrases,
    fused_triples,
)
from ner_app_spark.operators.triples import emit_triples
from ner_app_spark.sources.pages import morphology_df, synth_pages_df

N_PAGES = 40


@pytest.fixture(scope="module")
def fused(spark):
    pages = synth_pages_df(spark, N_PAGES, num_partitions=4)
    return extract_phrases_and_triples(pages, num_partitions=4).cache()


def test_fused_phrases_match_unfused(spark, fused):
    pages = synth_pages_df(spark, N_PAGES, num_partitions=4)
    want = {
        (r["url"], r["phrase"], r["type"], r["tfidf"], r["length"], r["head_noun"])
        for r in extract_phrases(pages, num_partitions=4).collect()
    }
    got = {
        (r["url"], r["phrase"], r["type"], r["tfidf"], r["length"], r["head_noun"])
        for r in fused_phrases(fused).collect()
    }
    assert got == want and len(got) > 0


def test_fused_triples_match_declarative(spark, fused):
    declarative = emit_triples(fused_phrases(fused), morphology_df(spark))
    want = {
        (r["url"], r["subj"], r["pred"], r["obj"]) for r in declarative.collect()
    }
    got = {
        (r["url"], r["subj"], r["pred"], r["obj"])
        for r in fused_triples(fused).collect()
    }
    assert got == want and len(got) > 0


def test_fused_kinds_are_disjoint_and_typed(fused):
    rows = fused.collect()
    kinds = {r["kind"] for r in rows}
    assert kinds == {"phrase", "triple"}
    for r in rows:
        if r["kind"] == "phrase":
            assert r["phrase"] is not None and r["subj"] is None
        else:
            assert r["subj"] is not None and r["phrase"] is None
