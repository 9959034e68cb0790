"""Unit tests for the frozen morphology provider, synthesizer, tokenizer,
n-grams, pattern classifier and the pure-Python oracle (SURVEY.md §5.2/§5.6)."""

from __future__ import annotations

import math

from ner_app_spark import morphology as M
from ner_app_spark import oracle, synth
from ner_app_spark.functions import text as T


def test_morphology_deterministic_and_consistent():
    t1 = M.build_morphology()
    assert len(t1) > 400
    # lemmas are themselves surfaces with the same POS (lemma-of-lemma fixpoint,
    # required because the reference re-parses lemmatized phrases:
    # /root/reference/src/analysis/phrase_extractor.py:29-31)
    for surface, (lemma, pos) in t1.items():
        assert lemma in t1, lemma
        assert t1[lemma][0] == lemma
        if pos in ("NOUN", "ADJF"):
            assert t1[lemma][1] == pos


def test_tokenizer_reference_semantics():
    # 1-char words dropped; hyphen parts >=2 chars; punctuation single tokens
    # (/root/reference/src/analysis/tfidf.py:16-20)
    toks = T.tokenize("Я шёл в дом-музей, быстро! а б cd 7 42")
    assert "Я" not in toks and "в" not in toks and "а" not in toks and "7" not in toks
    assert "дом-музей" in toks
    assert "," in toks and "!" in toks
    assert "cd" in toks and "42" in toks


def test_ngram_punctuation_boundary():
    # windows crossing punctuation are discarded (tfidf.py:22-35)
    grams = T.lemma_ngrams("один два, три")
    lemmas = [T.lemmatize_token(t) for t in ["один", "два", "три"]]
    assert f"{lemmas[0]} {lemmas[1]}" in grams
    assert f"{lemmas[1]} {lemmas[2]}" not in grams
    assert all("," not in g for g in grams)


def test_ngram_multiplicity_is_tf_source():
    grams = T.lemma_ngrams("spark spark spark")
    assert grams.count("spark") == 3
    assert grams.count("spark spark") == 2


def test_tfidf_single_doc_math():
    # score = count / sqrt(sum count^2) — hand-computed (SURVEY §2 A2)
    scored = dict(oracle.tfidf_single_doc("spark spark data"))
    # unigrams: spark x2, data x1; bigrams: 'spark spark', 'spark data'; trigram x1
    norm = math.sqrt(4 + 1 + 1 + 1 + 1)
    assert abs(scored["spark"] - 2 / norm) < 1e-12
    assert abs(scored["data"] - 1 / norm) < 1e-12
    assert abs(scored["spark data"] - 1 / norm) < 1e-12


def test_pattern_classifier():
    noun = M.noun_lemmas()[10]
    adj = sorted(
        {l for (l, p) in M.build_morphology().values() if p == "ADJF"}
    )[0]
    assert T.classify_pattern(noun) == "однословное"
    assert T.classify_pattern(f"{adj} {noun}") == "адъективное"
    assert T.classify_pattern(f"{noun} {noun}") == "генитивное"
    assert T.classify_pattern(f"{adj} {adj} {noun}") == "адъективное_многословное"
    assert T.classify_pattern(f"{noun} {noun} {noun}") == "генитивное_многословное"
    assert T.classify_pattern(f"{noun} {adj} {noun}") == "адъективно-генитивное"
    assert T.classify_pattern(f"{adj} {noun} {noun}") == "генитивно-адъективное"
    # dead / non-matching sequences
    assert T.classify_pattern(f"{adj}") is None
    assert T.classify_pattern("spark") is None  # latin => '?'
    assert T.classify_pattern(f"{noun} spark") is None


def test_head_noun_rightmost():
    nouns = M.noun_lemmas()
    adj = sorted({l for (l, p) in M.build_morphology().values() if p == "ADJF"})[0]
    assert T.head_noun_lemma(f"{nouns[0]} {adj} {nouns[1]}") == nouns[1]
    assert T.head_noun_lemma(adj) == ""


def test_synth_deterministic_and_extractable():
    a = synth.synth_pages(30)
    b = synth.synth_pages(30)
    assert a == b
    assert any(p["lang"] != "ru" for p in a)
    assert any(p["html"] == p["text"].encode("utf-8") for p in a)  # plain path
    for p in a:
        assert T.extract_text(p["html"]) == p["text"]  # byte-identical invariant


def test_oracle_triples_shape():
    pages = [p for p in synth.synth_pages(10) if p["lang"] == "ru"]
    ph = oracle.analyze(pages[0]["text"])
    assert ph, "analyzer found no phrases"
    trs = oracle.triples_for_doc(pages[0]["url"], ph)
    assert trs
    preds = {t[2] for t in trs}
    assert "synonym" in preds
    assert preds - {"synonym"} <= {name for name, _ in T.PATTERNS}
