"""Unit tests for the §3.3 search path and the BRAT/BIO reader."""

from __future__ import annotations

from ner_app_spark.operators.search import (
    query_tokens,
    sentence_search,
    similar_docs_topk,
    undirected_dedup,
)
from ner_app_spark.sources.brat import (
    brat_bio,
    parse_ann,
    synth_brat_df,
    tokens_to_bio,
)


def test_query_tokens():
    assert query_tokens("Hash JOIN, a fast scan!") == ["hash", "join", "fast", "scan"]


def test_similar_docs_ranks_exact_match_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "hash join fast table scan"),
            (2, "hash join over the big table"),
            (3, "nothing relevant here at all"),
            (4, "fast scan"),
        ],
        "doc_id long, text string",
    )
    got = similar_docs_topk(docs, "hash join fast table scan", k=3).collect()
    assert [r["doc_id"] for r in got] == [1, 4, 2]
    assert got[0]["cos"] > got[1]["cos"] > got[2]["cos"] > 0


def test_sentence_search_containment(spark):
    docs = spark.createDataFrame(
        [
            (1, "hash join fast table scan here. no match in this one."),
            (2, "table scan only, hash missing join fast."),
            (3, "irrelevant text."),
        ],
        "doc_id long, text string",
    )
    got = sentence_search(docs, "hash join fast table scan", k=10).collect()
    # reference §3.3 semantics (tfidf.py:100-123): rank by surface-ngram
    # TF-IDF cosine, then keep only top-k sentences containing the query's
    # trailing TRIGRAM ('fast table scan') contiguously — doc 1 sentence 0
    # has it; doc 2 has all five tokens but not the contiguous trigram
    assert {(r["doc_id"], r["sent_id"]) for r in got} == {(1, 0)}
    assert all(r["cos"] > 0 and r["rank"] >= 1 for r in got)


def test_sentence_search_empty_query_is_empty_frame(spark):
    docs = spark.createDataFrame([(1, "some text.")], "doc_id long, text string")
    got = sentence_search(docs, "?!... 7", k=5)
    assert got.count() == 0
    assert got.columns == ["doc_id", "sent_id", "cos", "rank"]


def test_dynamic_highlight_matches_surface_forms(spark):
    """F8 full semantics (utils.py:27-58): forms of the phrase's lemmas
    present in the row's own sentence are wrapped, joined across
    [\\s\\-,;:]+ separators, case-insensitive."""
    from ner_app_spark import morphology as M
    from ner_app_spark.operators.search import (
        highlight_dynamic,
        highlight_phrase_in_sentence,
    )

    table = M.build_morphology()
    lemma = M.noun_lemmas()[0]
    forms = sorted(s for s, (l, _p) in table.items() if l == lemma)
    sent = f"Вот {forms[1]}, и ещё {forms[2]}."
    out = highlight_phrase_in_sentence(sent, lemma)
    assert f"<strong>{forms[1]}</strong>" in out
    assert f"<strong>{forms[2]}</strong>" in out
    # phrase word with no form in the sentence falls back to the lemma
    assert highlight_phrase_in_sentence("nothing here.", lemma) == "nothing here."

    df = spark.createDataFrame([(sent, lemma)], "sentence string, phrase string")
    got = highlight_dynamic(df).collect()[0]["highlighted"]
    assert got == out


def test_undirected_dedup_collapses_directions(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 1), (3, 4)], "s long, d long"
    )
    got = {(r["a"], r["b"]): r["multiplicity"] for r in
           undirected_dedup(edges, "s", "d").collect()}
    assert got == {(1, 2): 3, (3, 4): 1}


def test_parse_ann_and_bio_projection():
    text, ann = "Alice Smith met Berlin .", (
        "T1\tPERSON 0 11\tAlice Smith\nT2\tCITY 16 22\tBerlin\n"
    )
    spans = parse_ann(ann)
    assert spans == [(0, 11, "PERSON"), (16, 22, "CITY")]
    toks, labels = tokens_to_bio(text, spans)
    assert toks == ["Alice", "Smith", "met", "Berlin", "."]
    assert labels == ["B-PERSON", "I-PERSON", "O", "B-CITY", "O"]


def test_subtoken_alignment():
    from ner_app_spark.sources.brat import align_subtoken_labels, subtokenize

    assert subtokenize("Alice") == ["Alic", "##e"]
    assert subtokenize("met") == ["met"]
    st, sl = align_subtoken_labels(
        ["Alice", "met", "Berlin"], ["B-PERSON", "O", "B-CITY"]
    )
    assert st == ["Alic", "##e", "met", "Berl", "##in"]
    # first subtoken carries the label id, continuations get -100
    assert sl[1] == -100 and sl[4] == -100
    assert sl[2] == 0  # 'O' is always id 0
    assert sl[0] != sl[3] and sl[0] > 0 and sl[3] > 0


def test_bio_to_subtokens_spark(spark):
    from ner_app_spark.sources.brat import bio_to_subtokens, brat_bio, synth_brat_df

    rows = bio_to_subtokens(brat_bio(synth_brat_df(spark, 8), num_partitions=2)).collect()
    assert len(rows) == 8
    for r in rows:
        assert len(r["subtokens"]) == len(r["label_ids"])
        assert all(
            (lid == -100) == st.startswith("##")
            for st, lid in zip(r["subtokens"], r["label_ids"])
        )


def test_brat_bio_spark_matches_local(spark):
    df = synth_brat_df(spark, 16)
    got = {r["doc_id"]: (r["tokens"], r["labels"])
           for r in brat_bio(df, num_partitions=4).collect()}
    assert len(got) == 16
    local = df.collect()
    for row in local:
        toks, labels = tokens_to_bio(row["text"], parse_ann(row["ann"]))
        assert got[row["doc_id"]] == (toks, labels)
    # every doc has two B- entities
    for toks, labels in got.values():
        assert sum(1 for l in labels if l.startswith("B-")) == 2
