"""Transformer-NER inference stage analog (notebook cells 8-13): stubbed
model, faithful HF aggregation_strategy='average' postprocessing, real
Arrow-batched distributed plumbing."""

from __future__ import annotations

import pytest

from ner_app_spark.operators.ner import (
    LABELS,
    _stub_scores,
    aggregate_average,
    ner_entities,
)


def test_stub_scores_are_distribution_and_deterministic():
    s = _stub_scores("Моск")
    assert len(s) == len(LABELS)
    assert abs(sum(s) - 1.0) < 1e-9
    assert s == _stub_scores("Моск")


def test_average_aggregation_merges_adjacent_and_splits_on_O():
    # craft words whose stub argmax we can read off directly
    def ent(word_subs):
        out = aggregate_average([word_subs])
        return out[0]["entity_group"] if out else "O"

    # find three words: two with the same entity, one scoring 'O'
    import itertools
    import string

    same = []
    o_word = None
    target = None
    # mixed-case pool: lowercase words keep their full 'O' weight (the
    # capitalization prior halves it), so both kinds occur
    pool = itertools.chain(
        ("".join(p) for p in itertools.product(string.ascii_lowercase, repeat=2)),
        ("".join(p) for p in itertools.product(string.ascii_uppercase, repeat=2)),
    )
    for cand in pool:
        e = ent([cand])
        if e == "O" and o_word is None:
            o_word = [cand]
        elif e != "O":
            if target is None:
                target, same = e, [[cand]]
            elif e == target and len(same) < 2:
                same.append([cand])
        if o_word and len(same) == 2:
            break
    assert o_word and len(same) == 2

    # adjacent same-entity words merge into ONE group (word-joined,
    # score = mean of word scores)
    merged = aggregate_average(same)
    assert len(merged) == 1
    assert merged[0]["entity_group"] == target
    assert " " in merged[0]["word"]

    # an O word in between splits them into TWO groups
    split = aggregate_average([same[0], o_word, same[1]])
    assert len(split) == 2
    assert [g["entity_group"] for g in split] == [target, target]


def test_word_score_is_mean_over_subtokens():
    subs = ["Моск", "##ва"]  # one word, two subtokens
    vecs = [_stub_scores(s) for s in subs]
    mean = [sum(col) / 2 for col in zip(*vecs)]
    best = max(range(len(LABELS)), key=lambda i: mean[i])
    got = aggregate_average([subs])
    if LABELS[best] == "O":
        assert got == []
    else:
        assert got[0]["entity_group"] == LABELS[best]
        assert got[0]["score"] == round(mean[best], 6)
        assert got[0]["word"] == "Москва"


def test_distributed_matches_local_aggregation(spark):
    import re

    from ner_app_spark.sources.brat import subtokenize

    texts = [
        (0, "Правительство России задумало вернуть налог."),
        (1, "Спикер Совета Федерации напомнила о последствиях."),
        (2, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in ner_entities(df, num_partitions=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["entity_group"], r["word"], r["score"])
        )
    for did, text in texts:
        words = [subtokenize(w) for w in re.findall(r"\w+|[^\w\s]", text)]
        want = [
            (g["entity_group"], g["word"], g["score"])
            for g in aggregate_average(words)
        ]
        assert got.get(did, []) == want


def test_real_model_hook_raises(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(Exception, match="transformers"):
        ner_entities(df, use_real_model=True).collect()
