"""Seeded property tests (SURVEY.md §5.6): tokenizer / n-gram invariants
that must hold for ANY input — the distributed pipeline and the oracle
share this one implementation (functions/text.py), so pinning it here
pins both."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ner_app_spark.functions import text as T

ALPHA = "абвгдеж-abcxyz0123456789 .,!?:;()«»\n\t"
texts = st.text(alphabet=ALPHA, max_size=300)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_tokens_are_wordlike_or_single_punct(s):
    for tok in T.tokenize(s):
        assert (
            re.fullmatch(r"[A-Za-zА-Яа-яёЁ0-9]{2,}(?:-[A-Za-zА-Яа-яёЁ0-9]{2,})*", tok)
            or (len(tok) == 1 and not tok.isalnum() and not tok.isspace())
        ), repr(tok)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_ngrams_never_cross_punctuation(s):
    # every n-gram window consists solely of word-like tokens: punctuation
    # is a boundary, never bridged (reference tfidf.py:22-35)
    for g in T.lemma_ngrams(s, 3):
        for w in g.split(" "):
            assert T.WORDLIKE_RE.fullmatch(w), repr(g)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_one_char_words_dropped(s):
    toks = T.tokenize(s)
    assert not any(len(t) == 1 and t.isalnum() for t in toks)


@settings(max_examples=100, deadline=None)
@given(texts)
def test_sentence_split_preserves_content(s):
    # split + strip never invents characters
    joined = "".join(T.split_sentences(s))
    stripped = re.sub(r"\s", "", s)
    assert re.sub(r"\s", "", joined) in stripped or stripped == ""


@settings(max_examples=100, deadline=None)
@given(texts)
def test_analyze_deterministic_and_sorted(s):
    from ner_app_spark.oracle import analyze

    a, b = analyze(s), analyze(s)
    assert a == b
    keys = [(-p.tfidf, -p.length, p.phrase) for p in a]
    assert keys == sorted(keys)


# ---------------------------------------------------------------- round 2

_CYR = st.text(alphabet="абвгдежзиклмнопрстуфхцчшщыьэюя", min_size=1, max_size=12)


@given(_CYR)
@settings(max_examples=300, deadline=None)
def test_predict_oov_total_and_deterministic(w):
    from ner_app_spark import morphology as M

    lemma, pos = M.predict_oov(w)
    assert lemma and isinstance(lemma, str)
    assert (lemma, pos) == M.predict_oov(w)  # deterministic
    if len(w) < 3:
        assert pos is None  # short words stay unknown ('?')
    else:
        assert pos in {"NOUN", "ADJF", "VERB"}
    # OOV never shadows the frozen dictionary
    table = M.build_morphology()
    if w in table:
        assert M.lemma_of(w) == table[w][0] and M.pos_of(w) == table[w][1]


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 50)),
        min_size=1, max_size=12, unique=True,
    )
)
@settings(max_examples=8, deadline=None)
def test_with_rank_matches_python_sort(spark, rows):
    """rank from the broadcast self-join equals the 1-based position
    under the lexicographic order (a desc, b asc) for any unique rows."""
    from ner_app_spark.operators.search import with_rank

    df = spark.createDataFrame(rows, "a long, b long").coalesce(1)
    got = {
        (r["a"], r["b"]): r["rank"]
        for r in with_rank(df, [("a", True), ("b", False)]).collect()
    }
    want = {
        t: i + 1
        for i, t in enumerate(sorted(set(rows), key=lambda t: (-t[0], t[1])))
    }
    assert got == want


# ----------------------------- media header walkers never crash or hang


_payloads = st.binary(max_size=400)


@settings(max_examples=300, deadline=None)
@given(_payloads)
def test_media_decoders_total_on_arbitrary_bytes(raw):
    """Every dependency-free header parser is TOTAL: arbitrary bytes
    (including adversarial size fields) yield a dict or None — never an
    exception, never an unbounded walk. The distributed decode stage
    runs these on untrusted payload columns, so totality is the safety
    property, not just robustness."""
    from ner_app_spark.operators import multimodal as M

    for fn in (
        M._decode_png_header,
        M._decode_wav_header,
        M._decode_gif_header,
        M._decode_bmp_header,
        M._decode_mp4_header,
    ):
        out = fn(raw)
        assert out is None or isinstance(out, dict)
    d = M._decode_stub(raw, "video")
    assert set(d) == {"width", "height", "n_frames", "feature"}
    assert len(d["feature"]) == M.FEATURE_DIM


@settings(max_examples=150, deadline=None)
@given(
    st.binary(max_size=200),
    st.integers(min_value=0, max_value=280),
    st.binary(min_size=1, max_size=8),
)
def test_mp4_walker_total_under_corruption(tail, pos, junk):
    """Splice junk into a well-formed MP4 at any offset: the box walk
    must terminate with None or a dict (size fields may now point
    anywhere, including backwards/over the end)."""
    from ner_app_spark.operators.multimodal import (
        _decode_mp4_header,
        synth_mp4,
    )

    base = bytearray(synth_mp4(64, 32, 5) + tail)
    end = min(pos + len(junk), len(base))
    base[pos:end] = junk[: end - pos]
    out = _decode_mp4_header(bytes(base))
    assert out is None or isinstance(out, dict)


# ---------------------- manifest pruning predicate never drops a match


@settings(max_examples=400, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=12),
    st.sampled_from(["=", "<", "<=", ">", ">=", "in"]),
    st.one_of(st.integers(-60, 60), st.lists(st.integers(-60, 60), max_size=4)),
)
def test_file_may_match_is_conservative(values, op, lit):
    """The core safety invariant of manifest stats pruning: if ANY row in
    a file satisfies (col op literal) under SQL semantics (NULL never
    matches), the predicate must keep the file. False keeps are allowed
    (pruning is an optimization); false drops are correctness bugs."""
    from ner_app_spark.tables.icelite import _enc_stat, _file_may_match

    if op == "in":
        lit = lit if isinstance(lit, list) else [lit]
    elif isinstance(lit, list):
        lit = len(lit)  # arbitrary scalar for the comparison ops
    nn = [v for v in values if v is not None]
    entry = {
        "record_count": len(values),
        "stats": {
            "c": {
                "min": _enc_stat(min(nn) if nn else None),
                "max": _enc_stat(max(nn) if nn else None),
                "nulls": len(values) - len(nn),
            }
        },
    }

    def sql_match(v):
        if v is None:
            return False
        if op == "in":
            return v in lit
        return {"=": v == lit, "<": v < lit, "<=": v <= lit,
                ">": v > lit, ">=": v >= lit}[op]

    truth = any(sql_match(v) for v in values)
    kept = _file_may_match(entry, "c", op, lit)
    if truth:
        assert kept, (values, op, lit)
    # stats on a DIFFERENT column can never justify dropping
    assert _file_may_match(entry, "other", op, lit)


# ------------------------- edge_split / id-mint invariants for ANY input


_triple_sets = st.lists(
    st.tuples(
        st.sampled_from([f"e{i}" for i in range(12)]),
        st.sampled_from(["P", "Q", "R"]),
        st.sampled_from([f"e{i}" for i in range(12)]),
    ),
    min_size=1,
    max_size=25,
)


@given(_triple_sets)
@settings(max_examples=8, deadline=None)
def test_edge_split_invariants_hold_for_any_triples(spark, rows):
    """For ANY triple multiset: the output partitions the distinct
    positives, val/test rows are transductively anchored in train, and
    only provisional-val/test buckets can appear outside train."""
    from ner_app_spark.operators.sampling import edge_split

    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = edge_split(df).collect()
    assert len(out) == len(set(rows))
    tr_ents = {r["subj"] for r in out if r["split"] == "train"} | {
        r["obj"] for r in out if r["split"] == "train"
    }
    tr_preds = {r["pred"] for r in out if r["split"] == "train"}
    for r in out:
        if r["split"] == "train":
            continue
        assert r["bucket"] >= 80
        assert r["subj"] in tr_ents and r["obj"] in tr_ents
        assert r["pred"] in tr_preds


_value_sets = st.lists(
    st.text(alphabet="abcxyzабв0123456789", min_size=1, max_size=8),
    min_size=0,
    max_size=20,
)


@given(_value_sets, _value_sets)
@settings(max_examples=8, deadline=None)
def test_mint_then_extend_invariants_for_any_values(spark, old_vals, new_vals):
    """For ANY two value sets: the extended dim keeps every snapshot-1
    id verbatim, covers old ∪ new exactly, and stays collision-free —
    with a small bucket count so same-bucket interleaving is common."""
    from ner_app_spark.operators.triples import extend_ids, mint_ids

    old = spark.createDataFrame(
        [(v,) for v in old_vals] or [], "entity string"
    )
    new = spark.createDataFrame(
        [(v,) for v in new_vals] or [], "entity string"
    )
    dim1 = {r["entity"]: r["id"] for r in mint_ids(old, n_buckets=2).collect()}
    ext = {
        r["entity"]: r["id"]
        for r in extend_ids(
            mint_ids(old, n_buckets=2), new, n_buckets=2
        ).collect()
    }
    assert set(ext) == set(old_vals) | set(new_vals)
    for v, i in dim1.items():
        assert ext[v] == i
    assert len(set(ext.values())) == len(ext)
