"""Vendored pure-Python oracle: the reference's analyze semantics computed
single-threaded, used by pytest to pin golden phrases/triples that the
distributed pipeline must match with P/R >= 0.95 (BASELINE.json gate).

Faithful reimplementation (not a copy) of:
  * extract_top_ngrams_with_tfidf  /root/reference/src/analysis/tfidf.py:39-55
    sklearn with ONE document: smooth idf == 1 identically, so
    score(g) = count(g) / sqrt(sum_g count(g)^2)  (l2 norm of raw counts).
  * analyze_text_with_stats        /root/reference/src/analysis/phrase_extractor.py:45-71
  * triple emission spec           SURVEY.md §2.28 (our pinned definition).

Tie order: the reference's np.argsort is impl-defined on ties
(tfidf.py:54); we pin the total order (-tfidf, -length, phrase) —
set-identical results, deterministic sequence.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import NamedTuple

from .functions import text as T

TOP_K = 10_000


class Phrase(NamedTuple):
    # NamedTuple, not frozen dataclass: same named-field immutability,
    # ~4x cheaper construction (no per-field object.__setattr__) — this
    # init ran 25k times per 232-doc batch in the extract hot path
    phrase: str
    type: str
    tfidf: float
    length: int
    head_noun: str


def tfidf_single_doc(text: str, max_n: int = 3, top_k: int = TOP_K) -> list[tuple[str, float]]:
    """(ngram, score) pairs, score>0, at most top_k, order (-score, ngram)."""
    counts = Counter(T.lemma_ngrams(text, max_n))
    if not counts:
        return []
    norm = math.sqrt(sum(c * c for c in counts.values()))
    scored = [(g, c / norm) for g, c in counts.items()]
    scored.sort(key=lambda p: (-p[1], p[0]))
    return scored[:top_k]


def analyze(text: str) -> list[Phrase]:
    """Flagship analyze path (§3.1): tfidf -> pattern gate -> sort."""
    out: list[Phrase] = []
    for ngram, score in tfidf_single_doc(text):
        ptype = T.classify_pattern(ngram)
        if ptype is None:
            continue
        out.append(
            Phrase(
                phrase=ngram,
                type=ptype,
                tfidf=score,
                length=len(ngram.split()),
                head_noun=T.head_noun_lemma(ngram),
            )
        )
    out.sort(key=lambda p: (-p.tfidf, -p.length, p.phrase))
    return out


def stats(phrases: list[Phrase]) -> dict:
    """total/unique stats (phrase_extractor.py:67-70)."""
    return {
        "total_phrases": len(phrases),
        "unique_phrase_types": len({p.type for p in phrases}),
    }


def triples_for_doc(url: str, phrases: list[Phrase]) -> list[tuple[str, str, str, str]]:
    """SURVEY.md §2.28 emission spec, deterministic:

    1. Intra-phrase: for each multi-word phrase with a head noun, the head
       is the *rightmost NOUN position*; every other word emits
       (head_noun, pattern_type, word)  — dependency-pattern relations.
    2. Synonym chain: phrases sharing a head_noun within a doc, sorted by
       phrase text, consecutive pairs emit (a, 'synonym', b) — the
       reference's term<->term connection labeling
       (templates/search.html.jinja badge rule).
    Returns (url, subj, pred, obj) rows, de-duplicated, sorted.
    """
    # url is constant per call: dedupe/sort (subj, pred, obj) 3-tuples and
    # prefix url on emit — same rows, same order, one less hashed field
    rows: set[tuple[str, str, str]] = set()
    by_head: dict[str, list[str]] = {}
    for p in phrases:
        if p.head_noun:
            by_head.setdefault(p.head_noun, []).append(p.phrase)
        if p.length < 2 or not p.head_noun:
            continue
        words = p.phrase.split()
        # rightmost NOUN position, scanning from the right with early
        # exit (the head is usually the last word; a full-phrase scan +
        # max() was ~25% of per-doc analysis time in profiling)
        head_idx = -1
        for i in range(len(words) - 1, -1, -1):
            if T.M.pos_of(words[i]) == "NOUN":
                head_idx = i
                break
        if head_idx < 0:
            raise ValueError(f"no NOUN in phrase {p.phrase!r}")
        for i, w in enumerate(words):
            if i != head_idx:
                rows.add((p.head_noun, p.type, w))
    for head, plist in by_head.items():
        uniq = sorted(set(plist))
        for a, b in zip(uniq, uniq[1:]):
            rows.add((a, "synonym", b))
    return [(url, s, pr, o) for s, pr, o in sorted(rows)]
