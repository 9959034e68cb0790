"""BRAT standoff corpus reader -> token/BIO-label rows (S5 + F11).

The reference's NER training notebook walks a directory of ``.txt`` +
``.ann`` standoff files, regex-tokenizes (``\\w+|[^\\w\\s]``) and projects
char-span annotations onto tokens as BIO labels
(/root/reference/notebooks/NER_NEREL_dataset.ipynb cell 2).

Here the parse is a ``mapInPandas`` stage over a DataFrame of
``(doc_id, text, ann)`` — in production that frame comes from
``spark.read.format("binaryFile")`` over the corpus directory paired by
stem; in the sandbox a deterministic synthesizer stands in (no external
data). The char-offset -> BIO projection is exact, unlike the notebook's
cumulative-position approximation, but agrees with it on
single-space-separated text.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

BIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("tokens", ArrayType(StringType()), False),
        StructField("labels", ArrayType(StringType()), False),
    ]
)

_ENTITIES = [
    ("Alice Smith", "PERSON"),
    ("Acme Corp", "ORG"),
    ("Berlin", "CITY"),
    ("Volga", "RIVER"),
    ("Kant", "PERSON"),
]
_FILLERS = ["met", "near", "works at", "visited", "wrote about", "left"]


def synth_brat_doc(i: int) -> tuple[str, str]:
    """Deterministic (text, ann) pair #i."""
    e1 = _ENTITIES[i % len(_ENTITIES)]
    e2 = _ENTITIES[(i * 3 + 1) % len(_ENTITIES)]
    filler = _FILLERS[i % len(_FILLERS)]
    text = f"{e1[0]} {filler} {e2[0]} ."
    s1, l1 = 0, len(e1[0])
    s2 = l1 + 1 + len(filler) + 1
    ann = (
        f"T1\t{e1[1]} {s1} {l1}\t{e1[0]}\n"
        f"T2\t{e2[1]} {s2} {s2 + len(e2[0])}\t{e2[0]}\n"
    )
    return text, ann


def synth_brat_df(spark: SparkSession, n_docs: int = 32) -> DataFrame:
    from ..session import local_df

    rows = [(i, *synth_brat_doc(i)) for i in range(n_docs)]
    return local_df(spark, rows, "doc_id long, text string, ann string")


def parse_ann(ann: str) -> list[tuple[int, int, str]]:
    """Standoff T-lines -> (start, end, tag); discontinuous spans (';')
    take their first fragment, as the notebook does."""
    spans = []
    for line in ann.splitlines():
        if not line.startswith("T"):
            continue
        try:
            _, meta, _surface = line.split("\t", 2)
        except ValueError:
            continue
        meta = meta.split(";")[0]
        parts = meta.split()
        if len(parts) < 3:
            continue
        spans.append((int(parts[1]), int(parts[2]), parts[0]))
    return sorted(spans)


def tokens_to_bio(text: str, spans: list[tuple[int, int, str]]) -> tuple[list, list]:
    import re

    toks, labels = [], []
    for m in re.finditer(r"\w+|[^\w\s]", text):
        toks.append(m.group(0))
        lab = "O"
        for s, e, tag in spans:
            if m.start() >= s and m.end() <= e:
                lab = ("B-" if m.start() == s else "I-") + tag
                break
        labels.append(lab)
    return toks, labels


MAX_SUBTOKENS = 256
IGNORE_LABEL = -100


def subtokenize(token: str, chunk: int = 4) -> list[str]:
    """Deterministic BPE-ish stand-in: fixed-width chunks with the HF
    continuation marker. The real pipeline swaps in a HF tokenizer here
    (notebook cell 9); the alignment logic below is tokenizer-agnostic."""
    parts = [token[i : i + chunk] for i in range(0, len(token), chunk)] or [token]
    return [parts[0]] + ["##" + p for p in parts[1:]]


def align_subtoken_labels(
    tokens: list[str], labels: list[str], max_len: int = MAX_SUBTOKENS
) -> tuple[list[str], list[int]]:
    """F12 (notebook cell 9): first subtoken carries the label id, the
    rest -100; truncate to max_len. Label ids = stable sorted-vocabulary
    index ('O' -> 0)."""
    vocab = {"O": 0}
    for lab in sorted(set(labels)):
        vocab.setdefault(lab, len(vocab))
    sub_toks: list[str] = []
    sub_labels: list[int] = []
    for tok, lab in zip(tokens, labels):
        for i, st in enumerate(subtokenize(tok)):
            sub_toks.append(st)
            sub_labels.append(vocab[lab] if i == 0 else IGNORE_LABEL)
    return sub_toks[:max_len], sub_labels[:max_len]


def bio_to_subtokens(bio: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """(doc_id, tokens, labels) -> (doc_id, subtokens, label_ids),
    Arrow-batched — the training-input shaping stage (F12)."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "subtokens": [], "label_ids": []}
            for doc_id, toks, labels in zip(pdf["doc_id"], pdf["tokens"], pdf["labels"]):
                st, sl = align_subtoken_labels(list(toks), list(labels))
                out["doc_id"].append(int(doc_id))
                out["subtokens"].append(st)
                out["label_ids"].append(sl)
            yield pd.DataFrame(out)

    if num_partitions:
        bio = bio.repartition(num_partitions, "doc_id")
    return bio.mapInPandas(
        run,
        schema="doc_id long, subtokens array<string>, label_ids array<int>",
    )


def brat_bio(corpus: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """(doc_id, text, ann) -> (doc_id, tokens, labels), Arrow-batched."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "tokens": [], "labels": []}
            for doc_id, text, ann in zip(pdf["doc_id"], pdf["text"], pdf["ann"]):
                toks, labels = tokens_to_bio(text, parse_ann(ann))
                out["doc_id"].append(int(doc_id))
                out["tokens"].append(toks)
                out["labels"].append(labels)
            yield pd.DataFrame(out)

    if num_partitions:
        corpus = corpus.repartition(num_partitions, "doc_id")
    return corpus.mapInPandas(run, schema=BIO_SCHEMA)
