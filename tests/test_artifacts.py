"""S6 model-artifact sink/source: content-addressed save/load,
write-audit-publish, corruption detection, and the end-to-end path a
real model takes — save -> ship to executors -> consumed by the NER
inference stage (notebook cells 11-12 analog)."""

from __future__ import annotations

import json
import os

import pytest

from ner_app_spark.operators.ner import (
    LABELS,
    aggregate_average,
    artifact_score_fn,
    ner_entities,
)
from ner_app_spark.plans.artifacts import (
    artifact_id_for,
    artifact_meta,
    load_artifact,
    save_artifact,
    ship_artifact,
)

FILES = {"model.json": json.dumps({"label_bias": {"PER": 4.0}}).encode(),
         "config.json": b'{"dim": 4}'}


def test_save_load_roundtrip_and_idempotence(tmp_path):
    root = str(tmp_path / "store")
    aid = save_artifact(root, FILES, meta={"name": "stub-ner", "v": 1})
    assert aid == artifact_id_for(FILES, {"name": "stub-ner", "v": 1})
    # identical re-save: same id, no error, nothing staged left behind
    assert save_artifact(root, FILES, meta={"name": "stub-ner", "v": 1}) == aid
    assert [d for d in os.listdir(root) if d.startswith("_tmp_")] == []
    back = load_artifact(root, aid)
    assert back == FILES
    assert artifact_meta(root, aid) == {"name": "stub-ner", "v": 1}
    # different meta -> different address (content includes metadata)
    assert save_artifact(root, FILES, meta={"v": 2}) != aid


def test_corruption_raises(tmp_path):
    root = str(tmp_path / "store")
    aid = save_artifact(root, FILES)
    with open(os.path.join(root, aid, "config.json"), "wb") as f:
        f.write(b"tampered")
    with pytest.raises(IOError, match="corrupted"):
        load_artifact(root, aid)


def test_bad_names_rejected(tmp_path):
    root = str(tmp_path / "store")
    for bad in ("a/b", "..", "MANIFEST.json"):
        with pytest.raises(ValueError):
            save_artifact(root, {bad: b"x"})


def test_ner_consumes_shipped_artifact(spark, tmp_path):
    root = str(tmp_path / "store")
    aid = save_artifact(root, FILES, meta={"name": "stub-ner"})
    ship_artifact(spark, root, aid)

    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["Анна видела Бориса.",
                                                 "Москва большой город."]})
    )
    got = ner_entities(docs, model_artifact_id=aid).collect()
    assert got, "biased model should still emit entities"

    # distributed result == local recomputation with the same artifact
    import re

    from ner_app_spark.sources.brat import subtokenize

    fn = artifact_score_fn(os.path.join(root, aid))
    want = []
    for did, text in ((1, "Анна видела Бориса."), (2, "Москва большой город.")):
        words = [subtokenize(w) for w in re.findall(r"\w+|[^\w\s]", text)]
        for g in aggregate_average(words, score_fn=fn):
            want.append((did, g["entity_group"], g["word"], g["score"]))
    assert sorted((r["doc_id"], r["entity_group"], r["word"], r["score"])
                  for r in got) == sorted(want)

    # and the bias genuinely changes inference vs the default stub
    base = ner_entities(docs).collect()
    assert sorted((r["entity_group"], r["word"]) for r in got) != sorted(
        (r["entity_group"], r["word"]) for r in base
    ) or sorted(r["score"] for r in got) != sorted(r["score"] for r in base)
    assert "PER" in LABELS
