"""S2/F7 content-address parity + kg self-check machinery (round 2).

The reference's analysis identity is md5(utf8(json.dumps(data,
sort_keys=True, ensure_ascii=False))) (text_service.py:8-11) and the
sink writes analysis_{md5}.json only when absent (api.py:22-29,
text_service.py:21-23). These tests pin the exact hash semantics, the
canonical-JSON pUDF, the distributed write-iff-absent sink, and that the
kg self-check columns really turn a drifted row red."""

from __future__ import annotations

import hashlib
import json

import pytest
from pyspark.sql import functions as F

from ner_app_spark.functions.jsonhash import (
    canonical_json,
    canonical_json_udf,
    content_address,
    json_hash,
)


def test_json_hash_matches_reference_recipe():
    data = {"б": 1, "a": [2, {"я": "ё"}], "m": None}
    want = hashlib.md5(
        json.dumps(data, sort_keys=True, ensure_ascii=False).encode("utf-8")
    ).hexdigest()
    assert json_hash(data) == want
    # ensure_ascii=False keeps cyrillic bytes; sort_keys orders 'a' first
    assert canonical_json(data).startswith('{"a":')
    assert "ё" in canonical_json(data)


def test_canonical_json_udf_sorts_keys(spark):
    df = spark.createDataFrame(
        [(1, ("я", 2.5)), (2, ("b", 0.125))],
        "id long, s struct<z:string, a:double>",
    )
    got = {
        r["id"]: (r["cj"], r["addr"])
        for r in df.select(
            "id",
            canonical_json_udf("s").alias("cj"),
            content_address(F.col("s")).alias("addr"),
        ).collect()
    }
    want1 = json.dumps({"z": "я", "a": 2.5}, sort_keys=True, ensure_ascii=False)
    assert got[1][0] == want1
    assert got[1][1] == hashlib.md5(want1.encode()).hexdigest()
    assert got[2][0] == '{"a":0.125,"z":"b"}'.replace(":", ": ").replace(
        ",", ", "
    )  # python json.dumps default separators


def test_analysis_sink_is_content_addressed_and_idempotent(spark, tmp_path):
    from ner_app_spark.operators.extract import extract_phrases
    from ner_app_spark.plans.pipeline import analysis_sink, read_analysis
    from ner_app_spark.sources.pages import synth_pages_df

    out = str(tmp_path / "analysis")
    phrases = extract_phrases(synth_pages_df(spark, 12), num_partitions=4)
    first = analysis_sink(phrases, out).collect()
    assert first and all(r["written"] for r in first)
    # second run: identical ids, ZERO writes (the reference's resume
    # primitive: write iff absent)
    second = {r["url"]: (r["analysis_id"], r["written"])
              for r in analysis_sink(phrases, out).collect()}
    for r in first:
        aid, wrote = second[r["url"]]
        assert aid == r["analysis_id"] and not wrote
    # the file round-trips (S3) and its id is its own canonical hash
    some = first[0]
    payload = read_analysis(spark, out, some["analysis_id"])
    assert json_hash(payload) == some["analysis_id"]
    assert payload["total_phrases"] == len(payload["phrases"])


def test_kg_self_check_goes_red_on_drift(spark):
    """A deliberate semantics mutation must ERROR the kg rows, not pass
    rows-only (VERDICT round-1 'Next round' #7)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from ner_app_spark.queries import _check_col, _compare_fps
    from ner_app_spark.session import local_df

    ok_fp = local_df(
        spark, [("u1", 2, "aa")], "url string, n_spark long, fp_spark string"
    )
    bad_oracle = local_df(
        spark, [("u1", 3, "bb")], "url string, n_oracle long, fp_oracle string"
    )
    with pytest.raises(SparkRuntimeException, match="boom"):
        _compare_fps(ok_fp, bad_oracle, "boom").collect()
    # matching side passes and emits check=1
    good_oracle = local_df(
        spark, [("u1", 2, "aa")], "url string, n_oracle long, fp_oracle string"
    )
    rows = _compare_fps(ok_fp, good_oracle, "boom").collect()
    assert rows[0]["fp_match"] and rows[0]["check"] == 1
    assert _check_col is not None
