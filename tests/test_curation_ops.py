"""Round-5 curation operators: benchmark decontamination
(operators/decontam.py), PII lanes (operators/pii.py), and the
Gopher-class repetition signals added to quality_score — red-capable
crafted fixtures on top of the sf0.01 DuckDB parity rows
(test_oracle_parity: decontaminate / pii_scan / quality_score)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_app_spark.operators.decontam import decontaminate, eval_shingle_dim
from ner_app_spark.operators.pii import pii_scan, redact_pii
from ner_app_spark.operators.textquality import quality_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = [f"w{i}" for i in range(30)]
LEAK = " ".join(WORDS[:13])  # one full 13-gram, verbatim


def test_decontaminate_flags_verbatim_13gram_overlap(spark):
    ev = _docs(spark, [(100, LEAK + " tail words here")])
    train = _docs(
        spark,
        [
            (1, "prefix " + LEAK + " suffix"),  # carries the eval 13-gram
            (2, " ".join(WORDS[13:26]) + " clean " + " ".join(WORDS[:12])),
            (3, "short doc"),  # under 13 tokens: no shingle at all
        ],
    )
    got = {
        r["doc_id"]: (r["n_collisions"], r["contaminated"])
        for r in decontaminate(train, eval_shingle_dim(ev)).collect()
    }
    assert got[1][1] is True and got[1][0] >= 1
    assert got[2] == (0, False)
    assert got[3] == (0, False)
    # every input doc gets a row (left join, not inner)
    assert set(got) == {1, 2, 3}


def test_decontaminate_min_collisions_threshold(spark):
    # doc 1 shares exactly one distinct 13-gram -> clean at threshold 2
    ev = _docs(spark, [(100, LEAK)])
    train = _docs(spark, [(1, LEAK)])
    got = decontaminate(train, eval_shingle_dim(ev), min_collisions=2).collect()[0]
    assert got["n_collisions"] == 1 and got["contaminated"] is False


def test_decontaminate_eval_dim_is_broadcast(spark):
    ev = _docs(spark, [(100, LEAK)])
    train = _docs(spark, [(1, LEAK)])
    plan = (
        decontaminate(train, eval_shingle_dim(ev))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_pii_scan_counts_lanes(spark):
    docs = _docs(
        spark,
        [
            (1, "mail alice@corp.example.org and bob.smith+x@a.io please"),
            (2, "call +4915712345678 or +1555123456789"),
            (3, "server 192.168.0.1 peer 10.0.255.254"),
            (4, "no personal data at all"),
            (5, "mix a@b.com +1234567 1.2.3.4"),
        ],
    )
    got = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (2, 0, 0)
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ips"]) == (0, 2, 0)
    assert (got[3]["n_emails"], got[3]["n_phones"], got[3]["n_ips"]) == (0, 0, 2)
    assert got[4]["has_pii"] is False
    assert got[5]["has_pii"] is True and got[5]["n_emails"] == 1


def test_redact_pii_rewrites_all_lanes(spark):
    docs = _docs(spark, [(1, "a@b.com then +1234567 then 1.2.3.4 end")])
    out = redact_pii(docs).collect()[0]["text"]
    assert out == "[EMAIL] then [PHONE] then [IP] end"


def test_quality_score_dup_line_fraction(spark):
    boiler = "subscribe to our newsletter"
    docs = _docs(
        spark,
        [
            (1, boiler + "\n" + boiler + "\n" + boiler + "\nreal content"),
            (2, "one line only"),
            (3, "alpha\nbeta\ngamma"),
        ],
    )
    got = {r["doc_id"]: r for r in quality_score(docs).collect()}
    # 4 lines, 2 distinct -> 0.5
    assert got[1]["dup_line_frac"] == 0.5
    assert got[2]["dup_line_frac"] == 0.0
    assert got[3]["dup_line_frac"] == 0.0


def test_quality_score_top2gram_fraction(spark):
    docs = _docs(
        spark,
        [
            (1, "click here click here click here"),  # 6 tokens, max2=3
            (2, "all words fully distinct here now"),
            (3, "solo"),  # no 2-gram at all
        ],
    )
    got = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert got[1]["top2gram_frac"] == 1.0  # min(2*3/6, 1)
    assert got[2]["top2gram_frac"] == round(2 / 6, 6)
    assert got[3]["top2gram_frac"] == 0.0


def test_quality_score_pinned_formula_unchanged(spark):
    # the round-4 quality value must be bit-stable after the column adds
    docs = _docs(spark, [(1, "the quick brown fox and the lazy dog")])
    r = quality_score(docs).collect()[0]
    n_tok, n_stop, n_chars, n_punct = 8, 3, len("the quick brown fox and the lazy dog"), 0
    want = round(
        min(n_tok / 50.0, 1.0) * 0.5 + (n_stop / n_tok) * 0.3 + 1.0 * 0.2, 6
    )
    assert r["quality"] == want
