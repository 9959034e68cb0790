"""Replicates the driver's correctness gate: every queries() entry with an
oracle_sql() runs on Spark AND DuckDB at sf0.01; row counts, column
names/kinds, and order-insensitive values must match."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from ner_app_spark.oracles import oracle_sql_map
from ner_app_spark.queries import QUERIES

# rendered at collection time (the IVF entry inlines the trained codebook
# replayed from SF_DIR — call-time I/O by design, see oracles.oracle_sql_map)
ORACLES = oracle_sql_map()

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # doubles are engineered to be bit-identical; round(12) only
        # guards against float64<->object round-trips in pandas
        return round(v, 12)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _canon_frame(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        tuple(_canon_value(v) for v in row) for row in pdf.itertuples(index=False)
    )
    kinds = {c: pdf[c].dtype.kind for c in cols}
    return cols, kinds, rows


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_duckdb_oracle(spark, duck, name):
    assert name in QUERIES, f"oracle without query: {name}"
    got = QUERIES[name](spark, SF_DIR).toPandas()
    want = duck.execute(ORACLES[name]).df()
    gc, gk, gr = _canon_frame(got)
    wc, wk, wr = _canon_frame(want)
    assert gc == wc, f"columns differ: spark={gc} duck={wc}"
    assert len(gr) == len(wr), f"row counts differ: spark={len(gr)} duck={len(wr)}"
    mism = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
    assert not mism, (
        f"{len(mism)} mismatched rows; first: spark={gr[mism[0]]} duck={wr[mism[0]]}"
    )


def test_kg_sql_builders_track_python_oracle():
    """DuckDB-only (no Spark): the SQL replay of the analyze pipeline
    matches the vendored Python oracle bit-exactly — including float
    equality on tfidf — at a page count OTHER than the driver's n=200,
    proving the builders are general, not fitted to one corpus."""
    from ner_app_spark import oracle, synth
    from ner_app_spark.oracles import _kg_phrases_sql, _kg_triples_sql

    n = 60
    con = duckdb.connect()
    got_p = set(map(tuple, con.execute(_kg_phrases_sql(n)).fetchall()))
    got_t = set(map(tuple, con.execute(_kg_triples_sql(n)).fetchall()))
    exp_p, exp_t = set(), set()
    for p in synth.synth_pages(n):
        if p["lang"] != "ru" or not p["text"]:
            continue
        ph = oracle.analyze(p["text"])
        exp_p |= {
            (p["url"], x.phrase, x.type, x.tfidf, x.length, x.head_noun)
            for x in ph
        }
        exp_t |= set(oracle.triples_for_doc(p["url"], ph))
    assert got_p == exp_p
    assert got_t == exp_t


def test_every_query_has_an_oracle():
    """Full coverage invariant (reached in round 4): EVERY registry entry
    carries a DuckDB hash oracle — a new query without one, or a renamed
    oracle key, fails here before the driver ever sees a no_oracle row."""
    assert set(QUERIES) == set(ORACLES), (
        f"queries without oracle: {sorted(set(QUERIES) - set(ORACLES))}; "
        f"oracles without query: {sorted(set(ORACLES) - set(QUERIES))}"
    )
