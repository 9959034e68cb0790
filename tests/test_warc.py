"""WARC source (sources/warc.py): record serialization, multi-member
gzip parsing, truncation tolerance, and the Spark read path."""

from __future__ import annotations

import datetime as dt
import gzip

import pytest

from ner_app_spark.sources import warc
from ner_app_spark.synth import synth_pages

TS = dt.datetime(2025, 1, 1, 12, 0, 0)


def _rows(n=12):
    return synth_pages(n)


def test_record_roundtrip_plain():
    rec = warc.record_bytes("https://a.example/x", TS, "<html>ж</html>".encode(), "ru", 7)
    got = list(warc.parse_warc_bytes(rec))
    assert len(got) == 1
    r = got[0]
    assert r["url"] == "https://a.example/x"
    assert r["warc_ts"] == TS
    assert r["html"] == "<html>ж</html>".encode()
    assert r["lang"] == "ru"


def test_file_roundtrip_gzip_and_plain(tmp_path):
    rows = _rows()
    for gz in (True, False):
        p = str(tmp_path / f"f{gz}.warc")
        assert warc.write_warc(p, rows, per_record_gzip=gz) == len(rows)
        got = list(warc.parse_warc_bytes(open(p, "rb").read()))
        assert [g["url"] for g in got] == [r["url"] for r in rows]
        assert all(g["html"] == bytes(r["html"]) for g, r in zip(got, rows))
        assert all(g["lang"] == r["lang"] for g, r in zip(got, rows))
        assert all(g["warc_ts"] == r["warc_ts"] for g, r in zip(got, rows))


def test_deterministic_bytes(tmp_path):
    a, b = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    warc.write_warc(a, _rows())
    warc.write_warc(b, _rows())
    assert open(a, "rb").read() == open(b, "rb").read()


def test_truncated_file_yields_prefix(tmp_path):
    p = str(tmp_path / "t.warc")
    warc.write_warc(p, _rows(6), per_record_gzip=False)
    raw = open(p, "rb").read()
    got = list(warc.parse_warc_bytes(raw[: len(raw) - 40]))
    assert 0 < len(got) < 6  # prefix records survive, the torn one doesn't


def test_non_response_records_skipped():
    meta = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    rec = warc.record_bytes("https://a.example/x", TS, b"<html></html>", "en", 0)
    got = list(warc.parse_warc_bytes(meta + rec))
    assert len(got) == 1 and got[0]["lang"] == "en"


def test_unknown_language_maps_und():
    rec = warc.record_bytes("https://a.example/x", TS, b"<html></html>", "de", 0)
    assert list(warc.parse_warc_bytes(rec))[0]["lang"] == "und"


def test_read_warc_spark(tmp_path, spark):
    rows = _rows(20)
    for k in range(3):
        warc.write_warc(str(tmp_path / f"seg{k}.warc.gz"), rows[k::3])
    got = warc.read_warc(spark, str(tmp_path)).collect()
    assert len(got) == 20
    by_url = {r["url"]: r for r in got}
    for r in rows:
        g = by_url[r["url"]]
        assert bytes(g["html"]) == bytes(r["html"])
        assert g["lang"] == r["lang"]
        assert g["warc_ts"] == r["warc_ts"]


def test_read_warc_file_level_tasks(tmp_path, spark):
    # one binaryFile row per segment -> the parse fans out per file
    rows = _rows(8)
    for k in range(4):
        warc.write_warc(str(tmp_path / f"seg{k}.warc.gz"), rows[k::4])
    n_files = spark.read.format("binaryFile").load(str(tmp_path)).count()
    assert n_files == 4
