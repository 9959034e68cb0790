"""WARC source: read Common-Crawl-shaped WARC files into the pages schema.

BASELINE.json's production input is an Iceberg table of Common-Crawl-style
pages — and Common Crawl itself ships WARC (ISO 28500): per-record-gzipped
``response`` records whose payload is the full HTTP response (status line +
headers + body). A real ingestion pipeline therefore needs a WARC reader
in front of the Iceberg landing table. This one is dependency-free
(stdlib ``zlib`` only) and reads both per-record-gzip (Common Crawl's
layout) and plain concatenated records.

Scale model (10^12 pages): Common Crawl publishes each monthly crawl as
~90k WARC segment files of ~1 GiB — the natural unit of parallelism is
the FILE, exactly what ``spark.read.format("binaryFile")`` gives: one
task per file, no cross-file coordination, linear scale-out with
executor count. Record-level splits inside one gzip stream are not
seekable without a sidecar index, so the reader deliberately does NOT
pretend to split them; at CC's file sizing, file-level parallelism
already yields ~90k tasks per crawl — far beyond any executor count this
pipeline targets. The parse itself is an Arrow-batched mapInPandas
(mandatory-batching rule, BASELINE.json): one Python pass per FILE, not
per record row.

Headers written/consumed:
  * WARC-Target-URI            -> url
  * WARC-Date (ISO-8601 Z)     -> warc_ts
  * WARC-Identified-Content-Language (ISO 639-3, the header Common
    Crawl added in CC-MAIN-2018-39)  -> lang (639-1 in the pages table)
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_READ_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("lang", StringType(), False),
    ]
)

#: ISO 639-1 (pages table) <-> 639-3 (WARC-Identified-Content-Language)
_LANG_TO_WARC = {"ru": "rus", "en": "eng", "es": "spa"}
_WARC_TO_LANG = {v: k for k, v in _LANG_TO_WARC.items()}

_CRLF = b"\r\n"


# --------------------------------------------------------------- writing


def record_bytes(
    url: str, warc_ts: dt.datetime, html: bytes, lang: str, seq: int
) -> bytes:
    """One WARC/1.0 ``response`` record: the payload is a minimal HTTP/1.1
    response wrapping the html bytes (Common Crawl's record shape)."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        + f"Content-Length: {len(html)}\r\n\r\n".encode()
        + html
    )
    headers = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {warc_ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-{seq:012d}>\r\n"
        f"WARC-Identified-Content-Language: {_LANG_TO_WARC.get(lang, 'und')}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return headers + http + _CRLF + _CRLF


def write_warc(path: str, rows: list[dict], per_record_gzip: bool = True) -> int:
    """Write page rows as a WARC file (Common Crawl layout when
    ``per_record_gzip``: one gzip member per record, so a reader can
    stream members without decompressing the whole file). Returns the
    record count. Driver-side fixture/job helper — at scale the writer
    is the crawler, not this pipeline."""
    n = 0
    with open(path, "wb") as f:
        for seq, r in enumerate(rows):
            rec = record_bytes(
                r["url"], r["warc_ts"], bytes(r["html"]), r["lang"], seq
            )
            if per_record_gzip:
                buf = io.BytesIO()
                # mtime=0: deterministic bytes (no wall clock in the header)
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                f.write(buf.getvalue())
            else:
                f.write(rec)
            n += 1
    return n


# --------------------------------------------------------------- parsing


def _gunzip_members(raw: bytes) -> bytes:
    """Decompress a concatenation of gzip members (CC layout)."""
    out = []
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out.append(d.decompress(raw[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(raw) - len(tail)
    return b"".join(out)


def parse_warc_bytes(raw: bytes) -> Iterator[dict]:
    """Yield {url, warc_ts, html, lang} for every ``response`` record.
    Malformed trailing bytes stop the walk (truncated files are a fact of
    crawl life) — records parsed up to that point are still yielded."""
    if raw[:2] == b"\x1f\x8b":
        raw = _gunzip_members(raw)
    pos = 0
    while True:
        # skip inter-record CRLF padding
        while raw[pos : pos + 2] == _CRLF:
            pos += 2
        if not raw[pos : pos + 5] == b"WARC/":
            return
        head_end = raw.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in raw[pos:head_end].decode("utf-8").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            return
        body = raw[head_end + 4 : head_end + 4 + length]
        if len(body) < length:
            return
        pos = head_end + 4 + length
        if headers.get("warc-type") == "response":
            http_split = body.find(_CRLF + _CRLF)
            html = body[http_split + 4 :] if http_split >= 0 else body
            yield {
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": dt.datetime.strptime(
                    headers["warc-date"], "%Y-%m-%dT%H:%M:%SZ"
                ),
                "html": html,
                "lang": _WARC_TO_LANG.get(
                    headers.get("warc-identified-content-language", ""), "und"
                ),
            }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """(url, warc_ts, html, lang) from WARC file(s) at ``path`` (a file,
    a directory, or a glob — whatever binaryFile accepts). One task per
    file; the parse is Arrow-batched per file."""

    def parse(batches) -> Iterator:
        import pandas as pd

        cols = ["url", "warc_ts", "html", "lang"]
        for pdf in batches:
            rows = [
                rec
                for content in pdf["content"]
                for rec in parse_warc_bytes(bytes(content))
            ]
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInPandas(parse, schema=WARC_READ_SCHEMA)
    )
