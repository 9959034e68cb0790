"""Multimodal decode (round-3): real dependency-free PNG IHDR and WAV
RIFF header parsers behind the codec hook, distributed through the same
Arrow-batched mapInPandas plumbing as the stub lane."""

from __future__ import annotations

import hashlib
import struct

from ner_app_spark.operators.multimodal import (
    _decode_png_header,
    _decode_stub,
    _decode_wav_header,
    decode_features,
    synth_media_df,
    synth_png,
    synth_wav,
)


def test_png_header_parse():
    assert _decode_png_header(synth_png(640, 480)) == {
        "width": 640, "height": 480, "n_frames": 1,
    }
    # truncated / non-PNG payloads fall through to the stub lane
    assert _decode_png_header(synth_png(8, 8)[:20]) is None
    assert _decode_png_header(b"not a png at all....") is None
    # PNG signature but wrong chunk tag
    bad = bytearray(synth_png(8, 8))
    bad[12:16] = b"XXXX"
    assert _decode_png_header(bytes(bad)) is None


def test_wav_header_parse():
    out = _decode_wav_header(synth_wav(1234, channels=2, bits=16))
    assert out == {"width": None, "height": None, "n_frames": 1234}
    assert _decode_wav_header(synth_wav(7, channels=1, bits=8))["n_frames"] == 7
    assert _decode_wav_header(b"RIFFxxxxNOPE") is None
    assert _decode_wav_header(b"short") is None


def test_stub_lane_unchanged_for_opaque_payloads():
    payload = hashlib.md5(b"opaque").digest() * 4
    d = _decode_stub(payload, "image")
    h = hashlib.md5(payload).digest()
    assert d["width"] == 64 + h[0] % 192 and d["height"] == 64 + h[1] % 192
    assert d["n_frames"] == 1
    hh = hashlib.md5(payload + bytes([0])).digest()
    (u,) = struct.unpack("<I", hh[:4])
    assert abs(d["feature"][0] - ((u / 2**32) * 2.0 - 1.0)) < 1e-12


def test_distributed_decode_real_and_stub_lanes(spark):
    media = synth_media_df(spark, 24)
    feats = {r["media_id"]: r for r in decode_features(media, num_partitions=4).collect()}
    # media_id 0 is an even image -> real PNG with width=32+0, height=16+0
    assert (feats[0]["width"], feats[0]["height"], feats[0]["n_frames"]) == (32, 16, 1)
    assert (feats[6]["width"], feats[6]["height"]) == (32 + 6, 16 + 6)
    # media_id 1 is an odd audio -> real WAV with 100+7 sample frames
    assert feats[1]["n_frames"] == 107 and feats[1]["width"] is None
    # media_id 2 is a video -> stub lane, md5-derived frames
    payload = hashlib.md5(b"42:2").digest() * 6
    h = hashlib.md5(payload).digest()
    assert feats[2]["n_frames"] == 1 + h[2] % 32
    assert len(feats[2]["feature"]) == 16


def test_registry_row_check_holds(spark):
    """q_multimodal_features embeds an in-query payload recompute of every
    decode lane and raises on drift; a clean run must return all rows with
    n_violations == 0."""
    from ner_app_spark.queries import QUERIES

    rows = QUERIES["multimodal_features"](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 64
    assert all(r["n_violations"] == 0 and r["check"] == 1 for r in rows)
