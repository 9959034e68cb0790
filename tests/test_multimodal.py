"""Multimodal decode: real dependency-free PNG IHDR, WAV RIFF, GIF
logical-screen/block-walk and BMP InfoHeader parsers behind the codec
hook, distributed through the same Arrow-batched mapInPandas plumbing as
the stub lane (round-4: every fixture kind decodes real metadata)."""

from __future__ import annotations

import hashlib
import struct

from ner_app_spark.operators.multimodal import (
    _decode_bmp_header,
    _decode_gif_header,
    _decode_png_header,
    _decode_stub,
    _decode_wav_header,
    decode_features,
    synth_bmp,
    synth_gif,
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


def test_gif_header_parse():
    assert _decode_gif_header(synth_gif(320, 200, n_frames=1)) == {
        "width": 320, "height": 200, "n_frames": 1,
    }
    assert _decode_gif_header(synth_gif(16, 8, n_frames=5))["n_frames"] == 5
    # not a GIF / truncated / malformed block stream
    assert _decode_gif_header(b"GIF89a") is None
    assert _decode_gif_header(b"JIF89a" + b"\x00" * 20) is None
    bad = bytearray(synth_gif(8, 8, 2))
    bad[13] = 0x7F  # neither extension nor image descriptor nor trailer
    assert _decode_gif_header(bytes(bad)) is None
    # global color table flag: walk must skip 3*2^(N+1) bytes
    gct = (
        b"GIF89a" + struct.pack("<HH", 4, 4) + b"\x80\x00\x00" + b"\x00" * 6
        + synth_gif(4, 4, 1)[13:]
    )
    assert _decode_gif_header(gct)["n_frames"] == 1


def test_bmp_header_parse():
    assert _decode_bmp_header(synth_bmp(800, 600)) == {
        "width": 800, "height": 600, "n_frames": 1,
    }
    # top-down DIB: negative height -> absolute value
    neg = bytearray(synth_bmp(10, 20))
    neg[22:26] = struct.pack("<i", -20)
    assert _decode_bmp_header(bytes(neg))["height"] == 20
    assert _decode_bmp_header(b"BM") is None
    assert _decode_bmp_header(b"PK" + b"\x00" * 40) is None


def test_stub_lane_unchanged_for_opaque_payloads():
    payload = hashlib.md5(b"opaque").digest() * 4
    d = _decode_stub(payload, "image")
    h = hashlib.md5(payload).digest()
    assert d["width"] == 64 + h[0] % 192 and d["height"] == 64 + h[1] % 192
    assert d["n_frames"] == 1
    hh = hashlib.md5(hashlib.md5(payload).digest() + bytes([0])).digest()
    (u,) = struct.unpack("<I", hh[:4])
    assert abs(d["feature"][0] - ((u / 2**32) * 2.0 - 1.0)) < 1e-12


def test_distributed_decode_real_and_stub_lanes(spark):
    media = synth_media_df(spark, 24)
    feats = {r["media_id"]: r for r in decode_features(media, num_partitions=4).collect()}
    # media_id 0: image, i%4==0 -> real PNG (32+0, 16+0); media_id 6:
    # image, i%4==2 -> real BMP (24+6, 12+6)
    assert (feats[0]["width"], feats[0]["height"], feats[0]["n_frames"]) == (32, 16, 1)
    assert (feats[6]["width"], feats[6]["height"], feats[6]["n_frames"]) == (30, 18, 1)
    # media_id 1 is an odd audio -> real WAV with 100+7 sample frames
    assert feats[1]["n_frames"] == 107 and feats[1]["width"] is None
    # media_id 8 is an even video with i%4==0 -> real GIF, 2 + 8%5 = 5 frames
    assert (feats[8]["width"], feats[8]["height"], feats[8]["n_frames"]) == (56, 35, 5)
    # media_id 2 is an even video with i%4!=0 -> real MP4 box tree
    assert (feats[2]["width"], feats[2]["height"], feats[2]["n_frames"]) == (322, 182, 12)
    # media_id 5 is an odd video -> stub lane, md5-derived frames
    payload = hashlib.md5(b"42:5").digest() * (4 + 5 % 7)
    h = hashlib.md5(payload).digest()
    assert feats[5]["n_frames"] == 1 + h[2] % 32
    assert len(feats[2]["feature"]) == 16


def test_registry_row_check_holds(spark):
    """q_multimodal_features embeds an in-query payload recompute of every
    decode lane and raises on drift; a clean run must return all rows with
    n_violations == 0."""
    from ner_app_spark.queries import QUERIES

    rows = QUERIES["multimodal_features"](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 64
    assert all(r["n_violations"] == 0 and r["check"] == 1 for r in rows)


def test_mp4_header_parse():
    from ner_app_spark.operators.multimodal import (
        _decode_mp4_header,
        synth_mp4,
    )

    assert _decode_mp4_header(synth_mp4(1920, 1080, 240)) == {
        "width": 1920, "height": 1080, "n_frames": 240,
    }
    # version-1 tkhd (64-bit times): width offset shifts by 12
    p = bytearray(synth_mp4(64, 32, 7))
    i = p.index(b"tkhd") + 4
    v1_body = (
        b"\x01\x00\x00\x07" + b"\x00" * 8 * 2 + struct.pack(">II", 1, 0)
        + b"\x00" * 8 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
        + b"\x00" * 36 + struct.pack(">II", 64 << 16, 32 << 16)
    )
    v1 = struct.pack(">I", 8 + len(v1_body)) + b"tkhd" + v1_body
    # rebuild: swap the v0 tkhd (92 bytes) for the v1 one and fix sizes
    start = i - 8
    grown = len(v1) - 92
    p2 = bytearray(p[:start]) + v1 + p[start + 92:]
    for pos in (16, p.index(b"trak") - 4):  # moov, trak size fields
        old = struct.unpack(">I", p2[pos:pos + 4])[0]
        p2[pos:pos + 4] = struct.pack(">I", old + grown)
    assert _decode_mp4_header(bytes(p2)) == {
        "width": 64, "height": 32, "n_frames": 7,
    }
    # malformed: box overruns its parent
    bad = bytearray(synth_mp4(8, 8, 1))
    bad[16:20] = struct.pack(">I", 10 ** 6)
    assert _decode_mp4_header(bytes(bad)) is None
    assert _decode_mp4_header(b"\x00\x00\x00\x08freeisom") is None


def test_mp4_audio_track_does_not_pollute_frame_count():
    """Review finding: a real MP4 carries an audio track whose stsz holds
    MILLIONS of sample counts; only 'vide'-handler tracks may contribute
    to n_frames (and tkhd dims)."""
    from ner_app_spark.operators.multimodal import (
        _decode_mp4_header,
        synth_mp4,
    )

    base = synth_mp4(320, 180, 24)

    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    # an audio trak: hdlr 'soun' + stsz with 1e6 samples
    hdlr = box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12 + b"\x00")
    stsz = box(b"stsz", b"\x00" * 4 + struct.pack(">II", 1, 1_000_000))
    audio = box(b"trak", hdlr + box(b"mdia", box(b"minf", box(b"stbl", stsz))))
    # splice the audio trak into moov (grow moov + file sizes)
    moov_start = 16
    moov_size = struct.unpack(">I", base[moov_start:moov_start + 4])[0]
    p = bytearray(base)
    p[moov_start:moov_start + 4] = struct.pack(">I", moov_size + len(audio))
    p = bytes(p[: moov_start + moov_size]) + audio
    d = _decode_mp4_header(p)
    assert d == {"width": 320, "height": 180, "n_frames": 24}


def test_bmp_requires_known_dib_header():
    """'BM' + junk must fall through to the stub lane, not parse garbage
    dimensions at INFOHEADER offsets."""
    from ner_app_spark.operators.multimodal import _decode_bmp_header

    junk = b"BM" + bytes(range(12, 60))
    assert _decode_bmp_header(junk) is None
    good = synth_bmp(10, 20)
    assert _decode_bmp_header(good) == {"width": 10, "height": 20, "n_frames": 1}


def test_frame_sample_survives_zero_frame_payload(spark):
    """A kind='video' row whose payload decodes to 0 frames (empty WAV
    data chunk routed by payload bytes, not kind) must yield no sampled
    frames instead of crashing the query on sequence(0, -1)."""
    from ner_app_spark.operators.multimodal import frame_sample, synth_wav
    from ner_app_spark.session import local_df

    media = local_df(
        spark,
        [(0, "video", synth_wav(0), "audio/wav"),
         (1, "video", synth_gif(8, 8, n_frames=3), "image/gif")],
        "media_id long, kind string, payload binary, mime string",
    )
    rows = frame_sample(media, every_n=1).collect()
    assert sorted(r.media_id for r in rows) == [1, 1, 1]


def test_jpeg_header_parse():
    from ner_app_spark.operators.multimodal import _decode_jpeg_header, synth_jpeg

    assert _decode_jpeg_header(synth_jpeg(800, 600)) == {
        "width": 800, "height": 600, "n_frames": 1,
    }
    # marker WALK, not a fixed offset: insert an extra COM segment before
    # SOF0 and the decoder must still find the dims
    j = synth_jpeg(33, 44)
    com = b"\xff\xfe" + (2 + 5).to_bytes(2, "big") + b"hello"
    shifted = j[:2] + com + j[2:]
    assert _decode_jpeg_header(shifted) == {"width": 33, "height": 44, "n_frames": 1}
    # not a JPEG / truncated / SOS before SOF / zero dims -> stub lane
    assert _decode_jpeg_header(b"not jpeg") is None
    assert _decode_jpeg_header(synth_jpeg(8, 8)[:10]) is None
    sos_first = b"\xff\xd8" + b"\xff\xda" + (4).to_bytes(2, "big") + b"\x00\x00"
    assert _decode_jpeg_header(sos_first) is None
    assert _decode_jpeg_header(synth_jpeg(0, 5)) is None


def test_jpeg_parser_fuzz_never_crashes():
    """Adversarial byte-flips over a valid JPEG must either parse to the
    same layout-independent fields or return None — never raise."""
    import hashlib as _hl

    from ner_app_spark.operators.multimodal import _decode_jpeg_header, synth_jpeg

    base = bytearray(synth_jpeg(100, 50))
    for trial in range(300):
        h = _hl.md5(f"jpegfuzz:{trial}".encode()).digest()
        mut = bytearray(base)
        for k in range(1 + h[0] % 4):
            pos = int.from_bytes(h[4 * k : 4 * k + 2], "little") % len(mut)
            mut[pos] ^= h[4 * k + 2] or 1
        out = _decode_jpeg_header(bytes(mut))
        assert out is None or (
            isinstance(out.get("width"), int) and out["n_frames"] == 1
        )
    # truncations at every length
    for cut in range(len(base)):
        out = _decode_jpeg_header(bytes(base[:cut]))
        assert out is None or isinstance(out.get("width"), int)


def test_jpeg_fixture_lane_in_distributed_decode(spark):
    # media_id 9: image with i%2==1, i%4==1 -> real JFIF JPEG (31+9, 17+9)
    media = synth_media_df(spark, 12)
    feats = {r["media_id"]: r for r in decode_features(media).collect()}
    assert (feats[9]["width"], feats[9]["height"], feats[9]["n_frames"]) == (40, 26, 1)
    # media_id 3: image with i%4==3 stays on the md5 stub lane
    payload = hashlib.md5(b"42:3").digest() * (4 + 3 % 7)
    h = hashlib.md5(payload).digest()
    assert feats[3]["width"] == 64 + h[0] % 192
