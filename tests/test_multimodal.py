"""Multimodal plumbing: binary payload schema, Arrow-batched feature
extraction, chunking — real plumbing around a stubbed decoder."""

from __future__ import annotations

import math

import pytest

from columnar_analytics_engine_spark.io import read_table
from columnar_analytics_engine_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_payload,
    chunk_payload,
    decode_image_batch,
    extract_features,
    fake_feature_extract,
)


@pytest.fixture(scope="module")
def media(spark, sf_small):
    return attach_payload(read_table(spark, sf_small, "documents"))


def test_payload_schema(media):
    assert [f.name for f in media.schema.fields] == ["doc_id", "payload", "media_type", "n_bytes"]
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])


def test_feature_extraction_shape_and_determinism(media):
    feats = extract_features(media)
    rows = feats.limit(5).collect()
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert math.isclose(sum(r["features"]), 1.0, rel_tol=1e-5)
    # deterministic: same payload → same features
    again = {r["doc_id"]: r["features"] for r in extract_features(media).limit(5).collect()}
    for r in rows:
        assert again[r["doc_id"]] == r["features"]


def test_feature_extraction_row_count(media):
    assert extract_features(media).count() == media.count()


def test_chunking_covers_payload(media):
    chunks = chunk_payload(media, chunk_bytes=256)
    sizes = chunks.groupBy("doc_id").count().collect()
    byte_counts = {r["doc_id"]: r["n_bytes"] for r in media.collect()}
    for r in sizes:
        expected = -(-byte_counts[r["doc_id"]] // 256)
        assert r["count"] == expected


def test_real_decoder_is_stubbed():
    """Without Pillow, non-BMP formats raise the documented extension
    point (BMPs decode natively — see the tests below)."""
    import pandas as pd

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present: decode is real, not a stub")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.Series([b"xx"]))


def _bmp24_bytes(rows_rgb, bottom_up=True):
    """Byte-exact uncompressed 24-bit BMP: ``rows_rgb`` is a list of
    rows (top to bottom), each a list of (r, g, b) tuples."""
    import struct

    h = len(rows_rgb)
    w = len(rows_rgb[0])
    stride = (w * 3 + 3) & ~3
    stored = rows_rgb[::-1] if bottom_up else rows_rgb
    pix = b"".join(
        b"".join(bytes((b, g, r)) for (r, g, b) in row) + b"\x00" * (stride - w * 3)
        for row in stored
    )
    pix_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", pix_off + len(pix), 0, 0, pix_off)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, h if bottom_up else -h, 1, 24, 0, len(pix), 2835, 2835, 0, 0,
        )
    )
    return header + pix


def test_bmp_decode_is_dependency_free():
    """The pure-NumPy BMP tier decodes byte-exactly with no image
    library: padding stripped, BGR->RGB swapped, bottom-up and top-down
    row orders both honored, corrupt payloads degrade to None."""
    import numpy as np
    import pandas as pd

    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],   # top row
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    for bottom_up in (True, False):
        payload = _bmp24_bytes(rows, bottom_up=bottom_up)
        out = decode_image_batch(pd.Series([payload]))[0]
        assert out.shape == (2, 3, 3) and out.dtype == np.uint8
        assert out.tolist() == [[list(p) for p in r] for r in rows]
    # corrupt: right magic, truncated pixels -> None, not an exception
    truncated = _bmp24_bytes(rows)[:-8]
    series = decode_image_batch(pd.Series([truncated, None]))
    assert series[0] is None and series[1] is None


def test_feature_extract_over_bmp_without_pillow():
    """pil_feature_extract works through the BMP tier: a solid-white
    image lands all mass in the top luminance bin."""
    from columnar_analytics_engine_spark.operators.multimodal import (
        pil_feature_extract,
    )

    white = _bmp24_bytes([[(255, 255, 255)] * 4] * 2)
    feats = pil_feature_extract(white)
    assert len(feats) == FEATURE_DIM
    assert abs(sum(feats) - 1.0) < 1e-9
    assert feats[-1] == 1.0


def test_real_decoder_with_pillow():
    """Runs only where Pillow exists: decode a tiny real PNG, broken
    payloads and None degrade to None instead of failing the batch."""
    import pandas as pd

    Image = pytest.importorskip("PIL.Image")
    import io as _io

    import numpy as np

    from columnar_analytics_engine_spark.operators.multimodal import (
        pil_feature_extract,
    )

    buf = _io.BytesIO()
    Image.new("RGB", (4, 2), (255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    out = decode_image_batch(pd.Series([png, b"not an image", None]))
    assert out[0].shape == (2, 4, 3) and out[0].dtype == np.uint8
    assert (out[0][..., 0] == 255).all() and (out[0][..., 1:] == 0).all()
    assert out[1] is None and out[2] is None
    feats = pil_feature_extract(png)
    assert len(feats) == FEATURE_DIM and abs(sum(feats) - 1.0) < 1e-9


def test_fake_decoder_handles_null():
    assert fake_feature_extract(None) == [0.0] * FEATURE_DIM


def test_resize_features_pools_averages(spark, sf_small):
    from columnar_analytics_engine_spark.operators.multimodal import (
        attach_payload,
        extract_features,
        resize_features,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    feats = extract_features(attach_payload(docs))
    small = resize_features(feats, out_dim=4)
    rows = {r["doc_id"]: r["features"] for r in small.limit(50).collect()}
    orig = {r["doc_id"]: r["features"] for r in feats.limit(50).collect()}
    import math
    for did, f4 in rows.items():
        f16 = orig[did]
        assert len(f4) == 4
        for i in range(4):
            expected = sum(f16[i * 4 : (i + 1) * 4]) / 4.0
            assert math.isclose(f4[i], expected, rel_tol=1e-5)


def test_image_dimensions_from_real_headers(spark):
    """PNG and GIF headers crafted byte-for-byte to spec; dimensions
    must come back exactly, with NULLs for unknown payloads."""
    import struct

    from columnar_analytics_engine_spark.operators.multimodal import image_dimensions

    png = (
        b"\x89PNG\r\n\x1a\x0a"              # signature
        + struct.pack(">I", 13) + b"IHDR"    # IHDR length + type
        + struct.pack(">II", 640, 480)       # width, height (big-endian)
        + b"\x08\x06\x00\x00\x00"            # bit depth etc.
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    other = b"not an image at all"
    media = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(gif)), (3, bytearray(other)), (4, None)],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r.asDict() for r in image_dimensions(media).collect()}
    assert (out[1]["img_format"], out[1]["img_width"], out[1]["img_height"]) == ("png", 640, 480)
    assert (out[2]["img_format"], out[2]["img_width"], out[2]["img_height"]) == ("gif", 320, 200)
    assert out[3]["img_format"] is None and out[3]["img_width"] is None
    assert out[4]["img_format"] is None


def _jpeg_bytes(width: int, height: int, sof_marker: int = 0xC0, n_filler: int = 2) -> bytes:
    """Minimal spec-correct JPEG header: SOI, APP0(JFIF), ``n_filler``
    extra variable-length segments (EXIF-style padding), then SOFn with
    the frame dimensions."""
    import struct

    out = b"\xff\xd8"                                 # SOI
    jfif = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    for i in range(n_filler):                          # APPn/COM segments
        body = bytes([i]) * (10 + 7 * i)
        out += bytes([0xFF, 0xE1 + i]) + struct.pack(">H", len(body) + 2) + body
    sof = b"\x08" + struct.pack(">HH", height, width) + b"\x03"
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", len(sof) + 2) + sof
    return out


def test_jpeg_dimensions_from_sof_markers(spark):
    """JPEG dimensions come from a marker-segment walk, not a fixed
    offset: baseline SOF0, progressive SOF2, deep filler-segment chains,
    and corrupt streams must all resolve byte-exactly."""
    from columnar_analytics_engine_spark.operators.multimodal import image_dimensions

    cases = [
        (1, _jpeg_bytes(1920, 1080)),                      # baseline SOF0
        (2, _jpeg_bytes(640, 480, sof_marker=0xC2)),       # progressive SOF2
        (3, _jpeg_bytes(33, 7, n_filler=9)),               # long header chain
        (4, b"\xff\xd8\xff\xe0\x00\x04\x00\x00"),          # truncated: no SOF
        (5, b"\xff\xd8" + b"garbage-not-a-marker"),        # lost sync
    ]
    media = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in cases], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: r.asDict() for r in image_dimensions(media).collect()}
    assert (out[1]["img_format"], out[1]["img_width"], out[1]["img_height"]) == ("jpeg", 1920, 1080)
    assert (out[2]["img_format"], out[2]["img_width"], out[2]["img_height"]) == ("jpeg", 640, 480)
    assert (out[3]["img_format"], out[3]["img_width"], out[3]["img_height"]) == ("jpeg", 33, 7)
    # corrupt streams keep the sniffed format but yield NULL dimensions
    assert out[4]["img_format"] == "jpeg" and out[4]["img_width"] is None
    assert out[5]["img_format"] == "jpeg" and out[5]["img_width"] is None


def _wav_bytes(channels=2, rate=44100, width=2, n_frames=1000):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setframerate(rate)
        w.setsampwidth(width)
        w.writeframes(b"\x01\x02" * (channels * n_frames * width // 2))
    return buf.getvalue()


def test_audio_metadata_wav_fields_byte_exact(spark):
    from columnar_analytics_engine_spark.operators.multimodal import audio_metadata

    wav = _wav_bytes(channels=2, rate=44100, width=2, n_frames=44100)  # 1 s
    mono = _wav_bytes(channels=1, rate=8000, width=1, n_frames=4000)  # 0.5 s
    rows = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(mono))], "doc_id long, payload binary"
    )
    out = {r.doc_id: r.asDict() for r in audio_metadata(rows).collect()}
    assert out[1]["media_format"] == "wav"
    assert out[1]["n_channels"] == 2
    assert out[1]["sample_rate_hz"] == 44100
    assert out[1]["bits_per_sample"] == 16
    assert out[1]["duration_ms"] == 1000
    assert out[2]["n_channels"] == 1
    assert out[2]["sample_rate_hz"] == 8000
    assert out[2]["bits_per_sample"] == 8
    assert out[2]["duration_ms"] == 500


def test_audio_metadata_walks_past_extra_riff_chunks(spark):
    # a LIST chunk between 'fmt ' and 'data' must not break the walk
    import struct

    from columnar_analytics_engine_spark.operators.multimodal import audio_metadata

    wav = _wav_bytes(channels=1, rate=16000, width=2, n_frames=16000)
    fmt_end = 12 + 8 + 16  # RIFF hdr + 'fmt ' chunk (PCM: 16-byte payload)
    listchunk = b"LIST" + struct.pack("<I", 10) + b"INFOdata12"  # even, 10 B
    patched = wav[:fmt_end] + listchunk + wav[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rows = spark.createDataFrame([(1, bytearray(patched))], "doc_id long, payload binary")
    r = audio_metadata(rows).collect()[0]
    assert r.media_format == "wav" and r.sample_rate_hz == 16000
    assert r.duration_ms == 1000


def test_audio_metadata_truncated_and_foreign_formats(spark):
    from columnar_analytics_engine_spark.operators.multimodal import audio_metadata

    wav = _wav_bytes()
    rows = spark.createDataFrame(
        [
            (1, bytearray(wav[:20])),  # truncated mid-header
            (2, bytearray(b"ID3\x04\x00rest-of-mp3")),
            (3, bytearray(b"\xff\xfb\x90\x00frame")),  # raw MPEG sync
            (4, bytearray(b"fLaC\x00\x00\x00\x22")),
            (5, bytearray(b"OggS\x00\x02")),
            (6, bytearray(b"FORMxxxxAIFF")),
            (7, bytearray(b"\x00\x00\x00\x20ftypisom")),
            (8, bytearray(b"\x1a\x45\xdf\xa3webm")),
            (9, bytearray(b"not audio at all")),
            (10, None),
        ],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r.asDict() for r in audio_metadata(rows).collect()}
    assert out[1]["media_format"] == "wav" and out[1]["duration_ms"] is None
    assert out[2]["media_format"] == "mp3"
    assert out[3]["media_format"] == "mp3"
    assert out[4]["media_format"] == "flac"
    assert out[5]["media_format"] == "ogg"
    assert out[6]["media_format"] == "aiff"
    assert out[7]["media_format"] == "mp4"
    assert out[8]["media_format"] == "webm"
    assert out[9]["media_format"] is None
    assert out[10]["media_format"] is None and out[10]["n_channels"] is None


def _bmff_box(typ: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _mp4_bytes(
    timescale=1000, duration=5000, width=640, height=360, mvhd_version=0,
    tkhd_version=0, extended_mdat=False, audio_trak_first=True,
):
    """Hand-built minimal ISO-BMFF: ftyp + (extended-size) mdat + moov."""
    import struct

    def mvhd():
        if mvhd_version == 0:
            body = b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
            body += struct.pack(">II", timescale, duration) + b"\x00" * 80
        else:
            body = b"\x01\x00\x00\x00" + struct.pack(">QQ", 0, 0)
            body += struct.pack(">I", timescale) + struct.pack(">Q", duration)
            body += b"\x00" * 80
        return _bmff_box(b"mvhd", body)

    def tkhd(w, h):
        if tkhd_version == 0:
            body = b"\x00\x00\x00\x07" + b"\x00" * 16 + b"\x00" * 4  # times/id/rsvd/dur
            body += b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 36  # rsvd/layer+vol/matrix
        else:
            body = b"\x01\x00\x00\x07" + b"\x00" * 28 + b"\x00" * 4
            body += b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 36
        body += struct.pack(">II", w << 16, h << 16)  # 16.16 fixed
        return _bmff_box(b"tkhd", body)

    def trak(w, h):
        return _bmff_box(b"trak", tkhd(w, h))

    traks = b""
    if audio_trak_first:
        traks += trak(0, 0)  # audio track: zero dims, must be skipped
    traks += trak(width, height)
    moov = _bmff_box(b"moov", mvhd() + traks)
    ftyp = _bmff_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")
    if extended_mdat:
        payload = b"\x00" * 24
        mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    else:
        mdat = _bmff_box(b"mdat", b"\x00" * 24)
    return ftyp + mdat + moov


def test_video_metadata_mp4_box_walk_byte_exact(spark):
    from columnar_analytics_engine_spark.operators.multimodal import video_metadata

    rows = spark.createDataFrame(
        [
            (1, bytearray(_mp4_bytes())),
            (2, bytearray(_mp4_bytes(timescale=600, duration=1234, mvhd_version=1,
                                     tkhd_version=1, width=1920, height=1080))),
            (3, bytearray(_mp4_bytes(extended_mdat=True))),  # u64 box size walk
            (4, bytearray(_mp4_bytes(audio_trak_first=False, width=320, height=240))),
        ],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r.asDict() for r in video_metadata(rows).collect()}
    assert out[1]["video_brand"] == "isom"
    assert out[1]["video_timescale"] == 1000
    assert out[1]["video_duration_ms"] == 5000
    assert out[1]["video_width"] == 640 and out[1]["video_height"] == 360
    # version-1 mvhd/tkhd layouts (64-bit times)
    assert out[2]["video_timescale"] == 600
    assert out[2]["video_duration_ms"] == 1234 * 1000 // 600
    assert out[2]["video_width"] == 1920 and out[2]["video_height"] == 1080
    # extended (size==1 → u64) mdat must not derail the top-level walk
    assert out[3]["video_duration_ms"] == 5000
    assert out[4]["video_width"] == 320 and out[4]["video_height"] == 240


def test_video_duration_overflow_degrades_to_null(spark):
    """An mvhd v1 u64 duration above 2^63/1000 would wrap silently in
    non-ANSI long multiply — the range guard must yield NULL, never a
    negative/garbage duration."""
    from columnar_analytics_engine_spark.operators.multimodal import video_metadata

    huge = (1 << 63) // 1000 + 7  # dur*1000 would overflow a long
    big_ok = (1 << 62) // 1000    # in range: survives the guard
    rows = spark.createDataFrame(
        [
            (1, bytearray(_mp4_bytes(timescale=1000, duration=huge, mvhd_version=1,
                                     tkhd_version=1))),
            (2, bytearray(_mp4_bytes(timescale=1000, duration=big_ok, mvhd_version=1,
                                     tkhd_version=1))),
        ],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r.asDict() for r in video_metadata(rows).collect()}
    assert out[1]["video_duration_ms"] is None
    assert out[1]["video_timescale"] == 1000  # the rest of the row survives
    assert out[2]["video_duration_ms"] == big_ok * 1000 // 1000
    assert out[2]["video_duration_ms"] > 0


def test_video_metadata_non_mp4_truncated_and_null(spark):
    from columnar_analytics_engine_spark.operators.multimodal import video_metadata

    full = _mp4_bytes()
    rows = spark.createDataFrame(
        [
            (1, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)),
            (2, bytearray(full[:40])),  # truncated before moov
            (3, None),
            (4, bytearray(b"\x00\x00\x00\x20ftyp\xff\xfe\xfd\xfc" + b"\x00" * 20)),  # unprintable brand
        ],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r.asDict() for r in video_metadata(rows).collect()}
    for d in (1, 2, 3):
        assert out[d]["video_duration_ms"] is None
        assert out[d]["video_width"] is None
    assert out[1]["video_brand"] is None
    assert out[4]["video_brand"] is None  # detected mp4 but brand not ASCII
