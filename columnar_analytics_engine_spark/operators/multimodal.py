"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the schema pattern used by large-scale training
pipelines (payload stays opaque to SQL; metadata is filterable).  The
decode/feature steps run as Arrow-batched ``mapInPandas`` so each Python
worker sees columnar batches, never rows.

Media decoding has three tiers: Pillow when importable (full format
coverage), a dependency-free pure-NumPy decoder for uncompressed 24-bit
BMP payloads (so the decode path executes even in minimal containers —
this is what CI exercises), and an honest ``NotImplementedError`` for
formats neither tier can read.  ``fake_feature_extract`` additionally
provides a deterministic stand-in (byte-histogram features) that keeps
the Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — real and testable independent of any decoder.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text column as an opaque binary payload with metadata —
    the fixture stand-in for real media blobs."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _decode_bmp24(payload: bytes | None):
    """Pure-NumPy decode of an uncompressed 24-bit BITMAPINFOHEADER BMP
    to an HxWx3 uint8 RGB array; None for anything else (wrong magic,
    compressed, truncated, paletted).  Exists so the decode path runs —
    and is byte-exactly tested — without any image library."""
    import struct

    if payload is None or len(payload) < 54 or bytes(payload[:2]) != b"BM":
        return None
    payload = bytes(payload)
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    if len(payload) < pix_off + stride * height:
        return None
    arr = np.frombuffer(payload, dtype=np.uint8, offset=pix_off, count=stride * height)
    arr = arr.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        arr = arr[::-1]
    return arr[..., ::-1].copy()  # BGR storage order -> RGB


def decode_image_batch(payloads: pd.Series) -> pd.Series:
    """Decode payloads to RGB pixel arrays (``pd.Series`` of
    ``np.ndarray`` HxWx3 uint8; None for null/broken payloads — bad
    blobs must not kill a 100 TB job).

    Pillow handles every format it knows when importable; without it,
    uncompressed 24-bit BMPs decode through the built-in pure-NumPy
    reader (corrupt BMPs degrade to None, same as the PIL path), and
    any other format raises NotImplementedError — the extension point a
    real deployment fills with its media stack.  The engine's contract
    is the mapInPandas batch shape around the decoder.
    """
    try:
        import io as _io

        from PIL import Image
    except ImportError:
        Image = None

    def _decode(payload: bytes | None):
        if payload is None:
            return None
        if Image is not None:
            try:
                with Image.open(_io.BytesIO(payload)) as im:
                    return np.asarray(im.convert("RGB"))
            except Exception:
                return None
        if bytes(payload[:2]) == b"BM":
            return _decode_bmp24(payload)  # None on corrupt: degrade
        raise NotImplementedError(
            "decoding non-BMP media requires an image library (pip install "
            "pillow); inject a decoder via extract_features(decoder=...) or "
            "use fake_feature_extract"
        )

    return payloads.map(_decode)


def pil_feature_extract(payload: bytes | None) -> list[float]:
    """Decoder for :func:`extract_features` backed by a real decode:
    FEATURE_DIM-bin luminance histogram of the decoded pixels,
    L1-normalized.  Same decoder tiers as :func:`decode_image_batch`
    (Pillow > built-in BMP > NotImplementedError)."""
    decoded = decode_image_batch(pd.Series([payload]))[0]
    if decoded is None:
        return [0.0] * FEATURE_DIM
    lum = (
        0.299 * decoded[..., 0] + 0.587 * decoded[..., 1] + 0.114 * decoded[..., 2]
    )
    hist, _ = np.histogram(lum, bins=FEATURE_DIM, range=(0, 256))
    total = float(hist.sum()) or 1.0
    return [float(h) / total for h in hist]


def fake_feature_extract(payload: bytes | None) -> list[float]:
    """Deterministic stand-in 'decoder': 16-bin byte histogram, L1-normalized."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    total = float(hist.sum()) or 1.0
    return [float(h) / total for h in hist]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes | None], list[float]] = fake_feature_extract,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each task pulls columnar Arrow batches, applies the
    decoder per payload, and emits a feature array column — the shape a
    real image/audio embedding stage uses.  No driver involvement; scales
    with partitions.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "features": pdf["payload"].map(decoder),
                }
            )

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


def chunk_payload(media: DataFrame, chunk_bytes: int = 1024) -> DataFrame:
    """Frame/chunk sampling: split each payload into fixed-size chunks
    (one row per chunk) — the video-frame-sampling plumbing, kept
    JVM-side with array expressions (no Python)."""
    n_chunks = F.ceil(F.col("n_bytes").cast("double") / F.lit(float(chunk_bytes))).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id")
    return media.select("doc_id", "payload", "n_bytes", idx).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.expr(f"substring(payload, chunk_id * {chunk_bytes} + 1, {chunk_bytes})").alias("chunk"),
    )


# JPEG SOFn markers that carry frame dimensions: C0-CF minus C4 (DHT),
# C8 (JPG extension), CC (DAC)
_JPEG_SOF_MARKERS = [
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
]
_JPEG_MAX_SEGMENTS = 32  # JFIF/EXIF/ICC/quant/Huffman headers before SOF


def _jpeg_dims(p):  # noqa: ANN001 - Column in, Column out
    """(width, height) struct from a JPEG byte stream, or nulls.

    JPEG has no fixed-offset dimensions: the stream is FFD8 then a chain
    of FF-marker segments, each carrying a big-endian length, and the
    dimensions live in the first SOFn segment (height at payload offset
    +3, width at +5).  The walk is a bounded fold — ``aggregate`` over
    up to ``_JPEG_MAX_SEGMENTS`` steps threading (offset, w, h, done)
    through substring/conv arithmetic — so it stays a pure JVM
    expression: no UDF, no codec, scan-speed like the PNG/GIF paths.
    """

    def u8(pos):  # byte value at 1-based Column offset
        return F.conv(F.hex(F.substring(p, pos, F.lit(1))), 16, 10).cast("long")

    def be16(pos):
        return F.conv(F.hex(F.substring(p, pos, F.lit(2))), 16, 10).cast("long")

    null_l = F.lit(None).cast("long")
    init = F.struct(
        F.lit(3).cast("long").alias("off"),
        null_l.alias("w"),
        null_l.alias("h"),
        F.lit(False).alias("done"),
    )

    def step(acc, _):
        pos = acc.getField("off")
        first = u8(pos)
        mark = u8(pos + 1)
        seglen = be16(pos + 2)
        is_sof = mark.isin(*_JPEG_SOF_MARKERS)
        return (
            F.when(acc.getField("done"), acc)
            .when(  # lost sync / truncated: stop with null dims
                first.isNull() | (first != F.lit(255)) | seglen.isNull(),
                F.struct(pos.alias("off"), null_l.alias("w"), null_l.alias("h"), F.lit(True).alias("done")),
            )
            .when(
                is_sof,
                F.struct(
                    pos.alias("off"),
                    be16(pos + 7).alias("w"),
                    be16(pos + 5).alias("h"),
                    F.lit(True).alias("done"),
                ),
            )
            .otherwise(
                F.struct(
                    (pos + 2 + seglen).alias("off"),
                    null_l.alias("w"),
                    null_l.alias("h"),
                    F.lit(False).alias("done"),
                )
            )
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_JPEG_MAX_SEGMENTS)),
        init,
        step,
        lambda acc: F.struct(acc.getField("w").alias("w"), acc.getField("h").alias("h")),
    )


def image_dimensions(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Sniff image format and pixel dimensions from raw payload bytes —
    pure JVM expressions (hex + substring + conv), no Python, no codec.

    Covers the three dominant web formats:
      * PNG — 8-byte signature, then the IHDR chunk holds width/height
        as big-endian uint32 at byte offsets 16..23 (0-based);
      * GIF — 'GIF87a'/'GIF89a' signature, then the logical screen
        width/height as little-endian uint16 at offsets 6..9;
      * JPEG — FFD8 signature, then a bounded marker-segment walk to the
        first SOFn frame header (see :func:`_jpeg_dims`).
    Unknown payloads get format NULL (metadata-only rows pass through).

    This is the header-metadata extraction a 100 TB media crawl runs
    BEFORE any decode: filterable width/height at scan speed lets
    partition pruning and predicate pushdown drop undecodable or
    out-of-spec assets without ever shipping bytes to Python.
    """
    p = F.col(payload_col)

    def be32(off0: int) -> F.Column:  # big-endian uint32 at 0-based offset
        return F.conv(F.hex(F.expr(f"substring({payload_col}, {off0 + 1}, 4)")), 16, 10).cast("long")

    def le16(off0: int) -> F.Column:  # little-endian uint16 at 0-based offset
        lo = F.conv(F.hex(F.expr(f"substring({payload_col}, {off0 + 1}, 1)")), 16, 10).cast("long")
        hi = F.conv(F.hex(F.expr(f"substring({payload_col}, {off0 + 2}, 1)")), 16, 10).cast("long")
        return lo + hi * F.lit(256)

    sig8 = F.hex(F.expr(f"substring({payload_col}, 1, 8)"))
    # hex compare, never decode(): arbitrary binary is not valid UTF-8
    # and StringDecode throws on it
    sig6 = F.hex(F.expr(f"substring({payload_col}, 1, 6)"))
    is_png = sig8 == F.lit("89504E470D0A1A0A")
    is_gif = sig6.isin(
        "474946383761", "474946383961"  # 'GIF87a' / 'GIF89a'
    )
    is_jpeg = F.hex(F.expr(f"substring({payload_col}, 1, 2)")) == F.lit("FFD8")
    jd = _jpeg_dims(p)
    fmt = (
        F.when(is_png, "png")
        .when(is_gif, "gif")
        .when(is_jpeg, "jpeg")
        .otherwise(F.lit(None))
    )
    width = (
        F.when(is_png, be32(16))
        .when(is_gif, le16(6))
        .when(is_jpeg, jd.getField("w"))
        .otherwise(F.lit(None))
    )
    height = (
        F.when(is_png, be32(20))
        .when(is_gif, le16(8))
        .when(is_jpeg, jd.getField("h"))
        .otherwise(F.lit(None))
    )
    return media.withColumn("img_format", fmt).withColumn(
        "img_width", width
    ).withColumn("img_height", height)


def resize_features(
    features: DataFrame, out_dim: int = 4, feature_col: str = "features"
) -> DataFrame:
    """Resize (average-pool) a feature array to ``out_dim`` — the
    image-resize analog in feature space, pure JVM array expressions:
    element i of the output averages the input slice [i·s, (i+1)·s)
    where s = in_dim / out_dim.  No Python, full codegen."""
    col = F.col(feature_col)
    s = F.size(col) / F.lit(out_dim)  # double stride

    def pool(i):
        start = (i * s).cast("int")
        length = ((i + 1) * s).cast("int") - start
        total = F.aggregate(
            F.slice(col, start + 1, length),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double"),
        )
        return (total / length.cast("double")).cast("float")

    pooled = F.transform(F.sequence(F.lit(0), F.lit(out_dim - 1)), pool)
    return features.withColumn(feature_col, pooled)


# ---------------------------------------------------------------------------
# audio header sniffing (WAV deep parse + container format detection)
# ---------------------------------------------------------------------------

_RIFF_MAX_CHUNKS = 12  # fmt /LIST/fact/cue headers before data


def _wav_fields(p):  # noqa: ANN001 - Column in, Column out
    """(n_channels, sample_rate, bits, block_align, data_bytes) struct
    from a RIFF/WAVE byte stream, or nulls.

    WAV is RIFF: 'RIFF' + file size + 'WAVE', then a chain of chunks,
    each a 4-byte id + LE32 size + payload (padded to even length).
    The 'fmt ' chunk carries channels/sample-rate/bits; the 'data'
    chunk's size gives the sample count.  Chunk order is NOT fixed
    (LIST/fact/cue may precede data), so this is the same bounded
    ``aggregate`` fold as the JPEG SOF walk — a pure JVM expression,
    scan-speed, no codec.
    """

    def u8(pos):
        return F.conv(F.hex(F.substring(p, pos, F.lit(1))), 16, 10).cast("long")

    def le16(pos):
        return u8(pos) + u8(pos + 1) * F.lit(256)

    def le32(pos):
        return (
            u8(pos)
            + u8(pos + 1) * F.lit(256)
            + u8(pos + 2) * F.lit(65536)
            + u8(pos + 3) * F.lit(16777216)
        )

    null_l = F.lit(None).cast("long")
    init = F.struct(
        F.lit(13).cast("long").alias("off"),  # first chunk (1-based)
        null_l.alias("ch"),
        null_l.alias("sr"),
        null_l.alias("bits"),
        null_l.alias("ba"),
        null_l.alias("db"),
        F.lit(False).alias("done"),
    )

    def step(acc, _):
        pos = acc.getField("off")
        cid = F.hex(F.substring(p, pos, F.lit(4)))
        size = le32(pos + 4)
        is_fmt = cid == F.lit("666D7420")  # 'fmt '
        is_data = cid == F.lit("64617461")  # 'data'
        nxt = pos + 8 + size + size % 2
        got_fmt = F.coalesce(acc.getField("sr").isNotNull(), F.lit(False))
        got_data_after = F.when(is_data, F.lit(True)).otherwise(
            acc.getField("db").isNotNull()
        )
        return (
            F.when(acc.getField("done"), acc)
            .when(  # truncated / lost sync: stop with whatever was found
                size.isNull() | (F.length(F.substring(p, pos, F.lit(8))) < 8),
                F.struct(
                    pos.alias("off"),
                    acc.getField("ch").alias("ch"),
                    acc.getField("sr").alias("sr"),
                    acc.getField("bits").alias("bits"),
                    acc.getField("ba").alias("ba"),
                    acc.getField("db").alias("db"),
                    F.lit(True).alias("done"),
                ),
            )
            .when(
                is_fmt,
                F.struct(
                    nxt.alias("off"),
                    le16(pos + 10).alias("ch"),
                    le32(pos + 12).alias("sr"),
                    le16(pos + 22).alias("bits"),
                    le16(pos + 20).alias("ba"),
                    acc.getField("db").alias("db"),
                    got_data_after.alias("done"),
                ),
            )
            .when(
                is_data,
                F.struct(
                    nxt.alias("off"),
                    acc.getField("ch").alias("ch"),
                    acc.getField("sr").alias("sr"),
                    acc.getField("bits").alias("bits"),
                    acc.getField("ba").alias("ba"),
                    size.alias("db"),
                    got_fmt.alias("done"),
                ),
            )
            .otherwise(
                F.struct(
                    nxt.alias("off"),
                    acc.getField("ch").alias("ch"),
                    acc.getField("sr").alias("sr"),
                    acc.getField("bits").alias("bits"),
                    acc.getField("ba").alias("ba"),
                    acc.getField("db").alias("db"),
                    F.lit(False).alias("done"),
                )
            )
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_RIFF_MAX_CHUNKS)),
        init,
        step,
        lambda acc: F.struct(
            acc.getField("ch").alias("ch"),
            acc.getField("sr").alias("sr"),
            acc.getField("bits").alias("bits"),
            acc.getField("ba").alias("ba"),
            acc.getField("db").alias("db"),
        ),
    )


def audio_metadata(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Sniff audio/video container format — and for WAV the full frame
    metadata — from raw payload bytes; pure JVM expressions, no codec.

    Adds:
      * ``media_format`` — wav / mp3 / flac / ogg / aiff / mp4 / webm,
        NULL when unrecognized;
      * ``n_channels``, ``sample_rate_hz``, ``bits_per_sample`` — from
        the WAV 'fmt ' chunk (NULL for other formats: their metadata
        sits in frame headers or length-prefixed packets a scan-speed
        sniff shouldn't chase; the decode stage owns those);
      * ``duration_ms`` — exact integer ``frames * 1000 div rate`` from
        the WAV 'data' chunk size and block alignment.

    The WAV walk handles out-of-order chunks (LIST/fact before data)
    and truncated streams (partial fields, no error) — see
    :func:`_wav_fields`.  This is the pre-decode filter a 100 TB audio
    crawl runs: sample-rate/channel predicates prune undecodable or
    out-of-spec assets at scan speed, before any Python.
    """
    p = F.col(payload_col)

    def magic(n: int) -> F.Column:
        return F.hex(F.expr(f"substring({payload_col}, 1, {n})"))

    is_riff = magic(4) == F.lit("52494646")  # 'RIFF'
    kind8 = F.hex(F.expr(f"substring({payload_col}, 9, 4)"))
    is_wav = is_riff & (kind8 == F.lit("57415645"))  # 'WAVE'
    is_avi = is_riff & (kind8 == F.lit("41564920"))  # 'AVI '
    is_mp3 = magic(3).isin("494433") | (  # 'ID3'
        magic(2).isin("FFFB", "FFF3", "FFF2", "FFFA")  # MPEG frame sync
    )
    is_flac = magic(4) == F.lit("664C6143")  # 'fLaC'
    is_ogg = magic(4) == F.lit("4F676753")  # 'OggS'
    is_aiff = (magic(4) == F.lit("464F524D")) & (  # 'FORM'
        kind8.isin("41494646", "41494643")  # 'AIFF' / 'AIFC'
    )
    is_mp4 = (
        F.hex(F.expr(f"substring({payload_col}, 5, 4)")) == F.lit("66747970")
    )  # 'ftyp' box
    is_webm = magic(4) == F.lit("1A45DFA3")  # EBML/Matroska

    wf = _wav_fields(p)
    fmt = (
        F.when(is_wav, "wav")
        .when(is_avi, "avi")
        .when(is_mp3, "mp3")
        .when(is_flac, "flac")
        .when(is_ogg, "ogg")
        .when(is_aiff, "aiff")
        .when(is_mp4, "mp4")
        .when(is_webm, "webm")
        .otherwise(F.lit(None))
    )
    # exact while db*1000 < 2^53 (always: RIFF sizes are u32); the
    # double division truncates deterministically
    n_frames = (wf.getField("db") / wf.getField("ba")).cast("long")
    duration = F.when(
        is_wav
        & wf.getField("db").isNotNull()
        & (wf.getField("ba") > 0)
        & (wf.getField("sr") > 0),
        (n_frames * F.lit(1000) / wf.getField("sr")).cast("long"),
    )
    return (
        media.withColumn("media_format", fmt)
        .withColumn("n_channels", F.when(is_wav, wf.getField("ch")))
        .withColumn("sample_rate_hz", F.when(is_wav, wf.getField("sr")))
        .withColumn("bits_per_sample", F.when(is_wav, wf.getField("bits")))
        .withColumn("duration_ms", duration)
    )


# ---------------------------------------------------------------------------
# video header sniffing (MP4 / ISO-BMFF box walk)
# ---------------------------------------------------------------------------

_BMFF_MAX_TOP_BOXES = 16   # ftyp/free/skip/wide/mdat/... before moov
_BMFF_MAX_MOOV_CHILDREN = 12  # mvhd/iods/udta/trak chain inside moov


def _mp4_fields(p):  # noqa: ANN001 - Column in, Column out
    """(timescale, duration, width, height) struct from an ISO-BMFF
    (MP4/MOV) byte stream, or nulls.

    ISO-BMFF is a tree of length-prefixed boxes: u32 big-endian size +
    4-byte type (size==1 → u64 extended size follows, size==0 → box runs
    to EOF).  Two bounded ``aggregate`` folds — the same pure-JVM walk
    as the JPEG SOF and WAV RIFF paths:

    1. top level: step box-to-box until ``moov``;
    2. inside moov: read ``mvhd`` (version 0: timescale u32 at +20,
       duration u32 at +24; version 1: u32 at +28 / u64 at +32) and the
       first ``trak`` whose leading child is a ``tkhd`` with a nonzero
       width (skips audio tracks; tkhd width/height are 16.16 fixed
       point — the integer part is a be16 at +84/+88 for version 0,
       +96/+100 for version 1... offsets measured from the trak box
       start + 8-byte header).

    No codec, no Python: a 100 TB video crawl filters on duration and
    frame size at scan speed before a single frame is decoded.
    """

    def u8(pos):
        return F.conv(F.hex(F.substring(p, pos, F.lit(1))), 16, 10).cast("long")

    def be16(pos):
        return F.conv(F.hex(F.substring(p, pos, F.lit(2))), 16, 10).cast("long")

    def be32(pos):
        return F.conv(F.hex(F.substring(p, pos, F.lit(4))), 16, 10).cast("long")

    def be64(pos):
        return F.conv(F.hex(F.substring(p, pos, F.lit(8))), 16, 10).cast("long")

    def box_type(pos):  # 4-byte type tag as hex
        return F.hex(F.substring(p, pos + 4, F.lit(4)))

    null_l = F.lit(None).cast("long")

    # -- fold 1: find the moov box ------------------------------------
    init1 = F.struct(
        F.lit(1).cast("long").alias("off"),
        null_l.alias("moov"),
        F.lit(False).alias("done"),
    )

    def step1(acc, _):
        pos = acc.getField("off")
        size = be32(pos)
        typ = box_type(pos)
        nxt = (
            F.when(size == 1, pos + be64(pos + 8))
            .when(size >= 8, pos + size)
            .otherwise(F.lit(None).cast("long"))  # size 0/corrupt: stop
        )
        return (
            F.when(acc.getField("done"), acc)
            .when(
                size.isNull() | (F.length(F.substring(p, pos, F.lit(8))) < 8),
                F.struct(pos.alias("off"), acc.getField("moov").alias("moov"), F.lit(True).alias("done")),
            )
            .when(
                typ == F.lit("6D6F6F76"),  # 'moov'
                F.struct(pos.alias("off"), pos.alias("moov"), F.lit(True).alias("done")),
            )
            .otherwise(
                F.struct(
                    F.coalesce(nxt, pos).alias("off"),
                    acc.getField("moov").alias("moov"),
                    nxt.isNull().alias("done"),
                )
            )
        )

    moov = F.aggregate(
        F.sequence(F.lit(1), F.lit(_BMFF_MAX_TOP_BOXES)),
        init1,
        step1,
        lambda acc: acc.getField("moov"),
    )

    # -- fold 2: mvhd + first video trak inside moov ------------------
    init2 = F.struct(
        (moov + 8).alias("off"),
        null_l.alias("ts"),
        null_l.alias("dur"),
        null_l.alias("w"),
        null_l.alias("h"),
    )

    def step2(acc, _):
        pos = acc.getField("off")
        size = be32(pos)
        typ = box_type(pos)
        is_mvhd = typ == F.lit("6D766864")  # 'mvhd'
        is_trak = typ == F.lit("7472616B")  # 'trak'
        v = u8(pos + 8)
        ts = F.when(v == 1, be32(pos + 28)).otherwise(be32(pos + 20))
        dur = F.when(v == 1, be64(pos + 32)).otherwise(be32(pos + 24))
        # first child of the trak: tkhd at pos+8 (spec-mandated leading child)
        child_is_tkhd = box_type(pos + 8) == F.lit("746B6864")
        tv = u8(pos + 16)
        tw = F.when(tv == 1, be16(pos + 104)).otherwise(be16(pos + 92))
        th = F.when(tv == 1, be16(pos + 108)).otherwise(be16(pos + 96))
        keep = lambda f: acc.getField(f)  # noqa: E731
        stop = size.isNull() | (size < 8) | (F.length(F.substring(p, pos, F.lit(8))) < 8)
        take_dims = is_trak & child_is_tkhd & acc.getField("w").isNull() & (tw > 0)
        return (
            F.when(pos.isNull() | stop, acc)
            .otherwise(
                F.struct(
                    (pos + size).alias("off"),
                    F.when(is_mvhd, ts).otherwise(keep("ts")).alias("ts"),
                    F.when(is_mvhd, dur).otherwise(keep("dur")).alias("dur"),
                    F.when(take_dims, tw).otherwise(keep("w")).alias("w"),
                    F.when(take_dims, th).otherwise(keep("h")).alias("h"),
                )
            )
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_BMFF_MAX_MOOV_CHILDREN)),
        init2,
        step2,
        lambda acc: F.struct(
            acc.getField("ts").alias("ts"),
            acc.getField("dur").alias("dur"),
            acc.getField("w").alias("w"),
            acc.getField("h").alias("h"),
        ),
    )


def video_metadata(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Sniff MP4/ISO-BMFF container metadata from raw payload bytes —
    pure JVM expressions (hex + substring + conv folds), no codec.

    Adds:
      * ``video_brand`` — the ftyp major brand ('isom', 'mp42', 'M4A ',
        'qt  ', ...) when its 4 bytes are printable ASCII, else NULL;
      * ``video_timescale`` / ``video_duration_ms`` — from the moov/mvhd
        header (version 0 and 1 layouts both handled; duration_ms is
        exact integer duration·1000 / timescale);
      * ``video_width`` / ``video_height`` — integer part of the first
        video trak's tkhd 16.16 fixed-point dimensions (audio traks,
        which carry width 0, are skipped).

    Non-MP4 payloads pass through with all NULLs.  Together with
    :func:`image_dimensions` (PNG/GIF/JPEG) and :func:`audio_metadata`
    (WAV deep parse + container IDs) this completes the scan-speed
    pre-decode filter across the three media modalities.
    """
    p = F.col(payload_col)
    is_mp4 = F.hex(F.expr(f"substring({payload_col}, 5, 4)")) == F.lit("66747970")

    def u8(pos: int) -> F.Column:
        return F.conv(F.hex(F.expr(f"substring({payload_col}, {pos}, 1)")), 16, 10).cast("long")

    printable = None
    for i in range(9, 13):
        c = (u8(i) >= 0x20) & (u8(i) <= 0x7E)
        printable = c if printable is None else (printable & c)
    brand = F.when(
        is_mp4 & printable, F.expr(f"decode(substring({payload_col}, 9, 4), 'UTF-8')")
    ).otherwise(F.lit(None).cast("string"))

    mf = _mp4_fields(p)
    ts = mf.getField("ts")
    dur = mf.getField("dur")
    # integer arithmetic (div, not / with a truncating cast): a double
    # division loses precision once dur*1000 exceeds 2^53.  Range-guard
    # the multiply: an mvhd v1 u64 duration above 2^63/1000 would wrap
    # silently under non-ANSI long arithmetic — degrade to NULL instead
    # of a negative/garbage duration.
    dur_safe = F.when(dur <= F.lit((1 << 63) // 1000 - 1), dur)
    return (
        media.withColumn("video_brand", brand)
        .withColumn("video_timescale", F.when(is_mp4, ts))
        .withColumn("_dur1000", (dur_safe * F.lit(1000)).cast("long"))
        .withColumn("_ts", ts.cast("long"))
        .withColumn(
            "video_duration_ms",
            F.when(
                is_mp4 & ts.isNotNull() & (ts > 0) & dur.isNotNull(),
                F.expr("_dur1000 div _ts"),
            ),
        )
        .drop("_dur1000", "_ts")
        .withColumn("video_width", F.when(is_mp4, mf.getField("w")))
        .withColumn("video_height", F.when(is_mp4, mf.getField("h")))
    )
