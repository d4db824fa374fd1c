"""Multimodal column support: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a metadata
struct alongside. Content-addressing (sha256), hash-dedup, and the Spark
plumbing for decode/feature-extraction (schemas, batch iteration,
partitioning) are real and tested. Media decoding is REAL for the formats
the Python stdlib can parse — binary PNM images (P5/P6), WAV audio — plus
a real nearest-neighbor resampler. JPEG/PNG/WebP decode is probe-gated on
the optional Pillow dependency (``decode_pil``): real decode when PIL
imports, the same loud ``NotImplementedError`` otherwise. Remaining
compressed formats (MP4/WebM video) stay behind loud stubs with
injectable ``decode_fn`` hooks.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

# Metadata struct carried next to every binary payload.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha256", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def content_hash(binary_col: Column | str) -> Column:
    c = F.col(binary_col) if isinstance(binary_col, str) else binary_col
    return F.sha2(c, 256)


def with_media_meta(
    df: DataFrame, binary_col: str, media_type: str
) -> DataFrame:
    """Attach the typed metadata struct computed from the payload itself."""
    b = F.col(binary_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(b).cast("long").alias("n_bytes"),
            content_hash(b).alias("content_sha256"),
        ),
    )


def decode_pnm(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL image decoder for binary PNM payloads (P5 grayscale / P6 RGB)
    — pure stdlib, no image libraries needed. Returns (width, height,
    grayscale pixels as floats in [0, 255]); P6 averages the RGB channels.

    PNM is the classic uncompressed interchange format; compressed formats
    (JPEG/PNG) still require external codecs and stay behind the loud
    stubs below.
    """
    import re

    m = re.match(rb"^(P[56])\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        raise ValueError("not a binary PNM (P5/P6) payload")
    magic = m.group(1)
    w, h, maxval = int(m.group(2)), int(m.group(3)), int(m.group(4))
    if maxval > 255:
        raise ValueError("16-bit PNM payloads are not supported")
    data = payload[m.end() :]
    if magic == b"P5":
        need = w * h
        if len(data) < need:
            raise ValueError("truncated PNM payload")
        px = [float(b) for b in data[:need]]
    else:
        need = w * h * 3
        if len(data) < need:
            raise ValueError("truncated PNM payload")
        px = [
            (data[i] + data[i + 1] + data[i + 2]) / 3.0
            for i in range(0, need, 3)
        ]
    return w, h, px


def decode_bmp(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL image decoder for uncompressed 24-bit BMP payloads — pure
    stdlib ``struct`` parsing of the BITMAPFILEHEADER/BITMAPINFOHEADER
    layout (a public, fixed format). Returns (width, height, grayscale
    pixels in [0, 255], top-down row order); BMP stores rows bottom-up
    with 4-byte padding and BGR channel order, both normalized here.
    """
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP variants not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP is supported")
    top_down = h < 0
    h = abs(h)
    row_stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    if len(payload) < pixel_offset + row_stride * h:
        raise ValueError("truncated BMP payload")
    px: list[float] = []
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for row in rows:
        base = pixel_offset + row * row_stride
        for x in range(w):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            px.append((r + g + b) / 3.0)
    return w, h, px


def probe_gif_frames(payload: bytes) -> int:
    """REAL video-ish frame prober for GIF payloads: counts image frames
    by walking the container's block structure (image descriptors 0x2C,
    extensions 0x21, sub-block length prefixes) — no LZW decompression
    needed, so this is pure stdlib and exact. The frame-SAMPLING pattern
    this feeds (``sample_frames``) is the same one an MP4 prober would
    use; compressed video containers still require external parsers and
    keep the loud stub default.
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    pos = 6
    packed = payload[pos + 4]
    pos += 7  # logical screen descriptor
    if packed & 0x80:  # global color table present
        pos += 3 * (2 << (packed & 0x07))
    frames = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-blocks
            pos += 1
        elif block == 0x2C:  # image descriptor
            frames += 1
            local_packed = payload[pos + 8]
            pos += 9
            if local_packed & 0x80:  # local color table
                pos += 3 * (2 << (local_packed & 0x07))
            pos += 1  # LZW minimum code size
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # skip length-prefixed sub-blocks (shared by 0x21 and 0x2C)
        while pos < len(payload) and payload[pos] != 0:
            pos += payload[pos] + 1
        pos += 1  # sub-block terminator
    return frames


def probe_frames_auto(payload: bytes) -> int:
    """Default ``sample_frames`` prober: real GIF structure walk for GIF
    payloads; anything else (MP4/WebM — external parsers required) raises
    loudly rather than silently faking a count."""
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return probe_gif_frames(payload)
    raise NotImplementedError(
        "frame probing implemented for GIF containers only; inject a "
        "prober for compressed video formats"
    )


def _pil_image():
    """Probe for the optional Pillow dependency (same pattern as the
    kafka/lakehouse connector probes). Returns the ``PIL.Image`` module
    or ``None`` when Pillow is not installed in this image."""
    try:
        from PIL import Image  # noqa: PLC0415 — probe import by design

        return Image
    except ImportError:
        return None


def decode_pil(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL decoder for compressed image formats (JPEG/PNG/WebP/...) via
    the optional Pillow dependency. Probe-gated: when Pillow imports, the
    payload is decoded for real (converted to 8-bit grayscale, same
    (width, height, pixels) contract as ``decode_pnm``/``decode_bmp``);
    when it does not, this raises the same loud ``NotImplementedError``
    the stdlib dispatcher raises, so callers degrade identically."""
    Image = _pil_image()
    if Image is None:
        raise NotImplementedError(
            "decoding compressed image formats requires Pillow, which is "
            "not installed in this environment — inject a decode_fn or "
            "install Pillow"
        )
    import io

    with Image.open(io.BytesIO(payload)) as im:
        gray = im.convert("L")
        w, h = gray.size
        px = [float(v) for v in gray.getdata()]
    return w, h, px


def _pil_decodable(payload: bytes) -> bool:
    """Magic-byte check for formats ``decode_pil`` handles (JPEG/PNG/WebP)."""
    if payload[:3] == b"\xff\xd8\xff" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        return True
    # WebP: RIFF container with WEBP fourcc (WAV is RIFF....WAVE)
    return payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"


def resize_nearest(
    px: list[float], w: int, h: int, tw: int, th: int
) -> list[float]:
    """REAL nearest-neighbor resampling — pure Python, no libraries."""
    return [
        px[min(h - 1, (y * h) // th) * w + min(w - 1, (x * w) // tw)]
        for y in range(th)
        for x in range(tw)
    ]


def decode_wav_features(payload: bytes) -> list[float]:
    """REAL audio decode for WAV payloads via the stdlib ``wave`` module:
    [duration_s, framerate, n_channels, rms] over 8/16-bit PCM samples."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload)) as wf:
        nch = wf.getnchannels()
        sw = wf.getsampwidth()
        fr = wf.getframerate()
        nf = wf.getnframes()
        frames = wf.readframes(nf)
    if sw == 2:
        vals = struct.unpack(f"<{len(frames) // 2}h", frames)
    elif sw == 1:
        vals = [b - 128 for b in frames]
    else:
        raise ValueError(f"unsupported WAV sample width: {sw}")
    rms = (sum(v * v for v in vals) / max(len(vals), 1)) ** 0.5
    return [round(nf / fr, 6), float(fr), float(nch), round(rms, 4)]


def decode_image_auto(payload: bytes) -> tuple[int, int, list[float]]:
    """Dispatch an image payload to the right REAL decoder: stdlib for
    PNM/BMP, Pillow (when installed) for JPEG/PNG/WebP; loud
    ``NotImplementedError`` otherwise."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_pnm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if _pil_decodable(payload):
        return decode_pil(payload)
    raise NotImplementedError(
        "no decoder for this image payload (PNM/BMP decode natively; "
        "JPEG/PNG/WebP decode when Pillow is installed) — inject a decoder"
    )


def decode_auto_features(payload: bytes) -> list[float]:
    """Default feature extractor: dispatch on magic bytes to the REAL
    decoders (PNM/BMP — and JPEG/PNG/WebP when Pillow is installed —
    image -> [w, h, mean, std]; WAV audio -> [duration, rate, channels,
    rms]); anything else raises loudly — remaining compressed formats
    need codecs this environment doesn't ship."""
    is_image = (
        payload[:2] in (b"P5", b"P6")
        or payload[:2] == b"BM"
        or _pil_decodable(payload)
    )
    if is_image:
        w, h, px = decode_image_auto(payload)
        n = max(len(px), 1)
        mean = sum(px) / n
        var = sum((p - mean) ** 2 for p in px) / n
        return [float(w), float(h), round(mean, 4), round(var**0.5, 4)]
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav_features(payload)
    raise NotImplementedError(
        "no stdlib decoder for this payload (PNM/BMP images and WAV audio "
        "are decoded natively; JPEG/PNG/WebP need Pillow, other compressed "
        "formats need codecs not present in this environment) — inject a "
        "decode_fn"
    )


def extract_features(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    decode_fn: Callable[[bytes], list[float]] = decode_auto_features,
) -> DataFrame:
    """Decode/feature-extract binary payloads via ``mapInPandas``.

    Arrow-batched iteration, explicit output schema, no driver
    materialization. The default ``decode_fn`` REALLY decodes PNM images
    and WAV audio (pure stdlib) and raises loudly for formats that need
    external codecs; inject a decoder for those.
    """
    meta_type = F.col("media_meta.media_type")
    prepared = df.select(
        F.col(id_col).alias("doc_id"),
        meta_type.alias("media_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col(binary_col).alias("payload"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            features = [decode_fn(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": features,
                }
            )

    return prepared.mapInPandas(batches, FEATURE_SCHEMA)


@query(
    "multimodal_hash_dedup",
    oracle="""
    SELECT sha256(text) AS content_sha256, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies, MIN(length(text)) AS n_bytes
    FROM documents GROUP BY 1
    """,
)
def multimodal_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup of binary payloads (documents' text bytes stand in
    for media payloads — ASCII, so byte length == char length)."""
    docs = read_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    with_meta = with_media_meta(payloads, "payload", media_type="text/plain")
    return with_meta.groupBy(
        F.col("media_meta.content_sha256").alias("content_sha256")
    ).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("media_meta.n_bytes").alias("n_bytes"),
    )


# --------------------------------------------------------------------------
# Media transform ops (decode / resize / frame-sample)
#
# The Spark-side plumbing (schemas, Arrow batching, partition-parallel
# execution) is real; decode and resize default to the REAL stdlib
# implementations above (PNM / nearest-neighbor). Only the video frame
# prober remains injectable-only — no stdlib container parser exists.
# --------------------------------------------------------------------------

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("pixels", T.ArrayType(T.DoubleType()), True),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("frame_idx", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_frames_sampled", T.IntegerType(), True),
    ]
)


def _stub(name: str):
    def fn(*_args, **_kwargs):
        raise NotImplementedError(
            f"{name} requires media libraries not present in this "
            "environment; inject an implementation"
        )

    return fn


def decode_image(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], tuple[int, int, list[float]]] = (
        decode_image_auto
    ),
) -> DataFrame:
    """binary -> (width, height, pixel array) via Arrow-batched mapInPandas.
    The default decoder really parses binary PNM (P5/P6) and BMP, plus
    JPEG/PNG/WebP when Pillow is installed; inject one for anything else."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decoder(p) for p in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "pixels": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, IMAGE_SCHEMA)


def resize_image(
    images: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Callable[[list[float], int, int, int, int], list[float]] = (
        resize_nearest
    ),
) -> DataFrame:
    """(pixels, w, h) -> resized pixel array; output schema fixed to the
    target dims so downstream operators can rely on the shape. The default
    resizer is a real nearest-neighbor resample (pure Python)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [
                resizer(px, w, h, target_w, target_h)
                for px, w, h in zip(pdf["pixels"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "pixels": resized,
                }
            )

    return images.mapInPandas(batches, IMAGE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    prober: Callable[[bytes], int] = probe_frames_auto,
) -> DataFrame:
    """video binary -> deterministic every-Nth frame index sample; the
    default prober really walks GIF container structure (exact frame
    count, no decompression) and raises loudly for compressed video
    formats — inject a prober for those."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            counts = [prober(p) for p in pdf[binary_col]]
            idx = [list(range(0, c, every_n)) for c in counts]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "frame_idx": idx,
                    "n_frames_sampled": [len(i) for i in idx],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, FRAMES_SCHEMA)


#: Synthetic image geometry for ``multimodal_image_features``: a P5
#: (grayscale binary PNM) payload of 8 x 4 = 32 pixels.
_IMG_W, _IMG_H = 8, 4


def _pnm_sum_features(payload: bytes) -> list[float]:
    """Decode a PNM payload (REAL ``decode_pnm``) and return
    [width, height, sum(px), sum(px^2)] — integer-valued statistics that
    are exactly representable, so the cross-engine compare cannot hit a
    round-half tie (Python rounds half-even, DuckDB half-away)."""
    w, h, px = decode_pnm(payload)
    return [
        float(w),
        float(h),
        float(sum(int(p) for p in px)),
        float(sum(int(p) * int(p) for p in px)),
    ]


@query(
    "multimodal_image_features",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, unicode(substr(text, i, 1)) AS p
      FROM documents, generate_series(1, {_IMG_W * _IMG_H}) t(i)
      WHERE length(text) >= {_IMG_W * _IMG_H}
    )
    SELECT doc_id, {_IMG_W} AS width, {_IMG_H} AS height,
           CAST(SUM(p) AS BIGINT) AS px_sum,
           CAST(SUM(p * p) AS BIGINT) AS px_sq_sum
    FROM px GROUP BY doc_id
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END image decode through the REAL stdlib PNM decoder,
    oracle-checked: build a deterministic P5 payload per document inside
    the plan (header + the doc's first 32 text bytes as pixels), decode
    it with ``decode_pnm`` in Arrow-batched ``mapInPandas``, and emit
    per-image pixel statistics (sum and sum-of-squares — mean/variance
    follow by two divisions, kept integer here so the driver's exact
    hash compare certifies the binary plumbing AND the decoder output
    byte-for-byte). The DuckDB oracle recomputes the identical stats
    from the same bytes via character codes.

    ASCII text means byte == codepoint, which is what makes the oracle
    expressible; real image corpora swap the payload construction for a
    binary column and keep everything downstream unchanged.

    Scale: payload construction is map-side concat; decode is one Arrow
    batch pass per partition with no shuffle at all — the per-image agg
    happens inside the decoder, not in a groupBy.
    """
    docs = read_table(spark, sf_dir, "documents").where(
        F.length("text") >= _IMG_W * _IMG_H
    )
    header = F.encode(F.lit(f"P5 {_IMG_W} {_IMG_H} 255 "), "utf-8")
    pixels = F.substring(F.encode("text", "utf-8"), 1, _IMG_W * _IMG_H)
    payloads = docs.select(
        "doc_id", F.concat(header, pixels).alias("payload")
    )
    feats = extract_features(
        with_media_meta(payloads, "payload", media_type="image/x-portable-graymap"),
        decode_fn=_pnm_sum_features,
    )
    return feats.select(
        "doc_id",
        F.element_at("feature", 1).cast("int").alias("width"),
        F.element_at("feature", 2).cast("int").alias("height"),
        F.element_at("feature", 3).cast("long").alias("px_sum"),
        F.element_at("feature", 4).cast("long").alias("px_sq_sum"),
    )


#: Fixed 44-byte RIFF/WAVE header for ``multimodal_audio_features``:
#: 8-bit PCM, mono, 8 kHz, exactly 32 samples (see tests for the layout
#: derivation via ``struct``); the sample bytes follow directly.
_WAV_N_SAMPLES = 32
_WAV_HEADER = bytes.fromhex(
    "524946464400000057415645666d7420"
    "1000000001000100401f0000401f0000"
    "010008006461746120000000"
)


def _wav_sum_features(payload: bytes) -> list[float]:
    """Decode a WAV payload with the REAL stdlib ``wave`` module and
    return [framerate, n_channels, sum(samples), sum(samples^2)] over
    the centered 8-bit PCM samples (byte - 128) — integer-valued, so the
    cross-engine compare is exact (same reasoning as
    ``_pnm_sum_features``)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as wf:
        if wf.getsampwidth() != 1:
            raise ValueError("expected 8-bit PCM")
        rate, nch = wf.getframerate(), wf.getnchannels()
        frames = wf.readframes(wf.getnframes())
    samples = [b - 128 for b in frames]
    return [
        float(rate),
        float(nch),
        float(sum(samples)),
        float(sum(s * s for s in samples)),
    ]


@query(
    "multimodal_audio_features",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, unicode(substr(text, i, 1)) - 128 AS v
      FROM documents, generate_series(1, {_WAV_N_SAMPLES}) t(i)
      WHERE length(text) >= {_WAV_N_SAMPLES}
    )
    SELECT doc_id, 8000 AS framerate, 1 AS n_channels,
           CAST(SUM(v) AS BIGINT) AS sample_sum,
           CAST(SUM(v * v) AS BIGINT) AS sample_sq_sum
    FROM s GROUP BY doc_id
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END audio decode through the REAL stdlib WAV parser,
    oracle-checked — the audio twin of ``multimodal_image_features``:
    build a valid RIFF/WAVE payload per document inside the plan (fixed
    44-byte header literal + the doc's first 32 text bytes as 8-bit PCM
    samples), decode it with the ``wave`` module in Arrow-batched
    ``mapInPandas``, and emit exact integer sample statistics the DuckDB
    oracle recomputes from the same bytes.

    Scale: identical profile to the image twin — map-side payload
    concat, one Arrow pass, no shuffle.
    """
    docs = read_table(spark, sf_dir, "documents").where(
        F.length("text") >= _WAV_N_SAMPLES
    )
    payloads = docs.select(
        "doc_id",
        F.concat(
            F.lit(_WAV_HEADER),
            F.substring(F.encode("text", "utf-8"), 1, _WAV_N_SAMPLES),
        ).alias("payload"),
    )
    feats = extract_features(
        with_media_meta(payloads, "payload", media_type="audio/wav"),
        decode_fn=_wav_sum_features,
    )
    return feats.select(
        "doc_id",
        F.element_at("feature", 1).cast("int").alias("framerate"),
        F.element_at("feature", 2).cast("int").alias("n_channels"),
        F.element_at("feature", 3).cast("long").alias("sample_sum"),
        F.element_at("feature", 4).cast("long").alias("sample_sq_sum"),
    )


#: Frame-sampling layout: byte stride between frame starts, bytes per
#: frame, and the per-document frame cap.  Shared with the oracle.
FRAME_STRIDE = 64
FRAME_BYTES = 48
FRAME_CAP = 4


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE octet_length(encode(text)) = length(text)
    ),
    c AS (
      SELECT doc_id, text,
             unnest(range(0, least({FRAME_CAP},
                 CAST(ceil(length(text) / {FRAME_STRIDE}.0) AS BIGINT))))
               AS frame_id
      FROM d
    )
    SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
           md5(substring(text, CAST(frame_id * {FRAME_STRIDE} + 1
                                    AS BIGINT), {FRAME_BYTES}))
             AS frame_md5,
           CAST(octet_length(encode(substring(text,
                CAST(frame_id * {FRAME_STRIDE} + 1 AS BIGINT),
                {FRAME_BYTES}))) AS BIGINT) AS frame_bytes
    FROM c
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frame sampling over an opaque BINARY column — the
    Spark-side plumbing of video/audio frame extraction: every blob
    yields up to ``FRAME_CAP`` fixed-stride byte windows, each carried
    forward as (offset id, bytes, digest) for a downstream decoder.
    The blob here is the document's UTF-8 bytes (the corpus stands in
    for media payloads, as in ``multimodal_binary_ingest``); a real
    pipeline points the same plan at image/video blobs and swaps the
    md5 for a decode UDF (stubbed in this module's decoders).

    Both engines keep only byte-transparent rows (octet_length ==
    char length, i.e. pure ASCII) via the SAME filter, because DuckDB
    can neither slice nor md5 BLOBs — the oracle slices and hashes
    TEXT, which equals the byte operations exactly on the filtered rows
    (and the filter is part of the query semantics, so a corpus refresh
    that adds non-ASCII text cannot silently skew the compare).

    Scale: the frame index explodes in place from an in-row sequence
    (the ``text_chunk_windows`` layout — no shuffle, rows expand on
    their partitions); slicing and hashing are per-row expressions.
    At 100 TB this is a pure map pass whose output is ~(cap x
    frame_bytes)/blob_size of the input."""
    docs = read_table(spark, sf_dir, "documents").where(
        F.octet_length(F.col("text").cast("binary")) == F.length("text")
    )
    blob = F.col("text").cast("binary")
    n_frames = F.least(
        F.lit(FRAME_CAP),
        F.ceil(F.octet_length(blob) / F.lit(float(FRAME_STRIDE))),
    ).cast("long")
    # Guard the empty-blob edge: F.sequence(0, -1) DESCENDS to [0, -1]
    # when n_frames == 0, emitting spurious frames the oracle's
    # range(0, 0) (= empty) never produces — the same trap kgram_index
    # and text_bpe_merge_candidates guard against.
    frame_ids = F.when(
        n_frames >= 1, F.sequence(F.lit(0).cast("long"), n_frames - 1)
    ).otherwise(F.array().cast("array<bigint>"))
    exploded = docs.select(
        "doc_id",
        blob.alias("blob"),
        F.explode(frame_ids).alias("frame_id"),
    )
    frame = F.expr(
        f"substring(blob, frame_id * {FRAME_STRIDE} + 1, {FRAME_BYTES})"
    )
    return exploded.select(
        "doc_id",
        "frame_id",
        F.md5(frame).alias("frame_md5"),
        F.octet_length(frame).cast("long").alias("frame_bytes"),
    )
