"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

The container has no image/audio libraries, so the DECODE step is a
clearly-marked stub (deterministic fake); everything Spark-side — schema,
partitioning, Arrow batch shape, mapInPandas plumbing — is real and tested.
Swap `_decode_image_stub` for a PIL/ffmpeg call in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Media row: payload + typed metadata, the multimodal analog of the
#: StreamMessage envelope (opaque payload, queryable envelope).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_bytes", LongType(), True),
        StructField("payload_sha", StringType(), True),
        StructField("feat_dim", IntegerType(), True),
        StructField("feat_head", StringType(), True),
    ]
)


def _decode_image_stub(payload: bytes) -> list[float]:
    """STUB: deterministic fake 'decode + feature extract'.

    Real implementation would be e.g. PIL.Image.open + a vision encoder;
    neither library ships in this container.  The fake derives an 8-dim
    feature from the payload's sha256 so tests are reproducible.
    """
    if payload is None:
        raise NotImplementedError("decode of NULL payload")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract via mapInPandas — Arrow batches of whole
    rows in, feature rows out; payload bytes never pass through the driver.

    The per-batch loop is the pattern for any real decoder: vectorize
    what you can, keep the batch small enough that decoded frames fit in
    executor memory (spark.sql.execution.arrow.maxRecordsPerBatch)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(p) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_sha": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feat_dim": [len(f) if f else 0 for f in feats],
                    "feat_head": [
                        ",".join(f"{x:.6f}" for x in f[:2]) if f else None for f in feats
                    ],
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — never touches payload bytes, so Parquet
    column pruning keeps it cheap at any scale."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length("payload")).alias("total_payload_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio chunking *plan*: one row per fixed-length chunk
    (media_id, chunk_idx, chunk_start_ms, chunk_end_ms) — the Whisper-style
    pre-segmentation step.  Pure column expressions (sequence + explode);
    the last chunk is clipped to the clip's duration.  The per-chunk decode
    would run through the same mapInPandas shape as extract_features."""
    n_chunks = F.ceil(F.col("duration_ms") / chunk_ms).cast("int")
    return (
        media.filter(F.col("kind") == "audio")
        .select(
            "media_id",
            F.col("duration_ms"),
            F.posexplode(
                F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
            ).alias("chunk_idx", "_i"),
        )
        .select(
            "media_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("chunk_idx") * chunk_ms).cast("long").alias("chunk_start_ms"),
            F.least(
                (F.col("chunk_idx") + 1) * F.lit(chunk_ms).cast("long"),
                F.col("duration_ms"),
            ).cast("long").alias("chunk_end_ms"),
        )
    )


def image_resize_batches(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Image-resize plumbing over mapInPandas: Arrow batches in, one row per
    image out with the resize geometry (scale factors, letterbox padding).
    The pixel work is STUBBED — no image libs in this container — but the
    batch shape, schema, and geometry math are the real pipeline: swap the
    body for PIL/cv2 `resize` and the plan is unchanged."""
    import pandas as pd

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            w = pdf["width"].astype("float64")
            scale = (target_w / w).round(6)
            out_h = (w * 0 + target_h).astype("int32")  # letterbox to target
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "src_width": pdf["width"].astype("int32"),
                    "target_w": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "target_h": out_h,
                    "scale_x": scale.astype("float64"),
                    "payload_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "width", "payload")
        .mapInPandas(
            _resize,
            "media_id long, src_width int, target_w int, target_h int,"
            " scale_x double, payload_bytes long",
        )
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode
    (media_id, frame_ts_ms) — the explode happens engine-side; the decode
    of each planned frame would run through `extract_features`."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                    lambda i: i * every_ms,
                )
            ).alias("frame_ts_ms"),
        )
    )


# ---------------------------------------------------------------------------
# REAL decoders (stdlib-only formats).  The generic `_decode_image_stub`
# stays for compressed formats (jpeg/png/mp3 need libs this container
# lacks), but RIFF/WAVE PCM and uncompressed BMP are fully decodable with
# the standard library — so for those the decode step is REAL: header
# parsing, sample/pixel extraction, and feature math, certified by
# synthesize -> decode round-trip entries whose oracle recomputes the
# expected statistics from the same generator definition.
# ---------------------------------------------------------------------------


def synth_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV bytes (RIFF container) from int16 samples."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """REAL WAV decode (stdlib `wave`): parses the RIFF header, fmt and
    data chunks, returns rate/channels/sample stats.  Raises on anything
    that is not a PCM WAV — no silent fakes."""
    import io
    import math
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    if sw != 2:
        raise NotImplementedError(f"only 16-bit PCM supported, got {sw*8}-bit")
    samples = struct.unpack(f"<{n * nch}h", raw)
    rms = math.sqrt(sum(s * s for s in samples) / len(samples)) if samples else 0.0
    return {
        "sample_rate": sr,
        "n_channels": nch,
        "n_samples": len(samples),
        "duration_ms": int(len(samples) * 1000 // (sr * nch)),
        "rms": round(rms, 6),
        "peak": max((abs(s) for s in samples), default=0),
    }


def synth_bmp(pixels_bgr: bytes, width: int, height: int) -> bytes:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) from raw BGR bytes laid
    out top-to-bottom; rows are written bottom-up with 4-byte padding, as
    the format requires."""
    import struct

    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    rows = [
        pixels_bgr[r * row_raw : (r + 1) * row_raw] + b"\x00" * pad
        for r in range(height)
    ]
    data = b"".join(reversed(rows))  # BMP stores rows bottom-up
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def decode_bmp(payload: bytes) -> dict:
    """REAL BMP decode (stdlib struct): parses BITMAPFILEHEADER +
    BITMAPINFOHEADER, re-orders the bottom-up padded rows, and computes
    per-channel means over the BGR pixel array.  Raises on compressed or
    non-24-bit files — no silent fakes."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    magic, _size, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    (hsz, width, height, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (bpp={bpp})")
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    bottom_up = height > 0
    height = abs(height)
    rows = []
    for r in range(height):
        start = off + r * (row_raw + pad)
        rows.append(payload[start : start + row_raw])
    if bottom_up:
        rows.reverse()
    px = b"".join(rows)
    n = width * height
    mean = lambda ch: round(sum(px[i] for i in range(ch, len(px), 3)) / n, 6)  # noqa: E731
    return {
        "width": width,
        "height": height,
        "n_pixels": n,
        "mean_b": mean(0),
        "mean_g": mean(1),
        "mean_r": mean(2),
    }


def wav_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """Synthesize-then-DECODE certificate for the real WAV path: each
    document's md5 digest becomes 16 int16 PCM samples, wrapped in a real
    RIFF/WAVE container by `synth_wav`, then parsed back by `decode_wav`
    (stdlib `wave` header/chunk parsing, no fakes).  The oracle
    recomputes every statistic from the same md5-derived samples in SQL,
    so a decoder that misreads the header, sample width, or byte order
    hash-mismatches immediately.  mapInPandas keeps payload bytes
    executor-side in Arrow batches — the same shape a real audio corpus
    decode uses."""

    def _rt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        for pdf in batches:
            out = {
                "doc_id": [], "sample_rate": [], "n_samples": [],
                "duration_ms": [], "rms": [], "peak": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                digest = _hl.md5(text.encode("utf-8")).digest()
                samples = [(b - 128) * 256 for b in digest]
                stats = decode_wav(synth_wav(samples))
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(stats["sample_rate"])
                out["n_samples"].append(stats["n_samples"])
                out["duration_ms"].append(stats["duration_ms"])
                out["rms"].append(stats["rms"])
                out["peak"].append(stats["peak"])
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        _rt,
        "doc_id long, sample_rate int, n_samples int, duration_ms long,"
        " rms double, peak int",
    )


def bmp_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """Synthesize-then-DECODE certificate for the real BMP path: 48
    md5-derived bytes become a genuine 4x4 24-bit BMP (bottom-up padded
    rows, BITMAPINFOHEADER) via `synth_bmp`, parsed back by `decode_bmp`
    (struct header parse + row re-ordering).  Channel means are
    order-independent, so the oracle recomputes them straight from the
    hex digests — a decoder that drops the row flip or misreads the
    pixel offset still fails on any asymmetric payload width/height
    handling and on the header-derived fields."""

    def _rt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "n_pixels": [],
                "mean_b": [], "mean_g": [], "mean_r": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text.encode("utf-8")
                px = (
                    _hl.md5(t).digest()
                    + _hl.md5(t + b"x").digest()
                    + _hl.md5(t + b"y").digest()
                )
                stats = decode_bmp(synth_bmp(px, 4, 4))
                out["doc_id"].append(doc_id)
                out["width"].append(stats["width"])
                out["height"].append(stats["height"])
                out["n_pixels"].append(stats["n_pixels"])
                out["mean_b"].append(stats["mean_b"])
                out["mean_g"].append(stats["mean_g"])
                out["mean_r"].append(stats["mean_r"])
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        _rt,
        "doc_id long, width int, height int, n_pixels int,"
        " mean_b double, mean_g double, mean_r double",
    )


def _png_predict(ft: int, a: int, b: int, c: int) -> int:
    """The PNG filter predictor for filter type `ft` given left (a),
    up (b), and up-left (c) neighbors — shared by the encoder's filter
    loop and the decoder's defilter loop so the two can never drift."""
    if ft == 0:
        return 0
    if ft == 1:
        return a
    if ft == 2:
        return b
    if ft == 3:
        return (a + b) // 2
    if ft == 4:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)
    raise NotImplementedError(f"unknown filter type {ft}")


def synth_png(pixels_rgb: bytes, width: int, height: int) -> bytes:
    """REAL 8-bit RGB PNG (non-interlaced) from raw RGB bytes: correct
    signature, IHDR/IDAT/IEND chunks with CRC32s, zlib-compressed
    scanlines.  Each row r is written with filter type r % 5, so a
    decoder must implement ALL five PNG filters (None/Sub/Up/Average/
    Paeth) to reconstruct the image — no filter path goes untested."""
    import struct
    import zlib

    bpp = 3
    if len(pixels_rgb) != width * height * bpp:
        raise ValueError(
            f"need exactly {width * height * bpp} RGB bytes, got {len(pixels_rgb)}"
        )

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw_rows = [
        pixels_rgb[r * width * bpp : (r + 1) * width * bpp] for r in range(height)
    ]
    out = bytearray()
    prior = bytes(width * bpp)
    for r, row in enumerate(raw_rows):
        ft = r % 5
        filt = bytearray()
        for i, x in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            filt.append((x - _png_predict(ft, a, b, c)) & 0xFF)
        out += bytes([ft]) + bytes(filt)
        prior = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out), 9))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """REAL PNG decode (stdlib struct + zlib, no image libraries): chunk
    walk with CRC32 verification, IHDR parse, multi-IDAT concatenation,
    zlib inflate, and full scanline defiltering (all five filter types
    incl. Paeth).  Supports what this pipeline synthesizes — 8-bit RGB,
    non-interlaced; anything else raises, no silent fakes."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("not a PNG payload")
    pos, width, height, idat = 8, None, None, b""
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise NotImplementedError("truncated PNG (chunk header)")
        (ln,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + ln > len(payload):
            raise NotImplementedError("truncated PNG (chunk body)")
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise NotImplementedError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit RGB non-interlaced PNG is supported"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None or not idat:
        raise NotImplementedError("missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    bpp, stride = 3, width * 3
    if len(raw) != height * (stride + 1):
        raise NotImplementedError("truncated PNG (pixel data)")
    px = bytearray()
    prior = bytes(stride)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        line = raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)]
        recon = bytearray()
        for i, x in enumerate(line):
            a = recon[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            recon.append((x + _png_predict(ft, a, b, c)) & 0xFF)
        px += recon
        prior = bytes(recon)
    n = width * height
    mean = lambda ch: round(sum(px[i] for i in range(ch, len(px), 3)) / n, 6)  # noqa: E731
    return {
        "width": width,
        "height": height,
        "n_pixels": n,
        "mean_r": mean(0),
        "mean_g": mean(1),
        "mean_b": mean(2),
    }


def png_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """Synthesize-then-DECODE certificate for the real PNG path: 60
    md5-derived bytes become a genuine 4x5 8-bit RGB PNG whose five rows
    use the five scanline filters (None/Sub/Up/Average/Paeth), written
    with real CRCs and zlib-compressed IDAT by `synth_png`, then parsed
    back by `decode_png` (chunk walk + CRC verify + inflate + full
    defilter).  Channel means are order-independent, so the oracle
    recomputes them straight from the hex digests — any filter-undo,
    CRC, or inflate mistake hash-mismatches immediately."""

    def _rt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "n_pixels": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text.encode("utf-8")
                px = (
                    _hl.md5(t).digest()
                    + _hl.md5(t + b"x").digest()
                    + _hl.md5(t + b"y").digest()
                    + _hl.md5(t + b"z").digest()
                )[:60]
                stats = decode_png(synth_png(px, 4, 5))
                out["doc_id"].append(doc_id)
                out["width"].append(stats["width"])
                out["height"].append(stats["height"])
                out["n_pixels"].append(stats["n_pixels"])
                out["mean_r"].append(stats["mean_r"])
                out["mean_g"].append(stats["mean_g"])
                out["mean_b"].append(stats["mean_b"])
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        _rt,
        "doc_id long, width int, height int, n_pixels int,"
        " mean_r double, mean_g double, mean_b double",
    )
