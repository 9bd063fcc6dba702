"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators.

TWO real stdlib codecs are implemented byte-for-byte — BMP (24-bit
BI_RGB, hand-parsed headers + row-padding math) and WAV (RIFF/PCM via
the stdlib ``wave`` module) — so the decode path exercises genuine
binary parsing end-to-end (encode → bytes → sniff → parse, oracled in
the registry). Codecs beyond those (JPEG/PNG/MP4 …) need image/audio
libs absent from this container: ``default_decoder`` falls back to
NotImplementedError for them, and ``fake_decoder`` remains the
deterministic stand-in for plumbing tests.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("payload_len", T.LongType()),
        T.StructField("sha", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata.
    (Driver testdata has no real media; UTF-8 bytes of the text stand in
    as the payload — the schema/plumbing is what's exercised.) Rows with
    a null source column carry no media and are dropped — downstream
    decoders always see a real payload."""
    df = df.filter(F.col(text_col).isNotNull())
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("payload_len"),
        F.sha2(F.col(text_col).cast("binary"), 256).alias("sha"),
    )


def encode_bmp(width: int, height: int) -> bytes:
    """A real, valid 24-bit uncompressed BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + BI_RGB pixel array with 4-byte row padding),
    deterministic pixel fill derived from coordinates. Any BMP viewer
    opens the output; the point is that ``parse_bmp`` then reads back
    the SAME bytes a third-party writer would produce."""
    if width < 1 or height < 1:
        raise ValueError(f"BMP dimensions must be positive, got {width}x{height}")
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    pixel_bytes = (row_bytes + pad) * height
    file_size = 14 + 40 + pixel_bytes
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += bytes(((x * 7 + y) % 256, (y * 11 + x) % 256, (x ^ y) % 256))
        row += b"\x00" * pad
        rows.append(bytes(row))
    return header + info + b"".join(rows)


def parse_bmp(payload: bytes) -> tuple[int, int, int]:
    """Hand-parsed BMP header: magic, declared file size vs actual,
    width/height from BITMAPINFOHEADER (little-endian int32 at offsets
    18/22). Returns (width, height, 1) — a still image is one frame."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    file_size = struct.unpack_from("<I", payload, 2)[0]
    if file_size != len(payload):
        raise ValueError(f"BMP declares {file_size} bytes, got {len(payload)}")
    width = struct.unpack_from("<i", payload, 18)[0]
    height = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if width < 1 or abs(height) < 1 or bpp != 24:
        raise ValueError(f"unsupported BMP: {width}x{height} {bpp}bpp")
    return (width, abs(height), 1)


def encode_wav(n_frames: int, framerate: int = 8000, channels: int = 1) -> bytes:
    """A real RIFF/PCM WAV through the stdlib ``wave`` writer: 16-bit
    mono samples generated deterministically from the frame index."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(
            b"".join(
                struct.pack("<h", ((i * 257) % 4096) - 2048)
                for i in range(n_frames * channels)
            )
        )
    return buf.getvalue()


def parse_wav(payload: bytes) -> tuple[int, int, int]:
    """Real WAV parse via the stdlib ``wave`` reader. Returns
    (channels, framerate, n_frames) in the (width, height, n_frames)
    metadata slots — audio has no pixel box, so the slots carry the
    channel/rate/sample geometry instead."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        return (w.getnchannels(), w.getframerate(), w.getnframes())


def stdlib_decoder(payload: bytes) -> tuple[int, int, int]:
    """Sniff-and-parse over the real stdlib codecs: BMP by the ``BM``
    magic, WAV by ``RIFF....WAVE``. Unknown formats raise ValueError so
    callers can route them to a library-backed decoder."""
    if payload[:2] == b"BM":
        return parse_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return parse_wav(payload)
    raise ValueError(f"unrecognized media magic: {payload[:4]!r}")


def default_decoder(payload: bytes) -> tuple[int, int, int]:
    """BMP and WAV decode for real (stdlib byte parsing); every other
    format needs PIL/ffmpeg, which this container does not ship."""
    try:
        return stdlib_decoder(payload)
    except ValueError:
        pass
    raise NotImplementedError("media decode beyond BMP/WAV requires image/audio libs not present in this environment")


def fake_decoder(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in: dimensions derived from payload bytes."""
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, n % 30 + 1)


def attach_real_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real media payloads: even doc_ids get a genuine BMP (width =
    id % 31 + 1, height = id*7 % 23 + 1), odd doc_ids a genuine WAV
    (n_frames = id % 500 + 1 at 8 kHz mono) — geometry derived from the
    id alone so an oracle can predict what a correct decode must
    recover without seeing the bytes. Encoding runs in an Arrow batch
    on the executors (payloads never pass through the driver)."""

    def enc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, payloads = [], [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                if i % 2 == 0:
                    payloads.append(encode_bmp(i % 31 + 1, (i * 7) % 23 + 1))
                    types.append("image/bmp")
                else:
                    payloads.append(encode_wav(i % 500 + 1))
                    types.append("audio/wav")
                ids.append(i)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": types,
                    "payload": payloads,
                    "payload_len": [len(p) for p in payloads],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("payload_len", T.LongType()),
        ]
    )
    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        enc_batches, schema
    )


def decode_media(
    media: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, int]] = default_decoder,
) -> DataFrame:
    """Arrow-batched decode via mapInPandas: per-partition batch iterator,
    no row-at-a-time serde. The decoder runs on executor workers; at scale
    this is the pattern for CPU-bound media feature extraction (partition
    count controls parallelism; payloads never pass through the driver)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["payload"].notna()]  # defensive: no payload, no decode
            decoded = [decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_len": pdf["payload_len"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, max_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: pick evenly-spaced frame indices
    (step = ceil(n_frames / max_frames)) per document. Pure column
    expressions — the explode happens JVM-side, one output row per sampled
    frame; at scale this is how a 100 TB video corpus fans out to
    per-frame work units without a UDF."""
    step = F.greatest(F.lit(1), F.ceil(F.col("n_frames") / float(max_frames)).cast("int"))
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, step)
    return decoded.select("doc_id", "n_frames", F.explode(idx).alias("frame_idx"))


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("scale_num", T.IntegerType()),
        T.StructField("scale_den", T.IntegerType()),
    ]
)


def resize_media(decoded: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Aspect-preserving resize planning over decoded media metadata: the
    target box is (max_w, max_h); the scale factor is the tighter of the
    two ratios, kept as an exact integer fraction (no float drift). The
    actual pixel resample is the stubbed decode step's job — what the
    engine owns is the distributed metadata math, done here with pure
    column expressions (no UDF, no shuffle)."""
    w, h = F.col("width"), F.col("height")
    # scale = min(max_w/w, max_h/h) as a fraction num/den
    use_w = (max_w * h) <= (max_h * w)  # max_w/w <= max_h/h, cross-multiplied
    num = F.when(use_w, F.lit(max_w)).otherwise(F.lit(max_h)).cast("int")
    den = F.when(use_w, w).otherwise(h).cast("int")
    return decoded.select(
        "doc_id",
        "media_type",
        "payload_len",
        "width",
        "height",
        F.greatest(F.lit(1), F.floor(w * num / den)).cast("int").alias("target_w"),
        F.greatest(F.lit(1), F.floor(h * num / den)).cast("int").alias("target_h"),
        num.alias("scale_num"),
        den.alias("scale_den"),
    )


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction as an Arrow-batched pandas iterator: a
    deterministic byte-histogram embedding (real extractors — CLIP,
    mel-spectrogram — would slot into the same mapInPandas shape). The
    histogram buckets payload bytes mod ``dim`` and L1-normalizes, so the
    output is a stable array<double> usable by the similarity operators."""

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["payload"].notna()]  # defensive: no payload, no features
            feats = []
            for payload in pdf["payload"]:
                counts = [0] * dim
                for b in payload:
                    counts[b % dim] += 1
                total = max(sum(counts), 1)
                feats.append([c / total for c in counts])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return media.mapInPandas(feat_batches, FEATURES_SCHEMA)


def perceptual_hash_pairs(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 16,
    bands: int = 4,
    max_hamming: int = 2,
    max_band: int | None = None,
) -> DataFrame:
    """Perceptual-hash near-duplicate candidates over media payloads —
    the image-dedup member of the dedup family (LAION-style pipelines
    pHash every image and drop hamming-close pairs; SimHash does the
    same for text). The hash is an aHash over the payload's byte
    histogram: bit_k = [count_k · dim > total_bytes] (bucket above the
    mean), giving a ``dim``-bit signature; banding splits it into
    ``bands`` nibble keys and same-band candidates verify with
    bit_count(xor) <= max_hamming — the SimHash banding shape
    (operators/dedup.py), integer-exact end to end.

    Payloads here are the UTF-8 bytes of ASCII text (the container has
    no codecs — multimodal.py module note), so the histogram is computed
    JVM-side from characters; a real deployment swaps the histogram
    source for decoded-image features and keeps everything downstream.

    Scale shape: signature is a per-row expression (no shuffle); the
    only shuffle is the band equi-join on (band, key) over the
    signatures frame, exactly like simhash_candidates. A mean-threshold
    aHash has LOW entropy on content-uniform corpora (every byte
    histogram looks alike), which makes band keys hot and the join
    quadratic — ``max_band`` drops bands holding more than that many
    signatures before the join (the max_df/max_block skew lever; on
    corpora where everything is a near-dup of everything, pairwise
    listing is the wrong question anyway).
    """
    buckets = F.expr(
        f"transform(sequence(1, length({text_col})),"
        f" i -> ascii(substr({text_col}, i, 1)) % {dim})"
    )
    n = F.length(text_col)
    sig = F.lit(0).cast("long")
    for k in range(dim):
        cnt_k = F.size(F.filter(buckets, lambda b: b == F.lit(k)))
        sig = sig + F.when(cnt_k * dim > n, F.lit(1 << k).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    # length > 0: sequence(1, 0) is DESCENDING in Spark ([1, 0]), which
    # would hand an empty payload two phantom bucket-0 bytes and a
    # spurious bit 0; the oracle's range(1, length+1) is empty for
    # length 0, so empty payloads are excluded on both sides
    sigs = df.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0)).select(
        "doc_id", sig.alias("phash")
    )
    width = dim // bands
    mask = (1 << width) - 1
    # the banded frame (signature carried along) lands in a band-keyed
    # repartition exchange re-read by the keep-cap aggregate and both
    # self-join sides — the signature pass runs once, nothing persists
    # (reuse-not-cache, cachectl.py)
    banded = sigs.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("phash", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "phash", "bk.band", "bk.key").repartition("band", "key")
    if max_band is not None:
        keep = banded.groupBy("band", "key").agg(F.count("*").alias("bn"))
        banded = banded.join(
            F.broadcast(keep.filter(F.col("bn") <= max_band).select("band", "key")),
            ["band", "key"],
        )
    a = banded.select(
        "band", "key", F.col("doc_id").alias("id_a"), F.col("phash").alias("h_a")
    )
    b = banded.select(
        "band", "key", F.col("doc_id").alias("id_b"), F.col("phash").alias("h_b")
    )
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()  # a pair can collide in several bands
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        pairs.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
