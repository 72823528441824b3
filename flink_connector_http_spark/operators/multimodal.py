"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched
``mapInPandas`` UDFs.

The decode step is STUBBED (this container ships no image/audio libs):
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless the
optional library import succeeds, and the pipelines run on a deterministic
fake decoder instead. Everything Spark-side — schemas, binary handling,
UDF signatures, Arrow batch shapes, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import load, register

# ---------------------------------------------------------------------------
# decode stubs (gated behind optional imports)
# ---------------------------------------------------------------------------

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def decode_image(data: bytes):
    """Real image decode — requires an imaging library (not in this
    container). The Spark plumbing around it is exercised with
    :func:`fake_decode_image`."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL/pillow; use fake_decode_image for the "
            "deterministic test path"
        )
    raise NotImplementedError("wire PIL decode here when the lib is available")


def fake_decode_image(data: bytes) -> dict:
    """Deterministic fake decoder: derives pseudo pixel stats from the
    bytes themselves, so the distributed plumbing is fully testable."""
    digest = hashlib.md5(data).digest()
    return {
        "width": 16 + digest[0] % 64,
        "height": 16 + digest[1] % 64,
        "mean_r": digest[2] / 255.0,
        "mean_g": digest[3] / 255.0,
        "mean_b": digest[4] / 255.0,
    }


def decode_audio(data: bytes):
    """Real audio decode — requires an audio library (not in this
    container). The Spark plumbing around it is exercised with
    :func:`fake_decode_audio`."""
    raise NotImplementedError(
        "audio decode requires soundfile/librosa; use fake_decode_audio for "
        "the deterministic test path"
    )


def fake_decode_audio(data: bytes) -> dict:
    """Deterministic fake audio decoder: sample rate / length / loudness
    derived from the md5 digest of the bytes (same trick as
    :func:`fake_decode_image`), so the pipeline is oracle-checkable."""
    digest = hashlib.md5(data).digest()
    sample_rate = 8000 * (1 + digest[0] % 6)  # 8k..48k
    n_samples = 1000 + digest[1] * 256 + digest[2]
    # floor(x·1e6 + 0.5) instead of round(): Python rounds half-to-even,
    # SQL engines round half-away — ties like 39074/32000 = 1.2210625 would
    # diverge. The int division is correctly rounded in both engines.
    duration_s = math.floor(n_samples * 1_000_000 / sample_rate + 0.5) / 1e6
    return {
        "sample_rate": sample_rate,
        "n_samples": n_samples,
        "duration_s": duration_s,
        "rms": digest[3] / 255.0,
    }


def decode_video_frames(data: bytes, every_nth: int):
    """Real video frame sampling — requires a video library (not in this
    container). The Spark plumbing around it is exercised with
    :func:`fake_decode_video_frames`."""
    raise NotImplementedError(
        "video decode requires pyav/opencv; use fake_decode_video_frames "
        "for the deterministic test path"
    )


def fake_decode_video_frames(data: bytes, every_nth: int) -> list:
    """Deterministic fake frame sampler: frame count and fps come from the
    md5 digest; every ``every_nth`` frame is 'sampled' and fingerprinted by
    hashing the container bytes with the frame index — a 1→N decode shape
    (one input video, many output frames)."""
    digest = hashlib.md5(data).digest()
    n_frames = 10 + digest[0] % 30
    fps = 10 + digest[1] % 20
    out = []
    for idx in range(0, n_frames, every_nth):
        out.append({
            "frame_idx": idx,
            # same tie-proof rounding as fake_decode_audio.duration_s
            "ts_s": math.floor(idx * 1_000_000 / fps + 0.5) / 1e6,
            "frame_md5": hashlib.md5(
                data + b":" + str(idx).encode("ascii")
            ).hexdigest(),
        })
    return out


IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
])


# ---------------------------------------------------------------------------
# binary metadata extraction (oracle-checked)
# ---------------------------------------------------------------------------

@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           left(text, 4) AS magic
    FROM documents
    """,
    doc="Binary-column plumbing: text→binary→mapInPandas metadata extraction "
        "(size, checksum, magic bytes); the oracle computes the same facts "
        "relationally, proving the Arrow batch path is lossless.",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    binary = docs.select("doc_id", F.encode("text", "UTF-8").alias("blob"))

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("magic", T.StringType()),
    ])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": blobs.map(len).astype("int64"),
                "content_md5": blobs.map(lambda b: hashlib.md5(b).hexdigest()),
                "magic": blobs.map(lambda b: b[:4].decode("utf-8", "replace")),
            })

    return binary.mapInPandas(extract, schema=out_schema)


# ---------------------------------------------------------------------------
# fake-image feature extraction (rows-only; decode is stubbed)
# ---------------------------------------------------------------------------

@register(
    "mm_image_features",
    # fake_decode_image is pure md5-digest-byte arithmetic, so the oracle
    # re-derives the same stats from md5 hex pairs: digest[i] is hex chars
    # (2i+1, 2i+2) parsed via '0x'-cast, matching hashlib.md5(...).digest().
    oracle="""
    WITH h AS (
      SELECT doc_id,
             octet_length(encode('IMG0' || text)) AS n_bytes,
             md5('IMG0' || text) AS hx
      FROM documents
    )
    SELECT doc_id, n_bytes,
           CAST(16 + ('0x' || substr(hx, 1, 2))::INT % 64 AS INT) AS width,
           CAST(16 + ('0x' || substr(hx, 3, 2))::INT % 64 AS INT) AS height,
           ('0x' || substr(hx, 5, 2))::INT / 255.0 AS mean_r,
           ('0x' || substr(hx, 7, 2))::INT / 255.0 AS mean_g,
           ('0x' || substr(hx, 9, 2))::INT / 255.0 AS mean_b
    FROM h
    """,
    doc="Image feature extraction pipeline: deterministic fake 'image' "
        "binaries → mapInPandas decode (stubbed per environment) → typed "
        "feature columns. Schema/partitioning/batching are the real thing; "
        "the oracle recomputes the fake decoder's md5-digest stats in SQL, "
        "proving the Arrow batch path end-to-end.",
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    # synthesize an opaque binary per doc (stand-in for a real image column)
    images = docs.select(
        "doc_id",
        F.encode(F.concat(F.lit("IMG0"), F.col("text")), "UTF-8").alias("image"),
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["image"].map(fake_decode_image)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["image"].map(len).astype("int64"),
                "width": feats.map(lambda f: f["width"]).astype("int32"),
                "height": feats.map(lambda f: f["height"]).astype("int32"),
                "mean_r": feats.map(lambda f: f["mean_r"]),
                "mean_g": feats.map(lambda f: f["mean_g"]),
                "mean_b": feats.map(lambda f: f["mean_b"]),
            })

    return images.mapInPandas(extract, schema=IMAGE_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# fake-audio feature extraction (1→1 decode shape, oracle-checked)
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
])


@register(
    "mm_audio_features",
    # fake_decode_audio is md5-digest arithmetic: digest[i] = hex chars
    # (2i+1, 2i+2); the oracle replays it in SQL over the same bytes.
    oracle="""
    WITH h AS (
      SELECT doc_id,
             octet_length(encode('AUD0' || text)) AS n_bytes,
             md5('AUD0' || text) AS hx
      FROM documents
    ), d AS (
      SELECT doc_id, n_bytes,
             8000 * (1 + ('0x' || substr(hx, 1, 2))::INT % 6) AS sample_rate,
             1000 + ('0x' || substr(hx, 3, 2))::INT * 256
                  + ('0x' || substr(hx, 5, 2))::INT AS n_samples,
             ('0x' || substr(hx, 7, 2))::INT / 255.0 AS rms
      FROM h
    )
    SELECT doc_id, n_bytes,
           CAST(sample_rate AS INT) AS sample_rate,
           CAST(n_samples AS INT) AS n_samples,
           floor(CAST(n_samples AS DOUBLE) * 1000000 / sample_rate + 0.5) / 1e6
             AS duration_s,
           rms
    FROM d
    """,
    doc="Audio feature extraction pipeline: opaque audio binaries → "
        "mapInPandas decode (stubbed; deterministic fake) → sample rate, "
        "length, duration, loudness. Same Arrow-batched 1→1 shape as "
        "mm_image_features; oracle replays the digest math in SQL.",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    audio = docs.select(
        "doc_id",
        F.encode(F.concat(F.lit("AUD0"), F.col("text")), "UTF-8").alias("audio"),
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["audio"].map(fake_decode_audio)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["audio"].map(len).astype("int64"),
                "sample_rate": feats.map(lambda f: f["sample_rate"]).astype("int32"),
                "n_samples": feats.map(lambda f: f["n_samples"]).astype("int32"),
                "duration_s": feats.map(lambda f: f["duration_s"]),
                "rms": feats.map(lambda f: f["rms"]),
            })

    return audio.mapInPandas(extract, schema=AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# fake-video frame sampling (1→N decode shape, oracle-checked)
# ---------------------------------------------------------------------------

VIDEO_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_s", T.DoubleType()),
    T.StructField("frame_md5", T.StringType()),
])

FRAME_SAMPLE_EVERY = 5


@register(
    "mm_video_frames",
    # frame_md5 hashes the container bytes + ':' + index — both engines
    # hash the same UTF-8 byte string, so fingerprints agree exactly.
    oracle=f"""
    WITH h AS (
      SELECT doc_id, 'VID0' || text AS vid, md5('VID0' || text) AS hx
      FROM documents
    ), meta AS (
      SELECT doc_id, vid,
             10 + ('0x' || substr(hx, 1, 2))::INT % 30 AS n_frames,
             10 + ('0x' || substr(hx, 3, 2))::INT % 20 AS fps
      FROM h
    )
    SELECT doc_id,
           CAST(idx AS INT) AS frame_idx,
           floor(CAST(idx AS DOUBLE) * 1000000 / fps + 0.5) / 1e6 AS ts_s,
           md5(vid || ':' || CAST(idx AS VARCHAR)) AS frame_md5
    FROM meta, unnest(range(0, n_frames, {FRAME_SAMPLE_EVERY})) AS t(idx)
    """,
    doc="Video frame-sampling pipeline: opaque video binaries → mapInPandas "
        f"decode (stubbed; deterministic fake) sampling every "
        f"{FRAME_SAMPLE_EVERY}th frame → one row per sampled frame with "
        "timestamp + content fingerprint. Exercises the 1→N Arrow batch "
        "shape (row explosion inside the UDF); at scale frames shard "
        "naturally because output partitioning follows input splits.",
)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    videos = docs.select(
        "doc_id",
        F.encode(F.concat(F.lit("VID0"), F.col("text")), "UTF-8").alias("video"),
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["video"]):
                for fr in fake_decode_video_frames(blob, FRAME_SAMPLE_EVERY):
                    rows.append((doc_id, fr["frame_idx"], fr["ts_s"], fr["frame_md5"]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "ts_s", "frame_md5"]
            ).astype({"frame_idx": "int32"})

    return videos.mapInPandas(sample, schema=VIDEO_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# fake-image resize (binary→binary 1→1 shape, oracle-checked)
# ---------------------------------------------------------------------------

RESIZE_TARGET = 64


def decode_and_resize(data: bytes, target: int):
    """Real decode+resize — requires an imaging library (not in this
    container); exercised via :func:`fake_resize_image`."""
    raise NotImplementedError(
        "image resize requires PIL/pillow; use fake_resize_image for the "
        "deterministic test path"
    )


def fake_resize_image(data: bytes, target: int) -> dict:
    """Deterministic fake resize: output 'image' bytes are a salted md5
    chain over the input (so downstream sees a real binary column of a
    plausible thumbnail size), plus the clamped output dimensions."""
    src = fake_decode_image(data)
    scale = target / max(src["width"], src["height"])
    out_w = max(1, int(src["width"] * scale))
    out_h = max(1, int(src["height"] * scale))
    thumb = hashlib.md5(data + b":resize:" + str(target).encode()).digest()
    return {"out_w": out_w, "out_h": out_h, "thumb": thumb}


@register(
    "mm_image_resize",
    # int(w*scale) truncates toward zero exactly like DuckDB's
    # CAST(TRUNC(...) AS INT) on nonnegative doubles; the thumb bytes are
    # md5(raw || ':resize:64'), hex-comparable in SQL
    oracle=f"""
    WITH h AS (
      SELECT doc_id, 'IMG0' || text AS raw, md5('IMG0' || text) AS hx
      FROM documents
    ), dims AS (
      SELECT doc_id, raw,
             16 + ('0x' || substr(hx, 1, 2))::INT % 64 AS w,
             16 + ('0x' || substr(hx, 3, 2))::INT % 64 AS h
      FROM h
    )
    SELECT doc_id,
           CAST(TRUNC(w * ({RESIZE_TARGET}.0 / greatest(w, h))) AS INT) AS out_w,
           CAST(TRUNC(h * ({RESIZE_TARGET}.0 / greatest(w, h))) AS INT) AS out_h,
           md5(raw || ':resize:{RESIZE_TARGET}') AS thumb_md5
    FROM dims
    """,
    doc="Image resize pipeline: binary in → (dims, thumbnail binary) out "
        "via Arrow-batched mapInPandas — the binary→binary UDF shape a "
        "real resize uses; decode/resample stubbed behind "
        "NotImplementedError, deterministic fake thumbs verified by md5. "
        f"Aspect-preserving fit into {RESIZE_TARGET}px.",
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")["documents"]
    images = docs.select(
        "doc_id",
        F.encode(F.concat(F.lit("IMG0"), F.col("text")), "UTF-8").alias("image"),
    )
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ])

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = pdf["image"].map(lambda b: fake_resize_image(b, RESIZE_TARGET))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "out_w": res.map(lambda r: r["out_w"]).astype("int32"),
                "out_h": res.map(lambda r: r["out_h"]).astype("int32"),
                "thumb": res.map(lambda r: r["thumb"]),
            })

    resized = images.mapInPandas(resize, schema=out_schema)
    # the fake thumb bytes ARE an md5 digest — hex them for the SQL oracle
    return resized.select(
        "doc_id", "out_w", "out_h",
        F.expr("lower(hex(thumb))").alias("thumb_md5"),
    )


# ---------------------------------------------------------------------------
# cross-video frame dedup (composition: frame sampling -> exact dedup)
# ---------------------------------------------------------------------------

@register(
    "mm_frame_dedup",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, 'VID0' || text AS vid, md5('VID0' || text) AS hx
      FROM documents
    ), meta AS (
      SELECT doc_id, vid,
             10 + ('0x' || substr(hx, 1, 2))::INT % 30 AS n_frames
      FROM h
    ), frames AS (
      SELECT doc_id, CAST(idx AS INT) AS frame_idx,
             md5(vid || ':' || CAST(idx AS VARCHAR)) AS frame_md5
      FROM meta, unnest(range(0, n_frames, {FRAME_SAMPLE_EVERY})) AS t(idx)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(COUNT(DISTINCT frame_md5) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) - COUNT(DISTINCT frame_md5) AS BIGINT)
             AS n_redundant,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_videos
    FROM frames
    """,
    doc="Cross-video frame redundancy accounting: the frame-sampling "
        "pipeline's content fingerprints deduplicated globally — the "
        "multimodal twin of exact text dedup. One shuffle on frame_md5 "
        "(partial distinct-aggregation map-side) over the 1->N exploded "
        "frame stream; at 100 TB this is the standard sharded-by-hash "
        "dedup shape, and the summary is what a storage-planning pass "
        "reads before deciding to collapse frame blobs.",
)
def mm_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = mm_video_frames(spark, sf_dir)
    return frames.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_frames"),
        F.expr("CAST(COUNT(DISTINCT frame_md5) AS BIGINT)").alias("n_distinct"),
        F.expr(
            "CAST(COUNT(*) - COUNT(DISTINCT frame_md5) AS BIGINT)"
        ).alias("n_redundant"),
        F.expr("CAST(COUNT(DISTINCT doc_id) AS BIGINT)").alias("n_videos"),
    )
