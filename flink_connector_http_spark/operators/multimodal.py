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
