"""Multimodal columns: binary payloads + typed metadata + batch UDF plumbing.

North-star surface (BASELINE.json): treat image/audio/video as opaque
``binary`` columns with a typed metadata struct, and run decode /
feature-extract steps as Arrow-batched pandas functions over
``mapInPandas``. The decode itself is STUBBED (no image/audio codecs in
this container — ``decode_image`` raises ``NotImplementedError`` unless
the deterministic fake is requested), but everything Spark-side is
real and tested: schema, batch iteration, partitioning, output shapes.

Scale notes: binary payloads ride the same parquet scan as everything
else (no per-row fetches); ``mapInPandas`` keeps the Python boundary
Arrow-batched (one FFI hop per ~10k rows, not per row); feature
columns come back as typed arrays so downstream similarity/dedup run
JVM-side again.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load

ASSET_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "meta struct<width: int, height: int, n_bytes: bigint>"
)

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, "
    "feat_len double, feat_first double, feat_last double"
)


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Decode an image payload into pixel features.

    STUB: real decoding needs an image codec this container doesn't
    ship. ``fake=True`` returns a deterministic byte-statistics vector
    (used by the registered query so the plumbing is end-to-end
    testable); ``fake=False`` is the production signature.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library; wire one in here "
            "(PIL/torchvision/ffmpeg) on a real cluster"
        )
    if not payload:
        return [0.0, 0.0, 0.0]
    # byte length (matches octet_length) but code points for the first/
    # last "pixel" (matches the oracle's ascii(substr(text, ...)), and
    # stays correct when the text isn't pure ASCII)
    text = payload.decode("utf-8")
    return [float(len(payload)), float(ord(text[0])), float(ord(text[-1]))]


def assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a multimodal asset table from documents: the text
    payload stands in for an opaque binary blob, with typed metadata."""
    docs = load(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           CAST(octet_length(CAST(text AS BLOB)) / 1024.0 >= 1.0 AS BOOLEAN)
               AS is_large
    FROM documents
    """,
    doc="Multimodal asset metadata: binary payload size + typed fields, "
    "computed JVM-side from the payload column.",
    tags=("multimodal",),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = assets_from_documents(spark, sf_dir)
    return assets.select(
        "doc_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        (F.col("meta.n_bytes") / 1024.0 >= 1.0).alias("is_large"),
    )


@register(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           CAST(octet_length(CAST(text AS BLOB)) AS DOUBLE) AS feat_len,
           CAST(ascii(substr(text, 1, 1)) AS DOUBLE) AS feat_first,
           CAST(ascii(substr(text, length(text), 1)) AS DOUBLE) AS feat_last
    FROM documents
    """,
    doc="Arrow-batched feature extraction over binary payloads via "
    "mapInPandas (deterministic fake decoder; real decoder is the stub "
    "in decode_image). The oracle replays the fake's byte statistics. "
    "The 3-dim feature vector is emitted as scalar columns so result "
    "canonicalizers can sort/hash rows.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = assets_from_documents(spark, sf_dir).select("doc_id", "payload")

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            feats = pdf["payload"].map(lambda p: decode_image(bytes(p), fake=True))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feat_len": feats.map(lambda f: f[0]),
                    "feat_first": feats.map(lambda f: f[1]),
                    "feat_last": feats.map(lambda f: f[2]),
                }
            )

    return assets.mapInPandas(extract, schema=FEATURE_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_idx,
           CAST(greatest(length(text) // 4, 1) AS BIGINT) AS frame_bytes,
           md5(substr(text, CAST(f * greatest(length(text) // 4, 1) + 1 AS INTEGER),
                      CAST(greatest(length(text) // 4, 1) AS INTEGER))) AS frame_hash
    FROM documents, unnest(generate_series(0, 3)) AS t(f)
    WHERE length(text) >= 4
    """,
    doc="Frame sampling (video-style 1→N): each asset yields 4 evenly "
    "spaced payload frames via mapInPandas — the batch-UDTF shape for "
    "decode/frame-extract pipelines. Deterministic fake sampler so the "
    "oracle replays it: frames are sliced on decoded characters (the "
    "oracle's substr is character-based) and hashed as their UTF-8 "
    "bytes (DuckDB's md5 of VARCHAR hashes UTF-8) — exact for "
    "non-ASCII text too. A real decoder plugs into the same iterator.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = assets_from_documents(spark, sf_dir).select("doc_id", "payload")
    return sample_frames_df(assets)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes bigint, frame_hash string"


def sample_frames_df(assets: DataFrame) -> DataFrame:
    """Apply the frame sampler to any DataFrame[doc_id, payload binary]."""

    def sample_frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_hash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8")
                if len(text) < 4:
                    continue
                flen = max(len(text) // 4, 1)
                for f in range(4):
                    chunk = text[f * flen : f * flen + flen]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(f)
                    rows["frame_bytes"].append(flen)
                    rows["frame_hash"].append(
                        hashlib.md5(chunk.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(sample_frames, schema=FRAME_SCHEMA)
