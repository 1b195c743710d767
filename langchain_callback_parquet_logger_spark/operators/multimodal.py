"""Multimodal columns: opaque binary payloads + typed metadata, with the
decode / feature-extract stage as Arrow-batched pandas transforms.

Pattern (the one that holds at 100 TB): media lives in a ``binary`` column
(or object-store URIs for large assets) beside a typed metadata struct;
Spark moves the bytes, prunes on the metadata, and only the feature
extractor — a ``mapInPandas`` stage — ever decodes. The decode itself needs
codec libraries (Pillow / torchaudio / pyav) that are NOT in this
container, so the actual decoding is stubbed: ``decode_image`` raises
``NotImplementedError`` unless a library is importable, and the feature
extractor falls back to a **deterministic fake** (byte-level statistics)
so the Spark-side plumbing — schema, batching, partitioning, UDF signature
— is real and tested end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.session import load_table

MEDIA_SCHEMA = (
    "doc_id bigint, media binary, media_type string, width int, height int, "
    "n_bytes bigint"
)

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, mean_byte double, max_byte int, "
    "checksum string"
)


def attach_media_column(docs: DataFrame) -> DataFrame:
    """Build a synthetic media column from the text bytes (stands in for
    real image/audio payloads) plus typed metadata. In production this
    frame comes straight from the ingest source; the shape is identical."""
    media = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.lit("image/fake").alias("media_type"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        F.octet_length(media).cast("bigint").alias("n_bytes"),
    )


def decode_image(payload: bytes):  # pragma: no cover - import-gated
    """Real decode, gated on an optional codec library (not in this
    container). Raises NotImplementedError when unavailable."""
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow; install it on the cluster "
            "image or rely on the deterministic fallback features"
        ) from e


def extract_features(media_df: DataFrame) -> DataFrame:
    """mapInPandas feature extractor. Arrow-batched: each pandas batch
    holds ~10k rows of bytes; per-row work is vectorized numpy. Falls back
    to deterministic byte statistics when no codec library exists, keeping
    the pipeline runnable (and testable) everywhere."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                buf = bytes(payload)
                arr = np.frombuffer(buf, dtype=np.uint8)
                out.append(
                    (
                        doc_id,
                        len(buf),
                        float(arr.mean()) if len(arr) else 0.0,
                        int(arr.max()) if len(arr) else 0,
                        hashlib.md5(buf).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_bytes", "mean_byte", "max_byte", "checksum"],
            )

    return media_df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only path: no decode, pure columnar — the query shape that
    must NOT touch the bytes (verify via explain: media column pruned)."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_column(docs)
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
    )


ORACLE_MULTIMODAL_META = """
SELECT 'image/fake' AS media_type,
       COUNT(*) AS n_assets,
       SUM(length(text)) AS total_bytes,
       round(AVG(length(text)), 6) AS avg_bytes
FROM documents
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-path plumbing end-to-end with the deterministic fallback.
    checksum is md5 of the payload bytes = md5(text) for utf-8 text — so
    even the mapInPandas feature stage gets a value-level oracle."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_media_column(docs))
    return feats.select(
        "doc_id", "n_bytes", F.round("mean_byte", 6).alias("mean_byte"), "checksum"
    )


ORACLE_MULTIMODAL_FEATURES = """
SELECT doc_id,
       length(text) AS n_bytes,
       round(list_sum(list_transform(range(1, length(text) + 1),
                                     i -> ord(text[i])))::DOUBLE / length(text), 6)
           AS mean_byte,
       md5(text) AS checksum
FROM documents
"""


QUERIES = {
    "q_multimodal_meta": q_multimodal_meta,
    "q_multimodal_features": q_multimodal_features,
}

ORACLES = {
    "q_multimodal_meta": ORACLE_MULTIMODAL_META,
    "q_multimodal_features": ORACLE_MULTIMODAL_FEATURES,
}
