"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``
(SURVEY.md extension surface: image/audio/video as binary columns).

The image/audio decode libraries are not in this container, so the
actual decoders are STUBS (clearly-marked NotImplementedError); the
Spark-side plumbing — binary schema, metadata struct, Arrow batch
shapes, partition-preserving mapInPandas — is real and tested. At
100 TB this pattern is the only sane one: payloads stay as parquet
binary (never JSON/base64), flow executor-side in Arrow batches, and
feature extraction is embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature extractor (stable driver contract).
FEATURE_SCHEMA = (
    "doc_id BIGINT, modality STRING, n_bytes BIGINT, "
    "checksum BIGINT, head_hex STRING"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal row: binary payload + typed metadata struct.

    The fixtures have no real image bytes, so the payload is the
    UTF-8 encoding of the text column — the *schema and motion* are
    identical to a real image/audio pipeline (binary column + struct
    metadata), which is what the plumbing test needs to pin down.
    """
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text-blob").alias("modality"),
            F.octet_length(text_col).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB: real image decode (PIL/libjpeg not in this container).

    Cited pattern: at scale this body would be
    ``PIL.Image.open(io.BytesIO(payload))`` + resize/normalize, still
    inside the same mapInPandas batch loop.
    """
    raise NotImplementedError(
        "image decode requires PIL/libjpeg, not available in this "
        "container; the mapInPandas plumbing around it is real"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake 'features' (length, additive checksum, head
    bytes) stand in for decode+embed; the batch loop, schema contract,
    and zero-shuffle parallelism are the real deliverables.
    """

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(len).astype("int64"),
                    # additive byte checksum mod 2^31: order-free, exact
                    "checksum": payloads.map(
                        lambda b: sum(b) % 2_147_483_647
                    ).astype("int64"),
                    "head_hex": payloads.map(lambda b: b[:8].hex()),
                }
            )

    return df.mapInPandas(_batches, schema=FEATURE_SCHEMA)
