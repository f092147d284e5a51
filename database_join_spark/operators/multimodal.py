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


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """STUB: real resize (PIL not in this container).

    Production body: ``PIL.Image.open(io.BytesIO(payload)).resize(
    (width, height))`` inside the same mapInPandas batch loop as
    :func:`extract_features` — resize is per-row, shuffle-free.
    """
    raise NotImplementedError(
        "image resize requires PIL; the mapInPandas plumbing is real"
    )


#: Output schema of the frame sampler (one row per sampled frame).
FRAME_SCHEMA = "doc_id BIGINT, frame_idx BIGINT, frame_payload BINARY"


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one input row → many frame rows.

    The decode step is a deterministic fake (the 'video' is treated
    as a sequence of fixed-size byte windows standing in for frames;
    a real body uses pyav/ffmpeg inside the same loop). The Spark
    contract is what's tested: row explosion inside ``mapInPandas``
    with a stable schema, no shuffle, output size ∝ frames kept.
    """

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frame_bytes = 16  # fake fixed-size frame window
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_payload": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(payload) // frame_bytes, 1)
                for idx in range(0, n_frames, every_n):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(idx)
                    out["frame_payload"].append(
                        bytes(payload[idx * frame_bytes:(idx + 1) * frame_bytes])
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, schema=FRAME_SCHEMA)


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
