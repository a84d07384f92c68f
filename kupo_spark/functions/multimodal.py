"""Multimodal column plumbing — binary payloads + typed metadata, processed
with Arrow-batched ``mapInPandas``.

Real media codecs (PIL/ffmpeg/torchaudio) are not in this container, so the
*decode kernel* is pluggable: the default is a deterministic fake
(byte-level features) and a ``strict`` mode raises ``NotImplementedError``
exactly where a real decoder would plug in.  Everything Spark-side — the
schema, the Arrow batch shape, partition-preserving execution, column
pruning before the Python boundary — is real and is what matters at 100 TB:
only (id, content) cross into Python, in Arrow record batches, and the
kernel is applied per-batch, never per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, content binary, "
    "meta struct<source: string, n_bytes: bigint>"
)

FEATURE_SCHEMA = "doc_id bigint, width int, height int, n_bytes bigint"


def as_media_table(docs: DataFrame) -> DataFrame:
    """Lift the documents table into the opaque-binary media shape (the
    text bytes stand in for an image payload)."""
    return docs.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.octet_length("text").cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decode: dimensions derived from
    the first/last payload bytes.  Replace with a real codec in production."""
    if not content:
        return (16, 16)
    return (content[0] % 64 + 16, content[-1] % 64 + 16)


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Batch feature extraction over the binary column via mapInPandas.

    ``strict=True`` marks the real-codec path: raises NotImplementedError
    (no media libraries in this container)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg; not available here"
                )
            dims = [_fake_decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                }
            )

    # prune to the two needed columns BEFORE crossing the Python boundary
    return media.select("doc_id", "content").mapInPandas(kernel, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through the Arrow boundary and tags
    the target geometry; the pixel transform itself is the pluggable kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": pdf["content"],
                    "width": width,
                    "height": height,
                }
            )

    return media.select("doc_id", "content").mapInPandas(
        kernel, "doc_id bigint, content binary, width int, height int"
    )


def frame_sample(
    media: DataFrame, frame_bytes: int = 64, every: int = 4, strict: bool = False
) -> DataFrame:
    """Frame-sampling plumbing for audio/video payloads: one output row per
    sampled frame, exploded *inside* the Arrow kernel so the Python
    boundary is crossed once per batch, not per frame.

    The deterministic stand-in treats the payload as fixed-size frames of
    ``frame_bytes`` and keeps every ``every``-th — a real deployment swaps
    the chunker for an ffmpeg/pyav keyframe iterator with the identical
    (doc_id, frame_index, frame) output contract.  ``strict=True`` marks
    that real-codec path (no media libraries in this container).

    Scale shape: output inflates rows by ~payload/(frame_bytes·every); the
    kernel is partition-preserving (no shuffle), so downstream per-frame
    feature extraction starts co-located with the source document."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real frame decoding requires ffmpeg/pyav; not available here"
                )
            ids, idxs, frames = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if content is None:
                    continue
                n_frames = (len(content) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(bytes(content[fi * frame_bytes:(fi + 1) * frame_bytes]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_index": idxs, "frame": frames}
            ).astype({"doc_id": "int64", "frame_index": "int32"})

    return media.select("doc_id", "content").mapInPandas(
        kernel, "doc_id bigint, frame_index int, frame binary"
    )
