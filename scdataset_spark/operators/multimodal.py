"""Multimodal binary columns (SURVEY.md §2.14): images/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-
vectorized ``mapInPandas`` stages.

The real decoders (PIL/librosa/av) are not in this container, so the
decode step is STUBBED: with the libraries absent, a clearly-marked
deterministic fake derives metadata from the raw bytes.  Everything
around the stub — schema, batching, partitioning, UDF signature, Arrow
chunk shape — is real, tested Spark plumbing, and because the fake is
a pure function of the bytes the DuckDB oracle checks the whole
pipeline end-to-end.

At 100 TB: binary payloads stay in Parquet (or object-store paths for
>1 MB blobs with the column holding the pointer), decode runs where the
data is, and only the small typed metadata flows onward.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = "doc_id bigint, width int, height int, mean_byte double"

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def with_fake_image(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a deterministic 16-byte binary 'image' per row
    (md5 of the id, unhexed) — the stand-in for a real image column."""
    return df.withColumn(
        "image", F.unhex(F.md5(F.col(id_col).cast("string")))
    )


def decode_images(df: DataFrame, id_col: str = "doc_id", image_col: str = "image") -> DataFrame:
    """Decode stub: bytes → (width, height, mean_byte).

    With PIL installed this would be ``Image.open(BytesIO(b))``; the
    deterministic fake reads dimensions from the first bytes and the
    mean over all bytes — byte-for-byte reproducible by the oracle.
    """

    def decode(chunks: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in chunks:
            if HAVE_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "real decode path: Image.open(BytesIO(b)) -> size/mean"
                )
            rows = []
            for i, b in zip(pdf[id_col], pdf[image_col]):
                b = bytes(b)
                rows.append(
                    (
                        int(i),
                        32 + b[0] % 97,
                        32 + b[1] % 97,
                        sum(b) / len(b),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "mean_byte"])

    return df.select(id_col, image_col).mapInPandas(decode, schema=DECODE_SCHEMA)


def resize_stub(df: DataFrame, target: int = 224) -> DataFrame:
    """Resize stub: records the target box arithmetic (aspect-preserving
    short-side resize) from decoded metadata — the real pixel work is
    NotImplementedError until PIL exists; the planning math is real."""
    scale = F.lit(target) / F.least("width", "height")
    return df.select(
        "doc_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("resized_w"),
        F.round(F.col("height") * scale).cast("int").alias("resized_h"),
    )


def frame_sample_plan(df: DataFrame, n_frames: int = 8, fps_col: str = "width") -> DataFrame:
    """Frame-sampling plan for video stubs: evenly spaced frame indices
    via sequence arithmetic (the decode of those frames is the stubbed
    step).  Uses built-in sequence/transform — no Python."""
    return df.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, {n_frames - 1}), i -> CAST(i * width / {n_frames} AS INT))"
        ).alias("frame_indices"),
    )


FEATURE_SCHEMA = (
    "doc_id bigint, f0 bigint, f1 bigint, f2 bigint, f3 bigint, "
    "sample_rate int, duration_ms int, rms double"
)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "image"
) -> DataFrame:
    """Feature-extraction stub over opaque binary blobs (the
    embed-the-image / fingerprint-the-audio step): a 4-bin byte-sum
    'embedding' (stride-4 sums — stand-in for a CNN/CLAP forward pass)
    plus audio-style metadata (fake sample rate / duration derived from
    header bytes, real RMS over the payload).  One Arrow
    ``mapInPandas`` stage; every output is a pure function of the bytes
    so the DuckDB oracle replays it from the md5 hex."""

    def extract(chunks: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in chunks:
            rows = []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(b)
                if len(b) < 5:
                    # fail fast WITH context: one truncated payload
                    # should name its row, not die as a bare IndexError
                    raise ValueError(
                        f"blob for {id_col}={i} has {len(b)} bytes; "
                        "extract_features needs >= 5 (header) bytes"
                    )
                f = [sum(b[j::4]) for j in range(4)]
                rows.append(
                    (
                        int(i),
                        *f,
                        8000 + (b[2] % 8) * 4000,
                        100 + (b[3] * b[4]) % 900,
                        # raw value — callers round ENGINE-side
                        # (F.round) so both engines share one rounding
                        # rule; Python round() is half-even decimal,
                        # subtly different near ...5 boundaries
                        math.sqrt(sum(x * x for x in b) / len(b)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "f0", "f1", "f2", "f3",
                    "sample_rate", "duration_ms", "rms",
                ],
            )

    return df.select(id_col, blob_col).mapInPandas(extract, schema=FEATURE_SCHEMA)
