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
    """Deterministic byte-metadata decode: bytes → (width, height,
    mean_byte), a pure function of the blob (dimensions from the first
    two bytes, mean over all bytes) — byte-for-byte reproducible by the
    DuckDB oracle, so it stays the oracle-checked path REGARDLESS of
    what imaging libraries the environment has.  Real image decoding is
    the separate, env-gated :func:`decode_images_pil`.
    """

    def decode(chunks: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = ["doc_id", "width", "height", "mean_byte"]
        for pdf in chunks:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            # vectorized over the whole Arrow chunk: one byte buffer +
            # per-blob offsets; no per-row Python (a real decoder is
            # inherently per-row, but the stub shouldn't be)
            blobs = [bytes(b) for b in pdf[image_col]]
            lens = np.fromiter((len(b) for b in blobs), np.int64, len(blobs))
            if (lens < 2).any():
                bad = int(pdf[id_col].iloc[int(np.argmax(lens < 2))])
                raise ValueError(
                    f"blob for {id_col}={bad} is shorter than the 2-byte "
                    "dimension header"
                )
            data = np.frombuffer(b"".join(blobs), np.uint8).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(np.int64),
                    "width": (32 + data[starts] % 97).astype(np.int32),
                    "height": (32 + data[starts + 1] % 97).astype(np.int32),
                    "mean_byte": np.add.reduceat(data, starts) / lens,
                }
            )

    return df.select(id_col, image_col).mapInPandas(decode, schema=DECODE_SCHEMA)


def decode_images_pil(
    df: DataFrame, id_col: str = "doc_id", image_col: str = "image"
) -> DataFrame:
    """REAL image decode (width/height via ``Image.open``, mean over
    decoded pixels) — env-gated on Pillow, which this container
    prohibits installing (README: Environment gates); the Spark plumbing
    (schema, Arrow batching, per-chunk decode loop) is identical to the
    oracle-checked :func:`decode_images` stub.  A real decoder is
    inherently per-blob Python, so the loop is per row WITHIN an Arrow
    chunk — the same cost model as any image pipeline."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "decode_images_pil needs Pillow, which is not installed and "
            "cannot be installed in this container; use decode_images "
            "(deterministic byte-metadata decode) instead"
        )

    def decode(chunks: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        import numpy as np

        for pdf in chunks:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[image_col]):
                with Image.open(io.BytesIO(bytes(blob))) as im:
                    arr = np.asarray(im.convert("L"), dtype=np.float64)
                    rows.append((int(i), im.width, im.height, float(arr.mean())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mean_byte"]
            )

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
        import numpy as np

        cols = [
            "doc_id", "f0", "f1", "f2", "f3",
            "sample_rate", "duration_ms", "rms",
        ]
        for pdf in chunks:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            blobs = [bytes(b) for b in pdf[blob_col]]
            n = len(blobs)
            lens = np.fromiter((len(b) for b in blobs), np.int64, n)
            if (lens < 5).any():
                # fail fast WITH context: one truncated payload should
                # name its row, not die as a bare IndexError
                i = int(np.argmax(lens < 5))
                raise ValueError(
                    f"blob for {id_col}={pdf[id_col].iloc[i]} has "
                    f"{int(lens[i])} bytes; extract_features needs >= 5 "
                    "(header) bytes"
                )
            data = np.frombuffer(b"".join(blobs), np.uint8).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            if (lens == lens[0]).all():
                # uniform blob length (the common fixed-record case):
                # reshape once, lane sums are pure strided reductions
                m = data.reshape(n, int(lens[0]))
                lanes = [m[:, j::4].sum(axis=1) for j in range(4)]
                sq_sum = (m * m).sum(axis=1)
            else:
                # ragged: scatter-add each byte into its (row, pos%4)
                # lane — still no per-row Python loop
                seg = np.repeat(np.arange(n), lens)
                lane = (np.arange(data.shape[0]) - np.repeat(starts, lens)) & 3
                acc = np.zeros((n, 4), np.int64)
                np.add.at(acc, (seg, lane), data)
                lanes = [acc[:, j] for j in range(4)]
                sq_sum = np.add.reduceat(data * data, starts)
            b2 = data[starts + 2]
            b3 = data[starts + 3]
            b4 = data[starts + 4]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(np.int64),
                    "f0": lanes[0],
                    "f1": lanes[1],
                    "f2": lanes[2],
                    "f3": lanes[3],
                    "sample_rate": (8000 + (b2 % 8) * 4000).astype(np.int32),
                    "duration_ms": (100 + (b3 * b4) % 900).astype(np.int32),
                    # raw value — callers round ENGINE-side (F.round) so
                    # both engines share one rounding rule
                    "rms": np.sqrt(sq_sum / lens),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(extract, schema=FEATURE_SCHEMA)
