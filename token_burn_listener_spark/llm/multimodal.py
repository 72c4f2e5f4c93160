"""B10 — multimodal (binary) column handling (SURVEY.md §2.B10).

Media are opaque ``binary`` columns with typed metadata; per-item decode /
feature extraction runs as an Arrow-batched ``mapInPandas`` pass — the
shape a 100 TB image/audio corpus uses (decode is per-partition, embarrassingly
parallel, never on the driver).

The decode step itself is a STUB: image/audio libraries are not in this
container, so ``_fake_decode`` derives deterministic pseudo-features from
the raw bytes (documented below). The Spark-side plumbing — binaryFile
source, schema, Arrow batch iteration, UDF signature — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from token_burn_listener_spark.registry import query

MULTIMODAL_SCHEMA = (
    "file_name string, n_bytes long, content_sha256 string, "
    "fake_width long, fake_height long, fake_mean double"
)


def _fake_decode(content: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decode (STUB — no media libs here).

    A real pipeline would replace this body with PIL/ffmpeg/etc. Width and
    height come from the first content bytes; the 'pixel mean' is the mean
    of the first 4 KiB of bytes. Same bytes → same features, everywhere.
    """
    width = 1 + content[0] if content else 0
    height = 1 + content[1] if len(content) > 1 else 0
    head = content[:4096]
    mean = round(sum(head) / len(head), 6) if head else 0.0
    return width, height, mean


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: one Arrow batch of (path, content, ...) in, features out."""
    for pdf in batches:
        feats = [_fake_decode(c) for c in pdf["content"]]
        yield pd.DataFrame(
            {
                "file_name": pdf["path"].map(lambda p: p.rsplit("/", 1)[-1]),
                "n_bytes": pdf["length"],
                "content_sha256": pdf["content"].map(
                    lambda c: hashlib.sha256(c).hexdigest()
                ),
                "fake_width": [f[0] for f in feats],
                "fake_height": [f[1] for f in feats],
                "fake_mean": [f[2] for f in feats],
            }
        )


@query("q_llm_multimodal")  # rows-only: paths/sizes are machine-local
def q_llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary ingestion → Arrow-batched decode → content-hash dedup tag.

    Reads the fixture parquet files themselves as opaque blobs (the corpus
    stand-in), extracts stub features per item via mapInPandas, and marks
    content-duplicate groups by sha256 — the multimodal dedup key.
    """
    blobs = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
    feats = blobs.mapInPandas(decode_batches, MULTIMODAL_SCHEMA)
    dups = feats.groupBy("content_sha256").agg(F.count("*").alias("n_same_content"))
    return (
        feats.join(F.broadcast(dups), "content_sha256")
        .select(
            "file_name",
            "n_bytes",
            "content_sha256",
            "fake_width",
            "fake_height",
            "fake_mean",
            "n_same_content",
        )
        .orderBy("file_name")
    )


FRAME_SCHEMA = (
    "file_name string, frame_idx long, frame_off long, frame_sha256 string, "
    "resized_w long, resized_h long"
)

N_FRAMES = 4
FRAME_BYTES = 1024


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: N evenly-spaced 'frames' (byte slices) per blob.

    The frame-sample + resize shapes of a video pipeline with the decode
    STUBBED (no media libs in container): frames are fixed-width byte
    windows at evenly spaced offsets; 'resize' emits the target dims a real
    resampler would produce. The Spark-side contract — one input blob →
    N output rows, Arrow-batched, constant memory — is the real thing.
    """
    for pdf in batches:
        names, idxs, offs, shas, ws, hs = [], [], [], [], [], []
        for path, content in zip(pdf["path"], pdf["content"]):
            stride = max(len(content) // N_FRAMES, 1)
            for i in range(N_FRAMES):
                off = min(i * stride, max(len(content) - FRAME_BYTES, 0))
                frame = content[off : off + FRAME_BYTES]
                names.append(path.rsplit("/", 1)[-1])
                idxs.append(i)
                offs.append(off)
                shas.append(hashlib.sha256(frame).hexdigest())
                ws.append(224)  # stub resize target
                hs.append(224)
        yield pd.DataFrame(
            {
                "file_name": names,
                "frame_idx": idxs,
                "frame_off": offs,
                "frame_sha256": shas,
                "resized_w": ws,
                "resized_h": hs,
            }
        )


@query("q_llm_frames")  # rows-only: paths/byte layout are machine-local
def q_llm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling + resize over binary media (extra, beyond §2.B10).

    One blob in → N frame rows out through mapInPandas — the video
    ingestion shape (sample → decode → resize → embed) with decode stubbed
    deterministically; see sample_frames.
    """
    blobs = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
    return blobs.mapInPandas(sample_frames, FRAME_SCHEMA).orderBy(
        "file_name", "frame_idx"
    )
