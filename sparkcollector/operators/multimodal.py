"""Multimodal columns: images/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested — schemas, Arrow-batched
``mapInPandas`` signatures, partition sizing — while the actual media
decoding is stubbed (no image/audio libraries ship in this container):
``decode_fn=None`` uses a deterministic fake decoder so tests exercise
the full data path; passing a real decoder (PIL/librosa/ffmpeg) is the
only change needed on a production cluster.

Design rules for binary columns at 100 TB:

* media bytes ride in ONE binary column next to typed metadata columns
  (width/height/codec/...), so metadata predicates prune without
  touching bytes (parquet column pruning + min/max skipping);
* per-batch memory is bounded by rows-per-batch x max_media_bytes —
  callers size ``spark.sql.execution.arrow.maxRecordsPerBatch`` down
  when media is large (the 10k default assumes ~1 KB rows);
* feature extraction emits small fixed-size vectors; the heavy bytes
  are dropped as early as possible in the plan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FEATURE_DIM = 16


def _fake_decode(content: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a 16-dim feature from
    byte statistics.  Stable across runs/engines; replace with a real
    model/DSP call in production."""
    if content is None or len(content) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(content, dtype=np.uint8)
    # byte histogram folded to FEATURE_DIM buckets, L1-normalized
    hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float32)
    return hist / max(hist.sum(), 1.0)


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] | None = None,
) -> DataFrame:
    """binary media -> (media_id, kind, n_bytes, feature[16]).

    ``mapInPandas`` streams Arrow batches through the decoder; the
    output drops the bytes so everything downstream is small.
    """
    decode = decode_fn or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(c, k).tolist()
                for c, k in zip(pdf["content"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_stub(
    media: DataFrame, width: int, height: int
) -> DataFrame:
    """Image-resize plumbing: passes bytes through a mapInPandas stage
    that would call the real resampler; here it restamps the metadata
    and truncates bytes deterministically (STUB — the real kernel needs
    an imaging library absent from this container)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            # STUB: real impl decodes + resamples; the fake keeps a
            # deterministic prefix so sizes change as a resize would.
            budget = max(width * height // 8, 1)
            out["content"] = out["content"].map(
                lambda b: b[:budget] if b is not None else None
            )
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample_stub(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    offset (explode on duration), bytes stubbed to a slice per frame.
    Real decode would seek per offset; the batch shape (1 video row ->
    K frame rows) is the part that matters for the plan."""

    frame_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ms", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized expand: one np.repeat per batch for the row fan-out
        # (no per-row iterrows — the real kernel must keep this shape:
        # a decoder call per FRAME row, never a Python loop per video).
        for pdf in batches:
            durs = pdf["duration_ms"].fillna(0).astype(int).to_numpy()
            n_frames = np.maximum((durs + every_ms - 1) // every_ms, 0)
            idx = np.repeat(np.arange(len(pdf)), n_frames)
            # per-frame offset: global arange minus each row's start
            starts = np.repeat(
                np.concatenate(([0], np.cumsum(n_frames)[:-1])), n_frames
            )
            frame_i = np.arange(len(idx)) - starts
            contents = pdf["content"].to_numpy()

            def chunk(row_i: int, fi: int):
                # STUB: real impl decodes the frame at offset fi*every_ms.
                b = contents[row_i]
                if b is None or not len(b):
                    return None
                j = fi % max(len(b), 1)
                return bytes(b[j : j + 16])

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[idx],
                    "frame_ms": frame_i * every_ms,
                    "content": [
                        chunk(r, f) for r, f in zip(idx, frame_i)
                    ],
                }
            )

    return media.filter("kind = 'video'").mapInPandas(run, schema=frame_schema)


def synth_media(spark, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic fake media table (bytes from a seeded RNG)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(64, 4096))
        content = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                bytearray(content),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 256)) if kind == "image" else None,
                int(rng.integers(16, 256)) if kind == "image" else None,
                int(rng.integers(1000, 20000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
