"""Multimodal columns: opaque binary payloads + typed metadata.

The fact payload is already ``binary`` (Fact.kt:71-96 maps to
BinaryType, SURVEY.md §1.3), so multimodal assets ride the same
envelope: ``payload.data`` carries the bytes, ``payload.format`` the
codec hint ("image/png", "audio/wav", ...).

The Spark-side plumbing here is REAL and tested: schemas, Arrow-batched
``mapInPandas`` UDF signatures, partition sizing. The codec work itself
(image decode, resampling, frame extraction) is STUBBED — the container
has no PIL/ffmpeg — behind ``decode_fn`` hooks with a deterministic
fake implementation, so swapping in a real decoder is a one-function
change and everything around it is already exercised.

Scale notes: mapInPandas streams Arrow batches, so executor memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` x asset
size — for 100 MB videos you lower that to O(1-10) rows per batch and
repartition by size class first.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

THUMB_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("thumb", BinaryType(), True),
        StructField("thumb_w", IntegerType(), False),
        StructField("thumb_h", IntegerType(), False),
    ]
)


def _make_fake_decode() -> Callable[[bytes], tuple[int, int, int]]:
    """Build the deterministic decode stub as a CLOSURE so cloudpickle
    serializes it by value — executor Python workers then don't need
    ``factstore_spark`` importable on their own sys.path."""

    def fake(data: bytes) -> tuple[int, int, int]:
        n = len(data)
        # checksum over CODE POINTS of the first 64 characters (utf-8
        # decode, undecodable bytes -> U+FFFD), not raw bytes: the SQL
        # oracle expresses it as ascii(text[i]) and DuckDB cannot
        # address blob bytes, so code points are the one formulation
        # both engines can compute identically for non-ASCII payloads.
        text = data.decode("utf-8", "replace") if data else ""
        checksum = sum(ord(c) for c in text[:64])
        width = 16 + (n % 624)
        height = 16 + (checksum % 464)
        n_frames = 1 + (n % 24)
        return width, height, n_frames

    return fake


# Deterministic stand-in for an image/video header parse: derives
# (width, height, n_frames) from the byte content. Replace with
# PIL.Image.open / pyav probing in a real deployment.
fake_decode = _make_fake_decode()


def real_decode(data: bytes):  # pragma: no cover - deliberate stub
    """The genuine decode hook. Not implementable in this container
    (no PIL/ffmpeg); kept as the documented extension point."""
    raise NotImplementedError(
        "install pillow / pyav and replace decode_fn=fake_decode"
    )


def extract_media_meta(
    df: DataFrame,
    id_col: str = "media_id",
    data_col: str = "data",
    format_col: str = "format",
    decode_fn: Callable[[bytes], tuple[int, int, int]] = fake_decode,
) -> DataFrame:
    """Arrow-batched metadata extraction over binary media columns.

    mapInPandas keeps the binary payload off the driver and lets the
    decode hook run vectorized per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "format": pdf[format_col] if format_col in pdf else None,
                    "n_bytes": pdf[data_col].map(lambda b: len(b) if b is not None else 0),
                }
            )
            decoded = pdf[data_col].map(lambda b: decode_fn(bytes(b) if b is not None else b""))
            out["width"] = decoded.map(lambda t: t[0]).astype("int32")
            out["height"] = decoded.map(lambda t: t[1]).astype("int32")
            out["n_frames"] = decoded.map(lambda t: t[2]).astype("int32")
            yield out

    cols = [id_col, data_col] + ([format_col] if format_col in df.columns else [])
    return df.select(*cols).mapInPandas(run, MEDIA_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_nth: int = 8,
    id_col: str = "media_id",
    data_col: str = "data",
    decode_fn: Callable[[bytes], tuple[int, int, int]] = fake_decode,
) -> DataFrame:
    """Frame-sampling plumbing: emits one row per sampled frame with a
    deterministic fake frame payload (slice of the source bytes). A real
    implementation passes a ``decode_fn`` (same hook contract as
    extract_media_meta — swapping in a real decoder must be a
    one-argument change, never an operator edit) and swaps the slicing
    for ffmpeg keyframe extraction; the explode shape, schema, and
    batch flow are what this exercises."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_no", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                raw = bytes(data) if data is not None else b""
                _, _, n_frames = decode_fn(raw)
                for fno in range(0, n_frames, every_nth):
                    ids.append(mid)
                    frame_nos.append(fno)
                    lo = (fno * 17) % max(len(raw), 1)
                    frames.append(raw[lo : lo + 32])
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_no": pd.Series(frame_nos, dtype="int32"),
                 "frame": frames}
            )

    return df.select(id_col, data_col).mapInPandas(run, schema)


def frame_dup_pairs(
    df: DataFrame,
    min_shared: int = 2,
    every_nth: int = 8,
    max_frame_df: int = 20,
    id_col: str = "media_id",
    data_col: str = "data",
    decode_fn: Callable[[bytes], tuple[int, int, int]] = fake_decode,
) -> DataFrame:
    """Media pairs sharing >= ``min_shared`` sampled frames — the
    frame-level near-dup detector a video/image corpus needs (re-posts
    and re-encodes share frames long before they share file bytes).
    Composes the existing plumbing: :func:`sample_frames` -> JVM-side
    xxhash64 per frame -> the same capped inverted-index shape as the
    text dedup core (distinct (media, frame-hash), hot frames above
    ``max_frame_df`` dropped like hot shingles — intros/logos appear in
    everything and would otherwise drive O(df^2) fan-out), pair counts
    via one self-join on the frame hash. With a real decoder plugged
    into sample_frames this becomes true visual dedup; the shape,
    capping, and counting are what run at scale either way."""
    frames = sample_frames(
        df, every_nth=every_nth, id_col=id_col, data_col=data_col,
        decode_fn=decode_fn,
    )
    fh = (
        frames.filter(F.col("frame").isNotNull() & (F.length("frame") > 0))
        .select(F.col("media_id"), F.xxhash64("frame").alias("fh"))
        .distinct()
    )
    hot = (
        fh.groupBy("fh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_frame_df)
        .select("fh")
    )
    cold = fh.join(hot, "fh", "left_anti")
    a = cold.alias("a")
    b = cold.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fh") == F.col("b.fh"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("id_a"), F.col("b.media_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_frames"))
        .filter(F.col("shared_frames") >= min_shared)
    )


def extract_features(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "media_id",
    data_col: str = "data",
) -> DataFrame:
    """Media bytes -> feature embedding (``array<float>``), Arrow-batched.

    The featurizer here is a deterministic byte-histogram projection
    (numpy, vectorized per batch) standing in for a real vision/audio
    encoder; the output feeds directly into the similarity operators
    (cosine top-k / IVF / embedding dedup), which is the point: the
    multimodal column pipeline composes with the ANN pipeline."""
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for data in pdf[data_col]:
                raw = np.frombuffer(bytes(data) if data is not None else b"", dtype=np.uint8)
                if raw.size == 0:
                    feats.append(np.zeros(dim, dtype=np.float32).tolist())
                    continue
                hist = np.bincount(raw % dim, minlength=dim).astype(np.float32)
                norm = float(np.linalg.norm(hist)) or 1.0
                feats.append((hist / norm).tolist())
            yield pd.DataFrame(
                {"media_id": pdf[id_col].astype("int64"), "embedding": feats}
            )

    return df.select(id_col, data_col).mapInPandas(run, schema)


def resize_media(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    id_col: str = "media_id",
    data_col: str = "data",
) -> DataFrame:
    """Resize plumbing: emits (media_id, thumb, thumb_w, thumb_h) with a
    deterministic fake thumbnail (strided byte sample sized w*h). A real
    deployment swaps the sampler for PIL's ``Image.resize`` inside the
    same batch loop — schema, batching and memory shape are what this
    exercises."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = target_w * target_h
        for pdf in batches:
            # fresh accumulators per batch (like sample_frames /
            # extract_features) — shared lists with a post-yield reset
            # re-emit every prior batch if the reset line ever moves
            out_ids, thumbs = [], []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                raw = bytes(data) if data is not None else b""
                stride = max(len(raw) // n, 1)
                thumbs.append(raw[::stride][:n])
                out_ids.append(mid)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "thumb": thumbs,
                    "thumb_w": pd.Series([target_w] * len(out_ids), dtype="int32"),
                    "thumb_h": pd.Series([target_h] * len(out_ids), dtype="int32"),
                }
            )

    return df.select(id_col, data_col).mapInPandas(run, THUMB_SCHEMA)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: treat the testdata ``documents`` table as a media corpus
    (text bytes standing in for encoded assets) so the multimodal
    plumbing is exercised end-to-end on real partitions."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
        F.lit("application/octet-stream").alias("format"),
    )
