"""Multimodal columns: opaque binary payloads + typed metadata.

The fact payload is already ``binary`` (Fact.kt:71-96 maps to
BinaryType, SURVEY.md §1.3), so multimodal assets ride the same
envelope: ``payload.data`` carries the bytes, ``payload.format`` the
codec hint ("image/png", "audio/wav", ...).

The Spark-side plumbing here is REAL and tested: schemas, Arrow-batched
``mapInPandas`` UDF signatures, partition sizing. Decoding is real too
for PNG/BMP/WAV via the pure-stdlib codecs (operators/codecs.py, round
11): ``real_decode`` + the ``decode_real_meta`` / ``real_thumbnails`` /
``synth_media_corpus`` pipeline run on actual encoded bytes end-to-end
(battery entries media_real_meta / media_real_thumbs /
media_real_content_dup are oracle-checked per decoded byte). The
``decode_fn`` hook with the deterministic fake remains for the
fake-decode entries and as the swap point for native-lib formats
(JPEG/MP4 — PIL/pyav are not installable in this container).

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


def real_decode(data: bytes) -> tuple[int, int, int]:
    """The genuine decode hook for the decode_fn contract, backed by
    the pure-stdlib codecs (operators/codecs.py): PNG/BMP/JPEG return
    (width, height, 1), GIF (width, height, frame count); WAV returns
    (n_channels, sample_rate, n_frames); MP4 returns the container's
    (width, height, n_frames) via the ISO BMFF box walk — only the
    H.264 PIXEL decode remains native-lib territory
    (codecs.mp4_decode_frames)."""
    from .codecs import decode_media

    m = decode_media(data)
    return m["width"], m["height"], m["n_frames"]


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


# ---------------------------------------------------------------------------
# Real-decode pipeline (round 11): synthetic media with REAL encoded
# bytes (PNG through all five scanline filters, BMP, WAV PCM), decoded
# by the pure-stdlib codecs inside the same mapInPandas plumbing the
# fake-decode entries exercise. The generation rule is simple integer
# arithmetic on doc_id, so a SQL oracle replays every decoded byte.
# ---------------------------------------------------------------------------

# The shared generation rule (Spark synth + SQL oracle both implement
# it; keep in sync with MEDIA_REAL_* oracles in queries.py):
#   s       = doc_id % group_mod   (group_mod=None -> s = doc_id)
#   fmt     = s % 3: 0 -> png, 1 -> bmp, 2 -> wav
#   png     : w = 16 + s % 17, h = 16 + (s*7) % 13, RGB,
#             pixel[i] = (s + i) % 251      (i over w*h*3, row-major)
#   bmp     : w = 8 + s % 21,  h = 8 + (s*5) % 11, same pixel rule
#   wav     : rate = 8000 + (s % 8) * 1000, mono 16-bit,
#             n = 64 + s % 129, sample[i] = ((s*31 + i*7) % 65536) - 32768
MEDIA_SYNTH_RULE_VERSION = 1


SYNTH_CORPUS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), False),
        StructField("data", BinaryType(), False),
    ]
)


def synth_media_corpus(
    df: DataFrame, id_col: str = "doc_id", group_mod: int | None = None
) -> DataFrame:
    """ids -> (media_id, format, data) with REAL encoded PNG/BMP/WAV
    bytes, Arrow-batched on executors (the driver never holds payload
    bytes). ``group_mod`` makes ids congruent mod N byte-identical —
    the content-dup fixture for the real frame-dup entry."""
    run = _synth_media_run(id_col, group_mod)
    # ids-only repartition: spreads the pure-python encoders across
    # cores when the source parquet has few files
    sc = df.sparkSession.sparkContext
    return df.select(id_col).repartition(sc.defaultParallelism).mapInPandas(
        run, SYNTH_CORPUS_SCHEMA
    )


def _synth_media_run(id_col: str, group_mod: int | None = None):
    """Iterator-transformer behind :func:`synth_media_corpus`, factored
    out so fused entry points can compose it with a probe transformer
    inside ONE ``mapInPandas`` (payload bytes then never cross the
    JVM↔Python boundary — guide §4)."""
    from .codecs import _build_codecs

    codecs = _build_codecs()
    png_enc, bmp_enc, wav_enc = (
        codecs["png_encode"], codecs["bmp_encode"], codecs["wav_encode"],
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        def synth(s: int) -> tuple[str, bytes]:
            fmt = s % 3
            if fmt == 0:
                w, h = 16 + s % 17, 16 + (s * 7) % 13
                px = bytes((s + i) % 251 for i in range(w * h * 3))
                return "png", png_enc(px, w, h, filter_mode="cycle")
            if fmt == 1:
                w, h = 8 + s % 21, 8 + (s * 5) % 11
                px = bytes((s + i) % 251 for i in range(w * h * 3))
                return "bmp", bmp_enc(px, w, h)
            rate = 8000 + (s % 8) * 1000
            n = 64 + s % 129
            samples = b"".join(
                _struct.pack("<h", ((s * 31 + i * 7) % 65536) - 32768)
                for i in range(n)
            )
            return "wav", wav_enc(samples, rate, n_channels=1)

        for pdf in batches:
            ids, fmts, blobs = [], [], []
            for mid in pdf[id_col]:
                s = int(mid) % group_mod if group_mod else int(mid)
                fmt, data = synth(s)
                ids.append(int(mid))
                fmts.append(fmt)
                blobs.append(data)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "format": fmts,
                    "data": blobs,
                }
            )

    return run


REAL_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("fmt", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("checksum", LongType(), False),
        StructField("content_hash", LongType(), False),
    ]
)


def decode_real_meta(
    df: DataFrame, id_col: str = "media_id", data_col: str = "data"
) -> DataFrame:
    """REAL decode of PNG/BMP/WAV payloads -> per-media metadata plus
    two content witnesses computed from the DECODED bytes (never the
    encoded stream): ``checksum`` = sum of decoded pixel bytes (images)
    or decoded int16 samples (audio) — a filter/unfilter bug anywhere
    in the codec path breaks it — and ``content_hash`` = a 64-bit FNV-1a
    over the decoded content (the content-dedup key). For audio,
    width = n_channels and height = sample_rate (documented mapping
    onto the image-shaped meta schema)."""
    run = _decode_real_meta_run(id_col, data_col)
    return df.select(id_col, data_col).mapInPandas(run, REAL_META_SCHEMA)


def _decode_real_meta_run(id_col: str, data_col: str):
    """Iterator-transformer behind :func:`decode_real_meta` (factored
    out for the fused ids→meta entry points — see
    :func:`_fused_ids_pipeline`)."""
    from .codecs import _build_codecs

    decode_media = _build_codecs()["decode_media"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def fnv64(b: bytes) -> int:
            h = 0xCBF29CE484222325
            for byte in b:
                h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            return h - 0x8000000000000000  # signed long range

        for pdf in batches:
            ids, fmts, ws, hs, nfs, cks, chs = [], [], [], [], [], [], []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                m = decode_media(bytes(data))
                ids.append(int(mid))
                fmts.append(m["format"])
                ws.append(m["width"])
                hs.append(m["height"])
                nfs.append(m["n_frames"])
                if m["kind"] == "image":
                    buf = m["pixels"]
                    cks.append(int(np.frombuffer(buf, dtype=np.uint8).sum()))
                elif m["kind"] == "video":
                    # demuxed sample bytes (container-level content
                    # witness; pixel decode is the native-lib boundary)
                    buf = m["samples"]
                    cks.append(int(np.frombuffer(buf, dtype=np.uint8).sum()))
                else:
                    buf = m["samples"]
                    cks.append(int(np.frombuffer(buf, dtype="<i2").sum()))
                chs.append(fnv64(buf))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "fmt": fmts,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_frames": pd.Series(nfs, dtype="int32"),
                    "checksum": pd.Series(cks, dtype="int64"),
                    "content_hash": pd.Series(chs, dtype="int64"),
                }
            )

    return run


REAL_THUMB_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("fmt", StringType(), False),
        StructField("thumb", BinaryType(), False),
        StructField("thumb_cks", LongType(), False),
    ]
)


def real_thumbnails(
    df: DataFrame,
    target_w: int = 8,
    target_h: int = 8,
    id_col: str = "media_id",
    data_col: str = "data",
) -> DataFrame:
    """Decode image payloads (PNG/BMP), nearest-neighbor downsample to
    ``target_w x target_h`` RGB, RE-ENCODE as PNG, decode again, and
    emit the round-tripped thumbnail plus its pixel checksum — the
    encoder and decoder verify each other per row. Sample positions
    are ``sx = tx*w // target_w`` / ``sy = ty*h // target_h`` (integer
    floor), so a SQL oracle can replay every sampled byte. Non-image
    payloads are passed through silently (filter upstream for
    images-only)."""
    run = _real_thumbnails_run(target_w, target_h, id_col, data_col)
    return df.select(id_col, data_col).mapInPandas(run, REAL_THUMB_SCHEMA)


def _real_thumbnails_run(
    target_w: int, target_h: int, id_col: str, data_col: str
):
    """Iterator-transformer behind :func:`real_thumbnails` (factored
    out for the fused ids→thumbs entry point)."""
    from .codecs import _build_codecs

    c = _build_codecs()
    decode_media, png_enc, png_dec = (
        c["decode_media"], c["png_encode"], c["png_decode"],
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, fmts, thumbs, cks = [], [], [], []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                m = decode_media(bytes(data))
                if m["kind"] != "image":
                    continue
                w, h, ch = m["width"], m["height"], m["channels"]
                px = np.frombuffer(m["pixels"], dtype=np.uint8).reshape(
                    h, w, ch
                )
                if ch == 4:  # RGBA: drop alpha, KEEP the color channels
                    px = px[:, :, :3]
                elif ch != 3:  # gray / gray+alpha: replicate luminance
                    px = np.repeat(px[:, :, :1], 3, axis=2)
                sy = (np.arange(target_h) * h) // target_h
                sx = (np.arange(target_w) * w) // target_w
                thumb_px = px[np.ix_(sy, sx)].tobytes()
                enc = png_enc(thumb_px, target_w, target_h)
                rt = png_dec(enc)  # round-trip: decoder checks encoder
                ids.append(int(mid))
                fmts.append(m["format"])
                thumbs.append(enc)
                cks.append(
                    int(np.frombuffer(rt["pixels"], dtype=np.uint8).sum())
                )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "fmt": fmts,
                    "thumb": thumbs,
                    "thumb_cks": pd.Series(cks, dtype="int64"),
                }
            )

    return run


# ---------------------------------------------------------------------------
# Real FRAME pipeline (round 11, part 2): animated GIFs give genuinely
# multi-frame media — frame sampling and frame-level dedup now run on
# REAL decoded frames (LZW-inflated pixels), not byte slices.
# ---------------------------------------------------------------------------

# Generation rule for the animated fixture corpus (Spark synth + SQL
# oracle both implement it; keep in sync with MEDIA_REAL_FRAME_DUP_SQL):
#   dims     : 24 x 18, grayscale palette (r=g=b=index)
#   n_frames : 2 + doc_id % 7
#   frame f  : h = (doc_id % 40) * 1000 + (f % 3)   <- docs in the same
#              id-class share frame CONTENT; distinct h = distinct bytes
#   indices  : px[0] = h % 251, px[1] = (h // 251) % 251,
#              px[i>=2] = (h + i) % 251
GIF_FRAME_W, GIF_FRAME_H = 24, 18


def synth_gif_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """ids -> (media_id, format='gif', data) with REAL animated GIF89a
    bytes per the generation rule above, Arrow-batched on executors."""
    run = _synth_gif_run(id_col)
    # repartition the (ids-only) input: the pure-python LZW encode is
    # the cost, and a 1-2-file parquet source would otherwise cap the
    # encode at 1-2 cores
    sc = df.sparkSession.sparkContext
    return df.select(id_col).repartition(sc.defaultParallelism).mapInPandas(
        run, SYNTH_CORPUS_SCHEMA
    )


def _synth_gif_run(id_col: str):
    """Iterator-transformer behind :func:`synth_gif_corpus` (factored
    out for the fused ids→frame-pairs entry point)."""
    from .codecs import _build_codecs

    gif_enc = _build_codecs()["gif_encode"]
    w, h = GIF_FRAME_W, GIF_FRAME_H

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def frame(hv: int) -> bytes:
            px = bytearray((hv + i) % 251 for i in range(w * h))
            px[0] = hv % 251
            px[1] = (hv // 251) % 251
            return bytes(px)

        for pdf in batches:
            ids, blobs = [], []
            for mid in pdf[id_col]:
                d = int(mid)
                nf = 2 + d % 7
                frames = [
                    frame((d % 40) * 1000 + (f % 3)) for f in range(nf)
                ]
                ids.append(d)
                blobs.append(gif_enc(frames, w, h))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "format": ["gif"] * len(ids),
                    "data": blobs,
                }
            )

    return run


def real_sample_frames(
    df: DataFrame,
    every_nth: int = 1,
    id_col: str = "media_id",
    data_col: str = "data",
) -> DataFrame:
    """REAL frame extraction: decode each media payload with the
    stdlib codecs and emit one row per sampled frame with its decoded
    RGB bytes — the true-decode counterpart of :func:`sample_frames`
    (which slices source bytes under the fake hook). Single-frame
    formats (PNG/BMP) emit frame 0; audio payloads are skipped."""
    run = _real_sample_frames_run(every_nth, id_col, data_col)
    return df.select(id_col, data_col).mapInPandas(run, REAL_FRAMES_SCHEMA)


REAL_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def _real_sample_frames_run(every_nth: int, id_col: str, data_col: str):
    """Iterator-transformer behind :func:`real_sample_frames` (factored
    out for the fused ids→frames entry point)."""
    from .codecs import _build_codecs

    decode_media = _build_codecs()["decode_media"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                m = decode_media(bytes(data))
                if m["kind"] != "image":
                    continue
                payloads = m.get("frames") or [m["pixels"]]
                for fno in range(0, len(payloads), every_nth):
                    ids.append(int(mid))
                    nos.append(fno)
                    frames.append(payloads[fno])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "frame": frames,
                }
            )

    return run


def real_frame_dup_pairs(
    df: DataFrame,
    min_shared: int = 2,
    every_nth: int = 1,
    max_frame_df: int = 1_000,
    id_col: str = "media_id",
    data_col: str = "data",
) -> DataFrame:
    """Frame-level near-dup over REAL decoded frames: decode -> one
    row per frame -> JVM xxhash64 over the DECODED pixel bytes ->
    distinct (media, frame-hash) -> hot-frame cap (df > max_frame_df
    dropped, the intros/logos guard) -> pair counts via one self-join
    on the frame hash. Same capped inverted-index shape as
    :func:`frame_dup_pairs`, with the decode real."""
    frames = real_sample_frames(
        df, every_nth=every_nth, id_col=id_col, data_col=data_col
    )
    return _frame_dup_pairs_from_frames(frames, min_shared, max_frame_df)


def _frame_dup_pairs_from_frames(
    frames: DataFrame, min_shared: int, max_frame_df: int
) -> DataFrame:
    # pin the tiny (media, hash) frame: it feeds the hot-frame cap,
    # BOTH self-join sides, and the anti-join — unpinned, each branch
    # re-runs the decode mapInPandas over every payload (measured 2x+
    # the entry cost at sf0.1)
    fh = (
        frames.filter(F.length("frame") > 0)
        .select("media_id", F.xxhash64("frame").alias("fh"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hot = (
        fh.groupBy("fh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_frame_df)
        .select("fh")
    )
    cold = fh.join(hot, "fh", "left_anti")
    a, b = cold.alias("a"), cold.alias("b")
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


def synth_mp4_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """ids -> (media_id, format='mp4', data) with REAL ISO BMFF
    containers (codecs.mp4_encode_stub): full moov/trak/stbl sample
    tables and multi-chunk mdat layouts; sample payloads are an
    arithmetic stub (H.264 bytes would need a native encoder), which
    is exactly what keeps the DEMUX SQL-replayable.

    Generation rule (keep in sync with MEDIA_REAL_MP4_SQL):
      w        = 16 * (2 + d % 5)
      h        = 16 * (2 + d % 4)
      n_frames = 8 + d % 25
      layout   : EVEN d -> plain (n_chunks = 1 + d % 3, exercising
                 stsc run expansion); ODD d -> FRAGMENTED
                 (moof/tfhd/trun, 2 + d % 4 samples per fragment) —
                 the DASH/HLS shape. Same samples either way, so the
                 oracle is layout-independent by construction.
      sample i: size s = 50 + (d + i) % 40,
                byte j = (d*31 + i*7 + j) % 251
    so the demuxed-byte checksum has the closed form
      sum_i [ s*a + s*(s-1)/2 - 251*max(0, a + s - 251) ],
      a = (d*31 + i*7) % 251  (valid while s < 251)."""
    run = _synth_mp4_run(id_col)
    sc = df.sparkSession.sparkContext
    return df.select(id_col).repartition(sc.defaultParallelism).mapInPandas(
        run, SYNTH_CORPUS_SCHEMA
    )


def _synth_mp4_run(id_col: str):
    """Iterator-transformer behind :func:`synth_mp4_corpus` (factored
    out for the fused ids→meta/sample-stats entry points)."""
    from .codecs import _build_codecs

    mp4_enc = _build_codecs()["mp4_encode_stub"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid in pdf[id_col]:
                d = int(mid)
                w, h = 16 * (2 + d % 5), 16 * (2 + d % 4)
                nf = 8 + d % 25
                samples = []
                for i in range(nf):
                    size = 50 + (d + i) % 40
                    a = (d * 31 + i * 7) % 251
                    samples.append(bytes((a + j) % 251 for j in range(size)))
                ids.append(d)
                if d % 2:
                    blobs.append(
                        mp4_enc(
                            samples, w, h, fragmented=True,
                            samples_per_fragment=2 + d % 4,
                        )
                    )
                else:
                    blobs.append(
                        mp4_enc(samples, w, h, n_chunks=1 + d % 3)
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "format": ["mp4"] * len(ids),
                    "data": blobs,
                }
            )

    return run


def synth_mp4_edge_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """ids -> REAL ISO BMFF containers exercising the round-13 demux
    edges (VERDICT r12 task #2): co64 64-bit chunk offsets (the >4 GiB
    capture shape), pure-fMP4 duration (mvhd says 0 — mehd, else the
    trun/tfhd sample durations), and the previous-traf-end base-offset
    fallback (a second 'soun' track leads each moof while the video
    tfhd carries neither base flag, ISO 14496-12 8.8.7.1).

    Same sample rule as synth_mp4_corpus (so MEDIA_REAL_MP4_EDGE_SQL
    reuses its closed-form checksum); layout by d % 3:
      0 -> plain + co64, n_chunks = 1 + d % 3
      1 -> fragmented, duration_source='mehd' (+ per-sample trun
           durations when d % 2, exercising both duration row shapes)
      2 -> fragmented, second_track=True, duration_source='fragments'
    Every layout's true duration is nf * 40 ms (frame_delta 40 @
    timescale 1000), so the oracle checks the duration PATHS, not just
    the arithmetic."""
    run = _synth_mp4_edge_run(id_col)
    sc = df.sparkSession.sparkContext
    return df.select(id_col).repartition(sc.defaultParallelism).mapInPandas(
        run, SYNTH_CORPUS_SCHEMA
    )


def _synth_mp4_edge_run(id_col: str):
    """Iterator-transformer behind :func:`synth_mp4_edge_corpus`
    (factored out for the fused ids→container-meta entry point)."""
    from .codecs import _build_codecs

    mp4_enc = _build_codecs()["mp4_encode_stub"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid in pdf[id_col]:
                d = int(mid)
                w, h = 16 * (2 + d % 5), 16 * (2 + d % 4)
                nf = 8 + d % 25
                samples = []
                for i in range(nf):
                    size = 50 + (d + i) % 40
                    a = (d * 31 + i * 7) % 251
                    samples.append(bytes((a + j) % 251 for j in range(size)))
                ids.append(d)
                mode = d % 3
                if mode == 0:
                    blobs.append(
                        mp4_enc(samples, w, h, n_chunks=1 + d % 3, use_co64=True)
                    )
                elif mode == 1:
                    blobs.append(
                        mp4_enc(
                            samples, w, h, fragmented=True,
                            samples_per_fragment=2 + d % 4,
                            duration_source="mehd",
                            trun_sample_durations=bool(d % 2),
                        )
                    )
                else:
                    blobs.append(
                        mp4_enc(
                            samples, w, h, fragmented=True,
                            samples_per_fragment=2 + d % 4,
                            duration_source="fragments",
                            second_track=True,
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "format": ["mp4"] * len(ids),
                    "data": blobs,
                }
            )

    return run


AUDIO_GATING_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_windows", IntegerType(), False),
        StructField("active_windows", IntegerType(), False),
        StructField("total_energy", LongType(), False),
        StructField("zero_crossings", LongType(), False),
    ]
)


def audio_gating_stats(
    df: DataFrame,
    id_col: str = "media_id",
    data_col: str = "data",
    window: int = 32,
    energy_threshold: int = 10_000_000_000,
) -> DataFrame:
    """Windowed audio GATING features over decoded PCM — the VAD-ish
    segment filter an audio training pipeline runs before spending
    decode/transcription budget: fixed sample windows (ragged tail
    dropped), per-window energy (sum of squared int16 samples) with an
    active/silent threshold, and zero-crossing counts (the classic
    cheap voicing proxy). All integer arithmetic over the DECODED
    samples, so the oracle replays every value from the synth rule —
    a wrong sample width, byte order, or window split breaks the
    numbers. Arrow-batched mapInPandas, numpy-vectorized per payload."""
    run = _audio_gating_run(id_col, data_col, window, energy_threshold)
    return df.select(id_col, data_col).mapInPandas(run, AUDIO_GATING_SCHEMA)


def _audio_gating_run(
    id_col: str, data_col: str, window: int, energy_threshold: int
):
    """Iterator-transformer behind :func:`audio_gating_stats` (factored
    out for the fused ids→gating entry point)."""
    from .codecs import _build_codecs

    wav_decode = _build_codecs()["wav_decode"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, nws, nas, tes, zcs = [], [], [], [], []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                m = wav_decode(bytes(data))
                s = np.frombuffer(m["samples"], dtype="<i2").astype(np.int64)
                nw = len(s) // window
                s = s[: nw * window]
                win = s.reshape(nw, window)
                energy = (win * win).sum(axis=1)
                neg = win < 0
                zc = int((neg[:, 1:] != neg[:, :-1]).sum())
                ids.append(int(mid))
                nws.append(nw)
                nas.append(int((energy > energy_threshold).sum()))
                tes.append(int(energy.sum()))
                zcs.append(zc)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "n_windows": pd.Series(nws, dtype="int32"),
                    "active_windows": pd.Series(nas, dtype="int32"),
                    "total_energy": pd.Series(tes, dtype="int64"),
                    "zero_crossings": pd.Series(zcs, dtype="int64"),
                }
            )

    return run


def synth_mp4_keyframe_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """ids -> REAL containers with authored SYNC-SAMPLE structure: even
    ids get a plain layout with an stss table (keyframe every
    2 + d % 3 samples); odd ids get the steady DASH/HLS GOP shape
    (fragments of 2 + d % 4 samples, tfhd default-sample-flags
    non-sync + trun first-sample-flags marking each fragment's first
    sample as the keyframe). Same sample-byte rule as
    synth_mp4_corpus, so the keyframe checksum has the same closed
    form restricted to i % step == 0."""
    run = _synth_mp4_keyframe_run(id_col)
    sc = df.sparkSession.sparkContext
    return df.select(id_col).repartition(sc.defaultParallelism).mapInPandas(
        run, SYNTH_CORPUS_SCHEMA
    )


def _synth_mp4_keyframe_run(id_col: str):
    """Iterator-transformer behind :func:`synth_mp4_keyframe_corpus`
    (factored out for the fused ids→keyframe-stats entry point)."""
    from .codecs import _build_codecs

    mp4_enc = _build_codecs()["mp4_encode_stub"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid in pdf[id_col]:
                d = int(mid)
                w, h = 16 * (2 + d % 5), 16 * (2 + d % 4)
                nf = 8 + d % 25
                samples = []
                for i in range(nf):
                    size = 50 + (d + i) % 40
                    a = (d * 31 + i * 7) % 251
                    samples.append(bytes((a + j) % 251 for j in range(size)))
                ids.append(d)
                if d % 2 == 0:
                    blobs.append(
                        mp4_enc(samples, w, h, sync_every=2 + d % 3)
                    )
                else:
                    blobs.append(
                        mp4_enc(
                            samples, w, h, fragmented=True,
                            samples_per_fragment=2 + d % 4,
                            mark_fragment_sync=True,
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "format": ["mp4"] * len(ids),
                    "data": blobs,
                }
            )

    return run


MP4_KEYFRAME_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("n_keyframes", IntegerType(), False),
        StructField("kf_checksum", LongType(), False),
    ]
)


def mp4_keyframe_stats(
    df: DataFrame, id_col: str = "media_id", data_col: str = "data"
) -> DataFrame:
    """Keyframe-only sampling per container — the frame-sample
    primitive of a video training pipeline (decode budget goes to sync
    samples; everything between is delta frames a pixel decoder would
    need anyway). Emits (media_id, n_frames, n_keyframes, kf_checksum)
    where kf_checksum sums the bytes of ONLY the sync samples, so a
    wrong stss parse or a mis-resolved trun/tfhd/trex sample-flag
    chain breaks the value, not just a count. Arrow-batched
    mapInPandas."""
    run = _mp4_keyframe_stats_run(id_col, data_col)
    return df.select(id_col, data_col).mapInPandas(run, MP4_KEYFRAME_STATS_SCHEMA)


def _mp4_keyframe_stats_run(id_col: str, data_col: str):
    """Iterator-transformer behind :func:`mp4_keyframe_stats` (factored
    out for the fused ids→keyframe-stats entry point)."""
    from .codecs import _build_codecs

    probe = _build_codecs()["mp4_probe"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, nfs, nks, cks = [], [], [], []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                m = probe(bytes(data))
                sizes = m["sample_sizes"]
                offs = [0]
                for sz in sizes:
                    offs.append(offs[-1] + sz)
                buf = np.frombuffer(m["samples"], dtype=np.uint8)
                total = 0
                for i in m["keyframe_indices"]:
                    total += int(buf[offs[i] : offs[i + 1]].sum())
                ids.append(int(mid))
                nfs.append(m["n_frames"])
                nks.append(len(m["keyframe_indices"]))
                cks.append(total)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "n_frames": pd.Series(nfs, dtype="int32"),
                    "n_keyframes": pd.Series(nks, dtype="int32"),
                    "kf_checksum": pd.Series(cks, dtype="int64"),
                }
            )

    return run


MP4_CONTAINER_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("checksum", LongType(), False),
    ]
)


def mp4_container_meta(
    df: DataFrame, id_col: str = "media_id", data_col: str = "data"
) -> DataFrame:
    """Full container probe per media row: dims, frame count, DURATION
    (the mvhd -> mehd -> fragment-sample-durations resolution chain),
    and the demuxed-byte checksum. Arrow-batched mapInPandas; the
    driver never touches payload bytes."""
    run = _mp4_container_meta_run(id_col, data_col)
    return df.select(id_col, data_col).mapInPandas(run, MP4_CONTAINER_META_SCHEMA)


def _mp4_container_meta_run(id_col: str, data_col: str):
    """Iterator-transformer behind :func:`mp4_container_meta` (factored
    out for the fused ids→container-meta entry point)."""
    from .codecs import _build_codecs

    probe = _build_codecs()["mp4_probe"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ws, hs, nfs, durs, cks = [], [], [], [], [], []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                m = probe(bytes(data))
                ids.append(int(mid))
                ws.append(m["width"])
                hs.append(m["height"])
                nfs.append(m["n_frames"])
                durs.append(m["duration_ms"])
                cks.append(
                    int(np.frombuffer(m["samples"], dtype=np.uint8).sum())
                )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_frames": pd.Series(nfs, dtype="int32"),
                    "duration_ms": pd.Series(durs, dtype="int64"),
                    "checksum": pd.Series(cks, dtype="int64"),
                }
            )

    return run


def mp4_sample_stats(
    df: DataFrame, id_col: str = "media_id", data_col: str = "data"
) -> DataFrame:
    """Demux MP4 containers into PER-SAMPLE rows: (media_id,
    sample_idx, size, first_byte, content_fnv) — the frame-level
    identity surface for cross-container duplicate-sample detection
    (the video analog of media_real_frame_dup). Arrow-batched; the
    driver never touches payload bytes. content_fnv is a 64-bit
    FNV-1a over the sample bytes; first_byte/size ride along so
    downstream groupings have an engine-neutral total order."""
    run = _mp4_sample_stats_run(id_col, data_col)
    return df.select(id_col, data_col).mapInPandas(run, MP4_SAMPLE_STATS_SCHEMA)


MP4_SAMPLE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_idx", LongType(), False),
        StructField("size", LongType(), False),
        StructField("first_byte", LongType(), False),
        StructField("content_fnv", LongType(), False),
    ]
)


def _mp4_sample_stats_run(id_col: str, data_col: str):
    """Iterator-transformer behind :func:`mp4_sample_stats` (factored
    out for the fused ids→sample-stats entry point)."""
    from .codecs import _build_codecs

    probe = _build_codecs()["mp4_probe"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fnv64(b: bytes) -> int:
            h = 0xCBF29CE484222325
            for byte in b:
                h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            return h - 0x8000000000000000

        for pdf in batches:
            mids, idxs, sizes, firsts, fnvs = [], [], [], [], []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                d = probe(bytes(data))
                pos = 0
                buf = d["samples"]
                for i, sz in enumerate(d["sample_sizes"]):
                    sample = buf[pos : pos + sz]
                    pos += sz
                    mids.append(int(mid))
                    idxs.append(i)
                    sizes.append(sz)
                    firsts.append(sample[0] if sample else -1)
                    fnvs.append(fnv64(sample))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "sample_idx": pd.Series(idxs, dtype="int64"),
                    "size": pd.Series(sizes, dtype="int64"),
                    "first_byte": pd.Series(firsts, dtype="int64"),
                    "content_fnv": pd.Series(fnvs, dtype="int64"),
                }
            )

    return run


def synth_jpeg_corpus(
    df: DataFrame, id_col: str = "doc_id", variant: str = "baseline"
) -> DataFrame:
    """ids -> (media_id, format='jpeg', data) with REAL JPEG bytes:
    grayscale flat-8x8-block fixtures, which the DC-step-8 quant table
    round-trips EXACTLY (operators/codecs.py) — the property that
    makes a lossy codec's decode SQL-replayable.

    ``variant``: 'baseline' (SOF0), 'dri' (SOF0 with a per-doc restart
    interval 1 + d % 4 — RSTn markers + DC predictor resets on the
    decode path), or 'progressive' (SOF2 — spectral selection,
    successive approximation, EOB-run batching). All three encode the
    SAME quantized coefficients, so dims and checksum follow the same
    generation rule and share one oracle.

    Generation rule (keep in sync with MEDIA_REAL_JPEG_SQL):
      blocks wide  bw = 2 + d % 4          (w = 8*bw, 16..40)
      blocks high  bh = 2 + d % 3          (h = 8*bh, 16..32)
      block i (row-major) value v = (d + i) % 251
    so the decoded pixel sum is exactly 64 * sum_i((d + i) % 251)."""
    run = _synth_jpeg_run(id_col, variant)
    sc = df.sparkSession.sparkContext
    return df.select(id_col).repartition(sc.defaultParallelism).mapInPandas(
        run, SYNTH_CORPUS_SCHEMA
    )


def _synth_jpeg_run(id_col: str, variant: str = "baseline"):
    """Iterator-transformer behind :func:`synth_jpeg_corpus` (factored
    out for the fused ids→meta entry point)."""
    from .codecs import _build_codecs

    if variant not in ("baseline", "dri", "progressive"):
        raise ValueError(f"unknown jpeg corpus variant {variant!r}")
    _codecs = _build_codecs()
    jpeg_enc = _codecs["jpeg_encode"]
    jpeg_enc_prog = _codecs["jpeg_encode_progressive"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid in pdf[id_col]:
                d = int(mid)
                bw = 2 + d % 4
                bh = 2 + d % 3
                w, h = bw * 8, bh * 8
                px = bytearray(w * h)
                for i in range(bw * bh):
                    v = (d + i) % 251
                    by, bx = divmod(i, bw)
                    for yy in range(8):
                        base = (by * 8 + yy) * w + bx * 8
                        px[base : base + 8] = bytes([v]) * 8
                ids.append(d)
                if variant == "dri":
                    blobs.append(
                        jpeg_enc(
                            bytes(px), w, h, channels=1,
                            restart_interval=1 + d % 4,
                        )
                    )
                elif variant == "progressive":
                    blobs.append(jpeg_enc_prog(bytes(px), w, h, channels=1))
                else:
                    blobs.append(jpeg_enc(bytes(px), w, h, channels=1))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "format": ["jpeg"] * len(ids),
                    "data": blobs,
                }
            )

    return run


# ---------------------------------------------------------------------------
# Round-14: presentation timing (ctts + elst — VERDICT r13 task #6)
# ---------------------------------------------------------------------------


def synth_mp4_timing_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """ids -> REAL containers with authored PRESENTATION TIMING: ctts
    composition offsets (the B-frame reorder shape, ISO 14496-12
    8.6.1.3) and edts/elst edit lists (8.6.6) — even ids as the plain
    layout (ctts v1 box), odd ids as fragments (per-sample SIGNED
    composition offsets in a version-1 trun). Deterministic rules the
    oracle replays arithmetically:

      frame_delta 40 @ timescale 1000, nf = 8 + d % 25 samples,
      composition offset of sample i = 40 * ((d + i) % 3),
      elst media_time = 40 * (d % 3),
      a leading empty edit of 40 movie ticks when d % 5 == 0.

    The offset cycle makes pts non-monotone in decode order (one
    inversion per cycle wrap) — exactly what a pipeline that stamped
    rows with dts instead of pts would get wrong."""
    from .codecs import _build_codecs

    run = _synth_mp4_timing_run(id_col)
    sc = df.sparkSession.sparkContext
    return df.select(id_col).repartition(sc.defaultParallelism).mapInPandas(
        run, SYNTH_CORPUS_SCHEMA
    )


def _synth_mp4_timing_run(id_col: str):
    """Iterator-transformer behind :func:`synth_mp4_timing_corpus` —
    factored out so the fused entry path can compose it with the stats
    transformer inside ONE Python worker (the containers then never
    cross the JVM boundary; guide §4)."""
    from .codecs import _build_codecs

    mp4_enc = _build_codecs()["mp4_encode_stub"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, blobs = [], []
            for mid in pdf[id_col]:
                d = int(mid)
                w, h = 16 * (2 + d % 5), 16 * (2 + d % 4)
                nf = 8 + d % 25
                samples = []
                for i in range(nf):
                    size = 50 + (d + i) % 40
                    a = (d * 31 + i * 7) % 251
                    # same bytes as bytes((a + j) % 251 for j in
                    # range(size)), vectorized (the per-byte generator
                    # was the encode pass's top profile line)
                    samples.append(
                        ((a + np.arange(size)) % 251).astype(np.uint8).tobytes()
                    )
                ids.append(d)
                # offset of GLOBAL sample i is pattern[i % 3] with
                # pattern[k] = 40 * ((d + k) % 3)
                pattern = [40 * ((d + k) % 3) for k in range(3)]
                kw = dict(
                    ctts_pattern=pattern,
                    elst_media_time=40 * (d % 3),
                    elst_empty=40 if d % 5 == 0 else 0,
                )
                if d % 2 == 0:
                    blobs.append(mp4_enc(samples, w, h, n_chunks=1 + d % 3, **kw))
                else:
                    blobs.append(
                        mp4_enc(
                            samples, w, h, fragmented=True,
                            samples_per_fragment=2 + d % 4,
                            trun_sample_durations=(d % 3 == 0),
                            **kw,
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "format": ["mp4"] * len(ids),
                    "data": blobs,
                }
            )

    return run


MP4_TIMING_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", IntegerType(), False),
        StructField("n_reordered", IntegerType(), False),
        StructField("pts_sum", LongType(), False),
        StructField("pts_min", LongType(), False),
        StructField("pts_max", LongType(), False),
    ]
)


def mp4_timing_stats(
    df: DataFrame, id_col: str = "media_id", data_col: str = "data"
) -> DataFrame:
    """Presentation-timing probe per container: sample count, the
    number of decode-order pts inversions (n_reordered — the B-frame
    indicator; counted from the ACTUAL pts sequence, not a formula),
    and pts sum/min/max in media ticks after applying ctts offsets and
    the elst edit shift. A demux that stamped frames with decode time,
    ignored signed offsets, or skipped the edit list breaks these
    values. Arrow-batched mapInPandas."""
    run = _mp4_timing_stats_run(id_col, data_col)
    return df.select(id_col, data_col).mapInPandas(run, MP4_TIMING_STATS_SCHEMA)


def _mp4_timing_stats_run(id_col: str, data_col: str):
    """Iterator-transformer behind :func:`mp4_timing_stats` (see
    :func:`_synth_mp4_timing_run` for why it is factored out)."""
    from .codecs import _build_codecs

    probe = _build_codecs()["mp4_probe"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, nr, psum, pmin, pmax = [], [], [], [], [], []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                m = probe(bytes(data))
                pts = m["sample_pts"]
                ids.append(int(mid))
                ns.append(len(pts))
                nr.append(
                    sum(1 for i in range(1, len(pts)) if pts[i] < pts[i - 1])
                )
                psum.append(sum(pts))
                pmin.append(min(pts) if pts else 0)
                pmax.append(max(pts) if pts else 0)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "n_reordered": pd.Series(nr, dtype="int32"),
                    "pts_sum": pd.Series(psum, dtype="int64"),
                    "pts_min": pd.Series(pmin, dtype="int64"),
                    "pts_max": pd.Series(pmax, dtype="int64"),
                }
            )

    return run


def _fused_ids_pipeline(
    df: DataFrame,
    id_col: str,
    synth_run,
    probe_run,
    schema: StructType,
    drop_formats: tuple[str, ...] = (),
) -> DataFrame:
    """Compose a synth iterator-transformer with a probe transformer
    inside ONE ``mapInPandas``: payloads are encoded and probed in the
    same Python worker, so the blob column never crosses the
    JVM↔Python boundary at all (the two-stage DataFrame composition
    pays two extra Arrow serializations of every payload byte — guide
    §4's "control how many columns cross"). ``drop_formats`` filters
    the synthesized rows between the stages (equivalent to a
    ``.filter(format not in ...)`` on the corpus DataFrame)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gen = synth_run(batches)
        if drop_formats:
            gen = (pdf[~pdf["format"].isin(drop_formats)] for pdf in gen)
        return probe_run(gen)

    sc = df.sparkSession.sparkContext
    return df.select(id_col).repartition(sc.defaultParallelism).mapInPandas(
        run, schema
    )


def mp4_timing_stats_from_ids(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth → timing-stats pipeline in ONE ``mapInPandas``.
    Output is identical to
    ``mp4_timing_stats(synth_mp4_timing_corpus(df))``."""
    return _fused_ids_pipeline(
        df, id_col,
        _synth_mp4_timing_run(id_col),
        _mp4_timing_stats_run("media_id", "data"),
        MP4_TIMING_STATS_SCHEMA,
    )


def real_meta_from_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    corpus: str = "media",
    group_mod: int | None = None,
    variant: str = "baseline",
) -> DataFrame:
    """Fused synth → decode_real_meta in ONE ``mapInPandas``. Output is
    identical to ``decode_real_meta(synth_<corpus>_corpus(df, ...))``
    for ``corpus`` in media/jpeg/mp4."""
    if corpus == "media":
        synth = _synth_media_run(id_col, group_mod)
    elif corpus == "jpeg":
        synth = _synth_jpeg_run(id_col, variant)
    elif corpus == "mp4":
        synth = _synth_mp4_run(id_col)
    else:
        raise ValueError(f"unknown corpus {corpus!r}")
    return _fused_ids_pipeline(
        df, id_col, synth,
        _decode_real_meta_run("media_id", "data"),
        REAL_META_SCHEMA,
    )


def thumbnails_from_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    target_w: int = 8,
    target_h: int = 8,
) -> DataFrame:
    """Fused synth_media → real_thumbnails in ONE ``mapInPandas``
    (audio rows dropped between the stages, like the two-stage
    composition's ``format != 'wav'`` filter — the probe skips
    non-images anyway)."""
    return _fused_ids_pipeline(
        df, id_col,
        _synth_media_run(id_col),
        _real_thumbnails_run(target_w, target_h, "media_id", "data"),
        REAL_THUMB_SCHEMA,
        drop_formats=("wav",),
    )


def audio_gating_stats_from_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    window: int = 32,
    energy_threshold: int = 10_000_000_000,
) -> DataFrame:
    """Fused synth_media → audio_gating_stats in ONE ``mapInPandas``
    (filter the ids to the corpus's wav congruence class upstream, as
    the two-stage entry does)."""
    return _fused_ids_pipeline(
        df, id_col,
        _synth_media_run(id_col),
        _audio_gating_run("media_id", "data", window, energy_threshold),
        AUDIO_GATING_SCHEMA,
    )


def mp4_container_meta_from_ids(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Fused synth_mp4_edge → mp4_container_meta in ONE
    ``mapInPandas``."""
    return _fused_ids_pipeline(
        df, id_col,
        _synth_mp4_edge_run(id_col),
        _mp4_container_meta_run("media_id", "data"),
        MP4_CONTAINER_META_SCHEMA,
    )


def mp4_keyframe_stats_from_ids(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Fused synth_mp4_keyframe → mp4_keyframe_stats in ONE
    ``mapInPandas``."""
    return _fused_ids_pipeline(
        df, id_col,
        _synth_mp4_keyframe_run(id_col),
        _mp4_keyframe_stats_run("media_id", "data"),
        MP4_KEYFRAME_STATS_SCHEMA,
    )


def mp4_sample_stats_from_ids(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Fused synth_mp4 → mp4_sample_stats in ONE ``mapInPandas``."""
    return _fused_ids_pipeline(
        df, id_col,
        _synth_mp4_run(id_col),
        _mp4_sample_stats_run("media_id", "data"),
        MP4_SAMPLE_STATS_SCHEMA,
    )


def real_frame_dup_pairs_from_ids(
    df: DataFrame,
    min_shared: int = 2,
    every_nth: int = 1,
    max_frame_df: int = 1_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fused synth_gif → real_sample_frames feeding the same capped
    pair logic as :func:`real_frame_dup_pairs` — the GIF containers are
    encoded and frame-decoded in one Python worker; only the decoded
    frames (which xxhash64 needs on the JVM side) cross the boundary,
    and only once."""
    frames = _fused_ids_pipeline(
        df, id_col,
        _synth_gif_run(id_col),
        _real_sample_frames_run(every_nth, "media_id", "data"),
        REAL_FRAMES_SCHEMA,
    )
    return _frame_dup_pairs_from_frames(frames, min_shared, max_frame_df)
