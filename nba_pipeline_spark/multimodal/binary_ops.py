"""Multimodal column plumbing (BASELINE north star).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. Decode / feature-extract runs as Arrow-batched
``mapInPandas`` — the ONLY sanctioned Python crossing in the engine,
because codecs genuinely can't run in the JVM. Batches stream through
the Python worker ~10k rows at a time (spark.sql.execution.arrow.
maxRecordsPerBatch), so memory stays bounded at any corpus size, and
the surrounding plan (partitioning, pushdown on metadata columns)
remains pure Catalyst.

The actual codec call is STUBBED: this container has no image/audio
libraries, so ``fake_decode_meta`` derives deterministic pseudo
dimensions from the byte length (making the plumbing testable and
oracle-checkable), and ``decode_image`` raises NotImplementedError at
the exact line where Pillow/ffmpeg would be invoked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str, modality: str = "image") -> DataFrame:
    """Wrap a payload as (content: binary, meta: struct) — the canonical
    multimodal column pair. Here the payload is the utf-8 text bytes
    (testdata has no real media); real ingests write the raw object
    bytes plus mime sniffed at the edge."""
    content = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(content).cast("long").alias("n_bytes"),
    )
    return df.withColumn("content", content).withColumn("meta", meta)


try:  # import-guarded: the container has no image codec
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - exercised only where PIL exists
    _PILImage = None


def decode_image(payload: bytes):
    """Real decode entry point: PIL-backed when Pillow is installed
    (returns (width, height, mode)), NotImplementedError otherwise —
    callers on the hot path use `fake_decode_meta` in this container
    and swap this in where the codec exists."""
    if _PILImage is None:  # pragma: no cover - stub branch by design
        raise NotImplementedError("image codec not available in this environment")
    import io

    with _PILImage.open(io.BytesIO(payload)) as im:  # pragma: no cover
        return im.width, im.height, im.mode


def fake_decode_meta(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for decode: pseudo dims from byte length.
    Keeps the Arrow batch shape and the downstream schema real."""
    n = len(payload)
    return n, 64 + n % 512, 64 + (n // 7) % 512, 1 + n % 30


def extract_media_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary content.

    Arrow-batched: each pandas chunk holds a bounded slice of one
    partition; per-row Python cost is amortized over the batch transfer.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payloads yield NULL metrics (a row, not a task crash)
            decoded = [
                fake_decode_meta(b) if b is not None else (None, None, None, None)
                for b in pdf["content"]
            ]
            out = pd.DataFrame(
                decoded, columns=["n_bytes", "width", "height", "n_frames"]
            )
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(F.col(id_col), "content").mapInPandas(batches, DECODED_SCHEMA)


EMBED_DIMS = 16


def embed_media(df: DataFrame, id_col: str = "doc_id", dims: int = EMBED_DIMS) -> DataFrame:
    """mapInPandas embedding extraction: binary content -> array<float>.

    The model forward-pass is stubbed deterministically (byte histogram
    folded into `dims` buckets, L2-normalized) — in production the
    batch loop calls an ONNX/torch encoder on the decoded media. The
    Spark-side contract is the real thing: Arrow batch in, fixed-width
    float vector out, NULL payload -> NULL vector, output partitioning
    inherited so the frame feeds the similarity operators
    (operators/similarity.py) with no extra shuffle.
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = []
            for b in pdf["content"]:
                if b is None:
                    vecs.append(None)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr % dims, minlength=dims).astype(np.float64)
                nrm = float(np.sqrt((hist * hist).sum()))
                vecs.append((hist / nrm if nrm else hist).astype(np.float32).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "embedding": vecs})

    return df.select(F.col(id_col), "content").mapInPandas(batches, out_schema)


def sample_frames(df: DataFrame, id_col: str, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: explode pseudo frame
    indices (0, n, 2n, ...) per row — the Spark-side shape of
    ffmpeg-based sampling, with the decode itself stubbed."""
    meta = extract_media_features(df, id_col)
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
    return meta.select(F.col(id_col), F.explode(idx).alias("frame_idx"))


def chunk_binary(
    df: DataFrame, id_col: str, content_col: str, chunk_bytes: int, stride: int
) -> DataFrame:
    """Overlapping byte-window chunking of binary content — the audio/
    video analog of document chunking (fixed-size windows with overlap
    feeding per-chunk decode/embedding). ENTIRELY JVM-side: offsets
    come from sequence + posexplode and the slice is substring on the
    binary column, so the chunker itself needs no Python — only the
    downstream decode does. Each chunk carries its offset, true length
    (the tail chunk is short) and content hash for dedup/caching."""
    total = F.octet_length(F.col(content_col))
    offsets = F.sequence(F.lit(1), F.greatest(total, F.lit(1)), F.lit(int(stride)))
    exploded = df.select(
        F.col(id_col),
        F.col(content_col),
        F.posexplode(offsets).alias("chunk_idx", "offset"),
    )
    chunk = F.substring(F.col(content_col), F.col("offset"), chunk_bytes)
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("offset").cast("long").alias("offset"),
        F.octet_length(chunk).cast("long").alias("n_bytes"),
        # md5 over HEX(chunk), not the raw bytes: SQL engines disagree
        # on BLOB slicing support, hex strings compare everywhere
        F.md5(F.hex(chunk)).alias("chunk_hex_md5"),
    )


def _resized_schema(id_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )


# default-id instance kept for callers/tests that import the schema
RESIZED_SCHEMA = _resized_schema("doc_id")


def resize_media(
    df: DataFrame, id_col: str = "doc_id", width: int = 224, height: int = 224
) -> DataFrame:
    """mapInPandas resize plumbing: binary in, binary out with the new
    dimensions in typed columns. The pixel work is STUBBED (no codecs
    in this container — production calls PIL resize inside the batch
    loop at the marked line); the Spark-side contract is real: Arrow
    batches bound memory, output schema fixed, NULL payloads pass
    through as NULL rows, and the byte size change is deterministic so
    tests can assert the plumbing end-to-end."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_bytes = []
            for b in pdf["content"]:
                if b is None:
                    out_bytes.append(None)
                    continue
                # production: PIL.Image.open(BytesIO(b)).resize((width, height))
                # stub: deterministic proportional truncation/padding of the
                # payload to width*height/64 bytes keeps shape assertions real
                target = max(1, (width * height) // 64)
                bb = bytes(b)
                out_bytes.append((bb * (target // max(len(bb), 1) + 1))[:target])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "content": out_bytes,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(F.col(id_col), "content").mapInPandas(
        batches, _resized_schema(id_col)
    )
