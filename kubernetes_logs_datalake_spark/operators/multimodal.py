"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched Python.

The Spark-side architecture — schema, partitioning, ``mapInPandas``
batch shape, deterministic outputs — is real and tested, and so is one
genuine decode path: netpbm images (PGM/PPM, the uncompressed
interchange format) decode with a stdlib parser to real pixels, which
average-pool into the feature vector. Compressed formats (PNG/JPEG)
use PIL when it is importable (feature probe, not a hard import);
without PIL they fall back to a deterministic digest-derived fake with
``decoded_ok=false`` so downstream schemas never change shape.

At 100 TB of media this is the shape that works: binary payloads stay
columnar in parquet, batches stream through Arrow into Python (never
row-at-a-time), and heavy decode parallelizes per input split.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # feature probe: PIL is optional, never a hard dependency
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:  # pragma: no cover - env-dependent
    _PIL_Image = None

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decoded_ok", T.BooleanType()),
    ]
)


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in when no decoder can handle the payload:
    derive FEATURE_DIM floats from the payload digest. Keeps schemas and
    batch shapes identical to the real path."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


# comments are whitespace per the netpbm spec: they may appear between
# ANY header tokens, not just after the magic
_PNM_WS = rb"(?:\s+|\s*#[^\n]*\n)+"
_PNM_HEADER = re.compile(
    rb"^(P[56])" + _PNM_WS + rb"(\d+)" + _PNM_WS + rb"(\d+)" + _PNM_WS + rb"(\d+)\s"
)


def _decode_pnm(payload: bytes) -> tuple[int, int, bytes]:
    """Stdlib decoder for binary netpbm images: P5 (PGM, grayscale) and
    P6 (PPM, RGB → luminance). Returns (width, height, grayscale bytes
    normalized to maxval 255). Raises ValueError for malformed or
    16-bit-sample files."""
    m = _PNM_HEADER.match(payload)
    if not m:
        raise ValueError("not a binary PGM/PPM payload")
    magic, w, h, maxval = m.group(1), int(m.group(2)), int(m.group(3)), int(m.group(4))
    if not 0 < maxval <= 255:
        raise ValueError("16-bit netpbm samples not supported")
    body = payload[m.end():]
    need = (1 if magic == b"P5" else 3) * w * h
    if len(body) < need:
        raise ValueError("truncated PGM/PPM body")
    if maxval != 255:
        # normalize low-maxval samples (round-to-nearest) so a maxval=15
        # white stays white instead of decoding near-black
        body = bytes((v * 255 + maxval // 2) // maxval for v in body[:need])
    if magic == b"P5":
        return w, h, body[:need]
    # integer Rec.601 luminance — deterministic, no float error
    gray = bytes(
        (299 * body[i] + 587 * body[i + 1] + 114 * body[i + 2]) // 1000
        for i in range(0, need, 3)
    )
    return w, h, gray


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an image payload to (width, height, grayscale bytes).

    Netpbm (PGM/PPM) decodes with the stdlib parser everywhere;
    compressed formats need PIL (feature-probed import). Raises
    NotImplementedError when no available decoder handles the payload —
    callers choose between failing and the deterministic fake.
    """
    if payload and payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload)
    if _PIL_Image is not None:  # pragma: no cover - env-dependent
        import io

        img = _PIL_Image.open(io.BytesIO(payload)).convert("L")
        return img.width, img.height, img.tobytes()
    raise NotImplementedError(
        "no decoder for this image format (netpbm decodes everywhere; "
        "PNG/JPEG need PIL, which is not installed)"
    )


def image_features(width: int, height: int, gray: bytes) -> list[float]:
    """4x4 average-pooled luminance thumbnail, normalized to [0, 1] —
    FEATURE_DIM floats from real pixels (vectorized numpy pooling)."""
    import numpy as np

    img = np.frombuffer(gray, dtype=np.uint8).reshape(height, width)
    ys = [height * i // 4 for i in range(5)]
    xs = [width * i // 4 for i in range(5)]
    out = []
    for cy in range(4):
        for cx in range(4):
            # clamp each block to ≥1 row/col: when a dimension is
            # smaller than the grid, the nearest block repeats instead
            # of yielding a spurious empty slice (black cell)
            y0, x0 = min(ys[cy], height - 1), min(xs[cx], width - 1)
            block = img[y0:max(ys[cy + 1], y0 + 1), x0:max(xs[cx + 1], x0 + 1)]
            out.append(float(block.mean()) / 255.0)
    return out


def resize_gray(
    width: int, height: int, gray: bytes, out_w: int, out_h: int
) -> bytes:
    """Box-filter (block-mean) downscale of a grayscale image —
    the resize kernel behind :func:`image_features`, exposed for
    thumbnail pipelines. Pure numpy, deterministic."""
    import numpy as np

    img = np.frombuffer(gray, dtype=np.uint8).reshape(height, width)
    ys = [height * i // out_h for i in range(out_h + 1)]
    xs = [width * i // out_w for i in range(out_w + 1)]
    out = np.empty((out_h, out_w), dtype=np.uint8)
    for cy in range(out_h):
        for cx in range(out_w):
            # clamped blocks (≥1 row/col) — upscaling repeats the
            # nearest source pixel instead of emitting black cells
            y0, x0 = min(ys[cy], height - 1), min(xs[cx], width - 1)
            block = img[y0:max(ys[cy + 1], y0 + 1), x0:max(xs[cx + 1], x0 + 1)]
            out[cy, cx] = int(block.mean())
    return out.tobytes()


def resize_images(
    df: DataFrame, out_w: int = 64, out_h: int = 64
) -> DataFrame:
    """payload → decoded, box-resized grayscale thumbnail (binary) via
    mapInPandas; undecodable payloads yield null thumbnails. The
    Arrow-batched resize stage of a media pipeline — decode and resize
    parallelize per input split, thumbnails stay columnar."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("thumb", T.BinaryType()),
            T.StructField("thumb_w", T.IntegerType()),
            T.StructField("thumb_h", T.IntegerType()),
        ]
    )

    def one(payload: bytes) -> bytes | None:
        try:
            w, h, gray = decode_image(payload)
            return resize_gray(w, h, gray, out_w, out_h)
        except (NotImplementedError, ValueError, TypeError):
            return None

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            thumbs = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb": thumbs,
                    "thumb_w": [out_w if t is not None else None for t in thumbs],
                    "thumb_h": [out_h if t is not None else None for t in thumbs],
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, out_schema)


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """payload binary → fixed-dim float feature vector, via mapInPandas.

    Arrow streams batches of (media_id, payload) into Python; each batch
    is processed vectorized and yields (media_id, feature, decoded_ok).
    ``decoded_ok=true`` means real pixels produced the features
    (netpbm stdlib decode, or PIL when installed); undecodable payloads
    deterministically fall back to the digest fake with
    ``decoded_ok=false`` so pipelines can filter or re-route them.
    Column pruning applies — only the two needed columns cross the
    language boundary.
    """
    import pandas as pd

    def one(payload: bytes) -> tuple[list[float], bool]:
        try:
            w, h, gray = decode_image(payload)
            return image_features(w, h, gray), True
        except (NotImplementedError, ValueError, TypeError):
            return _fake_decode(payload), False

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [f for f, _ in decoded],
                    "decoded_ok": [ok for _, ok in decoded],
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (decode stubbed). Demonstrates the explode shape: a 2-hour
    video at 1 fps becomes 7200 rows without materializing frames until
    the decode stage."""
    from pyspark.sql import functions as F

    n_frames = (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int")
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
