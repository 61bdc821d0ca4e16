"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched Python.

The Spark-side architecture — schema, partitioning, ``mapInPandas``
batch shape, deterministic outputs — is real and tested, and so are
the decode paths that need only the stdlib: netpbm images (PGM/PPM)
via a header parser, PNG via zlib inflate + numpy scanline unfilter,
and WAV/PCM audio via the ``wave`` module — all to real pixels/samples
that pool into feature vectors. JPEG uses PIL when it is importable
(feature probe, not a hard import); payloads no available decoder
handles fall back to a deterministic digest-derived fake with
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(arr, channels: int, stride: int):
    """Reverse PNG scanline filtering (spec §9, filters 0-4). ``arr`` is
    (height, stride+1) uint8 with the filter byte in column 0; returns
    (height, stride) uint8 of reconstructed bytes. Up/None rows are
    vectorized; Sub/Average/Paeth recur on the previous pixel, so those
    run per-byte (decode cost is per-image Python either way — the
    parallelism is per input split, not per pixel)."""
    import numpy as np

    height = arr.shape[0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = int(arr[y, 0])
        row = arr[y, 1:].copy()
        if ftype == 0:
            rec = row
        elif ftype == 2:  # Up (uint8 addition wraps mod 256)
            rec = row + prev
        elif ftype in (1, 3, 4):
            rec = row
            p = prev
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + int(p[x])) >> 1
                else:  # Paeth
                    b, c = int(p[x]), (int(p[x - bpp]) if x >= bpp else 0)
                    q = a + b - c
                    qa, qb, qc = abs(q - a), abs(q - b), abs(q - c)
                    pred = a if (qa <= qb and qa <= qc) else (b if qb <= qc else c)
                rec[x] = (int(rec[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    return out


def _decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Stdlib PNG decoder: chunk walk → zlib inflate → scanline
    unfilter → grayscale. Supports bit depth 8, color types 0 (gray),
    2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced — the shapes a
    media lake actually stores. Palette/16-bit/interlaced raise
    ValueError (callers fall back to the digest fake)."""
    import struct
    import zlib

    import numpy as np

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, n = 8, len(payload)
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # 4 length + 4 type + data + 4 crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    px = _png_unfilter(arr, channels, stride).reshape(height, width, channels)
    if channels == 1:
        gray = px[:, :, 0]
    elif channels == 2:  # gray+alpha → gray
        gray = px[:, :, 0]
    else:  # RGB(A) → integer Rec.601 luminance, same kernel as P6
        rgb = px[:, :, :3].astype(np.int32)
        gray = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000
    return width, height, gray.astype(np.uint8).tobytes()


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an image payload to (width, height, grayscale bytes).

    Netpbm (PGM/PPM) and PNG (zlib + numpy unfilter) decode with the
    stdlib everywhere; other compressed formats (JPEG) need PIL
    (feature-probed import). Raises NotImplementedError when no
    available decoder handles the payload — callers choose between
    failing and the deterministic fake.
    """
    if payload and payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload)
    if payload and payload.startswith(_PNG_SIG):
        try:
            return _decode_png(payload)
        except ValueError:
            # unsupported PNG subtype (palette/16-bit/interlaced): give
            # PIL a chance when installed, else surface the error
            if _PIL_Image is None:
                raise
    if _PIL_Image is not None:  # pragma: no cover - env-dependent
        import io

        img = _PIL_Image.open(io.BytesIO(payload)).convert("L")
        return img.width, img.height, img.tobytes()
    raise NotImplementedError(
        "no decoder for this image format (netpbm and PNG decode "
        "everywhere; JPEG needs PIL, which is not installed)"
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


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms", T.FloatType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decoded_ok", T.BooleanType()),
    ]
)


def decode_wav(payload: bytes):
    """Stdlib WAV/PCM decoder via the ``wave`` module: returns
    (sample_rate, mono float64 samples in [-1, 1]). 8-bit unsigned and
    16-bit signed PCM supported; multi-channel downmixes by mean.
    Raises ValueError for non-RIFF/compressed payloads."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload or b"")) as w:
            rate = w.getframerate()
            nch = w.getnchannels()
            sw = w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"not a PCM WAV payload: {exc}") from exc
    if sw == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if nch > 1:
        arr = arr[: (len(arr) // nch) * nch].reshape(-1, nch).mean(axis=1)
    if rate <= 0:
        raise ValueError("WAV sample rate must be positive")
    return rate, arr


def audio_segment_features(rate: int, samples) -> tuple[int, float, list[float]]:
    """(duration_ms, overall RMS, per-segment RMS over FEATURE_DIM equal
    slices) — the audio analog of the pooled image thumbnail. Pure
    numpy; empty segments (clip shorter than the grid) repeat the
    nearest sample instead of emitting zeros."""
    import numpy as np

    n = len(samples)
    duration_ms = int(round(1000.0 * n / rate))
    if n == 0:
        return duration_ms, 0.0, [0.0] * FEATURE_DIM
    rms = float(np.sqrt(np.mean(samples**2)))
    cuts = [n * i // FEATURE_DIM for i in range(FEATURE_DIM + 1)]
    seg = []
    for i in range(FEATURE_DIM):
        lo = min(cuts[i], n - 1)
        hi = max(cuts[i + 1], lo + 1)
        seg.append(float(np.sqrt(np.mean(samples[lo:hi] ** 2))))
    return duration_ms, rms, seg


def audio_features(df: DataFrame) -> DataFrame:
    """payload binary → (duration_ms, rms, segment-RMS feature vector)
    via mapInPandas — the audio decode/feature stage of a media
    pipeline. Real stdlib WAV/PCM decode (``decoded_ok=true``);
    non-WAV payloads deterministically fall back to the digest fake
    with null duration/rms so schemas never change shape. Arrow-batched,
    parallel per input split, only (media_id, payload) crosses the
    language boundary.
    """
    import pandas as pd

    def one(payload: bytes):
        try:
            rate, samples = decode_wav(payload)
            dur, rms, seg = audio_segment_features(rate, samples)
            return dur, rms, seg, True
        except (ValueError, TypeError):
            return None, None, _fake_decode(payload), False

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_ms": [d for d, _, _, _ in decoded],
                    "rms": [r for _, r, _, _ in decoded],
                    "feature": [f for _, _, f, _ in decoded],
                    "decoded_ok": [ok for _, _, _, ok in decoded],
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


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


# ---------------------------------------------------------------- video: AVI


def _decode_avi(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Stdlib decoder for uncompressed RGB24 AVI (BI_RGB — the 'DIB '
    raw-frame container Fluent-Bit-era capture tooling emits): walks the
    RIFF chunk tree for the ``strf`` BITMAPINFOHEADER (dims, bit depth)
    and the ``movi`` frame chunks. Returns (width, height,
    [grayscale frame bytes…]) with the same integer Rec.601 luminance
    as the image decoders. Raises ValueError for compressed codecs or
    malformed containers (callers fall back to the digest fake).
    """
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width: int | None = None
    height = 0
    frames: list[bytes] = []

    def walk(off: int, end: int) -> None:
        nonlocal width, height
        while off + 8 <= end:
            cid = payload[off:off + 4]
            (sz,) = struct.unpack("<I", payload[off + 4:off + 8])
            body0, body1 = off + 8, off + 8 + sz
            if body1 > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(body0 + 4, body1)
            elif cid == b"strf" and width is None and sz >= 20:
                w, h = struct.unpack("<ii", payload[body0 + 4:body0 + 12])
                bits, = struct.unpack("<H", payload[body0 + 14:body0 + 16])
                comp, = struct.unpack("<I", payload[body0 + 16:body0 + 20])
                if comp != 0 or bits != 24:
                    raise ValueError("only uncompressed RGB24 AVI supported")
                width, height = w, h
            elif cid[2:4] in (b"db", b"dc") and sz > 0:
                frames.append(payload[body0:body1])
            off = body1 + (sz & 1)  # RIFF chunks are word-aligned

    walk(12, len(payload))
    if width is None or not frames:
        raise ValueError("no uncompressed video stream in AVI")
    flip = height > 0  # positive biHeight = bottom-up row order
    h = abs(height)
    stride = ((width * 3 + 3) // 4) * 4
    grays = []
    for fr in frames:
        if len(fr) < stride * h:
            raise ValueError("truncated AVI frame")
        a = (
            np.frombuffer(fr[: stride * h], dtype=np.uint8)
            .reshape(h, stride)[:, : width * 3]
            .reshape(h, width, 3)
        )
        if flip:
            a = a[::-1]
        bgr = a.astype(np.int32)
        gray = (
            (299 * bgr[..., 2] + 587 * bgr[..., 1] + 114 * bgr[..., 0]) // 1000
        ).astype(np.uint8)
        grays.append(gray.tobytes())
    return width, h, grays


FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decoded_ok", T.BooleanType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 1) -> DataFrame:
    """Video frame sampling with REAL decode for uncompressed AVI: each
    (media_id, payload) row yields one row per sampled frame with the
    4×4 pooled-luminance features of the actual pixels — the decode
    stage :func:`frame_sample_plan` sketches the explode shape for.
    Payloads no stdlib decoder handles (compressed codecs) fall back to
    a single digest-fake row with ``decoded_ok=false``, keeping the
    schema and batch shape identical.

    Arrow-batched ``mapInPandas``; only (media_id, payload) cross the
    language boundary, and frames never materialize outside their
    task.
    """
    import pandas as pd

    def rows_for(media_id, payload):
        try:
            w, h, grays = _decode_avi(payload)
            return [
                (media_id, i, w, h, image_features(w, h, grays[i]), True)
                for i in range(0, len(grays), max(every_n, 1))
            ]
        except (ValueError, TypeError):
            return [(media_id, 0, 0, 0, _fake_decode(payload), False)]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [
                r
                for mid, pl in zip(pdf["media_id"], pdf["payload"])
                for r in rows_for(mid, pl)
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "width", "height",
                    "feature", "decoded_ok",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(
        run, FRAME_FEATURES_SCHEMA
    )
