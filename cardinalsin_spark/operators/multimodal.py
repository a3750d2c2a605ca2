"""Multimodal columns: image/audio/video as opaque ``binary`` content plus
typed metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators (beyond the reference's surface —
BASELINE.json north star; the reference models no media at all).

The Spark-side plumbing is real and tested: schemas, iterator-of-batches UDF
signatures, row-expanding frame sampling, and partitioning that keeps one
media blob per task row. The codec layer is NOT real: this container ships
no image/audio libraries, so ``decode`` goes through ``_decode_bytes``, a
clearly-marked deterministic fake (bytes → tiled uint8 array). Swap
``_decode_bytes`` for PIL/ffmpeg calls in production; every operator
signature stays identical.

Scale posture: media blobs dominate row size, so operators run via
``mapInPandas`` (streamed Arrow batches — bounded memory per task,
``spark.sql.execution.arrow.maxRecordsPerBatch`` controls batch rows) and
outputs carry only ids + features, never re-emit the blob unless the
operator's contract is a rewrite (resize). Feature extraction is therefore a
pure map stage: no shuffle at any corpus size.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MEDIA_KINDS = ("image", "audio", "video")

# media schema: (media_id, kind, content, width, height, sample_rate,
# n_frames, mime) — flat typed metadata next to the opaque blob.
MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, width int, height int, "
    "sample_rate int, n_frames int, mime string"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, "
    "mean_r double, mean_g double, mean_b double, std_gray double"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, rms double, "
    "peak double, zero_crossings long"
)

FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_idx int, frame_bytes binary, width int, height int"
)

RESIZE_SCHEMA = "media_id long, content binary, width int, height int, mime string"


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the ``documents`` fixture:
    text bytes become the opaque blob, metadata derives from doc stats.
    Stand-in for a real ingest of image/audio/video files."""
    n = F.length("text")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(k) for k in MEDIA_KINDS]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        (F.lit(8) + n % 24).cast("int").alias("width"),
        (F.lit(8) + (n / 7).cast("int") % 24).cast("int").alias("height"),
        F.lit(16_000).cast("int").alias("sample_rate"),
        (F.lit(4) + F.col("doc_id") % 12).cast("int").alias("n_frames"),
        F.concat(F.lit("x-fake/"),
                 F.element_at(
                     F.array(*[F.lit(k) for k in MEDIA_KINDS]),
                     (F.col("doc_id") % 3 + 1).cast("int"),
                 )).alias("mime"),
    )


def _decode_bytes(content: bytes, n_values: int):
    """DETERMINISTIC FAKE DECODE — stand-in for PIL.Image.open /
    soundfile.read / video demux (libs not in this container). Tiles the
    blob's bytes to exactly ``n_values`` uint8 samples. Replace this one
    function with a real codec to productionize; callers only see arrays."""
    import numpy as np

    raw = np.frombuffer(content or b"\x00", dtype=np.uint8)
    if raw.size == 0:
        raw = np.zeros(1, dtype=np.uint8)
    reps = -(-n_values // raw.size)  # ceil
    return np.tile(raw, reps)[:n_values]


def decode_image(content: bytes, width: int, height: int):
    """blob → (height, width, 3) uint8 array (fake decode, see above)."""
    return _decode_bytes(content, width * height * 3).reshape(height, width, 3)


def decode_audio(content: bytes, n_samples: int):
    """blob → float32 PCM in [-1, 1) of length n_samples (fake decode)."""
    import numpy as np

    return (_decode_bytes(content, n_samples).astype(np.float32) - 128.0) / 128.0


def image_features(media: DataFrame) -> DataFrame:
    """Per-image channel statistics via mapInPandas: decode → mean per RGB
    channel + gray std. Output drops the blob (features only travel).

    Numerics: statistics are computed as exact integer sums (uint8 inputs)
    with ONE float division at the end, so results are bit-deterministic
    regardless of accumulation order — the same values any engine computing
    ``sum(int)/n`` reproduces (the SQL oracle relies on this). gray is the
    per-pixel channel sum (r+g+b); std(gray/3) = sqrt(n·Σg² − (Σg)²)/(3n),
    numpy-std (ddof=0) semantics."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_image(r.content, r.width, r.height).astype("int64")
                n = int(r.width) * int(r.height)
                s_r = int(img[:, :, 0].sum())
                s_g = int(img[:, :, 1].sum())
                s_b = int(img[:, :, 2].sum())
                gray3 = img.sum(axis=2)  # r+g+b per pixel, exact int
                s1 = int(gray3.sum())
                s2 = int((gray3 * gray3).sum())
                rows.append(
                    (
                        r.media_id,
                        r.width,
                        r.height,
                        len(r.content or b""),
                        s_r / n,
                        s_g / n,
                        s_b / n,
                        math.sqrt(n * s2 - s1 * s1) / (3.0 * n),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_bytes",
                    "mean_r", "mean_g", "mean_b", "std_gray",
                ],
            )

    cols = media.filter(F.col("kind") == "image").select(
        "media_id", "content", "width", "height"
    )
    return cols.mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


def audio_features(media: DataFrame, n_samples: int = 4096) -> DataFrame:
    """Per-clip PCM statistics: RMS, peak, zero crossings.

    Numerics: PCM is the exact grid (b−128)/128, so Σ(b−128)² is an exact
    integer and rms = sqrt(S/(16384·n)) involves one exact division (power
    of two when n is) and one correctly-rounded sqrt — bit-deterministic
    across engines. A zero crossing is a sign flip between adjacent
    samples; b=128 maps to +0.0 (non-negative), matching IEEE signbit."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                b = _decode_bytes(r.content, n_samples).astype("int64") - 128
                s = int((b * b).sum())
                neg = b < 0
                zc = int(np.sum(neg[1:] != neg[:-1]))
                rows.append(
                    (
                        r.media_id,
                        r.sample_rate,
                        n_samples,
                        math.sqrt(s / (16384.0 * n_samples)),
                        int(np.abs(b).max()) / 128.0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples",
                    "rms", "peak", "zero_crossings",
                ],
            )

    cols = media.filter(F.col("kind") == "audio").select(
        "media_id", "content", "sample_rate"
    )
    return cols.mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbour resize (real numpy indexing over the fake-decoded
    array); contract is a blob rewrite, so output re-emits content."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_image(r.content, r.width, r.height)
                ys = (np.arange(target_h) * r.height // target_h).astype(int)
                xs = (np.arange(target_w) * r.width // target_w).astype(int)
                out = img[np.ix_(ys, xs)]
                rows.append(
                    (r.media_id, out.tobytes(), target_w, target_h,
                     "x-fake/image-raw")
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "content", "width", "height", "mime"]
            )

    cols = media.filter(F.col("kind") == "image").select(
        "media_id", "content", "width", "height"
    )
    return cols.mapInPandas(fn, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling — row-EXPANDING mapInPandas: one output row per
    sampled frame (frame i = the i-th w×h×3 slice of the fake decode)."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                frame_px = r.width * r.height * 3
                all_px = _decode_bytes(r.content, frame_px * r.n_frames)
                for i in range(0, r.n_frames, every_n):
                    frame = all_px[i * frame_px : (i + 1) * frame_px]
                    rows.append(
                        (r.media_id, i, frame.tobytes(), r.width, r.height)
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "frame_bytes", "width", "height"],
            )

    cols = media.filter(F.col("kind") == "video").select(
        "media_id", "content", "width", "height", "n_frames"
    )
    return cols.mapInPandas(fn, FRAME_SAMPLE_SCHEMA)
