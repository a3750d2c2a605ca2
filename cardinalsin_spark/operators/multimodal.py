"""Multimodal columns: image/audio/video as opaque ``binary`` content plus
typed metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators (beyond the reference's surface —
BASELINE.json north star; the reference models no media at all).

The Spark-side plumbing is real and tested: schemas, iterator-of-batches UDF
signatures, row-expanding frame sampling, and partitioning that keeps one
media blob per task row. The codec layer is PLUGGABLE, keyed on container
magic bytes: blobs that are real PNG or RIFF/WAVE files go through a real
decoder (PIL / soundfile when installed, else pure-stdlib fallbacks — a
zlib+unfilter PNG decoder and the ``wave`` module), and anything else goes
through ``_decode_bytes``, a clearly-marked deterministic fake (bytes →
tiled uint8 array) that the oracle-checked fixture path uses. Video demux
is real for uncompressed RIFF/AVI (``demux_avi_frames``); compressed
streams (AVI with a real codec, MP4/Matroska containers) decode through
the ffmpeg CLI tier (``ffmpeg_decode_frames``: binary resolved
driver-side, one bounded subprocess per blob in the task, dimensions from
ffprobe or ffmpeg's stream info) and fail loudly when no ffmpeg is
available. Operator signatures are identical across every tier.

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

AUDIO_RESAMPLE_SCHEMA = (
    "media_id long, sample_rate int, new_rate int, n_out long, "
    "rms double, peak double, dc double"
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
    """DETERMINISTIC FAKE DECODE — the default for blobs that are not a
    recognized real container (the doc-derived fixtures). Tiles the blob's
    bytes to exactly ``n_values`` uint8 samples; callers only see arrays."""
    import numpy as np

    raw = np.frombuffer(content or b"\x00", dtype=np.uint8)
    if raw.size == 0:
        raw = np.zeros(1, dtype=np.uint8)
    reps = -(-n_values // raw.size)  # ceil
    return np.tile(raw, reps)[:n_values]


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _is_png(content: bytes) -> bool:
    return bool(content) and content[:8] == _PNG_MAGIC


def _is_wav(content: bytes) -> bool:
    return (
        bool(content)
        and len(content) > 12
        and content[:4] == b"RIFF"
        and content[8:12] == b"WAVE"
    )


def _png_decode_stdlib(content: bytes):
    """Real PNG decode with only the stdlib: parse chunks, zlib-inflate
    IDAT, undo per-scanline filters 0-4 (None/Sub/Up/Average/Paeth), and
    normalize to (h, w, 3) uint8. Supports the non-interlaced 8-bit-depth
    color types (gray / RGB / gray+alpha / RGBA); alpha is dropped. This is
    the PIL-free fallback so the real-decode path works in minimal
    containers."""
    import struct
    import zlib

    import numpy as np

    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        typ = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if hdr is None:
        raise ValueError("PNG: missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = hdr
    if depth != 8 or interlace != 0:
        raise ValueError(f"PNG: unsupported depth={depth}/interlace={interlace}")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"PNG: unsupported color type {color}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: truncated image data")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:  # None
            pass
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + int(prev[i])) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                c = int(out[y - 1][i - bpp]) if (y and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: bad filter {f}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    px = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:  # gray+alpha → replicate gray
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGB / RGBA (alpha dropped)


def _is_bmp(content: bytes) -> bool:
    return bool(content) and len(content) > 54 and content[:2] == b"BM"


def _is_gif(content: bytes) -> bool:
    return bool(content) and content[:6] in (b"GIF87a", b"GIF89a")


def _gif_decode_stdlib(content: bytes):
    """Real GIF decode, stdlib-only: global/local color tables, the LZW
    decompressor with variable code width and clear/EOI codes, interlace
    row reordering; first image frame only (frame sampling over animated
    media goes through ``sample_frames``). Returns (h, w, 3) uint8."""
    import struct

    import numpy as np

    _sw, _sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(content):
        block = content[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: skip sub-blocks
            pos += 2
            while content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{block:02x}")
        _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", content, pos + 1)
        pos += 10
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF: no color table")
        min_code_size = content[pos]
        pos += 1
        data = bytearray()
        while content[pos] != 0:
            ln = content[pos]
            data += content[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1

        # LZW: variable-width codes, LSB-first bit packing
        clear = 1 << min_code_size
        eoi = clear + 1
        width = min_code_size + 1
        dict_base = [(i,) for i in range(clear)] + [None, None]
        table_lzw = list(dict_base)
        out: list[int] = []
        prev = None
        acc = bits = 0
        done = False  # EOI must stop the WHOLE stream — trailing
        # sub-block padding after it is legal and must not decode as pixels
        for byte in data:
            if done:
                break
            acc |= byte << bits
            bits += 8
            while bits >= width:
                code = acc & ((1 << width) - 1)
                acc >>= width
                bits -= width
                if code == clear:
                    table_lzw = list(dict_base)
                    width = min_code_size + 1
                    prev = None
                    continue
                if code == eoi:
                    bits = 0
                    acc = 0
                    done = True
                    break
                if prev is None:
                    entry = table_lzw[code]
                else:
                    if code < len(table_lzw) and table_lzw[code] is not None:
                        entry = table_lzw[code]
                        table_lzw.append(prev + (entry[0],))
                    else:  # the KwKwK case
                        entry = prev + (prev[0],)
                        table_lzw.append(entry)
                    if len(table_lzw) == (1 << width) and width < 12:
                        width += 1
                out.extend(entry)
                prev = entry
        idx = np.array(out[: w * h], dtype=np.int32).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows stored in 4 passes
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        return table[idx]
    raise ValueError("GIF: no image descriptor found")


def _bmp_decode_stdlib(content: bytes):
    """Real BMP decode, stdlib-only: BITMAPINFOHEADER, uncompressed
    24/32-bit. BMP stores BGR(A) rows bottom-up (top-down when height is
    negative) padded to 4 bytes; normalize to (h, w, 3) RGB uint8."""
    import struct

    import numpy as np

    data_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        raise ValueError("BMP: unsupported core header")
    w, h = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0 or bpp not in (24, 32) or planes != 1:
        raise ValueError(f"BMP: unsupported bpp={bpp}/compression={compression}")
    top_down = h < 0
    h = abs(h)
    ch = bpp // 8
    stride = (w * ch + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(
        content, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
    if not top_down:
        px = px[::-1]
    return px[:, :, 2::-1].copy()  # BGR(A) → RGB, alpha dropped


def _wav_decode_int(content: bytes):
    """Real WAV decode: PCM samples as exact integers plus the grid
    denominator — (int16 array, 32768) or (uint8−128, 128). First channel
    of multi-channel clips. soundfile is preferred when installed; the
    stdlib ``wave`` module is the always-available fallback."""
    import io
    import wave

    import numpy as np

    try:  # optional real-codec tier (flac/ogg too, if ever present)
        import soundfile  # type: ignore

        data, _sr = soundfile.read(io.BytesIO(content), dtype="int16")
        arr = np.asarray(data, dtype=np.int64)
        if arr.ndim == 2:
            arr = arr[:, 0]
        return arr, 32768
    except ImportError:
        pass
    with wave.open(io.BytesIO(content), "rb") as wf:
        n_ch, sampwidth = wf.getnchannels(), wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if sampwidth == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.int64)
        denom = 32768
    elif sampwidth == 1:
        arr = np.frombuffer(frames, dtype=np.uint8).astype(np.int64) - 128
        denom = 128
    else:
        raise ValueError(f"WAV: unsupported sample width {sampwidth}")
    return arr[::n_ch], denom


def _is_jpeg(content: bytes) -> bool:
    return bool(content) and content[:3] == b"\xff\xd8\xff"


def decode_image(content: bytes, width: int, height: int, ffmpeg: str | None = None):
    """blob → (h, w, 3) uint8 array. Real containers decode for real (PIL
    if installed, else the stdlib PNG/BMP/GIF paths) with dimensions from
    the FILE; JPEG blobs go through PIL or the ffmpeg tier (one-frame
    rawvideo decode) and fail loudly when neither is available — the fake
    byte-slicer would silently produce garbage pixels; other blobs take
    the fake tiled decode at the metadata dimensions."""
    if _is_png(content) or _is_bmp(content) or _is_gif(content) or _is_jpeg(
        content
    ):
        try:
            import io

            from PIL import Image  # type: ignore

            import numpy as np

            img = Image.open(io.BytesIO(content)).convert("RGB")
            return np.asarray(img, dtype=np.uint8)
        except ImportError:
            if _is_bmp(content):
                return _bmp_decode_stdlib(content)
            if _is_gif(content):
                return _gif_decode_stdlib(content)
            if _is_jpeg(content):
                if ffmpeg:
                    return ffmpeg_decode_frames(content, ffmpeg)[0]
                raise ValueError(
                    "JPEG image — PIL or ffmpeg is required (install one "
                    "on the executors or set CARDINALSIN_FFMPEG)"
                ) from None
            return _png_decode_stdlib(content)
    return _decode_bytes(content, width * height * 3).reshape(height, width, 3)


def decode_audio_int(content: bytes, n_samples: int):
    """blob → (exact-integer PCM of length ``n_samples``, grid denominator).
    Real WAVs decode for real (zero-padded / truncated to ``n_samples``);
    other blobs take the fake (byte−128, 128) grid. Integer samples keep the
    downstream statistics exact — one sqrt/division at the end."""
    import numpy as np

    if _is_wav(content):
        arr, denom = _wav_decode_int(content)
        if arr.size >= n_samples:
            return arr[:n_samples], denom
        return np.pad(arr, (0, n_samples - arr.size)), denom
    return _decode_bytes(content, n_samples).astype(np.int64) - 128, 128


def decode_audio(content: bytes, n_samples: int):
    """blob → float32 PCM in [-1, 1) of length n_samples."""
    import numpy as np

    arr, denom = decode_audio_int(content, n_samples)
    return arr.astype(np.float32) / float(denom)


def image_features(media: DataFrame) -> DataFrame:
    """Per-image channel statistics via mapInPandas: decode → mean per RGB
    channel + gray std. Output drops the blob (features only travel).

    Numerics: statistics are computed as exact integer sums (uint8 inputs)
    with ONE float division at the end, so results are bit-deterministic
    regardless of accumulation order — the same values any engine computing
    ``sum(int)/n`` reproduces (the SQL oracle relies on this). gray is the
    per-pixel channel sum (r+g+b); std(gray/3) = sqrt(n·Σg² − (Σg)²)/(3n),
    numpy-std (ddof=0) semantics."""

    ffmpeg = resolve_ffmpeg()

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_image(
                    r.content, r.width, r.height, ffmpeg
                ).astype("int64")
                # dims come from the DECODED array: identical to metadata on
                # the fake path, authoritative (from the file) on real PNGs
                h, w = img.shape[0], img.shape[1]
                n = w * h
                s_r = int(img[:, :, 0].sum())
                s_g = int(img[:, :, 1].sum())
                s_b = int(img[:, :, 2].sum())
                gray3 = img.sum(axis=2)  # r+g+b per pixel, exact int
                s1 = int(gray3.sum())
                s2 = int((gray3 * gray3).sum())
                rows.append(
                    (
                        r.media_id,
                        w,
                        h,
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

    Numerics: PCM sits on an exact integer grid — (b−128)/128 on the fake
    path, s/32768 for real 16-bit WAVs — so Σs² is an exact integer and
    rms = sqrt(S/(denom²·n)) involves one exact division (power of two
    when n is) and one correctly-rounded sqrt — bit-deterministic across
    engines. A zero crossing is a sign flip between adjacent samples; the
    grid's 0 maps to +0.0 (non-negative), matching IEEE signbit."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                b, denom = decode_audio_int(r.content, n_samples)
                s = int((b * b).sum())
                neg = b < 0
                zc = int(np.sum(neg[1:] != neg[:-1]))
                rows.append(
                    (
                        r.media_id,
                        r.sample_rate,
                        n_samples,
                        math.sqrt(s / (float(denom) * denom * n_samples)),
                        int(np.abs(b).max()) / float(denom),
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


def resample_audio(
    media: DataFrame, factor: int = 4, n_samples: int = 4096
) -> DataFrame:
    """Integer-factor decimation (block mean over ``factor`` samples) with
    per-clip statistics of the RESAMPLED signal — the cheap anti-aliased
    downsample of a training-audio pipeline (16 kHz → 4 kHz at the default
    factor).

    Numerics: each output sample is an exact integer block SUM on the
    (denom × factor) grid, so Σy², max|y| and Σy are exact integers;
    rms/peak/dc each take ONE correctly-rounded float division (+ sqrt for
    rms) at the end — bit-deterministic across engines, same discipline as
    :func:`audio_features`. Arrow-batched ``mapInPandas``; blobs never
    leave the executor."""

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                b, denom = decode_audio_int(r.content, n_samples)
                blocks = b.reshape(-1, factor).sum(axis=1, dtype=np.int64)
                q = factor * denom
                n_out = int(blocks.size)
                s2 = int((blocks * blocks).sum())
                rows.append(
                    (
                        r.media_id,
                        r.sample_rate,
                        r.sample_rate // factor,
                        n_out,
                        math.sqrt(s2 / (float(q) * q * n_out)),
                        int(np.abs(blocks).max()) / float(q),
                        int(blocks.sum()) / (float(q) * n_out),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "new_rate", "n_out",
                    "rms", "peak", "dc",
                ],
            )

    cols = media.filter(F.col("kind") == "audio").select(
        "media_id", "content", "sample_rate"
    )
    return cols.mapInPandas(fn, AUDIO_RESAMPLE_SCHEMA)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbour resize (real numpy indexing over the fake-decoded
    array); contract is a blob rewrite, so output re-emits content."""

    ffmpeg = resolve_ffmpeg()

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_image(r.content, r.width, r.height, ffmpeg)
                # index with the DECODED dims — real-container decodes take
                # their dimensions from the file, and stale metadata must
                # not drive out-of-bounds indexing (or a silent crop)
                src_h, src_w = img.shape[0], img.shape[1]
                ys = (np.arange(target_h) * src_h // target_h).astype(int)
                xs = (np.arange(target_w) * src_w // target_w).astype(int)
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


def _is_avi(content: bytes) -> bool:
    return (
        bool(content)
        and len(content) > 12
        and content[:4] == b"RIFF"
        and content[8:12] == b"AVI "
    )


def demux_avi_frames(content: bytes):
    """Real AVI demux, stdlib-only: walk the RIFF chunk tree to the
    ``movi`` LIST and yield each uncompressed video frame ('??db'/'??dc'
    stream chunks, BI_RGB 24-bit bottom-up DIB rows — the standard
    raw-AVI layout) as an (h, w, 3) RGB uint8 array. Compressed codecs
    need ffmpeg and raise. Frame dimensions come from the ``avih`` main
    header."""
    import struct

    import numpy as np

    pos, end = 12, len(content)
    w = h = None
    frames = []

    def walk(pos, end):
        nonlocal w, h
        while pos + 8 <= end:
            fourcc = content[pos : pos + 4]
            (size,) = struct.unpack_from("<I", content, pos + 4)
            body = pos + 8
            if fourcc == b"LIST":
                walk(body + 4, body + size)  # skip list type fourcc
            elif fourcc == b"avih":
                w, h = struct.unpack_from("<ii", content, body + 32)
            elif fourcc[2:4] in (b"db", b"dc") and size > 0:
                if w is None:
                    raise ValueError("AVI: frame before avih header")
                expect = ((w * 3 + 3) & ~3) * abs(h)
                if size != expect:
                    raise ValueError(
                        "AVI: compressed stream — a real codec (ffmpeg) "
                        "is required"
                    )
                stride = (w * 3 + 3) & ~3
                px = np.frombuffer(
                    content, np.uint8, abs(h) * stride, body
                ).reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
                if h > 0:  # positive height = bottom-up, like BMP
                    px = px[::-1]
                frames.append(px[:, :, ::-1].copy())  # BGR → RGB
            pos = body + size + (size & 1)  # chunks pad to even

    walk(pos, end)
    return frames


def _is_mp4(content: bytes) -> bool:
    # ISO-BMFF: a size-prefixed `ftyp` box leads the file (MP4/MOV/M4V)
    return bool(content) and len(content) > 12 and content[4:8] == b"ftyp"


def _is_mkv(content: bytes) -> bool:
    # EBML magic (Matroska / WebM)
    return bool(content) and content[:4] == b"\x1a\x45\xdf\xa3"


def resolve_ffmpeg() -> str | None:
    """Resolve the ffmpeg binary DRIVER-side: the ``CARDINALSIN_FFMPEG``
    env override first, else PATH. ``sample_frames`` captures the resolved
    path in the task closure so every executor runs exactly the binary the
    driver chose — on a real cluster it must exist at that path in the
    executor image (standard data-eng practice for codec dependencies)."""
    import os
    import shutil

    return os.environ.get("CARDINALSIN_FFMPEG") or shutil.which("ffmpeg")


def ffmpeg_decode_frames(content: bytes, ffmpeg: str):
    """Decode a compressed video blob through the ffmpeg CLI: blob → temp
    file → ``-f rawvideo -pix_fmt rgb24`` on stdout, chunked into
    (h, w, 3) RGB uint8 arrays. Dimensions come from ffprobe (same
    directory as ffmpeg, else PATH) with a fallback to parsing ffmpeg's
    stream-info stderr — ffprobe is not always installed alongside.
    One bounded subprocess per blob inside a mapInPandas task (probe calls
    time out at 60 s, the decode at 600 s — a hung codec fails the task
    loudly instead of wedging the executor); the blob never transits the
    JVM twice."""
    import os
    import re
    import shutil
    import subprocess
    import tempfile

    import numpy as np

    with tempfile.NamedTemporaryFile(suffix=".video", delete=False) as tf:
        tf.write(content)
        path = tf.name
    try:
        w = h = None
        probe = os.path.join(os.path.dirname(ffmpeg) or ".", "ffprobe")
        if not os.path.exists(probe):
            probe = shutil.which("ffprobe")
        if probe:
            out = subprocess.run(
                [probe, "-v", "error", "-select_streams", "v:0",
                 "-show_entries", "stream=width,height", "-of", "csv=p=0",
                 path],
                capture_output=True, text=True, timeout=60,
            )
            m = re.match(r"(\d+),(\d+)", out.stdout.strip())
            if m:
                w, h = int(m.group(1)), int(m.group(2))
        if w is None:
            info = subprocess.run(
                [ffmpeg, "-hide_banner", "-i", path],
                capture_output=True, text=True, timeout=60,
            )
            m = re.search(r"Video:.*?\s(\d{1,5})x(\d{1,5})", info.stderr)
            if not m:
                raise ValueError("ffmpeg: could not determine video dimensions")
            w, h = int(m.group(1)), int(m.group(2))
        raw = subprocess.run(
            [ffmpeg, "-v", "error", "-i", path, "-map", "0:v:0",
             "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1"],
            capture_output=True, timeout=600,
        )
        if raw.returncode != 0:
            err = raw.stderr[-300:].decode(errors="replace")
            raise ValueError(f"ffmpeg decode failed: {err}")
        frame_sz = w * h * 3
        if frame_sz == 0 or len(raw.stdout) == 0 or len(raw.stdout) % frame_sz:
            raise ValueError(
                f"ffmpeg: rawvideo output of {len(raw.stdout)} bytes is not "
                f"a whole number of {w}x{h}x3 frames"
            )
        arr = np.frombuffer(raw.stdout, np.uint8).reshape(-1, h, w, 3)
        return [arr[i] for i in range(arr.shape[0])]
    finally:
        os.unlink(path)


def decode_video_frames(content: bytes, ffmpeg: str | None):
    """Route a video blob to its decode tier: real AVI demux for
    uncompressed DIB streams, the ffmpeg tier for compressed AVI and for
    MP4/Matroska containers, ``None`` for non-container blobs (the
    deterministic-fake fixture path). Raises when a compressed container
    is recognized but no ffmpeg is available — silently producing garbage
    from the fake byte-slicer would be a wrong answer."""
    if _is_avi(content):
        try:
            return demux_avi_frames(content)
        except ValueError as e:
            if "compressed" in str(e) and ffmpeg:
                return ffmpeg_decode_frames(content, ffmpeg)
            raise
    if _is_mp4(content) or _is_mkv(content):
        if ffmpeg is None:
            raise ValueError(
                "compressed video container (MP4/Matroska) — ffmpeg is "
                "required (install it on the executors or set "
                "CARDINALSIN_FFMPEG)"
            )
        return ffmpeg_decode_frames(content, ffmpeg)
    return None


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling — row-EXPANDING mapInPandas: one output row
    per sampled frame. Real RIFF/AVI blobs demux for real (uncompressed
    DIB frames, dimensions and frame count from the container); compressed
    AVI/MP4/Matroska blobs decode through the ffmpeg tier (binary resolved
    driver-side, captured in the closure); other blobs take the fake
    decode (frame i = the i-th w×h×3 byte slice)."""
    ffmpeg = resolve_ffmpeg()

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content or b"")
                real_frames = decode_video_frames(content, ffmpeg)
                if real_frames is not None:
                    for i, frame in enumerate(real_frames):
                        if i % every_n:
                            continue
                        fh, fw = frame.shape[0], frame.shape[1]
                        rows.append(
                            (r.media_id, i, frame.tobytes(), fw, fh)
                        )
                    continue
                frame_px = r.width * r.height * 3
                all_px = _decode_bytes(content, frame_px * r.n_frames)
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


SCENE_CHANGE_SCHEMA = "media_id long, frame_idx int, sad64 long, is_cut int"


def scene_change(
    media: DataFrame, probes: int = 64, cut_threshold: int = 40 * 64
) -> DataFrame:
    """Scene-cut detection over video blobs: sum of absolute differences
    between consecutive frames on a SPARSE deterministic probe grid
    (``probes`` evenly-strided pixel bytes per frame) — the classic fast
    cut detector that reads O(probes) bytes per pair instead of the whole
    frame, so the metric stays cheap at any resolution. A pair is a cut
    when the probe SAD exceeds ``cut_threshold``.

    Exact-integer contract: probe positions are ``k · (n_px // probes)``
    and the SAD is an int64 sum of uint8 diffs, so the result is
    bit-deterministic and oracle-checkable byte-for-byte against the
    tiled-blob layout. Real containers (RIFF/AVI, ffmpeg tier) demux
    first; other blobs take the fake tile decode. Arrow-batched
    mapInPandas — blob bytes never shuffle; output is O(n_frames) scalar
    rows per video.
    """
    ffmpeg = resolve_ffmpeg()

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content or b"")
                real = decode_video_frames(content, ffmpeg)
                if real is not None:
                    arrs = [f.reshape(-1) for f in real]
                else:
                    frame_px = r.width * r.height * 3
                    all_px = _decode_bytes(content, frame_px * r.n_frames)
                    arrs = [
                        all_px[i * frame_px : (i + 1) * frame_px]
                        for i in range(r.n_frames)
                    ]
                if len(arrs) < 2:
                    continue
                n_px = int(arrs[0].size)
                stride = max(1, n_px // probes)
                idx = np.minimum(
                    np.arange(probes, dtype=np.int64) * stride, n_px - 1
                )
                prev = arrs[0][idx].astype(np.int64)
                for i in range(1, len(arrs)):
                    # real containers may change frame shape mid-stream:
                    # clamp the probe grid to each frame's own extent
                    a = arrs[i]
                    cur = a[np.minimum(idx, a.size - 1)].astype(np.int64)
                    sad = int(np.abs(cur - prev).sum())
                    rows.append((r.media_id, i, sad, int(sad > cut_threshold)))
                    prev = cur
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "sad64", "is_cut"]
            )

    cols = media.filter(F.col("kind") == "video").select(
        "media_id", "content", "width", "height", "n_frames"
    )
    return cols.mapInPandas(fn, SCENE_CHANGE_SCHEMA)
