"""Multimodal operator plumbing: schemas, mapInPandas batch handling,
row expansion, determinism. The decode layer is a documented fake; what's
under test is the Spark-side contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cardinalsin_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mm.documents_as_media(docs).cache()


def test_media_schema_and_kinds(media):
    assert set(media.columns) == {
        "media_id", "kind", "content", "width", "height",
        "sample_rate", "n_frames", "mime",
    }
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == set(mm.MEDIA_KINDS)
    assert dict(media.dtypes)["content"] == "binary"


def test_image_features(spark, media):
    feats = mm.image_features(media)
    n_images = media.filter(F.col("kind") == "image").count()
    rows = feats.collect()
    assert len(rows) == n_images > 0
    for r in rows[:20]:
        assert 0.0 <= r.mean_r <= 255.0
        assert 0.0 <= r.std_gray <= 128.0
        assert r.n_bytes > 0
    # determinism: fake decode is pure
    again = {r.media_id: r.mean_g for r in feats.collect()}
    assert {r.media_id: r.mean_g for r in rows} == again


def test_audio_features(media):
    feats = mm.audio_features(media, n_samples=1024)
    n_audio = media.filter(F.col("kind") == "audio").count()
    rows = feats.collect()
    assert len(rows) == n_audio > 0
    for r in rows[:20]:
        assert r.n_samples == 1024
        assert 0.0 <= r.rms <= 1.0
        assert 0 <= r.zero_crossings < 1024


def test_resize_blob_contract(media):
    out = mm.resize_images(media, target_w=4, target_h=3)
    rows = out.collect()
    assert len(rows) == media.filter(F.col("kind") == "image").count()
    for r in rows[:20]:
        assert len(r.content) == 4 * 3 * 3  # w*h*rgb
        assert (r.width, r.height) == (4, 3)


def test_frame_sampling_row_expansion(spark, media):
    every = 2
    out = mm.sample_frames(media, every_n=every)
    videos = media.filter(F.col("kind") == "video")
    expected = videos.select(
        F.sum(F.ceil(F.col("n_frames") / every)).alias("n")
    ).first().n
    rows = out.collect()
    assert len(rows) == expected
    by_media = videos.select("media_id", "width", "height", "n_frames").collect()
    dims = {r.media_id: (r.width, r.height, r.n_frames) for r in by_media}
    for r in rows[:50]:
        w, h, nf = dims[r.media_id]
        assert len(r.frame_bytes) == w * h * 3
        assert 0 <= r.frame_idx < nf and r.frame_idx % every == 0


def _make_png(pixels, color_type=2, filters=None):
    """Minimal PNG encoder for tests: 8-bit, no interlace. ``pixels`` is a
    (h, w, channels) uint8 numpy array; ``filters`` picks the per-scanline
    filter byte (default all 0) with the matching pre-filter transform so
    the decoder's unfilter paths (None/Sub/Up/Average/Paeth) get exercised."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = pixels.shape
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        line = pixels[y].reshape(-1).astype(np.int64)
        f = filters[y]
        enc = line.copy()
        for i in range(w * ch):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            else:
                pred = 0
            enc[i] = (line[i] - pred) % 256
        raw.append(f)
        raw.extend(int(v) for v in enc)
        prev = line

    def chunk(typ, data):
        out = struct.pack(">I", len(data)) + typ + data
        return out + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _make_wav(samples, sample_rate=16_000):
    """Real 16-bit mono WAV via the stdlib wave module."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_real_png_decode_all_filters():
    """The stdlib PNG decoder must invert every filter type and drop alpha;
    dimensions come from the file, not the metadata columns."""
    import numpy as np

    from cardinalsin_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    for filters in ([0] * 5, [1] * 5, [0, 2, 2, 2, 2], [3] * 5, [0, 4, 1, 3, 2]):
        blob = _make_png(px, color_type=2, filters=filters)
        out = decode_image(blob, width=999, height=999)  # metadata ignored
        assert out.shape == (5, 4, 3)
        assert np.array_equal(out, px), f"filters={filters}"
    # RGBA: alpha dropped
    rgba = np.dstack([px, np.full((5, 4), 77, dtype=np.uint8)])
    out = decode_image(_make_png(rgba, color_type=6), 0, 0)
    assert np.array_equal(out, px)
    # grayscale: replicated to 3 channels
    gray = px[:, :, :1]
    out = decode_image(_make_png(gray, color_type=0), 0, 0)
    assert np.array_equal(out, np.repeat(gray, 3, axis=2))


def test_real_media_through_feature_operators(spark):
    """End-to-end: a real PNG and a real WAV flow through the SAME
    mapInPandas operators as the fake fixtures, producing hand-computable
    statistics — the productionization seam VERDICT r4 asked to prove."""
    import numpy as np

    from cardinalsin_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        image_features,
    )

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[:, :, 0] = 10  # r
    px[:, :, 1] = 20  # g
    px[:, :, 2] = 40  # b  → gray3 = 70 everywhere → std 0
    png = _make_png(px)
    wav_samples = [0, 16384, -16384, 32767]  # 16-bit grid
    wav = _make_wav(wav_samples)

    rows = [
        (1, "image", bytearray(png), 2, 2, 0, 0, "image/png"),
        (2, "audio", bytearray(wav), 0, 0, 16_000, 0, "audio/wav"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    img = image_features(media).collect()
    assert len(img) == 1
    r = img[0]
    assert (r.width, r.height) == (2, 2)
    assert (r.mean_r, r.mean_g, r.mean_b) == (10.0, 20.0, 40.0)
    assert r.std_gray == 0.0

    n = 8  # pad the 4 real samples with zeros to n_samples
    aud = audio_features(media, n_samples=n).collect()
    assert len(aud) == 1
    a = aud[0]
    s = sum(v * v for v in wav_samples)
    assert a.rms == (s / (32768.0 * 32768.0 * n)) ** 0.5
    assert a.peak == 32767 / 32768.0
    # sign flips: 0,16384,-16384,32767,0,0,0,0 → at 1→2, 2→3 only
    # (0 is non-negative on the exact grid)
    assert a.zero_crossings == 2


def test_fake_path_unchanged_by_real_decoders(spark, media):
    """Fixture blobs (no container magic) must keep taking the fake decode
    — bit-identical features to the oracle-checked contract."""
    from cardinalsin_spark.operators.multimodal import (
        _decode_bytes,
        decode_audio_int,
        decode_image,
    )

    row = media.filter("kind = 'image'").select(
        "content", "width", "height"
    ).first()
    img = decode_image(bytes(row.content), row.width, row.height)
    assert img.shape == (row.height, row.width, 3)
    import numpy as np

    expect = _decode_bytes(bytes(row.content), row.width * row.height * 3)
    assert np.array_equal(img.reshape(-1), expect)
    arr, denom = decode_audio_int(bytes(row.content), 64)
    assert denom == 128
    assert np.array_equal(arr, _decode_bytes(bytes(row.content), 64).astype("int64") - 128)


def _make_bmp(pixels, bpp=24, top_down=False):
    """Minimal BMP encoder for tests: BITMAPINFOHEADER, uncompressed,
    BGR(A) rows padded to 4 bytes, bottom-up unless top_down."""
    import struct

    import numpy as np

    h, w, _ = pixels.shape
    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = bytearray()
        for x in range(w):
            r, g, b = (int(v) for v in pixels[y, x])
            row += bytes([b, g, r] + ([255] if ch == 4 else []))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    data = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp, 0,
        len(data), 2835, 2835, 0, 0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return file_hdr + info + data


def test_real_bmp_decode_both_orientations():
    import numpy as np

    from cardinalsin_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    for bpp in (24, 32):
        for top_down in (False, True):
            out = decode_image(_make_bmp(px, bpp, top_down), 0, 0)
            assert out.shape == (3, 5, 3), (bpp, top_down)
            assert np.array_equal(out, px), (bpp, top_down)


def _make_gif(pixels, interlace=False):
    """Minimal GIF89a encoder for tests: 256-entry global color table built
    from the image's distinct colors, 'uncompressed' LZW (literal 9-bit
    codes with a CLEAR before the width would grow), optional interlace."""
    import struct

    import numpy as np

    h, w, _ = pixels.shape
    colors, inv = np.unique(pixels.reshape(-1, 3), axis=0, return_inverse=True)
    assert len(colors) <= 256
    table = np.zeros((256, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    idx = inv.reshape(h, w)
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        idx = idx[order]

    min_code_size = 8
    clear, eoi = 256, 257
    codes = []
    count = 0
    codes.append(clear)
    for v in idx.reshape(-1):
        if count == 253:  # table at 511; next append would need width 10
            codes.append(clear)
            count = 0
        codes.append(int(v))
        count += 1
    codes.append(eoi)
    acc = bits = 0
    data = bytearray()
    for c in codes:
        acc |= c << bits
        bits += 9
        while bits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        data.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # gct, 256 entries
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code_size)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(0x3B)
    return bytes(out)


def test_real_gif_decode_plain_and_interlaced():
    import numpy as np

    from cardinalsin_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    for interlace in (False, True):
        out = decode_image(_make_gif(px, interlace), 0, 0)
        assert out.shape == (11, 7, 3), interlace
        assert np.array_equal(out, px), f"interlace={interlace}"
    # a large image exercises the periodic-CLEAR path (>253 pixels/run)
    big = rng.integers(0, 4, size=(40, 30, 3), dtype=np.uint8) * 80
    out = decode_image(_make_gif(big), 0, 0)
    assert np.array_equal(out, big)


def test_resize_uses_decoded_dims_for_real_containers(spark):
    """Stale metadata must not drive indexing on the real-decode path
    (review finding, r5): a real 4x4 PNG with metadata claiming 8x8 must
    resize from the decoded 4x4 without IndexError."""
    import numpy as np

    from cardinalsin_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:2, :, 0] = 200  # top half red
    png = _make_png(px)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), 8, 8, 0, 0, "image/png")], MEDIA_SCHEMA
    )
    (row,) = resize_images(media, target_w=2, target_h=2).collect()
    out = np.frombuffer(bytes(row.content), dtype=np.uint8).reshape(2, 2, 3)
    assert out[0, 0, 0] == 200 and out[1, 0, 0] == 0


def test_gif_trailing_padding_after_eoi_ignored():
    """Bytes after the EOI code in the data sub-blocks are spec-legal
    padding and must not decode as pixels (review finding, r5)."""
    import numpy as np

    from cardinalsin_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    gif = bytearray(_make_gif(px))
    # splice 3 padding bytes into the final data sub-block, after EOI:
    # find the image descriptor's sub-block chain and extend the last block
    assert gif[-1] == 0x3B and gif[-2] == 0x00  # trailer, block terminator
    pad = b"\x55\xaa\x55"
    # last sub-block length byte precedes its data; easiest legal splice is
    # a NEW sub-block of padding before the terminator
    gif[-2:-2] = bytes([len(pad)]) + pad
    out = decode_image(bytes(gif), 0, 0)
    assert np.array_equal(out, px)


def _make_avi(frames):
    """Minimal uncompressed AVI encoder for tests: avih main header inside
    hdrl LIST, movi LIST of 00db DIB frames (BGR bottom-up, 4-byte row
    padding)."""
    import struct

    import numpy as np

    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack(
        "<IIIIIIIIiiII", 33_333, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi_body = b"movi"
    for fr in frames:
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up
            row = bytearray()
            for x in range(w):
                r, g, b = (int(v) for v in fr[y, x])
                row += bytes([b, g, r])
            row += b"\x00" * (stride - len(row))
            rows.append(bytes(row))
        movi_body += chunk(b"00db", b"".join(rows))
    movi = chunk(b"LIST", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def test_real_avi_demux_through_sample_frames(spark):
    """A real uncompressed AVI demuxes frame-for-frame through the SAME
    row-expanding operator as the fake fixtures; dimensions come from the
    container, every_n sampling applies to real frames."""
    import numpy as np

    from cardinalsin_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        demux_avi_frames,
        sample_frames,
    )

    rng = np.random.default_rng(13)
    frames = [
        rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8) for _ in range(5)
    ]
    avi = _make_avi(frames)
    got = demux_avi_frames(avi)
    assert len(got) == 5
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)

    media = spark.createDataFrame(
        [(7, "video", bytearray(avi), 0, 0, 0, 0, "video/avi")], MEDIA_SCHEMA
    )
    rows = sample_frames(media, every_n=2).collect()
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    for r in rows:
        assert (r.width, r.height) == (6, 4)
        arr = np.frombuffer(bytes(r.frame_bytes), dtype=np.uint8).reshape(4, 6, 3)
        assert np.array_equal(arr, frames[r.frame_idx])


def test_avi_compressed_raises():
    """A frame chunk whose size doesn't match an uncompressed DIB must
    fail loudly — decoding compressed codecs needs a real codec tier."""
    import struct

    import numpy as np
    import pytest

    from cardinalsin_spark.operators.multimodal import demux_avi_frames

    frames = [np.zeros((2, 2, 3), dtype=np.uint8)]
    avi = bytearray(_make_avi(frames))
    # shrink the frame chunk's declared size to fake a compressed payload
    i = avi.find(b"00db")
    (orig,) = struct.unpack_from("<I", avi, i + 4)
    struct.pack_into("<I", avi, i + 4, orig - 2)
    with pytest.raises(ValueError, match="compressed"):
        demux_avi_frames(bytes(avi))


def test_wav_8bit_and_stereo_paths():
    """decode_audio_int's less-traveled branches: 8-bit PCM maps to the
    (byte−128, 128) grid; stereo decodes the FIRST channel only."""
    import io
    import struct
    import wave

    import numpy as np

    from cardinalsin_spark.operators.multimodal import decode_audio_int

    # 8-bit mono: unsigned bytes around the 128 midpoint
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(bytes([128, 255, 0, 200]))
    arr, denom = decode_audio_int(buf.getvalue(), 4)
    assert denom == 128
    assert list(arr) == [0, 127, -128, 72]

    # 16-bit stereo: first channel extracted
    left = [100, -200, 300]
    right = [-1, -2, -3]
    inter = [v for pair in zip(left, right) for v in pair]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(struct.pack(f"<{len(inter)}h", *inter))
    arr, denom = decode_audio_int(buf.getvalue(), 3)
    assert denom == 32768
    assert list(arr) == left

    # shorter than requested: zero-padded to n_samples
    arr, _ = decode_audio_int(buf.getvalue(), 5)
    assert list(arr) == left + [0, 0]
    assert arr.dtype == np.int64


def test_decoder_error_paths():
    """Unsupported container variants must fail loudly, not decode
    garbage: 16-bit PNG, truncated PNG, paletted BMP, 24-bit WAV."""
    import io
    import struct
    import zlib

    import numpy as np
    import pytest

    from cardinalsin_spark.operators.multimodal import (
        _bmp_decode_stdlib,
        _png_decode_stdlib,
        _wav_decode_int,
    )

    def png_chunk(typ, data):
        out = struct.pack(">I", len(data)) + typ + data
        return out + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    magic = b"\x89PNG\r\n\x1a\n"
    # 16-bit depth
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    with pytest.raises(ValueError, match="depth"):
        _png_decode_stdlib(magic + png_chunk(b"IHDR", ihdr16))
    # truncated IDAT
    ihdr8 = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    short = zlib.compress(b"\x00\x01")
    with pytest.raises(ValueError, match="truncated"):
        _png_decode_stdlib(
            magic + png_chunk(b"IHDR", ihdr8) + png_chunk(b"IDAT", short)
        )
    # 8-bit paletted BMP
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 8, 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 8, 0, 0, 54)
    with pytest.raises(ValueError, match="bpp"):
        _bmp_decode_stdlib(hdr + info + b"\x00" * 20)
    # 24-bit WAV
    buf = io.BytesIO()
    import wave

    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x00\x00" * 4)
    with pytest.raises(ValueError, match="sample width"):
        _wav_decode_int(buf.getvalue())


# ---------------------------------------------------------------------------
# ffmpeg tier: compressed video containers (round 6)
# ---------------------------------------------------------------------------


def _fake_ffmpeg_dir(tmp_path, w=6, h=4, n_frames=4, with_ffprobe=True):
    """Write fake ffmpeg/ffprobe executables that honour the exact CLI
    contract the tier uses: ffmpeg tiles the input blob's bytes into
    ``n_frames`` w*h*3 rawvideo frames on stdout (assertions recompute the
    tiling independently); a bare ``ffmpeg -i`` invocation prints stream
    info on stderr and exits 1 like the real binary; ffprobe prints
    ``w,h``. This proves the whole subprocess seam — temp-file handoff,
    dimension probing, stdout chunking — without the binary installed."""
    import sys
    import textwrap

    d = tmp_path / "bin"
    d.mkdir(exist_ok=True)
    ffmpeg = d / "ffmpeg"
    ffmpeg.write_text(textwrap.dedent(f"""\
        #!{sys.executable}
        import sys
        args = sys.argv[1:]
        src = args[args.index("-i") + 1]
        data = open(src, "rb").read()
        if "rawvideo" not in args:
            sys.stderr.write(
                "Stream #0:0: Video: h264 (High), yuv420p, {w}x{h}, 30 fps\\n")
            sys.exit(1)
        total = {n_frames} * {w} * {h} * 3
        reps = -(-total // max(len(data), 1))
        out = (data * reps)[:total] if data else bytes(total)
        sys.stdout.buffer.write(out)
    """))
    ffmpeg.chmod(0o755)
    if with_ffprobe:
        probe = d / "ffprobe"
        probe.write_text(f"#!{sys.executable}\nprint('{w},{h}')\n")
        probe.chmod(0o755)
    return str(ffmpeg)


def _mp4_blob(payload=b"compressed-payload-0123456789"):
    return b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00isomiso2" + payload


def _tiled(data, total):
    reps = -(-total // len(data))
    return (data * reps)[:total]


def test_ffmpeg_tier_mp4_through_sample_frames(spark, tmp_path, monkeypatch):
    """An MP4 blob flows through the SAME row-expanding operator as every
    other tier: the driver resolves ffmpeg (env override), the closure
    ships the path, frames come back chunked to ffprobe's dimensions with
    every_n sampling applied."""
    import numpy as np

    from cardinalsin_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    ffmpeg = _fake_ffmpeg_dir(tmp_path, w=6, h=4, n_frames=4)
    monkeypatch.setenv("CARDINALSIN_FFMPEG", ffmpeg)
    blob = _mp4_blob()
    media = spark.createDataFrame(
        [(9, "video", bytearray(blob), 0, 0, 0, 0, "video/mp4")], MEDIA_SCHEMA
    )
    rows = sorted(sample_frames(media, every_n=2).collect(),
                  key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 2]
    expect = _tiled(blob, 4 * 6 * 4 * 3)
    frame_sz = 6 * 4 * 3
    for r in rows:
        assert (r.width, r.height) == (6, 4)
        assert bytes(r.frame_bytes) == expect[
            r.frame_idx * frame_sz : (r.frame_idx + 1) * frame_sz
        ]


def test_ffmpeg_dims_from_stderr_fallback(tmp_path, monkeypatch):
    """Without ffprobe anywhere, dimensions parse from ffmpeg's stream-info
    stderr (the `ffmpeg -i` probe invocation)."""
    import numpy as np

    from cardinalsin_spark.operators.multimodal import ffmpeg_decode_frames

    ffmpeg = _fake_ffmpeg_dir(tmp_path, w=5, h=3, n_frames=2,
                              with_ffprobe=False)
    monkeypatch.setenv("PATH", str(tmp_path / "bin"))  # no real ffprobe
    blob = _mp4_blob(b"abcdef")
    frames = ffmpeg_decode_frames(blob, ffmpeg)
    assert len(frames) == 2 and frames[0].shape == (3, 5, 3)
    expect = np.frombuffer(_tiled(blob, 2 * 5 * 3 * 3), dtype=np.uint8)
    got = np.concatenate([f.reshape(-1) for f in frames])
    assert np.array_equal(got, expect)


def test_compressed_avi_routes_to_ffmpeg(tmp_path):
    """A compressed AVI stream (frame chunk size != uncompressed DIB) falls
    through the stdlib demux to the ffmpeg tier instead of raising, when
    ffmpeg is available."""
    import struct

    import numpy as np

    from cardinalsin_spark.operators.multimodal import decode_video_frames

    frames = [np.zeros((2, 2, 3), dtype=np.uint8)]
    avi = bytearray(_make_avi(frames))
    i = avi.find(b"00db")
    (orig,) = struct.unpack_from("<I", avi, i + 4)
    struct.pack_into("<I", avi, i + 4, orig - 2)
    ffmpeg = _fake_ffmpeg_dir(tmp_path, w=2, h=2, n_frames=3)
    got = decode_video_frames(bytes(avi), ffmpeg)
    assert len(got) == 3 and got[0].shape == (2, 2, 3)


def test_mp4_without_ffmpeg_raises():
    """A recognized compressed container with no ffmpeg must fail loudly —
    the fake byte-slicer would silently produce garbage frames."""
    import pytest

    from cardinalsin_spark.operators.multimodal import decode_video_frames

    with pytest.raises(ValueError, match="ffmpeg is required"):
        decode_video_frames(_mp4_blob(), None)


def test_jpeg_routes_to_ffmpeg_without_pil(spark, tmp_path, monkeypatch):
    """JPEG blobs decode through the ffmpeg tier when PIL is absent (this
    container has no PIL): image_features end-to-end with a fake ffmpeg
    decoding a JPEG-magic blob; without PIL and ffmpeg, the decode fails
    loudly rather than slicing garbage pixels."""
    import numpy as np
    import pytest

    from cardinalsin_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        image_features,
    )

    jpeg = b"\xff\xd8\xff\xe0" + b"JFIF-ish-payload" * 3
    # no ffmpeg anywhere → loud failure (PIL is not installed here)
    with pytest.raises(ValueError, match="PIL or ffmpeg"):
        decode_image(jpeg, 0, 0, None)

    ffmpeg = _fake_ffmpeg_dir(tmp_path, w=4, h=2, n_frames=1)
    monkeypatch.setenv("CARDINALSIN_FFMPEG", ffmpeg)
    img = decode_image(jpeg, 0, 0, ffmpeg)
    assert img.shape == (2, 4, 3)
    expect = np.frombuffer(_tiled(jpeg, 4 * 2 * 3), np.uint8).reshape(2, 4, 3)
    assert np.array_equal(img, expect)

    media = spark.createDataFrame(
        [(3, "image", bytearray(jpeg), 0, 0, 0, 0, "image/jpeg")],
        MEDIA_SCHEMA,
    )
    (row,) = image_features(media).collect()
    flat = expect.reshape(-1, 3).astype("int64")
    assert (row.width, row.height) == (4, 2)
    assert row.mean_r == flat[:, 0].sum() / 8
    assert row.mean_g == flat[:, 1].sum() / 8
