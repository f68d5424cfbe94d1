"""Real-codec tests: PNG encode/decode round-trips (all filter types),
WAV decode at every sample width, JPEG/GIF probes, and the Spark paths
(extract_features / probe_media / resize_plan) with StdlibCodec."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from flink_rag_spark.operators.codecs import (
    PNG_SIG,
    StdlibCodec,
    decode_png,
    decode_wav,
    encode_png,
    probe_bytes,
    probe_gif,
    probe_jpeg,
    probe_png,
)
from flink_rag_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    probe_media,
    resize_plan,
    ResizeSpec,
)

rng = np.random.default_rng(42)


# ------------------------------------------------------------------ PNG


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _filter_scanlines(img: np.ndarray, filter_type: int) -> bytes:
    """Test-side reference implementation of PNG filtering (the encoder in
    codecs.py only writes filter 0 — this exercises the decoder's
    unfiltering of types 1-4)."""
    h, w, c = img.shape
    bpp = c
    prev = np.zeros(w * bpp, dtype=np.int32)
    out = b""
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        filt = np.zeros_like(cur)
        for x in range(len(cur)):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            cc = prev[x - bpp] if x >= bpp else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
            filt[x] = (cur[x] - pred) & 0xFF
        out += bytes([filter_type]) + bytes(filt.astype(np.uint8))
        prev = cur
    return out


def _build_png(img: np.ndarray, filter_type: int) -> bytes:
    h, w, c = img.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    raw = _filter_scanlines(img, filter_type)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_encoder(channels):
    img = rng.integers(0, 256, (13, 17, channels), dtype=np.uint8)
    back = decode_png(encode_png(img))
    np.testing.assert_array_equal(back, img)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_unfilter_every_type(filter_type):
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    back = decode_png(_build_png(img, filter_type))
    np.testing.assert_array_equal(back, img)


def test_png_palette():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    png = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"PLTE", palette.tobytes())
           + _png_chunk(b"IDAT", zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    back = decode_png(png)
    np.testing.assert_array_equal(back, palette[idx])
    assert probe_png(png)["channels"] == 3


def test_png_probe():
    m = probe_png(encode_png(np.zeros((5, 7, 4), np.uint8)))
    assert (m["width"], m["height"], m["channels"], m["bit_depth"]) == (7, 5, 4, 8)


# ------------------------------------------------------------------ JPEG / GIF


def _build_jpeg(width: int, height: int, ncomp: int = 3) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
    sof0 = (b"\xff\xc0" + struct.pack(">H", 8 + 3 * ncomp) + bytes([8])
            + struct.pack(">HH", height, width) + bytes([ncomp])
            + bytes(3 * ncomp))
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_jpeg_probe():
    m = probe_jpeg(_build_jpeg(640, 480))
    assert (m["width"], m["height"], m["channels"]) == (640, 480, 3)
    with pytest.raises(ValueError):
        probe_jpeg(b"\xff\xd8\xff\xd9")  # no SOF


def test_gif_probe():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + bytes(4)
    m = probe_gif(gif)
    assert (m["width"], m["height"]) == (320, 200)


# ------------------------------------------------------------------ WAV


def _build_wav(x: np.ndarray, rate: int, sampwidth: int,
               nch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(sampwidth)
        wf.setframerate(rate)
        if sampwidth == 1:
            data = ((x * 127) + 128).astype(np.uint8).tobytes()
        elif sampwidth == 2:
            data = (x * 32767).astype("<i2").tobytes()
        elif sampwidth == 3:
            v = (x * 8388607).astype(np.int64) & 0xFFFFFF
            data = bytes(np.stack([v & 0xFF, (v >> 8) & 0xFF,
                                   (v >> 16) & 0xFF],
                                  axis=-1).astype(np.uint8).reshape(-1))
        else:
            data = (x * 2147483647).astype("<i4").tobytes()
        wf.writeframes(data)
    return buf.getvalue()


@pytest.mark.parametrize("sampwidth", [1, 2, 3, 4])
def test_wav_decode_all_widths(sampwidth):
    t = np.arange(8000) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, rate = decode_wav(_build_wav(sig, 8000, sampwidth))
    assert rate == 8000 and samples.shape == (8000, 1)
    rms = float(np.sqrt((samples[:, 0] ** 2).mean()))
    tol = 0.02 if sampwidth == 1 else 1e-3
    assert abs(rms - 0.5 / np.sqrt(2)) < tol


def test_wav_stereo():
    sig = np.tile(np.array([0.25, -0.25]), 100)
    samples, rate = decode_wav(_build_wav(sig, 16000, 2, nch=2))
    assert samples.shape == (100, 2)


# ------------------------------------------------------------------ codec


def test_probe_bytes_sniffs_magic():
    assert probe_bytes(encode_png(np.zeros((2, 2), np.uint8)))["detected"] == "png"
    assert probe_bytes(_build_jpeg(10, 10))["detected"] == "jpeg"
    assert probe_bytes(_build_wav(np.zeros(10), 8000, 2))["detected"] == "wav"
    with pytest.raises(ValueError):
        probe_bytes(b"not media at all")


def test_stdlib_codec_png_feature_is_real():
    img = np.full((4, 6, 3), 0, np.uint8)
    img[:, :, 0] = 200  # solid red-ish
    f = StdlibCodec(strict=True).decode("image", encode_png(img))
    assert (f[0], f[1], f[2], f[3]) == (6, 4, 3, 8)
    assert abs(f[4] - 200 / 3) < 1e-3       # mean over all channels
    assert f[8] == 200 and f[9] == 0         # per-channel means
    assert f[12] == 0 and f[13] == 0         # uniform image → no gradient


def test_stdlib_codec_wav_feature_is_real():
    t = np.arange(16000) / 16000.0
    f = StdlibCodec(strict=True).decode(
        "audio", _build_wav(0.5 * np.sin(2 * np.pi * 440 * t), 16000, 2))
    assert f[1] == 16000 and f[2] == 16000
    assert abs(f[3] - 1.0) < 1e-6            # duration
    assert abs(f[4] - 0.5 / np.sqrt(2)) < 1e-3  # rms
    assert abs(f[5] - 0.5) < 1e-3            # peak


def test_stdlib_codec_nonstrict_skips_garbage():
    c = StdlibCodec()
    assert c.decode("image", b"garbage") is None
    with pytest.raises(ValueError):
        StdlibCodec(strict=True).decode("image", b"garbage")


def test_nonstrict_degrades_oserror_decoders():
    """strict=False must degrade OSError-family failures (what PIL raises —
    UnidentifiedImageError subclasses OSError — on payloads that probe as
    jpeg/gif but are truncated past the header) to None instead of crashing
    the task; strict=True re-raises. Simulated on the seam so the contract
    is pinned even without PIL in the image."""
    class OsErrorCodec(StdlibCodec):
        def _decode(self, payload):
            raise OSError("truncated file read")

    assert OsErrorCodec().decode("image", b"\xff\xd8\xff\xe0JFIF") is None
    with pytest.raises(OSError):
        OsErrorCodec(strict=True).decode("image", b"\xff\xd8\xff\xe0JFIF")


# ------------------------------------------------------------------ Spark paths


@pytest.fixture()
def real_media(spark):
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    sig = 0.3 * np.sin(2 * np.pi * 100 * np.arange(4000) / 8000.0)
    rows = [
        (1, "image", bytearray(encode_png(img)), 8, 8, None, None),
        (2, "audio", bytearray(_build_wav(sig, 8000, 2)), None, None, 8000, None),
        (3, "image", bytearray(_build_jpeg(320, 240)), 320, 240, None, None),
        (4, "image", bytearray(b"corrupt payload"), None, None, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_real_codec(spark, real_media):
    out = {r["media_id"]: r
           for r in extract_features(real_media, codec=StdlibCodec()).collect()}
    assert len(out[1]["feature"]) == 16 and out[1]["feature"][0] == 8.0
    assert out[2]["feature"][1] == 8000.0
    assert out[3]["feature"][0] == 320.0
    assert out[4]["feature"] is None  # corrupt → null, task survives


def test_probe_media_spark(spark, real_media):
    out = {r["media_id"]: r for r in probe_media(real_media).collect()}
    assert (out[1]["detected"], out[1]["width"], out[1]["height"]) == ("png", 8, 8)
    assert (out[2]["detected"], out[2]["sample_rate"], out[2]["n_samples"]) == \
        ("wav", 8000, 4000)
    assert abs(out[2]["duration"] - 0.5) < 1e-9
    assert (out[3]["detected"], out[3]["width"]) == ("jpeg", 320)
    assert out[4]["detected"] == "unknown" and out[4]["width"] is None


def test_resize_real_nearest_neighbor(spark):
    # 4x4 quadrant image: resize to 2x2 must pick one pixel per quadrant
    img = np.zeros((4, 4, 3), np.uint8)
    img[:2, :2] = [255, 0, 0]
    img[:2, 2:] = [0, 255, 0]
    img[2:, :2] = [0, 0, 255]
    img[2:, 2:] = [255, 255, 255]
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(img)), 4, 4, None, None)],
        MEDIA_SCHEMA)
    [row] = resize_plan(media, ResizeSpec(2, 2), codec=StdlibCodec()).collect()
    f = row["feature"]
    assert (f[0], f[1]) == (2.0, 2.0)
    # resized quadrants: red, green, blue, white → known channel means
    assert abs(f[8] - (255 + 0 + 0 + 255) / 4) < 1e-3
    assert abs(f[9] - (0 + 255 + 0 + 255) / 4) < 1e-3
    assert abs(f[10] - (0 + 0 + 255 + 255) / 4) < 1e-3


def test_best_codec_matches_environment():
    from flink_rag_spark.operators.codecs import (
        PilCodec,
        StdlibCodec,
        best_codec,
        pil_available,
    )
    codec = best_codec()
    if pil_available():
        assert isinstance(codec, PilCodec)
    else:
        assert type(codec) is StdlibCodec


def test_pil_codec_decodes_jpeg_pixels():
    """Gate-open path: a real JPEG round-trips through the PIL tier with
    real pixel statistics (auto-skips in images without PIL)."""
    import io as _io

    import numpy as np
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")
    from flink_rag_spark.operators.codecs import PilCodec

    arr = np.zeros((8, 12, 3), dtype=np.uint8)
    arr[:, :, 0] = 200  # red field — mean pixel stats are predictable
    buf = _io.BytesIO()
    PIL_Image.fromarray(arr).save(buf, format="JPEG")
    feat = PilCodec().decode("image", buf.getvalue())
    assert feat is not None and feat[0] == 12 and feat[1] == 8
    # real pixel stats present (the stdlib probe-only tier leaves them 0)
    assert feat[4] > 0 and abs(feat[8] - 200) < 10


def test_pil_codec_without_pil_raises():
    import pytest

    from flink_rag_spark.operators.codecs import PilCodec, pil_available

    if pil_available():
        pytest.skip("PIL present — constructor cannot fail")
    with pytest.raises(ImportError):
        PilCodec()
