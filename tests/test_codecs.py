"""Stdlib media codecs (PNG via zlib, WAV via wave) and the real
decode/resize paths of the multimodal operators."""

from __future__ import annotations

import math
import struct
import zlib

import pytest

from wq_data_pipeline_spark.operators import codecs as CC


def _gradient_rgb(w, h):
    pix = bytearray()
    for y in range(h):
        for x in range(w):
            pix += bytes([(x * 17) % 256, (y * 31) % 256, (x * y) % 256])
    return bytes(pix)


def test_png_roundtrip_rgb():
    w, h = 9, 5
    pix = _gradient_rgb(w, h)
    data = CC.png_encode(w, h, 3, pix)
    assert CC.sniff(data) == "png"
    w2, h2, nch, out = CC.png_decode(data)
    assert (w2, h2, nch) == (w, h, 3)
    assert out == pix


def test_png_all_filters_decode():
    """Hand-build a PNG whose scanlines use filters 1-4 (Sub, Up,
    Average, Paeth); decode must invert each correctly."""
    w, h, nch = 6, 4, 1
    pix = bytes([(x * 40 + y * 13) % 256 for y in range(h) for x in range(w)])

    def fwd_filter(f, line, prev):
        out = bytearray()
        for i in range(len(line)):
            a = line[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if f == 1:
                out.append((line[i] - a) & 0xFF)
            elif f == 2:
                out.append((line[i] - b) & 0xFF)
            elif f == 3:
                out.append((line[i] - ((a + b) >> 1)) & 0xFF)
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out.append((line[i] - pr) & 0xFF)
        return bytes(out)

    raw = bytearray()
    prev = bytes(w * nch)
    for y, f in zip(range(h), (1, 2, 3, 4)):
        line = pix[y * w : (y + 1) * w]
        raw += bytes([f]) + fwd_filter(f, line, prev)
        prev = line

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        CC.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    w2, h2, nch2, out = CC.png_decode(data)
    assert (w2, h2, nch2) == (w, h, 1)
    assert out == pix


def test_png_resize_nearest():
    # 4x4 gray checkerboard -> 2x2 picks the top-left of each quadrant
    pix = bytes(
        [255 if (x // 2 + y // 2) % 2 == 0 else 0 for y in range(4) for x in range(4)]
    )
    data = CC.png_encode(4, 4, 1, pix)
    resized, w, h = CC.png_resize_nearest(data, 2, 2)
    w2, h2, nch, out = CC.png_decode(resized)
    assert (w2, h2, nch) == (2, 2, 1)
    assert out == bytes([255, 0, 0, 255])


def test_png_unsupported_raises():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)  # 16-bit depth

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    data = CC.PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        CC.png_decode(data)


def test_wav_roundtrip():
    rate, n = 8000, 800
    samples = [int(12000 * math.sin(2 * math.pi * 440 * i / rate)) for i in range(n)]
    data = CC.wav_encode(samples, rate=rate)
    assert CC.sniff(data) == "wav"
    nch, frames, rate2, amp = CC.wav_decode(data)
    assert (nch, frames, rate2) == (1, n, rate)
    # mean |sin| = 2/pi; amplitude 12000/32768
    expected = (2 / math.pi) * (12000 / 32768.0)
    assert abs(amp - expected) < 0.01


def test_decode_media_real_paths(spark):
    """decode_media with fake=False decodes real PNG and WAV payloads
    (magic-sniffed) inside the mapInPandas batch."""
    from wq_data_pipeline_spark.operators.multimodal import decode_media

    png = CC.png_encode(7, 3, 3, _gradient_rgb(7, 3))
    wav = CC.wav_encode([0, 1000, -1000, 500] * 50, rate=4000)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav))], ["media_id", "content"]
    )
    out = {r.media_id: r for r in decode_media(df).collect()}
    assert (out[1].width, out[1].height) == (7, 3)
    assert 0.0 < out[1].mean_luma < 1.0
    assert out[2].height == 1 and out[2].width == 200
    # junk content without fake -> the honest NotImplementedError
    junk = spark.createDataFrame([(3, bytearray(b"notmedia"))], ["media_id", "content"])
    with pytest.raises(Exception, match="NotImplementedError|fake=True"):
        decode_media(junk).collect()


def test_resize_media_real_png(spark):
    from wq_data_pipeline_spark.operators.multimodal import (
        decode_media,
        resize_media,
    )

    png = CC.png_encode(8, 8, 1, bytes(range(0, 256, 4)))
    df = spark.createDataFrame([(1, bytearray(png))], ["media_id", "content"])
    resized = resize_media(df, height=4, width=4)
    row = resized.collect()[0]
    assert (row.height, row.width) == (4, 4)
    # the resized payload is itself a decodable PNG
    dec = decode_media(resized.select("media_id", "content")).collect()[0]
    assert (dec.height, dec.width) == (4, 4)


# --------------------------------------------------------------- properties
try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        nch=st.sampled_from([1, 3, 4]),
        data=st.data(),
    )
    def test_png_roundtrip_property(w, h, nch, data):
        """encode -> decode is the identity for any 8-bit image."""
        pix = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * nch, max_size=w * h * nch
                )
            )
        )
        out = CC.png_decode(CC.png_encode(w, h, nch, pix))
        assert out == (w, h, nch, pix)

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 10),
        h=st.integers(1, 10),
        ow=st.integers(1, 10),
        oh=st.integers(1, 10),
    )
    def test_png_resize_property(w, h, ow, oh):
        """Resize output decodes to the requested dims and every output
        pixel is an input pixel (nearest-neighbor picks, never blends)."""
        pix = bytes([(i * 37) % 256 for i in range(w * h)])
        resized, _, _ = CC.png_resize_nearest(CC.png_encode(w, h, 1, pix), ow, oh)
        w2, h2, nch, out = CC.png_decode(resized)
        assert (w2, h2, nch) == (ow, oh, 1)
        assert set(out) <= set(pix)

    @settings(max_examples=30, deadline=None)
    @given(
        samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
        rate=st.sampled_from([4000, 8000, 44100]),
    )
    def test_wav_roundtrip_property(samples, rate):
        nch, n, rate2, amp = CC.wav_decode(CC.wav_encode(samples, rate=rate))
        assert (nch, n, rate2) == (1, len(samples), rate)
        expected = sum(abs(s) for s in samples) / len(samples) / 32768.0
        assert abs(amp - expected) < 1e-9


def test_ahash_bits_matches_reference_and_roundtrip():
    """ahash_bits integer math vs an independent numpy recompute, on
    pixels that ROUND-TRIP through the PNG codec (the lossless-gray
    property the image_ahash oracle relies on)."""
    import hashlib

    import numpy as np

    from wq_data_pipeline_spark.operators.codecs import (
        ahash_bits,
        png_decode,
        png_encode,
    )

    seed = hashlib.md5(b"some document text").hexdigest()
    pixels = b"".join(
        hashlib.md5(f"{seed}:{c}".encode()).digest() for c in range(16)
    )
    w, h, nch, rt = png_decode(png_encode(16, 16, 1, pixels))
    assert (w, h, nch) == (16, 16, 1)
    assert rt == pixels  # lossless round-trip
    got = ahash_bits(16, 16, 1, rt)
    a = np.frombuffer(pixels, dtype=np.uint8).reshape(16, 16).astype(np.int64)
    means = a.reshape(8, 2, 8, 2).sum(axis=(1, 3)) // 4
    thr = int(means.sum()) // 64
    want = "".join("1" if m > thr else "0" for m in means.flatten())
    assert got == want
    assert len(got) == 64 and set(got) <= {"0", "1"}


def test_perceptual_hash_honors_content_column_name(spark):
    """Regression (r6 review): perceptual_hash(df, content='blob') must
    read the ALIASED column inside the closure — the original name no
    longer exists in the mapInPandas input frame."""
    import hashlib

    from wq_data_pipeline_spark.operators.codecs import ahash_bits, png_encode
    from wq_data_pipeline_spark.operators.multimodal import perceptual_hash

    seed = hashlib.md5(b"x").hexdigest()
    pixels = b"".join(
        hashlib.md5(f"{seed}:{c}".encode()).digest() for c in range(16)
    )
    png = png_encode(16, 16, 1, pixels)
    df = spark.createDataFrame([(7, bytearray(png))], "media_id LONG, blob BINARY")
    rows = perceptual_hash(df, content="blob").collect()
    assert len(rows) == 1
    assert rows[0].ahash == ahash_bits(16, 16, 1, pixels)
    assert (rows[0].width, rows[0].height) == (16, 16)
