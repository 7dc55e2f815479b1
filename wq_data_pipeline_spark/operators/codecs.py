"""Pure-stdlib media codecs for the multimodal operators: PNG
(zlib inflate + per-scanline unfilter) and WAV (stdlib ``wave``).

This container has no pillow/soundfile, but PNG and WAV are simple
enough to decode with the standard library alone — so
``decode_media``/``resize_media`` have a REAL code path for these
formats, and the deterministic-fake path remains only for formats
that genuinely need external codecs (JPEG, MP3, video).

Executor-side code: these functions run inside mapInPandas batches on
small media payloads. PNG support: 8-bit depth, non-interlaced,
grayscale / RGB / RGBA (color types 0, 2, 6), all five filter types.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CTYPE_CH = {0: 1, 2: 3, 6: 4}
_CH_CTYPE = {1: 0, 3: 2, 4: 6}


def sniff(data: bytes) -> str | None:
    """Magic-byte format sniff — decode dispatch is content-driven so
    it works even when the mime column is absent or wrong."""
    if data[:8] == PNG_SIG:
        return "png"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


# --------------------------------------------------------------------- PNG
def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG -> (width, height, channels, raw interleaved 8-bit pixels)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    w = h = ctype = None
    while pos + 8 <= len(data):
        (ln,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # payload + CRC
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or interlace != 0 or ctype not in _CTYPE_CH:
                raise NotImplementedError(
                    f"PNG depth={depth} ctype={ctype} interlace={interlace} "
                    "outside the stdlib codec's support (8-bit gray/RGB/RGBA)"
                )
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    nch = _CTYPE_CH[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _ in range(h):
        f = raw[p]
        p += 1
        line = bytearray(raw[p : p + stride])
        p += stride
        if f == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out += line
        prev = line
    return w, h, nch, bytes(out)


def png_encode(w: int, h: int, nch: int, pixels: bytes) -> bytes:
    """Raw interleaved 8-bit pixels -> PNG (filter 0 scanlines)."""
    if nch not in _CH_CTYPE:
        raise ValueError(f"channels={nch} unsupported")
    stride = w * nch
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(h)
    )

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CH_CTYPE[nch], 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def png_resize_nearest(
    data: bytes, out_w: int, out_h: int
) -> tuple[bytes, int, int]:
    """Nearest-neighbor PNG resize: decode -> index-map -> re-encode."""
    w, h, nch, pix = png_decode(data)
    out = bytearray(out_w * out_h * nch)
    for y in range(out_h):
        sy = min(h - 1, y * h // out_h)
        row = sy * w * nch
        orow = y * out_w * nch
        for x in range(out_w):
            sx = min(w - 1, x * w // out_w)
            out[orow + x * nch : orow + (x + 1) * nch] = pix[
                row + sx * nch : row + (sx + 1) * nch
            ]
    return png_encode(out_w, out_h, nch, bytes(out)), out_w, out_h


def mean_luma(nch: int, pixels: bytes) -> float:
    """Mean luminance in [0, 1]: Rec.601 for color, plain mean for
    gray; alpha ignored."""
    n = len(pixels) // nch
    if n == 0:
        return 0.0
    if nch == 1:
        return sum(pixels) / n / 255.0
    total = 0.0
    for i in range(0, len(pixels), nch):
        total += 0.299 * pixels[i] + 0.587 * pixels[i + 1] + 0.114 * pixels[i + 2]
    return total / n / 255.0


# --------------------------------------------------------------------- WAV
def wav_decode(data: bytes) -> tuple[int, int, int, float]:
    """WAV -> (n_channels, n_frames, sample_rate, mean |amplitude| in
    [0, 1]); 8/16/32-bit integer PCM."""
    with wave.open(io.BytesIO(data), "rb") as f:
        nch, sw, rate, n = (
            f.getnchannels(),
            f.getsampwidth(),
            f.getframerate(),
            f.getnframes(),
        )
        frames = f.readframes(n)
    if sw == 1:  # unsigned 8-bit
        vals = [abs(b - 128) / 128.0 for b in frames]
    elif sw == 2:
        vals = [
            abs(v) / 32768.0 for (v,) in struct.iter_unpack("<h", frames)
        ]
    elif sw == 4:
        vals = [
            abs(v) / 2147483648.0 for (v,) in struct.iter_unpack("<i", frames)
        ]
    else:
        raise NotImplementedError(f"WAV sample width {sw}")
    mean_amp = sum(vals) / len(vals) if vals else 0.0
    return nch, n, rate, mean_amp


def wav_encode(samples: list[int], rate: int = 8000, nch: int = 1) -> bytes:
    """16-bit PCM samples -> WAV bytes (test-fixture builder)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(nch)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


# ------------------------------------------------------------- ahash
def ahash_bits(w: int, h: int, nch: int, pixels: bytes) -> str:
    """Average hash (aHash) over decoded 8-bit GRAY pixels — the
    classic perceptual image fingerprint (block-mean the image to
    8×8, threshold each block against the global mean). ALL-INTEGER
    arithmetic (floor-div block means, floor-div threshold) so the 64
    bits are engine-portable: an oracle can replay them from the raw
    pixel bytes without any float tolerance. Returns a 64-char
    '0'/'1' string, bit index = block_row*8 + block_col ascending
    (a string, not an int, because bit 63 would overflow signed
    BIGINT). Requires w%8 == h%8 == 0 and nch == 1; color callers
    pre-convert to luma."""
    if nch != 1:
        raise NotImplementedError("ahash_bits expects gray pixels (nch=1)")
    if w % 8 or h % 8:
        raise NotImplementedError("ahash_bits expects dimensions divisible by 8")
    bw, bh = w // 8, h // 8
    means = []
    for by in range(8):
        for bx in range(8):
            s = 0
            for y in range(by * bh, (by + 1) * bh):
                row = y * w
                s += sum(pixels[row + bx * bw : row + (bx + 1) * bw])
            means.append(s // (bw * bh))
    thr = sum(means) // 64
    return "".join("1" if m > thr else "0" for m in means)
