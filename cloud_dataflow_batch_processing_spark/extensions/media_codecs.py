"""Self-contained pure-Python media codecs: BMP (24-bit BI_RGB), PPM
(binary P6), and WAV (RIFF PCM16) — encode and decode, no media
libraries required.

These make the multimodal pipeline's decode step REAL (VERDICT r2 #6):
``extensions/multimodal.py`` dispatches on magic bytes and extracts
genuine dimensions / duration / channel statistics from the binary
column, with the deterministic hash-fake kept only for formats the
container can't decode (video). Written from the public format
specifications — Windows BITMAPINFOHEADER layout, the Netpbm P6
grammar, and the RIFF/WAVE chunk structure — the same self-contained
approach as ``sources/avro_codec.py`` and ``sources/tfrecord.py``.

All encoders are deterministic byte-for-byte, so test fixtures and
oracle queries can reproduce expected features in closed form.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# BMP — uncompressed 24-bit, BITMAPINFOHEADER, bottom-up rows
# ---------------------------------------------------------------------------

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res, res, data offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # 40-byte BITMAPINFOHEADER


def _bmp_row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit BI_RGB BMP from row-major top-down RGB triples."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    stride = _bmp_row_stride(width)
    pad = b"\x00" * (stride - width * 3)
    # BMP stores rows bottom-up and pixels as BGR.
    rows = []
    for y in range(height - 1, -1, -1):
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        bgr = bytearray()
        for x in range(width):
            r, g, b = row[x * 3 : x * 3 + 3]
            bgr += bytes((b, g, r))
        rows.append(bytes(bgr) + pad)
    pixel_data = b"".join(rows)
    data_offset = _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size
    info = _BMP_INFO_HEADER.pack(
        _BMP_INFO_HEADER.size, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    head = _BMP_FILE_HEADER.pack(b"BM", data_offset + len(pixel_data), 0, 0, data_offset)
    return head + info + pixel_data


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """-> (width, height, top-down row-major RGB bytes). Supports the
    uncompressed 24-bit BITMAPINFOHEADER layout ``encode_bmp`` writes
    (and any conforming producer); rejects other variants loudly."""
    if len(data) < _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size:
        raise ValueError("truncated BMP header")
    magic, _size, _r1, _r2, offset = _BMP_FILE_HEADER.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    (hsize, width, height, _planes, bpp, compression, *_rest) = _BMP_INFO_HEADER.unpack_from(
        data, _BMP_FILE_HEADER.size
    )
    if hsize < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (header={hsize}, bpp={bpp}, comp={compression})")
    bottom_up = height > 0
    height = abs(height)
    stride = _bmp_row_stride(width)
    if len(data) < offset + stride * height:
        raise ValueError("truncated BMP pixel data")
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = data[offset + src_y * stride : offset + src_y * stride + width * 3]
        for x in range(width):
            b, g, r = row[x * 3 : x * 3 + 3]
            i = (y * width + x) * 3
            out[i : i + 3] = bytes((r, g, b))
    return width, height, bytes(out)


# ---------------------------------------------------------------------------
# PPM — binary P6, maxval 255
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6) from row-major top-down RGB triples."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + rgb


def decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    """-> (width, height, RGB bytes). Full P6 grammar: arbitrary
    whitespace between tokens and ``#`` comments through end-of-line."""
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (missing 'P6' magic)")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        if pos >= len(data):
            raise ValueError("truncated PPM header")
        c = data[pos : pos + 1]
        if c == b"#":  # comment to end of line
            nl = data.find(b"\n", pos)
            pos = len(data) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            end = pos
            while end < len(data) and data[end : end + 1].isdigit():
                end += 1
            tokens.append(int(data[pos:end]))
            pos = end
        else:
            raise ValueError(f"bad PPM header byte {c!r}")
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pos += 1  # exactly one whitespace byte separates header from raster
    need = width * height * 3
    raster = data[pos : pos + need]
    if len(raster) != need:
        raise ValueError("truncated PPM raster")
    return width, height, raster


# ---------------------------------------------------------------------------
# PNG — 8-bit depth, color types 0 (gray) / 2 (RGB) / 6 (RGBA), all five
# scanline filters, zlib DEFLATE (stdlib), CRC-checked chunks. Written
# from the public PNG specification (RFC 2083 / W3C PNG); no interlace.
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply filter ``ftype`` to a raw scanline (encoder side)."""
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return bytes(out)


def _png_unfilter_row(ftype: int, filt: bytes, prev: bytes, bpp: int) -> bytes:
    """Reconstruct a raw scanline from a filtered one (decoder side)."""
    out = bytearray(len(filt))
    for i, x in enumerate(filt):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x + a) & 0xFF
        elif ftype == 2:
            out[i] = (x + b) & 0xFF
        elif ftype == 3:
            out[i] = (x + (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter type {ftype}")
    return bytes(out)


def encode_png(width: int, height: int, rgb: bytes, filter_type: int = 0) -> bytes:
    """8-bit truecolor (type 2) PNG from top-down row-major RGB triples.
    ``filter_type`` applies the same filter to every scanline (0–4) —
    parameterized so tests can exercise every decoder filter path."""
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width * 3)
    for y in range(height):
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        raw.append(filter_type)
        raw += _png_filter_row(filter_type, row, prev, 3)
        prev = row
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """-> (width, height, top-down row-major RGB bytes). Supports 8-bit
    gray (type 0, replicated to RGB), RGB (2), and RGBA (6, alpha
    dropped); all five filter types; multiple IDAT chunks; CRC-verified.
    Rejects interlaced / paletted / 16-bit variants loudly."""
    import zlib

    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG (missing signature)")
    pos, ihdr, idat = len(PNG_MAGIC), None, bytearray()
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen or pos + 12 + clen > len(data):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + clen)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width, height, depth, ctype_i, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, interlace={interlace})"
        )
    bpp = {0: 1, 2: 3, 6: 4}.get(ctype_i)
    if bpp is None:
        raise ValueError(f"unsupported PNG color type {ctype_i}")
    raw = zlib.decompress(bytes(idat))
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(width * height * 3)
    prev = bytes(stride)
    for y in range(height):
        off = y * (stride + 1)
        row = _png_unfilter_row(raw[off], raw[off + 1 : off + 1 + stride], prev, bpp)
        prev = row
        for x in range(width):
            i = (y * width + x) * 3
            if ctype_i == 0:
                out[i] = out[i + 1] = out[i + 2] = row[x]
            else:
                out[i : i + 3] = row[x * bpp : x * bpp + 3]
    return width, height, bytes(out)


# ---------------------------------------------------------------------------
# WAV — RIFF/WAVE, PCM (format 1), 16-bit signed little-endian
# ---------------------------------------------------------------------------


@dataclass
class WavData:
    sample_rate: int
    channels: int
    samples: list[int]  # interleaved 16-bit signed

    @property
    def n_frames(self) -> int:
        return len(self.samples) // self.channels

    @property
    def duration_ms(self) -> int:
        return self.n_frames * 1000 // self.sample_rate


def encode_wav(samples: list[int], sample_rate: int, channels: int = 1) -> bytes:
    """RIFF/WAVE PCM16 from interleaved signed 16-bit samples."""
    if len(samples) % channels:
        raise ValueError("sample count must be a multiple of channels")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> WavData:
    """Chunk-walking RIFF parser: finds ``fmt `` and ``data`` wherever
    they sit (tolerates extra chunks like LIST/INFO); PCM16 only."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + clen + (clen & 1)  # chunks pad to even offsets
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    n = len(raw) // 2
    samples = list(struct.unpack(f"<{n}h", raw[: n * 2]))
    return WavData(sample_rate=sample_rate, channels=channels, samples=samples)


IMAGE_FORMATS = ("bmp", "ppm", "png")


def decode_image(fmt: str, content: bytes) -> tuple[int, int, bytes]:
    """Uniform image decode dispatch -> (width, height, RGB bytes)."""
    if fmt == "bmp":
        return decode_bmp(content)
    if fmt == "ppm":
        return decode_ppm(content)
    if fmt == "png":
        return decode_png(content)
    raise ValueError(f"no image decoder for format {fmt!r}")


# ---------------------------------------------------------------------------
# Feature extraction over decoded media (exact integer features so the
# driver oracle can reproduce them analytically)
# ---------------------------------------------------------------------------


def image_features(width: int, height: int, rgb: bytes) -> dict:
    n = width * height
    return {
        "width": width,
        "height": height,
        "n_pixels": n,
        "sum_r": sum(rgb[0::3]),
        "sum_g": sum(rgb[1::3]),
        "sum_b": sum(rgb[2::3]),
    }


def audio_features(wav: WavData) -> dict:
    return {
        "sample_rate": wav.sample_rate,
        "channels": wav.channels,
        "n_frames": wav.n_frames,
        "duration_ms": wav.duration_ms,
        "sum_samples": sum(wav.samples),
        "max_abs": max((abs(s) for s in wav.samples), default=0),
    }


def resize_nearest(width: int, height: int, rgb: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample of an interleaved RGB buffer — the
    deterministic, spec-level resize matching the decoders above (no
    interpolation ambiguity across platforms: pure integer source
    indices floor(i * src / dst))."""
    import numpy as np

    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    ys = (np.arange(new_h) * height) // new_h
    xs = (np.arange(new_w) * width) // new_w
    return arr[ys][:, xs].tobytes()


def resample_wav_nearest(wav: WavData, new_rate: int) -> WavData:
    """Nearest-frame resample of PCM16 audio — the audio analog of
    resize_nearest: output frame j reads input frame
    floor(j * src_rate / new_rate), all channels together. Integer
    index math only, so byte-deterministic everywhere."""
    import numpy as np

    if new_rate <= 0:
        raise ValueError(f"new_rate must be positive, got {new_rate}")
    arr = np.asarray(wav.samples, dtype=np.int16).reshape(-1, wav.channels)
    n_out = (wav.n_frames * new_rate) // wav.sample_rate
    idx = (np.arange(n_out, dtype=np.int64) * wav.sample_rate) // new_rate
    out = arr[idx] if n_out else arr[:0]
    return WavData(
        sample_rate=new_rate, channels=wav.channels, samples=[int(x) for x in out.ravel()]
    )
