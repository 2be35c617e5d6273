"""Pure-Python stdlib image codec: PNG (zlib), BMP, PPM/PGM.

Backs the multimodal operators (`ext/multimodal.py`) when PIL is absent —
the same fallback discipline as the XPORT (`io/xport.py`, TS-140) and PDF
(`io/pdftext.py`) decoders: binary columns decode end-to-end in this
container, and a real imaging library can replace the backend without
touching any Spark-side dataflow (reference pattern: the format converters
in converter.py:96-127 / APP:16-38 normalize opaque payloads to typed
frames before analysis).

Everything here is specification-level public knowledge: PNG (RFC 2083 —
chunk layout, scanline filters None/Sub/Up/Average/Paeth), BMP
(BITMAPFILEHEADER + BITMAPINFOHEADER, 24/32-bit BI_RGB, 4-byte row
padding, bottom-up rows), and Netpbm P5/P6.

Decoded images are (width, height, rgb) with `rgb` a flat bytes object of
w*h RGB8 triples, row-major top-down.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_format(blob: bytes) -> str | None:
    """Identify a supported image container by magic bytes."""
    if blob.startswith(PNG_MAGIC):
        return "png"
    if blob.startswith(b"BM") and len(blob) >= 54:
        return "bmp"
    if blob[:2] in (b"P5", b"P6") and (len(blob) > 2 and blob[2:3].isspace()):
        return "ppm"
    return None


# ------------------------------------------------------------------- PNG --
def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Undo per-scanline PNG filtering (filter byte + w*bpp bytes per row)."""
    stride = width * bpp
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up_left = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        out += line
        prev = line
    return out


def _decode_png(blob: bytes) -> tuple[int, int, bytes]:
    if not blob.startswith(PNG_MAGIC):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_MAGIC)
    ihdr = None
    idat = bytearray()
    plte = b""
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} comp={comp} filter={filt} "
            f"interlace={interlace}): only 8-bit non-interlaced supported"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(bytes(idat))
    px = _unfilter(raw, width, height, channels)
    rgb = bytearray(width * height * 3)
    if color == 2:  # RGB passthrough
        rgb[:] = px
    elif color == 6:  # RGBA → drop alpha
        for i in range(width * height):
            rgb[3 * i : 3 * i + 3] = px[4 * i : 4 * i + 3]
    elif color == 0:  # gray → replicate
        for i in range(width * height):
            rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = px[i]
    elif color == 4:  # gray+alpha → replicate, drop alpha
        for i in range(width * height):
            g = px[2 * i]
            rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = g
    else:  # palette
        for i in range(width * height):
            j = 3 * px[i]
            rgb[3 * i : 3 * i + 3] = plte[j : j + 3]
    return width, height, bytes(rgb)


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal RGB8 PNG writer (filter 0 scanlines, one IDAT)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------- BMP --
def _decode_bmp(blob: bytes) -> tuple[int, int, bytes]:
    if not blob.startswith(b"BM"):
        raise ValueError("not a BMP")
    (data_offset,) = struct.unpack("<I", blob[10:14])
    (hdr_size,) = struct.unpack("<I", blob[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack("<ii", blob[18:26])
    (bpp,) = struct.unpack("<H", blob[28:30])
    (compression,) = struct.unpack("<I", blob[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp} compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    nbytes = bpp // 8
    row_size = (width * nbytes + 3) & ~3  # rows pad to 4-byte boundaries
    rgb = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = blob[data_offset + src_y * row_size :][: width * nbytes]
        for x in range(width):
            b, g, r = row[x * nbytes], row[x * nbytes + 1], row[x * nbytes + 2]
            i = 3 * (y * width + x)
            rgb[i], rgb[i + 1], rgb[i + 2] = r, g, b
    return width, height, bytes(rgb)


# ------------------------------------------------------------- PPM / PGM --
def _decode_ppm(blob: bytes) -> tuple[int, int, bytes]:
    magic = blob[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM")
    # header tokens: magic, width, height, maxval — '#' comments allowed
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        tokens.append(blob[start:pos])
    pos += 1  # single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    if magic == b"P6":
        body = blob[pos : pos + width * height * 3]
        return width, height, bytes(body)
    gray = blob[pos : pos + width * height]
    rgb = bytearray(width * height * 3)
    for i, g in enumerate(gray):
        rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = g
    return width, height, bytes(rgb)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary P6 writer."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def encode_pgm(width: int, height: int, gray: bytes) -> bytes:
    """Binary P5 (grayscale) writer."""
    if len(gray) != width * height:
        raise ValueError("gray length must be width*height")
    return b"P5\n%d %d\n255\n" % (width, height) + gray


# ------------------------------------------------------------ operations --
def decode_image(blob: bytes) -> tuple[int, int, bytes]:
    """Decode any supported container to (width, height, flat RGB8)."""
    fmt = sniff_format(bytes(blob))
    if fmt == "png":
        return _decode_png(blob)
    if fmt == "bmp":
        return _decode_bmp(blob)
    if fmt == "ppm":
        return _decode_ppm(blob)
    raise ValueError("unrecognized image format (supported: PNG, BMP, PPM/PGM)")


def resize_rgb(
    width: int, height: int, rgb: bytes, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample of a flat RGB8 buffer (deterministic:
    integer source indices floor(out_idx * in_dim / out_dim))."""
    out = bytearray(out_w * out_h * 3)
    for y in range(out_h):
        sy = y * height // out_h
        for x in range(out_w):
            sx = x * width // out_w
            si = 3 * (sy * width + sx)
            di = 3 * (y * out_w + x)
            out[di : di + 3] = rgb[si : si + 3]
    return bytes(out)
