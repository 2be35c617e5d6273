"""Pure-stdlib image codec tests.

Fixtures are HAND-AUTHORED from the published specs (PNG RFC 2083 chunk
layout + filters, BMP BITMAPINFOHEADER, Netpbm) — independently of the
repo's own encoder — so decode is validated against spec math, not a
round-trip through a possibly-blind writer. PNG fixtures deliberately use
filter types and color types `encode_png` never emits."""

from __future__ import annotations

import struct
import zlib

import pytest

from scripts_toolkit_spark.ext.imagecodec import (
    decode_image,
    encode_pgm,
    encode_png,
    encode_ppm,
    resize_rgb,
    sniff_format,
)

# 2x2 test image: red, green / blue, white (flat RGB8, row-major top-down)
RGB_2X2 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png(width, height, color_type, raw_scanlines, plte=b""):
    """Assemble a PNG from pre-filtered raw scanline bytes (test-local
    writer, independent of encode_png)."""
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    )
    if plte:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(raw_scanlines)) + _png_chunk(b"IEND", b"")


def test_ppm_p6_hand_authored_with_comment():
    blob = b"P6\n# a comment line\n2 2\n255\n" + RGB_2X2
    assert sniff_format(blob) == "ppm"
    assert decode_image(blob) == (2, 2, RGB_2X2)


def test_pgm_p5_gray_replicates():
    blob = b"P5\n3 1\n255\n" + bytes([0, 128, 255])
    w, h, rgb = decode_image(blob)
    assert (w, h) == (3, 1)
    assert rgb == bytes([0, 0, 0, 128, 128, 128, 255, 255, 255])


def test_bmp_hand_authored_24bit_bottom_up():
    # 2x2 24-bit BI_RGB, rows bottom-up, BGR order, rows padded to 4 bytes
    # (6 data bytes + 2 pad). Authored field-by-field per BITMAPINFOHEADER.
    row_bottom = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"  # blue, white
    row_top = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"  # red, green
    pixel_data = row_bottom + row_top  # bottom row FIRST in the file
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    )
    blob = header + pixel_data
    assert sniff_format(blob) == "bmp"
    assert decode_image(blob) == (2, 2, RGB_2X2)


def test_bmp_top_down_negative_height():
    row_top = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"
    row_bottom = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"
    pixel_data = row_top + row_bottom  # top-down: top row first
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    )
    assert decode_image(header + pixel_data) == (2, 2, RGB_2X2)


def test_png_rgb_every_filter_type():
    """One scanline per filter type 0-4, filtered by hand per RFC 2083 —
    byte patterns encode_png (filter 0 only) never produces."""
    width, bpp = 3, 3
    lines = [
        bytes([10, 20, 30, 40, 50, 60, 70, 80, 90]),
        bytes([5, 6, 7, 8, 9, 10, 11, 12, 13]),
        bytes([100, 100, 100, 100, 100, 100, 100, 100, 100]),
        bytes([1, 2, 3, 4, 5, 6, 7, 8, 9]),
        bytes([200, 201, 202, 203, 204, 205, 206, 207, 208]),
    ]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = b""
    prev = bytes(width * bpp)
    for ftype, line in enumerate(lines):
        filtered = bytearray()
        for i, x in enumerate(line):
            left = line[i - bpp] if i >= bpp else 0
            up = prev[i]
            up_left = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                f = x
            elif ftype == 1:
                f = (x - left) & 0xFF
            elif ftype == 2:
                f = (x - up) & 0xFF
            elif ftype == 3:
                f = (x - ((left + up) >> 1)) & 0xFF
            else:
                f = (x - paeth(left, up, up_left)) & 0xFF
            filtered.append(f)
        raw += bytes([ftype]) + bytes(filtered)
        prev = line

    w, h, rgb = decode_image(_png(width, 5, 2, raw))
    assert (w, h) == (3, 5)
    assert rgb == b"".join(lines)


def test_png_rgba_drops_alpha():
    raw = b"\x00" + bytes([255, 0, 0, 10, 0, 255, 0, 200])  # 2x1 RGBA
    assert decode_image(_png(2, 1, 6, raw)) == (2, 1, bytes([255, 0, 0, 0, 255, 0]))


def test_png_gray_and_palette():
    raw_gray = b"\x00" + bytes([7, 250])
    assert decode_image(_png(2, 1, 0, raw_gray)) == (
        2,
        1,
        bytes([7, 7, 7, 250, 250, 250]),
    )
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # indices 0,1,2
    raw_idx = b"\x00" + bytes([2, 0])
    assert decode_image(_png(2, 1, 3, raw_idx, plte)) == (
        2,
        1,
        bytes([0, 0, 255, 255, 0, 0]),
    )


def test_encode_png_roundtrip():
    blob = encode_png(2, 2, RGB_2X2)
    assert sniff_format(blob) == "png"
    assert decode_image(blob) == (2, 2, RGB_2X2)


def test_encode_ppm_pgm_roundtrip():
    assert decode_image(encode_ppm(2, 2, RGB_2X2)) == (2, 2, RGB_2X2)
    w, h, rgb = decode_image(encode_pgm(2, 1, bytes([9, 200])))
    assert (w, h, rgb) == (2, 1, bytes([9, 9, 9, 200, 200, 200]))


def test_resize_identity_and_downsample():
    assert resize_rgb(2, 2, RGB_2X2, 2, 2) == RGB_2X2
    # 2x2 → 1x1 nearest-neighbor keeps the top-left pixel
    assert resize_rgb(2, 2, RGB_2X2, 1, 1) == bytes([255, 0, 0])
    # upsample 1x1 → 2x2 replicates
    assert resize_rgb(1, 1, bytes([1, 2, 3]), 2, 2) == bytes([1, 2, 3] * 4)


def test_unsupported_inputs_raise():
    with pytest.raises(ValueError):
        decode_image(b"GIF89a not supported")
    with pytest.raises(ValueError):
        decode_image(b"P6\n2 2\n65535\n" + RGB_2X2)  # 16-bit maxval
    interlaced = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    )
    with pytest.raises(ValueError):
        decode_image(interlaced)
