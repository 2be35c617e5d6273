"""AVI video codec tests. Encoder lays out the RIFF tree top-down with
struct at spec offsets; decoder walks chunks generically (no fixed
offsets) — independent traversals, so round-trips cross-check the
container layout. DIB row order (bottom-up) and byte order (BGR) are
pinned directly against hand-built frame bodies, not just via round-trip,
so an encoder/decoder flip-bug pair cannot cancel."""

from __future__ import annotations

import struct

import pytest

from scripts_toolkit_spark.ext.videocodec import (
    _dib_row_size,
    _dib_to_rgb,
    _rgb_to_dib,
    decode_avi,
    encode_avi,
    frame_gray,
    sample_video_frames,
    sniff_avi,
)


def _ramp_frame(w: int, h: int, seed: int = 0) -> bytes:
    return bytes((seed * 37 + i * 11) % 256 for i in range(w * h * 3))


def test_roundtrip_exact_multi_frame():
    frames = [_ramp_frame(6, 4, s) for s in range(5)]
    blob = encode_avi(6, 4, frames, fps=12)
    assert sniff_avi(blob)
    w, h, fps, dec = decode_avi(blob)
    assert (w, h, fps) == (6, 4, 12)
    assert dec == frames


@pytest.mark.parametrize("w,h", [(4, 4), (5, 3), (3, 1), (1, 2), (7, 2)])
def test_roundtrip_row_padding_widths(w, h):
    # width*3 % 4 varies: exercises the DIB 4-byte row-padding arithmetic
    frames = [_ramp_frame(w, h, 1), _ramp_frame(w, h, 2)]
    _, _, _, dec = decode_avi(encode_avi(w, h, frames, fps=5))
    assert dec == frames


def test_dib_layout_is_bottom_up_bgr():
    # 2x2 image: pixel (y=0,x=0) red, (y=1,x=1) blue — the DIB body must
    # put the BOTTOM row first and swap to BGR (spec facts, pinned
    # against hand-built bytes so codec-internal flips cannot cancel).
    rgb = bytes([255, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 255])
    body = _rgb_to_dib(2, 2, rgb)
    row = _dib_row_size(2)  # 6 bytes data + 2 pad
    assert row == 8
    assert body[0:6] == bytes([0, 0, 0, 255, 0, 0])  # bottom row: black, blue(BGR)
    assert body[row : row + 6] == bytes([0, 0, 255, 0, 0, 0])  # top: red(BGR), black
    assert _dib_to_rgb(2, 2, body) == rgb


def test_decoder_walks_junk_chunks_and_any_order():
    frames = [_ramp_frame(4, 2, 3)]
    blob = encode_avi(4, 2, frames, fps=10)
    junk = b"JUNK" + struct.pack("<I", 7) + b"0123456" + b"\x00"  # odd → pad
    patched = blob[:12] + junk + blob[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    w, h, fps, dec = decode_avi(patched)
    assert (w, h, fps) == (4, 2, 10)
    assert dec == frames


def test_compressed_stream_raises():
    blob = bytearray(encode_avi(2, 2, [_ramp_frame(2, 2)], fps=5))
    i = blob.find(b"strf")
    # biCompression sits 16 bytes into the BITMAPINFOHEADER (after the
    # 8-byte chunk header): flip BI_RGB → BI_RLE8
    struct.pack_into("<I", blob, i + 8 + 16, 1)
    with pytest.raises(ValueError, match="BI_RGB"):
        decode_avi(bytes(blob))


def test_not_avi_raises():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_frame_length_validation():
    with pytest.raises(ValueError, match="width\\*height\\*3"):
        encode_avi(2, 2, [b"\x00" * 5])
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi(2, 2, [])


def test_sample_video_frames_stride():
    frames = [bytes([i] * 12) for i in range(7)]
    kept = sample_video_frames(frames, stride=3)
    assert [i for i, _ in kept] == [0, 3, 6]
    assert all(f == frames[i] for i, f in kept)
    assert sample_video_frames(frames, stride=1) == list(enumerate(frames))
    with pytest.raises(ValueError):
        sample_video_frames(frames, stride=0)


def test_frame_gray_picks_r_channel():
    frame = bytes([10, 0, 0, 20, 0, 0, 30, 0, 0, 40, 0, 0])
    assert frame_gray(frame) == bytes([10, 20, 30, 40])
