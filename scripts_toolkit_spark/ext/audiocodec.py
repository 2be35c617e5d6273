"""Pure-stdlib WAV (RIFF PCM) audio codec.

The audio analog of ext/imagecodec.py: real decode for the one audio
container the standard library fully covers, so binary audio columns get
actual sample data end-to-end in this container — ffmpeg remains the
production backend for compressed formats (mp3/aac/opus), which stay
honestly stubbed in ext/multimodal.decode_media_stub.

Deliberate asymmetry for writer-independence: `encode_wav` assembles the
RIFF/fmt/data chunks by hand with `struct` (spec-level layout), while
`decode_wav` goes through the stdlib `wave` module — two independent
implementations, so a round-trip actually cross-checks the header layout
instead of reflecting one implementation's blind spots.
"""

from __future__ import annotations

import io
import struct
import wave

WAV_MAGIC_RIFF = b"RIFF"
WAV_MAGIC_WAVE = b"WAVE"


def sniff_wav(blob: bytes) -> bool:
    return blob[:4] == WAV_MAGIC_RIFF and blob[8:12] == WAV_MAGIC_WAVE


def encode_wav(
    samples: list[int], sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """16-bit little-endian PCM WAV, chunks assembled per the RIFF spec
    (not via the `wave` module — see module docstring). `samples` are
    interleaved int16 values in [-32768, 32767]."""
    body = struct.pack("<%dh" % len(samples), *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(blob: bytes) -> tuple[int, int, list[int]]:
    """WAV bytes → (n_channels, sample_rate, interleaved int16 samples),
    decoded with the stdlib `wave` reader. Only 16-bit PCM is in scope
    (matching the encoder); other widths raise ValueError."""
    if not sniff_wav(bytes(blob)):
        raise ValueError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"unsupported sample width {w.getsampwidth()} (PCM16 only)")
        n_channels = w.getnchannels()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    samples = list(struct.unpack("<%dh" % (len(raw) // 2), raw))
    return n_channels, rate, samples


def resample_nearest(samples: list[int], in_rate: int, out_rate: int) -> list[int]:
    """Deterministic nearest-neighbor resample of a mono sample sequence
    (integer source indices floor(i * in_rate / out_rate)) — the stand-in
    for a real polyphase resampler, same discipline as imagecodec's
    nearest-neighbor resize."""
    if in_rate == out_rate:
        return list(samples)
    n_out = max(1, len(samples) * out_rate // in_rate)
    return [samples[min(i * in_rate // out_rate, len(samples) - 1)] for i in range(n_out)]
