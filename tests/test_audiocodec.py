"""WAV codec tests. Encoder assembles RIFF chunks with struct; decoder
goes through the stdlib `wave` module — independent implementations, so
these round-trips cross-check the header layout. The reverse direction
(wave-module-WRITTEN file → decode_wav) covers a third-party producer."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from scripts_toolkit_spark.ext.audiocodec import (
    decode_wav,
    encode_wav,
    resample_nearest,
    sniff_wav,
)

SAMPLES = [0, 1000, -1000, 32767, -32768, 7, -7, 0]


def test_roundtrip_mono():
    blob = encode_wav(SAMPLES, sample_rate=8000)
    assert sniff_wav(blob)
    ch, rate, got = decode_wav(blob)
    assert (ch, rate) == (1, 8000)
    assert got == SAMPLES


def test_roundtrip_stereo_interleaved():
    ch, rate, got = decode_wav(encode_wav(SAMPLES, sample_rate=44100, n_channels=2))
    assert (ch, rate) == (2, 44100)
    assert got == SAMPLES


def test_decode_wave_module_written_file():
    """A file produced by the stdlib wave WRITER (not our encoder) must
    decode identically — the third-party-producer direction."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack("<%dh" % len(SAMPLES), *SAMPLES))
    ch, rate, got = decode_wav(buf.getvalue())
    assert (ch, rate, got) == (1, 16000, SAMPLES)


def test_non_pcm16_and_non_wav_raise():
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit: outside the PCM16 subset
        w.setframerate(8000)
        w.writeframes(bytes([128, 127, 129]))
    with pytest.raises(ValueError, match="sample width"):
        decode_wav(buf.getvalue())


def test_resample_nearest():
    assert resample_nearest(SAMPLES, 8000, 8000) == SAMPLES
    half = resample_nearest(SAMPLES, 8000, 4000)
    assert half == SAMPLES[::2]
    up = resample_nearest([1, 2], 4000, 8000)
    assert up == [1, 1, 2, 2]
