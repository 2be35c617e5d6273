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


# ----------------------------------------------------------- IMA ADPCM ----
# REAL compressed (lossy) audio: IMA/DVI ADPCM (WAVE format tag 0x11),
# 4 bits per sample. Everything below is specification-level public
# knowledge: the IMA step/index tables and the nibble quantize/reconstruct
# recurrence (IMA "Recommended Practices for Enhancing Digital Audio
# Compatibility", 1992; the same tables every open implementation ships).
# The encode->decode composition is a pure integer recurrence over
# (predictor, step_index) state, which is exactly what makes it
# oracle-replayable in SQL (see ADPCM_ROUNDTRIP_STATS_SQL in
# plans/media_demos.py: a recursive CTE steps the same recurrence).
# mp3/aac/opus remain honestly stubbed (ext/multimodal.decode_media_stub).

IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
# indexed by the 3 magnitude bits of the nibble (sign bit is symmetric)
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]

ADPCM_FORMAT_TAG = 0x11


def _adpcm_step(sample: int, pred: int, idx: int) -> tuple[int, int, int]:
    """One encode+reconstruct step: (raw sample, state) -> (nibble,
    reconstructed sample == new predictor, new step index). The
    reconstruction arithmetic is the decoder's, run inside the encoder so
    both sides track identical state (the standard IMA discipline)."""
    step = IMA_STEP_TABLE[idx]
    diff = sample - pred
    sign = 8 if diff < 0 else 0
    if sign:
        diff = -diff
    delta = 0
    if diff >= step:
        delta = 4
        diff -= step
    if diff >= step >> 1:
        delta |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        delta |= 1
    vpdiff = step >> 3
    if delta & 4:
        vpdiff += step
    if delta & 2:
        vpdiff += step >> 1
    if delta & 1:
        vpdiff += step >> 2
    pred = pred - vpdiff if sign else pred + vpdiff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + IMA_INDEX_TABLE[delta]))
    return delta | sign, pred, idx


def _adpcm_decode_nibble(nibble: int, pred: int, idx: int) -> tuple[int, int]:
    """Decoder-side reconstruction of one nibble (the same arithmetic
    _adpcm_step embeds — kept as separate code so encoder and decoder are
    independently written, not one calling the other)."""
    step = IMA_STEP_TABLE[idx]
    vpdiff = step >> 3
    if nibble & 4:
        vpdiff += step
    if nibble & 2:
        vpdiff += step >> 1
    if nibble & 1:
        vpdiff += step >> 2
    pred = pred - vpdiff if nibble & 8 else pred + vpdiff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + IMA_INDEX_TABLE[nibble & 7]))
    return pred, idx


def encode_adpcm_wav(
    samples: list[int], sample_rate: int = 8000, samples_per_block: int = 505
) -> bytes:
    """Mono IMA-ADPCM WAV writer (format tag 0x11). Each block: a 4-byte
    header (int16 predictor = the block's first raw sample, uint8 running
    step index, reserved) + low-nibble-first packed 4-bit codes for the
    remaining samples. The first block starts at step index 0
    (deterministic — no encoder-specific initial-index search), later
    blocks carry the running index in their header so every block is
    independently decodable. A 'fact' chunk records the true sample count
    (required for compressed WAVs; also how the decoder drops pad
    nibbles)."""
    if samples_per_block < 2:
        raise ValueError("samples_per_block must be >= 2")
    blocks = []
    idx = 0
    for start in range(0, len(samples), samples_per_block):
        chunk = samples[start : start + samples_per_block]
        pred = max(-32768, min(32767, int(chunk[0])))
        header = struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in chunk[1:]:
            nib, pred, idx = _adpcm_step(int(s), pred, idx)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)  # pad nibble (fact chunk tells decode to stop)
        body = bytes(
            nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
        )
        blocks.append(header + body)
    block_align = 4 + (samples_per_block - 1 + 1) // 2
    byte_rate = (sample_rate * block_align + samples_per_block - 1) // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH",
        ADPCM_FORMAT_TAG, 1, sample_rate, byte_rate, block_align, 4,
        2, samples_per_block,  # cbSize, wSamplesPerBlock
    )
    fact = struct.pack("<I", len(samples))
    body = b"".join(blocks)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"fact" + struct.pack("<I", len(fact)) + fact
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_adpcm_wav(blob: bytes) -> tuple[int, int, list[int]]:
    """IMA-ADPCM WAV bytes → (sample_rate, samples_per_block, int16
    samples). Manual RIFF walk (the stdlib `wave` reader only does PCM):
    reads fmt/fact/data chunks in any order, then decodes block by block —
    header predictor is sample 0 of the block, nibbles low-first for the
    rest, stopping at the fact-chunk sample count."""
    blob = bytes(blob)
    if not sniff_wav(blob):
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", blob[4:8])[0]
    fmt = fact_count = data = None
    while pos + 8 <= min(end, len(blob)):
        fourcc = blob[pos : pos + 4]
        (length,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        payload = blob[pos + 8 : pos + 8 + length]
        if fourcc == b"fmt ":
            fmt = payload
        elif fourcc == b"fact":
            (fact_count,) = struct.unpack("<I", payload[:4])
        elif fourcc == b"data":
            data = payload
        pos += 8 + length + (length % 2)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, n_ch, rate, _, block_align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != ADPCM_FORMAT_TAG or n_ch != 1 or bits != 4:
        raise ValueError(
            f"unsupported WAV (tag=0x{tag:x} ch={n_ch} bits={bits}): "
            "mono IMA-ADPCM only"
        )
    (spb,) = struct.unpack("<H", fmt[18:20])
    out: list[int] = []
    for bstart in range(0, len(data), block_align):
        block = data[bstart : bstart + block_align]
        if len(block) < 4:
            break
        pred, idx, _ = struct.unpack("<hBB", block[:4])
        out.append(pred)
        emitted = 1
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                if emitted >= spb:
                    break  # per-block pad nibble (even spb): not a sample
                pred, idx = _adpcm_decode_nibble(nib, pred, idx)
                out.append(pred)
                emitted += 1
    if fact_count is not None:
        out = out[:fact_count]
    return rate, spb, out
