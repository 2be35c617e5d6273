"""IMA-ADPCM codec tests (the lossy compressed-audio leg of §2.12).

The encoder embeds the decoder's reconstruction arithmetic to track state
(the standard IMA discipline), but `_adpcm_decode_nibble` is separately
written code — these tests pin (a) encoder/decoder state agreement, (b)
spec-table facts against hand-computed steps so a shared arithmetic bug
cannot cancel, (c) a round-trip SNR floor on a smooth signal (the codec
must actually TRACK the waveform, not merely be self-consistent), and
(d) container facts (fact-chunk truncation, multi-block independence)."""

from __future__ import annotations

import math
import struct

import pytest

from scripts_toolkit_spark.ext.audiocodec import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    _adpcm_decode_nibble,
    _adpcm_step,
    decode_adpcm_wav,
    encode_adpcm_wav,
    sniff_wav,
)


def test_step_tables_are_the_public_ima_tables():
    assert len(IMA_STEP_TABLE) == 89
    assert IMA_STEP_TABLE[0] == 7 and IMA_STEP_TABLE[88] == 32767
    assert IMA_INDEX_TABLE == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_single_step_hand_computed():
    # pred=0, idx=0 → step=7. sample=100: diff=100 ≥ 7,3,1 → delta=7,
    # vpdiff = 7>>3 + 7 + 3 + 1 = 11, pred=11, idx += 8 → 8.
    nib, pred, idx = _adpcm_step(100, 0, 0)
    assert (nib, pred, idx) == (7, 11, 8)
    # negative: sample=-100 mirrors with the sign bit set
    nib, pred, idx = _adpcm_step(-100, 0, 0)
    assert (nib, pred, idx) == (15, -11, 8)
    # decoder replays the same reconstruction from the nibble alone
    assert _adpcm_decode_nibble(7, 0, 0) == (11, 8)
    assert _adpcm_decode_nibble(15, 0, 0) == (-11, 8)


def test_predictor_clamps_at_int16_bounds():
    nib, pred, idx = _adpcm_step(32767, 32700, 88)  # step 32767: must clamp
    assert pred <= 32767
    p2, _ = _adpcm_decode_nibble(8 | 4, -32700, 88)  # big negative move
    assert p2 == -32768


def test_index_clamps_to_table_range():
    _, _, idx_lo = _adpcm_step(0, 0, 0)  # small diff → index would go -1
    assert idx_lo == 0
    _, _, idx_hi = _adpcm_step(32767, -32768, 88)
    assert idx_hi == 88


def test_roundtrip_snr_floor_smooth_signal():
    # 20 Hz sine at 8 kHz (400 samples/cycle — slow enough for the step
    # ladder to track): the codec is lossy, but reconstruction must stay
    # close. 20 dB is a conservative floor for IMA on this signal.
    sig = [int(12000 * math.sin(2 * math.pi * 20 * i / 8000)) for i in range(2000)]
    rate, spb, rec = decode_adpcm_wav(encode_adpcm_wav(sig, 8000))
    assert (rate, spb, len(rec)) == (8000, 505, len(sig))
    err = sum((a - b) ** 2 for a, b in zip(sig, rec))
    snr = 10 * math.log10(sum(s * s for s in sig) / max(err, 1))
    assert snr > 20.0, f"SNR {snr:.1f} dB below floor"


def test_compression_ratio_is_4x_ish():
    sig = [0] * 4096
    blob = encode_adpcm_wav(sig, 8000)
    assert len(blob) < 4096 * 2 / 3.5  # ~4 bits vs 16 per sample + headers


def test_first_sample_exact_and_fact_truncation():
    # header carries sample 0 verbatim; 64 samples in a 64-sample block
    # → 63 nibbles + 1 pad nibble the fact chunk must drop
    sig = [(i * 997) % 30000 - 15000 for i in range(64)]
    blob = encode_adpcm_wav(sig, 8000, samples_per_block=64)
    assert sniff_wav(blob)
    _, _, rec = decode_adpcm_wav(blob)
    assert len(rec) == 64
    assert rec[0] == sig[0]


def test_multi_block_blocks_decode_independently():
    # Each block header re-seeds (predictor, index): decoding only the
    # second block's bytes must reproduce the tail of the full decode.
    sig = [int(8000 * math.sin(i / 9.0)) for i in range(40)]
    blob = encode_adpcm_wav(sig, 8000, samples_per_block=20)
    rate, spb, full = decode_adpcm_wav(blob)
    assert spb == 20 and len(full) == 40
    # locate the data chunk and rebuild a one-block wav from block 2
    i = blob.find(b"data")
    (dlen,) = struct.unpack("<I", blob[i + 4 : i + 8])
    data = blob[i + 8 : i + 8 + dlen]
    block_align = 4 + 10  # 19 nibbles + pad → 10 bytes
    second = data[block_align:]
    tail_blob = encode_adpcm_wav(sig[20:40], 8000, samples_per_block=20)
    j = tail_blob.find(b"data")
    # splice: same container, block-2 bytes as the only block
    spliced = tail_blob[: j + 8] + second + tail_blob[j + 8 + block_align :]
    _, _, tail = decode_adpcm_wav(spliced)
    assert tail == full[20:40]


def test_pcm_wav_rejected_by_adpcm_decoder():
    from scripts_toolkit_spark.ext.audiocodec import encode_wav

    with pytest.raises(ValueError, match="IMA-ADPCM only"):
        decode_adpcm_wav(encode_wav([0, 1, 2, 3]))


def test_decode_matches_straight_recurrence_replay():
    # Independent replay: apply the (encode→reconstruct) recurrence
    # directly — byte/nibble packing in the container must not change
    # reconstruction (this is the invariant the SQL oracle relies on).
    sig = [((i * 37) % 255 - 127) * 256 for i in range(64)]
    _, _, rec = decode_adpcm_wav(encode_adpcm_wav(sig, 8000, samples_per_block=64))
    pred, idx = max(-32768, min(32767, sig[0])), 0
    expect = [pred]
    for s in sig[1:]:
        _, pred, idx = _adpcm_step(s, pred, idx)
        expect.append(pred)
    assert rec == expect
