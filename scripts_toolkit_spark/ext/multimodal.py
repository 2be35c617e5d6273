"""Multimodal (binary) column plumbing
(SURVEY.md §2.12 [extension], north star: BASELINE.json).

Media payloads are opaque `binary` columns with typed metadata structs; all
per-byte work happens in Arrow-batched `mapInPandas` (the pattern the
reference's format decoders establish, converter.py:96-127 ↔ SURVEY S4/S6).

IMAGE decode is real: `ext/imagecodec.py` is a pure-stdlib PNG/BMP/PPM
codec (the same fallback discipline as io/xport.py and io/pdftext.py), so
`image_pixel_stats` and `resize_media` decode actual pixel data end-to-end
in this container; PIL, when present, simply replaces the backend. AUDIO
decode is real for WAV/PCM16 (`ext/audiocodec.py`, stdlib `wave`):
`audio_sample_stats` reduces actual samples — and for IMA-ADPCM (r11),
a real lossy compressed codec (`ext/audiocodec.encode_adpcm_wav` /
`decode_adpcm_wav`). VIDEO demux + pixel decode is real for
uncompressed-DIB AVI (r11, `ext/videocodec.py`): `video_frame_pixel_stats`
explodes actual decoded frames. Only codecs that genuinely need external
libraries (H.264/VP9 video, mp3/aac/opus audio) remain honestly stubbed
(`decode_media_stub` raises — ffmpeg is genuinely absent), with
`fake_decode_features` exercising the identical Arrow-batch plumbing for
those payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, media_type string, content binary, "
    "meta map<string,string>"
)

FEATURE_SCHEMA = "media_id bigint, n_bytes bigint, digest string, head_byte int"


def binary_table_from_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in media table: utf-8 payload bytes + metadata struct. The
    production path replaces this with `spark.read.format('binaryFile')`."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.create_map(F.lit("origin"), F.lit("documents")).alias("meta"),
    )


def decode_media_stub(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Production decode surface for codecs that need external libraries:
    H.264/VP9/AV1 video and mp3/aac/opus audio. ffmpeg is not in this
    container; images (ext/imagecodec), PCM + IMA-ADPCM WAV
    (ext/audiocodec) and uncompressed-DIB AVI video (ext/videocodec) do
    NOT need this — they decode for real via the pure-stdlib codecs."""
    raise NotImplementedError(
        "compressed-codec (h264/vp9/mp3/aac/opus) decoding requires "
        "ffmpeg; wire it in here on a real cluster"
    )


def fake_decode_features(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic feature extraction over Arrow batches — the real
    mapInPandas shape (vectorized per-batch, no per-row Python calls beyond
    the hash loop)."""
    import hashlib

    for pdf in pdf_iter:
        content = pdf["content"]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "n_bytes": content.map(len).astype("int64"),
                "digest": content.map(lambda b: hashlib.md5(b).hexdigest()),
                "head_byte": content.map(lambda b: b[0] if len(b) else -1).astype("int32"),
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    return media.select("media_id", "content").mapInPandas(
        fake_decode_features, FEATURE_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id bigint, out_w int, out_h int, resized binary, resize_backend string"
)


def resize_media(media: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Image resize: one resized payload row per media row, Arrow batched.
    Recognized image payloads (PNG/BMP/PPM) decode and resample for REAL —
    via PIL when installed, else the pure-stdlib codec (ext/imagecodec) —
    and re-encode as PNG. Unrecognized payloads get a deterministic
    byte-grid subsample so the dataflow stays total. The backend used is
    reported per row (`resize_backend`) rather than silently diverging."""

    def _resize(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # noqa: F401
        except ImportError:
            Image = None

        from scripts_toolkit_spark.ext import imagecodec as IC

        for pdf in pdf_iter:
            rows = {"media_id": [], "out_w": [], "out_h": [], "resized": [], "resize_backend": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                if Image is not None and IC.sniff_format(blob):  # pragma: no cover
                    import io as _io

                    img = Image.open(_io.BytesIO(blob)).resize((out_w, out_h))
                    buf = _io.BytesIO()
                    img.save(buf, format="PNG")
                    out, backend = buf.getvalue(), "pillow"
                elif IC.sniff_format(blob):
                    # real decode: pure-stdlib PNG/BMP/PPM → nearest-neighbor
                    # resample → PNG re-encode
                    w, h, rgb = IC.decode_image(blob)
                    out = IC.encode_png(out_w, out_h, IC.resize_rgb(w, h, rgb, out_w, out_h))
                    backend = "pure-python-codec"
                else:
                    # non-image payload: deterministic byte-grid stand-in —
                    # sample out_w*out_h bytes at an even stride
                    n = max(len(blob), 1)
                    step = max(n // (out_w * out_h), 1)
                    out = blob[::step][: out_w * out_h]
                    backend = "byte-grid-stub"
                rows["media_id"].append(mid)
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["resized"].append(out)
                rows["resize_backend"].append(backend)
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(_resize, RESIZED_SCHEMA)


PIXEL_STATS_SCHEMA = (
    "media_id bigint, fmt string, width int, height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint"
)


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL image decode over the binary column: sniff the container,
    decode to RGB8 via the pure-stdlib codec (PNG/BMP/PPM), and emit
    per-image pixel statistics — exact integer channel sums, so the output
    is bit-stable and oracle-comparable against any independent computation
    of the same pixels. Non-image payloads are passed through with fmt NULL
    and -1 dimensions (total function: no poison-pill rows)."""

    def _stats(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from scripts_toolkit_spark.ext import imagecodec as IC

        for pdf in pdf_iter:
            rows = {k: [] for k in ("media_id", "fmt", "width", "height", "sum_r", "sum_g", "sum_b")}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                fmt = IC.sniff_format(blob)
                if fmt is None:
                    w = h = -1
                    sr = sg = sb = -1
                else:
                    w, h, rgb = IC.decode_image(blob)
                    sr, sg, sb = (sum(rgb[c::3]) for c in range(3))
                rows["media_id"].append(mid)
                rows["fmt"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_r"].append(sr)
                rows["sum_g"].append(sg)
                rows["sum_b"].append(sb)
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(_stats, PIXEL_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "media_id bigint, n_channels int, sample_rate int, n_samples bigint, "
    "sum_abs bigint, peak int"
)


def audio_sample_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode over the binary column: WAV/PCM16 payloads decode
    to actual samples (ext/audiocodec, stdlib `wave`) and reduce to exact
    integer statistics — bit-stable, oracle-comparable. Non-WAV payloads
    pass through with -1 sentinels (total function, no poison pills)."""

    def _stats(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from scripts_toolkit_spark.ext import audiocodec as AC

        for pdf in pdf_iter:
            rows = {
                k: []
                for k in (
                    "media_id", "n_channels", "sample_rate", "n_samples",
                    "sum_abs", "peak",
                )
            }
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                if AC.sniff_wav(blob):
                    ch, rate, samples = AC.decode_wav(blob)
                    n, sa = len(samples), sum(abs(s) for s in samples)
                    pk = max((abs(s) for s in samples), default=0)
                else:
                    ch = rate = pk = -1
                    n = sa = -1
                rows["media_id"].append(mid)
                rows["n_channels"].append(ch)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["sum_abs"].append(sa)
                rows["peak"].append(pk)
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(_stats, AUDIO_STATS_SCHEMA)


CHANNEL_SCHEMA = (
    "media_id bigint, channel int, sample_rate int, n_samples bigint, "
    "sum_abs bigint, peak int"
)


def split_wav_channels(media: DataFrame) -> DataFrame:
    """De-interleave multi-channel WAV payloads: one output row per
    (media_id, channel) with exact integer per-channel statistics — the
    explode-shaped audio analog of sample_frames (one input row → many).
    Non-WAV payloads contribute no rows."""

    def _split(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from scripts_toolkit_spark.ext import audiocodec as AC

        for pdf in pdf_iter:
            rows = {
                k: []
                for k in (
                    "media_id", "channel", "sample_rate", "n_samples",
                    "sum_abs", "peak",
                )
            }
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                if not AC.sniff_wav(blob):
                    continue
                n_ch, rate, samples = AC.decode_wav(blob)
                for ch in range(n_ch):
                    mono = samples[ch::n_ch]
                    rows["media_id"].append(mid)
                    rows["channel"].append(ch)
                    rows["sample_rate"].append(rate)
                    rows["n_samples"].append(len(mono))
                    rows["sum_abs"].append(sum(abs(s) for s in mono))
                    rows["peak"].append(max((abs(s) for s in mono), default=0))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(_split, CHANNEL_SCHEMA)


FRAME_SCHEMA = "media_id bigint, frame_no int, frame_bytes binary, frame_digest string"


def sample_frames(media: DataFrame, frame_size: int = 64, stride: int = 4) -> DataFrame:
    """Frame sampling over opaque media payloads: split each binary payload
    into fixed-size frames and keep every `stride`-th one — the video
    frame-sample plumbing (one input row → many frame rows) with a
    deterministic stand-in for the codec. Real decoders replace the
    splitter, not the dataflow: the Arrow-batch iteration, explode shape and
    per-frame schema stay identical."""

    def _frames(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in pdf_iter:
            rows = {"media_id": [], "frame_no": [], "frame_bytes": [], "frame_digest": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                n_frames = (len(blob) + frame_size - 1) // frame_size
                for f in range(0, n_frames, stride):
                    chunk = blob[f * frame_size : (f + 1) * frame_size]
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(f)
                    rows["frame_bytes"].append(chunk)
                    rows["frame_digest"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(_frames, FRAME_SCHEMA)


VIDEO_FRAME_SCHEMA = (
    "media_id bigint, frame_no int, width int, height int, "
    "gray_sum bigint, frame_digest string"
)


def video_frame_pixel_stats(media: DataFrame, stride: int = 1) -> DataFrame:
    """REAL video decode over the binary column: uncompressed-DIB AVI
    payloads demux + pixel-decode through ext/videocodec (generic RIFF
    chunk walk), keep every `stride`-th frame, and emit one row per
    (media_id, frame) with exact integer pixel stats and a per-frame
    digest — the explode shape per-frame featurizers (dHash near-dup,
    scene-cut diffing) build on. Non-AVI payloads contribute no rows
    (total function, no poison pills)."""

    def _frames(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from scripts_toolkit_spark.ext import videocodec as VC

        for pdf in pdf_iter:
            rows = {
                k: []
                for k in (
                    "media_id", "frame_no", "width", "height",
                    "gray_sum", "frame_digest",
                )
            }
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                if not VC.sniff_avi(blob):
                    continue
                w, h, _, frames = VC.decode_avi(blob)
                for fno, fr in VC.sample_video_frames(frames, stride=stride):
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(fno)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["gray_sum"].append(sum(VC.frame_gray(fr)))
                    rows["frame_digest"].append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        _frames, VIDEO_FRAME_SCHEMA
    )
