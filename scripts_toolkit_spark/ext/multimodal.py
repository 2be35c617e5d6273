"""Multimodal (binary) column plumbing
(SURVEY.md §2.12 [extension], north star: BASELINE.json).

Media payloads are opaque `binary` columns with typed metadata structs; all
per-byte work happens in Arrow-batched `mapInPandas` (the pattern the
reference's format decoders establish, converter.py:96-127 ↔ SURVEY S4/S6).

The image/audio libraries are NOT in this container, so the actual decode
is stubbed two ways:
- `decode_media_stub`: raises NotImplementedError (the honest production
  surface to be backed by PIL/ffmpeg on a real cluster);
- `fake_decode_features`: a deterministic featureizer (length, md5 digest,
  first-bytes fingerprint) with the REAL plumbing — schema, Arrow batches,
  partition-wise iteration — exercised end-to-end and oracle-checked.
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
    """Production decode surface (image resize / audio resample / frame
    sample). Not available in this container."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg; wire them in here on a real cluster"
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
    """Image-resize plumbing: one resized payload row per media row, Arrow
    batched. With PIL installed the backend is a real `Image.resize`
    (bilinear); without it (this container) a deterministic byte-grid
    subsample stands in — same schema, same batch shape, same dataflow, so
    swapping in the real codec changes zero Spark-side code. The backend
    used is reported per row (`resize_backend`) rather than silently
    diverging."""

    def _resize(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # noqa: F401

            backend = "pillow"
        except ImportError:
            Image, backend = None, "byte-grid-stub"

        for pdf in pdf_iter:
            rows = {"media_id": [], "out_w": [], "out_h": [], "resized": [], "resize_backend": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                if Image is not None:  # pragma: no cover
                    import io as _io

                    img = Image.open(_io.BytesIO(blob)).resize((out_w, out_h))
                    buf = _io.BytesIO()
                    img.save(buf, format="PNG")
                    out = buf.getvalue()
                else:
                    # deterministic stand-in: sample out_w*out_h bytes at an
                    # even stride (an "image" resize over raw bytes)
                    n = max(len(blob), 1)
                    step = max(n // (out_w * out_h), 1)
                    out = blob[::step][: out_w * out_h]
                rows["media_id"].append(mid)
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["resized"].append(out)
                rows["resize_backend"].append(backend)
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(_resize, RESIZED_SCHEMA)


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
