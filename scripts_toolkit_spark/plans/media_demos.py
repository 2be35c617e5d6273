"""Round-11 media-decode demonstrations: REAL video (uncompressed-DIB AVI)
and REAL compressed audio (IMA ADPCM) under the driver gate.

These close the two §2.12 modalities that previously stopped at honest
stubs (ffmpeg absent): video now demuxes + pixel-decodes end-to-end via
the pure-stdlib AVI codec (ext/videocodec.py), and compressed audio now
round-trips through a real lossy codec (IMA ADPCM, ext/audiocodec.py)
whose integer encode→decode recurrence a DuckDB recursive CTE replays as
an independent oracle. Same synthesis pattern as image_decode_stats /
audio_decode_stats (plans/ext_demos.py): embeddings → deterministic
quantization → media payload → codec round-trip → exact integer stats the
oracle computes straight from the embeddings. H.264/VP9 video and
mp3/aac/opus audio still need ffmpeg and remain stubbed
(ext/multimodal.decode_media_stub).

Scale shape (all three): quantization is native Catalyst; codecs run in
one Arrow-batched mapInPandas over pre-repartitioned rows (CPU-heavy
Python, the simhash_fingerprints discipline); no joins, no shuffles past
the repartition. At 100 TB this is the embarrassingly-parallel decode
tier of a multimodal ingest pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.ext.audiocodec import IMA_STEP_TABLE
from scripts_toolkit_spark.io.catalog import load_table

# Each 64-dim embedding renders as a 4-frame 4x4 grayscale video: frame f
# holds quantized values 16f..16f+15 (+127 → 0..254), pixels row-major
# top-down — so one position-weighted sum over (frame, pixel) order
# catches frame-order, row-order (DIB bottom-up) and channel-order bugs.
_VID_W = _VID_H = 4
_VID_FRAMES = 4
_VID_FPS = 8


def video_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode under the driver gate: each embedding becomes a
    4-frame 4x4 grayscale video, muxed into an uncompressed-DIB AVI
    (RIFF container hand-assembled per spec), demuxed + pixel-decoded
    back through the generic chunk walker (ext/videocodec — bottom-up
    BGR rows re-ordered to top-down RGB), and reduced to exact integer
    pixel statistics over (frame, pixel) positions. The oracle computes
    the same integers straight from the embeddings — any container-layout
    or row-order bug breaks the hash match."""
    from scripts_toolkit_spark.ext.similarity import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    qt = quantize_embeddings(emb).repartition(
        spark.sparkContext.defaultParallelism
    )
    pix = qt.select(
        "vec_id", F.transform("q", lambda x: x + F.lit(127)).alias("pix")
    )

    def _roundtrip(pdf_iter):
        import pandas as pd

        from scripts_toolkit_spark.ext import videocodec as VC

        px_per_frame = _VID_W * _VID_H
        for pdf in pdf_iter:
            out = {
                "vec_id": [], "n_frames": [], "width": [], "height": [],
                "fps": [], "gray_sum": [], "pos_wsum": [],
            }
            for vid, pixlist in zip(pdf["vec_id"], pdf["pix"]):
                frames = []
                for f in range(_VID_FRAMES):
                    gray = bytes(
                        int(p) for p in pixlist[f * px_per_frame : (f + 1) * px_per_frame]
                    )
                    frames.append(bytes(b for g in gray for b in (g, g, g)))
                blob = VC.encode_avi(_VID_W, _VID_H, frames, fps=_VID_FPS)
                w, h, fps, dec = VC.decode_avi(blob)
                grays = [VC.frame_gray(fr) for fr in dec]
                out["vec_id"].append(vid)
                out["n_frames"].append(len(dec))
                out["width"].append(w)
                out["height"].append(h)
                out["fps"].append(fps)
                out["gray_sum"].append(sum(sum(g) for g in grays))
                out["pos_wsum"].append(
                    sum(
                        (f * px_per_frame + i) * g
                        for f, gr in enumerate(grays)
                        for i, g in enumerate(gr)
                    )
                )
            yield pd.DataFrame(out)

    return pix.mapInPandas(
        _roundtrip,
        "vec_id bigint, n_frames int, width int, height int, fps int, "
        "gray_sum bigint, pos_wsum bigint",
    )


VIDEO_DECODE_STATS_SQL = """
WITH s AS (
  SELECT vec_id,
    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
    embedding
  FROM embeddings
),
p AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT) + 127) AS pix
  FROM s
)
SELECT vec_id, 4 AS n_frames, 4 AS width, 4 AS height, 8 AS fps,
  list_reduce(pix, (x, y) -> x + y) AS gray_sum,
  list_reduce(list_transform(range(1, 65), i -> (i - 1) * pix[i]), (x, y) -> x + y)
    AS pos_wsum
FROM p
"""


def video_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame-SAMPLING pipeline under the driver gate: mux the 4-frame
    AVI as in video_decode_stats, demux, keep every 2nd frame
    (sample_video_frames — frames 0 and 2), and emit one row per
    (video, kept frame) with within-frame integer stats. One input row →
    many frame rows: the explode shape every video featurizer
    (per-frame dHash, scene-cut diffing) builds on. The oracle replays
    the stride arithmetic by slicing the same 16-value windows out of
    the quantized embeddings."""
    from scripts_toolkit_spark.ext.similarity import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    qt = quantize_embeddings(emb).repartition(
        spark.sparkContext.defaultParallelism
    )
    pix = qt.select(
        "vec_id", F.transform("q", lambda x: x + F.lit(127)).alias("pix")
    )

    def _sampled(pdf_iter):
        import pandas as pd

        from scripts_toolkit_spark.ext import videocodec as VC

        px_per_frame = _VID_W * _VID_H
        for pdf in pdf_iter:
            out = {"vec_id": [], "frame_no": [], "gray_sum": [], "pos_wsum": []}
            for vid, pixlist in zip(pdf["vec_id"], pdf["pix"]):
                frames = []
                for f in range(_VID_FRAMES):
                    gray = bytes(
                        int(p) for p in pixlist[f * px_per_frame : (f + 1) * px_per_frame]
                    )
                    frames.append(bytes(b for g in gray for b in (g, g, g)))
                blob = VC.encode_avi(_VID_W, _VID_H, frames, fps=_VID_FPS)
                _, _, _, dec = VC.decode_avi(blob)
                for fno, fr in VC.sample_video_frames(dec, stride=2):
                    gr = VC.frame_gray(fr)
                    out["vec_id"].append(vid)
                    out["frame_no"].append(fno)
                    out["gray_sum"].append(sum(gr))
                    out["pos_wsum"].append(sum(i * g for i, g in enumerate(gr)))
            yield pd.DataFrame(out)

    return pix.mapInPandas(
        _sampled,
        "vec_id bigint, frame_no int, gray_sum bigint, pos_wsum bigint",
    )


VIDEO_FRAME_SAMPLE_STATS_SQL = """
WITH s AS (
  SELECT vec_id,
    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
    embedding
  FROM embeddings
),
p AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT) + 127) AS pix
  FROM s
),
f AS (SELECT unnest([0, 2]) AS frame_no)
SELECT vec_id, frame_no,
  list_reduce(list_transform(range(1, 17), i -> pix[16 * frame_no + i]),
              (x, y) -> x + y) AS gray_sum,
  list_reduce(list_transform(range(1, 17), i -> (i - 1) * pix[16 * frame_no + i]),
              (x, y) -> x + y) AS pos_wsum
FROM p CROSS JOIN f
"""


def adpcm_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy compressed-audio codec under the driver gate: each
    embedding becomes a 64-sample int16 signal (quantized value × 256),
    encoded to 4-bit IMA ADPCM in a spec-level WAV container (format tag
    0x11, fact chunk, one 64-sample block starting at step index 0) and
    decoded back (manual RIFF walk — stdlib `wave` cannot read ADPCM).
    Emits exact integer statistics of the RECONSTRUCTED signal plus the
    exact total reconstruction error. The oracle replays the integer
    encode→decode recurrence (IMA step/index tables, nibble quantize,
    predictor clamp) in a recursive CTE — two genuinely independent
    implementations of a lossy codec that must agree bit-for-bit."""
    from scripts_toolkit_spark.ext.similarity import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    qt = quantize_embeddings(emb).repartition(
        spark.sparkContext.defaultParallelism
    )

    def _roundtrip(pdf_iter):
        import pandas as pd

        from scripts_toolkit_spark.ext import audiocodec as AC

        for pdf in pdf_iter:
            out = {
                "vec_id": [], "n_samples": [], "sum_abs": [],
                "pos_wsum": [], "sum_abs_err": [],
            }
            for vid, q in zip(pdf["vec_id"], pdf["q"]):
                samples = [int(v) * 256 for v in q]
                blob = AC.encode_adpcm_wav(
                    samples, sample_rate=8000, samples_per_block=64
                )
                _, _, rec = AC.decode_adpcm_wav(blob)
                out["vec_id"].append(vid)
                out["n_samples"].append(len(rec))
                out["sum_abs"].append(sum(abs(r) for r in rec))
                out["pos_wsum"].append(sum(i * abs(r) for i, r in enumerate(rec)))
                out["sum_abs_err"].append(
                    sum(abs(r - s) for r, s in zip(rec, samples))
                )
            yield pd.DataFrame(out)

    return qt.select("vec_id", "q").mapInPandas(
        _roundtrip,
        "vec_id bigint, n_samples bigint, sum_abs bigint, pos_wsum bigint, "
        "sum_abs_err bigint",
    )


# Unrolled (non-recursive) replay of the IMA recurrence — the
# pagerank_top_parties oracle pattern, proven portable across DuckDB
# versions. r11's recursive-CTE formulation of the same arithmetic was
# the round's single driver-gate hash failure while green under local
# DuckDB 1.0.0 at all three SFs (VERDICT r11 #1: an engine-version-
# sensitive oracle); every version-fragile construct it used is gone:
#   * no WITH RECURSIVE — 63 chained CTE layers l1..l63, each a pure
#     projection over the previous layer (state rides in one row/vec);
#   * no list-literal indexing `([...])[idx+1]` — the 89-entry step
#     table is a VALUES relation equi-joined on the step index;
#   * no `//` integer division — step>>1 / step>>2 / step>>3 are
#     precomputed INTEGER columns of that VALUES relation, so the SQL
#     body is integer add/mul/compare/CASE only.
# DuckDB lists are 1-based: sample i (0-based) is smp[i + 1].


def _adpcm_steps_values() -> str:
    rows = ", ".join(
        f"({i}, {st}, {st >> 1}, {st >> 2}, {st >> 3})"
        for i, st in enumerate(IMA_STEP_TABLE)
    )
    return f"steps(sidx, st, st2, st4, st8) AS (VALUES {rows})"


def _adpcm_layer_blocks() -> str:
    # newpred duplicated per accumulator: plain expression text, no state.
    np = (
        "CASE WHEN sgn = 1 THEN GREATEST(-32768, LEAST(32767, pred - vpdiff))"
        " ELSE GREATEST(-32768, LEAST(32767, pred + vpdiff)) END"
    )
    blocks = []
    for i in range(1, 64):
        blocks.append(f""",
l{i} AS (
  SELECT vec_id, smp,
    {np} AS pred,
    GREATEST(0, LEAST(88,
      idx + CASE WHEN b2 = 1 THEN 2 + 4 * b1 + 2 * b0 ELSE -1 END)) AS idx,
    sum_abs + abs({np}) AS sum_abs,
    pos_wsum + {i} * abs({np}) AS pos_wsum,
    sum_abs_err + abs({np} - nxt) AS sum_abs_err
  FROM (
    SELECT *, st8 + b2 * st + b1 * st2 + b0 * st4 AS vpdiff
    FROM (
      SELECT *, CASE WHEN ad - b2 * st - b1 * st2 >= st4 THEN 1 ELSE 0 END AS b0
      FROM (
        SELECT *, CASE WHEN ad - b2 * st >= st2 THEN 1 ELSE 0 END AS b1
        FROM (
          SELECT *, CASE WHEN ad >= st THEN 1 ELSE 0 END AS b2
          FROM (
            SELECT l.vec_id, l.smp, l.pred, l.idx,
                   l.sum_abs, l.pos_wsum, l.sum_abs_err,
                   s.st, s.st2, s.st4, s.st8,
                   CAST(l.smp[{i + 1}] AS BIGINT) AS nxt,
                   CASE WHEN l.smp[{i + 1}] - l.pred < 0 THEN 1 ELSE 0 END AS sgn,
                   abs(l.smp[{i + 1}] - l.pred) AS ad
            FROM l{i - 1} l JOIN steps s ON s.sidx = l.idx
          ) t0
        ) t1
      ) t2
    ) t3
  ) t4
)""")
    return "".join(blocks)


ADPCM_ROUNDTRIP_STATS_SQL = f"""
WITH {_adpcm_steps_values()},
s AS (
  SELECT vec_id,
    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
    embedding
  FROM embeddings
),
q AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT) * 256) AS smp
  FROM s
),
l0 AS (
  SELECT vec_id, smp,
    CAST(smp[1] AS BIGINT) AS pred, 0 AS idx,
    abs(CAST(smp[1] AS BIGINT)) AS sum_abs,
    CAST(0 AS BIGINT) AS pos_wsum,
    CAST(0 AS BIGINT) AS sum_abs_err
  FROM q
){_adpcm_layer_blocks()}
SELECT vec_id, CAST(64 AS BIGINT) AS n_samples, sum_abs, pos_wsum, sum_abs_err
FROM l63
"""


# Scene-cut threshold: sum of absolute per-pixel gray diffs between
# consecutive 16-pixel frames; 16*40 ≈ "average pixel moved by 40/254".
_CUT_THRESHOLD = 640


def video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal video analysis on REAL decoded frames: demux the 4-frame
    AVI (as video_decode_stats), compute the frame-to-frame sum of
    absolute pixel differences (SAD — the classic shot-boundary signal),
    and flag cuts where SAD clears a fixed threshold. One row per frame
    transition. The oracle replays the SAD arithmetic on the quantized
    embedding windows; the threshold flag makes the boolean logic
    hash-gated too, not just the sums.

    Scale shape: identical to the other media rows — per-row codec work in
    one Arrow-batched mapInPandas, no shuffle. A production shot-boundary
    pass over 100 TB of video is exactly this embarrassingly-parallel
    map; the cut rows then feed keyframe extraction or per-shot dedup."""
    from scripts_toolkit_spark.ext.similarity import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    qt = quantize_embeddings(emb).repartition(
        spark.sparkContext.defaultParallelism
    )
    pix = qt.select(
        "vec_id", F.transform("q", lambda x: x + F.lit(127)).alias("pix")
    )

    def _cuts(pdf_iter):
        import pandas as pd

        from scripts_toolkit_spark.ext import videocodec as VC

        px_per_frame = _VID_W * _VID_H
        for pdf in pdf_iter:
            out = {"vec_id": [], "frame_no": [], "sad": [], "is_cut": []}
            for vid, pixlist in zip(pdf["vec_id"], pdf["pix"]):
                frames = []
                for f in range(_VID_FRAMES):
                    gray = bytes(
                        int(p) for p in pixlist[f * px_per_frame : (f + 1) * px_per_frame]
                    )
                    frames.append(bytes(b for g in gray for b in (g, g, g)))
                blob = VC.encode_avi(_VID_W, _VID_H, frames, fps=_VID_FPS)
                _, _, _, dec = VC.decode_avi(blob)
                grays = [VC.frame_gray(fr) for fr in dec]
                for f in range(1, len(grays)):
                    sad = sum(abs(a - b) for a, b in zip(grays[f], grays[f - 1]))
                    out["vec_id"].append(vid)
                    out["frame_no"].append(f)
                    out["sad"].append(sad)
                    out["is_cut"].append(sad > _CUT_THRESHOLD)
            yield pd.DataFrame(out)

    return pix.mapInPandas(
        _cuts, "vec_id bigint, frame_no int, sad bigint, is_cut boolean"
    )


VIDEO_SCENE_CUTS_SQL = """
WITH s AS (
  SELECT vec_id,
    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
    embedding
  FROM embeddings
),
p AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT) + 127) AS pix
  FROM s
),
f AS (SELECT unnest([1, 2, 3]) AS frame_no)
SELECT vec_id, frame_no,
  list_reduce(
    list_transform(range(1, 17),
      i -> abs(pix[16 * frame_no + i] - pix[16 * (frame_no - 1) + i])),
    (x, y) -> x + y) AS sad,
  list_reduce(
    list_transform(range(1, 17),
      i -> abs(pix[16 * frame_no + i] - pix[16 * (frame_no - 1) + i])),
    (x, y) -> x + y) > 640 AS is_cut
FROM p CROSS JOIN f
"""
