"""Ordered / stateful scan operators (SURVEY.md §2.9 T1–T3).

The reference's only stream-shaped computation is the UBPR PDF parser's
stateful sequential scan (app.py:46-112): carry page/title/mdrm state
forward across an ordered span stream, gather sentinel-delimited text, emit
a record at each FORMULA boundary. (As shipped the script is defective —
PyPDF2 imported but `fitz` called at app.py:1/16, and a stray `break` at
:127 halts after one record; we implement the evident intent, per SURVEY
§3.4.)

Batch forms here are pure window functions: fill-forward is
`last(..., ignorenulls=True)` over the order window; segmentation is a
running sum of sentinel markers — both shuffle once on the partition key
and sort once, which is the minimal cost for order-dependent semantics at
any scale. The streaming generalization lives in
`scripts_toolkit_spark/streaming/`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SENTINELS = ("NARRATIVE", "DESCRIPTION", "FORMULA")


def fill_forward(
    df: DataFrame,
    value: Column,
    order_by: list[str],
    partition_by: list[str] | None = None,
    out: str = "filled",
) -> DataFrame:
    """T1: carry the last non-null `value` forward along the order."""
    w = (
        (Window.partitionBy(*partition_by) if partition_by else Window.partitionBy())
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.last(value, ignorenulls=True).over(w))


def sessionize(
    df: DataFrame,
    ts: str,
    key: str,
    gap: str = "INTERVAL 1 HOUR",
    session_col: str = "session_id",
) -> DataFrame:
    """T2-generalized: gap-based sessionization. A new session starts when
    the time since the previous event (per key) exceeds `gap`. session_id is
    a per-key running sum of boundary flags — one shuffle + sort."""
    w = Window.partitionBy(key).orderBy(ts)
    prev = F.lag(ts).over(w)
    new_session = (prev.isNull() | (F.col(ts) > prev + F.expr(gap))).cast("bigint")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(new_session).over(wsum))


def span_scan(spans: DataFrame, doc_col: str | None = None) -> DataFrame:
    """T1+T2+T3: the full UBPR span-stream scan, batch form.

    Input schema (FIXTURES.md §F5): (page_no INT, span_seq BIGINT,
    text STRING, size DOUBLE, font STRING), ordered by (page_no, span_seq)
    within a document.

    Output: one record per FORMULA boundary with filled-forward page_name /
    title / mdrm / item_number (app.py:61-83), gathered narrative /
    description / formula text (app.py:85-108, gathering 10-pt spans until
    the next sentinel or a non-10-pt span), and the is_referenced_concepts
    latch (app.py:57-59).

    `doc_col`: document-id column for corpus inputs — EVERY window
    partitions on it, so a fleet of PDFs scans in parallel (one task per
    document instead of one global serial sort; the streaming twin already
    keys its state per document). Default None = the reference's one-PDF
    semantics via a constant partition key, dropped from the output.
    """
    single_doc = doc_col is None
    doc = "_doc" if single_doc else doc_col
    if single_doc:
        spans = spans.withColumn(doc, F.lit(0))
    order = [F.col("page_no"), F.col("span_seq")]
    w = (
        Window.partitionBy(doc)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    t = F.trim(F.col("text"))
    is_page = F.col("size") == 16.0
    is_title = (F.col("size") == 14.0) & (F.col("font") == "Helvetica-Bold")
    is_mdrm = (F.col("size") == 12.0) & (F.col("font") == "Helvetica-Bold")
    is_sentinel = F.col("text").isin(*SENTINELS)

    mdrm_tokens = F.split(t, " ")
    tagged = spans.select(
        "*",
        F.last(F.when(is_page, t), ignorenulls=True).over(w).alias("page_name"),
        F.last(F.when(is_title, t), ignorenulls=True).over(w).alias("title"),
        # mdrm = whole stripped line (app.py:83 overwrites the split result);
        # item_number = first token when the line has exactly two tokens
        F.last(F.when(is_mdrm, t), ignorenulls=True).over(w).alias("mdrm"),
        F.last(
            F.when(is_mdrm & (F.size(mdrm_tokens) == 2), mdrm_tokens.getItem(0)),
            ignorenulls=True,
        ).over(w).alias("item_number"),
        F.max((t == "Referenced Concepts").cast("int")).over(w).alias("_ref_seen"),
        # record_id: count of PRIOR formula markers → the FORMULA row itself
        # closes the current record
        F.sum(F.when(F.col("text") == "FORMULA", 1).otherwise(0))
        .over(
            Window.partitionBy(doc)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("record_id"),
        # segment id: running count of sentinel rows (incl. current)
        F.sum(is_sentinel.cast("int")).over(w).alias("segment_id"),
        F.last(F.when(is_sentinel, F.col("text")), ignorenulls=True).over(w).alias("segment_kind"),
        is_sentinel.alias("is_sentinel"),
    )

    # a segment belongs to the record of its SENTINEL row: body rows after a
    # FORMULA marker already carry the NEXT record_id (the running count
    # includes that marker), but the gathered formula text closes the
    # CURRENT record (app.py:102-109)
    tagged = tagged.withColumn(
        "segment_record",
        F.last(F.when(F.col("is_sentinel"), F.col("record_id")), ignorenulls=True).over(w),
    )

    # body rows: inside a segment, gather while every span since the
    # sentinel (incl. this one) is 10-pt (app.py:88 stops at non-10pt)
    wseg = (
        Window.partitionBy(doc, "segment_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    body = tagged.where(~F.col("is_sentinel") & F.col("segment_kind").isNotNull()).withColumn(
        "_bad_so_far", F.sum((F.col("size") != 10.0).cast("int")).over(wseg)
    )
    gathered = (
        body.where(F.col("_bad_so_far") == 0)
        .withColumn("record_id", F.col("segment_record"))
        .groupBy(doc, "record_id", "segment_id", "segment_kind")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("page_no", "span_seq", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("seg_text")
        )
        # a record may contain several segments of the same kind; the
        # reference keeps the last one written (dict overwrite)
        .groupBy(doc, "record_id", "segment_kind")
        .agg(F.max_by("seg_text", "segment_id").alias("seg_text"))
        .groupBy(doc, "record_id")
        .pivot("segment_kind", list(SENTINELS))
        .agg(F.first("seg_text"))
    )

    # record header state = fill-forward values AT the FORMULA row
    headers = tagged.where(F.col("text") == "FORMULA").select(
        doc,
        "record_id",
        "page_name",
        "title",
        "mdrm",
        "item_number",
        (F.col("_ref_seen") == 1).alias("is_referenced_concepts"),
    )

    out = headers.join(gathered, [doc, "record_id"], "left").select(
        *([] if single_doc else [doc]),
        "record_id",
        "page_name",
        "title",
        "item_number",
        "mdrm",
        "is_referenced_concepts",
        F.trim(F.coalesce(F.col("NARRATIVE"), F.lit(""))).alias("narrative"),
        F.trim(F.coalesce(F.col("DESCRIPTION"), F.lit(""))).alias("description"),
        F.coalesce(F.col("FORMULA"), F.lit("")).alias("formula"),
    )
    return out


def scd2_intervals(
    df: DataFrame,
    key: str,
    attr: Column | str,
    order_by: list[str],
    ts: str,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval construction: collapse
    each key's ordered history into one row per RUN of an unchanged
    attribute value — (key, attr, valid_from, valid_to, n_rows, version).

    Gaps-and-islands: flag rows where the attribute differs from its
    predecessor (lag over the per-key order window), running-sum the flags
    into a version number, then one grouped aggregate per (key, version).
    Cost at any scale: ONE shuffle on the key + one sort (the minimum for
    order-dependent semantics) followed by a map-side-combinable aggregate
    — the same shape as `sessionize`. `valid_to` is the run's last
    timestamp (closed interval); the open-ended convention is a `lead` over
    the result if needed.
    """
    a = attr if isinstance(attr, Column) else F.col(attr)
    w = Window.partitionBy(key).orderBy(*order_by)
    changed = (~a.eqNullSafe(F.lag(a).over(w))).cast("bigint")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = df.select(
        F.col(key),
        a.alias("attr"),
        F.col(ts).alias("__ts"),
        F.sum(changed).over(wsum).alias("version"),
    )
    return runs.groupBy(key, "version").agg(
        F.first("attr").alias("attr"),
        F.min("__ts").alias("valid_from"),
        F.max("__ts").alias("valid_to"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def apply_changelog(
    df: DataFrame,
    key: str,
    op: Column,
    order_by: list[str],
    delete_op: str = "D",
) -> DataFrame:
    """CDC upsert/delete apply (the MERGE INTO shape): given a changelog
    with a per-row operation column (`op` ∈ {insert, update, `delete_op`}),
    reduce to the latest surviving state per key — rows whose LAST
    operation is a delete vanish; otherwise the key keeps its last row's
    columns plus `n_ops` (total changelog entries) and `last_op`.

    One window pass (row_number + count over the same per-key frame), then
    a filter — exactly the plan a Delta/Iceberg MERGE compiles to for a
    latest-wins changelog, minus the table-format commit. Deterministic for
    a total `order_by` (include a unique id as the final tiebreak)."""
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in order_by])
    tagged = df.select(
        "*",
        op.alias("__op"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(key)).alias("n_ops"),
    )
    return (
        tagged.where((F.col("__rn") == 1) & (F.col("__op") != delete_op))
        .withColumn("last_op", F.col("__op"))
        .drop("__op", "__rn")
    )
