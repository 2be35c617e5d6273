"""Streaming span scan (SURVEY.md §2.9 T1–T3 under Structured Streaming,
§7 hard-part 4): the UBPR stateful scan as an `applyInPandasWithState`
operator, keyed by document.

State carried across micro-batches per document:
  (page_name, title, mdrm, item_number, ref_seen, open-segment kind,
   open-segment text, gathered narrative/description, records emitted)

Within a batch rows are sorted by (page_no, span_seq); across batches the
file stream delivers files in order (the ingest contract for ordered span
streams — same assumption the batch form makes globally). Records are
emitted exactly at FORMULA boundaries, even when the FORMULA body spans a
micro-batch boundary: the segment stays open in state until the next
sentinel or a non-10pt span closes it.

The batch twin is operators/spans.span_scan — same record shape, so a
backfill and the live stream agree.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "doc_id bigint, record_id bigint, page_name string, title string, "
    "item_number string, mdrm string, is_referenced_concepts boolean, "
    "narrative string, description string, formula string"
)

# state: scalar strings are ''-encoded nulls to keep the tuple schema simple
STATE_SCHEMA = (
    "page_name string, title string, mdrm string, item_number string, "
    "ref_seen boolean, seg_kind string, seg_text string, seg_open boolean, "
    "narrative string, description string, n_emitted bigint, "
    "snap_page string, snap_title string, snap_mdrm string, "
    "snap_item string, snap_ref boolean"
)

_SENTINELS = ("NARRATIVE", "DESCRIPTION", "FORMULA")

_EMPTY = ("", "", "", "", False, "", "", False, "", "", 0, "", "", "", "", False)


def _scan_spans_stateful(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (doc_id,) = key
    (
        page_name,
        title,
        mdrm,
        item_number,
        ref_seen,
        seg_kind,
        seg_text,
        seg_open,
        narrative,
        description,
        n_emitted,
        snap_page,
        snap_title,
        snap_mdrm,
        snap_item,
        snap_ref,
    ) = state.get if state.exists else _EMPTY

    out: dict[str, list] = {k: [] for k in (
        "doc_id", "record_id", "page_name", "title", "item_number", "mdrm",
        "is_referenced_concepts", "narrative", "description", "formula",
    )}

    def close_segment() -> None:
        nonlocal seg_kind, seg_text, seg_open, narrative, description, n_emitted
        if not seg_open:
            return
        text = seg_text.strip()
        if seg_kind == "NARRATIVE":
            narrative = text
        elif seg_kind == "DESCRIPTION":
            description = text
        elif seg_kind == "FORMULA":
            # emit the header snapshot taken AT the FORMULA row — header
            # lines seen while the body was still gathering belong to the
            # NEXT record (reference emits at the FORMULA line, app.py:102-112)
            out["doc_id"].append(doc_id)
            out["record_id"].append(n_emitted)
            out["page_name"].append(snap_page)
            out["title"].append(snap_title)
            out["item_number"].append(snap_item or None)
            out["mdrm"].append(snap_mdrm)
            out["is_referenced_concepts"].append(bool(snap_ref))
            out["narrative"].append(narrative)
            out["description"].append(description)
            out["formula"].append(seg_text.lstrip())
            n_emitted += 1
            narrative = ""
            description = ""
        seg_kind, seg_text, seg_open = "", "", False

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["page_no", "span_seq"])
    for r in rows.itertuples(index=False):
        text, size, font = r.text, r.size, r.font
        stripped = text.strip()
        if stripped == "Referenced Concepts":
            ref_seen = True
        if size == 16.0:
            page_name = stripped
        if size == 14.0 and font == "Helvetica-Bold":
            title = stripped
        if size == 12.0 and font == "Helvetica-Bold":
            mdrm = stripped
            toks = stripped.split(" ")
            item_number = toks[0] if len(toks) == 2 else item_number
        if text in _SENTINELS:
            close_segment()
            seg_kind, seg_text, seg_open = text, "", True
            if text == "FORMULA":
                snap_page, snap_title = page_name, title
                snap_mdrm, snap_item, snap_ref = mdrm, item_number, bool(ref_seen)
            continue
        if seg_open:
            if size == 10.0:
                seg_text = f"{seg_text} {text}"
            else:
                # non-10pt span ends gathering; a FORMULA segment emits now
                close_segment()

    state.update(
        (
            page_name,
            title,
            mdrm,
            item_number,
            bool(ref_seen),
            seg_kind,
            seg_text,
            bool(seg_open),
            narrative,
            description,
            n_emitted,
            snap_page,
            snap_title,
            snap_mdrm,
            snap_item,
            bool(snap_ref),
        )
    )
    yield pd.DataFrame(out)


def scan_span_stream(spans: DataFrame) -> DataFrame:
    """Streaming stateful span scan over a keyed span stream with schema
    (doc_id, page_no, span_seq, text, size, font)."""
    return spans.groupBy("doc_id").applyInPandasWithState(
        _scan_spans_stateful,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
