"""Pure-Python PDF subset decoder tests (io/pdftext.py): writer→parser
round-trip (raw + FlateDecode), escape handling, page order, font
resolution, scope errors, and the Spark read_pdf_spans e2e — the decoder
body executes here even though fitz is absent (reference app.py:16-38)."""

from __future__ import annotations

import pytest

from scripts_toolkit_spark.io.pdftext import parse_pdf_spans, write_pdf

PAGES = [
    [("Heading One", 18.0, "Helvetica-Bold"), ("body text alpha", 11.0, "Helvetica")],
    [("second page (with) \\ specials", 11.0, "Helvetica")],
]


@pytest.mark.parametrize("compress", [False, True])
def test_write_parse_roundtrip(compress):
    blob = write_pdf(PAGES, compress=compress)
    assert blob.startswith(b"%PDF-") and blob.rstrip().endswith(b"%%EOF")
    spans = parse_pdf_spans(blob)
    assert [(p, t, s, f) for (p, _seq, t, s, f) in spans] == [
        (1, "Heading One", 18.0, "Helvetica-Bold"),
        (1, "body text alpha", 11.0, "Helvetica"),
        (2, "second page (with) \\ specials", 11.0, "Helvetica"),
    ]
    assert [seq for (_p, seq, *_r) in spans] == [1, 2, 3]


def test_tj_array_concatenates():
    blob = write_pdf([[("x", 10.0, "Courier")]])
    # splice a TJ-array show into the content stream alongside the Tj one
    blob2 = blob.replace(b"(x) Tj", b"[(par)-250(tial)] TJ")
    spans = parse_pdf_spans(blob2)
    assert spans[0][2] == "partial"


def test_octal_escape():
    blob = write_pdf([[("a\\101b", 10.0, "Courier")]])  # literal backslash-101
    # the writer escapes the backslash; build the raw octal form directly
    raw = blob.replace(b"(a\\\\101b)", b"(a\\101b)")
    spans = parse_pdf_spans(raw)
    assert spans[0][2] == "aAb"


def test_out_of_scope_raises():
    with pytest.raises(ValueError, match="no PDF objects"):
        parse_pdf_spans(b"%PDF-1.4 garbage only")
    blob = write_pdf(PAGES)
    with pytest.raises(ValueError, match="scope"):
        parse_pdf_spans(blob.replace(b"/Type /Catalog", b"/Encrypt /Type /Catalog"))
    with pytest.raises(ValueError, match="FlateDecode"):
        parse_pdf_spans(
            write_pdf(PAGES, compress=True).replace(b"/FlateDecode", b"/LZWDecode")
        )


def test_read_pdf_spans_spark_e2e(spark, tmp_path):
    from scripts_toolkit_spark.io.sources import read_pdf_spans

    (tmp_path / "a.pdf").write_bytes(write_pdf(PAGES))
    (tmp_path / "b.pdf").write_bytes(write_pdf([[("solo", 9.0, "Times-Roman")]], compress=True))
    df = read_pdf_spans(spark, str(tmp_path / "*.pdf"))
    rows = df.collect()
    assert len(rows) == 4
    texts = {r["text"] for r in rows}
    assert {"Heading One", "body text alpha", "solo"} <= texts
    a = [r for r in rows if r["text"] == "Heading One"][0]
    assert a["page_no"] == 1 and a["size"] == 18.0 and a["font"] == "Helvetica-Bold"


def test_pdf_spans_feed_span_scan(spark, tmp_path):
    """S6 → §2.9 chain: a real PDF decoded by read_pdf_spans drives the
    UBPR span-scan operator end-to-end — the reference's full app.py flow
    (decode → stateful scan → records) with no pre-decoded fixture."""
    from scripts_toolkit_spark.io.sources import read_pdf_spans
    from scripts_toolkit_spark.operators.spans import span_scan

    H, HB = "Helvetica", "Helvetica-Bold"
    (tmp_path / "ubpr.pdf").write_bytes(
        write_pdf(
            [
                [
                    ("Summary Ratios", 16.0, H),
                    ("Net Interest Margin", 14.0, HB),
                    ("3 UBPRE003", 12.0, HB),
                    ("NARRATIVE", 10.0, HB),
                    ("Interest income", 10.0, H),
                    ("less expense", 10.0, H),
                    ("FORMULA", 10.0, HB),
                    ("a / b * 100", 10.0, H),
                ],
                [
                    ("UBPRE005", 12.0, HB),
                    ("DESCRIPTION", 10.0, HB),
                    ("Second description", 10.0, H),
                    ("FORMULA", 10.0, HB),
                    ("x + y", 10.0, H),
                ],
            ]
        )
    )
    spans = read_pdf_spans(spark, str(tmp_path / "*.pdf"))
    records = {r["record_id"]: r for r in span_scan(spans).collect()}
    assert len(records) == 2
    r0, r1 = records[0], records[1]
    assert r0["page_name"] == "Summary Ratios"
    assert r0["title"] == "Net Interest Margin"
    assert r0["item_number"] == "3" and r0["mdrm"] == "3 UBPRE003"
    assert r0["narrative"] == "Interest income less expense"
    assert r0["formula"].strip() == "a / b * 100"
    assert r1["mdrm"] == "UBPRE005"
    assert r1["description"] == "Second description"
    assert r1["page_name"] == "Summary Ratios"  # filled forward across pages
