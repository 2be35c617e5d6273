"""Lib-present validation of the import-gated REAL decoder branches
(round-6 verdict Next #8).

This container ships without pyreadstat / fitz (PyMuPDF) / PIL, so the
production branches in io/sources.decode_xport_blob, io/sources.
read_pdf_spans and ext/multimodal.resize_media run only their pure-Python
fallbacks here. These tests `importorskip` the real libraries: they SKIP
in this container and execute on any host that has the libs — a real
cluster validates the exact code paths the container cannot, against the
same fixtures the fallback tests use (io/xport.write_xport,
io/pdftext.write_pdf, ext/imagecodec.encode_png).
"""

from __future__ import annotations

import pytest

pd = pytest.importorskip("pandas")


def test_pyreadstat_branch_matches_pure_parser():
    """With pyreadstat installed, decode_xport_blob takes the library
    branch (chunked read + encoding fallback, reference converter.py:
    96-127); its output must match the pure-Python TS-140 parser on the
    same bytes — the parity that makes the container's fallback evidence
    transfer to lib-present hosts."""
    pytest.importorskip("pyreadstat")
    from scripts_toolkit_spark.io.sources import _XPORT_ENCODINGS, decode_xport_blob
    from scripts_toolkit_spark.io.xport import decode_xport, write_xport

    frame = pd.DataFrame(
        {"ID": [1.0, 2.0, 3.0], "NAME": ["alpha", "bravo", "café"], "VAL": [0.5, -1.25, 2.0]}
    )
    blob = write_xport(frame, member_name="QTR1")
    via_lib = decode_xport_blob(blob)
    via_pure = decode_xport(blob, _XPORT_ENCODINGS)
    assert [c.upper() for c in via_lib.columns] == [c.upper() for c in via_pure.columns]
    assert len(via_lib) == len(via_pure)
    for c_lib, c_pure in zip(via_lib.columns, via_pure.columns):
        lib_vals = list(via_lib[c_lib])
        pure_vals = list(via_pure[c_pure])
        assert lib_vals == pytest.approx(pure_vals) if via_lib[c_lib].dtype.kind == "f" else lib_vals == pure_vals


def test_fitz_branch_extracts_spans(spark, tmp_path):
    """With PyMuPDF installed, read_pdf_spans decodes via fitz (reference
    app.py:16-38). Span segmentation may differ from the subset parser,
    but page structure and text content must survive: both pages present,
    all fixture strings recovered, span_seq strictly increasing."""
    pytest.importorskip("fitz")
    from scripts_toolkit_spark.io.pdftext import write_pdf
    from scripts_toolkit_spark.io.sources import read_pdf_spans

    pages = [
        [("Heading One", 18.0, "Helvetica-Bold"), ("body text alpha", 11.0, "Helvetica")],
        [("second page text", 11.0, "Helvetica")],
    ]
    (tmp_path / "doc.pdf").write_bytes(write_pdf(pages, compress=True))
    rows = read_pdf_spans(spark, str(tmp_path / "*.pdf")).collect()
    assert rows, "fitz decoded no spans"
    assert {r["page_no"] for r in rows} == {1, 2}
    all_text = " ".join(r["text"] for r in sorted(rows, key=lambda r: r["span_seq"]))
    for needle in ("Heading One", "body text alpha", "second page text"):
        assert needle in all_text
    seqs = sorted(r["span_seq"] for r in rows)
    assert seqs == list(range(1, len(rows) + 1))


def test_pillow_branch_resizes_real_images(spark):
    """With PIL installed, resize_media must route recognized image
    payloads through the pillow backend and emit a valid PNG of the
    requested dimensions (verified by PIL itself, so the assertion does
    not depend on the pure codec's PNG subset)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io as _io

    from scripts_toolkit_spark.ext.imagecodec import encode_png
    from scripts_toolkit_spark.ext.multimodal import resize_media

    # 8x6 RGB gradient, encoded by the pure-stdlib codec
    w, h = 8, 6
    rgb = bytes((x * 30 % 256, y * 40 % 256, (x + y) % 256)[i] for y in range(h) for x in range(w) for i in range(3))
    blob = encode_png(w, h, rgb)
    media = spark.createDataFrame([(1, bytearray(blob))], "media_id long, content binary")
    rows = resize_media(media, out_w=4, out_h=3).collect()
    assert len(rows) == 1
    row = rows[0]
    assert row["resize_backend"] == "pillow"
    img = PIL_Image.open(_io.BytesIO(bytes(row["resized"])))
    assert img.size == (4, 3)
