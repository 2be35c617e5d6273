"""Span-scan semantics vs the reference's stateful loop (app.py:46-112
intent) on a FIXTURES §F5-shaped stream."""

from __future__ import annotations

from scripts_toolkit_spark.operators.spans import span_scan

H, HB = "Helvetica", "Helvetica-Bold"

# (page_no, span_seq, text, size, font)
SPANS = [
    (1, 1, "Summary Ratios", 16.0, H),            # page name
    (1, 2, "Page 1 of 9", 7.5, H),                # header noise
    (1, 3, "Net Interest Margin", 14.0, HB),      # title
    (1, 4, "3 UBPRE003", 12.0, HB),               # item_number + mdrm
    (1, 5, "NARRATIVE", 10.0, HB),
    (1, 6, "Interest income", 10.0, H),
    (1, 7, "less expense", 10.0, H),
    (1, 8, "DESCRIPTION", 10.0, HB),
    (1, 9, "A ratio of margins", 10.0, H),
    (1, 10, "FORMULA", 10.0, HB),
    (1, 11, "a / b * 100", 10.0, H),
    # record 2: bare mdrm, no narrative, referenced-concepts latch
    (2, 1, "Referenced Concepts", 14.0, HB),
    (2, 2, "UBPRE005", 12.0, HB),
    (2, 3, "DESCRIPTION", 10.0, HB),
    (2, 4, "Second description", 10.0, H),
    (2, 5, "stops here", 10.0, H),
    (2, 6, "Footer 7.5pt", 7.5, H),               # breaks the 10pt run
    (2, 7, "not gathered", 10.0, H),              # after break → excluded
    (2, 8, "FORMULA", 10.0, HB),
    (2, 9, "x + y", 10.0, H),
]


def test_span_scan_records(spark):
    df = spark.createDataFrame(
        SPANS, "page_no int, span_seq long, text string, size double, font string"
    )
    records = {r["record_id"]: r for r in span_scan(df).collect()}
    assert len(records) == 2

    r0 = records[0]
    assert r0["page_name"] == "Summary Ratios"
    assert r0["title"] == "Net Interest Margin"
    assert r0["item_number"] == "3"
    assert r0["mdrm"] == "3 UBPRE003"  # app.py:83 keeps the whole line
    assert r0["narrative"] == "Interest income less expense"
    assert r0["description"] == "A ratio of margins"
    assert r0["formula"].strip() == "a / b * 100"
    assert r0["is_referenced_concepts"] is False

    r1 = records[1]
    assert r1["page_name"] == "Summary Ratios"  # filled forward across pages
    assert r1["title"] == "Referenced Concepts"  # 14pt bold sets title too
    assert r1["mdrm"] == "UBPRE005"
    # gather stops at the non-10pt span; later 10pt spans stay excluded
    assert r1["description"] == "Second description stops here"
    assert r1["formula"].strip() == "x + y"
    assert r1["is_referenced_concepts"] is True
    assert r1["narrative"] == ""  # no NARRATIVE sentinel in record 2


def test_span_scan_corpus_partitioned_by_doc(spark):
    """Corpus form: a fleet of PDFs scans in parallel, each document's
    records identical to a single-doc run, with NO cross-document state
    leakage — and the plan hash-partitions the span stream on the doc id
    instead of serializing through one global sort."""
    single = spark.createDataFrame(
        SPANS, "page_no int, span_seq long, text string, size double, font string"
    )
    expected = sorted(
        (r["record_id"], r["page_name"], r["title"], r["item_number"], r["mdrm"],
         r["is_referenced_concepts"], r["narrative"], r["description"], r["formula"])
        for r in span_scan(single).collect()
    )

    # doc B is a TRUNCATED variant (first record only): different record
    # count per doc proves state does not leak across the partition key
    corpus_rows = [("docA", *s) for s in SPANS] + [("docB", *s) for s in SPANS[:11]]
    corpus = spark.createDataFrame(
        corpus_rows,
        "pdf_id string, page_no int, span_seq long, text string, size double, font string",
    )
    out = span_scan(corpus, doc_col="pdf_id").collect()
    assert {r["pdf_id"] for r in out} == {"docA", "docB"}

    got_a = sorted(
        (r["record_id"], r["page_name"], r["title"], r["item_number"], r["mdrm"],
         r["is_referenced_concepts"], r["narrative"], r["description"], r["formula"])
        for r in out
        if r["pdf_id"] == "docA"
    )
    assert got_a == expected
    assert len([r for r in out if r["pdf_id"] == "docB"]) == 1

    plan = span_scan(corpus, doc_col="pdf_id")._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(pdf_id" in plan
    # the one-PDF default must NOT leak its internal constant key
    assert "_doc" not in span_scan(single).columns
