"""PDF text-layer extraction: stdlib codec + distributed ingest."""

import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_readability_spark.codec.pdf import pdf_to_text_lines


def _minimal_pdf(content_stream: bytes, flate: bool = False) -> bytes:
    """A syntactically-plausible one-page PDF around a content stream
    (enough structure for the text-layer extractor; not a full writer)."""
    if flate:
        data = zlib.compress(content_stream)
        head = b"<< /Filter /FlateDecode /Length %d >>" % len(data)
    else:
        data = content_stream
        head = b"<< /Length %d >>" % len(data)
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj " + head + b"\nstream\n" + data + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )


CONTENT = (
    b"BT /F1 12 Tf 72 700 Td (Hello PDF world.) Tj ET\n"
    b"BT 72 680 Td [(Second ) (line with \\(escapes\\)) ] TJ ET\n"
    b"BT 72 660 Td (Octal: \\101\\102) ' ET\n"
)


def test_pdf_text_lines_raw_and_flate():
    for flate in (False, True):
        lines = pdf_to_text_lines(_minimal_pdf(CONTENT, flate=flate))
        assert lines == [
            "Hello PDF world.",
            "Second line with (escapes)",
            "Octal: AB",
        ], (flate, lines)


def test_pdf_garbage_and_empty():
    assert pdf_to_text_lines(b"") == []
    assert pdf_to_text_lines(b"not a pdf at all") == []
    # corrupt flate stream is skipped, not raised
    bad = _minimal_pdf(b"BT (x) Tj ET")
    bad = bad.replace(b"<< /Length", b"<< /Filter /FlateDecode /Length")
    assert pdf_to_text_lines(bad) == []


def test_ingest_pdf_documents_extracts_through_kernel(spark):
    """PDF binary rows → span documents → the same Arc90 extraction
    operator as HTML, end-to-end."""
    from go_readability_spark.spark.corpus import ingest_pdf_documents
    from go_readability_spark.spark.extract import extract_articles

    # enough paragraphs to clear char_threshold
    paras = b"".join(
        b"BT 72 %d Td (Paragraph %d of the PDF body, full of readable words "
        b"that the scorer should keep together in the article, with commas, "
        b"and enough length to score.) Tj ET\n" % (700 - 14 * i, i)
        for i in range(12)
    )
    pdf = _minimal_pdf(paras, flate=True)
    df = spark.createDataFrame(
        [("pdf-1", bytearray(pdf), "http://fakehost/doc.pdf")],
        "doc_id string, payload binary, uri string",
    )
    docs = ingest_pdf_documents(df)
    rows = docs.collect()
    assert len(rows) == 1 and len(rows[0].spans) == 14  # 12 paras + scaffold
    art = extract_articles(docs).collect()[0]
    assert art.status == "ok"
    assert "Paragraph 3 of the PDF body" in art.text_content
    assert art.length > 500
