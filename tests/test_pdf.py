"""llm/pdf.py: writer/extractor round trips, content-stream operator
coverage, stream-decoding variants, and rejection of what the subset
doesn't claim."""

from __future__ import annotations

import random
import zlib

import pytest

from dbt_lab_spark.llm.pdf import (
    _content_text,
    encode_pdf,
    pdf_pages_text,
    pdf_text,
)


class TestRoundTrip:
    def test_multipage_both_codecs(self):
        pages = [["hello world", "second line"], ["page two", "more text here"]]
        for compress in (True, False):
            got = pdf_pages_text(encode_pdf(pages, compress=compress))
            assert got == ["hello world\nsecond line", "page two\nmore text here"]

    def test_specials_escaped(self):
        pages = [["parens (here)", "back\\slash", "both (\\) mixed"]]
        got = pdf_pages_text(encode_pdf(pages))
        assert got == ["parens (here)\nback\\slash\nboth (\\) mixed"]

    def test_byte_determinism(self):
        pages = [[f"line {i}" for i in range(30)]]
        assert encode_pdf(pages) == encode_pdf(pages)

    def test_empty_document(self):
        assert pdf_pages_text(encode_pdf([])) == []
        assert pdf_text(encode_pdf([])) == ""

    def test_random_texts_survive(self):
        rng = random.Random(23)
        for _ in range(10):
            pages = [
                ["".join(chr(rng.randint(32, 126)) for _ in range(rng.randint(0, 60)))
                 for _ in range(rng.randint(1, 6))]
                for _ in range(rng.randint(1, 3))
            ]
            got = pdf_pages_text(encode_pdf(pages))
            assert got == ["\n".join(p) for p in pages]


class TestContentStream:
    def test_tj_arrays_drop_kerning(self):
        assert _content_text(rb"BT [(ker) -20 (ned)] TJ ET") == "kerned"

    def test_quote_operator_and_tstar(self):
        assert _content_text(rb"BT (a) Tj T* (b) ' ET") == "a\nb"

    def test_octal_escapes(self):
        assert _content_text(rb"BT (\101\102C\051) Tj ET") == "ABC)"


class TestStreamDecoding:
    def test_indirect_length_reference(self):
        # hand-build a PDF whose /Length is an indirect object
        content = b"BT /F1 12 Tf 72 720 Td (indirect) Tj ET"
        data = zlib.compress(content)
        pdf = (
            b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
            b"4 0 obj << /Length 6 0 R /Filter /FlateDecode >>\nstream\n"
            + data
            + b"\nendstream endobj\n"
            b"6 0 obj " + str(len(data)).encode() + b" endobj\n"
            b"trailer << /Size 7 /Root 1 0 R >>\n%%EOF\n"
        )
        assert pdf_pages_text(pdf) == ["indirect"]

    def test_non_flate_filter_raises(self):
        pdf = (
            b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
            b"4 0 obj << /Length 4 /Filter /LZWDecode >>\nstream\nXXXX\nendstream endobj\n"
            b"%%EOF\n"
        )
        with pytest.raises(NotImplementedError, match="FlateDecode"):
            pdf_pages_text(pdf)


class TestRejection:
    def test_non_pdf(self):
        with pytest.raises(ValueError, match="PDF"):
            pdf_text(b"plain bytes")

    def test_encrypted_marker(self):
        blob = encode_pdf([["x"]]) + b"\n<< /Encrypt 9 0 R >>\n"
        with pytest.raises(NotImplementedError, match="encrypted"):
            pdf_text(blob)


class TestDocx:
    def test_round_trip_with_specials(self):
        from dbt_lab_spark.llm.docx import docx_paragraphs, encode_docx

        paras = ["first paragraph", "second & <special> one", ""]
        blob = encode_docx(paras)
        assert docx_paragraphs(blob) == paras
        assert blob == encode_docx(paras)  # byte determinism

    def test_tab_break_and_tracked_deletion(self):
        from dbt_lab_spark.llm.docx import docx_paragraphs
        from dbt_lab_spark.sources import zip_bytes

        doc = (
            b'<?xml version="1.0"?>'
            b'<w:document xmlns:w='
            b'"http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
            b"<w:body>"
            b"<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>"
            b"<w:p><w:ins><w:r><w:t>kept</w:t></w:r></w:ins>"
            b"<w:del><w:r><w:t>gone</w:t></w:r></w:del></w:p>"
            b"</w:body></w:document>"
        )
        assert docx_paragraphs(zip_bytes([("word/document.xml", doc)])) == [
            "a\tb\nc",
            "kept",
        ]

    def test_non_docx_rejected(self):
        import pytest as _pytest

        from dbt_lab_spark.llm.docx import docx_text
        from dbt_lab_spark.sources import zip_bytes

        with _pytest.raises(ValueError, match="word/document.xml"):
            docx_text(zip_bytes([("other.xml", b"<x/>")]))
