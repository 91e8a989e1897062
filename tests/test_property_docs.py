"""Hypothesis property tests for the document-format round trips:
arbitrary content must survive PDF, DOCX, and HTML writers/extractors
(the formats' escape/entity machinery is exactly where fuzzing pays)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# printable-ish text without the whitespace the writers themselves
# normalize (tabs/newlines inside a line are out of contract)
_line = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x24F, exclude_characters="\x7f"),
    min_size=0,
    max_size=80,
)

# the PDF writer's simple-font (Type1/latin-1) contract: codepoints
# beyond 0xFF need composite fonts, which llm/pdf.py documents out of
# scope — so the property fuzzes exactly the supported repertoire
_pdf_line = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0xFF, exclude_characters="\x7f\xad"),
    min_size=0,
    max_size=80,
)


@settings(max_examples=30, deadline=None)
@given(pages=st.lists(st.lists(_pdf_line, min_size=1, max_size=5), min_size=1, max_size=3))
def test_pdf_round_trip_arbitrary_text(pages):
    from dbt_lab_spark.llm.pdf import encode_pdf, pdf_pages_text

    got = pdf_pages_text(encode_pdf(pages))
    assert got == ["\n".join(p) for p in pages]


@settings(max_examples=30, deadline=None)
@given(paras=st.lists(_line, min_size=0, max_size=6))
def test_docx_round_trip_arbitrary_text(paras):
    from dbt_lab_spark.llm.docx import docx_paragraphs, encode_docx

    # ElementTree serializes \r oddly; stay in the printable contract
    cleaned = [p.replace("\r", " ") for p in paras]
    assert docx_paragraphs(encode_docx(cleaned)) == cleaned


@settings(max_examples=30, deadline=None)
@given(
    paras=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=0x24F),
            min_size=25,
            max_size=60,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_html_content_always_kept(paras):
    """Link-free paragraphs ≥ min_chars must always survive the
    boilerplate filter, whatever characters they contain (entities
    escape/decode losslessly); whitespace normalization is the only
    permitted transformation."""
    from dbt_lab_spark.llm.html import encode_html, extract_main_text

    normalized = [" ".join(p.split()) for p in paras]
    got = extract_main_text(encode_html("T", paras), min_chars=20)
    assert got == "\n".join(n for n in normalized if len(n) >= 20)
