"""DOCX text extraction — Office Open XML wordprocessing (ECMA-376),
the other document format corpora arrive in.  A .docx file is a ZIP
container (sources.py's zip layer) holding `word/document.xml`; text
lives in `<w:t>` runs grouped into `<w:p>` paragraphs.  Same
writer/reader discipline as llm/pdf.py: a deterministic WRITER emits
a minimal conforming package ([Content_Types].xml, _rels, document)
and the EXTRACTOR parses any package in the subset with the stdlib
ElementTree — namespace-aware, tab/break elements (`<w:tab/>`,
`<w:br/>`) mapped to their characters, `xml:space="preserve"` runs
kept verbatim.

Out of scope (skipped cleanly, not mis-parsed): headers/footers,
footnotes, embedded objects, tracked changes (`w:ins` kept, `w:del`
dropped — the accepted-state reading).  Scale posture: per-payload
Arrow stages, payloads partition-local.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_NS = {"w": _W}

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type='
    '"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    "</Relationships>"
)


def encode_docx(paragraphs: list[str]) -> bytes:
    """Minimal conforming .docx: ZIP package with content types, the
    package relationship, and a document whose body is one `<w:p>` per
    paragraph (each a single preserved-space `<w:t>` run).
    Deterministic bytes (pinned ZIP timestamps via sources.zip_bytes)."""
    from dbt_lab_spark.sources import zip_bytes

    body = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{escape(p)}</w:t></w:r></w:p>'
        for p in paragraphs
    )
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>{body}</w:body></w:document>'
    )
    return zip_bytes(
        [
            ("[Content_Types].xml", _CONTENT_TYPES.encode()),
            ("_rels/.rels", _RELS.encode()),
            ("word/document.xml", document.encode()),
        ]
    )


def docx_paragraphs(payload: bytes) -> list[str]:
    """Paragraph texts of a .docx payload, in document order.  Runs
    concatenate within a paragraph; `<w:tab/>` → TAB, `<w:br/>` →
    newline; `w:del` (tracked deletion) subtrees are skipped —
    accepted-state text.  Raises ValueError if the package has no
    word/document.xml."""
    from dbt_lab_spark.sources import unzip_bytes

    doc_xml = None
    for name, data in unzip_bytes(payload):
        if name == "word/document.xml":
            doc_xml = data
            break
    if doc_xml is None:
        raise ValueError("not a DOCX package (no word/document.xml member)")
    root = ET.fromstring(doc_xml)
    out: list[str] = []
    for p in root.iter(f"{{{_W}}}p"):
        parts: list[str] = []

        def walk(el) -> None:
            tag = el.tag
            if tag == f"{{{_W}}}del":
                return  # tracked deletion: accepted-state skips it
            if tag == f"{{{_W}}}t":
                parts.append(el.text or "")
            elif tag == f"{{{_W}}}tab":
                parts.append("\t")
            elif tag == f"{{{_W}}}br":
                parts.append("\n")
            for child in el:
                walk(child)

        walk(p)
        out.append("".join(parts))
    return out


def docx_text(payload: bytes) -> str:
    """All paragraph text, newline-joined."""
    return "\n".join(docx_paragraphs(payload))
