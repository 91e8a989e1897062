"""PDF text extraction — the ingestion format real document corpora
arrive in.  Spec-subset implementation (PDF 1.4, ISO 32000 subset),
same discipline as llm/codecs.py: a deterministic WRITER produces
valid single- or multi-page PDFs (Helvetica Type1, FlateDecode content
streams, xref + trailer), and an EXTRACTOR recovers per-page text from
arbitrary conforming files in the supported subset:

  - object scan in recovery mode (`N 0 obj ... endobj`) — the robust
    path real parsers fall back to when xref offsets lie;
  - stream decoding with /Filter /FlateDecode (direct or via a 1-elem
    array), /Length direct or an indirect reference;
  - content-stream text operators: Tj, ' (moveto-show), and TJ arrays
    (kerning numbers dropped), with full ()\\ escape handling incl.
    octal escapes and line continuations;
  - page order from the /Pages tree's /Kids arrays.

Out of scope (documented, raising or skipping cleanly): CID/Type0
composite fonts, encrypted files, object streams (PDF 1.5+ xref
streams), and non-Flate filters.  Scale posture: per-payload work in
Arrow mapInPandas stages exactly like the image codecs — payloads are
partition-local, nothing driver-side.
"""

from __future__ import annotations

import re
import zlib


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def encode_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    """Serialize pages (each a list of text lines) into a conforming
    PDF 1.4 file: catalog -> pages tree -> per-page content streams
    (BT/Tf/Td/Tj ... ET), Helvetica, FlateDecode when `compress`.
    Deterministic bytes for identical input (no timestamps, no IDs).

    Text contract: the latin-1 repertoire of the simple Type1 font —
    codepoints past 0xFF would need composite (Type0/CID) fonts, which
    this subset documents out of scope; they degrade to '?'."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    n_pages = len(pages)
    # object layout: 1=catalog, 2=pages, then per page (page, content), last=font
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    add(b"<< /Type /Catalog /Pages 2 0 R >>")
    add(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i, lines in enumerate(pages):
        content_num = 4 + 2 * i
        add(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_num} 0 R "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                ops.append("0 -14 Td")
            ops.append(f"({_esc(line)}) Tj")
        ops.append("ET")
        raw = "\n".join(ops).encode("latin-1", errors="replace")
        if compress:
            data = zlib.compress(raw, 6)
            add(
                f"<< /Length {len(data)} /Filter /FlateDecode >>\nstream\n".encode()
                + data
                + b"\nendstream"
            )
        else:
            add(f"<< /Length {len(raw)} >>\nstream\n".encode() + raw + b"\nendstream")
    add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# extractor
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b", re.S)


def _scan_objects(data: bytes) -> dict[int, bytes]:
    """Recovery-mode object scan: map object number -> body bytes."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        end = data.find(b"endobj", m.end())
        if end == -1:
            continue
        objs[int(m.group(1))] = data[m.end() : end]
    return objs


def _dict_of(body: bytes) -> bytes:
    """The top-level << ... >> dictionary of an object body."""
    start = body.find(b"<<")
    if start == -1:
        return b""
    depth = 0
    i = start
    while i < len(body) - 1:
        if body[i : i + 2] == b"<<":
            depth += 1
            i += 2
        elif body[i : i + 2] == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[start:i]
        else:
            i += 1
    return body[start:]


def _int_value(d: bytes, key: bytes, objs: dict[int, bytes]) -> int | None:
    m = re.search(key + rb"\s+(\d+)(\s+\d+\s+R)?", d)
    if not m:
        return None
    if m.group(2):  # indirect reference
        ref = objs.get(int(m.group(1)))
        if ref is None:
            return None
        m2 = re.search(rb"(\d+)", ref)
        return int(m2.group(1)) if m2 else None
    return int(m.group(1))


def _refs(d: bytes, key: bytes) -> list[int]:
    m = re.search(key + rb"\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", d, re.S)
    if not m:
        return []
    return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]


def _stream_data(body: bytes, d: bytes, objs: dict[int, bytes]) -> bytes:
    s = body.find(b"stream")
    if s == -1:
        return b""
    s += len(b"stream")
    if body[s : s + 2] == b"\r\n":
        s += 2
    elif body[s : s + 1] in (b"\n", b"\r"):
        s += 1
    length = _int_value(d, rb"/Length", objs)
    raw = body[s : s + length] if length is not None else body[s : body.rfind(b"endstream")]
    if re.search(rb"/Filter\s*(\[\s*)?/FlateDecode", d):
        raw = zlib.decompress(raw)
    elif re.search(rb"/Filter", d):
        raise NotImplementedError("only /FlateDecode PDF streams supported")
    return raw


_STR_TOKEN = re.compile(rb"\((?:\\.|[^()\\])*\)")


def _unescape(s: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(s):
        c = s[i]
        if c == 0x5C and i + 1 < len(s):  # backslash
            n = s[i + 1 : i + 2]
            if n in (b"n", b"r", b"t", b"b", b"f"):
                out += {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f"}[n]
                i += 2
            elif n in (b"(", b")", b"\\"):
                out += n
                i += 2
            elif n == b"\n":  # line continuation
                i += 2
            elif n.isdigit():  # octal escape, 1-3 digits
                j = i + 1
                oct_s = b""
                while j < len(s) and len(oct_s) < 3 and s[j : j + 1].isdigit():
                    oct_s += s[j : j + 1]
                    j += 1
                out.append(int(oct_s, 8) & 0xFF)
                i = j
            else:
                out += n
                i += 2
        else:
            out.append(c)
            i += 1
    return out.decode("latin-1")


def _content_text(stream: bytes) -> str:
    """Extract shown text from a content stream: Tj / ' strings and TJ
    arrays, newline on Td/TD/T* line moves after the first."""
    lines: list[str] = []
    cur: list[str] = []
    pos = 0
    tokens = re.finditer(
        rb"\((?:\\.|[^()\\])*\)\s*(Tj|')|\[((?:\((?:\\.|[^()\\])*\)|[^\]])*)\]\s*TJ"
        rb"|(T\*|Td|TD)",
        stream,
        re.S,
    )
    for m in tokens:
        if m.group(3):  # line-move operator
            if cur:
                lines.append("".join(cur))
                cur = []
            continue
        if m.group(1):  # (..) Tj   or   (..) '
            sm = _STR_TOKEN.match(stream, m.start())
            cur.append(_unescape(sm.group(0)[1:-1]))
        elif m.group(2) is not None:  # [ .. ] TJ
            for s in _STR_TOKEN.finditer(m.group(2)):
                cur.append(_unescape(s.group(0)[1:-1]))
        pos = m.end()
    del pos
    if cur:
        lines.append("".join(cur))
    return "\n".join(lines)


def pdf_pages_text(payload: bytes) -> list[str]:
    """Per-page text of a PDF in document order (the /Pages tree's
    /Kids order).  Raises ValueError on a non-PDF payload and
    NotImplementedError on encrypted files."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- header)")
    if b"/Encrypt" in payload[-2048:]:
        raise NotImplementedError("encrypted PDFs not supported")
    objs = _scan_objects(payload)
    pages_in_order: list[int] = []
    # find the root Pages node(s) and walk Kids recursively
    page_nodes = {n: _dict_of(b) for n, b in objs.items()}

    def walk(num: int) -> None:
        d = page_nodes.get(num, b"")
        if b"/Type /Pages" in d or b"/Type/Pages" in d:
            for kid in _refs(d, rb"/Kids"):
                walk(kid)
        elif b"/Type /Page" in d or b"/Type/Page" in d:
            pages_in_order.append(num)

    roots = [
        n for n, d in page_nodes.items()
        if (b"/Type /Pages" in d or b"/Type/Pages" in d)
        and not any(n in _refs(d2, rb"/Kids") for d2 in page_nodes.values())
    ]
    for r in sorted(roots):
        walk(r)
    if not pages_in_order:  # degenerate: collect bare Page objects
        # \b keeps /Type /Pages (the tree node) from matching as a page
        pages_in_order = sorted(
            n for n, d in page_nodes.items() if re.search(rb"/Type\s*/Page\b", d)
        )
    out = []
    for num in pages_in_order:
        d = page_nodes[num]
        text_parts = []
        for cnum in _refs(d, rb"/Contents"):
            body = objs.get(cnum)
            if body is None:
                continue
            text_parts.append(_content_text(_stream_data(body, _dict_of(body), objs)))
        out.append("\n".join(p for p in text_parts if p))
    return out


def pdf_text(payload: bytes) -> str:
    """All text of a PDF, pages joined by form feeds."""
    return "\f".join(pdf_pages_text(payload))
