"""HTML main-content extraction — the web-corpus step between a WARC
record and a clean training document: strip markup, segment into
blocks, and drop boilerplate (nav/header/footer chrome) by the
link-density heuristic the jusText/CCNet family uses (a block whose
characters are mostly anchor text is navigation, not content).

Parsing is the stdlib `html.parser` (no external deps): script/style/
noscript subtrees are dropped, block-level tags close text blocks,
entities decode via convert_charrefs.  A deterministic WRITER builds
realistic pages (nav/footer link chrome around content paragraphs) so
extraction is testable end-to-end — the same writer/reader discipline
as llm/pdf.py and the codecs.

Scale posture: per-payload work in Arrow mapInPandas stages; one
HTMLParser pass per document, payloads partition-local.
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass
from html.parser import HTMLParser

_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "section", "article", "header", "footer",
    "nav", "aside", "blockquote", "pre", "br", "hr", "main", "body",
}
_DROP_TAGS = {"script", "style", "noscript", "template"}


@dataclass
class Block:
    text: str
    link_chars: int

    @property
    def link_density(self) -> float:
        return self.link_chars / len(self.text) if self.text else 1.0


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._anchor_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append(Block(text, min(self._link_chars, len(text))))
        self._parts = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth:
            return
        self._parts.append(data)
        if self._anchor_depth:
            self._link_chars += len(" ".join(data.split()))

    def close(self):
        super().close()
        self._flush()


def html_blocks(payload: str | bytes) -> list[Block]:
    """Segment an HTML document into text blocks with per-block
    anchor-character counts (script/style dropped, entities decoded,
    whitespace normalized)."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8", errors="replace")
    p = _BlockParser()
    p.feed(payload)
    p.close()
    return p.blocks


def extract_main_text(
    payload: str | bytes,
    max_link_density: float = 0.5,
    min_chars: int = 20,
) -> str:
    """Boilerplate-stripped main content: keep blocks at least
    `min_chars` long whose link density is below `max_link_density`,
    joined by newlines.  Deterministic, heuristic by design — the
    thresholds are the tunables every production extractor exposes."""
    kept = [
        b.text
        for b in html_blocks(payload)
        if len(b.text) >= min_chars and b.link_density < max_link_density
    ]
    return "\n".join(kept)


def encode_html(title: str, paragraphs: list[str], n_nav_links: int = 6) -> str:
    """Deterministic realistic page: header nav of links, content
    paragraphs in <article>, a link-heavy footer — the shape the
    link-density heuristic is meant to clean."""
    nav = " | ".join(
        f'<a href="/section{i}">Section {i} link</a>' for i in range(n_nav_links)
    )
    body = "\n".join(f"<p>{_html.escape(p)}</p>" for p in paragraphs)
    footer = " ".join(
        f'<a href="/legal{i}">legal {i}</a>' for i in range(4)
    )
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{_html.escape(title)}</title>"
        "<style>body{margin:0}</style>"
        "<script>var tracking = 'dropped';</script>"
        "</head><body>"
        f"<nav>{nav}</nav>"
        f"<article>{body}</article>"
        f"<footer>{footer} &copy; corpus</footer>"
        "</body></html>"
    )
