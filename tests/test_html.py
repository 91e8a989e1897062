"""llm/html.py: block segmentation, link-density boilerplate
dropping, entity handling, script/style stripping."""

from __future__ import annotations

from dbt_lab_spark.llm.html import (
    encode_html,
    extract_main_text,
    html_blocks,
)


class TestBlocks:
    def test_nav_and_footer_are_link_dense(self):
        page = encode_html("T", ["a long enough content paragraph right here ok"])
        blocks = html_blocks(page)
        dens = {b.text[:7]: b.link_density for b in blocks}
        nav = next(b for b in blocks if b.text.startswith("Section"))
        footer = next(b for b in blocks if "legal" in b.text)
        content = next(b for b in blocks if b.text.startswith("a long"))
        assert nav.link_density >= 0.5
        assert footer.link_density >= 0.5
        assert content.link_density == 0.0
        del dens

    def test_script_and_style_dropped(self):
        page = "<body><script>var x = 'SECRET';</script><style>.a{}</style><p>keep this text</p></body>"
        assert [b.text for b in html_blocks(page)] == ["keep this text"]

    def test_entities_decoded(self):
        page = "<p>tom &amp; jerry &lt;tag&gt; &#65;</p>"
        assert html_blocks(page)[0].text == "tom & jerry <tag> A"

    def test_whitespace_normalized(self):
        page = "<p>  lots   of\n\n spacing </p>"
        assert html_blocks(page)[0].text == "lots of spacing"

    def test_unclosed_tags_tolerated(self):
        page = "<div><p>first para text<p>second para text"
        texts = [b.text for b in html_blocks(page)]
        assert texts == ["first para text", "second para text"]


class TestExtraction:
    def test_keeps_content_drops_chrome(self):
        paras = [
            "first content paragraph with plenty of words in it",
            "second content paragraph also long enough to retain",
        ]
        got = extract_main_text(encode_html("Title", paras))
        assert got == "\n".join(paras)

    def test_short_blocks_dropped(self):
        page = "<p>tiny</p><p>this block is comfortably past the minimum length</p>"
        got = extract_main_text(page, min_chars=20)
        assert got == "this block is comfortably past the minimum length"

    def test_link_density_threshold(self):
        page = (
            '<p><a href="/x">almost entirely a link in this block here</a> y</p>'
            "<p>a normal prose block with no links at all in sight</p>"
        )
        got = extract_main_text(page, min_chars=20, max_link_density=0.5)
        assert got == "a normal prose block with no links at all in sight"

    def test_empty_input(self):
        assert extract_main_text("") == ""
        assert extract_main_text(b"") == ""
