"""HTML main-content extraction goldens (FIXTURES §3)."""

from pdf4py_ray.kernel.html_extract import extract_html_text, looks_like_html

ARTICLE_SIMPLE = """<!DOCTYPE html>
<html><head><title>t</title><style>.x{color:red}</style></head>
<body>
<nav><a href="/">Home</a> <a href="/a">About</a></nav>
<article>
<h1>The Headline</h1>
<p>This is the first paragraph of the main article content with enough
text to dominate the scoring.</p>
<p>A second paragraph continues the long-form body text here.</p>
</article>
<footer>Copyright 2026 <a href="/tos">Terms</a></footer>
</body></html>"""

LINK_FARM = """<html><body>
<div id="main">
<p>Real content sentence one with a reasonable amount of words in it.</p>
<p>Real content sentence two that keeps the density high and links low.</p>
</div>
<div id="sidebar">
<ul>
<li><a href="/1">Link one</a></li>
<li><a href="/2">Link two</a></li>
<li><a href="/3">Link three</a></li>
<li><a href="/4">Link four</a></li>
</ul>
</div>
</body></html>"""

DEEP_NESTING = """<html><body><div><div><div><div>
<article><p>Deeply nested but genuine content paragraph with plenty of
descriptive text inside it.</p></article>
</div></div></div></div></body></html>"""

MIXED_INLINE = """<html><body><article>
<p>Inline <b>bold</b> and <a href="/x">a link</a> inside <span>spans</span> flow.</p>
</article></body></html>"""

MALFORMED = """<html><body>
<div><p>Paragraph with an unclosed div and stray closers.</p>
</section></div></em>
<p>Second paragraph still extracted fine.</p>
</body></html>"""


def test_article_simple_strips_boilerplate():
    text, spans = extract_html_text(ARTICLE_SIMPLE)
    assert "The Headline" in text
    assert "first paragraph" in text
    assert "Home" not in text and "Copyright" not in text
    assert ".x{color:red}" not in text
    assert all(k == "line" for _, _, k in spans)
    # spans index the text exactly
    s, e, _ = spans[0]
    assert text[s:e] == text.split("\n")[0]


def test_link_farm_dropped():
    text, _ = extract_html_text(LINK_FARM)
    assert "Real content sentence one" in text
    assert "Link one" not in text


def test_deep_nesting_found():
    text, _ = extract_html_text(DEEP_NESTING)
    assert "Deeply nested but genuine content" in text


def test_mixed_inline_flows():
    text, _ = extract_html_text(MIXED_INLINE)
    assert "Inline bold and a link inside spans flow." in text


def test_malformed_tolerated():
    text, _ = extract_html_text(MALFORMED)
    assert "unclosed div" in text
    assert "Second paragraph still extracted fine." in text


def test_whitespace_collapsed():
    text, _ = extract_html_text("<html><body><p>a   b\n\n c</p></body></html>")
    assert text == "a b c"


def test_plain_wrapper_fallback():
    text, _ = extract_html_text("<p>only a paragraph</p>")
    assert text == "only a paragraph"


def test_sniffer():
    assert looks_like_html("<!DOCTYPE html><html>...")
    assert looks_like_html("  <div class='x'>hi</div>")
    assert not looks_like_html("plain prose with < symbols")
    assert not looks_like_html("%PDF-1.4 binary")
