"""HTML main-content extraction via DOM heuristics.

New capability (BASELINE.json ``north_star``; the reference has no
HTML handling at all). Stdlib-only: ``html.parser`` builds a tolerant
DOM; candidate scoring uses text density vs link density vs tag depth
(the classic boilerplate-removal signals from the public
Boilerpipe/Readability literature).

Extraction policy (our spec, pinned by golden tests):

- ``script/style/nav/header/footer/aside/form/noscript/iframe/
  button/svg/template/head`` subtrees are dropped outright;
- candidate containers are ``body main article div section td``;
  score = text_length − 2 × link_text_length; the winner is the
  highest score, ties broken toward the *deepest* node, then document
  order — so a tight ``<article>`` beats the ``<body>`` that merely
  contains it;
- block-level boundaries become newlines, whitespace is collapsed,
  lines that are >66% link text with fewer than 10 words are dropped
  as residual boilerplate;
- spans (character offsets into the final text) are emitted per
  output line with kind ``line``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional, Tuple

Span = Tuple[int, int, str]

BLACKLIST = frozenset(
    "script style noscript nav header footer aside form button iframe svg template head".split()
)
BLOCK_TAGS = frozenset(
    (
        "p div section article main body ul ol li table tbody thead tr td th "
        "h1 h2 h3 h4 h5 h6 blockquote pre br hr dl dt dd figure figcaption address"
    ).split()
)
VOID_TAGS = frozenset("br hr img input meta link area base col embed source track wbr".split())
CANDIDATE_TAGS = frozenset("body main article div section td".split())

_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


class _Node:
    __slots__ = ("tag", "children", "depth")

    def __init__(self, tag: str, depth: int) -> None:
        self.tag = tag
        self.children: list = []  # _Node | str
        self.depth = depth


class _DomBuilder(HTMLParser):
    """Tolerant DOM builder: unmatched end tags are ignored; unclosed
    tags are implicitly closed when an ancestor closes."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", 0)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, len(self.stack))
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, len(self.stack)))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def _measure(node: _Node, in_link: bool = False) -> Tuple[int, int]:
    """(total_text_chars, link_text_chars) under ``node``, skipping
    blacklisted subtrees; whitespace runs count as one char."""
    total = link = 0
    for child in node.children:
        if isinstance(child, str):
            n = len(_WS_RE.sub(" ", child).strip())
            total += n
            if in_link:
                link += n
        elif child.tag not in BLACKLIST:
            t, l = _measure(child, in_link or child.tag == "a")
            total += t
            link += l
    return total, link


def _collect_candidates(node: _Node, out: list) -> None:
    for child in node.children:
        if isinstance(child, _Node) and child.tag not in BLACKLIST:
            if child.tag in CANDIDATE_TAGS:
                out.append(child)
            _collect_candidates(child, out)


class _Renderer:
    """Render a subtree to lines of (text, link_char_count)."""

    def __init__(self) -> None:
        self.lines: List[Tuple[str, int]] = []
        self._buf: List[str] = []
        self._link_chars = 0

    def _flush(self) -> None:
        text = _WS_RE.sub(" ", "".join(self._buf)).strip()
        if text:
            self.lines.append((text, self._link_chars))
        self._buf = []
        self._link_chars = 0

    def render(self, node: _Node, in_link: bool = False) -> None:
        for child in node.children:
            if isinstance(child, str):
                self._buf.append(child)
                if in_link:
                    self._link_chars += len(_WS_RE.sub(" ", child).strip())
                continue
            if child.tag in BLACKLIST:
                continue
            is_block = child.tag in BLOCK_TAGS
            if is_block:
                self._flush()
            self.render(child, in_link or child.tag == "a")
            if is_block:
                self._flush()

    def result(self) -> List[Tuple[str, int]]:
        self._flush()
        return self.lines


def extract_html_text(html: str) -> Tuple[str, List[Span]]:
    """Main-content text + line spans from an HTML document."""
    builder = _DomBuilder()
    builder.feed(html)
    builder.close()
    root = builder.root

    candidates: list = []
    _collect_candidates(root, candidates)
    if not candidates:
        candidates = [root]

    best = None
    best_key = None
    for node in candidates:
        total, link = _measure(node)
        score = total - 2 * link
        key = (score, node.depth)  # deepest wins among equal scores
        if best_key is None or key > best_key:
            best, best_key = node, key

    renderer = _Renderer()
    renderer.render(best)
    kept: List[str] = []
    for text, link_chars in renderer.result():
        n = len(text)
        if n == 0:
            continue
        words = text.count(" ") + 1
        if n > 0 and link_chars / n > 0.66 and words < 10:
            continue  # residual link-farm line
        kept.append(text)

    out: List[str] = []
    spans: List[Span] = []
    offset = 0
    for i, line in enumerate(kept):
        if i > 0:
            offset += 1  # the joining newline
        spans.append((offset, offset + len(line), "line"))
        out.append(line)
        offset += len(line)
    return "\n".join(out), spans


_HTML_SNIFF_RE = re.compile(
    r"^\s*(?:<!doctype\s+html|<html[\s>]|<head[\s>]|<body[\s>]|<article[\s>]|<div[\s>]|<main[\s>])",
    re.IGNORECASE,
)


def looks_like_html(text: str) -> bool:
    return bool(_HTML_SNIFF_RE.match(text))
