"""HTML boilerplate stripping + main-content scoring (SURVEY.md §2.2 M11).

The reference delegates HTML→Markdown wholly to docling's BeautifulSoup
backend (poetry.lock:68; format declared utils.py:30,45).  This engine
implements the extraction itself with Readability/Boilerpipe-style DOM
heuristics over the stdlib ``html.parser`` (no bs4 in the sandbox):

- structural priors: ``script style noscript template nav aside header
  footer form button svg`` subtrees are boilerplate;
- segment granularity: text accumulates into paragraph-level segments,
  flushed at block-tag boundaries;
- link-density scoring: a segment whose anchor-text share exceeds
  LINK_DENSITY_MAX is boilerplate (navigation/footer link walls);
- ``<img>`` elements in content position become picture items so the
  interleaved span model (§1.2) carries media refs for HTML docs too.

Pure-python per-row parse — called from ``map_batches`` in the convert
stage; the parse is the real per-document work (the analog of docling's
backend), not incidental row iteration.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

LINK_DENSITY_MAX = 0.33

_DROP_TAGS = {
    "script", "style", "noscript", "template", "nav", "aside", "header",
    "footer", "form", "button", "svg", "iframe", "head", "title",
}
_BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "pre",
    "blockquote", "div", "main", "article", "section", "body", "ul", "ol",
    "table", "tr", "figure", "figcaption", "br", "hr",
}


@dataclass
class Segment:
    text: str
    chars: int
    link_chars: int

    @property
    def link_density(self) -> float:
        return self.link_chars / self.chars if self.chars else 0.0


@dataclass
class ExtractResult:
    segments: list[Segment] = field(default_factory=list)  # kept, in order
    dropped: int = 0  # segments rejected by link-density scoring
    images: list[str] = field(default_factory=list)  # <img src> in content

    @property
    def main_text(self) -> str:
        return " ".join(s.text for s in self.segments)


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.drop_depth = 0
        self.a_depth = 0
        self._buf: list[str] = []
        self._chars = 0
        self._link_chars = 0
        self.result = ExtractResult()

    def _flush(self) -> None:
        raw = "".join(self._buf)
        self._buf.clear()
        chars, link_chars = self._chars, self._link_chars
        self._chars = self._link_chars = 0
        text = " ".join(raw.split())
        if not text:
            return
        seg = Segment(text, chars, link_chars)
        if seg.link_density > LINK_DENSITY_MAX:
            self.result.dropped += 1
        else:
            self.result.segments.append(seg)

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._flush()
            self.drop_depth += 1
            return
        if self.drop_depth:
            return
        if tag == "a":
            self.a_depth += 1
        elif tag == "img":
            src = dict(attrs).get("src", "")
            self.result.images.append(src or "")
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            if self.drop_depth:
                self.drop_depth -= 1
            return
        if self.drop_depth:
            return
        if tag == "a" and self.a_depth:
            self.a_depth -= 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self.drop_depth or not data:
            return
        self._buf.append(data)
        n = len(data.strip())
        self._chars += n
        if self.a_depth:
            self._link_chars += n

    def close(self):
        super().close()
        self._flush()


def extract_main_content(html: str) -> ExtractResult:
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # malformed markup: keep whatever was extracted (error-as-data is
        # decided by the caller)
        p._flush()
    return p.result
