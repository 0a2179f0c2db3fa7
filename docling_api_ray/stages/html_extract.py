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


def extract_main_content_reference(html: str) -> ExtractResult:
    """stdlib-HTMLParser implementation — the behavioral reference the
    fast scanner below is equivalence-tested against
    (tests/test_html_extract.py)."""
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # malformed markup: keep whatever was extracted (error-as-data is
        # decided by the caller)
        p._flush()
    return p.result


# ---------------------------------------------------------------------------
# fast scanner — same events, one compiled regex pass
# ---------------------------------------------------------------------------
#
# stdlib html.parser walks the input with many small per-token regex
# matches and python callbacks; profiling the convert actor showed it at
# ~45% of total conversion CPU.  This scanner produces the SAME event
# stream for the constructs that matter here (tags + attrs, comments,
# doctype/PI, entity-decoded text, script/style CDATA content, <br/>
# start+end) with one compiled alternation and slice arithmetic —
# ~4x faster per document, equivalence-tested against the reference
# implementation above on synthetic and adversarial inputs.

import re as _re
from html import unescape as _unescape

# anchored alternation over html.parser's non-starttag construct
# grammar: comments, marked sections, declarations, processing
# instructions, end tags (strict endtagfind shape with optional leading
# whitespace, then the tolerant junk-after-name shape, then bogus
# </…> consumed silently).  Start tags are parsed separately below with
# the stdlib's own tolerant grammar.  Only terminated constructs match —
# an unterminated one falls to the "incomplete" branch of the scan loop,
# matching html.parser's goahead(end=1) semantics.
_MARKUP_RE = _re.compile(
    r"<!--.*?-->"
    r"|<!(?!--|\[)[^>]*>"        # declarations / bogus <! comments — but
                                 # an unterminated comment must NOT fall
                                 # through (marked sections <![ are
                                 # handled explicitly in the scan loop)
    r"|<\?[^>]*>"
    r"|<(/)\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>"      # strict end tag
    r"|<(/)([a-zA-Z][^\t\n\r\f />\x00]*)[^>]*>"    # tolerant end tag
    r"|</[^>]*>",                # bogus end tag → silent (comment event)
    _re.DOTALL,
)
# marked sections (<![CDATA[ … ]]>, <![if …]>) — _markupbase grammar:
# known keyword → matching close pattern; unknown keyword → the stdlib
# parser raises (our reference wrapper catches and stops), replicated as
# an abort in the scan loop
_DECLNAME_RE = _re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_MS_CLOSE_SGML = _re.compile(r"]\s*]\s*>")  # temp/cdata/ignore/include/rcdata
_MS_CLOSE_MS = _re.compile(r"]\s*>")  # if/else/endif
_MS_SGML_KEYWORDS = frozenset(
    {"temp", "cdata", "ignore", "include", "rcdata"}
)
_MS_MS_KEYWORDS = frozenset({"if", "else", "endif"})
# verbatim shape of html.parser's locatestarttagend_tolerant /
# attrfind_tolerant — the behavioral spec for start-tag extent and
# attribute parsing
_STARTTAG_END_RE = _re.compile(
    r"<[a-zA-Z][^\t\n\r\f />\x00]*"
    r"(?:[\s/]*"
    r"(?:(?<=['\"\s/])[^\s/>][^\s/=>]*"
    r"(?:\s*=+\s*"
    r"(?:'[^']*'"
    r"|\"[^\"]*\""
    r"|(?!['\"])[^>\s]*"
    r")"
    r"(?:\s*,)*"
    r")?(?:\s|/(?!>))*"
    r")*"
    r")?"
    r"\s*"
)
_TAGNAME_RE = _re.compile(
    r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*"
)
_LETTERS_EQ = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ="
)
_ATTR_RE = _re.compile(
    r"((?<=['\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"('[^']*'|\"[^\"]*\"|(?!['\"])[^>\s]*))?(?:\s|/(?!>))*"
)
# script/style content is CDATA: no markup inside, runs to the matching
# close tag (html.parser behavior)
_RAWTEXT_CLOSE = {
    "script": _re.compile(r"</\s*script", _re.IGNORECASE),
    "style": _re.compile(r"</\s*style", _re.IGNORECASE),
}
_HAS_ENTITY_RE = _re.compile(r"&")


def extract_main_content(html: str) -> ExtractResult:
    drop_depth = 0
    a_depth = 0
    buf: list[str] = []
    chars = 0
    link_chars = 0
    result = ExtractResult()

    def flush() -> None:
        nonlocal chars, link_chars
        raw = "".join(buf)
        buf.clear()
        c, lc = chars, link_chars
        chars = link_chars = 0
        text = " ".join(raw.split())
        if not text:
            return
        seg = Segment(text, c, lc)
        if seg.link_density > LINK_DENSITY_MAX:
            result.dropped += 1
        else:
            result.segments.append(seg)

    def data(s: str) -> None:
        # one html.parser data-chunk: the scan loop's chunk boundaries
        # already match the stdlib's (text runs stop at every "<")
        nonlocal chars, link_chars
        if drop_depth or not s:
            return
        if _HAS_ENTITY_RE.search(s):
            s = _unescape(s)
        buf.append(s)
        n = len(s.strip())
        chars += n
        if a_depth:
            link_chars += n

    def starttag(tag: str, src_val: str | None) -> None:
        nonlocal drop_depth, a_depth
        if tag in _DROP_TAGS:
            flush()
            drop_depth += 1
            return
        if drop_depth:
            return
        if tag == "a":
            a_depth += 1
        elif tag == "img":
            result.images.append(src_val or "")
        if tag in _BLOCK_TAGS:
            flush()

    def endtag(tag: str) -> None:
        nonlocal drop_depth, a_depth
        if tag in _DROP_TAGS:
            if drop_depth:
                drop_depth -= 1
            return
        if drop_depth:
            return
        if tag == "a" and a_depth:
            a_depth -= 1
        if tag in _BLOCK_TAGS:
            flush()

    pos = 0
    n = len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            data(html[pos:])
            break
        if lt > pos:
            data(html[pos:lt])
        pos = lt

        def incomplete() -> int:
            # unterminated construct: html.parser (goahead with end=1)
            # emits raw text up to and INCLUDING the next ">", else up
            # to the next "<", else one char — as ONE data chunk — and
            # resumes parsing after it
            gt = html.find(">", pos + 1)
            if gt >= 0:
                k = gt + 1
            else:
                lt2 = html.find("<", pos + 1)
                k = lt2 if lt2 >= 0 else pos + 1
            data(html[pos:k])
            return k

        c0 = html[pos + 1 : pos + 2]
        if c0 and (c0.isalpha() or c0 in "!/?"):
            if c0.isalpha():
                # ---- start tag: html.parser's tolerant grammar -------
                lm = _STARTTAG_END_RE.match(html, pos)
                j = lm.end()
                nxt = html[j : j + 1]
                if nxt == ">":
                    endpos = j + 1
                elif nxt == "/" and html.startswith("/>", j):
                    endpos = j + 2
                elif nxt == "" or nxt == "/" or nxt in _LETTERS_EQ:
                    pos = incomplete()
                    continue
                else:
                    endpos = j  # junk between attrs and ">"
                nm = _TAGNAME_RE.match(html, pos + 1)
                tag = nm.group(1).lower()
                k = nm.end()
                src_val: str | None = None
                while k < endpos:
                    am = _ATTR_RE.match(html, k)
                    if am is None:
                        break
                    if am.group(1).lower() == "src":
                        v = am.group(3)
                        if v is None:
                            src_val = None
                        else:
                            if v[:1] == "'" == v[-1:] or v[:1] == '"' == v[-1:]:
                                v = v[1:-1]
                            src_val = _unescape(v) if v else v
                    k = am.end()
                tail = html[k:endpos].strip()
                if tail not in (">", "/>"):
                    # junk start tag: stdlib emits the raw text as data
                    data(html[pos:endpos])
                    pos = endpos
                    continue
                pos = endpos
                starttag(tag, src_val)
                if tail == "/>":  # startendtag: start + end
                    endtag(tag)
                elif tag in _RAWTEXT_CLOSE and drop_depth:
                    # CDATA content: skip straight to the close tag so
                    # markup inside script/style text can't corrupt the
                    # drop depth
                    c = _RAWTEXT_CLOSE[tag].search(html, pos)
                    pos = c.start() if c else n
                continue
            if html.startswith("<![", pos):
                # marked section, _markupbase semantics
                if pos + 3 >= n:
                    pos = incomplete()  # bare "<![" at end of input
                    continue
                nm = _DECLNAME_RE.match(html, pos + 3)
                if nm is not None and nm.end() == n:
                    # name runs to end of input: stdlib _scan_name
                    # reports end-of-buffer → incomplete, not an error
                    pos = incomplete()
                    continue
                name = nm.group().strip().lower() if nm else None
                if name in _MS_SGML_KEYWORDS:
                    c = _MS_CLOSE_SGML.search(html, pos + 3)
                elif name in _MS_MS_KEYWORDS:
                    c = _MS_CLOSE_MS.search(html, pos + 3)
                else:
                    # unknown keyword: stdlib parser raises; the
                    # reference wrapper catches + flushes — replicate
                    flush()
                    return result
                if c is None:
                    pos = incomplete()
                else:
                    pos = c.end()
                continue
            m = _MARKUP_RE.match(html, pos)
            if m is None:
                pos = incomplete()
                continue
            pos = m.end()
            tag = m.group(2) or m.group(4)
            if tag:  # close tag (strict or tolerant shape)
                endtag(tag.lower())
            # else: comment / declaration / PI / bogus end tag — no event
            continue
        data("<")  # stray "<": its own data chunk, advance one
        pos += 1
    flush()
    return result
