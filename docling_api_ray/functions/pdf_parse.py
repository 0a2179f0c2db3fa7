"""Programmatic-PDF text extraction — pure python, no models.

The reference's PDF pipeline delegates parsing to docling-parse
(reference service.py:76-78; poetry.lock:503), a C++ content-stream
parser, before any layout/OCR model runs.  This module is the engine's
analog of that *parsing* tier: it reads a genuine PDF produced by a real
writer — classic xref tables or cross-reference streams, FlateDecode'd
content streams, objects packed in object streams — and extracts the
text shown by the content-stream text operators, in stream order.

What it implements (PDF 32000-1:2008, public spec):

- object scan: every ``N G obj … endobj`` in the file, plus objects
  embedded in ``/Type /ObjStm`` object streams (how modern writers emit
  most objects).  Scanning by pattern rather than trusting the xref
  table also survives mildly damaged files — same robustness choice real
  extractors make.
- minimal object model: dicts ``<<…>>``, arrays, names, numbers,
  literal ``(…)`` and hex ``<…>`` strings, booleans/null, indirect
  references ``N G R`` (resolved lazily).
- page tree: trailer/catalog ``/Root`` → ``/Pages`` → recursive
  ``/Kids`` walk in document order (cycle-guarded); per page the
  ``/Contents`` stream(s), concatenated in order as the spec requires.
- stream filters: ``FlateDecode`` (zlib) and ``ASCIIHexDecode``; other
  filters raise a clear error rather than emitting garbage.
- text operators: ``BT``/``ET`` blocks; ``Tj``, ``'``, ``"`` (string
  show), ``TJ`` (array show — kerning numbers dropped, strings joined);
  line breaks from ``Td``/``TD``/``T*``/``'``/``"``; ``Tm`` treated as
  a positioning reset (new line).  Strings decode PDF escapes
  (``\\n \\( \\ddd`` …) and UTF-16BE with BOM; single-byte text falls
  back to Latin-1 — without font ``/ToUnicode`` CMaps (a model-free but
  font-file-deep feature) this matches what the simple text extractors
  (pypdf's fallback path) produce for the overwhelmingly common
  WinAnsi/standard-font case.

Out of scope, by design: layout analysis, reading-order inference
across columns, table structure, OCR — those are the model tiers
(docling-layout/tableformer/easyocr, reference Dockerfile:31-36) that
stay behind the documented stub boundary in stages/convert.py.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass


class PdfParseError(Exception):
    """Structurally unreadable PDF (no catalog, bad container)."""


# ---------------------------------------------------------------------------
# object model
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Ref:
    num: int
    gen: int


@dataclass
class Name:
    value: str

    def __hash__(self) -> int:  # usable as dict key
        return hash(("Name", self.value))

    def __eq__(self, other) -> bool:
        return isinstance(other, Name) and other.value == self.value


@dataclass
class StreamObj:
    """A stream object: its dict + raw (still-encoded) bytes."""

    dict: dict
    raw: bytes


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Tokenizer over a PDF object / content stream body."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment runs to EOL
                eol = d.find(b"\n", self.pos)
                self.pos = len(d) if eol < 0 else eol + 1
            else:
                return

    def peek_byte(self) -> int | None:
        self._skip_ws()
        return self.data[self.pos] if self.pos < len(self.data) else None

    # ---- object-level values ------------------------------------------
    def read_value(self):
        """One PDF value; indirect refs are recognized by lookahead."""
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise PdfParseError("unexpected end of data")
        c = d[self.pos]
        if c == 0x2F:  # /Name
            return self._read_name()
        if c == 0x28:  # (string)
            return self._read_literal_string()
        if c == 0x3C:  # << dict >> or <hex>
            if d[self.pos : self.pos + 2] == b"<<":
                return self._read_dict()
            return self._read_hex_string()
        if c == 0x5B:  # [ array ]
            return self._read_array()
        if c in b"+-.0123456789":
            return self._read_number_or_ref()
        word = self._read_keyword()
        if word == b"true":
            return True
        if word == b"false":
            return False
        if word == b"null":
            return None
        raise PdfParseError(f"unexpected token {word!r} at {self.pos}")

    def _read_keyword(self) -> bytes:
        d, start = self.data, self.pos
        while self.pos < len(d) and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:
            self.pos += 1  # lone delimiter — consume to make progress
        return d[start : self.pos]

    def _read_name(self) -> Name:
        d = self.data
        self.pos += 1  # '/'
        out = bytearray()
        while self.pos < len(d):
            c = d[self.pos]
            if c in _WS or c in _DELIM:
                break
            if c == 0x23 and self.pos + 2 < len(d):  # #xx hex escape
                try:
                    out.append(int(d[self.pos + 1 : self.pos + 3], 16))
                    self.pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            self.pos += 1
        return Name(out.decode("latin-1"))

    def _read_number_or_ref(self):
        d = self.data
        start = self.pos
        while self.pos < len(d) and d[self.pos] in b"+-.0123456789":
            self.pos += 1
        tok = d[start : self.pos]
        if b"." in tok:
            return float(tok)
        val = int(tok)
        # indirect reference lookahead: INT INT R
        save = self.pos
        self._skip_ws()
        start2 = self.pos
        while self.pos < len(d) and d[self.pos] in b"0123456789":
            self.pos += 1
        tok2 = d[start2 : self.pos]
        if tok2:
            save2 = self.pos
            self._skip_ws()
            if d[self.pos : self.pos + 1] == b"R" and (
                self.pos + 1 >= len(d)
                or d[self.pos + 1] in _WS
                or d[self.pos + 1] in _DELIM
            ):
                self.pos += 1
                return Ref(val, int(tok2))
            self.pos = save2
        self.pos = save
        return val

    def _read_literal_string(self) -> bytes:
        d = self.data
        self.pos += 1  # '('
        out = bytearray()
        depth = 1
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash escape
                self.pos += 1
                if self.pos >= len(d):
                    break
                e = d[self.pos]
                mapped = {
                    0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                    0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C,
                }.get(e)
                if mapped is not None:
                    out.append(mapped)
                    self.pos += 1
                elif e in b"01234567":  # \ddd octal, 1-3 digits
                    oct_digits = bytearray([e])
                    self.pos += 1
                    while (
                        len(oct_digits) < 3
                        and self.pos < len(d)
                        and d[self.pos] in b"01234567"
                    ):
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and d[self.pos : self.pos + 1] == b"\n":
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    break
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        return bytes(out)

    def _read_hex_string(self) -> bytes:
        d = self.data
        self.pos += 1  # '<'
        end = d.find(b">", self.pos)
        if end < 0:
            raise PdfParseError("unterminated hex string")
        hex_digits = re.sub(rb"[^0-9A-Fa-f]", b"", d[self.pos : end])
        self.pos = end + 1
        if len(hex_digits) % 2:
            hex_digits += b"0"  # spec: odd final digit padded with 0
        return bytes.fromhex(hex_digits.decode("ascii"))

    def _read_array(self) -> list:
        self.pos += 1  # '['
        out = []
        while True:
            self._skip_ws()
            if self.pos >= len(self.data):
                raise PdfParseError("unterminated array")
            if self.data[self.pos] == 0x5D:
                self.pos += 1
                return out
            out.append(self.read_value())

    def _read_dict(self) -> dict:
        self.pos += 2  # '<<'
        out: dict = {}
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            if self.pos >= len(self.data):
                raise PdfParseError("unterminated dict")
            key = self.read_value()
            if not isinstance(key, Name):
                raise PdfParseError(f"dict key is not a name: {key!r}")
            out[key.value] = self.read_value()


# ---------------------------------------------------------------------------
# document: object table, page tree, stream decode
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+obj\b")


class PdfDocument:
    def __init__(self, data: bytes) -> None:
        if not data.lstrip(b"\x00")[:5].startswith(b"%PDF-"):
            raise PdfParseError("missing %PDF header")
        self.data = data
        self.objects: dict[int, object] = {}
        self._scan_objects()
        self._expand_object_streams()

    # ---- object table -------------------------------------------------
    def _scan_objects(self) -> None:
        d = self.data
        for m in _OBJ_RE.finditer(d):
            num = int(m.group(1))
            lex = _Lexer(d, m.end())
            try:
                value = lex.read_value()
            except PdfParseError:
                continue
            lex._skip_ws()
            if d[lex.pos : lex.pos + 6] == b"stream":
                if not isinstance(value, dict):
                    continue
                start = lex.pos + 6
                if d[start : start + 2] == b"\r\n":
                    start += 2
                elif d[start : start + 1] == b"\n":
                    start += 1
                length = value.get("Length")
                if isinstance(length, Ref):
                    length = self._scan_length_ref(length)
                if isinstance(length, int) and 0 <= length <= len(d) - start:
                    end = start + length
                    # trust /Length only when endstream actually follows
                    tail = d[end : end + 11 + 2].lstrip(b"\r\n")
                    if not tail.startswith(b"endstream"):
                        end = d.find(b"endstream", start)
                else:
                    end = d.find(b"endstream", start)
                if end < 0:
                    continue
                value = StreamObj(value, d[start:end].rstrip(b"\r\n"))
            # later definitions (incremental updates) win: finditer is
            # in file order, so plain overwrite implements that
            self.objects[num] = value

    def _scan_length_ref(self, ref: Ref) -> int | None:
        """Resolve an indirect /Length during the initial scan — the
        target is a plain integer object findable by its own header."""
        m = re.search(
            rb"(?<![0-9])%d[\x00\t\n\x0c\r ]+%d[\x00\t\n\x0c\r ]+obj\b"
            % (ref.num, ref.gen),
            self.data,
        )
        if not m:
            return None
        try:
            v = _Lexer(self.data, m.end()).read_value()
        except PdfParseError:
            return None
        return v if isinstance(v, int) else None

    def _expand_object_streams(self) -> None:
        """Objects packed in /Type /ObjStm streams (PDF 1.5+ writers):
        header is N pairs of (objnum, offset), offsets relative to
        /First."""
        for obj in list(self.objects.values()):
            if not isinstance(obj, StreamObj):
                continue
            t = obj.dict.get("Type")
            if not (isinstance(t, Name) and t.value == "ObjStm"):
                continue
            try:
                content = self.decode_stream(obj)
                n = self.resolve(obj.dict.get("N"))
                first = self.resolve(obj.dict.get("First"))
                if not (isinstance(n, int) and isinstance(first, int)):
                    continue
                header = _Lexer(content, 0)
                pairs = []
                for _ in range(n):
                    num = header.read_value()
                    off = header.read_value()
                    pairs.append((num, off))
                for num, off in pairs:
                    if not isinstance(num, int) or not isinstance(off, int):
                        continue
                    try:
                        val = _Lexer(content, first + off).read_value()
                    except PdfParseError:
                        continue
                    # file-level definitions take precedence over ObjStm
                    # re-definitions only if they came later; simple rule:
                    # don't clobber an existing direct object
                    self.objects.setdefault(num, val)
            except PdfParseError:
                continue

    # ---- resolution ---------------------------------------------------
    def resolve(self, v, _depth: int = 0):
        while isinstance(v, Ref):
            if _depth > 32:
                raise PdfParseError("reference cycle")
            v = self.objects.get(v.num)
            _depth += 1
        return v

    # ---- stream decoding ----------------------------------------------
    def decode_stream(self, s: StreamObj) -> bytes:
        filters = self.resolve(s.dict.get("Filter"))
        if filters is None:
            chain: list[Name] = []
        elif isinstance(filters, Name):
            chain = [filters]
        elif isinstance(filters, list):
            chain = [self.resolve(f) for f in filters]
        else:
            raise PdfParseError(f"bad /Filter: {filters!r}")
        all_parms = self.resolve(s.dict.get("DecodeParms"))
        if not isinstance(all_parms, list):
            all_parms = [all_parms] + [None] * (len(chain) - 1)
        out = s.raw
        for i, f in enumerate(chain):
            name = f.value if isinstance(f, Name) else str(f)
            if name in ("FlateDecode", "Fl"):
                try:
                    out = zlib.decompress(out)
                except zlib.error as e:
                    # real writers occasionally leave trailing garbage;
                    # decompress what's there
                    try:
                        out = zlib.decompressobj().decompress(out)
                    except zlib.error:
                        raise PdfParseError(f"flate error: {e}") from e
                parms = self.resolve(all_parms[i]) if i < len(all_parms) else None
                if parms:
                    out = self._undo_predictor(out, parms)
            elif name in ("ASCIIHexDecode", "AHx"):
                hex_digits = re.sub(rb"[^0-9A-Fa-f]", b"", out.split(b">")[0])
                if len(hex_digits) % 2:
                    hex_digits += b"0"
                out = bytes.fromhex(hex_digits.decode("ascii"))
            else:
                raise PdfParseError(f"unsupported stream filter {name}")
        return out

    def _undo_predictor(self, data: bytes, params) -> bytes:
        if not isinstance(params, dict):
            return data
        pred = self.resolve(params.get("Predictor", 1))
        if not isinstance(pred, int) or pred < 10:
            return data  # 1/2 = none/TIFF — TIFF unseen in xref streams
        colors = self.resolve(params.get("Colors", 1)) or 1
        bpc = self.resolve(params.get("BitsPerComponent", 8)) or 8
        columns = self.resolve(params.get("Columns", 1)) or 1
        bpp = max(1, (colors * bpc) // 8)
        rowlen = bpp * columns
        out = bytearray()
        prev = bytearray(rowlen)
        pos = 0
        while pos + 1 + rowlen <= len(data) + rowlen and pos < len(data):
            ft = data[pos]
            row = bytearray(data[pos + 1 : pos + 1 + rowlen])
            pos += 1 + rowlen
            if ft == 1:  # Sub
                for i in range(bpp, len(row)):
                    row[i] = (row[i] + row[i - bpp]) & 0xFF
            elif ft == 2:  # Up
                for i in range(len(row)):
                    row[i] = (row[i] + prev[i]) & 0xFF
            elif ft == 3:  # Average
                for i in range(len(row)):
                    left = row[i - bpp] if i >= bpp else 0
                    row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
            elif ft == 4:  # Paeth
                for i in range(len(row)):
                    a = row[i - bpp] if i >= bpp else 0
                    b = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    best = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row[i] = (row[i] + best) & 0xFF
            out += row
            prev = row
        return bytes(out)

    # ---- page tree ----------------------------------------------------
    def _catalog(self) -> dict:
        # classic trailers first (last one wins — incremental updates)
        for m in re.finditer(rb"trailer", self.data):
            try:
                t = _Lexer(self.data, m.end()).read_value()
            except PdfParseError:
                continue
            if isinstance(t, dict) and "Root" in t:
                root = self.resolve(t["Root"])
                if isinstance(root, dict):
                    return root
        # xref-stream files: the catalog is an object with /Type /Catalog
        for obj in self.objects.values():
            d = obj.dict if isinstance(obj, StreamObj) else obj
            if isinstance(d, dict):
                t = d.get("Type")
                if isinstance(t, Name) and t.value == "Catalog":
                    return d
        raise PdfParseError("no document catalog")

    def pages(self) -> list[dict]:
        """Page dicts in document order (recursive /Kids walk)."""
        cat = self._catalog()
        root = self.resolve(cat.get("Pages"))
        out: list[dict] = []
        seen: set[int] = set()

        def walk(node) -> None:
            node = self.resolve(node)
            if not isinstance(node, dict) or id(node) in seen:
                return
            seen.add(id(node))
            t = node.get("Type")
            tname = t.value if isinstance(t, Name) else None
            if tname == "Page":
                out.append(node)
                return
            kids = self.resolve(node.get("Kids"))
            if isinstance(kids, list):
                for k in kids:
                    walk(k)

        walk(root)
        if not out:
            raise PdfParseError("page tree has no pages")
        return out

    def page_content(self, page: dict) -> bytes:
        """A page's content stream bytes, /Contents array concatenated in
        order with the spec-mandated whitespace joint."""
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        parts = contents if isinstance(contents, list) else [contents]
        chunks = []
        for p in parts:
            s = self.resolve(p)
            if isinstance(s, StreamObj):
                chunks.append(self.decode_stream(s))
        return b"\n".join(chunks)


# ---------------------------------------------------------------------------
# content-stream text extraction
# ---------------------------------------------------------------------------

def _decode_pdf_string(b: bytes) -> str:
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1")


def extract_page_text(content: bytes) -> list[str]:
    """Text lines shown by one page's content stream, in stream order.

    The operand stack is replayed: string/number/array operands
    accumulate until an operator keyword consumes them.  Line structure
    comes from the text-positioning operators (``Td``/``TD``/``T*`` and
    the ``'``/``"`` shorthands start a new line; ``Tm`` resets
    positioning, treated as a line break)."""
    lex = _Lexer(content, 0)
    operands: list = []
    lines: list[str] = []
    cur: list[str] = []
    in_text = False

    def flush() -> None:
        if cur:
            line = "".join(cur).strip()
            if line:
                lines.append(line)
            cur.clear()

    d = content
    while True:
        lex._skip_ws()
        if lex.pos >= len(d):
            break
        c = d[lex.pos]
        if c in b"/(<[+-.0123456789":
            # dict operands ( << >> in BDC/DP ) parse as values too
            try:
                operands.append(lex.read_value())
            except PdfParseError:
                lex.pos += 1
            continue
        if c == 0x5D or c == 0x3E:  # stray ] or > — resync
            lex.pos += 1
            continue
        op = lex._read_keyword()
        if op == b"BT":
            in_text = True
            operands.clear()
            continue
        if op == b"ET":
            flush()
            in_text = False
            operands.clear()
            continue
        if not in_text:
            if op == b"BI":  # inline image: skip to EI
                end = d.find(b"EI", lex.pos)
                lex.pos = len(d) if end < 0 else end + 2
            operands.clear()
            continue
        if op == b"Tj":
            if operands and isinstance(operands[-1], bytes):
                cur.append(_decode_pdf_string(operands[-1]))
        elif op == b"TJ":
            if operands and isinstance(operands[-1], list):
                for el in operands[-1]:
                    if isinstance(el, bytes):
                        cur.append(_decode_pdf_string(el))
        elif op in (b"'", b'"'):
            flush()
            if operands and isinstance(operands[-1], bytes):
                cur.append(_decode_pdf_string(operands[-1]))
        elif op in (b"Td", b"TD", b"T*", b"Tm"):
            flush()
        operands.clear()
    flush()
    return lines


def extract_text_lines(payload: bytes) -> list[list[str]]:
    """Whole document → per-page lists of text lines (the parser's
    public surface; stages/convert.py turns these into Items)."""
    doc = PdfDocument(payload)
    return [extract_page_text(doc.page_content(p)) for p in doc.pages()]
