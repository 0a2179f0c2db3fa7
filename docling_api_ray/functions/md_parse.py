"""Structural Markdown / AsciiDoc parsers (SURVEY.md §2.3 A5).

The reference converts Markdown via docling's marko-based backend and
AsciiDoc via its asciidoc backend (poetry.lock:1073; formats enumerated
utils.py:8-14).  These pure-python parsers re-express the structural
subset the engine's span model carries: block segmentation (blank-line
separated), ATX headings, pipe tables, image references, fenced code
blocks — each block becoming one reading-order ``Item`` exactly as
docling's ``iterate_items()`` walk yields one element per block
(service.py:48).

Parsing is line-structured with a single stateful scan (fences and
asciidoc ``|===`` table delimiters span blank lines, so a naive
split-on-blank-lines breaks); everything else is vectorizable upstream —
these run inside the convert actor per document, where the parse IS the
work.
"""

from __future__ import annotations

import re

from docling_api_ray.functions.spans import Item

_MD_IMAGE_RE = re.compile(r"!\[[^\]]*\]\([^)]*\)")
_MD_HEADING_RE = re.compile(r"(#{1,6})\s+(.*)")
_ADOC_HEADING_RE = re.compile(r"(={1,6})\s+(.*)")
_ADOC_IMAGE_RE = re.compile(r"image::[^\[]+\[[^\]]*\]")


def _blocks_markdown(text: str) -> list[list[str]]:
    """Blank-line separated blocks; fenced code blocks (``` / ~~~) keep
    their interior blank lines."""
    blocks: list[list[str]] = []
    cur: list[str] = []
    fence: str | None = None
    for line in text.split("\n"):
        stripped = line.strip()
        if fence is not None:
            cur.append(line)
            if stripped.startswith(fence):
                fence = None
            continue
        if stripped.startswith("```") or stripped.startswith("~~~"):
            if cur:
                blocks.append(cur)
            cur = [line]
            fence = stripped[:3]
            continue
        if not stripped:
            if cur:
                blocks.append(cur)
                cur = []
            continue
        cur.append(line)
    if cur:
        blocks.append(cur)
    return blocks


def classify_md_block(lines: list[str]) -> str:
    """'heading' | 'table' | 'image' | 'code' | 'paragraph'."""
    first = lines[0].strip()
    if first.startswith("```") or first.startswith("~~~"):
        return "code"
    if _MD_HEADING_RE.fullmatch(first) and len(lines) == 1:
        return "heading"
    if all(ln.strip().startswith("|") for ln in lines) and len(lines) >= 2:
        return "table"
    if len(lines) == 1 and _MD_IMAGE_RE.fullmatch(first):
        return "image"
    return "paragraph"


def parse_markdown(text: str) -> list[Item]:
    """Markdown → reading-order items.  Headings/paragraphs/code keep
    their raw block text (docling's markdown serialization round-trips
    them); pipe tables become table items carrying the table markdown;
    standalone image references become picture items."""
    items: list[Item] = []
    for lines in _blocks_markdown(text):
        kind = classify_md_block(lines)
        body = "\n".join(lines)
        if kind == "table":
            items.append(Item("table", body, True))
        elif kind == "image":
            items.append(Item("picture", "", True))
        else:  # heading / paragraph / code are all text stream blocks
            items.append(Item("text", body))
    return items


def parse_asciidoc(text: str) -> list[Item]:
    """AsciiDoc → reading-order items: ``=`` headings, paragraphs,
    ``|===`` delimited tables, ``image::target[]`` macros.  Tables are
    normalized to pipe-table markdown — docling serializes every table
    into the markdown stream the same way, whatever the source format."""
    from docling_api_ray.functions.ooxml import _grid_to_markdown

    items: list[Item] = []
    cur: list[str] = []
    table: list[str] | None = None

    def flush() -> None:
        nonlocal cur
        if cur:
            items.append(Item("text", "\n".join(cur)))
            cur = []

    for line in text.split("\n"):
        stripped = line.strip()
        if table is not None:
            if stripped == "|===":
                grid = [
                    [c.strip() for c in ln.strip().lstrip("|").split("|")]
                    for ln in table
                    if ln.strip().startswith("|")
                ]
                items.append(Item("table", _grid_to_markdown(grid), True))
                table = None
            else:
                table.append(line)
            continue
        if stripped == "|===":
            flush()
            table = []
            continue
        if not stripped:
            flush()
            continue
        if _ADOC_IMAGE_RE.fullmatch(stripped):
            flush()
            items.append(Item("picture", "", True))
            continue
        cur.append(line)
    flush()
    if table is not None:  # unterminated table block → keep as text
        items.append(Item("text", "\n".join(["|==="] + table)))
    return items


def markdown_structure(text: str) -> dict[str, int]:
    """Block-kind census of a markdown document (md_structure query)."""
    counts = {
        "n_headings": 0,
        "n_paragraphs": 0,
        "n_tables": 0,
        "n_images": 0,
        "n_code_blocks": 0,
    }
    keymap = {
        "heading": "n_headings",
        "paragraph": "n_paragraphs",
        "table": "n_tables",
        "image": "n_images",
        "code": "n_code_blocks",
    }
    for lines in _blocks_markdown(text):
        counts[keymap[classify_md_block(lines)]] += 1
    return counts
