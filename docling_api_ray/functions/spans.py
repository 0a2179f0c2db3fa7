"""Span assembly + markdown rendering (SURVEY.md §2.2 M6-M8).

Reference semantics reproduced exactly (document_converter/service.py:41-66):

- items are walked in document reading order (service.py:48);
- per-document 1-based counters name media ``table-{n}.png`` /
  ``picture-{n}.png`` in iteration order — counters advance only for items
  that actually carry an image (``element.image`` truthy, service.py:49);
- the markdown stream serializes text blocks and *tables as markdown text*,
  while pictures appear as the literal placeholder ``<!-- image -->``
  (ImageRefMode.PLACEHOLDER, service.py:46);
- each picture-with-image then substitutes the FIRST remaining occurrence of
  the placeholder string (``content_md.replace("<!-- image -->", name, 1)``,
  service.py:61).  This is bug-compatible: a document whose *text* contains
  the literal placeholder, or an imageless picture earlier in the stream,
  shifts the substitution target.  Tables never substitute placeholders
  (service.py:57-61) — they are media-list-only.

Engine representation: the interleaving is an explicit ordered ``spans``
list column (kind, text, media_ref, offset) per §1.2, so order is
verifiable without string surgery; ``render_markdown`` reproduces the
reference's byte-exact string for fixture comparison.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import zlib

from docling_api_ray.functions.png import make_png

PLACEHOLDER = "<!-- image -->"


def stable_seed(key: object) -> int:
    """Process- and batching-stable PNG seed for a document identity —
    the ONE seed derivation shared by every conversion path (Dataset
    pipelines key on doc_id; the convenience API keys on filename unless
    given a doc_id), so identical identities yield identical media
    bytes everywhere."""
    return zlib.crc32(str(key).encode()) & 0x7FFFFFFF


@dataclass
class Item:
    """One document item in reading order — the engine's stand-in for the
    reference's iterate_items() element (service.py:48)."""

    kind: str  # "text" | "table" | "picture"
    text: str = ""  # body for text items; markdown table text for tables
    has_image: bool = False


@dataclass
class AssembledDoc:
    spans: list[dict] = field(default_factory=list)
    media: list[dict] = field(default_factory=list)
    markdown: str = ""


def assemble_spans(
    items: list[Item],
    *,
    extract_tables_as_images: bool = False,
    image_resolution_scale: int = 1,
    png_seed: int = 0,
) -> AssembledDoc:
    """items → (spans, media, markdown) under reference counter/placeholder
    semantics.  ``extract_tables_as_images`` gates table PNG payloads the
    way ``generate_table_images`` does (service.py:35); table media refs are
    still counted/named whenever the table carries an image, matching the
    reference where the flag controls whether ``element.image`` exists at
    all for tables."""
    spans: list[dict] = []
    media: list[dict] = []
    table_counter = 0
    picture_counter = 0
    for off, item in enumerate(items):
        if item.kind == "text":
            spans.append(
                {"kind": "text", "text": item.text, "media_ref": "", "offset": off}
            )
        elif item.kind == "table":
            ref = ""
            has_img = item.has_image and extract_tables_as_images
            if has_img:
                table_counter += 1
                ref = f"table-{table_counter}.png"
                media.append(
                    {
                        "kind": "table",
                        "filename": ref,
                        "png": make_png(png_seed + off, image_resolution_scale),
                    }
                )
            spans.append(
                {"kind": "table", "text": item.text, "media_ref": ref, "offset": off}
            )
        elif item.kind == "picture":
            ref = ""
            if item.has_image:
                picture_counter += 1
                ref = f"picture-{picture_counter}.png"
                media.append(
                    {
                        "kind": "picture",
                        "filename": ref,
                        "png": make_png(png_seed + off, image_resolution_scale),
                    }
                )
            spans.append(
                {"kind": "picture", "text": "", "media_ref": ref, "offset": off}
            )
        else:
            raise ValueError(f"unknown item kind: {item.kind!r}")
    doc = AssembledDoc(spans=spans, media=media)
    doc.markdown = render_markdown(spans)
    return doc


def render_markdown(spans: list[dict]) -> str:
    """spans → reference-style markdown string.

    Blocks join with a blank line (docling markdown serialization); pictures
    emit the literal placeholder; then each picture-with-ref substitutes the
    first remaining placeholder occurrence from the string start —
    service.py:46,61 semantics including the literal-placeholder-in-text
    edge case."""
    pieces: list[str] = []
    refs_in_order: list[str] = []
    for s in spans:
        if s["kind"] == "picture":
            pieces.append(PLACEHOLDER)
            if s["media_ref"]:
                refs_in_order.append(s["media_ref"])
        else:  # text and table both serialize their text body
            pieces.append(s["text"])
    md = "\n\n".join(pieces)
    for ref in refs_in_order:
        md = md.replace(PLACEHOLDER, ref, 1)
    return md
