"""Convert stage — the actor-pool heart of the pipeline (SURVEY.md §2.3).

The reference rebuilds the full docling model stack per request
(`DocumentConverter(...)` inside every convert call, service.py:76-78,
97-99; fresh service per Celery task, worker/tasks.py:19,33).  Here the
converter state — per-format handlers, compiled patterns, OCR config,
PNG render templates — loads ONCE per actor in ``__init__`` and is reused
across batches: ``ds.map_batches(ConvertActor, concurrency=(m,n),
batch_size=B)``.

Format dispatch (SURVEY.md §2.4 J1): the reference selects a backend per
document from a ``format_options`` dict keyed by InputFormat
(service.py:76-78).  This engine keeps the same shape — ONE actor holding
every format handler, dispatching per row by the ``format`` column —
because in Ray Data a predicate split (``ds.filter(...)`` per format +
``union``) re-executes the upstream lineage once per branch unless the
classified dataset is materialized, and a ``groupby("format")`` is an
all-to-all shuffle for what is only a routing decision.  Per-batch
dispatch inside one pool needs neither.  Handlers that would hold truly
heavyweight per-format models (GPU OCR) can be split into a dedicated
pool by filtering on the format column AFTER a cheap persisted classify
step — documented trade-off, not needed for the sandbox stub models.

Error channel (SURVEY.md §2 D4): per-row try/except → ``error`` column,
reproducing ``raises_on_error=False`` (service.py:80,103) — one poison
document never fails a block.  Divergence from the reference's
sync-single path (HTTP 500, service.py:125-130) is intentional and
documented: error-as-data everywhere.

Conversion itself: HTML, Markdown, AsciiDoc, DOCX/PPTX (genuine zip +
XML, functions/ooxml.py) and programmatic PDF (content-stream parser,
functions/pdf_parse.py) are REAL parsers.  The remaining stub boundary
is model inference only — OCR for scanned pages/images and ML layout
analysis (the sandbox has no torch/easyocr): the image handler and the
synthetic marker-line payload layout (sources/synth.py) stand in for
those tiers behind the same ``Converter`` protocol surface (SURVEY.md
§2.10) the real backends would implement.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from docling_api_ray.config import DEFAULT_CONFIG, PipelineConfig
from docling_api_ray.functions.spans import Item, assemble_spans, stable_seed
from docling_api_ray.schema import MEDIA_TYPE, SPAN_TYPE
from docling_api_ray.stages.html_extract import extract_main_content


class ConversionError(Exception):
    """Per-document conversion failure — becomes an ``error`` row."""


def parse_body_items(body: str) -> list[Item]:
    """Parse the synthetic body layout into document items in reading
    order (the stand-in for docling's iterate_items(), service.py:48)."""
    items: list[Item] = []
    for line in body.split("\n"):
        if line == "[[TABLE]]":
            items.append(Item("table", "| col |\n| --- |\n| cell |", True))
        elif line == "[[PICTURE]]":
            items.append(Item("picture", "", True))
        elif line == "[[PICTURE noimg]]":
            items.append(Item("picture", "", False))
        elif line == "[[CORRUPT]]":
            raise ConversionError("corrupt document")
        elif line:
            items.append(Item("text", line))
    return items


def _decode(payload: bytes) -> str:
    return payload.decode("utf-8", errors="replace")


class ConvertActor:
    """Callable class for ``map_batches`` — one warm converter per actor.

    ``__init__`` is the analog of model loading (docling pipeline assembly
    + EasyOCR reader init, service.py:31-39, Dockerfile:31-36): handler
    registry, config freeze, anything expensive.  ``__call__`` converts one
    Arrow batch."""

    def __init__(
        self,
        config: PipelineConfig = DEFAULT_CONFIG,
        converter_overrides: dict | None = None,
    ) -> None:
        self.config = config
        # handler registry == the reference's format_options dict
        # (service.py:76-78); ``converter_overrides`` is the §2.10
        # extension surface — the engine analog of swapping a
        # DocumentConversionBase implementation (service.py:20-27,
        # route.py:13): any callable ``payload: bytes -> list[Item]``
        # replaces or adds a per-format backend.
        self.handlers = {
            "pdf": self._convert_pdf,
            "docx": self._convert_ooxml,
            "pptx": self._convert_ooxml,
            "image": self._convert_image,
            "md": self._convert_md,
            "asciidoc": self._convert_asciidoc,
            "html": self._convert_html,
        }
        if converter_overrides:
            self.handlers.update(converter_overrides)

    # ---- per-format handlers (A1-A5 analogs) -----------------------------
    def _convert_pdf(self, payload: bytes) -> list[Item]:
        """REAL programmatic-PDF path first (functions/pdf_parse.py): a
        PDF emitted by an actual writer — xref table or xref stream,
        FlateDecode'd content streams, ObjStm-packed objects — extracts
        its Tj/TJ text in stream order, the engine analog of the
        reference's docling-parse tier (service.py:76-78,
        poetry.lock:503) minus the layout/OCR models.  Payloads with the
        %PDF magic but no PDF body objects (the synthetic marker-line
        corpus) fall back to the stand-in layout parser."""
        if not payload.startswith(b"%PDF"):
            raise ConversionError("not a pdf")
        import re

        if re.search(rb"\d+\s+\d+\s+obj\b", payload):
            from docling_api_ray.functions.pdf_parse import (
                PdfParseError,
                extract_text_lines,
            )

            try:
                pages = extract_text_lines(payload)
            except PdfParseError as e:
                raise ConversionError(f"corrupt pdf: {e}") from e
            return [
                Item("text", line) for lines in pages for line in lines
            ]
        body = _decode(payload)
        body = body.split("\n", 1)[1] if "\n" in body else ""
        return parse_body_items(body)

    def _convert_ooxml(self, payload: bytes) -> list[Item]:
        """REAL container path: a genuine zip is opened and its main part
        XML-parsed in document order (functions/ooxml.py — a docx built
        by Word/python-docx extracts through here).  Payloads with the
        zip magic but no central directory fall back to the legacy
        marker-line stand-in layout of the round-1 corpus."""
        import io
        import zipfile

        if not payload.startswith(b"PK\x03\x04"):
            raise ConversionError("not an ooxml container")
        buf = io.BytesIO(payload)
        if zipfile.is_zipfile(buf):
            from docling_api_ray.functions.ooxml import read_docx, read_pptx

            try:
                with zipfile.ZipFile(buf) as zf:
                    names = set(zf.namelist())
                if "word/document.xml" in names:
                    return read_docx(payload)
                if any(n.startswith("ppt/") for n in names):
                    return read_pptx(payload)
                raise ConversionError("zip has no ooxml document part")
            except (zipfile.BadZipFile, KeyError, SyntaxError) as e:
                raise ConversionError(f"corrupt ooxml container: {e}") from e
        body = _decode(payload[4:])
        body = body.split("\n", 1)[1] if "\n" in body else ""
        return parse_body_items(body)

    def _convert_image(self, payload: bytes) -> list[Item]:
        # OCR stub (A2): the reference runs EasyOCR inside the PDF pipeline
        # (service.py:37); here the "recognized text" is the body carried
        # after the PNG magic in the synthetic corpus.
        if len(payload) < 8:
            raise ConversionError("truncated image")
        return parse_body_items(_decode(payload[8:]))

    def _convert_md(self, payload: bytes) -> list[Item]:
        """REAL structural Markdown parse (functions/md_parse.py) — the
        engine analog of docling's marko backend (poetry.lock:1073)."""
        from docling_api_ray.functions.md_parse import parse_markdown

        return parse_markdown(_decode(payload))

    def _convert_asciidoc(self, payload: bytes) -> list[Item]:
        """REAL structural AsciiDoc parse (functions/md_parse.py)."""
        from docling_api_ray.functions.md_parse import parse_asciidoc

        return parse_asciidoc(_decode(payload))

    def _convert_html(self, payload: bytes) -> list[Item]:
        res = extract_main_content(_decode(payload))
        items = [Item("text", seg.text) for seg in res.segments]
        for _src in res.images:
            items.append(Item("picture", "", True))
        return items

    # ---- row + batch conversion -----------------------------------------
    def convert_row(
        self, payload: bytes, fmt: str | None, seed: int = 0
    ) -> tuple[list[dict], list[dict], str, str]:
        """(spans, media, markdown, error) for one document."""
        if fmt is None or fmt == "":
            return [], [], "", "unsupported format"
        handler = self.handlers.get(fmt)
        if handler is None:
            return [], [], "", f"no handler for format {fmt!r}"
        try:
            items = handler(payload or b"")
            doc = assemble_spans(
                items,
                extract_tables_as_images=self.config.extract_tables_as_images,
                image_resolution_scale=self.config.image_resolution_scale,
                png_seed=seed,
            )
            return doc.spans, doc.media, doc.markdown, ""
        except ConversionError as e:
            return [], [], "", str(e)
        except Exception as e:  # raises_on_error=False semantics
            return [], [], "", f"conversion failed: {e}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        fmts = batch["format"].to_pylist()
        doc_ids = batch["doc_id"]
        spans_col: list[list[dict]] = []
        media_col: list[list[dict]] = []
        md_col: list[str] = []
        err_col: list[str] = []
        seeds = doc_ids.to_pylist()
        for payload, fmt, seed in zip(payloads, fmts, seeds):
            spans, media, md, err = self.convert_row(payload, fmt, stable_seed(seed))
            spans_col.append(spans)
            media_col.append(media)
            md_col.append(md)
            err_col.append(err)
        return pa.table(
            {
                "doc_id": doc_ids,
                "filename": batch["filename"],
                "format": pa.array(
                    [f if f else "" for f in fmts], type=pa.string()
                ),
                "spans": pa.array(spans_col, type=pa.list_(SPAN_TYPE)),
                "markdown": pa.array(md_col, type=pa.string()),
                "media": pa.array(media_col, type=pa.list_(MEDIA_TYPE)),
                "error": pa.array(err_col, type=pa.string()),
            }
        )


def convert_documents_split(
    ds: ray.data.Dataset,
    config: PipelineConfig = DEFAULT_CONFIG,
    converter_overrides: dict | None = None,
    gpu_converter_overrides: dict | None = None,
) -> ray.data.Dataset:
    """Per-format split-pool path — the J1 docstring's heavyweight-model
    escape hatch made real: formats in ``config.gpu_formats`` (the
    OCR/layout-model tiers when torch exists) convert in a DEDICATED
    actor pool sized ``gpu_pool_concurrency`` × ``convert_num_gpus``;
    every other format stays on the CPU pool (num_gpus forced to 0).

    ``ds`` must already carry the ``format`` column and is materialized
    here — the 'cheap persisted classify step': without it each branch
    filter would re-execute the upstream read+classify lineage, doubling
    the scan.  The classified table is (doc_id, filename, payload,
    format) — the same bytes the convert pool reads anyway, held as
    object-store blocks (spillable); at 100 TB the equivalent persist is
    the checkpointed classify partition written once and read by both
    pools.  In this sandbox ``convert_num_gpus`` stays 0 so the split
    pool schedules CPU-only; when a GPU tier exists the config flips and
    nothing else changes (the A2 drop-in boundary).

    ``gpu_converter_overrides`` extends/overrides the handler registry
    for the dedicated pool only — where the real OCR/layout backend
    would be injected (§2.10 extension surface)."""
    import dataclasses

    import pyarrow.compute as pc

    gpu_fmts = pa.array(
        sorted(set(config.gpu_formats)), type=pa.string()
    )
    classified = ds.materialize()

    def _mask(b: pa.Table) -> pa.ChunkedArray:
        # fill_null(False): an unclassified (null) format must route to
        # the CPU pool, not silently drop from BOTH branches
        return pc.fill_null(
            pc.is_in(b["format"], value_set=gpu_fmts), False
        )

    def gpu_part(b: pa.Table) -> pa.Table:
        return b.filter(_mask(b))

    def cpu_part(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(_mask(b)))

    gpu_cfg = dataclasses.replace(
        config, convert_concurrency=config.gpu_pool_concurrency
    )
    cpu_cfg = dataclasses.replace(config, convert_num_gpus=0.0)
    gpu_pool = convert_documents(
        classified.map_batches(gpu_part, batch_format="pyarrow"),
        gpu_cfg,
        {**(converter_overrides or {}), **(gpu_converter_overrides or {})},
    )
    cpu_pool = convert_documents(
        classified.map_batches(cpu_part, batch_format="pyarrow"),
        cpu_cfg,
        converter_overrides,
    )
    return cpu_pool.union(gpu_pool)


def convert_documents(
    ds: ray.data.Dataset,
    config: PipelineConfig = DEFAULT_CONFIG,
    converter_overrides: dict | None = None,
) -> ray.data.Dataset:
    """Attach the convert actor pool to a classified raw-document dataset.

    Pool sizing: autoscaling ``(min, max)`` with min = half the pool
    (capped at 16) — short pipelines finish before autoscale ramps, so a
    low floor leaves most of the pool unspawned (measured r2: stats
    showed ~3.5-way average concurrency on a 32-actor pool with min=4;
    min=16 is ~13% faster end-to-end over interleaved reps).  Pinning
    min=max reserves every CPU and starves the read stage (observed
    deadlock-like stall with (32,32) on 32 CPUs)."""
    max_actors = max(1, config.convert_concurrency)
    try:
        cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cluster_cpus = 8
    # never let the FLOOR reserve more than half the cluster — on a
    # 4-CPU test cluster a floor of 4 one-CPU actors starves the read
    # stage into the documented deadlock
    min_actors = max(1, min(16, max_actors // 2, cluster_cpus // 2))
    kwargs = {}
    if config.convert_num_gpus > 0:
        kwargs["num_gpus"] = config.convert_num_gpus
    return ds.map_batches(
        ConvertActor,
        fn_constructor_kwargs={
            "config": config,
            "converter_overrides": converter_overrides,
        },
        batch_format="pyarrow",
        batch_size=config.convert_batch_size,
        concurrency=(min_actors, max_actors),
        num_cpus=config.convert_num_cpus,
        **kwargs,
    )
