"""Pipeline configuration.

Re-expresses the reference's per-request knobs as a frozen pipeline config
(reference: `extract_tables_as_images` and `image_resolution_scale`
query params, document_converter/route.py:27-28, defaults
document_converter/service.py:17,71-72; scale validated to [1,4] at
route.py:28).  In the engine these are constructor args for the convert
actor pool rather than per-request fields.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    """Frozen config passed to every stage / actor constructor."""

    # reference knobs (service.py:31-39); scale defaults to 4 exactly like
    # the reference (IMAGE_RESOLUTION_SCALE = 4, service.py:17; Query(4,
    # ge=1, le=4), route.py:28)
    extract_tables_as_images: bool = False
    image_resolution_scale: int = 4  # in [1, 4]; drives synthetic PNG size
    ocr_languages: tuple[str, ...] = ("fr", "de", "es", "en", "it", "pt")

    # engine execution knobs (no reference equivalent — §4 design)
    #
    # classify_batch_size must not exceed convert's task granularity:
    # Ray's operator fusion sets the fused chain's min-rows-per-bundle to
    # the MAX batch_size of all fused maps (operator_fusion.py,
    # _derive_bundle_min_num_rows), so an oversized classify batch
    # silently multiplies the convert actor-pool's per-task bundle — the
    # old 2048 here turned 64 source blocks into 16 convert tasks on 32
    # actors (measured r3: 2500-row bundles, half the pool idle; at 512
    # the same input runs 64 tasks and the headline drops ~5.1s → ~3.3s).
    classify_batch_size: int = 512
    convert_batch_size: int = 64
    convert_concurrency: int = 8  # actor-pool size for the convert stage
    convert_num_cpus: float = 1.0
    # >0 schedules the convert pool on GPU workers (north_star: CPU and
    # GPU actor pools — EasyOCR/layout models would run here; the sandbox
    # has no GPU so this stays 0 and is covered by a config-surface test)
    convert_num_gpus: float = 0.0
    # non-empty → these formats convert in a DEDICATED actor pool
    # (stages/convert.py convert_documents_split): the per-format
    # GPU-pool split behind a persisted classify step that the J1
    # dispatch docstring documents as the heavyweight-model escape
    # hatch.  The dedicated pool takes ``convert_num_gpus`` per actor
    # and ``gpu_pool_concurrency`` actors; all other formats stay on
    # the CPU pool (num_gpus=0).  Empty (default) → single-pool J1
    # dispatch, fully lazy.
    gpu_formats: tuple[str, ...] = ()
    gpu_pool_concurrency: int = 2

    # span assembly rule for text-only formats: words per text span
    words_per_span: int = 8

    # cost-based block rebalancing before the convert pool (stages/skew.py);
    # None disables.  Default OFF: measured (bench.py --skew, r2) the
    # re-chunk stage costs 5-8% on uniform corpora and 57% on a 1%-mega
    # corpus, while convert_pipeline_heavy_split is the effective
    # head-of-line-blocking fix (1.35x on the same skewed corpus).
    rebalance_target_cost: int | None = None

    def __post_init__(self) -> None:
        if not (1 <= self.image_resolution_scale <= 4):
            raise ValueError("image_resolution_scale must be in [1, 4]")


DEFAULT_CONFIG = PipelineConfig()
