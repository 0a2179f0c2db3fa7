"""F1 fixture corpus: deterministic interleaved text+media documents
(FIXTURES.md F1; the BASELINE.json input_hint shape).

One row per document, ``spans`` = ordered interleaved sequence with input
kinds ``text`` | ``media``.  Knobs per FIXTURES.md: Zipf-ish span counts
(heavy tail exercises skew handling), ~15% media fraction, a fixed 5% of
docs carrying the literal ``<!-- image -->`` inside a text span (the
placeholder-substitution regression, service.py:61), and poison docs with
zero spans.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docling_api_ray.schema import INTERLEAVED_SCHEMA

_TOKENS = (
    "stream batch window merge sort hash join scan filter group table row "
    "column key order part supplier customer vector index span media doc"
).split()

PLACEHOLDER_DOC_MOD = 20  # 5% of docs get a literal placeholder in text
MEDIA_FRACTION = 0.15


def generate_interleaved(
    n_docs: int = 2000, seed: int = 42, max_spans: int = 200
) -> pa.Table:
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_docs):
        # Zipf-ish heavy tail, clamped
        n_spans = int(min(max_spans, rng.zipf(1.5)))
        if i % 97 == 0:
            n_spans = 0  # poison/empty doc (F5)
        spans = []
        for off in range(n_spans):
            if rng.rand() < MEDIA_FRACTION:
                spans.append(
                    {
                        "kind": "media",
                        "text": "",
                        "media_ref": f"media-{off}",
                        "offset": off,
                    }
                )
            else:
                words = [
                    _TOKENS[rng.randint(len(_TOKENS))]
                    for _ in range(rng.randint(3, 12))
                ]
                text = " ".join(words)
                if i % PLACEHOLDER_DOC_MOD == 0 and off == 0:
                    text = f"{text} <!-- image --> {text}"
                spans.append(
                    {"kind": "text", "text": text, "media_ref": "", "offset": off}
                )
        rows.append({"doc_id": f"doc-{i:08d}", "spans": spans})
    return pa.Table.from_pylist(rows, schema=INTERLEAVED_SCHEMA)
