"""Sequence packing (concat-and-chunk) — cross-bucket prefix-sum
correctness with a bucket size small enough to force several buckets
per source."""

import numpy as np
import pyarrow as pa
import ray.data

from docling_api_ray.stages.packing import pack_chunks


def test_pack_chunks_matches_serial_prefix_sum():
    rng = np.random.default_rng(7)
    n = 200
    docs = []
    for i in range(n):
        src = f"s{i % 3}"
        words = " ".join(["w"] * int(rng.integers(1, 30)))
        docs.append((i, src, words))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [d[0] for d in docs],
                "source": [d[1] for d in docs],
                "text": [d[2] for d in docs],
            }
        )
    )
    got = {
        r["doc_id"]: r
        for r in pack_chunks(ds, chunk_tokens=64, bucket_size=16).take_all()
    }
    # serial reference: per source in doc_id order
    run: dict[str, int] = {}
    for i, src, words in sorted(docs):
        tok = len(words.split())
        off = run.get(src, 0)
        assert got[i]["n_tokens"] == tok
        assert got[i]["chunk_id"] == off // 64, (i, src)
        assert got[i]["chunk_pos"] == off % 64
        run[src] = off + tok
    # chunks actually fill: more than one chunk per source
    assert max(r["chunk_id"] for r in got.values()) >= 3


def test_pack_chunks_empty_text_rows():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "source": ["a", "a", "a"],
                "text": ["", "x y", ""],
            }
        )
    )
    rows = {r["doc_id"]: r for r in pack_chunks(ds, chunk_tokens=4).take_all()}
    assert rows[0]["n_tokens"] == 0 and rows[0]["chunk_pos"] == 0
    assert rows[1]["chunk_pos"] == 0 and rows[2]["chunk_pos"] == 2
