"""F4 fixture behavior: multi-MB binary payload rows through the media
stages with small batches (SURVEY.md §7 hard part (b): wide rows must not
blow up block handling)."""

import numpy as np
import pyarrow as pa
import ray.data

from docling_api_ray.stages.multimodal import (
    ByteHistogramFeatures,
    MediaMetadata,
)
from docling_api_ray.functions.png import make_png


def _wide_media(n_small=40, n_big=4, big_bytes=2 << 20):
    rng = np.random.RandomState(11)
    rows = []
    for i in range(n_small):
        rows.append(
            {
                "doc_id": i,
                "kind": "picture",
                "filename": f"picture-{i}.png",
                "png": make_png(i, 2),
            }
        )
    for j in range(n_big):
        # valid PNG header + a multi-MB deterministic tail: exercises
        # big-blob block handling without an image library
        body = rng.bytes(big_bytes)
        rows.append(
            {
                "doc_id": 1000 + j,
                "kind": "table",
                "filename": f"table-{j}.png",
                "png": make_png(j, 4)[:33] + body,
            }
        )
    return pa.Table.from_pylist(rows)


def test_wide_rows_stream_through_media_stages():
    tbl = _wide_media()
    ds = ray.data.from_arrow(tbl)
    meta = ds.map_batches(
        MediaMetadata, batch_format="pyarrow", batch_size=8, concurrency=(1, 2)
    ).take_all()
    assert len(meta) == 44
    big = [r for r in meta if r["doc_id"] >= 1000]
    assert all(r["n_bytes"] > 2 << 20 for r in big)
    assert all(r["valid_png"] for r in big)  # header parse only reads IHDR
    feats = ds.map_batches(
        ByteHistogramFeatures(), batch_format="pyarrow", batch_size=8
    ).take_all()
    assert len(feats) == 44
    for r in feats:
        assert abs(sum(r["features"]) - 1.0) < 1e-3


def test_wide_rows_roundtrip_parquet(tmp_path):
    ds = ray.data.from_arrow(_wide_media(n_small=5, n_big=3))
    out = str(tmp_path / "wide")
    ds.write_parquet(out)
    back = ray.data.read_parquet(out)
    rows = back.take_all()
    assert len(rows) == 8
    sizes = sorted(len(r["png"]) for r in rows)
    assert sizes[-1] > 2 << 20
