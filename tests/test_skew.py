"""Cost-based block rebalancing: heavy docs isolated, light docs packed."""

import pyarrow as pa
import ray.data

from docling_api_ray.stages.skew import rebalance_by_cost, split_batch_by_cost


def _batch(sizes):
    return pa.table(
        {
            "doc_id": list(range(len(sizes))),
            "payload": pa.array([b"x" * s for s in sizes], type=pa.binary()),
        }
    )


def test_heavy_doc_gets_own_block():
    # 10 small docs, one 5MB doc, 10 small docs; target 1MB
    sizes = [100] * 10 + [5 << 20] + [100] * 10
    slices = list(split_batch_by_cost(_batch(sizes), target_cost=1 << 20))
    assert sum(s.num_rows for s in slices) == 21
    heavy = [s for s in slices if s.num_rows == 1 and len(s["payload"][0].as_py()) > 1 << 20]
    assert len(heavy) == 1
    # light docs stay packed (not one block per row)
    assert len(slices) <= 4


def test_all_light_packed_into_one():
    slices = list(split_batch_by_cost(_batch([10] * 50), target_cost=1 << 20))
    assert len(slices) == 1 and slices[0].num_rows == 50


def test_order_preserved_and_lossless():
    sizes = [100, 3 << 20, 100, 2 << 20, 100]
    slices = list(split_batch_by_cost(_batch(sizes), target_cost=1 << 20))
    ids = [i for s in slices for i in s["doc_id"].to_pylist()]
    assert ids == [0, 1, 2, 3, 4]


def test_empty_batch():
    assert list(split_batch_by_cost(_batch([]), target_cost=100)) == []


def test_rebalance_dataset_roundtrip():
    sizes = [100] * 20 + [2 << 20] + [100] * 20
    ds = ray.data.from_arrow(_batch(sizes))
    out = rebalance_by_cost(ds, target_cost=1 << 20)
    rows = out.take_all()
    assert len(rows) == 41
    assert sorted(r["doc_id"] for r in rows) == list(range(41))


def test_dispatch_by_cost_split():
    from docling_api_ray.stages.skew import dispatch_by_cost

    ds = ray.data.from_arrow(_batch([100, 5 << 20, 200, 3 << 20]))
    heavy, light = dispatch_by_cost(ds, threshold=1 << 20)
    assert sorted(r["doc_id"] for r in heavy.take_all()) == [1, 3]
    assert sorted(r["doc_id"] for r in light.take_all()) == [0, 2]


def test_heavy_split_pipeline_equals_plain():
    from docling_api_ray.config import PipelineConfig
    from docling_api_ray.pipelines.convert import (
        convert_pipeline,
        convert_pipeline_heavy_split,
    )
    from docling_api_ray.sources.testdata import raw_documents_dataset

    cfg = PipelineConfig(extract_tables_as_images=True, convert_concurrency=4)
    raw = raw_documents_dataset("/root/testdata/sf0.001")
    plain = convert_pipeline(raw, cfg).take_all()
    # tiny threshold forces a real split: most docs route to the heavy pool
    split = convert_pipeline_heavy_split(
        raw_documents_dataset("/root/testdata/sf0.001"), cfg, heavy_threshold=300
    ).take_all()
    key = lambda r: r["doc_id"]
    plain.sort(key=key)
    split.sort(key=key)
    assert [r["doc_id"] for r in plain] == [r["doc_id"] for r in split]
    for a, b in zip(plain, split):
        assert a["spans"] == b["spans"] and a["markdown"] == b["markdown"]
        assert a["error"] == b["error"]


def test_dispatch_null_payload_goes_light():
    import pyarrow as pa
    from docling_api_ray.stages.skew import dispatch_by_cost

    tbl = pa.table(
        {
            "doc_id": [0, 1],
            "payload": pa.array([None, b"x" * 100], type=pa.binary()),
        }
    )
    heavy, light = dispatch_by_cost(ray.data.from_arrow(tbl), threshold=10)
    # 100-byte row is heavy; the NULL-payload row must land in light
    # (not vanish from both streams)
    assert [r["doc_id"] for r in heavy.take_all()] == [1]
    assert [r["doc_id"] for r in light.take_all()] == [0]
