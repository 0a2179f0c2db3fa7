"""End-to-end flagship pipeline vs the deterministic expected-count oracle
(sources/synth.py expected_counts — the python mirror of the DuckDB SQL)."""

import pyarrow.parquet as pq

from docling_api_ray.config import PipelineConfig
from docling_api_ray.pipelines.convert import flagship
from docling_api_ray.sources.synth import expected_counts
from docling_api_ray.stages.convert import ConvertActor

SF_DIR = "/root/testdata/sf0.001"


def test_flagship_matches_expected_counts():
    out = flagship(SF_DIR).take_all()
    docs = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    assert len(out) == len(texts)
    for row in out:
        exp = expected_counts(row["doc_id"], texts[row["doc_id"]])
        spans = row["spans"]
        n_text = sum(1 for s in spans if s["kind"] == "text")
        n_tab = sum(1 for s in spans if s["kind"] == "table")
        n_pic = sum(1 for s in spans if s["kind"] == "picture")
        assert row["format"] == exp["format"], row["doc_id"]
        assert row["error"] == exp["error"], row["doc_id"]
        assert len(spans) == exp["n_spans"], row["doc_id"]
        assert n_text == exp["n_text"], row["doc_id"]
        assert n_tab == exp["n_tables"] and n_pic == exp["n_pictures"]
        refs = [s["media_ref"] for s in spans if s["media_ref"]]
        assert (refs[-1] if refs else "") == exp["last_media_ref"]
        # offsets strictly increasing from 0
        assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_convert_actor_error_channel_direct():
    actor = ConvertActor(PipelineConfig())
    spans, media, md, err = actor.convert_row(b"%PDF-1.4\n[[CORRUPT]]", "pdf")
    assert err == "corrupt document" and spans == [] and md == ""
    spans, media, md, err = actor.convert_row(b"whatever", None)
    assert err == "unsupported format"
    spans, media, md, err = actor.convert_row(b"junk no magic", "pdf")
    assert err == "not a pdf"


def test_html_doc_media_spans():
    cfg = PipelineConfig(extract_tables_as_images=True)
    actor = ConvertActor(cfg)
    html = (
        "<html><body><main><p>para one text</p>"
        '<img src="x.png"/><p>para two text</p></main></body></html>'
    ).encode()
    spans, media, md, err = actor.convert_row(html, "html")
    assert err == ""
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "text", "picture"]
    assert media[0]["filename"] == "picture-1.png"


def test_gpu_pool_config_surface():
    """num_gpus plumbs into the actor-pool spec (lazy build only — the
    sandbox has no GPU to execute on)."""
    import ray.data

    from docling_api_ray.stages.convert import convert_documents

    cfg = PipelineConfig(convert_num_gpus=0.5)
    ds = ray.data.from_items([{"doc_id": 1, "filename": "a.md", "payload": b"x",
                               "format": "md"}])
    lazy = convert_documents(ds, cfg)  # must build without executing
    assert lazy is not None
