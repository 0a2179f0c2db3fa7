"""docling_api_ray — a Ray-Data-native document extraction engine.

Brand-new engine (not a port) with the query/data-processing capabilities
of the reference `docling-api` service (FastAPI + Celery + Redis wrapper
around the docling converter). The unit of execution is a streaming
`ray.data.Dataset` over Arrow blocks of interleaved text+media documents:

- stateless `map_batches` stages for format sniffing (M1-M4), HTML
  boilerplate stripping / main-content scoring (M11), span assembly and
  markdown rendering (M6-M8), text analytics;
- an actor pool (`map_batches(ConvertActor, concurrency=...)`) holding the
  warm per-format conversion engines (A1-A5) — models loaded once per actor
  in `__init__`, per-batch dispatch by format key;
- per-partition checkpoint manifest for resumable runs (§4 of SURVEY.md);
- training-data-scale operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), similarity search (brute-force and
  LSH-bucketed ANN), multimodal binary-column stages, text analysis.

See SURVEY.md for the operator-by-operator mapping to the reference
(file:line cites live in each module's docstring).
"""

__version__ = "0.1.0"
