"""ocr_sam_project_ray — a Ray-Data-native main-content extraction engine.

Brand-new engine (not a port) re-expressing the computation classes of the
reference repo ``CiberneticaFabrica/ocr-sam-project`` (document splitting,
layout parsing, rule-based field/span extraction, document-type
classification, validation/confidence scoring, batch accounting,
checkpointed output) as streaming ``ray.data.Dataset`` pipelines over
Parquet tables of Common-Crawl-style web pages.

Layout:
- ``functions/``  pure, deterministic scalar/regex/text functions (unit-tested)
- ``sources/``    corpus readers + the deterministic synthetic page generator
- ``stages/``     map_batches-callable stages (stateless fns + actor classes)
- ``pipelines/``  composed Dataset pipelines, checkpoint/lineage/metrics
- ``ops/``        large-scale training-data ops (dedup, ANN, text stats, multimodal)

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (tests' conftest, bench.py, or the driver).
"""

__version__ = "0.1.0"
