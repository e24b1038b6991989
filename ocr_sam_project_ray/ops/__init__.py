"""Large-scale training-data operations (first-class engine components):
text dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), distributed
connected-components cluster resolution (``graph``), bounded-memory Bloom
membership (``bloom``), per-error-class retry/backoff (``retry``),
embedding similarity (brute-force + IVF-bucketed ANN, cosine near-dup),
text analysis (language-ID, quality scoring, token counting,
fingerprinting), mergeable sketches (``sketch``), and multimodal
binary-column plumbing with real container sniffing (``multimodal``)."""
