"""Large-scale training-data operations (first-class engine components):
text dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), distributed
connected-components cluster resolution (``graph``), bounded-memory Bloom
membership (``bloom``), per-error-class retry/backoff (``retry``),
embedding similarity (brute-force + IVF-bucketed ANN, cosine near-dup),
text analysis (language-ID, quality scoring, token counting,
fingerprinting), mergeable sketches (``sketch``), multimodal
binary-column plumbing with real container sniffing (``multimodal``),
heavy hitters exact + count-min (``heavy``), DSIR importance weights
(``dsir``), mojibake repair (``mojibake``), BPE tokenizer fitting
(``bpe_learn``), inverted-index build (``invindex``), PMI collocations
(``pmi``), and crawl snapshot diffing (``snapshot_diff``)."""
