"""Large-scale training-data operations (first-class engine components):
text dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity (brute-force + LSH-bucketed ANN, cosine near-dup), text analysis
(language-ID, quality scoring, token counting, fingerprinting), and
multimodal binary-column plumbing."""
