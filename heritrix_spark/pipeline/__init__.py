"""Large-scale training-data pipeline operators over crawled corpora:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search (brute cosine, LSH buckets, IVF), text analysis (lang-id, quality,
tokens, fingerprints), and multimodal payload plumbing."""
