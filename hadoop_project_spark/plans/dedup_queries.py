"""Deduplication queries (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding near-dup). See operators/dedup.py."""
