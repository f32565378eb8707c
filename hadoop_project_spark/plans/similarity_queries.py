"""Similarity-search queries (brute-force cosine top-k, LSH-bucketed
ANN). See operators/similarity.py."""
