"""Iterative ML queries (K-Means, silhouette — the reference's `final`
project re-expressed). See operators/kmeans.py."""
