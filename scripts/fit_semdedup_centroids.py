"""Fit the SemDeDup coarse quantizer and emit it as a literals module.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) clusters embeddings with
k-means and dedups within clusters. The cluster-assignment step needs
centroid LITERALS on both engines (the DuckDB oracle can't run Lloyd),
so — like any trained index artifact — the quantizer is fitted ONCE,
offline, and shipped as code: this script runs a seeded, deterministic
NumPy Lloyd fit on the sf0.01 embeddings fixture and writes
hadoop_project_spark/plans/semdedup_centroids.py.

Why fitted, not random: random hyperplane-style centroids in 64-dim
leave almost all vectors nearest ONE centroid on this (clustered)
fixture — the measured sf1 histogram was 14,422 of 20,000 vectors in a
single cell, which serializes the within-cell Gram scoring into one
14k×14k task (~155 s). The fitted centroids balance the cells
(sf1: max 2,404) at every scale factor because the decades share the
generator's cluster structure.

Determinism: fixed seed, fixed iteration cap, ties broken by argmin
(first index), centroids rounded to 6 dp before writing so the
literals are short and both engines assign from IDENTICAL values.

Run: python scripts/fit_semdedup_centroids.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

K = 12
SEED = 31
MAX_ITERS = 50
ROUND_DP = 6

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "hadoop_project_spark", "plans", "semdedup_centroids.py")


def fit(sf_dir: str) -> np.ndarray:
    con = duckdb.connect()
    X = np.array(
        con.execute(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
        ).fetchnumpy()["embedding"].tolist(),
        dtype=np.float64,
    )
    rng = np.random.RandomState(SEED)
    C = X[rng.choice(len(X), K, replace=False)].copy()
    for _ in range(MAX_ITERS):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2)
        a = d.argmin(1)
        newC = np.vstack(
            [X[a == j].mean(0) if (a == j).any() else C[j] for j in range(K)]
        )
        if np.allclose(newC, C, atol=1e-9):
            C = newC
            break
        C = newC
    return np.round(C, ROUND_DP)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    C = fit(sf_dir)
    rows = ",\n".join(
        "    [" + ", ".join(repr(float(v)) for v in row) + "]" for row in C
    )
    body = f'''"""SemDeDup coarse-quantizer centroids — GENERATED ARTIFACT.

Fitted by scripts/fit_semdedup_centroids.py (seeded NumPy Lloyd,
k={K}, seed={SEED}, {ROUND_DP} dp) on the sf0.01 embeddings fixture; see
that script's docstring for why the quantizer is a shipped literal
(cross-engine assignment parity + cell balance at every decade).
Regenerate with: python scripts/fit_semdedup_centroids.py
"""

SEMDEDUP_CENTROIDS: list[list[float]] = [
{rows},
]
'''
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {OUT} ({C.shape[0]} centroids x {C.shape[1]} dims)")


if __name__ == "__main__":
    main()
