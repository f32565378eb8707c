"""Generate a deterministic sf10 SUBSET fixture (10x sf1) for the
THIRD scaling decade (VERDICT r10 #5).

The 100 TB story rested on two measured decades (SCALING.md); this
banks a third for the five biggest-shuffle families only —
`dedup_minhash_lsh`, `part_pagerank_bucketed`, `ssjoin_prefix_pairs`,
`lsh_band_sweep`, `exact_substring_spans` — which need exactly three
tables: documents, lineitem, and nation (bench warm-up). Generating
the full surface's tables at sf10 would be wasted bytes; the point is
the shuffle exponents of the five queries whose absolute bytes are
large enough for the exponent to mean something.

Derivation: the same dimensional-scaling trick as scripts/gen_sf1.py,
applied to testdata_sf1 (run that first) —

* lineitem: 10 key-shifted copies with orderkey/partkey/suppkey
  shifted in lockstep at sf1 strides x10, so per-order and per-part
  fan-outs stay exactly sf1's (co-purchase degree structure invariant;
  the PageRank edge relation grows linearly).
* documents: 10 copies, copy c>0 replacing every 4th token via a
  copy-seeded crc32 map into a SECOND bounded pool (size 230, disjoint
  from gen_sf1's 70-word pool and from the base vocabulary), so sf10
  vocabulary is ~101 + 230 ≈ 3.3x sf1's — Heaps-consistent for the
  third decade in a row — while cross-copy Jaccard stays ~0.15 and
  within-copy near-dup structure is untouched. Row groups stay 2048
  rows so scans split across all 32 cores.
* nation: copied verbatim (dimension).

Everything is seeded; no wall-clock, no unseeded RNG. Output goes to
testdata_sf10/ in the repo (gitignored; documents ~550 MB).

Run: python scripts/gen_sf10.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import zlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

COPIES = 10

# sf1 key cardinalities (10x the sf0.1 strides gen_sf1.py documents).
N_ORD = 1_500_000
N_PART = 200_000
N_SUPP = 10_000
N_DOC = 50_000

# Second-decade replacement pool: disjoint from gen_sf1's VOCAB_POOL
# ("v##q") and the base vocabulary; sized so sf10 vocabulary grows
# another Heaps-consistent ~3.3x instead of stalling at sf1's 101.
VOCAB_POOL2 = [f"w{i:03d}q" for i in range(230)]


def gen_lineitem(con: duckdb.DuckDBPyConnection, src: str, out: str) -> None:
    con.execute(
        f"CREATE VIEW li1 AS SELECT * FROM read_parquet('{src}/lineitem.parquet')"
    )
    q = " UNION ALL ".join(
        f"""
        SELECT CAST(l_orderkey + {c * N_ORD} AS BIGINT) AS l_orderkey,
               CAST(l_partkey + {c * N_PART} AS BIGINT) AS l_partkey,
               CAST(l_suppkey + {c * N_SUPP} AS BIGINT) AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM li1"""
        for c in range(COPIES)
    )
    con.execute(
        f"COPY ({q}) TO '{out}/lineitem.parquet' "
        f"(FORMAT PARQUET, ROW_GROUP_SIZE 65536)"
    )
    print("lineitem: 10 shifted copies of sf1", flush=True)


def gen_documents(src: str, out: str) -> None:
    t = pq.read_table(f"{src}/documents.parquet").to_pydict()
    out_cols = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for c in range(COPIES):
        repl_cache: dict[str, str] = {}

        def repl(tok: str) -> str:
            r = repl_cache.get(tok)
            if r is None:
                # "sf10:" seed namespace so copy c here maps tokens
                # differently from gen_sf1's copy c
                r = VOCAB_POOL2[
                    zlib.crc32(f"sf10:{c}:{tok}".encode()) % len(VOCAB_POOL2)
                ]
                repl_cache[tok] = r
            return r

        for i in range(len(t["doc_id"])):
            if c == 0:
                txt = t["text"][i]
            else:
                txt = " ".join(
                    repl(tok) if j % 4 == 0 else tok
                    for j, tok in enumerate(t["text"][i].split(" "))
                )
            out_cols["doc_id"].append(t["doc_id"][i] + c * N_DOC)
            out_cols["text"].append(txt)
            out_cols["lang"].append(t["lang"][i])
            out_cols["source"].append(t["source"][i])
            out_cols["n_chars"].append(len(txt))
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(
        pa.table(out_cols, schema=schema),
        f"{out}/documents.parquet",
        row_group_size=2048,
    )
    print("documents: 10 pool2-perturbed copies of sf1", flush=True)


def gen_embeddings(src: str, out: str) -> None:
    """10 orthogonally-remapped copies of the sf1 embeddings (round-12
    third-decade rows for the retrieval family need a vector table at
    sf10). Same construction as gen_sf1.gen_embeddings one decade up —
    coordinate permutation + sign flips are orthogonal maps, so
    within-copy cosines (and every certified top-k) are exact — under
    a second seed namespace so sf10's copies differ from sf1's."""
    import random

    import numpy as np

    tbl = pq.read_table(f"{src}/embeddings.parquet")
    vec_ids = np.asarray(tbl["vec_id"])
    labels = np.asarray(tbl["label"])
    vecs = np.vstack(
        [np.asarray(v) for v in tbl["embedding"].to_pylist()]
    ).astype(np.float32)
    dim = vecs.shape[1]
    n_vec = len(vec_ids)
    ids_out, labels_out, vecs_out = [], [], []
    for c in range(COPIES):
        rng = random.Random(zlib.crc32(f"sf10-emb:{c}".encode()))
        perm = list(range(dim))
        signs = np.ones(dim, dtype=np.float32)
        if c > 0:  # copy 0 embeds sf1 verbatim
            rng.shuffle(perm)
            signs = np.array(
                [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)],
                dtype=np.float32,
            )
        ids_out.append(vec_ids + c * n_vec)
        labels_out.append(labels)
        vecs_out.append(vecs[:, perm] * signs)
    flat = np.vstack(vecs_out)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(flat.reshape(-1), type=pa.float32()), dim
    ).cast(pa.list_(pa.float32()))
    out_tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids_out), type=pa.int64()),
            "embedding": arr,
            "label": pa.array(np.concatenate(labels_out), type=pa.int32()),
        }
    )
    pq.write_table(out_tbl, f"{out}/embeddings.parquet", row_group_size=2048)
    print("embeddings: 10 orthogonally-remapped sf1 copies", flush=True)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(repo, "testdata_sf1")
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "testdata_sf10")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}/nation.parquet')) "
        f"TO '{out}/nation.parquet' (FORMAT PARQUET)"
    )
    gen_lineitem(con, src, out)
    gen_documents(src, out)
    gen_embeddings(src, out)
    for t, n in (
        ("lineitem", 60_000_000),
        ("documents", 500_000),
        ("embeddings", 200_000),
    ):
        got = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        assert got == n, (t, got)
    print(f"sf10 subset fixture complete at {out}", flush=True)


if __name__ == "__main__":
    main()
