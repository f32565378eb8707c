"""Generate a deterministic sf1 fixture (10x sf0.1) for the second
scaling decade (VERDICT r5 item 1).

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only); banking the
100x-scale claim needs one more measured decade, so this script derives
sf1 from sf0.1 by the standard dimensional-scaling trick (the same one
TPC-H's dbgen uses): 10 key-shifted copies of every fact/dim table,
with foreign keys shifted in lockstep so per-key fan-outs (lines per
order, orders per customer, events per user) stay EXACTLY what they are
at sf0.1 — data volume grows 10x, per-entity structure is invariant.

Similarity-bearing columns cannot be copied verbatim, or cross-copy
collisions would make pair-producing operators quadratic in the copy
count instead of linear in rows (copy-degenerate near-dup structure the
real corpus growth wouldn't have). Each gets a copy-local perturbation
chosen to KEEP within-copy structure identical while pushing cross-copy
similarity far below every operator threshold:

* part.p_brand      -> suffixed "~c" for copies c>0: the fuzzy/entity
  blocking key (p_brand, p_type) then scales in block COUNT, not block
  size (levenshtein blocks stay bounded, matching how a 10x catalog
  grows brands).
* documents.text    -> for copy c>0, every 4th token is REPLACED by a
  token from a fixed bounded pool, chosen by a copy-seeded hash of the
  original token: ~75% of 3-shingles change, so cross-copy Jaccard
  ~ 0.15 (LSH bands never collide), simhash hamming ~ 10 of 60 bits
  (>> the 3-bit threshold), while two near-dup docs inside a copy see
  the same positional rule + the same token->pool mapping and stay
  near-dups. n_chars is recomputed.

  The pool is the round-7 fix for the r6 telemetry caveat (SCALING.md
  note 3 / VERDICT r6 item 3): the old "~c"-suffix tagging minted a
  fresh token per (base token, copy), growing distinct vocabulary
  EXACTLY 10x per decade (31 -> 310 measured) where real corpora grow
  sub-linearly (Heaps' law, V ~ n^0.5 => ~3.2x per decade). Drawing
  replacements from one shared VOCAB_POOL_SIZE pool bounds sf1
  vocabulary at 31 + 70 ~= 3.3x — Heaps-consistent — so token-keyed
  dictionaries (tfidf terms, PMI bigrams, span df) now scale like a
  real corpus and the measured slopes attribute to the ENGINE. Two
  copies map the same token to the same pool word with prob 1/70, so
  cross-copy similarity stays far below every operator threshold.
* embeddings        -> copy-specific coordinate permutation + sign
  flips (an orthogonal map, seeded per copy): all within-copy cosines
  are preserved EXACTLY; cross-copy cosines collapse to ~N(0, 1/8) —
  far below the 0.95 near-dup threshold.

Everything is seeded; no wall-clock, no unseeded RNG. Output goes to
testdata_sf1/ in the repo (gitignored; ~2 min, ~350 MB).

Run: python scripts/gen_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10
SEED = 42

# Replacement-token pool for document perturbation: one shared pool so
# total vocabulary growth is BOUNDED (base 31 + pool 70 ~= 3.3x, Heaps'
# law at beta ~ 0.5) instead of one fresh token per (token, copy).
# Pool words are lowercase and whitespace-free (normalize_text-stable)
# and disjoint from the English-ish base vocabulary by construction.
VOCAB_POOL_SIZE = 70
VOCAB_POOL = [f"v{i:02d}q" for i in range(VOCAB_POOL_SIZE)]

# sf0.1 key cardinalities (dense 0-based ids; verified against the
# shipped fixture) — the shift strides that keep sf1 ids dense too.
N_CUST = 15_000
N_ORD = 150_000
N_PART = 20_000
N_SUPP = 1_000
N_EVENT = 100_000
N_USER = 1_500
N_DOC = 5_000
N_VEC = 2_000


def _copy_union(con, table: str, select_for_copy) -> str:
    """UNION ALL of ``select_for_copy(c)`` over the 10 copies."""
    return " UNION ALL ".join(select_for_copy(c) for c in range(COPIES))


def gen_relational(con: duckdb.DuckDBPyConnection, out: str) -> None:
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied", flush=True)

    con.execute(f"CREATE VIEW customer0 AS SELECT * FROM read_parquet('{SRC}/customer.parquet')")
    q = _copy_union(
        con, "customer",
        lambda c: f"""
        SELECT CAST(c_custkey + {c * N_CUST} AS BIGINT) AS c_custkey,
               printf('Customer#%09d', CAST(c_custkey + {c * N_CUST} AS BIGINT)) AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM customer0""",
    )
    con.execute(f"COPY ({q}) TO '{out}/customer.parquet' (FORMAT PARQUET)")
    print("customer: 10 shifted copies", flush=True)

    con.execute(f"CREATE VIEW supplier0 AS SELECT * FROM read_parquet('{SRC}/supplier.parquet')")
    q = _copy_union(
        con, "supplier",
        lambda c: f"""
        SELECT CAST(s_suppkey + {c * N_SUPP} AS BIGINT) AS s_suppkey,
               printf('Supplier#%09d', CAST(s_suppkey + {c * N_SUPP} AS BIGINT)) AS s_name,
               s_nationkey, s_acctbal
        FROM supplier0""",
    )
    con.execute(f"COPY ({q}) TO '{out}/supplier.parquet' (FORMAT PARQUET)")
    print("supplier: 10 shifted copies", flush=True)

    con.execute(f"CREATE VIEW part0 AS SELECT * FROM read_parquet('{SRC}/part.parquet')")
    q = _copy_union(
        con, "part",
        lambda c: f"""
        SELECT CAST(p_partkey + {c * N_PART} AS BIGINT) AS p_partkey,
               p_name,
               {"p_brand" if c == 0 else f"p_brand || '~{c}'"} AS p_brand,
               p_type, p_size, p_retailprice
        FROM part0""",
    )
    con.execute(f"COPY ({q}) TO '{out}/part.parquet' (FORMAT PARQUET)")
    print("part: 10 shifted copies (copy-suffixed brands)", flush=True)

    con.execute(f"CREATE VIEW orders0 AS SELECT * FROM read_parquet('{SRC}/orders.parquet')")
    q = _copy_union(
        con, "orders",
        lambda c: f"""
        SELECT CAST(o_orderkey + {c * N_ORD} AS BIGINT) AS o_orderkey,
               CAST(o_custkey + {c * N_CUST} AS BIGINT) AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders0""",
    )
    con.execute(f"COPY ({q}) TO '{out}/orders.parquet' (FORMAT PARQUET)")
    print("orders: 10 shifted copies", flush=True)

    con.execute(f"CREATE VIEW lineitem0 AS SELECT * FROM read_parquet('{SRC}/lineitem.parquet')")
    q = _copy_union(
        con, "lineitem",
        lambda c: f"""
        SELECT CAST(l_orderkey + {c * N_ORD} AS BIGINT) AS l_orderkey,
               CAST(l_partkey + {c * N_PART} AS BIGINT) AS l_partkey,
               CAST(l_suppkey + {c * N_SUPP} AS BIGINT) AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lineitem0""",
    )
    con.execute(f"COPY ({q}) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")
    print("lineitem: 10 shifted copies", flush=True)

    con.execute(f"CREATE VIEW events0 AS SELECT * FROM read_parquet('{SRC}/events.parquet')")
    q = _copy_union(
        con, "events",
        lambda c: f"""
        SELECT CAST(event_id + {c * N_EVENT} AS BIGINT) AS event_id, ts,
               CAST(user_id + {c * N_USER} AS BIGINT) AS user_id,
               event_type, value, props
        FROM events0""",
    )
    con.execute(f"COPY ({q}) TO '{out}/events.parquet' (FORMAT PARQUET)")
    print("events: 10 shifted copies (same timeline, 10x users)", flush=True)


def gen_documents(out: str) -> None:
    import zlib

    src = pq.read_table(f"{SRC}/documents.parquet").to_pydict()
    doc_ids, texts = src["doc_id"], src["text"]
    langs, sources = src["lang"], src["source"]
    out_cols = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for c in range(COPIES):
        # deterministic per-copy token map into the shared bounded pool
        # (zlib.crc32, not builtin hash(): PYTHONHASHSEED-independent)
        repl_cache: dict[str, str] = {}

        def repl(tok: str) -> str:
            r = repl_cache.get(tok)
            if r is None:
                r = VOCAB_POOL[
                    zlib.crc32(f"{c}:{tok}".encode()) % VOCAB_POOL_SIZE
                ]
                repl_cache[tok] = r
            return r

        for i in range(len(doc_ids)):
            if c == 0:
                t = texts[i]
            else:
                toks = texts[i].split(" ")
                t = " ".join(
                    repl(tok) if j % 4 == 0 else tok
                    for j, tok in enumerate(toks)
                )
            out_cols["doc_id"].append(doc_ids[i] + c * N_DOC)
            out_cols["text"].append(t)
            out_cols["lang"].append(langs[i])
            out_cols["source"].append(sources[i])
            out_cols["n_chars"].append(len(t))
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    # Explicit row groups: a single 50k-row group reads as ONE Spark
    # task no matter the split conf (splits land on the row group's
    # midpoint), serializing every documents scan at sf1 — the r6
    # profile showed 21.6 core-s stages on 2 tasks with 30 cores idle.
    # Real 100 TB tables have thousands of row groups; 2048-row groups
    # (~8 MB decompressed) restore that property for the fixture.
    pq.write_table(
        pa.table(out_cols, schema=schema),
        f"{out}/documents.parquet",
        row_group_size=2048,
    )
    print("documents: 10 pool-perturbed copies (bounded vocabulary)", flush=True)


def gen_embeddings(out: str) -> None:
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = np.asarray(tbl["vec_id"])
    labels = np.asarray(tbl["label"])
    vecs = np.vstack([np.asarray(v) for v in tbl["embedding"].to_pylist()]).astype(
        np.float32
    )
    dim = vecs.shape[1]
    ids_out, labels_out, vecs_out = [], [], []
    for c in range(COPIES):
        rng = random.Random(SEED + c)
        perm = list(range(dim))
        signs = np.ones(dim, dtype=np.float32)
        if c > 0:  # copy 0 is the identity map (sf0.1 embedded verbatim)
            rng.shuffle(perm)
            signs = np.array(
                [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)],
                dtype=np.float32,
            )
        v = vecs[:, perm] * signs  # orthogonal: within-copy cosines exact
        ids_out.append(vec_ids + c * N_VEC)
        labels_out.append(labels)
        vecs_out.append(v)
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
    # Same row-group reasoning as documents: keep scans splittable.
    pq.write_table(out_tbl, f"{out}/embeddings.parquet", row_group_size=2048)
    print("embeddings: 10 orthogonally-remapped copies", flush=True)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "testdata_sf1")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    gen_relational(con, out)
    gen_documents(out)
    gen_embeddings(out)
    # sanity: row counts are exactly 10x the source
    for t, n in (
        ("lineitem", 600_000), ("orders", 150_000), ("customer", 15_000),
        ("part", 20_000), ("supplier", 1_000), ("events", 100_000),
        ("documents", 5_000), ("embeddings", 2_000),
    ):
        got = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        assert got == n * COPIES, (t, got)
    print(f"sf1 fixture complete at {out}", flush=True)


if __name__ == "__main__":
    main()
