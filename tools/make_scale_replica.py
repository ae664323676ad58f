#!/usr/bin/env python3
"""Build the N x scale-up replica of an sf dir (SCALE.md "Measured scale-up").

Usage: python3 tools/make_scale_replica.py <inDir> <outDir> [replicas=3]

Replicates the CORPUS tables (documents, embeddings) N x with disjoint
per-replica spaces, and copies every other table unchanged:

- documents: replica 0 is the original; replica r>0 remaps
  doc_id -> doc_id + r*10_000_000 and prefixes every whitespace token with
  "r{r}". Disjoint token/shingle spaces mean each replica's dup/ngram/LSH
  structure exactly matches the original corpus's (no cross-replica
  collisions), so total engine work is honestly N x the original.
- embeddings: replica r>0 remaps vec_id -> vec_id + r*10_000_000 and
  applies a per-replica deterministic sign pattern (flip component j iff
  bit (r-1) of j is set - Hadamard-style). Sign flips are orthogonal
  transforms: within-replica cosine structure is exactly the original's,
  cross-replica cosines decorrelate.

Everything is deterministic (no RNG); output tables are single flat
.parquet files so tools/selfcheck.py's DuckDB views read them directly.
Dev tool only - not part of the library (the library never generates data).
"""
import sys, shutil, pathlib
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

COPY_TABLES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events"]
KEY_OFFSET = 10_000_000


def replicate_documents(in_dir, out_dir, n):
    t = pq.read_table(f"{in_dir}/documents.parquet")
    cols = {c: t[c].to_pylist() for c in t.column_names}
    assert max(cols["doc_id"]) < KEY_OFFSET, "doc_id exceeds KEY_OFFSET"
    out = {c: [] for c in t.column_names}
    for r in range(n):
        for c in t.column_names:
            if c == "doc_id":
                out[c].extend(v + r * KEY_OFFSET for v in cols[c])
            elif c == "text" and r > 0:
                pre = f"r{r}"
                out[c].extend(
                    None if v is None else
                    " ".join(pre + tok for tok in v.split(" "))
                    for v in cols[c])
            elif c == "n_chars" and r > 0:
                # keep n_chars consistent with the rewritten text
                pre_len = len(f"r{r}")
                out[c].extend(
                    nc if txt is None else nc + pre_len * (txt.count(" ") + 1)
                    for nc, txt in zip(cols[c], cols["text"]))
            else:
                out[c].extend(cols[c])
    schema = t.schema.remove_metadata()
    pq.write_table(pa.table({c: pa.array(out[c], schema.field(c).type)
                             for c in t.column_names}, schema=schema),
                   f"{out_dir}/documents.parquet")


def replicate_embeddings(in_dir, out_dir, n):
    t = pq.read_table(f"{in_dir}/embeddings.parquet")
    vec_id = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    assert vec_id.max() < KEY_OFFSET, "vec_id exceeds KEY_OFFSET"
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
    label = np.asarray(t["label"].to_pylist(), dtype=np.int32)
    dim = emb.shape[1]
    ids, vecs, labels = [], [], []
    for r in range(n):
        signs = np.ones(dim, dtype=np.float32)
        if r > 0:
            j = np.arange(dim)
            signs[((j >> (r - 1)) & 1) == 1] = -1.0
        ids.append(vec_id + r * KEY_OFFSET)
        vecs.append(emb * signs)
        labels.append(label)
    schema = t.schema.remove_metadata()
    pq.write_table(pa.table({
        "vec_id": pa.array(np.concatenate(ids)),
        "embedding": pa.array(list(np.concatenate(vecs)),
                              schema.field("embedding").type),
        "label": pa.array(np.concatenate(labels)),
    }, schema=schema), f"{out_dir}/embeddings.parquet")


def replicate_keyed(in_dir, out_dir, table, key_cols, n):
    """Replicate a relational table N x by offsetting `key_cols` per replica
    (disjoint key spaces - joins/graphs/windows decompose into N independent
    copies, so total engine work is honestly N x). Non-key columns copy
    unchanged (timestamps keep their range: per-key densities are
    preserved, which is what windowed operators are sensitive to)."""
    t = pq.read_table(f"{in_dir}/{table}.parquet")
    cols = {c: t[c].to_pylist() for c in t.column_names}
    # disjointness guard: replica key spaces are [r*OFFSET, (r+1)*OFFSET);
    # an existing key >= OFFSET (possible past ~sf1, e.g. l_orderkey 60M at
    # sf10) would silently collide across replicas and void the
    # "honestly N x disjoint copies" contract
    for c in key_cols:
        mx = max((v for v in cols[c] if v is not None), default=0)
        assert mx < KEY_OFFSET, (
            f"{table}.{c} max key {mx} >= KEY_OFFSET {KEY_OFFSET}; "
            f"raise KEY_OFFSET above the observed max before replicating")
    out = {c: [] for c in t.column_names}
    for r in range(n):
        for c in t.column_names:
            if c in key_cols:
                out[c].extend(None if v is None else v + r * KEY_OFFSET
                              for v in cols[c])
            else:
                out[c].extend(cols[c])
    schema = t.schema.remove_metadata()
    pq.write_table(pa.table({c: pa.array(out[c], schema.field(c).type)
                             for c in t.column_names}, schema=schema),
                   f"{out_dir}/{table}.parquet")


# --rel mode: tables whose key spaces get offset per replica. orderkey
# offsets identically in orders and lineitem so the join reconnects within
# a replica; custkey/suppkey offsets make the bipartite order graph N
# disjoint copies; events' user/event ids scale the interval-join and
# sessionization key spaces. partkey is left alone (the part dimension
# stays a shared small dim - dim tables don't grow with fact volume).
REL_TABLES = {
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey"],
}


def main(in_dir, out_dir, n, rel=False):
    pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
    for tbl in COPY_TABLES:
        if rel and tbl in REL_TABLES:
            replicate_keyed(in_dir, out_dir, tbl, REL_TABLES[tbl], n)
        else:
            shutil.copyfile(f"{in_dir}/{tbl}.parquet", f"{out_dir}/{tbl}.parquet")
    replicate_documents(in_dir, out_dir, n)
    replicate_embeddings(in_dir, out_dir, n)
    kind = "corpus+relational" if rel else "corpus"
    print(f"wrote {n}x {kind} replica of {in_dir} to {out_dir}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--rel"]
    main(args[0], args[1], int(args[2]) if len(args) > 2 else 3,
         rel="--rel" in sys.argv)
