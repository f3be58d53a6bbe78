"""Generate an sf1-equivalent dataset (10x sf0.1) under /tmp/sf1 for
one-order-of-magnitude scale evidence (SCALE.md round-7 table).

Replication policy — pyarrow only, preserving every physical parquet
type (events keeps timestamp[ns], embeddings keeps list<float>):

* region/nation copy through unchanged (TPC-H dims fixed at any SF);
* every other table is replicated 10x with key columns offset by
  ``replica * (max_key + 1)`` so PK uniqueness and FK chains
  (orders->customer, lineitem->orders/part/supplier) survive intact;
* documents append a per-replica suffix token to ``text`` (replica 0
  verbatim) so exact-dup structure matches the original within each
  replica while cross-replica rows are high-Jaccard NEAR-duplicates —
  a realistic near-dup-rich corpus rather than a degenerate 10x
  exact-duplicate one (n_chars is recomputed from the new text);
* embeddings apply a per-replica RANDOM ORTHOGONAL rotation (QR of a
  seeded Gaussian matrix) — norm- and distribution-preserving, so
  kmeans/semantic-dedup cells don't collapse into 10x-multiplicity
  point masses, and (unlike the earlier ``np.roll`` which wrapped at
  dim=64, repeating rotations past replica 64) every replica gets a
  DISTINCT rotation at any replica count. Because one rotation is
  applied to ALL vectors of a replica, within-replica pairwise cosines
  are preserved exactly: each replica is an isometric copy of sf0.1's
  point set, so semantic-dedup survivor counts should scale ~linearly
  with replicas (the output-semantics prediction SCALE.md verifies).

Usage: python scripts/make_sf1.py [/tmp/sf1] [replicas]
(replicas defaults to 10 = sf1; 30 = sf3, 100 = sf10 — the third
scale-curve point VERDICT r7 asked for)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

KEY_OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# FK columns must use the STRIDE OF THE TABLE THEY POINT AT
STRIDE_OF = {
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)

    tables = {t: pq.read_table(f"{SRC}/{t}.parquet")
              for t in ["region", "nation", "customer", "supplier", "part",
                        "orders", "lineitem", "events", "documents",
                        "embeddings"]}
    strides = {}
    for t, keys in KEY_OFFSETS.items():
        for k in keys:
            if k not in STRIDE_OF:
                strides[(t, k)] = pc.max(tables[t][k]).as_py() + 1
    for col, (ft, fk) in STRIDE_OF.items():
        strides[(col.split("_")[0], col)] = strides[(ft, fk)]
    # vec_id == doc_id alignment (hybrid-retrieval fusion joins on it):
    # both tables must replicate with ONE shared stride or replicas 1..N
    # drift apart and the cross-replica doc/vector correspondence breaks
    shared = max(strides[("documents", "doc_id")],
                 strides[("embeddings", "vec_id")])
    strides[("documents", "doc_id")] = shared
    strides[("embeddings", "vec_id")] = shared

    for name, tab in tables.items():
        if name in ("region", "nation"):
            pq.write_table(tab, f"{out_dir}/{name}.parquet")
            continue
        chunks = []
        for i in range(replicas):
            rep = tab
            for key in KEY_OFFSETS[name]:
                if key in STRIDE_OF:
                    stride = strides[STRIDE_OF[key]]
                else:
                    stride = strides[(name, key)]
                col = pc.add(rep[key], pa.scalar(i * stride,
                                                 rep.schema.field(key).type))
                rep = rep.set_column(rep.schema.get_field_index(key),
                                     rep.schema.field(key), col)
            if name == "documents" and i > 0:
                text = pc.binary_join_element_wise(
                    rep["text"], pa.scalar(f" zrep{i}"), "")
                rep = rep.set_column(rep.schema.get_field_index("text"),
                                     rep.schema.field("text"), text)
                n_chars = pc.cast(pc.utf8_length(text), pa.int64())
                rep = rep.set_column(rep.schema.get_field_index("n_chars"),
                                     rep.schema.field("n_chars"), n_chars)
            if name == "embeddings" and i > 0:
                vecs = np.stack(rep["embedding"].to_pylist()).astype("float32")
                # Per-replica random orthogonal rotation: distinct for
                # EVERY replica (np.roll wrapped at dim=64), norm- and
                # within-replica-geometry-preserving (isometry), so
                # semantic-dedup output semantics stay predictable.
                dim = vecs.shape[1]
                rng = np.random.default_rng(1_000_003 * i)
                q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
                q = q * np.sign(np.diag(r))  # deterministic sign fix
                rotated = (vecs @ q.astype("float64")).astype("float32")
                col = pa.array(list(rotated),
                               type=rep.schema.field("embedding").type)
                rep = rep.set_column(
                    rep.schema.get_field_index("embedding"),
                    rep.schema.field("embedding"), col)
            chunks.append(rep)
        out = pa.concat_tables(chunks)
        pq.write_table(out, f"{out_dir}/{name}.parquet")
        src_schema = pq.read_schema(f"{SRC}/{name}.parquet")
        dst_schema = pq.read_schema(f"{out_dir}/{name}.parquet")
        assert src_schema.equals(dst_schema), (name, src_schema, dst_schema)
        print(f"{name}: {tab.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
