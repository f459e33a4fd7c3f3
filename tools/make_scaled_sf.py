"""Build a K×-scaled copy of a testdata SF dir for the scaling probe.

The driver's generator (seed=42) only emitted sf0.001/0.01/0.1; the r9
verdict asked for EMPIRICAL sf1 evidence (item 2), so this tool scales
sf0.1 by deterministic replication that preserves the distributions the
operators are sensitive to, without fabricating artificial structure:

* Fact tables (lineitem/orders/customer/supplier/part/events): replica
  k shifts every entity key by k × (max_key + 1), so DISTINCT key
  counts scale ×K (how TPC-H itself scales) while low-cardinality
  dimensions (returnflag, event_type, lang, …) keep their fixed
  domains. Values/dates/amounts are untouched.
* documents: replica texts must be NEAR-DUP-NEUTRAL — byte-identical
  (or rotated) replicas would hand MinHash/SimHash/SemDeDup ~K² planted
  candidate pairs that the real generator would not produce, making
  every near-dup leg look super-linear for fixture reasons. Replica k
  replaces every 3rd word of doc i with words from doc (i + k·977) mod
  N, so virtually every 3-gram shingle contains a replaced word and
  cross-replica Jaccard collapses to the corpus background level.
* embeddings: replica k mixes vector i with vector (i + k·337) mod N
  (85/15 blend, renormalized) — no exact or ~1.0-cosine duplicates.

Everything is a pure function of (source bytes, k) — no RNG, so two
runs produce identical parquet and the probe is reproducible.

Usage: python tools/make_scaled_sf.py [K] [SRC_DIR] [DST_DIR]
Defaults: K=10, SRC=/root/testdata/sf0.1, DST=/tmp/spark_graft_sf1.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# column → the ENTITY it keys. Every column of one entity shifts by the
# SAME per-entity stride (max over ALL tables referencing it, +1), so
# referential integrity holds in every replica: replica-k lineitems
# reference replica-k parts/suppliers/orders, never the originals.
# (r10 code review: the original per-table shifts left l_partkey /
# l_suppkey unshifted — 10x join fan-in onto the original parts, replica
# parts unreferenced — and derived o_custkey's stride from orders alone,
# which dangles if the max custkey happens to place no orders.)
ENTITY_OF = {
    "l_orderkey": "orderkey",
    "o_orderkey": "orderkey",
    "o_custkey": "custkey",
    "c_custkey": "custkey",
    "s_suppkey": "suppkey",
    "l_suppkey": "suppkey",
    "p_partkey": "partkey",
    "l_partkey": "partkey",
    "event_id": "event_id",
    "user_id": "user_id",
}
KEY_SHIFTS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
}


def _entity_strides(src: str) -> dict:
    """One stride per entity: max key value across every table that
    references the entity, +1."""
    mx: dict = {}
    for tname, cols in KEY_SHIFTS.items():
        tbl = pq.read_table(
            os.path.join(src, f"{tname}.parquet"), columns=cols
        )
        for c in cols:
            e = ENTITY_OF[c]
            mx[e] = max(mx.get(e, 0), int(pa.compute.max(tbl[c]).as_py()))
    return {e: v + 1 for e, v in mx.items()}


def _shift_replicate(
    tbl: pa.Table, keys: list, k_total: int, strides: dict
) -> pa.Table:
    parts = []
    shifts = {c: strides[ENTITY_OF[c]] for c in keys}
    for k in range(k_total):
        cols = {}
        for name in tbl.column_names:
            col = tbl[name]
            if name in shifts and k > 0:
                arr = col.to_numpy(zero_copy_only=False)
                col = pa.array(arr + k * shifts[name], type=col.type)
            cols[name] = col
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def _doc_vec_stride(src: str) -> int:
    """ONE shared stride for the document/vector entity (ADVICE r10):
    documents.doc_id and embeddings.vec_id key the same logical entity
    in the fixtures (vec_id i embeds doc i), so replica-k vec_ids must
    align with replica-k doc_ids. Deriving independent strides from
    max(doc_id)+1 vs max(vec_id)+1 silently dangles the FK whenever
    the two maxima differ — the exact class the ENTITY_OF refactor
    fixed for the TPC-H keys."""
    mx = 0
    for tname, col in (("documents", "doc_id"), ("embeddings", "vec_id")):
        tbl = pq.read_table(os.path.join(src, f"{tname}.parquet"), columns=[col])
        mx = max(mx, int(pa.compute.max(tbl[col]).as_py()))
    return mx + 1


def _scale_documents(tbl: pa.Table, k_total: int, shift: int) -> pa.Table:
    doc_id = tbl["doc_id"].to_numpy(zero_copy_only=False)
    text = tbl["text"].to_pylist()
    lang = tbl["lang"].to_pylist()
    source = tbl["source"].to_pylist()
    n = len(text)
    words = [t.split(" ") for t in text]
    out_id, out_text, out_lang, out_src = [], [], [], []
    for k in range(k_total):
        for i in range(n):
            if k == 0:
                t = text[i]
            else:
                w = list(words[i])
                donor = words[(i + k * 977) % n]
                for j in range(0, len(w), 3):
                    w[j] = donor[(j * 7 + k) % len(donor)]
                t = " ".join(w)
            out_id.append(int(doc_id[i]) + k * shift)
            out_text.append(t)
            out_lang.append(lang[i])
            out_src.append(source[i])
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=tbl["doc_id"].type),
            "text": pa.array(out_text),
            "lang": pa.array(out_lang),
            "source": pa.array(out_src),
            "n_chars": pa.array(
                [len(t) for t in out_text], type=tbl["n_chars"].type
            ),
        }
    )


def _scale_embeddings(tbl: pa.Table, k_total: int, shift: int) -> pa.Table:
    vec_id = tbl["vec_id"].to_numpy(zero_copy_only=False)
    emb = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    label = tbl["label"].to_pylist()
    n = len(vec_id)
    ids, vecs, labels = [], [], []
    for k in range(k_total):
        if k == 0:
            v = emb
        else:
            donor = emb[(np.arange(n) + k * 337) % n]
            v = 0.85 * emb + 0.15 * donor
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
        ids.extend((vec_id + k * shift).tolist())
        vecs.extend(v.astype(np.float32).tolist())
        labels.extend(label)
    return pa.table(
        {
            "vec_id": pa.array(ids, type=tbl["vec_id"].type),
            "embedding": pa.array(vecs, type=tbl["embedding"].type),
            "label": pa.array(labels, type=tbl["label"].type),
        }
    )


def main() -> None:
    k_total = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_sf1"
    os.makedirs(dst, exist_ok=True)
    strides = _entity_strides(src)
    dv_stride = _doc_vec_stride(src)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
        if name == "documents":
            out = _scale_documents(tbl, k_total, dv_stride)
        elif name == "embeddings":
            out = _scale_embeddings(tbl, k_total, dv_stride)
        elif name in KEY_SHIFTS:
            out = _shift_replicate(tbl, KEY_SHIFTS[name], k_total, strides)
        else:  # region/nation: fixed dimensions, never scaled
            out = tbl
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {tbl.num_rows} -> {out.num_rows}", flush=True)


if __name__ == "__main__":
    main()
