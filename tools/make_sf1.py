#!/usr/bin/env python3
"""Build a 10x ("sf1") scale-up of the documents and embeddings tables
from the driver's sf0.1 testdata, for SCALE MEASUREMENT ONLY (never for
correctness gating — the oracle gate always runs on the driver's own
parquet).

Construction: 10 isomorphic shards, so every per-shard statistic the
operators depend on is EXACTLY preserved and the only thing that grows
is data volume:

- documents: copy c remaps doc_id -> doc_id + c*10_000_000 and suffixes
  every whitespace-token with "~c" (c>0).  Within a copy the
  token/shingle structure is isomorphic to the original (same counts,
  same near-dup relationships); across copies the shingle sets are
  DISJOINT, so the pair graph is 10 independent shards — a clean lower
  bound on cross-doc interaction, with none of the artificial
  10-clique blowup naive duplication would plant.  n_chars is
  recomputed from the transformed text.

- embeddings: copy c remaps vec_id likewise and multiplies each
  dimension d by a deterministic sign s(c,d) in {+1,-1}.  A sign flip
  is an exact isometry even in float32 (multiplying by +-1.0 is
  lossless), so within-copy distances, cosines, kNN graphs and
  cluster structure are bit-identical to the original; across copies
  the vectors decorrelate (expected cosine ~ 0 at dim 64), so LSH/IVF
  buckets don't artificially collapse the way exact duplication
  (10 identical points per site) would.

Output: /root/repo/target/sf1/{documents,embeddings}.parquet plus
symlinks to the sf0.1 parquet for the remaining tables (session warmup
reads them; the measured queries touch only the two scaled tables).
"""
import os
import re
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# args: [copies] [dst] - defaults build the classic 10x "sf1"; 100
# copies + target/sf10 builds the third scale decade (same isomorphic-
# shard construction, so every per-shard statistic is preserved at any
# copy count)
SRC = "/root/testdata/sf0.1"
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
STRIDE = 10_000_000

os.makedirs(DST, exist_ok=True)

# ---- documents ----
t = pq.read_table(f"{SRC}/documents.parquet")
doc_id = t.column("doc_id").to_numpy()
text = t.column("text").to_pylist()
lang = t.column("lang")
source = t.column("source")

chunks = []
for c in range(COPIES):
    if c == 0:
        txt = text
    else:
        suf = f"~{c}"
        txt = [re.sub(r"(\S+)", lambda m: m.group(1) + suf, s) if s is not None else None
               for s in text]
    chunks.append(pa.table({
        "doc_id": pa.array(doc_id + c * STRIDE, type=pa.int64()),
        "text": pa.array(txt, type=pa.string()),
        "lang": lang,
        "source": source,
        "n_chars": pa.array([len(s) if s is not None else 0 for s in txt], type=pa.int64()),
    }))
docs = pa.concat_tables(chunks)
pq.write_table(docs, f"{DST}/documents.parquet")
print(f"documents: {docs.num_rows} rows")

# ---- embeddings ----
t = pq.read_table(f"{SRC}/embeddings.parquet")
vec_id = t.column("vec_id").to_numpy()
emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)  # (n, 64)
label = t.column("label")
rng_dim = emb.shape[1]

chunks = []
for c in range(COPIES):
    # deterministic sign pattern per (copy, dim); copy 0 = identity
    rs = np.random.RandomState(1234 + c)
    signs = np.where(rs.rand(rng_dim) < 0.5, -1.0, 1.0).astype(np.float32) if c else np.ones(rng_dim, np.float32)
    e = emb * signs
    chunks.append(pa.table({
        "vec_id": pa.array(vec_id + c * STRIDE, type=pa.int64()),
        "embedding": pa.array([row for row in e.tolist()], type=pa.list_(pa.float32())),
        "label": label,
    }))
embt = pa.concat_tables(chunks)
pq.write_table(embt, f"{DST}/embeddings.parquet")
print(f"embeddings: {embt.num_rows} rows")

# ---- events (round-11 wave 2: scale evidence for the Temporal family) ----
# copy c remaps event_id/user_id by the same stride; ts is UNCHANGED, so
# the corpus TIME SPAN is constant while volume grows 10x — exactly the
# regime ts_resample's "explode bounded by span" claim is about, and the
# per-user series stay isomorphic (10x more users, same per-user shape).
t = pq.read_table(f"{SRC}/events.parquet")
chunks = []
for c in range(COPIES):
    chunks.append(pa.table({
        "event_id": pa.array(t.column("event_id").to_numpy() + c * STRIDE, type=pa.int64()),
        "ts": t.column("ts"),
        "user_id": pa.array(t.column("user_id").to_numpy() + c * STRIDE, type=pa.int64()),
        "event_type": t.column("event_type"),
        "value": t.column("value"),
        "props": t.column("props"),
    }))
ev = pa.concat_tables(chunks)
pq.write_table(ev, f"{DST}/events.parquet")
print(f"events: {ev.num_rows} rows")

# ---- lineitem (equidepth/skew/corr/basket scale evidence) ----
# copy c remaps l_orderkey only: the price/qty VALUE DOMAINS are constant
# (distinct cents stay put — the regime equidepth_hist's domain-bounded
# staircase claim is about), per-key counts and baskets replicate
# shard-isomorphically (skew_report percentiles and basket_pairs lift
# are exactly preserved; supports, pair counts and N all scale 10x).
t = pq.read_table(f"{SRC}/lineitem.parquet")
chunks = []
for c in range(COPIES):
    cols = {name: t.column(name) for name in t.column_names}
    cols["l_orderkey"] = pa.array(t.column("l_orderkey").to_numpy() + c * STRIDE, type=pa.int64())
    chunks.append(pa.table(cols))
li = pa.concat_tables(chunks)
pq.write_table(li, f"{DST}/lineitem.parquet")
print(f"lineitem: {li.num_rows} rows")

# ---- orders (round-11 wave 5: order_gaps / gini_topshare evidence) ----
# copy c remaps o_orderkey/o_custkey by the same stride; dates and
# prices are UNCHANGED, so each copy is an isomorphic customer
# population: per-customer gap sequences replicate exactly (order_gaps
# output rows scale 10x with identical values) and the revenue
# DISTRIBUTION replicates (Gini is replication-invariant up to the
# (n+1)/n finite-size term and top-k shares up to the k = n//100
# floor — measured: gini agrees to 1 ulp at 10x, copy-0 gap rows
# bit-identical).
t = pq.read_table(f"{SRC}/orders.parquet")
chunks = []
for c in range(COPIES):
    cols = {name: t.column(name) for name in t.column_names}
    cols["o_orderkey"] = pa.array(t.column("o_orderkey").to_numpy() + c * STRIDE, type=pa.int64())
    cols["o_custkey"] = pa.array(t.column("o_custkey").to_numpy() + c * STRIDE, type=pa.int64())
    chunks.append(pa.table(cols))
od = pa.concat_tables(chunks)
pq.write_table(od, f"{DST}/orders.parquet")
print(f"orders: {od.num_rows} rows")

# ---- customer (referential integrity for the sharded orders) ----
# orders copies remap o_custkey, so customer must shard identically or
# 90% of sf1 orders would silently lose their customer join (skewing
# any customer-join query measured at sf1).  Same stride remap; all
# other columns replicate.
t = pq.read_table(f"{SRC}/customer.parquet")
chunks = []
for c in range(COPIES):
    cols = {name: t.column(name) for name in t.column_names}
    cols["c_custkey"] = pa.array(t.column("c_custkey").to_numpy() + c * STRIDE, type=pa.int64())
    chunks.append(pa.table(cols))
cu = pa.concat_tables(chunks)
pq.write_table(cu, f"{DST}/customer.parquet")
print(f"customer: {cu.num_rows} rows")

# remaining tables: symlink sf0.1 (warmup only)
for f in os.listdir(SRC):
    if f.endswith(".parquet") and f not in (
            "documents.parquet", "embeddings.parquet", "events.parquet",
            "lineitem.parquet", "orders.parquet", "customer.parquet"):
        dst = f"{DST}/{f}"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{f}", dst)
print("done:", DST)
