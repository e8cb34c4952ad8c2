#!/usr/bin/env python3
"""Generate a local sf1 scale-probe fixture (documents + embeddings
only, 10x sf0.1) at the given output dir (default /tmp/graft_sf1).

Purpose (OPTIMIZATION_r12.md / VERDICT item 6): the constant-class
bugs (band widths, cell counts, broadcast thresholds) only surface on
a 10x jump, so the dedup/ANN/text families get one parity + timing
pass at sf1. The fixture mirrors the measured sf0.1 shapes:

- documents: 50,000 rows; 10-100 words/doc uniform over the same
  31-word vocabulary; langs en 41% / de,es,fr,zh ~15%; 20 sources
  round-robin; ~0.2% exact dups + ~0.5% near-dups (1-2 word edits)
  so the LSH/minhash families have real work;
- embeddings: 20,000 rows of 64-dim unit-norm vectors around 10
  cluster directions (labels = cluster), same as the observed label
  balance; vec_id 0 stays the conventional query vector.

Deterministic: seed 420. Do NOT write into /root/testdata (read-only
driver data); default target is /tmp/graft_sf1.
"""
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["spark", "window", "merge", "table", "column", "order", "small",
         "sort", "fast", "value", "scan", "a", "hash", "slow", "group",
         "batch", "agg", "filter", "query", "big", "key", "line", "part",
         "join", "row", "data", "shuffle", "cache", "disk", "read", "write"]
LANGS = ["en"] * 41 + ["de"] * 15 + ["es"] * 15 + ["fr"] * 15 + ["zh"] * 14


def gen_documents(rng, n, path):
    texts = [" ".join(rng.choice(VOCAB)
                      for _ in range(rng.randint(10, 100)))
             for _ in range(n)]
    # exact dups (~0.2%)
    for _ in range(n // 500):
        texts[rng.randrange(n)] = texts[rng.randrange(n)]
    # near dups (~0.5%): copy + mutate 1-2 words
    for _ in range(n // 200):
        src = texts[rng.randrange(n)].split()
        for _ in range(rng.randint(1, 2)):
            src[rng.randrange(len(src))] = rng.choice(VOCAB)
        texts[rng.randrange(n)] = " ".join(src)
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([rng.choice(LANGS) for _ in range(n)]),
        "source": pa.array(["src%d" % (i % 20) for i in range(n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, path)


def gen_embeddings(rng, n, path):
    np_rng = np.random.RandomState(rng.randint(0, 2**31 - 1))
    centers = np_rng.randn(10, 64)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np_rng.randint(0, 10, size=n)
    vecs = centers[labels] + 0.35 * np_rng.randn(n, 64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs.astype(np.float32).tolist(),
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    pq.write_table(tbl, path)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    import os
    os.makedirs(out, exist_ok=True)
    rng = random.Random(420)
    gen_documents(rng, 50000, f"{out}/documents.parquet")
    gen_embeddings(rng, 20000, f"{out}/embeddings.parquet")
    print(f"wrote {out}/documents.parquet (50k docs), "
          f"{out}/embeddings.parquet (20k vecs)")
