#!/usr/bin/env python3
"""Generate throwaway scaled `embeddings` tables for the similarity-family
stress test (s02 IVF, s29 IVF-PQ retrieval). Same schema as the driver's
table (vec_id BIGINT, embedding FLOAT[64], label INT 0-9): unit-scale
gaussian vectors around 10 label centroids (so IVF cells and PQ codebooks
have real structure to find, like the driver's data), deterministic seeds.

Usage: python3 tools/gen_scale_embeddings.py [outbase=/tmp/scaleemb]
Writes <outbase>/n{20000,100000}/embeddings.parquet (10x/50x sf0.1's 2000).
"""
import sys, os
import numpy as np
import pandas as pd
import duckdb

outbase = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaleemb"
DIM, K = 64, 10

con = duckdb.connect()
for n in (20_000, 100_000):
    rng = np.random.default_rng(1000 + n)
    centroids = rng.normal(0.0, 1.0, size=(K, DIM))
    labels = rng.integers(0, K, size=n)
    vecs = (centroids[labels] +
            rng.normal(0.0, 0.6, size=(n, DIM))).astype(np.float32)
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(vecs),
        "label": labels.astype(np.int32),
    })
    d = f"{outbase}/n{n}"
    os.makedirs(d, exist_ok=True)
    con.register("gen", df)
    con.execute(
        f"copy (select * from gen) to '{d}/embeddings.parquet' (format parquet)")
    con.unregister("gen")
    print(f"wrote {d}/embeddings.parquet ({n} rows, dim={DIM})")
